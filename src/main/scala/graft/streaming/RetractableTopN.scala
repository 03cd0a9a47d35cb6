package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Retractable / updatable streaming Top-N: consumes a CHANGELOG stream
  * (+I/-U/+U/-D rows, e.g. from [[ChangelogAgg]] or [[StreamJoin]]) and
  * maintains the true top-N under updates — a retraction of a currently
  * ranked row re-admits the runner-up, an update re-sorts.
  *
  * Reference: flink-table-runtime-blink/.../operators/rank/
  * RetractableTopNFunction.java:53 (sorted-map state + retract handling)
  * and UpdatableTopNFunction.java. The round-1 append-only operator
  * ([[StreamOps.topNPerType]]) provably cannot produce this: it never
  * forgets a superseded value, so any ranking that CHANGES between batches
  * (the common top-N-over-updating-aggregate) comes out wrong.
  *
  * State per partition key = the id→value map (the reference keeps the
  * same data as a TreeMap plus an id index; at micro-batch cadence a
  * re-sort of the touched partition per batch is the simpler equivalent —
  * unlike the reference we re-rank once per BATCH, not per row). Emission
  * is Update-mode: the full refreshed top-N of every touched partition,
  * tagged with a per-partition epoch so consumers (and the oracle gate)
  * can select the latest ranking.
  *
  * Input columns: kind (+I/-U/+U/-D), pkey (partition), id (ranked row
  * id), value (sort key), seq (in-batch apply order — retraction before
  * re-insert). */
object RetractableTopN {

  case class TopNState(vals: Map[String, Long], epoch: Long)
  case class TopNOut(pkey: String, epoch: Long, rn: Int, id: String, value: Long)

  /** NULLS LAST id ordering — a null ranked-row id (e.g. a null group key
    * flowing out of an upstream aggregation) must sort like SQL's default
    * (DuckDB/Spark ORDER BY ASC = NULLS LAST), not NPE inside the state
    * function. */
  private val idNullsLast: Ordering[String] = (a: String, b: String) =>
    if (a == null && b == null) 0
    else if (a == null) 1
    else if (b == null) -1
    else a.compareTo(b)

  // Spark's map encoder cannot persist a null MAP key, so the null id is
  // stored under an invertible prefix encoding: "n" = the null id, "v"+id
  // otherwise. Decoded on emission; ordering happens on decoded ids.
  private val NullKey = "n"
  private def encId(id: String): String = if (id == null) NullKey else "v" + id
  private def decId(k: String): String = if (k == NullKey) null else k.substring(1)

  /** Top-N ids per pkey by descending value (id tiebreak).
    *
    * @param ttlMicros idle-state retention in EVENT-time µs (the
    *        `table.exec.state.ttl` analog — ref RetractableTopNFunction's
    *        StateTtlConfig via AbstractTopNFunction). 0 = retain forever.
    *        When set, the input must carry an event-time `ts` TIMESTAMP
    *        column; a partition untouched for ttl has its ranking state
    *        dropped, so later rows rebuild it from empty (Flink's
    *        documented idle-state approximation). */
  def retractableTopN(s: SparkSession, changelog: DataFrame, n: Int,
                      ttlMicros: Long = 0L): DataFrame = {
    import s.implicits._
    val withTs = changelog
      .select(col("kind").cast("string").as("_1"), col("pkey").cast("string").as("_2"),
              col("id").cast("string").as("_3"), col("value").cast("long").as("_4"),
              col("seq").cast("long").as("_5"),
              (if (ttlMicros > 0) col("ts").cast("timestamp")
               else lit(null).cast("timestamp")).as("_6"))
    val src = if (ttlMicros > 0) withTs.withWatermark("_6", "0 seconds") else withTs
    val timeoutConf =
      if (ttlMicros > 0) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout
    src
      .as[(String, String, String, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Update, timeoutConf)(transition(n, ttlMicros))
      .toDF()
  }

  /** One keyed state transition (a micro-batch's rows for one pkey →
    * emissions + state mutation) — the exact function the streaming
    * operator runs, exposed so StateHarnessSpec can drive it through
    * crafted element/watermark/timer sequences with a TestGroupState
    * (the Flink-analog of RetractableTopNFunctionTest's
    * OneInputStreamOperatorTestHarness — ref flink-table-runtime-blink/
    * .../rank/RetractableTopNFunctionTest.java:58,364). */
  private[graft] def transition(n: Int, ttlMicros: Long)(
      pkey: String, it: Iterator[(String, String, String, Long, Long, java.sql.Timestamp)],
      state: GroupState[TopNState]): Iterator[TopNOut] = {
          if (ttlMicros > 0 && state.hasTimedOut) { // idle-state cleanup timer
            state.remove(); Iterator.empty
          } else {
          val st = state.getOption.getOrElse(TopNState(Map.empty, 0L))
          var vals = st.vals
          val batch = it.toIndexedSeq
          batch.sortBy(e => (e._5, e._3))(
              Ordering.Tuple2(Ordering.Long, idNullsLast))
            .foreach { case (kind, _, id, value, _, _) =>
            kind match {
              case "+I" | "+U" => vals = vals.updated(encId(id), value)
              case "-U" | "-D" => vals = vals.removed(encId(id))
              case other => throw new IllegalArgumentException(s"bad row_kind $other")
            }
          }
          val epoch = st.epoch + 1
          state.update(TopNState(vals, epoch))
          if (ttlMicros > 0) {
            // null ts rows don't advance the idle clock; all-null has no
            // clock at all → actionable error instead of an executor NPE
            val stamps = batch.iterator.filter(_._6 != null)
              .map(e => e._6.getTime * 1000 + (e._6.getNanos / 1000) % 1000)
            require(stamps.hasNext, s"retractableTopN(ttlMicros=$ttlMicros) needs a non-null " +
              s"event-time 'ts' on each batch; partition '$pkey' received only null ts rows")
            val lastTouched = stamps.max
            val deadline = lastTouched + ttlMicros
            if (deadline > state.getCurrentWatermarkMs() * 1000)
              state.setTimeoutTimestamp((deadline + 999) / 1000) // ceil to ms
            else state.remove()
          }
          vals.toSeq.map { case (k, v) => (decId(k), v) }
            .sortBy { case (id, v) => (v, id) }(
              Ordering.Tuple2(Ordering.Long.reverse, idNullsLast)).take(n)
            .iterator.zipWithIndex
            .map { case ((id, v), i) => TopNOut(pkey, epoch, i + 1, id, v) }
          }
  }

  /** The latest ranking per partition from the accumulated Update-mode
    * emissions (max-epoch rows) — what a changelog consumer's sink shows. */
  def latestRanking(accumulated: DataFrame): DataFrame =
    accumulated.join(
        accumulated.groupBy(col("pkey").as("pk2")).agg(max(col("epoch")).as("me")),
        col("pkey") === col("pk2") && col("epoch") === col("me"))
      .select(col("pkey"), col("rn"), col("id"), col("value"))
}
