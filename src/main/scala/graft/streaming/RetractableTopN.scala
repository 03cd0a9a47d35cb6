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

  /** Top-N ids per pkey by descending value (id tiebreak). */
  def retractableTopN(s: SparkSession, changelog: DataFrame, n: Int): DataFrame = {
    import s.implicits._
    changelog
      .select(col("kind").cast("string").as("_1"), col("pkey").cast("string").as("_2"),
              col("id").cast("string").as("_3"), col("value").cast("long").as("_4"),
              col("seq").cast("long").as("_5"))
      .as[(String, String, String, Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (pkey: String, it: Iterator[(String, String, String, Long, Long)],
         state: GroupState[TopNState]) => {
          val st = state.getOption.getOrElse(TopNState(Map.empty, 0L))
          var vals = st.vals
          it.toIndexedSeq.sortBy(e => (e._5, e._3)).foreach { case (kind, _, id, value, _) =>
            kind match {
              case "+I" | "+U" => vals = vals.updated(id, value)
              case "-U" | "-D" => vals = vals.removed(id)
              case other => throw new IllegalArgumentException(s"bad row_kind $other")
            }
          }
          val epoch = st.epoch + 1
          state.update(TopNState(vals, epoch))
          vals.toSeq.sortBy { case (id, v) => (-v, id) }.take(n)
            .iterator.zipWithIndex
            .map { case ((id, v), i) => TopNOut(pkey, epoch, i + 1, id, v) }
        })
      .toDF()
  }

  /** The latest ranking per partition from the accumulated Update-mode
    * emissions (max-epoch rows) — what a changelog consumer's sink shows. */
  def latestRanking(accumulated: DataFrame): DataFrame =
    accumulated.join(
        accumulated.groupBy(col("pkey").as("pk2")).agg(max(col("epoch")).as("me")),
        col("pkey") === col("pk2") && col("epoch") === col("me"))
      .select(col("pkey"), col("rn"), col("id"), col("value"))
}
