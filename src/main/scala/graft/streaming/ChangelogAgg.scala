package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Changelog (retract-stream) group aggregation: every result row carries a
  * Flink `RowKind` — `+I` first insert for a key, then `-U` retraction of
  * the previous aggregate and `+U` the refreshed one.
  *
  * Reference: flink-core RowKind.java:25-52 (the +I/-U/+U/-D lattice) and
  * the retracting unbounded group-agg GroupAggFunction.java:43 — SURVEY
  * §1.1 maps this to "carry a row_kind string column". Spark's Update mode
  * only emits the new value; downstream consumers that need the retraction
  * (e.g. a second-level aggregate) need this explicit changelog, which is
  * exactly why the reference emits both rows. State per key is one long —
  * bounded, shuffle-partitioned by key, scale-safe. */
object ChangelogAgg {

  case class Keyed(key: String)
  case class Change(row_kind: String, key: String, cnt: Long)

  /** Streaming count(*) per key emitting +I/-U/+U changelog rows. */
  def countChangelog(s: SparkSession, df: DataFrame, keyCol: String): DataFrame = {
    import s.implicits._
    df.select(col(keyCol).cast("string").as("key")).as[Keyed]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(transition _)
      .toDF()
  }

  /** One keyed state transition — the exact function the operator runs,
    * exposed so StateHarnessSpec can drive the +I → -U/+U changelog
    * lattice directly with a TestGroupState (mirrors the reference's
    * GroupAggregateHarnessTest "test state with retraction" sequence —
    * ref flink-table-planner/.../harness/GroupAggregateHarnessTest
    * .scala:53). */
  private[graft] def transition(key: String, it: Iterator[Keyed],
                                state: GroupState[Long]): Iterator[Change] = {
    val delta = it.size.toLong
    if (delta == 0) Iterator.empty
    else state.getOption match {
      case None =>
        state.update(delta)
        Iterator(Change("+I", key, delta))
      case Some(prev) =>
        state.update(prev + delta)
        Iterator(Change("-U", key, prev), Change("+U", key, prev + delta))
    }
  }
}
