package graft.coverage

import graft.{Q, Tables}
import graft.streaming.{StreamJoin, StreamOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Round-2 streaming coverage: the two-sided changelog joins (SURVEY §2.4
  * "streaming two-sided changelog join" / "streaming semi/anti join" — the
  * round-1 verdict's #1 and #2 gaps).
  *
  * Gating pattern (the q_changelog_agg layout): both sides staged as two
  * replayed micro-batches via [[StreamOps.stageBatches]], the operator's
  * full +I/-D changelog collected from an Update-mode memory sink, then
  * MATERIALIZED (net-positive rows) and hash-compared against the
  * equivalent DuckDB batch join — retraction correctness is exactly what
  * makes the materialized state equal the batch answer, since batch 1
  * null-pads lefts whose right arrives only in batch 2. Row-kind sequences
  * are pinned per-batch in StreamingSpec. */
object Streaming2Queries {

  private def san(dir: String) = dir.replaceAll("[^A-Za-z0-9]", "_")

  /** Tagged changelog-join input: left = pricey purchases, right = severe
    * errors (a right-sparse selection so some keys stay null-padded),
    * replayed as two batches split by event-id parity. */
  private def stagedJoinStream(s: SparkSession, dir: String, tag: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val left = ev.filter(col("event_type") === "purchase" && col("value") > 9.0)
      .select(col("user_id").as("key"), lit(0).as("side"), lit("+I").as("kind"),
              col("event_id").as("id"), col("event_id").as("seq"))
    val right = ev.filter(col("event_type") === "error" && col("value") > 90.0)
      .select(col("user_id").as("key"), lit(1).as("side"), lit("+I").as("kind"),
              col("event_id").as("id"), col("event_id").as("seq"))
    val tagged = left.unionByName(right)
    val srcDir = StreamOps.stageBatches(s, s"chjoin_${tag}_${san(dir)}", Seq(
      tagged.filter(col("id") % 2 === 0), tagged.filter(col("id") % 2 === 1)))
    s.readStream.schema(tagged.schema).option("maxFilesPerTrigger", "1").parquet(srcDir)
  }

  private val oSides = """
    l AS (SELECT user_id, event_id FROM events WHERE event_type = 'purchase' AND value > 9.0),
    r AS (SELECT user_id, event_id FROM events WHERE event_type = 'error' AND value > 90.0)"""

  /** Streaming LEFT OUTER changelog join — ref StreamingJoinOperator
    * .java:36. The materialized changelog must equal the batch left join:
    * null-padded batch-1 rows whose right arrives in batch 2 are retracted
    * (-D) and replaced, which only a retracting operator can produce. */
  val qStreamChangelogJoin: Q = Q(
    run = (s, dir) => {
      val changelog = StreamOps.runToMemory(
        s, StreamJoin.changelogJoin(s, stagedJoinStream(s, dir, "lo"), "left_outer"),
        OutputMode.Update())
      StreamJoin.materialize(changelog)
        .select(col("key"), col("l_id"), col("r_id"))
        .orderBy(col("key"), col("l_id"), col("r_id"))
    },
    oracle = Some(s"""
      WITH $oSides
      SELECT l.user_id AS key, l.event_id AS l_id, r.event_id AS r_id
      FROM l LEFT JOIN r USING (user_id)
      ORDER BY key, l_id, r_id"""))

  /** Streaming SEMI join (IN/EXISTS on streams) — ref
    * StreamingSemiAntiJoinOperator.java:34: a left row is live while its
    * key has at least one right row. */
  val qStreamSemiJoin: Q = Q(
    run = (s, dir) => {
      val changelog = StreamOps.runToMemory(
        s, StreamJoin.changelogJoin(s, stagedJoinStream(s, dir, "semi"), "semi"),
        OutputMode.Update())
      StreamJoin.materialize(changelog)
        .select(col("key"), col("l_id"))
        .orderBy(col("key"), col("l_id"))
    },
    oracle = Some(s"""
      WITH $oSides
      SELECT user_id AS key, event_id AS l_id FROM l
      WHERE EXISTS (SELECT 1 FROM r WHERE r.user_id = l.user_id)
      ORDER BY key, l_id"""))

  /** Streaming ANTI join (NOT EXISTS on streams) — same operator family;
    * batch-1 "no match yet" emissions are retracted when the key's first
    * right row lands in batch 2, so the materialized state is the true
    * NOT EXISTS — the shape an append-only operator cannot produce. */
  val qStreamAntiJoin: Q = Q(
    run = (s, dir) => {
      val changelog = StreamOps.runToMemory(
        s, StreamJoin.changelogJoin(s, stagedJoinStream(s, dir, "anti"), "anti"),
        OutputMode.Update())
      StreamJoin.materialize(changelog)
        .select(col("key"), col("l_id"))
        .orderBy(col("key"), col("l_id"))
    },
    oracle = Some(s"""
      WITH $oSides
      SELECT user_id AS key, event_id AS l_id FROM l
      WHERE NOT EXISTS (SELECT 1 FROM r WHERE r.user_id = l.user_id)
      ORDER BY key, l_id"""))

  val all: Map[String, Q] = scala.collection.immutable.ListMap(
    "q_stream_changelog_join" -> qStreamChangelogJoin,
    "q_stream_semi_join" -> qStreamSemiJoin,
    "q_stream_anti_join" -> qStreamAntiJoin,
  )
}
