package graft.coverage

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 analytics additions — three ops a production corpus/product
  * pipeline runs constantly that the corpus did not yet cover:
  *
  *  - COHORT RETENTION (first-seen cohort × activity-offset matrix) — the
  *    batch analog of the reference's keyed first-event state + windowed
  *    distinct counts (ref flink-streaming-java KeyedStream + the SQL
  *    distinct agg family, flink-table-planner-blink
  *    stream/StreamExecGroupAggregate.java); here two hash aggregates
  *    sharing one user_id exchange.
  *  - TIME-SERIES GAP FILL + FORWARD FILL — Flink users hand-roll this with
  *    a KeyedProcessFunction + event-time timers that fire per missing
  *    interval (ref KeyedProcessOperator.java + timer service); declaratively
  *    it is a per-key day spine (sequence+explode — generated IN the plan,
  *    no driver loop) left-joined and filled with last-non-null over an
  *    ordered window.
  *  - EDIT-DISTANCE-VERIFIED NEAR-DUP — the missing verify stage of the
  *    dedup family: cheap bucket candidates (equi join, never all-pairs)
  *    then an exact Levenshtein check on a bounded prefix. Levenshtein is
  *    codegen'd in Spark (stringExpressions.Levenshtein), O(p²) per pair on
  *    the 128-char prefix, with pair count bounded by the band geometry.
  */
object Round5bQueries {

  /** Cohort retention over `events`: cohort = user's first active day,
    * cell = distinct users from that cohort active at each day offset.
    *
    * Plan: hash agg (min day per user, map-side partial) → shuffle-join back
    * on user_id → hash agg on (cohort, offset) with a distinct-agg expand.
    * Both aggs and the join key off the SAME user_id exchange; at 100 TB the
    * only wide move is the user_id shuffle, and the output is
    * |cohorts|×|offsets| — tiny. No window-over-all-events, no driver state. */
  val qPipeCohortRetention: Q = Q(
    run = (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"),
                datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
                  .cast("long").as("day"))
      val first = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      ev.join(first, Seq("user_id"))
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("active_users"))
        .orderBy(col("cohort_day"), col("day_offset"))
    },
    oracle = Some("""
      WITH ev AS (
        SELECT user_id,
               CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day
        FROM events),
      first AS (SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id)
      SELECT f.cohort_day, ev.day - f.cohort_day AS day_offset,
             COUNT(DISTINCT ev.user_id) AS active_users
      FROM ev JOIN first f USING (user_id)
      GROUP BY f.cohort_day, day_offset
      ORDER BY f.cohort_day, day_offset"""))

  /** Daily gap fill + forward fill per event_type. The event stream is
    * sparsified (event_id % 37) so real gaps exist; the day spine is built
    * per key from its own min/max via sequence()+explode INSIDE the plan
    * (the spine never touches the driver), left-joined to the daily agg and
    * forward-filled with last(ignoreNulls) over an ordered per-key window.
    *
    * Scale: spine size = keys × days (rows are cheap, generated post-agg);
    * the window partitions by event_type only — fine because the per-key
    * day count is bounded by the calendar, not the data volume. */
  val qPipeGapFill: Q = Q(
    run = (s, dir) => {
      val daily = Tables.load(s, dir, "events")
        .filter(expr("event_id % 37 = 0"))
        .groupBy(col("event_type"),
                 datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
                   .cast("long").as("day"))
        .agg(sum(expr("CAST(FLOOR(value * 100.0) AS BIGINT)")).as("val_c"))
      val spine = daily.groupBy(col("event_type"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("event_type"), explode(sequence(col("d0"), col("d1"))).as("day"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"),
                last(col("val_c"), ignoreNulls = true).over(w).as("val_fill"),
                col("val_c").isNull.cast("int").as("was_gap"))
        .orderBy(col("event_type"), col("day"))
    },
    oracle = Some("""
      WITH daily AS (
        SELECT event_type,
               CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day,
               CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) AS BIGINT) AS val_c
        FROM events WHERE event_id % 37 = 0 GROUP BY 1, 2),
      spine AS (
        SELECT event_type, UNNEST(range(d0, d1 + 1)) AS day
        FROM (SELECT event_type, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1)),
      joined AS (
        SELECT s.event_type, s.day, d.val_c
        FROM spine s LEFT JOIN daily d ON s.event_type = d.event_type AND s.day = d.day)
      SELECT event_type, day,
             LAST_VALUE(val_c IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS val_fill,
             CAST(val_c IS NULL AS INT) AS was_gap
      FROM joined ORDER BY event_type, day"""))

  /** Near-dup candidate pairs from the MinHash-LSH band join
    * ([[PipelineQueries.minhashPairs]] — docs pair ONLY when a 4-row band
    * signature collides), verified with EXACT Levenshtein on the 128-char
    * prefix and a relative threshold (dist·10 ≤ max prefix length). The
    * candidate stage is the sub-quadratic banded bucket join (no length
    * boundary to straddle, no skewed (lang, source) population to go
    * quadratic — band keys are hash-uniform); the O(p²) verify runs only
    * on colliding pairs, p=128 bounds per-pair cost. This is exactly the
    * candidate→verify split a 100 TB near-dup pass uses. */
  val qPipeDedupEdit: Q = Q(
    run = (s, dir) => {
      val pre = Tables.load(s, dir, "documents")
        .select(col("doc_id"), substring(col("text"), 1, 128).as("prefix"))
      val a = pre.toDF("doc_a", "pa")
      val b = pre.toDF("doc_b", "pb")
      PipelineQueries.minhashPairs(s, dir)
        .toDF("doc_a", "doc_b")
        .join(a, "doc_a").join(b, "doc_b")
        .select(col("doc_a"), col("doc_b"),
                levenshtein(col("pa"), col("pb")).cast("long").as("dist"),
                greatest(length(col("pa")), length(col("pb"))).cast("long").as("plen"))
        .select(col("doc_a"), col("doc_b"), col("dist"),
                (col("dist") * lit(10L) <= col("plen")).cast("int").as("is_dup"))
        .orderBy(col("doc_a"), col("doc_b"))
    },
    oracle = Some(s"""
      WITH ${PipelineQueries.oMinhashCtes},
      pre AS (SELECT doc_id, substr(text, 1, 128) AS prefix FROM documents)
      SELECT p.d1 AS doc_a, p.d2 AS doc_b,
             CAST(levenshtein(a.prefix, b.prefix) AS BIGINT) AS dist,
             CAST(CAST(levenshtein(a.prefix, b.prefix) AS BIGINT) * 10
                   <= CAST(GREATEST(length(a.prefix), length(b.prefix)) AS BIGINT)
                  AS INT) AS is_dup
      FROM pairs p JOIN pre a ON a.doc_id = p.d1 JOIN pre b ON b.doc_id = p.d2
      ORDER BY doc_a, doc_b"""))

  /** Weight-proportional sampling WITHOUT replacement, exactly, with pure
    * integer math: replicate each doc into w units (w = ⌈n_chars/64⌉, via
    * sequence+explode INSIDE the plan), give each unit a deterministic
    * 60-bit hash, keep each doc's max unit hash, take the global top-25.
    * This is the classic "simulate each unit" reduction of weighted
    * sampling: P(doc in sample) is exactly the without-replacement
    * probability for integer weights, and — unlike the Efraimidis–Spirakis
    * u^(1/w) key — needs no transcendental math, so the oracle is
    * bit-exact. Plan: explode (×≤8) → hash agg max per doc (map-side
    * partial) → TakeOrdered 25. No global sort; the only shuffle carries
    * one row per doc. */
  val qPipeWeightedSample: Q = Q(
    run = (s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
                greatest(lit(1L), floor(col("n_chars") / lit(64.0)).cast("long")).as("w"))
      d.select(col("doc_id"), col("w"), explode(sequence(lit(1L), col("w"))).as("r"))
        .select(col("doc_id"), col("w"),
                graft.Queries.hashStr(
                  concat(col("doc_id").cast("string"), lit(":"), col("r").cast("string")))
                  .as("uk"))
        .groupBy(col("doc_id")).agg(max(col("w")).as("w"), max(col("uk")).as("unit_key"))
        .orderBy(col("unit_key").desc, col("doc_id"))
        .limit(25)
    },
    oracle = Some(s"""
      WITH d AS (
        SELECT doc_id, GREATEST(1, CAST(FLOOR(n_chars / 64.0) AS BIGINT)) AS w
        FROM documents),
      u AS (SELECT doc_id, w, UNNEST(range(1, w + 1)) AS r FROM d),
      k AS (SELECT doc_id, MAX(w) AS w,
                   MAX(${graft.Queries.oHash("CAST(doc_id AS VARCHAR) || ':' || CAST(r AS VARCHAR)")}) AS unit_key
            FROM u GROUP BY doc_id)
      SELECT doc_id, w, unit_key FROM k
      ORDER BY unit_key DESC, doc_id LIMIT 25"""))

  /** Session windows with BOTH a merge gap (30 min) and a MAX-DURATION cap
    * (10 min sub-splits) — the two-knob sessionization Flink users build
    * with a custom merging WindowAssigner + trigger (ref
    * EventTimeSessionWindows/ProcessingTimeSessionWindows merge logic +
    * DynamicEventTimeSessionWindows): gap-merge first, then split any
    * session longer than the cap at fixed offsets from ITS OWN start.
    * Declarative form: gap flags → running session counter → per-session
    * start → integer-division sub-window, all µs integer math so the oracle
    * is exact. Plan: one user_id exchange feeds the lag/sum windows, one
    * (user, sess) exchange the start; the final agg is a hash agg. */
  val qWindowSessionCapped: Q = Q(
    run = (s, dir) => {
      val w1 = Window.partitionBy(col("user_id")).orderBy(col("tsu"), col("event_id"))
      val wc = w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tsu"),
                expr("CAST(FLOOR(value * 100.0) AS BIGINT)").as("val_c"))
      ev.withColumn("new_sess",
          when(lag(col("tsu"), 1).over(w1).isNull ||
               col("tsu") - lag(col("tsu"), 1).over(w1) >= lit(1800000000L), 1L)
            .otherwise(0L))
        .withColumn("sess", sum(col("new_sess")).over(wc))
        .withColumn("sess_start",
          min(col("tsu")).over(Window.partitionBy(col("user_id"), col("sess"))))
        .withColumn("sub", expr("(tsu - sess_start) div 600000000"))
        .groupBy(col("user_id"), col("sess"), col("sub"))
        .agg(count(lit(1)).as("n"), sum(col("val_c")).as("val_sum"),
             (max(col("tsu")) - min(col("tsu"))).as("span_us"))
        .orderBy(col("user_id"), col("sess"), col("sub"))
    },
    oracle = Some("""
      WITH ev AS (
        SELECT user_id, event_id, epoch_us(ts) AS tsu,
               CAST(FLOOR(value * 100.0) AS BIGINT) AS val_c
        FROM events),
      f AS (
        SELECT *, CASE WHEN lag(tsu) OVER w IS NULL
                         OR tsu - lag(tsu) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_sess
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
      s AS (
        SELECT *, CAST(SUM(new_sess) OVER (
                 PARTITION BY user_id ORDER BY tsu, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess
        FROM f),
      t AS (SELECT *, MIN(tsu) OVER (PARTITION BY user_id, sess) AS sess_start FROM s)
      SELECT user_id, sess, (tsu - sess_start) // 600000000 AS sub,
             COUNT(*) AS n, CAST(SUM(val_c) AS BIGINT) AS val_sum,
             MAX(tsu) - MIN(tsu) AS span_us
      FROM t GROUP BY user_id, sess, (tsu - sess_start) // 600000000
      ORDER BY user_id, sess, sub"""))

  val all: Map[String, Q] = scala.collection.immutable.ListMap(
    "q_pipe_cohort" -> qPipeCohortRetention,
    "q_pipe_gap_fill" -> qPipeGapFill,
    "q_pipe_dedup_edit" -> qPipeDedupEdit,
    "q_pipe_weighted_sample" -> qPipeWeightedSample,
    "q_window_session_capped" -> qWindowSessionCapped,
  )
}
