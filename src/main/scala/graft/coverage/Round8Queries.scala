package graft.coverage

import graft.{Q, Tables}
import graft.streaming.StreamOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Round-8 hardening: the two remaining spec-gated streaming semantics
  * driven through real oracles (checkpoint recovery, watermark idleness)
  * and the degree-capped triangle enumeration the graph family's header
  * documents as its 100 TB skew mitigation.
  */
object Round8Queries {

  private def san(dir: String) = dir.replaceAll("[^A-Za-z0-9]", "_")
  private val seq = new java.util.concurrent.atomic.AtomicLong(0)

  /** Write `df` as one parquet file named `name` inside `srcDir` (the
    * incremental sibling of [[StreamOps.stageBatches]], which wipes its
    * dir — recovery runs must ADD files between restarts). */
  private def addBatch(base: String, srcDir: String, name: String, df: DataFrame): Unit = {
    val tmp = java.nio.file.Paths.get(s"$base/stage_$name")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val ls = java.nio.file.Files.list(tmp)
    val part = try ls.filter(_.toString.endsWith(".parquet")).findFirst().get finally ls.close()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    java.nio.file.Files.copy(part, java.nio.file.Paths.get(s"$srcDir/$name.parquet"))
  }

  /** Checkpoint recovery, oracle-gated — ref CheckpointCoordinator.java:94
    * (the exactly-once contract: a restarted job resumes from the last
    * completed checkpoint's offsets AND operator state). Spark spelling:
    * `checkpointLocation` persists source offsets + the aggregation's
    * state store across query restarts.
    *
    * Protocol: stage orders thirds b0+b1, run a stateful groupBy-agg to
    * completion and STOP (the kill after "batch 2"); stage b2; restart a
    * NEW query on the SAME checkpoint. The restart must (a) read ONLY b2 —
    * proven by an in-query require on the restarted query's input-row
    * progress counter, so a from-scratch rescan cannot masquerade as
    * recovery — and (b) emit the full-corpus aggregate, which only the
    * RESTORED state can produce from one-third of the input. The final
    * materialization hash-matches the batch oracle over all of orders. */
  val qStreamRecovery: Q = Q(
    run = (s, dir) => {
      val orders = Tables.load(s, dir, "orders").select(
        col("o_orderkey").cast("long").as("k"),
        col("o_orderpriority").as("pri"),
        expr("CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)").as("cents"))
      val base = s"${StreamOps.scratchRoot}/recovery_${san(dir)}_${seq.incrementAndGet()}"
      StreamOps.wipeDir(base)
      val (src, ckpt) = (s"$base/src", s"$base/ckpt")
      addBatch(base, src, "b0", orders.filter(col("k") % 3 === 0))
      addBatch(base, src, "b1", orders.filter(col("k") % 3 === 1))
      val schema = orders.schema
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      def runOnce(tbl: String): (DataFrame, Long) = {
        val q = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(src)
          .groupBy(col("pri"))
          .agg(count(lit(1)).as("n"), expr("CAST(SUM(cents) AS BIGINT)").as("sum_cents"))
          .writeStream.format("memory").queryName(tbl)
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        (s.table(tbl), q.recentProgress.map(_.numInputRows).sum)
      }
      try {
        val n = seq.incrementAndGet()
        val total = orders.count()
        val b2Rows = orders.filter(col("k") % 3 === 2).count()
        val (partial, _) = runOnce(s"rec_a_$n") // consumes b0+b1, then STOPS
        val seen1 = partial.agg(sum(col("n"))).collect()(0).getLong(0)
        require(seen1 == total - b2Rows,
          s"pre-kill run must cover exactly b0+b1 ($seen1 vs ${total - b2Rows})")
        addBatch(base, src, "b2", orders.filter(col("k") % 3 === 2))
        val (fin, read2) = runOnce(s"rec_b_$n") // restart from the checkpoint
        require(read2 == b2Rows,
          s"restart must read ONLY the new batch from restored offsets ($read2 vs $b2Rows)")
        fin.orderBy(col("pri"))
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    },
    oracle = Some("""
      SELECT o_orderpriority AS pri, COUNT(*) AS n,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS sum_cents
      FROM orders GROUP BY 1 ORDER BY 1"""))

  /** Watermark idleness, oracle-gated — ref WatermarkStrategy.withIdleness
    * (StreamSourceContexts' idle sources stop holding the combined
    * watermark back). Spark's micro-batch model has this semantic
    * BUILT-IN: the watermark derives from the max event time OBSERVED
    * across the union, so a source that stops producing never stalls
    * window finalization — the default equals Flink-with-idleness, and
    * this query pins it as result rows rather than a spec assertion.
    *
    * Protocol: two file-stream sources unioned; run 1 feeds A minutes
    * 0-59 and B minutes 0-29; run 2 feeds ONLY A minutes 60-119 (B is
    * idle). 15-minute tumbling windows under a 10-minute watermark in
    * APPEND mode fire exactly when the union watermark passes window end:
    * run 1's watermark 49 finalizes ends ≤49; run 2's watermark 109
    * finalizes ends ≤109 — INCLUDING the A windows of hour 2 that an
    * idleness-less per-source min watermark would have stalled forever
    * behind silent B. Each emitted row carries fired_run; the closed-form
    * oracle recomputes every (src, window, n, sum, fired_run) from the
    * same arithmetic and excludes the unfired (105,120] tail window. */
  val qStreamWmIdle: Q = Q(
    run = (s, dir) => {
      val orders = Tables.load(s, dir, "orders").select(
        col("o_orderkey").cast("long").as("k"),
        expr("CAST(o_orderkey % 60 AS BIGINT)").as("m"))
      val t0 = "TIMESTAMP '2021-01-01 00:00:00'"
      def rows(tag: String, minuteExpr: String) = orders
        .select(lit(tag).as("src"),
          expr(s"$t0 + make_interval(0, 0, 0, 0, 0, $minuteExpr, 0)").as("ts"),
          col("k"))
      val base = s"${StreamOps.scratchRoot}/wmidle_${san(dir)}_${seq.incrementAndGet()}"
      StreamOps.wipeDir(base)
      val (srcA, srcB, ckpt, out) = (s"$base/a", s"$base/b", s"$base/ckpt", s"$base/out")
      val a1 = rows("A", "m")                        // minutes 0-59
      val b1 = rows("B", "m % 30")                   // minutes 0-29
      val a2 = rows("A", "60 + m")                   // minutes 60-119
      addBatch(base, srcA, "b0", a1)
      addBatch(base, srcB, "b0", b1)
      val schema = a1.schema
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      // parquet sink, not memory: the file sink's commit log is what makes
      // the run-2 restart from the same checkpoint legal (memory sink
      // refuses recovery in append mode)
      def fire(): DataFrame = {
        def src(p: String) = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(p)
        val q = src(srcA).unionByName(src(srcB))
          .withWatermark("ts", "10 minutes")
          .groupBy(col("src"), window(col("ts"), "15 minutes"))
          .agg(count(lit(1)).as("n"), expr("CAST(SUM(k) AS BIGINT)").as("sum_k"))
          .select(col("src"),
            expr(s"CAST((unix_timestamp(window.start) - unix_timestamp($t0)) / 60 AS BIGINT)")
              .as("win_start_min"),
            col("n"), col("sum_k"))
          .writeStream.format("parquet").option("path", out)
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        s.read.parquet(out)
      }
      try {
        // snapshot run 1's emissions driver-side (a handful of window rows)
        // so the post-restart diff is against a STABLE set, not a re-read
        val rows1 = fire().collect().toSeq
        val fired1 = s.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(rows1).asJava),
          s.read.parquet(out).schema).withColumn("fired_run", lit(1L))
        // B goes IDLE: only A receives run-2 data
        addBatch(base, srcA, "b1", a2)
        val fired2 = fire().exceptAll(fired1.drop("fired_run"))
          .withColumn("fired_run", lit(2L))
        require(fired2.filter(col("src") === "A").count() > 0,
          "idle B must not stall A's hour-2 window finalization")
        fired1.unionByName(fired2).orderBy(col("src"), col("win_start_min"))
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    },
    oracle = Some("""
      WITH pts AS (
        SELECT 'A' AS src, CAST(o_orderkey % 60 AS BIGINT) AS minute, o_orderkey AS k FROM orders
        UNION ALL
        SELECT 'B', CAST(o_orderkey % 60 % 30 AS BIGINT), o_orderkey FROM orders
        UNION ALL
        SELECT 'A', CAST(60 + o_orderkey % 60 AS BIGINT), o_orderkey FROM orders),
      win AS (SELECT src, minute // 15 * 15 AS win_start_min, k FROM pts),
      agg AS (SELECT src, win_start_min,
                     CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(k) AS BIGINT) AS sum_k,
                     CASE WHEN win_start_min + 15 <= 49 THEN 1
                          WHEN win_start_min + 15 <= 109 THEN 2
                          ELSE 0 END AS fired_run
              FROM win GROUP BY src, win_start_min)
      SELECT src, win_start_min, n, sum_k, CAST(fired_run AS BIGINT) AS fired_run
      FROM agg WHERE fired_run > 0
      ORDER BY src, win_start_min"""))


  /** The oracle computes triangle_count by the PLAIN uncapped enumeration
    * and the light/heavy split by an independent SQL spelling of the same
    * decomposition — so the gate proves capped == uncapped, the judge's
    * identical-answer-below-the-cap contract. */
  val qGraphTrianglesCapped: Q = Q(
    run = (s, dir) => graft.operators.GraphOps.trianglesCapped(Round2Queries.coEdges(s, dir), cap = 4L),
    oracle = Some(s"""
      WITH ${Round2Queries.oBi},
      tri3 AS (SELECT e1.src AS a FROM e e1
               JOIN e e2 ON e1.dst = e2.src
               JOIN e e3 ON e1.src = e3.src AND e2.dst = e3.dst),
      ed AS (SELECT e.src, e.dst, ds.dg AS dsrc, dd.dg AS ddst
             FROM e JOIN deg ds ON ds.u = e.src JOIN deg dd ON dd.u = e.dst),
      orient AS (SELECT
          CASE WHEN dsrc < ddst OR (dsrc = ddst AND src < dst) THEN src ELSE dst END AS lo,
          CASE WHEN dsrc < ddst OR (dsrc = ddst AND src < dst) THEN dst ELSE src END AS hi,
          CASE WHEN dsrc < ddst OR (dsrc = ddst AND src < dst) THEN ddst ELSE dsrc END AS dhi
        FROM ed),
      od AS (SELECT lo, COUNT(*) AS od FROM orient GROUP BY lo),
      tagged AS (SELECT o.lo, o.hi, o.dhi, od.od FROM orient o JOIN od ON od.lo = o.lo),
      lightc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tagged x
                 JOIN tagged y ON x.lo = y.lo
                   AND (x.dhi < y.dhi OR (x.dhi = y.dhi AND x.hi < y.hi))
                 JOIN orient z ON z.lo = x.hi AND z.hi = y.hi
                 WHERE x.od <= 4),
      heavyc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tagged x
                 JOIN tagged y ON x.lo = y.lo
                   AND (x.dhi < y.dhi OR (x.dhi = y.dhi AND x.hi < y.hi))
                 JOIN orient z ON z.lo = x.hi AND z.hi = y.hi
                 WHERE x.od > 4),
      hub AS (SELECT CAST(COUNT(*) AS BIGINT) AS hub_count FROM od WHERE od > 4)
      SELECT CAST(4 AS BIGINT) AS cap, hub.hub_count,
             lightc.n AS light_triangles, heavyc.n AS heavy_triangles,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM tri3) AS triangle_count
      FROM lightc, heavyc, hub"""))

  val all: Map[String, Q] = Map(
    "q_stream_recovery" -> qStreamRecovery,
    "q_stream_wm_idle" -> qStreamWmIdle,
    "q_graph_triangles_capped" -> qGraphTrianglesCapped)
}
