package graft

import graft.streaming.RetractableTopN
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Round-8 operator specs: the degree-capped triangle enumeration's exact
  * split, and the hostile-input robustness contracts (null ranked ids,
  * zero-norm cosine, null media payloads) the adversarial fixture drove
  * out. */
class Round8Spec extends SparkTestBase {

  test("capped triangle count equals brute force on a 40-vertex LCG graph, any cap") {
    val s = spark
    import s.implicits._
    // deterministic pseudo-random graph with a planted hub (vertex 0 is
    // connected to everything → the degree-skew case the cap addresses)
    val n = 40
    var x = 7L
    val rnd = scala.collection.mutable.ListBuffer[(Long, Long)]()
    for (a <- 0 until n; b <- a + 1 until n) {
      x = (x * 1103515245L + 12345L) % 2147483648L
      if (x % 10 < 2 || a == 0) rnd += ((a.toLong, b.toLong))
    }
    val edges = rnd.toSeq.toDF("src", "dst")
    val adj = rnd.toSet
    var brute = 0L
    for (a <- 0 until n; b <- a + 1 until n; c <- b + 1 until n)
      if (adj((a, b)) && adj((b, c)) && adj((a, c))) brute += 1
    for (cap <- Seq(1L, 3L, 1000L)) {
      val row = graft.operators.GraphOps.trianglesCapped(edges, cap).head()
      val (hubs, light, heavy, total) =
        (row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
      assert(total == brute, s"cap=$cap: $total vs brute $brute")
      assert(light + heavy == total)
      if (cap == 1000L) assert(hubs == 0L && heavy == 0L) // cap above max od
      if (cap == 1L) assert(hubs > 0L && heavy > 0L)      // cap below: residual path live
    }
  }

  test("retractable top-n ranks a null id NULLS LAST instead of crashing") {
    val s = spark
    import s.implicits._
    val changelog = Seq(
      ("+I", "all", "alpha", 5L, 0L),
      ("+I", "all", null.asInstanceOf[String], 5L, 1L), // null id, TIED value
      ("+I", "all", "beta", 9L, 2L)
    ).toDF("kind", "pkey", "id", "value", "seq")
    val srcDir = graft.streaming.StreamOps.stageBatches(s, "r8_null_topn", Seq(changelog))
    val stream = s.readStream.schema(changelog.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val acc = graft.streaming.StreamOps.runToMemory(
      s, RetractableTopN.retractableTopN(s, stream, 3), OutputMode.Update())
    val ranking = RetractableTopN.latestRanking(acc)
      .orderBy(col("rn")).collect().map(r => (r.getInt(1), Option(r.getString(2))))
    assert(ranking.toSeq == Seq((1, Some("beta")), (2, Some("alpha")), (3, None)))
  }

  test("zero-norm vectors score cosine 0.0 and never divide by zero") {
    val s = spark
    import s.implicits._
    // initialize the registry root first: coverage objects and Queries
    // reference each other, and entering via a leaf object mid-test would
    // hit the uninitialized half of the cycle
    Queries.all
    val e = Seq(
      (1L, Array.fill(4)(0.5f)),             // unit-ish
      (2L, Array.fill(4)(0.0f)),             // ZERO vector
      (3L, Array(0.5f, 0.5f, 0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
    val nq = graft.plans.DotProductQExpr.dotQ(col("embedding"), col("embedding"), 1000000.0)
    val withN = e.withColumn("nq", nq)
    val a = withN.select(col("vec_id").as("v1"), col("embedding").as("e1"), col("nq").as("n1"))
    val b = withN.select(col("vec_id").as("v2"), col("embedding").as("e2"), col("nq").as("n2"))
    val dot = graft.plans.DotProductQExpr.dotQ(col("e1"), col("e2"), 1000000.0)
    val cos = a.join(b, col("v1") < col("v2"))
      .withColumn("cosv", coverage.PipelineQueries.cosQ(dot, col("n1"), col("n2")))
      .collect().map(r => (r.getLong(0), r.getLong(3)) -> r.getDouble(6)).toMap
    assert(cos((1L, 3L)) == 1.0)
    assert(cos((1L, 2L)) == 0.0 && cos((2L, 3L)) == 0.0) // zero-norm → defined 0
  }

  test("multimodal decode skips null payloads like the SQL path") {
    val s = spark
    import s.implicits._
    val assets = Seq((1L, "hello"), (2L, null.asInstanceOf[String]), (3L, "x"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val out = graft.operators.Multimodal.decodeFrames(s, assets).toDF()
    val ids = out.select("doc_id").distinct().as[Long].collect().toSet
    assert(ids == Set(1L, 3L)) // null payload decodes to no frames
  }
}
