package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Transactional sink patterns (SURVEY §2.1): TwoPhaseCommitSinkFunction →
  * `foreachBatch` + idempotent batchId-keyed writes; streaming datagen →
  * the rate source. */
class SinkSpec extends SparkTestBase {

  test("foreachBatch with batchId-keyed overwrite is an idempotent 2PC sink") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val out = "/tmp/graft_2pc_sink"
    val p = java.nio.file.Paths.get(out)
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(x => java.nio.file.Files.deleteIfExists(x))
    }
    val in = MemoryStream[Long]
    // ref TwoPhaseCommitSinkFunction.java:77: the txn identity is the
    // checkpoint; here the batchId — overwrite per batchId = replay-safe
    val q = in.toDF().writeStream.foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
      df.write.mode("overwrite").parquet(s"$out/batch_id=$batchId")
      // simulate a replay of the same epoch: second write must not duplicate
      df.write.mode("overwrite").parquet(s"$out/batch_id=$batchId")
    }.start()
    in.addData(1L, 2L, 3L)
    q.processAllAvailable()
    in.addData(4L)
    q.processAllAvailable()
    q.stop()
    val rows = s.read.parquet(out).select(col("value")).as[Long].collect().sorted.toSeq
    assert(rows == Seq(1L, 2L, 3L, 4L)) // no duplicates despite the double-write
  }

  test("restart from checkpoint resumes where the stopped query left off (exactly-once)") {
    val s = spark
    import s.implicits._
    val base = "/tmp/graft_ckpt_restart"
    val p = java.nio.file.Paths.get(base)
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(x => java.nio.file.Files.deleteIfExists(x))
    }
    val (src, ckpt, out) = (s"$base/src", s"$base/ckpt", s"$base/out")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    // the checkpoint IS the savepoint: offsets + sink commit log survive the
    // stop; a restarted query resumes from them (ref: checkpoint/restore —
    // CheckpointCoordinator; Spark spells it checkpointLocation)
    def run(): Unit = {
      val q = s.readStream.schema("v LONG").parquet(src)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def addFile(name: String, data: Seq[Long]): Unit = {
      val tmp = s"$base/stage_$name"
      data.toDF("v").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
        .filter(_.toString.endsWith(".parquet")).findFirst().get
      java.nio.file.Files.copy(part, java.nio.file.Paths.get(s"$src/$name.parquet"))
    }
    addFile("f0", Seq(1L, 2L, 3L))
    run() // run 1 consumes f0, then STOPS
    assert(s.read.parquet(out).as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    addFile("f1", Seq(4L, 5L))
    run() // restart: same checkpoint → f0 NOT reprocessed, no duplicates
    assert(s.read.parquet(out).as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("rate source is a live streaming datagen") {
    val s = spark
    val rate = s.readStream.format("rate").option("rowsPerSecond", "500").load()
    assert(rate.isStreaming && rate.columns.toSet == Set("timestamp", "value"))
    val q = rate.writeStream.format("memory").queryName("rate_t").outputMode("append").start()
    try {
      var waited = 0
      while (s.table("rate_t").isEmpty && waited < 15000) { Thread.sleep(500); waited += 500 }
      assert(!s.table("rate_t").isEmpty)
    } finally q.stop()
  }
}
