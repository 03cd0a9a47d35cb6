package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** allowedLateness dual-sink semantics (ref WindowedStream.java:108-124):
  * with per-trigger watermark commits (MemoryStream + processAllAvailable)
  * the main agg's drop set and the side classifier's capture set coincide
  * exactly — slightly-late rows (inside the lateness bound) reach the main
  * window, expired-window rows land only in the side sink. */
class LateSideOutputSpec extends SparkTestBase {

  test("slightly-late row joins its window; expired-window row goes to the side sink") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val in = MemoryStream[(Long, Long, Long)] // user_id, event_id, tsSec
    def src = in.toDF().toDF("user_id", "event_id", "tsSec")
      .withColumn("ts", expr("timestamp_micros(tsSec * 1000000)")).drop("tsSec")

    val main = src.withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes")).agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("ws"), col("n"))
      .writeStream.format("memory").queryName("late_main").outputMode("append").start()
    val side = StreamOps.lateSideOutput(s, src, 10L * 60 * 1000000, "30 minutes")
      .writeStream.format("memory").queryName("late_side").outputMode("update").start()
    def syncAll(): Unit = { main.processAllAvailable(); side.processAllAvailable() }

    in.addData((1L, 1L, 3000L)); syncAll() // watermark -> 3000-1800 = 1200
    // on-time (3100), slightly late (1300: window end 1800 > 1200 -> admitted),
    // expired (100: window end 600 <= 1200 -> dropped from main, captured by side)
    in.addData((1L, 2L, 3100L), (1L, 3L, 1300L), (1L, 4L, 100L)); syncAll()
    in.addData((1L, 5L, 9000L)); syncAll() // advance watermark -> 7200, flush

    val mainRows = s.table("late_main").as[(Long, Long)].collect().toSet
    val sideRows = s.table("late_side").as[(Long, Long)].collect().toSet
    main.stop(); side.stop()
    assert(mainRows == Set((3000L, 2L), (1200L, 1L))) // 3000+3100 together; 1300 admitted late
    assert(sideRows == Set((1L, 4L)))                 // only the expired-window row
  }
}
