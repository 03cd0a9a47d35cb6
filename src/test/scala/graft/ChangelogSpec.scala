package graft

import graft.datastream.DataStreamEnv
import graft.streaming.ChangelogAgg
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Changelog (+I/-U/+U) emission order across micro-batches + the typed
  * DataStream facade. */
class ChangelogSpec extends SparkTestBase {

  test("changelog agg emits +I then -U/+U pairs across batches") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val in = MemoryStream[String]
    val q = ChangelogAgg.countChangelog(s, in.toDF().withColumnRenamed("value", "k"), "k")
      .writeStream.format("memory").queryName("chg_t").outputMode("update").start()
    in.addData("a", "a", "b")
    q.processAllAvailable()
    val b1 = s.table("chg_t").as[(String, String, Long)].collect().toSet
    assert(b1 == Set(("+I", "a", 2L), ("+I", "b", 1L)))
    in.addData("a", "c")
    q.processAllAvailable()
    val all = s.table("chg_t").as[(String, String, Long)].collect().toSet
    q.stop()
    assert(all == Set(("+I", "a", 2L), ("+I", "b", 1L),
                      ("-U", "a", 2L), ("+U", "a", 3L), ("+I", "c", 1L)))
  }

  test("DataStream facade: fromElements → flatMap → keyBy → reduce") {
    val s = spark
    import s.implicits._
    val env = new DataStreamEnv(s)
    val out = env.fromElements("x y", "y z", "y")
      .flatMap(_.split(" ").toSeq)
      .map(w => (w, 1L))
      .keyBy(_._1)
      .reduce((a, b) => (a._1, a._2 + b._2))
      .collect().map(_._2).toSet
    assert(out == Set(("x", 1L), ("y", 3L), ("z", 1L)))
  }
}
