package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** As-of join semantics on hand-built data: latest right ≤ left ts, equal-ts
  * inclusivity, no-prior-right drop (inner). */
class AsOfJoinSpec extends SparkTestBase {

  test("asOf picks latest right row at or before left ts, per key") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 205L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "t", "pid").withColumn("ts", expr("timestamp_micros(t)")).drop("t")
    val right = Seq((1L, 100L, "r_at_100"), (1L, 200L, "r_at_200"), (1L, 300L, "r_at_300"), (2L, 60L, "r_late"))
      .toDF("k", "t", "rid").withColumn("ts", expr("timestamp_micros(t)")).drop("t")
    val out = AsOfJoin.asOf(left, right, "k", "ts", "ts", Map("rid" -> "matched"))
      .select("pid", "matched").as[(String, String)].collect().toMap
    assert(out("p1") == "r_at_100") // equal ts is inclusive
    assert(out("p2") == "r_at_200") // latest ≤ 205
    assert(!out.contains("p3"))     // right row is later than left → dropped (inner)
  }
}
