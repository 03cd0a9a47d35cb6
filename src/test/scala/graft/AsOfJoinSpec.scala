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

  test("a NULL in one payload column does not mix right versions or drop the row") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 150L, "p1"), (1L, 250L, "p2"))
      .toDF("k", "t", "pid").withColumn("ts", expr("timestamp_micros(t)")).drop("t")
    // newest right version (t=200) has a NULL in `b` — the carried payload
    // must be (a2, NULL), not (a2, b1) mixed from the older version
    val right = Seq((1L, 100L, Some("a1"), Some("b1")), (1L, 200L, Some("a2"), None))
      .toDF("k", "t", "a", "b").withColumn("ts", expr("timestamp_micros(t)")).drop("t")
    val out = AsOfJoin.asOf(left, right, "k", "ts", "ts", Map("a" -> "ca", "b" -> "cb"))
      .select("pid", "ca", "cb").as[(String, String, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("p1") == (("a1", Some("b1"))))
    assert(out("p2") == (("a2", None))) // same-version fields, row kept
  }
}
