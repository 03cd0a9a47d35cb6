package graft

import graft.operators.SetSimJoin
import org.apache.spark.sql.functions._

/** Prefix filtering is LOSSLESS for the threshold: the pruned join must
  * produce exactly the naive all-pairs result — verified on the fixture
  * shingle sets and on a hand-built edge case. */
class SetSimJoinSpec extends SparkTestBase {

  test("prefix-filtered join equals the naive join on fixture shingles") {
    val s = spark
    import s.implicits._
    val words = split(col("text"), " ")
    val sets = Tables.load(s, sfDir, "documents")
      .filter(size(words) >= 3)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(1), size(words) - 2),
          i => concat_ws(" ", element_at(words, i), element_at(words, i + 1), element_at(words, i + 2)))
      )).as("sh"))
      .select(col("doc_id"), Queries.hashStr(col("sh")).as("shid"))

    def naive(t: Double) = {
      val sizes = sets.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      sets.as("a").join(sets.as("b"), col("a.shid") === col("b.shid") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2")).agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("doc_id").as("d1"), col("sz").as("s1")), "d1")
        .join(sizes.select(col("doc_id").as("d2"), col("sz").as("s2")), "d2")
        .filter(col("inter").cast("double") / (col("s1") + col("s2") - col("inter")).cast("double") >= t)
        .select(col("d1"), col("d2"), col("inter"))
    }
    for (t <- Seq(0.5, 0.8)) {
      val expected = naive(t).as[(Long, Long, Long)].collect().toSet
      val got = SetSimJoin.jaccardSelfJoin(sets, t)
        .select(col("d1"), col("d2"), col("inter")).as[(Long, Long, Long)].collect().toSet
      assert(got == expected, s"threshold $t: prefix join diverged")
      assert(expected.nonEmpty || t > 0.5) // sanity: 0.5 finds the planted near-dups
    }
  }

  test("edge case: identical, disjoint and subset sets") {
    val s = spark
    import s.implicits._
    val sets = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 10L), (2L, 11L), (2L, 12L),  // identical to 1
      (3L, 99L),                         // disjoint
      (4L, 10L), (4L, 11L)               // subset of 1: J = 2/3
    ).toDF("doc_id", "shid")
    val out = SetSimJoin.jaccardSelfJoin(sets, 0.6)
      .select(col("d1"), col("d2")).as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (1L, 4L), (2L, 4L)))
  }
}
