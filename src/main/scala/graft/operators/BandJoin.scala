package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** KEYLESS band join — pairs (l, r) with `r.v − l.v ∈ [lo, hi]` and no
  * equi key at all.
  *
  * The reference plans this shape as a nested-loop join
  * (flink-table-planner-blink `BatchExecNestedLoopJoinRule.scala` — the
  * only rule that fires when `joinInfo.pairs().isEmpty`), and Spark does
  * the same (BroadcastNestedLoopJoin): O(|L|·|R|) comparisons, the
  * classic 100 TB scan-killer. The standard scale rewrite bins the range
  * dimension: with bin width W = max(hi − lo, 1), a right row lands in
  * bin ⌊v/W⌋ and a left row's admissible interval [v+lo, v+hi] covers at
  * most TWO consecutive bins — so exploding the left side to those bins
  * turns the band into an EQUI join on the bin id plus a residual range
  * filter. Each qualifying pair matches in exactly one bin (the right
  * row's), so no dedup pass is needed. Cost: one ≤2× explode + one hash
  * shuffle on a well-distributed key, instead of |L|·|R|.
  *
  * Values must be integral (e.g. epoch micros); all bin arithmetic is
  * 64-bit integer division — no doubles anywhere near the bin boundary. */
object BandJoin {

  def bandJoin(left: DataFrame, right: DataFrame,
               leftVal: String, rightVal: String, lo: Long, hi: Long): DataFrame = {
    require(hi >= lo, s"empty band [$lo, $hi]")
    val w = math.max(hi - lo, 1L)
    val l = left.withColumn("__lbin",
      explode(sequence(expr(s"($leftVal + $lo) div $w"), expr(s"($leftVal + $hi) div $w"))))
    val r = right.withColumn("__rbin", expr(s"$rightVal div $w"))
    l.join(r, col("__lbin") === col("__rbin") &&
              col(rightVal) >= col(leftVal) + lit(lo) &&
              col(rightVal) <= col(leftVal) + lit(hi))
      .drop("__lbin", "__rbin")
  }
}
