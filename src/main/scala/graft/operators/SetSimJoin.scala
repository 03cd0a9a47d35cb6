package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prefix-filtered set-similarity self-join (Jaccard ≥ t) — the classic
  * SSJoin/PPJoin candidate-pruning design (Chaudhuri et al., "A Primitive
  * Operator for Similarity Joins"; Xiao et al., PPJoin) that makes
  * all-pairs near-dup detection sub-quadratic at corpus scale.
  *
  * Key fact: if J(A,B) ≥ t then A and B must share ≥1 element among the
  * first ⌊(1−t)·|A|⌋+1 elements of A under ANY global canonical order. So
  * only each set's PREFIX enters the inverted-index join that generates
  * candidates; the full sets are only touched again to count intersections
  * for the (much smaller) candidate list. Ordering rarest-element-first
  * (ascending document frequency) minimizes prefix collisions — the same
  * frequency trick PPJoin uses.
  *
  * Lossless: the result is EXACTLY all pairs with J ≥ t (the DuckDB oracle
  * for q_pipe_jaccard computes the naive full join — the hash-match is the
  * proof). At 100 TB the wins compound: the candidate join shuffles only
  * prefix tokens (≈(1−t) of the index), and intersection counting is
  * candidate-driven rather than pair-expansion-driven.
  *
  * @param sets (setId: long "doc_id", element id: long "shid") distinct pairs
  */
object SetSimJoin {

  def jaccardSelfJoin(sets: DataFrame, threshold: Double): DataFrame = {
    val sizes = sets.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val df = sets.groupBy(col("shid")).agg(count(lit(1)).as("df"))

    // canonical order: rarest first, id tie-break (deterministic)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("shid"))
    val pref = sets.join(df, "shid").join(sizes, "doc_id")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= floor(col("sz") * lit(1.0 - threshold)) + 1)
      .select(col("doc_id"), col("shid"), col("sz"))

    // PPJoin's LENGTH filter applied at probe time (also lossless:
    // |A∩B| ≥ t·|A∪B| ≥ t·max ⟹ min ≥ t·max): candidates with
    // incompatible sizes never leave the index join — on low-diversity
    // token distributions this is the difference between the candidate
    // set being |near-dups| and being |shared-prefix-token pairs|
    val cand = pref.as("a").join(pref.as("b"),
        col("a.shid") === col("b.shid") && col("a.doc_id") < col("b.doc_id") &&
          least(col("a.sz"), col("b.sz")) >=
            ceil(greatest(col("a.sz"), col("b.sz")) * lit(threshold)))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()

    // candidate-driven intersection count: fan out candidates over d1's
    // elements, then key-join against d2's elements
    val inter = cand
      .join(sets.select(col("doc_id").as("d1"), col("shid")), "d1")
      .join(sets.select(col("doc_id").as("d2b"), col("shid").as("shid2")),
            col("d2") === col("d2b") && col("shid") === col("shid2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("inter"))

    inter
      .join(sizes.select(col("doc_id").as("d1"), col("sz").as("s1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("sz").as("s2")), "d2")
      .withColumn("jac", col("inter").cast("double") / (col("s1") + col("s2") - col("inter")).cast("double"))
      .filter(col("jac") >= threshold)
      .select(col("d1"), col("d2"), col("inter"), col("jac"))
  }
}
