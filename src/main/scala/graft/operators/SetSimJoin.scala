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

    // The final keep test is fl(|A∩B| / |A∪B|) >= t in IEEE doubles, and
    // round-to-nearest can round a quotient UP onto t — a pair whose REAL
    // Jaccard sits half an ulp BELOW t still qualifies (fl(14/25) == the
    // double 0.56 ≈ 0.56000000000000005). So every pruning bound must be
    // the exact dual of that double comparison, never real-arithmetic
    // algebra on t: the textbook prefix ⌊(1−t)·|A|⌋+1 pruned that very
    // pair. Dual form: the smallest intersection a size-sz set can carry
    // through the final filter (self-join ⟹ union ≥ sz, and fl is
    // monotone in the real quotient) is Lmin = min{ i : fl(i/sz) >= t },
    // so prefix length sz − Lmin + 1 is lossless BY CONSTRUCTION against
    // the final filter. Lmin is located exactly: ceil(sz·t) is within one
    // of it, and the CASE probes the same double division the final
    // filter evaluates.
    val tl = lit(threshold)
    val l0 = ceil(col("sz") * tl).cast("long")
    val lmin = greatest(lit(1L),
      when((l0 - 1).cast("double") / col("sz").cast("double") >= tl, l0 - 1)
        .when(l0.cast("double") / col("sz").cast("double") >= tl, l0)
        .otherwise(l0 + 1))

    // canonical order: rarest first, id tie-break (deterministic)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("shid"))
    val pref = sets.join(df, "shid").join(sizes, "doc_id")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("sz") - lmin + 1)
      .select(col("doc_id"), col("shid"), col("sz"))

    // PPJoin's LENGTH filter applied at probe time (also lossless:
    // |A∩B| ≥ t·|A∪B| ≥ t·max ⟹ min ≥ t·max): candidates with
    // incompatible sizes never leave the index join — on low-diversity
    // token distributions this is the difference between the candidate
    // set being |near-dups| and being |shared-prefix-token pairs|.
    // Spelled as the SAME double division the final jac filter uses
    // (min/max ≥ t, the pair's best-possible jac at inter = min), NOT as
    // `min >= ceil(max * t)`: the ceil form is lossy at representation
    // boundaries — ceil(50 * 0.14) = ceil(7.000000000000001) = 8 prunes
    // the qualifying subset pair J = 7/50 = 0.14 ≥ 0.14. IEEE division is
    // monotone in the real quotient and inter ≤ min ⟹ jac ≤ min/max, so
    // min/max < t (double) implies the final filter rejects too —
    // exactly lossless, identically selective away from the boundary.
    val cand = pref.as("a").join(pref.as("b"),
        col("a.shid") === col("b.shid") && col("a.doc_id") < col("b.doc_id") &&
          least(col("a.sz"), col("b.sz")).cast("double") /
            greatest(col("a.sz"), col("b.sz")).cast("double") >= lit(threshold))
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
