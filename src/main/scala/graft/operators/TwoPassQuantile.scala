package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EXACT distributed quantiles in two scans — no global sort.
  *
  * A naive exact quantile plans a full-relation sort (rangepartitioning +
  * per-partition sort of ALL rows — at 100 TB, the single most expensive
  * shuffle shape there is) or falls back to an approximate sketch
  * (percentile_approx, covered elsewhere). The classic exact alternative:
  *
  *   pass 1 — histogram the value into fixed power-of-two bins (one
  *            map-side-combined hash agg; ~hundreds of partials);
  *            the driver folds the tiny bin table into cumulative counts
  *            and locates, per requested quantile q, the bin holding
  *            global rank ceil(q·n) and the residual in-bin rank
  *            (bounded driver state — the GraphOps contract);
  *   pass 2 — re-scan ONLY the target bins (a selective filter), sort
  *            within each bin (rows/bin ≈ n/bins, independent of total n
  *            for a fixed value range), and pick the residual ranks via a
  *            broadcast join on (bin, in-bin row_number).
  *
  * The selected value at a rank is well-defined under ties regardless of
  * tie order, so the result is engine-exact: it equals the value at
  * 1-based rank ceil(q·n) of the fully sorted relation.
  *
  * `values` must be a non-negative BIGINT column expression (e.g. price
  * cents); `binShift` sets the bin width 2^binShift. `qs` are
  * (label, numerator, denominator) with rank k = ceil(n·num/den).
  */
object TwoPassQuantile {

  def exact(spark: SparkSession, df: DataFrame, valueExpr: String, binShift: Int,
            qs: Seq[(String, Long, Long)]): DataFrame = {
    val vals = df.select(expr(valueExpr).cast("long").as("v"))
      .withColumn("bin", shiftright(col("v"), binShift))
    // pass 1: fixed-size histogram; driver state = one row per occupied bin
    val hist = vals.groupBy("bin").agg(count(lit(1)).as("cnt"))
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = hist.map(_._2).sum
    val targets = qs.map { case (label, num, den) =>
      val k = (n * num + den - 1) / den // ceil(n·q), 1-based global rank
      var cum = 0L
      val (bin, before) = hist.collectFirst {
        case (b, c) if { val ok = cum + c >= k; if (!ok) cum += c; ok } => (b, cum)
      }.getOrElse(throw new IllegalStateException(s"rank $k beyond n=$n"))
      (label, k, bin, k - before) // residual rank inside the bin
    }
    import spark.implicits._
    val t = spark.createDataset(targets).toDF("ql", "rank", "tbin", "inbin")
    // pass 2: only the target bins are re-read and sorted (tiny fraction)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("bin").orderBy("v")
    vals.filter(col("bin").isin(targets.map(_._3): _*))
      .withColumn("rn", row_number().over(w))
      .join(broadcast(t), col("bin") === col("tbin") && col("rn") === col("inbin"))
      .select(col("ql"), col("rank"), col("v").as("value"))
  }
}
