package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** FLIP-39 ML Pipeline API — ref flink-ml-parent/flink-ml-api/.../api/
  * {Pipeline,Estimator,Transformer,Model}.java: an Estimator fits input
  * data into a Transformer (its Model); a Pipeline is an ordered stage
  * list where each Estimator is fit on the data AS TRANSFORMED by the
  * stages before it (Pipeline.fit), yielding a PipelineModel of pure
  * Transformers; fitted params persist to JSON (PipelineStage.toJson) and
  * reload without refitting.
  *
  * Spark-first: a stage is a declarative DataFrame→DataFrame column
  * program; fitted parameters are SMALL integer-quantized stats (bounded
  * driver state — one row per feature dimension), re-broadcast at
  * transform time, so fit and transform are engine-exact at any
  * parallelism and the transform plan stays whole-stage-codegen friendly.
  */
trait Transformer {
  def transform(df: DataFrame): DataFrame

  /** Fitted/configured params as a JSON fragment (ref PipelineStage.toJson). */
  def jsonParams: String
}

trait Estimator {
  def fit(df: DataFrame): Transformer
}

/** Ordered stage list; Estimators are fit on the running transformed
  * frame, Transformers pass through — exactly ref Pipeline.appendStage /
  * Pipeline.fit semantics. */
final class Pipeline(stages: Seq[Any]) {
  require(stages.forall(s => s.isInstanceOf[Transformer] || s.isInstanceOf[Estimator]),
    "pipeline stages must be Estimator or Transformer")

  def fit(df: DataFrame): PipelineModel = {
    var cur = df
    val models = stages.map {
      case t: Transformer => cur = t.transform(cur); t
      case e: Estimator   => val m = e.fit(cur); cur = m.transform(cur); m
    }
    new PipelineModel(models)
  }
}

/** The fitted pipeline: a Transformer chaining its stage models — ref
  * flink-ml-api PipelineModel (a Pipeline containing only Transformers). */
final class PipelineModel(val stages: Seq[Transformer]) extends Transformer {
  def transform(df: DataFrame): DataFrame =
    stages.foldLeft(df)((d, t) => t.transform(d))
  def jsonParams: String = stages.map(_.jsonParams).mkString("[", ",", "]")
}

/** Stateless micro-unit clip of one column — the Transformer-only stage
  * shape (no fit). */
final case class ClipTransformer(column: String, loQ: Long, hiQ: Long) extends Transformer {
  def transform(df: DataFrame): DataFrame =
    df.withColumn(column, greatest(least(col(column), lit(hiQ)), lit(loQ)))
  def jsonParams: String =
    s"""{"stage":"clip","col":"$column","lo":$loQ,"hi":$hiQ}"""
}

/** Diagonal-covariance Gaussian density model — ref flink-ml-lib/.../
  * common/statistics/basicstatistic/MultivariateGaussian.java restricted
  * to the diagonal case (the reference's pdf with Σ diagonal; the full
  * covariance inverse is not cross-engine bit-stable, the per-dimension
  * variant is). Fit: one keyed agg collects (n, Σq, Σq²) per dimension —
  * bounded driver state — and derives floor-semantics integer
  * mean/variance (truncating division — Spark DIV, DuckDB `//` and Java
  * `/` all truncate toward zero; the variance numerator Σ(q−m)² is
  * non-negative so the sign corner never bites). Transform: broadcast
  * the |dims|-row stats frame and
  * emit the per-row quantized log-density contribution
  * −((q−m)²·10⁶ div 2σ²) − floor(ln σ²·10⁶) div 2, with ln evaluated in
  * SQL on BOTH engines (the adamic-adar/bm25 libm contract). */
final case class DiagGaussianEstimator(keyCol: String, valCol: String) extends Estimator {
  def fit(df: DataFrame): Transformer = {
    val rows = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        expr(s"CAST(SUM($valCol) AS BIGINT)").as("s"),
        expr(s"CAST(SUM($valCol * $valCol) AS BIGINT)").as("ss"))
      .collect()
      .map { r =>
        val (k, n, s, ss) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        val m = s / n // truncating division — BOTH Spark DIV and DuckDB // truncate toward zero
        // numerator ≥ 0, truncate = floor; clamp ≥ 1 so a zero-variance
        // (constant) dimension neither divides by zero in transform nor
        // sends ln(var) to -∞ — the integer analog of a variance floor
        val varQ = math.max(1L, (ss - 2 * m * s + n * m * m) / n)
        (k, m, varQ)
      }.toSeq.sortBy(_._1)
    DiagGaussianModel(keyCol, valCol, rows)
  }
}

final case class DiagGaussianModel(keyCol: String, valCol: String,
                                   stats: Seq[(Long, Long, Long)]) extends Transformer {
  def transform(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val st = stats.toDF(keyCol, "mean_q", "var_q")
      .withColumn("lnvar_micro",
        expr("CAST(FLOOR(LN(CAST(var_q AS DOUBLE)) * 1000000.0) AS BIGINT)"))
    df.join(broadcast(st), keyCol)
      .withColumn("contrib", expr(
        s"-(($valCol - mean_q) * ($valCol - mean_q) * 1000000 DIV (2 * var_q)) " +
          "- lnvar_micro DIV 2"))
  }
  def jsonParams: String = {
    val body = stats.map { case (k, m, v) => s"""[$k,$m,$v]""" }.mkString(",")
    s"""{"stage":"diag_gaussian","key":"$keyCol","val":"$valCol","stats":[$body]}"""
  }
}

object DiagGaussianModel {
  /** Reload fitted params persisted by [[DiagGaussianModel.jsonParams]] —
    * the fromJson leg of ref PipelineStage (no refit). */
  def fromJsonParams(json: String): DiagGaussianModel = {
    val key = """"key":"([^"]+)"""".r.findFirstMatchIn(json).get.group(1)
    val value = """"val":"([^"]+)"""".r.findFirstMatchIn(json).get.group(1)
    val stats = """\[(-?\d+),(-?\d+),(-?\d+)\]""".r.findAllMatchIn(json)
      .map(m => (m.group(1).toLong, m.group(2).toLong, m.group(3).toLong)).toSeq
    DiagGaussianModel(key, value, stats)
  }
}
