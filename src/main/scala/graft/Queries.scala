package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One coverage query: Spark-side plan + (optional) DuckDB oracle SQL.
  *
  * Oracle-parity conventions (the driver hash-compares values after sorting
  * columns by name):
  *  - Aggregated doubles go through DECIMAL(38,4) so the reduction is exact
  *    and order-independent (Spark shuffles partials; DuckDB folds serially;
  *    raw double sums would differ in low bits). Final cast back to DOUBLE
  *    keeps the output schema decimal-free on both engines.
  *  - Every aggregate/computed column is aliased identically on both sides.
  *  - DuckDB SUM(INTEGER) returns HUGEINT → always CAST to BIGINT/DOUBLE.
  *  - Deterministic total ORDER BY everywhere ties could reorder rows.
  */
final case class Q(run: (SparkSession, String) => DataFrame, oracle: Option[String])

object Queries {

  /** sum(double) with an exact, order-independent reduction: quantize each
    * row with floor(x·10⁴) (one IEEE multiply + floor — bit-identical in any
    * engine; decimal casts are NOT, they round the shortest-string vs the
    * exact binary value and disagree on ~0.3% of rows), then sum exactly as
    * BIGINT. Scale-safe: the map-side partial sum is a long. */
  def dsum(c: Column): Column = (sum(floor(c * lit(10000.0))).cast("double") / lit(10000.0))
  /** avg(double) as exact-quantized-sum / count — bit-identical across engines. */
  def davg(c: Column): Column = (sum(floor(c * lit(10000.0))).cast("double") / lit(10000.0) / count(lit(1)))

  /** DuckDB spelling of [[dsum]] / [[davg]]. */
  def oSum(x: String): String = s"CAST(SUM(CAST(FLOOR(($x) * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0"
  def oAvg(x: String): String = s"CAST(SUM(CAST(FLOOR(($x) * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0 / COUNT(*)"

  private def sql(text: String)(implicit d: DummyImplicit): (SparkSession, String) => DataFrame =
    (s: SparkSession, dir: String) => { Tables.registerAll(s, dir); s.sql(text) }

  // ---------------------------------------------------------------- queries

  /** TPC-H Q1 shape — scan → filter → hash agg (partial+final) → sort.
    * Ref: flink-table-runtime-blink aggregate/BytesHashMap.java:60 (batch
    * hash agg); here Catalyst plans HashAggregateExec with map-side combine,
    * the shuffle moves only (flag,status) groups — scale-safe at 100 TB. */
  val q1PricingSummary: Q = Q(
    run = (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    oracle = Some(s"""
      SELECT l_returnflag, l_linestatus,
             ${oSum("l_quantity")} AS sum_qty,
             ${oSum("l_extendedprice")} AS sum_base_price,
             ${oSum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
             ${oSum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
             ${oAvg("l_quantity")} AS avg_qty,
             ${oAvg("l_extendedprice")} AS avg_price,
             ${oAvg("l_discount")} AS avg_disc,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** Quantize a double to 6 decimals the same way in both engines (one IEEE
    * multiply + floor — deterministic cross-engine, unlike round()'s
    * half-even-vs-half-up dialect differences). */
  def qz6(c: Column): Column = floor(c * lit(1000000.0)).cast("long").cast("double") / lit(1000000.0)
  def oQz6(x: String): String = s"CAST(CAST(FLOOR(($x) * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0"

  /** Exact integer cents for a 2-decimal double — order-independent sums. */
  def cents(c: Column): Column = floor(c * lit(100.0)).cast("long")
  def oCents(x: String): String = s"CAST(FLOOR(($x) * 100.0) AS BIGINT)"

  /** Cross-engine deterministic 60-bit string hash: first 15 hex chars of
    * md5. Spark `conv(...,16,10)` ≡ DuckDB `('0x'||...)::BIGINT` (verified
    * bit-identical). Powers minhash/simhash/LSH oracles. */
  def hashStr(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")
  def oHash(x: String): String = s"(('0x' || substr(md5($x), 1, 15))::BIGINT)"

  private val modules: Seq[Map[String, Q]] = Seq(
    scala.collection.immutable.ListMap("q1_pricing_summary" -> q1PricingSummary),
    coverage.RelationalQueries.all, coverage.WindowQueries.all,
    coverage.PipelineQueries.all, coverage.StreamingQueries.all,
    coverage.SqlDialectQueries.all, coverage.MiscQueries.all, coverage.ExtraQueries.all,
    coverage.Extra2Queries.all, coverage.TpchQueries.all, coverage.Streaming2Queries.all,
    coverage.TpcdsShapeQueries.all, coverage.Round2Queries.all, coverage.Pipeline3Queries.all,
    coverage.Tpcds3Queries.all, coverage.Pipeline4Queries.all, coverage.Tpch2Queries.all,
    coverage.Tpcds4Queries.all, coverage.Pipeline5Queries.all, coverage.Tpcds5Queries.all,
    coverage.TableApiQueries.all, coverage.CdcQueries.all, coverage.InventoryQueries.all,
    coverage.Sql2Queries.all, coverage.Pipeline6Queries.all, coverage.Pipeline7Queries.all,
    coverage.Pipeline8Queries.all, coverage.Round5Queries.all,
    coverage.Round5bQueries.all, coverage.Round6Queries.all, coverage.Round7Queries.all,
    coverage.TpcdsVerbatimQueries.all, coverage.Round8Queries.all, coverage.Round9Queries.all,
    coverage.TpcdsVerbatim2Queries.all, coverage.Pipeline9Queries.all,
    coverage.TpchVerbatimQueries.all)

  /** Merged registry. A cross-module name collision is a silent operator
    * replacement under the driver gate (a later `++` overrides the
    * earlier entry and the corpus shrinks by one) — require disjoint
    * keys so it fails at registry init instead. (A duplicate key WITHIN
    * one module's Map literal is out of reach here: Scala's Map
    * constructor dedups before `.size` is observable — that case still
    * needs eyes at review time.) */
  val all: Map[String, Q] = {
    val merged = modules.reduce(_ ++ _)
    if (merged.size != modules.map(_.size).sum) {
      val dups = modules.flatMap(_.keys).groupBy(identity)
        .collect { case (k, vs) if vs.size > 1 => k }
      throw new IllegalStateException(
        s"duplicate query names across coverage modules: ${dups.mkString(", ")}")
    }
    merged
  }
}
