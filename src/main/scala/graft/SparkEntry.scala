package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator-coverage inventory: one entry per implemented
  * operator from SURVEY.md §2, each paired (where SQL-expressible) with a
  * DuckDB oracle in `oracleSql`. Implementations live in [[Queries]] and the
  * graft.operators / graft.functions packages.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape (reference correctness corpus: flink-tpch-test). */
  def entry(spark: SparkSession): DataFrame =
    Queries.all("q1_pricing_summary").run(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map { case (name, q) => name -> ((s: SparkSession, dir: String) => q.run(s, dir)) }

  def oracleSql: Map[String, String] =
    Queries.all.collect { case (name, q) if q.oracle.nonEmpty => name -> q.oracle.get }
}
