package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over the driver-generated parquet fixtures (TESTDATA.md).
  *
  * Mirrors the reference's catalog surface (Flink `CREATE TABLE ... WITH
  * ('connector'='filesystem','format'='parquet')`, see reference
  * flink-table/flink-table-runtime-blink/.../filesystem/FileSystemTableFactory.java)
  * re-expressed as plain Spark readers + temp views: Catalyst then owns
  * pushdown/pruning, so scans only read the columns/filters a query needs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS) which Spark refuses by default
    // (DuckDB reads it natively): read nanos as long, convert to µs
    // timestamps (fixture data carries no sub-µs precision).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
    else df
  }

  /** Register every fixture table as a temp view named after the table.
    * Cheap (schema-only); call at the top of any SQL-text query. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
