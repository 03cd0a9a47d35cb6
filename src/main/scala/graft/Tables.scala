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
    // events.ts physical type has varied across fixture generations:
    // TIMESTAMP(NANOS) (Spark refuses by default → read nanos-as-long and
    // convert) vs TIMESTAMP(MICROS) without TZ (Spark reads TIMESTAMP_NTZ).
    // Branch on the schema actually read rather than assuming one, and
    // normalize to the session-TZ TimestampType the query corpus expects
    // (the session TZ is pinned to UTC in Verify/Bench/specs, so NTZ→TZ
    // is a value-preserving relabel).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      import org.apache.spark.sql.functions.{col, expr}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      df.schema("ts").dataType match {
        case LongType         => df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
        case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
        case _                => df
      }
    } else df
  }

  /** Register every fixture table as a temp view named after the table.
    * Cheap (schema-only); call at the top of any SQL-text query. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
