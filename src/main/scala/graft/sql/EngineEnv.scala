package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `StreamTableEnvironment`-like facade over SparkSession (SURVEY.md §7
  * architecture item (a)).
  *
  * Reference surface: TableEnvironmentImpl.executeSql:659 / sqlQuery:639 —
  * DDL with `WITH ('connector'=…)` options (SqlCreateTable.java:70) and a
  * `WATERMARK FOR col AS col - INTERVAL 'n' unit` clause
  * (SqlWatermark.java:39). Here:
  *  - `executeSql(CREATE TABLE …)` registers a temp view backed by the
  *    connector (filesystem/parquet-csv-json, or datagen) and records the
  *    watermark spec in the catalog;
  *  - `sqlQuery` runs Flink-dialect SQL through [[FlinkSqlDialect]] then
  *    `spark.sql` — Catalyst owns everything downstream;
  *  - `fromStream(name)` re-reads a filesystem table as a stream and
  *    applies the declared watermark (`withWatermark`), the Spark spelling
  *    of the reference's WatermarkAssignerOperator.
  *
  * Only the connectors our environment can honor are implemented
  * (filesystem, datagen — SURVEY §2.1); kafka/jdbc/… would slot in as
  * additional cases with zero changes to the query path.
  */
final class EngineEnv(val spark: SparkSession) {

  case class TableSpec(path: String, format: String, watermarkCol: Option[String], watermarkDelay: Option[String])
  private val catalog = scala.collection.mutable.Map[String, TableSpec]()

  private val createRe =
    """(?is)CREATE\s+TABLE\s+(\w+)\s*(?:\((.*)\))?\s*WITH\s*\((.*)\)\s*""".r
  private val watermarkRe =
    """(?is)WATERMARK\s+FOR\s+(\w+)\s+AS\s+\w+\s*-\s*INTERVAL\s+'(\d+)'\s+(\w+)""".r
  private val insertRe =
    """(?is)INSERT\s+(INTO|OVERWRITE)\s+(\w+)\s+(SELECT.*)""".r
  private val createViewRe =
    """(?is)CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMPORARY\s+)?VIEW\s+(\w+)\s+AS\s+(.*)""".r
  private val dropRe =
    """(?is)DROP\s+(?:TABLE|VIEW)\s+(?:IF\s+EXISTS\s+)?(\w+)\s*""".r
  private val showRe = """(?is)SHOW\s+TABLES\s*""".r

  /** DDL + commands. Returns an empty DataFrame for DDL (like the
    * reference's TableResult for CREATE). */
  def executeSql(sql: String): DataFrame = sql.trim match {
    case createRe(name, colsOrNull, withClause) =>
      val opts = parseOptions(withClause)
      val wm = Option(colsOrNull).flatMap(c => watermarkRe.findFirstMatchIn(c))
        .map(m => (m.group(1), s"${m.group(2)} ${unitName(m.group(3))}"))
      opts.getOrElse("connector", "") match {
        case "filesystem" =>
          val path = opts("path")
          val fmt = opts.getOrElse("format", "parquet")
          val df = read(path, fmt)
          df.createOrReplaceTempView(name)
          catalog(name) = TableSpec(path, fmt, wm.map(_._1), wm.map(_._2))
        case "datagen" =>
          // ref DataGenTableSourceFactory: deterministic generator (md5-based,
          // not RNG) so results are reproducible and oracle-checkable
          val n = opts.getOrElse("number-of-rows", "1000").toLong
          val df = spark.range(n).select(
            col("id"),
            expr("conv(substr(md5(concat('k_', id)), 1, 15), 16, 10)").cast("long").as("k"),
            expr("conv(substr(md5(concat('v_', id)), 1, 8), 16, 10)").cast("double").as("v"))
          df.createOrReplaceTempView(name)
          catalog(name) = TableSpec("", "datagen", None, None)
        case other => throw new IllegalArgumentException(s"unsupported connector '$other'")
      }
      spark.emptyDataFrame
    // INSERT INTO/OVERWRITE a registered filesystem table — the reference's
    // ModifyOperation → FileSystemTableSink path (SURVEY §3.1 step 2):
    // append/overwrite the table's files, refresh the view.
    case insertRe(mode, name, query) =>
      val spec = catalog.getOrElse(name,
        throw new IllegalArgumentException(s"unknown sink table '$name'"))
      val df = sqlQuery(query)
      df.write.mode(if (mode.equalsIgnoreCase("OVERWRITE")) "overwrite" else "append")
        .format(spec.format).save(spec.path)
      read(spec.path, spec.format).createOrReplaceTempView(name)
      spark.emptyDataFrame
    // remaining DDL surface — ref flink-sql-parser/.../ddl (30 statement
    // classes); views/drop/show map straight onto the Spark temp catalog
    case createViewRe(name, query) =>
      sqlQuery(query).createOrReplaceTempView(name)
      spark.emptyDataFrame
    case dropRe(name) =>
      spark.catalog.dropTempView(name)
      catalog.remove(name)
      spark.emptyDataFrame
    case showRe() => spark.sql("SHOW VIEWS")
    case q => sqlQuery(q)
  }

  /** Flink-dialect query → DataFrame. MATCH_RECOGNIZE routes to the NFA
    * front-end; everything else is string-rewritten into Spark SQL. */
  def sqlQuery(flinkSql: String): DataFrame =
    if (MatchRecognize.isMatchRecognize(flinkSql)) MatchRecognize.run(spark, flinkSql)
    else spark.sql(FlinkSqlDialect.rewrite(flinkSql))

  /** Streaming read of a registered filesystem table with its declared
    * watermark applied. */
  def fromStream(name: String): DataFrame = {
    val spec = catalog(name)
    val schema = read(spec.path, spec.format).schema
    val base = spark.readStream.schema(schema).format(spec.format)
      .load(graft.streaming.StreamOps.fileAsDir(spec.path))
    (spec.watermarkCol, spec.watermarkDelay) match {
      // Spark watermarks require TIMESTAMP (session-tz instant); parquet
      // naive timestamps arrive as TIMESTAMP_NTZ → cast (session is UTC,
      // values unchanged). Ref SURVEY §1.2: Flink ROWTIME ≈ the watermark col.
      case (Some(c), Some(d)) => base.withColumn(c, col(c).cast("timestamp")).withWatermark(c, d)
      case _ => base
    }
  }

  def watermarkOf(name: String): Option[(String, String)] =
    catalog.get(name).flatMap(s => s.watermarkCol.zip(s.watermarkDelay))

  private def read(path: String, fmt: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    fmt match {
      case "csv" => spark.read.option("header", "true").option("inferSchema", "true").csv(path)
      case "json" => spark.read.json(path)
      case _ => spark.read.format(fmt).load(path)
    }
  }

  private def unitName(u: String): String = u.toLowerCase match {
    case "second" => "seconds"; case "minute" => "minutes"
    case "hour" => "hours"; case "day" => "days"; case other => other
  }

  private def parseOptions(w: String): Map[String, String] =
    """'([^']*)'\s*=\s*'([^']*)'""".r.findAllMatchIn(w)
      .map(m => m.group(1) -> m.group(2)).toMap
}
