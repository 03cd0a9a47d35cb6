package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Print-sink line rendering — the reference's debug table sink
  * (flink-table/.../factories/PrintTableSinkFactory.java:48
  * `RowDataPrintFunction` prints `PRINT_IDENTIFIER> ` + the changelog row,
  * and flink-core RowKind.java:25 `shortString` gives the `+I/-U/+U/-D`
  * tag rendered ahead of the bracketed fields; null fields print as
  * `null`). The FORMAT is the contract a user tails in logs, so it is
  * oracle-gated: q_stream_print_sink drives a real retract stream through
  * [[render]] and hash-matches the exact lines against DuckDB building
  * the same strings.
  *
  * Scale note: the rendering is one codegen'd `concat`/`concat_ws`
  * projection — no UDF, no driver-side formatting; the blackhole analog
  * is the same plan with the projection dropped (`format("noop")`). */
object PrintSink {

  /** Render a changelog frame (a `row_kind` column + data columns, the
    * [[ChangelogAgg]] shape) to print-sink lines. */
  def render(df: DataFrame, identifier: String): DataFrame = {
    val cols = df.columns.filterNot(_ == "row_kind")
    val prefix = if (identifier.isEmpty) "" else s"$identifier> "
    df.select(concat(
      lit(prefix),
      col("row_kind"), lit("["),
      concat_ws(", ", cols.map(c => coalesce(col(c).cast("string"), lit("null"))): _*),
      lit("]")).as("line"))
  }
}
