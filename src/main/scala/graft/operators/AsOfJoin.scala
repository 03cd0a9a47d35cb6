package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time as-of (temporal) join: enrich each left row with the most
  * recent right row whose timestamp is <= the left row's timestamp, per key.
  *
  * Reference: flink-table-runtime-blink/.../join/temporal/
  * TemporalRowTimeJoinOperator.java:77 (`FOR SYSTEM_TIME AS OF` row-time
  * join) — there a keyed stateful operator buffering both sides; here the
  * bounded/batch formulation.
  *
  * Spark-first design: instead of an O(n·m) range join + argmax per left row
  * (two shuffles, a skew-prone aggregate), we UNION the two sides tagged,
  * hash-partition once by key, sort each partition by (ts, side), and carry
  * the latest right payload forward with `last(_, ignoreNulls)` over an
  * unbounded-preceding running frame. One shuffle, one sort, linear scan —
  * the same merge-scan the reference's operator does, and it survives 100 TB
  * because per-key data is streamed through the sort, never materialized as
  * a per-row candidate set. Right rows sort BEFORE left rows at equal ts
  * (side 0 < 1), giving the inclusive `rightTs <= leftTs` as-of semantics.
  */
object AsOfJoin {

  /** @param rightPayload right columns to carry onto left rows (renamed as given)
    * @return left rows + carried right payload; rows with no prior right row
    *         are dropped (inner as-of) */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String,
           rightPayload: Map[String, String]): DataFrame = {
    val payloadCols = rightPayload.toSeq.sortBy(_._1)
    val leftCols = left.columns.toSeq

    // the payload travels as ONE struct so every carried field comes from the
    // SAME right row — per-column last(ignoreNulls) would mix versions when a
    // right row holds NULL in one payload column, and the inner-join filter
    // keys off the struct (a matched-but-all-null payload row still joins)
    import org.apache.spark.sql.types.StructType
    val payloadType = StructType(payloadCols.map { case (src, dst) =>
      right.schema(src).copy(name = dst)
    })
    val taggedRight = right.select(
      (col(key).as("__key") +: col(rightTs).as("__ts") +: lit(0).as("__side") +:
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payloadCols.map { case (src, dst) => col(src).as(dst) }: _*).as("__payload")): _*)
    val taggedLeft = left.select(
      (col(key).as("__key") +: col(leftTs).as("__ts") +: lit(1).as("__side") +:
        leftCols.filterNot(_ == key).map(col) :+
        lit(null).cast(payloadType).as("__payload")): _*)

    val w = Window.partitionBy(col("__key")).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .withColumn("__payload", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__payload").isNotNull)
      .select((col("__key").as(key) +:
        leftCols.filterNot(_ == key).map(col)) ++
        payloadCols.map { case (_, dst) => col(s"__payload.$dst").as(dst) }: _*)
  }
}
