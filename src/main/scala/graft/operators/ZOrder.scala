package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-dimensional clustering
  * pass a 100 TB lakehouse runs before writing parquet so that min/max
  * row-group statistics stay tight on EVERY clustered dimension at once,
  * not just the leading sort key. A linear sort on (x, y) gives perfect
  * pruning on x and none on y; sorting by the interleaved-bit Morton code
  * bounds each file's span in BOTH dimensions, so a selective predicate
  * on either column skips most files/row groups at scan time.
  *
  * Reference analog: Flink 1.12 has no layout optimizer — this is part of
  * the M7 pipeline-extension surface (the Delta/Iceberg OPTIMIZE ZORDER
  * role, built from public Morton-code construction, e.g. Morton 1966 /
  * the Z-order curve literature).
  *
  * Everything is pure integer Column arithmetic (shifts, masks, adds), so
  * the code stays inside whole-stage codegen and — crucially for the
  * oracle — any SQL engine reproduces the identical z-values bit-for-bit.
  */
object ZOrder {

  /** Morton code of two non-negative ints, `bits` bits each: bit i of `y`
    * lands at position 2i, bit i of `x` at 2i+1. Unrolled shift/mask — a
    * columnar expression, no UDF. */
  def zvalue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      (shiftright(x, i).bitwiseAND(lit(1)).cast("long") * lit(1L << (2 * i + 1))) +
        (shiftright(y, i).bitwiseAND(lit(1)).cast("long") * lit(1L << (2 * i)))
    }.reduce(_ + _)

  /** Cluster `df` for writing: range-partition on the z-value (so files
    * cover disjoint z-ranges → disjoint rectangles) and sort inside each
    * partition (so row groups inside a file are tight too). `numFiles`
    * maps to output files; at 100 TB it is the only knob that changes. */
  def zorderBy(df: DataFrame, x: Column, y: Column, bits: Int, numFiles: Int): DataFrame = {
    val z = zvalue(x, y, bits)
    df.repartitionByRange(numFiles, z).sortWithinPartitions(z)
  }
}
