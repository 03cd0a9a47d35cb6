package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column↔Expression converters (Spark 4 moved
  * Column onto ColumnNode; extension libraries reach the catalyst
  * Expression through `classic.ExpressionUtils`, which is package-private —
  * hence this shim living under org.apache.spark.sql). Only used to expose
  * our custom codegen expressions as user-facing Columns. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
