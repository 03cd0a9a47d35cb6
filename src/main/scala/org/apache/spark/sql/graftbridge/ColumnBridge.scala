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

  /** Fully CONVERT the column's node tree to a catalyst Expression
    * (`ExpressionUtils.expression` merely wraps foreign nodes in an opaque
    * `ColumnNodeExpression`); needed when the caller wants to inspect the
    * tree — e.g. derive output names from Alias/UnresolvedAttribute. */
  def convertedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
