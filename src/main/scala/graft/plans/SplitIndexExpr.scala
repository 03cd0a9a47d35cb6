package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Flink's SPLIT_INDEX(str, sep, idx)
  * (0-based, null when out of range) — ref SqlFunctionUtils.splitIndex +
  * BuiltInFunctionDefinitions SPLIT_INDEX.
  *
  * This is the §2.11 "upgrade a wrapper UDF to a codegen'd Expression"
  * path (SURVEY §7 custom-artifact list): unlike a Scala UDF, the
  * expression participates in whole-stage codegen — no
  * InternalRow→Row conversion, no closure serialization, null handling
  * generated inline. `doGenCode` emits a call to the static evaluator
  * below, the same pattern Spark's own StaticInvoke-backed functions use.
  */
object SplitIndexEval {
  def eval(s: UTF8String, sep: UTF8String, idx: Int): UTF8String = {
    if (s == null || sep == null || idx < 0) return null
    // ref SqlFunctionUtils.splitIndex:304 — delegate to the SAME
    // commons-lang3 splitByWholeSeparatorPreserveAllTokens the reference
    // calls (bundled in Spark's jars): empty input → zero tokens (null at
    // any index); empty separator → per-whitespace-char split on
    // Character.isWhitespace (Unicode  /　 included, not ASCII-\s)
    val parts = org.apache.commons.lang3.StringUtils
      .splitByWholeSeparatorPreserveAllTokens(s.toString, sep.toString)
    if (idx >= parts.length) null else UTF8String.fromString(parts(idx))
  }
}

case class SplitIndexExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "split_index"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = first.dataType == StringType && second.dataType == StringType &&
      third.dataType == IntegerType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"split_index expects (string, string, int), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
  }

  override protected def nullSafeEval(s: Any, sep: Any, idx: Any): Any =
    SplitIndexEval.eval(s.asInstanceOf[UTF8String], sep.asInstanceOf[UTF8String],
      idx.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, sep, idx) => {
      // the object's static instance lives on the `...$` class — Janino
      // resolves `graft.plans.SplitIndexEval$.MODULE$` (keep BOTH dollars)
      val evaluator = SplitIndexEval.getClass.getName + ".MODULE$"
      s"""
         |${ev.value} = $evaluator.eval($s, $sep, $idx);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SplitIndexExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  /** Column-API entry point (the `functions._`-style wrapper). */
  def splitIndex(str: Column, sep: Column, idx: Column): Column =
    ColumnBridge.column(SplitIndexExpr(
      ColumnBridge.expression(str),
      ColumnBridge.expression(sep),
      ColumnBridge.expression(idx)))
}
