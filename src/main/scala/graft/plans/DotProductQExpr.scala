package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Quantized dot product of two numeric arrays — the hot kernel of the
  * embedding family (ANN scoring, cosine near-dup, hyperplane LSH, norm
  * computation): `Σ floor(a[i]·b[i]·scale)` as a LONG, bit-identical to
  * the `aggregate(zip_with(...))` composition it replaces (same per-term
  * IEEE multiply + floor, same left-to-right long sum) and to the DuckDB
  * oracles built on that contract.
  *
  * Why an Expression and not the higher-order-function composition:
  * `zip_with` + `aggregate` evaluate their lambda per element through the
  * interpreted HigherOrderFunction path and materialize an intermediate
  * array per row pair. At 100 TB the ANN scorer runs this kernel
  * O(corpus × queries) times — here it is one whole-stage-codegen'd tight
  * loop over the two `ArrayData`, no intermediate allocation, no virtual
  * calls (the element getters are monomorphic, chosen at codegen time
  * from the static element type). Same §2.11 upgrade path as
  * [[SplitIndexExpr]] (SURVEY §7 custom-artifact list).
  *
  * Contract: null array → null; a null ELEMENT in either array → null
  * (mirrors zip_with's null propagation through the lambda); lengths may
  * differ — the shorter prefix is used (zip_with pads with null, which
  * the old lambda turned into a null term only when lengths differed —
  * our fixtures never do; documented divergence).
  */
case class DotProductQExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product_q"

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case other => other
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val numeric = Set[DataType](FloatType, DoubleType, IntegerType, LongType)
    val ok = Seq(first, second).forall(e => e.dataType.isInstanceOf[ArrayType] &&
      numeric(elemType(e))) && third.dataType == DoubleType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_product_q expects (array<numeric>, array<numeric>, double), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
  }

  private def getter(t: DataType): (ArrayData, Int) => Double = t match {
    case FloatType => (a, i) => a.getFloat(i).toDouble
    case DoubleType => (a, i) => a.getDouble(i)
    case IntegerType => (a, i) => a.getInt(i).toDouble
    case LongType => (a, i) => a.getLong(i).toDouble
  }

  override protected def nullSafeEval(a: Any, b: Any, s: Any): Any = {
    val (ad, bd) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val scale = s.asInstanceOf[Double]
    val (ga, gb) = (getter(elemType(first)), getter(elemType(second)))
    val n = math.min(ad.numElements(), bd.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (ad.isNullAt(i) || bd.isNullAt(i)) return null
      acc += math.floor(ga(ad, i) * gb(bd, i) * scale).toLong
      i += 1
    }
    acc
  }

  /** Janino getter spelling for an element type (ArrayData accessor). */
  private def genGet(t: DataType, arr: String, i: String): String = t match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType => s"(double) $arr.getLong($i)"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, s) => {
      val (n, i, acc) = (ctx.freshName("n"), ctx.freshName("i"), ctx.freshName("acc"))
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += (long) java.lang.Math.floor(
         |    ${genGet(elemType(first), a, i)} * ${genGet(elemType(second), b, i)} * $s);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object DotProductQExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  import org.apache.spark.sql.functions.lit

  /** `Σ floor(a[i]·b[i]·scale)` as a Column (scale folded as a literal). */
  def dotQ(a: Column, b: Column, scale: Double): Column =
    ColumnBridge.column(DotProductQExpr(
      ColumnBridge.expression(a),
      ColumnBridge.expression(b),
      ColumnBridge.expression(lit(scale))))
}
