package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Flink-only scalar/aggregate functions missing from Spark's surface,
  * registered under their Flink SQL names so Flink queries run unchanged.
  *
  * Reference inventory: flink-table-common/.../functions/
  * BuiltInFunctionDefinitions.java (136 defs) and
  * flink-table-runtime-blink/.../runtime/functions/SqlFunctionUtils.java.
  * Everything Spark already has natively (UPPER, CONCAT, MD5, …) is NOT
  * re-registered — Catalyst's codegen'd builtins win. These wrappers cover
  * the ~10 gaps; per SURVEY §7 they stay plain UDFs until a benchmark shows
  * a hot path worth a custom codegen'd Catalyst Expression.
  */
object FlinkFunctions {

  /** SPLIT_INDEX(str, sep, idx) — 0-based, null out-of-range. Ref
    * SqlFunctionUtils.splitIndex:304. Delegates to the SAME commons-lang3
    * splitByWholeSeparatorPreserveAllTokens the reference calls (bundled
    * in Spark's jars), so every edge is byte-identical by construction:
    * EMPTY input → zero tokens (null at any index, not ""), EMPTY
    * separator → per-whitespace-char split via Character.isWhitespace
    * (Unicode  /　 included, not just ASCII \s). */
  def splitIndex(s: String, sep: String, idx: Int): String = {
    if (s == null || sep == null || idx < 0) return null
    val parts =
      org.apache.commons.lang3.StringUtils.splitByWholeSeparatorPreserveAllTokens(s, sep)
    if (idx >= parts.length) null else parts(idx)
  }

  /** IS_DIGIT / IS_ALPHA / IS_DECIMAL — ref SqlFunctionUtils.isDigit:854
    * (commons isNumeric = Character.isDigit per char), isAlpha:872
    * (commons isAlpha = Character.isLetter per char — full Unicode, not
    * ASCII), isDecimal:802 (true iff Integer/Long/Double.parse accepts —
    * which admits '3.', '1e10', 'Infinity', 'NaN', hex floats). */
  def isDigit(s: String): Boolean = s != null && s.nonEmpty && s.forall(_.isDigit)
  def isAlpha(s: String): Boolean = s != null && s.nonEmpty && s.forall(_.isLetter)
  def isDecimal(s: String): Boolean = {
    if (s == null || s.isEmpty) return false
    def parses(p: => AnyVal): Boolean =
      try { p; true } catch { case _: NumberFormatException => false }
    parses(java.lang.Integer.parseInt(s)) || parses(java.lang.Long.parseLong(s)) ||
      parses(java.lang.Double.parseDouble(s))
  }

  /** HASH_CODE — Math.abs(String.hashCode) per ref
    * SqlFunctionUtils.hashCode:890 (NOT the raw signed hashCode — the
    * reference absolutes it, so ~half of all strings differ in sign from
    * s.hashCode). NULL in → NULL out (the reference wraps the call in
    * generateCallIfArgsNotNull, StringCallGen.scala:539, so its own
    * null→MIN_VALUE branch is unreachable from SQL). Math.abs keeps the
    * MIN_VALUE fixed point, same as the reference. */
  def hashCode(s: String): java.lang.Integer =
    if (s == null) null else Int.box(Math.abs(s.hashCode))

  /** CONVERT_TZ(tsStr, tzFrom, tzTo) — ref SqlDateTimeUtils.convertTz:492
    * ('yyyy-MM-dd HH:mm:ss' wall-clock in tzFrom re-expressed in tzTo).
    * The reference round-trips through default-LENIENT SimpleDateFormat
    * (toTimestamp:333 parse in tzFrom, dateFormatTz:466 format in tzTo),
    * so this mirrors it with the same JDK class rather than java.time
    * (ADVICE r14): lenient GregorianCalendar means rollover dates parse
    * ('2021-02-30' → 2021-03-02), SimpleDateFormat.parse ignores trailing
    * text ('…00:00:00.123' parses the prefix), a DST fall-back OVERLAP
    * resolves to the LATER offset (standard time — java.time and Spark's
    * convert_timezone pick the EARLIER), and spring-forward GAP times
    * shift forward. Zone lookup via TimeZone.getTimeZone like the
    * reference — unknown ids fall back to GMT instead of erroring.
    * Unparseable input → null (toTimestamp catches ParseException).
    * SimpleDateFormat is per-call (not thread-safe; the reference keeps a
    * ThreadLocal cache). Scale note: per-row string work in a
    * deliberately rare function — the hot temporal paths use native
    * timestamp types; this wrapper exists for wire-format fidelity. */
  def convertTz(dateStr: String, tzFrom: String, tzTo: String): String = {
    if (dateStr == null || tzFrom == null || tzTo == null) return null
    val in = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    in.setTimeZone(java.util.TimeZone.getTimeZone(tzFrom))
    try {
      val ts = in.parse(dateStr)
      val out = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
      out.setTimeZone(java.util.TimeZone.getTimeZone(tzTo))
      out.format(ts)
    } catch { case _: java.text.ParseException => null }
  }

  /** SINGLE_VALUE — exactly-one-row-per-group or runtime error.
    * Ref planner/functions/aggfunctions/SingleValueAggFunction.java.
    * A typed [[Aggregator]] (the Spark analog of Flink's imperative
    * AggregateFunction, SURVEY §2.14): partial merge keeps the count so the
    * two-phase distributed aggregation still errors correctly. */
  /** Buffer = (value, rowCount, valueIsNull): a present-but-NULL single row
    * must survive to finish() as NULL (ref SingleValueAggFunction returns
    * the value as-is), not collapse to 0.0. */
  class SingleValueAgg extends Aggregator[java.lang.Double, (Double, Long, Boolean), java.lang.Double] {
    def zero: (Double, Long, Boolean) = (0.0, 0L, false)
    def reduce(b: (Double, Long, Boolean), a: java.lang.Double): (Double, Long, Boolean) = {
      if (b._2 >= 1) throw new IllegalStateException("SINGLE_VALUE: more than one row in group")
      if (a == null) (0.0, b._2 + 1, true) else (a.doubleValue(), b._2 + 1, false)
    }
    def merge(x: (Double, Long, Boolean), y: (Double, Long, Boolean)): (Double, Long, Boolean) = {
      if (x._2 + y._2 > 1) throw new IllegalStateException("SINGLE_VALUE: more than one row in group")
      if (x._2 == 1) x.copy(_2 = x._2 + y._2) else y.copy(_2 = x._2 + y._2)
    }
    def finish(b: (Double, Long, Boolean)): java.lang.Double =
      if (b._2 == 0 || b._3) null else b._1
    def bufferEncoder: Encoder[(Double, Long, Boolean)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong, Encoders.scalaBoolean)
    def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }

  // one registration per live session — EngineEnv constructs per query,
  // and re-deriving the SINGLE_VALUE UDAF encoder each time showed up as
  // a flat +0.3 s on every EngineEnv-path bench query (weak keys: a
  // retired session must not pin its function registry)
  private val registeredSessions = java.util.Collections.newSetFromMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Idempotent registration of the whole surface on a session.
    * SPLIT_INDEX registers as a NATIVE codegen'd Catalyst expression
    * ([[graft.plans.SplitIndexExpr]]) — the §2.11 hot-path upgrade; the
    * rest stay Scala UDFs until a benchmark says otherwise. */
  def registerAll(spark: SparkSession): Unit = synchronized {
    if (!registeredSessions.add(spark)) return
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(
        "SPLIT_INDEX",
        exprs => graft.plans.SplitIndexExpr(exprs(0), exprs(1), exprs(2)),
        "built-in")
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(
        "DOT_PRODUCT_Q",
        // the SQL parser types a `1000000.0` scale literal as DECIMAL and
        // the expression requires DOUBLE — coerce at the registration
        // boundary so the SQL spelling works, not just the Scala dotQ path
        // (unconditional Cast: double→double is elided by SimplifyCasts)
        exprs => graft.plans.DotProductQExpr(exprs(0), exprs(1),
          org.apache.spark.sql.catalyst.expressions.Cast(
            exprs(2), org.apache.spark.sql.types.DoubleType)),
        "built-in")
    spark.udf.register("IS_DIGIT", isDigit _)
    spark.udf.register("IS_ALPHA", isAlpha _)
    spark.udf.register("IS_DECIMAL", isDecimal _)
    spark.udf.register("HASH_CODE", hashCode _)
    spark.udf.register("SINGLE_VALUE", udaf(new SingleValueAgg))
    // Flink spellings that are pure renames/arg-fixings of a native
    // Catalyst builtin (FlinkSqlOperatorTable WEEK/SHA*/TO_BASE64/
    // FROM_BASE64/CONVERT_TZ): registered as UnresolvedFunction builders —
    // the analyzer resolves to the codegen'd native expression, zero UDF
    // overhead.
    def alias(name: String)(build: Seq[org.apache.spark.sql.catalyst.expressions.Expression]
        => org.apache.spark.sql.catalyst.expressions.Expression): Unit =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry.createOrReplaceTempFunction(name, build, "built-in")
    def fn(name: String, args: org.apache.spark.sql.catalyst.expressions.Expression*) =
      org.apache.spark.sql.catalyst.analysis.UnresolvedFunction(
        Seq(name), args.toSeq, isDistinct = false)
    def intLit(i: Int) = org.apache.spark.sql.catalyst.expressions.Literal(i)
    alias("WEEK")(e => fn("weekofyear", e.head))
    Seq(224, 256, 384, 512).foreach { bits =>
      alias(s"SHA$bits")(e => fn("sha2", e.head, intLit(bits)))
    }
    alias("TO_BASE64")(e => fn("base64", e.head))
    alias("FROM_BASE64")(e => org.apache.spark.sql.catalyst.expressions.Cast(
      fn("unbase64", e.head), org.apache.spark.sql.types.StringType))
    // CONVERT_TZ: r14 — was a convert_timezone alias, which diverges from
    // the reference at DST fall-back overlaps (earlier- vs later-offset
    // resolution); now the reference-exact [[convertTz]] (see its doc)
    spark.udf.register("CONVERT_TZ", convertTz _)
    // DATE_FORMAT: Spark's own date_format, but with the string→timestamp
    // coercion made null-on-unparseable (try_to_timestamp) — the reference
    // returns null for invalid input (SqlDateTimeUtils.dateFormat catches
    // ParseException; TemporalTypesTest.testInvalidInputCase), where
    // Spark 4's ANSI cast would throw
    // (DateFormatClass is constructed directly: a nested UnresolvedFunction
    // "date_format" would resolve back to this same temp registration —
    // registry lookup is case-insensitive — and loop the analyzer)
    alias("DATE_FORMAT")(e => org.apache.spark.sql.catalyst.expressions.DateFormatClass(
      fn("try_to_timestamp", e.head), e(1)))
    // TO_TIMESTAMP / TO_DATE (1- and 2-arg): the reference returns NULL on
    // unparseable input (SqlDateTimeUtils.toTimestamp catches the parse
    // failure; TemporalTypesTest pins TO_TIMESTAMP('abc') -> null) where
    // Spark 4's ANSI to_timestamp/to_date throw — route through
    // try_to_timestamp (TO_DATE = date-cast of the parsed timestamp, same
    // day semantics for both arg shapes)
    alias("TO_TIMESTAMP")(e => fn("try_to_timestamp", e: _*))
    alias("TO_DATE")(e => org.apache.spark.sql.catalyst.expressions.Cast(
      fn("try_to_timestamp", e: _*), org.apache.spark.sql.types.DateType))
    // SUM0 (FlinkSqlOperatorTable.SUM0 / Table-API sum0): SUM that yields
    // 0 instead of NULL over empty/all-null input — the primitive the
    // reference's retract aggregates count with
    alias("SUM0")(e => fn("coalesce", fn("sum", e.head), intLit(0)))
  }
}
