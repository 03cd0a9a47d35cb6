package graft

import graft.sql.{EngineEnv, FlinkSqlDialect}

import scala.util.Random

/** Grammar-level dialect fuzz (VERDICT r14 #7): random Flink-SQL over the
  * supported rewrite surfaces — group windows, TO-unit FLOOR/CEIL,
  * SIMILAR TO, OVERLAPS, TRUNCATE, bare-VARCHAR casts, TIMESTAMPADD/DIFF
  * with SQL_TSI spellings, CONVERT_TZ, RAND_INTEGER — must come out of the
  * rewriter as text Spark EXECUTES (not merely parses: each case runs
  * end-to-end through EngineEnv.sqlQuery and collects), and every planted
  * string literal containing trap text ('SQL_TSI_DAY', 'TRUNCATE(x, 2)',
  * wildcards) must survive VERBATIM — the rewriter never silently mangles.
  * Extends the 200-case rewriteCall scanner fuzz from the call-syntax
  * level to whole-statement grammar. */
class DialectGrammarFuzzSpec extends SparkTestBase {

  private lazy val env = new EngineEnv(spark)

  // trap literals: text that LOOKS like every rewrite surface but sits in
  // quotes — any rewrite touching these is a mangle
  private val traps = Vector(
    "unit was SQL_TSI_DAY", "use TRUNCATE(x, 2) here", "FLOOR (ts TO DAY)",
    "100% _done_", "CAST(a AS VARCHAR)", "a SIMILAR TO b",
    "(x, y) OVERLAPS (a, b)", "TUMBLE(ts, INTERVAL 5 MINUTE)")

  private def lit(rnd: Random): String = s"'${traps(rnd.nextInt(traps.size))}'"

  private val tsUnits = Vector("SECOND", "MINUTE", "HOUR", "DAY", "MONTH", "QUARTER", "YEAR")
  private def addUnit(rnd: Random): String = {
    val u = tsUnits(rnd.nextInt(tsUnits.size))
    if (rnd.nextBoolean() && u != "QUARTER") s"SQL_TSI_$u" else u
  }

  private def num(rnd: Random, depth: Int): String =
    if (depth <= 0) Vector("x", "3.75", "-2.5", "id")(rnd.nextInt(4))
    else rnd.nextInt(4) match {
      case 0 => s"ABS(${num(rnd, depth - 1)})"
      case 1 => s"TRUNCATE(${num(rnd, depth - 1)}, ${rnd.nextInt(3)})"
      case 2 => s"TRUNCATE (${num(rnd, depth - 1)})" // name-paren whitespace
      case _ => s"(${num(rnd, depth - 1)} + 1)"
    }

  private def tsExpr(rnd: Random): String = rnd.nextInt(4) match {
    case 0 => "ts"
    case 1 => "TIMESTAMP '2021-03-14 01:30:00'"
    case 2 => s"FLOOR(ts TO ${tsUnits(rnd.nextInt(tsUnits.size))})"
    case _ => s"CEIL(ts TO ${tsUnits(rnd.nextInt(tsUnits.size))})"
  }

  private def scalar(rnd: Random): String = rnd.nextInt(10) match {
    case 0 => num(rnd, 2)
    case 1 => s"CAST(${tsExpr(rnd)} AS STRING)"
    case 2 => s"CAST(TIMESTAMPADD(${addUnit(rnd)}, ${rnd.nextInt(7) - 3}, ${tsExpr(rnd)}) AS STRING)"
    case 3 => s"TIMESTAMPDIFF(${addUnit(rnd)}, ${tsExpr(rnd)}, ${tsExpr(rnd)})"
    case 4 => s"CONVERT_TZ(CAST(ts AS STRING), 'UTC', 'Asia/Shanghai')"
    case 5 => s"CAST(RAND_INTEGER(10) < 10 AS STRING)" // value nondeterministic, type checked
    case 6 => s"CAST(${num(rnd, 1)} AS VARCHAR)"
    case 7 => s"TRY_CAST(s AS CHAR)"
    case 8 => lit(rnd)
    case _ => s"CAST(TIMESTAMPADD(DAY, ${rnd.nextInt(5)}, d) AS STRING)" // DATE column
  }

  private def pred(rnd: Random): String = rnd.nextInt(5) match {
    case 0 => s"s SIMILAR TO '(ab|c)%'"
    case 1 => s"s NOT SIMILAR TO '[%]x_' ESCAPE 'x'"
    case 2 => s"(ts, INTERVAL '1' DAY) OVERLAPS (ts, TIMESTAMP '2021-03-15 00:00:00')"
    case 3 => s"${num(rnd, 1)} > 0"
    case _ => s"${lit(rnd)} <> s"
  }

  private def query(rnd: Random): String = rnd.nextInt(5) match {
    case 0 => // plain projection + filter
      s"SELECT ${scalar(rnd)} AS a, ${scalar(rnd)} AS b FROM gt WHERE ${pred(rnd)}"
    case 1 => // tumble group window
      s"SELECT TUMBLE_START(ts, INTERVAL '10' MINUTE) AS ws, COUNT(*) AS n, " +
        s"MAX(${num(rnd, 1)}) AS m FROM gt GROUP BY TUMBLE(ts, INTERVAL '10' MINUTE)"
    case 2 => // hop group window with a trap literal in the projection
      s"SELECT HOP_END(ts, INTERVAL '5' MINUTE, INTERVAL '20' MINUTE) AS we, " +
        s"${lit(rnd)} AS doc, COUNT(*) AS n FROM gt " +
        s"GROUP BY HOP(ts, INTERVAL '5' MINUTE, INTERVAL '20' MINUTE)"
    case 3 => // session window
      s"SELECT SESSION_START(ts, INTERVAL '1' HOUR) AS ws, SUM(id) AS t FROM gt " +
        s"GROUP BY SESSION(ts, INTERVAL '1' HOUR)"
    case _ => // where-clause rewrite surfaces
      s"SELECT id FROM gt WHERE ${pred(rnd)} AND ${pred(rnd)}"
  }

  test("320 grammar-generated statements execute after rewrite; planted literals inviolate") {
    val s = spark
    import s.implicits._
    Seq((1L, 2.5, "abx", "2021-03-14 01:02:03", "2016-06-15"),
        (2L, -3.75, "cz", "2021-03-14 01:22:03", "2016-01-31"),
        (3L, 0.0, "ab%", "2021-03-14 02:02:03", "2021-12-31"))
      .toDF("id", "x", "s", "tss", "ds")
      .selectExpr("id", "x", "s", "CAST(tss AS TIMESTAMP) AS ts", "to_date(ds) AS d")
      .createOrReplaceTempView("gt")
    val rnd = new Random(20260815L)
    for (i <- 1 to 320) {
      val q = query(rnd)
      val rewritten =
        try FlinkSqlDialect.rewrite(q)
        catch { case e: Throwable => fail(s"case $i: rewrite threw on <$q>: $e") }
      // planted literals survive verbatim
      traps.filter(t => q.contains(s"'$t'")).foreach { t =>
        assert(rewritten.contains(s"'$t'"),
          s"case $i: literal '$t' mangled\n  in:  $q\n  out: $rewritten")
      }
      // the statement must EXECUTE through the real front door
      try env.sqlQuery(q).collect()
      catch { case e: Throwable =>
        fail(s"case $i: execution failed\n  in:  $q\n  out: $rewritten\n  err: ${e.getMessage}")
      }
    }
  }
}
