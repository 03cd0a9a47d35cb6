package graft

import graft.sql.{EngineEnv, FlinkSqlDialect}

/** SqlExpressionTest mirror — the reference's documented-SQL-surface
  * expectation table (flink-table-planner-blink SqlExpressionTest.scala,
  * "tests all SQL expressions that are currently supported according to
  * the documentation"), re-run through the dialect layer: each expression
  * evaluates via EngineEnv.sqlQuery and must render the value the
  * reference's table pins. Rows the Spark surface cannot express
  * faithfully are excluded and documented in COVERAGE.md (integer '/'
  * yields DOUBLE in Spark's non-ANSI dialect; comma-list CASE WHEN, ROW
  * literal rendering, TIME-typed FLOOR/CEIL, INTERVAL literal rendering).
  */
class SqlExpressionFidelitySpec extends SparkTestBase {

  private lazy val env = new EngineEnv(spark)

  private def render(v: Any): String = v match {
    case null => "null"
    case d: java.math.BigDecimal => d.toPlainString
    case other => other.toString
  }

  private def check(expr: String, expected: String): Unit = {
    val got = render(env.sqlQuery(s"SELECT $expr").head().get(0))
    assert(got == expected, s"<$expr> rendered '$got', reference pins '$expected'")
  }

  test("comparison + logical rows") {
    Seq(
      "1 = 1" -> "true", "1 <> 1" -> "false", "5 > 2" -> "true",
      "2 >= 2" -> "true", "5 < 2" -> "false", "2 <= 2" -> "true",
      "x'0c' <= x'0b'" -> "false", "x'0c' > x'0b'" -> "true",
      "x'0c' = x'0c'" -> "true", "x'0c' <> x'0c'" -> "false",
      "1 IS NULL" -> "false", "1 IS NOT NULL" -> "true",
      "NULLIF(1,1) IS DISTINCT FROM NULLIF(1,1)" -> "false",
      "NULLIF(1,1) IS NOT DISTINCT FROM NULLIF(1,1)" -> "true",
      "12 BETWEEN 11 AND 13" -> "true",
      "12 NOT BETWEEN 11 AND 13" -> "false",
      "'TEST' LIKE '%EST'" -> "true",
      "'%EST' LIKE '.%EST' ESCAPE '.'" -> "true",
      "'TEST' NOT LIKE '%EST'" -> "false",
      "'%EST' NOT LIKE '.%EST' ESCAPE '.'" -> "false",
      "'TEST' SIMILAR TO '.EST'" -> "true", // '.' is a regex dot in the reference's walk
      "'TEST' NOT SIMILAR TO '.EST'" -> "false",
      "'TEST' IN ('west', 'TEST', 'rest')" -> "true",
      "'TEST' IN ('west', 'rest')" -> "false",
      "'TEST' NOT IN ('west', 'TEST', 'rest')" -> "false",
      "'TEST' NOT IN ('west', 'rest')" -> "true",
      "TRUE OR FALSE" -> "true", "TRUE AND FALSE" -> "false",
      "NOT TRUE" -> "false", "TRUE IS FALSE" -> "false",
      "TRUE IS NOT FALSE" -> "true", "TRUE IS TRUE" -> "true",
      "TRUE IS NOT TRUE" -> "false",
      "NULLIF(TRUE,TRUE) IS UNKNOWN" -> "true",
      "NULLIF(TRUE,TRUE) IS NOT UNKNOWN" -> "false",
    ).foreach { case (e, want) => check(e, want) }
  }

  test("arithmetic rows") {
    Seq(
      "+5" -> "5", "-5" -> "-5", "5+5" -> "10", "5-5" -> "0", "5*5" -> "25",
      "5%2" -> "1",
      "POWER(5, 5)" -> "3125.0",
      "ABS(-5)" -> "5",
      "MOD(-26, 5)" -> "-1",
      "SQRT(4)" -> "2.0",
      "LN(1)" -> "0.0", "LOG10(1)" -> "0.0", "EXP(0)" -> "1.0",
      "CEIL(2.5)" -> "3", "CEILING(2.5)" -> "3", "FLOOR(2.5)" -> "2",
      "SIN(2.5)" -> "0.5984721441039564",
      "SINH(2.5)" -> "6.0502044810397875",
      "COS(2.5)" -> "-0.8011436155469337",
      "TAN(2.5)" -> "-0.7470222972386603",
      "COT(2.5)" -> "-1.3386481283041514",
      "ASIN(0.5)" -> "0.5235987755982989",
      "ACOS(0.5)" -> "1.0471975511965979",
      "ATAN(0.5)" -> "0.4636476090008061",
      "ATAN2(0.5, 0.5)" -> "0.7853981633974483",
      "COSH(2.5)" -> "6.132289479663686",
      "TANH(2.5)" -> "0.9866142981514303",
      "DEGREES(0.5)" -> "28.64788975654116",
      "RADIANS(0.5)" -> "0.008726646259971648",
      "ROUND(-12.345, 2)" -> "-12.35", // decimal HALF_UP, away from zero
      "PI()" -> "3.141592653589793",
      "E()" -> "2.718281828459045",
      "truncate(42.345, 2)" -> "42.34",
      "truncate(42.345)" -> "42",
      "truncate(-42.345)" -> "-42", // toward zero, not floor's -43
    ).foreach { case (e, want) => check(e, want) }
  }

  test("decimal division rows (Calcite result-type scale)") {
    // The two int-DIVISOR rows carry an explicit DECIMAL(10,0) cast:
    // Calcite promotes the operand's TYPE (INT → Decimal(10,0), result
    // scale 12), Spark promotes an integer LITERAL at its tight precision
    // (Decimal(1,0), result scale 6) — the cast pins the Calcite-typed
    // operand so the reference's rendered scale is reproduced.
    Seq(
      "1.0/8.0" -> "0.125000",        // Decimal(2,1)/Decimal(2,1) → Decimal(8,6)
      "2.0/3.0" -> "0.666667",
      "-2/3.0" -> "-0.666667",        // int dividend: scale 6 either way
      "2.0/CAST(-3 AS DECIMAL(10,0))" -> "-0.666666666667", // scale 12
      "-7.9/CAST(2 AS DECIMAL(10,0))" -> "-3.950000000000",
    ).foreach { case (e, want) => check(e, want) }
  }

  test("string rows") {
    Seq(
      "'test' || 'string'" -> "teststring",
      "CHAR_LENGTH('string')" -> "6",
      "CHARACTER_LENGTH('string')" -> "6",
      "UPPER('string')" -> "STRING",
      "LOWER('STRING')" -> "string",
      "POSITION('STR' IN 'STRING')" -> "1",
      "TRIM(LEADING 'x' FROM 'xxxxSTRINGxxxx')" -> "STRINGxxxx",
      "TRIM(TRAILING 'x' FROM 'xxxxSTRINGxxxx')" -> "xxxxSTRING",
      "OVERLAY('This is a old string' PLACING 'new' FROM 11 FOR 3)" -> "This is a new string",
      "SUBSTRING('hello world', 2)" -> "ello world",
      "SUBSTRING('hello world', 2, 3)" -> "ell",
      "SUBSTRING('hello world', 2, 300)" -> "ello world",
      "SUBSTR('hello world', 2, 3)" -> "ell",
      "SUBSTR('hello world', 2)" -> "ello world",
      "SUBSTR('hello world', 0, 3)" -> "hel", // Calcite's 0-start quirk, shared by Spark
      "INITCAP('hello world')" -> "Hello World",
      "REGEXP_REPLACE('foobar', 'oo|ar', '')" -> "fb",
      "REGEXP_EXTRACT('foothebar', 'foo(.*?)(bar)', 2)" -> "bar",
      "REPEAT('This is a test String.', 2)" ->
        "This is a test String.This is a test String.",
      "REPLACE('hello world', 'world', 'flink')" -> "hello flink",
    ).foreach { case (e, want) => check(e, want) }
  }

  test("conditional, cast, datetime, collection rows") {
    Seq(
      "CASE WHEN 1 = 2 THEN 2 WHEN 1 = 1 THEN 3 ELSE 3 END" -> "3",
      "NULLIF(1, 1)" -> "null",
      "COALESCE(NULL, 5)" -> "5",
      "CAST(2 AS DOUBLE)" -> "2.0",
      "DATE '1990-10-14'" -> "1990-10-14",
      "EXTRACT(DAY FROM DATE '1990-12-01')" -> "1",
      "QUARTER(DATE '2016-04-12')" -> "2",
    ).foreach { case (e, want) => check(e, want) }
  }

  test("hash rows") {
    Seq(
      "MD5('')" -> "d41d8cd98f00b204e9800998ecf8427e",
      "MD5('test')" -> "098f6bcd4621d373cade4e832627b4f6",
      "SHA1('')" -> "da39a3ee5e6b4b0d3255bfef95601890afd80709",
      "SHA1('test')" -> "a94a8fe5ccb19ba61c4c0873d391e987982fbbd3",
      "SHA2('', 224)" -> "d14a028c2a3a2bc9476102bb288234c415a2b01f828ea62ac5b3e42f",
      "SHA2('test', 256)" ->
        "9f86d081884c7d659a2feaa0c55ad015a3bf4f1b2b0b822cd15d6c15b0f00a08",
      "SHA2('test',512)" ->
        ("ee26b0dd4af7e749aa1a8ee3c10ae9923f618980772e473f8819a5d4940e0" +
         "db27ac185f8a0e1d5f84f88bc887fd67b143732c304cc5fa9ad8e6f57f50028a8ff"),
      "MD5(CAST(NULL AS VARCHAR))" -> "null",
      "SHA1(CAST(NULL AS VARCHAR))" -> "null",
      "SHA2(CAST(NULL AS VARCHAR), 256)" -> "null",
      "FROM_BASE64(cast(NUll as varchar))" -> "null",
      "TO_BASE64(FROM_BASE64(cast(NUll as varchar)))" -> "null",
    ).foreach { case (e, want) => check(e, want) }
  }
}
