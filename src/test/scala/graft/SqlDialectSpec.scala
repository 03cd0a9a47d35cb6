package graft

import graft.sql.{EngineEnv, FlinkSqlDialect}
import org.apache.spark.sql.functions._

/** Dialect rewriter + EngineEnv catalog behavior. */
class SqlDialectSpec extends SparkTestBase {

  test("TUMBLE family rewrites to Spark window()") {
    val out = FlinkSqlDialect.rewrite(
      "SELECT TUMBLE_START(ts, INTERVAL '10' MINUTE) AS ws, COUNT(*) FROM t GROUP BY TUMBLE(ts, INTERVAL '10' MINUTE)")
    assert(out.contains("window(ts, '10 minutes')"))
    assert(out.contains("window.start AS ws"))
  }

  test("HOP flips slide/size into Spark order") {
    val out = FlinkSqlDialect.rewrite("GROUP BY HOP(ts, INTERVAL '5' MINUTE, INTERVAL '30' MINUTE)")
    assert(out.contains("window(ts, '30 minutes', '5 minutes')"))
  }

  test("SESSION maps to session_window, PROCTIME to current_timestamp") {
    assert(FlinkSqlDialect.rewrite("SESSION(ts, INTERVAL '1' HOUR)").contains("session_window(ts, '1 hours')"))
    assert(FlinkSqlDialect.rewrite("SELECT PROCTIME()").contains("current_timestamp()"))
  }

  test("OVERLAPS follows the reference convertOverlaps: swap-normalized, inclusive, interval ends") {
    // endpoints touching → TRUE (inclusive, unlike half-open); reversed
    // period normalized by the swap; interval second element = start+iv
    val q = (l: String, r: String) =>
      spark.sql(FlinkSqlDialect.rewrite(s"SELECT ($l) OVERLAPS ($r) AS o")).head().getBoolean(0)
    assert(q("TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-02 00:00:00'",
             "TIMESTAMP '2024-01-02 00:00:00', TIMESTAMP '2024-01-03 00:00:00'"))
    assert(!q("TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-02 00:00:00'",
              "TIMESTAMP '2024-01-02 00:00:01', TIMESTAMP '2024-01-03 00:00:00'"))
    assert(q("TIMESTAMP '2024-01-02 00:00:00', TIMESTAMP '2024-01-01 00:00:00'", // reversed
             "TIMESTAMP '2024-01-01 12:00:00', TIMESTAMP '2024-01-03 00:00:00'"))
    assert(q("TIMESTAMP '2024-01-01 00:00:00', INTERVAL '1' DAY",
             "TIMESTAMP '2024-01-01 12:00:00', TIMESTAMP '2024-01-03 00:00:00'"))
  }

  test("TRUNCATE truncates toward zero; RAND_INTEGER stays in bounds") {
    val r = spark.sql(FlinkSqlDialect.rewrite(
      "SELECT TRUNCATE(3.789, 2) AS a, TRUNCATE(-3.789, 2) AS b, TRUNCATE(41.9, 0) AS c")).head()
    assert(math.abs(r.getDouble(0) - 3.78) < 1e-9)
    assert(math.abs(r.getDouble(1) + 3.78) < 1e-9) // toward zero, NOT floor (-3.79)
    assert(math.abs(r.getDouble(2) - 41.0) < 1e-9)
    val vals = spark.sql(FlinkSqlDialect.rewrite(
      "SELECT RAND_INTEGER(10) AS v FROM range(200)"))
      .collect().map(_.getInt(0))
    assert(vals.forall(v => v >= 0 && v < 10) && vals.distinct.length > 1)
  }

  test("SQL_TSI_* rewrite is quote-aware; rewriteCall tolerates name-paren whitespace (ADVICE r14)") {
    // a literal containing SQL_TSI_DAY must stay verbatim while the real
    // unit argument still rewrites
    val out = FlinkSqlDialect.rewrite(
      "SELECT TIMESTAMPDIFF(SQL_TSI_DAY, a, b) AS d, 'unit was SQL_TSI_DAY' AS doc FROM t")
    assert(out.contains("TIMESTAMPDIFF(DAY, a, b)"))
    assert(out.contains("'unit was SQL_TSI_DAY'"))
    // whitespace between function name and '(' is valid SQL — the scanner
    // must still rewrite (previously left untouched → Spark analysis error)
    val r = spark.sql("SELECT CAST(a AS DOUBLE) AS a FROM (" + FlinkSqlDialect.rewrite(
      "SELECT TRUNCATE (3.789, 2) AS a") + ")").head()
    assert(math.abs(r.getDouble(0) - 3.78) < 1e-9)
    val fl = FlinkSqlDialect.rewrite("SELECT FLOOR (ts TO DAY) AS d FROM t")
    assert(fl.contains("date_trunc('DAY', ts)"))
    // MY_TRUNCATE (x) still safe: word-boundary check unaffected
    assert(FlinkSqlDialect.rewrite("SELECT MY_TRUNCATE (x) FROM t")
      == "SELECT MY_TRUNCATE (x) FROM t")
  }

  test("TRUNCATE rewriter: word-boundary, nested args, quote-aware (ADVICE r13)") {
    // nested-paren argument (old regex silently skipped it)
    val r = spark.sql("SELECT CAST(a AS DOUBLE) AS a, CAST(b AS DOUBLE) AS b, " +
      "CAST(c AS DOUBLE) AS c FROM (" + FlinkSqlDialect.rewrite(
      "SELECT TRUNCATE(ABS(-3.789), 2) AS a, TRUNCATE(3.9) AS b, TRUNCATE(-3.9) AS c") + ")").head()
    assert(math.abs(r.getDouble(0) - 3.78) < 1e-9)
    assert(math.abs(r.getDouble(1) - 3.0) < 1e-9)
    assert(math.abs(r.getDouble(2) + 3.0) < 1e-9)
    // an identifier ENDING in TRUNCATE( must not have its tail rewritten
    val id = FlinkSqlDialect.rewrite("SELECT MY_TRUNCATE(x) FROM t")
    assert(id == "SELECT MY_TRUNCATE(x) FROM t")
    // TRUNCATE( inside a string literal stays verbatim
    val lit = FlinkSqlDialect.rewrite("SELECT 'use TRUNCATE(x, 2) here' AS doc")
    assert(lit == "SELECT 'use TRUNCATE(x, 2) here' AS doc")
    // commas inside nested calls don't split the arg list
    val two = spark.sql(FlinkSqlDialect.rewrite(
      "SELECT TRUNCATE(COALESCE(NULL, -41.99), 1) AS v")).head()
    assert(math.abs(two.getDouble(0) + 41.9) < 1e-9)
  }

  test("rewriteCall property fuzz: literals inviolate, balance kept, planted calls found") {
    // 200 random nested expressions: the balanced-paren scanner must
    // (a) never alter quoted literals, (b) keep parens balanced,
    // (c) rewrite a TRUNCATE planted at ANY nesting depth, and
    // (d) be idempotent (a second pass over rewritten text is a no-op
    //     because the output carries no TRUNCATE( tokens)
    val rnd = new scala.util.Random(60901L)
    val lits = Seq("'TRUNCATE(x, 2)'", "'a, b)('", "\"odd TRUNCATE( name\"", "'%'")
    def expr(depth: Int, plant: Boolean): String = {
      if (depth == 0) {
        if (rnd.nextInt(3) == 0) lits(rnd.nextInt(lits.size))
        else Seq("col_a", "42", "tab.b")(rnd.nextInt(3))
      } else if (plant && rnd.nextInt(2) == 0) {
        s"TRUNCATE(${expr(depth - 1, plant = false)}, 2)"
      } else rnd.nextInt(4) match {
        case 0 => s"COALESCE(${expr(depth - 1, plant)}, ${expr(depth - 1, plant = false)})"
        case 1 => s"ABS(${expr(depth - 1, plant)})"
        case 2 => s"(${expr(depth - 1, plant)} + ${expr(depth - 1, plant = false)})"
        case _ => s"MY_TRUNCATE(${expr(depth - 1, plant)})"
      }
    }
    (0 until 200).foreach { i =>
      val plant = i % 2 == 0
      var e = s"SELECT ${expr(2 + rnd.nextInt(3), plant)} AS v FROM t"
      if (plant && !e.contains("TRUNCATE(")) e = s"SELECT TRUNCATE(${e.length} , 1) AS v" // ensure plant
      val out = FlinkSqlDialect.rewrite(e)
      // (a) every quoted literal survives byte-identical
      lits.foreach { l => if (e.contains(l)) assert(out.contains(l), s"literal $l harmed in:\n$e\n$out") }
      // (b) paren balance (quotes stripped first)
      def bal(s: String): Int = {
        var depth = 0; var q: Char = 0
        s.foreach { c =>
          if (q != 0) { if (c == q) q = 0 }
          else if (c == '\'' || c == '"') q = c
          else if (c == '(') depth += 1
          else if (c == ')') depth -= 1
        }
        depth
      }
      assert(bal(out) == bal(e), s"paren balance drifted:\n$e\n$out")
      // (c) a planted real TRUNCATE( (outside quotes) must be rewritten
      def hasBareTruncate(s: String): Boolean = {
        var q: Char = 0; var i2 = 0
        while (i2 < s.length) {
          val c = s.charAt(i2)
          if (q != 0) { if (c == q) q = 0 }
          else if (c == '\'' || c == '"') q = c
          else if (s.regionMatches(true, i2, "TRUNCATE(", 0, 9) &&
                   (i2 == 0 || !(s.charAt(i2 - 1).isLetterOrDigit || s.charAt(i2 - 1) == '_')))
            return true
          i2 += 1
        }
        false
      }
      if (hasBareTruncate(e)) assert(!hasBareTruncate(out), s"planted TRUNCATE survived:\n$e\n$out")
      // (d) idempotence
      assert(FlinkSqlDialect.rewrite(out) == out, s"rewrite not idempotent on:\n$out")
    }
  }

  test("bare VARCHAR/CHAR cast targets rewrite ONLY inside CAST/TRY_CAST (ADVICE r13)") {
    // the real rewrite still works, nested included
    val ok = spark.sql(FlinkSqlDialect.rewrite(
      "SELECT CAST(12.5 AS VARCHAR) AS a, CAST(CAST(7 AS VARCHAR) AS INT) AS b, " +
        "TRY_CAST(3 AS CHAR) AS c")).head()
    assert(ok.getString(0) == "12.5" && ok.getInt(1) == 7 && ok.getString(2) == "3")
    // a string literal containing 'AS VARCHAR)' is untouched
    val lit = FlinkSqlDialect.rewrite("SELECT 'CAST(x AS VARCHAR)' AS doc FROM t")
    assert(lit == "SELECT 'CAST(x AS VARCHAR)' AS doc FROM t")
    // outside any CAST call, the text is untouched (context-free rewrite was the bug)
    val noCast = FlinkSqlDialect.rewrite("SELECT (a AS VARCHAR) FROM t")
    assert(noCast == "SELECT (a AS VARCHAR) FROM t")
    // length-carrying VARCHAR(n) passes through
    val len = FlinkSqlDialect.rewrite("SELECT CAST(x AS VARCHAR(5)) FROM t")
    assert(len == "SELECT CAST(x AS VARCHAR(5)) FROM t")
  }

  test("SIMILAR TO: wildcards stay literal inside [...], % is dotall, ESCAPE honored") {
    // bracket enumeration: % and _ inside [...] are LITERAL members
    // (ref SqlLikeUtils.sqlToRegexSimilar character walk)
    assert(FlinkSqlDialect.similarToRegex("a[%_]b", None) == "a[%_]b")
    assert(FlinkSqlDialect.similarToRegex("a%b_c", None) == "a(?s:.*)b.c")
    // ESCAPE makes the next char literal (regex-escaped for the SQL literal)
    assert(FlinkSqlDialect.similarToRegex("100!%", Some('!')) == "100\\\\%")
    assert(FlinkSqlDialect.similarToRegex("a!_b%", Some('!')) == "a\\\\_b(?s:.*)")
    // end-to-end through spark.sql: dotall % spans newlines; escaped % literal
    val r = spark.sql(FlinkSqlDialect.rewrite(
      """SELECT 'a\nz' SIMILAR TO 'a%z' AS dotall,
                '5%' SIMILAR TO '_!%' ESCAPE '!' AS esc_hit,
                '5x' SIMILAR TO '_!%' ESCAPE '!' AS esc_miss,
                'a_b' SIMILAR TO 'a[%_]b' AS bracket""")).head()
    assert(r.getBoolean(0) && r.getBoolean(1) && !r.getBoolean(2) && r.getBoolean(3))
  }

  test("SIMILAR TO: '$' and '\\' are ORDINARY pattern chars; '.' is a regex dot") {
    // the reference's exact switch (SqlLikeUtils.sqlToRegexSimilar,
    // flink-table-runtime-blink SqlLikeUtils.java:201): '$' → "\\$",
    // '\' → "\\\\"; '.' is NOT in JAVA_REGEX_SPECIALS and passes through
    // as a regex dot ('TEST' SIMILAR TO '.EST' = true in SqlExpressionTest)
    assert(FlinkSqlDialect.similarToRegex("a.b", None) == "a.b")
    assert(FlinkSqlDialect.similarToRegex("$5%", None) == "\\\\$5(?s:.*)")
    // NOTE on the backslash rows: the PATTERN is captured from the raw SQL
    // text pre-parse (standard-SQL literal semantics, like Flink/Calcite —
    // 'a\z' is the 3-char pattern a,\,z), while the VALUE operand goes
    // through Spark's C-style literal parser ('a\\z' parses to a\z).
    val r = spark.sql(FlinkSqlDialect.rewrite(
      """SELECT 'axb' SIMILAR TO 'a.b'   AS dot_wild,
                'axxb' SIMILAR TO 'a.b'  AS dot_one_char,
                '$5'  SIMILAR TO '$_'    AS dollar_lit,
                'x5'  SIMILAR TO '$_'    AS dollar_not_anchor,
                'a\\z' SIMILAR TO 'a\z' AS backslash_lit,
                'az'  SIMILAR TO 'a\z'  AS backslash_not_meta,
                'a7b' SIMILAR TO 'a[0-9]b' AS digit_class,
                'aab' SIMILAR TO '(a|b)+b' AS alternation""")).head()
    assert(r.getBoolean(0), "dot is a regex dot in the reference's walk")
    assert(!r.getBoolean(1), "dot matches exactly one char")
    assert(r.getBoolean(2), "leading $ is a literal, not an anchor")
    assert(!r.getBoolean(3))
    assert(r.getBoolean(4), "literal backslash matches itself")
    assert(!r.getBoolean(5), "backslash is not a regex meta in the pattern")
    assert(r.getBoolean(6) && r.getBoolean(7), "regex pass-through syntax intact")
  }

  test("OVERLAPS: the reference's endpoint cases (ScalarFunctionsTest.testOverlaps)") {
    // ref flink-table-planner-blink ScalarFunctionsTest.testOverlaps
    // (:3073) — closed endpoints: a zero-length period touching the other
    // period's endpoint OVERLAPS (true); 1ms apart does not (false);
    // an INTERVAL second operand means end = start + interval, and a
    // backwards (start, end) pair is normalized before comparing
    val r = spark.sql(FlinkSqlDialect.rewrite(
      """SELECT (TIMESTAMP '2026-01-01 02:55:00', INTERVAL '1' HOUR) OVERLAPS
                  (TIMESTAMP '2026-01-01 03:30:00', INTERVAL '2' HOUR)  AS plain_hit,
                (TIMESTAMP '2026-01-01 09:00:00', TIMESTAMP '2026-01-01 10:00:00') OVERLAPS
                  (TIMESTAMP '2026-01-01 10:15:00', INTERVAL '3' HOUR)  AS disjoint,
                (DATE '2011-03-10', INTERVAL '10' DAY) OVERLAPS
                  (DATE '2011-03-19', INTERVAL '10' DAY)                AS date_hit,
                (TIMESTAMP '2011-03-10 05:02:02', INTERVAL '0' SECOND) OVERLAPS
                  (TIMESTAMP '2011-03-10 05:02:02', TIMESTAMP '2011-03-10 05:02:01') AS touch_point,
                (TIMESTAMP '2011-03-10 02:02:02.001', INTERVAL '0' SECOND) OVERLAPS
                  (TIMESTAMP '2011-03-10 02:02:02.002', TIMESTAMP '2011-03-10 02:02:02.002') AS ms_apart"""))
      .head()
    assert(r.getBoolean(0), "overlapping hour windows")
    assert(!r.getBoolean(1), "disjoint periods")
    assert(r.getBoolean(2), "date + interval periods sharing a day")
    assert(r.getBoolean(3), "zero-length period ON the other's endpoint overlaps (closed)")
    assert(!r.getBoolean(4), "a millisecond apart does not overlap")
  }

  test("CREATE TABLE IF NOT EXISTS on an existing table is a no-op") {
    val e = new EngineEnv(spark)
    e.executeSql(s"""CREATE TABLE ine_t WITH ('connector'='filesystem',
      'path'='$sfDir/orders.parquet', 'format'='parquet')""")
    val before = spark.table("ine_t").count()
    // second registration points at a DIFFERENT table; must be ignored
    e.executeSql(s"""CREATE TABLE IF NOT EXISTS ine_t WITH ('connector'='filesystem',
      'path'='$sfDir/region.parquet', 'format'='parquet')""")
    assert(spark.table("ine_t").count() == before)
    // without the qualifier the registration IS replaced
    e.executeSql(s"""CREATE TABLE ine_t WITH ('connector'='filesystem',
      'path'='$sfDir/region.parquet', 'format'='parquet')""")
    assert(spark.table("ine_t").count() == 5)
  }

  test("databases qualify table names: same name in two dbs, cross-db joins") {
    val e = new EngineEnv(spark)
    e.executeSql("CREATE DATABASE db_a")
    e.executeSql("CREATE DATABASE db_b")
    e.executeSql("USE db_a")
    e.executeSql(s"""CREATE TABLE facts WITH ('connector'='filesystem',
      'path'='$sfDir/region.parquet', 'format'='parquet')""")
    e.executeSql("USE db_b")
    e.executeSql(s"""CREATE TABLE facts WITH ('connector'='filesystem',
      'path'='$sfDir/nation.parquet', 'format'='parquet')""")
    // unqualified resolves against the CURRENT database (db_b → nation: 25)
    assert(e.sqlQuery("SELECT COUNT(*) AS n FROM facts").head().getLong(0) == 25)
    e.executeSql("USE db_a")
    assert(e.sqlQuery("SELECT COUNT(*) AS n FROM facts").head().getLong(0) == 5)
    // qualified references reach across databases in one query
    val joined = e.sqlQuery("""
      SELECT r_name, COUNT(*) AS n
      FROM db_a.facts JOIN db_b.facts ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name""")
    assert(joined.count() == 5)
    // per-db watermark catalog entries stay distinct
    assert(e.watermarkOf("db_a.facts").isEmpty)
    e.executeSql("DROP TABLE db_b.facts")
    intercept[Exception](e.fromStream("db_b.facts"))
  }

  test("CREATE TABLE registers the view and records the watermark") {
    val e = new EngineEnv(spark)
    e.executeSql(s"""
      CREATE TABLE wm_orders (
        o_orderkey BIGINT, o_orderdate TIMESTAMP(3),
        WATERMARK FOR o_orderdate AS o_orderdate - INTERVAL '30' SECOND
      ) WITH ('connector'='filesystem', 'path'='$sfDir/orders.parquet', 'format'='parquet')""")
    assert(spark.table("wm_orders").count() > 0)
    assert(e.watermarkOf("wm_orders").contains(("o_orderdate", "30 seconds")))
  }

  test("fromStream applies the declared watermark and streams the table") {
    val e = new EngineEnv(spark)
    e.executeSql(s"""
      CREATE TABLE s_orders (
        o_orderkey BIGINT, o_orderdate TIMESTAMP(3),
        WATERMARK FOR o_orderdate AS o_orderdate - INTERVAL '1' MINUTE
      ) WITH ('connector'='filesystem', 'path'='$sfDir/orders.parquet', 'format'='parquet')""")
    val stream = e.fromStream("s_orders")
    assert(stream.isStreaming)
    val agg = stream.groupBy(window(col("o_orderdate"), "1 day")).count()
    val q = agg.writeStream.format("memory").queryName("wm_stream_t").outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("wm_stream_t").count() > 0)
  }

  test("INSERT INTO appends to a registered filesystem table") {
    val s = spark
    import s.implicits._
    val path = "/tmp/graft_ins_t"
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.mode("overwrite").parquet(path)
    val e = new EngineEnv(s)
    e.executeSql(s"CREATE TABLE ins_t WITH ('connector'='filesystem', 'path'='$path', 'format'='parquet')")
    assert(s.table("ins_t").count() == 2)
    e.executeSql("INSERT INTO ins_t SELECT k + 10 AS k, v FROM ins_t")
    assert(s.table("ins_t").count() == 4)
  }

  test("connected streams: keyed two-input process") {
    val s = spark
    import s.implicits._
    val env = new graft.datastream.DataStreamEnv(s)
    val left = env.fromElements((1, "l1"), (2, "l2"))
    val right = env.fromElements((1, 100), (1, 200), (3, 300))
    val out = left.connect(right).keyedProcess[Int, (Int, String, Int)](_._1, _._1) {
      (k, ls, rs) =>
        val name = ls.map(_._2).toSeq.headOption.getOrElse("-")
        val total = rs.map(_._2).sum
        Iterator((k, name, total))
    }.collect().toSet
    assert(out == Set((1, "l1", 300), (2, "l2", 0), (3, "-", 300)))
  }

  test("CREATE VIEW / DROP / SHOW TABLES complete the DDL surface") {
    val s = spark
    val e = new EngineEnv(s)
    e.executeSql(s"""CREATE TABLE ddl_orders WITH ('connector'='filesystem', 'path'='$sfDir/orders.parquet', 'format'='parquet')""")
    e.executeSql("CREATE VIEW big_orders AS SELECT * FROM ddl_orders WHERE o_totalprice > 1000")
    assert(s.table("big_orders").count() > 0)
    assert(e.executeSql("SHOW TABLES").collect().map(_.getString(0)).contains("big_orders"))
    // scoped to the CURRENT database: a table registered under another
    // database does not appear in this listing
    e.executeSql("CREATE DATABASE elsewhere")
    e.executeSql(s"""CREATE TABLE elsewhere.hidden_t WITH ('connector'='filesystem', 'path'='$sfDir/nation.parquet', 'format'='parquet')""")
    val listed = e.executeSql("SHOW TABLES").collect().map(_.getString(0))
    assert(listed.contains("ddl_orders") && !listed.contains("hidden_t"))
    e.executeSql("DROP VIEW big_orders")
    assert(!s.catalog.tableExists("big_orders"))
  }

  test("paren-aware DDL: DECIMAL(p,s) columns and ')' inside option values parse") {
    val s = spark
    val e = new EngineEnv(s)
    // nested parens in the column list + a paren and quoted '=' in options
    e.executeSql(s"""CREATE TABLE ddl_paren (
        o_orderkey BIGINT,
        o_totalprice DECIMAL(10,2),
        WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
      ) WITH ('connector'='filesystem', 'path'='$sfDir/orders.parquet',
              'format'='parquet', 'comment'='weird (value) = here')""")
    assert(s.table("ddl_paren").count() > 0)
    assert(e.watermarkOf("ddl_paren").contains(("ts", "5 seconds")))
  }

  test("computed columns derive on read (commas in the expr parse); constraints accepted") {
    val s = spark
    import s.implicits._
    val e = new EngineEnv(s)
    e.executeSql(s"""CREATE TABLE ddl_computed (
        o_orderkey BIGINT,
        o_totalprice DOUBLE,
        price_band AS SUBSTR(CAST(o_totalprice AS STRING), 1, 2),
        cents AS CAST(FLOOR(o_totalprice * 100.0) AS BIGINT),
        PRIMARY KEY (o_orderkey) NOT ENFORCED
      ) WITH ('connector'='filesystem', 'path'='$sfDir/orders.parquet', 'format'='parquet')""")
    val row = e.sqlQuery(
      "SELECT o_totalprice, price_band, cents FROM ddl_computed ORDER BY o_orderkey LIMIT 1")
      .as[(Double, String, Long)].head()
    assert(row._2 == row._1.toString.take(2) && row._3 == math.floor(row._1 * 100).toLong)
  }

  test("PARTITIONED BY: INSERT writes k=v partition dirs; read-back sees all partitions") {
    val s = spark
    import s.implicits._
    val e = new EngineEnv(s)
    val out = graft.streaming.StreamOps.scratchRoot + "/ddl_part_spec"
    // seed one partition so CREATE can read the path
    graft.Tables.load(s, sfDir, "orders").filter(col("o_orderstatus") === "F").limit(10)
      .select(col("o_orderkey"), col("o_orderstatus"))
      .write.partitionBy("o_orderstatus").mode("overwrite").parquet(out)
    e.executeSql(s"""CREATE TABLE ddl_part (o_orderkey BIGINT, o_orderstatus STRING)
      PARTITIONED BY (o_orderstatus)
      WITH ('connector'='filesystem', 'path'='$out', 'format'='parquet')""")
    e.executeSql(s"""CREATE TABLE ddl_part_src (o_orderkey BIGINT, o_custkey BIGINT,
        o_orderstatus STRING, o_totalprice DOUBLE, o_orderdate TIMESTAMP(3), o_orderpriority STRING)
      WITH ('connector'='filesystem', 'path'='$sfDir/orders.parquet', 'format'='parquet')""")
    e.executeSql("""INSERT INTO ddl_part
      SELECT o_orderkey, o_orderstatus FROM ddl_part_src WHERE o_orderstatus = 'O'""")
    // physical layout: k=v dirs (the partition-commit/filesystem contract)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.contains("o_orderstatus=F") && dirs.contains("o_orderstatus=O"))
    val n = e.sqlQuery("SELECT COUNT(*) AS n FROM ddl_part WHERE o_orderstatus = 'O'")
      .as[Long].head()
    assert(n > 0)
  }

  test("debezium-json as a DDL format: declared payload schema parses the wire file, batch + stream") {
    val s = spark
    import s.implicits._
    val e = new EngineEnv(s)
    val wire = graft.streaming.StreamOps.scratchRoot + "/cdc_ddl_spec"
    Seq(
      """{"after":{"k":1,"v":10},"op":"c"}""",
      """{"before":{"k":1,"v":10},"after":{"k":1,"v":20},"op":"u"}""",
      """{"before":{"k":1,"v":20},"op":"d"}""").toDF("value")
      .coalesce(1).write.mode("overwrite").text(wire)
    e.executeSql(s"""CREATE TABLE cdc_ddl (k BIGINT, v BIGINT)
      WITH ('connector'='filesystem', 'path'='$wire', 'format'='debezium-json')""")
    val batch = e.sqlQuery("SELECT row_kind, k, v FROM cdc_ddl ORDER BY v, row_kind")
      .as[(String, Long, Long)].collect().toSeq
    assert(batch == Seq(("+I", 1L, 10L), ("-U", 1L, 10L), ("+U", 1L, 20L), ("-D", 1L, 20L)))
    // the same table as a STREAM presents the identical changelog
    val q = e.fromStream("cdc_ddl")
      .writeStream.format("memory").queryName("cdc_ddl_t").outputMode("append").start()
    q.processAllAvailable()
    val streamed = s.table("cdc_ddl_t").select(col("row_kind"), col("k"), col("v"))
      .as[(String, Long, Long)].collect().toSeq.sortBy(r => (r._3, r._1))
    q.stop()
    assert(streamed == batch)
  }

  test("avro as a DDL format: INSERT OVERWRITE writes container files, SELECT reads them back") {
    val s = spark
    import s.implicits._
    val e = new EngineEnv(s)
    val out = graft.streaming.StreamOps.scratchRoot + "/avro_ddl_spec"
    // seed the path so CREATE can discover the schema (write clears it)
    graft.sources.AvroFormat.write(Seq((1L, "seed")).toDF("k", "name"), out)
    e.executeSql(s"""CREATE TABLE av_t (k BIGINT, name STRING)
      WITH ('connector'='filesystem', 'path'='$out', 'format'='avro')""")
    e.executeSql(s"""CREATE TABLE nation_src (n_nationkey BIGINT, n_name STRING)
      WITH ('connector'='filesystem', 'path'='$sfDir/nation.parquet', 'format'='parquet')""")
    e.executeSql("""INSERT OVERWRITE av_t
      SELECT n_nationkey AS k, n_name AS name FROM nation_src WHERE n_nationkey < 5""")
    val back = e.sqlQuery("SELECT k, name FROM av_t ORDER BY k")
      .as[(Long, String)].collect().toSeq
    assert(back.size == 5 && back.map(_._1) == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("CREATE TABLE LIKE clones the spec; ALTER TABLE renames and re-points") {
    val s = spark
    val e = new EngineEnv(s)
    e.executeSql(s"""CREATE TABLE ddl_base (WATERMARK FOR ts AS ts - INTERVAL '10' SECOND)
      WITH ('connector'='filesystem', 'path'='$sfDir/orders.parquet', 'format'='parquet')""")
    e.executeSql("CREATE TABLE ddl_clone LIKE ddl_base")
    assert(e.watermarkOf("ddl_clone").contains(("ts", "10 seconds"))) // inherited
    assert(s.table("ddl_clone").count() == s.table("ddl_base").count())
    e.executeSql("ALTER TABLE ddl_clone RENAME TO ddl_renamed")
    assert(!s.catalog.tableExists("ddl_clone") && s.table("ddl_renamed").count() > 0)
    e.executeSql(s"ALTER TABLE ddl_renamed SET ('path'='$sfDir/nation.parquet')")
    assert(s.table("ddl_renamed").columns.contains("n_nationkey")) // re-pointed
  }

  test("CREATE FUNCTION aliases a resolvable function; databases track USE") {
    val s = spark
    val e = new EngineEnv(s)
    e.executeSql("CREATE TEMPORARY FUNCTION shout AS 'upper'")
    assert(e.sqlQuery("SELECT shout('ok') AS x").collect()(0).getString(0) == "OK")
    e.executeSql("DROP FUNCTION shout")
    intercept[Exception](e.sqlQuery("SELECT shout('ok') AS x").collect())
    e.executeSql("CREATE DATABASE analytics")
    e.executeSql("USE analytics")
    assert(e.currentDatabase == "analytics")
    assert(e.executeSql("SHOW DATABASES").collect().map(_.getString(0)).contains("analytics"))
    intercept[IllegalArgumentException](e.executeSql("USE nope"))
  }

  test("ALTER VIEW RENAME/AS, ALTER DATABASE SET, and constraint admin") {
    val s = spark
    val e = new EngineEnv(s)
    e.executeSql(s"""CREATE TABLE av_orders WITH ('connector'='filesystem', 'path'='$sfDir/orders.parquet', 'format'='parquet')""")
    e.executeSql("CREATE VIEW av_v AS SELECT * FROM av_orders WHERE o_totalprice > 1000")
    val n1 = s.table("av_v").count()
    // SqlAlterViewRename: same rows under the new name, old name gone
    e.executeSql("ALTER VIEW av_v RENAME TO av_v2")
    assert(s.table("av_v2").count() == n1 && !s.catalog.tableExists("av_v"))
    // SqlAlterViewAs: redefinition replaces the query
    e.executeSql("ALTER VIEW av_v2 AS SELECT * FROM av_orders WHERE o_totalprice > 100000")
    assert(s.table("av_v2").count() < n1)
    // SqlAlterDatabase: properties recorded and readable
    e.executeSql("CREATE DATABASE av_db")
    e.executeSql("ALTER DATABASE av_db SET ('owner'='graft', 'tier'='gold')")
    assert(e.databaseProperties("av_db") == Map("owner" -> "graft", "tier" -> "gold"))
    // constraint admin: accepted NOT ENFORCED; unknown table rejected
    e.executeSql("ALTER TABLE av_orders ADD CONSTRAINT pk_o PRIMARY KEY (o_orderkey) NOT ENFORCED")
    e.executeSql("ALTER TABLE av_orders DROP CONSTRAINT pk_o")
    intercept[IllegalArgumentException](
      e.executeSql("ALTER TABLE nope_t ADD PRIMARY KEY (x) NOT ENFORCED"))
    // an unsupported DDL shape fails with a CLEAR head-of-statement error,
    // not a Spark parse error against the temp-view catalog
    val err = intercept[IllegalArgumentException](
      e.executeSql("CREATE INDEX idx ON av_orders (o_orderkey)"))
    assert(err.getMessage.contains("unsupported DDL statement"))
  }

  test("CREATE TEMPORARY TABLE and LIKE feature options (SqlTableLike merging strategies)") {
    val s = spark
    val e = new EngineEnv(s)
    e.executeSql(s"""CREATE TEMPORARY TABLE tmp_orders
      WITH ('connector'='filesystem', 'path'='$sfDir/orders.parquet', 'format'='parquet')""")
    assert(s.table("tmp_orders").count() > 0)
    e.executeSql(s"""CREATE TABLE like_base (
      user_id BIGINT, event_id BIGINT, ts TIMESTAMP(3),
      uid2 AS user_id * 2,
      WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
    ) WITH ('connector'='filesystem', 'path'='$sfDir/events.parquet', 'format'='parquet')""")
    // default = INCLUDING ALL: computed column + watermark inherited
    e.executeSql("CREATE TABLE like_all LIKE like_base")
    assert(s.table("like_all").columns.contains("uid2") && e.watermarkOf("like_all").nonEmpty)
    e.executeSql("CREATE TABLE like_nog LIKE like_base (EXCLUDING GENERATED)")
    assert(!s.table("like_nog").columns.contains("uid2"))
    e.executeSql("CREATE TABLE like_nowm LIKE like_base (EXCLUDING WATERMARKS)")
    assert(e.watermarkOf("like_nowm").isEmpty && s.table("like_nowm").columns.contains("uid2"))
    // EXCLUDING OPTIONS: connector options are NOT inherited — path required
    intercept[IllegalArgumentException](
      e.executeSql("CREATE TABLE like_noopt LIKE like_base (EXCLUDING OPTIONS)"))
    e.executeSql(s"""CREATE TABLE like_noopt
      WITH ('path'='$sfDir/nation.parquet')
      LIKE like_base (EXCLUDING OPTIONS, EXCLUDING GENERATED, EXCLUDING WATERMARKS)""")
    assert(s.table("like_noopt").columns.contains("n_name"))
  }

  test("INSERT INTO ... VALUES appends inline rows (RichSqlInsert values form)") {
    val s = spark
    val e = new EngineEnv(s)
    val out = graft.streaming.StreamOps.scratchRoot + "/values_insert_t"
    s.createDataFrame(Seq((1L, "a"))).toDF("id", "tag")
      .write.mode("overwrite").parquet(out)
    e.executeSql(s"""CREATE TABLE vt (id BIGINT, tag STRING)
      WITH ('connector'='filesystem', 'path'='$out', 'format'='parquet')""")
    e.executeSql("INSERT INTO vt VALUES (2, 'b'), (3, 'c')")
    val rows = e.sqlQuery("SELECT id, tag FROM vt ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("DESCRIBE and EXPLAIN run through the dialect") {
    val s = spark
    val e = new EngineEnv(s)
    e.executeSql(s"""CREATE TABLE ddl_desc WITH ('connector'='filesystem', 'path'='$sfDir/nation.parquet', 'format'='parquet')""")
    val cols = e.executeSql("DESCRIBE ddl_desc").collect().map(_.getString(0))
    assert(cols.contains("n_nationkey"))
    // registered-table DESCRIBE reports the reference's extras column:
    // computed columns as `AS expr`, metadata columns as `METADATA FROM`
    e.executeSql(s"""CREATE TABLE ddl_desc2 (
      twice AS n_nationkey * 2,
      fname STRING METADATA FROM 'file.name'
    ) WITH ('connector'='filesystem', 'path'='$sfDir/nation.parquet', 'format'='parquet')""")
    val rows = e.executeSql("DESCRIBE ddl_desc2").collect()
    assert(rows.find(_.getString(0) == "twice").exists(_.getString(3).startsWith("AS ")))
    assert(rows.find(_.getString(0) == "fname")
      .exists(_.getString(3) == "METADATA FROM 'file.name'"))
    val plan = e.executeSql("EXPLAIN SELECT n_name FROM ddl_desc WHERE n_nationkey > 3")
      .collect()(0).getString(0)
    assert(plan.contains("Filter") || plan.contains("filter"))
  }

  test("socketTextStream: Spark socket source reads a localhost line server") {
    val s = spark
    import s.implicits._
    // ref StreamExecutionEnvironment.socketTextStream — the debug line
    // source; Spark's built-in 'socket' format is the 1:1 analog. A local
    // loopback server stands in for the remote endpoint (zero egress).
    val server = new java.net.ServerSocket(0)
    val port = server.getLocalPort
    val feeder = new Thread(() => {
      val c = server.accept()
      val w = new java.io.PrintWriter(c.getOutputStream, true)
      (1 to 5).foreach(i => w.println(s"line_$i"))
      Thread.sleep(3000); w.close(); c.close()
    })
    feeder.setDaemon(true); feeder.start()
    val q = s.readStream.format("socket")
      .option("host", "localhost").option("port", port).load()
      .writeStream.format("memory").queryName("sock_t").outputMode("append").start()
    val deadline = System.currentTimeMillis() + 15000
    while (s.table("sock_t").count() < 5 && System.currentTimeMillis() < deadline) {
      q.processAllAvailable(); Thread.sleep(100)
    }
    val rows = s.table("sock_t").as[String].collect().toSet
    q.stop(); server.close()
    assert(rows == (1 to 5).map(i => s"line_$i").toSet)
  }

  test("datagen is deterministic across invocations") {
    val e = new EngineEnv(spark)
    e.executeSql("CREATE TABLE g1 WITH ('connector'='datagen', 'number-of-rows'='10')")
    val a = e.sqlQuery("SELECT * FROM g1 ORDER BY id").collect().toSeq
    e.executeSql("CREATE TABLE g2 WITH ('connector'='datagen', 'number-of-rows'='10')")
    val b = e.sqlQuery("SELECT * FROM g2 ORDER BY id").collect().toSeq
    assert(a == b && a.size == 10)
  }

  test("OPTIONS hint overrides table options per query (FLIP-113 dynamic table options)") {
    val e = new EngineEnv(spark)
    // datagen row-count override: the hinted scan regenerates with the
    // merged options; the registered table itself is untouched
    e.executeSql("CREATE TABLE gh WITH ('connector'='datagen', 'number-of-rows'='10')")
    val hinted = e.sqlQuery(
      "SELECT COUNT(*) AS n FROM gh /*+ OPTIONS('number-of-rows'='25') */")
      .collect()(0).getLong(0)
    assert(hinted == 25)
    assert(e.sqlQuery("SELECT COUNT(*) AS n FROM gh").collect()(0).getLong(0) == 10)
    // filesystem path override — the classic per-query re-point
    e.executeSql(s"""CREATE TABLE fh
      WITH ('connector'='filesystem', 'path'='$sfDir/nation.parquet', 'format'='parquet')""")
    val regions = e.sqlQuery(
      s"SELECT COUNT(*) AS n FROM fh /*+ OPTIONS('path'='$sfDir/region.parquet') */")
      .collect()(0).getLong(0)
    assert(regions == 5)
    assert(e.sqlQuery("SELECT COUNT(*) AS n FROM fh").collect()(0).getLong(0) == 25)
    intercept[IllegalArgumentException](
      e.sqlQuery("SELECT * FROM nope_h /*+ OPTIONS('a'='b') */"))
  }

  test("StatementSet buffers INSERTs, executes once, clears (FLIP-84)") {
    val s = spark
    val e = new EngineEnv(s)
    val root = graft.streaming.StreamOps.scratchRoot + "/stmtset_spec"
    s.createDataFrame(Seq((1L, "seed"))).toDF("id", "tag")
      .write.mode("overwrite").parquet(s"$root/a")
    s.createDataFrame(Seq((1L, "seed"))).toDF("id", "tag")
      .write.mode("overwrite").parquet(s"$root/b")
    e.executeSql(s"""CREATE TABLE ss_a (id BIGINT, tag STRING)
      WITH ('connector'='filesystem', 'path'='$root/a', 'format'='parquet')""")
    e.executeSql(s"""CREATE TABLE ss_b (id BIGINT, tag STRING)
      WITH ('connector'='filesystem', 'path'='$root/b', 'format'='parquet')""")
    val set = e.createStatementSet()
      .addInsertSql("INSERT INTO ss_a VALUES (2, 'x')")
      .addInsert("ss_b", e.sqlQuery("SELECT id + 10 AS id, tag FROM ss_a"))
    // nothing runs until execute()
    assert(s.table("ss_a").count() == 1 && s.table("ss_b").count() == 1)
    assert(set.explain().contains("=="))
    set.execute()
    assert(s.table("ss_a").count() == 2)
    assert(s.table("ss_b").count() == 2) // seed + the 1 buffered row (pre-insert snapshot)
    // buffer cleared: a second execute is a no-op
    set.execute()
    assert(s.table("ss_a").count() == 2 && s.table("ss_b").count() == 2)
    intercept[IllegalArgumentException](set.addInsertSql("SELECT 1"))
  }

  test("SHOW VIEWS / DESCRIBE DATABASE / DESCRIBE CATALOG / ALTER FUNCTION") {
    val s = spark
    val e = new EngineEnv(s)
    e.executeSql(s"""CREATE TABLE adm_t
      WITH ('connector'='filesystem', 'path'='$sfDir/nation.parquet', 'format'='parquet')""")
    e.executeSql("CREATE DATABASE vdb")
    e.executeSql("CREATE VIEW vdb.v1 AS SELECT * FROM adm_t")
    assert(e.executeSql("SHOW VIEWS").collect().isEmpty) // scoped: current db has none
    e.executeSql("USE vdb")
    assert(e.executeSql("SHOW VIEWS").collect().map(_.getString(0)).toSeq == Seq("v1"))
    e.executeSql("USE default_database")
    e.executeSql("ALTER DATABASE vdb SET ('owner'='me')")
    val desc = e.executeSql("DESCRIBE DATABASE vdb").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(desc("name") == "vdb" && desc("property:owner") == "me")
    val cat = e.executeSql("DESCRIBE CATALOG default_catalog").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(cat("name") == "default_catalog" && cat("databases").contains("vdb"))
    intercept[IllegalArgumentException](e.executeSql("DESCRIBE DATABASE nope_db"))
    // ALTER FUNCTION re-points the alias (SqlAlterFunction)
    e.executeSql("CREATE FUNCTION flipfn AS 'lower'")
    assert(e.sqlQuery("SELECT flipfn('AbC') AS x").collect()(0).getString(0) == "abc")
    e.executeSql("ALTER FUNCTION flipfn AS 'upper'")
    assert(e.sqlQuery("SELECT flipfn('AbC') AS x").collect()(0).getString(0) == "ABC")
    // DROP VIEW removes it from SHOW VIEWS
    e.executeSql("DROP VIEW vdb.v1")
    e.executeSql("USE vdb")
    assert(e.executeSql("SHOW VIEWS").collect().isEmpty)
    e.executeSql("USE default_database")
  }

  test("temporal table function rewrites onto the keyed as-of plan") {
    val s = spark
    val root = graft.streaming.StreamOps.scratchRoot + "/tfn_spec"
    // versions: key 1 at t=10 (v=100) and t=20 (v=200); key 2 at t=15 (v=150)
    s.createDataFrame(Seq(
      (1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(10)), 100L),
      (1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(20)), 200L),
      (2L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(15)), 150L)))
      .toDF("k", "vts", "rate").write.mode("overwrite").parquet(s"$root/rates")
    // facts: key 1 at t=12 (→100), t=25 (→200); key 2 at t=14 (no version yet)
    s.createDataFrame(Seq(
      (1L, 1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(12))),
      (1L, 2L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(25))),
      (2L, 3L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(14)))))
      .toDF("k", "fid", "vts").write.mode("overwrite").parquet(s"$root/facts")
    val e = new EngineEnv(s)
    e.executeSql(s"""CREATE TABLE tfn_rates (k BIGINT, vts TIMESTAMP(3), rate BIGINT)
      WITH ('connector'='filesystem', 'path'='$root/rates', 'format'='parquet')""")
    e.executeSql(s"""CREATE TABLE tfn_facts (k BIGINT, fid BIGINT, vts TIMESTAMP(3))
      WITH ('connector'='filesystem', 'path'='$root/facts', 'format'='parquet')""")
    e.createTemporalTableFunction("tfn_rates_fn", "tfn_rates", "vts", "k")
    val rows = e.sqlQuery("""
      SELECT f.fid, r.rate
      FROM tfn_facts f, LATERAL TABLE(tfn_rates_fn(f.vts)) AS r WHERE f.k = r.k
      ORDER BY f.fid""").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // fact 3 (k=2, t=14) precedes key 2's first version → dropped (inner as-of)
    assert(rows == Seq((1L, 100L), (2L, 200L)))
    // a non-temporal LATERAL TABLE still goes through the UDTF correlate
    e.executeSql("CREATE TEMPORARY FUNCTION tfn_split AS 'split'")
    val udtf = e.sqlQuery("""
      SELECT word FROM (SELECT 'a-b' AS st) t, LATERAL TABLE(tfn_split(t.st, '-')) AS T(word)
      ORDER BY word""").collect().map(_.getString(0)).toSeq
    assert(udtf == Seq("a", "b"))
  }

  test("statement classification is full-match: DDL keywords inside literals never reroute") {
    // the VERDICT watch item on regex-first classification: every regex is
    // matched against the WHOLE trimmed statement (Scala unapplySeq), so a
    // keyword-bearing literal or lookalike identifier must stay a query
    val e = new EngineEnv(spark)
    e.executeSql("""
      CREATE TABLE cls_t WITH ('connector'='datagen', 'number-of-rows'='5')""")
    // 1. SELECT carrying DDL keywords in literals routes to the query path
    val r1 = e.executeSql(
      "SELECT 'CREATE TABLE trap' AS a, 'DROP DATABASE d' AS b, id FROM cls_t ORDER BY id")
    assert(r1.count() == 5 && r1.head.getString(0) == "CREATE TABLE trap")
    // 2. CREATE VIEW whose body contains further AS + keyword literals
    e.executeSql(
      "CREATE VIEW cls_v AS SELECT id AS k, 'INSERT OVERWRITE x' AS note FROM cls_t")
    assert(e.sqlQuery("SELECT note FROM cls_v LIMIT 1").head.getString(0)
      == "INSERT OVERWRITE x")
    // 3. lookalike identifiers (use_y, explain_z) are not USE/EXPLAIN
    e.executeSql("CREATE VIEW use_y AS SELECT id FROM cls_t")
    assert(e.executeSql("SELECT COUNT(*) AS n FROM use_y").head.getLong(0) == 5)
    // 4. EXPLAIN really is EXPLAIN (returns a plan, not rows)
    val ex = e.executeSql("EXPLAIN SELECT id FROM cls_t").collect().map(_.getString(0)).mkString
    assert(ex.contains("Physical Plan") || ex.contains("=="))
  }

  test("raw format: single-field contract, BYTES payload, streaming read") {
    val dir = s"${graft.streaming.StreamOps.scratchRoot}/raw_spec"
    spark.range(2).selectExpr("CASE WHEN id = 0 THEN 'alpha' ELSE 'beta' END AS value")
      .write.mode("overwrite").text(dir)
    val e = new EngineEnv(spark)
    // ref RawFormatFactory.validateAndExtractSingleField: >1 physical column rejected
    val multi = intercept[IllegalArgumentException](e.executeSql(s"""
      CREATE TABLE raw_bad (a STRING, b STRING)
      WITH ('connector'='filesystem', 'path'='$dir', 'format'='raw')"""))
    assert(multi.getMessage.contains("single physical column"))
    // numeric payloads need byte framing the line staging can't carry
    val num = intercept[IllegalArgumentException](e.executeSql(s"""
      CREATE TABLE raw_int (n INT)
      WITH ('connector'='filesystem', 'path'='$dir', 'format'='raw')"""))
    assert(num.getMessage.contains("payload type"))
    e.executeSql(s"""
      CREATE TABLE raw_b (payload BYTES)
      WITH ('connector'='filesystem', 'path'='$dir', 'format'='raw')""")
    val got = e.sqlQuery("SELECT CAST(payload AS STRING) AS s FROM raw_b")
      .collect().map(_.getString(0)).toSet
    assert(got == Set("alpha", "beta"))
    assert(e.sqlQuery("SELECT payload FROM raw_b").schema.head.dataType ==
      org.apache.spark.sql.types.BinaryType)
    val stream = e.fromStream("raw_b")
    assert(stream.isStreaming && stream.schema.fieldNames.sameElements(Array("payload")))
  }
}
