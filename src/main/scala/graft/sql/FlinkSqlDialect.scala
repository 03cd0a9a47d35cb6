package graft.sql

/** Flink-SQL → Spark-SQL dialect rewriter (SURVEY.md §3.1 / §7: "our engine
  * is a library on top: SQL text goes through spark.sql after our dialect
  * layer rewrites Flink-specific syntax").
  *
  * Reference surface being translated:
  *  - group-window functions TUMBLE/HOP/SESSION (+_START/_END) —
  *    FlinkSqlOperatorTable.java TUMBLE_OLD…SESSION_PROCTIME block, rewrite
  *    rule StreamLogicalWindowAggregateRule.scala;
  *  - PROCTIME() time attribute — ref TimestampKind PROCTIME
  *    (TimestampType.java:51);
  *  - interval literal spelling `INTERVAL '10' MINUTE` → Spark window
  *    duration strings.
  *
  * String-level rewriting is deliberate (SURVEY §7: "string/AST level, not a
  * Catalyst Rule"): the output is plain Spark SQL, so Catalyst owns
  * analysis, optimization and codegen — the translation layer adds zero
  * runtime cost.
  *
  * Spark SQL notes: `GROUP BY window(ts, '10 minutes')` exposes the group
  * as a `window` struct column (analyzer rule TimeWindowing), so
  * TUMBLE_START/_END map to `window.start`/`window.end`; HOP argument order
  * flips (Flink: time, slide, size → Spark: time, size, slide); SESSION
  * maps to `session_window` whose struct is named `session_window`.
  */
object FlinkSqlDialect {

  private val unitMap = Map(
    "SECOND" -> "seconds", "MINUTE" -> "minutes", "HOUR" -> "hours", "DAY" -> "days")

  private def dur(n: String, unit: String): String = s"'$n ${unitMap(unit.toUpperCase)}'"

  // INTERVAL '5' MINUTE (inside window fn args)
  private val I = """INTERVAL\s+'(\d+)'\s+(SECOND|MINUTE|HOUR|DAY)"""

  def rewrite(flinkSql: String): String = {
    var s = flinkSql

    // window-bound accessors BEFORE the assigners (longer names first)
    s = s.replaceAll(s"""(?i)TUMBLE_START\\(\\s*([\\w.]+)\\s*,\\s*$I\\s*\\)""", "window.start")
    s = s.replaceAll(s"""(?i)TUMBLE_END\\(\\s*([\\w.]+)\\s*,\\s*$I\\s*\\)""", "window.end")
    s = s.replaceAll(s"""(?i)HOP_START\\(\\s*([\\w.]+)\\s*,\\s*$I\\s*,\\s*$I\\s*\\)""", "window.start")
    s = s.replaceAll(s"""(?i)HOP_END\\(\\s*([\\w.]+)\\s*,\\s*$I\\s*,\\s*$I\\s*\\)""", "window.end")
    s = s.replaceAll(s"""(?i)SESSION_START\\(\\s*([\\w.]+)\\s*,\\s*$I\\s*\\)""", "session_window.start")
    s = s.replaceAll(s"""(?i)SESSION_END\\(\\s*([\\w.]+)\\s*,\\s*$I\\s*\\)""", "session_window.end")

    // assigners
    s = replaceFn(s, """(?i)TUMBLE\(\s*([\w.]+)\s*,\s*INTERVAL\s+'(\d+)'\s+(\w+)\s*\)""".r,
      m => s"window(${m.group(1)}, ${dur(m.group(2), m.group(3))})")
    // Flink HOP(time, slide, size) → Spark window(time, size, slide)
    s = replaceFn(s, """(?i)HOP\(\s*([\w.]+)\s*,\s*INTERVAL\s+'(\d+)'\s+(\w+)\s*,\s*INTERVAL\s+'(\d+)'\s+(\w+)\s*\)""".r,
      m => s"window(${m.group(1)}, ${dur(m.group(4), m.group(5))}, ${dur(m.group(2), m.group(3))})")
    s = replaceFn(s, """(?i)SESSION\(\s*([\w.]+)\s*,\s*INTERVAL\s+'(\d+)'\s+(\w+)\s*\)""".r,
      m => s"session_window(${m.group(1)}, ${dur(m.group(2), m.group(3))})")

    // time attributes
    s = s.replaceAll("""(?i)PROCTIME\(\)""", "current_timestamp()")

    // TRUNCATE(x, d) — Flink numeric truncation toward zero
    // (SqlFunctionUtils.struncate); Spark has no numeric truncate, so emit
    // the sign-correct floor/ceil form. Simple (paren-free) first argument.
    s = replaceFn(s, """(?i)TRUNCATE\(\s*([^,()]+?)\s*,\s*(\d+)\s*\)""".r, m => {
      val (x, p) = (m.group(1), s"1e${m.group(2)}")
      s"(CASE WHEN ($x) >= 0 THEN floor(($x) * $p) / $p ELSE ceil(($x) * $p) / $p END)"
    })
    // 1-arg TRUNCATE(x) = truncate to 0 places (SqlFunctionUtils.struncate
    // single-arg overload) — integral floor/ceil keeps the render integral
    s = replaceFn(s, """(?i)TRUNCATE\(\s*([^,()]+?)\s*\)""".r, m => {
      val x = m.group(1)
      s"(CASE WHEN ($x) >= 0 THEN floor($x) ELSE ceil($x) END)"
    })

    // RAND_INTEGER(n) — Flink integer-bounded random (FlinkSqlOperatorTable
    // RAND_INTEGER) → floor(rand()*n)
    s = replaceFn(s, """(?i)RAND_INTEGER\(\s*([^,()]+?)\s*\)""".r,
      m => s"CAST(floor(rand() * (${m.group(1)})) AS INT)")

    // (s1, e1) OVERLAPS (s2, e2) — SQL-standard period overlap (ref
    // TemporalOverlaps in planner expressions/time.scala, following
    // Calcite's StandardConvertletTable.convertOverlaps): an INTERVAL
    // second element means end = start + interval; each period is
    // normalized (swap so start <= end, here LEAST/GREATEST); overlap ⇔
    // e0 >= s1 AND e1 >= s0 — endpoints INCLUSIVE. Operands are simple
    // (no nested parens/commas); Spark evaluates the emitted expression.
    s = replaceFn(s,
      """(?i)\(\s*([^,()]+?)\s*,\s*([^,()]+?)\s*\)\s+OVERLAPS\s+\(\s*([^,()]+?)\s*,\s*([^,()]+?)\s*\)""".r,
      m => {
        val intervalRe = """(?i)^INTERVAL\s+'.*""".r
        def end(p: String, t: String): String =
          if (intervalRe.findFirstIn(t).isDefined) s"($p + $t)" else t
        val (p0, e0) = (m.group(1), end(m.group(1), m.group(2)))
        val (p1, e1) = (m.group(3), end(m.group(3), m.group(4)))
        s"((GREATEST($p0, $e0) >= LEAST($p1, $e1)) AND (GREATEST($p1, $e1) >= LEAST($p0, $e0)))"
      })

    // CAST(x AS VARCHAR) — Flink accepts a bare (length-less) VARCHAR /
    // CHAR in cast targets (legacy string-cast behavior, no truncation);
    // Spark's parser requires a length. Map to STRING (same no-truncation
    // semantics). Length-carrying VARCHAR(n) passes through untouched.
    s = replaceFn(s, """(?i)\bAS\s+(VARCHAR|CHAR)\s*\)""".r, _ => "AS STRING)")

    // SIMILAR TO — SQL-regex predicate (ref FlinkSqlOperatorTable SIMILAR,
    // rewrite semantics per SqlLikeUtils.sqlToRegexSimilar): SQL wildcards
    // % / _ become (?s:.*) / . — but ONLY outside [...] character
    // enumerations, where they stay literal; an ESCAPE 'x' clause makes the
    // following char literal. Remaining regex syntax ((), |, quantifiers)
    // passes through — Spark spells it RLIKE
    s = replaceFn(s, """(?i)(NOT\s+)?SIMILAR\s+TO\s+'([^']*)'(\s+ESCAPE\s+'(.)')?""".r, m => {
      val pat = similarToRegex(m.group(2), Option(m.group(4)).map(_.head))
      val not = if (m.group(1) != null) "NOT " else ""
      s"${not}RLIKE '^(?:$pat)$$'"
    })
    s
  }

  private def replaceFn(s: String, r: scala.util.matching.Regex,
                        f: scala.util.matching.Regex.Match => String): String =
    r.replaceAllIn(s, m => scala.util.matching.Regex.quoteReplacement(f(m)))

  /** SQL SIMILAR TO pattern → Java regex, via the same character walk the
    * reference uses (SqlLikeUtils.sqlToRegexSimilar): wildcard substitution
    * is suppressed inside [...] enumerations, % maps to dotall (?s:.*) so a
    * multi-line value still matches, and the declared escape char makes the
    * next char literal (regex-quoted). */
  private[graft] def similarToRegex(pat: String, escape: Option[Char]): String = {
    val out = new StringBuilder
    // regex-quote one ordinary char for embedding in a single-quoted Spark
    // SQL string: the SQL text needs a DOUBLE backslash per regex
    // backslash — Spark's string-literal parser consumes one level before
    // RLIKE compiles the regex (so a literal '\' needs four).
    def quoted(c: Char): Unit =
      if (c.isLetterOrDigit) out.append(c)
      else if (c == '\\') out.append("\\\\\\\\")
      else out.append("\\\\").append(c)
    var i = 0
    var inBracket = false
    while (i < pat.length) {
      val c = pat.charAt(i)
      if (escape.contains(c) && !inBracket && i + 1 < pat.length) {
        quoted(pat.charAt(i + 1)) // literal next char
        i += 1
      } else if (inBracket) {
        out.append(c)
        if (c == ']') inBracket = false
      } else c match {
        case '[' => out.append(c); inBracket = true
        case '%' => out.append("(?s:.*)")
        case '_' => out.append('.')
        // '$' and '\' are ORDINARY pattern chars and get regex-escaped —
        // the reference's exact switch (SqlLikeUtils.sqlToRegexSimilar,
        // flink-table-runtime-blink SqlLikeUtils.java:201: case '\\' →
        // "\\\\", case '$' → "\\$"). '.' is NOT in its
        // JAVA_REGEX_SPECIALS and falls through RAW — a regex dot, pinned
        // by SqlExpressionTest ('TEST' SIMILAR TO '.EST' = true).
        case '$' | '\\' => quoted(c)
        case _   => out.append(c)
      }
      i += 1
    }
    out.toString
  }
}
