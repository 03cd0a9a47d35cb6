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

    // time attributes (quote-aware: 'PROCTIME()' in a literal stays text)
    s = replaceFnOutsideQuotes(s, """(?i)PROCTIME\(\)""".r, _ => "current_timestamp()")

    // TRUNCATE(x[, d]) — Flink numeric truncation toward zero
    // (SqlFunctionUtils.struncate, 1- and 2-arg overloads); Spark has no
    // numeric truncate, so emit the sign-correct floor/ceil form. The
    // rewriter is the balanced-paren scanner (ADVICE r13): word-boundary
    // anchored (MY_TRUNCATE( untouched), quote-aware (literals untouched),
    // nested-call args like TRUNCATE(ABS(x), 2) supported.
    s = rewriteCall(s, "TRUNCATE") {
      case Seq(x) =>
        // 1-arg = truncate to 0 places — integral floor/ceil keeps the
        // render integral
        Some(s"(CASE WHEN ($x) >= 0 THEN floor($x) ELSE ceil($x) END)")
      case Seq(x, d) if d.matches("""\d+""") =>
        val p = s"1e$d"
        Some(s"(CASE WHEN ($x) >= 0 THEN floor(($x) * $p) / $p ELSE ceil(($x) * $p) / $p END)")
      case _ => None // non-literal precision: leave as-is (unresolvable, loud)
    }

    // FLOOR(ts TO unit) / CEIL(ts TO unit) — SQL-standard temporal
    // rounding (ref FlinkSqlOperatorTable FLOOR/CEIL with the Calcite
    // TO-unit form; expectation rows in TemporalTypesTest.scala:738-773).
    // Spark's parser has no TO-unit syntax, so lower onto date_trunc:
    // FLOOR = date_trunc; CEIL = date_trunc, +1 unit unless already on the
    // boundary. The balanced-paren scanner keeps nested args (CAST(...))
    // working and quoted text untouched. Cast back to the operand's own
    // type is unnecessary: reference FLOOR(TIMESTAMP)→TIMESTAMP, and
    // date_trunc returns TIMESTAMP.
    // unit set = the reference's timestampFloor/Ceil support (HOUR/DAY/
    // MONTH/QUARTER/YEAR in SqlDateTimeUtils.timestampFloor:754, MINUTE/
    // SECOND via the planner's arithmetic path; WEEK is an AssertionError
    // there and is deliberately NOT mapped here)
    val tsUnits = Map(
      "SECOND" -> ("SECOND", "INTERVAL 1 SECOND"), "MINUTE" -> ("MINUTE", "INTERVAL 1 MINUTE"),
      "HOUR" -> ("HOUR", "INTERVAL 1 HOUR"), "DAY" -> ("DAY", "INTERVAL 1 DAY"),
      "MONTH" -> ("MONTH", "INTERVAL 1 MONTH"),
      "QUARTER" -> ("QUARTER", "INTERVAL 3 MONTH"), "YEAR" -> ("YEAR", "INTERVAL 1 YEAR"))
    val toUnit = ("""(?is)^(.*\S)\s+TO\s+(""" + tsUnits.keys.mkString("|") + ")$").r
    for (fnName <- Seq("FLOOR", "CEIL", "CEILING"))
      s = rewriteCall(s, fnName) {
        case Seq(toUnit(x, u)) =>
          val (unit, step) = tsUnits(u.toUpperCase)
          if (fnName == "FLOOR") Some(s"date_trunc('$unit', $x)")
          else {
            // Calcite quirk the reference inherits (SqlDateTimeUtils
            // .timestampCeil:797): for MONTH/QUARTER/YEAR the value is
            // first floored to whole DAYS (utcTs / MILLIS_PER_DAY), so
            // CEIL('2018-03-01 21:00:01' TO MONTH) is 2018-03-01 — the
            // boundary test compares the DATE portion, not the full
            // timestamp. Sub-day units ceil on the exact value.
            val probe =
              if (Set("MONTH", "QUARTER", "YEAR")(unit)) s"date_trunc('DAY', $x)"
              else s"CAST($x AS TIMESTAMP)"
            Some(s"(CASE WHEN date_trunc('$unit', $x) = $probe " +
              s"THEN date_trunc('$unit', $x) ELSE date_trunc('$unit', $x) + $step END)")
          }
        case _ => None
      }

    // SQL_TSI_* interval-unit spellings (Calcite's TimeUnit aliases, valid
    // in Flink TIMESTAMPADD/TIMESTAMPDIFF) → the plain unit Spark accepts.
    // Quote-aware (ADVICE r14): a string literal containing 'SQL_TSI_DAY'
    // stays verbatim — only unquoted occurrences rewrite.
    s = replaceFnOutsideQuotes(s,
      """(?i)\bSQL_TSI_(YEAR|QUARTER|MONTH|WEEK|DAY|HOUR|MINUTE|SECOND)\b""".r,
      m => m.group(1))

    // TIMESTAMPADD(day-or-coarser, n, x) keeps x's own type in the
    // reference (ScalarFunctionsTest:3380 pins DATE '2016-06-15' + DAY →
    // '2016-06-16', no time part; sub-day units yield TIMESTAMP) — Spark's
    // timestampadd always returns TIMESTAMP. Spark's INTERVAL-literal
    // addition has exactly the reference's polymorphic typing (DATE +
    // INTERVAL 'n' DAY/MONTH → DATE with month-end clamping; TIMESTAMP →
    // TIMESTAMP), so for a literal count the call lowers onto interval
    // arithmetic and DATE-typed COLUMNS come out right too (VERDICT r14
    // #5 — the string rewriter needs no type knowledge this way). WEEK
    // and QUARTER scale onto DAY/MONTH; a non-literal count falls back to
    // timestampadd (TIMESTAMP-typed for DATE operands — documented in
    // COVERAGE.md, the remaining sliver of the divergence).
    s = rewriteCall(s, "TIMESTAMPADD") {
      case Seq(unit, n, operand)
          if Set("DAY", "WEEK", "MONTH", "QUARTER", "YEAR")(unit.toUpperCase) &&
             n.matches("""[+-]?\d+""") =>
        val (base, mult) = unit.toUpperCase match {
          case "WEEK"    => ("DAY", 7L)
          case "QUARTER" => ("MONTH", 3L)
          case u         => (u, 1L)
        }
        Some(s"(($operand) + INTERVAL '${n.toLong * mult}' $base)")
      case Seq(unit, n, operand)
          if Set("DAY", "WEEK", "MONTH", "QUARTER", "YEAR")(unit.toUpperCase) &&
             operand.toUpperCase.startsWith("DATE '") =>
        Some(s"CAST(TIMESTAMPADD($unit, $n, $operand) AS DATE)")
      case _ => None
    }

    // RAND_INTEGER(n) — Flink integer-bounded random (FlinkSqlOperatorTable
    // RAND_INTEGER) → floor(rand()*n); quote-aware (the bound is numeric,
    // never quoted, so the segment scanner applies)
    s = replaceFnOutsideQuotes(s, """(?i)\bRAND_INTEGER\(\s*([^,()]+?)\s*\)""".r,
      m => s"CAST(floor(rand() * (${m.group(1)})) AS INT)")

    // (s1, e1) OVERLAPS (s2, e2) — SQL-standard period overlap (ref
    // TemporalOverlaps in planner expressions/time.scala, following
    // Calcite's StandardConvertletTable.convertOverlaps): an INTERVAL
    // second element means end = start + interval; each period is
    // normalized (swap so start <= end, here LEAST/GREATEST); overlap ⇔
    // e0 >= s1 AND e1 >= s0 — endpoints INCLUSIVE. Operands are simple
    // (no nested parens/commas); Spark evaluates the emitted expression.
    // quote-MASKED matching (grammar fuzz r15): a literal containing
    // "(x, y) OVERLAPS (a, b)" must stay verbatim, while real operands may
    // themselves carry quoted literals (TIMESTAMP '...'), which rules out
    // the segment-split scanner
    s = replaceFnQuoteMasked(s,
      """(?i)\(\s*([^,()]+?)\s*,\s*([^,()]+?)\s*\)\s+OVERLAPS\s+\(\s*([^,()]+?)\s*,\s*([^,()]+?)\s*\)""".r,
      g => {
        val intervalRe = """(?i)^INTERVAL\s+'.*""".r
        def end(p: String, t: String): String =
          if (intervalRe.findFirstIn(t).isDefined) s"($p + $t)" else t
        val (p0, e0) = (g(1), end(g(1), g(2)))
        val (p1, e1) = (g(3), end(g(3), g(4)))
        s"((GREATEST($p0, $e0) >= LEAST($p1, $e1)) AND (GREATEST($p1, $e1) >= LEAST($p0, $e0)))"
      })

    // CAST(x AS VARCHAR) — Flink accepts a bare (length-less) VARCHAR /
    // CHAR in cast targets (legacy string-cast behavior, no truncation);
    // Spark's parser requires a length. Map to STRING (same no-truncation
    // semantics). Length-carrying VARCHAR(n) passes through untouched.
    // ADVICE r13: the rewrite now requires an actual CAST/TRY_CAST call
    // context (balanced-paren scan, quote-aware) instead of firing on any
    // "AS VARCHAR)" text — literals and aliases containing that text are
    // safe.
    val bareStringTarget = """(?is)^(.*\sAS)\s+(?:VARCHAR|CHAR)$""".r
    for (castName <- Seq("CAST", "TRY_CAST"))
      s = rewriteCall(s, castName) {
        case Seq(bareStringTarget(prefix)) => Some(s"$castName($prefix STRING)")
        case _                             => None
      }

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

  /** [[replaceFn]] with the regex matched against a copy of `s` whose
    * quoted CONTENTS are masked to \\u0001 (quote chars kept): the pattern
    * can still span quoted operands it legitimately contains (`TIMESTAMP
    * '2024-01-01'` inside an OVERLAPS period), but pattern-shaped text
    * sitting WHOLLY inside a string literal can never match — the
    * grammar-fuzz mangle class. `f` reads group text from the ORIGINAL
    * string by match positions (null for an unmatched optional group), so
    * the emitted rewrite carries the real quoted content. Only for
    * patterns whose groups never need to SEE quoted characters' values
    * ((\d+) inside quotes would mask away). */
  private[graft] def replaceFnQuoteMasked(s: String, r: scala.util.matching.Regex,
                                          f: (Int => String) => String): String = {
    val a = s.toCharArray
    var i = 0
    var q: Char = 0
    while (i < a.length) {
      val c = a(i)
      if (q != 0) { if (c == q) q = 0 else a(i) = '\u0001' }
      else if (c == '\'' || c == '"' || c == '`') q = c
      i += 1
    }
    val masked = new String(a)
    val out = new StringBuilder
    var last = 0
    for (m <- r.findAllMatchIn(masked)) {
      out.append(s.substring(last, m.start))
      out.append(f(g => if (m.start(g) < 0) null else s.substring(m.start(g), m.end(g))))
      last = m.end
    }
    out.append(s.substring(last))
    out.toString
  }

  /** [[replaceFn]], applied only OUTSIDE '...'/"..."/`...` quoted regions:
    * the text is split at quote boundaries and the regex runs on the
    * unquoted spans alone, so literals survive verbatim. Quote chars are
    * not word chars, so a `\b` anchor at a span edge behaves as in the
    * full string. */
  private[graft] def replaceFnOutsideQuotes(s: String, r: scala.util.matching.Regex,
                                            f: scala.util.matching.Regex.Match => String): String = {
    val out = new StringBuilder
    val seg = new StringBuilder
    var quote: Char = 0
    def flushSeg(): Unit = { out.append(replaceFn(seg.toString, r, f)); seg.clear() }
    for (c <- s) {
      if (quote != 0) { out.append(c); if (c == quote) quote = 0 }
      else if (c == '\'' || c == '"' || c == '`') { flushSeg(); out.append(c); quote = c }
      else seg.append(c)
    }
    flushSeg()
    out.toString
  }

  /** Rewrite every `NAME(...)` call in `s` (case-insensitive, the name
    * word-boundary-anchored so `MY_NAME(` never matches) with proper
    * balanced-paren scanning and quote awareness: occurrences inside
    * '...'/"..."/`...` regions are left alone, and parens/commas inside
    * such regions don't count toward nesting. `f` receives the top-level
    * comma-split argument list (each argument recursively rewritten first,
    * then trimmed) and returns the replacement text, or None to
    * reconstruct the call unchanged (modulo argument-level rewrites and
    * trim). Unbalanced parens leave the text untouched.
    *
    * This is the ADVICE-r13 replacement for the `[^,()]+?` regex
    * arguments, which silently skipped nested calls and fired on
    * identifier tails.
    */
  private[graft] def rewriteCall(s: String, name: String)
                                (f: PartialFunction[Seq[String], Option[String]]): String = {
    val n = name.length
    def isWord(c: Char) = c.isLetterOrDigit || c == '_'
    val out = new StringBuilder
    var i = 0
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        out.append(c); if (c == quote) quote = 0; i += 1
      } else if (c == '\'' || c == '"' || c == '`') {
        quote = c; out.append(c); i += 1
      } else if (s.regionMatches(true, i, name, 0, n) &&
                 (i == 0 || !isWord(s.charAt(i - 1))) && {
                   // SQL allows whitespace between name and paren
                   // ('TRUNCATE (x, 2)') — skip it before requiring '('
                   // (ADVICE r14)
                   var p = i + n
                   while (p < s.length && s.charAt(p).isWhitespace) p += 1
                   p < s.length && s.charAt(p) == '('
                 }) {
        var parenAt = i + n
        while (s.charAt(parenAt) != '(') parenAt += 1
        var j = parenAt + 1
        var depth = 1
        var q: Char = 0
        val commas = scala.collection.mutable.ArrayBuffer.empty[Int]
        while (j < s.length && depth > 0) {
          val cj = s.charAt(j)
          if (q != 0) { if (cj == q) q = 0 }
          else if (cj == '\'' || cj == '"' || cj == '`') q = cj
          else if (cj == '(') depth += 1
          else if (cj == ')') { depth -= 1 }
          else if (cj == ',' && depth == 1) commas += j
          j += 1
        }
        if (depth != 0) { out.append(c); i += 1 } // unbalanced: leave verbatim
        else {
          val argStart = parenAt + 1
          val cuts = (argStart +: commas.map(_ + 1).toSeq).zip(commas.toSeq :+ (j - 1))
          val rawArgs = cuts.map { case (a, b) => s.substring(a, b) }
          // empty arg list: CAST() can't occur but NAME() might — no args
          val args =
            if (rawArgs.size == 1 && rawArgs.head.trim.isEmpty) Seq.empty[String]
            else rawArgs.map(a => rewriteCall(a, name)(f).trim)
          f.applyOrElse(args, (_: Seq[String]) => None) match {
            case Some(rep) => out.append(rep)
            case None      =>
              out.append(s.substring(i, argStart)).append(args.mkString(", ")).append(')')
          }
          i = j
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

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
