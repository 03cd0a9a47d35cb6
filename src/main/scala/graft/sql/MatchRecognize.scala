package graft.sql

import graft.operators.Cep
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** SQL MATCH_RECOGNIZE front-end (scoped subset) over the [[Cep]] NFA.
  *
  * Reference: SQL planned by flink-table-planner-blink physical/stream/
  * StreamExecMatch.scala:68 + MatchCodeGenerator.scala, executed on the CEP
  * NFA (NFA.java:86); skip strategies in flink-cep/.../nfa/aftermatch/
  * AfterMatchSkipStrategy.java. Supported subset (MatchRecognizeITCase
  * core shapes):
  *
  * {{{
  * SELECT * FROM <table> MATCH_RECOGNIZE (
  *   PARTITION BY <col> [, <col>...]
  *   ORDER BY <tsCol>
  *   MEASURES A.col AS name [, FIRST(B.col[, off]) AS n2, LAST(B.col[, off]) AS n3,
  *            RUNNING LAST(B.col) AS r1, FINAL LAST(B.col) AS f1,
  *            MATCH_NUMBER() AS mn, CLASSIFIER() AS cls, ...]
  *   [ONE ROW PER MATCH | ALL ROWS PER MATCH]
  *   [AFTER MATCH SKIP TO NEXT ROW | SKIP PAST LAST ROW |
  *    SKIP TO FIRST <var> | SKIP TO LAST <var>]
  *   PATTERN (A B+ C {m,n}-quantified...)
  *   [WITHIN INTERVAL 'n' UNIT]
  *   DEFINE A AS A.col = 'lit' [, B AS B.price > A.price,
  *          C AS C.price > PREV(C.price[, n]) ...]
  * )
  * }}}
  *
  * Pattern variables are strictly contiguous (the MATCH_RECOGNIZE
  * default), greedy quantifiers. `ALL ROWS PER MATCH` emits one row per
  * matched event with RUNNING measure semantics (Flink's default):
  * `X.col` / `LAST(X.col)` = the latest X at or before the current row,
  * `FIRST(X.col)` = the earliest so far, NULL until X first matches;
  * CLASSIFIER() is the current row's variable. SKIP TO FIRST/LAST <var>
  * resumes the scan at that row of the finished match; a resume target at
  * the match start throws (the reference rejects it as an infinite loop).
  * Execution: one hash-shuffle on the partition key, per-key time sort,
  * linear NFA scan — identical layout to [[Cep.detect]]. */
object MatchRecognize {

  /** fn: "", FIRST, LAST, MATCH_NUMBER, CLASSIFIER; mode: "" (default),
    * RUNNING, FINAL (only meaningful under ALL ROWS PER MATCH, where the
    * default is RUNNING — Flink's MatchCodeGenerator semantics); offset =
    * logical navigation offset for FIRST/LAST (`LAST(B.col, 1)`). */
  case class Measure(fn: String, variable: String, col: String, as: String,
                     mode: String = "", offset: Int = 0)
  /** Pattern element: a variable or a group (ref GroupPattern.java —
    * groups nest ARBITRARILY, `((A B)+ C){2}`, mirroring
    * `Pattern.begin(Pattern.begin(...))`); `greedy = false` = reluctant
    * (`B+?`, `(A B)*?`). */
  sealed trait PatElem
  case class PatVar(name: String, min: Int, max: Int, greedy: Boolean = true) extends PatElem
  case class PatGroup(elems: Seq[PatElem], min: Int, max: Int, greedy: Boolean = true) extends PatElem
  case class Define(variable: String, col: String, op: String, value: String,
                    rhsVar: Option[(String, String)] = None, // (variable, col) for cross-var predicates
                    rhsPrev: Option[(String, Int)] = None)   // (col, n) for PREV(X.col, n) physical navigation
  sealed trait Skip
  case object SkipToNextRow extends Skip
  case object SkipPastLastRow extends Skip
  case class SkipToFirst(v: String) extends Skip
  case class SkipToLast(v: String) extends Skip
  case class Spec(table: String, partitionBy: Seq[String], orderBy: String,
                  orderTiebreak: Option[String],
                  measures: Seq[Measure], pattern: Seq[PatElem],
                  withinMicros: Long, defines: Map[String, Seq[Define]],
                  skip: Skip, allRows: Boolean) {
    /** Pattern variables in global-id order (groups flattened recursively,
      * left to right — matches the leaf-creation order in [[run]]). */
    def flatVars: Seq[PatVar] = {
      def fl(es: Seq[PatElem]): Seq[PatVar] = es.flatMap {
        case v: PatVar => Seq(v)
        case g: PatGroup => fl(g.elems)
      }
      fl(pattern)
    }
  }

  private val outerRe =
    """(?is)\s*SELECT\s+\*\s+FROM\s+(\w+)\s+MATCH_RECOGNIZE\s*\((.*)\)\s*""".r
  private val partRe = """(?is)PARTITION\s+BY\s+(\w+(?:\s*,\s*\w+)*)""".r
  private val orderRe = """(?is)ORDER\s+BY\s+(\w+)(?:\s*,\s*(\w+))?""".r
  private val measuresRe = """(?is)MEASURES\s+(.*?)\s+(?:ONE\s+ROW|ALL\s+ROWS|AFTER\s+MATCH|PATTERN)""".r
  private val measureRe =
    """(?i)\s*(?:(RUNNING|FINAL)\s+)?(?:(FIRST|LAST)\s*\(\s*)?(\w+)\.(\w+)(?:\s*,\s*(\d+))?\s*\)?\s+AS\s+(\w+)\s*""".r
  private val measureFnRe = """(?i)\s*(MATCH_NUMBER|CLASSIFIER)\s*\(\s*\)\s+AS\s+(\w+)\s*""".r
  private val patternHeadRe = """(?is)PATTERN\s*\(""".r
  private val patQuantRe = """(\+\??|\*\??|\?\??|\{(\d+)(?:,(\d+))?\}(\?)?)?""".r
  private val patVarTokenRe = ("""(\w+)""" + patQuantRe).r
  private val withinRe = """(?is)WITHIN\s+INTERVAL\s+'(\d+)'\s+(\w+)""".r
  private val defineRe = """(?is)DEFINE\s+(.*)$""".r
  private val rowsPerRe = """(?is)(ONE\s+ROW|ALL\s+ROWS)\s+PER\s+MATCH""".r
  private val skipRe =
    """(?is)AFTER\s+MATCH\s+SKIP\s+(PAST\s+LAST\s+ROW|TO\s+NEXT\s+ROW|TO\s+FIRST\s+(\w+)|TO\s+LAST\s+(\w+))""".r
  private val defRe = """(?i)\s*(\w+)\s+AS\s+(\w+)\.(\w+)\s*(=|<>|>=|<=|>|<)\s*(?:'([^']*)'|([-\d.]+))\s*""".r
  // cross-variable predicate: B AS B.price > A.price (Flink IterativeCondition)
  private val defXRe = """(?i)\s*(\w+)\s+AS\s+(\w+)\.(\w+)\s*(=|<>|>=|<=|>|<)\s*(\w+)\.(\w+)\s*""".r
  // physical navigation: B AS B.price > PREV(B.price[, n]) (Flink pattern
  // navigation — PREV is row-offset, variable-agnostic)
  private val defPrevRe =
    """(?i)\s*(\w+)\s+AS\s+(\w+)\.(\w+)\s*(=|<>|>=|<=|>|<)\s*PREV\s*\(\s*(\w+)\.(\w+)(?:\s*,\s*(\d+))?\s*\)\s*""".r

  def isMatchRecognize(sql: String): Boolean = outerRe.matches(sql)

  /** `(min, max, greedy)` from a quantifier suffix: null, `+[?]`, `*[?]`,
    * `?[?]`, `{m[,n]}[?]` — trailing `?` = reluctant (SQL-standard lazy
    * quantifier, ref Quantifier.java greedy/lazy). */
  private def parseQuant(q: String, m: String, n: String, lzy: String): (Int, Int, Boolean) =
    q match {
      case null => (1, 1, true)
      case "+" => (1, Int.MaxValue, true)
      case "+?" => (1, Int.MaxValue, false)
      case "*" => (0, Int.MaxValue, true)
      case "*?" => (0, Int.MaxValue, false)
      case "?" => (0, 1, true)
      case "??" => (0, 1, false)
      case _ => // {m[,n]}[?]
        val lo = m.toInt
        (lo, Option(n).map(_.toInt).getOrElse(lo), lzy == null)
    }

  /** The balanced body of the `PATTERN ( ... )` clause — a regex cannot
    * bound arbitrarily nested groups, so the close paren is found by
    * depth counting. */
  private def patternBody(body: String): String =
    patternHeadRe.findFirstMatchIn(body).map { m =>
      var depth = 1; var i = m.end
      while (i < body.length && depth > 0) {
        body.charAt(i) match { case '(' => depth += 1; case ')' => depth -= 1; case _ => }
        i += 1
      }
      if (depth != 0) throw new IllegalArgumentException(s"unbalanced PATTERN clause in '$body'")
      body.substring(m.end, i - 1).trim
    }.getOrElse("")

  /** Cursor tokenizer over the PATTERN body: variables and ARBITRARILY
    * NESTED `( ... )` groups (ref GroupPattern.java), each with an
    * optional quantifier. */
  private def parsePattern(s: String): Seq[PatElem] = {
    val elems = scala.collection.mutable.ListBuffer[PatElem]()
    var cur = 0
    while (cur < s.length) {
      if (s.charAt(cur).isWhitespace) cur += 1
      else if (s.charAt(cur) == '(') {
        var depth = 1; var i = cur + 1
        while (i < s.length && depth > 0) {
          s.charAt(i) match { case '(' => depth += 1; case ')' => depth -= 1; case _ => }
          i += 1
        }
        if (depth != 0)
          throw new IllegalArgumentException(s"unbalanced group at '${s.substring(cur)}'")
        val inner = parsePattern(s.substring(cur + 1, i - 1))
        val qm = patQuantRe.findPrefixMatchOf(s.subSequence(i, s.length)).get
        val (lo, hi, g) = parseQuant(qm.group(1), qm.group(2), qm.group(3), qm.group(4))
        elems += PatGroup(inner, lo, hi, g)
        cur = i + qm.end
      } else patVarTokenRe.findPrefixMatchOf(s.subSequence(cur, s.length)) match {
        case Some(mm) =>
          val (lo, hi, g) = parseQuant(mm.group(2), mm.group(3), mm.group(4), mm.group(5))
          elems += PatVar(mm.group(1), lo, hi, g)
          cur += mm.end
        case None => throw new IllegalArgumentException(
          s"unsupported pattern token at '${s.substring(cur)}'")
      }
    }
    elems.toSeq
  }

  def parse(sql: String): Spec = {
    val outerRe(table, body) = sql: @unchecked
    val part = partRe.findFirstMatchIn(body).map(_.group(1))
      .getOrElse(throw new IllegalArgumentException("PARTITION BY required"))
      .split(",").map(_.trim).toSeq
    val orderM = orderRe.findFirstMatchIn(body)
      .getOrElse(throw new IllegalArgumentException("ORDER BY required"))
    val order = orderM.group(1)
    val tiebreak = Option(orderM.group(2))
    // split measures on top-level commas only — `LAST(B.col, 1)` has one inside parens
    def splitTop(s: String): Seq[String] = {
      val parts = scala.collection.mutable.ListBuffer[String]()
      var depth = 0; var last = 0
      s.zipWithIndex.foreach {
        case ('(', _) => depth += 1
        case (')', _) => depth -= 1
        case (',', i) if depth == 0 => parts += s.substring(last, i); last = i + 1
        case _ =>
      }
      (parts += s.substring(last)).toSeq
    }
    val measures = measuresRe.findFirstMatchIn(body).map(_.group(1)).toSeq
      .flatMap(splitTop).map {
        case measureFnRe(fn, as) => Measure(fn.toUpperCase, "", "", as)
        case measureRe(mode, fn, v, c, off, as) =>
          Measure(Option(fn).getOrElse("").toUpperCase, v, c, as,
            mode = Option(mode).getOrElse("").toUpperCase,
            offset = Option(off).map(_.toInt).getOrElse(0))
        case other => throw new IllegalArgumentException(s"unsupported measure '$other'")
      }
    val pattern = parsePattern(patternBody(body))
    val within = withinRe.findFirstMatchIn(body).map { m =>
      val n = m.group(1).toLong
      m.group(2).toUpperCase match {
        case "MILLISECOND" => n * 1000L
        case "SECOND" => n * 1000000L
        case "MINUTE" => n * 60L * 1000000
        case "HOUR" => n * 3600L * 1000000
        case "DAY" => n * 86400L * 1000000
        case other => throw new IllegalArgumentException(
          s"unsupported WITHIN INTERVAL unit '$other' (use MILLISECOND/SECOND/MINUTE/HOUR/DAY)")
      }
    }.getOrElse(Long.MaxValue)
    // each define item is `VAR AS <conjunct> [AND <conjunct> ...]` — Flink
    // DEFINEs are arbitrary boolean expressions; the conjunctive subset
    // covers the common shapes (incl. absence-pattern skip variables like
    // `S AS S.t <> 'a' AND S.t <> 'b'`)
    val defines = defineRe.findFirstMatchIn(body).map(_.group(1)).toSeq
      .flatMap(splitTop).map { item =>
        val headM = """(?is)^\s*(\w+)\s+AS\s+(.*)$""".r.findFirstMatchIn(item)
          .getOrElse(throw new IllegalArgumentException(s"unsupported define '$item'"))
        val v = headM.group(1).toUpperCase
        val conjuncts = headM.group(2).split("(?i)\\s+AND\\s+").toSeq.map { cj =>
          s"$v AS $cj" match {
            case defRe(_, _, c, op, slit, nlit) =>
              Define(v, c, op, if (slit != null) slit else nlit)
            case defPrevRe(_, _, c, op, _, pc, off) =>
              Define(v, c, op, "", rhsPrev = Some((pc, Option(off).map(_.toInt).getOrElse(1))))
            case defXRe(_, _, c, op, rv, rc) =>
              Define(v, c, op, "", rhsVar = Some((rv.toUpperCase, rc)))
            case other => throw new IllegalArgumentException(s"unsupported define conjunct '$cj'")
          }
        }
        v -> conjuncts
      }.toMap
    val skip = skipRe.findFirstMatchIn(body).map { m =>
      val head = m.group(1).toUpperCase
      if (head.startsWith("PAST")) SkipPastLastRow
      else if (head.startsWith("TO NEXT")) SkipToNextRow
      else if (m.group(2) != null) SkipToFirst(m.group(2).toUpperCase)
      else SkipToLast(m.group(3).toUpperCase)
    }.getOrElse(SkipToNextRow)
    val allRows = rowsPerRe.findFirstMatchIn(body)
      .exists(_.group(1).toUpperCase.startsWith("ALL"))
    Spec(table, part, order, tiebreak, measures, pattern, within, defines, skip, allRows)
  }

  def run(spark: SparkSession, sql: String): DataFrame = {
    val spec = parse(sql)
    val df = spark.table(spec.table)
    val schema = df.schema
    val keyIdx = spec.partitionBy.map(schema.fieldIndex)
    val tsIdx = schema.fieldIndex(spec.orderBy)

    // global variable ids = flattened pattern order (group members inline)
    val flat = spec.flatVars
    val varIdxOf = flat.map(_.name.toUpperCase).zipWithIndex.toMap
    val varNames = flat.map(_.name.toUpperCase).toIndexedSeq
    // exact numeric compare: BigDecimal(toString) is lossless for BIGINT
    // above 2^53 and DECIMAL — routing through Double is not
    def toBig(v: Any): java.math.BigDecimal = v match {
      case d: java.math.BigDecimal => d
      case d: BigDecimal => d.bigDecimal
      case other => new java.math.BigDecimal(other.toString)
    }
    def cmpNum(x: Any, op: String, y: Any): Boolean = {
      val c = toBig(x).compareTo(toBig(y))
      op match {
        case "=" => c == 0; case "<>" => c != 0
        case ">" => c > 0; case "<" => c < 0
        case ">=" => c >= 0; case "<=" => c <= 0
      }
    }
    def cmpStr(x: String, op: String, y: String): Boolean = op match {
      case "=" => x == y; case "<>" => x != y
      case ">" => x > y; case "<" => x < y
      case ">=" => x >= y; case "<=" => x <= y
    }
    def predOf(v: PatVar): (Row, Cep.MatchCtx[Row]) => Boolean = spec.defines.get(v.name.toUpperCase) match {
      case None => (_: Row, _: Cep.MatchCtx[Row]) => true // undefined variable matches any row
      case Some(conjuncts) =>
        val preds = conjuncts.map(conjunctPred)
        (r: Row, ctx: Cep.MatchCtx[Row]) => preds.forall(_(r, ctx))
    }
    def conjunctPred(d: Define): (Row, Cep.MatchCtx[Row]) => Boolean = {
        val ci = schema.fieldIndex(d.col)
        val isNum = schema(ci).dataType.isInstanceOf[NumericType]
        (d.rhsPrev, d.rhsVar) match {
          case (Some((pc, n)), _) =>
            // PREV(col, n): compare against the n-th physical predecessor.
            // All steps are strict-contiguous, so the matched prefix IS the
            // physical run — nthBack(n) is the offset read. PREV beyond the
            // match start (e.g. the anchor row) is NULL → predicate false,
            // matching the reference's null-comparison semantics.
            val pci = schema.fieldIndex(pc)
            (r: Row, ctx: Cep.MatchCtx[Row]) =>
              !r.isNullAt(ci) && ctx.nthBack(n).exists { prev =>
                !prev.isNullAt(pci) && (
                  if (isNum) cmpNum(r.get(ci), d.op, prev.get(pci))
                  else cmpStr(r.get(ci).toString, d.op, prev.get(pci).toString))
              }
          case (None, Some((rv, rc))) =>
            // compare against the LAST row matched to the referenced
            // variable so far (running semantics); rhsVar == this variable
            // means "previous occurrence of myself" and fails on the first
            val rvi = varIdxOf.getOrElse(rv,
              throw new IllegalArgumentException(s"DEFINE references unknown variable $rv"))
            val rci = schema.fieldIndex(rc)
            (r: Row, ctx: Cep.MatchCtx[Row]) =>
              !r.isNullAt(ci) && ctx.lastOf(rvi).exists { prev =>
                !prev.isNullAt(rci) && (
                  if (isNum) cmpNum(r.get(ci), d.op, prev.get(rci))
                  else cmpStr(r.get(ci).toString, d.op, prev.get(rci).toString))
              }
          case _ =>
            (r: Row, _: Cep.MatchCtx[Row]) =>
              !r.isNullAt(ci) && (
                if (isNum) cmpNum(r.get(ci), d.op, d.value)
                else cmpStr(r.get(ci).toString, d.op, d.value))
        }
    }
    // leaf steps carry their GLOBAL variable id (left-to-right leaf order,
    // matching flatVars); a group step wraps its members as a sub-sequence
    // (ref GroupPattern.java) quantified whole — recursively, so groups
    // nest arbitrarily
    var gi = -1
    def leafStep(v: PatVar): Cep.StepG[Row] = {
      gi += 1
      Cep.StepG[Row](predOf(v), v.min, v.max, strict = true, greedy = v.greedy, varId = gi)
    }
    def elemStep(e: PatElem): Cep.StepG[Row] = e match {
      case v: PatVar => leafStep(v)
      case g: PatGroup =>
        Cep.StepG.groupOf[Row](g.elems.toIndexedSeq.map(elemStep), g.min, g.max, g.greedy)
    }
    val steps = spec.pattern.toIndexedSeq.map(elemStep)

    def measureType(m: Measure): DataType = m.fn match {
      case "MATCH_NUMBER" => LongType
      case "CLASSIFIER" => StringType
      case _ => schema(schema.fieldIndex(m.col)).dataType
    }
    val outFields =
      keyIdx.map(schema(_)) ++
        (if (spec.allRows) Seq(schema(tsIdx)) else Nil) ++
        spec.measures.map(m => StructField(m.as, measureType(m)))
    val outSchema = StructType(outFields)
    implicit val rowEnc = org.apache.spark.sql.Encoders.row(outSchema)

    val tsMicros: Row => Long = { r =>
      r.get(tsIdx) match {
        case t: java.sql.Timestamp => t.getTime * 1000 + (t.getNanos / 1000) % 1000
        case t: java.time.Instant => t.getEpochSecond * 1000000L + t.getNano / 1000
        case l: Long => l
        case other => throw new IllegalArgumentException(s"unsupported ORDER BY type $other")
      }
    }

    val measures = spec.measures
    val skip = spec.skip
    val allRows = spec.allRows

    // secondary ORDER BY column = deterministic tiebreak for equal
    // timestamps (without one, equal-ts ordering is shuffle-dependent)
    val tieKey: Row => java.math.BigDecimal = spec.orderTiebreak match {
      case None => _ => java.math.BigDecimal.ZERO
      case Some(c) =>
        val ti = schema.fieldIndex(c)
        require(schema(ti).dataType.isInstanceOf[NumericType],
          s"ORDER BY tiebreak column $c must be numeric")
        r => if (r.isNullAt(ti)) java.math.BigDecimal.ZERO
             else new java.math.BigDecimal(r.get(ti).toString)
    }
    implicit val bdOrdering: Ordering[java.math.BigDecimal] =
      Ordering.fromLessThan(_.compareTo(_) < 0)

    df.groupByKey((r: Row) => keyIdx.map(i => String.valueOf(r.get(i))).mkString(" "))(
        org.apache.spark.sql.Encoders.STRING)
      .flatMapGroups { (_, it: Iterator[Row]) =>
        val sorted = it.toIndexedSeq.sortBy(r => (tsMicros(r), tieKey(r)))
        val out = scala.collection.mutable.ListBuffer[Row]()
        var matchNo = 0L
        var i = 0
        while (i < sorted.length) {
          Cep.findAt(sorted, i, steps, spec.withinMicros, tsMicros) match {
            case None => i += 1
            case Some(idx) => // idx: (stepIdx, evIdx) in match order
              matchNo += 1
              val keyVals = keyIdx.map(sorted(i).get)
              // FIRST/LAST with logical offset over a variable's occurrence
              // list (Flink pattern navigation `LAST(B.col, 1)`); out-of-
              // range offsets are NULL like the reference
              def navigate(m: Measure, occ: Seq[Int]): Any = {
                val pick = if (m.fn == "FIRST") occ.lift(m.offset)
                           else occ.lift(occ.length - 1 - m.offset)
                pick.map(e => sorted(e).get(schema.fieldIndex(m.col))).orNull
              }
              def finalVal(m: Measure): Any = m.fn match {
                case "MATCH_NUMBER" => matchNo
                case "CLASSIFIER" => varNames(idx.last._1) // last row's variable
                case _ => navigate(m, idx.filter(_._1 == varIdxOf(m.variable.toUpperCase)).map(_._2))
              }
              if (!allRows) {
                out += Row.fromSeq(keyVals ++ measures.map(finalVal)) // ONE ROW = all FINAL
              } else {
                // ALL ROWS PER MATCH: RUNNING measure semantics by default,
                // FINAL <nav> forces the completed-match value on every row
                var sofar = Map[Int, List[Int]]().withDefaultValue(Nil)
                idx.foreach { case (vi, ei) =>
                  sofar = sofar.updated(vi, sofar(vi) :+ ei)
                  val vals = measures.map { m =>
                    m.fn match {
                      case "MATCH_NUMBER" => matchNo
                      case "CLASSIFIER" => varNames(vi)
                      case _ if m.mode == "FINAL" => finalVal(m)
                      case _ => navigate(m, sofar(varIdxOf(m.variable.toUpperCase)))
                    }
                  }
                  out += Row.fromSeq(keyVals ++ Seq(sorted(ei).get(tsIdx)) ++ vals)
                }
              }
              val resume = skip match {
                case SkipToNextRow => i + 1
                case SkipPastLastRow => idx.last._2 + 1
                case SkipToFirst(v) =>
                  val vi = varIdxOf.getOrElse(v, throw new IllegalArgumentException(
                    s"AFTER MATCH SKIP TO FIRST references unknown variable $v"))
                  val occ = idx.filter(_._1 == vi)
                  if (occ.isEmpty) throw new IllegalStateException(
                    s"SKIP TO FIRST $v: variable matched no rows")
                  occ.head._2
                case SkipToLast(v) =>
                  val vi = varIdxOf.getOrElse(v, throw new IllegalArgumentException(
                    s"AFTER MATCH SKIP TO LAST references unknown variable $v"))
                  val occ = idx.filter(_._1 == vi)
                  if (occ.isEmpty) throw new IllegalStateException(
                    s"SKIP TO LAST $v: variable matched no rows")
                  occ.last._2
              }
              if (resume <= i) throw new IllegalStateException(
                s"AFTER MATCH SKIP strategy resumes at or before the match start (row $resume) — " +
                  "infinite loop (the reference NFA rejects this the same way)")
              i = resume
          }
        }
        out.iterator
      }
  }
}
