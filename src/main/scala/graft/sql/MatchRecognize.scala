package graft.sql

import graft.operators.Cep
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** SQL MATCH_RECOGNIZE front-end (scoped subset) over the [[Cep]] NFA.
  *
  * Reference: SQL planned by flink-table-planner-blink physical/stream/
  * StreamExecMatch.scala:68 + MatchCodeGenerator.scala, executed on the CEP
  * NFA (NFA.java:86). Supported subset (the MatchRecognizeITCase core
  * shapes):
  *
  * {{{
  * SELECT * FROM <table> MATCH_RECOGNIZE (
  *   PARTITION BY <col>
  *   ORDER BY <tsCol>
  *   MEASURES A.col AS name [, FIRST(B.col) AS n2, LAST(B.col) AS n3, ...]
  *   PATTERN (A B+ C {m,n}-quantified...)
  *   [WITHIN INTERVAL 'n' UNIT]
  *   DEFINE A AS A.col = 'lit' [, B AS B.col <> 'lit', C AS C.col > 5 ...]
  * )
  * }}}
  *
  * Pattern variables are strictly contiguous (the MATCH_RECOGNIZE default),
  * AFTER MATCH SKIP TO NEXT ROW, greedy quantifiers. Execution: one
  * hash-shuffle on the partition key, per-key time sort, linear NFA scan —
  * identical layout to [[Cep.detect]].
  */
object MatchRecognize {

  case class Measure(fn: String, variable: String, col: String, as: String) // fn: "", FIRST, LAST
  case class PatVar(name: String, min: Int, max: Int)
  case class Define(variable: String, col: String, op: String, value: String,
                    rhsVar: Option[(String, String)] = None) // (variable, col) for cross-var predicates
  case class Spec(table: String, partitionBy: String, orderBy: String,
                  measures: Seq[Measure], pattern: Seq[PatVar],
                  withinMicros: Long, defines: Map[String, Define],
                  skipPastLastRow: Boolean)

  private val outerRe =
    """(?is)\s*SELECT\s+\*\s+FROM\s+(\w+)\s+MATCH_RECOGNIZE\s*\((.*)\)\s*""".r
  private val partRe = """(?is)PARTITION\s+BY\s+(\w+)""".r
  private val orderRe = """(?is)ORDER\s+BY\s+(\w+)""".r
  private val measuresRe = """(?is)MEASURES\s+(.*?)\s+PATTERN""".r
  private val measureRe = """(?i)\s*(?:(FIRST|LAST)\s*\(\s*)?(\w+)\.(\w+)\s*\)?\s+AS\s+(\w+)\s*""".r
  private val patternRe = """(?is)PATTERN\s*\(\s*([^)]*?)\s*\)""".r
  private val patVarRe = """(\w+)(\+|\*|\{(\d+),(\d+)\})?""".r
  private val withinRe = """(?is)WITHIN\s+INTERVAL\s+'(\d+)'\s+(\w+)""".r
  private val defineRe = """(?is)DEFINE\s+(.*)$""".r
  private val skipRe = """(?is)AFTER\s+MATCH\s+SKIP\s+(PAST\s+LAST\s+ROW|TO\s+NEXT\s+ROW)""".r
  private val defRe = """(?i)\s*(\w+)\s+AS\s+(\w+)\.(\w+)\s*(=|<>|>=|<=|>|<)\s*(?:'([^']*)'|([-\d.]+))\s*""".r
  // cross-variable predicate: B AS B.price > A.price (Flink IterativeCondition)
  private val defXRe = """(?i)\s*(\w+)\s+AS\s+(\w+)\.(\w+)\s*(=|<>|>=|<=|>|<)\s*(\w+)\.(\w+)\s*""".r

  def isMatchRecognize(sql: String): Boolean = outerRe.matches(sql)

  def parse(sql: String): Spec = {
    val outerRe(table, body) = sql: @unchecked
    val part = partRe.findFirstMatchIn(body).map(_.group(1))
      .getOrElse(throw new IllegalArgumentException("PARTITION BY required"))
    val order = orderRe.findFirstMatchIn(body).map(_.group(1))
      .getOrElse(throw new IllegalArgumentException("ORDER BY required"))
    val measures = measuresRe.findFirstMatchIn(body).map(_.group(1)).toSeq
      .flatMap(_.split(",")).map {
        case measureRe(fn, v, c, as) => Measure(Option(fn).getOrElse("").toUpperCase, v, c, as)
        case other => throw new IllegalArgumentException(s"unsupported measure '$other'")
      }
    val pattern = patternRe.findFirstMatchIn(body).map(_.group(1)).getOrElse("")
      .split("\\s+").filter(_.nonEmpty).toSeq.map {
        case patVarRe(name, null, _, _) => PatVar(name, 1, 1)
        case patVarRe(name, "+", _, _) => PatVar(name, 1, Int.MaxValue)
        case patVarRe(name, "*", _, _) => PatVar(name, 0, Int.MaxValue)
        case patVarRe(name, _, mn, mx) => PatVar(name, mn.toInt, mx.toInt)
        case other => throw new IllegalArgumentException(s"unsupported pattern token '$other'")
      }
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
    val defines = defineRe.findFirstMatchIn(body).map(_.group(1)).toSeq
      .flatMap(_.split(",")).map {
        case defRe(v, _, c, op, slit, nlit) =>
          v.toUpperCase -> Define(v.toUpperCase, c, op, if (slit != null) slit else nlit)
        case defXRe(v, _, c, op, rv, rc) =>
          v.toUpperCase -> Define(v.toUpperCase, c, op, "", rhsVar = Some((rv.toUpperCase, rc)))
        case other => throw new IllegalArgumentException(s"unsupported define '$other'")
      }.toMap
    val skipPast = skipRe.findFirstMatchIn(body)
      .exists(_.group(1).toUpperCase.startsWith("PAST"))
    Spec(table, part, order, measures, pattern, within, defines, skipPast)
  }

  def run(spark: SparkSession, sql: String): DataFrame = {
    val spec = parse(sql)
    val df = spark.table(spec.table)
    val schema = df.schema
    val keyIdx = schema.fieldIndex(spec.partitionBy)
    val tsIdx = schema.fieldIndex(spec.orderBy)

    val varIdxOf = spec.pattern.map(_.name.toUpperCase).zipWithIndex.toMap
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
      case Some(d) =>
        val ci = schema.fieldIndex(d.col)
        val isNum = schema(ci).dataType.isInstanceOf[NumericType]
        d.rhsVar match {
          case Some((rv, rc)) =>
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
          case None =>
            (r: Row, _: Cep.MatchCtx[Row]) =>
              !r.isNullAt(ci) && (
                if (isNum) cmpNum(r.get(ci), d.op, d.value)
                else cmpStr(r.get(ci).toString, d.op, d.value))
        }
    }
    val steps = spec.pattern.toIndexedSeq.map(v => Cep.StepG[Row](predOf(v), v.min, v.max, strict = true))
    val measureIdx = spec.measures.map(m =>
      (varIdxOf(m.variable.toUpperCase), schema.fieldIndex(m.col), m.fn))

    val outSchema = StructType(
      schema(keyIdx) +: spec.measures.map(m => StructField(m.as, schema(schema.fieldIndex(m.col)).dataType)))
    implicit val rowEnc = org.apache.spark.sql.Encoders.row(outSchema)

    val tsMicros: Row => Long = { r =>
      r.get(tsIdx) match {
        case t: java.sql.Timestamp => t.getTime * 1000 + (t.getNanos / 1000) % 1000
        case t: java.time.Instant => t.getEpochSecond * 1000000L + t.getNano / 1000
        case l: Long => l
        case other => throw new IllegalArgumentException(s"unsupported ORDER BY type $other")
      }
    }

    df.groupByKey((r: Row) => String.valueOf(r.get(keyIdx)))(org.apache.spark.sql.Encoders.STRING)
      .flatMapGroups { (_, it: Iterator[Row]) =>
        val sorted = it.toIndexedSeq.sortBy(tsMicros)
        var resumeAt = 0
        (0 until sorted.length).iterator.flatMap { i =>
          if (spec.skipPastLastRow && i < resumeAt) None
          else Cep.findAt(sorted, i, steps, spec.withinMicros, tsMicros).map { idx =>
            if (spec.skipPastLastRow) resumeAt = idx.last._2 + 1
            val key = sorted(i).get(keyIdx)
            val vals = measureIdx.map { case (vi, ci, fn) =>
              val ofVar = idx.filter(_._1 == vi)
              val pick = if (fn == "FIRST") ofVar.head else ofVar.last // "" == LAST (SQL default: last row of var)
              sorted(pick._2).get(ci)
            }
            Row.fromSeq(key +: vals)
          }
        }
      }
  }
}
