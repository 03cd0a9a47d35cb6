package graft

import graft.sql.MatchRecognize

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

/** Differential fuzz for the SQL MATCH_RECOGNIZE surface (sql/
  * MatchRecognize.scala) — the layer ABOVE the NFA that CepPropertySpec
  * fuzzes: text parsing, pattern compilation, the groupByKey+sort runtime,
  * AFTER MATCH SKIP iteration, and the measure evaluator (FIRST/LAST with
  * logical offsets, CLASSIFIER, MATCH_NUMBER, RUNNING vs FINAL under ALL
  * ROWS PER MATCH). Mirrors the reference's MatchRecognizeITCase corpus
  * (flink-table/flink-table-planner-blink/src/test/scala/.../stream/sql/
  * MatchRecognizeITCase.scala) as seeded properties over random queries.
  *
  * The ORACLE is `java.util.regex`: MATCH_RECOGNIZE pattern variables are
  * strictly contiguous, so a generated pattern over a single-letter symbol
  * column IS an anchored regex over the partition's letter string — each
  * variable rendered as a named group with the quantifier INSIDE the group
  * (`(?<gB>(?:b){1,2}?)`), so the group's span is the variable's full
  * occurrence run. Java's backtracking preference (greedy = longest first,
  * reluctant = shortest first, leftmost variable outermost) is the SQL
  * standard's quantifier preference — this pins the engine's CHOICE of
  * match, not just membership. WITHIN is `Matcher.region` bounded to the
  * window; the skip strategies replay on the model's own extents.
  *
  * Scope guard: generated patterns always have Σmin ≥ 1 (the all-optional
  * empty-match corner is CepPropertySpec's anchored-search territory), and
  * SKIP TO FIRST/LAST targets only follow a mandatory prefix so the
  * resume-at-start rejection (tested in MatchRecognizeSpec) never fires.
  */
class MatchRecognizePropertySpec extends SparkTestBase {

  // ---------------------------------------------------------------- model

  private case class MVar(name: String, letter: Option[String], min: Int,
                          max: Int, greedy: Boolean)
  private case class MMeasure(fn: String, v: String, off: Int, mode: String, as: String)
  private case class Case(vars: Seq[MVar], measures: Seq[MMeasure],
                          allRows: Boolean, skip: String, skipVar: String,
                          withinSec: Option[Int],
                          parts: Seq[IndexedSeq[(String, Long)]]) // (sym, tsSec) per partition

  private def quantSql(v: MVar): String = {
    val base = (v.min, v.max) match {
      case (1, 1) => ""
      case (0, 1) => "?"
      case (1, Int.MaxValue) => "+"
      case (0, Int.MaxValue) => "*"
      case (lo, hi) => s"{$lo,$hi}"
    }
    if (base.isEmpty) "" else if (v.greedy) base else base + "?"
  }

  private def regexOf(vars: Seq[MVar]): java.util.regex.Pattern = {
    val body = vars.map { v =>
      val atom = v.letter.map(l => s"(?:$l)").getOrElse("[abc]")
      val q = (v.min, v.max) match {
        case (1, 1) => ""
        case (lo, hi) if hi == Int.MaxValue => s"{$lo,}"
        case (lo, hi) => s"{$lo,$hi}"
      }
      val lzy = if (v.greedy || q.isEmpty) "" else "?"
      s"(?<g${v.name}>$atom$q$lzy)"
    }.mkString
    java.util.regex.Pattern.compile(body)
  }

  /** Model rows for one partition: the engine's output tuples as strings.
    * evs: (sym, tsSec); ids are positional (pBase + index). */
  private def modelPartition(c: Case, p: Int, evs: IndexedSeq[(String, Long)]): Seq[Seq[String]] = {
    val n = evs.length
    val s = evs.map(_._1).mkString
    val rx = regexOf(c.vars)
    val out = scala.collection.mutable.ListBuffer[Seq[String]]()
    def id(e: Int): Long = p.toLong * 1000 + e
    var matchNo = 0L
    var i = 0
    while (i < n) {
      val bound = c.withinSec match {
        case None => n
        case Some(w) =>
          val b = (i until n).indexWhere(j => evs(j)._2 - evs(i)._2 >= w)
          if (b < 0) n else i + b
      }
      val m = rx.matcher(s)
      m.region(i, bound)
      // contiguity + Σmin ≥ 1 ⇒ an anchored nonempty match or nothing
      if (m.lookingAt() && m.end() > m.start()) {
        matchNo += 1
        val span = c.vars.map(v => (m.start(s"g${v.name}"), m.end(s"g${v.name}"))).toIndexedSeq
        def occFull(v: String): Seq[Int] = {
          val k = c.vars.indexWhere(_.name == v)
          (span(k)._1 until span(k)._2)
        }
        def navigate(mm: MMeasure, occ: Seq[Int]): String = {
          val pick = if (mm.fn == "FIRST") occ.lift(mm.off)
                     else occ.lift(occ.length - 1 - mm.off)
          pick.map(e => id(e).toString).getOrElse("null")
        }
        def classifierOf(e: Int): String =
          c.vars(c.vars.indices.reverse.find(k => span(k)._1 <= e && e < span(k)._2).get).name
        if (!c.allRows) {
          val vals = c.measures.map {
            case MMeasure("MN", _, _, _, _) => matchNo.toString
            case MMeasure("CLS", _, _, _, _) => classifierOf(m.end() - 1)
            case mm => navigate(mm, occFull(mm.v))
          }
          out += (p.toString +: vals)
        } else {
          (m.start() until m.end()).foreach { e =>
            val vals = c.measures.map {
              case MMeasure("MN", _, _, _, _) => matchNo.toString
              case MMeasure("CLS", _, _, _, _) => classifierOf(e)
              case mm if mm.mode == "FINAL" => navigate(mm, occFull(mm.v))
              case mm => navigate(mm, occFull(mm.v).filter(_ <= e)) // RUNNING
            }
            out += (Seq(p.toString, evs(e)._2.toString) ++ vals)
          }
        }
        i = c.skip match {
          case "NEXT" => i + 1
          case "PAST" => m.end()
          case "TOFIRST" => occFull(c.skipVar).head
          case "TOLAST" => occFull(c.skipVar).last
        }
      } else i += 1
    }
    out.toSeq
  }

  // ------------------------------------------------------------------ sql

  private def sqlOf(c: Case): String = {
    val measures = c.measures.map {
      case MMeasure("MN", _, _, _, as) => s"MATCH_NUMBER() AS $as"
      case MMeasure("CLS", _, _, _, as) => s"CLASSIFIER() AS $as"
      case MMeasure(fn, v, off, mode, as) =>
        val prefix = if (mode.isEmpty) "" else mode + " "
        val offTxt = if (off == 0) "" else s", $off"
        s"$prefix$fn($v.id$offTxt) AS $as"
    }.mkString(",\n    ")
    val pattern = c.vars.map(v => v.name + quantSql(v)).mkString(" ")
    val defines = c.vars.flatMap(v => v.letter.map(l => s"${v.name} AS ${v.name}.sym = '$l'"))
    val defineClause = if (defines.isEmpty) "" else "\n  DEFINE " + defines.mkString(", ")
    val withinClause = c.withinSec.map(w => s"\n  WITHIN INTERVAL '$w' SECOND").getOrElse("")
    val skipClause = c.skip match {
      case "NEXT" => "AFTER MATCH SKIP TO NEXT ROW"
      case "PAST" => "AFTER MATCH SKIP PAST LAST ROW"
      case "TOFIRST" => s"AFTER MATCH SKIP TO FIRST ${c.skipVar}"
      case "TOLAST" => s"AFTER MATCH SKIP TO LAST ${c.skipVar}"
    }
    s"""SELECT * FROM mr_fuzz MATCH_RECOGNIZE (
       |  PARTITION BY p
       |  ORDER BY ts
       |  MEASURES $measures
       |  ${if (c.allRows) "ALL ROWS" else "ONE ROW"} PER MATCH
       |  $skipClause
       |  PATTERN ($pattern)$withinClause$defineClause
       |)""".stripMargin
  }

  // ----------------------------------------------------------- generators

  private val genVar: Gen[MVar] = for {
    letter <- Gen.frequency(5 -> Gen.oneOf("a", "b", "c").map(Some(_)), 1 -> Gen.const(None))
    mm <- Gen.oneOf((1, 1), (0, 1), (1, Int.MaxValue), (0, Int.MaxValue), (1, 2), (2, 2), (1, 3))
    greedy <- Gen.oneOf(true, false)
    // a bare variable carries no quantifier text, so greediness is
    // unexpressed (and semantically void) for {1,1}
  } yield MVar("X", letter, mm._1, mm._2, greedy || mm == ((1, 1)))

  private val genVars: Gen[Seq[MVar]] = (for {
    k <- Gen.choose(1, 3)
    vs <- Gen.listOfN(k, genVar)
  } yield vs.zip(Seq("A", "B", "C")).map { case (v, nm) => v.copy(name = nm) })
    .retryUntil(vs => vs.map(_.min).sum >= 1) // empty-match corner is out of scope

  private def genMeasures(vars: Seq[MVar], allRows: Boolean): Gen[Seq[MMeasure]] = {
    val navs = for {
      v <- Gen.oneOf(vars.map(_.name))
      fn <- Gen.oneOf("FIRST", "LAST")
      off <- Gen.frequency(3 -> Gen.const(0), 1 -> Gen.const(1))
      mode <- if (allRows) Gen.frequency(3 -> Gen.const(""), 1 -> Gen.const("FINAL"),
                                         1 -> Gen.const("RUNNING"))
              else Gen.const("")
    } yield MMeasure(fn, v, off, mode, "m")
    for {
      k <- Gen.choose(1, 3)
      ms <- Gen.listOfN(k, navs)
    } yield (MMeasure("MN", "", 0, "", "mn") +: MMeasure("CLS", "", 0, "", "cls") +: ms)
      .zipWithIndex.map { case (mm, ix) => mm.copy(as = s"m$ix") }
  }

  private def genSkip(vars: Seq[MVar]): Gen[(String, String)] = {
    // TO FIRST/LAST V only where a mandatory prefix precedes V, so the
    // resume point is provably after the match start
    val eligible = vars.indices.drop(1)
      .filter(k => vars.take(k).forall(_.min >= 1) && vars(k).min >= 1)
      .map(k => vars(k).name)
    val base = Gen.oneOf("NEXT", "PAST").map(s => (s, ""))
    if (eligible.isEmpty) base
    else Gen.frequency(
      2 -> base,
      1 -> (for { v <- Gen.oneOf(eligible); d <- Gen.oneOf("TOFIRST", "TOLAST") } yield (d, v)))
  }

  private val genPartition: Gen[IndexedSeq[(String, Long)]] = for {
    n <- Gen.choose(0, 12)
    ls <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
    gaps <- Gen.listOfN(n, Gen.choose(1L, 2L))
  } yield {
    var ts = 0L
    ls.zip(gaps).map { case (l, g) => ts += g; (l, ts) }.toIndexedSeq
  }

  private val genCase: Gen[Case] = for {
    vars <- genVars
    allRows <- Gen.oneOf(true, false)
    measures <- genMeasures(vars, allRows)
    (skip, skipVar) <- genSkip(vars)
    within <- Gen.frequency(2 -> Gen.const(None), 1 -> Gen.oneOf(3, 6).map(Some(_)))
    parts <- Gen.listOfN(2, genPartition)
  } yield Case(vars, measures, allRows, skip, skipVar, within, parts)

  // ------------------------------------------------------------ execution

  private val tableSchema = StructType(Seq(
    StructField("p", IntegerType), StructField("id", LongType),
    StructField("ts", TimestampType), StructField("sym", StringType)))

  private def registerTable(c: Case): Unit = {
    val rows = c.parts.zipWithIndex.flatMap { case (evs, p) =>
      evs.zipWithIndex.map { case ((sym, tsSec), i) =>
        Row(p, p.toLong * 1000 + i, java.sql.Timestamp.from(
          java.time.Instant.ofEpochSecond(tsSec)), sym)
      }
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      tableSchema).createOrReplaceTempView("mr_fuzz")
  }

  /** Engine row → comparable strings, ts rendered back to epoch seconds. */
  private def render(r: Row, allRows: Boolean): Seq[String] =
    r.toSeq.zipWithIndex.map {
      case (null, _) => "null"
      case (t: java.sql.Timestamp, 1) if allRows => (t.getTime / 1000).toString
      case (v, _) => v.toString
    }

  private def runProp(name: String, cases: Int, p: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(cases)
      .withInitialSeed(Seed(0x3A7C4EL))
    val res = SCTest.check(params, p)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("MATCH_RECOGNIZE SQL equals the regex model: extents, skip replay, " +
       "measures, RUNNING/FINAL, 2 partitions (MatchRecognizeITCase mirror, 60 seeded cases)") {
    runProp("mr-vs-regex", 60, Prop.forAll(genCase) { c =>
      registerTable(c)
      val sql = sqlOf(c)
      val got = MatchRecognize.run(spark, sql).collect().toSeq
        .map(render(_, c.allRows)).sortBy(_.mkString("|"))
      val want = c.parts.zipWithIndex
        .flatMap { case (evs, p) => modelPartition(c, p, evs) }
        .sortBy(_.mkString("|"))
      if (got != want) {
        println(s"MISMATCH\n$sql\nparts=${c.parts.map(_.map(_._1).mkString)}" +
          s"\n  engine(${got.size})=${got.take(8)}\n  model (${want.size})=${want.take(8)}")
        false
      } else true
    })
  }

  test("parser: rendered SQL round-trips to the intended Spec (pure, 200 seeded cases)") {
    runProp("mr-parse", 200, Prop.forAll(genCase) { c =>
      val spec = MatchRecognize.parse(sqlOf(c))
      val varsOk = spec.flatVars == c.vars.map(v =>
        MatchRecognize.PatVar(v.name, v.min, v.max, v.greedy))
      val definesOk = c.vars.forall(v => v.letter match {
        case Some(l) => spec.defines.get(v.name)
          .exists(ds => ds == Seq(MatchRecognize.Define(v.name, "sym", "=", l)))
        case None => !spec.defines.contains(v.name)
      })
      val skipOk = (c.skip, spec.skip) match {
        case ("NEXT", MatchRecognize.SkipToNextRow) => true
        case ("PAST", MatchRecognize.SkipPastLastRow) => true
        case ("TOFIRST", MatchRecognize.SkipToFirst(v)) => v == c.skipVar
        case ("TOLAST", MatchRecognize.SkipToLast(v)) => v == c.skipVar
        case _ => false
      }
      val measuresOk = spec.measures.size == c.measures.size &&
        spec.measures.zip(c.measures).forall {
          case (got, MMeasure("MN", _, _, _, as)) => got.fn == "MATCH_NUMBER" && got.as == as
          case (got, MMeasure("CLS", _, _, _, as)) => got.fn == "CLASSIFIER" && got.as == as
          case (got, mm) => got.fn == mm.fn && got.variable == mm.v &&
            got.col == "id" && got.offset == mm.off && got.mode == mm.mode && got.as == mm.as
        }
      val rest = spec.allRows == c.allRows && spec.partitionBy == Seq("p") &&
        spec.orderBy == "ts" &&
        spec.withinMicros == c.withinSec.map(_ * 1000000L).getOrElse(Long.MaxValue)
      if (!(varsOk && definesOk && skipOk && measuresOk && rest))
        println(s"PARSE MISMATCH\n${sqlOf(c)}\n  got=$spec")
      varsOk && definesOk && skipOk && measuresOk && rest
    })
  }
}
