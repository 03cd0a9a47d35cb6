package graft

import graft.operators.Cep
import graft.operators.Cep.{Ev, MatchCtx, StepG}

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Model-based fuzz for the CEP NFA core (VERDICT r12 Next-round #4) —
  * the largest custom state machine (`operators/Cep.scala`, ref
  * flink-libraries/flink-cep/.../nfa/NFA.java:86), previously covered
  * only by crafted cases (CepSpec) while the changelog operators had
  * StatePropertySpec. Mirrors the reference's NFATest / NFAITCase corpus
  * (flink-cep/src/test/java/.../nfa/NFAITCase.java —
  * testStrictContinuity, testTimesRange, testUntilCondition,
  * testNotFollowedBy, testBranchingPattern / allowCombinations) as
  * seeded properties over random patterns × random event sequences.
  *
  * The MODEL is an independent exhaustive recursive enumerator of every
  * valid anchored assignment (direct recursion over (step, position,
  * count) with no stack machine, no greedy/reluctant ordering, no
  * commit): at ≤10 events × ≤3 steps the full choice tree is tiny. The
  * engine's two search modes are then checked against the model's SET:
  *
  *  - `findAllAt` (followedByAny / allowCombinations — NFAITCase
  *    testBranchingPattern): must return EXACTLY the model set;
  *  - `findAt` (deterministic first-candidate commit, the
  *    Flink-default continuation): every result must be a member of the
  *    model set, an empty model forces None, and for all-STRICT
  *    patterns (single scan candidate per position — the search is then
  *    complete over quantifier splits) existence must match exactly.
  */
class CepPropertySpec extends AnyFunSuite {

  private def runProp(name: String, p: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(120)
      .withInitialSeed(Seed(0xCE9FA2L))
    val res = SCTest.check(params, p)
    assert(res.passed, s"$name: ${res.status}")
  }

  /** Spec-level pattern step over the 3-letter alphabet. Negative guards
    * never sit on step 0: they describe the gap from the PREVIOUS
    * variable, which step 0 does not have (the engine encodes
    * notNext/notFollowedBy on the following step — Cep.scala StepG doc). */
  private case class PStep(letter: String, min: Int, max: Int, strict: Boolean,
                           greedy: Boolean, until: Option[String],
                           notBefore: Option[String], notNext: Option[String])

  private def toStepG(s: PStep): StepG[Ev] = StepG(
    (e: Ev, _: MatchCtx[Ev]) => e.eventType == s.letter,
    s.min, s.max, s.strict,
    s.until.map(u => (e: Ev, _: MatchCtx[Ev]) => e.eventType == u),
    s.notBefore.map(b => (e: Ev, _: MatchCtx[Ev]) => e.eventType == b),
    s.notNext.map(x => (e: Ev, _: MatchCtx[Ev]) => e.eventType == x),
    greedy = s.greedy)

  /** Exhaustive enumerator of all valid anchored matches: the semantic
    * contract of one quantifier scan, stated directly — from scan start
    * q, an occurrence may land on any pred event not beyond (a) the
    * within window, (b) the first `until` event (stop BEFORE consuming —
    * Pattern.until), (c) on first occurrence, the first non-pred event
    * matching `notFollowedBy`; a strict step's only candidate is q
    * itself; while nothing is consumed yet the first consumed event must
    * be the anchor; `notNext` on a first occurrence vetoes consumption
    * when the event immediately after the previous step matches. */
  private def model(evs: IndexedSeq[Ev], anchor: Int, steps: IndexedSeq[PStep],
                    within: Long): Set[List[(Int, Int)]] = {
    val n = evs.length
    def inWin(p: Int) = evs(p).tsMicros - evs(anchor).tsMicros < within
    def candidates(st: PStep, q: Int, first: Boolean, anchored: Boolean): List[Int] = {
      val out = scala.collection.mutable.ListBuffer[Int]()
      var p = q
      var stop = false
      while (!stop && p < n && inWin(p) && !(anchored && p > anchor)) {
        if (st.until.contains(evs(p).eventType)) stop = true
        else if (evs(p).eventType == st.letter) { out += p; if (st.strict) stop = true else p += 1 }
        else if (first && st.notBefore.contains(evs(p).eventType)) stop = true
        else if (st.strict) stop = true
        else p += 1
      }
      out.toList
    }
    def go(si: Int, pos: Int, cnt: Int, acc: List[(Int, Int)]): Set[List[(Int, Int)]] = {
      if (si == steps.length) Set(acc.reverse)
      else {
        val st = steps(si)
        val viaAdvance = if (cnt >= st.min) go(si + 1, pos, 0, acc) else Set.empty[List[(Int, Int)]]
        val vetoed = cnt == 0 && st.notNext.exists(x =>
          pos < n && inWin(pos) && evs(pos).eventType == x)
        val viaConsume =
          if (cnt < st.max && !vetoed)
            candidates(st, pos, first = cnt == 0, anchored = acc.isEmpty)
              .flatMap(c => go(si, c + 1, cnt + 1, (si, c) :: acc)).toSet
          else Set.empty[List[(Int, Int)]]
        viaAdvance ++ viaConsume
      }
    }
    go(0, anchor, 0, Nil).filter(_.headOption.exists(_._2 == anchor))
  }

  // ---------------------------------------------------------- generators

  private val letters = Seq("a", "b", "c")

  private val genEvents: Gen[IndexedSeq[Ev]] = for {
    n <- Gen.choose(0, 10)
    ls <- Gen.listOfN(n, Gen.oneOf(letters))
    gaps <- Gen.listOfN(n, Gen.choose(0L, 3L))
  } yield {
    var ts = 1000000L
    ls.zip(gaps).zipWithIndex.map { case ((l, g), i) =>
      ts += g
      Ev(1L, i.toLong, l, ts, 0L)
    }.toIndexedSeq
  }

  private def genStep(isHead: Boolean): Gen[PStep] = for {
    letter <- Gen.oneOf(letters)
    mm <- Gen.oneOf((1, 1), (0, 1), (1, 2), (0, 2), (2, 3), (1, 3))
    strict <- Gen.oneOf(true, false)
    greedy <- Gen.oneOf(true, false)
    until <- Gen.frequency(4 -> Gen.const(None), 1 -> Gen.oneOf(letters).map(Some(_)))
    nb <- if (isHead) Gen.const(None)
          else Gen.frequency(4 -> Gen.const(None), 1 -> Gen.oneOf(letters).map(Some(_)))
    nn <- if (isHead) Gen.const(None)
          else Gen.frequency(4 -> Gen.const(None), 1 -> Gen.oneOf(letters).map(Some(_)))
  } yield PStep(letter, mm._1, mm._2, strict, greedy, until, nb, nn)

  private val genPattern: Gen[IndexedSeq[PStep]] = for {
    k <- Gen.choose(1, 3)
    head <- genStep(isHead = true)
    rest <- Gen.listOfN(k - 1, genStep(isHead = false))
  } yield (head :: rest).toIndexedSeq

  private val genWithin: Gen[Long] = Gen.oneOf(2L, 4L, Long.MaxValue)

  private val genCase: Gen[(IndexedSeq[Ev], IndexedSeq[PStep], Long)] = for {
    evs <- genEvents; ps <- genPattern; w <- genWithin
  } yield (evs, ps, w)

  // ---------------------------------------------------------- properties

  test("findAllAt equals the exhaustive model at every anchor " +
       "(NFAITCase testBranchingPattern / allowCombinations mirror, 120 seeded cases)") {
    runProp("findAllAt-vs-model", Prop.forAll(genCase) { case (evs, ps, w) =>
      val steps = ps.map(toStepG)
      evs.indices.forall { i =>
        val got = Cep.findAllAt(evs, i, steps, w, (e: Ev) => e.tsMicros).toSet
        val want = model(evs, i, ps, w)
        if (got != want) {
          println(s"MISMATCH anchor=$i evs=${evs.map(_.eventType).mkString} " +
            s"pattern=$ps within=$w\n  engine=$got\n  model =$want")
          false
        } else true
      }
    })
  }

  test("findAt: member-of-model, None iff model empty (exact for all-strict patterns) " +
       "(NFAITCase testStrictContinuity/testTimesRange/testUntilCondition/testNotFollowedBy mirror)") {
    runProp("findAt-vs-model", Prop.forAll(genCase) { case (evs, ps, w) =>
      val steps = ps.map(toStepG)
      val allStrict = ps.forall(_.strict)
      evs.indices.forall { i =>
        val got = Cep.findAt(evs, i, steps, w, (e: Ev) => e.tsMicros)
        val want = model(evs, i, ps, w)
        val ok = got match {
          case None => want.isEmpty || !allStrict
          case Some(m) => want.contains(m)
        }
        if (!ok) {
          println(s"MISMATCH anchor=$i evs=${evs.map(_.eventType).mkString} " +
            s"pattern=$ps within=$w\n  engine=$got\n  model(${want.size})=${want.take(3)}")
        }
        ok
      }
    })
  }
}
