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
    * notNext/notFollowedBy on the following step — Cep.scala StepG doc).
    * `group` makes this a GroupPattern step (sub-sequence quantified as a
    * unit; letter/until/negatives unused); sub-steps carry explicit
    * global varIds, the engine contract. */
  private case class PStep(letter: String, min: Int, max: Int, strict: Boolean,
                           greedy: Boolean, until: Option[String],
                           notBefore: Option[String], notNext: Option[String],
                           varId: Int = -1,
                           group: Option[IndexedSeq[PStep]] = None)

  private def toStepG(s: PStep): StepG[Ev] = StepG(
    (e: Ev, _: MatchCtx[Ev]) => s.group.isDefined || e.eventType == s.letter,
    s.min, s.max, s.strict,
    s.until.map(u => (e: Ev, _: MatchCtx[Ev]) => e.eventType == u),
    s.notBefore.map(b => (e: Ev, _: MatchCtx[Ev]) => e.eventType == b),
    s.notNext.map(x => (e: Ev, _: MatchCtx[Ev]) => e.eventType == x),
    greedy = s.greedy, varId = s.varId,
    group = s.group.map(_.map(toStepG)))

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
    // `complete`: full assignments (REVERSED acc lists, outer prefix
    // included) of `ss` starting at pos — recursing into group sub-
    // sequences; the anchor constraint follows the GLOBAL acc.
    def go(ss: IndexedSeq[PStep], si: Int, pos: Int, cnt: Int,
           acc: List[(Int, Int)]): Set[List[(Int, Int)]] = {
      if (si == ss.length) Set(acc)
      else {
        val st = ss(si)
        val viaAdvance = if (cnt >= st.min) go(ss, si + 1, pos, 0, acc)
                         else Set.empty[List[(Int, Int)]]
        val vetoed = cnt == 0 && st.notNext.exists(x =>
          pos < n && inWin(pos) && evs(pos).eventType == x)
        val viaConsume =
          if (cnt < st.max && !vetoed) st.group match {
            case Some(sub) =>
              // one more group occurrence = any full NONEMPTY sub
              // assignment from pos; continue after its last event
              go(sub, 0, pos, 0, acc).filter(_.lengthCompare(acc.length) > 0)
                .flatMap(a => go(ss, si, a.head._2 + 1, cnt + 1, a))
            case None =>
              val vid = if (st.varId >= 0) st.varId else si
              candidates(st, pos, first = cnt == 0, anchored = acc.isEmpty)
                .flatMap(c => go(ss, si, c + 1, cnt + 1, (vid, c) :: acc)).toSet
          }
          else Set.empty[List[(Int, Int)]]
        viaAdvance ++ viaConsume
      }
    }
    go(steps, 0, anchor, 0, Nil).map(_.reverse)
      .filter(_.headOption.exists(_._2 == anchor))
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

  /** Group-pattern generator (GroupPattern.java shapes): G, aG, Ga, aGa
    * with a 1-2 leaf sub-sequence; explicit GLOBAL varIds everywhere
    * (the engine contract for group sub-steps). Sub/flank leaves stay
    * modifier-free — the modifier interactions are the leaf tests'
    * job; this one targets the group recursion itself. */
  private val genLeafPlain: Gen[PStep] = for {
    letter <- Gen.oneOf(letters)
    mm <- Gen.oneOf((1, 1), (0, 1), (1, 2))
    strict <- Gen.oneOf(true, false)
    greedy <- Gen.oneOf(true, false)
  } yield PStep(letter, mm._1, mm._2, strict, greedy, None, None, None)

  private val genGroupPattern: Gen[IndexedSeq[PStep]] = for {
    nsub <- Gen.choose(1, 2)
    sub <- Gen.listOfN(nsub, genLeafPlain)
    gmm <- Gen.oneOf((0, 1), (1, 1), (1, 2), (0, 2))
    ggreedy <- Gen.oneOf(true, false)
    shape <- Gen.oneOf("G", "aG", "Ga", "aGa")
    flanks <- Gen.listOfN(2, genLeafPlain)
  } yield {
    val group = PStep("_", gmm._1, gmm._2, strict = true, ggreedy, None, None, None,
      group = Some(sub.toIndexedSeq))
    val shaped: List[PStep] = shape match {
      case "G" => List(group)
      case "aG" => List(flanks.head, group)
      case "Ga" => List(group, flanks(1))
      case _ => List(flanks.head, group, flanks(1))
    }
    // assign explicit global varIds over the flattened leaf order
    var next = -1
    def num(p: PStep): PStep = p.group match {
      case Some(s) => p.copy(group = Some(s.map(num)))
      case None => next += 1; p.copy(varId = next)
    }
    shaped.map(num).toIndexedSeq
  }

  private val genGroupCase: Gen[(IndexedSeq[Ev], IndexedSeq[PStep], Long)] = for {
    evs <- genEvents; ps <- genGroupPattern; w <- genWithin
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

  test("findAt on GROUP patterns: member-of-model, model-empty forces None " +
       "(GroupITCase / NFAITCase group-pattern mirror, 120 seeded cases)") {
    // groups are committed-choice at the occurrence level (the sub-search
    // returns its first assignment), so existence is one-way: the engine
    // may miss a model match behind a committed dead-end, but must never
    // fabricate one (membership) nor match where the model has none.
    runProp("findAt-groups-vs-model", Prop.forAll(genGroupCase) { case (evs, ps, w) =>
      val steps = ps.map(toStepG)
      evs.indices.forall { i =>
        val got = Cep.findAt(evs, i, steps, w, (e: Ev) => e.tsMicros)
        val want = model(evs, i, ps, w)
        val ok = got match {
          case None => true
          case Some(m) => want.contains(m)
        }
        val okEmpty = want.nonEmpty || got.isEmpty
        if (!(ok && okEmpty)) {
          println(s"MISMATCH anchor=$i evs=${evs.map(_.eventType).mkString} " +
            s"pattern=$ps within=$w\n  engine=$got\n  model(${want.size})=${want.take(3)}")
        }
        ok && okEmpty
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
