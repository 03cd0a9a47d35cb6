package graft

import graft.operators.Cep
import graft.operators.Cep.{Ev, Match, Pattern, Step}

/** NFA unit tests driven directly (the analog of the reference's operator
  * harness tests, SURVEY §5): quantifiers, within-timeout, strict vs
  * relaxed contiguity, skip-to-next-row overlap. */
class CepSpec extends SparkTestBase {

  private def ev(id: Long, tpe: String, tsSec: Long) = Ev(1L, id, tpe, tsSec * 1000000L, 0L)

  private def run(evs: Seq[Ev], p: Pattern): List[Match] = Cep.matches(evs.toIndexedSeq, p).toList

  private val click = Step((e: Ev) => e.eventType == "click")
  private val purchase = Step((e: Ev) => e.eventType == "purchase")

  test("strict adjacency matches only consecutive pairs") {
    val evs = Seq(ev(1, "click", 0), ev(2, "purchase", 10), ev(3, "click", 20), ev(4, "view", 30), ev(5, "purchase", 40))
    val ms = run(evs, Pattern(IndexedSeq(click, purchase)))
    assert(ms.map(m => (m.startId, m.endId)) == List((1L, 2L)))
  }

  test("within timeout excludes late completions (strict boundary, NFA.java:301)") {
    val evs = Seq(ev(1, "click", 0), ev(2, "purchase", 100))
    assert(run(evs, Pattern(IndexedSeq(click, purchase), withinMicros = 50L * 1000000)).isEmpty)
    // a match spanning EXACTLY the within interval is timed out (>= windowTime)
    assert(run(evs, Pattern(IndexedSeq(click, purchase), withinMicros = 100L * 1000000)).isEmpty)
    assert(run(evs, Pattern(IndexedSeq(click, purchase), withinMicros = 100L * 1000000 + 1)).size == 1)
  }

  test("relaxed contiguity skips unrelated events") {
    val evs = Seq(ev(1, "click", 0), ev(2, "error", 1), ev(3, "view", 2), ev(4, "purchase", 3))
    val p = Pattern(IndexedSeq(click, Step((e: Ev) => e.eventType == "purchase", strict = false)))
    assert(run(evs, p).map(m => (m.startId, m.endId)) == List((1L, 4L)))
  }

  test("oneOrMore quantifier is greedy and bounded") {
    val evs = Seq(ev(1, "click", 0), ev(2, "view", 1), ev(3, "view", 2), ev(4, "view", 3), ev(5, "purchase", 4))
    val p = Pattern(IndexedSeq(
      click,
      Step((e: Ev) => e.eventType == "view", minTimes = 1, maxTimes = 5, strict = false),
      Step((e: Ev) => e.eventType == "purchase", strict = false)))
    val ms = run(evs, p)
    assert(ms.head.nEvents == 5) // click + 3 views + purchase
    assert(ms.head.startId == 1L && ms.head.endId == 5L)
  }

  test("minTimes not met blocks the match") {
    val evs = Seq(ev(1, "click", 0), ev(2, "purchase", 1))
    val p = Pattern(IndexedSeq(
      click,
      Step((e: Ev) => e.eventType == "view", minTimes = 2, maxTimes = 5, strict = false),
      Step((e: Ev) => e.eventType == "purchase", strict = false)))
    assert(run(evs, p).isEmpty)
  }

  test("a 50k-event quantified run does not overflow the stack") {
    // A B* C where B consumes the entire 50k-view run: the match search
    // depth equals the run length — JVM recursion would overflow here
    val n = 50000
    val evs = (ev(0, "click", 0) +: (1 to n).map(i => ev(i.toLong, "view", i.toLong))) :+
      ev(n + 1L, "purchase", n + 1L)
    val p = Pattern(IndexedSeq(
      click,
      Step((e: Ev) => e.eventType == "view", minTimes = 0, maxTimes = Int.MaxValue, strict = false),
      Step((e: Ev) => e.eventType == "purchase", strict = false)))
    val ms = Cep.matches(evs.toIndexedSeq, p, skipPastLastRow = true).toList
    assert(ms.head.nEvents == n + 2 && ms.head.endId == n + 1L)
  }

  test("skip-to-next-row: overlapping matches from different starts") {
    val evs = Seq(ev(1, "click", 0), ev(2, "click", 1), ev(3, "purchase", 2))
    val p = Pattern(IndexedSeq(click, Step((e: Ev) => e.eventType == "purchase", strict = false)))
    assert(run(evs, p).map(m => (m.startId, m.endId)) == List((1L, 3L), (2L, 3L)))
  }

  test("until stop-condition ends quantifier consumption without consuming the stopper") {
    // click view view STOP view purchase: the until('stop') caps the view
    // run at 2; the purchase AFTER the stopper still completes the match
    // (ref Pattern.until — the stop event is not part of the match)
    val evs = Seq(ev(1, "click", 0), ev(2, "view", 1), ev(3, "view", 2),
      ev(4, "stop", 3), ev(5, "view", 4), ev(6, "purchase", 5))
    val p = Pattern(IndexedSeq(
      click,
      Step((e: Ev) => e.eventType == "view", minTimes = 1, maxTimes = 10, strict = false,
        until = Some((e: Ev) => e.eventType == "stop")),
      Step((e: Ev) => e.eventType == "purchase", strict = false)))
    val ms = run(evs, p)
    assert(ms.head.nEvents == 4) // click + 2 views (run capped by stop) + purchase
    assert(ms.head.endId == 6L)
  }

  test("followedByAny emits one match per candidate continuation") {
    val evs = Seq(ev(1, "click", 0), ev(2, "purchase", 1), ev(3, "view", 2), ev(4, "purchase", 3))
    val p = Pattern(IndexedSeq(click, Step((e: Ev) => e.eventType == "purchase", strict = false)))
    // deterministic followedBy: first purchase only
    assert(run(evs, p).map(m => (m.startId, m.endId)) == List((1L, 2L)))
    // followedByAny: BOTH purchases continue the click's partial match
    val all = Cep.matchesAll(evs.toIndexedSeq, p).toList
    assert(all.map(m => (m.startId, m.endId)).toSet == Set((1L, 2L), (1L, 4L)))
  }

  test("notFollowedBy: an error among the skipped events kills the candidate") {
    val buy = Step((e: Ev) => e.eventType == "purchase", strict = false,
      notBefore = Some((e: Ev) => e.eventType == "error"))
    val p = Pattern(IndexedSeq(click, buy))
    // clean gap → match
    assert(run(Seq(ev(1, "click", 0), ev(2, "view", 1), ev(3, "purchase", 2)), p)
      .map(m => (m.startId, m.endId)) == List((1L, 3L)))
    // error between → no match, even though a purchase follows
    assert(run(Seq(ev(1, "click", 0), ev(2, "error", 1), ev(3, "purchase", 2)), p).isEmpty)
    // error AFTER the first purchase is irrelevant
    assert(run(Seq(ev(1, "click", 0), ev(3, "purchase", 1), ev(4, "error", 2)), p)
      .map(m => (m.startId, m.endId)) == List((1L, 3L)))
  }

  test("notNext: only the IMMEDIATELY following event is vetoed") {
    val buy = Step((e: Ev) => e.eventType == "purchase", strict = false,
      notNext = Some((e: Ev) => e.eventType == "error"))
    val p = Pattern(IndexedSeq(click, buy))
    // error right after the click → vetoed
    assert(run(Seq(ev(1, "click", 0), ev(2, "error", 1), ev(3, "purchase", 2)), p).isEmpty)
    // error later (not adjacent) → allowed, unlike notFollowedBy
    assert(run(Seq(ev(1, "click", 0), ev(2, "view", 1), ev(3, "error", 2), ev(4, "purchase", 3)), p)
      .map(m => (m.startId, m.endId)) == List((1L, 4L)))
  }

  test("allowCombinations: a quantified step explores every candidate subset order") {
    // click view1 view2 purchase with view{1,2}: combinations are
    // {v1}, {v1,v2}, {v2} — three distinct matches from one anchor
    val evs = Seq(ev(1, "click", 0), ev(2, "view", 1), ev(3, "view", 2), ev(4, "purchase", 3))
    val p = Pattern(IndexedSeq(
      click,
      Step((e: Ev) => e.eventType == "view", minTimes = 1, maxTimes = 2, strict = false),
      Step((e: Ev) => e.eventType == "purchase", strict = false)))
    val all = Cep.matchesAll(evs.toIndexedSeq, p).toList
    assert(all.map(_.nEvents).sorted == List(3, 3, 4))
  }

  test("reluctant quantifier stops at the first viable continuation (greedy at the last)") {
    // click view purchase view purchase — B*? C ends at the FIRST purchase,
    // B* C at the LAST (ref Quantifier.java greedy/lazy)
    val evs = Seq(ev(1, "click", 0), ev(2, "view", 1), ev(3, "purchase", 2),
                  ev(4, "view", 3), ev(5, "purchase", 4))
    def p(greedy: Boolean) = Pattern(IndexedSeq(
      click,
      Step((_: Ev) => true, minTimes = 0, maxTimes = Int.MaxValue, greedy = greedy),
      purchase))
    assert(run(evs, p(greedy = false)).map(_.endId).headOption.contains(3L))
    assert(run(evs, p(greedy = true)).map(_.endId).headOption.contains(5L))
  }

  test("group step (GroupPattern): the sub-sequence is quantified as a unit at the engine level") {
    import graft.operators.Cep.StepG
    // lo hi lo hi lo: (A B)+ anchored at 0 consumes two pairs; varIds are global
    val evs = IndexedSeq(ev(1, "lo", 0), ev(2, "hi", 1), ev(3, "lo", 2), ev(4, "hi", 3), ev(5, "lo", 4))
    val sub = IndexedSeq(
      StepG[Ev]((e, _) => e.eventType == "lo", varId = 0),
      StepG[Ev]((e, _) => e.eventType == "hi", varId = 1))
    val steps = IndexedSeq(StepG.groupOf(sub, minTimes = 1, maxTimes = Int.MaxValue))
    val m = Cep.findAt(evs, 0, steps, Long.MaxValue, (e: Ev) => e.tsMicros)
    // (varId, evIdx) pairs: two full (A B) iterations, event 5 unconsumed
    assert(m.contains(List((0, 0), (1, 1), (0, 2), (1, 3))))
    // anchored at the trailing lo: no hi follows → no match (min 1 group)
    assert(Cep.findAt(evs, 4, steps, Long.MaxValue, (e: Ev) => e.tsMicros).isEmpty)
  }

  test("min-0 head (B* C): a later step may consume the anchor (ADVICE r4)") {
    // view view purchase — every row anchors SOME match: the two views via
    // B* prefixes, the purchase via zero B occurrences (the old head-leaf
    // prefilter wrongly rejected the lone-purchase anchor)
    val evs = Seq(ev(1, "view", 0), ev(2, "view", 1), ev(3, "purchase", 2))
    val p = Pattern(IndexedSeq(
      Step((e: Ev) => e.eventType == "view", minTimes = 0, maxTimes = 5, strict = false),
      Step((e: Ev) => e.eventType == "purchase", strict = false)))
    assert(run(evs, p).map(m => (m.startId, m.endId, m.nEvents)) ==
      List((1L, 3L, 3), (2L, 3L, 2), (3L, 3L, 1)))
  }

  test("min-0 GROUP head: ((A B)* C) anchors on C with zero group iterations") {
    import graft.operators.Cep.StepG
    val a = StepG[Ev]((e, _) => e.eventType == "a", varId = 0)
    val b = StepG[Ev]((e, _) => e.eventType == "b", varId = 1)
    val c = StepG[Ev]((e, _) => e.eventType == "c", varId = 2)
    val steps = IndexedSeq(StepG.groupOf(IndexedSeq(a, b), minTimes = 0, maxTimes = 3), c)
    // lone c: zero group occurrences, c consumes the anchor
    val lone = IndexedSeq(ev(1, "c", 0))
    assert(Cep.findAt(lone, 0, steps, Long.MaxValue, (e: Ev) => e.tsMicros)
      .contains(List((2, 0))))
    // a b a b c anchored at 0: both pairs consumed, then c
    val full = IndexedSeq(ev(1, "a", 0), ev(2, "b", 1), ev(3, "a", 2), ev(4, "b", 3), ev(5, "c", 4))
    assert(Cep.findAt(full, 0, steps, Long.MaxValue, (e: Ev) => e.tsMicros)
      .contains(List((0, 0), (1, 1), (0, 2), (1, 3), (2, 4))))
    // anchored at a 'b' row: neither the group head nor c matches it → None
    assert(Cep.findAt(full, 1, steps, Long.MaxValue, (e: Ev) => e.tsMicros).isEmpty)
  }
}
