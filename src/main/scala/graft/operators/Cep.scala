package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Complex-event-processing: a small NFA over per-key time-ordered events.
  *
  * Reference: flink-libraries/flink-cep/.../nfa/NFA.java:86 (1104 LoC shared-
  * buffer NFA) + pattern API Pattern.java:50 (begin/where/within/oneOrMore/
  * times) + SQL MATCH_RECOGNIZE planned by StreamExecMatch.scala:68. This is
  * the deliberately simplified port SURVEY §2.12 scopes: strict/relaxed
  * contiguity, times(min,max) quantifiers, within-timeout, AFTER MATCH SKIP
  * TO NEXT ROW (every row may start a match), first-candidate commit
  * (bounded backtracking vs the reference's SharedBuffer).
  *
  * The core search is generic over the element type (`findAt`) so the same
  * NFA serves the typed DataStream API ([[detect]]), the streaming operator
  * (graft.streaming.StreamOps.cepClickPurchase) and the SQL
  * MATCH_RECOGNIZE front-end ([[graft.sql.MatchRecognize]]).
  *
  * Spark-first execution: batch = `groupByKey(key).flatMapGroups` with an
  * in-memory per-key time sort (events of ONE key must fit an executor —
  * same contract as the reference's keyed operator state); the groupByKey
  * hash-shuffles once; match search is a linear scan with bounded
  * backtracking, no cross-key data movement.
  */
object Cep {

  /** Partial-match context handed to predicates: lets a DEFINE reference
    * earlier pattern variables (Flink `B AS B.price > A.price` — ref
    * flink-cep pattern/conditions/IterativeCondition). `lastOf(varIdx)` is
    * the most recent row matched to that variable so far. */
  final class MatchCtx[E](evs: IndexedSeq[E], acc: List[(Int, Int)]) {
    def lastOf(varIdx: Int): Option[E] = acc.find(_._1 == varIdx).map(p => evs(p._2))
    def firstOf(varIdx: Int): Option[E] = acc.reverse.collectFirst { case (v, i) if v == varIdx => evs(i) }
    /** n-th previously matched row (1 = most recent). Under STRICT
      * contiguity the matched rows are physically consecutive, so this IS
      * SQL `PREV(col, n)` physical navigation (Flink MatchCodeGenerator
      * PREV — resolves to an input-offset read). */
    def nthBack(n: Int): Option[E] = acc.drop(n - 1).headOption.map(p => evs(p._2))
  }

  /** One pattern step: context-aware predicate + quantifier + contiguity to
    * the PREVIOUS step (strict = next event must match immediately; relaxed
    * = skip non-matching events, Flink `followedBy`).
    *
    * Negative patterns (ref Pattern.notNext / notFollowedBy — the NFA's
    * IGNORE-transition guards) are encoded on the FOLLOWING step, which
    * also enforces the reference's "notFollowedBy cannot be last" rule
    * structurally: `notBefore` fails the candidate if any SKIPPED event
    * between the previous step and this step's first match satisfies it;
    * `notNext` fails the candidate if the event IMMEDIATELY after the
    * previous step satisfies it. Both apply only to the step's first
    * occurrence (between-variable gaps, not intra-quantifier gaps).
    *
    * `greedy` (ref Quantifier.java greedy/lazy, SQL `B+` vs `B+?`): a
    * greedy quantifier consumes as many occurrences as possible before
    * letting the next step match (backtracking down on failure); a
    * RELUCTANT one tries the next step first and consumes another
    * occurrence only when the remainder cannot match. Note the reference's
    * Pattern-API looping states default to lazy and opt INTO greedy();
    * SQL quantifiers default greedy and opt into reluctant with `?` — this
    * engine defaults greedy (the SQL spelling), callers map accordingly.
    *
    * `group` (ref GroupPattern.java — `Pattern.begin(subPattern)`): when
    * set, this step matches the SUB-SEQUENCE, with min/max/greedy
    * quantifying whole-group occurrences; `pred` is unused. Sub-steps may
    * themselves be groups — the search recurses one call-stack level per
    * NESTING level (arbitrary nesting, like the reference's
    * `Pattern.begin(Pattern.begin(...))`).
    *
    * `varId`: the pattern-variable id recorded in the match's (varId,
    * evIdx) pairs; -1 = use the step's position in its sequence (the
    * pre-group behavior). Group sub-steps must set it explicitly so
    * MEASURES/DEFINE navigation sees global variable ids. */
  case class StepG[E](pred: (E, MatchCtx[E]) => Boolean,
                      minTimes: Int = 1, maxTimes: Int = 1, strict: Boolean = true,
                      until: Option[(E, MatchCtx[E]) => Boolean] = None,
                      notBefore: Option[(E, MatchCtx[E]) => Boolean] = None,
                      notNext: Option[(E, MatchCtx[E]) => Boolean] = None,
                      greedy: Boolean = true, varId: Int = -1,
                      group: Option[IndexedSeq[StepG[E]]] = None)

  object StepG {
    /** Context-free predicate step. */
    def simple[E](p: E => Boolean, minTimes: Int = 1, maxTimes: Int = 1,
                  strict: Boolean = true): StepG[E] =
      StepG((e: E, _: MatchCtx[E]) => p(e), minTimes, maxTimes, strict)

    /** Group step `(sub){min,max}` — ref GroupPattern.java. Sub-steps
      * should carry explicit varIds. */
    def groupOf[E](sub: IndexedSeq[StepG[E]], minTimes: Int, maxTimes: Int,
                   greedy: Boolean = true): StepG[E] =
      StepG((_: E, _: MatchCtx[E]) => true, minTimes, maxTimes,
        strict = true, greedy = greedy, group = Some(sub))
  }

  private def effVarId[E](st: StepG[E], si: Int): Int = if (st.varId >= 0) st.varId else si

  /** The leaf predicate the anchor event MUST satisfy, when statically
    * known: descend through group heads recursively while every head on the
    * way is mandatory (minTimes > 0). A min-0 head anywhere makes the
    * anchoring leaf ambiguous — e.g. PATTERN ((A B)* C) anchors on A *or*
    * C — so no sound prefilter exists and the anchored-result check in
    * [[findAt]] is the only gate (the reference NFA has no prefilter at
    * all; ours is purely a fast-path). */
  private def anchorLeaf[E](steps: IndexedSeq[StepG[E]]): Option[StepG[E]] = {
    val h = steps.head
    if (h.minTimes == 0) None
    else h.group match {
      case Some(sub) => anchorLeaf(sub)
      case None => Some(h)
    }
  }

  /** Match attempt anchored at `start`. Returns (varId, evIdx) pairs in
    * match order, or None. */
  def findAt[E](evs: IndexedSeq[E], start: Int, steps: IndexedSeq[StepG[E]],
                withinMicros: Long, ts: E => Long): Option[List[(Int, Int)]] = {
    // prefilter only when the anchoring leaf is statically mandatory; a
    // min-0 head (B*? C / (A B)* C) may legally match zero occurrences
    // with a LATER step consuming the anchor
    if (anchorLeaf(steps).exists(l => !l.pred(evs(start), new MatchCtx(evs, Nil)))) return None
    // anchored: the committed match must consume `start` as its first event
    // (enforced inside the search — a post-filter alone would let the DFS
    // commit to a non-anchored first candidate and wrongly report None)
    findFrom(evs, start, steps, ts(evs(start)), withinMicros, ts, anchorAt = start)
      .filter(_.headOption.exists(_._2 == start))
  }

  /** Sequential match of `steps` beginning at `pos0` (first occurrence of
    * the first step scans from there per its contiguity). Returns the
    * (varId, evIdx) pairs in match order.
    *
    * The search is an EXPLICIT-stack DFS (heap frames, not JVM recursion):
    * search depth equals the match length, so a quantified step consuming a
    * million-event run must not ride the call stack. Each frame tries its
    * two children in quantifier order — greedy: consume one more event
    * (first-candidate commit: a failing descent is not retried with later
    * scan candidates) then advance to the next step once the minimum is
    * met; reluctant: advance first, consume only if the remainder fails.
    * Group steps recurse into the same engine (one call-stack level per
    * NESTING level, never per event). */
  private def findFrom[E](evs: IndexedSeq[E], pos0: Int, steps: IndexedSeq[StepG[E]],
                          startTs: Long, withinMicros: Long, ts: E => Long,
                          anchorAt: Int = -1): Option[List[(Int, Int)]] = {
    final class Frame(val pos: Int, val si: Int, val cnt: Int,
                      val acc: List[(Int, Int)], var stage: Int)
    val stack = scala.collection.mutable.Stack(new Frame(pos0, 0, 0, Nil, 0))
    while (stack.nonEmpty) {
      val f = stack.top
      if (f.si == steps.length) {
        // An ANCHORED search must consume its anchor: an all-optional
        // pattern's empty completion is not a match at this row — keep
        // searching instead of committing to it (r13, found by
        // CepPropertySpec: findAt returned None for pattern c{0,2} on a
        // 'c' row where the one-event match exists and findAllAt/the
        // model both report it).
        if (anchorAt < 0 || f.acc.nonEmpty) return Some(f.acc.reverse)
        stack.pop()
      } else {
      val st = steps(f.si)
      // anchoring: while NOTHING is consumed yet, the first consumed event
      // must be exactly `anchorAt` — whichever step ends up consuming it
      val mustAnchor = anchorAt >= 0 && f.acc.isEmpty
      def tryConsume(): Unit = {
        // negative lookahead (notNext on the between-variable gap): the
        // event right after the previous step must not match — ref
        // Pattern.notNext; gated to the step's FIRST occurrence
        val vetoed = f.cnt == 0 && st.notNext.exists(n =>
          f.pos < evs.length && ts(evs(f.pos)) - startTs < withinMicros &&
            n(evs(f.pos), new MatchCtx(evs, f.acc)))
        if (!vetoed && f.cnt < st.maxTimes) st.group match {
          case Some(sub) =>
            // one more GROUP occurrence = the whole sub-sequence matched
            // from f.pos (first-candidate commit inside, like leaf scans)
            findFrom(evs, f.pos, sub, startTs, withinMicros, ts,
                     if (mustAnchor) anchorAt else -1) match {
              case Some(accSub) if accSub.nonEmpty =>
                stack.push(new Frame(accSub.last._2 + 1, f.si, f.cnt + 1,
                  accSub.reverse ::: f.acc, 0))
              case _ => ()
            }
          case None =>
            var p = f.pos
            var found = -1
            // strict boundary: the reference NFA times out a partial match
            // when timestamp - startTimestamp >= windowTime (NFA.java:301) —
            // a match spanning exactly WITHIN is rejected. Long.MaxValue (no
            // window) stays safe: real ts deltas never reach it.
            while (found < 0 && p < evs.length && ts(evs(p)) - startTs < withinMicros &&
                   !(mustAnchor && p > anchorAt)) {
              // until stop-condition (ref Pattern.until / IterativeCondition
              // stop): once it fires, this quantifier accepts nothing more —
              // the stopping event itself is NOT consumed
              if (st.until.exists(u => u(evs(p), new MatchCtx(evs, f.acc)))) p = evs.length
              else if (st.pred(evs(p), new MatchCtx(evs, f.acc))) found = p
              // notFollowedBy: a skipped event matching the negative guard
              // kills the candidate (checked AFTER pred — an event matching
              // the step itself is consumed, mirroring the NFA's TAKE-over-
              // IGNORE priority)
              else if (f.cnt == 0 && st.notBefore.exists(n => n(evs(p), new MatchCtx(evs, f.acc))))
                p = evs.length
              else if (st.strict) p = evs.length // strict: no skipping
              else p += 1
            }
            if (found >= 0)
              stack.push(new Frame(found + 1, f.si, f.cnt + 1,
                (effVarId(st, f.si), found) :: f.acc, 0))
        }
      }
      def tryAdvance(): Unit =
        if (f.cnt >= st.minTimes)
          stack.push(new Frame(f.pos, f.si + 1, 0, f.acc, 0))
      f.stage match {
        case 0 => f.stage = 1; if (st.greedy) tryConsume() else tryAdvance()
        case 1 => f.stage = 2; if (st.greedy) tryAdvance() else tryConsume()
        case _ => stack.pop() // both children exhausted → backtrack
      }
      }
    }
    None
  }

  /** ALL matches anchored at `start` — ref Pattern.followedByAny /
    * allowCombinations (the non-deterministic relaxed contiguity where
    * EVERY viable candidate continues the partial match, not just the
    * first). Same explicit-stack DFS as [[findAt]], but stage 0 is
    * re-entrant: after a candidate's subtree is explored, the scan resumes
    * past it and tries the next candidate; complete matches are collected
    * instead of returned. Strict steps still have exactly one candidate
    * position (the next event). Exponential in the worst case, exactly like
    * the reference's combinations mode — callers choose patterns
    * accordingly. */
  def findAllAt[E](evs: IndexedSeq[E], start: Int, steps: IndexedSeq[StepG[E]],
                   withinMicros: Long, ts: E => Long): List[List[(Int, Int)]] = {
    // all-matches mode enumerates every branch anyway, so greedy/reluctant
    // ordering cannot change the result SET; groups are out of scope here
    // (the reference's combinations mode composes with groups only in the
    // full SharedBuffer NFA)
    require(steps.forall(_.group.isEmpty), "followedByAny mode does not support group patterns")
    val headOk = steps.head.pred(evs(start), new MatchCtx(evs, Nil))
    if (!headOk && steps.head.minTimes > 0) return Nil
    val startTs = ts(evs(start))
    val results = scala.collection.mutable.ListBuffer[List[(Int, Int)]]()
    final class Frame(val pos: Int, val si: Int, val cnt: Int,
                      val acc: List[(Int, Int)], var stage: Int) { var scan: Int = pos }
    // Uniform general seed (r13, found by CepPropertySpec): the previous
    // mandatory-head fast seed consumed `start` directly, BYPASSING the
    // scan's until/within checks — `a` with until='a' (or within=0)
    // matched here while findAt and the model both reject it. The general
    // scan's anchoring constraint (while nothing is consumed, only `start`
    // may be taken) already forces the mandatory-head shape.
    val stack = scala.collection.mutable.Stack(new Frame(start, 0, 0, Nil, 0))
    while (stack.nonEmpty) {
      val f = stack.top
      if (f.si == steps.length) { results += f.acc.reverse; stack.pop() }
      else f.stage match {
        case 0 => // try the NEXT consume candidate from f.scan
          val st = steps(f.si)
          var pushed = false
          val vetoed = f.cnt == 0 && st.notNext.exists(n =>
            f.pos < evs.length && ts(evs(f.pos)) - startTs < withinMicros &&
              n(evs(f.pos), new MatchCtx(evs, f.acc)))
          if (!vetoed && f.cnt < st.maxTimes) {
            var p = f.scan
            var found = -1
            // general (min-0 head) seed: while nothing is consumed, only
            // `start` itself may be the first consumed event
            while (found < 0 && p < evs.length && ts(evs(p)) - startTs < withinMicros &&
                   !(f.acc.isEmpty && p > start)) {
              if (st.until.exists(u => u(evs(p), new MatchCtx(evs, f.acc)))) p = evs.length
              else if (st.pred(evs(p), new MatchCtx(evs, f.acc))) found = p
              else if (f.cnt == 0 && st.notBefore.exists(n => n(evs(p), new MatchCtx(evs, f.acc))))
                p = evs.length
              else if (st.strict) p = evs.length
              else p += 1
            }
            if (found >= 0) {
              if (st.strict) f.stage = 1 // strict: single candidate position
              else f.scan = found + 1 // re-entry resumes past this candidate
              stack.push(new Frame(found + 1, f.si, f.cnt + 1,
                (effVarId(st, f.si), found) :: f.acc, 0))
              pushed = true
            }
          }
          if (!pushed) f.stage = 1
        case 1 => // advance to the next step
          f.stage = 2
          if (f.cnt >= steps(f.si).minTimes)
            stack.push(new Frame(f.pos, f.si + 1, 0, f.acc, 0))
        case _ =>
          stack.pop()
      }
    }
    // anchored results only (drops the all-steps-empty Nil match a fully
    // optional pattern could produce under the general seed)
    results.toList.filter(_.headOption.exists(_._2 == start))
  }

  // ------------------------------------------------- typed events surface

  case class Ev(userId: Long, eventId: Long, eventType: String, tsMicros: Long, valueCents: Long)
  case class Step(pred: Ev => Boolean, minTimes: Int = 1, maxTimes: Int = 1, strict: Boolean = true,
                  until: Option[Ev => Boolean] = None,
                  notBefore: Option[Ev => Boolean] = None,
                  notNext: Option[Ev => Boolean] = None,
                  greedy: Boolean = true)
  case class Pattern(steps: IndexedSeq[Step], withinMicros: Long = Long.MaxValue)
  case class Match(userId: Long, startId: Long, endId: Long, nEvents: Int, startTsMicros: Long)

  /** All matches over one key's time-sorted events.
    * @param skipPastLastRow false = AFTER MATCH SKIP TO NEXT ROW (every row
    *        may start a match, overlaps allowed — the default here and in
    *        Flink); true = AFTER MATCH SKIP PAST LAST ROW (resume after the
    *        previous match's last row — no overlapping matches). */
  def matches(evs: IndexedSeq[Ev], pattern: Pattern,
              skipPastLastRow: Boolean = false): Iterator[Match] = {
    val steps = pattern.steps.map(s => StepG((e: Ev, _: MatchCtx[Ev]) => s.pred(e), s.minTimes, s.maxTimes, s.strict,
      s.until.map(u => (e: Ev, _: MatchCtx[Ev]) => u(e)),
      s.notBefore.map(n => (e: Ev, _: MatchCtx[Ev]) => n(e)),
      s.notNext.map(n => (e: Ev, _: MatchCtx[Ev]) => n(e)), greedy = s.greedy))
    var resumeAt = 0
    (0 until evs.length).iterator.flatMap { i =>
      if (skipPastLastRow && i < resumeAt) None
      else findAt(evs, i, steps, pattern.withinMicros, (e: Ev) => e.tsMicros).map { idx =>
        if (skipPastLastRow) resumeAt = idx.last._2 + 1
        Match(evs(i).userId, evs(i).eventId, evs(idx.last._2).eventId, idx.length, evs(i).tsMicros)
      }
    }
  }

  /** Batch driver: shuffle by key, sort each key's events by (ts, id), run
    * the NFA — ref CepOperator.java:83 keyed semantics. */
  def detect(spark: SparkSession, events: DataFrame, pattern: Pattern): Dataset[Match] = {
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("userId"), col("event_id").cast("long").as("eventId"),
              col("event_type").as("eventType"), expr("unix_micros(ts)").as("tsMicros"),
              expr("cast(floor(value * 100.0) as long)").as("valueCents"))
      .as[Ev]
      .groupByKey(_.userId)
      .flatMapGroups { (_, it) =>
        val sorted = it.toIndexedSeq.sortBy(e => (e.tsMicros, e.eventId))
        matches(sorted, pattern)
      }
  }

  /** ALL matches per anchor row — ref Pattern.followedByAny /
    * allowCombinations: every candidate continuation yields its own match
    * (the deterministic [[matches]] commits to the first). */
  def matchesAll(evs: IndexedSeq[Ev], pattern: Pattern): Iterator[Match] = {
    val steps = pattern.steps.map(s => StepG((e: Ev, _: MatchCtx[Ev]) => s.pred(e),
      s.minTimes, s.maxTimes, s.strict, s.until.map(u => (e: Ev, _: MatchCtx[Ev]) => u(e)),
      s.notBefore.map(n => (e: Ev, _: MatchCtx[Ev]) => n(e)),
      s.notNext.map(n => (e: Ev, _: MatchCtx[Ev]) => n(e)), greedy = s.greedy))
    (0 until evs.length).iterator.flatMap { i =>
      findAllAt(evs, i, steps, pattern.withinMicros, (e: Ev) => e.tsMicros).map { idx =>
        Match(evs(i).userId, evs(i).eventId, evs(idx.last._2).eventId, idx.length, evs(i).tsMicros)
      }
    }
  }

  /** Batch driver for [[matchesAll]] — same keyed shuffle as [[detect]]. */
  def detectAll(spark: SparkSession, events: DataFrame, pattern: Pattern): Dataset[Match] = {
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("userId"), col("event_id").cast("long").as("eventId"),
              col("event_type").as("eventType"), expr("unix_micros(ts)").as("tsMicros"),
              expr("cast(floor(value * 100.0) as long)").as("valueCents"))
      .as[Ev]
      .groupByKey(_.userId)
      .flatMapGroups { (_, it) =>
        val sorted = it.toIndexedSeq.sortBy(e => (e.tsMicros, e.eventId))
        matchesAll(sorted, pattern)
      }
  }

  case class TimedOut(userId: Long, startId: Long, startTsMicros: Long, deadlineMicros: Long)

  /** Timed-out partial matches — ref TimedOutPartialMatchHandler /
    * PatternTimeoutFunction (flink-cep): a row that anchors the pattern
    * (matches step 0) but whose match never completes inside `within` is
    * emitted with its expiry deadline instead of being dropped silently.
    * On bounded input the end of input plays the role of the +∞ watermark,
    * exactly like the reference's batch/job-end flush. Complete matches
    * are NOT timeouts, mirroring the main-output/side-output split. */
  def timedOutPartials(spark: SparkSession, events: DataFrame, pattern: Pattern): Dataset[TimedOut] = {
    import spark.implicits._
    val steps = pattern.steps.map(s => StepG((e: Ev, _: MatchCtx[Ev]) => s.pred(e), s.minTimes, s.maxTimes, s.strict,
      s.until.map(u => (e: Ev, _: MatchCtx[Ev]) => u(e)),
      s.notBefore.map(n => (e: Ev, _: MatchCtx[Ev]) => n(e)),
      s.notNext.map(n => (e: Ev, _: MatchCtx[Ev]) => n(e)), greedy = s.greedy))
    events
      .select(col("user_id").cast("long").as("userId"), col("event_id").cast("long").as("eventId"),
              col("event_type").as("eventType"), expr("unix_micros(ts)").as("tsMicros"),
              expr("cast(floor(value * 100.0) as long)").as("valueCents"))
      .as[Ev]
      .groupByKey(_.userId)
      .flatMapGroups { (_, it) =>
        val sorted = it.toIndexedSeq.sortBy(e => (e.tsMicros, e.eventId))
        sorted.indices.iterator.flatMap { i =>
          val anchors = anchorLeaf(steps).forall(_.pred(sorted(i), new MatchCtx[Ev](sorted, Nil)))
          if (anchors && findAt(sorted, i, steps, pattern.withinMicros, (e: Ev) => e.tsMicros).isEmpty)
            Some(TimedOut(sorted(i).userId, sorted(i).eventId, sorted(i).tsMicros,
              if (pattern.withinMicros == Long.MaxValue) Long.MaxValue
              else sorted(i).tsMicros + pattern.withinMicros))
          else None
        }
      }
  }
}
