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
  }

  /** One pattern step: context-aware predicate + quantifier + contiguity to
    * the PREVIOUS step (strict = next event must match immediately; relaxed
    * = skip non-matching events, Flink `followedBy`). */
  case class StepG[E](pred: (E, MatchCtx[E]) => Boolean,
                      minTimes: Int = 1, maxTimes: Int = 1, strict: Boolean = true)

  object StepG {
    /** Context-free predicate step. */
    def simple[E](p: E => Boolean, minTimes: Int = 1, maxTimes: Int = 1,
                  strict: Boolean = true): StepG[E] =
      StepG((e: E, _: MatchCtx[E]) => p(e), minTimes, maxTimes, strict)
  }

  /** Greedy match attempt anchored at `start`. Returns (stepIdx, evIdx)
    * pairs in match order, or None. */
  def findAt[E](evs: IndexedSeq[E], start: Int, steps: IndexedSeq[StepG[E]],
                withinMicros: Long, ts: E => Long): Option[List[(Int, Int)]] = {
    if (!steps.head.pred(evs(start), new MatchCtx(evs, Nil))) return None
    val startTs = ts(evs(start))
    def go(pos: Int, si: Int, cnt: Int, acc: List[(Int, Int)]): Option[List[(Int, Int)]] = {
      if (si == steps.length) Some(acc.reverse)
      else {
        val st = steps(si)
        // first-candidate commit: on a matching event we recurse and do not
        // retry later candidates for this step (bounded backtracking)
        def consume: Option[List[(Int, Int)]] = {
          var p = pos
          // strict boundary: the reference NFA times out a partial match when
          // timestamp - startTimestamp >= windowTime (NFA.java:301) — a match
          // spanning exactly WITHIN is rejected. Long.MaxValue (no window)
          // stays safe: ts deltas of real event times never reach it.
          while (p < evs.length && ts(evs(p)) - startTs < withinMicros) {
            if (st.pred(evs(p), new MatchCtx(evs, acc))) return go(p + 1, si, cnt + 1, (si, p) :: acc)
            if (st.strict) return None
            p += 1
          }
          None
        }
        val tryMore = if (cnt < st.maxTimes) consume else None
        tryMore.orElse(if (cnt >= st.minTimes) go(pos, si + 1, 0, acc) else None)
      }
    }
    go(start + 1, 0, 1, List((0, start)))
  }

  // ------------------------------------------------- typed events surface

  case class Ev(userId: Long, eventId: Long, eventType: String, tsMicros: Long, valueCents: Long)
  case class Step(pred: Ev => Boolean, minTimes: Int = 1, maxTimes: Int = 1, strict: Boolean = true)
  case class Pattern(steps: IndexedSeq[Step], withinMicros: Long = Long.MaxValue)
  case class Match(userId: Long, startId: Long, endId: Long, nEvents: Int, startTsMicros: Long)

  /** All matches over one key's time-sorted events.
    * @param skipPastLastRow false = AFTER MATCH SKIP TO NEXT ROW (every row
    *        may start a match, overlaps allowed — the default here and in
    *        Flink); true = AFTER MATCH SKIP PAST LAST ROW (resume after the
    *        previous match's last row — no overlapping matches). */
  def matches(evs: IndexedSeq[Ev], pattern: Pattern,
              skipPastLastRow: Boolean = false): Iterator[Match] = {
    val steps = pattern.steps.map(s => StepG.simple[Ev](s.pred, s.minTimes, s.maxTimes, s.strict))
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
}
