package graft

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.streaming.{StreamJoin, StreamOps}
import graft.streaming.StreamJoin.{JoinOut, JoinState}
import graft.streaming.StreamOps.{AsOfOut, AsOfState, SortOut, SortState, UpsertOut}

import org.scalatest.funsuite.AnyFunSuite

/** Harness layer, part 2 (extends StateHarnessSpec): the two-sided
  * changelog JOIN state machine and ChangelogNormalize, driven directly
  * through `TestGroupState` with crafted element/watermark/timeout
  * sequences. The reference covers these through the planner ITCases
  * (stream/sql/JoinITCase.scala, SemiAntiJoinStreamITCase.scala) and the
  * deduplicate function harness tests — these specs pin the per-step
  * state contents and emissions that layer can't see. */
class StateHarness2Spec extends AnyFunSuite {

  // ------------------------------------------------ changelog join

  private type JRow = (Long, Int, String, Long, Long, java.sql.Timestamp)
  private def jrow(side: Int, kind: String, id: Long, seq: Long,
                   tsMicros: Long = -1L): JRow =
    (7L, side, kind, id, seq,
     if (tsMicros < 0) null else new java.sql.Timestamp(tsMicros / 1000))

  private def joinStep(joinType: String, st: Option[JoinState], rows: Seq[JRow],
                       ttlMicros: Long = 0L, wmMs: Option[Long] = None,
                       timedOut: Boolean = false): (TestGroupState[JoinState], Seq[JoinOut]) = {
    val conf = if (ttlMicros > 0) GroupStateTimeout.EventTimeTimeout
               else GroupStateTimeout.NoTimeout
    val state = TestGroupState.create[JoinState](
      st.map(Optional.of[JoinState]).getOrElse(Optional.empty[JoinState]), conf, 0L,
      wmMs.map(Optional.of[Long]).getOrElse(Optional.empty[Long]), timedOut)
    val out = StreamJoin.transition(joinType, ttlMicros)(7L, rows.iterator, state).toSeq
    (state, out)
  }

  /** Mirrors the inner-join legs of JoinITCase.testStreamJoinWithSameRecord
    * / StreamingJoinOperator.java:36 (processElement over the two
    * JoinRecordStateViews): every insert joins the OPPOSITE buffer only,
    * duplicates carry multiplicity in the count-map state, and a
    * retraction of one duplicate removes exactly one multiplicity. */
  test("changelog inner join: count-map state and per-duplicate emission") {
    // left 10 arrives first: no rights buffered -> no emission, buffered
    val (s1, o1) = joinStep("inner", None, Seq(jrow(0, "+I", 10, 0)))
    assert(o1.isEmpty && s1.get.lefts == Map(10L -> 1) && s1.get.rights.isEmpty)
    // same left again: multiplicity 2, still nothing to join
    val (s2, o2) = joinStep("inner", Some(s1.get), Seq(jrow(0, "+I", 10, 1)))
    assert(o2.isEmpty && s2.get.lefts == Map(10L -> 2))
    // right 20 arrives: joins BOTH buffered duplicates
    val (s3, o3) = joinStep("inner", Some(s2.get), Seq(jrow(1, "+I", 20, 2)))
    assert(o3 == Seq(JoinOut("+I", 7, Some(10), Some(20)),
                     JoinOut("+I", 7, Some(10), Some(20))))
    assert(s3.get.rights == Map(20L -> 1))
    // retract ONE left duplicate: exactly one joined row retracts,
    // state keeps the other
    val (s4, o4) = joinStep("inner", Some(s3.get), Seq(jrow(0, "-D", 10, 3)))
    assert(o4 == Seq(JoinOut("-D", 7, Some(10), Some(20))))
    assert(s4.get.lefts == Map(10L -> 1))
    // retraction of an id never buffered: the STATE removal is a
    // tolerated no-op, but the emission still joins the opposite buffer —
    // the operator trusts changelog consistency exactly like the
    // reference (a -D only legitimately arrives for a prior +I; on an
    // inconsistent input both engines emit the spurious retraction)
    val (s5, o5) = joinStep("inner", Some(s4.get), Seq(jrow(1, "-D", 99, 4)))
    assert(o5 == Seq(JoinOut("-D", 7, Some(10), Some(99))))
    assert(s5.get == s4.get, "absent-id retraction must leave state untouched")
  }

  /** Mirrors JoinITCase.testLeftOuterJoinWithRetraction (planner ITCase
    * :326) at the operator level: the null-padded row retracts when the
    * key's FIRST right arrives and comes back when the LAST right
    * retracts — the 0→1/1→0 transitions of the right-count. */
  test("changelog left outer join: null-padding flips on right 0<->1 transitions") {
    val (s1, o1) = joinStep("left_outer", None, Seq(jrow(0, "+I", 10, 0)))
    assert(o1 == Seq(JoinOut("+I", 7, Some(10), None)), "no right -> null-padded +I")
    // first right: retract the padding, emit the real join
    val (s2, o2) = joinStep("left_outer", Some(s1.get), Seq(jrow(1, "+I", 20, 1)))
    assert(o2 == Seq(JoinOut("-D", 7, Some(10), None), JoinOut("+I", 7, Some(10), Some(20))))
    // second right: just a new join row (padding already gone)
    val (s3, o3) = joinStep("left_outer", Some(s2.get), Seq(jrow(1, "+I", 21, 2)))
    assert(o3 == Seq(JoinOut("+I", 7, Some(10), Some(21))))
    // retract right 21: its join rows retract, right-count 2->1 keeps padding off
    val (s4, o4) = joinStep("left_outer", Some(s3.get), Seq(jrow(1, "-D", 21, 3)))
    assert(o4 == Seq(JoinOut("-D", 7, Some(10), Some(21))))
    // retract LAST right: join rows retract AND the null padding returns
    val (_, o5) = joinStep("left_outer", Some(s4.get), Seq(jrow(1, "-D", 20, 4)))
    assert(o5 == Seq(JoinOut("-D", 7, Some(10), Some(20)), JoinOut("+I", 7, Some(10), None)))
  }

  /** Mirrors SemiAntiJoinStreamITCase (ref planner/runtime/stream/sql) at
    * the operator level — StreamingSemiAntiJoinOperator.java:34: the left
    * emission is a pure function of whether the right count is zero, and
    * right-side churn between 0 and 1 inserts/retracts every buffered
    * left exactly once. */
  test("changelog semi and anti join: emissions track the right-count zero boundary") {
    // SEMI: left buffered while right empty -> silent
    val (ss1, so1) = joinStep("semi", None, Seq(jrow(0, "+I", 10, 0)))
    assert(so1.isEmpty)
    // right arrives (0->1): buffered left emitted once
    val (ss2, so2) = joinStep("semi", Some(ss1.get), Seq(jrow(1, "+I", 20, 1)))
    assert(so2 == Seq(JoinOut("+I", 7, Some(10), None)))
    // a second right (1->2): NO re-emission
    val (ss3, so3) = joinStep("semi", Some(ss2.get), Seq(jrow(1, "+I", 21, 2)))
    assert(so3.isEmpty)
    // rights drain 2->1->0: the left retracts only at the 1->0 edge
    val (ss4, so4) = joinStep("semi", Some(ss3.get), Seq(jrow(1, "-D", 21, 3)))
    assert(so4.isEmpty)
    val (_, so5) = joinStep("semi", Some(ss4.get), Seq(jrow(1, "-D", 20, 4)))
    assert(so5 == Seq(JoinOut("-D", 7, Some(10), None)))

    // ANTI: left emits while right count is zero
    val (as1, ao1) = joinStep("anti", None, Seq(jrow(0, "+I", 10, 0)))
    assert(ao1 == Seq(JoinOut("+I", 7, Some(10), None)))
    // right arrives: the anti row retracts
    val (as2, ao2) = joinStep("anti", Some(as1.get), Seq(jrow(1, "+I", 20, 1)))
    assert(ao2 == Seq(JoinOut("-D", 7, Some(10), None)))
    // right leaves: it comes back
    val (_, ao3) = joinStep("anti", Some(as2.get), Seq(jrow(1, "-D", 20, 2)))
    assert(ao3 == Seq(JoinOut("+I", 7, Some(10), None)))
  }

  /** The idle-state TTL lifecycle (ref AbstractStreamingJoinOperator
    * stateRetentionTime; same knob family as ProcTimeMiniBatchDeduplicate-
    * KeepLastRowFunctionTest.testWithGenerateUpdateBeforeAndStateTtl):
    * each touched batch re-arms the cleanup timer at last-touched+ttl;
    * a key whose deadline is already behind the watermark drops state
    * immediately; the timeout callback clears state exactly once. */
  test("changelog join TTL: timer re-arm, immediate expiry, timeout cleanup") {
    val ttl = 10_000_000L // 10s in µs
    // touch at t=20s (watermark 5s): timer armed at 30s
    val (s1, _) = joinStep("inner", None, Seq(jrow(0, "+I", 10, 0, tsMicros = 20_000_000L)),
      ttlMicros = ttl, wmMs = Some(5_000L))
    assert(s1.exists && s1.getTimeoutTimestampMs.get == 30_000L)
    // re-touch at t=50s: deadline supersedes to 60s
    val (s2, _) = joinStep("inner", Some(s1.get), Seq(jrow(1, "+I", 20, 1, tsMicros = 50_000_000L)),
      ttlMicros = ttl, wmMs = Some(25_000L))
    assert(s2.getTimeoutTimestampMs.get == 60_000L)
    // a batch whose rows are ALREADY idle beyond ttl vs the watermark
    // (deadline 30s <= wm 45s): state dropped in the same invocation
    val (s3, o3) = joinStep("inner", None, Seq(jrow(0, "+I", 11, 0, tsMicros = 20_000_000L)),
      ttlMicros = ttl, wmMs = Some(45_000L))
    assert(o3.isEmpty && s3.isRemoved, "stale-on-arrival key must not retain state")
    // the timeout callback path: hasTimedOut invocation clears state, no emission
    val (s4, o4) = joinStep("inner", Some(JoinState(Map(10L -> 1), Map(20L -> 1))), Seq.empty,
      ttlMicros = ttl, wmMs = Some(60_000L), timedOut = true)
    assert(o4.isEmpty && s4.isRemoved)
    // post-expiry rows see an EMPTY key and rejoin fresh (the documented
    // reference approximation for long-idle keys)
    val (s5, o5) = joinStep("inner", None, Seq(jrow(0, "+I", 10, 0, tsMicros = 70_000_000L)),
      ttlMicros = ttl, wmMs = Some(60_000L))
    assert(o5.isEmpty && s5.get.lefts == Map(10L -> 1) && s5.get.rights.isEmpty)
  }

  // ------------------------------------------------ ChangelogNormalize

  private def upsertStep(st: Option[Long], rows: Seq[(Long, Option[Long], Long)])
      : (TestGroupState[Long], Seq[UpsertOut]) = {
    val state = TestGroupState.create[Long](
      st.map(Optional.of[Long]).getOrElse(Optional.empty[Long]),
      GroupStateTimeout.NoTimeout, 0L, Optional.empty[Long], false)
    val out = StreamOps.upsertTransition(5L, rows.iterator, state).toSeq
    (state, out)
  }

  /** Mirrors ProcTimeDeduplicateKeepLastRowFunctionTest
    * .testWithGenerateUpdateBefore (ref deduplicate/:…) — the operator
    * behind StreamExecChangelogNormalize: first value +I, overwrite
    * -U(old)+U(new), tombstone -D(old) AND state removal, absent-key
    * tombstone swallowed. */
  test("changelog normalize: +I / -U+U / -D lattice with state removal on tombstone") {
    val (s1, o1) = upsertStep(None, Seq((5L, Some(100L), 0L)))
    assert(o1 == Seq(UpsertOut("+I", 5, 100)) && s1.get == 100L)
    val (s2, o2) = upsertStep(Some(100L), Seq((5L, Some(200L), 1L)))
    assert(o2 == Seq(UpsertOut("-U", 5, 100), UpsertOut("+U", 5, 200)) && s2.get == 200L)
    val (s3, o3) = upsertStep(Some(200L), Seq((5L, None, 2L)))
    assert(o3 == Seq(UpsertOut("-D", 5, 200)))
    assert(s3.isRemoved, "tombstone must remove the key's state, not null it")
    val (s4, o4) = upsertStep(None, Seq((5L, None, 3L)))
    assert(o4.isEmpty && !s4.exists, "tombstone of an absent key is a no-op")
  }

  /** One batch, out-of-order arrival: messages apply in seq order (the
    * upsert-kafka partition-order contract), so the net lattice reflects
    * the LAST seq, with the intermediate transitions all emitted. */
  test("changelog normalize: in-batch seq ordering drives the transition chain") {
    val (s1, o1) = upsertStep(None,
      Seq((5L, Some(300L), 2L), (5L, Some(100L), 0L), (5L, None, 1L)))
    // seq order: +I(100), -D(100) [tombstone], +I(300)
    assert(o1 == Seq(UpsertOut("+I", 5, 100), UpsertOut("-D", 5, 100),
                     UpsertOut("+I", 5, 300)))
    assert(s1.get == 300L)
  }

  // ------------------------------------------------ event-time as-of join

  private type ARow = (Long, Int, Long, Long, java.sql.Timestamp)
  private def arow(side: Int, tsMicros: Long, id: Long): ARow =
    (3L, side, tsMicros, id, new java.sql.Timestamp(tsMicros / 1000))

  private def asOfStep(st: Option[AsOfState], rows: Seq[ARow], wmMs: Long)
      : (TestGroupState[AsOfState], Seq[AsOfOut]) = {
    val state = TestGroupState.create[AsOfState](
      st.map(Optional.of[AsOfState]).getOrElse(Optional.empty[AsOfState]),
      GroupStateTimeout.NoTimeout, 0L, Optional.of[Long](wmMs), false)
    val out = StreamOps.asOfTransition(None)(3L, rows.iterator, state).toSeq
    (state, out)
  }

  /** Mirrors TemporalRowTimeJoinOperatorTest.testRowTimeTemporalJoin (ref
    * join/temporal/TemporalRowTimeJoinOperatorTest.java:39): lefts wait
    * for the watermark, then match the LATEST right version at/below
    * their timestamp; a left below every right version emits nothing
    * (inner semantics). */
  test("streaming as-of: watermark gates the left, match takes the latest version <= ts") {
    // rights: versions at 10s and 20s; left at 15s — all above wm 0: everything pends
    val (s1, o1) = asOfStep(None,
      Seq(arow(0, 10_000_000L, 100), arow(0, 20_000_000L, 200), arow(1, 15_000_000L, 1)), wmMs = 0L)
    assert(o1.isEmpty)
    assert(s1.get.pendingLefts == List((15_000_000L, 1L)) && s1.get.rights.size == 2)
    // watermark to 16s: left(15s) ripens, matches version@10s (not @20s)
    val (s2, o2) = asOfStep(Some(s1.get), Seq.empty, wmMs = 16_000L)
    assert(o2 == Seq(AsOfOut(3, 1, 100)))
    assert(s2.get.pendingLefts.isEmpty)
    // a left at 5s — BELOW the earliest version: no emission even when ripe
    val (s3, o3) = asOfStep(Some(s2.get), Seq(arow(1, 5_000_000L, 2)), wmMs = 30_000L)
    assert(o3.isEmpty, "left below every right version must not match")
    assert(s3.get.pendingLefts.isEmpty, "an unmatched ripe left is consumed, not re-pended")
  }

  /** Mirrors the state-retention leg (testRowTimeTemporalJoinWithStateRetention,
    * ref :121): right versions superseded below the watermark are pruned
    * to the single survivor, and that survivor still answers later
    * lefts — bounded state without a correctness hole. */
  test("streaming as-of: superseded right versions below the watermark are pruned") {
    val (s1, _) = asOfStep(None,
      Seq(arow(0, 10_000_000L, 100), arow(0, 12_000_000L, 120),
          arow(0, 20_000_000L, 200)), wmMs = 15_000L)
    // versions 10s and 12s are both below wm 15s: only the newest (12s)
    // survives; 20s is above and kept
    assert(s1.get.rights == List((12_000_000L, 120L), (20_000_000L, 200L)))
    // a ripe left at 16s matches the kept survivor (12s version)
    val (s2, o2) = asOfStep(Some(s1.get), Seq(arow(1, 16_000_000L, 1)), wmMs = 17_000L)
    assert(o2 == Seq(AsOfOut(3, 1, 120)))
    assert(s2.get.rights == List((12_000_000L, 120L), (20_000_000L, 200L)))
  }

  // ------------------------------------------------ event-time temporal sort

  private def sortStep(st: Option[SortState], rows: Seq[(Long, Long, Long, Long)], wmMs: Long)
      : (TestGroupState[SortState], Seq[SortOut]) = {
    val state = TestGroupState.create[SortState](
      st.map(Optional.of[SortState]).getOrElse(Optional.empty[SortState]),
      GroupStateTimeout.NoTimeout, 0L, Optional.of[Long](wmMs), false)
    // rows: (userId, eventId, tsMicros, valueCents)
    val typed = rows.map(r => (r._1, r._2, new java.sql.Timestamp(r._3 / 1000), r._4))
    val out = StreamOps.sortTransition(9L, typed.iterator, state).toSeq
    (state, out)
  }

  /** Mirrors RowTimeSortOperator's harness coverage (ref
    * operators/sort/RowTimeSortOperatorTest.java): rows buffer until the
    * watermark passes them, flush in (event-time, id) order, and the
    * per-key seq counter numbers emissions continuously across flushes. */
  test("temporal sort: watermark-gated flush in event-time order with continuous seq") {
    // three rows, wm 0: all buffer, nothing emits
    val (s1, o1) = sortStep(None,
      Seq((9L, 22L, 20_000_000L, 0L), (9L, 11L, 10_000_000L, 0L), (9L, 33L, 30_000_000L, 0L)),
      wmMs = 0L)
    assert(o1.isEmpty && s1.get.buf.size == 3 && s1.get.nextSeq == 1L)
    // wm to 25s: the 10s and 20s rows flush IN EVENT-TIME ORDER, 30s stays
    val (s2, o2) = sortStep(Some(s1.get), Seq.empty, wmMs = 25_000L)
    assert(o2 == Seq(SortOut(9, 11, 10_000_000L, 1), SortOut(9, 22, 20_000_000L, 2)))
    assert(s2.get.buf == List((30_000_000L, 33L, 0L)) && s2.get.nextSeq == 3L)
    // equal timestamps break ties by id; seq continues from 3
    val (s3, o3) = sortStep(Some(s2.get),
      Seq((9L, 55L, 30_000_000L, 0L), (9L, 44L, 30_000_000L, 0L)), wmMs = 31_000L)
    assert(o3 == Seq(SortOut(9, 33, 30_000_000L, 3), SortOut(9, 44, 30_000_000L, 4),
                     SortOut(9, 55, 30_000_000L, 5)))
    assert(s3.get.buf.isEmpty && s3.get.nextSeq == 6L)
  }
}
