package graft

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.operators.Cep
import graft.streaming.{ChangelogAgg, RetractableTopN, StreamOps}
import graft.streaming.RetractableTopN.{TopNOut, TopNState}
import graft.streaming.StreamOps.{CepTOOut, CepTOState}

import org.scalatest.funsuite.AnyFunSuite

/** Operator-harness specs (r10 VERDICT next-round #7): drive the keyed
  * state-transition functions DIRECTLY through crafted element/watermark/
  * timer sequences with Spark's `TestGroupState` — the analog of Flink's
  * `OneInputStreamOperatorTestHarness` layer (SURVEY §5), which injects
  * watermarks and timers without a memory-sink round trip and so can pin
  * the state transitions the ITCase layer can't see: what exactly is in
  * state after each step, when timers are (re)armed, and that cleanup
  * fires once. Each test names the reference harness test it mirrors. */
class StateHarnessSpec extends AnyFunSuite {

  // -------------------------------------------------- RetractableTopN

  private type TopNRow = (String, String, String, Long, Long, java.sql.Timestamp)
  private def row(kind: String, id: String, value: Long, seq: Long,
                  tsMicros: Long = -1L): TopNRow =
    (kind, "book", id, value, seq,
     if (tsMicros < 0) null else new java.sql.Timestamp(tsMicros / 1000))

  private def topnStep(st: Option[TopNState], rows: Seq[TopNRow], n: Int = 2,
                       ttlMicros: Long = 0L, wmMs: Option[Long] = None,
                       timedOut: Boolean = false): (TestGroupState[TopNState], Seq[TopNOut]) = {
    val conf = if (ttlMicros > 0) GroupStateTimeout.EventTimeTimeout
               else GroupStateTimeout.NoTimeout
    val state = TestGroupState.create[TopNState](
      st.map(Optional.of[TopNState]).getOrElse(Optional.empty[TopNState]), conf, 0L,
      wmMs.map(Optional.of[Long]).getOrElse(Optional.empty[Long]), timedOut)
    val out = RetractableTopN.transition(n, ttlMicros)("book", rows.iterator, state).toSeq
    (state, out)
  }

  /** Mirrors RetractableTopNFunctionTest.testProcessRetractMessageWithNotGenerateUpdateBefore
    * (ref flink-table-runtime-blink/.../rank/RetractableTopNFunctionTest.java:58):
    * inserts build the ranking, a retraction of a ranked row re-admits
    * the runner-up, every touched batch re-emits the refreshed top-N. */
  test("retractable top-n: retraction re-admits the runner-up (per-element steps)") {
    // +I (id1,12) — first ranking
    val (s1, o1) = topnStep(None, Seq(row("+I", "id1", 12, 0)))
    assert(o1 == Seq(TopNOut("book", 1, 1, "id1", 12)))
    assert(s1.isUpdated && s1.get.vals.size == 1)
    // +I (id2,19) — id2 takes rank 1 (ours ranks by value DESC)
    val (s2, o2) = topnStep(Some(s1.get), Seq(row("+I", "id2", 19, 0)))
    assert(o2 == Seq(TopNOut("book", 2, 1, "id2", 19), TopNOut("book", 2, 2, "id1", 12)))
    // +I (id4,11) — below the top-2 cut; ranking emission unchanged ids
    val (s3, o3) = topnStep(Some(s2.get), Seq(row("+I", "id4", 11, 0)))
    assert(o3.map(o => (o.rn, o.id)) == Seq((1, "id2"), (2, "id1")))
    assert(s3.get.vals.size == 3, "out-of-range row must still be retained in state")
    // -U (id1) — the rank-2 row retracts; runner-up id4 re-admitted
    val (s4, o4) = topnStep(Some(s3.get), Seq(row("-U", "id1", 12, 0)))
    assert(o4.map(o => (o.rn, o.id, o.value)) == Seq((1, "id2", 19L), (2, "id4", 11L)))
    assert(s4.get.vals.size == 2)
    // -D (id2) then +I (id5,30) in ONE batch, seq-ordered: retract applies first
    val (s5, o5) = topnStep(Some(s4.get), Seq(row("-D", "id2", 19, 0), row("+I", "id5", 30, 1)))
    assert(o5.map(o => (o.rn, o.id)) == Seq((1, "id5"), (2, "id4")))
    assert(s5.get.epoch == 5, "every touched batch bumps the ranking epoch")
  }

  /** Mirrors RetractableTopNFunctionTest.testCleanIdleState (ref :364):
    * the idle-state timer clears the ranking, and later rows rebuild it
    * from empty rather than resurrecting pre-cleanup rows. */
  test("retractable top-n: idle-state TTL timer clears state; rebuild starts fresh") {
    val ttl = 60L * 1000000 // 60 s in µs
    val t0 = 100L * 1000000
    // event at t0 with watermark 0 → timer armed at ceil((t0+ttl)/1000) ms
    val (s1, _) = topnStep(None, Seq(row("+I", "id1", 12, 0, tsMicros = t0)),
      ttlMicros = ttl, wmMs = Some(0L))
    assert(s1.getTimeoutTimestampMs.get == (t0 + ttl + 999) / 1000,
      "cleanup timer must be armed at the event-time deadline, ceil'd to ms")
    // watermark passes the deadline with no rows → the TIMER fires: state removed
    val (s2, o2) = topnStep(Some(s1.get), Seq.empty,
      ttlMicros = ttl, wmMs = Some((t0 + ttl) / 1000 + 1), timedOut = true)
    assert(o2.isEmpty && s2.isRemoved, "timeout invocation must clear state, emit nothing")
    // a later row rebuilds from EMPTY: epoch restarts, old id1 is gone
    val (s3, o3) = topnStep(None, Seq(row("+I", "id8", 100, 0, tsMicros = 4 * t0)),
      ttlMicros = ttl, wmMs = Some((t0 + ttl) / 1000 + 1))
    assert(o3 == Seq(TopNOut("book", 1, 1, "id8", 100)))
    assert(s3.get.vals.size == 1 && s3.get.epoch == 1)
    // a batch whose deadline is ALREADY below the watermark never arms a
    // dead timer — state drops immediately (Spark rejects past timers)
    val (s4, _) = topnStep(None, Seq(row("+I", "id9", 5, 0, tsMicros = t0)),
      ttlMicros = ttl, wmMs = Some(10L * (t0 + ttl)))
    assert(s4.isRemoved && !s4.getTimeoutTimestampMs.isPresent)
  }

  // -------------------------------------------------- ChangelogAgg

  /** Mirrors GroupAggregateHarnessTest's retraction sequence (ref
    * flink-table-planner/.../harness/GroupAggregateHarnessTest.scala:53):
    * first row per key emits +I, every later batch emits the -U/+U pair
    * retracting the previous aggregate. */
  test("changelog agg: +I first, then -U/+U pairs per update") {
    def step(st: Option[Long], nRows: Int) = {
      val state = TestGroupState.create[Long](
        st.map(Optional.of[Long]).getOrElse(Optional.empty[Long]),
        GroupStateTimeout.NoTimeout, 0L, Optional.empty[Long], false)
      val out = ChangelogAgg.transition("k",
        Iterator.fill(nRows)(ChangelogAgg.Keyed("k")), state).toSeq
      (state, out)
    }
    val (s1, o1) = step(None, 3)
    assert(o1 == Seq(ChangelogAgg.Change("+I", "k", 3)))
    val (s2, o2) = step(Some(s1.get), 2)
    assert(o2 == Seq(ChangelogAgg.Change("-U", "k", 3), ChangelogAgg.Change("+U", "k", 5)))
    // an empty batch for the key emits nothing and leaves state untouched
    val (s3, o3) = step(Some(s2.get), 0)
    assert(o3.isEmpty && !s3.isUpdated && !s3.isRemoved && s3.get == 5)
  }

  // -------------------------------------------------- streaming CEP

  private val within = 10L * 60 * 1000000 // 10 min in µs
  private val pattern = Cep.Pattern(IndexedSeq(
    Cep.Step(_.eventType == "click"),
    Cep.Step(_.eventType == "purchase")), withinMicros = within)

  private type CepRow = (Long, Long, String, Long, Long, java.sql.Timestamp)
  private def ev(id: Long, typ: String, tsMicros: Long): CepRow =
    (7L, id, typ, tsMicros, 0L, new java.sql.Timestamp(tsMicros / 1000))

  private def cepStep(st: Option[CepTOState], rows: Seq[CepRow], wmMs: Long,
                      timedOut: Boolean = false): (TestGroupState[CepTOState], Seq[CepTOOut]) = {
    val state = TestGroupState.create[CepTOState](
      st.map(Optional.of[CepTOState]).getOrElse(Optional.empty[CepTOState]),
      GroupStateTimeout.EventTimeTimeout, 0L,
      Optional.of[Long](wmMs), timedOut)
    val out = StreamOps.cepTimeoutTransition(pattern, within)(7L, rows.iterator, state).toSeq
    (state, out)
  }

  /** Mirrors CEPOperatorTest.testKeyedAdvancingTimeWithoutElements (ref
    * flink-libraries/flink-cep/.../operator/CEPOperatorTest.java:282): a
    * pending partial match times out on a WATERMARK-ONLY advance — the
    * timer, not a new element, flushes the expiry, exactly once. */
  test("streaming CEP: watermark-only advance flushes the timed-out partial once") {
    val tClick = 60L * 1000000 // click at 1 min
    val (s1, o1) = cepStep(None, Seq(ev(1, "click", tClick)), wmMs = 0L)
    assert(o1.isEmpty, "no match, no expiry yet")
    assert(s1.get.events.map(_.eventId) == List(1L), "anchor buffered in state")
    assert(s1.getTimeoutTimestampMs.get == (tClick + within + 999) / 1000,
      "event-time timer armed at the anchor's expiry deadline")
    // watermark jumps past the deadline with NO elements (the timer fires)
    val wm2 = (tClick + within) / 1000 + 60000
    val (s2, o2) = cepStep(Some(s1.get), Seq.empty, wmMs = wm2, timedOut = true)
    assert(o2 == Seq(CepTOOut(1, 7L, 1L, tClick + within)),
      "the partial match must surface on the timeout side exactly once")
    assert(s2.get.events.isEmpty, "expired anchor pruned with its emission")
    assert(!s2.getTimeoutTimestampMs.isPresent, "no pending anchors → no timer")
    // nothing re-fires on a later batch: the expiry was consumed with the state
    val (_, o3) = cepStep(Some(s2.get), Seq.empty, wmMs = wm2 + 1000)
    assert(o3.isEmpty)
  }

  // ------------------------------------------- inactivity timers (KPO)

  private type TimerRow = (Long, Long, java.sql.Timestamp)
  private def tev(id: Long, tsMicros: Long): TimerRow =
    (5L, id, new java.sql.Timestamp(tsMicros / 1000))

  private def timerStep(st: Option[StreamOps.TimerState], rows: Seq[TimerRow], wmMs: Long,
                        gap: Long, timedOut: Boolean = false)
      : (TestGroupState[StreamOps.TimerState], Seq[StreamOps.TimerOut]) = {
    val state = TestGroupState.create[StreamOps.TimerState](
      st.map(Optional.of[StreamOps.TimerState]).getOrElse(Optional.empty[StreamOps.TimerState]),
      GroupStateTimeout.EventTimeTimeout, 0L, Optional.of[Long](wmMs), timedOut)
    val out = StreamOps.inactivityTransition(gap)(5L, rows.iterator, state).toSeq
    (state, out)
  }

  /** Mirrors KeyedProcessOperatorTest.testEventTimeTimers /
    * .testEventTimeTimerWithState (ref flink-streaming-java/.../operators/
    * KeyedProcessOperatorTest.java): each element re-registers the timer
    * at ts+gap; the watermark passing a pending timer fires onTimer with
    * the state the element left behind; a newer element supersedes the
    * older timer so it never fires. */
  test("inactivity timer: re-registration supersedes; onTimer sees the registering state") {
    val gap = 30L * 1000000
    val t1 = 10L * 1000000
    // element 1 arms timer at t1+gap
    val (s1, o1) = timerStep(None, Seq(tev(101, t1)), wmMs = 0L, gap = gap)
    assert(o1.isEmpty)
    assert(s1.get == StreamOps.TimerState(t1, 101L, t1 + gap))
    assert(s1.getTimeoutTimestampMs.get == (t1 + gap + 999) / 1000)
    // element 2 inside the gap supersedes: old timer must NOT fire
    val t2 = t1 + gap / 2
    val (s2, o2) = timerStep(Some(s1.get), Seq(tev(102, t2)), wmMs = 0L, gap = gap)
    assert(o2.isEmpty, "superseded timer fired")
    assert(s2.getTimeoutTimestampMs.get == (t2 + gap + 999) / 1000)
    // watermark passes the pending timer with no rows → onTimer emits the
    // REGISTERING element's state and clears it
    val (s3, o3) = timerStep(Some(s2.get), Seq.empty,
      wmMs = (t2 + gap) / 1000 + 1, gap = gap, timedOut = true)
    assert(o3 == Seq(StreamOps.TimerOut(5L, 102L, t2, t2 + gap)))
    assert(s3.isRemoved)
    // a timer lapsing BETWEEN two same-batch elements fires inline
    val t3 = 200L * 1000000
    val t4 = t3 + gap + 1000 // +1 ms: the timestamp round-trip is ms-granular
    val (_, o4) = timerStep(None, Seq(tev(201, t3), tev(202, t4)), wmMs = 0L, gap = gap)
    assert(o4 == Seq(StreamOps.TimerOut(5L, 201L, t3, t3 + gap)),
      "in-batch lapse must fire the older timer exactly once")
  }

  // ------------------------------------------- TTL dedup (keep-first)

  /** Mirrors RowTimeDeduplicateFunctionTest (ref flink-table-runtime-blink/
    * .../deduplicate/RowTimeDeduplicateFunctionTest.java): keep-first
    * admits a row only past the TTL horizon from the last admit, and the
    * watermark-driven cleanup timer drops idle state so a later row
    * re-admits from empty. */
  test("ttl dedup: admit/suppress walk + cleanup timer lifecycle") {
    val ttl = 60L * 1000000
    def step(st: Option[Long], rows: Seq[(Long, Long)], wmMs: Long, timedOut: Boolean = false) = {
      val state = TestGroupState.create[Long](
        st.map(Optional.of[Long]).getOrElse(Optional.empty[Long]),
        GroupStateTimeout.EventTimeTimeout, 0L, Optional.of[Long](wmMs), timedOut)
      val out = StreamOps.ttlDedupTransition(ttl)((5L, "click"),
        rows.iterator.map { case (id, ts) =>
          (5L, "click", id, new java.sql.Timestamp(ts / 1000)) }, state).toSeq
      (state, out)
    }
    val t0 = 100L * 1000000
    // first admit; duplicates inside the TTL suppressed IN ORDER (the
    // in-batch walk sorts by (ts, id) so shuffle arrival can't matter)
    val (s1, o1) = step(None, Seq((3L, t0 + 1000), (1L, t0), (2L, t0 + ttl / 2)), wmMs = 0L)
    assert(o1.map(_.event_id) == Seq(1L), "only the FIRST row in ts order admits")
    assert(s1.get == t0 && s1.getTimeoutTimestampMs.get == (t0 + ttl + 999) / 1000)
    // past the horizon: re-admit, timer re-armed from the new admit
    val t1 = t0 + ttl + 1000 // +1 ms: the timestamp round-trip is ms-granular
    val (s2, o2) = step(Some(s1.get), Seq((9L, t1)), wmMs = 0L)
    assert(o2.map(_.event_id) == Seq(9L) && s2.get == t1)
    // cleanup timer fires → state dropped silently
    val (s3, o3) = step(Some(s2.get), Seq.empty, wmMs = (t1 + ttl) / 1000 + 1, timedOut = true)
    assert(o3.isEmpty && s3.isRemoved)
    // and a row whose deadline is already below the watermark admits but
    // leaves NO state behind (next event re-admits — no dead timer)
    val (s4, o4) = step(None, Seq((11L, t0)), wmMs = (t0 + ttl) / 1000 + 1000)
    assert(o4.map(_.event_id) == Seq(11L) && s4.isRemoved)
  }

  /** Mirrors CEPOperatorTest.testCEPOperatorCleanupEventTime (ref :565):
    * matched sequences emit on the main side once, and watermark advance
    * prunes every buffered event outside the match window — the state the
    * ITCase layer can't inspect. */
  test("streaming CEP: match emits once and watermark advance prunes the buffer") {
    val tClick = 60L * 1000000
    val tBuy = 120L * 1000000
    val (s1, o1) = cepStep(None, Seq(ev(1, "click", tClick), ev(2, "purchase", tBuy)), wmMs = 0L)
    assert(o1 == Seq(CepTOOut(0, 7L, 1L, 2L)), "completed match on the main side")
    assert(s1.get.events.size == 2, "wm=0: nothing prunable yet")
    // watermark passes both events + within → buffer fully pruned, match NOT re-emitted
    val wm2 = (tBuy + within) / 1000 + 1000
    val (s2, o2) = cepStep(Some(s1.get), Seq.empty, wmMs = wm2)
    assert(o2.isEmpty, "a matched anchor must never surface as a timeout")
    assert(s2.get.events.isEmpty, "watermark advance prunes the shared buffer")
    // a fresh anchor after cleanup starts a new partial with its own timer
    val tClick2 = wm2 * 1000 + 5000000
    val (s3, o3) = cepStep(Some(s2.get), Seq(ev(9, "click", tClick2)), wmMs = wm2)
    assert(o3.isEmpty && s3.get.events.map(_.eventId) == List(9L))
    assert(s3.getTimeoutTimestampMs.get == (tClick2 + within + 999) / 1000)
  }
}
