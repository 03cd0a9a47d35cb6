package graft

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.operators.Cep
import graft.streaming.StreamOps
import graft.streaming.StreamOps.{CepTOOut, CepTOState}

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Streaming-vs-batch CEP consistency fuzz — the CEPOperatorTest-style
  * randomized layer above StateHarnessSpec's crafted sequences: arbitrary
  * in-order event streams cut at arbitrary micro-batch boundaries, with
  * watermark-only timer firings interleaved exactly as Spark would deliver
  * them, folded through the REAL cepTimeoutTransition. Replay must agree
  * with the one-shot batch NFA (Cep.matches over the full sorted sequence):
  * every match emitted exactly once on the main side regardless of where
  * the batch cuts fall, and every never-matched anchor emitted exactly
  * once on the timeout side once its window closes — the
  * TimedOutPartialMatchHandler contract (ref flink-libraries/flink-cep
  * CEPOperatorTest.java:282,565 generalized to random scenarios).
  *
  * The NFA itself is fuzzed separately (CepPropertySpec); this property
  * pins the STATE layer: buffer merge, emitted-match bookkeeping across
  * watermark pruning, expiry dedup, and timer re-arming. */
class CepStreamPropertySpec extends AnyFunSuite {

  private def runProp(name: String, p: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(120)
      .withInitialSeed(Seed(0xCE9F00DL))
    val res = SCTest.check(params, p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private type Row = (Long, Long, String, Long, Long, java.sql.Timestamp)
  private def row(id: Long, typ: String, tsMicros: Long): Row =
    (3L, id, typ, tsMicros, 0L, new java.sql.Timestamp(tsMicros / 1000))

  /** One keyed invocation, Spark-shaped: data rows at the current
    * watermark, or a timer firing (empty iterator, timedOut = true). */
  private def invoke(st: Option[CepTOState], pattern: Cep.Pattern, within: Long,
                     rows: Seq[Row], wmMs: Long, timedOut: Boolean)
      : (TestGroupState[CepTOState], Seq[CepTOOut]) = {
    val state = TestGroupState.create[CepTOState](
      st.map(Optional.of[CepTOState]).getOrElse(Optional.empty[CepTOState]),
      GroupStateTimeout.EventTimeTimeout, 0L, Optional.of[Long](wmMs), timedOut)
    val out = StreamOps.cepTimeoutTransition(pattern, within)(3L, rows.iterator, state).toSeq
    (state, out)
  }

  /** In-order event stream (ts multiples of 1ms, ids = positions) split
    * into consecutive micro-batches, plus a pattern variant. */
  private case class Scenario(events: List[Row], cuts: List[Int],
                              pattern: Cep.Pattern, within: Long)

  private val scenarios: Gen[Scenario] = for {
    n <- Gen.choose(0, 24)
    gaps <- Gen.listOfN(n, Gen.choose(0L, 5L * 60 * 1000))     // 0..5 min, ms
    types <- Gen.listOfN(n, Gen.frequency(4 -> Gen.const("click"),
      3 -> Gen.const("purchase"), 3 -> Gen.const("other")))
    cuts <- Gen.listOfN(n, Gen.choose(1, 5))
    withinMin <- Gen.oneOf(2L, 7L, 15L)
    threeStep <- Gen.oneOf(true, false)
  } yield {
    val ts = gaps.scanLeft(60000L)((acc, g) => acc + g).tail // strictly ordered enough (ties allowed at gap 0)
    val evs = types.zip(ts).zipWithIndex.map { case ((ty, t), i) => row(i.toLong, ty, t * 1000) }
    val within = withinMin * 60 * 1000000
    val steps =
      if (threeStep) IndexedSeq(Cep.Step(_.eventType == "click"),
        Cep.Step(_.eventType == "click"), Cep.Step(_.eventType == "purchase"))
      else IndexedSeq(Cep.Step(_.eventType == "click"), Cep.Step(_.eventType == "purchase"))
    Scenario(evs, cuts, Cep.Pattern(steps, withinMicros = within), within)
  }

  test("random CEP streams: replay equals the one-shot NFA; expiries fire exactly once") {
    runProp("cep-stream", Prop.forAll(scenarios) { sc =>
      def split(xs: List[Row], szs: List[Int]): List[List[Row]] =
        if (xs.isEmpty) Nil
        else { val k = szs.headOption.getOrElse(3); xs.take(k) :: split(xs.drop(k), szs.drop(1)) }
      val batches = split(sc.events, sc.cuts)

      var st: Option[CepTOState] = None
      var timer: Option[Long] = None
      var wmMs = 0L
      val mains = List.newBuilder[CepTOOut]
      val touts = List.newBuilder[CepTOOut]
      def absorb(r: (TestGroupState[CepTOState], Seq[CepTOOut])): Unit = {
        val (s, out) = r
        out.foreach(o => if (o.side == 0) mains += o else touts += o)
        st = if (s.isRemoved) None else Some(s.get)
        timer = if (s.getTimeoutTimestampMs.isPresent) Some(s.getTimeoutTimestampMs.get) else None
      }

      batches.foreach { b =>
        // Spark fires a due timer (wm >= timer) before/without data; model
        // it as its own invocation at the current watermark
        while (timer.exists(_ <= wmMs)) absorb(invoke(st, sc.pattern, sc.within, Seq.empty, wmMs, timedOut = true))
        absorb(invoke(st, sc.pattern, sc.within, b, wmMs, timedOut = false))
        // 0-second watermark: wm advances to max event time after the batch
        wmMs = math.max(wmMs, b.map(_._4).max / 1000)
      }
      // drain: advance the watermark past every deadline, firing timers as due
      wmMs = sc.events.map(_._4 / 1000).foldLeft(0L)(math.max) + sc.within / 1000 + 60000
      while (timer.exists(_ <= wmMs)) absorb(invoke(st, sc.pattern, sc.within, Seq.empty, wmMs, timedOut = true))

      val sorted = sc.events.map(e => Cep.Ev(e._1, e._2, e._3, e._4, e._5))
        .sortBy(e => (e.tsMicros, e.eventId)).toIndexedSeq
      val oracle = Cep.matches(sorted, sc.pattern).toList
      val gotMains = mains.result().map(o => (o.click_id, o.ref_id))
      val wantMains = oracle.map(m => (m.startId, m.endId))
      val matchedStarts = oracle.map(_.startId).toSet
      val wantTouts = sorted.filter(e => e.eventType == "click" && !matchedStarts(e.eventId))
        .map(e => (e.eventId, e.tsMicros + sc.within))
      val gotTouts = touts.result().map(o => (o.click_id, o.ref_id))

      val mainOk = gotMains.sorted == wantMains.sorted && gotMains.distinct == gotMains
      val toutOk = gotTouts.sorted == wantTouts.sorted.toList && gotTouts.distinct == gotTouts
      val drained = st.forall(_.events.forall(_.eventType != "click")) && timer.isEmpty
      if (!(mainOk && toutOk && drained))
        println(s"CEP-STREAM FAIL events=${sc.events.map(e => (e._2, e._3, e._4))} cuts=${sc.cuts}" +
          s"\n  mains got=$gotMains want=$wantMains\n  touts got=$gotTouts want=$wantTouts" +
          s"\n  residual state=$st timer=$timer")
      mainOk && toutOk && drained
    })
  }
}
