package graft

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.streaming.StreamOps
import graft.streaming.StreamOps.{CountWinOut, CountWinState, GlobalWinOut, GlobalWinState}

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Count-window / evictor / global-window fuzz — the WindowOperatorTest
  * randomized mirror over the REAL extracted transitions: in-order event
  * streams cut at arbitrary micro-batch boundaries folded through
  * countTumbleTransition / countEvictTransition (Count, Time and Delta
  * evictors) / globalWindowTransition with TestGroupState, checked two
  * ways — outputs must be INVARIANT to where the batch cuts fall
  * (watermark-complete contract), and must equal an independent serial
  * model of the Flink semantics (CountEvictor.of(keep) evicts from the
  * front; TimeEvictor keeps ts > max − window; DeltaEvictor filters on
  * |v − last|; PurgingTrigger fires-and-purges at the threshold). */
class WindowPropertySpec extends AnyFunSuite {

  private def runProp(name: String, p: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(120)
      .withInitialSeed(Seed(0x3B1D0E5L))
    val res = SCTest.check(params, p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private type Row = (Long, Long, Long, Long) // (userId, eventId, tsMicros, valueCents)

  private case class Scenario(events: List[Row], cuts: List[Int])

  /** In-order (ts, id) stream for one key, ties allowed. */
  private val scenarios: Gen[Scenario] = for {
    n <- Gen.choose(0, 30)
    gaps <- Gen.listOfN(n, Gen.oneOf(0L, 1L, 1000L, 60000000L))
    vals <- Gen.listOfN(n, Gen.choose(-200L, 500L))
    cuts <- Gen.listOfN(n, Gen.choose(1, 6))
  } yield {
    val ts = gaps.scanLeft(1000000L)(_ + _).tail
    val evs = vals.zip(ts).zipWithIndex.map { case ((v, t), i) => (9L, i.toLong, t, v) }
    Scenario(evs, cuts)
  }

  private def split(xs: List[Row], szs: List[Int]): List[List[Row]] =
    if (xs.isEmpty) Nil
    else { val k = szs.headOption.getOrElse(3); xs.take(k) :: split(xs.drop(k), szs.drop(1)) }

  private def foldCount(batches: List[List[Row]],
                        t: (Long, Iterator[Row], org.apache.spark.sql.streaming.GroupState[CountWinState]) => Iterator[CountWinOut])
      : List[CountWinOut] = {
    var st: Option[CountWinState] = None
    val out = List.newBuilder[CountWinOut]
    batches.foreach { b =>
      val state = TestGroupState.create[CountWinState](
        st.map(Optional.of[CountWinState]).getOrElse(Optional.empty[CountWinState]),
        GroupStateTimeout.NoTimeout, 0L, Optional.empty[Long], false)
      out ++= t(9L, b.iterator, state)
      st = if (state.isRemoved) None else Some(state.get)
    }
    out.result()
  }

  private def foldGlobal(batches: List[List[Row]], threshold: Long): List[GlobalWinOut] = {
    var st: Option[GlobalWinState] = None
    val out = List.newBuilder[GlobalWinOut]
    batches.foreach { b =>
      val state = TestGroupState.create[GlobalWinState](
        st.map(Optional.of[GlobalWinState]).getOrElse(Optional.empty[GlobalWinState]),
        GroupStateTimeout.NoTimeout, 0L, Optional.empty[Long], false)
      out ++= StreamOps.globalWindowTransition(threshold)(9L, b.iterator, state)
      st = if (state.isRemoved) None else Some(state.get)
    }
    out.result()
  }

  test("count tumbling window with count evictor: split-invariant, equals the serial model") {
    runProp("count-tumble", Prop.forAll(scenarios, Gen.choose(1, 6), Gen.choose(1, 6)) {
      (sc, size, keepRaw) =>
        val keep = math.min(keepRaw, size)
        def run(bs: List[List[Row]]) = foldCount(bs, StreamOps.countTumbleTransition(size, keep))
        val splitRun = run(split(sc.events, sc.cuts))
        val oneShot = run(List(sc.events).filter(_.nonEmpty))
        // independent serial model
        val model = sc.events.grouped(size).filter(_.length == size).zipWithIndex.map {
          case (win, i) =>
            val kept = win.takeRight(keep)
            CountWinOut(9L, i.toLong, kept.length, kept.map(_._4).sum, kept.last._2)
        }.toList
        splitRun == oneShot && splitRun == model
    })
  }

  test("time and delta evictors: split-invariant, equal the serial evictor model") {
    runProp("evictors", Prop.forAll(scenarios, Gen.choose(2, 6),
      Gen.oneOf(0L, 1000L, 60000000L), Gen.choose(0L, 300L)) { (sc, size, keepMicros, delta) =>
      def modelWith(ev: IndexedSeq[(Long, Long, Long)] => IndexedSeq[(Long, Long, Long)]) =
        sc.events.grouped(size).filter(_.length == size).zipWithIndex.map { case (win, i) =>
          val buf = win.map(e => (e._3, e._2, e._4)).toIndexedSeq
          val kept = ev(buf)
          CountWinOut(9L, i.toLong, kept.length, kept.map(_._3).sum, buf.last._2)
        }.toList
      // independent models of the two evictor semantics
      val timeModel: IndexedSeq[(Long, Long, Long)] => IndexedSeq[(Long, Long, Long)] =
        buf => { val mx = buf.map(_._1).max; buf.filter(_._1 > mx - keepMicros) }
      val deltaModel: IndexedSeq[(Long, Long, Long)] => IndexedSeq[(Long, Long, Long)] =
        buf => buf.filter(e => math.abs(e._3 - buf.last._3) <= delta)

      def run(ev: IndexedSeq[(Long, Long, Long)] => IndexedSeq[(Long, Long, Long)],
              bs: List[List[Row]]) = foldCount(bs, StreamOps.countEvictTransition(size, ev))
      val cutsOk = Seq(StreamOps.timeEvictor(keepMicros) -> timeModel,
                       StreamOps.deltaEvictor(delta) -> deltaModel).forall {
        case (prod, model) =>
          val splitRun = run(prod, split(sc.events, sc.cuts))
          splitRun == run(prod, List(sc.events).filter(_.nonEmpty)) &&
            splitRun == modelWith(model)
      }
      cutsOk
    })
  }

  test("global window + purging trigger: split-invariant, equals the running-sum model") {
    runProp("global-window", Prop.forAll(scenarios, Gen.choose(1L, 800L)) { (sc, threshold) =>
      val splitRun = foldGlobal(split(sc.events, sc.cuts), threshold)
      val oneShot = foldGlobal(List(sc.events).filter(_.nonEmpty), threshold)
      val model = {
        var acc = 0L; var n = 0L; var seq = 0L
        val out = List.newBuilder[GlobalWinOut]
        sc.events.foreach { e =>
          acc += e._4; n += 1
          if (acc >= threshold) { out += GlobalWinOut(9L, seq, n, acc, e._2); acc = 0; n = 0; seq += 1 }
        }
        out.result()
      }
      splitRun == oneShot && splitRun == model
    })
  }
}
