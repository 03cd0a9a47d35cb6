package graft

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.streaming.{RetractableTopN, StreamJoin, StreamOps}
import graft.streaming.RetractableTopN.TopNState
import graft.streaming.StreamJoin.{JoinOut, JoinState}
import graft.streaming.StreamOps.{AsOfOut, AsOfState, UpsertOut}

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Randomized model-based checks over the changelog state machines — the
  * fuzz layer above StateHarness2Spec's crafted sequences: arbitrary
  * CONSISTENT changelogs (a -D only ever retracts a live row, like a real
  * upstream), arbitrary micro-batch boundaries, folded through the real
  * transition functions with TestGroupState, then compared against a
  * brute-force model of what the emitted changelog must materialize to.
  * Seeded + deterministic, so a failure is reproducible. */
class StatePropertySpec extends AnyFunSuite {

  private def runProp(name: String, p: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(120)
      .withInitialSeed(Seed(0xC0FFEEL))
    val res = SCTest.check(params, p)
    assert(res.passed, s"$name: ${res.status}")
  }

  // --- generator: one side's consistent changelog over a tiny id space
  // (small ids force duplicates, the multiplicity-count path)
  private def sideOps(n: Int): Gen[List[(String, Long)]] = {
    def loop(left: Int, live: Map[Long, Int], acc: List[(String, Long)]): Gen[List[(String, Long)]] =
      if (left == 0) Gen.const(acc.reverse)
      else {
        val inserts = Gen.choose(0L, 3L).map(id => ("+I", id))
        val dels = if (live.isEmpty) inserts
                   else Gen.oneOf(live.keys.toSeq).map(id => ("-D", id))
        Gen.frequency(7 -> inserts, 3 -> dels).flatMap { case (k, id) =>
          val nl = if (k == "+I") live.updated(id, live.getOrElse(id, 0) + 1)
                   else if (live(id) == 1) live.removed(id) else live.updated(id, live(id) - 1)
          loop(left - 1, nl, (k, id) :: acc)
        }
      }
    loop(n, Map.empty, Nil)
  }

  /** Interleave the two sides (preserving each side's order), tag with
    * global seq, and split into random consecutive micro-batches. */
  private val joinScenario: Gen[List[List[(Int, String, Long)]]] = for {
    nl <- Gen.choose(0, 12)
    nr <- Gen.choose(0, 12)
    ls <- sideOps(nl)
    rs <- sideOps(nr)
    flags <- Gen.listOfN(nl + nr, Gen.oneOf(true, false))
    cuts <- Gen.listOfN(nl + nr, Gen.choose(1, 4))
  } yield {
    def interleave(a: List[(String, Long)], b: List[(String, Long)],
                   f: List[Boolean]): List[(Int, String, Long)] = (a, b, f) match {
      case (Nil, bs, _) => bs.map { case (k, id) => (1, k, id) }
      case (as, Nil, _) => as.map { case (k, id) => (0, k, id) }
      case ((k, id) :: at, bs, true :: ft) => (0, k, id) :: interleave(at, bs, ft)
      case (as, (k, id) :: bt, _ :: ft) => (1, k, id) :: interleave(as, bt, ft)
      case (as, bs, Nil) => interleave(as, bs, List(true))
    }
    val rows = interleave(ls, rs, flags)
    // random consecutive batch sizes
    def split(xs: List[(Int, String, Long)], szs: List[Int]): List[List[(Int, String, Long)]] =
      if (xs.isEmpty) Nil
      else {
        val n = szs.headOption.getOrElse(2)
        xs.take(n) :: split(xs.drop(n), szs.drop(1))
      }
    split(rows, cuts)
  }

  private def foldJoin(joinType: String,
                       batches: List[List[(Int, String, Long)]]): (JoinState, List[JoinOut]) = {
    var st: Option[JoinState] = None
    val out = List.newBuilder[JoinOut]
    var seq = 0L
    batches.foreach { batch =>
      val rows = batch.map { case (side, kind, id) =>
        seq += 1; (7L, side, kind, id, seq, null: java.sql.Timestamp)
      }
      val state = TestGroupState.create[JoinState](
        st.map(Optional.of[JoinState]).getOrElse(Optional.empty[JoinState]),
        GroupStateTimeout.NoTimeout, 0L, Optional.empty[Long], false)
      out ++= StreamJoin.transition(joinType, 0L)(7L, rows.iterator, state)
      st = if (state.exists) Some(state.get) else None
    }
    (st.getOrElse(JoinState(Map.empty, Map.empty)), out.result())
  }

  /** Materialize an emitted +I/-D changelog into a row multiset, checking
    * no row ever goes net-negative (the consumer-facing invariant). */
  private def materialize(out: List[JoinOut]): Option[Map[(Option[Long], Option[Long]), Int]] = {
    var m = Map.empty[(Option[Long], Option[Long]), Int]
    var neg = false
    out.foreach { o =>
      val k = (o.l_id, o.r_id)
      val d = if (o.row_kind == "+I") 1 else -1
      val n = m.getOrElse(k, 0) + d
      if (n < 0) neg = true
      m = if (n <= 0) m - k else m.updated(k, n)
    }
    if (neg) None else Some(m)
  }

  private def expected(joinType: String, lefts: Map[Long, Int],
                       rights: Map[Long, Int]): Map[(Option[Long], Option[Long]), Int] =
    joinType match {
      case "inner" =>
        (for ((l, ln) <- lefts; (r, rn) <- rights)
          yield (Some(l): Option[Long], Some(r): Option[Long]) -> ln * rn).toMap
      case "left_outer" =>
        if (rights.isEmpty) lefts.map { case (l, ln) => (Some(l): Option[Long], None) -> ln }
        else (for ((l, ln) <- lefts; (r, rn) <- rights)
          yield (Some(l): Option[Long], Some(r): Option[Long]) -> ln * rn).toMap
      case "semi" =>
        if (rights.isEmpty) Map.empty
        else lefts.map { case (l, ln) => (Some(l): Option[Long], None) -> ln }
      case "anti" =>
        if (rights.nonEmpty) Map.empty
        else lefts.map { case (l, ln) => (Some(l): Option[Long], None) -> ln }
    }

  for (jt <- Seq("inner", "left_outer", "semi", "anti"))
    test(s"random consistent changelogs: $jt join materializes to the model, never net-negative") {
      runProp(jt, Prop.forAll(joinScenario) { batches =>
        val (st, out) = foldJoin(jt, batches)
        materialize(out) match {
          case None => false // a retraction outran its insertion
          case Some(got) =>
            // model from the operator's own final buffers (which the
            // generator guarantees equal the sides' net multisets)...
            val byState = expected(jt, st.lefts, st.rights)
            // ...and independently from the generated rows
            def net(side: Int) = batches.flatten.filter(_._1 == side)
              .foldLeft(Map.empty[Long, Int]) { case (m, (_, k, id)) =>
                val d = if (k == "+I") 1 else -1
                val n = m.getOrElse(id, 0) + d
                if (n == 0) m - id else m.updated(id, n)
              }
            got == byState && st.lefts == net(0) && st.rights == net(1)
        }
      })
    }

  // --- ChangelogNormalize: arbitrary upsert/tombstone message stream
  private val upsertScenario: Gen[List[List[Option[Long]]]] = for {
    n <- Gen.choose(0, 24)
    vals <- Gen.listOfN(n, Gen.oneOf(Gen.const(None), Gen.choose(0L, 5L).map(Some(_))))
    cuts <- Gen.listOfN(n, Gen.choose(1, 4))
  } yield {
    def split(xs: List[Option[Long]], szs: List[Int]): List[List[Option[Long]]] =
      if (xs.isEmpty) Nil
      else xs.take(szs.headOption.getOrElse(2)) :: split(xs.drop(szs.headOption.getOrElse(2)), szs.drop(1))
    split(vals, cuts)
  }

  test("random upsert streams: normalize's changelog replays to the last value, well-formed") {
    runProp("normalize", Prop.forAll(upsertScenario) { batches =>
      var st: Option[Long] = None
      var seq = 0L
      val out = List.newBuilder[UpsertOut]
      batches.foreach { batch =>
        val rows = batch.map { v => seq += 1; (5L, v, seq) }
        val state = TestGroupState.create[Long](
          st.map(Optional.of[Long]).getOrElse(Optional.empty[Long]),
          GroupStateTimeout.NoTimeout, 0L, Optional.empty[Long], false)
        out ++= StreamOps.upsertTransition(5L, rows.iterator, state)
        st = if (state.exists) Some(state.get) else None
      }
      // replay the emitted lattice: must stay well-formed and end at the
      // last non-superseded value; state must agree
      var live: Option[Long] = None
      var ok = true
      out.result().foreach { o =>
        (o.row_kind, live) match {
          case ("+I", None) => live = Some(o.value)
          case ("-U", Some(v)) if v == o.value => live = None // must be followed by +U
          case ("+U", None) => live = Some(o.value)
          case ("-D", Some(v)) if v == o.value => live = None
          case _ => ok = false
        }
      }
      val lastVal = batches.flatten.foldLeft(None: Option[Long])((_, v) => v)
      ok && live == lastVal && st == lastVal
    })
  }

  // --- RetractableTopN: consistent upsert/retract streams over a tiny id
  // space INCLUDING the null id (the state-store sentinel path)
  private val topnScenario: Gen[List[List[(String, String, Long)]]] = {
    val ids = List(null, "a", "b", "c", "d")
    def loop(left: Int, live: Set[String], acc: List[(String, String, Long)])
        : Gen[List[(String, String, Long)]] =
      if (left == 0) Gen.const(acc.reverse)
      else {
        val upsert = for {
          id <- Gen.oneOf(ids); v <- Gen.choose(0L, 9L)
          k <- Gen.oneOf("+I", "+U")
        } yield (k, id, v)
        val retract =
          if (live.isEmpty) upsert
          else for { id <- Gen.oneOf(live.toSeq); k <- Gen.oneOf("-U", "-D") }
               yield (k, id, 0L)
        Gen.frequency(7 -> upsert, 3 -> retract).flatMap { case op @ (k, id, _) =>
          val nl = if (k.startsWith("+")) live + id else live - id
          loop(left - 1, nl, op :: acc)
        }
      }
    for {
      n <- Gen.choose(0, 20)
      ops <- loop(n, Set.empty, Nil)
      cuts <- Gen.listOfN(n, Gen.choose(1, 3))
    } yield {
      def split(xs: List[(String, String, Long)], szs: List[Int])
          : List[List[(String, String, Long)]] =
        if (xs.isEmpty) Nil
        else xs.take(szs.headOption.getOrElse(2)) :: split(xs.drop(szs.headOption.getOrElse(2)), szs.drop(1))
      split(ops, cuts)
    }
  }

  /** Model of the ranking order: value DESC, then id ASC with null last —
    * the operator's published contract. */
  private def modelRank(vals: Map[Option[String], Long], n: Int): List[(String, Long)] =
    vals.toList
      .sortBy { case (id, v) => (-v, id.isEmpty, id.getOrElse("")) }
      .take(n).map { case (id, v) => (id.orNull, v) }

  test("random retractable top-n streams: every batch re-emits the model ranking") {
    runProp("topn", Prop.forAll(topnScenario) { batches =>
      var st: Option[TopNState] = None
      var model = Map.empty[Option[String], Long]
      var seq = 0L
      var epoch = 0L
      var ok = true
      batches.foreach { batch =>
        val rows = batch.map { case (k, id, v) =>
          seq += 1; (k, "book", id, v, seq, null: java.sql.Timestamp)
        }
        val state = TestGroupState.create[TopNState](
          st.map(Optional.of[TopNState]).getOrElse(Optional.empty[TopNState]),
          GroupStateTimeout.NoTimeout, 0L, Optional.empty[Long], false)
        val out = RetractableTopN.transition(3, 0L)("book", rows.iterator, state).toList
        st = Some(state.get)
        epoch += 1
        batch.foreach { case (k, id, v) =>
          model = if (k.startsWith("+")) model.updated(Option(id), v) else model - Option(id)
        }
        val want = modelRank(model, 3)
        val got = out.map(o => (o.id, o.value))
        ok &&= got == want &&
          out.map(_.rn) == (1 to got.size).toList &&
          out.forall(_.epoch == epoch)
      }
      // retained state must be the FULL live map (out-of-range rows are
      // retained for re-admission), not just the top-n
      ok && st.forall(_.vals.size == model.size)
    })
  }

  // --- streaming as-of join: random event-time scenarios under the
  // watermark contract (an event is always delivered before the
  // watermark passes its timestamp — Spark drops it otherwise)
  private case class AsOfScenario(wms: List[Long], // per-step watermark (ms, nondecreasing)
                                  rights: List[(Long, Long, Int)], // (tsMicros, id, step)
                                  lefts: List[(Long, Long, Int)])

  private val asOfScenario: Gen[AsOfScenario] = for {
    nSteps <- Gen.choose(2, 6)
    incs <- Gen.listOfN(nSteps - 1, Gen.choose(0L, 12_000L))
    wms = incs.scanLeft(0L)(_ + _) :+ Long.MaxValue / 2000 // final flush step
    nr <- Gen.choose(0, 8)
    nl <- Gen.choose(0, 8)
    mkEv = (id: Long) => for {
      tsMs <- Gen.choose(1L, 35_000L)
      valid = wms.zipWithIndex.filter(_._1 < tsMs).map(_._2)
      step <- if (valid.isEmpty) Gen.const(0) else Gen.oneOf(valid)
    } yield (tsMs * 1000L, id, step)
    seqGen = (gs: List[Gen[(Long, Long, Int)]]) =>
      gs.foldLeft(Gen.const(List.empty[(Long, Long, Int)])) { (acc, g) =>
        acc.flatMap(l => g.map(l :+ _))
      }
    rights <- seqGen((1L to nr).map(mkEv).toList)
    lefts <- seqGen((100L until (100L + nl)).map(mkEv).toList)
  } yield AsOfScenario(wms.toList, rights, lefts)

  test("random as-of scenarios: each left matches the latest version <= its ts, exactly once") {
    runProp("asof", Prop.forAll(asOfScenario) { sc =>
      var st: Option[AsOfState] = None
      val out = List.newBuilder[AsOfOut]
      var ok = true
      sc.wms.zipWithIndex.foreach { case (wm, step) =>
        val rows =
          sc.rights.filter(_._3 == step).map { case (ts, id, _) =>
            (3L, 0, ts, id, new java.sql.Timestamp(ts / 1000)) } ++
          sc.lefts.filter(_._3 == step).map { case (ts, id, _) =>
            (3L, 1, ts, id, new java.sql.Timestamp(ts / 1000)) }
        val state = TestGroupState.create[AsOfState](
          st.map(Optional.of[AsOfState]).getOrElse(Optional.empty[AsOfState]),
          GroupStateTimeout.NoTimeout, 0L, Optional.of[Long](wm), false)
        out ++= StreamOps.asOfTransition(None)(3L, rows.iterator, state)
        st = Some(state.get)
        // boundedness invariant: at most ONE retained right version at or
        // below the watermark (the match survivor), rest must be above
        ok &&= st.get.rights.count(_._1 <= wm * 1000) <= 1
      }
      // model: every left matched to the globally-latest right version at
      // or below its ts (watermark contract makes this exact), else absent
      val expect = sc.lefts.map { case (lts, lid, _) =>
        sc.rights.filter(_._1 <= lts).sortBy(_._1).lastOption.map(r => (lid, r._2))
      }.collect { case Some(p) => p }.toSet
      val got = out.result().map(o => (o.left_id, o.right_id))
      ok && got.toSet == expect && got.size == got.distinct.size &&
        st.forall(_.pendingLefts.isEmpty)
    })
  }
}
