package graft

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

import graft.operators.{AsOfJoin, BandJoin, SetSimJoin, TwoPassQuantile}

/** Differential fuzz for the batch algorithmic operators whose correctness
  * rests on a pruning/binning argument: PPJoin's prefix+length filters,
  * the band join's two-bin cover, the two-pass quantile's histogram rank
  * arithmetic, and the batch as-of join's tagged-union merge scan. Each is
  * checked against a brute-force model on seeded random inputs — the
  * filters all CLAIM losslessness, so agreement must be exact.
  *
  * Mirrors the reference's randomized join/sort harness tests
  * (the sort-merge and hash-join randomized tests under
  * flink-runtime's operators.sort package, flink-table-planner join
  * ITCases) at the semantic level: random inputs, independent oracle,
  * zero tolerance. */
class OperatorPropertySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // ------------------------------------------------------------- ppjoin

  test("jaccardSelfJoin prunes nothing at IEEE representation boundaries (regression)") {
    // the exact boundary family the fuzz search surfaced: A ⊂ B with
    // J = |A|/|B| landing EXACTLY on t, where ceil(|B|·t) in doubles
    // rounds up past |A| (50·0.14 = 7.000000000000001) — the original
    // `min >= ceil(max*t)` length filter pruned all three of these
    // qualifying pairs; the division-form filter must keep them
    for (((szA, szB, t), id0) <- Seq((7, 50, 0.14), (14, 50, 0.28), (14, 25, 0.56)).zipWithIndex) {
      val base = id0 * 1000L
      val rows = (0 until szB).map(e => (base + 2L, e.toLong)) ++
        (0 until szA).map(e => (base + 1L, e.toLong))
      val got = SetSimJoin.jaccardSelfJoin(rows.toDF("doc_id", "shid"), t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      val jac = szA.toDouble / szB.toDouble
      assert(jac >= t, s"case ($szA,$szB,$t) must sit on the qualifying side")
      assert(got == Set((base + 1L, base + 2L, szA.toLong, jac)),
        s"boundary pair ($szA ⊂ $szB, t=$t) lost: got $got")
    }
  }

  test("jaccardSelfJoin is exactly the brute-force all-pairs J >= t (PPJoin losslessness)") {
    // thresholds chosen to sit ON representability boundaries: 0.3 and
    // 2/3 force ceil/floor calls right at integer edges; 0.14/0.28/0.56
    // are the family where the pre-fix ceil-form length filter was lossy
    for (seed <- Seq(301L, 302L, 303L);
         t <- Seq(0.14, 0.28, 0.3, 0.5, 0.56, 2.0 / 3.0, 0.7, 0.75)) {
      val rnd = new Random(seed * 31 + (t * 1000).toLong)
      // small element universe + geometric-ish sizes → dense overlap and
      // many exact-boundary pairs (subset pairs hit J = |A|/|B| exactly)
      val sets: Map[Long, Set[Long]] = (0L until 40L).map { d =>
        val sz = 1 + rnd.nextInt(12)
        d -> Iterator.continually(rnd.nextInt(30).toLong).take(sz * 3).toSet.take(sz)
      }.toMap
      val rows = sets.toSeq.flatMap { case (d, s) => s.map(e => (d, e)) }
      val got = SetSimJoin.jaccardSelfJoin(rows.toDF("doc_id", "shid"), t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      val want = (for {
        d1 <- sets.keys; d2 <- sets.keys if d1 < d2
        inter = (sets(d1) intersect sets(d2)).size.toLong if inter > 0
        jac = inter.toDouble / (sets(d1).size + sets(d2).size - inter).toDouble
        if jac >= t
      } yield (d1, d2, inter, jac)).toSet
      assert(got == want,
        s"ppjoin seed=$seed t=$t\n  pruned-but-qualifying: ${(want -- got).take(6)}" +
        s"\n  emitted-but-unqualified: ${(got -- want).take(6)}" +
        s"\n  sizes: ${(want -- got).take(6).map { case (a, b, _, _) => (sets(a).size, sets(b).size) }}")
    }
  }

  // ----------------------------------------------------------- band join

  test("bandJoin equals the naive range predicate, negatives and empty bands included") {
    for (seed <- Seq(311L, 312L); (lo, hi) <- Seq((0L, 120L), (-50L, 50L), (7L, 7L),
                                                  (-200L, -100L), (1L, 3L))) {
      val rnd = new Random(seed + lo * 13 + hi)
      val lvals = Seq.fill(60)(rnd.nextLong() % 400L) // mixed signs
      val rvals = Seq.fill(60)(rnd.nextLong() % 400L)
      val l = lvals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("lid", "lv")
      val r = rvals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("rid", "rv")
      val got = BandJoin.bandJoin(l, r, "lv", "rv", lo, hi)
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val want = (for {
        (lv, li) <- lvals.zipWithIndex; (rv, ri) <- rvals.zipWithIndex
        if rv - lv >= lo && rv - lv <= hi
      } yield (li.toLong, ri.toLong)).toSet
      assert(got == want, s"bandJoin seed=$seed band=[$lo,$hi]: " +
        s"missing ${(want -- got).take(6)} extra ${(got -- want).take(6)}")
      // the cover argument also promises no duplicate pairs
      val n = BandJoin.bandJoin(l, r, "lv", "rv", lo, hi).count()
      assert(n == want.size.toLong, s"bandJoin emitted duplicates: $n vs ${want.size}")
    }
  }

  // ------------------------------------------------------ 2-pass quantile

  test("two-pass exact quantile equals the sorted-rank oracle under heavy ties") {
    val qs = Seq(("p01", 1L, 100L), ("p25", 1L, 4L), ("p50", 1L, 2L),
                 ("p90", 9L, 10L), ("max", 1L, 1L))
    for (seed <- Seq(321L, 322L, 323L); shift <- Seq(0, 3, 7)) {
      val rnd = new Random(seed * 7 + shift)
      // skewed + tie-heavy: half the mass on a few hot values
      val vals = Seq.fill(400)(
        if (rnd.nextBoolean()) (rnd.nextInt(5) * 100).toLong
        else rnd.nextInt(5000).toLong)
      val sorted = vals.sorted
      val want = qs.map { case (label, num, den) =>
        val k = (vals.size * num + den - 1) / den
        (label, k, sorted((k - 1).toInt))
      }.toSet
      val got = TwoPassQuantile.exact(spark, vals.map(Tuple1(_)).toDF("x"), "x", shift, qs)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"quantile seed=$seed shift=$shift: got $got want $want")
    }
  }

  // ------------------------------------------------------- batch as-of

  test("batch asOf join carries exactly the latest right version <= left ts, per key") {
    for (seed <- Seq(331L, 332L, 333L)) {
      val rnd = new Random(seed)
      // unique (key, ts) per right side — the operator's version contract
      val rights = (for (k <- 0 until 5; ts <- 0 until 40 if rnd.nextDouble() < 0.3)
        yield (k.toLong, ts.toLong, s"v$k-$ts", if (rnd.nextDouble() < 0.2) null else s"p$ts"))
      val lefts = Seq.fill(80)((rnd.nextInt(5).toLong, rnd.nextInt(45).toLong, rnd.nextInt(1000).toLong))
        .zipWithIndex.map { case ((k, ts, amt), i) => (i.toLong, k, ts, amt) }
      val l = lefts.toDF("lid", "k", "lts", "amt")
      val r = rights.toDF("k", "rts", "ver", "extra")
      val got = AsOfJoin.asOf(l, r, "k", "lts", "rts",
          Map("ver" -> "ver", "extra" -> "extra", "rts" -> "matched_ts"))
        .select("lid", "k", "lts", "amt", "ver", "extra", "matched_ts")
        .collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
                   x.getString(4), x.getString(5), x.getLong(6))).toSet
      val byKey = rights.groupBy(_._1)
      val want = lefts.flatMap { case (lid, k, lts, amt) =>
        byKey.getOrElse(k, Seq.empty).filter(_._2 <= lts) match {
          case Seq() => None
          case vs =>
            val (_, rts, ver, extra) = vs.maxBy(_._2)
            Some((lid, k, lts, amt, ver, extra, rts))
        }
      }.toSet
      assert(got == want, s"asOf seed=$seed: missing ${(want -- got).take(5)} " +
        s"extra ${(got -- want).take(5)}")
    }
  }
}
