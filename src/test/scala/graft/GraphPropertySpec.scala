package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

import graft.operators.GraphOps

/** Differential fuzz for the Gelly-analog graph library — the GellyTest /
  * library-ITCase mirror (ref the test suites under flink-gelly's library
  * package): random
  * small graphs vs independent brute-force models. Every GraphOps output
  * is integer-quantized (floor-division ppm/micro contracts), so the
  * comparison is EXACT — no tolerance anywhere.
  *
  * Scale trick: Spark invocations dominate the budget, so each case is a
  * DISJOINT UNION of many random graphs (vertex ids offset per graph) run
  * through ONE DataFrame call, while the oracle brute-forces the whole
  * union in memory. Global statistics (triadic census' C(n,3) null triads,
  * PageRank's per-union normalization) are modeled over the union too, so
  * nothing decomposes per-component by assumption.
  *
  * The oracles are independent derivations, not transcriptions: the
  * directed triadic census is checked against a per-triple Holland–
  * Leinhardt CLASSIFIER over all C(n,3) triples, where the engine deduces
  * counts closed-form from per-vertex degree decompositions — agreement
  * means the deduction identities hold on arbitrary graphs. Seeded and
  * deterministic end to end. */
class GraphPropertySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // ---------------------------------------------------------------- gen

  /** Random canonical undirected edge set (u < w, distinct, ≥1 edge). */
  private def genUndirected(rnd: Random, offset: Long): Set[(Long, Long)] = {
    val n = 2 + rnd.nextInt(8) // 2..9 vertices
    val p = 0.15 + rnd.nextDouble() * 0.55
    val pairs = for {
      u <- 0 until n; w <- (u + 1) until n
      if rnd.nextDouble() < p
    } yield (offset + u, offset + w)
    if (pairs.nonEmpty) pairs.toSet
    else Set((offset, offset + 1 + rnd.nextInt(math.max(1, n - 1))))
  }

  /** Random simple directed edge set: per unordered pair one of
    * null/fwd/rev/mutual; occasional self-loop (the impls must drop it). */
  private def genDirected(rnd: Random, offset: Long): Set[(Long, Long)] = {
    val n = 2 + rnd.nextInt(8)
    val arcs = (for {
      u <- 0 until n; w <- (u + 1) until n
    } yield {
      val r = rnd.nextDouble()
      if (r < 0.45) Nil
      else if (r < 0.65) List((offset + u, offset + w))
      else if (r < 0.85) List((offset + w, offset + u))
      else List((offset + u, offset + w), (offset + w, offset + u))
    }).flatten.toSet
    if (arcs.nonEmpty) arcs else Set((offset, offset + 1))
  }

  private def withSelfLoop(rnd: Random, offset: Long, e: Set[(Long, Long)]): Set[(Long, Long)] =
    if (rnd.nextDouble() < 0.25) { val v = offset + rnd.nextInt(6); e + ((v, v)) } else e

  private def unionBatch(seed: Long, nGraphs: Int,
                         gen: (Random, Long) => Set[(Long, Long)]): Set[(Long, Long)] = {
    val rnd = new Random(seed)
    (0 until nGraphs).flatMap(i => gen(rnd, 100L * i)).toSet
  }

  private def df(edges: Set[(Long, Long)]): DataFrame =
    edges.toSeq.sorted.toDF("src", "dst").repartition(4)

  // ------------------------------------------------------- model helpers

  /** Symmetric neighbor map of a canonical undirected edge set. */
  private def nbrs(e: Set[(Long, Long)]): Map[Long, Set[Long]] =
    (e.toSeq.flatMap { case (u, w) => Seq(u -> w, w -> u) })
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).toSet }

  private def vertsOf(e: Set[(Long, Long)]): Set[Long] = e.flatMap { case (u, w) => Seq(u, w) }

  /** All triangles (a<b<c) of a canonical undirected edge set. */
  private def triangleSet(e: Set[(Long, Long)]): Set[(Long, Long, Long)] = {
    val nb = nbrs(e)
    e.flatMap { case (a, b) =>
      (nb(a) intersect nb(b)).filter(_ > b).map(c => (a, b, c))
    }
  }

  private def rows(dfx: DataFrame): Seq[Seq[Any]] =
    dfx.collect().toSeq.map(r => (0 until r.length).map(i => r.get(i)))

  private def asLongRows(dfx: DataFrame): Set[Seq[Long]] =
    rows(dfx).map(_.map {
      case l: Long => l
      case i: Int => i.toLong
      case x => fail(s"unexpected non-integral cell $x").asInstanceOf[Long]
    }).toSet

  private def check(name: String, seed: Long, got: Set[Seq[Long]], want: Set[Seq[Long]]): Unit =
    assert(got == want,
      s"$name seed=$seed\n  missing: ${(want -- got).toSeq.sortBy(_.mkString(",")).take(8)}" +
      s"\n  extra:   ${(got -- want).toSeq.sortBy(_.mkString(",")).take(8)}")

  // ------------------------------------------------- undirected family

  test("degrees / triangles / connectedComponents vs brute force (GellyTest mirror)") {
    for (seed <- Seq(101L, 102L, 103L)) {
      val e = unionBatch(seed, 25, genUndirected)
      val d = df(e)
      val nb = nbrs(e)

      check("degrees", seed, asLongRows(GraphOps.degrees(d)),
        nb.map { case (v, s) => Seq(v, s.size.toLong) }.toSet)

      check("triangles", seed, asLongRows(GraphOps.triangles(d)),
        triangleSet(e).map { case (a, b, c) => Seq(a, b, c) })

      // components: min vertex id per component, every vertex labeled
      val verts = vertsOf(e)
      val comp = scala.collection.mutable.Map[Long, Long]()
      verts.toSeq.sorted.foreach { v =>
        if (!comp.contains(v)) {
          // BFS from v; v is the smallest unvisited id, so it labels the component
          var frontier = Set(v); comp(v) = v
          while (frontier.nonEmpty)
            frontier = frontier.flatMap(nb(_)).filterNot(comp.contains)
              .map { u => comp(u) = v; u }
        }
      }
      check("connectedComponents", seed, asLongRows(GraphOps.connectedComponents(d)),
        comp.map { case (v, c) => Seq(v, c) }.toSet)
    }
  }

  test("jaccardIndex / adamicAdar vs brute force (similarity ITCase mirror)") {
    for (seed <- Seq(111L, 112L, 113L)) {
      val e = unionBatch(seed, 25, genUndirected)
      val d = df(e)
      val nb = nbrs(e)
      val deg = nb.map { case (v, s) => v -> s.size.toLong }

      // common-neighbor pair counts
      val inter = nb.toSeq.flatMap { case (_, s) =>
        val vs = s.toSeq.sorted
        for (i <- vs.indices; j <- (i + 1) until vs.size) yield (vs(i), vs(j))
      }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }

      check("jaccardIndex", seed, asLongRows(GraphOps.jaccardIndex(d)),
        inter.map { case ((u, w), in) =>
          Seq(u, w, in, in * 1000000L / (deg(u) + deg(w) - in))
        }.toSet)

      val aa = nb.toSeq.filter(_._2.size >= 2).flatMap { case (c, s) =>
        val vs = s.toSeq.sorted
        val contrib = 1000000000000L / math.floor(math.log(deg(c).toDouble) * 1000000.0).toLong
        for (i <- vs.indices; j <- (i + 1) until vs.size) yield ((vs(i), vs(j)), contrib)
      }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      check("adamicAdar", seed, asLongRows(GraphOps.adamicAdar(d)),
        aa.map { case ((u, w), s) => Seq(u, w, s) }.toSet)
    }
  }

  test("clustering family vs brute force (clustering ITCase mirror)") {
    for (seed <- Seq(121L, 122L, 123L)) {
      val e = unionBatch(seed, 25, genUndirected)
      val d = df(e)
      val nb = nbrs(e)
      val deg = nb.map { case (v, s) => v -> s.size.toLong }
      val tris = triangleSet(e)
      val triPerV = tris.toSeq.flatMap { case (a, b, c) => Seq(a, b, c) }
        .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }

      val lcc = deg.map { case (v, dg) =>
        val t = triPerV.getOrElse(v, 0L)
        Seq(v, dg, t, if (dg >= 2) 2L * t * 1000000L / (dg * (dg - 1)) else 0L)
      }.toSet
      check("localClusteringCoefficient", seed,
        asLongRows(GraphOps.localClusteringCoefficient(d)), lcc)

      val nV = deg.size.toLong
      val sumDeg = deg.values.sum
      val triplets = deg.values.map(dg => dg * (dg - 1) / 2).sum
      check("vertexMetrics", seed, asLongRows(GraphOps.vertexMetrics(d)),
        Set(Seq(nV, sumDeg / 2, sumDeg * 1000000L / nV, triplets,
          deg.values.max, deg.values.map(dg => dg * (dg - 1) / 2).max)))

      // edgeMetrics: lc(v) = neighbors ranked above v in (degree, id) order
      val em = deg.toSeq.map { case (v, dv) =>
        val lc = nb(v).count(n => deg(n) > dv || (deg(n) == dv && n > v)).toLong
        (lc * (lc - 1) / 2, lc * (lc - 1) / 2 + lc * (dv - lc))
      }
      check("edgeMetrics", seed, asLongRows(GraphOps.edgeMetrics(d)),
        Set(Seq(em.map(_._1).sum, em.map(_._2).sum, em.map(_._1).max, em.map(_._2).max)))

      val nTri = tris.size.toLong
      check("globalClusteringCoefficient", seed,
        asLongRows(GraphOps.globalClusteringCoefficient(d)),
        Set(Seq(triplets, 3 * nTri,
          if (triplets > 0) 3 * nTri * 1000000L / triplets else 0L)))

      val sumCc = lcc.toSeq.map(_(3)).sum
      check("averageClusteringCoefficient", seed,
        asLongRows(GraphOps.averageClusteringCoefficient(d)),
        Set(Seq(nV, sumCc, sumCc / nV)))

      // undirected census: brute-force count of triples by edge count —
      // the engine deduces these closed-form from (n, e, triplets, tri)
      val vs = vertsOf(e).toSeq.sorted
      val counts = Array.fill(4)(0L)
      for (i <- vs.indices; j <- (i + 1) until vs.size; k <- (j + 1) until vs.size) {
        val c = Seq((vs(i), vs(j)), (vs(i), vs(k)), (vs(j), vs(k))).count(e.contains)
        counts(c) += 1
      }
      check("triadicCensus", seed, asLongRows(GraphOps.triadicCensus(d)),
        Set(Seq(counts(0), counts(1), counts(2), counts(3))))
    }
  }

  test("trianglesCapped light/heavy split vs brute force at every cap") {
    for (seed <- Seq(131L, 132L); cap <- Seq(1L, 2L, 4L)) {
      val e = unionBatch(seed, 20, genUndirected)
      val d = df(e)
      val deg = nbrs(e).map { case (v, s) => v -> s.size.toLong }
      // rank order (degree, id); each canonical edge oriented low-rank → high-rank
      def rk(v: Long): (Long, Long) = (deg(v), v)
      def less(a: (Long, Long), b: (Long, Long)): Boolean =
        a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
      val od = e.toSeq.map { case (u, w) => if (less(rk(u), rk(w))) u else w }
        .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
      val charged = triangleSet(e).toSeq.map { case (a, b, c) =>
        Seq(a, b, c).reduce((x, y) => if (less(rk(x), rk(y))) x else y)
      }
      val light = charged.count(v => od(v) <= cap).toLong
      val heavy = charged.count(v => od(v) > cap).toLong
      val hubs = od.values.count(_ > cap).toLong
      check(s"trianglesCapped(cap=$cap)", seed,
        asLongRows(GraphOps.trianglesCapped(d, cap)),
        Set(Seq(cap, hubs, light, heavy, light + heavy)))
    }
  }

  test("checksumHashCode matches an independent md5/xor fold") {
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    for (seed <- Seq(141L, 142L)) {
      val e = unionBatch(seed, 20, genUndirected)
      val verts = vertsOf(e)
      val vh = verts.map(v => h60(v.toString)).foldLeft(0L)(_ ^ _)
      val eh = e.map { case (u, w) => h60(s"$u:$w") }.foldLeft(0L)(_ ^ _)
      check("checksumHashCode", seed, asLongRows(GraphOps.checksumHashCode(df(e))),
        Set(Seq(verts.size.toLong, vh, e.size.toLong, eh)))
    }
  }

  test("summarize groups edges by label pair") {
    for (seed <- Seq(151L, 152L)) {
      val rnd = new Random(seed)
      val e = unionBatch(seed, 20, genUndirected)
      val labels = vertsOf(e).toSeq.sorted.map(v => (v, (rnd.nextInt(5) + 1).toLong))
      val lm = labels.toMap
      val want = e.toSeq.map { case (u, w) =>
        (math.min(lm(u), lm(w)), math.max(lm(u), lm(w)))
      }.groupBy(identity).map { case ((a, b), xs) => Seq(a, b, xs.size.toLong) }.toSet
      check("summarize", seed,
        asLongRows(GraphOps.summarize(df(e), labels.toDF("v", "label"))), want)
    }
  }

  // ------------------------------------------------- iterative loops

  test("pageRank matches the exact quantized power iteration") {
    for (seed <- Seq(161L, 162L)) {
      val e = unionBatch(seed, 15, genUndirected)
      val nb = nbrs(e)
      val deg = nb.map { case (v, s) => v -> s.size.toLong }
      var s = deg.map { case (v, _) => v -> 1000000L }
      for (_ <- 1 to 3)
        s = deg.map { case (v, _) =>
          val cs = nb(v).toSeq.map(u => s(u) / deg(u)).sum
          v -> (150000L + 85L * cs / 100L)
        }
      check("pageRank", seed, asLongRows(GraphOps.pageRank(df(e), iters = 3)),
        s.map { case (v, sc) => Seq(v, sc) }.toSet)
    }
  }

  test("labelPropagation matches the synchronous most-frequent-min-tie model") {
    for (seed <- Seq(171L, 172L)) {
      val e = unionBatch(seed, 15, genUndirected)
      val nb = nbrs(e)
      var lab = nb.keys.map(v => v -> v).toMap
      for (_ <- 1 to 3)
        lab = nb.map { case (v, ns) =>
          val votes = ns.toSeq.map(lab).groupBy(identity)
            .map { case (l, xs) => (l, xs.size) }
          val best = votes.toSeq.minBy { case (l, c) => (-c, l) }._1
          v -> best
        }
      check("labelPropagation", seed, asLongRows(GraphOps.labelPropagation(df(e), iters = 3)),
        lab.map { case (v, l) => Seq(v, l) }.toSet)
    }
  }

  test("communityDetection matches the hop-attenuated scored-label model") {
    for (seed <- Seq(181L, 182L)) {
      val e = unionBatch(seed, 15, genUndirected)
      val nb = nbrs(e)
      var st = nb.keys.map(v => v -> (v, 1000000L)).toMap // (label, score)
      for (k <- 1 to 3) {
        st = nb.map { case (v, ns) =>
          val recv = ns.toSeq.map(st) // neighbor (label, score)
          val byLabel = recv.groupBy(_._1).map { case (l, xs) =>
            (l, xs.map(_._2).sum, xs.map(_._2).max)
          }
          val (l, _, ms) = byLabel.toSeq.minBy { case (lb, ts, _) => (-ts, lb) }
          val prev = st(v)._1
          v -> (l, if (l == prev) ms else ms - 500000L / k)
        }
      }
      check("communityDetection", seed, asLongRows(GraphOps.communityDetection(df(e), iters = 3)),
        st.map { case (v, (l, s)) => Seq(v, l, s) }.toSet)
    }
  }

  test("sssp matches BFS hop counts over the reachable set") {
    for (seed <- Seq(191L, 192L, 193L)) {
      val e = unionBatch(seed, 10, genUndirected)
      val nb = nbrs(e)
      val src = vertsOf(e).toSeq.sorted.apply(new Random(seed).nextInt(vertsOf(e).size))
      val dist = scala.collection.mutable.Map(src -> 0L)
      var frontier = Set(src)
      var level = 0L
      while (frontier.nonEmpty) {
        level += 1
        val next = frontier.flatMap(nb(_)).filterNot(dist.contains)
        next.foreach(dist(_) = level)
        frontier = next
      }
      check("sssp", seed, asLongRows(GraphOps.sssp(df(e), src)),
        dist.map { case (v, dd) => Seq(v, dd) }.toSet)
    }
  }

  // ---------------------------------------------- generators + facade

  test("deterministic generators match closed-form lattice/cycle models") {
    import GraphOps.Generators
    def multiset(dfx: DataFrame): Seq[(Long, Long)] =
      dfx.collect().toSeq.map(r => (r.getLong(0), r.getLong(1))).sorted

    // circulant: (i, (i+j) mod n) per offset j — and its two spellings
    for ((n, ranges) <- Seq((7L, Seq((1L, 2L))), (5L, Seq((2L, 1L), (4L, 1L))), (9L, Seq((3L, 3L))))) {
      val offs = ranges.flatMap { case (o, len) => o until (o + len) }
      val want = (for (i <- 0L until n; j <- offs) yield (i, (i + j) % n)).sorted
      assert(multiset(Generators.circulant(spark, n, ranges)) == want, s"circulant n=$n $ranges")
    }
    assert(multiset(Generators.complete(spark, 6)) ==
      (for (i <- 0L until 6; j <- 1L until 6) yield (i, (i + j) % 6)).sorted)

    // grid: decode row-major coords, link ±1 per dimension, wrap iff size>2
    for (dims <- Seq(Seq((4L, false)), Seq((5L, true)), Seq((3L, true), (4L, false)),
                     Seq((2L, false), (2L, false), (2L, false)), Seq((3L, false), (1L, true)))) {
      val n = dims.map(_._1).product
      def coords(id: Long): Seq[Long] =
        dims.foldRight((id, List.empty[Long])) { case ((s, _), (rest, acc)) =>
          (rest / s, (rest % s) :: acc)
        }._2
      def encode(c: Seq[Long]): Long =
        c.zip(dims).foldLeft(0L) { case (acc, (x, (s, _))) => acc * s + x }
      val want = (for {
        id <- 0L until n; k <- dims.indices
        (s, wrapRaw) = dims(k); c = coords(id)
        d <- Seq(-1L, 1L)
        nc = c(k.toInt) + d
        tgt = if (nc >= 0 && nc < s) Some(nc)
              else if (wrapRaw && s > 2) Some((nc + s) % s)
              else None
        t <- tgt
      } yield (id, encode(c.updated(k, t)))).sorted
      assert(multiset(Generators.grid(spark, dims)) == want, s"grid $dims")
    }
    assert(multiset(Generators.cycle(spark, 6)) ==
      (for (i <- 0L until 6; d <- Seq(-1L, 1L)) yield (i, (i + d + 6) % 6)).sorted)
    assert(multiset(Generators.path(spark, 5)) ==
      ((0L until 4L).map(i => (i, i + 1)) ++ (1L until 5L).map(i => (i, i - 1))).sorted)
    assert(multiset(Generators.hypercube(spark, 3)) ==
      (for (i <- 0L until 8; b <- 0 until 3) yield (i, i ^ (1L << b))).sorted)
    assert(multiset(Generators.star(spark, 5)) ==
      ((1L until 5L).flatMap(i => Seq((0L, i), (i, 0L)))).sorted)
    assert(multiset(Generators.singletonEdge(spark, 3)) ==
      (0L until 3L).flatMap(p => Seq((2 * p, 2 * p + 1), (2 * p + 1, 2 * p))).sorted)
    assert(Generators.empty(spark).count() == 0L)
  }

  test("GGraph structural transforms match multiset models (Graph.java mirror)") {
    import GraphOps.GGraph
    def ms(dfx: DataFrame): Seq[(Long, Long)] =
      dfx.collect().toSeq.map(r => (r.getLong(0), r.getLong(1))).sorted
    def vs(dfx: DataFrame): Set[Long] = dfx.collect().toSeq.map(_.getLong(0)).toSet

    for (seed <- Seq(401L, 402L, 403L)) {
      val rnd = new Random(seed)
      def genG(): (Set[Long], Seq[(Long, Long)]) = {
        val n = 3 + rnd.nextInt(6)
        val verts = (0L until n).toSet ++ Set(50L + rnd.nextInt(3)) // isolated extras
        // directed multigraph: duplicates allowed on purpose
        val es = Seq.fill(2 + rnd.nextInt(12))(
          (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        (verts, es)
      }
      val (v1, e1) = genG(); val (v2, e2) = genG()
      val g1 = GGraph(v1.toSeq.toDF("v"), e1.toDF("src", "dst"))
      val g2 = GGraph(v2.toSeq.toDF("v"), e2.toDF("src", "dst"))

      assert(ms(g1.reverse.edges) == e1.map(_.swap).sorted && vs(g1.reverse.vertices) == v1)
      assert(ms(g1.getUndirected.edges) == (e1 ++ e1.map(_.swap)).sorted)

      // subgraph: even vertices, edges with src <= dst
      val sg = g1.subgraph(_ % 2 === 0, (s, d) => s <= d)
      val keptV = v1.filter(_ % 2 == 0)
      assert(vs(sg.vertices) == keptV)
      assert(ms(sg.edges) ==
        e1.filter { case (s, d) => keptV(s) && keptV(d) && s <= d }.sorted)

      val un = g1.union(g2)
      assert(vs(un.vertices) == (v1 ++ v2) && ms(un.edges) == (e1 ++ e2).sorted)

      val diff = g1.difference(g2)
      assert(vs(diff.vertices) == (v1 -- v2))
      assert(ms(diff.edges) ==
        e1.filter { case (s, d) => !v2(s) && !v2(d) }.sorted)

      val ix = g1.intersect(g2)
      val commonDistinct = (e1.toSet intersect e2.toSet).toSeq
      assert(ms(ix.edges) == commonDistinct.sorted)
      assert(vs(ix.vertices) == commonDistinct.flatMap { case (s, d) => Seq(s, d) }.toSet)
    }
  }

  test("bipartite projections match the pairwise incidence model") {
    import GraphOps.BipartiteGraph
    for (seed <- Seq(411L, 412L)) {
      val rnd = new Random(seed)
      val inc = (for (t <- 0L until 6L; b <- 100L until 105L if rnd.nextDouble() < 0.4)
        yield (t, b, rnd.nextInt(100).toLong)).toSeq
      val bg = BipartiteGraph(inc.toDF("top", "bottom", "value"))
      def pairs(key: (Long, Long, Long) => Long, out: (Long, Long, Long) => Long) =
        (for (a <- inc; b <- inc if key(a._1, a._2, a._3) == key(b._1, b._2, b._3) &&
              out(a._1, a._2, a._3) != out(b._1, b._2, b._3))
          yield (out(a._1, a._2, a._3), out(b._1, b._2, b._3),
                 key(a._1, a._2, a._3), a._3, b._3)).sorted
      val topFull = bg.projectionTopFull.collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).sorted
      assert(topFull == pairs((_, b, _) => b, (t, _, _) => t), s"topFull seed=$seed")
      val botFull = bg.projectionBottomFull.collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).sorted
      assert(botFull == pairs((t, _, _) => t, (_, b, _) => b), s"bottomFull seed=$seed")
      val topSimple = bg.projectionTopSimple.collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
      assert(topSimple == pairs((_, b, _) => b, (t, _, _) => t)
        .map { case (s, d, _, x, y) => (s, d, x, y) }.sorted, s"topSimple seed=$seed")
    }
  }

  // ------------------------------------------------- directed family

  /** Dyad map of a directed edge set: (u<w) -> (f, r). */
  private def dyadModel(arcs: Set[(Long, Long)]): Map[(Long, Long), (Long, Long)] =
    arcs.filter(a => a._1 != a._2)
      .map { case (s, t) => (math.min(s, t), math.max(s, t)) }
      .map { p => p -> ((if (arcs.contains(p)) 1L else 0L,
                         if (arcs.contains((p._2, p._1))) 1L else 0L)) }
      .toMap

  /** Independent Holland–Leinhardt classifier of one triple's dyad states. */
  private def triadType(arcs: Set[(Long, Long)], x: Long, y: Long, z: Long): String = {
    def st(a: Long, b: Long): Int =
      (if (arcs.contains((a, b))) 1 else 0) + (if (arcs.contains((b, a))) 2 else 0)
    val pairs = Seq((x, y), (x, z), (y, z))
    val states = pairs.map { case (a, b) => st(a, b) }
    val m = states.count(_ == 3); val a = states.count(s => s == 1 || s == 2)
    (m, a) match {
      case (0, 0) => "003"
      case (0, 1) => "012"
      case (1, 0) => "102"
      case (3, 0) => "300"
      case (2, 1) => "210"
      case (2, 0) => "201"
      case (0, 2) =>
        // shared vertex of the two asym dyads
        val asymPairs = pairs.zip(states).filter(p => p._2 == 1 || p._2 == 2).map(_._1)
        val shared = Seq(x, y, z).find(v => asymPairs.forall(p => p._1 == v || p._2 == v)).get
        val outs = asymPairs.count { case (p1, p2) =>
          if (p1 == shared) arcs.contains((shared, p2)) else arcs.contains((shared, p1))
        }
        if (outs == 2) "021d" else if (outs == 0) "021u" else "021c"
      case (1, 1) =>
        val (mp, _) = pairs.zip(states).find(_._2 == 3).get
        val third = Seq(x, y, z).find(v => v != mp._1 && v != mp._2).get
        val intoDyad = arcs.contains((third, mp._1)) || arcs.contains((third, mp._2))
        if (intoDyad) "111d" else "111u"
      case (0, 3) =>
        val cyc = (arcs.contains((x, y)) && arcs.contains((y, z)) && arcs.contains((z, x))) ||
          (arcs.contains((y, x)) && arcs.contains((z, y)) && arcs.contains((x, z)))
        if (cyc) "030c" else "030t"
      case (1, 2) =>
        val (mp, _) = pairs.zip(states).find(_._2 == 3).get
        val third = Seq(x, y, z).find(v => v != mp._1 && v != mp._2).get
        val out = Seq(mp._1, mp._2).count(v => arcs.contains((third, v)))
        if (out == 2) "120d" else if (out == 0) "120u" else "120c"
      case other => fail(s"unclassifiable dyad profile $other")
    }
  }

  test("dyads / directedDegrees / directedVertexMetrics vs brute force") {
    for (seed <- Seq(201L, 202L, 203L)) {
      val rnd = new Random(seed * 7)
      val arcs = withSelfLoop(rnd, 0L, unionBatch(seed, 20, genDirected))
      val d = df(arcs)
      val dy = dyadModel(arcs)

      check("dyads", seed, asLongRows(GraphOps.dyads(d)),
        dy.map { case ((u, w), (f, r)) => Seq(u, w, f, r) }.toSet)

      val perV = dy.toSeq.flatMap { case ((u, w), (f, r)) => Seq((u, f, r), (w, r, f)) }
        .groupBy(_._1).map { case (v, xs) =>
          v -> ((xs.size.toLong, xs.map(_._2).sum, xs.map(_._3).sum))
        }
      check("directedDegrees", seed, asLongRows(GraphOps.directedDegrees(d)),
        perV.map { case (v, (dg, o, i)) => Seq(v, dg, o, i) }.toSet)

      val degs = perV.values.toSeq
      check("directedVertexMetrics", seed, asLongRows(GraphOps.directedVertexMetrics(d)),
        Set(Seq(
          degs.size.toLong,
          degs.map { case (dg, o, i) => 2 * dg - o - i }.sum / 2,
          degs.map { case (dg, o, i) => o + i - dg }.sum / 2,
          degs.map { case (dg, _, _) => dg * (dg - 1) / 2 }.sum,
          degs.map(_._1).max, degs.map(_._2).max, degs.map(_._3).max,
          degs.map { case (dg, _, _) => dg * (dg - 1) / 2 }.max)))
    }
  }

  test("directedTriangleListing carries the correct masks and triad types") {
    for (seed <- Seq(211L, 212L, 213L)) {
      val arcs = unionBatch(seed, 20, genDirected)
      val dy = dyadModel(arcs)
      val nb = dy.keys.toSeq.flatMap { case (u, w) => Seq(u -> w, w -> u) }
        .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).toSet }
      val want = dy.keys.toSeq.flatMap { case (a, b) =>
        (nb(a) intersect nb(b)).filter(_ > b).map { c =>
          val (fab, rab) = dy((a, b)); val (fbc, rbc) = dy((b, c)); val (fac, rac) = dy((a, c))
          (Seq(a, b, c, fab, rab, fbc, rbc, fac, rac), triadType(arcs, a, b, c))
        }
      }.toSet
      val got = rows(GraphOps.directedTriangleListing(df(arcs)))
        .map(r => (r.init.map(_.asInstanceOf[Long]), r.last.asInstanceOf[String])).toSet
      assert(got == want, s"directedTriangleListing seed=$seed\n missing ${(want -- got).take(4)}\n extra ${(got -- want).take(4)}")
    }
  }

  test("directedLocalClusteringCoefficient / directedGlobalAvgClustering vs brute force") {
    for (seed <- Seq(221L, 222L)) {
      val arcs = unionBatch(seed, 20, genDirected)
      val d = df(arcs)
      val dy = dyadModel(arcs)
      val nb = dy.keys.toSeq.flatMap { case (u, w) => Seq(u -> w, w -> u) }
        .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).toSet }
      val simple = arcs.filter(a => a._1 != a._2)
      val lcc = nb.map { case (v, ns) =>
        val tri = simple.count { case (x, y) => ns.contains(x) && ns.contains(y) }.toLong
        val dg = ns.size.toLong
        Seq(v, dg, tri, if (dg >= 2) tri * 1000000L / (dg * (dg - 1)) else 0L)
      }.toSet
      check("directedLocalClusteringCoefficient", seed,
        asLongRows(GraphOps.directedLocalClusteringCoefficient(d)), lcc)

      val nV = nb.size.toLong
      val sumCc = lcc.toSeq.map(_(3)).sum
      val triplets = nb.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
      val nTri = dy.keys.toSeq.flatMap { case (a, b) =>
        (nb(a) intersect nb(b)).filter(_ > b).map(c => (a, b, c))
      }.size.toLong
      check("directedGlobalAvgClustering", seed,
        asLongRows(GraphOps.directedGlobalAvgClustering(d)),
        Set(Seq(nV, sumCc, sumCc / nV, triplets, 3 * nTri,
          if (triplets > 0) 3 * nTri * 1000000L / triplets else 0L)))
    }
  }

  test("directedTriadicCensus matches per-triple classification of all C(n,3) triples") {
    val order = Seq("003", "012", "102", "021d", "021u", "021c", "111d", "111u",
      "030t", "030c", "201", "120d", "120u", "120c", "210", "300")
    for (seed <- Seq(231L, 232L, 233L)) {
      val arcs = unionBatch(seed, 15, genDirected)
      val vs = vertsOf(arcs).toSeq.sorted
      val counts = scala.collection.mutable.Map(order.map(_ -> 0L): _*)
      for (i <- vs.indices; j <- (i + 1) until vs.size; k <- (j + 1) until vs.size)
        counts(triadType(arcs, vs(i), vs(j), vs(k))) += 1
      check("directedTriadicCensus", seed, asLongRows(GraphOps.directedTriadicCensus(df(arcs))),
        Set(order.map(counts)))
    }
  }

  test("hits matches the exact max-normalized quantized iteration") {
    for (seed <- Seq(241L, 242L)) {
      val arcs = unionBatch(seed, 15, genDirected).filter(a => a._1 != a._2)
      val verts = vertsOf(arcs).toSeq.sorted
      def step(scores: Map[Long, Long], byOut: Boolean): Map[Long, Long] = {
        val raw = arcs.toSeq
          .map { case (s, t) => if (byOut) (t, scores(s)) else (s, scores(t)) }
          .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).sum }
        val mx = raw.values.max
        verts.map(v => v -> raw.getOrElse(v, 0L) * 1000000L / mx).toMap
      }
      var hub = verts.map(v => v -> 1000000L).toMap
      var auth = hub
      for (_ <- 1 to 2) {
        auth = step(hub, byOut = true)   // auth(v) ← Σ hub(in-neighbors)
        hub = step(auth, byOut = false)  // hub(v) ← Σ auth(out-neighbors)
      }
      check("hits", seed, asLongRows(GraphOps.hits(df(arcs), iters = 2)),
        verts.map(v => Seq(v, hub(v), auth(v))).toSet)
    }
  }
}
