package graft

import graft.operators.GraphOps
import graft.sql.EngineEnv
import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Round-7 operator specs: Gelly label propagation, the injected-clock
  * processing-time debounce, and the persistent (DDL-commit-log) catalog. */
class Round7Spec extends SparkTestBase {

  test("label propagation merges dense communities and resists the bridge") {
    val s = spark
    import s.implicits._
    // two 4-cliques {1..4} and {10..13} joined by one bridge edge 4-10: by
    // round 3 each clique is uniformly on its min label and the single
    // bridge vote can never outweigh the three in-clique neighbors (a
    // triangle would NOT resist — 1 bridge vote ties 2 in-clique votes and
    // min-tie-break leaks the lower label across, which is faithful LP)
    def clique(vs: Seq[Long]) = for (a <- vs; b <- vs if a < b) yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L, 13L)) :+
      ((4L, 10L))).toDF("src", "dst")
    val labels = GraphOps.labelPropagation(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(labels(_) == 1L))
    assert(Seq(10L, 11L, 12L, 13L).forall(labels(_) == 10L))
  }

  test("jaccard index / adamic-adar / clustering coefficient on a known square+diagonal") {
    val s = spark
    import s.implicits._
    // square 1-2-3-4 plus diagonal 1-3: Γ(1)={2,3,4}, Γ(3)={1,2,4},
    // Γ(2)=Γ(4)={1,3}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L)).toDF("src", "dst")
    val ji = GraphOps.jaccardIndex(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(ji((2L, 4L)) == (2L, 1000000L)) // identical neighborhoods {1,3}
    assert(ji((1L, 3L)) == (2L, 500000L))  // {2,4} of union {1,2,3,4}
    val lnq = (d: Long) => math.floor(math.log(d.toDouble) * 1e6).toLong
    val aa = GraphOps.adamicAdar(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // common neighbors of (2,4) are 1 and 3, both degree 3
    assert(aa((2L, 4L)) == 2 * (1000000000000L / lnq(3L)))
    val cc = GraphOps.localClusteringCoefficient(edges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(cc(1L) == (3L, 2L, 666666L)) // triangles 123 & 134 over C(3,2)=3
    assert(cc(2L) == (2L, 1L, 1000000L)) // one triangle over C(2,2)=1
  }

  test("metric family on the known square+diagonal") {
    val s = spark
    import s.implicits._
    // square 1-2-3-4 + diagonal 1-3: d=(3,2,3,2), triangles 123 & 134
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L)).toDF("src", "dst")
    val vm = GraphOps.vertexMetrics(edges).head()
    assert((vm.getLong(0), vm.getLong(1), vm.getLong(2), vm.getLong(3),
      vm.getLong(4), vm.getLong(5)) == ((4L, 5L, 2500000L, 8L, 3L, 3L)))
    // (degree, id) order: 2 < 4 < 1 < 3 → lc = (1, 2, 0, 2)
    val em = GraphOps.edgeMetrics(edges).head()
    assert((em.getLong(0), em.getLong(1), em.getLong(2), em.getLong(3)) ==
      ((2L, 4L, 1L, 2L)))
    val g = GraphOps.globalClusteringCoefficient(edges).head()
    assert((g.getLong(0), g.getLong(1), g.getLong(2)) == ((8L, 6L, 750000L)))
    val a = GraphOps.averageClusteringCoefficient(edges).head()
    // lcc ppm = (666666, 1000000, 666666, 1000000)
    assert((a.getLong(0), a.getLong(1), a.getLong(2)) == ((4L, 3333332L, 833333L)))
    val tcRow = GraphOps.triadicCensus(edges).head()
    val tc = (0 to 3).map(tcRow.getLong)
    assert(tc == Seq(0L, 0L, 2L, 2L)) // C(4,3)=4 triads: two 2-edge, two 3-edge
    val ck1 = GraphOps.checksumHashCode(edges).head()
    assert(ck1.getLong(0) == 4L && ck1.getLong(2) == 5L)
    val ck2 = GraphOps.checksumHashCode(edges).head()
    assert(ck1 == ck2) // signature is a pure function of the graph
    val ck3 = GraphOps.checksumHashCode(
      edges.unionAll(Seq((2L, 4L)).toDF("src", "dst"))).head()
    assert(ck3.getLong(3) != ck1.getLong(3)) // one more edge flips the fold
  }

  test("GGraph structural transforms on the square+diagonal") {
    val s = spark
    import s.implicits._
    val g = GraphOps.GGraph.fromEdges(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L)).toDF("src", "dst"))
    assert(g.vertices.count() == 4 && g.edges.count() == 5)
    assert(g.reverse.edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((2L, 1L), (3L, 2L), (4L, 3L), (4L, 1L), (3L, 1L)))
    assert(g.getUndirected.edges.count() == 10) // multiset: regular + reversed
    val sub = g.subgraph(v => v <= 3, (_, _) => org.apache.spark.sql.functions.lit(true))
    assert(sub.vertices.count() == 3 && sub.edges.count() == 3) // 12, 23, 13
    val onlyEven = g.filterOnEdges((a, b) => (a + b) % 2 === 0)
    assert(onlyEven.vertices.count() == 4) // vertices untouched
    assert(onlyEven.edges.count() == 1)    // endpoint sums 3,5,7,5,4 → only 1-3
    val diff = g.difference(GraphOps.GGraph.fromEdges(Seq((3L, 4L)).toDF("src", "dst")))
    assert(diff.vertices.collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(diff.edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L))) // every edge touching 3 or 4 removed
    val inter = sub.intersect(onlyEven)
    assert(inter.edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 3L)))
  }

  test("bipartite projections on a known 2x2 incidence") {
    val s = spark
    import s.implicits._
    // t1-u1(v=1), t1-u2(v=2), t2-u2(v=3)
    val bg = GraphOps.BipartiteGraph(
      Seq((10L, 1L, 1L), (10L, 2L, 2L), (20L, 2L, 3L)).toDF("top", "bottom", "value"))
    val ts = bg.projectionTopSimple.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(ts == Set((10L, 20L, 2L, 3L), (20L, 10L, 3L, 2L))) // via shared u2
    val bs = bg.projectionBottomSimple.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(bs == Set((1L, 2L, 1L, 2L), (2L, 1L, 2L, 1L))) // via shared t1
    val bf = bg.projectionBottomFull.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(bf == Set((1L, 2L, 10L), (2L, 1L, 10L))) // connecting top retained
  }

  test("directed clustering family on a known mixed-dyad graph") {
    val s = spark
    import s.implicits._
    // 1<->2 mutual; 1->3, 3->2 asymmetric; 4->1 pendant
    // degrees (d,out,in): 1:(3,2,2) 2:(2,1,2) 3:(2,1,1) 4:(1,1,0)
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 2L), (4L, 1L)).toDF("src", "dst")
    val dd = GraphOps.directedDegrees(e).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(dd == Map(1L -> (3L, 2L, 2L), 2L -> (2L, 1L, 2L),
      3L -> (2L, 1L, 1L), 4L -> (1L, 1L, 0L)))
    val vm = GraphOps.directedVertexMetrics(e).head()
    // uni {13,32,41}=3, bi {12}=1, triplets 3+1+1+0=5
    assert((vm.getLong(0), vm.getLong(1), vm.getLong(2), vm.getLong(3),
      vm.getLong(4), vm.getLong(5), vm.getLong(6), vm.getLong(7)) ==
      ((4L, 3L, 1L, 5L, 3L, 2L, 2L, 3L)))
    val tl = GraphOps.directedTriangleListing(e).collect()
    assert(tl.length == 1)
    assert((tl(0).getLong(0), tl(0).getLong(1), tl(0).getLong(2),
      tl(0).getString(9)) == ((1L, 2L, 3L, "120c"))) // 1<->2 mutual, 3 chains
    val lcc = GraphOps.directedLocalClusteringCoefficient(e).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    // v1: edge 3->2 among {2,3,4} -> 1/6; v2: 1->3 among {1,3} -> 1/2;
    // v3: 1<->2 among {1,2} -> 2/2; v4: degree 1 -> 0
    assert(lcc == Map(1L -> (1L, 166666L), 2L -> (1L, 500000L),
      3L -> (2L, 1000000L), 4L -> (0L, 0L)))
    val g = GraphOps.directedGlobalAvgClustering(e).head()
    // sum_cc = 1666666, acc = 416666; triplets 5, triangles 3, gcc 600000
    assert((g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3),
      g.getLong(4), g.getLong(5)) == ((4L, 1666666L, 416666L, 5L, 3L, 600000L)))
    val cen = GraphOps.directedTriadicCensus(e).head()
    val counts = (0 to 15).map(cen.getLong)
    // hand census of the 4 triads: {123}=120c, {124}=111d, {134}=021c, {234}=012
    assert(counts == Seq(0L, 1L, 0L, 0L, 0L, 1L, 1L, 0L, 0L, 0L, 0L, 0L, 0L, 1L, 0L, 0L))
  }

  test("directed triadic census matches brute-force enumeration on a 30-vertex LCG graph") {
    val s = spark
    import s.implicits._
    // deterministic pseudo-random directed graph: ~1/7 of ordered pairs
    val n = 30
    def has(i: Long, j: Long): Boolean =
      i != j && (i * 2654435761L + j * 40503L) % 7 == 0
    val edges = (for { i <- 0L until n; j <- 0L until n if has(i, j) }
      yield (i, j)).toDF("src", "dst")
    // brute force: classify all C(30,3) triads from the raw 6 booleans
    val counts = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    for (a <- 0L until n; b <- a + 1 until n; c <- b + 1 until n) {
      val (ab, ba, bc, cb, ac, ca) =
        (has(a, b), has(b, a), has(b, c), has(c, b), has(a, c), has(c, a))
      def dyad(f: Boolean, r: Boolean) = (f, r) match {
        case (true, true) => 'm'; case (false, false) => 'n'; case _ => 'a'
      }
      val ds = Seq(dyad(ab, ba), dyad(bc, cb), dyad(ac, ca))
      val (m, asym) = (ds.count(_ == 'm'), ds.count(_ == 'a'))
      // out-degree of each vertex within the triad (asym edges only)
      def outOnly(f: Boolean, r: Boolean) = if (f && !r) 1 else 0
      val outA = outOnly(ab, ba) + outOnly(ac, ca)
      val outB = outOnly(ba, ab) + outOnly(bc, cb)
      val outC = outOnly(ca, ac) + outOnly(cb, bc)
      val t = (m, asym) match {
        case (0, 0) => "t003"
        case (0, 1) => "t012"
        case (1, 0) => "t102"
        case (2, 0) => "t201"
        case (2, 1) => "t210"
        case (3, 0) => "t300"
        case (0, 2) => // one vertex touches both asym edges; orient by it
          if (Seq(outA, outB, outC).contains(2)) "t021d"
          else { // the 2-degree vertex in the asym subgraph:
            val degA = Seq((ab || ba), (ac || ca)).count(identity)
            val degB = Seq((ab || ba), (bc || cb)).count(identity)
            val z = if (degA == 2) outA else if (degB == 2) outB else outC
            if (z == 0) "t021u" else "t021c"
          }
        case (1, 1) => // asym edge next to the mutual dyad: does it point at it?
          val into =
            if (dyad(ab, ba) == 'm') (ca && !ac) || (cb && !bc)
            else if (dyad(bc, cb) == 'm') (ab && !ba) || (ac && !ca)
            else (ba && !ab) || (bc && !cb)
          if (into) "t111d" else "t111u"
        case (0, 3) =>
          if (outA == 1 && outB == 1 && outC == 1) "t030c" else "t030t"
        case (1, 2) =>
          val z = if (dyad(ab, ba) == 'm') outC else if (dyad(bc, cb) == 'm') outA else outB
          if (z == 2) "t120d" else if (z == 0) "t120u" else "t120c"
        case other => fail(s"impossible dyad profile $other")
      }
      counts(t) += 1
    }
    val cen = GraphOps.directedTriadicCensus(edges).head()
    val names = Seq("t003", "t012", "t102", "t021d", "t021u", "t021c", "t111d",
      "t111u", "t030t", "t030c", "t201", "t120d", "t120u", "t120c", "t210", "t300")
    val got = names.zipWithIndex.map { case (nm, i) =>
      nm -> cen.getLong(i) }.toMap
    names.foreach(nm => assert(got(nm) == counts(nm),
      s"$nm: closed-form ${got(nm)} vs brute-force ${counts(nm)}"))
    assert(got.values.sum == n.toLong * (n - 1) * (n - 2) / 6)
  }

  test("vertex/edge metrics match brute-force decomposition on an LCG graph") {
    val s = spark
    import s.implicits._
    // undirected 40-vertex pseudo-random graph, canonical a<b edges
    val n = 40
    val edges = (for { a <- 0L until n; b <- a + 1 until n
                       if (a * 2654435761L + b * 40503L) % 5 == 0 }
      yield (a, b)).toDF("src", "dst")
    val em = GraphOps.edgeMetrics(edges).head()
    val nTri = GraphOps.triangles(edges).count()
    // brute-force the reference decomposition: per vertex, lc = neighbors
    // ranked above it in (degree, id) order; tt = C(lc,2) is the CANDIDATE
    // wedge count of the order-aware triangle enumeration (≥ triangles)
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    val nb = scala.collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set())
    es.foreach { case (a, b) => nb(a) += b; nb(b) += a }
    val deg = nb.map { case (v, s) => v -> s.size.toLong }
    def above(v: Long, u: Long) = deg(u) > deg(v) || (deg(u) == deg(v) && u > v)
    val per = nb.keys.toSeq.map { v =>
      val lc = nb(v).count(above(v, _)).toLong
      val d = deg(v)
      (lc * (lc - 1) / 2, lc * (lc - 1) / 2 + lc * (d - lc))
    }
    assert(em.getLong(0) == per.map(_._1).sum)
    assert(em.getLong(1) == per.map(_._2).sum)
    assert(em.getLong(2) == per.map(_._1).max)
    assert(em.getLong(3) == per.map(_._2).max)
    assert(em.getLong(0) >= nTri) // wedge candidates bound the triangles
    val vm = GraphOps.vertexMetrics(edges).head()
    assert(vm.getLong(1) == es.length)                // edge_count
    assert(vm.getLong(3) == deg.values.map(d => d * (d - 1) / 2).sum) // triplets
    // global cc consistency: triangle_count = 3 × listing
    val g = GraphOps.globalClusteringCoefficient(edges).head()
    assert(g.getLong(1) == 3 * nTri && g.getLong(0) == vm.getLong(3))
  }

  test("graph generators emit the reference edge sets") {
    val s = spark
    val G = GraphOps.Generators
    assert(G.complete(s, 6).count() == 30)   // 6 vertices x offsets 1..5
    assert(G.cycle(s, 8).count() == 16)      // both directions around the ring
    assert(G.path(s, 7).count() == 12)
    assert(G.star(s, 9).count() == 16)       // 8 leaves x 2 directions
    val hc = G.hypercube(s, 4)
    assert(hc.count() == 64)                 // 16 vertices x 4 dimensions
    assert(hc.filter(expr("bit_count(src ^ dst) != 1")).count() == 0) // one-bit flips only
    val grid = G.grid(s, Seq((3L, false), (4L, true)))
    assert(grid.count() == 40)               // 16 lattice + 24 wrap-dim edges
    val gset = grid.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gset.size == 40 && gset.forall { case (a, b) => gset((b, a)) })
    assert(G.singletonEdge(s, 5).count() == 10)
    assert(G.empty(s).count() == 0)
    // echo(10,3) offsets {4,5,6} are closed under negation mod 10 → symmetric
    val eset = G.echo(s, 10, 3).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(eset.size == 30 && eset.forall { case (a, b) => eset((b, a)) })
  }

  test("ML pipeline: fit/transform chain and JSON round-trip") {
    val s = spark
    import s.implicits._
    // two dims: d=1 constant-ish spread, d=2 wider; values in micro units
    val df = Seq(
      (1L, 1L, 100L), (2L, 1L, 200L), (3L, 1L, 300L), (4L, 1L, 9000L),
      (1L, 2L, -500L), (2L, 2L, 500L), (3L, 2L, 1500L), (4L, 2L, 2500L))
      .toDF("vec_id", "d", "q")
    val model = new graft.ml.Pipeline(Seq(
      graft.ml.ClipTransformer("q", -8000L, 8000L),
      graft.ml.DiagGaussianEstimator("d", "q"))).fit(df)
    // clip caps 9000 -> 8000 BEFORE the fit (estimator sees transformed data)
    val gm = model.stages(1).asInstanceOf[graft.ml.DiagGaussianModel]
    val d1 = gm.stats.find(_._1 == 1L).get
    assert(d1._2 == (100L + 200L + 300L + 8000L) / 4) // mean over clipped values
    val scored = model.transform(df)
      .groupBy($"vec_id").agg(expr("CAST(SUM(contrib) AS BIGINT)").as("ld"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the clipped outlier vector 4 is the least dense
    assert(scored(4L) == scored.values.min)
    // JSON round-trip reproduces the exact scores without refitting
    val reloaded = graft.ml.DiagGaussianModel.fromJsonParams(gm.jsonParams)
    assert(reloaded == gm)
  }

  test("hits separates hubs from authorities on a directed star") {
    val s = spark
    import s.implicits._
    // 1→{2,3,4}: vertex 1 is the only hub, 2/3/4 are pure authorities
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val m = GraphOps.hits(edges, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m(1L) == (1000000L, 0L))
    assert(Seq(2L, 3L, 4L).forall(m(_) == (0L, 1000000L)))
  }

  test("injected-clock debounce flushes at the armed deadline and re-arms on data") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val in = MemoryStream[(Long, Long, Long)]
    val q = StreamOps.procTimeDebounceInjected(
        s, in.toDF().toDF("user_id", "pt", "is_tick"), duration = 2L)
      .writeStream.format("memory").queryName("deb_t").outputMode("update").start()
    in.addData((1L, 0L, 0L), (1L, 0L, 0L)) // clock 0: two rows buffer, deadline 2
    q.processAllAvailable()
    in.addData((1L, 1L, 0L)) // clock 1 < deadline: buffer + re-arm to 3
    q.processAllAvailable()
    in.addData((1L, 4L, 0L)) // clock 4 ≥ 3: timer fires AT 3 with n=3, then re-arms to 6
    q.processAllAvailable()
    in.addData((1L, 100L, 1L)) // tick: fires the pending timer at its deadline 6
    q.processAllAvailable()
    val out = s.table("deb_t").as[(Long, Long, Long)].collect().sortBy(_._2).toSeq
    q.stop()
    assert(out == Seq((1L, 3L, 3L), (1L, 6L, 1L)))
  }

  test("persistent catalog replays CREATE and honors a later DROP") {
    val s = spark
    val wh = StreamOps.scratchRoot + "/catalog_spec"
    val root = java.nio.file.Paths.get(wh)
    if (java.nio.file.Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    val a = new EngineEnv(s, Some(wh))
    a.executeSql(s"""CREATE TABLE spec_pt (o_orderkey BIGINT, o_orderstatus STRING
      ) WITH ('connector'='filesystem', 'path'='$sfDir/orders.parquet', 'format'='parquet')""")
    s.catalog.dropTempView("spec_pt")
    val b = new EngineEnv(s, Some(wh))
    assert(b.sqlQuery("SELECT COUNT(*) AS n FROM spec_pt").head().getLong(0) > 0)
    // a DROP is itself a logged commit: env C must NOT see the table
    b.executeSql("DROP TABLE spec_pt")
    val c = new EngineEnv(s, Some(wh))
    assert(!c.executeSql("SHOW TABLES").collect().map(_.getString(0)).contains("spec_pt"))
    // session properties are NOT persistent (reference: sql-client scoped)
    val d = new EngineEnv(s, Some(wh))
    d.executeSql("SET 'k1' = 'v1'")
    assert(new EngineEnv(s, Some(wh)).executeSql("SET").count() == 0)
    // CREATE FUNCTION persists too: drop the session alias out-of-band,
    // a fresh env's replay must restore it
    d.executeSql("CREATE FUNCTION spec_fn AS 'upper'")
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.dropFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier("spec_fn"))
    val f = new EngineEnv(s, Some(wh))
    assert(f.sqlQuery("SELECT spec_fn('ab') AS x").head().getString(0) == "AB")
  }
}
