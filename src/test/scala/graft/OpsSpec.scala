package graft

import graft.datastream.DataStreamEnv
import graft.operators.{AsyncIO, GraphOps}

/** AsyncIO ordering, side outputs, partitioning facade, graph ops on a
  * known tiny graph. */
class OpsSpec extends SparkTestBase {

  test("mapAsyncOrdered preserves input order with bounded parallelism") {
    val s = spark
    import s.implicits._
    val ds = s.createDataset(1 to 100)
    val out = AsyncIO.mapAsyncOrdered(ds.coalesce(1), parallelism = 8) { i =>
      if (i % 7 == 0) Thread.sleep(5) // jitter: slow items must not reorder
      i * 2
    }.collect().toSeq
    assert(out == (1 to 100).map(_ * 2)) // exact input order preserved
  }

  test("mapAsyncOrdered deadline runs from submission, not dequeue") {
    val s = spark
    import s.implicits._
    // both requests submitted together; head returns fast, second sleeps 500ms.
    // With a 350ms budget FROM SUBMISSION the second must time out even though
    // it completes within 350ms of its dequeue (the old per-dequeue budget).
    val ds = s.createDataset(Seq(1, 2))
    val out = AsyncIO.mapAsyncOrdered(ds.coalesce(1), parallelism = 2,
      timeout = scala.concurrent.duration.Duration("350 ms")) { i =>
      Thread.sleep(if (i == 1) 50 else 500); i
    }
    val e = intercept[org.apache.spark.SparkException](out.collect())
    assert(e.getCause.isInstanceOf[java.util.concurrent.TimeoutException] ||
      e.getMessage.contains("TimeoutException"))
  }

  test("mapAsyncUnordered emits every result; a slow head does not block completions") {
    val s = spark
    import s.implicits._
    val ds = s.createDataset(1 to 50)
    val out = AsyncIO.mapAsyncUnordered(ds.coalesce(1), parallelism = 8) { i =>
      if (i == 1) Thread.sleep(300) // the head is the SLOWEST request
      i * 2
    }.collect()
    assert(out.toSet == (1 to 50).map(_ * 2).toSet && out.length == 50)
    // unordered mode emits on completion: with the head request sleeping
    // 300ms and 7 free slots, something else must have finished first
    assert(out.head != 2, "completion-order emission expected, got strict input order")
  }

  test("shuffle redistributes uniformly across n partitions, content preserved") {
    val s = spark
    import s.implicits._
    val env = new DataStreamEnv(s)
    val st = env.fromElements(1 to 100: _*).shuffle(8)
    assert(st.collect().toSet == (1 to 100).toSet)
    // each INPUT partition round-robins independently from a random start,
    // so per-partition counts can differ by the input-partition count —
    // near-uniform, never hash-skewed
    val sizes = st.ds.rdd.glom().map(_.length).collect()
    assert(sizes.length == 8 && sizes.max - sizes.min <= 8, s"skewed: ${sizes.toSeq}")
  }

  test("sideOutput splits main and side streams") {
    val s = spark
    import s.implicits._
    val env = new DataStreamEnv(s)
    val (main, side) = env.fromElements(1, 2, 3, 4, 5).sideOutput(_ % 2 == 0)
    assert(main.collect().toSet == Set(2, 4) && side.collect().toSet == Set(1, 3, 5))
  }

  test("connect().map/flatMap applies the per-side CoMap functions into one stream") {
    val s = spark
    import s.implicits._
    val env = new DataStreamEnv(s)
    val a = env.fromElements(1, 2, 3)
    val b = env.fromElements("xx", "yyy")
    val m = a.connect(b).map(i => i * 10, str => str.length)
    assert(m.collect().toSet == Set(10, 20, 30, 2, 3))
    val fm = a.connect(b).flatMap(i => Seq(i, -i), str => Seq(str.length))
    assert(fm.collect().toSet == Set(1, -1, 2, -2, 3, -3))  // 2,3 overlap lengths
  }

  test("rolling sum/min/max emit one updated value per record in order-key order") {
    val s = spark
    import s.implicits._
    val env = new DataStreamEnv(s)
    // (key, seq, value) — seq pins the fold order
    val st = env.fromDataset(Seq(("a", 1L, 5L), ("a", 2L, 3L), ("a", 3L, 7L),
                                 ("b", 1L, 2L)).toDS()).keyBy(_._1)
    assert(st.rollingSum(_._3, _._2).collect().sorted ==
      Seq(("a", 5L), ("a", 8L), ("a", 15L), ("b", 2L)).sorted)
    assert(st.rollingMin(_._3, _._2).collect().sorted ==
      Seq(("a", 5L), ("a", 3L), ("a", 3L), ("b", 2L)).sorted)
    assert(st.rollingMax(_._3, _._2).collect().sorted ==
      Seq(("a", 5L), ("a", 5L), ("a", 7L), ("b", 2L)).sorted)
    // rollingReduce carries the whole record (Flink reduce: per-record emission)
    val red = st.rollingReduce(_._2)((a, b) => (b._1, b._2, a._3 + b._3)).collect()
    assert(red.count(_._1 == "a") == 3 && red.contains(("a", ("a", 3L, 15L))))
  }

  test("sliding window assigns each record to size/slide overlapping windows") {
    val s = spark
    import s.implicits._
    val env = new DataStreamEnv(s)
    // size 10, slide 5: ts=7 → windows starting at 5 and 0; ts=12 → 10 and 5
    val out = env.fromDataset(Seq(("k", 7L), ("k", 12L)).toDS())
      .keyByWindowedSliding(_._1, _._2, 10L, 5L)
      .aggregate(0L)((a, _) => a + 1)((k, w, n) => (k, w, n))
      .collect().sorted
    assert(out == Seq(("k", 0L, 1L), ("k", 5L, 2L), ("k", 10L, 1L)))
  }

  test("windowAll groups every record into one epoch-aligned non-keyed window") {
    val s = spark
    import s.implicits._
    val env = new DataStreamEnv(s)
    val out = env.fromDataset(Seq(3L, 7L, 12L).toDS())
      .windowAll(identity, 10L)
      .aggregate(0L)((a, _) => a + 1)((_, w, n) => (w, n))
      .collect().sorted
    assert(out == Seq((0L, 2L), (10L, 1L)))
  }

  test("writeAsText/writeAsCsv round-trip through the filesystem") {
    val s = spark
    import s.implicits._
    val env = new DataStreamEnv(s)
    val dir = java.nio.file.Files.createTempDirectory("dstream_sink").toString
    env.fromElements(1, 22, 333).writeAsText(s"$dir/txt")
    assert(env.readTextFile(s"$dir/txt").collect().map(_.toInt).sorted == Seq(1, 22, 333))
    env.fromDataset(Seq((1, "a"), (2, "b")).toDS()).writeAsCsv(s"$dir/csv")
    val back = s.read.schema("f1 INT, f2 STRING").csv(s"$dir/csv")
    assert(back.count() == 2)
  }

  test("BandJoin: symmetric and negative bands match the naive nested-loop result") {
    val s = spark
    import s.implicits._
    val l = Seq(0L, 10L, 25L, 100L).toDF("lv")
    val r = Seq(-6L, 0L, 4L, 9L, 30L, 94L).toDF("rv")
    def naive(lo: Long, hi: Long): Set[(Long, Long)] =
      (for { a <- Seq(0L, 10L, 25L, 100L); b <- Seq(-6L, 0L, 4L, 9L, 30L, 94L)
             if b >= a + lo && b <= a + hi } yield (a, b)).toSet
    for ((lo, hi) <- Seq((0L, 5L), (-7L, 7L), (-10L, -1L), (3L, 3L))) {
      val got = graft.operators.BandJoin.bandJoin(l, r, "lv", "rv", lo, hi)
        .select("lv", "rv").as[(Long, Long)].collect().toSet
      assert(got == naive(lo, hi), s"band [$lo,$hi]")
    }
  }

  test("TwoPassQuantile: extreme ranks (min, max) and tie plateaus are exact") {
    val s = spark
    import s.implicits._
    // heavy ties: 1..5 each repeated, plus outliers — plateau at p50
    val df = (Seq.fill(40)(7L) ++ (1L to 10L) ++ Seq(1000L, 2000L)).toDF("v")
    val out = graft.operators.TwoPassQuantile.exact(s, df, "v", 2,
      Seq(("min", 1L, 52L), ("p50", 1L, 2L), ("max", 52L, 52L)))
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    val sorted = (Seq.fill(40)(7L) ++ (1L to 10L) ++ Seq(1000L, 2000L)).sorted
    assert(out("min") == sorted.head && out("max") == sorted.last &&
      out("p50") == sorted(26 - 1)) // rank ceil(52/2)=26, 1-based
  }

  test("split/select routes records to every selected tag (1.12 OutputSelector)") {
    val s = spark
    import s.implicits._
    val env = new DataStreamEnv(s)
    // even→"even", odd→"odd", multiples of 3 ALSO→"three" (multi-tag routing)
    val sp = env.fromElements(1, 2, 3, 4, 5, 6).split(n =>
      (if (n % 2 == 0) Seq("even") else Seq("odd")) ++ (if (n % 3 == 0) Seq("three") else Nil))
    assert(sp.select("even").collect().toSet == Set(2, 4, 6))
    assert(sp.select("three").collect().toSet == Set(3, 6))      // 6 reaches both branches
    assert(sp.select("even", "odd").collect().toSet == Set(1, 2, 3, 4, 5, 6))
  }

  test("rebalance/rescale/global control partition counts") {
    val s = spark
    import s.implicits._
    val env = new DataStreamEnv(s)
    val d = env.fromDataset(s.createDataset(1 to 100).repartition(8))
    assert(d.rebalance(4).ds.rdd.getNumPartitions == 4)
    assert(d.rescale(2).ds.rdd.getNumPartitions == 2)
    assert(d.global().ds.rdd.getNumPartitions == 1)
  }

  test("partitionCustom routes rows by the user partitioner") {
    val s = spark
    import s.implicits._
    val env = new DataStreamEnv(s)
    val d = env.fromDataset(s.createDataset(1 to 100)).partitionCustom(4)(i => i % 4)
    assert(d.ds.rdd.getNumPartitions == 4)
    val byPart = d.ds.rdd.mapPartitionsWithIndex((pi, it) => it.map(v => (pi, v))).collect()
    assert(byPart.forall { case (pi, v) => pi == v % 4 }) // user routing honored exactly
  }

  test("iterate runs the body a fixed number of rounds") {
    val s = spark
    import s.implicits._
    val env = new DataStreamEnv(s)
    val out = env.fromElements(1, 2, 3).iterate(3)(d => d.map(_ * 2)).collect().toSet
    assert(out == Set(8, 16, 24)) // ×2 applied 3 times
  }

  test("DataSet facade: mapPartition/distinct/first/sortPartition/zipWithIndex") {
    val s = spark
    import s.implicits._
    val env = new DataStreamEnv(s)
    val d = env.fromDataset(s.createDataset(Seq(3, 1, 2, 3, 1)))
    assert(d.mapPartition(it => it.map(_ * 10)).collect().sorted == Seq(10, 10, 20, 30, 30))
    assert(d.distinct().collect().sorted == Seq(1, 2, 3))
    assert(d.first(2).collect().size == 2)
    // sortPartition orders within partitions without changing their count
    val sp = env.fromDataset(s.createDataset(1 to 40).repartition(4)).sortPartition(i => -i)
    assert(sp.ds.rdd.getNumPartitions == 4)
    assert(sp.ds.rdd.mapPartitions(it => {
      val v = it.toSeq; Iterator(v == v.sortBy((i: Int) => -i))
    }).collect().forall(identity))
    // zipWithIndex: indices are a permutation of 0..n-1, stable per run
    val zi = env.fromDataset(s.createDataset(Seq("a", "b", "c", "d"))).zipWithIndex
    assert(zi.collect().map(_._2).sorted == Seq(0L, 1L, 2L, 3L))
  }

  test("keyed minBy/maxBy pick the extremal row per key") {
    val s = spark
    import s.implicits._
    val env = new DataStreamEnv(s)
    val d = env.fromElements((1, 30L), (1, 10L), (2, 20L), (2, 40L))
    assert(d.keyBy(_._1).minBy(_._2).collect().map(_._2).toSet == Set((1, 10L), (2, 20L)))
    assert(d.keyBy(_._1).maxBy(_._2).collect().map(_._2).toSet == Set((1, 30L), (2, 40L)))
  }

  test("readTextFile yields one row per line") {
    val s = spark
    val f = java.nio.file.Files.createTempFile("graft_text", ".txt")
    java.nio.file.Files.write(f, "alpha\nbeta\ngamma\n".getBytes)
    val env = new DataStreamEnv(s)
    assert(env.readTextFile(f.toString).collect().sorted == Seq("alpha", "beta", "gamma"))
    java.nio.file.Files.delete(f)
  }

  test("sssp delta iteration: chain distances, unreachable vertices absent") {
    val s = spark
    import s.implicits._
    // 1-2-3-4 chain plus disconnected 8-9: distances from 1; 8/9 unreachable
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (8L, 9L)).toDF("src", "dst")
    val out = GraphOps.sssp(edges, 1L).as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("large-star/small-star CC: chain + separate component + isolated self-loop") {
    val s = spark
    import s.implicits._
    // a 12-vertex chain (diameter 11 — label propagation would need 11
    // rounds; star contraction needs ~log n), a triangle, and a self-loop
    val chain = (1L until 12L).map(i => (i, i + 1))
    val edges = (chain ++ Seq((20L, 21L), (21L, 22L), (20L, 22L), (30L, 30L)))
      .toDF("src", "dst")
    val out = graft.operators.GraphOps.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    (1L to 12L).foreach(v => assert(out(v) == 1L, s"vertex $v"))
    Seq(20L, 21L, 22L).foreach(v => assert(out(v) == 20L))
    assert(out(30L) == 30L) // self-loop-only vertex labels itself
    assert(out.size == 16)
  }

  test("triangles finds the one triangle in a 4-vertex graph") {
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val tri = GraphOps.triangles(edges).as[(Long, Long, Long)].collect().toSet
    assert(tri == Set((1L, 2L, 3L)))
    val deg = GraphOps.degrees(edges).as[(Long, Long)].collect().toMap
    assert(deg == Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 1L))
  }

  test("windowed coGroup on the DataStream facade: both buffers per (key, window), empty sides emit") {
    val s = spark
    import s.implicits._
    val env = new graft.datastream.DataStreamEnv(s)
    val clicks = env.fromDataset(s.createDataset(Seq( // (key, id, tsMillis)
      (1L, 100L, 2000L), (1L, 101L, 3000L), (1L, 102L, 13000L))))
    val buys = env.fromDataset(s.createDataset(Seq(
      (1L, 900L, 4000L), (1L, 901L, 22000L))))
    val out = clicks.connect(buys)
      .coGroupWindowed((c: (Long, Long, Long)) => c._1, (b: (Long, Long, Long)) => b._1)(
        _._3, _._3, sizeMillis = 10000L) {
        (k, ws, cs, bs) =>
          Iterator.single((k, ws, cs.map(_._2).toSeq.sorted, bs.map(_._2).toSeq.sorted))
      }
      .collect().toSet
    assert(out == Set(
      (1L, 0L, Seq(100L, 101L), Seq(900L)),  // both sides in window [0, 10s)
      (1L, 10000L, Seq(102L), Seq()),        // right side empty
      (1L, 20000L, Seq(), Seq(901L))))       // left side empty
  }
}
