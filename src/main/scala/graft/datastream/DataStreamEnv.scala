package graft.datastream

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.KeyValueGroupedDataset

/** Typed DataStream-like facade (SURVEY.md §7 architecture item (d)): the
  * reference's host-language API surface re-expressed over `Dataset[T]`.
  *
  * Reference: DataStream.java (map:666 / filter / flatMap / union:247 /
  * project:849 / keyBy:318), KeyedStream.java (reduce / aggregate /
  * process), StreamExecutionEnvironment.fromElements:1078.
  *
  * Deliberately thin: every method delegates to the Dataset operator that
  * Catalyst optimizes — the wrapper exists so reference programs port
  * 1:1, not to re-implement execution. Works identically for bounded
  * Datasets and streaming Datasets (`readStream`-sourced), mirroring
  * Flink's unified API. */
final class DStream[T](val ds: Dataset[T]) {
  def map[U: Encoder](f: T => U): DStream[U] = new DStream(ds.map(f))
  def filter(f: T => Boolean): DStream[T] = new DStream(ds.filter(f))
  def flatMap[U: Encoder](f: T => IterableOnce[U]): DStream[U] =
    new DStream(ds.flatMap(f(_).iterator))
  def union(other: DStream[T]): DStream[T] = new DStream(ds.union(other.ds))
  def keyBy[K: Encoder](f: T => K): KeyedDStream[K, T] = new KeyedDStream(ds.groupByKey(f))
  /** Keyed tumbling event-time window — ref keyBy().window(Tumbling
    * EventTimeWindows.of(size)); see [[WindowedDStream]]. */
  def keyByWindowed[K](f: T => K, tsMillis: T => Long, sizeMillis: Long): WindowedDStream[K, T] =
    new WindowedDStream(ds, f, tsMillis, sizeMillis)

  /** Keyed SLIDING event-time window — ref KeyedStream.timeWindow(size,
    * slide):683 + SlidingEventTimeWindows.assignWindows (each record lands
    * in ceil(size/slide) overlapping windows); see [[SlidingWindowedDStream]]. */
  def keyByWindowedSliding[K](f: T => K, tsMillis: T => Long, sizeMillis: Long,
                              slideMillis: Long): SlidingWindowedDStream[K, T] =
    new SlidingWindowedDStream(ds, f, tsMillis, sizeMillis, slideMillis)

  /** Non-keyed tumbling window — ref DataStream.timeWindowAll /
    * AllWindowedStream: all records in one window group. The reference
    * runs this at parallelism 1; here it is a single-key groupBy, the
    * same one-task semantics with Spark scheduling the rest of the plan
    * at full parallelism around it. */
  def windowAll(tsMillis: T => Long, sizeMillis: Long): WindowedDStream[Int, T] =
    new WindowedDStream(ds, (_: T) => 0, tsMillis, sizeMillis)

  /** Event-time + watermark declaration — ref DataStream
    * .assignTimestampsAndWatermarks(WatermarkStrategy
    * .forBoundedOutOfOrderness(d)): `tsCol` becomes the event-time
    * attribute and the engine tracks max(ts) − delay as the watermark,
    * exactly Spark's `withWatermark` contract. */
  def assignTimestampsAndWatermarks(tsCol: String, maxOutOfOrderness: String): DStream[T] =
    new DStream(ds.withWatermark(tsCol, maxOutOfOrderness))
  /** Round-robin redistribution — ref DataStream.rebalance:520. */
  def rebalance(n: Int): DStream[T] = new DStream(ds.repartition(n))
  /** Local scale-down without shuffle — ref DataStream.rescale:557. */
  def rescale(n: Int): DStream[T] = new DStream(ds.coalesce(n))
  /** Random redistribution — ref DataStream.shuffle:500 (ShufflePartitioner
    * picks a random channel per record). Spark's round-robin repartition is
    * the engine analog (uniform spread, no key affinity); true per-record
    * randomness would break replay determinism, which the reference accepts
    * but Spark's recomputable-lineage model must not. */
  def shuffle(n: Int): DStream[T] = new DStream(ds.repartition(n))
  /** Everything to one task — ref DataStream.global:575. */
  def global(): DStream[T] = new DStream(ds.coalesce(1))
  /** Custom partitioner — ref DataStream.partitionCustom:388-431
    * (Partitioner.partition(key, numPartitions)): rows land in the
    * partition the user function picks. Spark spelling:
    * `repartitionByRange`-free HASH exchange on the computed partition id
    * via repartition(n, expr) is NOT custom; the faithful mapping drops to
    * the RDD partitioner, preserving the Dataset element type. */
  def partitionCustom(n: Int)(part: T => Int)(implicit enc: Encoder[T]): DStream[T] = {
    val partitioner = new org.apache.spark.Partitioner {
      override def numPartitions: Int = n
      override def getPartition(key: Any): Int = {
        val p = part(key.asInstanceOf[T]) % n
        if (p < 0) p + n else p
      }
    }
    val sess = ds.sparkSession
    implicit val ct: scala.reflect.ClassTag[T] = enc.clsTag
    val rdd = ds.rdd.map(t => (t, ())).partitionBy(partitioner).map(_._1)
    new DStream(sess.createDataset(rdd))
  }

  /** Bounded iteration — ref DataStream.iterate:624-652 / DataSet
    * IterativeDataSet: the body transforms the stream; the driver loops a
    * fixed number of rounds (SURVEY §2.13 Iterations: driver-side loop,
    * lineage cut per round so plans stay analyzable). */
  def iterate(rounds: Int)(body: DStream[T] => DStream[T]): DStream[T] = {
    var cur = this
    (1 to rounds).foreach { _ =>
      cur = body(cur)
      cur = new DStream(cur.ds.localCheckpoint())
    }
    cur
  }

  /** Side output — ref ProcessFunction ctx.output(OutputTag) /
    * OutputTag.java:53; SURVEY §2.2 maps it to a predicate split (two
    * filtered sinks over one upstream). */
  /** Whole-partition transform — ref DataSet.mapPartition (MapPartition
    * Function): the per-partition iterator contract (open-once costs
    * amortize across the partition's rows). */
  def mapPartition[U: Encoder](f: Iterator[T] => Iterator[U]): DStream[U] =
    new DStream(ds.mapPartitions(f))
  /** ref DataSet.distinct — hash re-distribution + per-key dedup. */
  def distinct(): DStream[T] = new DStream(ds.distinct())
  /** ref DataSet.first(n) — no global sort, just a limit. */
  def first(n: Int): DStream[T] = new DStream(ds.limit(n))
  /** ref DataSet.sortPartition — per-partition order WITHOUT a global
    * shuffle (Spark sortWithinPartitions). */
  def sortPartition[K](f: T => K)(implicit ord: Ordering[K], ke: Encoder[K],
                                  enc: Encoder[T]): DStream[T] = {
    implicit val ct: scala.reflect.ClassTag[T] = enc.clsTag
    val sess = ds.sparkSession
    new DStream(sess.createDataset(
      ds.rdd.mapPartitions(it => it.toIndexedSeq.sortBy(f).iterator, preservesPartitioning = true)))
  }
  /** ref DataSetUtils.zipWithIndex — stable global indices in two passes
    * (count per partition, then offset), no single-task bottleneck. */
  def zipWithIndex(implicit enc: Encoder[T]): DStream[(T, Long)] = {
    implicit val ct: scala.reflect.ClassTag[T] = enc.clsTag
    val sess = ds.sparkSession
    implicit val tupEnc: Encoder[(T, Long)] =
      org.apache.spark.sql.Encoders.tuple(enc, org.apache.spark.sql.Encoders.scalaLong)
    new DStream(sess.createDataset(ds.rdd.zipWithIndex()))
  }

  def sideOutput(isMain: T => Boolean): (DStream[T], DStream[T]) =
    (filter(isMain), filter((t: T) => !isMain(t)))

  /** Flink 1.12 `DataStream.split(OutputSelector)` / `SplitStream.select`
    * (deprecated there in favor of side outputs, but still on the 1.12
    * surface — ref DataStream.java split / SplitStream.java). A record
    * routes to EVERY tag its selector names; `select` re-evaluates the
    * selector per branch, exactly like the reference's `OutputSelector`
    * re-run on each downstream edge — each branch is an independent
    * filtered view of the same plan, no materialization. */
  def split(selector: T => Seq[String]): SplitDStream[T] = new SplitDStream(this, selector)
  /** Connect with a second stream of a different type — ref
    * ConnectedStreams / CoProcessFunction (CoBroadcastWithKeyedOperator
    * .java:64 family): both inputs keyed to the same key space, processed
    * together per key. Implemented as a keyed cogroup over an Either-tagged
    * union — one co-partitioned shuffle, same layout as the reference's
    * two-input operator. */
  def connect[T2](other: DStream[T2]): ConnectedDStream[T, T2] = new ConnectedDStream(this, other)

  /** Flink `DataStream.executeAndCollect` analog (bounded only). */
  def collect(): Seq[T] = ds.collect().toSeq

  /** ref DataStream.writeAsText:1037 / DataSet.writeAsText — one line per
    * record, the record's toString, exactly the reference's
    * TextOutputFormat contract (parallel part files under `path`). */
  def writeAsText(path: String): Unit =
    ds.map(_.toString)(org.apache.spark.sql.Encoders.STRING)
      .write.mode("overwrite").text(path)

  /** ref DataStream.writeAsCsv:1064 — tuple/case-class fields as CSV
    * columns (CsvOutputFormat: no header, comma delimiter). */
  def writeAsCsv(path: String): Unit =
    ds.toDF().write.mode("overwrite").option("header", "false").csv(path)
}

/** Ref SplitStream.java: `select("a")`, `select("a", "b")` — union of tags. */
final class SplitDStream[T](up: DStream[T], selector: T => Seq[String]) {
  def select(tags: String*): DStream[T] = {
    val want = tags.toSet
    val sel = selector // local copy — the closure must not capture `this` (holds the Dataset)
    up.filter((t: T) => sel(t).exists(want))
  }
}

final class ConnectedDStream[T1, T2](s1: DStream[T1], s2: DStream[T2]) {

  /** Non-keyed CoMapFunction — ref ConnectedStreams.map(CoMapFunction):
    * map1 over stream 1, map2 over stream 2, one output stream. Without
    * shared keyed state the reference operator is exactly a per-side map
    * into a union, which is how it lowers here (no shuffle at all). */
  def map[U: Encoder](f1: T1 => U, f2: T2 => U): DStream[U] =
    s1.map(f1).union(s2.map(f2))

  /** Non-keyed CoFlatMapFunction — ref ConnectedStreams.flatMap. */
  def flatMap[U: Encoder](f1: T1 => IterableOnce[U], f2: T2 => IterableOnce[U]): DStream[U] =
    s1.flatMap(f1).union(s2.flatMap(f2))

  /** Keyed two-input process — ref KeyedCoProcessFunction. */
  def keyedProcess[K: Encoder, U: Encoder](k1: T1 => K, k2: T2 => K)(
      f: (K, Iterator[T1], Iterator[T2]) => IterableOnce[U]): DStream[U] = {
    val g1 = s1.ds.groupByKey(k1)
    val g2 = s2.ds.groupByKey(k2)
    new DStream(g1.cogroup(g2)((k: K, it1: Iterator[T1], it2: Iterator[T2]) => f(k, it1, it2).iterator))
  }

  /** WINDOWED coGroup — ref CoGroupedStreams.java:134, the
    * `a.coGroup(b).where(k1).equalTo(k2).window(Tumbling…).apply(fn)`
    * chain: both sides bucket into epoch-aligned tumbling windows and the
    * CoGroupFunction receives BOTH buffers per (key, window) — including
    * windows where one side is empty, which the window JOIN cannot
    * express. One shuffle per side on (key, window); the SQL-layer
    * equivalent is [[graft.streaming.StreamOps.windowCoGroup]]. */
  def coGroupWindowed[K, U: Encoder](k1: T1 => K, k2: T2 => K)(
      ts1: T1 => Long, ts2: T2 => Long, sizeMillis: Long)(
      f: (K, Long, Iterator[T1], Iterator[T2]) => IterableOnce[U])(
      implicit ke: Encoder[(K, Long)]): DStream[U] = {
    def align(ts: Long): Long = ts - math.floorMod(ts, sizeMillis)
    val g1 = s1.ds.groupByKey(t => (k1(t), align(ts1(t))))
    val g2 = s2.ds.groupByKey(t => (k2(t), align(ts2(t))))
    new DStream(g1.cogroup(g2)((kw: (K, Long), it1: Iterator[T1], it2: Iterator[T2]) =>
      f(kw._1, kw._2, it1, it2).iterator))
  }
}

final class KeyedDStream[K, T](val kv: KeyValueGroupedDataset[K, T]) {

  /** Rolling per-record reduce — ref KeyedStream.reduce:743: every arriving
    * record emits the UPDATED running aggregate for its key (not one final
    * row). The reference's implicit arrival order is made explicit — and
    * replay-deterministic, which Spark's recomputable-lineage model
    * requires — via `order`: records fold in ascending extracted-order-key
    * order. Emission count = input count, exactly the reference contract. */
  def rollingReduce[O](order: T => O)(f: (T, T) => T)(
      implicit ord: Ordering[O], e: Encoder[(K, T)]): DStream[(K, T)] =
    new DStream(kv.flatMapGroups { (k: K, it: Iterator[T]) =>
      it.toIndexedSeq.sortBy(order).scanLeft(Option.empty[T]) {
        case (None, t)    => Some(t)
        case (Some(a), t) => Some(f(a, t))
      }.flatten.map((k, _)).iterator
    })

  /** Rolling sum — ref KeyedStream.sum:767 (SumAggregator): per record,
    * the running sum of the extracted field so far for its key. */
  def rollingSum[O](value: T => Long, order: T => O)(
      implicit ord: Ordering[O], e: Encoder[(K, Long)]): DStream[(K, Long)] =
    new DStream(kv.flatMapGroups { (k: K, it: Iterator[T]) =>
      it.toIndexedSeq.sortBy(order).scanLeft(0L)((a, t) => a + value(t))
        .drop(1).map((k, _)).iterator
    })

  /** Rolling min — ref KeyedStream.min:794 (ComparableAggregator). */
  def rollingMin[O](value: T => Long, order: T => O)(
      implicit ord: Ordering[O], e: Encoder[(K, Long)]): DStream[(K, Long)] =
    new DStream(kv.flatMapGroups { (k: K, it: Iterator[T]) =>
      val vs = it.toIndexedSeq.sortBy(order).map(value)
      vs.scanLeft(Long.MaxValue)(math.min).drop(1).map((k, _)).iterator
    })

  /** Rolling max — ref KeyedStream.max:835. */
  def rollingMax[O](value: T => Long, order: T => O)(
      implicit ord: Ordering[O], e: Encoder[(K, Long)]): DStream[(K, Long)] =
    new DStream(kv.flatMapGroups { (k: K, it: Iterator[T]) =>
      val vs = it.toIndexedSeq.sortBy(order).map(value)
      vs.scanLeft(Long.MinValue)(math.max).drop(1).map((k, _)).iterator
    })

  /** Rolling reduce — ref KeyedStream.reduce (bounded: one result per key). */
  /** ref DataSet.minBy / KeyedStream.minBy — the row with the smallest
    * extracted value per key (ties: first in reduce order). */
  def minBy[V](f: T => V)(implicit ord: Ordering[V], e: Encoder[(K, T)]): DStream[(K, T)] =
    reduce((a, b) => if (ord.lteq(f(a), f(b))) a else b)
  /** ref DataSet.maxBy / KeyedStream.maxBy. */
  def maxBy[V](f: T => V)(implicit ord: Ordering[V], e: Encoder[(K, T)]): DStream[(K, T)] =
    reduce((a, b) => if (ord.gteq(f(a), f(b))) a else b)

  def reduce(f: (T, T) => T)(implicit e: Encoder[(K, T)]): DStream[(K, T)] =
    new DStream(kv.reduceGroups(f))
  def mapGroups[U: Encoder](f: (K, Iterator[T]) => U): DStream[U] = new DStream(kv.mapGroups(f))
  /** Flink `KeyedProcessFunction` analog (per-key imperative logic). */
  def process[U: Encoder](f: (K, Iterator[T]) => IterableOnce[U]): DStream[U] =
    new DStream(kv.flatMapGroups((k: K, it: Iterator[T]) => f(k, it).iterator))
}

/** `keyBy().window(TumblingEventTimeWindows.of(size)).aggregate(agg)` — ref
  * WindowedStream.aggregate:283 + TumblingEventTimeWindows. Epoch-aligned
  * bucketing like the reference's assigner; the fold is incremental (no
  * per-window materialization). Obtained via [[DStream.keyByWindowed]]. */
final class WindowedDStream[K, T](ds: org.apache.spark.sql.Dataset[T], keyF: T => K,
                                  tsMillis: T => Long, sizeMillis: Long) {
  def aggregate[A: Encoder, U: Encoder](zero: A)(fold: (A, T) => A)(
      finish: (K, Long, A) => U)(implicit ke: Encoder[(K, Long)]): DStream[U] = {
    // capture fields as locals: the closure must not drag `this` (not
    // serializable) to the executors
    val (kf, tsf, size) = (keyF, tsMillis, sizeMillis)
    val grouped = ds.groupByKey(t => (kf(t), tsf(t) - math.floorMod(tsf(t), size)))
    new DStream(grouped.mapGroups((kw: (K, Long), it: Iterator[T]) =>
      finish(kw._1, kw._2, it.foldLeft(zero)(fold))))
  }
}

/** `keyBy().timeWindow(size, slide)` — ref KeyedStream.timeWindow:683 +
  * SlidingEventTimeWindows.assignWindows: a record with timestamp ts
  * belongs to every window [s, s+size) with s ≡ 0 (mod slide) and
  * s ∈ (ts−size, ts] — ceil(size/slide) windows. The expansion is an
  * explicit flatMap (the reference does the same inside the window
  * assigner), then one shuffle on (key, windowStart); the incremental
  * fold keeps no per-window buffers. */
final class SlidingWindowedDStream[K, T](ds: org.apache.spark.sql.Dataset[T], keyF: T => K,
                                         tsMillis: T => Long, sizeMillis: Long, slideMillis: Long) {
  def aggregate[A: Encoder, U: Encoder](zero: A)(fold: (A, T) => A)(
      finish: (K, Long, A) => U)(implicit ke: Encoder[(K, Long)],
                                 enc: Encoder[T]): DStream[U] = {
    val (kf, tsf, size, slide) = (keyF, tsMillis, sizeMillis, slideMillis)
    implicit val pairEnc: Encoder[((K, Long), T)] =
      org.apache.spark.sql.Encoders.tuple(ke, enc)
    val expanded = ds.flatMap { t =>
      val ts = tsf(t)
      val lastStart = ts - math.floorMod(ts, slide)
      Iterator.iterate(lastStart)(_ - slide).takeWhile(_ > ts - size)
        .map(s => ((kf(t), s), t))
    }
    new DStream(expanded.groupByKey(_._1).mapGroups((kw: (K, Long), it: Iterator[((K, Long), T)]) =>
      finish(kw._1, kw._2, it.foldLeft(zero)((a, p) => fold(a, p._2)))))
  }
}

/** StreamExecutionEnvironment analog. */
final class DataStreamEnv(val spark: SparkSession) {
  /** ref StreamExecutionEnvironment.fromElements:1078 */
  def fromElements[T: Encoder](elems: T*): DStream[T] =
    new DStream(spark.createDataset(elems))
  def fromDataset[T](ds: Dataset[T]): DStream[T] = new DStream(ds)

  /** ref ExecutionEnvironment.readTextFile / StreamExecutionEnvironment
    * .readTextFile — one row per line. */
  def readTextFile(path: String): DStream[String] = {
    import spark.implicits._
    new DStream(spark.read.textFile(path))
  }

  /** Line-oriented debug socket source — ref
    * StreamExecutionEnvironment.socketTextStream:989 (SocketTextStreamFunction).
    * Spark's built-in socket source IS this operator: it connects as a
    * client to host:port and emits each received line as a row. Unbounded
    * and at-most-once, exactly like the reference's debug-only contract —
    * not for production (use the file/Kafka sources there). */
  def socketTextStream(host: String, port: Int): DStream[String] = {
    import spark.implicits._
    new DStream(
      spark.readStream.format("socket")
        .option("host", host).option("port", port)
        .load().as[String])
  }
}
