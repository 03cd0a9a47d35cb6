package graft

import graft.table.{GTable, Slide, Tumble}
import org.apache.spark.sql.functions._

/** Table-API facade contract: pure sugar — identical plans to the
  * DataFrame spelling, Flink method-name parity for set ops / fetch /
  * offset / column ops. */
class TableApiSpec extends SparkTestBase {

  test("groupBy/select lowers to the same plan as groupBy/agg") {
    val ev = Tables.load(spark, sfDir, "events")
    val viaApi = GTable(ev).groupBy(col("event_type"))
      .select(col("event_type"), count(lit(1)).as("n")).toDataFrame
    val direct = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    assert(viaApi.schema.fieldNames.toSeq == Seq("event_type", "n"))
    assert(viaApi.collect().toSet == direct.collect().toSet)
    // same physical shape: one partial+final hash aggregate, no extras
    val p = viaApi.queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(p).size == direct.queryExecution.executedPlan.toString
      .split("HashAggregate").length - 1)
  }

  test("Slide window builder lowers to the sliding window() grouping") {
    val ev = Tables.load(spark, sfDir, "events")
    val out = GTable(ev)
      .window(Slide over "20 minutes" every "10 minutes" on "ts" as "w")
      .groupBy(col("w"))
      .select(col("w.start").as("ws"), count(lit(1)).as("n")).toDataFrame
    val direct = ev.groupBy(window(col("ts"), "20 minutes", "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))
    assert(out.collect().toSet == direct.collect().toSet)
  }

  test("set ops, fetch and offset follow Flink Table semantics") {
    val s = spark
    import s.implicits._
    val a = GTable(Seq(1, 2, 2, 3).toDF("x"))
    val b = GTable(Seq(2, 3, 3, 4).toDF("x"))
    def vals(t: GTable) = t.toDataFrame.as[Int].collect().sorted.toSeq
    assert(vals(a.union(b)) == Seq(1, 2, 3, 4))              // dedups
    assert(vals(a.unionAll(b)) == Seq(1, 2, 2, 2, 3, 3, 3, 4))
    assert(vals(a.minus(b)) == Seq(1))
    assert(vals(a.minusAll(b)) == Seq(1, 2))                 // multiplicity
    assert(vals(a.intersect(b)) == Seq(2, 3))
    assert(vals(a.intersectAll(b)) == Seq(2, 3))
    assert(vals(a.orderBy(col("x")).offset(1).fetch(2)) == Seq(2, 2))
  }

  test("addColumns / renameColumns / dropColumns map to with/rename/drop") {
    val s = spark
    import s.implicits._
    val t = GTable(Seq((1, "a")).toDF("x", "y"))
      .addColumns("z" -> (col("x") * 2))
      .renameColumns("y" -> "label")
      .dropColumns("x")
    assert(t.toDataFrame.schema.fieldNames.toSeq == Seq("label", "z"))
    assert(t.toDataFrame.as[(String, Int)].head() == ("a", 2))
  }

  test("FLIP-29 row-based ops: map/flatMap/aggregate/flatAggregate") {
    val s = spark
    import s.implicits._
    val t = GTable(Seq((1L, "a b"), (1L, "c"), (2L, "d e f")).toDF("k", "txt"))

    val mapped = t.map(struct((col("k") * 10).as("k10"), upper(col("txt")).as("u")))
    assert(mapped.toDataFrame.schema.fieldNames.toSeq == Seq("k10", "u"))
    assert(mapped.toDataFrame.as[(Long, String)].collect().toSet ==
      Set((10L, "A B"), (10L, "C"), (20L, "D E F")))

    val fm = t.flatMap(expr(
      "transform(split(txt, ' '), w -> struct(k AS k, w AS word))"))
    assert(fm.toDataFrame.as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d"), (2L, "e"), (2L, "f")))

    val ag = t.groupBy(col("k"))
      .aggregate(struct(count(lit(1)).as("n"), sum(length(col("txt"))).as("chars")))
    assert(ag.toDataFrame.schema.fieldNames.toSeq == Seq("k", "n", "chars"))
    assert(ag.toDataFrame.as[(Long, Long, Long)].collect().toSet ==
      Set((1L, 2L, 4L), (2L, 1L, 5L)))

    // Top-2 longest txt per key — the reference's Top2 table aggregate
    val top = t.groupBy(col("k")).flatAggregate(
      slice(sort_array(collect_list(struct(length(col("txt")).as("len"))), asc = false), 1, 2))
    assert(top.toDataFrame.schema.fieldNames.toSeq == Seq("k", "len"))
    assert(top.toDataFrame.as[(Long, Int)].collect().toSet ==
      Set((1L, 3), (1L, 1), (2L, 5)))
  }
}
