package graft

import graft.sources.CdcFormats
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** CDC wire-format semantics: exact row_kind sequences per op (ref
  * DebeziumJsonDeserializationSchema.java:63 deserialize switch), canal's
  * batched `data` arrays with per-element `old` patching, maxwell's
  * pre-image reconstruction, and a parsed CDC stream driving the
  * retractable Top-N — the end-to-end changelog consumer path. */
class CdcSpec extends SparkTestBase {

  private val payload = new StructType().add("k", LongType).add("v", LongType)

  test("debezium u->d->c chain emits the reference row_kind sequence") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, """{"before":{"k":1,"v":10},"after":{"k":1,"v":20},"op":"u"}"""),
      (2L, """{"before":{"k":1,"v":20},"op":"d"}"""),
      (3L, """{"after":{"k":1,"v":30},"op":"c"}"""),
      (4L, """{"after":{"k":2,"v":5},"op":"r"}"""), // snapshot read = insert
      (5L, """{"after":{"k":9,"v":9},"op":"x"}""")  // unknown op: no rows
    ).toDF("seq", "json")
    val out = CdcFormats.debezium(df, "json", payload)
      .orderBy(col("seq"), col("v"))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("-U", 1L, 10L, 1L), ("+U", 1L, 20L, 1L), // u: retract old, insert new
      ("-D", 1L, 20L, 2L),                      // d: retract before-image
      ("+I", 1L, 30L, 3L),                      // c: insert after-image
      ("+I", 2L, 5L, 4L)))                      // r: snapshot insert
  }

  test("canal batches rows in one message; UPDATE patches old fields into the -U pre-image") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, """{"data":[{"k":1,"v":10},{"k":2,"v":20}],"type":"INSERT"}"""),
      // old[i] carries ONLY the changed field (v); k reconstructs from data
      (2L, """{"data":[{"k":1,"v":11},{"k":2,"v":22}],"old":[{"v":10},{"v":20}],"type":"UPDATE"}"""),
      (3L, """{"data":[{"k":1,"v":11}],"type":"DELETE"}""")
    ).toDF("seq", "json")
    val out = CdcFormats.canal(df, "json", payload)
      .orderBy(col("seq"), col("k"), col("v"))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("+I", 1L, 10L, 1L), ("+I", 2L, 20L, 1L),
      ("-U", 1L, 10L, 2L), ("+U", 1L, 11L, 2L),  // pre-image = (k=1 from data, v=10 from old)
      ("-U", 2L, 20L, 2L), ("+U", 2L, 22L, 2L),
      ("-D", 1L, 11L, 3L)))
  }

  test("maxwell reconstructs the -U pre-image from old; delete retracts data") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, """{"data":{"k":1,"v":10},"type":"insert"}"""),
      (2L, """{"data":{"k":1,"v":15},"old":{"v":10},"type":"update"}"""),
      (3L, """{"data":{"k":1,"v":15},"type":"delete"}""")
    ).toDF("seq", "json")
    val out = CdcFormats.maxwell(df, "json", payload)
      .orderBy(col("seq"), col("v"))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("+I", 1L, 10L, 1L),
      ("-U", 1L, 10L, 2L), ("+U", 1L, 15L, 2L),
      ("-D", 1L, 15L, 3L)))
  }

  test("serialize -> parse roundtrips preserve the net changelog state (all three formats)") {
    val s = spark
    import s.implicits._
    // a full lifecycle: insert, update (as -U/+U), delete, re-insert
    val changelog = Seq(
      ("+I", 1L, 10L), ("-U", 1L, 10L), ("+U", 1L, 20L), ("-D", 1L, 20L),
      ("+I", 2L, 7L)).toDF("row_kind", "k", "v")
    def net(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("k"), col("v"))
      .agg(sum(when(col("row_kind").isin("+I", "+U"), 1).otherwise(-1)).as("n"))
      .filter(col("n") =!= 0)
      .as[(Long, Long, Long)].collect().toSet
    val expected = net(changelog)
    assert(expected == Set((2L, 7L, 1L))) // key 1 fully retracted; key 2 live
    // the reference's lossy mappings turn -U/+U into delete+create pairs —
    // the PARSED streams differ row-kind-wise but the NET must match
    assert(net(CdcFormats.debezium(
      CdcFormats.toDebezium(changelog, Seq("k", "v")), "value", payload)) == expected)
    assert(net(CdcFormats.canal(
      CdcFormats.toCanal(changelog, Seq("k", "v")), "value", payload)) == expected)
    assert(net(CdcFormats.maxwell(
      CdcFormats.toMaxwell(changelog, Seq("k", "v")), "value", payload)) == expected)
  }

  test("parsed maxwell CDC stream drives retractable Top-N across batches") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val in = MemoryStream[(Long, String)] // seq, json
    val parsed = CdcFormats.maxwell(in.toDF().toDF("seq", "json"), "json", payload)
      .select(col("row_kind").as("kind"), lit("all").as("pkey"),
        col("k").cast("string").as("id"), col("v").as("value"),
        // retract half-step before the insert of the same message
        (col("seq") * 2 + when(col("row_kind").isin("+I", "+U"), 1).otherwise(0)).as("seq"))
    val q = graft.streaming.RetractableTopN.retractableTopN(s, parsed, 2)
      .writeStream.format("memory").queryName("cdc_topn").outputMode("update").start()
    def last(k: Int) = s.table("cdc_topn").as[(String, Long, Int, String, Long)]
      .collect().toSeq.sortBy(r => (r._2, r._3)).takeRight(k).map(r => (r._3, r._4, r._5))

    in.addData((1L, """{"data":{"k":1,"v":10},"type":"insert"}"""),
               (2L, """{"data":{"k":2,"v":8},"type":"insert"}"""))
    q.processAllAvailable()
    assert(last(2) == Seq((1, "1", 10L), (2, "2", 8L)))
    // an update flips the ranking; a delete drops the old leader
    in.addData((3L, """{"data":{"k":2,"v":20},"old":{"v":8},"type":"update"}"""),
               (4L, """{"data":{"k":1,"v":10},"type":"delete"}"""))
    q.processAllAvailable()
    val fin = last(1)
    q.stop()
    assert(fin == Seq((1, "2", 20L)))
  }

  test("permissive mode counts dropped malformed messages; strict mode throws (ADVICE r4)") {
    val s = spark
    import s.implicits._
    val wire = Seq(
      """{"data":{"k":1,"v":10},"type":"insert"}""",
      """this is not json at all""",
      """{"data":{"k":2,"v":20},"type":"insert"}""",
      """{"data":{"k":3,"v":30},"type":"upsert-nonsense"}""", // unknown op
      """{"data":{"k":4,"v":40},"type":"delete"}""").toDF("json")
    val obs = org.apache.spark.sql.Observation("cdc_malformed_spec")
    val parsed = CdcFormats.maxwell(wire, "json", payload, malformedObs = Some(obs))
    assert(parsed.count() == 3) // 2 inserts + 1 delete survive
    assert(obs.get("malformed") == 2L && obs.get("messages") == 5L)
    // strict = the reference's ignore-parse-errors=false default: fail the
    // job on the first bad message instead of dropping it
    val ex = intercept[Exception] {
      CdcFormats.maxwell(wire, "json", payload, strict = true).count()
    }
    assert(ex.getMessage != null || ex.getCause != null) // job failed, not silent
  }

  test("canal permissive mode counts dropped malformed messages; strict mode throws") {
    val s = spark
    import s.implicits._
    val wire = Seq(
      """{"data":[{"k":1,"v":10}],"type":"INSERT"}""",
      """not json at all""",
      """{"data":[{"k":2,"v":20}],"type":"BOGUS-OP"}""", // unknown op
      """{"data":[{"k":3,"v":30}],"type":"DELETE"}""").toDF("json")
    val obs = org.apache.spark.sql.Observation("cdc_canal_malformed_spec")
    val parsed = CdcFormats.canal(wire, "json", payload, malformedObs = Some(obs))
    assert(parsed.count() == 2) // INSERT + DELETE survive
    assert(obs.get("malformed") == 2L && obs.get("messages") == 4L)
    val ex = intercept[Exception] {
      CdcFormats.canal(wire, "json", payload, strict = true).count()
    }
    assert(ex.getMessage != null || ex.getCause != null)
  }

  test("EngineEnv surfaces the malformed counter and the strict option on CDC tables") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdc_strict").toString
    Seq(
      """{"before":null,"after":{"k":1,"v":5},"op":"c"}""",
      """garbage-line""",
      """{"before":{"k":1,"v":5},"after":null,"op":"d"}""").toDF("value")
      .coalesce(1).write.mode("overwrite").text(dir)
    val e = new graft.sql.EngineEnv(s)
    e.executeSql(s"""
      CREATE TABLE lax (k BIGINT, v BIGINT)
      WITH ('connector'='filesystem', 'path'='$dir', 'format'='debezium-json')""")
    assert(e.sqlQuery("SELECT * FROM lax").count() == 2)
    assert(e.cdcSourceMetrics("lax") == (1L, 3L))
    e.executeSql(s"""
      CREATE TABLE strict_t (k BIGINT, v BIGINT)
      WITH ('connector'='filesystem', 'path'='$dir', 'format'='debezium-json',
            'debezium-json.ignore-parse-errors'='false')""")
    intercept[Exception] { e.sqlQuery("SELECT * FROM strict_t").count() }
  }

  test("ALTER TABLE ADD COLUMNS evolves a CDC table's payload schema") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdc_evolve").toString
    // old-generation messages have no 'w'; new-generation ones do
    Seq(
      """{"before":null,"after":{"k":1,"v":5},"op":"c"}""",
      """{"before":null,"after":{"k":2,"v":6,"w":60},"op":"c"}""").toDF("value")
      .coalesce(1).write.mode("overwrite").text(dir)
    val e = new graft.sql.EngineEnv(s)
    e.executeSql(s"""
      CREATE TABLE evo (k BIGINT, v BIGINT)
      WITH ('connector'='filesystem', 'path'='$dir', 'format'='debezium-json')""")
    assert(e.sqlQuery("SELECT * FROM evo").columns.toSeq == Seq("row_kind", "k", "v"))
    e.executeSql("ALTER TABLE evo ADD COLUMNS (w BIGINT)")
    val rows = e.sqlQuery("SELECT k, w FROM evo ORDER BY k").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    // schema evolution: the added field is NULL for pre-evolution messages
    assert(rows == Seq((1L, -1L), (2L, 60L)))
    // CHANGE COLUMN renames the DECLARED column; wire-format lookup follows
    // the new name, so messages carrying only the OLD field read NULL — the
    // honest rename contract for a wire schema (the reference's JSON
    // deserializer matches by field name the same way)
    e.executeSql("ALTER TABLE evo CHANGE COLUMN w weight BIGINT")
    assert(e.sqlQuery("SELECT * FROM evo").columns.toSeq ==
      Seq("row_kind", "k", "v", "weight"))
    assert(e.sqlQuery("SELECT weight FROM evo").collect().forall(_.isNullAt(0)))
    // a post-rename wire generation writes the new field name and reads back
    Seq("""{"before":null,"after":{"k":3,"v":7,"weight":70},"op":"c"}""").toDF("value")
      .write.mode("append").text(dir)
    e.executeSql("ALTER TABLE evo SET ('format'='debezium-json')") // refresh file listing
    assert(e.sqlQuery("SELECT weight FROM evo WHERE k = 3").collect()(0).getLong(0) == 70L)
  }
}
