package graft

import graft.sources.CdcFormats
import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, StringType, StructType}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.util.Random

/** Differential fuzz for the CDC wire formats (VERDICT r13 next-round #3):
  * random envelopes — op c/u/d/r and unknown, before/after/data/old null
  * combinations, canal batched `data`+`old` arrays (short/long/null-element
  * old), schema-include wrappers, DDL CREATE events, malformed payloads —
  * decoded by [[CdcFormats]] and INDEPENDENTLY by a Jackson-based model
  * that transcribes the reference deserializers line by line:
  *
  *  - DebeziumJsonDeserializationSchema.java:142-168 — c/r → +I(after)
  *    (null after NPEs into the parse-error path), u → -U(before)/+U(after)
  *    with REPLICA_IDENTITY error on null before, d → -D(before) likewise;
  *  - CanalJsonDeserializationSchema.java:178-230 — batched data, per-i
  *    old-patching (null old fields = unchanged, copied from data[i]),
  *    DDL "CREATE" SKIPPED (zero rows, never an error), unknown type →
  *    parse-error path; a null/short/null-element `old` NPEs per message;
  *  - MaxwellJsonDeserializationSchema.java:100-135 — single-row data,
  *    update patches `old` over `data`, exactly insert/update/delete.
  *
  * A "parse error" in permissive mode (ignore-parse-errors=true analog)
  * drops the whole message; `strict` throws on the first one. The fuzz
  * checks permissive-mode row equality per message, the malformed/messages
  * Observation accounting, and strict-mode behavior on clean vs dirty
  * corpora. Seeded — failures replay. */
class CdcPropertySpec extends SparkTestBase {

  private val payload = new StructType()
    .add("id", IntegerType).add("name", StringType).add("score", DoubleType)

  // model-side row: (row_kind, id, name, score)
  private type MRow = (String, Option[Int], Option[String], Option[Double])

  private val mapper = new ObjectMapper

  // ---- model helpers ------------------------------------------------

  /** JSON object → payload triple; a missing / json-null field is None.
    * Returns None for a json-null / missing object (the reference's null
    * GenericRowData). */
  private def obj(n: JsonNode): Option[(Option[Int], Option[String], Option[Double])] =
    if (n == null || n.isNull) None
    else Some((
      Option(n.get("id")).filterNot(_.isNull).map(_.asInt),
      Option(n.get("name")).filterNot(_.isNull).map(_.asText),
      Option(n.get("score")).filterNot(_.isNull).map(_.asDouble)))

  /** patch: non-null `over` fields win over `base` (pre-image rebuild). */
  private def patchM(base: (Option[Int], Option[String], Option[Double]),
                     over: (Option[Int], Option[String], Option[Double])) =
    (over._1.orElse(base._1), over._2.orElse(base._2), over._3.orElse(base._3))

  private def row(kind: String, p: (Option[Int], Option[String], Option[Double])): MRow =
    (kind, p._1, p._2, p._3)

  /** None = parse error (message dropped / strict-fails); Some(Nil) = a
    * legitimately skipped message (canal DDL). */
  private def modelDebezium(msg: String, schemaInclude: Boolean): Option[Seq[MRow]] = {
    val root = try mapper.readTree(msg) catch { case _: Exception => return None }
    if (root == null || !root.isObject) return None
    val env = if (schemaInclude) root.get("payload") else root
    if (env == null || env.isNull || !env.isObject) return None
    val op = Option(env.get("op")).filterNot(_.isNull).map(_.asText).getOrElse(return None)
    val before = obj(env.get("before"))
    val after = obj(env.get("after"))
    op match {
      case "c" | "r" => after.map(a => Seq(row("+I", a)))          // null after → NPE
      case "u" => for (b <- before; a <- after)                    // null before → ISE
                  yield Seq(row("-U", b), row("+U", a))
      case "d" => before.map(b => Seq(row("-D", b)))
      case _ => None                                               // unknown op
    }
  }

  private def modelCanal(msg: String): Option[Seq[MRow]] = {
    val root = try mapper.readTree(msg) catch { case _: Exception => return None }
    if (root == null || !root.isObject) return None
    val typ = Option(root.get("type")).filterNot(_.isNull).map(_.asText).getOrElse(return None)
    def arr(name: String): Option[Seq[JsonNode]] =
      Option(root.get(name)).filterNot(_.isNull).filter(_.isArray)
        .map(a => (0 until a.size).map(a.get))
    typ match {
      case "INSERT" =>
        arr("data").map(_.map(d => row("+I", obj(d).getOrElse(return None))))
      case "UPDATE" =>
        val data = arr("data").getOrElse(return None)
        // data=[] never enters the reference loop (CanalJson
        // DeserializationSchema:192), so `old` is never dereferenced:
        // zero rows, success, whatever old holds (ADVICE r14)
        if (data.isEmpty) return Some(Nil)
        val old = arr("old").getOrElse(return None)
        if (old.size < data.size) return None                      // old.getRow(i) OOB
        Some(data.zip(old.take(data.size)).flatMap { case (d, o) =>
          val dv = obj(d).getOrElse(return None)
          val ov = obj(o).getOrElse(return None)                   // null element → NPE
          Seq(row("-U", patchM(dv, ov)), row("+U", dv))
        })
      case "DELETE" =>
        arr("data").map(_.map(d => row("-D", obj(d).getOrElse(return None))))
      case "CREATE" => Some(Nil)                                   // DDL: skip, no error
      case _ => None
    }
  }

  private def modelMaxwell(msg: String): Option[Seq[MRow]] = {
    val root = try mapper.readTree(msg) catch { case _: Exception => return None }
    if (root == null || !root.isObject) return None
    val typ = Option(root.get("type")).filterNot(_.isNull).map(_.asText).getOrElse(return None)
    val data = obj(root.get("data"))
    val old = obj(root.get("old"))
    typ match {
      case "insert" => data.map(d => Seq(row("+I", d)))
      case "update" => for (d <- data; o <- old)
                       yield Seq(row("-U", patchM(d, o)), row("+U", d))
      case "delete" => data.map(d => Seq(row("-D", d)))
      case _ => None                                               // incl. bootstrap-insert
    }
  }

  // ---- envelope generator -------------------------------------------

  private def jPayload(rnd: Random): String = {
    def f(name: String, v: => String): Option[String] = rnd.nextInt(4) match {
      case 0 => None                      // missing
      case 1 => Some(s""""$name":null""") // explicit null
      case _ => Some(s""""$name":$v""")
    }
    val parts = Seq(
      f("id", rnd.nextInt(100).toString),
      f("name", "\"n" + rnd.nextInt(10) + "\""),
      f("score", (rnd.nextInt(40) / 4.0).toString)).flatten
    s"{${parts.mkString(",")}}"
  }

  private def maybeNull(rnd: Random, s: => String): String =
    if (rnd.nextInt(5) == 0) "null" else s

  private def genDebezium(rnd: Random, schemaInclude: Boolean): String = {
    if (rnd.nextInt(12) == 0) return Seq("", "{", "not json", "[1,2]", "42").apply(rnd.nextInt(5))
    val op = Seq("c", "r", "u", "d", "x", "U", "")(rnd.nextInt(7))
    val fields = Seq(
      if (rnd.nextInt(6) == 0) None else Some(s""""before":${maybeNull(rnd, jPayload(rnd))}"""),
      if (rnd.nextInt(6) == 0) None else Some(s""""after":${maybeNull(rnd, jPayload(rnd))}"""),
      if (rnd.nextInt(8) == 0) None else Some(s""""op":"$op""""),
      Some(s""""ts_ms":${1600000000000L + rnd.nextInt(100000)}""")).flatten
    val env = s"{${fields.mkString(",")}}"
    if (schemaInclude) s"""{"schema":{"type":"struct"},"payload":$env}""" else env
  }

  private def genCanal(rnd: Random): String = {
    if (rnd.nextInt(12) == 0) return Seq("", "nope", "[]")(rnd.nextInt(3))
    // weighted: mostly valid DML so the clean side gets real coverage
    val typ = Seq("INSERT", "INSERT", "UPDATE", "UPDATE", "UPDATE", "DELETE",
      "CREATE", "insert", "ALTER", "")(rnd.nextInt(10))
    val n = rnd.nextInt(4) // data batch size 0..3 (0 exercises the
                           // empty-batch UPDATE success path)
    val data = (0 until n).map(_ => jPayload(rnd)).mkString("[", ",", "]")
    // old: null / missing / shorter / equal / longer / with null elements
    val oldLen = rnd.nextInt(6) match {
      case 0 => -1 // json null
      case 1 => -2 // missing
      case 2 => math.max(0, n - 1)
      case 3 => n
      case 4 => n + 1
      case _ => n
    }
    val oldPart = oldLen match {
      case -1 => Some(""""old":null""")
      case -2 => None
      case len =>
        val elems = (0 until len).map(_ =>
          if (rnd.nextInt(5) == 0) "null" else jPayload(rnd))
        Some(s""""old":${elems.mkString("[", ",", "]")}""")
    }
    val fields = Seq(Some(s""""data":${maybeNull(rnd, data)}"""), oldPart,
      Some(s""""type":"$typ""""), Some(s""""ts":${1600000000000L + rnd.nextInt(1000)}""")).flatten
    s"{${fields.mkString(",")}}"
  }

  private def genMaxwell(rnd: Random): String = {
    if (rnd.nextInt(12) == 0) return Seq("", "zzz", "3")(rnd.nextInt(3))
    val typ = Seq("insert", "update", "delete", "bootstrap-insert", "INSERT", "")(rnd.nextInt(6))
    val fields = Seq(
      Some(s""""data":${maybeNull(rnd, jPayload(rnd))}"""),
      if (rnd.nextInt(3) == 0) None else Some(s""""old":${maybeNull(rnd, jPayload(rnd))}"""),
      Some(s""""type":"$typ""""),
      Some(s""""ts":${1600000000L + rnd.nextInt(1000)}""")).flatten
    s"{${fields.mkString(",")}}"
  }

  // ---- comparison ----------------------------------------------------

  private def collectBySeq(out: DataFrame): Map[Long, Seq[MRow]] =
    out.select(col("seq"), col("row_kind"), col("id"), col("name"), col("score"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (seq, rows) =>
        seq -> rows.toSeq.map(r => (
          r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getInt(2)),
          if (r.isNullAt(3)) None else Some(r.getString(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      }

  private def diffCheck(name: String, msgs: Seq[String],
                        model: String => Option[Seq[MRow]],
                        parse: DataFrame => DataFrame): Unit = {
    val s = spark
    import s.implicits._
    val df = msgs.zipWithIndex.map { case (m, i) => (i.toLong, m) }.toDF("seq", "json")
    val got = collectBySeq(parse(df))
    val expected = msgs.zipWithIndex.map { case (m, i) => i.toLong -> model(m) }
    var malformed = 0
    for ((seq, exp) <- expected) exp match {
      case None =>
        malformed += 1
        assert(!got.contains(seq),
          s"$name msg#$seq should be a parse-error drop but emitted ${got.get(seq)}\n  msg=${msgs(seq.toInt)}")
      case Some(rows) =>
        val g = got.getOrElse(seq, Seq.empty)
        assert(g == rows,
          s"$name msg#$seq mismatch\n  msg=${msgs(seq.toInt)}\n  model=$rows\n  graft=$g")
    }
    info(s"$name: ${msgs.size} messages, $malformed parse-error drops, " +
      s"${expected.count(_._2.exists(_.isEmpty))} skips")
    // the generator must actually exercise both sides
    assert(malformed > 5, s"$name generator produced too few malformed cases")
    assert(expected.count(_._2.exists(_.nonEmpty)) > 30,
      s"$name generator produced too few clean cases")
  }

  test("debezium fuzz: 160 random envelopes match the reference model (plain + schema-include)") {
    val rnd = new Random(20260816L)
    val plain = Seq.fill(160)(genDebezium(rnd, schemaInclude = false))
    diffCheck("debezium", plain, m => modelDebezium(m, schemaInclude = false),
      df => CdcFormats.debezium(df, "json", payload))
    val wrapped = Seq.fill(120)(genDebezium(rnd, schemaInclude = true))
    diffCheck("debezium-schema", wrapped, m => modelDebezium(m, schemaInclude = true),
      df => CdcFormats.debezium(df, "json", payload, schemaInclude = true))
  }

  test("canal fuzz: 160 random batched envelopes match the reference model") {
    val rnd = new Random(8431L)
    val msgs = Seq.fill(160)(genCanal(rnd))
    // ensure the interesting fixed points are present regardless of seed
    val pinned = Seq(
      """{"data":null,"type":"INSERT"}""",
      """{"data":[{"id":1}],"old":null,"type":"UPDATE"}""",
      """{"data":[{"id":1},{"id":2}],"old":[{"id":0}],"type":"UPDATE"}""", // short old
      """{"data":[{"id":1}],"old":[{"id":0},{"id":9}],"type":"UPDATE"}""", // long old: extra ignored
      """{"data":[{"id":1}],"old":[null],"type":"UPDATE"}""",              // null old element
      """{"data":null,"old":null,"type":"CREATE"}""",                      // DDL skip
      """{"data":[],"type":"INSERT"}""",                                   // empty batch: 0 rows, clean
      """{"data":[],"old":null,"type":"UPDATE"}""",                        // empty update: old never read
      """{"data":[],"type":"UPDATE"}""",                                   // empty update, old missing
      """{"data":[],"old":[],"type":"DELETE"}""",                          // empty delete
      """{"data":[{"id":7,"name":"x","score":1.5}],"type":"insert"}""")    // wrong case = unknown
    diffCheck("canal", msgs ++ pinned, modelCanal,
      df => CdcFormats.canal(df, "json", payload))
  }

  test("maxwell fuzz: 160 random envelopes match the reference model") {
    val rnd = new Random(977L)
    val msgs = Seq.fill(160)(genMaxwell(rnd))
    val pinned = Seq(
      """{"data":{"id":1},"old":null,"type":"update"}""",         // null old on update: error
      """{"data":null,"type":"insert"}""",                        // null data: error
      """{"data":{"id":1},"type":"bootstrap-insert"}""",          // unknown to the 1.12 reference
      """{"data":{"id":3,"name":"b","score":2.5},"old":{"score":2.0},"type":"update"}""")
    diffCheck("maxwell", msgs ++ pinned, modelMaxwell,
      df => CdcFormats.maxwell(df, "json", payload))
  }

  test("malformed accounting: Observation counts model-None messages exactly") {
    val s = spark
    import s.implicits._
    val rnd = new Random(5150L)
    val msgs = Seq.fill(120)(genCanal(rnd))
    val expectedMalformed = msgs.count(m => modelCanal(m).isEmpty)
    val obs = Observation("cdc_fuzz_obs")
    val df = msgs.zipWithIndex.map { case (m, i) => (i.toLong, m) }.toDF("seq", "json")
    CdcFormats.canal(df, "json", payload, malformedObs = Some(obs)).collect()
    assert(obs.get("malformed") == expectedMalformed.toLong)
    assert(obs.get("messages") == msgs.size.toLong)
    // canal DDL CREATE must NOT count as malformed
    val obs2 = Observation("cdc_fuzz_obs2")
    val ddl = Seq((0L, """{"data":null,"type":"CREATE"}""")).toDF("seq", "json")
    CdcFormats.canal(ddl, "json", payload, malformedObs = Some(obs2)).collect()
    assert(obs2.get("malformed") == 0L)
  }

  test("serialize->parse round-trip fuzz: net changelog state survives all three wire formats") {
    // 60 random well-formed changelogs (consistent +I/-U/+U/-D lifecycles
    // per key) through toDebezium/toCanal/toMaxwell and back: the
    // reference's documented LOSSY mapping (-U/+U becomes delete+create)
    // must still preserve the NET materialized state — the invariant
    // CdcSpec pins once, here across 60 random lifecycles
    val s = spark
    import s.implicits._
    val rnd = new Random(31417L)
    def randomChangelog(): Seq[(String, Long, Long)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
      val live = scala.collection.mutable.Map.empty[Long, Long]
      (0 until 30).foreach { _ =>
        val k = rnd.nextInt(5).toLong
        live.get(k) match {
          case None => val v = rnd.nextInt(100).toLong; out += (("+I", k, v)); live(k) = v
          case Some(v) if rnd.nextBoolean() =>
            val nv = rnd.nextInt(100).toLong
            out += (("-U", k, v)); out += (("+U", k, nv)); live(k) = nv
          case Some(v) => out += (("-D", k, v)); live.remove(k)
        }
      }
      out.toSeq
    }
    // batch the 60 changelogs into ONE DataFrame per format (a JVM-spawn
    // per changelog would take minutes): tag rows by changelog id, group
    // the net-state check by tag
    val logs = (0 until 60).map(i => i -> randomChangelog())
    val allRows = logs.flatMap { case (i, rows) => rows.map(r => (i, r._1, r._2, r._3)) }
      .toDF("tag", "row_kind", "k", "v")
    def netByTag(df: org.apache.spark.sql.DataFrame): Map[Int, Set[(Long, Long)]] = df
      .groupBy(col("tag"), col("k"), col("v"))
      .agg(sum(when(col("row_kind").isin("+I", "+U"), 1).otherwise(-1)).as("n"))
      .filter(col("n") =!= 0)
      .select(col("tag"), col("k"), col("v")).as[(Int, Long, Long)]
      .collect().groupBy(_._1).map { case (t, rs) => t -> rs.map(r => (r._2, r._3)).toSet }
    val expected = logs.map { case (i, rows) =>
      val live = scala.collection.mutable.Map.empty[Long, Long]
      rows.foreach {
        case ("+I", k, v) => live(k) = v
        case ("+U", k, v) => live(k) = v
        case ("-U", k, _) => live.remove(k)
        case ("-D", k, _) => live.remove(k)
        case other => fail(s"bad generated row $other")
      }
      // -U removes then +U re-adds; fold order above handles pairs
      i -> live.toSet
    }.toMap
    def roundtrip(ser: (org.apache.spark.sql.DataFrame, Seq[String]) => org.apache.spark.sql.DataFrame,
                  par: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
      // the tag rides inside the payload so it survives serialization
      val wire = ser(allRows, Seq("tag", "k", "v"))
      val parsed = par(wire)
      val got = netByTag(parsed)
      for ((t, exp) <- expected)
        assert(got.getOrElse(t, Set.empty) == exp, s"changelog #$t net-state mismatch")
    }
    val tagPl = new StructType()
      .add("tag", org.apache.spark.sql.types.IntegerType)
      .add("k", org.apache.spark.sql.types.LongType)
      .add("v", org.apache.spark.sql.types.LongType)
    roundtrip(CdcFormats.toDebezium, df => CdcFormats.debezium(df, "value", tagPl))
    roundtrip(CdcFormats.toCanal, df => CdcFormats.canal(df, "value", tagPl))
    roundtrip(CdcFormats.toMaxwell, df => CdcFormats.maxwell(df, "value", tagPl))
  }

  test("strict mode: throws on the first parse error, passes a clean corpus incl. DDL skips") {
    val s = spark
    import s.implicits._
    val dirty = Seq((0L, """{"data":[{"id":1}],"old":null,"type":"UPDATE"}""")).toDF("seq", "json")
    val e = intercept[Exception] {
      CdcFormats.canal(dirty, "json", payload, strict = true).collect()
    }
    val chain = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("malformed"), chain)
    val clean = Seq(
      (0L, """{"data":[{"id":1,"name":"a","score":0.5}],"type":"INSERT"}"""),
      (1L, """{"data":null,"type":"CREATE"}""")).toDF("seq", "json")
    val rows = CdcFormats.canal(clean, "json", payload, strict = true).collect()
    assert(rows.length == 1 && rows.head.getString(0) == "+I")
  }
}
