package graft

import graft.sql.{EngineEnv, MatchRecognize}
import org.apache.spark.sql.functions._

/** MATCH_RECOGNIZE parser + semantics on hand-built sequences. */
class MatchRecognizeSpec extends SparkTestBase {

  private def mkEvents(rows: Seq[(Long, Long, String, Long)]): Unit = {
    val s = spark
    import s.implicits._
    rows.toDF("user_id", "event_id", "event_type", "sec")
      .withColumn("ts", expr("timestamp_micros(sec * 1000000)")).drop("sec")
      .createOrReplaceTempView("mr_events")
  }

  test("parser extracts partition/order/measures/pattern/within/define") {
    val spec = MatchRecognize.parse("""
      SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY ts
        MEASURES A.x AS ax, FIRST(B.y) AS fy
        PATTERN (A B{2,4} C)
        WITHIN INTERVAL '30' MINUTE
        DEFINE A AS A.t = 'x', B AS B.v > 5, C AS C.t <> 'z')""")
    assert(spec.partitionBy == Seq("k") && spec.orderBy == "ts")
    assert(spec.flatVars.map(p => (p.name, p.min, p.max)) == Seq(("A", 1, 1), ("B", 2, 4), ("C", 1, 1)))
    assert(spec.withinMicros == 30L * 60 * 1000000)
    assert(spec.defines("B").head.op == ">" && spec.defines("B").head.value == "5")
    assert(spec.measures.map(_.as) == Seq("ax", "fy"))
  }

  test("parser: reluctant quantifiers and group tokens") {
    val spec = MatchRecognize.parse("""
      SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY ts
        MEASURES A.x AS ax
        PATTERN (A B+? (C D){1,3}? E??)
        DEFINE A AS A.t = 'x')""")
    import MatchRecognize.{PatGroup, PatVar}
    assert(spec.pattern == Seq(
      PatVar("A", 1, 1), PatVar("B", 1, Int.MaxValue, greedy = false),
      PatGroup(Seq(PatVar("C", 1, 1), PatVar("D", 1, 1)), 1, 3, greedy = false),
      PatVar("E", 0, 1, greedy = false)))
  }

  test("parser: arbitrarily nested groups ((A B)+ C){2}") {
    val spec = MatchRecognize.parse("""
      SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY ts
        MEASURES A.x AS ax
        PATTERN (((A B)+ C){2})
        DEFINE A AS A.t = 'x')""")
    import MatchRecognize.{PatGroup, PatVar}
    assert(spec.pattern == Seq(PatGroup(Seq(
      PatGroup(Seq(PatVar("A", 1, 1), PatVar("B", 1, 1)), 1, Int.MaxValue),
      PatVar("C", 1, 1)), 2, 2)))
    assert(spec.flatVars.map(_.name) == Seq("A", "B", "C"))
  }

  test("nested groups: outer iterations may differ in inner (A B)+ counts") {
    // a b a b c a b c — one match: outer iteration 1 has TWO (a b) pairs,
    // iteration 2 has ONE; no flat unique-variable pattern expresses this
    mkEvents(Seq(
      (1L, 1L, "a", 10L), (1L, 2L, "b", 20L), (1L, 3L, "a", 30L), (1L, 4L, "b", 40L),
      (1L, 5L, "c", 50L), (1L, 6L, "a", 60L), (1L, 7L, "b", 70L), (1L, 8L, "c", 80L),
      // incomplete second block: must NOT match
      (1L, 9L, "a", 90L), (1L, 10L, "b", 100L), (1L, 11L, "c", 110L)))
    val out = new EngineEnv(spark).sqlQuery("""
      SELECT * FROM mr_events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY ts
        MEASURES FIRST(A.event_id) AS a_id, LAST(C.event_id) AS c_id
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (((A B)+ C){2})
        DEFINE A AS A.event_type = 'a',
               B AS B.event_type = 'b',
               C AS C.event_type = 'c'
      )""").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 8L)))
  }

  test("greedy B* runs to the LAST purchase; reluctant B*? stops at the FIRST") {
    val s = spark
    import s.implicits._
    // click, then two purchases: greedy consumes past the first purchase
    mkEvents(Seq(
      (1L, 1L, "click", 0L), (1L, 2L, "view", 10L), (1L, 3L, "purchase", 20L),
      (1L, 4L, "view", 30L), (1L, 5L, "purchase", 40L)))
    def run(q: String) = new EngineEnv(s).sqlQuery(s"""
      SELECT * FROM mr_events MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        MEASURES A.event_id AS a_id, C.event_id AS c_id
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A B$q C)
        DEFINE A AS A.event_type = 'click', C AS C.event_type = 'purchase')""")
      .as[(Long, Long, Long)].collect().toSet
    assert(run("*") == Set((1L, 1L, 5L)))  // greedy: last purchase
    assert(run("*?") == Set((1L, 1L, 3L))) // reluctant: first purchase
  }

  test("group pattern (A B)+ is quantified as a unit with per-member variables") {
    val s = spark
    import s.implicits._
    // lo hi lo hi lo  → (A B)+ anchored at row 1 consumes two full pairs;
    // the trailing lo cannot complete a third pair
    mkEvents(Seq(
      (1L, 1L, "lo", 0L), (1L, 2L, "hi", 10L), (1L, 3L, "lo", 20L),
      (1L, 4L, "hi", 30L), (1L, 5L, "lo", 40L)))
    val out = new EngineEnv(s).sqlQuery("""
      SELECT * FROM mr_events MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        MEASURES FIRST(A.event_id) AS a_first, LAST(A.event_id) AS a_last,
                 LAST(B.event_id) AS b_last, MATCH_NUMBER() AS mn
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN ((A B)+)
        DEFINE A AS A.event_type = 'lo', B AS B.event_type = 'hi')""")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // one greedy match: pairs (1,2)(3,4); rows consumed through event 4
    assert(out == Set((1L, 1L, 3L, 4L, 1L)))
  }

  test("group quantifier {n} repeats the sub-sequence exactly n times") {
    val s = spark
    import s.implicits._
    mkEvents(Seq(
      (1L, 1L, "lo", 0L), (1L, 2L, "hi", 10L), (1L, 3L, "lo", 20L),
      (1L, 4L, "hi", 30L), (1L, 5L, "lo", 40L), (1L, 6L, "hi", 50L)))
    val out = new EngineEnv(s).sqlQuery("""
      SELECT * FROM mr_events MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        MEASURES FIRST(A.event_id) AS a_first, LAST(B.event_id) AS b_last
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN ((A B){2})
        DEFINE A AS A.event_type = 'lo', B AS B.event_type = 'hi')""")
      .as[(Long, Long, Long)].collect().toSet
    // exactly two pairs per match → matches (1..4); (5,6) alone can't form {2}
    assert(out == Set((1L, 1L, 4L)))
  }

  test("A B+ C with FIRST/LAST measures over a known sequence") {
    val s = spark
    import s.implicits._
    mkEvents(Seq(
      (1L, 1L, "click", 0L), (1L, 2L, "view", 10L), (1L, 3L, "view", 20L), (1L, 4L, "purchase", 30L),
      (2L, 5L, "click", 0L), (2L, 6L, "purchase", 10L))) // no views → no match for user 2
    val out = new EngineEnv(s).sqlQuery("""
      SELECT * FROM mr_events MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        MEASURES A.event_id AS a_id, FIRST(B.event_id) AS b_first,
                 LAST(B.event_id) AS b_last, C.event_id AS c_id
        PATTERN (A B+ C)
        DEFINE A AS A.event_type = 'click', B AS B.event_type = 'view',
               C AS C.event_type = 'purchase')""")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 1L, 2L, 3L, 4L)))
  }

  test("relaxed contiguity via an undefined skip variable (A S* B)") {
    val s = spark
    import s.implicits._
    mkEvents(Seq(
      (1L, 1L, "click", 0L), (1L, 2L, "error", 5L), (1L, 3L, "view", 8L), (1L, 4L, "purchase", 10L)))
    // S is undefined → matches any row: A S* B == Flink followedBy semantics
    val out = new EngineEnv(s).sqlQuery("""
      SELECT * FROM mr_events MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        MEASURES A.event_id AS a_id, B.event_id AS b_id
        PATTERN (A S* B)
        DEFINE A AS A.event_type = 'click', B AS B.event_type = 'purchase')""")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 1L, 4L)))
  }

  test("AFTER MATCH SKIP PAST LAST ROW forbids overlapping matches") {
    val s = spark
    import s.implicits._
    // a,a,a: pattern (A A) overlapping → 2 matches with TO NEXT ROW, 1 with PAST LAST ROW
    mkEvents(Seq((1L, 1L, "a", 0L), (1L, 2L, "a", 1L), (1L, 3L, "a", 2L)))
    def q(skip: String) = s"""
      SELECT * FROM mr_events MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        MEASURES FIRST(A.event_id) AS first_id, LAST(A.event_id) AS last_id
        PATTERN (A{2,2}) $skip
        DEFINE A AS A.event_type = 'a')"""
    val env = new EngineEnv(s)
    assert(env.sqlQuery(q("AFTER MATCH SKIP TO NEXT ROW")).count() == 2)
    val past = env.sqlQuery(q("AFTER MATCH SKIP PAST LAST ROW"))
      .as[(Long, Long, Long)].collect().toSet
    assert(past == Set((1L, 1L, 2L)))
  }

  test("cross-variable DEFINE: rising-value pair (B.value > A.value)") {
    val s = spark
    import s.implicits._
    Seq((1L, 1L, 5.0, 0L), (1L, 2L, 9.0, 10L), (1L, 3L, 4.0, 20L), (1L, 4L, 8.0, 30L))
      .toDF("user_id", "event_id", "value", "sec")
      .withColumn("ts", expr("timestamp_micros(sec * 1000000)")).drop("sec")
      .createOrReplaceTempView("mr_vals")
    val out = new EngineEnv(s).sqlQuery("""
      SELECT * FROM mr_vals MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        MEASURES A.event_id AS a_id, B.event_id AS b_id
        PATTERN (A B)
        DEFINE A AS A.value > 0, B AS B.value > A.value)""")
      .as[(Long, Long, Long)].collect().toSet
    // adjacent rising pairs only: (1→2: 9>5) and (3→4: 8>4); (2→3: 4>9 fails)
    assert(out == Set((1L, 1L, 2L), (1L, 3L, 4L)))
  }

  test("PREV physical navigation in DEFINE and LAST offset in MEASURES") {
    val s = spark
    import s.implicits._
    // values 5,6,9,3,7,8,9: rising triples anchored at 5 (5<6<9) and 3 (3<7<8) and 7 (7<8<9)
    Seq((1L, 1L, 5.0, 0L), (1L, 2L, 6.0, 10L), (1L, 3L, 9.0, 20L), (1L, 4L, 3.0, 30L),
        (1L, 5L, 7.0, 40L), (1L, 6L, 8.0, 50L), (1L, 7L, 9.0, 60L))
      .toDF("user_id", "event_id", "value", "sec")
      .withColumn("ts", expr("timestamp_micros(sec * 1000000)")).drop("sec")
      .createOrReplaceTempView("mr_prev")
    val out = new EngineEnv(s).sqlQuery("""
      SELECT * FROM mr_prev MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        MEASURES S.event_id AS s_id, LAST(U.event_id, 1) AS u_first, LAST(U.event_id) AS u_last
        PATTERN (S U{2})
        DEFINE U AS U.value > PREV(U.value))""")
      .as[(Long, Long, Long, Long)].collect().toSet
    // LAST(U, 1) with two U's = the first U (offset 1 back from the last)
    assert(out == Set((1L, 1L, 2L, 3L), (1L, 4L, 5L, 6L), (1L, 5L, 6L, 7L)))
    // PREV with explicit offset 2 compares across two rows
    val o2 = new EngineEnv(s).sqlQuery("""
      SELECT * FROM mr_prev MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        MEASURES S.event_id AS s_id, LAST(U.event_id) AS u_id
        PATTERN (S X U)
        DEFINE U AS U.value > PREV(U.value, 2))""")
      .as[(Long, Long, Long)].collect().toSet
    // U.value > value two rows back (the S row): 9>5@1, 7>9✗@2... anchors 1(9>5), 3(7>9✗)→
    // triples (s,x,u): (1,2,3):9>5✓ (2,3,4):3>6✗ (3,4,5):7>9✗ (4,5,6):8>3✓ (5,6,7):9>7✓
    assert(o2 == Set((1L, 1L, 3L), (1L, 4L, 6L), (1L, 5L, 7L)))
  }

  test("FINAL vs RUNNING measures under ALL ROWS PER MATCH") {
    val s = spark
    import s.implicits._
    mkEvents(Seq((1L, 1L, "click", 0L), (1L, 2L, "view", 10L), (1L, 3L, "view", 20L)))
    val out = new EngineEnv(s).sqlQuery("""
      SELECT * FROM mr_events MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        MEASURES CLASSIFIER() AS cls, RUNNING LAST(B.event_id) AS run_b,
                 FINAL LAST(B.event_id) AS fin_b
        ALL ROWS PER MATCH
        PATTERN (A B+)
        DEFINE A AS A.event_type = 'click', B AS B.event_type = 'view')""")
      .select(col("cls"), col("run_b"), col("fin_b"))
      .as[(String, Option[Long], Long)].collect().toSeq
    // running last-B is NULL on the A row, then tracks; final is 3 on every row
    assert(out == Seq(("A", None, 3L), ("B", Some(2L), 3L), ("B", Some(3L), 3L)))
  }

  test("SKIP TO LAST resumes at the last row of the variable; TO FIRST of the start errors") {
    val s = spark
    import s.implicits._
    // 5 'a' rows, pattern (A B{2}): TO NEXT ROW -> starts 0,1,2; TO LAST B -> starts 0,2
    mkEvents((1L to 5L).map(i => (1L, i, "a", i * 10L)))
    def q(skip: String) = s"""
      SELECT * FROM mr_events MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        MEASURES A.event_id AS a_id, LAST(B.event_id) AS b_id
        $skip
        PATTERN (A B{2}))"""
    val env = new EngineEnv(s)
    assert(env.sqlQuery(q("AFTER MATCH SKIP TO NEXT ROW")).count() == 3)
    val toLast = env.sqlQuery(q("AFTER MATCH SKIP TO LAST B")).as[(Long, Long, Long)].collect().toSet
    assert(toLast == Set((1L, 1L, 3L), (1L, 3L, 5L)))
    val e = intercept[Exception](env.sqlQuery(q("AFTER MATCH SKIP TO FIRST A")).collect())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("infinite loop")))
  }

  test("ALL ROWS PER MATCH with RUNNING measures, CLASSIFIER and MATCH_NUMBER") {
    val s = spark
    import s.implicits._
    mkEvents(Seq(
      (1L, 1L, "click", 0L), (1L, 2L, "view", 10L), (1L, 3L, "view", 20L), (1L, 4L, "purchase", 30L)))
    val out = new EngineEnv(s).sqlQuery("""
      SELECT * FROM mr_events MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        MEASURES MATCH_NUMBER() AS mn, CLASSIFIER() AS cls,
                 LAST(B.event_id) AS run_b, C.event_id AS run_c
        ALL ROWS PER MATCH
        PATTERN (A B+ C)
        DEFINE A AS A.event_type = 'click', B AS B.event_type = 'view',
               C AS C.event_type = 'purchase')""")
      .select(col("mn"), col("cls"), col("run_b"), col("run_c"))
      .as[(Long, String, Option[Long], Option[Long])].collect().toSeq
    // RUNNING semantics: B/C measures are NULL before the variable matches
    assert(out == Seq(
      (1L, "A", None, None), (1L, "B", Some(2L), None),
      (1L, "B", Some(3L), None), (1L, "C", Some(3L), Some(4L))))
  }

  test("multi-column PARTITION BY partitions independently") {
    val s = spark
    import s.implicits._
    mkEvents(Seq(
      (1L, 1L, "x", 0L), (1L, 2L, "x", 10L), (1L, 3L, "y", 20L), (2L, 4L, "x", 0L)))
    val out = new EngineEnv(s).sqlQuery("""
      SELECT * FROM mr_events MATCH_RECOGNIZE (
        PARTITION BY user_id, event_type
        ORDER BY ts
        MEASURES FIRST(X.event_id) AS id1, LAST(X.event_id) AS id2
        PATTERN (X{2}))""")
      .as[(Long, String, Long, Long)].collect().toSet
    // only (user 1, type x) has two rows; y and user 2 partitions are too short
    assert(out == Set((1L, "x", 1L, 2L)))
  }

  test("ORDER BY tiebreak column resolves equal timestamps deterministically") {
    val s = spark
    import s.implicits._
    // two events at the SAME second — event_id tiebreak decides A-then-B
    mkEvents(Seq((1L, 2L, "purchase", 10L), (1L, 1L, "click", 10L)))
    val out = new EngineEnv(s).sqlQuery("""
      SELECT * FROM mr_events MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts, event_id
        MEASURES A.event_id AS a_id, B.event_id AS b_id
        PATTERN (A B)
        DEFINE A AS A.event_type = 'click', B AS B.event_type = 'purchase')""")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 1L, 2L)))
  }

  test("WITHIN excludes slow completions") {
    val s = spark
    import s.implicits._
    mkEvents(Seq((1L, 1L, "click", 0L), (1L, 2L, "purchase", 7200L)))
    val q = """
      SELECT * FROM mr_events MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        MEASURES A.event_id AS a_id, B.event_id AS b_id
        PATTERN (A B) %s
        DEFINE A AS A.event_type = 'click', B AS B.event_type = 'purchase')"""
    assert(new EngineEnv(s).sqlQuery(q.format("WITHIN INTERVAL '1' HOUR")).count() == 0)
    assert(new EngineEnv(s).sqlQuery(q.format("WITHIN INTERVAL '3' HOUR")).count() == 1)
  }
}
