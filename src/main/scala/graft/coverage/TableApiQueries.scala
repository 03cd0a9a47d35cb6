package graft.coverage

import graft.{Q, Tables}
import graft.Queries._
import graft.table.{GTable, Tumble, Session}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Programmatic Table-API DSL coverage (ref flink-table-api Table.java +
  * Tumble/Session builders): the same answers as the SQL/DataFrame
  * spellings, produced through the fluent facade — proving the third API
  * surface drives identical Catalyst plans. */
object TableApiQueries {

  private def ev(s: SparkSession, dir: String) = Tables.load(s, dir, "events")

  /** `table.window(Tumble over 10.minutes on 'ts as 'w).groupBy('w,
    * 'event_type).select('w.start, ...)` — the Table-API group-window. */
  val qTableApiTumble: Q = Q(
    run = (s, dir) =>
      GTable(ev(s, dir))
        .window(Tumble over "10 minutes" on "ts" as "w")
        .groupBy(col("w"), col("event_type"))
        .select(col("w.start").as("ws"), col("event_type"),
                count(lit(1)).as("n"), sum(cents(col("value"))).as("v_cents"))
        .orderBy(col("ws"), col("event_type"))
        .toDataFrame,
    oracle = Some(s"""
      SELECT time_bucket(INTERVAL '10 minutes', ts) AS ws, event_type,
             COUNT(*) AS n, SUM(${oCents("value")})::BIGINT AS v_cents
      FROM events GROUP BY ws, event_type ORDER BY ws, event_type"""))

  /** Session window through the DSL (`Session withGap "30 minutes" on 'ts
    * as 'w`) plus the relational chain: filter → addColumns →
    * renameColumns → join → groupBy/select → orderBy/fetch. */
  val qTableApiRelops: Q = Q(
    run = (s, dir) => {
      val orders = GTable(Tables.load(s, dir, "orders"))
        .filter(col("o_totalprice") > 100000)
        .addColumns("tp_c" -> cents(col("o_totalprice")))
        .renameColumns("o_custkey" -> "ck")
      val customer = GTable(Tables.load(s, dir, "customer"))
      orders.join(customer, col("ck") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .select(col("c_mktsegment"), count(lit(1)).as("n"),
                sum(col("tp_c")).cast("long").as("total_c"))
        .orderBy(col("c_mktsegment"))
        .toDataFrame
    },
    oracle = Some(s"""
      SELECT c_mktsegment, COUNT(*) AS n, SUM(${oCents("o_totalprice")})::BIGINT AS total_c
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE o_totalprice > 100000
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Session group-window via the DSL — per-user activity islands, same
    * shape as q_window_session but built fluently. */
  val qTableApiSession: Q = Q(
    run = (s, dir) =>
      GTable(ev(s, dir))
        .window(Session withGap "30 minutes" on "ts" as "w")
        .groupBy(col("w"), col("user_id"))
        .select(col("user_id"), col("w.start").as("ws"), col("w.end").as("we"),
                count(lit(1)).as("n"))
        .orderBy(col("user_id"), col("ws"))
        .toDataFrame,
    oracle = Some("""
      WITH ordered AS (
        SELECT user_id, ts,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL '30 minutes' OR
                         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS brk
        FROM events),
      grp AS (SELECT user_id, ts,
                     SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS g
              FROM ordered)
      SELECT user_id, MIN(ts) AS ws, MAX(ts) + INTERVAL '30 minutes' AS we, COUNT(*) AS n
      FROM grp GROUP BY user_id, g ORDER BY user_id, ws"""))

  /** Over-window through the DSL (`Over partitionBy 'user orderBy 'ts
    * precedingRows 2 ... 'v.sum over 'w`) — trailing 3-row sum per user,
    * the Table-API spelling of the §2.7 analytic frame. */
  val qTableApiOver: Q = Q(
    run = (s, dir) => {
      import graft.table.Over
      val w = Over.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .precedingRows(2)
      GTable(ev(s, dir))
        .select(col("user_id"), col("event_id"),
                w(sum(cents(col("value")))).as("trail3_c"))
        .orderBy(col("user_id"), col("event_id"))
        .toDataFrame
    },
    oracle = Some(s"""
      SELECT user_id, event_id,
             SUM(${oCents("value")}) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)::BIGINT AS trail3_c
      FROM events ORDER BY user_id, event_id"""))

  val all: Map[String, Q] = scala.collection.immutable.ListMap(
    "q_table_api_tumble" -> qTableApiTumble,
    "q_table_api_relops" -> qTableApiRelops,
    "q_table_api_session" -> qTableApiSession,
    "q_table_api_over" -> qTableApiOver,
  )
}
