package graft.coverage

import graft.{Q, Queries, Tables}
import graft.Queries._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TPC-DS-shaped headline queries over the TPC-H fixture tables — the
  * multi-join / correlated-subquery / grouping-heavy family the reference
  * gates on (flink-end-to-end-tests/flink-tpcds-test/.../TpcdsTestProgram
  * .java:48, 103 queries): these shapes stress the planner (subquery
  * decorrelation, grouping-set expansion, join reordering) rather than
  * single operators. Money math is exact: cents BIGINTs and
  * cross-multiplied rational comparisons, never float thresholds. */
object TpcdsShapeQueries {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** TPC-DS q1/q30 shape — correlated scalar subqueries: customers whose
    * order total exceeds 1.2 × their nation's average, as two correlated
    * aggregates (Catalyst decorrelates both into joins; cross-multiplied
    * BIGINT compare keeps it exact). */
  val qDsCorrSubquery: Q = Q(
    run = (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        WITH ctot AS (
          SELECT c_custkey, c_nationkey AS nk,
                 CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS tot
          FROM customer JOIN orders ON o_custkey = c_custkey
          GROUP BY c_custkey, c_nationkey)
        SELECT t1.c_custkey, t1.tot
        FROM ctot t1
        WHERE 5 * t1.tot * (SELECT COUNT(*) FROM ctot t2 WHERE t2.nk = t1.nk)
              > 6 * (SELECT SUM(t3.tot) FROM ctot t3 WHERE t3.nk = t1.nk)
        ORDER BY t1.c_custkey""")
    },
    oracle = Some("""
      WITH ctot AS (
        SELECT c_custkey, c_nationkey AS nk,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS tot
        FROM customer JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey, c_nationkey)
      SELECT t1.c_custkey, t1.tot
      FROM ctot t1
      WHERE 5 * t1.tot * (SELECT COUNT(*) FROM ctot t2 WHERE t2.nk = t1.nk)
            > 6 * (SELECT SUM(t3.tot) FROM ctot t3 WHERE t3.nk = t1.nk)
      ORDER BY t1.c_custkey"""))

  /** TPC-DS q27/q77 shape — GROUPING SETS over three dimensions with
    * grouping_id (bit order matches DuckDB) and a HAVING prune. */
  val qDsGroupingSets: Q = Q(
    run = (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(s"""
        SELECT r_name, n_name, c_mktsegment,
               CAST(grouping_id(r_name, n_name, c_mktsegment) AS INT) AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS v_cents
        FROM region JOIN nation ON n_regionkey = r_regionkey
                    JOIN customer ON c_nationkey = n_nationkey
                    JOIN orders ON o_custkey = c_custkey
        GROUP BY GROUPING SETS ((r_name, n_name, c_mktsegment), (r_name, n_name), (r_name), ())
        HAVING COUNT(*) >= 5
        ORDER BY gid, r_name, n_name, c_mktsegment""")
    },
    oracle = Some("""
      SELECT r_name, n_name, c_mktsegment,
             CAST(grouping_id(r_name, n_name, c_mktsegment) AS INT) AS gid,
             COUNT(*) AS n,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS v_cents
      FROM region JOIN nation ON n_regionkey = r_regionkey
                  JOIN customer ON c_nationkey = n_nationkey
                  JOIN orders ON o_custkey = c_custkey
      GROUP BY GROUPING SETS ((r_name, n_name, c_mktsegment), (r_name, n_name), (r_name), ())
      HAVING COUNT(*) >= 5
      ORDER BY gid, r_name, n_name, c_mktsegment"""))

  /** TPC-DS q25 shape — 6-way star join with selective filters on three
    * arms; small dims broadcast, facts shuffle on their join keys. */
  val qDsMultijoin: Q = Q(
    run = (s, dir) =>
      t(s, dir, "lineitem").filter(col("l_quantity") > 25)
        .join(t(s, dir, "orders").filter(col("o_orderstatus") =!= "P"),
              col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .join(t(s, dir, "part").filter(col("p_size") < 20), col("l_partkey") === col("p_partkey"))
        .groupBy(col("r_name"), col("p_brand"))
        .agg(count(lit(1)).as("n"),
             dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("r_name"), col("p_brand")),
    oracle = Some(s"""
      SELECT r_name, p_brand, COUNT(*) AS n,
             ${oSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
                    JOIN part ON l_partkey = p_partkey
      WHERE l_quantity > 25 AND o_orderstatus <> 'P' AND p_size < 20
      GROUP BY r_name, p_brand
      ORDER BY r_name, p_brand"""))

  /** TPC-DS q38/q87 shape — cross-channel INTERSECT/EXCEPT: customers
    * active in both date bands, minus the single-band ones. */
  val qDsChannelIntersect: Q = Q(
    run = (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        WITH early AS (SELECT DISTINCT o_custkey FROM orders
                       WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'),
             late AS (SELECT DISTINCT o_custkey FROM orders
                      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00')
        SELECT COUNT(*) AS n_both,
               (SELECT COUNT(*) FROM (SELECT o_custkey FROM early EXCEPT SELECT o_custkey FROM late) x) AS n_early_only
        FROM (SELECT o_custkey FROM early INTERSECT SELECT o_custkey FROM late) b""")
    },
    oracle = Some("""
      WITH early AS (SELECT DISTINCT o_custkey FROM orders
                     WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'),
           late AS (SELECT DISTINCT o_custkey FROM orders
                    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00')
      SELECT COUNT(*) AS n_both,
             (SELECT COUNT(*) FROM (SELECT o_custkey FROM early EXCEPT SELECT o_custkey FROM late) x) AS n_early_only
      FROM (SELECT o_custkey FROM early INTERSECT SELECT o_custkey FROM late) b"""))

  /** TPC-DS q67 shape — rank within category over a two-level aggregate,
    * keep the top 2 priorities per market segment. */
  val qDsRankWithin: Q = Q(
    run = (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        WITH agg AS (
          SELECT c_mktsegment, o_orderpriority,
                 CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS v_cents
          FROM customer JOIN orders ON o_custkey = c_custkey
          GROUP BY c_mktsegment, o_orderpriority)
        SELECT c_mktsegment, o_orderpriority, v_cents, rk FROM (
          SELECT *, CAST(rank() OVER (PARTITION BY c_mktsegment
                         ORDER BY v_cents DESC, o_orderpriority) AS INT) AS rk
          FROM agg) r
        WHERE rk <= 2
        ORDER BY c_mktsegment, rk""")
    },
    oracle = Some("""
      WITH agg AS (
        SELECT c_mktsegment, o_orderpriority,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS v_cents
        FROM customer JOIN orders ON o_custkey = c_custkey
        GROUP BY c_mktsegment, o_orderpriority)
      SELECT c_mktsegment, o_orderpriority, v_cents, rk FROM (
        SELECT *, CAST(rank() OVER (PARTITION BY c_mktsegment
                       ORDER BY v_cents DESC, o_orderpriority) AS INT) AS rk
        FROM agg) r
      WHERE rk <= 2
      ORDER BY c_mktsegment, rk"""))

  val all: Map[String, Q] = scala.collection.immutable.ListMap(
    "q_ds_corr_subquery" -> qDsCorrSubquery,
    "q_ds_grouping_sets" -> qDsGroupingSets,
    "q_ds_multijoin" -> qDsMultijoin,
    "q_ds_channel_intersect" -> qDsChannelIntersect,
    "q_ds_rank_within" -> qDsRankWithin,
  )
}
