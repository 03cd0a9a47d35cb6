package graft.coverage

import graft.{Q, Tables}
import org.apache.spark.sql.SparkSession

/** Round-3 batch 6: four more TPC-DS planner mechanics (reference gate:
  * flink-tpcds-test) — INTERSECT-derived dimension subset feeding a
  * scalar-subquery HAVING (q14), a variance-based group filter with a
  * period self-join (q39), CASE branches made of scalar subqueries (q9),
  * and a full-outer join of channel aggregates re-aggregated under ROLLUP
  * (q77). All exact-integer; identical SQL runs on both engines. */
object Tpcds5Queries {

  private def sql(text: String): Q =
    Q(run = (s: SparkSession, dir: String) => { Tables.registerAll(s, dir); s.sql(text) },
      oracle = Some(text))

  /** TPC-DS q14 shape — cross-channel item intersection (parts bought by
    * all three customer segments) restricts the fact scan via IN, and the
    * HAVING threshold is a scalar subquery over the whole fact, compared
    * exactly by cross-multiplication (group > total/500). */
  val qDsIntersectHaving: Q = sql("""
    WITH seg_parts AS (
      SELECT l_partkey AS pk FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey WHERE c_mktsegment = 'BUILDING'
      INTERSECT
      SELECT l_partkey FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey WHERE c_mktsegment = 'AUTOMOBILE'
      INTERSECT
      SELECT l_partkey FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey WHERE c_mktsegment = 'MACHINERY')
    SELECT p_brand, COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS rev_c
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_partkey IN (SELECT pk FROM seg_parts)
    GROUP BY p_brand
    HAVING SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT)) * 500
           > (SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) FROM lineitem)
    ORDER BY p_brand""")

  /** TPC-DS q39 shape — coefficient-of-variation filter then period
    * self-join: per (part, month) quantity mean/variance kept when
    * cov ≥ 0.55, consecutive months paired. cov ≥ c ⟺
    * n·Σx² − (Σx)² ≥ c²·(Σx)², so for c² = 121/400:
    * 400·n·Σx² ≥ 521·(Σx)² (population variance, cross-multiplied —
    * no floats anywhere). */
  val qDsCovPairs: Q = sql("""
    WITH m AS (SELECT l_partkey AS pk,
                      CAST(EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS mon,
                      COUNT(*) AS n,
                      CAST(SUM(CAST(FLOOR(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS sx,
                      CAST(SUM(CAST(FLOOR(l_quantity * 100.0) AS BIGINT)
                               * CAST(FLOOR(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS sxx
               FROM lineitem WHERE EXTRACT(YEAR FROM l_shipdate) = 1997
               GROUP BY 1, 2),
         hv AS (SELECT * FROM m WHERE n >= 2 AND 400 * n * sxx >= 521 * sx * sx)
    SELECT a.pk, a.mon AS mon1, a.n AS n1, a.sx AS sx1, b.mon AS mon2, b.n AS n2, b.sx AS sx2
    FROM hv a JOIN hv b ON a.pk = b.pk AND b.mon = a.mon + 1
    ORDER BY a.pk, a.mon""")

  /** TPC-DS q9 shape — CASE branches whose arms are scalar subqueries
    * (five independent single-row aggregates the planner must evaluate
    * once, not per outer row), projected over a small dimension table. */
  val qDsCaseScalars: Q = sql("""
    SELECT r_name,
           CASE WHEN (SELECT COUNT(*) FROM orders WHERE o_totalprice < 100000) > 3000
                THEN (SELECT CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
                      FROM orders WHERE o_totalprice < 100000)
                ELSE (SELECT COUNT(*) FROM orders WHERE o_totalprice < 100000) END AS b_low,
           CASE WHEN (SELECT COUNT(*) FROM orders
                      WHERE o_totalprice BETWEEN 100000 AND 200000) > 3000
                THEN (SELECT CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
                      FROM orders WHERE o_totalprice BETWEEN 100000 AND 200000)
                ELSE (SELECT COUNT(*) FROM orders
                      WHERE o_totalprice BETWEEN 100000 AND 200000) END AS b_mid,
           CASE WHEN (SELECT COUNT(*) FROM orders WHERE o_totalprice > 200000) > 3000
                THEN (SELECT CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
                      FROM orders WHERE o_totalprice > 200000)
                ELSE (SELECT COUNT(*) FROM orders WHERE o_totalprice > 200000) END AS b_high
    FROM region
    ORDER BY r_name""")

  /** TPC-DS q77 shape — per-channel sales and returns aggregated
    * separately, FULL OUTER joined on the channel key (either side may
    * miss a channel), then re-aggregated under ROLLUP for the grand-total
    * row. */
  val qDsProfitRollup: Q = sql("""
    WITH s AS (SELECT c_mktsegment AS seg,
                      CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS sales_c
               FROM orders JOIN customer ON c_custkey = o_custkey
               WHERE o_orderstatus = 'O' GROUP BY 1),
         r AS (SELECT c_mktsegment AS seg,
                      CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS ret_c
               FROM lineitem JOIN orders ON o_orderkey = l_orderkey
                             JOIN customer ON c_custkey = o_custkey
               WHERE o_orderstatus = 'F' AND l_returnflag = 'R' GROUP BY 1)
    SELECT COALESCE(s.seg, r.seg) AS seg_total, CAST(SUM(sales_c) AS BIGINT) AS sales_c,
           CAST(SUM(ret_c) AS BIGINT) AS ret_c
    FROM s FULL OUTER JOIN r ON s.seg = r.seg
    GROUP BY ROLLUP(COALESCE(s.seg, r.seg))
    ORDER BY seg_total NULLS FIRST""")

  /** TPC-DS q1/q30/q81 shape — a grouped CTE filtered by a CORRELATED
    * aggregate over ITSELF (customers whose total exceeds 1.2× their
    * nation's average), referenced twice; Catalyst decorrelates the
    * per-partition average into a grouped join. Exact by
    * cross-multiplication: total·n·10 > nation_sum·12. */
  val qDsCtrOutliers: Q = sql("""
    WITH ctr AS (SELECT o_custkey AS ck, c_nationkey AS nk,
                        CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS total_c
                 FROM orders JOIN customer ON c_custkey = o_custkey
                 GROUP BY o_custkey, c_nationkey)
    SELECT ck, nk, total_c
    FROM ctr c1
    WHERE total_c * (SELECT COUNT(*) FROM ctr c2 WHERE c2.nk = c1.nk) * 10
          > (SELECT CAST(SUM(total_c) AS BIGINT) FROM ctr c3 WHERE c3.nk = c1.nk) * 12
    ORDER BY nk, ck""")

  /** TPC-DS q6 shape — the fact filter anchored on a scalar-subquery
    * date (the month three months before the newest order): scalar date
    * arithmetic must fold to one value, not re-evaluate per row. */
  val qDsMonthAnchor: Q = sql("""
    SELECT c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS total_c
    FROM orders JOIN customer ON c_custkey = o_custkey
    WHERE date_trunc('month', o_orderdate) =
          (SELECT date_trunc('month', max(o_orderdate) - INTERVAL 3 MONTH) FROM orders)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment""")

  /** COUNT(DISTINCT) OVER — unsupported as a window function in both
    * engines' window frames (and in the reference's planner it splits into
    * a distinct-agg + join); the standard rewrite is
    * max(dense_rank) per partition: distinct customers per order-month,
    * carried onto every row of the month. */
  val qDsDistinctOver: Q = sql("""
    SELECT o_orderkey, mon,
           MAX(dr) OVER (PARTITION BY mon) AS distinct_custs
    FROM (SELECT o_orderkey,
                 CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mon,
                 dense_rank() OVER (PARTITION BY EXTRACT(MONTH FROM o_orderdate)
                                    ORDER BY o_custkey) AS dr
          FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1997) x
    ORDER BY mon, o_orderkey""")

  /** TPC-DS q85 shape — equi-join plus an OR of three band conjunctions
    * (the residual must stay on the hash join, evaluated post-probe;
    * none of the three bands alone may become the join condition). */
  val qDsBandJoin: Q = sql("""
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS rev_c
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE (l_quantity BETWEEN 1 AND 10 AND o_totalprice BETWEEN 0 AND 100000)
       OR (l_quantity BETWEEN 20 AND 30 AND o_totalprice BETWEEN 100000 AND 300000)
       OR (l_quantity BETWEEN 40 AND 50 AND o_totalprice BETWEEN 300000 AND 600000)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority""")

  /** Spark's native PIVOT clause (the declarative spelling of the q66-style
    * manual CASE pivot) — the oracle is the equivalent FILTER aggregate,
    * proving the clause produces exactly the hand-written expansion. */
  val qDsPivotNative: Q = Q(
    run = (s: SparkSession, dir: String) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT * FROM (SELECT c_mktsegment, o_orderstatus,
                              CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS tp_c
                       FROM orders JOIN customer ON c_custkey = o_custkey)
        PIVOT (CAST(SUM(tp_c) AS BIGINT) FOR o_orderstatus IN ('F' AS f_c, 'O' AS o_c, 'P' AS p_c))
        ORDER BY c_mktsegment""")
    },
    oracle = Some("""
      SELECT c_mktsegment,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) END) AS BIGINT) AS f_c,
             CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) END) AS BIGINT) AS o_c,
             CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) END) AS BIGINT) AS p_c
      FROM orders JOIN customer ON c_custkey = o_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""))

  /** UNNEST WITH OUTER semantics (ref LogicalUnnestRule / Calcite's outer
    * correlate): rows whose collection is EMPTY survive with a null
    * element instead of disappearing — Spark's explode_outer; the oracle
    * spells it LEFT JOIN LATERAL unnest. 'P'-status orders get the empty
    * array. */
  val qUnnestOuter: Q = Q(
    run = (s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions._
      Tables.load(s, dir, "orders")
        .withColumn("words",
          when(col("o_orderstatus") === "P", array().cast("array<string>"))
            .otherwise(split(col("o_orderpriority"), "-")))
        .select(col("o_orderkey"), explode_outer(col("words")).as("w"))
        .orderBy(col("o_orderkey"), col("w"))
    },
    oracle = Some("""
      SELECT o_orderkey, u.w
      FROM orders LEFT JOIN LATERAL (
        SELECT unnest(CASE WHEN o_orderstatus = 'P' THEN []::VARCHAR[]
                           ELSE string_split(o_orderpriority, '-') END) AS w) u ON TRUE
      ORDER BY o_orderkey, w NULLS FIRST"""))

  /** Spark's native UNPIVOT clause (columns → rows, the inverse of the
    * PIVOT above); the oracle is the manual UNION ALL expansion it must
    * equal. NULL cells are dropped by UNPIVOT semantics — none arise
    * (both aggregates are non-null per segment). */
  val qDsUnpivotNative: Q = Q(
    run = (s: SparkSession, dir: String) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT c_mktsegment, metric, v
        FROM (SELECT c_mktsegment, COUNT(*) AS n_orders,
                     CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS total_c
              FROM orders JOIN customer ON c_custkey = o_custkey
              GROUP BY c_mktsegment)
        UNPIVOT (v FOR metric IN (n_orders, total_c))
        ORDER BY c_mktsegment, metric""")
    },
    oracle = Some("""
      WITH agg AS (SELECT c_mktsegment, COUNT(*) AS n_orders,
                          CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS total_c
                   FROM orders JOIN customer ON c_custkey = o_custkey
                   GROUP BY c_mktsegment)
      SELECT c_mktsegment, 'n_orders' AS metric, n_orders AS v FROM agg
      UNION ALL
      SELECT c_mktsegment, 'total_c', total_c FROM agg
      ORDER BY c_mktsegment, metric"""))

  val all: Map[String, Q] = scala.collection.immutable.ListMap(
    "q_ds_intersect_having" -> qDsIntersectHaving,
    "q_ds_cov_pairs" -> qDsCovPairs,
    "q_ds_case_scalars" -> qDsCaseScalars,
    "q_ds_profit_rollup" -> qDsProfitRollup,
    "q_ds_ctr_outliers" -> qDsCtrOutliers,
    "q_ds_month_anchor" -> qDsMonthAnchor,
    "q_ds_distinct_over" -> qDsDistinctOver,
    "q_ds_band_join" -> qDsBandJoin,
    "q_ds_pivot_native" -> qDsPivotNative,
    "q_unnest_outer" -> qUnnestOuter,
    "q_ds_unpivot_native" -> qDsUnpivotNative,
  )
}
