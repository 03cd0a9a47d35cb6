package graft.coverage

import graft.{Q, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Third batch of TPC-DS planner-stress shapes (reference gate:
  * flink-end-to-end-tests/flink-tpcds-test/.../TpcdsTestProgram.java:48,
  * 103 queries). Each shape targets a distinct planner feature not yet
  * covered by TpcdsShapeQueries / Round2Queries: window-vs-group compare,
  * cross-channel growth ratios, symmetric rank joins, aggregate-then-bucket
  * histograms, rank-inside-rollup, self-joined period handoff, non-equi
  * date-offset joins, and TPC-H q21's doubly-correlated EXISTS chain.
  * All money math is exact integer cents; every ORDER BY has a unique
  * tiebreak (see Queries scaladoc for the cross-engine conventions). */
object Tpcds3Queries {

  private def idq(text: String): Q =
    Q(run = (s, dir) => { Tables.registerAll(s, dir); s.sql(text) }, oracle = Some(text))

  /** TPC-DS q47/q57 shape — deviation from the group mean via window
    * functions: months whose sales exceed 1.3× their (segment, year)
    * average, compared exactly with cross-multiplied BIGINTs
    * (10·v·cnt > 13·tot  ⇔  v > 1.3·avg). */
  val qDsMovingDev: Q = idq("""
    WITH m AS (
      SELECT c_mktsegment AS seg,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
             CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mo,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS v
      FROM customer JOIN orders ON o_custkey = c_custkey
      GROUP BY c_mktsegment, EXTRACT(YEAR FROM o_orderdate), EXTRACT(MONTH FROM o_orderdate)),
    w AS (
      SELECT seg, yr, mo, v,
             CAST(SUM(v) OVER (PARTITION BY seg, yr) AS BIGINT) AS tot,
             CAST(COUNT(*) OVER (PARTITION BY seg, yr) AS BIGINT) AS cnt
      FROM m)
    SELECT seg, yr, mo, v
    FROM w
    WHERE 10 * v * cnt > 13 * tot
    ORDER BY seg, yr, mo""")

  /** TPC-DS q4/q11 shape — cross-channel year-over-year growth ratio:
    * segments where the open-order channel grew FASTER than the filled
    * channel from 1996 to 1997 (o97/o96 > f97/f96, cross-multiplied so the
    * compare is exact integer math; zero-base segments excluded). Sums are
    * exact integer DOLLARS, not cents: the cross-product of two cent-scale
    * channel totals overflows INT64 in both engines. */
  val qDsChannelRatio: Q = idq("""
    WITH s AS (
      SELECT c_mktsegment AS seg,
             CAST(SUM(CASE WHEN o_orderstatus = 'O' AND EXTRACT(YEAR FROM o_orderdate) = 1996
                           THEN CAST(FLOOR(o_totalprice) AS BIGINT) ELSE 0 END) AS BIGINT) AS o96,
             CAST(SUM(CASE WHEN o_orderstatus = 'O' AND EXTRACT(YEAR FROM o_orderdate) = 1997
                           THEN CAST(FLOOR(o_totalprice) AS BIGINT) ELSE 0 END) AS BIGINT) AS o97,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' AND EXTRACT(YEAR FROM o_orderdate) = 1996
                           THEN CAST(FLOOR(o_totalprice) AS BIGINT) ELSE 0 END) AS BIGINT) AS f96,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' AND EXTRACT(YEAR FROM o_orderdate) = 1997
                           THEN CAST(FLOOR(o_totalprice) AS BIGINT) ELSE 0 END) AS BIGINT) AS f97
      FROM customer JOIN orders ON o_custkey = c_custkey
      GROUP BY c_mktsegment)
    SELECT seg, o96, o97, f96, f97
    FROM s
    WHERE o96 > 0 AND f96 > 0 AND o97 * f96 > f97 * o96
    ORDER BY seg""")

  /** TPC-DS q44 shape — symmetric rank join: best and worst brands by
    * average line revenue paired rank-for-rank (two ROW_NUMBER orderings
    * over ONE aggregate, joined on rank). The avg comparator divides two
    * exact BIGINTs — deterministic in both engines. */
  val qDsBestWorst: Q = idq("""
    WITH a AS (
      SELECT p_brand,
             CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS tot,
             COUNT(*) AS cnt
      FROM part JOIN lineitem ON l_partkey = p_partkey
      GROUP BY p_brand),
    best AS (
      SELECT p_brand, CAST(ROW_NUMBER() OVER (ORDER BY tot * 1.0 / cnt DESC, p_brand) AS INT) AS rk
      FROM a),
    worst AS (
      SELECT p_brand, CAST(ROW_NUMBER() OVER (ORDER BY tot * 1.0 / cnt ASC, p_brand) AS INT) AS rk
      FROM a)
    SELECT b.rk AS rk, b.p_brand AS best_brand, w.p_brand AS worst_brand
    FROM best b JOIN worst w ON b.rk = w.rk
    WHERE b.rk <= 5
    ORDER BY b.rk""")

  /** TPC-DS q54 shape — aggregate-then-bucket histogram: customers binned
    * by lifetime spend ($500k-cent buckets, top-coded at 9), counting
    * customers and summing spend per bin. FLOOR before CAST on both sides
    * (CAST(double AS INT) rounds in DuckDB but truncates in Spark). */
  val qDsSpendHist: Q = idq("""
    WITH t AS (
      SELECT o_custkey,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS tot
      FROM orders GROUP BY o_custkey)
    SELECT LEAST(9, CAST(FLOOR(tot / 50000000.0) AS INT)) AS bucket,
           COUNT(*) AS n_customers,
           CAST(SUM(tot) AS BIGINT) AS bucket_cents
    FROM t
    GROUP BY LEAST(9, CAST(FLOOR(tot / 50000000.0) AS INT))
    ORDER BY bucket""")

  /** TPC-DS q70/q86 shape — rank INSIDE a rollup: revenue rank at each
    * rollup level (nations within region, regions overall), partitioned by
    * grouping_id (same bit order in Spark and DuckDB). */
  val qDsRollupRank: Q = idq("""
    WITH r AS (
      SELECT r_name, n_name,
             CAST(grouping_id(r_name, n_name) AS INT) AS gid,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS v
      FROM region JOIN nation ON n_regionkey = r_regionkey
                  JOIN customer ON c_nationkey = n_nationkey
                  JOIN orders ON o_custkey = c_custkey
      GROUP BY ROLLUP(r_name, n_name)
      HAVING COUNT(*) > 0)
    SELECT r_name, n_name, gid, v,
           CAST(RANK() OVER (
             PARTITION BY gid, CASE WHEN gid = 0 THEN r_name ELSE '' END
             ORDER BY v DESC, COALESCE(r_name, ''), COALESCE(n_name, '')) AS INT) AS rk
    FROM r
    ORDER BY gid, COALESCE(r_name, ''), COALESCE(n_name, '')""")

  /** TPC-DS q64 shape — two-period handoff: the same aggregate CTE
    * self-joined across years, keeping parts whose 1997 revenue held at or
    * above 1996 (planner must reuse/re-scan one grouped relation on two
    * arms of an equi-join). */
  val qDsHandoff: Q = idq("""
    WITH py AS (
      SELECT l_partkey AS pk,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr,
             CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS rev
      FROM lineitem
      GROUP BY l_partkey, EXTRACT(YEAR FROM l_shipdate))
    SELECT a.pk AS p_key, a.rev AS rev96, b.rev AS rev97
    FROM py a JOIN py b ON a.pk = b.pk
    WHERE a.yr = 1996 AND b.yr = 1997 AND b.rev >= a.rev
    ORDER BY a.pk""")

  /** TPC-DS q72 shape — equi-join with a non-equi date-offset residual
    * (ship more than 60 days after order): the join stays a hash join on
    * l_orderkey with the date predicate evaluated as a residual filter,
    * never a cartesian. Spark side spells the offset date_add() because
    * ANSI mode rejects DATE + INT; DuckDB uses the + operator. */
  val qDsShipLag: Q = Q(
    run = (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS late_cents
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE CAST(l_shipdate AS DATE) > date_add(CAST(o_orderdate AS DATE), 60)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")
    },
    oracle = Some("""
      SELECT o_orderpriority, COUNT(*) AS n,
             CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS late_cents
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      WHERE CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 60
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""))

  /** TPC-H q21 shape — doubly-correlated EXISTS / NOT EXISTS with a
    * non-equi conjunct inside each subquery: suppliers who shipped the
    * LAST line of a multi-supplier finished order (decorrelates to a
    * semi-join plus an anti-join, both with residual l_suppkey/l_shipdate
    * predicates). */
  val qDsMultiSupplierWait: Q = idq("""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name""")

  /** TPC-DS q23 shape — two independent filter CTEs (frequently-bought
    * parts × best customers) intersected against the fact table via IN
    * subqueries: the planner turns both into semi joins and the fact scans
    * once. */
  val qDsFrequentSpenders: Q = idq("""
    WITH freq AS (
      SELECT l_partkey FROM lineitem WHERE l_quantity > 45
      GROUP BY l_partkey HAVING COUNT(DISTINCT l_orderkey) >= 5),
    best AS (
      SELECT o_custkey FROM orders GROUP BY o_custkey
      HAVING SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) > 400000000)
    SELECT COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS rev_cents
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_partkey IN (SELECT l_partkey FROM freq)
      AND o_custkey IN (SELECT o_custkey FROM best)""")

  /** TPC-DS q58 shape — equal-share channels: months where a channel's
    * revenue is within 10% of the three-channel monthly average
    * (10·|3v − tot| ≤ tot — exact integer cents, no float thresholds). */
  val qDsEqualShare: Q = idq("""
    WITH m AS (
      SELECT o_orderstatus AS st,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
             CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mo,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS v
      FROM orders GROUP BY o_orderstatus, EXTRACT(YEAR FROM o_orderdate), EXTRACT(MONTH FROM o_orderdate)),
    t AS (SELECT yr, mo, CAST(SUM(v) AS BIGINT) AS tot, COUNT(*) AS nch FROM m GROUP BY yr, mo)
    SELECT m.yr, m.mo, m.st, m.v
    FROM m JOIN t ON m.yr = t.yr AND m.mo = t.mo
    WHERE t.nch = 3 AND 10 * ABS(3 * m.v - t.tot) <= t.tot
    ORDER BY m.yr, m.mo, m.st""")

  /** TPC-DS q90 shape — time-band counts from ONE scan via FILTER
    * aggregates (morning vs evening activity per event type on the
    * events stream table). */
  val qDsTimeBand: Q = idq("""
    SELECT event_type,
           COUNT(*) FILTER (WHERE EXTRACT(HOUR FROM ts) BETWEEN 6 AND 11) AS am,
           COUNT(*) FILTER (WHERE EXTRACT(HOUR FROM ts) BETWEEN 18 AND 23) AS pm
    FROM events GROUP BY event_type ORDER BY event_type""")

  /** TPC-DS q62/q99 shape — days-to-ship bucket matrix per priority.
    * datediff argument order differs between engines (Spark datediff(end,
    * start) vs DuckDB datediff('day', start, end)) so the texts diverge
    * while the arithmetic is identical. */
  val qDsShipBuckets: Q = Q(
    run = (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT o_orderpriority,
               COUNT(*) FILTER (WHERE datediff(l_shipdate, o_orderdate) <= 30) AS b30,
               COUNT(*) FILTER (WHERE datediff(l_shipdate, o_orderdate) BETWEEN 31 AND 60) AS b60,
               COUNT(*) FILTER (WHERE datediff(l_shipdate, o_orderdate) > 60) AS b_late
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")
    },
    oracle = Some("""
      SELECT o_orderpriority,
             COUNT(*) FILTER (WHERE datediff('day', o_orderdate, l_shipdate) <= 30) AS b30,
             COUNT(*) FILTER (WHERE datediff('day', o_orderdate, l_shipdate) BETWEEN 31 AND 60) AS b60,
             COUNT(*) FILTER (WHERE datediff('day', o_orderdate, l_shipdate) > 60) AS b_late
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""))

  val all: Map[String, Q] = scala.collection.immutable.ListMap(
    "q_ds_frequent_spenders" -> qDsFrequentSpenders,
    "q_ds_equal_share" -> qDsEqualShare,
    "q_ds_time_band" -> qDsTimeBand,
    "q_ds_ship_buckets" -> qDsShipBuckets,
    "q_ds_moving_dev" -> qDsMovingDev,
    "q_ds_channel_ratio" -> qDsChannelRatio,
    "q_ds_best_worst" -> qDsBestWorst,
    "q_ds_spend_hist" -> qDsSpendHist,
    "q_ds_rollup_rank" -> qDsRollupRank,
    "q_ds_handoff" -> qDsHandoff,
    "q_ds_ship_lag" -> qDsShipLag,
    "q_ds_multi_supplier_wait" -> qDsMultiSupplierWait,
  )
}
