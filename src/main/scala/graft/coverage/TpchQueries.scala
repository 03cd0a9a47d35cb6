package graft.coverage

import graft.{Q, Queries, Tables}
import graft.Queries._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TPC-H-shaped headline analytics (the reference's own correctness corpus
  * family — flink-tpch-test / TpchDataGenerator.java): multi-join +
  * aggregate + top-k shapes over the star schema, adapted to the fixture
  * columns. These are the recognizable end-to-end workloads the bench
  * tracks alongside the per-operator microqueries. */
object TpchQueries {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Q3 shape — shipping priority: 3-way join, filter both sides of a date,
    * top-10 revenue orders. Joins shuffle on their keys; the date filters
    * push into both parquet scans. */
  val qTpchQ3: Q = Q(
    run = (s, dir) =>
      t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .join(t(s, dir, "orders").filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
              col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp")),
              col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10),
    oracle = Some(s"""
      SELECT l_orderkey, o_orderdate, o_orderpriority,
             ${oSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey LIMIT 10"""))

  /** Q10 shape — returned-item reporting: revenue lost to returns per
    * customer, top 20. */
  val qTpchQ10: Q = Q(
    run = (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem").filter(col("l_returnflag") === "R"),
              col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
             count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20),
    oracle = Some(s"""
      SELECT c_custkey, c_name, n_name,
             ${oSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
             COUNT(*) AS n_items
      FROM customer, orders, lineitem, nation
      WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
        AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20"""))

  /** Q18 shape — large-volume customers: HAVING-style semi-join on an
    * aggregated subquery (orders whose total quantity exceeds a threshold). */
  val qTpchQ18: Q = Q(
    run = (s, dir) => {
      val li = t(s, dir, "lineitem")
      val big = li.groupBy(col("l_orderkey").as("bk"))
        .agg(sum(cents(col("l_quantity"))).as("qty_cents"))
        .filter(col("qty_cents") > 250L * 100)
        .select(col("bk"))
      t(s, dir, "orders").join(big, col("o_orderkey") === col("bk"), "left_semi")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_orderdate"))
        .agg(sum(cents(col("l_quantity"))).as("total_qty_cents"))
        .orderBy(col("total_qty_cents").desc, col("o_orderkey"))
        .limit(50)
    },
    oracle = Some(s"""
      SELECT c_custkey, c_name, o_orderkey, o_orderdate,
             SUM(${oCents("l_quantity")})::BIGINT AS total_qty_cents
      FROM customer, orders, lineitem
      WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey HAVING SUM(${oCents("l_quantity")}) > 25000)
        AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      GROUP BY c_custkey, c_name, o_orderkey, o_orderdate
      ORDER BY total_qty_cents DESC, o_orderkey LIMIT 50"""))

  /** Q5 shape — local supplier volume: 6-way join constrained to
    * customer and supplier sharing a nation, one region, revenue per
    * nation. */
  val qTpchQ5: Q = Q(
    run = (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name")),
    oracle = Some(s"""
      SELECT n_name, ${oSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey
        AND n_regionkey = r_regionkey AND r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY n_name ORDER BY revenue DESC, n_name"""))

  /** Q6 shape — forecast revenue change: single scan, every predicate
    * pushed to parquet, one global aggregate. */
  val qTpchQ6: Q = Q(
    run = (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 && col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
             count(lit(1)).as("n")),
    oracle = Some(s"""
      SELECT ${oSum("l_extendedprice * l_discount")} AS revenue, COUNT(*) AS n
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""))

  /** Q14 shape — promotion effect: the promo/total revenue ratio kept
    * EXACT as two quantized sums instead of a float percentage. */
  val qTpchQ14: Q = Q(
    run = (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .agg(
          dsum(when(col("p_type") === "PROMO",
            col("l_extendedprice") * (lit(1.0) - col("l_discount"))).otherwise(lit(0.0)))
            .as("promo_rev"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("total_rev")),
    oracle = Some(s"""
      SELECT ${oSum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} AS promo_rev,
             ${oSum("l_extendedprice * (1.0 - l_discount)")} AS total_rev
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'"""))

  /** Q22 shape — global sales opportunity: scalar subquery (avg positive
    * balance, cross-multiplied to exact cents) + anti join against
    * orders, grouped by segment. */
  val qTpchQ22: Q = Q(
    run = (s, dir) => {
      graft.Tables.registerAll(s, dir)
      s.sql("""
        WITH cust AS (SELECT c_custkey, c_mktsegment,
                             CAST(FLOOR(c_acctbal * 100.0) AS BIGINT) AS bal_cents
                      FROM customer),
             pos AS (SELECT SUM(bal_cents) AS tot, COUNT(*) AS cnt
                     FROM cust WHERE bal_cents > 0)
        SELECT c_mktsegment, COUNT(*) AS numcust,
               CAST(SUM(bal_cents) AS BIGINT) AS totacctbal_cents
        FROM cust, pos
        WHERE bal_cents * pos.cnt > pos.tot
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 430000)
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""")
    },
    oracle = Some("""
      WITH cust AS (SELECT c_custkey, c_mktsegment,
                           CAST(FLOOR(c_acctbal * 100.0) AS BIGINT) AS bal_cents
                    FROM customer),
           pos AS (SELECT SUM(bal_cents) AS tot, COUNT(*) AS cnt
                   FROM cust WHERE bal_cents > 0)
      SELECT c_mktsegment, COUNT(*) AS numcust,
             CAST(SUM(bal_cents) AS BIGINT) AS totacctbal_cents
      FROM cust, pos
      WHERE bal_cents * pos.cnt > pos.tot
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 430000)
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""))

  /** Q4 shape — order-priority checking: EXISTS over the fact arm (ship
    * after order date) planned as a semi join; the classic "count orders
    * with at least one qualifying line" query. */
  val qTpchQ4: Q = {
    val sql = """
      SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""
    Q(run = (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(sql) }, oracle = Some(sql))
  }

  /** Q15 shape — top supplier: aggregated revenue CTE consumed twice (join
    * arm + MAX scalar subquery); the planner reuses one aggregate or
    * re-derives it — either way no correlation remains. Exact quantized
    * revenue makes the MAX tie-free across engines. */
  val qTpchQ15: Q = {
    val sql = """
      WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 10000.0) AS BIGINT)) AS BIGINT) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_rev
      FROM supplier JOIN revenue ON s_suppkey = supplier_no
      WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
      ORDER BY s_suppkey"""
    Q(run = (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(sql) }, oracle = Some(sql))
  }

  val all: Map[String, Q] = scala.collection.immutable.ListMap(
    "q_tpch_q3" -> qTpchQ3,
    "q_tpch_q4" -> qTpchQ4,
    "q_tpch_q15" -> qTpchQ15,
    "q_tpch_q5" -> qTpchQ5,
    "q_tpch_q6" -> qTpchQ6,
    "q_tpch_q10" -> qTpchQ10,
    "q_tpch_q14" -> qTpchQ14,
    "q_tpch_q18" -> qTpchQ18,
    "q_tpch_q22" -> qTpchQ22,
  )
}
