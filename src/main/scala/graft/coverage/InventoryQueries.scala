package graft.coverage

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Inventory-shape TPC-DS mechanics on their NATIVE relation (TPCDS_MAP
  * `~`-row tightening): the fixtures carry no `inventory` table, so a
  * daily per-(part, warehouse) stock-level relation is DERIVED from
  * lineitem — shipments accumulate, returns (l_returnflag = 'R') drain —
  * and the q21/q22/q37/q40/q82 shapes run as date-banded inventory joins,
  * not adapted order facts. The oracle replays the identical derivation
  * CTE, so the gate checks the full pipeline (derivation + query) against
  * an independent engine.
  *
  * Scale notes: the derivation is one hash agg on (part, supplier, day) —
  * map-side partial, no shuffle beyond the one agg. Broadcast discipline:
  * only dims with a pruning predicate (price band / brand IN — a few
  * hundred rows at any SF) carry an explicit hint; unpruned frames
  * (supplier, full part) are left to AQE, which broadcasts them while
  * they are actually small and degrades to a shuffle join when an SF100
  * dim outgrows the budget.
  */
object InventoryQueries {

  /** Daily net stock movement per (item, warehouse): warehouse = supplier
    * (the fixture's closest warehouse analog, as TPCDS_MAP notes). */
  private def inv(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .select(col("l_partkey").as("inv_item"), col("l_suppkey").as("inv_wh"),
              col("l_shipdate").cast("date").as("inv_date"),
              (expr("cast(floor(l_quantity) as bigint)") *
               when(col("l_returnflag") === "R", -1).otherwise(1)).as("mv"))
      .groupBy("inv_item", "inv_wh", "inv_date")
      .agg(sum(col("mv")).cast("long").as("inv_qty"))

  private val invSql = """
    inv AS (SELECT l_partkey AS inv_item, l_suppkey AS inv_wh, CAST(l_shipdate AS DATE) AS inv_date,
            CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT) *
                     (CASE WHEN l_returnflag = 'R' THEN -1 ELSE 1 END)) AS BIGINT) AS inv_qty
            FROM lineitem GROUP BY 1, 2, 3)"""

  /** TPC-DS q21/q40 native shape: per-(warehouse, brand) inventory CASE
    * sums BEFORE vs AFTER a boundary date inside a ±30-day band, kept when
    * the after/before ratio lands in [2/3, 3/2] — integer cross-multiplied
    * (no float ratio). */
  val qDsInvBeforeAfter: Q = Q(
    run = (s, dir) => {
      val p = broadcast(Tables.load(s, dir, "part")
        .filter(col("p_retailprice").between(900, 950))
        .select(col("p_partkey"), col("p_brand")))
      val w = Tables.load(s, dir, "supplier") // unpruned dim: AQE decides
        .select(col("s_suppkey"), col("s_name"))
      val boundary = lit("1998-06-17").cast("date")
      val j = inv(s, dir)
        .filter(col("inv_date").between(lit("1998-05-18").cast("date"),
                                        lit("1998-07-17").cast("date")))
        .join(p, col("inv_item") === col("p_partkey"))
        .join(w, col("inv_wh") === col("s_suppkey"))
        .select(col("s_name").as("wh_name"), col("p_brand"), col("inv_date"), col("inv_qty"))
      j.groupBy("wh_name", "p_brand")
        .agg(sum(when(col("inv_date") < boundary, col("inv_qty")).otherwise(0L))
               .cast("long").as("inv_before"),
             sum(when(col("inv_date") >= boundary, col("inv_qty")).otherwise(0L))
               .cast("long").as("inv_after"))
        .filter(col("inv_before") > 0 &&
                col("inv_after") * 3 >= col("inv_before") * 2 &&
                col("inv_after") * 2 <= col("inv_before") * 3)
        .orderBy(col("wh_name"), col("p_brand"))
    },
    oracle = Some(s"""
      WITH $invSql,
      j AS (SELECT s.s_name AS wh_name, p.p_brand, i.inv_date, i.inv_qty
            FROM inv i JOIN part p ON p.p_partkey = i.inv_item
                       JOIN supplier s ON s.s_suppkey = i.inv_wh
            WHERE p.p_retailprice BETWEEN 900 AND 950
              AND i.inv_date BETWEEN DATE '1998-05-18' AND DATE '1998-07-17')
      SELECT * FROM (
        SELECT wh_name, p_brand,
               CAST(SUM(CASE WHEN inv_date < DATE '1998-06-17' THEN inv_qty ELSE 0 END) AS BIGINT) AS inv_before,
               CAST(SUM(CASE WHEN inv_date >= DATE '1998-06-17' THEN inv_qty ELSE 0 END) AS BIGINT) AS inv_after
        FROM j GROUP BY wh_name, p_brand)
      WHERE inv_before > 0 AND inv_after * 3 >= inv_before * 2 AND inv_after * 2 <= inv_before * 3
      ORDER BY wh_name, p_brand"""))

  /** TPC-DS q22 native shape: quarter-banded inventory rolled up over the
    * item hierarchy (brand → type) — exact SUM + COUNT instead of AVG so
    * the comparison stays integer-exact; rollup NULLs sort FIRST on both
    * engines (explicit NULLS FIRST — DuckDB defaults NULLS LAST). */
  val qDsInvRollup: Q = Q(
    run = (s, dir) => {
      val p = Tables.load(s, dir, "part") // unpruned dim: AQE decides
        .select(col("p_partkey"), col("p_brand"), col("p_type"))
      inv(s, dir)
        .filter(col("inv_date").between(lit("1997-01-01").cast("date"),
                                        lit("1997-03-31").cast("date")))
        .join(p, col("inv_item") === col("p_partkey"))
        .rollup(col("p_brand"), col("p_type"))
        .agg(sum(col("inv_qty")).cast("long").as("total_qty"), count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("p_brand"), asc_nulls_first("p_type"))
    },
    oracle = Some(s"""
      WITH $invSql
      SELECT p.p_brand, p.p_type, CAST(SUM(i.inv_qty) AS BIGINT) AS total_qty, COUNT(*) AS n
      FROM inv i JOIN part p ON p.p_partkey = i.inv_item
      WHERE i.inv_date BETWEEN DATE '1997-01-01' AND DATE '1997-03-31'
      GROUP BY ROLLUP(p.p_brand, p.p_type)
      ORDER BY p_brand NULLS FIRST, p_type NULLS FIRST"""))

  /** TPC-DS q37/q82 native shape: price-banded + brand-IN items whose
    * date-banded stock lands in a quantity band, semi-joined to order
    * activity in the same window (the store_sales leg). */
  val qDsInvDaterangeIn: Q = Q(
    run = (s, dir) => {
      val p = broadcast(Tables.load(s, dir, "part")
        .filter(col("p_retailprice").between(900, 940) &&
                col("p_brand").isin("Brand#11", "Brand#12", "Brand#23", "Brand#34"))
        .select(col("p_partkey"), col("p_name")))
      val sold = Tables.load(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
        .join(broadcast(Tables.load(s, dir, "orders")
          .filter(col("o_orderdate").between(lit("1996-01-01").cast("date"),
                                             lit("1996-06-30").cast("date")))
          .select(col("o_orderkey"))), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_partkey")).distinct()
      inv(s, dir)
        .filter(col("inv_date").between(lit("1996-01-01").cast("date"),
                                        lit("1996-06-30").cast("date")))
        .join(p, col("inv_item") === col("p_partkey"))
        .join(sold, col("inv_item") === col("l_partkey"), "left_semi")
        .groupBy(col("p_partkey"), col("p_name"))
        .agg(sum(col("inv_qty")).cast("long").as("qty"))
        .filter(col("qty").between(10, 500))
        .orderBy(col("p_partkey"))
    },
    oracle = Some(s"""
      WITH $invSql
      SELECT p.p_partkey, p.p_name, CAST(SUM(i.inv_qty) AS BIGINT) AS qty
      FROM inv i JOIN part p ON p.p_partkey = i.inv_item
      WHERE p.p_retailprice BETWEEN 900 AND 940
        AND p.p_brand IN ('Brand#11', 'Brand#12', 'Brand#23', 'Brand#34')
        AND i.inv_date BETWEEN DATE '1996-01-01' AND DATE '1996-06-30'
        AND p.p_partkey IN (SELECT l.l_partkey FROM lineitem l
                            JOIN orders o ON o.o_orderkey = l.l_orderkey
                            WHERE o.o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-06-30')
      GROUP BY 1, 2
      HAVING SUM(i.inv_qty) BETWEEN 10 AND 500
      ORDER BY p_partkey"""))

  /** TPC-DS q72 native shape: sales joined to inventory on (item,
    * warehouse) with a DATE-OFFSET residual (stock level observed within
    * the 5 days after the sale, below the sold quantity) — the keyed
    * equi-join carries the offset band as a residual predicate, exactly
    * the plan q72 stresses. */
  val qDsInvDateOffset: Q = Q(
    run = (s, dir) => {
      val sales = Tables.load(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"), col("l_shipdate").cast("date").as("sale_date"),
                expr("cast(floor(l_quantity) as bigint)").as("sold_qty"))
      val p = Tables.load(s, dir, "part") // unpruned dim: AQE decides
        .select(col("p_partkey"), col("p_brand"))
      sales
        .join(inv(s, dir),
          col("inv_item") === col("l_partkey") && col("inv_wh") === col("l_suppkey") &&
            col("inv_date").between(date_add(col("sale_date"), 1), date_add(col("sale_date"), 5)) &&
            col("inv_qty") < col("sold_qty"))
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_low_stock"))
        .orderBy(col("p_brand"))
    },
    oracle = Some(s"""
      WITH $invSql
      SELECT p.p_brand, COUNT(*) AS n_low_stock
      FROM lineitem l JOIN inv i ON i.inv_item = l.l_partkey AND i.inv_wh = l.l_suppkey
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE i.inv_date BETWEEN CAST(l.l_shipdate AS DATE) + 1 AND CAST(l.l_shipdate AS DATE) + 5
        AND i.inv_qty < CAST(FLOOR(l.l_quantity) AS BIGINT)
      GROUP BY p.p_brand ORDER BY p.p_brand"""))

  /** TPC-DS q83 native shape: three per-part RETURN counts over three
    * date windows all anchored on one SHARED scalar date subquery (the
    * d_week_seq-sharing mechanic), inner-joined three ways — parts
    * returned in all three windows, with the combined total. Returns are
    * the fixture's l_returnflag = 'R' rows. */
  val qDsReturnsSharedDates: Q = Q(
    run = (s, dir) => {
      val rets = Tables.load(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .select(col("l_partkey").as("p"), col("l_shipdate").cast("date").as("d"))
      // the shared scalar anchor (one-row broadcast, never a re-scan per leg)
      val anchor = broadcast(rets.agg(date_sub(max(col("d")), 400).as("a")))
      def win(lo: Int, hi: Int, cnt: String) = rets.crossJoin(anchor)
        .filter(col("d").between(date_add(col("a"), lo), date_add(col("a"), hi)))
        .groupBy(col("p")).agg(count(lit(1)).as(cnt))
      win(0, 60, "n1")
        .join(win(61, 120, "n2").withColumnRenamed("p", "p2"), col("p") === col("p2"))
        .join(win(121, 180, "n3").withColumnRenamed("p", "p3"), col("p") === col("p3"))
        .select(col("p").as("partkey"), col("n1"), col("n2"), col("n3"),
                (col("n1") + col("n2") + col("n3")).cast("long").as("total"))
        .orderBy(col("partkey"))
    },
    oracle = Some("""
      WITH rets AS (SELECT l.l_partkey AS p, CAST(l.l_shipdate AS DATE) AS d
                    FROM lineitem l WHERE l.l_returnflag = 'R'),
      anchor AS (SELECT max(d) - 400 AS a FROM rets),
      w1 AS (SELECT p, COUNT(*) AS n1 FROM rets, anchor WHERE d BETWEEN a AND a + 60 GROUP BY p),
      w2 AS (SELECT p, COUNT(*) AS n2 FROM rets, anchor WHERE d BETWEEN a + 61 AND a + 120 GROUP BY p),
      w3 AS (SELECT p, COUNT(*) AS n3 FROM rets, anchor WHERE d BETWEEN a + 121 AND a + 180 GROUP BY p)
      SELECT w1.p AS partkey, n1, n2, n3, CAST(n1 + n2 + n3 AS BIGINT) AS total
      FROM w1 JOIN w2 ON w2.p = w1.p JOIN w3 ON w3.p = w1.p
      ORDER BY partkey"""))

  /** TPC-DS q75 native shape: per-channel sales NET OF RETURNS unioned
    * (channels = the two linestatus pipelines, returns as negative
    * movements), rolled to (brand, year), self-joined year-over-year and
    * filtered to >10% declines — integer cross-multiplied, no float
    * ratio. */
  val qDsChannelDecline: Q = Q(
    run = (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      def channel(status: String, name: String) = li.filter(col("l_linestatus") === status)
        .select(col("l_partkey"), year(col("l_shipdate")).cast("long").as("yr"), lit(name).as("channel"),
          (expr("cast(floor(l_quantity) as bigint)") *
           when(col("l_returnflag") === "R", -1).otherwise(1)).as("q"))
      val chan = channel("O", "open").unionByName(channel("F", "filled"))
      val p = Tables.load(s, dir, "part") // unpruned dim: AQE decides
        .select(col("p_partkey"), col("p_brand"))
      val tot = chan.join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("yr"))
        .agg(sum(col("q")).cast("long").as("net"))
      val prev = tot.select(col("p_brand").as("pb"), col("yr").as("pyr"), col("net").as("prev_net"))
      tot.join(prev, col("p_brand") === col("pb") && col("pyr") === col("yr") - 1)
        .filter(col("net") * 10 < col("prev_net") * 9)
        .select(col("p_brand"), col("pyr").as("prev_yr"), col("yr").as("cur_yr"),
                col("prev_net"), col("net").as("cur_net"))
        .orderBy(col("p_brand"), col("cur_yr"))
    },
    oracle = Some("""
      WITH chan AS (
        SELECT l_partkey, EXTRACT(year FROM l_shipdate) AS yr, 'open' AS channel,
               CAST(FLOOR(l_quantity) AS BIGINT) * (CASE WHEN l_returnflag = 'R' THEN -1 ELSE 1 END) AS q
        FROM lineitem WHERE l_linestatus = 'O'
        UNION ALL
        SELECT l_partkey, EXTRACT(year FROM l_shipdate), 'filled',
               CAST(FLOOR(l_quantity) AS BIGINT) * (CASE WHEN l_returnflag = 'R' THEN -1 ELSE 1 END)
        FROM lineitem WHERE l_linestatus = 'F'),
      tot AS (SELECT p.p_brand, c.yr, CAST(SUM(c.q) AS BIGINT) AS net
              FROM chan c JOIN part p ON p.p_partkey = c.l_partkey GROUP BY 1, 2)
      SELECT c.p_brand, prev.yr AS prev_yr, c.yr AS cur_yr, prev.net AS prev_net, c.net AS cur_net
      FROM tot c JOIN tot prev ON prev.p_brand = c.p_brand AND prev.yr = c.yr - 1
      WHERE c.net * 10 < prev.net * 9
      ORDER BY c.p_brand, cur_yr"""))

  val all: Map[String, Q] = scala.collection.immutable.ListMap(
    "q_ds_inv_before_after" -> qDsInvBeforeAfter,
    "q_ds_inv_rollup" -> qDsInvRollup,
    "q_ds_inv_daterange_in" -> qDsInvDaterangeIn,
    "q_ds_inv_date_offset" -> qDsInvDateOffset,
    "q_ds_returns_shared_dates" -> qDsReturnsSharedDates,
    "q_ds_channel_decline" -> qDsChannelDecline,
  )
}
