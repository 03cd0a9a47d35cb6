package graft

/** Smoke + semantics checks for the coverage queries at sf0.001.
  * The cross-engine hash gate is tools/check.py against DuckDB; these specs
  * assert shape/invariants so `sbt test` catches regressions without DuckDB. */
class QueriesSpec extends SparkTestBase {

  test("q1_pricing_summary: 6 flag/status groups, positive sums") {
    val df = SparkEntry.queries("q1_pricing_summary")(spark, sfDir)
    val rows = df.collect()
    assert(rows.length >= 4 && rows.length <= 6)
    val sumQty = rows.map(_.getAs[Double]("sum_qty")).sum
    assert(sumQty > 0)
    val counts = rows.map(_.getAs[Long]("count_order")).sum
    assert(counts <= 6000)
  }

  test("entry: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle name has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
