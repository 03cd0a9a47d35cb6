package graft

/** Regression guard: every coverage query runs green at sf0.001 (the
  * cross-engine hash gate is tools/check.py; this catches runtime breakage
  * without DuckDB). Oracle-less queries must still return deterministic
  * row counts across two runs. */
class AllQueriesSmokeSpec extends SparkTestBase {

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val n = fn(spark, sfDir).count()
      assert(n >= 0)
    }
  }

  test("oracle-less queries are deterministic across runs") {
    val oracleLess = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    oracleLess.foreach { name =>
      val a = SparkEntry.queries(name)(spark, sfDir).collect().map(_.toString).sorted.toSeq
      val b = SparkEntry.queries(name)(spark, sfDir).collect().map(_.toString).sorted.toSeq
      assert(a == b, s"$name nondeterministic")
    }
  }
}
