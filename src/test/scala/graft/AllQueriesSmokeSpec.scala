package graft

/** Regression guard: every coverage query runs green at sf0.001 (the
  * cross-engine hash gate is tools/check.py; this catches runtime breakage
  * without DuckDB). Oracle-less queries must still return deterministic
  * row counts across two runs. Each query's optimized plan also passes the
  * unpartitioned-window lint (VERDICT r14 #8, [[graft.tools.WindowLint]]):
  * a Window with no partitionBy is a single-task global sort at scale and
  * must be a hosted-verbatim text or carry a bounded-input justification. */
class AllQueriesSmokeSpec extends SparkTestBase {

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sfDir)
      val wins = graft.tools.WindowLint.unpartitionedWindows(df)
      assert(wins.isEmpty || graft.tools.WindowLint.isVerbatim(name) ||
        graft.tools.WindowLint.bounded.contains(name),
        s"$name plans an UNPARTITIONED window (single-task sort at 100 TB): " +
          s"${wins.mkString(" | ")}\nFix the plan (RankSplit / LIMIT-bounded input) " +
          "or justify a bound in WindowLint.bounded.")
      val n = df.count()
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
