package graft

import graft.tools.PlanGolden

/** Optimized-plan golden snapshots for the dialect-rewrite surfaces —
  * the `TableTestBase.verifyPlan` analog (ref flink-table-planner-blink
  * TableTestBase.scala:82,270-282, which pins 183 plan XMLs): a refactor
  * of the MATCH_RECOGNIZE front-end, the group-window rewrite, the
  * temporal-join/temporal-table-function rewrites or the LATERAL TABLE
  * rewriter now diffs loudly against a committed plan instead of only
  * failing (or silently de-optimizing) end-to-end.
  *
  * On an INTENTIONAL rewrite change, regenerate with
  * `graft.tools.PlanGolden` (see its scaladoc) and review the plan diff
  * like any other code change.
  */
class PlanGoldenSpec extends SparkTestBase {

  private val fixture = sys.env.getOrElse("SPARK_GRAFT_PLAN_SF_DIR", "/root/testdata/sf0.001")

  for ((snap, qname) <- PlanGolden.targets) {
    test(s"$snap optimized plan matches the committed golden ($qname)") {
      assume(new java.io.File(s"$fixture/lineitem.parquet").exists(),
        s"plan-golden fixture not found at $fixture")
      val in = getClass.getResourceAsStream(s"/plan_golden/$snap.txt")
      assert(in != null, s"missing golden /plan_golden/$snap.txt — run graft.tools.PlanGolden")
      val want = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      val got = PlanGolden.normalizedPlan(Queries.all(qname).run(spark, fixture))
      if (got != want) {
        val g = got.linesIterator.toVector
        val w = want.linesIterator.toVector
        val firstDiff = g.zipAll(w, "<missing>", "<missing>").indexWhere { case (a, b) => a != b }
        fail(s"$snap plan drifted from the golden (first diff at line $firstDiff):\n" +
          s"  got    ${g.lift(firstDiff).getOrElse("<missing>")}\n" +
          s"  golden ${w.lift(firstDiff).getOrElse("<missing>")}\n" +
          "If the rewrite change is intentional, regenerate via graft.tools.PlanGolden " +
          "and review the full plan diff.")
      }
      assert(got.linesIterator.size > 1, "a one-line plan would be a vacuous pin")
    }
  }
}
