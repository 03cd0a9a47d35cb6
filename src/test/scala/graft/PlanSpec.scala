package graft

/** Physical-plan assertions — the scale contract (SURVEY §4 / the 100 TB
  * design rules): filters and column pruning reach the parquet scan, small
  * dims broadcast, sort+limit plans TakeOrdered, rank-filter plans the
  * window-group-limit pushdown, aggregation is two-phase. Golden-plan
  * analog of the reference's 183 plan-XML tests, scoped to what we rely on. */
class PlanSpec extends SparkTestBase {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q1: shipdate filter is pushed into the parquet scan") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"))
  }

  test("q1: aggregation is two-phase (partial + final HashAggregate)") {
    val p = plan("q1_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("q_calc: unused columns pruned from the scan") {
    val p = plan("q_calc")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.nonEmpty && !readSchema.contains("l_partkey") && !readSchema.contains("l_tax"))
  }

  test("q_join_inner_bcast: small dims are broadcast, not shuffled") {
    val p = plan("q_join_inner_bcast")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q_sort_limit: plans TakeOrderedAndProject (per-partition top-K)") {
    assert(plan("q_sort_limit").contains("TakeOrderedAndProject"))
  }

  test("q_topn_per_group: rank filter pushes a group limit below the shuffle") {
    // Spark's WindowGroupLimit: only the per-partition top-N rows reach the
    // window sort — the difference between shuffling N rows and the world.
    assert(plan("q_topn_per_group").contains("WindowGroupLimit"))
  }

  test("q_join_theta: equi+residual join does NOT plan a nested-loop cartesian") {
    val p = plan("q_join_theta")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q_pipe_ann_brute: query side broadcast against corpus scan") {
    assert(plan("q_pipe_ann_brute").contains("BroadcastNestedLoopJoin") ||
      plan("q_pipe_ann_brute").contains("BroadcastHashJoin"))
  }
}
