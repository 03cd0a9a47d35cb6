package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off measurement behind the round-13 CTE-materialization decision
  * (EngineEnv.sqlQuery NOTE): how much of a multi-referenced-CTE query's
  * executed plan does AQE's runtime exchange reuse already deduplicate?
  * The reference reuses identical-digest subplans at plan time
  * (flink-table-planner-blink/.../plan/reuse/SubplanReuser.scala:54);
  * Spark's analog is ReusedExchange — q14a shows 37 of them, i.e. its
  * triple-referenced cross_items CTE computes its heavy shuffles once,
  * which is why an explicit persist-per-CTE pass measured as a pure loss.
  * Prints post-execution ReusedExchange / scan counts + wall time per
  * query. Args: sfDir queryName... */
object PlanReuseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val qs = args.drop(1)
    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("plan-reuse-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Queries.all // registry init
    // SPARK_GRAFT_PROBE_ACTION=count replicates the bench's timed action
    // (count() column-prunes the plan top-down, which can specialize shared
    // subtrees differently than collect() — the r15 dsir find)
    val useCount = sys.env.get("SPARK_GRAFT_PROBE_ACTION").contains("count")
    qs.foreach { q =>
      val t0 = System.nanoTime()
      val df0 = graft.Queries.all(q).run(spark, dir)
      // count() plans its OWN aggregate query — to inspect the plan that
      // actually executed under the bench's action, build the equivalent
      // frame explicitly and collect it
      val df = if (useCount) df0.groupBy().count() else df0
      val collected = df.collect()
      // under =count the interesting number is the counted value, not the
      // 1-row count frame's length
      val n = if (useCount) collected(0).getLong(0) else collected.length.toLong
      val secs = (System.nanoTime() - t0) / 1e9
      // AQE prints "== Final Plan ==" followed by "== Initial Plan ==";
      // only the final plan executed — counting both doubles every number
      val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      def c(p: String) = p.r.findAllIn(fin).length
      println(f"$q rows=$n secs=$secs%.2f scans=${c("Scan parquet")} " +
        f"reusedExchange=${c("ReusedExchange")} exchange=${c("Exchange")} " +
        f"tableCache=${c("InMemoryTableScan")}")
      // SPARK_GRAFT_PROBE_PLAN=1: print the executed plan (final section
      // only) for eyeballing which subtrees failed to canonicalize
      if (sys.env.get("SPARK_GRAFT_PROBE_PLAN").contains("1")) println(fin)
    }
    spark.stop()
  }
}
