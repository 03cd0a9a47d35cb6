package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: print the join/exchange/scan/aggregate skeleton of named
  * queries' physical plans — the quick `.explain` audit loop behind the
  * PlanSpec assertions. Usage:
  * `java -cp "classes:<spark jars>" graft.ExplainCheck q_tpch_q9 ...` */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      println(s"===== $q")
      val p = SparkEntry.queries(q)(spark, "/root/testdata/sf0.01").queryExecution.executedPlan.toString
      println(p.linesIterator.filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Scan parquet") || l.contains("HashAggregate")).map(_.trim.take(150)).mkString("\n"))
    }
    spark.stop()
  }
}
