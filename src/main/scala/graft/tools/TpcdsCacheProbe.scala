package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off measurement: how much of a verbatim TPC-DS query's wall-clock
  * is re-deriving the star-schema views from the fixture tables (vs
  * reading a materialized dimensional model). Args: sfDir queryName... */
object TpcdsCacheProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val qs = args.drop(1)
    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("tpcds-cache-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Queries.all // registry init
    def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    // pass 1: as shipped (views re-derived inside each query)
    val cold = qs.map { q => q -> time(graft.Queries.all(q).run(spark, dir).collect()) }.toMap
    val warm1 = qs.map { q => q -> time(graft.Queries.all(q).run(spark, dir).collect()) }.toMap
    // pass 2: materialize every derived view once, re-register as cached
    graft.coverage.TpcdsVerbatimQueries.register(spark, dir)
    val mat = time {
      graft.coverage.TpcdsVerbatimQueries.viewNames.foreach { n =>
        val df = spark.table(n).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        df.count()
      }
    }
    val cached = qs.map { q => q -> time(graft.Queries.all(q).run(spark, dir).collect()) }.toMap
    println(f"materialize_all_views_sec=$mat%.2f")
    qs.foreach { q =>
      println(f"$q%-16s cold=${cold(q)}%6.2f warm=${warm1(q)}%6.2f cached=${cached(q)}%6.2f")
    }
    spark.stop()
  }
}
