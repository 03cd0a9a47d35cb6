package graft

import org.apache.spark.sql.functions._

/** Round-10 specs: the iterative graph loops' shuffle width follows the
  * session conf (r9 VERDICT #3 — the loops used to hardcode
  * spark.sql.shuffle.partitions=4/8, capping the partitioned fallback's
  * every per-iteration exchange at toy parallelism on exactly the
  * cluster-sized graphs the fallback exists for). Contract: ambient width
  * by default, `graft.graph.loopShufflePartitions` narrows it for one
  * loop, and the override is restored afterwards. */
class Round10Spec extends SparkTestBase {

  private def lcgEdges(n: Int) = {
    val s = spark
    import s.implicits._
    var x = 11L
    val buf = scala.collection.mutable.ListBuffer[(Long, Long)]()
    for (a <- 0 until n; b <- a + 1 until n) {
      x = (x * 1103515245L + 12345L) % 2147483648L
      if (x % 10 < 3) buf += ((a.toLong, b.toLong))
    }
    buf.toSeq.toDF("src", "dst")
  }

  /** Output frame of a loop = the last iteration's shuffle, so its
    * partition count IS the loop's exchange width (AQE off so no
    * post-shuffle coalesce hides it). */
  private def loopWidth(parts: Option[String], ambient: String): Int = {
    val conf = spark.conf
    val prev = conf.get("spark.sql.shuffle.partitions")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.shuffle.partitions", ambient)
    conf.set("graft.graph.broadcastMaxRows", "0") // force the partitioned path
    parts.foreach(conf.set("graft.graph.loopShufflePartitions", _))
    try graft.operators.GraphOps.pageRank(lcgEdges(40), iters = 2).rdd.getNumPartitions
    finally {
      conf.unset("graft.graph.broadcastMaxRows")
      conf.unset("graft.graph.loopShufflePartitions")
      conf.set("spark.sql.shuffle.partitions", prev)
      conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("graph loop shuffle width follows the ambient conf when the knob is unset") {
    assert(loopWidth(None, ambient = "5") == 5)
    assert(loopWidth(None, ambient = "7") == 7)
  }

  test("graft.graph.loopShufflePartitions narrows the loop width and is restored") {
    assert(loopWidth(Some("3"), ambient = "7") == 3)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == "4",
      "loop override leaked into the session conf")
  }
}
