package graft.coverage

import graft.Q
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-9: the iterative Gelly loops' partitioned fallback path,
  * oracle-gated (the 100×-design close-out). Each q_graph_*_part twin
  * forces `graft.graph.broadcastMaxRows = 0`, so the loop takes the path
  * a graph too big to broadcast would take on a real cluster — static
  * edge frame hash-partitioned on the loop join key once, per-iteration
  * shuffle_hash join building on the |V|-row state frame — and must
  * hash-match the SAME oracle as its broadcast twin (ref Gelly
  * PageRank.java / LabelPropagation.java / CommunityDetection.java /
  * HITS.java, which run on partitioned DataSets and never broadcast the
  * solution set).
  */
object Round9Queries {

  /** Run `body` with the loop broadcast threshold forced to zero. The
    * loops construct eagerly (every round localCheckpoints), so restoring
    * the conf afterwards cannot leak back into the returned plan. */
  private def partitioned[T](s: SparkSession)(body: => T): T = {
    val key = "graft.graph.broadcastMaxRows"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "0")
    try body
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  val qGraphPagerankPart: Q = Q(
    run = (s, dir) => partitioned(s) {
      graft.operators.GraphOps.pageRank(Round2Queries.coEdges(s, dir), iters = 10)
        .orderBy(col("v"))
    },
    oracle = Round2Queries.qGraphPagerank.oracle)

  val qGraphLabelPropPart: Q = Q(
    run = (s, dir) => partitioned(s) {
      graft.operators.GraphOps.labelPropagation(Round2Queries.coEdges(s, dir), iters = 3)
        .orderBy(col("v"))
    },
    oracle = Round7Queries.qGraphLabelProp.oracle)

  val qGraphCommunityPart: Q = Q(
    run = (s, dir) => partitioned(s) {
      graft.operators.GraphOps.communityDetection(Round2Queries.coEdges(s, dir), iters = 3)
        .orderBy(col("v"))
    },
    oracle = Round7Queries.qGraphCommunity.oracle)

  val qGraphHitsPart: Q = Q(
    run = (s, dir) => partitioned(s) {
      graft.operators.GraphOps.hits(Round2Queries.coEdges(s, dir), iters = 4)
        .orderBy(col("v"))
    },
    oracle = Round7Queries.qGraphHits.oracle)

  val all: Map[String, Q] = Map(
    "q_graph_pagerank_part" -> qGraphPagerankPart,
    "q_graph_label_prop_part" -> qGraphLabelPropPart,
    "q_graph_community_part" -> qGraphCommunityPart,
    "q_graph_hits_part" -> qGraphHitsPart)
}
