package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over (vertices, edges) DataFrames — the Gelly analog
  * (SURVEY.md §1.1: Graph = "two DataFrames + iterative joins").
  *
  * Reference: flink-libraries/flink-gelly Graph.java (getDegrees) and
  * library algorithms (TriangleEnumerator / TriangleCount under
  * flink-gelly/.../library/clustering/).
  *
  * Edges are canonical undirected pairs (src < dst, distinct). Scale notes:
  * degrees = one explode + groupBy (map-side partial agg); triangles =
  * the standard two-join enumeration where every join is on an edge
  * endpoint — shuffles partition by vertex, so skewed hub vertices are the
  * known hazard (mitigate at 100 TB by degree-capping hubs first, the same
  * trick Gelly's TriangleEnumerator documents). */
object GraphOps {

  /** Vertex degrees of a canonical undirected edge list (cols src, dst). */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(explode(array(col("src"), col("dst"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("degree"))

  /** Connected components by iterative min-label propagation — the Gelly
    * ConnectedComponents library algorithm (flink-gelly/.../library/
    * ConnectedComponents.java), whose delta-iteration becomes a driver-side
    * loop over DataFrames (SURVEY §2.13 Iterations). Each round: every
    * vertex takes the min label among itself and its neighbors; stop when a
    * round changes nothing. Rounds = graph diameter; each round is one
    * shuffle-join on vertex id — the standard large-graph CC layout. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // each round is a join+agg over the (small after dedup) edge list; the
    // session's batch shuffle width just adds per-task overhead × rounds —
    // size the loop's shuffles to the data (driver-side iteration is already
    // the scale story here, per SURVEY §2.13 Iterations)
    val spark = edges.sparkSession
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try { connectedComponentsImpl(edges, maxIter) }
    finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  private def connectedComponentsImpl(edges: DataFrame, maxIter: Int): DataFrame = {
    val bi = edges.select(col("src").as("v"), col("dst").as("u"))
      .union(edges.select(col("dst").as("v"), col("src").as("u")))
      .distinct().cache()
    var labels = bi.select(col("v")).distinct().withColumn("label", col("v")).cache()
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val neighborMin = bi
        .join(labels.select(col("v").as("lv"), col("label")), col("u") === col("lv"))
        .groupBy(col("v")).agg(min(col("label")).as("nmin"))
        .select(col("v").as("nv"), col("nmin"))
      val next = labels.join(neighborMin, col("v") === col("nv"), "left")
        .select(col("v"), least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .cache()
      // convergence check is its own job — run it every other round (label
      // propagation converges in ~diameter rounds; one possibly-redundant
      // round is cheaper than a count per round)
      if (i % 2 == 1 || i >= maxIter - 1) {
        changed = next
          .join(labels.select(col("v").as("ov"), col("label").as("old")), col("v") === col("ov"))
          .filter(col("label") =!= col("old")).count()
      } else next.count() // materialize the cache so the lineage stays short
      labels.unpersist()
      labels = next
      i += 1
    }
    bi.unpersist()
    labels.withColumnRenamed("label", "component")
  }

  /** Triangle count per enumeration (a<b<c with all three edges present). */
  def triangles(edges: DataFrame): DataFrame = {
    val e1 = edges.select(col("src").as("a"), col("dst").as("b"))
    val e2 = edges.select(col("src").as("b2"), col("dst").as("c2"))
    val e3 = edges.select(col("src").as("a3"), col("dst").as("c3"))
    e1.join(e2, col("b") === col("b2"))
      .join(e3, col("a") === col("a3") && col("c2") === col("c3"))
      .select(col("a"), col("b"), col("c2").as("c"))
  }
}
