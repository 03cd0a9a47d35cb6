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
