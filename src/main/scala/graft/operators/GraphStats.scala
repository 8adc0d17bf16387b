package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Neighborhood profiling over an edge list — the degree/2-hop feature
  * family every graph pipeline derives before ML or sampling passes.
  * Pure integer set arithmetic on (src, dst) pairs; all outputs BIGINT.
  */
object GraphStats {

  /** Per-node count of DISTINCT nodes exactly two hops away: reachable
    * via some neighbor, not a direct neighbor, not the node itself —
    * the friend-of-friend candidate pool of link prediction.
    *
    * Plan: one self-join through the shared middle node (cost Σ deg(m)²
    * over middles — the true 2-path count, never |V|²), distinct to
    * collapse multiple witnesses, one anti join to remove direct
    * neighbors, one count per source. Every join hashes on a node id;
    * no cartesian anywhere. Input must be symmetric for undirected
    * semantics (feed both directions). */
  def twoHopCounts(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val hop2 = e.select(col("src").as("a"), col("dst").as("m"))
      .join(e.select(col("src").as("m"), col("dst").as("b")), "m")
      .filter(col("a") =!= col("b"))
      .select("a", "b").distinct()
    hop2.join(e.select(col("src").as("a"), col("dst").as("b")),
        Seq("a", "b"), "left_anti")
      .groupBy(col("a").as("node"))
      .agg(count(lit(1)).as("n_twohop"))
  }

  /** Degree histogram: (deg, n_nodes) — how many nodes have each
    * degree. One degree count + one tiny re-aggregation. */
  def degreeHistogram(edges: DataFrame): DataFrame = {
    edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .groupBy("src").agg(count(lit(1)).as("deg"))
      .groupBy("deg").agg(count(lit(1)).as("n_nodes"))
  }
}
