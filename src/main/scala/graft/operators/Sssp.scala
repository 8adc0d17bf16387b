package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted single-source (-set) shortest paths — frontier-based
  * Bellman–Ford relaxation, the weighted sibling of [[Bfs]] (which
  * counts hops): per round, only nodes whose tentative distance
  * IMPROVED last round relax their out-edges, candidate distances
  * min-combine per target (map-side combined aggregation), and the
  * distance table swaps in the improved rows. Work per round is
  * proportional to the improving frontier's out-neighborhood — on most
  * graphs that decays fast after the first few rounds — and the round
  * count is bounded by the maximum HOP length of any shortest weighted
  * path (≤ V−1 in the worst case, tiny on small-diameter graphs).
  *
  * Weights must be non-negative longs (checked): integer arithmetic
  * end-to-end makes every distance exact, so q124's DuckDB oracle — a
  * bounded recursive walk taking min(dist) per node — must hash-match
  * exactly. Parallel edges collapse to their min weight up front.
  * Unreachable nodes are absent from the output (the [[Bfs]]
  * convention). Convergence is detected (empty improving frontier);
  * hitting `maxRounds` with improvements still flowing raises rather
  * than returning non-minimal distances.
  */
object Sssp {

  /** Exact shortest weighted distances from `sources` ("node") over
    * directed `edges` ("src", "dst", "w") — feed both directions for an
    * undirected graph. Returns (node, dist); dist = 0 for sources. */
  def shortestPaths(edges: DataFrame, sources: DataFrame,
                    maxRounds: Int = 60): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"), col("w").cast("long").as("w"))
      .groupBy("src", "dst").agg(min(col("w")).as("w"))
      .localCheckpoint()
    require(e.filter(col("w") < 0).isEmpty,
      "Sssp.shortestPaths: negative edge weight (Bellman–Ford frontier " +
        "relaxation requires w >= 0 to terminate at shortest distances)")
    var dist = Iterate.materialize(
      sources.select(col("node").cast("long").as("node")).distinct()
        .withColumn("dist", lit(0L)))
    var frontier = dist
    var round = 0
    var improving = frontier.count()
    while (improving > 0 && round < maxRounds) {
      round += 1
      val cand = frontier.select(col("node").as("src"), col("dist"))
        .join(e, "src")
        .select(col("dst").as("node"), (col("dist") + col("w")).as("nd"))
        .groupBy("node").agg(min(col("nd")).as("nd"))
      val improved = Iterate.materialize(
        cand.join(dist.withColumnRenamed("dist", "old"), Seq("node"), "left")
          .filter(col("old").isNull || col("nd") < col("old"))
          .select(col("node"), col("nd").as("dist")))
      improving = improved.count()
      if (improving > 0) {
        // swap improved rows into the distance table; both sides are
        // already materialized, so the union is one cheap pass
        dist = Iterate.materialize(
          dist.join(improved.select("node"), Seq("node"), "left_anti")
            .unionByName(improved))
        frontier = improved
      }
    }
    require(improving == 0,
      s"Sssp.shortestPaths: distances still improving after $maxRounds " +
        "rounds (raise maxRounds; bound is the max hop length of a " +
        "shortest weighted path)")
    dist
  }
}
