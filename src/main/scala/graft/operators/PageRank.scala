package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer-exact PageRank over an edge list — the Pregel-style
  * iterate-until-k loop expressed as k rounds of (join ranks to edges,
  * aggregate contributions by destination).
  *
  * All arithmetic is scaled BIGINT: ranks start at `scale`, a node's
  * per-edge contribution is `rank div outdeg` (floor), and the damped
  * update is `(dampDen-dampNum)*scale div dampDen + dampNum*Σcontrib
  * div dampDen`. Floor division and long addition are exact and
  * order-independent, so the result is bit-identical across engines,
  * partitionings and runs — float PageRank can't be oracle-gated
  * (per-engine summation order), integer PageRank can (q97). The tiny
  * mass lost to flooring (< outdeg ulps per node per round) is the
  * price of determinism and is identical on both engines.
  *
  * Scale design: `edges` (with its outdegree pre-joined ONCE) is the
  * loop-invariant big side — localCheckpoint'd so the k iterations
  * re-read materialized partitions instead of recomputing the
  * scan+outdegree chain k times (and, unlike cache(), nothing lingers
  * in the CacheManager after the query, same reasoning as
  * Dedup.nearDupSurvivors); each
  * iteration is then one co-partitioned equi-join on src plus one
  * shuffle on dst for the contribution sum (map-side partial combine
  * absorbs high-outdeg fan-in). k iterations = k shuffles, the known
  * lower bound for message-passing PageRank. `broadcastRanks` (default
  * true) broadcasts the node-sized rank table into the edge join —
  * measured 1.6× faster end-to-end here because AQE cannot see the
  * mid-loop table's size to convert the join itself; flip it off for
  * graphs whose rank table exceeds executor memory (billions of
  * nodes), which degrades gracefully to a shuffled join on src.
  * Overflow bound (ANSI mode
  * throws rather than wraps): Σcontrib ≤ N·scale, so dampNum·Σ needs
  * N < 2^63/(scale·dampNum) ≈ 10^8 nodes at the default scale — raise
  * N by lowering `scale`.
  */
object PageRank {

  /** Ranks after `iters` rounds. `edges`: (src: BIGINT, dst: BIGINT),
    * duplicates allowed upstream but should be distinct for classic
    * semantics. Output: (node, rank) for every node appearing as src
    * or dst; sink nodes contribute nothing (standard dangling-mass
    * drop), source-only nodes keep the base rank. */
  def ranks(edges: DataFrame, iters: Int, scale: Long = 1000000000L,
            dampNum: Long = 85, dampDen: Long = 100,
            broadcastRanks: Boolean = true): DataFrame = {
    require(iters >= 1 && dampNum > 0 && dampNum < dampDen)
    val base = (dampDen - dampNum) * scale / dampDen
    // Materialize the edge list FIRST: nodes/outdeg/edgesDeg all re-read
    // the (possibly expensive) upstream edge derivation, so without this
    // the producer chain would run once per consumer lineage.
    val e = edges.localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val edgesDeg = e.join(outdeg, "src").localCheckpoint()
    var ranks = nodes.withColumn("rank", lit(scale))
    for (_ <- 1 to iters) {
      val rside = if (broadcastRanks) broadcast(ranks) else ranks
      val sums = edgesDeg.join(rside, col("src") === col("node"))
        .select(col("dst"), expr("rank div deg").as("contrib"))
        .groupBy("dst").agg(sum("contrib").as("mass"))
      ranks = nodes.join(sums, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(base) + expr(s"($dampNum * coalesce(mass, 0L)) div $dampDen"))
            .as("rank"))
    }
    ranks
  }
}
