package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by synchronous peeling (Matula & Beck's
  * algorithm, the distributed round-synchronous variant): repeatedly
  * delete every node whose degree in the induced subgraph is below k;
  * the fixpoint is the k-core — the standard density filter for graph
  * cleaning (drop barely-connected periphery before community/embedding
  * passes) and a building block of nucleus decompositions.
  *
  * Scale design: the edge list is the only state, re-materialized per
  * round ([[Iterate.materialize]] — lineage + stats hygiene) and
  * monotonically SHRINKING; each round is one map-side-combined degree
  * count plus two semi joins on the surviving nodes, all hashed on node
  * ids — no collect, no per-node loop. Round count is bounded by the
  * peeling depth (≤ V but tiny in practice: each round removes every
  * currently-underweight node at once).
  *
  * Determinism: pure set arithmetic over integer ids — no floats, no
  * tie-breaks (synchronous deletion makes the round sequence, and the
  * fixpoint is order-independent anyway: the k-core is the unique
  * maximal subgraph with min degree ≥ k). q134's oracle restates the
  * peel as maxRounds unrolled DuckDB CTEs; the engine early-exits at
  * the fixpoint and RAISES if still shrinking after maxRounds, so a
  * green row proves both engines reached the same fixpoint.
  */
object Kcore {

  /** The k-core of the undirected graph `edges` ("src", "dst" — feed
    * both directions). Returns (node, deg) = surviving nodes with their
    * in-core degree. Parallel edges collapse; self-loops are dropped
    * (a self-loop inflates its node's degree by 2 in no standard
    * definition of coreness). */
  def kcore(edges: DataFrame, k: Int, maxRounds: Int = 30): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    var e = Iterate.materialize(
      edges.select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct())
    var prev = -1L
    var deg: DataFrame = null
    var rounds = 0
    var converged = false
    while (!converged) {
      deg = Iterate.materialize(
        e.groupBy("src").agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= k)
          .select(col("src").as("node"), col("deg")))
      val m = deg.count()
      // the survivor set shrinks monotonically, so equal cardinality
      // means the SAME set: e is already induced on it -> fixpoint
      if (m == prev || m == 0) converged = true
      else {
        rounds += 1
        require(rounds <= maxRounds,
          s"Kcore.kcore: still peeling after $maxRounds rounds (raise " +
            "maxRounds; bound is the peeling depth of the graph)")
        prev = m
        val keep = deg.select("node")
        e = Iterate.materialize(
          e.join(keep.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
            .join(keep.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
            .select("src", "dst"))
      }
    }
    deg
  }

  /** The q134 oracle: `rounds` unrolled peeling rounds as DuckDB CTEs
    * over the CTE `edges` (symmetric, distinct, no self-loops) that
    * `edgesSql` must define. Kept beside the engine so the two can't
    * drift; the engine's fixpoint early-exit + maxRounds raise make
    * "rounds here ≥ true peeling depth" self-checking (see scaladoc). */
  def oracleSql(edgesSql: String, k: Int, rounds: Int): String = {
    // every CTE is AS MATERIALIZED: DuckDB inlines plain CTEs, and the
    // round chain would re-expand `edges` exponentially (observed as
    // "Too many open files" at 12 rounds before it even got slow)
    val sb = new StringBuilder
    sb.append(edgesSql)
    sb.append(",\nn0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges)")
    for (r <- 1 to rounds) {
      sb.append(
        s""",
           |d$r AS MATERIALIZED (
           |  SELECT e.src AS node, count(*) AS deg FROM edges e
           |  JOIN n${r - 1} a ON a.node = e.src
           |  JOIN n${r - 1} b ON b.node = e.dst
           |  GROUP BY 1),
           |n$r AS MATERIALIZED (SELECT node FROM d$r WHERE deg >= $k)""".stripMargin)
    }
    sb.append(
      s"""
         |SELECT node, deg FROM d$rounds WHERE deg >= $k
         |ORDER BY node""".stripMargin)
    sb.toString
  }
}
