package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** Densest-subgraph peel profile (Charikar's greedy approximation in
  * Bahmani et al.'s round-synchronous form, VLDB 2012, ε = 1/2):
  * repeatedly delete every node whose degree is at most 1.5× the
  * current average; the round whose density e/n is maximal
  * 2(1+ε) = 3-approximates the densest subgraph — the community-core
  * extractor (spam-link farms, boilerplate template clusters) that
  * k-core's fixed threshold can't target.
  *
  * Termination bound, exact: with avg = m2/n (m2 = Σ degrees), fewer
  * than 2n/3 nodes can have deg > 1.5·avg (else Σ deg > m2), so every
  * round removes ≥ n/3 → ≤ ⌈log₁.₅ n⌉ + 1 rounds (3–4 rounds on the
  * trade graph in practice). The peel threshold is the integer
  * cross-product 2·deg·n ≤ 3·m2 in DECIMAL(38,0) — at 10¹⁰ nodes the
  * product overflows a long and ANSI throws (the q184/q185 headroom
  * rule); DuckDB mirrors it in HUGEINT.
  *
  * Scale design (the [[Kcore]] shape): edge list is the only
  * distributed state, re-materialized per round and monotonically
  * shrinking; each round is one map-side-combined degree count, one
  * 1-row stats aggregate (driver scalars n, m2 — bounded by contract),
  * and two node semi joins. "Nodes" are endpoints of surviving edges —
  * a round that isolates a node drops it with its last edge.
  *
  * Output: one row per non-empty round, (round, n_nodes, n_edges),
  * round 0 = the input graph; density ranking and the argmax round are
  * the consumer's (e/n floats stay out of the hash-gated frame). The
  * oracle ([[oracleSql]]) unrolls the identical rounds as materialized
  * DuckDB CTEs; the engine raises past `maxRounds`, so a green row
  * proves both engines walked the same peel.
  */
object Densest {

  /** Peel profile of the undirected graph `edges` ("src"/"dst", feed
    * both directions; parallel edges collapse, self-loops drop). */
  def peelProfile(edges: DataFrame, maxRounds: Int = 30): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    var e = Iterate.materialize(
      edges.select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct())
    val out = ArrayBuffer.empty[(Int, Long, Long)]
    var round = 0
    var done = false
    while (!done) {
      val deg = Iterate.materialize(
        e.groupBy("src").agg(count(lit(1)).as("deg"))
          .select(col("src").as("node"), col("deg")))
      val stats = deg.agg(count(lit(1)).as("n"),
        coalesce(sum("deg"), lit(0L)).as("m2")).head()
      val n = stats.getLong(0)
      val m2 = stats.getLong(1)
      if (n > 0) out += ((round, n, m2 / 2))
      if (n == 0) done = true
      else {
        round += 1
        require(round <= maxRounds,
          s"Densest.peelProfile: still peeling after $maxRounds rounds " +
            "(bound is ⌈log₁.₅ n⌉ + 1 — raise maxRounds)")
        val keep = deg
          .filter(expr(s"cast(deg as decimal(38,0)) * ${n}L * 2 > " +
            s"3 * cast(${m2}L as decimal(38,0))"))
          .select("node")
        e = Iterate.materialize(
          e.join(keep.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
            .join(keep.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
            .select("src", "dst"))
      }
    }
    out.toSeq.toDF("round", "n_nodes", "n_edges")
  }

  /** `rounds` unrolled peel rounds as DuckDB CTEs over the CTE `edges`
    * (symmetric, distinct, no self-loops) that `edgesSql` must define —
    * the [[Kcore.oracleSql]] technique, with the per-round stats CTE
    * carrying (n, m2) for the HUGEINT cross-product threshold. Every
    * CTE is AS MATERIALIZED (DuckDB would re-expand the round chain
    * exponentially otherwise). */
  def oracleSql(edgesSql: String, rounds: Int): String = {
    val sb = new StringBuilder
    sb.append(edgesSql)
    sb.append(",\nn0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges)")
    for (r <- 0 until rounds) {
      sb.append(
        s""",
           |d$r AS MATERIALIZED (
           |  SELECT e.src AS node, count(*) AS deg FROM edges e
           |  JOIN n$r a ON a.node = e.src
           |  JOIN n$r b ON b.node = e.dst
           |  GROUP BY 1),
           |s$r AS MATERIALIZED (
           |  SELECT count(*) AS n, COALESCE(sum(deg), 0) AS m2 FROM d$r),
           |n${r + 1} AS MATERIALIZED (
           |  SELECT node FROM d$r, s$r
           |  WHERE CAST(deg AS HUGEINT) * n * 2 > 3 * CAST(m2 AS HUGEINT))""".stripMargin)
    }
    sb.append("\n")
    sb.append((0 until rounds).map(r =>
      s"""SELECT $r AS round, CAST(n AS BIGINT) AS n_nodes,
         |  CAST(m2 // 2 AS BIGINT) AS n_edges FROM s$r WHERE n > 0""".stripMargin)
      .mkString("\nUNION ALL\n"))
    sb.append("\nORDER BY round")
    sb.toString
  }
}
