package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) —
  * the standard hybrid-retrieval combiner: given k rankings of the same
  * item universe (a sparse BM25 list, a dense ANN list, ...), each item
  * scores Σ_lists 1/(K + rank). RRF needs only RANKS, never the
  * incomparable raw scores, which is exactly why it is the default
  * fusion in RAG stacks (the reference's retrieval surface is a single
  * remote keyword ranking, optimade_database/Optimade_Server/
  * server.py:106-120; fusing it with an embedding ranking is the
  * training-pipeline extension).
  *
  * Cross-engine arithmetic: contributions are integer-scaled floors,
  * `Scale div (K + rank)` over longs (the q220 div discipline — no
  * float reciprocals to accumulate), so fused scores and their ordering
  * hash-match any engine bit for bit.
  *
  * Scale design: input rankings are TOP-N PREFIXES (each produced by
  * TakeOrderedAndProject upstream — the q272 contract), so the union
  * carries Σ|lists|·N rows regardless of corpus size; the fusion is one
  * groupBy over that bounded frame. Nothing here touches the corpus.
  */
object RankFusion {

  val Scale = 1000000L

  /** Fuse named rankings. Each input frame carries (query_id, id, rank)
    * with rank ∈ 1..N (any extra columns are dropped). Output: one row
    * per (query_id, id) seen in ANY list — (query_id, id, n_lists,
    * rrf_scaled, <name>_rank per input list, 0 = absent from that
    * list), ordered by the caller. */
  def rrf(rankings: Seq[(String, DataFrame)], kRrf: Long = 60L): DataFrame = {
    require(rankings.nonEmpty, "rrf: at least one ranking")
    require(rankings.map(_._1).distinct.size == rankings.size,
      "rrf: ranking names must be distinct")
    val tagged = rankings.map { case (name, df) =>
      df.select(col("query_id"), col("id"),
        col("rank").cast("long").as("rank"), lit(name).as("_list"))
    }.reduce(_.unionByName(_))
    val perList = rankings.map { case (name, _) =>
      coalesce(max(when(col("_list") === name, col("rank"))), lit(0L))
        .as(s"${name}_rank")
    }
    tagged
      .withColumn("_contrib", expr(s"${Scale}L div (${kRrf}L + rank)"))
      .groupBy(col("query_id"), col("id"))
      .agg(count(lit(1)).as("n_lists"),
        sum(col("_contrib")).as("rrf_scaled") +: perList: _*)
  }
}
