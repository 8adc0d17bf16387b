package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank-biased overlap (Webber et al., TOIS 2010) between two rankings
  * of the same item universe — the standard top-weighted agreement
  * measure for comparing retrieval/curation orderings (did re-ranking
  * by a new quality score reshuffle the head of the corpus, or only the
  * tail?). Persistence p is fixed at 1/2 so every depth's geometric
  * weight is an EXACT power-of-two ladder: contribution at depth d =
  * ((|A∩B at d| · Scale) div d) div 2^(d−1) — two nested floor
  * divisions over non-negative longs, bit-identical in any engine, no
  * float geometric series.
  *
  * Scale design: the two rankings are consumed as TOP-K PREFIXES via
  * TakeOrderedAndProject (never a global rank window — the
  * single-partition killer); overlap at depth d ≤ K needs only those
  * prefixes, so the driver step is bounded by K BY CONTRACT (the
  * q229/PrefixSum two-level pattern), not by the item count.
  */
object RankCompare {

  val Scale = 1000000000000L

  /** Per-depth RBO table for items ranked by (scoreA DESC, item ASC)
    * vs (scoreB DESC, item ASC). `items` carries one row per item with
    * both scores (long columns). Output: (d, overlap, contrib_scaled)
    * for d = 1..k, ordered by d; Σ contrib_scaled is the scaled
    * truncated RBO at p = 1/2. */
  def rboDepthTable(items: DataFrame, itemCol: String,
                    scoreACol: String, scoreBCol: String,
                    k: Int): DataFrame = {
    require(k >= 1 && k <= 62, s"k must be in [1, 62]: $k")
    def topK(scoreCol: String): Array[String] = items
      .select(col(itemCol).cast("string").as("i"), col(scoreCol).as("s"))
      .orderBy(col("s").desc, col("i"))
      .limit(k) // TakeOrderedAndProject; driver rows bounded by k
      .collect().map(_.getString(0))
    val a = topK(scoreACol)
    val b = topK(scoreBCol)
    val rows = (1 to k).map { d =>
      val overlap = a.take(d).toSet.intersect(b.take(d).toSet).size.toLong
      (d, overlap, (overlap * Scale / d) >> (d - 1))
    }
    val spark = items.sparkSession
    import spark.implicits._
    rows.toDF("d", "overlap", "contrib_scaled").orderBy("d")
  }
}
