package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-based nonparametric statistics — integer-exact cross-engine
  * where their float-percentile cousins are not.
  *
  * Mann–Whitney U (Wilcoxon rank-sum): for samples A, B inside a
  * stratum, U_A = #{(a,b): a > b} + ½·#{ties}. The O(n_A·n_B) pair
  * count collapses to rank arithmetic: with midranks r̄ over the
  * pooled sample, U_A = Σ_A r̄ − n_A(n_A+1)/2. Midranks are halves, so
  * everything is carried DOUBLED: 2r̄ = 2·rank + (#equal − 1) — pure
  * integers, giving 2U exactly (RankStatsSpec proves ≡ the brute-force
  * pair count). The z-score needs only (2U, n_a, n_b) plus the tie
  * correction — floats left to the consumer per the avg-class rule.
  *
  * Plan: ONE stratum-partitioned rank window + a (stratum, value)
  * count window over the same exchange, then a stratum groupBy — no
  * pairwise join, no global window; cost is the pooled sort per
  * stratum.
  */
object RankStats {

  /** Per stratum: `n_a`, `n_b`, `two_u` (doubled Mann–Whitney U of
    * side A vs side B). Rows whose `flagCol` is neither `flagA` nor
    * `flagB` are excluded. `valCol` must be integral. */
  def mannWhitney2U(df: DataFrame, strataCol: String, flagCol: String,
                    valCol: String, flagA: String, flagB: String): DataFrame = {
    val pooled = df
      .filter(col(flagCol).isin(flagA, flagB))
      .select(col(strataCol), col(flagCol),
        col(valCol).cast("long").as("_v"))
    val wRank = Window.partitionBy(strataCol).orderBy(col("_v"))
    val wEq = Window.partitionBy(strataCol, "_v")
    pooled
      .withColumn("_2r", lit(2L) * rank().over(wRank) +
        count(lit(1)).over(wEq) - lit(1L))
      .groupBy(strataCol)
      .agg(
        sum(when(col(flagCol) === flagA, 1L).otherwise(0L)).as("n_a"),
        sum(when(col(flagCol) === flagB, 1L).otherwise(0L)).as("n_b"),
        (sum(when(col(flagCol) === flagA, col("_2r")).otherwise(0L)) -
          sum(when(col(flagCol) === flagA, 1L).otherwise(0L)) *
          (sum(when(col(flagCol) === flagA, 1L).otherwise(0L)) + 1L))
          .as("two_u"))
  }
}
