package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.int_sqdist

/** Training-data valuation: EXACT kNN-Shapley (Jia et al., VLDB 2019,
  * "Efficient Task-Specific Data Valuation for Nearest Neighbor
  * Algorithms", Theorem 1). For an unweighted K-NN classifier the
  * Shapley value of every training point w.r.t. one test point has the
  * closed-form recurrence over the distance-sorted training order
  * α₁..α_N (nearest first):
  *
  *   s(α_N) = 1[y_{α_N} = y] / N
  *   s(α_i) = s(α_{i+1}) + (1[y_{α_i} = y] − 1[y_{α_{i+1}} = y]) / K
  *            · min(K, i) / i
  *
  * — O(N log N) per test point instead of the 2^N subset sum.
  *
  * Cross-engine discipline: distances are integer (the shared
  * [[SemDedup.quantizedArr]] quantization + codegen'd int_sqdist
  * kernel); each recurrence increment is carried as SCALED INTEGERS
  * with the positive and negative 1[..] contributions floored
  * SEPARATELY (both `div` operands non-negative — the q219/q224
  * div-bridge rule), so the suffix sum is exact integer addition and
  * the final per-point value hash-matches an independent SQL window
  * re-derivation. |error| vs the rational value ≤ N/scale per test
  * point (ValuationSpec pins the recurrence against brute-force exact
  * Shapley over all permutations on a tiny instance).
  *
  * Scale shape: the test panel is a FIXED-size probe set (bounded by
  * construction — the caller's filter must cap it), so candidate pairs
  * are O(n·|T|) with the tests BROADCAST; the per-test ranking is a
  * |T|-partition window (never global). |T| is the parallelism knob:
  * at 1000 executors you shard the panel, not the corpus.
  */
object Valuation {

  /** Per-training-point kNN-Shapley values, summed over the test
    * panel. Input needs (vec_id long, embedding array&lt;float&gt;,
    * label). `isTest` selects the probe panel (must be bounded);
    * everything else is the training set being valued. Output:
    * (vec_id, label, n_tests, shap_scaled) — shap_scaled is the sum
    * over test points of the scaled per-test value. */
  def knnShapley(emb: DataFrame, isTest: Column, kNeighbors: Int,
                 scale: Long = 1000000000L): DataFrame = {
    require(kNeighbors >= 1, s"kNeighbors must be >= 1: $kNeighbors")
    val kL = kNeighbors.toLong
    val qv = SemDedup.quantizedArr(emb)
      .join(emb.select(col("vec_id"), col("label").cast("long").as("label")),
        "vec_id")
    val tests = qv.filter(isTest)
      .select(col("vec_id").as("tid"), col("qa").as("tqa"),
        col("label").as("tlabel"))
    val pairs = qv.filter(not(isTest))
      .crossJoin(broadcast(tests))
      .select(col("tid"), col("vec_id").as("iid"), col("label"),
        when(col("label") === col("tlabel"), 1L).otherwise(0L).as("a"),
        int_sqdist(col("qa"), col("tqa")).as("d2"))
    val wRank = Window.partitionBy("tid").orderBy(col("d2"), col("iid"))
    val wTid = Window.partitionBy("tid")
    val ranked = pairs
      .withColumn("rn", row_number().over(wRank).cast("long"))
      .withColumn("n", count(lit(1)).over(wTid))
      .withColumn("a_next", lead(col("a"), 1).over(wRank))
      .withColumn("m", least(col("rn"), lit(kL)))
    val terms = ranked
      .withColumn("inc",
        when(col("rn") === col("n"), lit(0L)).otherwise(
          expr(s"(a * m * ${scale}L) div (${kL}L * rn)") -
            expr(s"(a_next * m * ${scale}L) div (${kL}L * rn)")))
      .withColumn("tn",
        when(col("rn") === col("n"), expr(s"(a * ${scale}L) div n"))
          .otherwise(lit(0L)))
    val wSuffix = Window.partitionBy("tid").orderBy(col("rn"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    terms
      .withColumn("sv", sum(col("inc") + col("tn")).over(wSuffix))
      .groupBy(col("iid").as("vec_id"))
      .agg(max(col("label")).as("label"),
        count(lit(1)).as("n_tests"),
        sum(col("sv")).as("shap_scaled"))
  }
}
