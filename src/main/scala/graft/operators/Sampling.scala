package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Systematic PPS (probability-proportional-to-size) sampling — the
  * deterministic weighted sampler of corpus curation: lay every
  * document's weight (chars, tokens, bytes) end to end on an integer
  * line, drop a boundary at every multiple of `step = total div target`,
  * and pick the document each boundary lands in. A document's pick
  * count is then EXACTLY proportional to its weight (a doc spanning k
  * boundaries is picked k times — the honest PPS semantic for docs
  * heavier than one step), there is no RNG anywhere, and any engine
  * re-derives the identical sample from the same order — which is what
  * makes the q260 oracle (a DuckDB global-window prefix sum) a genuine
  * independent formulation.
  *
  * Contrast with [[Curation]]'s hash-stratified sampler: that one is
  * uniform per stratum; this one is weight-proportional across the whole
  * corpus — the sampler used to draw token-budget-proportional eval
  * slices or to thin a corpus while preserving its length distribution.
  *
  * Scale: the prefix sum is [[PrefixSum.runningTotalLong]] — per-chunk
  * parallel windows plus an O(#chunks) driver offset scan, never a
  * global window (banned; see PlanAuditSpec). The grand total is one
  * aggregate collapsed to a driver scalar (the q236 fill-size pattern —
  * O(1) by contract). All arithmetic is BIGINT: boundary-crossing count
  * k_picks = (cum_before + w) div step − cum_before div step.
  */
object Sampling {

  /** Appends `cum_before` (exclusive prefix weight), `k_picks` and
    * `first_slot` (1-based index of the first boundary inside the doc)
    * and keeps only picked rows (k_picks ≥ 1, ~`target` of them).
    *
    * @param chunkWidth width of the id-range chunks feeding the
    *   two-level scan; pick so (max id)/chunkWidth stays driver-scale
    *   (it is the O(#chunks) term). */
  def ppsSystematic(df: DataFrame, idCol: String, weightCol: String,
                    target: Int, chunkWidth: Long): DataFrame = {
    require(target >= 1, s"target must be >= 1: $target")
    require(chunkWidth >= 1, s"chunkWidth must be >= 1: $chunkWidth")
    // grand total: one agg -> one driver scalar (bounded by contract)
    val tot = df.agg(sum(col(weightCol).cast("long"))).head().getLong(0)
    val step = tot / target
    require(step >= 1,
      s"total weight $tot < target $target: every row would be sampled")
    val run = PrefixSum.runningTotalLong(
      df, idCol, idCol, col(weightCol).cast("long"),
      expr(s"$idCol div ${chunkWidth}L"), "_run")
    run
      .withColumn("cum_before", col("_run") - col(weightCol).cast("long"))
      .withColumn("k_picks",
        expr(s"(cum_before + $weightCol) div ${step}L") -
          expr(s"cum_before div ${step}L"))
      .withColumn("first_slot", expr(s"cum_before div ${step}L") + lit(1L))
      .filter(col("k_picks") >= 1)
      .drop("_run")
  }
}
