package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Neyman-allocated stratified sampling: per group (e.g. region), a
    * fixed budget of `seatsPerGrp` sample slots is split across strata
    * (e.g. nations) proportionally to N_h·σ_h — the variance-optimal
    * allocation for estimating a mean — then each stratum's quota is
    * filled by deterministic hash order (md5 of the id, the q247
    * engine-neutral shuffle), so the whole design is re-derivable by
    * any engine with zero RNG.
    *
    * Cross-engine arithmetic: N_h·σ_h = √(N_h·Σx² − (Σx)²) exactly;
    * the radicand is assembled in DECIMAL(38,0) (x² sums overflow
    * BIGINT at corpus scale — the q184 rule), cast once to DOUBLE
    * (both engines round-to-nearest the same integer) and floored
    * after the IEEE sqrt (bit-identical cross-engine, the q245 rule).
    * Seats then flow through [[Apportion.largestRemainder]] (Hamilton:
    * Σ alloc = seats exactly, ±1 fairness).
    *
    * Scale shape: one stratum agg, one group-partitioned Hamilton
    * window over the STRATUM-sized frame, one stratum-partitioned
    * selection window over the population (never global), one
    * join-back on (group, stratum) — the compound key per the
    * quantileNormalize lesson (stratum names need not be globally
    * unique). */
  def neymanSelect(pop: DataFrame, grpCol: String, stratumCol: String,
                   idCol: String, xCol: String, seatsPerGrp: Int): DataFrame = {
    val c = pop.select(col(grpCol), col(stratumCol),
      col(idCol).cast("long").as("_id"), col(xCol).cast("long").as("_x"))
    val st = c.groupBy(col(grpCol), col(stratumCol))
      .agg(count(lit(1)).as("n_h"),
        // cast BEFORE squaring (q184 rule): x*x in LONG throws under
        // ANSI for |x| >= ~3.04e9; the RankStats tie-term pattern
        sum(col("_x").cast("decimal(38,0)") * col("_x")).as("_sxx"),
        sum(col("_x").cast("decimal(38,0)")).as("_sx"))
      .withColumn("w",
        floor(sqrt((col("n_h") * col("_sxx") - col("_sx") * col("_sx"))
          .cast("double"))).cast("long"))
    val al = Apportion.largestRemainder(
        st.select(col(grpCol), col(stratumCol), col("w")),
        grpCol, stratumCol, "w", seatsPerGrp)
      .join(st.select(col(grpCol), col(stratumCol), col("n_h")),
        Seq(grpCol, stratumCol))
    val wSel = Window.partitionBy(col(grpCol), col(stratumCol))
      .orderBy(md5(col("_id").cast("string")), col("_id"))
    c.withColumn("_srn", row_number().over(wSel).cast("long"))
      .join(al, Seq(grpCol, stratumCol))
      .groupBy(col(grpCol), col(stratumCol), col("n_h"), col("w"),
        col("alloc"))
      .agg(sum(when(col("_srn") <= col("alloc"), 1L).otherwise(0L))
          .as("sel_n"),
        sum(when(col("_srn") <= col("alloc"), col("_id")).otherwise(0L))
          .as("sel_idsum"))
  }
}
