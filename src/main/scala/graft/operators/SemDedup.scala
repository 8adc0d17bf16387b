package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (public method: Abbas et al.,
  * "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication", 2023; reference repo has no counterpart — net-new
  * pipeline operator): cluster embeddings around seed centroids, then
  * mark within-cluster pairs whose cosine exceeds a threshold as
  * semantic duplicates, keeping the smallest id of each pair.
  *
  * Exact-integer variant (the q218 discipline): each dimension is
  * floor-quantized ×10^6 (floor is boundary-safe where round() flakes
  * cross-engine), so assignment distances, norms, dot products, and
  * the threshold test are all integral and the DuckDB oracle rebuilds
  * them bit-for-bit. The cosine test `cos(a,b) ≥ num/den` is the
  * cross-multiplied `dot > 0 ∧ den²·dot² ≥ num²·‖a‖²·‖b‖²` — dot and
  * the norms are BIGINT-safe (|q| ≤ 2^20, D=64 → |dot| ≤ 2^46) but
  * their SQUARES are not at corpus scale, so both sides pre-cast to
  * DECIMAL(38,0) before the multiply (the q185 rule: cast BEFORE
  * squaring an aggregate).
  *
  * Scale design: seeds are the k smallest vec_ids (deterministic;
  * the paper uses k-means centroids — any seed table plugs in).
  * Assignment is one explode + a broadcast join against the k·D-row
  * seed table + two map-side-combined aggs — no all-pairs term. The
  * within-cluster pair join is the PAPER'S intended cost: k is the
  * scale knob (k ∝ n keeps expected cluster size bounded, so pair
  * work is Σ_c |c|² ≈ n·(n/k)); the quantized frame and the
  * cluster-tagged frame are persisted because each feeds multiple
  * consumers (the AQE ReuseExchange rule).
  */
object SemDedup {

  val Scale = 1000000L

  /** (vec_id, d, q): floor-quantized dimension values. */
  def quantized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "x")))
      .select(col("vec_id"), col("d").cast("long").as("d"),
        floor(col("x").cast("double") * Scale.toDouble).cast("long").as("q"))

  /** Per-cluster dedup report: (cluster, n_members, n_dropped,
    * dropped_idsum), cluster = seed vec_id, dropped = members with a
    * near-dup (cos ≥ tauNum/tauDen) of smaller vec_id in the same
    * cluster. Ordered by cluster. */
  def report(emb: DataFrame, k: Int, tauNum: Long, tauDen: Long): DataFrame = {
    // quantized frame feeds the seed projection, the assignment join,
    // the norms agg, and the pair join — persist once
    val qv = quantized(emb).persist()
    val seedIds = emb.select(col("vec_id").as("seed")).orderBy("seed").limit(k)
    val seeds = qv.join(broadcast(seedIds), qv("vec_id") === col("seed"))
      .select(col("seed"), col("d"), col("q").as("sq"))
    // n·k·D rows, map-side combined down to n·k before the shuffle
    val dists = qv.join(broadcast(seeds), "d")
      .groupBy(col("vec_id"), col("seed"))
      .agg(sum((col("q") - col("sq")) * (col("q") - col("sq"))).as("dist"))
    // argmin with ties to the smaller seed id = lexicographic struct min
    val assign = dists.groupBy("vec_id")
      .agg(min(struct(col("dist"), col("seed"))).getField("seed").as("cluster"))
    val norms = qv.groupBy("vec_id").agg(sum(col("q") * col("q")).as("nrm"))
    // cluster-tagged quantized frame: both sides of the pair join
    val av = qv.join(assign, "vec_id").join(norms, "vec_id").persist()
    val dots = av.as("a").join(av.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.d") === col("b.d") &&
          col("a.vec_id") < col("b.vec_id"))
      .groupBy(col("a.cluster").as("cluster"),
        col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        col("a.nrm").as("na"), col("b.nrm").as("nb"))
      .agg(sum(col("a.q") * col("b.q")).as("dot"))
    val dotDec = col("dot").cast("decimal(38,0)")
    val nearDup = dots.filter(col("dot") > 0 &&
      lit(tauDen * tauDen) * dotDec * dotDec >=
        lit(tauNum * tauNum) * col("na").cast("decimal(38,0)") *
          col("nb").cast("decimal(38,0)"))
    val dropped = nearDup.select(col("vb").as("vec_id")).distinct()
      .join(assign, "vec_id")
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_dropped"), sum("vec_id").as("idsum"))
    assign.groupBy("cluster").agg(count(lit(1)).as("n_members"))
      .join(dropped, Seq("cluster"), "left")
      .select(col("cluster"), col("n_members"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        coalesce(col("idsum"), lit(0L)).as("dropped_idsum"))
      .orderBy("cluster")
  }
}
