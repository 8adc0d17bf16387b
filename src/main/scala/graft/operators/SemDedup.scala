package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  *
  * Cache ownership: persists internal frames the returned (lazy)
  * result depends on; the CALLER releases after materializing —
  * graft.Caches.releaseAll(spark) (docs/CACHE_POLICY.md rule 1).
  */
object SemDedup {

  val Scale = 1000000L

  /** (vec_id, d, q): floor-quantized dimension values. */
  def quantized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "x")))
      .select(col("vec_id"), col("d").cast("long").as("d"),
        floor(col("x").cast("double") * Scale.toDouble).cast("long").as("q"))

  /** (vec_id, qa): the SAME floor quantization as [[quantized]], kept as
    * ONE row per vector (array index = d). The pair stage joins THIS
    * frame so each candidate pair shuffles one row, not D — dots and
    * distances then come from the codegen'd int_dot/int_sqdist kernels,
    * bit-identical to the exploded join-on-d aggregates (integer
    * addition is exactly commutative; SemDedupSpec asserts equality
    * against the exploded formulation including null-element and
    * length-mismatch edges). The transform lambda captures only
    * literals, so the interpreted-HOF captured-expression trap
    * (CLAUDE.md ground rule) does not apply. */
  def quantizedArr(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * Scale.toDouble).cast("long")).as("qa"))

  /** Nearest-centroid assignment of a quantized frame against a
    * (seed, d, sq) centroid table: n·|seeds|·D join rows map-side
    * combined down to n·|seeds| before the shuffle; argmin with ties
    * to the smaller seed id = lexicographic struct min. */
  private def assignTo(qv: DataFrame, cents: DataFrame): DataFrame =
    qv.join(broadcast(cents), "d")
      .groupBy(col("vec_id"), col("seed"))
      .agg(sum((col("q") - col("sq")) * (col("q") - col("sq"))).as("dist"))
      .groupBy("vec_id")
      .agg(min(struct(col("dist"), col("seed"))).getField("seed").as("cluster"))

  private def seedTable(emb: DataFrame, qv: DataFrame, k: Int): DataFrame = {
    val seedIds = emb.select(col("vec_id").as("seed")).orderBy("seed").limit(k)
    qv.join(broadcast(seedIds), qv("vec_id") === col("seed"))
      .select(col("seed"), col("d"), col("q").as("sq"))
  }

  /** (vec_id, cluster) seed-centroid assignments — the linear stage of
    * the pipeline (one explode + broadcast centroid join + two
    * map-side-combined aggs), exposed for scale measurement. */
  def assignments(emb: DataFrame, k: Int): DataFrame = {
    val qv = quantized(emb).persist() // feeds seed projection + assignment
    assignTo(qv, seedTable(emb, qv, k))
  }

  /** Embedding-distribution drift between two corpus snapshots, read in
    * the quantized seed-cell space: assign EVERY vector (both
    * snapshots) to its nearest of the k smallest-id seed centroids,
    * then per cell compare the two sides' occupancy. Output per
    * cluster: n_a, n_b, each side's permille share, and the exact
    * cross-multiplied rate-difference numerator |n_a·N_b − n_b·N_a| as
    * a digit string — the drift ranking key, integer-exact at any
    * scale (DECIMAL(38,0) BEFORE the multiply: at 1e10 vectors a side
    * the product overflows BIGINT and ANSI throws — the q184/q185
    * pre-cast rule). The monitor a retrain pipeline runs between
    * snapshot N and N+1: a cell whose share moved is where the new
    * corpus differs semantically.
    *
    * Scale: assignment is the linear stage (explode + broadcast
    * centroid join + map-side-combined aggs); everything after is a
    * k-row frame. Side totals are driver scalars over that k-row frame
    * (bounded by contract). Persists the cell frame (two consumers);
    * caller releases (docs/CACHE_POLICY.md rule 1).
    *
    * @param sideB boolean column over `emb` marking snapshot-B rows. */
  def clusterDrift(emb: DataFrame, k: Int, sideB: Column): DataFrame = {
    val cell = assignments(emb, k)
      .join(emb.select(col("vec_id"), sideB.as("_b")), "vec_id")
      .groupBy("cluster")
      .agg(sum(when(col("_b"), 0L).otherwise(1L)).as("n_a"),
        sum(when(col("_b"), 1L).otherwise(0L)).as("n_b"))
      .persist()
    val tot = cell.agg(sum("n_a"), sum("n_b")).head()
    val (na, nb) = (tot.getLong(0), tot.getLong(1))
    require(na > 0 && nb > 0, s"both snapshots must be non-empty: $na/$nb")
    cell
      .withColumn("sh_a_permille", expr(s"n_a * 1000 div ${na}L"))
      .withColumn("sh_b_permille", expr(s"n_b * 1000 div ${nb}L"))
      .withColumn("drift_num",
        abs(col("n_a").cast("decimal(38,0)") * lit(nb) -
          col("n_b").cast("decimal(38,0)") * lit(na)).cast("string"))
  }

  /** Two-round integer Lloyd iteration: round-1 assignment to the k
    * smallest-id seed vectors, centroid update as the per-(cluster, d)
    * FLOOR-DIV mean, round-2 reassignment. Returns per round-2 cluster
    * (cluster, n_members, moved_in, idsum) where moved_in counts
    * members whose cluster changed between rounds. Quantized values are
    * SHIFTED by +Scale so every operand is non-negative: Spark's `div`
    * truncates toward zero while DuckDB's `//` floors, and they agree
    * only on non-negative operands (the q219 div-bridge rule); the
    * shift cancels in every distance. */
  def kmeansTwoRounds(emb: DataFrame, k: Int): DataFrame = {
    val qv = quantized(emb).withColumn("q", col("q") + Scale).persist()
    val a1 = assignTo(qv, seedTable(emb, qv, k)).persist()
    val cent = qv.join(a1, "vec_id")
      .groupBy(col("cluster").as("seed"), col("d"))
      .agg(expr("sum(q) div count(1)").as("sq"))
    assignTo(qv, cent)
      .join(a1.withColumnRenamed("cluster", "c1"), "vec_id")
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_members"),
        sum(when(col("c1") =!= col("cluster"), 1L).otherwise(0L)).as("moved_in"),
        sum("vec_id").as("idsum"))
      .orderBy("cluster")
  }

  /** Contrastive hard-negative mining: for each vector, the NEAREST
    * (quantized squared-L2) vector with a DIFFERENT label inside the
    * same SemDeDup cluster — the candidate generation step for
    * embedding-model training. The cluster blocking is part of the
    * semantics (the oracle applies it identically); ties resolve to
    * the smallest candidate id. Output (anchor, negative, d2) ordered
    * by anchor; vectors whose cluster holds no other label are absent.
    *
    * Scale: same within-cluster pair join and k-as-the-knob budget as
    * [[report]] — one row per candidate pair (the [[quantizedArr]]
    * form), argmin as a single lexicographic struct-min agg. */
  def hardNegatives(emb: DataFrame, k: Int): DataFrame = {
    import graft.functions.GraftFunctions.int_sqdist
    val qv = quantized(emb).persist()
    val asg = assignTo(qv, seedTable(emb, qv, k))
    // row-per-vector array frame: each candidate pair shuffles ONE row
    // (not D), and the distance is the codegen'd kernel — bit-identical
    // to the exploded join-on-d sum (SemDedupSpec)
    val av = quantizedArr(emb).join(asg, "vec_id")
      .join(emb.select(col("vec_id"), col("label")), "vec_id").persist()
    val cd = av.as("a").join(av.as("b"),
        col("a.cluster") === col("b.cluster") &&
          col("a.vec_id") =!= col("b.vec_id") &&
          col("a.label") =!= col("b.label"))
      .select(col("a.vec_id").as("anchor"), col("b.vec_id").as("cand"),
        int_sqdist(col("a.qa"), col("b.qa")).as("d2"))
      // a null d2 (no overlapping non-null dims) was never selectable in
      // the exploded form (min skips nulls, d2 = m fails) — drop it here
      .filter(col("d2").isNotNull)
    // argmin with ties to the smallest cand = lexicographic struct min:
    // ONE agg replaces the old min + join-back + filter (and its persist)
    cd.groupBy("anchor")
      .agg(min(struct(col("d2"), col("cand"))).as("m"))
      .select(col("anchor"), col("m.cand").as("negative"), col("m.d2").as("d2"))
      .orderBy("anchor")
  }

  /** kNN label agreement under the same cluster blocking as
    * [[hardNegatives]]: per anchor, the nearest OTHER vector in its
    * cluster (quantized squared-L2, ties to the smallest candidate
    * id), aggregated per label to (n_vecs, n_same) — the standard
    * embedding-quality eval "does my nearest neighbour share my
    * label", with the blocking as part of the semantics (the oracle
    * applies it identically). A vector alone in its cluster
    * contributes no row. All-integer. */
  def knnLabelAgreement(emb: DataFrame, k: Int): DataFrame = {
    import graft.functions.GraftFunctions.int_sqdist
    val qv = quantized(emb).persist()
    val asg = assignTo(qv, seedTable(emb, qv, k))
    val av = quantizedArr(emb).join(asg, "vec_id")
      .join(emb.select(col("vec_id"), col("label")), "vec_id").persist()
    val cd = av.as("a").join(av.as("b"),
        col("a.cluster") === col("b.cluster") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("anchor"), col("a.label").as("la"),
        col("b.vec_id").as("cand"), col("b.label").as("lb"),
        int_sqdist(col("a.qa"), col("b.qa")).as("d2"))
      .filter(col("d2").isNotNull) // mirror: null d2 was never the argmin
    // nearest = lexicographic min of (d2, cand, lb): cand is unique per
    // anchor so (d2, cand) picks the old ties-to-smallest-cand winner and
    // lb rides along — no min + join-back + label join-back (3 consumers
    // of a persisted pair frame collapse into one agg)
    cd.groupBy(col("anchor"), col("la"))
      .agg(min(struct(col("d2"), col("cand"), col("lb"))).as("m"))
      .groupBy(col("la").as("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("la") === col("m.lb"), 1L).otherwise(0L)).as("n_same"))
  }

  /** The near-dup pair frame (cluster, va, vb, na, nb, dot) plus the
    * assignment it was built against. Pair side is the row-per-vector
    * [[quantizedArr]] frame: norms are the row-local int_dot(qa, qa)
    * (no norms shuffle) and each candidate pair carries ONE row with
    * dot computed by the codegen'd kernel — the exploded join-on-d
    * form paid D shuffled rows per pair into the dot groupBy. A pair
    * sharing no non-null dimension has dot NULL here where the
    * exploded join emitted no row at all; both fail the dot &gt; 0
    * near-dup test, so downstream semantics are unchanged. */
  private def pairFrames(emb: DataFrame, k: Int): (DataFrame, DataFrame) = {
    import graft.functions.GraftFunctions.int_dot
    val qv = quantized(emb).persist() // seed projection + assignment
    val assign = assignTo(qv, seedTable(emb, qv, k))
    // cluster-tagged array frame: both sides of the pair join
    val av = quantizedArr(emb).join(assign, "vec_id")
      .withColumn("nrm", int_dot(col("qa"), col("qa")))
      .persist()
    val dots = av.as("a").join(av.as("b"),
        col("a.cluster") === col("b.cluster") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.cluster").as("cluster"),
        col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        col("a.nrm").as("na"), col("b.nrm").as("nb"),
        int_dot(col("a.qa"), col("b.qa")).as("dot"))
    (assign, dots)
  }

  private def nearDupOf(dots: DataFrame, tauNum: Long, tauDen: Long): DataFrame = {
    val dotDec = col("dot").cast("decimal(38,0)")
    dots.filter(col("dot") > 0 &&
      lit(tauDen * tauDen) * dotDec * dotDec >=
        lit(tauNum * tauNum) * col("na").cast("decimal(38,0)") *
          col("nb").cast("decimal(38,0)"))
  }

  /** The vec_ids a SemDeDup pass removes: members with a near-dup
    * (cos ≥ tauNum/tauDen) of smaller vec_id in the same cluster. */
  def droppedIds(emb: DataFrame, k: Int, tauNum: Long, tauDen: Long): DataFrame = {
    val (_, dots) = pairFrames(emb, k)
    nearDupOf(dots, tauNum, tauDen).select(col("vb").as("vec_id")).distinct()
  }

  /** Per-cluster dedup report: (cluster, n_members, n_dropped,
    * dropped_idsum), cluster = seed vec_id, dropped = members with a
    * near-dup (cos ≥ tauNum/tauDen) of smaller vec_id in the same
    * cluster. Ordered by cluster. */
  def report(emb: DataFrame, k: Int, tauNum: Long, tauDen: Long): DataFrame = {
    val (assign, dots) = pairFrames(emb, k)
    val dropped = nearDupOf(dots, tauNum, tauDen)
      .select(col("vb").as("vec_id")).distinct()
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
