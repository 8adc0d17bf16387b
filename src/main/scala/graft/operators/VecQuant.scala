package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Equi-depth vector quantization for embedding columns — the
  * scalar-quantization step of product-quantization ANN (Jégou et al.
  * PQ; the int8 compression every vector store applies before scale),
  * built RANK-based so it is integer-exact cross-engine: per-dimension
  * codebook bounds are the values at DISCRETE ranks ⌈n·j/B⌉ (no float
  * midpoints, no round()), a vector's code per dim is the COUNT of
  * bounds ≤ value — an integer in [0, B−1] — and quantized similarity
  * is the L1 distance between code vectors, a BIGINT. Where min/max
  * affine int8 quantization would put ties on rounding boundaries (the
  * round() ground-rule class), rank counting is exact.
  *
  * Scale design: the codebook is D independent rank problems in ONE
  * shuffle keyed by dim (partition count = D; at corpus scale you'd
  * compute bounds on a hash-sample — the bounds are statistics, not
  * per-row state); codes need only the tiny (D·(B−1)-row) codebook
  * broadcast back, collapsed to one sorted array per dim so the
  * per-element work is an array count, not a ×(B−1) join blow-up.
  * Quantized scoring scans integer codes (8× smaller than float32);
  * the production path composes with IVF cell pruning (q54) — q215
  * gates the quantizer + scorer end to end.
  */
object VecQuant {

  /** (vec_id, dim, val) exploded view. */
  def exploded(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).as("vec_id"),
        posexplode(col(vecCol)).as(Seq("dim", "v")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        col("v").cast("double").as("val"))

  /** Per-dim codebook: (dim, bounds) with bounds = the SORTED B−1
    * values at ranks ⌈n·j/B⌉ (j = 1..B−1) of the (val, vec_id) total
    * order — duplicates kept, so skewed dims still emit B−1 entries. */
  def codebook(emb: DataFrame, idCol: String, vecCol: String, buckets: Int): DataFrame = {
    require(buckets >= 2 && buckets <= 256, "buckets: 2..256")
    val x = exploded(emb, idCol, vecCol)
    val w = Window.partitionBy("dim").orderBy("val", "vec_id")
    val r = x.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("dim")))
    val isBound = (1 until buckets)
      .map(j => col("rn") === expr(s"(cnt * $j + ${buckets - 1}) div $buckets"))
      .reduce(_ || _)
    r.filter(isBound)
      .groupBy("dim")
      .agg(sort_array(collect_list(col("val"))).as("bounds"))
  }

  /** Integer codes: (vec_id, dim, code), code = #bounds ≤ val. */
  def codes(emb: DataFrame, idCol: String, vecCol: String, buckets: Int): DataFrame = {
    val cb = codebook(emb, idCol, vecCol, buckets)
    exploded(emb, idCol, vecCol)
      .join(broadcast(cb), Seq("dim"))
      .select(col("vec_id"), col("dim"),
        expr("CAST(size(filter(bounds, b -> b <= val)) AS BIGINT)").as("code"))
  }

  /** Quantized L1 top-k: for each query vector (a subset of the corpus
    * by id), the k nearest corpus vectors by code-space L1 distance —
    * (query_id, corpus_id, l1_dist, rank), self-matches excluded,
    * deterministic (dist, corpus_id) tiebreak. */
  def quantizedTopK(emb: DataFrame, idCol: String, vecCol: String,
                    buckets: Int, isQuery: org.apache.spark.sql.Column,
                    k: Int): DataFrame = {
    val c = codes(emb, idCol, vecCol, buckets)
    // every q column is re-aliased, so the self-join resolves cleanly
    val q = c.filter(isQuery)
      .select(col("vec_id").as("query_id"), col("dim").as("qdim"),
        col("code").as("qc"))
    val dist = c.join(broadcast(q),
        col("dim") === col("qdim") && col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id").as("corpus_id"))
      .agg(sum(abs(col("qc") - col("code"))).as("l1_dist"))
    val w = Window.partitionBy("query_id").orderBy(col("l1_dist"), col("corpus_id"))
    dist.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
