package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.int_sqdist

/** Johnson–Lindenstrauss random-projection audit: project the
  * embedding column onto m seeded Gaussian hyperplanes
  * ([[Dedup.hyperplanes]] — the same public construction the sign-LSH
  * path uses, kept REAL-VALUED here instead of sign-bucketed) and
  * report exact per-pair (original, projected) squared distances over a
  * bounded panel — the measurement a pipeline owner fits the JL
  * distortion ε from before committing to a reduced dimension for ANN /
  * clustering (the reference has no dimensionality-reduction surface;
  * this audits the standard one, JL lemma: m = O(log n / ε²) preserves
  * pairwise distances within 1±ε).
  *
  * Cross-engine arithmetic: projections are ⌊dot·10⁶⌋ longs (dot is the
  * mirrored left-to-right double fold — the q39 discipline), original
  * coordinates the shared [[SemDedup]] ⌊x·10⁶⌋ quantization; both
  * distances are then INTEGER sums (order-free), so every output cell
  * hash-matches. Lambdas capture only the raw embedding ATTRIBUTE
  * (element-wise casts inside — the captured-computed-array rule).
  *
  * Scale shape: projection is row-local codegen over an m-plane literal
  * (no shuffle — at 100 TB it's a map, exactly like [[IvfIndex
  * .assignToCentroids]]); the pair stage is bounded by the PANEL
  * contract (audit panels are small by construction — the q295/q304
  * broadcast-panel convention), never corpus×corpus.
  */
object RandomProjection {

  val Scale = 1000000L

  /** (vec_id, qa = quantized original coords, pj = quantized
    * projections onto `planes`). Row-local. */
  def projectQuantized(emb: DataFrame, planes: Seq[Seq[Double]]): DataFrame = {
    require(planes.nonEmpty, "at least one plane")
    val planesLit = typedlit(planes.map(_.toSeq))
    val raw = col("embedding")
    def dotQ(p: Column): Column =
      floor(aggregate(zip_with(raw, p, (x, y) => x.cast("double") * y),
        lit(0.0), (acc, v) => acc + v) * Scale.toDouble).cast("long")
    emb.select(col("vec_id"),
      transform(raw, x => floor(x.cast("double") * Scale.toDouble).cast("long"))
        .as("qa"),
      transform(planesLit, p => dotQ(p)).as("pj"))
  }

  /** All-pairs audit over a [[projectQuantized]] PANEL (bounded by
    * contract): (id_a, id_b, d_orig, d_proj), a &lt; b. */
  def pairAudit(panel: DataFrame): DataFrame = {
    val a = panel.select(col("vec_id").as("id_a"), col("qa").as("qa_a"),
      col("pj").as("pj_a"))
    val b = panel.select(col("vec_id").as("id_b"), col("qa").as("qa_b"),
      col("pj").as("pj_b"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        int_sqdist(col("qa_a"), col("qa_b")).as("d_orig"),
        int_sqdist(col("pj_a"), col("pj_b")).as("d_proj"))
  }
}
