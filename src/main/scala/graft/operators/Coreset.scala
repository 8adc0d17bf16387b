package graft.operators

import scala.collection.JavaConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.functions.GraftFunctions.int_sqdist

/** Greedy k-center coreset selection (Gonzalez farthest-first
  * traversal) over an embedding column — the classic 2-approximation
  * for the k-center cover, used in curation to pick a maximally-spread
  * panel of exemplar documents (diversity seeding, eval-panel
  * selection, IVF/k-means seeding that beats "first k ids").
  *
  * All arithmetic is integer-exact on the shared
  * [[SemDedup.quantizedArr]] floor quantization, so the selected ids,
  * selection distances, and final cover radius hash-match a SQL
  * re-derivation bit for bit (no float argmax ties).
  *
  * Scale shape: k driver rounds; each round is ONE narrow projection
  * over (vec_id, qa, mind) — the new center arrives as a broadcast
  * LITERAL array (64 longs), so the min-distance update is row-local
  * codegen (int_sqdist, no join, no shuffle) — plus a TakeOrdered(1)
  * argmax reduction. Total O(k·n·D) work, O(k) driver rows collected
  * (each 1 row — the bounded-scalar collect class). At 100 TB the
  * cost is k scans; k is the knob and stays small by construction
  * (a coreset IS small). The selection is sequential by definition
  * (each pick depends on all previous) — no parallel formulation
  * exists without changing the greedy semantics.
  */
object Coreset {

  /** Farthest-first k-center selection.
    *
    * Input: (vec_id long, embedding array&lt;float&gt;). Output rows:
    * round 1..k → (round, center_id, sel_dist) where sel_dist is the
    * chosen point's min squared distance to the previously selected
    * centers at selection time (0 for the seed — by construction the
    * max-min distance after round r−1), plus a final row
    * (k+1, -1, radius) carrying the cover radius of the full
    * k-selection. Seed = smallest vec_id; argmax ties break to the
    * smaller vec_id. If k exceeds the number of DISTINCT quantized
    * points, later rounds re-pick the seed (max mind = 0, smallest
    * vec_id) and emit duplicate center rows — deliberate, and mirrored
    * by the q294 oracle; callers wanting distinct centers keep
    * k &le; distinct points. Empty input is rejected (require).
    */
  def kcenter(emb: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 256, s"k must be in [1, 256]: $k")
    val spark = emb.sparkSession
    val qv = SemDedup.quantizedArr(emb)

    def qaOf(r: Row): Seq[Long] = r.getSeq[Long](r.fieldIndex("qa"))
    def idOf(r: Row): Long = r.getLong(r.fieldIndex("vec_id"))

    val firstRows = qv.orderBy(col("vec_id")).limit(1).collect()
    require(firstRows.nonEmpty, "kcenter: empty embedding frame")
    val first = firstRows(0)
    var picked = List[Row](Row(1L, idOf(first), 0L))
    var cur = qv.withColumn("mind",
      int_sqdist(col("qa"), typedlit(qaOf(first))))
    for (r <- 2 to k) {
      val far = cur.orderBy(col("mind").desc, col("vec_id"))
        .limit(1).collect()(0)
      picked ::= Row(r.toLong, idOf(far), far.getLong(far.fieldIndex("mind")))
      cur = cur.withColumn("mind",
        least(col("mind"), int_sqdist(col("qa"), typedlit(qaOf(far)))))
    }
    val radius = cur.agg(max(col("mind"))).collect()(0).getLong(0)
    picked ::= Row(k + 1L, -1L, radius)

    val schema = StructType(Seq(
      StructField("round", LongType, nullable = false),
      StructField("center_id", LongType, nullable = false),
      StructField("sel_dist", LongType, nullable = false)))
    spark.createDataFrame(picked.reverse.asJava, schema)
  }
}
