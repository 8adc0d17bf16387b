package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-mixing schedule — the EXECUTION layer over an apportionment
  * plan ([[Apportion.largestRemainder]], q245): given each source's
  * slot allocation out of a `total`-slot epoch, place that source's
  * picks at the midpoints of its `alloc` equal subintervals,
  *
  *   slot(r) = ((2r − 1) · total) div (2 · alloc),   r = 1..alloc
  *
  * the deterministic low-discrepancy spread (each source is within one
  * doc of proportional in EVERY schedule prefix — the property a
  * training loader needs so early steps don't see a single source, and
  * exactly what shuffling approximates only in expectation). No RNG,
  * all-BIGINT, so the q259 oracle re-derives the identical schedule.
  *
  * Scale: one row_number window per (group, source) — the widest
  * shuffle is keyed by (group, source), never global; the alloc plan is
  * a ≤ #groups × #sources frame the optimizer broadcasts. Documents
  * beyond a source's allocation are dropped by the rank filter, so the
  * output is Σ min(alloc, n_docs) rows ≤ #groups · total regardless of
  * corpus size.
  */
object Mixing {

  /** Interleave schedule: joins `docs` to `alloc` on (grpCol, srcCol),
    * ranks each source's docs by `idCol`, keeps the first `alloc`, and
    * assigns the midpoint slot. Output columns: grpCol, slot, srcCol,
    * idCol, r (all slots in [0, total)). */
  def interleave(docs: DataFrame, alloc: DataFrame, grpCol: String,
                 srcCol: String, idCol: String, allocCol: String,
                 total: Int): DataFrame = {
    require(total >= 1, s"total must be >= 1: $total")
    val w = Window.partitionBy(grpCol, srcCol).orderBy(col(idCol))
    docs.select(col(grpCol), col(srcCol), col(idCol))
      .join(alloc.select(col(grpCol), col(srcCol),
        col(allocCol).cast("long").as("_alloc"))
        .filter(col("_alloc") > 0), Seq(grpCol, srcCol))
      .withColumn("r", row_number().over(w).cast("long"))
      .filter(col("r") <= col("_alloc"))
      .withColumn("slot",
        expr(s"((2L * r - 1L) * ${total}L) div (2L * _alloc)"))
      .select(col(grpCol), col("slot"), col(srcCol), col(idCol), col("r"))
  }
}
