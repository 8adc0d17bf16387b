package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Histogram drift between consecutive periods — the L1 (total
  * variation ×2) distance between adjacent-period bucket-count
  * distributions, per entity: Σ_buckets |n_t(b) − n_{t−1}(b)|, with a
  * bucket absent in one period counting as 0. The data-quality /
  * distribution-shift monitor emitted as integer components (the
  * normalized TV score = l1 / (n_cur + n_prev) is a float left to the
  * consumer, per the avg-class ground rule).
  *
  * Adjacency is CALENDAR-adjacent (period key + 1), not
  * previous-observed — a lag window over observed periods would pair
  * a bucket's count with whenever that bucket last appeared, mixing
  * different gaps per bucket. Implementation: one counts aggregate,
  * then the counts frame joined to itself FULL OUTER on
  * (entity, bucket, period = prev.period + 1) with missing sides
  * coalesced to 0 — equi-join on a computed key, no window, no dense
  * grid materialization. A period appears in the output if either it
  * or its predecessor has data (the first observed period drifts
  * against empty — deterministic on both engines).
  */
object Drift {

  /** Per (entityCol, period): `l1` = Σ_b |n − prev_n|, `n_cur`,
    * `n_prev`. `periodCol` must be an integer period index (months
    * since epoch, days, …) where adjacent periods differ by 1. */
  def l1Adjacent(df: DataFrame, entityCol: String, periodCol: String,
                 bucketCol: String): DataFrame = {
    val counts = df.groupBy(col(entityCol), col(periodCol).cast("long").as("_p"),
        col(bucketCol).as("_b"))
      .agg(count(lit(1)).as("_n"))
    val cur = counts.select(col(entityCol), col("_p"), col("_b"), col("_n"))
    val prev = counts.select(col(entityCol), (col("_p") + 1L).as("_p"),
      col("_b"), col("_n").as("_pn"))
    cur.join(prev, Seq(entityCol, "_p", "_b"), "full_outer")
      .na.fill(0L, Seq("_n", "_pn"))
      .groupBy(col(entityCol), col("_p").as(periodCol))
      .agg(sum(abs(col("_n") - col("_pn"))).as("l1"),
        sum(col("_n")).as("n_cur"),
        sum(col("_pn")).as("n_prev"))
  }
}
