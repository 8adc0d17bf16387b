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
  * different gaps per bucket. Implementation (r13 optimization round,
  * guide §2.4): every input row contributes ROW-LOCALLY to two period
  * slots — `cur` at its own period, `prev` at period + 1 — so ONE
  * (entity, period, bucket) aggregation over the doubled rows yields
  * exactly the old full-outer self-join's row set (a key exists iff
  * either side contributed; a missing side sums to 0 = the old
  * coalesce). The previous shape paid a counts aggregation plus a
  * two-sided computed-key exchange + full-outer SMJ for the same
  * frame: 4 exchanges + join stage → 2 exchanges, and both
  * aggregations keep map-side partial combine (the explode doubles
  * rows before the first exchange but partials collapse them to
  * distinct keys per map partition). A period appears in the output
  * if either it or its predecessor has data (the first observed
  * period drifts against empty — deterministic on both engines).
  */
object Drift {

  /** Per (entityCol, period): `l1` = Σ_b |n − prev_n|, `n_cur`,
    * `n_prev`. `periodCol` must be an integer period index (months
    * since epoch, days, …) where adjacent periods differ by 1.
    * Contract: entity and bucket must be NON-NULL (a grouping key
    * unifies nulls where the old join — and any SQL oracle's join —
    * would not match them; every caller derives both from non-null
    * columns). */
  def l1Adjacent(df: DataFrame, entityCol: String, periodCol: String,
                 bucketCol: String): DataFrame = {
    val doubled = df
      .select(col(entityCol), col(periodCol).cast("long").as("_p0"),
        col(bucketCol).as("_b"))
      .select(col(entityCol), col("_b"), explode(array(
        struct(col("_p0").as("_p"), lit(1L).as("_c"), lit(0L).as("_pc")),
        struct((col("_p0") + 1L).as("_p"), lit(0L).as("_c"),
          lit(1L).as("_pc")))).as("_e"))
      .select(col(entityCol), col("_e._p").as("_p"), col("_b"),
        col("_e._c").as("_c"), col("_e._pc").as("_pc"))
    doubled.groupBy(col(entityCol), col("_p"), col("_b"))
      .agg(sum(col("_c")).as("_n"), sum(col("_pc")).as("_pn"))
      .groupBy(col(entityCol), col("_p").as(periodCol))
      .agg(sum(abs(col("_n") - col("_pn"))).as("l1"),
        sum(col("_n")).as("n_cur"),
        sum(col("_pn")).as("n_prev"))
  }
}
