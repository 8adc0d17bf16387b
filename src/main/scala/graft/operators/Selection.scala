package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Exact GLOBAL order statistics without a global sort — the
  * distributed-selection pattern: a full sort (or a global rank
  * window, which the plan audit bans outright) of 100 TB to read one
  * median is the classic anti-pattern; selection needs two bounded
  * passes.
  *
  * Pass 1 histograms values into width-2^shift buckets (ONE
  * map-side-combined aggregation; the driver walks the bucket counts —
  * O(range / 2^shift) scalars, the PrefixSum driver-scan pattern).
  * Pass 2 scans ONLY the buckets containing target ranks and collapses
  * each to its ≤ 2^shift distinct (value, count) pairs, walked on the
  * driver for the in-bucket residual rank. Selected VALUES are
  * tie-invariant (the value at a fixed rank does not depend on how
  * equal values are ordered), so no tie-break column is needed —
  * the [[Robust.groupMedian]] observation, applied globally.
  *
  * Exactness: all-integer (values cast to LONG by contract — cents,
  * counts, token counts); rank arithmetic is the repo's explicit
  * `(n+1) div 2` convention, restated identically in oracles. This is
  * the EXACT counterpart of q194's median-of-medians approximation and
  * of the q65/q198 sketch quantiles.
  *
  * Bucketing uses Spark `div` (truncation) — consistent between the
  * histogram and the pass-2 filter for any sign, which is all
  * correctness needs.
  */
object Selection {

  /** Values at the given 1-based GLOBAL ranks of `valCol`'s order.
    * @return (n, Map(rank → value)); ranks outside [1, n] are dropped. */
  def rankValues(df: DataFrame, valCol: String, ranks: Long => Seq[Long],
                 shift: Int = 12): (Long, Map[Long, Long]) = {
    require(shift >= 0 && shift < 40, s"shift out of range: $shift")
    val w = 1L << shift
    val vals = df.select(col(valCol).cast("long").as("_v")).persist()
    val hist = vals.groupBy(expr(s"_v div ${w}L").as("_b"))
      .agg(count(lit(1)).as("_c"))
      .orderBy("_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = hist.map(_._2).sum
    val wanted = ranks(n).filter(r => r >= 1 && r <= n).distinct.sorted
    // rank → (bucket, residual rank inside the bucket); cum always
    // holds the cumulative count THROUGH the current cursor inclusive,
    // and ranks are walked in ascending order so the cursor is
    // monotone — one pass over the bucket counts
    val located = {
      var cum = 0L
      val it = hist.iterator
      var cur: (Long, Long) = null
      wanted.map { r =>
        while (cur == null || cum < r) { cur = it.next(); cum += cur._2 }
        r -> ((cur._1, r - (cum - cur._2)))
      }
    }
    val byBucket = located.groupBy(_._2._1)
    val picked = byBucket.flatMap { case (b, rs) =>
      // ≤ 2^shift distinct values per bucket — EXCEPT bucket 0, which
      // under truncating div spans both signs (−(2^shift−1)..2^shift−1,
      // up to 2^(shift+1)−1 distinct); size the driver walk for that
      val inb = vals.filter(expr(s"_v div ${w}L") === b)
        .groupBy("_v").agg(count(lit(1)).as("_c"))
        .orderBy("_v")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      var cum = 0L
      val it = inb.iterator
      var cur: (Long, Long) = null
      rs.sortBy(_._2._2).map { case (r, (_, resid)) =>
        while (cur == null || cum < resid) { cur = it.next(); cum += cur._2 }
        r -> cur._1
      }
    }
    vals.unpersist(blocking = false)
    (n, picked.toMap)
  }

  /** 1-row global profile (n, p50, p90, vmax) of `valCol` — median and
    * p90 at the explicit ranks (n+1) div 2 and (9n+9) div 10. */
  def globalProfile(spark: SparkSession, df: DataFrame,
                    valCol: String, shift: Int = 12): DataFrame = {
    val (n, picks) = rankValues(df, valCol,
      nn => Seq((nn + 1) / 2, (9 * nn + 9) / 10, nn), shift)
    val p50 = picks.getOrElse((n + 1) / 2, 0L)
    val p90 = picks.getOrElse((9 * n + 9) / 10, 0L)
    val vmax = picks.getOrElse(n, 0L)
    spark.createDataFrame(
      java.util.Arrays.asList(Row(n, p50, p90, vmax)),
      StructType(Seq(StructField("n", LongType, nullable = false),
        StructField("p50", LongType, nullable = false),
        StructField("p90", LongType, nullable = false),
        StructField("vmax", LongType, nullable = false))))
  }
}
