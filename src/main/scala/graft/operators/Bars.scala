package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series bar aggregation (OHLC / candlestick resampling) — the
  * standard "resample ticks to bars" operator of every market-data and
  * metrics pipeline (reference analog: the time-bucketed aggregation
  * endpoints of `bohrium_database/bohrium_public/server.py` expose only
  * plain bucket aggs; open/close require an order-aware first/last that
  * its SQLite delegate cannot express without correlated subqueries).
  *
  * Determinism discipline: "first"/"last" are defined by the TOTAL
  * order (ts, event_id) — never by arrival order — so any engine and
  * any partitioning produces the same bar. Prices are exact integer
  * cents (value → DECIMAL(18,2) → ×100 → BIGINT); every output column
  * is BIGINT, so no float rules apply.
  *
  * Scale design: both row_number windows and the final groupBy hash on
  * the SAME (series, bucket) key, so the plan carries exactly ONE
  * exchange — the two sorts and the partial agg all run inside the
  * bucket partition. Bars-per-partition is bounded by the bucket width,
  * not the corpus, so the plan survives an arbitrarily long history:
  * 100 TB of ticks is still a per-(series, bucket) local computation
  * with output cardinality |series|·|buckets|.
  */
object Bars {

  /** Resample `events` (cols: seriesCol, ts TIMESTAMP, event_id LONG,
    * value DOUBLE) to `bucketMinutes` bars per series. Returns
    * (series, bucket_ms, open_cents, high_cents, low_cents,
    * close_cents, n, vol_cents) — all BIGINT except the series key. */
  def ohlc(events: DataFrame, bucketMinutes: Int,
           seriesCol: String = "event_type"): DataFrame = {
    require(bucketMinutes > 0, s"bucketMinutes must be positive: $bucketMinutes")
    val bucketMs = bucketMinutes * 60000L
    val ticks = events.select(
      col(seriesCol).as("series"),
      // µs-floor then ms-bucket floor: floor∘floor, safe under the
      // ns-vs-µs ground rule (CLAUDE.md) for any timestamp precision
      expr(s"(unix_micros(ts) div 1000 div $bucketMs) * $bucketMs").as("bucket_ms"),
      col("ts"), col("event_id"),
      (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val byBar = Window.partitionBy("series", "bucket_ms")
    val asc  = byBar.orderBy(col("ts").asc, col("event_id").asc)
    val desc = byBar.orderBy(col("ts").desc, col("event_id").desc)
    ticks
      .withColumn("rn_a", row_number().over(asc))
      .withColumn("rn_d", row_number().over(desc))
      .groupBy("series", "bucket_ms")
      .agg(
        max(when(col("rn_a") === 1, col("cents"))).as("open_cents"),
        max(col("cents")).as("high_cents"),
        min(col("cents")).as("low_cents"),
        max(when(col("rn_d") === 1, col("cents"))).as("close_cents"),
        count(lit(1)).as("n"),
        sum(col("cents")).as("vol_cents"))
  }
}
