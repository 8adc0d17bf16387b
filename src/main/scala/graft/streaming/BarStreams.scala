package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming OHLC bar resampling — the live twin of
  * [[graft.operators.Bars.ohlc]] (q131). The batch operator defines
  * open/close by rank over the (ts, event_id) total order; a stream
  * cannot rank (rows arrive unordered and partials merge), so the
  * streaming formulation uses the ORDER-FREE aggregates min_by/max_by
  * keyed on the same (ts, event_id) struct — equivalent BECAUSE the
  * order is total (no ties for the combiner to break
  * nondeterministically; BarStreamsSpec proves batch ≡ streaming on
  * identical input).
  *
  * State: one (open, high, low, close, n, vol) tuple per live
  * (series, window) group, retired by the watermark — bounded by
  * series × open windows, never by stream length. The shuffle carries
  * map-side partial bars, so a hot series costs one merged row per
  * partition, not its tick volume.
  */
object BarStreams {

  /** Tumbling `bucketMinutes` bars per event_type; same schema as the
    * batch operator modulo column order: (bucket_ms, series,
    * open_cents, high_cents, low_cents, close_cents, n, vol_cents). */
  def ohlcStream(events: DataFrame, bucketMinutes: Int): DataFrame = {
    require(bucketMinutes > 0, s"bucketMinutes must be positive: $bucketMinutes")
    events
      .withWatermark("ts", "10 minutes")
      .withColumn("cents", (col("value").cast("decimal(18,2)") * 100).cast("long"))
      .groupBy(window(col("ts"), s"$bucketMinutes minutes"),
        col("event_type").as("series"))
      .agg(
        min_by(col("cents"), struct(col("ts"), col("event_id"))).as("open_cents"),
        max(col("cents")).as("high_cents"),
        min(col("cents")).as("low_cents"),
        max_by(col("cents"), struct(col("ts"), col("event_id"))).as("close_cents"),
        count(lit(1)).as("n"),
        sum(col("cents")).as("vol_cents"))
      .select(unix_millis(col("window.start")).as("bucket_ms"), col("series"),
        col("open_cents"), col("high_cents"), col("low_cents"),
        col("close_cents"), col("n"), col("vol_cents"))
  }
}
