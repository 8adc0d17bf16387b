package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gap-based session aggregation via Spark's native `session_window` —
  * the MERGING-window counterpart of [[EventStreams.sessionizeBatch]]'s
  * lag-islands formulation (same sessions by definition: a session
  * extends while consecutive events are ≤ gap apart, and the window end
  * is last-event + gap). One function body runs UNCHANGED as a batch
  * query (q279's oracle gate) and as a streaming query (the watermark
  * is a no-op in batch; in streaming it closes sessions and bounds
  * state to open sessions per user — SessionStreamsSpec proves
  * streaming ≡ batch on identical input, including sessions that MERGE
  * across micro-batches when a bridging event arrives).
  *
  * Scale: state/shuffle key is (user_id, session) — partial aggregation
  * map-side, session merge in the state store; never a global order.
  * The DECIMAL(18,2) pass-through on the money sum is the q44/q45 float
  * discipline.
  */
object SessionStreams {

  def sessionAgg(events: DataFrame, gapMinutes: Int,
                 watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("user_id"),
        unix_millis(col("sw.start")).as("session_start_ms"),
        unix_millis(col("sw.end")).as("session_end_ms"),
        col("n_events"), col("sum_value"))
}
