package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the last streaming primitive in the
  * family (windows, sessions, dedup, near-dup suppression, sketches all
  * exist): every left event joined to same-key right events whose
  * event time falls in [left.ts − lookback, left.ts].
  *
  * Spark-first: this is Structured Streaming's native watermarked
  * stream-stream inner join — BOTH sides carry a watermark and the join
  * condition carries the time-range predicate, which is exactly what
  * lets the state store evict: a buffered right row can be dropped once
  * the left watermark passes `right.ts + lookback` (it can never match
  * a future left row), and symmetric for buffered left rows. State is
  * O(events per lookback horizon per side), NOT O(stream history).
  *
  * The SAME code runs as a batch DataFrame join (watermark is a no-op
  * in batch), where Catalyst plans it as a user_id equi-join with the
  * time range as a residual — never a cartesian. That batch twin is
  * oracle-gated as q92; JoinStreamsSpec proves batch ≡ streaming and
  * that matches span micro-batch boundaries (buffered state is real).
  */
object JoinStreams {

  /** Clicks joined to the same user's views within the preceding
    * `lookbackMinutes`. Works on a streaming OR batch events frame;
    * output: (user_id, click_id, view_id, click_ts_ms, view_ts_ms). */
  def clickViewJoin(events: DataFrame, lookbackMinutes: Int,
                    watermark: String = "1 hour"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .withWatermark("ts", watermark)
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val views = events.filter(col("event_type") === "view")
      .withWatermark("ts", watermark)
      .select(col("event_id").as("view_id"), col("user_id").as("view_uid"),
        col("ts").as("view_ts"))
    clicks.join(views,
        col("user_id") === col("view_uid") &&
          col("view_ts") <= col("click_ts") &&
          col("view_ts") >= col("click_ts") -
            expr(s"interval $lookbackMinutes minutes"))
      .select(col("user_id"), col("click_id"), col("view_id"),
        unix_millis(col("click_ts")).as("click_ts_ms"),
        unix_millis(col("view_ts")).as("view_ts_ms"))
  }

  /** LEFT OUTER variant of [[clickViewJoin]]: every click emitted, with
    * NULL view columns when no same-user view fell in the lookback.
    * The semantics only a watermark makes possible in streaming: the
    * engine cannot know a click is UNMATCHED until the right-side
    * watermark has passed the end of its candidate interval, so
    * null-padded rows are emitted late, on watermark advance — which is
    * why the outer join REQUIRES the watermark + time-range condition
    * (state eviction and null emission are the same deadline). In
    * batch the identical code is a plain left join with a range
    * residual; the q168 oracle gates that twin, and JoinStreamsSpec
    * proves the streamed result set (including the null rows) matches
    * the batch one once the stream drains. */
  def clickViewJoinOuter(events: DataFrame, lookbackMinutes: Int,
                         watermark: String = "1 hour"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .withWatermark("ts", watermark)
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val views = events.filter(col("event_type") === "view")
      .withWatermark("ts", watermark)
      .select(col("event_id").as("view_id"), col("user_id").as("view_uid"),
        col("ts").as("view_ts"))
    clicks.join(views,
        col("user_id") === col("view_uid") &&
          col("view_ts") <= col("click_ts") &&
          col("view_ts") >= col("click_ts") -
            expr(s"interval $lookbackMinutes minutes"),
        "left_outer")
      .select(col("user_id"), col("click_id"), col("view_id"),
        unix_millis(col("click_ts")).as("click_ts_ms"),
        unix_millis(col("view_ts")).as("view_ts_ms"))
  }
}
