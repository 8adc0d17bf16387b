package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import java.sql.Timestamp

/** Structured Streaming over the events table — net-new beyond the
  * reference (which has no streaming semantics, SURVEY §2.9): windowed
  * aggregation with watermarks, and stateful per-user running aggregates
  * via mapGroupsWithState. Batch twins of each computation exist so the
  * streaming results can be checked exactly (and oracle-gated via the
  * q44/q45 batch queries).
  *
  * Scale notes: windowed aggregation shuffles on (window, event_type) with
  * partial aggregation map-side; the watermark bounds state. Sessionize
  * keys state by user_id — state size is O(active users), not O(events).
  */
object EventStreams {

  /** Schema of the events table after Tables.events' nanos→micros fix. */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** 5-minute tumbling window counts/sums per event type (streaming or
    * batch frame — same code, which is the point of the Dataset API). */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(unix_millis(col("window.start")).as("window_start_ms"),
              col("event_type"), col("n_events"), col("sum_value"))

  /** Batch gap-based sessionization: a session breaks after `gapMinutes`
    * of user inactivity. Pure window functions — lag → break flag →
    * running session index → per-session aggregates. */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val gapMs = gapMinutes * 60000L
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
             unix_millis(col("ts")) - unix_millis(col("prev_ts")) > gapMs, 1)
          .otherwise(0))
      .withColumn("session_idx",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_idx")
      .agg(unix_millis(min(col("ts"))).as("session_start_ms"),
           unix_millis(max(col("ts"))).as("session_end_ms"),
           count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
  }

  /** Streaming exact dedup on event_id with watermark-BOUNDED state
    * (dropDuplicatesWithinWatermark): the streaming twin of
    * [[graft.operators.Dedup.exactSurvivors]] for event streams — an
    * at-least-once ingest becomes exactly-once downstream, and the dedup
    * state is evicted once the watermark passes, so memory is
    * O(events per watermark horizon), not O(stream history). */
  def dedupStream(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Batch twin of [[dedupStream]] (duplicate rows are exact copies, so
    * the arbitrary survivor is value-identical). */
  def dedupBatch(events: DataFrame): DataFrame =
    events.dropDuplicates("event_id")

  // ---- stateful streaming: running per-user aggregates ----

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double, props: String)
  final case class UserState(n_events: Long, total_value: Double, last_ts: Long)
  final case class UserUpdate(user_id: Long, n_events: Long,
                              total_value: Double, last_ts: Long)

  /** mapGroupsWithState: per-user running (count, Σvalue, last ts). The
    * KeyValueGroupedDataset custom-state path (SURVEY steering: Structured
    * Streaming for streams). */
  def runningUserAgg(events: Dataset[Event]): Dataset[UserUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserUpdate](GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0, Long.MinValue))
          var n = prev.n_events
          var tot = prev.total_value
          var last = prev.last_ts
          it.foreach { e =>
            n += 1
            tot += e.value
            last = math.max(last, e.ts.getTime)
          }
          val next = UserState(n, tot, last)
          state.update(next)
          UserUpdate(user, n, tot, last)
      }
  }

  final case class SessionState(start: Long, last: Long, n: Long, total: Double)
  final case class Session(user_id: Long, session_start_ms: Long,
                           session_end_ms: Long, n_events: Long, sum_value: Double)

  /** Streaming gap sessionization via flatMapGroupsWithState with an
    * EVENT-TIME timeout: a user's session closes (and emits) when the
    * watermark passes last-event + gap. The streaming twin of
    * [[sessionizeBatch]]; state per user is one SessionState. */
  def sessionizeStream(events: Dataset[Event], gapMinutes: Int): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(user, s.start, s.last, s.n, s.total))
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.last, t),
                    s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed += Session(user, s.start, s.last, s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Run a streaming query over parquet-backed events and return the
    * final materialized result via a named memory sink. */
  def runStreamToMemory(spark: SparkSession, sourceDir: String,
                        queryName: String,
                        build: DataFrame => DataFrame,
                        outputMode: OutputMode = OutputMode.Append): DataFrame = {
    val stream = spark.readStream.schema(eventsSchema).parquet(sourceDir)
    val q = build(stream).writeStream
      .format("memory").queryName(queryName).outputMode(outputMode).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(queryName)
  }
}
