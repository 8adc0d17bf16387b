package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

/** Streaming multi-touch position-based attribution: the live twin of
  * [[graft.operators.Attribution.positionCredits]] (q270) — credits are
  * emitted the moment a conversion arrives, against the touches already
  * buffered for that user, with the SAME exact-permille split (first
  * 400 + (200 mod (n−2)), last 400, middles 200 div (n−2); Σ ≡ 1000).
  *
  * State design: one group per user_id holding only that user's touches
  * within the horizon of the newest event seen — eviction drops a touch
  * once it is `horizonMs` behind the user's max event time (a touch at
  * exactly max−horizon is kept: a future conversion at ≥ max still
  * admits it), and the whole group times out via the event-time TTL
  * once the watermark passes last activity + horizon. State is
  * O(touches per horizon per user), never O(stream history) — the
  * [[IngestStreams]] bound.
  *
  * Equivalence: under event-time-ordered delivery (any micro-batch
  * slicing) the emitted credits EQUAL the batch operator's — each
  * conversion sees exactly its window's touches, and within a
  * micro-batch events are replayed in (ts, event_id) order. Under
  * cross-batch REORDER the degradation is the repo's first-seen-wins
  * stance: a conversion credits only touches that have already
  * arrived (an emitted credit row cannot be retracted), and a
  * late-arriving touch earns no retroactive credit. The spec pins
  * both behaviors.
  */
object AttributionStreams {

  final case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                      event_type: String)
  final case class Touch(id: Long, ms: Long, typ: String)
  final case class TouchState(touches: Seq[Touch], maxTsMs: Long)
  final case class Credit(conv_id: Long, touch_id: Long, event_type: String,
                          pos: Int, n: Long, credit: Long)

  /** Position-based credits over a stream of events. `horizonMs` is the
    * attribution window; `watermark` (a Spark interval string) bounds
    * lateness and, with the horizon, the per-group TTL. */
  def creditStream(events: Dataset[Ev], horizonMs: Long,
                   convType: String = "purchase",
                   touchTypes: Seq[String] = Seq("click", "view", "signup"),
                   watermark: String = "10 minutes"): Dataset[Credit] = {
    require(horizonMs > 0, s"horizonMs must be positive: $horizonMs")
    import events.sparkSession.implicits._
    val touchSet = touchTypes.toSet
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchState, Credit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, it: Iterator[Ev], state: GroupState[TouchState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // replay the micro-batch in event-time order — the batch
            // operator's (ts, event_id) total order
            val batch = it.toArray.sortBy(e => (e.ts.getTime, e.event_id))
            val prev = state.getOption.getOrElse(TouchState(Nil, Long.MinValue))
            var buf = prev.touches.to(ArrayBuffer)
            var maxTs = prev.maxTsMs
            val out = ArrayBuffer.empty[Credit]
            batch.foreach { e =>
              val ms = e.ts.getTime
              maxTs = math.max(maxTs, ms)
              if (touchSet.contains(e.event_type)) {
                buf += Touch(e.event_id, ms, e.event_type)
              } else if (e.event_type == convType) {
                val win = buf.filter(t => t.ms >= ms - horizonMs &&
                    t.ms <= ms - 1)
                  .sortBy(t => (t.ms, t.id))
                val n = win.size.toLong
                win.zipWithIndex.foreach { case (t, i) =>
                  val pos = i + 1
                  val credit =
                    if (n == 1) 1000L
                    else if (n == 2) 500L
                    else if (pos == 1) 400L + 200L % (n - 2)
                    else if (pos == n) 400L
                    else 200L / (n - 2)
                  out += Credit(e.event_id, t.id, t.typ, pos, n, credit)
                }
              }
            }
            // evict touches no future in-order conversion can credit
            val kept = buf.filter(_.ms >= maxTs - horizonMs).sortBy(t => (t.ms, t.id))
            state.update(TouchState(kept.toSeq, maxTs))
            // TTL = last activity + FULL horizon (+ watermark slack): a touch
            // at maxTs is creditable by a conversion up to maxTs + horizonMs,
            // so state must outlive the horizon even while other users advance
            // the global watermark. (maxTs alone + watermark delay evicted
            // idle users' touches before their in-horizon conversions — the
            // DedupStreams/IngestStreams last-activity+horizon pattern.)
            state.setTimeoutTimestamp(maxTs + horizonMs, watermark)
            out.iterator
          }
      }
  }
}
