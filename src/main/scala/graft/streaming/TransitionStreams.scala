package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import scala.collection.mutable.ArrayBuffer

/** Streaming first-order transition pairs: the live twin of q125's
  * Markov transition matrix — each event emits one (prev_type,
  * next_type) pair against the user's PREVIOUS event, with the
  * '(start)' sentinel for a user's first-ever event, exactly the batch
  * lag-window semantics. Downstream counts are a plain streaming
  * aggregation over the emitted pairs.
  *
  * State design: ONE string (the last event TYPE) per user — the lag
  * window's carried value — so state is O(distinct users), the same
  * bound as any per-user aggregation, and NO event-time TTL is set:
  * the batch lag has no horizon (a user idle for a month still
  * transitions from their last event), so a timeout would silently
  * diverge from the oracle-gated batch semantics. Within a micro-batch
  * events replay in the (ts-ms, sub-ms, event_id) total order — the
  * batch (ts, event_id) order at full precision.
  *
  * Equivalence: under event-time-ordered delivery (any micro-batch
  * slicing) emitted pairs EQUAL the batch lag's (TransitionStreamsSpec,
  * incl. a cross-batch pair). Under cross-batch REORDER the repo's
  * first-seen-wins stance applies: pairs follow ARRIVAL order per user
  * (an emitted pair is never retracted), pinned by the spec. */
object TransitionStreams {

  import EventStreams.Event

  final case class Trans(prev_type: String, next_type: String)

  def transitionStream(events: Dataset[Event],
                       watermark: String = "10 minutes"): Dataset[Trans] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      // state is ONLY the last event TYPE: cross-batch ordering is
      // deliberately arrival-order (first-seen-wins, spec-pinned), so
      // carrying the timestamp/id would imply re-ordering logic that
      // doesn't exist and cost state-store bytes per user forever
      .flatMapGroupsWithState[String, Trans](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[Event], state: GroupState[String]) =>
          // full-precision event-time order: ms + sub-ms nanos + id
          val batch = it.toArray.sortBy(e =>
            (e.ts.getTime, e.ts.getNanos % 1000000L, e.event_id))
          var prev = state.getOption
          val out = ArrayBuffer.empty[Trans]
          batch.foreach { e =>
            out += Trans(prev.getOrElse("(start)"), e.event_type)
            prev = Some(e.event_type)
          }
          prev.foreach(state.update)
          out.iterator
      }
  }
}
