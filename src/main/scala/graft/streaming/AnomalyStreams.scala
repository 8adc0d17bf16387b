package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import scala.collection.mutable.ArrayBuffer

/** Streaming one-sided CUSUM drift alarms: the live twin of
  * [[graft.operators.Changepoint.cusumAlarms]] (q302) — per key,
  * accumulate d = v − ref and emit an alarm row at every point where
  * cum − min(cum so far) ≥ threshold. This detector exists precisely
  * because its state is TWO LONGS per key (running sum + running min):
  * the retrospective cusumArgmax statistic needs the series total S_n
  * and can never stream, the sequential Page form streams for free.
  *
  * State design: (cum, runmin) per key, NO event-time TTL — like the
  * batch windows, a key idle for a month resumes from its exact
  * baseline (the TransitionStreams no-TTL stance; a timeout would
  * silently reset detectors on quiet keys). Within a micro-batch
  * events replay in the full-precision (ts-ms, sub-ms, id) order;
  * cross-batch ordering is arrival-order (first-seen-wins, pinned by
  * the spec's reorder case — an emitted alarm is never retracted).
  *
  * Equivalence: under event-time-ordered delivery, emitted alarm rows
  * EQUAL the batch cusumAlarms rows across any micro-batch slicing
  * (AnomalyStreamsSpec, incl. a crossing that spans batches). */
object AnomalyStreams {

  import EventStreams.Event

  final case class Alarm(user_id: Long, us: Long, event_id: Long,
                         cum: Long, gap: Long)
  final case class CusumState(cum: Long, runmin: Long)

  /** Per-user alarm stream over the event `value` in cents. */
  def cusumAlarmStream(events: Dataset[Event], refCents: Long,
                       threshold: Long,
                       watermark: String = "10 minutes"): Dataset[Alarm] = {
    require(threshold >= 1, s"threshold must be >= 1: $threshold")
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[CusumState, Alarm](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[CusumState]) =>
          // sort by the µs-TRUNCATED key the batch operator orders on
          // (us, id) — a full-ns key would order two same-µs events
          // differently than batch (the ns-vs-µs birthday class)
          val batch = it.toArray.sortBy(e =>
            ((e.ts.getTime / 1000L) * 1000000L + e.ts.getNanos / 1000L,
              e.event_id))
          var st = state.getOption.getOrElse(CusumState(0L, 0L))
          val out = ArrayBuffer.empty[Alarm]
          batch.foreach { e =>
            // the batch operator's cents: DECIMAL(18,2)·100 exactly
            val cents = BigDecimal(e.value).setScale(2,
              BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact
            val cum = st.cum + (cents - refCents)
            val runmin = math.min(st.runmin, cum)
            val gap = cum - runmin
            if (gap >= threshold) {
              val us = (e.ts.getTime / 1000L) * 1000000L +
                e.ts.getNanos / 1000L
              out += Alarm(user, us, e.event_id, cum, gap)
            }
            st = CusumState(cum, runmin)
          }
          state.update(st)
          out.iterator
      }
  }
}
