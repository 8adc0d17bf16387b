package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming interleave scheduler: the live twin of the batch mixing
  * schedule ([[graft.operators.Mixing.interleave]], q259) — a training
  * loader consumes documents as they arrive and assigns each admitted
  * doc its midpoint slot in the epoch, per (group, source) allocation:
  *
  *   slot(r) = ((2r − 1) · total) div (2 · alloc),   r = 1..alloc
  *
  * The allocation plan is a DRIVER-SIDE map (the production shape: the
  * plan is computed once per epoch by Apportion/q245 over catalog-sized
  * (group, source) counts, then shipped to the scheduler — #groups ×
  * #sources entries by contract, broadcast with the closure). State per
  * (group, source) is ONE long (picks so far); no TTL — an epoch budget
  * is permanent, like the quota gate's counter. Within a micro-batch,
  * rows are processed in id order, so a single batch schedules exactly
  * the smallest-id docs; across batches scheduling is arrival-order
  * (first-seen-wins under reordering — MixStreamsSpec pins both, and
  * equality to the batch schedule under id-ordered delivery).
  *
  * Docs beyond a source's allocation (or from sources not in the plan)
  * are dropped, mirroring the batch rank filter.
  */
object MixStreams {

  final case class MixDoc(doc_id: Long, grp: String, source: String)
  final case class MixState(picks: Long)
  final case class SlotAssign(grp: String, slot: Long, source: String,
                              doc_id: Long, r: Long)

  def scheduleStream(docs: Dataset[MixDoc],
                     alloc: Map[(String, String), Long],
                     total: Int): Dataset[SlotAssign] = {
    import docs.sparkSession.implicits._
    require(total >= 1, s"total must be >= 1: $total")
    require(alloc.values.forall(_ >= 0), "allocations must be non-negative")
    docs.groupByKey(d => (d.grp, d.source))
      .flatMapGroupsWithState[MixState, SlotAssign](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (String, String), it: Iterator[MixDoc],
         state: GroupState[MixState]) =>
          val a = alloc.getOrElse(key, 0L)
          var r = state.getOption.map(_.picks).getOrElse(0L)
          // id order inside the batch: one sort of a micro-batch group
          val out = it.toArray.sortBy(_.doc_id).flatMap { d =>
            if (r < a) {
              r += 1
              Some(SlotAssign(d.grp,
                ((2L * r - 1L) * total) / (2L * a), d.source, d.doc_id, r))
            } else None
          }
          state.update(MixState(r))
          out.iterator
      }
  }
}
