package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class FunnelEvent(user_id: Long, ts: Timestamp, event_type: String)

/** One changelog snapshot of a user's funnel progress; the row with the
  * highest version is the user's current (t1, t2, t3). */
final case class FunnelProgress(user_id: Long, t1: Option[Timestamp],
                                t2: Option[Timestamp], t3: Option[Timestamp],
                                version: Long)

private[streaming] final case class FunnelState(
    t1: Option[Long], s2: Seq[Long], s3: Seq[Long], version: Long)

/** STREAMING twin of [[graft.operators.Funnel.perKey]] (q88's 3-step
  * horizon funnel): per user, earliest step-1, earliest step-2 strictly
  * after it within the horizon, step-3 likewise — maintained
  * incrementally with `flatMapGroupsWithState` and emitted as an
  * append-mode CHANGELOG (one snapshot per trigger per active user;
  * latest version = current truth), because a late-arriving EARLIER
  * step-1 event legitimately RETRACTS a previously reported t2/t3.
  *
  * Exactness under out-of-order arrival and any micro-batch slicing
  * (FunnelStreamsSpec proves final snapshots ≡ the batch windows):
  * t1 is a monotone min — always safe. t2/t3 are NOT monotone (t1
  * moving earlier shifts their windows), so the state keeps the
  * step-2/step-3 candidate timestamp SETS, bounded by two sound
  * evictions:
  *  - with t1 known: a step-2 at ts > t1+h can never enter a window
  *    (future t1' ≤ t1 only lowers the bound) — evict; step-3 likewise
  *    at ts > t1+2h (t2 ≤ t1+h always).
  *  - with no t1 yet: any future step-1 has ts ≥ watermark, so a
  *    step-2/3 at ts ≤ watermark can never be strictly after it —
  *    evict.
  * So state per user is the step-2/3 activity inside a rolling
  * ≤ 2·horizon event-time span plus three scalars. The event-time
  * timeout (2·horizon past the latest event) COMPACTS settled users —
  * once the watermark passes t1+2h every window bound is final, so the
  * candidate sets collapse to the resolved t2/t3 scalars (a handful of
  * longs per ever-seen user; full batch parity forbids dropping t1 —
  * true eviction is a session-closure product decision, not a
  * correctness option).
  */
object FunnelStreams {

  def funnelStream(events: Dataset[FunnelEvent], steps: Seq[String],
                   horizonHours: Int,
                   watermark: String = "2 hours"): Dataset[FunnelProgress] = {
    require(steps.size == 3, s"expected 3 funnel steps, got ${steps.size}")
    import events.sparkSession.implicits._
    val h = horizonHours * 3600000L
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelProgress](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            // settled: the watermark has passed every window bound, so
            // t1/t2/t3 are final — collapse the candidate sets to the
            // resolved scalars (no new timeout; see scaladoc)
            state.getOption.foreach { st =>
              st.t1.foreach { t =>
                val t2 = st.s2.filter(x => x > t && x <= t + h)
                  .reduceOption(_ min _)
                val t3 = t2.flatMap(tt => st.s3
                  .filter(x => x > tt && x <= tt + h).reduceOption(_ min _))
                state.update(FunnelState(st.t1, t2.toSeq, t3.toSeq, st.version))
              }
            }
            Iterator.empty
          } else {
            val batch = it.toArray
            val wm = state.getCurrentWatermarkMs()
            val st = state.getOption.getOrElse(FunnelState(None, Nil, Nil, 0L))
            val t1 = (st.t1.toSeq ++ batch.iterator
              .filter(_.event_type == steps(0)).map(_.ts.getTime))
              .reduceOption(_ min _)
            def cands(prior: Seq[Long], step: String, bound: Long): Seq[Long] = {
              val all = (prior ++ batch.iterator
                .filter(_.event_type == step).map(_.ts.getTime)).distinct
              t1 match {
                // lower side: any OBSERVABLE future step-1 has ts ≥ wm
                // (older rows are watermark-dropped), so the final t1
                // is ≥ min(t1, wm) and a candidate at or below that can
                // never be strictly after it
                case Some(t) => all.filter(x =>
                  x <= t + bound && x > math.min(t, wm))
                case None => all.filter(_ > wm)
              }
            }
            val s2 = cands(st.s2, steps(1), h)
            val s3 = cands(st.s3, steps(2), 2 * h)
            val t2 = t1.flatMap(t =>
              s2.filter(x => x > t && x <= t + h).reduceOption(_ min _))
            val t3 = t2.flatMap(t =>
              s3.filter(x => x > t && x <= t + h).reduceOption(_ min _))
            val v = st.version + 1
            state.update(FunnelState(t1, s2.sorted, s3.sorted, v))
            val maxTs = batch.iterator.map(_.ts.getTime).max
            state.setTimeoutTimestamp(math.max(maxTs, wm + 1) + 2 * h)
            Iterator.single(FunnelProgress(uid, t1.map(new Timestamp(_)),
              t2.map(new Timestamp(_)), t3.map(new Timestamp(_)), v))
          }
      }
  }
}
