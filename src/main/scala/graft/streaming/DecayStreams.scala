package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming half-life decayed counts — the live twin of
  * [[graft.operators.Decay.halfLifeWeights]]'s power-of-two ladder
  * (q271), with the state a streaming system can actually keep: a
  * BOUNDED per-key age-bucket histogram (≤ `maxAgeBuckets`+1 entries),
  * the exponential-histogram idea specialized to half-life weights.
  *
  * Semantics note (documented divergence, chosen deliberately): ages
  * here are CALENDAR-ALIGNED — age = refBucket − floor(us/bucket) —
  * because a histogram keyed by bucket cannot reproduce q271's
  * relative ages ((ref_us − us) div bucket), which depend on each
  * event's sub-bucket offset. Calendar alignment is the
  * time_bucket/session convention everywhere else in the repo; the
  * batch twin with IDENTICAL semantics is [[calendarDecayedBatch]],
  * and DecayStreamsSpec proves stream ≡ that batch form across
  * micro-batch slicing, reorder, and idle-key gaps.
  *
  * Exactness of the bounded state: `scale < 2^maxAgeBuckets` is
  * REQUIRED, so any bucket older than the cap carries weight
  * scale div 2^cap = 0 — dropping those buckets (and, after
  * last-activity + cap·bucket of event time, the whole key's state)
  * changes no total at any later reference point. The TTL is
  * last-activity + the FULL decay horizon — the AttributionStreams
  * lesson: a timeout at the watermark delay would silently zero idle
  * keys that still carry non-zero weight.
  */
object DecayStreams {

  case class Keyed(ts: Timestamp, key: String)
  case class DecayHist(key: String, asof_bucket: Long, bucket: Long, cnt: Long)
  case class HistState(hist: Map[Long, Long], maxTsMs: Long)

  private def micros(ts: Timestamp): Long =
    (ts.getTime / 1000L) * 1000000L + ts.getNanos / 1000L

  /** Per-key bucket histogram stream: each micro-batch with activity
    * for a key re-emits the key's CURRENT (pruned) histogram stamped
    * with `asof_bucket` = the key's max seen bucket — downstream takes
    * the max-asof rows per key ([[decayedTotals]] does). State: one
    * Map of ≤ cap live buckets per key, event-time TTL at
    * last-activity + cap·bucket. */
  def decayHistStream(events: Dataset[Keyed],
                      bucketUs: Long = 86400000000L,
                      maxAgeBuckets: Int = 40,
                      scale: Long = graft.operators.Decay.Scale,
                      horizon: String = "10 minutes"): Dataset[DecayHist] = {
    require(bucketUs > 0, s"bucketUs must be positive: $bucketUs")
    require(maxAgeBuckets >= 1 && maxAgeBuckets <= 62,
      s"maxAgeBuckets must be in [1, 62]: $maxAgeBuckets")
    require(scale < (1L << maxAgeBuckets),
      s"scale $scale must decay to 0 at the cap (scale < 2^$maxAgeBuckets), " +
        "or pruned buckets would change totals")
    import events.sparkSession.implicits._
    val bucketMs = bucketUs / 1000L
    events
      .withWatermark("ts", horizon)
      .groupByKey(_.key)
      .flatMapGroupsWithState[HistState, DecayHist](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, it: Iterator[Keyed], state: GroupState[HistState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = it.toArray
            val prev = state.getOption.getOrElse(
              HistState(Map.empty, Long.MinValue))
            var hist = prev.hist
            batch.foreach { e =>
              val b = Math.floorDiv(micros(e.ts), bucketUs)
              hist = hist.updated(b, hist.getOrElse(b, 0L) + 1L)
            }
            val mx = hist.keys.max
            // weight(age ≥ cap) = 0 by the scale require — prune exact
            hist = hist.filter { case (b, _) => mx - b < maxAgeBuckets }
            val maxTsMs = math.max(prev.maxTsMs,
              batch.iterator.map(_.ts.getTime).max)
            state.update(HistState(hist, maxTsMs))
            state.setTimeoutTimestamp(maxTsMs + maxAgeBuckets * bucketMs)
            hist.toSeq.sortBy(_._1)
              .map { case (b, c) => DecayHist(key, mx, b, c) }.iterator
          }
      }
  }

  /** Finisher over the emitted histogram rows: keep each key's latest
    * (max asof_bucket) histogram, weight buckets by
    * scale div 2^min(ref−bucket, cap), sum per key. Several micro-
    * batches can re-emit under the SAME asof bucket; per-bucket counts
    * are cumulative (a bucket's count never decreases while asof
    * stands), so the latest snapshot of each bucket is its max. */
  def decayedTotals(hist: DataFrame, refBucket: Long, scale: Long,
                    maxAgeBuckets: Int): DataFrame = {
    val latest = hist.groupBy("key").agg(max("asof_bucket").as("_mx"))
    hist.join(latest, Seq("key"))
      .filter(col("asof_bucket") === col("_mx"))
      .groupBy(col("key"), col("bucket"))
      .agg(max(col("cnt")).as("cnt"))
      // greatest(0, ·): a stale ref (refBucket < a stored bucket) would
      // make _age negative and shiftleft silently mask it (Java << uses
      // count & 63) — clamp to age 0 = full weight instead of garbage
      .withColumn("_age",
        least(greatest(lit(0L), lit(refBucket) - col("bucket")),
          lit(maxAgeBuckets.toLong)))
      .withColumn("_wt",
        expr(s"${scale}L div shiftleft(1L, cast(_age as int))"))
      .groupBy("key")
      .agg(sum(col("cnt") * col("_wt")).as("decayed"))
  }

  /** The batch form with IDENTICAL calendar-aligned semantics: bucket
    * every event at floor(us/bucket), ref = max bucket, half-life
    * weight with the same cap. The spec's equivalence target. */
  def calendarDecayedBatch(events: DataFrame, keyCol: String,
                           bucketUs: Long = 86400000000L,
                           maxAgeBuckets: Int = 40,
                           scale: Long = graft.operators.Decay.Scale): DataFrame = {
    val ev = events.select(col(keyCol).as("key"),
      expr(s"unix_micros(ts) div ${bucketUs}L").as("b"))
    val mx = ev.agg(max("b").as("ref_b"))
    ev.crossJoin(broadcast(mx))
      .withColumn("_age",
        least(col("ref_b") - col("b"), lit(maxAgeBuckets.toLong)))
      .withColumn("_wt",
        expr(s"${scale}L div shiftleft(1L, cast(_age as int))"))
      .groupBy("key")
      .agg(sum(col("_wt")).as("decayed"))
  }
}
