package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

import graft.operators.Dedup

/** Streaming near-duplicate suppression: the streaming twin of
  * [[Dedup.bandSuppressed]] (MinHash + LSH banding), for document
  * ingest pipelines where near-dups must be dropped as they arrive
  * rather than in a nightly batch pass.
  *
  * Design: each incoming doc is shingled and banded row-locally (the
  * same XXH64 signature + band kernel as the batch path, so streaming
  * and batch bucket keys are bit-identical), then exploded to one row
  * per band and grouped by (band, bucket). State per bucket is TWO
  * longs — the minimum doc id seen and the last-activity event time —
  * and is evicted by an event-time timeout once the watermark passes
  * that last activity plus the horizon, so state is O(active buckets
  * within the horizon), not O(stream history): the near-dup analog of
  * `dropDuplicatesWithinWatermark`. Output is a per-(doc, band) verdict;
  * the per-doc flag is a stateless max over a doc's 16 verdicts,
  * applied downstream (DedupStreamsSpec rolls it up and proves
  * equality with the batch flags).
  *
  * Precedence: the batch twin suppresses by SMALLEST ID; the stream
  * sees ids in arrival order. Verdicts match the batch twin exactly
  * when arrival order respects id order across micro-batches (within a
  * single micro-batch ANY arrival order is fine — each bucket group
  * computes exact id precedence over the whole batch). Out-of-id-order
  * delivery across batches is FIRST-SEEN-WINS — any prior bucket state
  * suppresses the late arrival, because the earlier keep verdict is
  * already emitted — which is the semantic a real ingest pipeline
  * wants anyway (spec'd under a reordered MemoryStream delivery).
  */
object DedupStreams {

  final case class BandedDoc(doc_id: Long, ts: Timestamp, band: Int, bucket: Long)
  final case class BucketState(minId: Long, maxTsMs: Long)
  final case class BandVerdict(doc_id: Long, band: Int, dup_in_band: Boolean)

  /** Row-local shingle → signature → band explosion, shared by the
    * streaming and batch paths (same seeded kernels ⇒ same buckets). */
  def bandedDocs(docs: DataFrame, idCol: String, tsCol: String,
                 textCol: String, shingleK: Int = 3, numHashes: Int = 64,
                 bands: Int = 16): Dataset[BandedDoc] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).as("doc_id"), col(tsCol).as("ts"),
        explode(Dedup.lshBuckets(
          Dedup.minhashSigUdf(shingleK, numHashes)(col(textCol)),
          bands, numHashes / bands)).as("bk"))
      .select(col("doc_id"), col("ts"), col("bk.band").as("band"),
        col("bk.bucket").as("bucket"))
      .as[BandedDoc]
  }

  /** Per-(doc, band) duplicate verdicts with watermark-bounded bucket
    * state (see object scaladoc). `horizon` bounds both the watermark
    * and the state TTL; any Spark interval string is accepted (the TTL
    * is set via GroupState's native duration parse). */
  def nearDupSuppressStream(banded: Dataset[BandedDoc],
                            horizon: String = "10 minutes"): Dataset[BandVerdict] = {
    import banded.sparkSession.implicits._
    banded
      .withWatermark("ts", horizon)
      .groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState[BucketState, BandVerdict](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Int, Long), it: Iterator[BandedDoc], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = it.toArray
            // FIRST-SEEN-WINS across batches: ANY prior state in the
            // bucket flags the arriving doc — an already-emitted keep
            // verdict cannot be retracted, so the late arrival is the
            // suppressed one even when its id is smaller (under
            // id-ordered delivery this equals exact id precedence,
            // since prior state only ever holds smaller ids). Within
            // the batch, exact id precedence: a doc is a dup iff a
            // smaller id shares the bucket. O(n), not an O(n²) per-row
            // exists scan: a duplicate storm delivering a hot bucket is
            // exactly this operator's expected input.
            val hadPrior = state.exists
            val batchMin = batch.iterator.map(_.doc_id).min
            val verdicts = batch.map { r =>
              BandVerdict(r.doc_id, key._1, hadPrior || batchMin < r.doc_id)
            }
            val prev = state.getOption.getOrElse(
              BucketState(Long.MaxValue, Long.MinValue))
            // TTL from the LAST-ACTIVITY event time (max over state +
            // batch): a late-but-in-watermark row must never move the
            // eviction EARLIER than already promised
            val maxTs = math.max(prev.maxTsMs,
              batch.iterator.map(_.ts.getTime).max)
            state.update(BucketState(math.min(prev.minId, batchMin), maxTs))
            state.setTimeoutTimestamp(maxTs, horizon)
            verdicts.iterator
          }
      }
  }
}
