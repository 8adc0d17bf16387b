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
  * per band and grouped by (band, bucket). State per bucket is ONE long
  * — the minimum doc id seen — and is evicted by an event-time timeout
  * once the watermark passes the bucket's last activity plus the
  * horizon, so state is O(active buckets within the horizon), not
  * O(stream history): the near-dup analog of
  * `dropDuplicatesWithinWatermark`. Output is a per-(doc, band) verdict;
  * the per-doc flag is a stateless max over a doc's 16 verdicts,
  * applied downstream (DedupStreamsSpec rolls it up and proves
  * equality with the batch flags).
  *
  * Precedence: the batch twin suppresses by SMALLEST ID; the stream
  * sees ids in arrival order. Verdicts match the batch twin exactly
  * when arrival order respects id order across micro-batches (within a
  * single micro-batch ANY arrival order is fine — each bucket group
  * computes exact id precedence over prior state plus the whole batch).
  * Out-of-id-order delivery across batches degrades to first-seen-wins,
  * which is the semantic a real ingest pipeline wants anyway.
  */
object DedupStreams {

  final case class BandedDoc(doc_id: Long, ts: Timestamp, band: Int, bucket: Long)
  final case class BucketState(minId: Long)
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
    * and the state TTL. */
  def nearDupSuppressStream(banded: Dataset[BandedDoc],
                            horizon: String = "10 minutes"): Dataset[BandVerdict] = {
    import banded.sparkSession.implicits._
    val ttlMs = {
      val Array(n, unit) = horizon.trim.split("\\s+")
      unit.toLowerCase match {
        case u if u.startsWith("second") => n.toLong * 1000L
        case u if u.startsWith("minute") => n.toLong * 60000L
        case u if u.startsWith("hour")   => n.toLong * 3600000L
        case u if u.startsWith("day")    => n.toLong * 86400000L
        case u => throw new IllegalArgumentException(s"horizon unit: $u")
      }
    }
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
            val priorMin = state.getOption.map(_.minId).getOrElse(Long.MaxValue)
            // exact id precedence over prior state + this whole batch: a
            // doc is a dup in this band iff a SMALLER id shares the
            // bucket — i.e. iff min(priorMin, batchMin) < its id (the
            // batch-min doc itself falls through to priorMin). O(n), not
            // an O(n²) per-row exists scan: a duplicate storm delivering
            // a hot bucket is exactly this operator's expected input.
            val batchMin = batch.iterator.map(_.doc_id).min
            val floor = math.min(priorMin, batchMin)
            val verdicts = batch.map { r =>
              BandVerdict(r.doc_id, key._1, floor < r.doc_id)
            }
            val newMin = floor
            state.update(BucketState(newMin))
            state.setTimeoutTimestamp(batch.map(_.ts.getTime).max + ttlMs)
            verdicts.iterator
          }
      }
  }
}
