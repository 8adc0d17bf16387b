package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming incremental-ingest admission: the streaming twin of
  * [[graft.operators.Dedup.admissionFlags]] (q252) — a live ingest
  * pipeline screens each arriving document against (a) the standing
  * corpus and (b) documents already seen on the stream, emitting the
  * same two raw flags the batch gate emits, WITHOUT ever rescanning or
  * rewriting the corpus.
  *
  * Design, mirroring the batch operator's scale story:
  *  - `dup_vs_corpus` is a STATELESS stream-static left join against
  *    the corpus collapsed to DISTINCT hashes — the only large input,
  *    shuffled once on the hash per micro-batch, exactly the batch
  *    plan's shape. The hash is row-local md5(coalesce(text,'')), the
  *    identical kernel (and NULL-text contract: every row gets a
  *    verdict) as the batch side, so stream and batch verdicts agree
  *    hash-for-hash.
  *  - `dup_in_stream` is the batch `dup_in_batch` with the stream as
  *    the batch: state per hash is TWO longs (smallest doc id seen +
  *    last-activity event time), evicted by event-time timeout once
  *    the watermark passes the last activity plus the horizon — state
  *    is O(distinct hashes within the horizon), not O(stream history),
  *    the same bound as [[DedupStreams.nearDupSuppressStream]]'s
  *    buckets.
  *
  * Precedence semantics: within a micro-batch verdicts use exact id
  * precedence; across micro-batches FIRST-SEEN-WINS — any prior state
  * on a hash flags the arriving row, because an already-emitted
  * admission cannot be retracted (under id-ordered delivery this is
  * identical to the batch flags, since prior state only ever holds
  * smaller ids; the spec exercises both orders). Both flags are raw;
  * corpus-wins precedence is the consumer's bucketing, as in q252.
  */
object IngestStreams {

  final case class HashedDoc(doc_id: Long, ts: Timestamp, h: String,
                             in_corpus: Boolean)
  final case class HashState(minId: Long, maxTsMs: Long)
  final case class AdmitVerdict(doc_id: Long, dup_vs_corpus: Boolean,
                                dup_in_stream: Boolean)

  /** Row-local hash + stateless stream-static corpus probe. `corpus` is
    * the standing table; it is collapsed to DISTINCT hashes here so the
    * per-micro-batch join touches only the hash set (at 100 TB, a
    * pre-materialized hash index — the batch operator's same note). */
  def hashedDocs(docs: DataFrame, idCol: String, tsCol: String,
                 textCol: String, corpus: DataFrame,
                 corpusTextCol: String): Dataset[HashedDoc] = {
    import docs.sparkSession.implicits._
    val ch = corpus.select(md5(coalesce(col(corpusTextCol), lit("")))
      .as("h")).distinct().withColumn("in_corpus", lit(true))
    docs.select(col(idCol).as("doc_id"), col(tsCol).as("ts"),
        md5(coalesce(col(textCol), lit(""))).as("h"))
      .join(ch, Seq("h"), "left")
      .select(col("doc_id"), col("ts"), col("h"),
        coalesce(col("in_corpus"), lit(false)).as("in_corpus"))
      .as[HashedDoc]
  }

  /** Per-doc admission verdicts with watermark-bounded per-hash state
    * (see object scaladoc). `horizon` bounds both the watermark and the
    * state TTL; any Spark interval string is accepted (the TTL is set
    * via GroupState's native duration parse). */
  def admissionStream(hashed: Dataset[HashedDoc],
                      horizon: String = "10 minutes"): Dataset[AdmitVerdict] = {
    import hashed.sparkSession.implicits._
    hashed
      .withWatermark("ts", horizon)
      .groupByKey(_.h)
      .flatMapGroupsWithState[HashState, AdmitVerdict](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, it: Iterator[HashedDoc], state: GroupState[HashState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = it.toArray
            // FIRST-SEEN-WINS across batches: ANY prior state flags the
            // row — an already-emitted verdict cannot be retracted, so a
            // late-arriving smaller id must be the flagged one. Under
            // id-ordered delivery this EQUALS batch id precedence (prior
            // state only ever holds smaller ids). Within the batch,
            // exact id precedence (one O(n) min, not a per-row history
            // scan — a duplicate storm on one hash is this operator's
            // expected hot input).
            val hadPrior = state.exists
            val batchMin = batch.iterator.map(_.doc_id).min
            val verdicts = batch.map { r =>
              AdmitVerdict(r.doc_id, r.in_corpus,
                hadPrior || batchMin < r.doc_id)
            }
            val prev = state.getOption.getOrElse(
              HashState(Long.MaxValue, Long.MinValue))
            // TTL from the LAST-ACTIVITY event time (max over state +
            // batch): a late-but-in-watermark row must never move the
            // eviction EARLIER than already promised
            val maxTs = math.max(prev.maxTsMs,
              batch.iterator.map(_.ts.getTime).max)
            state.update(HashState(math.min(prev.minId, batchMin), maxTs))
            state.setTimeoutTimestamp(maxTs, horizon)
            verdicts.iterator
          }
      }
  }
}
