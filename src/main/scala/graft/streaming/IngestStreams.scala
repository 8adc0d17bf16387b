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
  *    the batch: state per hash is ONE long (the smallest doc id seen),
  *    evicted by event-time timeout once the watermark passes the
  *    hash's last activity plus the horizon — state is O(distinct
  *    hashes within the horizon), not O(stream history), the same
  *    bound as [[DedupStreams.nearDupSuppressStream]]'s buckets.
  *
  * Precedence semantics match the other twins: within a micro-batch
  * verdicts use exact id precedence over prior state plus the whole
  * batch (the smallest-id doc of a hash falls through to prior state);
  * across micro-batches admission is arrival-order, equal to the batch
  * flags whenever delivery respects id order and degrading to
  * first-seen-wins under reordering — the semantic a live gate wants.
  * Both flags are raw; corpus-wins precedence is the consumer's
  * bucketing, as in q252.
  */
object IngestStreams {

  final case class HashedDoc(doc_id: Long, ts: Timestamp, h: String,
                             in_corpus: Boolean)
  final case class HashState(minId: Long)
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
    * state TTL. */
  def admissionStream(hashed: Dataset[HashedDoc],
                      horizon: String = "10 minutes"): Dataset[AdmitVerdict] = {
    import hashed.sparkSession.implicits._
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
            val priorMin = state.getOption.map(_.minId).getOrElse(Long.MaxValue)
            // exact id precedence over prior state + this whole batch
            // (one O(n) min, not a per-row history scan — a duplicate
            // storm on one hash is this operator's expected hot input)
            val floor = math.min(priorMin, batch.iterator.map(_.doc_id).min)
            val verdicts = batch.map { r =>
              AdmitVerdict(r.doc_id, r.in_corpus, floor < r.doc_id)
            }
            state.update(HashState(floor))
            state.setTimeoutTimestamp(batch.map(_.ts.getTime).max + ttlMs)
            verdicts.iterator
          }
      }
  }
}
