package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming URL first-wins dedup: the live twin of
  * [[graft.operators.UrlCanon.firstWins]] (q311) — a crawl frontier
  * screens each arriving URL against every canonical form already
  * seen, admitting exactly one document per canonical URL.
  *
  * Design:
  *  - canonicalization is the IDENTICAL row-local Column kernel
  *    ([[graft.operators.UrlCanon.canonicalUrl]]) applied before the
  *    stateful stage, so stream and batch canon keys agree
  *    byte-for-byte;
  *  - state per canonical URL is ONE long (the keeper id), NO
  *    event-time TTL — the batch min(id) has no horizon, and a crawl
  *    frontier must remember a URL indefinitely (the TransitionStreams
  *    no-TTL stance; this is also exactly the state contract of
  *    Spark's own no-watermark dropDuplicates). State is O(distinct
  *    canonical URLs), the same bound the batch groupBy shuffles.
  *
  * Precedence: within a micro-batch rows replay in doc_id order
  * (smallest id wins — the batch survivor rule); across micro-batches
  * FIRST-SEEN-WINS, because an emitted admission is never retracted.
  * Under id-ordered delivery the admitted set EQUALS the batch
  * keepers (UrlStreamsSpec, incl. slicing and a reorder pin). */
object UrlStreams {

  final case class UrlEvent(doc_id: Long, ts: Timestamp, url: String)
  final case class CanonEvent(doc_id: Long, ts: Timestamp, canon: String)
  final case class Admit(doc_id: Long, canon: String, admitted: Boolean)

  /** Row-local canonicalization stage (shared kernel with q311). */
  def canonEvents(urls: Dataset[UrlEvent]): Dataset[CanonEvent] = {
    import urls.sparkSession.implicits._
    urls.select(col("doc_id"), col("ts"),
        graft.operators.UrlCanon.canonicalUrl(col("url")).as("canon"))
      .as[CanonEvent]
  }

  /** Per-row admission verdicts (see object scaladoc). */
  def firstWinsStream(events: Dataset[CanonEvent]): Dataset[Admit] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.canon)
      .flatMapGroupsWithState[Long, Admit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (canon: String, it: Iterator[CanonEvent], state: GroupState[Long]) =>
          val batch = it.toArray.sortBy(_.doc_id)
          var keeper = state.getOption.getOrElse(Long.MinValue)
          val out = batch.map { e =>
            if (keeper == Long.MinValue) {
              keeper = e.doc_id
              Admit(e.doc_id, canon, admitted = true)
            } else Admit(e.doc_id, canon, admitted = false)
          }
          state.update(keeper)
          out.iterator
      }
  }

  /** The batch equivalence target: per-row admitted flags from the
    * batch survivor rule (doc_id = min over the canon group). */
  def firstWinsBatch(urls: DataFrame, urlCol: String,
                     idCol: String): DataFrame = {
    val canon = urls.select(col(idCol).cast("long").as("doc_id"),
      graft.operators.UrlCanon.canonicalUrl(col(urlCol)).as("canon"))
    val keepers = canon.groupBy("canon").agg(min("doc_id").as("_keeper"))
    canon.join(keepers, Seq("canon"))
      .select(col("doc_id"), col("canon"),
        (col("doc_id") === col("_keeper")).as("admitted"))
  }
}
