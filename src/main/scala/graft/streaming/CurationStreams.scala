package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming quota admission: the streaming twin of the per-group
  * first-N selection behind the batch quota/curation operators
  * (q236's per-lang floor, Curation.stratifiedSample's fixed strata
  * quotas) — an ingest pipeline admits documents per language until
  * that language's budget is spent, then rejects, emitting a verdict
  * per document as it arrives.
  *
  * State per language is ONE long (the admitted count) — #langs longs
  * total, catalog-sized by contract, so no TTL is needed (a quota is a
  * permanent budget, unlike DedupStreams' horizon-bounded buckets).
  * Within a micro-batch, rows are processed in doc_id order, so a
  * single batch admits exactly the smallest-id documents; across
  * micro-batches admission is arrival-order. Verdicts therefore equal
  * the batch "first N per lang by id" whenever delivery respects id
  * order across batches (CurationStreamsSpec proves it under
  * maxFilesPerTrigger=1 slicing), and degrade to first-seen-wins under
  * reordering — the semantic a live admission gate wants.
  */
object CurationStreams {

  final case class ScoredDoc(doc_id: Long, lang: String)
  final case class AdmitState(admitted: Long)
  final case class AdmitVerdict(doc_id: Long, lang: String, admitted: Boolean)

  def quotaAdmitStream(docs: Dataset[ScoredDoc],
                       quota: Long): Dataset[AdmitVerdict] = {
    import docs.sparkSession.implicits._
    require(quota >= 0, "quota must be non-negative")
    docs.groupByKey(_.lang)
      .flatMapGroupsWithState[AdmitState, AdmitVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (lang: String, it: Iterator[ScoredDoc], state: GroupState[AdmitState]) =>
          var n = state.getOption.map(_.admitted).getOrElse(0L)
          // id order inside the batch: one sort of a micro-batch group,
          // never a history scan — state is the count alone
          val verdicts = it.toArray.sortBy(_.doc_id).map { r =>
            val ok = n < quota
            if (ok) n += 1
            AdmitVerdict(r.doc_id, lang, ok)
          }
          state.update(AdmitState(n))
          verdicts.iterator
      }
  }
}
