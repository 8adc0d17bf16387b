package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Span-level (substring) duplication statistics — the training-data
  * signal DOCUMENT-level dedup misses: boilerplate, licenses and quoted
  * passages repeat *inside* otherwise-distinct documents, and repeated
  * spans are what a language model memorizes (Lee et al. 2021,
  * "Deduplicating Training Data Makes Language Models Better", which
  * dedups on ~50-token spans; same shape here on k-token spans). The
  * output is the per-document worklist a curation pass thresholds on:
  * how much of each document is corpus-duplicated text.
  *
  * Scale design: span enumeration is row-local (one [[Dedup.shinglesOf]]
  * pass per document — a UDF, not nested HOFs, per the interpreted-HOF
  * ground rule); the only shuffles are (a) the span-keyed document-
  * frequency count (map-side combined), (b) the span-keyed join of
  * positions against the duplicated-span set, (c) the doc-keyed stat
  * aggregation. Cost is Σ doc_tokens — linear in corpus size; the
  * duplicated-span set is data-dependent but never materialized to the
  * driver. No all-pairs term anywhere (contrast q69's near-dup join:
  * this operator never pairs documents at all).
  *
  * Determinism: pure integer counts over exact string spans — no
  * hashing, no floats. Short documents (< k tokens) follow
  * [[Dedup.shinglesOf]]'s contract and contribute their whole text as
  * one span; the oracle mirrors that with a greatest(len-k+1, 1)
  * position grid.
  */
object SpanDedup {

  /** Per-document span-duplication stats over k-token spans:
    * (id, n_spans, n_dup_pos, n_dup_spans) — total span positions,
    * positions whose span also occurs in ANOTHER document, and distinct
    * such spans. Every document with ≥1 token appears (zeroes when
    * nothing is duplicated). */
  def dupSpanStats(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    val spans = df.select(col(idCol).as("id"),
        explode(Dedup.shinglesUdf(k)(col(textCol))).as("span"))
    // document frequency per span, duplicated = seen in >= 2 docs;
    // count_distinct because a span can repeat WITHIN one document
    val dupSpans = spans.groupBy("span")
      .agg(count_distinct(col("id")).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .select("span")
    val tot = spans.groupBy("id").agg(count(lit(1)).as("n_spans"))
    val dup = spans.join(dupSpans, "span")
      .groupBy("id")
      .agg(count(lit(1)).as("n_dup_pos"),
        count_distinct(col("span")).as("n_dup_spans"))
    tot.join(dup, Seq("id"), "left")
      .select(col("id"), col("n_spans"),
        coalesce(col("n_dup_pos"), lit(0L)).as("n_dup_pos"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"))
  }
}
