package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream–static dimension enrichment — the remaining cell of the
  * streaming matrix (windowed aggs, sessionization, dedup,
  * stream-stream interval join, sketches and CDC materialization are
  * covered by the sibling objects): a fact STREAM joined to a slowly
  * changing DIMENSION table, then aggregated per enriched attribute.
  *
  * Scale design: a stream–static inner join is STATELESS — nothing is
  * buffered in the state store; each micro-batch joins against the
  * current dimension snapshot (Spark re-plans the static side per
  * batch, which is also what makes a dimension refresh visible without
  * restarting the query). The dimension chain is broadcast explicitly
  * — customer×nation reduces to (user_id, n_name) before shipping, so
  * the per-batch cost is one broadcast hash join probe per event, no
  * shuffle of the stream at the join. The downstream windowed
  * aggregation is the only stateful node and carries the watermark.
  *
  * The same code runs batch (q123's oracle joins + buckets in DuckDB)
  * and streaming (EnrichStreamsSpec proves batch ≡ streaming and that
  * the join stays stateless).
  */
object EnrichStreams {

  /** Per (5-minute window, customer nation) event counts and value
    * sums. `events` may be a streaming or batch frame; `customer` /
    * `nation` are static dimension tables. */
  def enrichedNationAgg(events: DataFrame, customer: DataFrame,
                        nation: DataFrame): DataFrame = {
    val dim = customer.select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey").as("user_id"), col("n_name"))
    events
      .withWatermark("ts", "10 minutes")
      .join(broadcast(dim), "user_id")
      .groupBy(window(col("ts"), "5 minutes"), col("n_name"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(unix_millis(col("window.start")).as("window_start_ms"),
        col("n_name"), col("n_events"), col("sum_value"))
  }

  /** STREAMING point-in-time SCD2 enrichment: each fact in the stream
    * picks the STATIC dimension version whose [valid_from, valid_to)
    * interval contains its timestamp.
    *
    * The batch form ([[graft.operators.Scd.pitJoin]]) uses the as-of
    * carry — a running window — which streaming cannot execute
    * (non-time windows are unsupported on streams). But with a STATIC
    * dimension the containment join IS the right streaming plan:
    * stream–static joins are STATELESS (nothing buffered; each
    * micro-batch probes the broadcast dimension snapshot), and because
    * SCD2 intervals partition time per key, each fact matches at most
    * one version — so the inequality pair costs one interval test per
    * (fact, key-version) candidate under a broadcast hash join on the
    * key, never a range-join blow-up (versions per key are few by the
    * SCD2 construction). EnrichStreamsSpec proves streamed output ≡
    * [[graft.operators.Scd.pitJoin]] on the same data and that no
    * state store is materialized.
    *
    * `dims` must carry (keyCol, value, valid_from, valid_to) —
    * [[graft.operators.Scd.intervals]] output. Facts before the first
    * version drop (inner semantics); a fact AT a boundary sees the new
    * version (valid_from inclusive, valid_to exclusive).
    */
  def pitEnrichStream(facts: DataFrame, dims: DataFrame, keyCol: String,
                      factTs: String, factIdCol: String): DataFrame = {
    val d = dims.select(col(keyCol).as("_k"), col("value"),
      col("valid_from"), col("valid_to"))
    facts
      .join(broadcast(d),
        col(keyCol) === col("_k") &&
          col(factTs) >= col("valid_from") &&
          (col("valid_to").isNull || col(factTs) < col("valid_to")))
      .select(col(keyCol), col(factIdCol).cast("long").as("fact_id"),
        col(factTs), col("value").cast("string").as("version"))
  }
}
