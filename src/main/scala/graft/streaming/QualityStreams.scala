package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming data-quality monitor: the live twin of the batch
  * constraint audit ([[graft.operators.Constraints]], q266/q267) — per
  * event-time window and rule, row counts and violation counts, so an
  * ingest pipeline watches its gate DEGRADE in near-real-time instead
  * of discovering a poisoned snapshot at publish.
  *
  * Shape: every row is exploded to one (rule, violated?) pair per rule
  * — row-local, rules-sized fan-out — then ONE windowed aggregation
  * keyed by (window, rule). Same code runs on a batch frame (the
  * Dataset-API twin property EventStreams.windowedAgg establishes);
  * under a stream, the watermark bounds state to open windows ×
  * #rules and append mode emits each window once, finalized.
  *
  * The additive-merge identity behind q267 is what makes the windowed
  * counts TRUSTABLE as a gate: per-window row-rule counts sum to the
  * batch audit of any span of windows.
  */
object QualityStreams {

  /** @param rules (name, violation predicate) — predicates must be
    *   row-local (the [[graft.operators.Constraints.rowAudit]] class).
    * @return (win_start, rule, n_rows, violations) */
  def auditStream(events: DataFrame, tsCol: String,
                  rules: Seq[(String, Column)], windowDur: String,
                  watermark: String): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val stacked = events.select(col(tsCol).as("_ts"),
      explode(array(rules.map { case (n, p) =>
        struct(lit(n).as("rule"), when(p, 1L).otherwise(0L).as("viol"))
      }: _*)).as("r"))
      .select(col("_ts"), col("r.rule").as("rule"), col("r.viol").as("viol"))
    stacked.withWatermark("_ts", watermark)
      .groupBy(window(col("_ts"), windowDur), col("rule"))
      .agg(count(lit(1)).as("n_rows"), sum("viol").as("violations"))
      .select(unix_millis(col("window.start")).as("win_start_ms"),
        col("rule"), col("n_rows"), col("violations"))
  }
}
