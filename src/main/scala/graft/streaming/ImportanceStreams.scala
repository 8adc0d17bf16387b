package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STREAMING twin of the DSIR importance scorer
  * ([[graft.operators.Importance]]): score each arriving document of a
  * raw-pool stream against a FROZEN target-resemblance weight table —
  * the online admission filter in front of a training-data pipeline
  * (batch selection reranks a finished corpus; this scores docs as
  * they land).
  *
  * Scale design: the weight table is vocabulary-sized (the batch
  * operator's TakeOrdered cap) and frozen at query start, so scoring
  * is ROW-LOCAL — one pass over the doc's tokens against a broadcast
  * map, no explode, no join, no shuffle, and crucially NO STATE (the
  * batch formulation's explode + join + per-doc re-aggregation would
  * force a stateful agg on the stream; a document is one row, so the
  * one-pass fold is the stateless plan). ImportanceStreamsSpec proves
  * streamed ≡ batch [[graft.operators.Importance.scores]] and asserts
  * `stateOperators.isEmpty`.
  */
object ImportanceStreams {

  /** (doc_id, score, n_hits) per arriving doc, matching the batch
    * scorer's semantics exactly — docs with zero vocabulary hits are
    * absent (the batch inner join's contract). Works on streaming and
    * batch frames alike. */
  def scoreStream(docs: DataFrame, idCol: String, textCol: String,
                  weights: Map[String, Long]): DataFrame = {
    val bc = SparkSession.active.sparkContext.broadcast(weights)
    val score = udf((text: String) =>
      if (text == null) (0L, 0L)
      else {
        val w = bc.value
        var s = 0L
        var h = 0L
        text.split(" ").foreach { t =>
          if (t.nonEmpty) w.get(t).foreach { v => s += v; h += 1 }
        }
        (s, h)
      })
    docs.select(col(idCol).as("doc_id"), score(col(textCol)).as("sc"))
      .select(col("doc_id"), col("sc._1").as("score"), col("sc._2").as("n_hits"))
      .filter(col("n_hits") > 0)
  }
}
