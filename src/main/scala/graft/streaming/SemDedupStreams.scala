package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STREAMING twin of the SemDeDup centroid assignment
  * ([[graft.operators.SemDedup.assignments]]): route each arriving
  * embedding to its nearest frozen centroid — the online sharding step
  * in front of a semantic-dedup or ANN-index pipeline (each cluster's
  * members land in one partition/store; the within-cluster work happens
  * per shard downstream).
  *
  * Scale design: the centroid table is k·D longs, frozen at query
  * start and broadcast; assignment is ROW-LOCAL (one argmin fold per
  * embedding — no explode, no join, no shuffle, NO STATE; the batch
  * formulation's explode + centroid join + two aggs would force
  * stateful aggregation on a stream). Ties resolve to the smallest
  * centroid id, matching the batch operator's lexicographic struct
  * min. SemDedupStreamsSpec proves streamed ≡ batch and asserts
  * `stateOperators.isEmpty`.
  */
object SemDedupStreams {

  /** (vec_id, cluster) per arriving embedding. `centroids` maps
    * centroid id → quantized dimension values (the batch operator's
    * ×10^6 floor quantization — build it by collecting
    * [[graft.operators.SemDedup.quantized]] rows of the seed set,
    * k·D values, bounded by contract). Works on streaming and batch
    * frames alike. */
  def assignStream(emb: DataFrame, centroids: Map[Long, Array[Long]]): DataFrame = {
    val bc = SparkSession.active.sparkContext.broadcast(
      centroids.toSeq.sortBy(_._1))
    val assign = udf((e: Seq[Float]) =>
      if (e == null) -1L
      else {
        val q = e.map(x =>
          math.floor(x.toDouble * graft.operators.SemDedup.Scale).toLong)
        var bestSeed = -1L
        var bestDist = Long.MaxValue
        bc.value.foreach { case (seed, c) =>
          var s = 0L
          var i = 0
          while (i < q.length) { val df = q(i) - c(i); s += df * df; i += 1 }
          if (s < bestDist) { bestDist = s; bestSeed = seed } // ties: first
        }
        bestSeed
      })
    emb.select(col("vec_id"), assign(col("embedding")).as("cluster"))
      .filter(col("cluster") >= 0)
  }
}
