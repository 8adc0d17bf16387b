package graft

import org.apache.spark.sql.SparkSession

/** Session cache lifecycle for operator-internal persists — the one-page
  * policy lives in docs/CACHE_POLICY.md; this object is its API.
  *
  * Operators here persist internal frames when AQE would otherwise
  * re-execute a shared subplan once per consumer (CLAUDE.md ground
  * rule: runtime broadcast conversion defeats ReuseExchange). Where the
  * RETURNED Dataset still lazily depends on such a frame, the operator
  * cannot unpersist before returning — an unpersist that precedes the
  * caller's materialization silently discards the cache and the shared
  * stage recomputes per consumer, the exact bug the persist fixed. Those
  * operators carry a "Cache ownership" scaladoc note and the CALLER owns
  * the release: materialize the result, then [[releaseAll]].
  *
  * One-job-per-operator production is unaffected (JVM exit frees the
  * pool); this is for long-lived composed sessions — notebooks,
  * services, the Bench/Verify harnesses (which call [[releaseAll]]
  * after every query).
  */
object Caches {

  /** Release every cache in the session: catalog-tracked Dataset
    * persists (`spark.catalog.clearCache`) AND RDD-level persists —
    * iterative operators' per-round localCheckpoints, which the catalog
    * cache never tracks (round-9 storage-accumulation lesson). Parquet-
    * backed [[Aux]] shares are unaffected: their write-once memo skips
    * the rewrite and readers re-read from disk.
    *
    * `blocking = false` (default) marks blocks for async removal — the
    * registry empties immediately, the bytes drain shortly after; pass
    * `blocking = true` when asserting on [[storageBytes]]. The RDD
    * sweep runs FIRST so the flag governs every materialized block
    * (catalog-cached frames included — clearCache itself hard-codes
    * non-blocking removal and would otherwise deregister them before
    * the sweep sees them); clearCache then purges the CacheManager
    * entries so no plan stays marked as cached. */
  def releaseAll(spark: SparkSession, blocking: Boolean = false): Unit = {
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = blocking))
    spark.catalog.clearCache()
  }

  /** Distinct cached RDDs currently registered (catalog-cached Datasets
    * appear here once materialized; localCheckpoints always do). */
  def cachedFrames(spark: SparkSession): Int =
    spark.sparkContext.getPersistentRDDs.size

  /** Bytes resident in the block-manager storage pool. */
  def storageBytes(spark: SparkSession): Long =
    spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum
}
