package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions._

/** Bloom-filter-pruned semi join — the "runtime filter" pattern as an
  * explicit operator: build a bloom filter over the (filtered) dimension
  * keys, prune the fact table with a codegen'd `might_contain` BEFORE any
  * shuffle, then make the result exact with an ordinary left-semi join on
  * the survivors.
  *
  * Why this matters at 100 TB: a plain semi join shuffles (or at best
  * broadcast-hashes) EVERY fact row; with a selective dimension predicate
  * most of those rows are discarded after the exchange. The bloom filter
  * is built where the dimension lives, collapsed to a few hundred KB on
  * the driver, and re-embedded in the fact scan's filter — so
  * non-matching fact rows die at the scan, never entering the exchange.
  * This is exactly what Spark's own `InjectRuntimeFilter` rule does for
  * qualifying shuffle joins (spark.sql.optimizer.runtime.bloomFilter.*);
  * expressing it as an operator makes the pruning unconditional and
  * testable instead of cost-model-dependent.
  *
  * Exactness: bloom filters have false positives but NO false negatives,
  * so `prefilter ∘ semi-join ≡ semi-join` — proven by the q87 oracle
  * (plain `IN` subquery) hash-matching this operator's output, and by
  * BloomJoinSpec on randomized key sets.
  *
  * Driver-scale contract: the bloom filter itself is O(expectedItems)
  * BITS on the driver (~1.2 MB per million keys at 1% fpp) — the same
  * budget class as a broadcast dimension. The dimension ROWS never leave
  * the executors; only the merged bit array does.
  *
  * Reference semantics: the reference engines' federated sources filter
  * remote collections by id-membership lists (e.g.
  * optimade_database/Optimade_Server/server.py:106-120 pushes filters to
  * each provider); this is the same membership pushdown re-expressed as
  * a scan-side bloom prune.
  */
object BloomJoin {

  // once-per-session registration guard — same pattern and reason as
  // MisraGriesAgg (registry churn WARN-spams the driver's tail)
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  private def ensureRegistered(spark: SparkSession): Unit = {
    if (registered.containsKey(spark)) return
    registered.synchronized {
      if (!registered.containsKey(spark)) {
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          "bloom_might_contain",
          exprs => BloomFilterMightContain(exprs.head, exprs(1)),
          "scala_udf")
        registered.put(spark, java.lang.Boolean.TRUE)
      }
    }
  }

  /** `might_contain(filterBytes, value)` — Spark's native codegen'd bloom
    * probe (the value side must be LongType). The filter literal is
    * foldable, so the expression deserializes the bloom once per task,
    * not per row. */
  def mightContain(filterBytes: Array[Byte], value: Column): Column = {
    ensureRegistered(SparkSession.active)
    call_function("bloom_might_contain", lit(filterBytes), value)
  }

  /** Serialized bloom filter over `dim`'s long key column, built
    * distributed (one partial filter per partition, OR-merged on the
    * driver — `DataFrameStatFunctions.bloomFilter`). */
  def buildFilter(dim: DataFrame, dimKey: String,
                  expectedItems: Long, fpp: Double): Array[Byte] = {
    val bf = dim.select(col(dimKey).cast("long").as("k"))
      .filter(col("k").isNotNull)
      .stat.bloomFilter("k", expectedItems, fpp)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Left-semi join of `fact` to `dim` on a long key, with the fact side
    * bloom-pruned before the join. Result is EXACTLY
    * `fact semi-join dim` — the bloom only removes rows the join would
    * also remove; its false positives are caught by the final semi join
    * over the (already tiny) surviving key range. */
  def semiPruned(fact: DataFrame, factKey: String,
                 dim: DataFrame, dimKey: String,
                 expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val bytes = buildFilter(dim, dimKey, expectedItems, fpp)
    val pruned = fact.filter(mightContain(bytes, col(factKey).cast("long")))
    // alias the dim key so factKey == dimKey (the usual shape for a
    // shared-name dimension join) doesn't make the condition ambiguous
    val d = dim.select(col(dimKey).as("_bloom_dk"))
    pruned.join(d, pruned(factKey) === d("_bloom_dk"), "left_semi")
  }
}
