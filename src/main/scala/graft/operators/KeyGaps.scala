package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Key-space gap audit: the missing-id ranges of an integer key set —
  * the sequence/completeness check a pipeline runs after a purge,
  * a partial load, or an id-allocating writer crash ("which order ids
  * were never delivered?"). Output is one row per maximal run of
  * absent keys strictly inside [min(key), max(key)].
  *
  * The textbook formulation is `lag(key) OVER (ORDER BY key)` — a
  * GLOBAL window that single-tasks the whole key set. This operator
  * block-partitions instead: a gap between consecutive present keys
  * either falls inside one `blockSize`-aligned block of the key space
  * (caught by a per-block window — partitioned, parallel) or spans
  * block summaries (caught by a boundary scan over the per-block
  * (min, max) table, which is |keys|/blockSize rows — the PrefixSum
  * two-level pattern, driver cost O(#non-empty blocks) with empty
  * blocks never materialized). The two row sets are disjoint by
  * construction and their union is exactly the global-lag answer
  * (KeyGapsSpec proves it against brute force).
  */
object KeyGaps {

  /** Missing-key ranges of `keyCol`'s distinct values, as
    * (gap_start, gap_end, gap_len) — inclusive bounds, all BIGINT.
    * `blockSize` trades per-task parallelism against the O(#blocks)
    * driver boundary scan. */
  def gaps(df: DataFrame, keyCol: String, blockSize: Long = 1 << 16): DataFrame = {
    require(blockSize >= 2, "blockSize must be >= 2")
    val spark = df.sparkSession
    val keys = df.select(col(keyCol).cast("long").as("k")).distinct()
      .withColumn("block", expr(s"k div $blockSize"))

    // level 1: gaps between consecutive keys INSIDE a block
    val w = Window.partitionBy("block").orderBy("k")
    val local = keys
      .withColumn("prev", lag(col("k"), 1).over(w))
      .filter(col("prev").isNotNull && col("k") - col("prev") > 1)
      .select((col("prev") + 1).as("gap_start"), (col("k") - 1).as("gap_end"))

    // level 2: per-block (min, max) summaries — |keys|/blockSize rows —
    // scanned pairwise on the driver for block-spanning gaps
    val summaries = keys.groupBy("block")
      .agg(min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("block")
      .collect()
    val spanning = summaries.sliding(2).collect {
      case Array(a, b) if b.getLong(1) - a.getLong(2) > 1 =>
        (a.getLong(2) + 1, b.getLong(1) - 1)
    }.toSeq
    val spanningDf = spark.createDataFrame(spanning)
      .toDF("gap_start", "gap_end")

    local.unionByName(spanningDf)
      .withColumn("gap_len", col("gap_end") - col("gap_start") + 1)
  }
}
