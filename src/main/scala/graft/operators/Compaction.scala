package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planning — the lakehouse OPTIMIZE/bin-pack
  * step: given a file listing (table partition, file id, bytes), group
  * files into output bins of ≈ `targetBytes` so a rewrite pass turns N
  * small files into ⌈Σbytes/target⌉ right-sized ones. The 100 TB pain
  * this addresses is real: a partition with 10⁵ kilobyte files costs
  * more in task scheduling and footer reads than in data.
  *
  * Assignment rule: within each table partition, files in ascending id
  * order; bin = (running byte total BEFORE this file) div targetBytes.
  * Deterministic, one window pass per partition (no global window —
  * the running sum partitions by the table partition), and every bin
  * except possibly the last lands in [target, target + maxFile): the
  * first file crossing a boundary closes its bin. The plan is a pure
  * relational result — the rewrite itself is a partitioned write the
  * caller drives.
  */
object Compaction {

  /** Plan bins over `files` (partCol, idCol, bytesCol). Returns
    * (part, bin, n_files, sum_bytes) — all BIGINT except the partition
    * key. */
  def plan(files: DataFrame, partCol: String, idCol: String,
           bytesCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val byPart = Window.partitionBy("part").orderBy("id")
    files.select(col(partCol).as("part"), col(idCol).as("id"),
        col(bytesCol).cast("long").as("bytes"))
      .withColumn("cum_before",
        coalesce(sum(col("bytes")).over(
          byPart.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("bin", expr(s"cum_before div $targetBytes"))
      .groupBy("part", "bin")
      .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("sum_bytes"))
  }
}
