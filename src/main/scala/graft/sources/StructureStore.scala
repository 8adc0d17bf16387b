package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Storage layout for the structures corpus at cluster scale.
  *
  * Two layouts, matching how the data is queried:
  *  - [[writePartitioned]]: hive-style partition directories on
  *    `provider` — mirrors the reference's per-provider fan-out
  *    (SURVEY §4 partition pruning): a per-provider query touches only
  *    that provider's files, so federation over N providers scans 1/N of
  *    the corpus per source.
  *  - [[writeBucketed]]: bucketed + sorted table on the join/dedup key —
  *    co-locates equal keys so the D1 id-dedup window and id-equi-joins
  *    run shuffle-free (bucket-aware scan instead of an Exchange).
  *
  * Both are plain Spark writers: at 100 TB the same calls produce a
  * many-file layout per partition/bucket; nothing here is local-mode
  * specific.
  */
object StructureStore {

  def writePartitioned(df: DataFrame, path: String,
                       partitionCol: String = "provider"): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Number of files actually READ for a predicate (post partition
    * pruning) — `DataFrame.inputFiles` reports the unpruned relation, so
    * this executes the query and reads the scan's numFiles metric.
    * Recurses through AQE wrappers (AdaptiveSparkPlanExec / query
    * stages), which hide the scans from a plain collectLeaves. With
    * multiple file scans in the plan, `pathContains` selects which
    * relation(s) to count (substring of the scan's root path); scans of
    * all relations are summed when it is empty. Returns -1 if no
    * matching file scan exists. */
  def filesScanned(df: DataFrame, pathContains: String = ""): Long = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // collect() runs THIS DataFrame's QueryExecution (count() would build
    // a fresh plan whose metrics we couldn't see)
    df.collect()
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other =>
        other.children.flatMap(scans) ++ other.subqueries.flatMap(scans)
    }
    val matched = scans(df.queryExecution.executedPlan).filter(f =>
      pathContains.isEmpty ||
        f.relation.location.rootPaths.exists(_.toString.contains(pathContains)))
    if (matched.isEmpty) -1L else matched.map(_.metrics("numFiles").value).sum
  }

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int = 8): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
