package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class CurationStreamsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType)))

  // 3 langs, skewed: en 6 docs, de 3, zh 1; quota 2 per lang
  private val rows = Seq(
    1L -> "en", 2L -> "de", 3L -> "en", 4L -> "zh", 5L -> "en",
    6L -> "de", 7L -> "en", 8L -> "de", 9L -> "en", 10L -> "en")

  private def write(dir: String, batch: Seq[(Long, String)]): Unit =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        batch.map { case (i, l) => org.apache.spark.sql.Row(i, l) }, 1), schema)
      .coalesce(1).write.mode("append").parquet(dir)

  private def run(dir: String, name: String,
                  filesPerTrigger: Option[Int]): Map[Long, Boolean] = {
    import spark.implicits._
    val reader = spark.readStream.schema(schema)
    val src = filesPerTrigger.fold(reader)(n =>
      reader.option("maxFilesPerTrigger", n)).parquet(dir)
    val q = CurationStreams.quotaAdmitStream(
        src.as[CurationStreams.ScoredDoc], quota = 2)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      // stateful by design: one counter row per lang
      assert(q.lastProgress.stateOperators.nonEmpty)
      spark.sql(s"SELECT doc_id, admitted FROM $name")
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    } finally q.stop()
  }

  /** Batch reference: first `quota` per lang by doc_id. */
  private def batchExpected: Map[Long, Boolean] = {
    val byLang = rows.groupBy(_._2)
    byLang.flatMap { case (_, docs) =>
      val admitted = docs.map(_._1).sorted.take(2).toSet
      docs.map { case (id, _) => id -> admitted.contains(id) }
    }
  }

  test("one micro-batch: admits the smallest ids per lang up to quota") {
    val dir = Files.createTempDirectory("graft-quota1").toString
    write(dir, rows.sortBy(_._1))
    assert(run(dir, "quota_one", None) == batchExpected)
  }

  test("quota state carries across micro-batches") {
    val dir = Files.createTempDirectory("graft-quota2").toString
    // three id-ordered files → micro-batches under trigger=1.
    // FileStreamSource orders files by mtime, which can TIE on a fast
    // filesystem, so batch order between the files is not guaranteed —
    // assert per-lang ADMITTED COUNTS (order-robust), which still
    // prove cross-batch state: without carry, each micro-batch would
    // admit up to the quota again and 'en' would exceed 2.
    val sorted = rows.sortBy(_._1)
    write(dir, sorted.take(4)); write(dir, sorted.slice(4, 7))
    write(dir, sorted.drop(7))
    val got = run(dir, "quota_multi", Some(1))
    assert(got.size == rows.size)
    val langOf = rows.toMap
    val counts = got.toSeq.filter(_._2).map { case (id, _) => langOf(id) }
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(counts == Map("en" -> 2, "de" -> 2, "zh" -> 1))
    // rejected = everything beyond the quota
    assert(got.values.count(_ == false) == rows.size - 5)
  }
}
