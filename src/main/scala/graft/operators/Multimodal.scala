package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines.
  *
  * Media are opaque `binary` columns plus a typed metadata struct; the
  * Spark-side plumbing (schema, partition-parallel batch decode, feature
  * extraction shape, frame sampling) is real and tested, while the codec
  * itself is STUBBED with a deterministic fake (this container has no
  * image/audio libraries). Swapping in a real decoder means replacing
  * [[StubCodec.decode]] only — the operator shapes don't change.
  *
  * Scale design: decode runs inside mapPartitions so a real codec
  * amortizes per-partition init (model load, JNI handles) across rows —
  * the same batching contract a vectorized pandas-UDF bridge gives Python
  * codecs. No driver-side collection at any point.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int, content_hash: Long,
      feature: Array[Float])

  /** STUB decode → feature vector: deterministic bytes → pseudo-features.
    * A real implementation would decode pixels/samples here. */
  object StubCodec {
    val FeatureDim = 8
    def decode(kind: String, content: Array[Byte]): Array[Float] = {
      // deterministic fake: chunked byte sums, normalized — stands in for
      // a pooled embedding; ??? is NOT used so pipelines run end-to-end
      val f = new Array[Float](FeatureDim)
      if (content != null && content.nonEmpty) {
        var i = 0
        while (i < content.length) {
          f(i % FeatureDim) += (content(i) & 0xff) / 255.0f
          i += 1
        }
        val n = math.max(1, content.length / FeatureDim)
        (0 until FeatureDim).foreach(j => f(j) /= n)
      }
      f
    }
  }

  private def fnv1a(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Partition-parallel decode + feature extraction. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "content").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init happens HERE for a real codec
        it.map { case (id, kind, content) =>
          val bytes = if (content == null) Array.emptyByteArray else content
          MediaFeatures(id, kind, bytes.length, fnv1a(bytes),
            StubCodec.decode(kind, bytes))
        }
      }
  }

  /** Frame sampling contract for video rows: every `everyMs` timestamp in
    * [0, duration) — pure Catalyst sequence, one row per sampled frame. */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("kind") === "video" && col("meta.duration_ms").isNotNull)
      .select(col("media_id"),
        explode(sequence(lit(0L), col("meta.duration_ms") - 1, lit(everyMs)))
          .as("frame_ts_ms"))

  /** Exact binary dedup on content hash + length (cheap pre-filter before
    * byte-equality if collisions matter). */
  def dedupByContent(media: DataFrame): DataFrame = {
    val hashed = media.withColumn("content_hash", xxhash64(col("content")))
      .withColumn("n_bytes", length(col("content")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("content_hash", "n_bytes").orderBy(col("media_id"))
    hashed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Deterministic synthetic media table for tests/demos: bytes derived
    * from a seed column (documents text, say). */
  def syntheticMedia(spark: SparkSession, src: DataFrame,
                     idCol: String, seedCol: String): DataFrame =
    src.select(
      col(idCol).cast("long").as("media_id"),
      element_at(typedlit(Seq("image", "audio", "video")),
        (col(idCol) % 3 + 1).cast("int")).as("kind"),
      encode(col(seedCol), "UTF-8").as("content"),
      struct(
        lit("application/octet-stream").as("mime"),
        length(col(seedCol)).cast("int").as("width"),
        lit(16).as("height"),
        (length(col(seedCol)) * 40L).as("duration_ms")).as("meta"))
}
