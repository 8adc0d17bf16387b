package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def media = {
    import spark.implicits._
    val docs = Seq(
      (0L, "hello world"), (1L, "audio content here"), (2L, "video payload bytes"),
      (3L, "hello world")) // same content as 0
      .toDF("doc_id", "text")
    Multimodal.syntheticMedia(spark, docs, "doc_id", "text")
  }

  test("schema plumbing: binary content + typed metadata struct") {
    val m = media
    assert(m.schema("content").dataType.typeName == "binary")
    assert(m.schema("meta").dataType.typeName == "struct")
    val kinds = m.select("kind").collect().map(_.getString(0)).toSeq
    assert(kinds == Seq("image", "audio", "video", "image")) // id % 3 rotation
  }

  test("feature extraction is partition-parallel, deterministic, typed") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media.repartition(3)).collect().sortBy(_.media_id)
    assert(f1.map(_.content_hash).toSeq == f2.map(_.content_hash).toSeq)
    assert(f1.forall(_.feature.length == Multimodal.StubCodec.FeatureDim))
    // identical bytes → identical features & hash
    assert(f1(0).content_hash == f1(3).content_hash)
    assert(f1(0).feature.toSeq == f1(3).feature.toSeq)
    assert(f1(0).n_bytes == "hello world".length)
  }

  test("frame sampling: one row per everyMs in [0, duration)") {
    val frames = Multimodal.sampleFrames(media, everyMs = 100)
    // only the video row (id 2, duration = len("video payload bytes")*40 = 760ms)
    val rows = frames.collect()
    assert(rows.forall(_.getLong(0) == 2L))
    assert(rows.length == 8) // 0,100,...,700
  }

  test("binary dedup collapses identical content") {
    val deduped = Multimodal.dedupByContent(media)
    assert(deduped.count() == 3)
    val ids = deduped.select("media_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(0L, 1L, 2L)) // min id survives for the dup pair
  }
}
