package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  // ids with weights 1..n shuffled into arrival order
  private def fixture(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    rnd.shuffle((1 to n).toList)
      .map(i => (i.toLong, ((i * 31 + seed) % 100 + 1).toLong))
      .toDF("id", "w")
  }

  /** Driver-side reference: walk ids in order, count step boundaries
    * inside each doc's (cum, cum+w] interval. */
  private def reference(rows: Seq[(Long, Long)], target: Int) = {
    val tot = rows.map(_._2).sum
    val step = tot / target
    var cum = 0L
    rows.sortBy(_._1).flatMap { case (id, w) =>
      val k = (cum + w) / step - cum / step
      val first = cum / step + 1
      cum += w
      if (k >= 1) Some((id, w, cum - w, k, first)) else None
    }
  }

  test("pick counts match the boundary-walk reference, Σk = tot div step") {
    val df = fixture(400, 3)
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expect = reference(rows, target = 64)
    val got = Sampling.ppsSystematic(df, "id", "w", target = 64, chunkWidth = 50L)
      .select("id", "w", "cum_before", "k_picks", "first_slot")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(got === expect)
    val tot = rows.map(_._2).sum
    assert(got.map(_._4).sum === tot / (tot / 64))
  }

  test("a document heavier than one step is picked multiple times") {
    val df = (Seq((1L, 5L), (2L, 100L), (3L, 5L), (4L, 5L), (5L, 5L)))
      .toDF("id", "w")
    // tot=120, target=10 -> step=12; doc 2 spans (5,105]: boundaries
    // 12,24,...,96 -> 8 picks
    val got = Sampling.ppsSystematic(df, "id", "w", target = 10, chunkWidth = 2L)
      .select("id", "k_picks").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(2L) === 8L)
  }

  test("sample is invariant under repartitioning") {
    val df = fixture(300, 9)
    def run(in: org.apache.spark.sql.DataFrame) =
      Sampling.ppsSystematic(in, "id", "w", target = 32, chunkWidth = 64L)
        .select("id", "k_picks", "first_slot")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    assert(run(df.repartition(1)) === run(df.repartition(11)))
  }

  test("rejects a target larger than the total weight") {
    val df = Seq((1L, 3L), (2L, 4L)).toDF("id", "w")
    assertThrows[IllegalArgumentException] {
      Sampling.ppsSystematic(df, "id", "w", target = 100, chunkWidth = 1L)
    }
  }
}
