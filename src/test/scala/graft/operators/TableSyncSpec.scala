package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TableSyncSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def table(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("k", "v1", "v2")
  }

  private val keyH = TableSync.rowHash(Seq(col("k")))
  private val rowH = TableSync.rowHash(Seq(col("k"), col("v1"), col("v2")))

  test("digest is order- and partitioning-independent") {
    val rows = (1L to 500L).map(k => (k, k * 3, k % 17))
    val a = TableSync.bucketDigest(table(rows), keyH, rowH, 16)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val b = TableSync.bucketDigest(
        table(scala.util.Random.shuffle(rows)).repartition(7), keyH, rowH, 16)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(a == b)
  }

  test("limb sums reconstruct the full-width hash sum exactly") {
    // the r12 digest optimization replaced sum(h) as DECIMAL(38,0) with
    // two BIGINT limb sums; h_lo + 2^16 * h_hi must equal the old sum
    // bit-for-bit, so detection power is unchanged
    val rows = (1L to 500L).map(k => (k, k * 3, k % 17))
    val full = table(rows)
      .select(pmod(keyH, lit(16L)).as("bucket"), rowH.as("h"))
      .groupBy("bucket").agg(sum(col("h")).as("hsum")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val limbs = TableSync.bucketDigest(table(rows), keyH, rowH, 16).collect()
      .map(r => r.getLong(0) -> (r.getLong(2) + 65536L * r.getLong(3))).toMap
    assert(limbs == full)
  }

  test("a single changed row dirties exactly one bucket") {
    val rows = (1L to 500L).map(k => (k, k * 3, k % 17))
    val edited = rows.map { case (k, v1, v2) =>
      if (k == 137L) (k, v1 + 1, v2) else (k, v1, v2)
    }
    val dirty = TableSync.dirtyBuckets(
      TableSync.bucketDigest(table(rows), keyH, rowH, 16),
      TableSync.bucketDigest(table(edited), keyH, rowH, 16)).collect()
    assert(dirty.length == 1)
  }

  test("syncDiff equals the full unpruned snapshotDiff on random edits") {
    val rnd = new scala.util.Random(114)
    for (trial <- 1 to 3) {
      val oldRows = (1L to 400L).map(k => (k, rnd.nextInt(1000).toLong, k % 23))
      val newRows = oldRows.flatMap { case (k, v1, v2) =>
        rnd.nextInt(10) match {
          case 0 => None                      // delete
          case 1 => Some((k, v1 + 7, v2))     // update
          case _ => Some((k, v1, v2))
        }
      } ++ (1L to 20L).map(i => (10000L + i, i, i)) // inserts
      val expect = ChangeCapture
        .snapshotDiff(table(oldRows), table(newRows), Seq("k"), Seq("v1", "v2"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val got = TableSync
        .syncDiff(table(oldRows), table(newRows), keyH, rowH, 16,
          Seq("k"), Seq("v1", "v2"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == expect, s"trial $trial")
    }
  }

  test("identical snapshots: no dirty buckets, empty diff") {
    val rows = (1L to 300L).map(k => (k, k, k))
    assert(TableSync.dirtyBuckets(
      TableSync.bucketDigest(table(rows), keyH, rowH, 8),
      TableSync.bucketDigest(table(rows), keyH, rowH, 8)).isEmpty)
    assert(TableSync.syncDiff(table(rows), table(rows), keyH, rowH, 8,
      Seq("k"), Seq("v1", "v2")).isEmpty)
  }

  test("negative values hash without ANSI overflow (arithmetic-shift halves)") {
    val rows = Seq((-5L, -1000000000000L, Long.MinValue + 3), (2L, 0L, -1L))
    val d = TableSync.bucketDigest(table(rows), keyH, rowH, 4).collect()
    assert(d.map(_.getLong(1)).sum == 2L)
  }
}
