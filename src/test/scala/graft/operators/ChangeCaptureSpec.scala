package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ChangeCaptureSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("snapshotDiff: I/U/D classification, unchanged dropped, null-safe compare") {
    import spark.implicits._
    val oldS = Seq(
      (1L, Some("a"), 10),  // unchanged → dropped
      (2L, Some("b"), 20),  // value change → U
      (3L, None: Option[String], 30),  // null -> non-null → U
      (4L, Some("d"), 40),  // deleted → D
      (6L, None: Option[String], 60)   // null == null → unchanged, dropped
    ).toDF("id", "s", "v")
    val newS = Seq(
      (1L, Some("a"), 10),
      (2L, Some("B"), 20),
      (3L, Some("c"), 30),
      (5L, Some("e"), 50),  // inserted → I
      (6L, None: Option[String], 60)
    ).toDF("id", "s", "v")
    val got = ChangeCapture.snapshotDiff(oldS, newS, Seq("id"), Seq("s", "v"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(2L -> "U", 3L -> "U", 4L -> "D", 5L -> "I"))
  }

  test("snapshotDiff: composite key and multi-column compare") {
    import spark.implicits._
    val oldS = Seq((1L, "x", 1, 1), (1L, "y", 2, 2), (2L, "x", 3, 3))
      .toDF("k1", "k2", "a", "b")
    val newS = Seq((1L, "x", 1, 9), (1L, "y", 2, 2), (2L, "y", 3, 3))
      .toDF("k1", "k2", "a", "b")
    val got = ChangeCapture.snapshotDiff(oldS, newS, Seq("k1", "k2"), Seq("a", "b"))
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getString(2))).toMap
    assert(got == Map((1L, "x") -> "U", (2L, "x") -> "D", (2L, "y") -> "I"))
  }

  test("snapshotDiff: identical snapshots produce an empty diff") {
    import spark.implicits._
    val s = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    assert(ChangeCapture.snapshotDiff(s, s, Seq("id"), Seq("s")).count() == 0L)
  }
}
