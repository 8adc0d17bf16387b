package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ProfileSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("profile: hand-checked nulls/distinct/min/max over mixed types") {
    import spark.implicits._
    val df = Seq(
      (Some(3L), Some("b")),
      (Some(1L), None),
      (None, Some("a")),
      (Some(3L), Some("c")),
      (Some(7L), None)
    ).toDF("k", "s")
    val rows = Profile.profile(df, Seq("k", "s")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))).toMap
    assert(rows("k") == ((1L, 3L, "1", "7")))
    assert(rows("s") == ((2L, 3L, "a", "c")))
  }

  test("profile: approx mode returns plausible distinct counts on the same pass") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, (i % 13).toString)).toDF("k", "s")
    val rows = Profile.profile(df, Seq("k", "s"), exact = false).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(math.abs(rows("k") - 1000L) <= 50L) // HLL ~2% error
    assert(math.abs(rows("s") - 13L) <= 2L)
    // nulls/min/max identical to the exact pass
    val exact = Profile.profile(df, Seq("k", "s")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(3), r.getString(4)))).toMap
    val approx = Profile.profile(df, Seq("k", "s"), exact = false).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(3), r.getString(4)))).toMap
    assert(exact == approx)
  }
}
