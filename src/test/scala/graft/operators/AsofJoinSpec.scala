package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class AsofJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000L)

  test("asofMatch: latest right ≤ left per key, inclusive, inner, tie-reduced") {
    import spark.implicits._
    val left = Seq(
      (1L, ts(10), 100L), // after rights at 5, 8 → matches 8's row
      (1L, ts(8), 101L),  // EQUAL ts to a right row → inclusive match
      (1L, ts(3), 102L),  // before any right → dropped (inner)
      (2L, ts(50), 103L), // other key → matches its own right only
      (3L, ts(50), 104L)  // key with no rights at all → dropped
    ).toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts(5), 200L),
      (1L, ts(8), 201L),
      (1L, ts(8), 202L),  // duplicate (key, ts) → reduced to max id 202
      (1L, ts(12), 203L), // later than every left → never matched
      (2L, ts(49), 204L)
    ).toDF("user_id", "ts", "event_id")

    val out = AsofJoin.asofMatch(left, right, "user_id", "ts", "ts",
        "event_id", "event_id")
      .collect().map(r => (r.getLong(1), r.getLong(3))).toMap
    assert(out == Map(100L -> 202L, 101L -> 202L, 103L -> 204L))
  }

  test("asofMatch plan: one key shuffle, window partitioned, no join operator") {
    import spark.implicits._
    val left = Seq((1L, ts(1), 1L)).toDF("user_id", "ts", "event_id")
    val right = Seq((1L, ts(0), 2L)).toDF("user_id", "ts", "event_id")
    val plan = AsofJoin.asofMatch(left, right, "user_id", "ts", "ts",
      "event_id", "event_id").queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Window => LWindow}
    assert(plan.collect { case j: Join => j }.isEmpty, "asof must not plan a join")
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty))
  }
}
