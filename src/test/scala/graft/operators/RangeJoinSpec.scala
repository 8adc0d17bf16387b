package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("pointInInterval: containment incl. boundaries, multi-chunk spans, no dups") {
    import spark.implicits._
    // chunk width 100: interval B spans chunks 0-2 and must still match
    // each contained point exactly once
    val points = Seq(
      (1L, 50L, 10L),   // in A [40,60] and B [0,250]
      (1L, 40L, 11L),   // ON A's start boundary
      (1L, 250L, 12L),  // ON B's end boundary (chunk 2)
      (1L, 300L, 13L),  // outside everything
      (2L, 50L, 14L)    // other key: no intervals → dropped
    ).toDF("k", "ts", "pid")
    val intervals = Seq(
      (1L, 40L, 60L, 100L),  // A
      (1L, 0L, 250L, 101L)   // B
    ).toDF("k", "s", "e", "iid")

    val out = RangeJoin.pointInInterval(points, intervals, "k", "ts", "s", "e", 100L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((10L, 100L), (10L, 101L), (11L, 100L), (11L, 101L),
      (12L, 101L)))
  }

  test("pathological open-ended interval fails fast with a named error") {
    import spark.implicits._
    val points = Seq((1L, 50L, 10L)).toDF("k", "ts", "pid")
    val intervals = Seq((1L, 0L, Long.MaxValue / 2, 100L)).toDF("k", "s", "e", "iid")
    val ex = intercept[Throwable] {
      RangeJoin.pointInInterval(points, intervals, "k", "ts", "s", "e", 100L)
        .collect()
    }
    val messages = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(messages.contains("pointInInterval"),
      s"expected the guard's named error, got:\n$messages")
  }

  test("plan: equi-join on (key, chunk), no cartesian") {
    import spark.implicits._
    val points = Seq((1L, 50L, 10L)).toDF("k", "ts", "pid")
    val intervals = Seq((1L, 0L, 99L, 100L)).toDF("k", "s", "e", "iid")
    val plan = RangeJoin.pointInInterval(points, intervals, "k", "ts", "s", "e", 100L)
      .queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val joins = plan.collect { case j: Join => j }
    assert(joins.nonEmpty && joins.forall(_.condition.nonEmpty),
      "chunked range join must be a conditioned equi-join")
  }
}
