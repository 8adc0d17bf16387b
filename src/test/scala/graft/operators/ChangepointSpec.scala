package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ChangepointSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(rows: Seq[(String, Long, Long)]): Map[String, (Long, Long, Long, String)] = {
    import spark.implicits._
    Changepoint.cusumArgmax(rows.toDF("g", "o", "v"), "g", "o", "v")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
  }

  test("planted level shift: peak lands at the shift boundary") {
    // 5 points of 10 then 5 points of 110 — the deviation from uniform
    // growth peaks at the last low point (i=5): |10·50 − 5·600| = 2500
    val rows = (1L to 5L).map(i => ("a", i, 10L)) ++
      (6L to 10L).map(i => ("a", i, 110L))
    assert(run(rows) == Map("a" -> ((10L, 600L, 5L, "2500"))))
  }

  test("uniform series: statistic is zero everywhere, argmax = first point") {
    val rows = (1L to 8L).map(i => ("u", i, 7L))
    assert(run(rows) == Map("u" -> ((8L, 56L, 1L, "0"))))
  }

  test("matches a driver-side brute force on random series (incl. ties)") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 10) {
      val n = 2 + rnd.nextInt(30)
      // small value domain to provoke statistic ties
      val vs = (1 to n).map(_ => rnd.nextInt(4).toLong)
      val rows = vs.zipWithIndex.map { case (v, i) => ("g", (i + 1).toLong, v) }
      val tot = vs.sum
      val stats = vs.scanLeft(0L)(_ + _).drop(1).zipWithIndex.map {
        case (s, i0) => math.abs(n.toLong * s - (i0 + 1).toLong * tot)
      }
      val mx = stats.max
      val peak = (stats.indexWhere(_ == mx) + 1).toLong
      assert(run(rows) == Map("g" -> ((n.toLong, tot, peak, mx.toString))),
        s"trial $trial vs=$vs")
    }
  }

  test("groups are independent") {
    val rows = Seq(("a", 1L, 0L), ("a", 2L, 100L), ("b", 1L, 5L))
    val got = run(rows)
    // a: stats |2·0−1·100|=100 at i=1, |2·100−2·100|=0 → peak ord 1
    assert(got("a") == ((2L, 100L, 1L, "100")))
    // single-point group: stat |1·5−1·5| = 0
    assert(got("b") == ((1L, 5L, 1L, "0")))
  }
}
