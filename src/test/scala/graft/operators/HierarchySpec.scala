package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HierarchySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("rootAndDepth: hand forest with null-parent and self-parent roots") {
    import spark.implicits._
    // two trees: 1 <- 2 <- 4, 1 <- 3  (root 1, self-parent)
    //            10 <- 11           (root 10, null parent)
    val nodes = Seq(
      (1L, Some(1L)), (2L, Some(1L)), (3L, Some(1L)), (4L, Some(2L)),
      (10L, None: Option[Long]), (11L, Some(10L))
    ).toDF("id", "parent")
    val got = Hierarchy.rootAndDepth(nodes, "id", "parent")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 1L, 0L), (2L, 1L, 1L), (3L, 1L, 1L), (4L, 1L, 2L),
      (10L, 10L, 0L), (11L, 10L, 1L)))
  }

  test("rootAndDepth: deep chain needs O(log depth) rounds, matches walk") {
    import spark.implicits._
    // one chain 0 <- 1 <- 2 <- ... <- 200: depth(k) = k
    val n = 200
    val nodes = (0 to n).map(k => (k.toLong, math.max(0, k - 1).toLong))
      .toDF("id", "parent").repartition(5)
    val got = Hierarchy.rootAndDepth(nodes, "id", "parent")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == n + 1)
    assert(got.forall { case (id, root, depth) => root == 0L && depth == id })
    // a one-step walk would need 200 rounds; the default maxRounds=40
    // passing at depth 200 is itself evidence of doubling
  }

  test("rootAndDepth: random forest matches driver-side walk, any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // parent(k) < k guarantees a DAG/forest; k < 5 are roots
    val parents = (0 until 300).map(k =>
      if (k < 5) k.toLong else rnd.nextInt(k).toLong).toArray
    def walk(k: Int): (Long, Long) = {
      var cur = k; var d = 0L
      while (parents(cur) != cur) { cur = parents(cur).toInt; d += 1 }
      (cur.toLong, d)
    }
    val expected = (0 until 300).map(k => (k.toLong, walk(k)._1, walk(k)._2)).toSet
    for (parts <- Seq(1, 7)) {
      val nodes = (0 until 300).map(k => (k.toLong, parents(k)))
        .toDF("id", "parent").repartition(parts)
      val got = Hierarchy.rootAndDepth(nodes, "id", "parent")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected, s"parts=$parts")
    }
  }

  test("rootAndDepth: a cycle fails the convergence guard instead of looping") {
    import spark.implicits._
    val nodes = Seq((1L, 2L), (2L, 1L)).toDF("id", "parent")
    val e = intercept[IllegalArgumentException] {
      Hierarchy.rootAndDepth(nodes, "id", "parent", maxRounds = 6).collect()
    }
    assert(e.getMessage.contains("not converged"))
  }
}
