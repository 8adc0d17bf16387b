package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def counts(texts: Seq[String]) = {
    import spark.implicits._
    Bpe.adjacentPairCounts(texts.toDF("text"), "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
  }

  test("pair counts match a driver-side sliding count") {
    val texts = Seq("a b a b c", "b c b c", "a", "", "x y")
    val expect = texts.map(_.split(" ", -1).toSeq).filter(_.size >= 2)
      .flatMap(ts => ts.zip(ts.tail))
      .groupBy(identity).map { case (p, o) => p -> o.size.toLong }
    assert(counts(texts) == expect)
  }

  test("repeated token runs count every adjacent occurrence") {
    assert(counts(Seq("a a a a")) == Map(("a", "a") -> 3L))
  }

  test("applyMerge is left-greedy: consumed tokens cannot re-match") {
    import spark.implicits._
    val out = Bpe.applyMerge(Seq("a a a", "a a a a", "b a a c").toDF("text"),
        "text", "a", "a", "aa")
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("aa a", "aa aa", "b aa c"))
  }

  test("one full merge round: top pair merged, recount reflects it") {
    import spark.implicits._
    val docs = Seq("t h e", "t h i s", "o t h e r").toDF("text")
    val top = Bpe.adjacentPairCounts(docs, "text")
      .orderBy(org.apache.spark.sql.functions.col("cnt").desc,
        org.apache.spark.sql.functions.col("w1"),
        org.apache.spark.sql.functions.col("w2"))
      .head()
    assert((top.getString(0), top.getString(1), top.getLong(2)) == ("t", "h", 3L))
    val merged = Bpe.applyMerge(docs, "text", "t", "h", "th")
    val again = Bpe.adjacentPairCounts(merged, "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(again == Map(("th", "e") -> 2L, ("th", "i") -> 1L, ("i", "s") -> 1L,
      ("o", "th") -> 1L, ("e", "r") -> 1L))
  }
}
