package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {

  /** BigInt reference: h = Σ h·B + c mod 2⁶¹−1, no overflow possible. */
  private def refHash(s: String): Long = {
    val p = BigInt(TextAnalysis.RollMod)
    s.foldLeft(BigInt(0))((h, c) => (h * TextAnalysis.RollBase + c.toInt) mod p).toLong
  }

  test("rollingHash matches the BigInt reference (large-h wrap regression)") {
    val cases = Seq(
      "", "a", "hello world",
      "x" * 200,                       // drives h into the high 61-bit range
      (0 until 500).map(i => ('a' + i % 26).toChar).mkString,
      "ÿā mixed unicode 中文")
    cases.foreach { s =>
      assert(TextAnalysis.rollingHash(s) == refHash(s), s"mismatch for ${s.take(20)}...")
    }
    // deterministic + in-range
    val h = TextAnalysis.rollingHash("z" * 1000)
    assert(h == TextAnalysis.rollingHash("z" * 1000))
    assert(h >= 0 && h < TextAnalysis.RollMod)
  }

  test("kgramMinHash: min over substring hashes, stable under k >= length") {
    val s = "abcdefghij"
    val expected = (0 to s.length - 4).map(i => refHash(s.substring(i, i + 4))).min
    assert(TextAnalysis.kgramMinHash(s, 4) == expected)
    assert(TextAnalysis.kgramMinHash("ab", 8) == refHash("ab"))
  }
}
