package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog register computation — the industry-standard mergeable
  * distinct sketch (Flajolet et al. 2007, and the HLL surveyed in
  * Heule/Nunkesser/Hall "HyperLogLog in Practice", VLDB 2013), built so
  * the REGISTERS are cross-engine reproducible: the hash is
  * [[Kmv.hash32]]'s two-round masked-xorshift chain and the leading-run
  * rank is integer bit-length arithmetic (`length(bin(w))`, the q187
  * device) — no float log2, so a DuckDB oracle rebuilds the identical
  * register vector in SQL.
  *
  * Layout for 2^p registers: idx = low p bits of the 32-bit hash,
  * w = the remaining 32−p bits, rank = (32−p)+1 − bitlen(w) (w = 0 →
  * (32−p)+1) — the 1-based position of w's highest set bit counted from
  * the MSB side. A register holds the MAX rank seen: idempotent, so no
  * upstream distinct is needed, and two sketches merge by elementwise
  * max — associative, commutative, order-independent.
  *
  * The float estimate (alpha_m·m²/Σ2^−reg + small/large-range
  * corrections) is left OUT of the relational output per the avg-class
  * ground rule; [[estimate]] is the JVM-side consumer used by specs.
  *
  * Scale design: [[registers]] is one groupBy (grp, idx) max — a
  * map-side-combined shuffle whose key space is |groups|·2^p regardless
  * of input size. [[HllAgg]] is the same sketch as one 2^p-byte
  * aggregation buffer (the streaming/state form).
  */
object Hll {

  /** Register index and rank columns for a LONG key column. */
  def idxCol(key: Column, p: Int): Column =
    Kmv.hash32(key, 2654435769L).bitwiseAND(lit((1L << p) - 1L))

  def rankCol(key: Column, p: Int): Column = {
    val v = shiftright(Kmv.hash32(key, 2654435769L), p)
    when(v === 0L, lit(32 - p + 1).cast("long"))
      .otherwise(lit(32 - p + 1).cast("long") - length(bin(v)).cast("long"))
  }

  /** JVM twin of idx/rank (HllSpec asserts ≡ the Column forms). */
  def idxRankJvm(key: Long, p: Int): (Int, Int) = {
    val h = Kmv.hash32Jvm(key)
    val idx = (h & ((1L << p) - 1L)).toInt
    val w = h >>> p
    val bitlen = if (w == 0L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(w)
    (idx, 32 - p + 1 - bitlen)
  }

  /** Plan-level register vector as ROWS: (grp, idx, reg) with reg =
    * max rank per register; registers never touched are absent (reg 0).
    * Bit-identical to [[HllAgg]]'s buffer (HllSpec). */
  def registers(df: DataFrame, grpCol: String, keyCol: String, p: Int): DataFrame = {
    require(p >= 4 && p <= 16, "p: 4..16")
    val keyed = df.select(col(grpCol).as("grp"), col(keyCol).cast("long").as("_k"))
      .filter(col("_k").isNotNull)
    keyed
      .select(col("grp"), idxCol(col("_k"), p).as("idx"),
        rankCol(col("_k"), p).as("rank"))
      .groupBy("grp", "idx")
      .agg(max("rank").as("reg"))
  }

  /** Standard HLL estimate from a full register vector (length 2^p),
    * with the small-range (linear counting) and 32-bit large-range
    * corrections. Spec-side consumer only. */
  def estimate(regs: Array[Long]): Double = {
    val m = regs.length.toDouble
    val alpha = regs.length match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1 + 1.079 / m)
    }
    val raw = alpha * m * m / regs.map(r => math.pow(2.0, -r.toDouble)).sum
    val zeros = regs.count(_ == 0L)
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m / zeros)
    else if (raw > (1L << 32).toDouble / 30.0)
      -(1L << 32).toDouble * math.log1p(-raw / (1L << 32).toDouble)
    else raw
  }
}
