package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native codegen'd vector kernels for the similarity/ANN family.
  *
  * The composed form — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` etc. —
  * is correct but interpreted: Spark's higher-order functions don't
  * implement doGenCode, so every candidate pair in a top-k join falls out
  * of whole-stage codegen and allocates the zipped intermediate array.
  * These expressions keep the candidate loop inside generated code and
  * compute dot + both norms in ONE pass with no allocation.
  *
  * Bit-compatibility contract (asserted in VectorExprsSpec): each
  * accumulator sums in element order, exactly like the left fold of the
  * HOF form, so results are bit-identical to the composed expressions AND
  * to the DuckDB oracle mirrors (list_sum over list_transform preserves
  * the same order).
  *
  * Null semantics mirror the folds:
  *  - null array input → null (nullSafeEval);
  *  - any null element (or a length mismatch, which zip_with pads with
  *    nulls) poisons the fold → cosine returns null;
  *  - in sign_bucket a null per-plane dot (from a null ELEMENT) makes
  *    `when(d > 0, bit)` fall to otherwise(0) → that plane contributes
  *    bit 0, result non-null; a wholly NULL vector returns null (a
  *    deliberate, documented divergence — see SignBucketExpr).
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r = graft.functions.CosineSimExpr.compute($a, $b);
         |${ev.isNull} = (${ev.value}_r == null);
         |${ev.value} = ${ev.isNull} ? -1.0 : ${ev.value}_r.doubleValue();
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimExpr {
  /** Static entry point for generated code. Boxed return: null signals
    * the poisoned-fold cases (length mismatch / null element). */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }
}

/** Hamming distance between two int bit-arrays — native form of
  * `size(filter(zip_with(a, b, _ =!= _), identity))`. Mirrored null
  * semantics: zip_with pads a length mismatch with nulls and the filter
  * drops the resulting null predicates, so positions beyond the common
  * prefix (or with a null element) contribute 0 — never a null result. */
case class HammingDistExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  // nullable: a NULL array input must yield NULL (like size(null) in the
  // HOF form) — declaring false would both skip codegen's child null
  // guards (NPE) and let the optimizer fold IsNull to false.
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "hamming_dist"

  override def nullSafeEval(a: Any, b: Any): Any =
    HammingDistExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HammingDistExpr.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HammingDistExpr {
  def compute(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var d = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getInt(i) != b.getInt(i)) d += 1
      i += 1
    }
    d
  }
}

/** The 4 16-bit SimHash block keys as array<long> — native form of the
  * transform/slice/zip_with composition in Dedup.simhashBlocks. Mirrored
  * null semantics: a block whose 16 positions aren't all present and
  * non-null folds to a null entry (acc + null), exactly like the HOF. */
case class SimhashBlocksExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_blocks"

  override def nullSafeEval(bits: Any): Any =
    SimhashBlocksExpr.compute(bits.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimhashBlocksExpr.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashBlocksExpr {
  def compute(bits: ArrayData): ArrayData = {
    val out = new Array[Any](4)
    var b = 0
    while (b < 4) {
      var key = 0L
      var ok = true
      var pos = 0
      while (pos < 16 && ok) {
        val idx = b * 16 + pos
        if (idx >= bits.numElements() || bits.isNullAt(idx)) ok = false
        else key += bits.getInt(idx).toLong << pos
        pos += 1
      }
      out(b) = if (ok) java.lang.Long.valueOf(key) else null
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** MinHash LSH band keys: array of (band, bucket) structs where bucket
  * = xxhash64(comma-joined band slice of the signature) — the native
  * form of the transform/slice/concat_ws/xxhash64 composition in
  * Dedup.lshBuckets, evaluated once per corpus row. Exact mirror of the
  * HOF: the slice clamps at the signature end, null slots are skipped
  * by the comma join (concat_ws semantics), and the hash is XXH64 with
  * the SQL builtin's seed 42 over the UTF-8 bytes — so bucket values
  * are bit-identical to the composed form (VectorExprsSpec). */
case class LshBandsExpr(child: Expression, bands: Int, rowsPerBand: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("band",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("bucket", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "lsh_bands"

  override def nullSafeEval(sig: Any): Any =
    LshBandsExpr.compute(sig.asInstanceOf[ArrayData], bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LshBandsExpr.compute($c, $bands, $rowsPerBand);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBandsExpr {
  def compute(sig: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      val sb = new java.lang.StringBuilder
      var i = b * rowsPerBand
      val end = math.min(sig.numElements(), b * rowsPerBand + rowsPerBand)
      var first = true
      while (i < end) {
        if (!sig.isNullAt(i)) {
          if (!first) sb.append(',')
          sb.append(sig.getLong(i))
          first = false
        }
        i += 1
      }
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      out(b) = org.apache.spark.sql.catalyst.InternalRow(b, h)
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Count of tokens contained in a (small, literal) stopword set — the
  * native form of `size(filter(tokens, array_contains(set, _)))`, which
  * is an interpreted per-row filter; language ID evaluates it once per
  * language over every document. Null semantics mirror the HOF: a null
  * token never matches (contributes 0); the result is never null for
  * non-null inputs. Linear probe over the set (≤ tens of entries —
  * same cost model as array_contains). */
case class StopwordHitsExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "stopword_hits"

  override def nullSafeEval(tokens: Any, set: Any): Any =
    StopwordHitsExpr.compute(
      tokens.asInstanceOf[ArrayData], set.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s) =>
      s"${ev.value} = graft.functions.StopwordHitsExpr.compute($t, $s);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object StopwordHitsExpr {
  def compute(tokens: ArrayData, set: ArrayData): Int = {
    val nTok = tokens.numElements()
    val nSet = set.numElements()
    var hits = 0
    var i = 0
    while (i < nTok) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        var j = 0
        var found = false
        while (j < nSet && !found) {
          if (!set.isNullAt(j) && set.getUTF8String(j).equals(t)) found = true
          j += 1
        }
        if (found) hits += 1
      }
      i += 1
    }
    hits
  }
}

/** Sign-LSH bucket key: bit i set iff vec · planes(i) > 0 — the native
  * form of the transform/when/shiftleft composition in Dedup.signBucket.
  * `right` is the plane matrix literal (array of array of double).
  *
  * DELIBERATE divergence from the HOF form on a NULL vector: the HOF
  * folds every null dot to bit 0 and returns bucket 0L, which at corpus
  * scale piles every null-embedding row into a REAL bucket (they then
  * join as candidates of every bucket-0 query). The native expression
  * returns NULL instead — null vectors drop out of bucket equi-joins,
  * which is the semantics a dedup/ANN pipeline actually wants. Asserted
  * in VectorExprsSpec; non-null inputs remain bit-identical. */
case class SignBucketExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sign_bucket"

  override def nullSafeEval(vec: Any, planes: Any): Any =
    SignBucketExpr.compute(
      vec.asInstanceOf[ArrayData], planes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, p) =>
      s"${ev.value} = graft.functions.SignBucketExpr.compute($v, $p);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SignBucketExpr {
  /** Static entry point for generated code. A null vector element makes
    * every dot null → every bit 0 via the when/otherwise mirror, never a
    * null bucket. */
  def compute(vec: ArrayData, planes: ArrayData): Long = {
    val bits = planes.numElements()
    var bucket = 0L
    var b = 0
    while (b < bits) {
      val plane = planes.getArray(b)
      val n = math.min(vec.numElements(), plane.numElements())
      var d = 0.0
      var nullDot = plane.numElements() != vec.numElements()
      var i = 0
      while (i < n && !nullDot) {
        if (vec.isNullAt(i)) nullDot = true
        else d += vec.getDouble(i) * plane.getDouble(i)
        i += 1
      }
      if (!nullDot && d > 0) bucket += (1L << b)
      b += 1
    }
    bucket
  }
}

/** Count of positions where two MinHash signatures agree — the
  * unbiased Jaccard estimator's numerator (m matching rows of L total;
  * est = m/L). Native one-pass form of
  * `aggregate(zip_with(a, b, (x,y) => if(x=y,1,0)), 0, _+_)` over
  * array&lt;long&gt; signatures (the HOF form is interpreted AND — per
  * the repo's captured-expression rule — re-evaluates a nested
  * zip_with per element when projection collapse inlines it).
  * Compared over the common prefix; a null element contributes no
  * agreement (mirroring the fold, where null = null is null → 0). */
case class SigAgreeExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "sig_agree"

  override def nullSafeEval(a: Any, b: Any): Any =
    SigAgreeExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SigAgreeExpr.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SigAgreeExpr {
  def compute(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var m = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) m += 1
      i += 1
    }
    m
  }
}

/** Integer dot product of two quantized array&lt;long&gt; vectors — the
  * row-per-pair form of the SemDeDup family's exploded
  * `join on d → sum(a.q * b.q)` (one row per pair instead of one per
  * pair·dimension — the 64× shuffle cut). Bit-identity contract with
  * the exploded aggregate (asserted in VectorExprsSpec/SemDedupSpec):
  * positions pair by index over the common prefix (posexplode d =
  * array index); a position where EITHER side is null contributes
  * nothing (the null product is skipped by SQL sum); if NO position
  * contributes the result is NULL (sum over an empty set), not 0 —
  * integer addition is exactly commutative, so any shuffle order of
  * the exploded sum equals this left-to-right loop. Long arithmetic is
  * overflow-safe by the caller's quantization contract (|q| ≤ ~2^21,
  * D ≤ 2^10 → |dot| ≤ 2^53). */
case class IntDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "int_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    IntDotExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Long ${ev.value}_r = graft.functions.IntDotExpr.compute($a, $b);
         |${ev.isNull} = (${ev.value}_r == null);
         |${ev.value} = ${ev.isNull} ? -1L : ${ev.value}_r.longValue();
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IntDotExpr {
  /** Boxed return: null = no contributing position (empty-set sum). */
  def compute(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var any = false
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        s += a.getLong(i) * b.getLong(i)
        any = true
      }
      i += 1
    }
    if (any) java.lang.Long.valueOf(s) else null
  }
}

/** Integer squared-L2 distance of two quantized array&lt;long&gt;
  * vectors — the row-per-pair form of the exploded
  * `join on d → sum((a.q − b.q)²)`. Same pairing, null-skip,
  * empty-set-NULL, and overflow contract as [[IntDotExpr]]. */
case class IntSqdistExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "int_sqdist"

  override def nullSafeEval(a: Any, b: Any): Any =
    IntSqdistExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Long ${ev.value}_r = graft.functions.IntSqdistExpr.compute($a, $b);
         |${ev.isNull} = (${ev.value}_r == null);
         |${ev.value} = ${ev.isNull} ? -1L : ${ev.value}_r.longValue();
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IntSqdistExpr {
  /** Boxed return: null = no contributing position (empty-set sum). */
  def compute(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var any = false
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val d = a.getLong(i) - b.getLong(i)
        s += d * d
        any = true
      }
      i += 1
    }
    if (any) java.lang.Long.valueOf(s) else null
  }
}
