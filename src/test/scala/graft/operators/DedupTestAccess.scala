package graft.operators

import org.apache.spark.sql.Column

/** Test bridge: exposes the private[operators] HOF reference
  * implementations to specs outside this package (VectorExprsSpec
  * asserts the native kernels bit-identical to them). */
object DedupTestAccess {
  def cosineHof(a: Column, b: Column): Column = Dedup.cosineHof(a, b)
  def signBucketHof(vec: Column, planes: Seq[Seq[Double]]): Column =
    Dedup.signBucketHof(vec, planes)
  def hammingHof(a: Column, b: Column): Column = Dedup.hammingHof(a, b)
  def simhashBlocksHof(bits: Column): Column = Dedup.simhashBlocksHof(bits)
  def lshBucketsHof(sig: Column, bands: Int, rowsPerBand: Int): Column =
    Dedup.lshBucketsHof(sig, bands, rowsPerBand)
}
