package graft.operators

import java.nio.ByteBuffer
import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bounded top-k-per-group aggregate — the scale answer to "top 3
  * orders per customer". The Spark idiom (row_number window + rnk ≤ k
  * filter) shuffles and SORTS every row of every group to keep k of
  * them; this TypedImperativeAggregate keeps a k-bounded buffer
  * per group with map-side partial aggregation, so the exchange
  * carries at most k (value, id) pairs per group per map partition and
  * nothing is ever globally sorted. On a 100 TB fact table with
  * million-row groups the window formulation moves everything; this
  * moves ~k rows per group — q117's oracle IS the window formulation,
  * so the two must agree exactly.
  *
  * Ordering is (value DESC, id ASC) — the id tiebreak makes the result
  * deterministic under any partitioning and merge order. The buffer is
  * an unsorted ArrayBuffer compacted to k whenever it reaches 4k:
  * updates are amortized O(1) appends, compaction is O(buf log buf),
  * and serialize/eval always emit the compacted, fully-ordered prefix.
  */
case class TopKAgg(
    valueExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Long, Long)]] {

  require(k > 0, "k must be positive")

  private def better(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def compact(buf: mutable.ArrayBuffer[(Long, Long)]): Unit =
    if (buf.length > k) {
      val top = buf.sortWith(better).take(k)
      buf.clear()
      buf ++= top
    }

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Long, Long)] =
    mutable.ArrayBuffer.empty

  override def update(buf: mutable.ArrayBuffer[(Long, Long)],
                      input: InternalRow): mutable.ArrayBuffer[(Long, Long)] = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    if (v != null && id != null) {
      buf += ((v.asInstanceOf[Long], id.asInstanceOf[Long]))
      if (buf.length >= 4 * k) compact(buf)
    }
    buf
  }

  override def merge(buf: mutable.ArrayBuffer[(Long, Long)],
                     other: mutable.ArrayBuffer[(Long, Long)]): mutable.ArrayBuffer[(Long, Long)] = {
    buf ++= other
    compact(buf)
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[(Long, Long)]): Any = {
    compact(buf)
    val ordered = buf.sortWith(better)
    new GenericArrayData(ordered.map(e => InternalRow(e._1, e._2)).toArray)
  }

  override def serialize(buf: mutable.ArrayBuffer[(Long, Long)]): Array[Byte] = {
    compact(buf)
    val bb = ByteBuffer.allocate(4 + buf.length * 16)
    bb.putInt(buf.length)
    buf.foreach { e => bb.putLong(e._1); bb.putLong(e._2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.ArrayBuffer.empty[(Long, Long)]
    (0 until n).foreach(_ => buf += ((bb.getLong, bb.getLong)))
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("v", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(valueExpr, idExpr)
  override def prettyName: String = "topk_pairs"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(valueExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKAgg {

  // once-per-(session, k) registration guard — same pattern and reason
  // as MisraGriesAgg (registry churn WARN-spams the driver's tail)
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.util.Set[Integer]]())

  private def ensureRegistered(spark: SparkSession, k: Int): Unit = {
    val perSession = registered.synchronized {
      registered.computeIfAbsent(spark,
        _ => java.util.concurrent.ConcurrentHashMap.newKeySet[Integer]())
    }
    perSession.synchronized {
      if (!perSession.contains(k)) {
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          s"graft_topk_$k",
          exprs => TopKAgg(exprs(0), exprs(1), k).toAggregateExpression(),
          "scala_udf")
        perSession.add(k)
      }
    }
  }

  /** The raw bounded top-k aggregate as a Column (registers the
    * session function on first use): array&lt;struct&lt;v,id&gt;&gt; of the top
    * `k` (value DESC, id ASC) pairs per group. The k-bounded buffer is
    * what makes it the SKEW-SAFE capped neighbor collector for the
    * graph operators: a hub key's state never exceeds k entries on any
    * map partition or in the final merge, where collect_list would
    * materialize the full neighborhood in one task (guide §2.5). */
  def topKExpr(spark: SparkSession, k: Int, value: Column,
               id: Column): Column = {
    ensureRegistered(spark, k)
    call_function(s"graft_topk_$k", value, id)
  }

  /** Top `k` rows per `groupCol` by (`valueCol` DESC, `idCol` ASC):
    * output (groupCol, rnk 1-based, idCol, valueCol). Both value and id
    * must be long-castable. */
  def topKPerGroup(df: DataFrame, groupCol: String, valueCol: String,
                   idCol: String, k: Int): DataFrame = {
    ensureRegistered(df.sparkSession, k)
    df.groupBy(col(groupCol))
      .agg(call_function(s"graft_topk_$k",
        col(valueCol).cast("long"), col(idCol).cast("long")).as("_tk"))
      .select(col(groupCol), posexplode(col("_tk")).as(Seq("_pos", "_e")))
      .select(col(groupCol), (col("_pos") + 1).cast("long").as("rnk"),
        col("_e.id").as(idCol), col("_e.v").as(valueCol))
  }
}
