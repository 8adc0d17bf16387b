package graft.operators

import scala.collection.JavaConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.functions.GraftFunctions.int_dot

/** Maximal-marginal-relevance diverse retrieval (Carbonell & Goldstein,
  * SIGIR 1998) — the standard RAG re-ranker: from a relevance-ranked
  * candidate list, greedily pick items maximizing
  * `relevance − max-similarity-to-already-picked`, so the final k are
  * relevant AND mutually diverse. The selection-side complement of
  * [[RankFusion]] (which merges lists) and [[Coreset]] (which ignores
  * relevance entirely).
  *
  * All arithmetic is integer-exact on the shared [[SemDedup
  * .quantizedArr]] floor quantization: relevance and pairwise penalty
  * are quantized DOT PRODUCTS (longs; |dot| ≤ D·10¹² fits easily), so
  * picked ids, penalties and MMR scores hash-match a SQL re-derivation
  * bit for bit. λ is fixed at 1/2 scale-free form (mmr = rel − pen).
  *
  * Scale shape: the candidate fetch is ONE distributed kernel
  * projection + TakeOrdered(kCand) over the corpus (rel = codegen'd
  * int_dot against the broadcast query literal — no join, no shuffle);
  * the greedy itself runs on the kCand-row driver prefix (bounded by
  * contract — the q229/q272/q294 driver-scalar class; MMR is
  * sequential by definition, each pick depends on all previous). At
  * 100 TB the corpus cost is one scan; kCand is the knob. */
object Mmr {

  /** Greedy MMR selection: query = `queryId`'s vector; candidates =
    * top `kCand` by (quantized dot DESC, vec_id), query excluded;
    * `kSel` rounds. Output (round, vec_id, rel, pen, mmr) where pen =
    * max dot to previously selected (0 in round 1); ties break to the
    * smaller vec_id. */
  def diverseTopK(emb: DataFrame, queryId: Long, kCand: Int,
                  kSel: Int): DataFrame = {
    require(kCand >= kSel && kSel >= 1 && kCand <= 256,
      s"need 1 <= kSel <= kCand <= 256: $kSel, $kCand")
    val spark = emb.sparkSession
    val qv = SemDedup.quantizedArr(emb)
    val qRows = qv.filter(col("vec_id") === queryId).limit(1).collect()
    require(qRows.nonEmpty, s"query vector $queryId not found")
    val qa = qRows(0).getSeq[Long](qRows(0).fieldIndex("qa"))

    val cands = qv.filter(col("vec_id") =!= queryId)
      .withColumn("rel", int_dot(col("qa"), typedlit(qa)))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(kCand) // TakeOrdered; driver rows bounded by kCand
      .collect()
      .map(r => (r.getLong(r.fieldIndex("vec_id")),
        r.getSeq[Long](r.fieldIndex("qa")).toArray,
        r.getLong(r.fieldIndex("rel"))))
    require(cands.length >= kSel,
      s"MMR: only ${cands.length} candidates for kSel=$kSel " +
        "(corpus smaller than the selection budget)")

    def dot(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    var selected = List.empty[(Long, Array[Long])]
    val out = (1 to kSel).map { r =>
      val best = cands.iterator
        .filter { case (id, _, _) => !selected.exists(_._1 == id) }
        .map { case (id, v, rel) =>
          val pen = if (selected.isEmpty) 0L
                    else selected.iterator.map(s => dot(v, s._2)).max
          (id, v, rel, pen, rel - pen)
        }
        .minBy { case (id, _, _, _, mmr) => (-mmr, id) }
      selected ::= ((best._1, best._2))
      Row(r.toLong, best._1, best._3, best._4, best._5)
    }
    val schema = StructType(Seq(
      StructField("round", LongType, nullable = false),
      StructField("vec_id", LongType, nullable = false),
      StructField("rel", LongType, nullable = false),
      StructField("pen", LongType, nullable = false),
      StructField("mmr", LongType, nullable = false)))
    spark.createDataFrame(out.asJava, schema)
  }
}
