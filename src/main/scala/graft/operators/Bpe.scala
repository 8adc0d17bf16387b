package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The counting core of byte-pair-encoding tokenizer training (Sennrich
  * et al., "Neural Machine Translation of Rare Words with Subword
  * Units", ACL 2016), lifted to word level over a document corpus: one
  * BPE round = count adjacent symbol pairs, pick the most frequent,
  * merge its occurrences, repeat. At 100 TB the count is the expensive
  * half — a full-corpus scan per round — and it is embarrassingly
  * parallel: explode each doc's adjacent pairs, map-side-combine, one
  * shuffle keyed by pair (q118's oracle recounts via positional
  * unnest + self-indexing, a different enumeration of the same pairs).
  *
  * The merge half ([[applyMerge]]) is row-local but inherently
  * sequential WITHIN a document (left-greedy, consumed tokens can't
  * start a new match: merging (a,a) in "a a a" yields [aa, a], not
  * [aa, aa]), so it's a per-row function rather than a relational
  * expression — fine at scale (no shuffle at all), spec'd against a
  * driver-side reference including the overlap cases.
  */
object Bpe {

  /** Adjacent-pair counts over space-tokenized `textCol`: (w1, w2,
    * cnt). Tokens are bound to an attribute before the transform runs —
    * the interpreted-HOF ground rule (see Dedup.minhashSigOf). */
  def adjacentPairCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(split(col(textCol), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(w)-1), i -> struct(w[i-1] AS w1, w[i] AS w2))"))
        .as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))

  /** Full BPE training loop: `rounds` iterations of (count pairs →
    * argmax → left-greedy merge), producing the learned merge table —
    * the actual tokenizer-training workload (q118 counts one round's
    * pairs, q231 applies ONE merge; this iterates).
    *
    * Output: (round, w1, w2, cnt) for round = 1..rounds — the pair
    * chosen that round (ties: cnt DESC, then (w1, w2) ASC, which ≡ the
    * oracle's space-joined string order because tokens contain no
    * spaces and ' ' sorts below every token character — the q231
    * note) — plus a final row (rounds+1, '__total__', '__total__',
    * non-empty token count of the fully merged corpus).
    *
    * Scale shape: per round, ONE map-side-combined pair count (the
    * shuffle carries distinct pairs, not tokens) and a 1-row
    * TakeOrdered(1) argmax collect (bounded by contract — the
    * Coreset/PrefixSum driver-scalar class). Round r scans the RAW
    * corpus and re-applies merges 1..r−1 in one [[applyMerges]] UDF
    * pass (row-local, no shuffle, one split per row) — re-merge CPU is
    * deliberately traded for the full-corpus checkpoint WRITE per
    * round the previous shape paid (see trainLoop). At 100 TB the cost
    * is `rounds` corpus scans — the known price of exact BPE; the
    * merged token names compose with '_' so round k's pairs are
    * well-defined strings. */
  def trainMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    val (merges, cur) = trainLoop(docs, textCol, rounds)
    import spark.implicits._
    val mergeRows = merges.zipWithIndex
      .map { case ((w1, w2, cnt), i) => (i + 1L, w1, w2, cnt) }
      .toDF("round", "w1", "w2", "cnt")
    val total = cur
      .select(explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .agg(count(lit(1)).as("cnt"))
      .select(lit(rounds + 1L).as("round"), lit("__total__").as("w1"),
        lit("__total__").as("w2"), col("cnt"))
    mergeRows.unionByName(total)
  }

  /** The merge table alone, driver-side: (w1, w2, cnt) in training
    * order — the artifact [[applyMerges]] consumes at ENCODE time
    * (tokenizer inference over a held-out corpus, q312). Driver cost is
    * `rounds` 1-row argmax collects, bounded by contract. */
  def learnMerges(docs: DataFrame, textCol: String,
                  rounds: Int): Seq[(String, String, Long)] =
    trainLoop(docs, textCol, rounds)._1

  /** Rebase cadence of [[trainLoop]]: every `RebaseEvery` merges the
    * rewritten corpus is checkpointed and becomes the new base, so a
    * round re-applies at most `RebaseEvery` tail merges. Bounds BOTH
    * cost terms (r13 optimization round, closing the r12 trade's
    * quadratic tail): per-round re-merge CPU ≤ RebaseEvery merges ×
    * corpus (the r12 all-tail shape was O(rounds²) — fine at ≤ 10
    * rounds, unbounded at a real vocab's thousands), and checkpoint
    * WRITES = rounds/RebaseEvery corpus materializations (the pre-r12
    * shape paid one per round). Declared queries train ≤ 5 rounds, so
    * their plans and results are byte-identical to r12; BpeSpec pins a
    * > RebaseEvery training run against the per-round-fold reference.
    */
  private val RebaseEvery = 8

  private def trainLoop(docs: DataFrame, textCol: String,
                        rounds: Int): (Seq[(String, String, Long)], DataFrame) = {
    require(rounds >= 1 && rounds <= 30, s"rounds must be in [1, 30]: $rounds")
    // Round r's corpus = the latest checkpointed base with the
    // since-rebase tail of merges applied in ONE [[applyMerges]] UDF
    // pass (one split + one traversal per row, however many merges).
    // BpeSpec asserts applyMerges ≡ the fold of single applyMerge
    // passes, so the training sequence is unchanged.
    //
    // Scale-adaptive widen BEFORE the checkpoint (the q303/keyDiscovery
    // protocol, guide §2.5 input starvation; r13 optimization round):
    // the checkpointed base inherits the SCAN's split count, and a
    // local ~20 MB corpus = 1–2 splits would serialize EVERY round's
    // pair-explode + re-merge stage on 1–2 cores. Probing docs.rdd is
    // safe here per the widen precondition: the caller passes a plain
    // table projection (scan-only subtree, no upstream exchange to
    // double-execute). No-op on a real cluster (scan splits ≥ cores);
    // results unchanged (pair counts and the (cnt DESC, w1, w2) argmax
    // are partitioning-independent).
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val wide = if (docs.rdd.getNumPartitions < par) docs.repartition(par)
               else docs
    var base = wide.localCheckpoint()
    var baked = 0 // merges already rewritten into `base`
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    def tail: Seq[(String, String, String)] =
      merges.toSeq.drop(baked).map { case (w1, w2, _) => (w1, w2, w1 + "_" + w2) }
    def cur: DataFrame =
      if (merges.size == baked) base
      else applyMerges(base, textCol, tail)
    for (r <- 1 to rounds) {
      val rows = adjacentPairCounts(cur, textCol)
        .filter(col("w1") =!= "" && col("w2") =!= "")
        .orderBy(col("cnt").desc, col("w1"), col("w2")).limit(1)
        .collect()
      require(rows.nonEmpty,
        s"BPE training: no countable adjacent pairs left at round $r " +
          "(corpus too small or merges exhausted before `rounds`)")
      val top = rows.head
      merges += ((top.getString(0), top.getString(1), top.getLong(2)))
      if (merges.size - baked >= RebaseEvery && r < rounds) {
        base = applyMerges(base, textCol, tail).localCheckpoint()
        baked = merges.size
      }
    }
    (merges.toSeq, cur)
  }

  /** BPE ENCODE: apply a learned merge list (w1, w2, joined) to a
    * corpus IN TRAINING ORDER — one UDF pass per row applying every
    * merge sequentially (merge k can consume tokens merge k−1 created,
    * so the order is part of the semantics; asserted ≡ a fold of
    * [[applyMerge]] in BpeSpec). Row-local, zero shuffles — at 100 TB
    * encoding is a single map over the corpus however long the merge
    * table is. */
  def applyMerges(docs: DataFrame, textCol: String,
                  merges: Seq[(String, String, String)]): DataFrame = {
    val ms = merges.toIndexedSeq
    val encodeUdf = udf { (text: String) =>
      var ts: Array[String] = text.split(" ", -1)
      ms.foreach { case (w1, w2, joined) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < ts.length) {
          if (i + 1 < ts.length && ts(i) == w1 && ts(i + 1) == w2) {
            out += joined; i += 2
          } else { out += ts(i); i += 1 }
        }
        ts = out.toArray
      }
      ts.mkString(" ")
    }
    docs.withColumn(textCol, encodeUdf(col(textCol)))
  }

  /** Left-greedy merge of adjacent (w1, w2) occurrences into `joined`
    * within each doc's token stream — one BPE merge application.
    * Returns `docs` with `textCol` rewritten. */
  def applyMerge(docs: DataFrame, textCol: String,
                 w1: String, w2: String, joined: String): DataFrame = {
    val mergeUdf = udf { (text: String) =>
      val ts = text.split(" ", -1)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < ts.length) {
        if (i + 1 < ts.length && ts(i) == w1 && ts(i + 1) == w2) {
          out += joined; i += 2
        } else { out += ts(i); i += 1 }
      }
      out.mkString(" ")
    }
    docs.withColumn(textCol, mergeUdf(col(textCol)))
  }
}
