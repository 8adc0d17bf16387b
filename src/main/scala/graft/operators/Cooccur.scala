package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Term co-occurrence / frequent-pair mining (the 2-itemset core of
  * market-basket analysis, reference: none — net-new pipeline operator):
  * which pairs of vocabulary terms appear together in at least
  * `minSupport` documents.
  *
  * Scale design — the all-pairs blow-up is bounded BEFORE the join:
  *  1. item domain is capped to the top-`vocabSize` terms by document
  *    frequency (ties broken by term), computed with one word-count
  *    aggregation (map-side partial combine absorbs the token
  *    explosion);
  *  2. postings are distinct (doc, term) pairs semi-joined against the
  *    broadcast vocabulary — per doc at most `vocabSize` items survive;
  *  3. the pair generator is a self equi-join on doc with the
  *    `a < b` residual, so candidate cost is Σ_d n_d² with
  *    n_d ≤ vocabSize — never corpus², and the doc-keyed shuffle
  *    co-partitions both sides.
  * Support counts are exact integers (no sketch, no float), so the
  * result is bit-identical cross-engine and oracle-gated (q96).
  */
object Cooccur {

  /** Distinct (doc, term) postings for terms in the top-`vocabSize`
    * document-frequency vocabulary. */
  private def vocabPostings(docs: DataFrame, idCol: String, textCol: String,
                            vocabSize: Int): DataFrame = {
    val postings = docs
      .select(col(idCol).as("doc"), explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
      .distinct()
    val vocab = postings.groupBy("term")
      .agg(count(lit(1)).as("df_docs"))
      .orderBy(col("df_docs").desc, col("term"))
      .limit(vocabSize)
      .select("term")
    postings.join(broadcast(vocab), "term").select("doc", "term")
  }

  /** Unordered co-occurring pair counts over distinct (doc, term)
    * postings: (a, b, support) with a < b. Pairs explode ROW-LOCALLY
    * from per-doc sorted term lists built in ONE doc-keyed collect_set
    * aggregation (r13 optimization round, guide §2.4 — the
    * witnessFrames adjacency trick): the old self equi-join exchanged
    * the posting list twice and ran a join stage for the same pair
    * multiset. The agg buffer is bounded by the per-doc posting count —
    * ≤ vocabSize after [[vocabPostings]] capping, the same bound that
    * sized the old join's per-key fan-in; collect_set also absorbs any
    * remaining duplicate postings exactly like the join's distinct
    * input did. sort_array + position-slice emits each pair once with
    * the strict a < b semantics; the slice captures only agg-barrier
    * outputs (captured-array HOF rule, GlobalPlanAuditSpec-walked). */
  private def pairSupports(p: DataFrame): DataFrame =
    p.groupBy("doc").agg(sort_array(collect_set(col("term"))).as("ts"))
      .select(posexplode(col("ts")).as(Seq("i", "a")), col("ts"))
      .select(col("a"),
        explode(slice(col("ts"), col("i") + lit(2),
          size(col("ts")) - col("i") - lit(1))).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("support"))

  /** Pairs (a < b) of vocabulary terms co-occurring in ≥ `minSupport`
    * docs. Output: (a, b, support), ordered by support desc, a, b. */
  def frequentPairs(docs: DataFrame, idCol: String, textCol: String,
                    vocabSize: Int, minSupport: Long): DataFrame =
    pairSupports(vocabPostings(docs, idCol, textCol, vocabSize))
      .filter(col("support") >= minSupport)
      .orderBy(col("support").desc, col("a"), col("b"))

  /** Association rules over the same capped-vocabulary baskets: every
    * frequent pair (a < b) with the exact integer components of both
    * directed rules — pair support, item marginals, basket total.
    * confidence(a→b) = sup_ab/sup_a and lift = sup_ab·n/(sup_a·sup_b)
    * are determined exactly by the four BIGINTs; the ratios themselves
    * are left to the consumer (float ground rules), and thresholding
    * "confidence ≥ p/q" is integer cross-multiplication.
    *
    * Scale: same bounded pair generator as [[frequentPairs]]; the
    * marginal joins ship a vocabulary-sized broadcast and the basket
    * count a 1-row broadcast cross join (the intended J4 pattern). */
  def associationRules(docs: DataFrame, idCol: String, textCol: String,
                       vocabSize: Int, minSupport: Long): DataFrame = {
    // postings feed the marginal agg AND the pair generator — persist
    // per the AQE ReuseExchange rule (caller releases, CACHE_POLICY)
    val p = vocabPostings(docs, idCol, textCol, vocabSize).persist()
    val itemSup = p.groupBy("term").agg(count(lit(1)).as("sup"))
    val baskets = docs.select(col(idCol)).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    pairSupports(p)
      .withColumnRenamed("support", "sup_ab")
      .filter(col("sup_ab") >= minSupport)
      .join(broadcast(itemSup.select(col("term").as("a"), col("sup").as("sup_a"))), "a")
      .join(broadcast(itemSup.select(col("term").as("b"), col("sup").as("sup_b"))), "b")
      .crossJoin(broadcast(baskets))
      .select("a", "b", "sup_ab", "sup_a", "sup_b", "n_baskets")
  }

  /** Frequent ORDERED item triples over generic (basket, item) rows —
    * the size-3 step of the Apriori ladder above [[frequentPairs]]:
    * per basket, every i1 < i2 < i3 combination, counted across
    * baskets, thresholded at `minSupport`. Generation cost is
    * Σ C(|basket|, 3) — bounded by the basket-size contract exactly
    * like the pair generator (cap the item domain upstream, e.g. by
    * top-df vocabulary or category bucketing, so a degenerate basket
    * can't explode the combination count); both self-joins are
    * basket-key equi-joins with the ordering as residual, never a
    * cross product. */
  def frequentTriples(items: DataFrame, basketCol: String, itemCol: String,
                      minSupport: Long): DataFrame = {
    // Triples explode ROW-LOCALLY from per-basket sorted item lists
    // built in ONE basket-keyed collect_set aggregation (r13
    // optimization round, guide §2.4): the old double self-join
    // exchanged the posting list three times and ran two join stages
    // for the same triple multiset. collect_set absorbs the distinct;
    // the agg buffer is bounded by the basket-size contract exactly
    // like the old join fan-in. Chained position-slices emit each
    // i1 < i2 < i3 combination once: after picking positions i (0-based
    // in the sorted list) and j (0-based in the i-suffix), the third
    // element ranges over 1-based positions i+j+3.. of the list. The
    // generators capture only agg-barrier outputs (captured-array HOF
    // rule, GlobalPlanAuditSpec-walked).
    items.select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .groupBy("bk").agg(sort_array(collect_set(col("it"))).as("its"))
      .filter(size(col("its")) >= 3)
      .select(posexplode(col("its")).as(Seq("i", "i1")), col("its"))
      .select(col("i1"),
        posexplode(slice(col("its"), col("i") + lit(2),
          size(col("its")) - col("i") - lit(1))).as(Seq("j", "i2")),
        col("its"), col("i"))
      .select(col("i1"), col("i2"),
        explode(slice(col("its"), col("i") + col("j") + lit(3),
          size(col("its")) - col("i") - col("j") - lit(2))).as("i3"))
      .groupBy("i1", "i2", "i3").agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }
}
