package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Language-model corpus statistics and ranked text retrieval — the
  * query-side counterpart of the dedup/curation families: once a corpus
  * is cleaned, a training-data pipeline needs (a) its n-gram frequency
  * profile (smoothing tables, vocabulary growth curves) and (b) a way to
  * pull the documents most relevant to a probe query (mixture audits,
  * targeted decontamination beyond exact-overlap screens — the retrieval
  * analog of the reference's keyword search surface,
  * optimade_database/Optimade_Server/server.py:106-120, re-expressed as
  * corpus-side scoring instead of a remote filter string).
  *
  * Scale design:
  *  - n-gram construction is a single pass (one `transform` over the
  *    materialized token array — NO shuffle, no self-join on positions);
  *    the only wide exchange carries (ngram, partial-count) pairs which
  *    map-side partial aggregation has already collapsed, so the shuffle
  *    is bounded by the DISTINCT n-gram frame per partition, not the
  *    token stream. The count-of-counts re-aggregation is a second tiny
  *    shuffle over at most max-count keys.
  *  - ranked retrieval filters the exploded token stream to the probe
  *    terms BEFORE any aggregation (the inverted-index "posting fetch" —
  *    candidate rows are docs-containing-a-term, not the corpus), joins
  *    the per-term document frequencies by BROADCAST (|terms| rows), and
  *    the global (N, Σdl) statistics as a 1-row broadcast cross join
  *    (the J4 pattern; intended-cross-join audited). No windows, no
  *    sort: the final top-k plans as TakeOrderedAndProject.
  *
  * Float discipline (CLAUDE.md): the score uses ONLY +,-,*,/ over
  * doubles in an operation order the DuckDB oracle mirrors token-for-
  * token — a log-free rational idf, (N - df + 0.5)/(df + 0.5), replaces
  * ln of the same odds so the whole scoring chain stays bit-identical
  * across engines (ln is not correctly rounded and differs in the last
  * ulp between libm and the JVM). The tf saturation term is BM25's,
  * k1 = 1.2, b = 0.75. Cross-term summation is a FIXED-ORDER left fold
  * over per-term pivot columns — never sum() over rows, whose
  * accumulation order is nondeterministic in both engines.
  */
object Retrieval {

  /** Non-empty whitespace tokens, as a materialize-me array column. */
  def cleanTokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Adjacent-pair n-grams of a token ARRAY ATTRIBUTE (materialize the
    * token array to its own column first — a computed-array argument
    * would re-split per element under the interpreted HOF, the
    * Dedup.minhashSigOf lesson). Single pass, no shuffle. */
  def bigramsOf(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))

  /** Good–Turing frequency-of-frequencies over bigrams: r → N_r = how
    * many distinct bigrams occur exactly r times. The (tiny) output is
    * the smoothing table for LM estimation and a fingerprint of corpus
    * repetitiveness. Output: (r, n_r) ordered by r. */
  def bigramCountOfCounts(docs: DataFrame, textCol: String): DataFrame = {
    val toks = docs.select(cleanTokens(col(textCol)).as("toks"))
    val counts = toks
      .select(explode(bigramsOf(col("toks"))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c"))
    counts.groupBy(col("c").as("r")).agg(count(lit(1)).as("n_r")).orderBy("r")
  }

  /** Positional phrase search over an on-the-fly positional inverted
    * index: documents containing the EXACT word sequence `phrase`, with
    * per-document occurrence counts (overlapping occurrences counted —
    * position arithmetic, unlike substring-replace tricks, cannot
    * undercount them).
    *
    * Plan: posexplode gives (doc, pos, term); postings are filtered to
    * the phrase's terms BEFORE any shuffle (the inverted-index fetch —
    * for a k-word phrase over a V-word vocabulary only ~k/V of the
    * token stream survives the scan), then each later word joins the
    * anchor on the equi-pair (doc, pos+i) — co-partitioned hash joins
    * with no residual, candidate cost Σ posting(w_i), never positions².
    * Positions use raw `split(text, " ")` indices (NOT cleanTokens,
    * which drops empty tokens and would shift positions vs the oracle's
    * string_split).
    *
    * The q94 oracle re-derives the same counts in DuckDB from
    * string_split + generate_series indexing — independent tokenizer
    * and join machinery that must agree doc-for-doc, count-for-count. */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty && phrase.size <= 8, "phrase: 1..8 words")
    val toks = docs.select(col(idCol).as("doc"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "term")))
      .filter(col("term").isin(phrase.distinct: _*))
    val anchor = toks.filter(col("term") === phrase.head)
      .select(col("doc"), col("pos"))
    val matched = phrase.zipWithIndex.drop(1).foldLeft(anchor) {
      case (acc, (w, i)) =>
        val pi = toks.filter(col("term") === w)
          .select(col("doc").as("d2"), col("pos").as("p2"))
        acc.join(pi, acc("doc") === pi("d2") && pi("p2") === acc("pos") + i)
          .select(acc("doc"), acc("pos"))
    }
    matched.groupBy("doc").agg(count(lit(1)).as("n_hits"))
      .select(col("doc").as(idCol), col("n_hits"))
  }

  /** Collocation-strength table: every adjacent word pair occurring at
    * least `minPair` times, with the exact integer PMI components —
    * pair count, both unigram marginals, and the corpus token total.
    * The association score itself (log of the count ratio) is left to
    * the consumer per the float ground rules; the four integers
    * determine it exactly, and ranking by n_pair·n_total / (n_w1·n_w2)
    * is doable with integer cross-multiplication.
    *
    * Plan: one token explode feeds the unigram counts, one bigram
    * explode the pair counts; marginals join back via the (small, by
    * Heaps' law) vocabulary — broadcast; the 1-row total is a broadcast
    * cross join (the intended J4 pattern). Tokens are [[cleanTokens]]
    * (empty tokens dropped); bigram keys never collide with token
    * boundaries because tokens cannot contain the joining space. */
  def collocationStats(docs: DataFrame, textCol: String,
                       minPair: Long): DataFrame = {
    val toks = docs.select(cleanTokens(col(textCol)).as("toks"))
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val total = uni.agg(sum(col("cnt")).as("n_total"))
    val pairs = toks.select(explode(bigramsOf(col("toks"))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPair)
      .select(split(col("bigram"), " ").getItem(0).as("w1"),
        split(col("bigram"), " ").getItem(1).as("w2"), col("n_pair"))
    pairs
      .join(broadcast(uni.select(col("w").as("w1"), col("cnt").as("n_w1"))), "w1")
      .join(broadcast(uni.select(col("w").as("w2"), col("cnt").as("n_w2"))), "w2")
      .crossJoin(broadcast(total))
      .select("w1", "w2", "n_pair", "n_w1", "n_w2", "n_total")
  }

  /** Boolean AND retrieval over the same on-the-fly inverted index as
    * [[phraseSearch]]: documents containing EVERY term in `terms`
    * (token-exact, not substring), with the total occurrence count of
    * the query terms per matching document.
    *
    * Plan: explode → `isin` posting fetch BEFORE any shuffle (only the
    * query terms' postings survive the scan), one groupBy(doc) computing
    * both the distinct-term count (the AND gate) and the hit total —
    * candidate cost Σ posting(w_i), no per-term join chain, no
    * positions. The q132 oracle answers the same query with entirely
    * different machinery — DuckDB array predicates (`list_contains` per
    * term + `list_filter` length) — so agreement checks AND semantics
    * and tokenization, not the index implementation. */
  def booleanSearch(docs: DataFrame, idCol: String, textCol: String,
                    terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty && terms.size <= 16, "query: 1..16 terms")
    require(terms.distinct.size == terms.size, "query terms must be distinct")
    docs.select(col(idCol).as("doc"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc")
      .agg(count_distinct(col("term")).as("k"), count(lit(1)).as("n_hits"))
      .filter(col("k") === terms.size)
      .select(col("doc").as(idCol), col("n_hits"))
  }

  /** Top-k documents for a bag-of-terms probe query, scored by the
    * BM25-saturated tf with rational idf (scaladoc above). Output:
    * (idCol, score) ordered by score DESC, id — ties on identical
    * (tf vector, length) break deterministically. */
  def rankedRetrieval(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      topK: Int): DataFrame = {
    require(terms.nonEmpty && terms.size <= 16, "probe query: 1..16 terms")
    val withToks = docs.select(col(idCol), cleanTokens(col(textCol)).as("toks"))
      .select(col(idCol), col("toks"), size(col("toks")).as("dl"))

    // 1-row global stats; broadcast cross join (intended J4 pattern).
    val stats = withToks.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))

    // Inverted-index posting fetch: explode → keep probe terms only.
    val tf = withToks
      .select(col(idCol), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))

    // |terms| rows; broadcast.
    val dfPerTerm = tf.groupBy("term").agg(count(lit(1)).as("df"))

    val tfd = col("tf").cast("double")
    val dld = col("dl").cast("double")
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val norm = tfd * lit(2.2) /
      (tfd + lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) * dld / avgdl))
    val odds = (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val weighted = tf
      .join(broadcast(dfPerTerm), "term")
      .crossJoin(broadcast(stats))
      .select(col(idCol), col("term"), (norm * odds).as("w"))

    // Fixed-order cross-term sum via per-term pivot columns.
    val pivots = terms.zipWithIndex.map { case (t, i) =>
      max(when(col("term") === t, col("w"))).as(s"w$i")
    }
    val perDoc = weighted.groupBy(col(idCol)).agg(pivots.head, pivots.tail: _*)
    val score = terms.indices
      .map(i => coalesce(col(s"w$i"), lit(0.0)))
      .reduceLeft(_ + _)
    perDoc.select(col(idCol), score.as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
  }

  /** Keyword extraction: the top-`topN` terms per document by the
    * rarity-weighted score tf/df (the TF-IDF shape with a rational idf
    * — log-free, so the one float involved is a SINGLE IEEE division
    * both engines compute bit-identically per the mirrored-arithmetic
    * ground rule; it is the sort key only and never emitted). Output
    * (doc, term, tf, df, rn) — all integers, rn ∈ [1, topN], order
    * within a doc total via (score DESC, term ASC).
    *
    * Scale: per-doc tf agg (map-side combined), vocabulary-sized df
    * re-agg from the tf table (df = distinct docs per term, counted
    * WITHOUT a second scan of the corpus), term-keyed join back, one
    * doc-partitioned rank window. Per-doc candidate terms bound the
    * window partitions; nothing is global. */
  def keywordExtract(docs: DataFrame, idCol: String, textCol: String,
                     topN: Int): DataFrame = {
    require(topN >= 1, s"topN must be >= 1: $topN")
    val tf = docs.select(col(idCol).as("doc"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc")
      .orderBy((col("tf").cast("double") / col("df")).desc, col("term"))
    tf.join(dfreq, "term")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topN)
      .select(col("doc"), col("term"), col("tf"), col("df"), col("rn"))
  }

  /** Integer scale for [[bigramLmScores]] probabilities (permille·10⁶). */
  val LmScale = 1000000000L

  /** Add-one-smoothed bigram language-model scoring of a held-out split
    * against a model trained on the rest of the corpus — the CCNet/
    * Gopher-style "LM quality filter" re-expressed with exact integer
    * arithmetic (the reference's quality surface is keyword relevance,
    * optimade_database/Optimade_Server/server.py:106-120; perplexity
    * filtering is the training-pipeline extension of it).
    *
    * Model: p(w2|w1) = (c(w1 w2)+1) / (c(w1)+V) over the TRAIN split
    * (docs with id % holdoutMod ≠ holdoutRem), V = train unigram
    * vocabulary size. No logs anywhere (ln differs in the last ulp
    * across engines): each pair contributes the SCALED probability
    * ⌊p·LmScale⌋ computed as `(c+1)·LmScale div (c(w1)+V)` with the
    * numerator in DECIMAL(38,0) BEFORE the multiply (at 100-TB corpus
    * scale a bigram count ×10⁹ overflows BIGINT — the q184/q219
    * headroom rule; `div` on non-negative decimals ≡ DuckDB HUGEINT
    * `//`). A document's score is the pair mass Σ⌊p·S⌋ plus the
    * discrete mean mass div n — a monotone proxy for the (geometric)
    * per-token likelihood that stays hash-exact cross-engine.
    *
    * Scale: two count aggregations over the train token/bigram streams
    * (map-side combined — the shuffle carries distinct grams, not
    * tokens), two equi joins keyed on the gram strings (model tables
    * are corpus-vocabulary-sized, deliberately NOT broadcast), and a
    * 1-row vocabulary-size broadcast (J4 stat pattern, plan-audited).
    * The pair stream is a single `transform` over the materialized
    * token array — no positional self-join (the bigramsOf contract).
    *
    * Output: (idCol, n_pairs, mass_scaled, avg_scaled) for every
    * holdout doc with ≥2 tokens, ordered by the caller. */
  def bigramLmScores(docs: DataFrame, idCol: String, textCol: String,
                     holdoutMod: Int = 5, holdoutRem: Int = 0): DataFrame = {
    require(holdoutMod >= 2, s"holdoutMod must be >= 2: $holdoutMod")
    val toks = docs.select(col(idCol), cleanTokens(col(textCol)).as("toks"))
    val train = toks.filter(col(idCol) % holdoutMod =!= holdoutRem)
    val uc = train.select(explode(col("toks")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("cw"))
    val vsz = uc.agg(count(lit(1)).as("vsz"))
    val bc = train.filter(size(col("toks")) >= 2)
      .select(explode(bigramsOf(col("toks"))).as("b"))
      .groupBy("b").agg(count(lit(1)).as("cb"))
    val pairs = toks
      .filter(col(idCol) % holdoutMod === holdoutRem && size(col("toks")) >= 2)
      .select(col(idCol),
        explode(transform(sequence(lit(0), size(col("toks")) - 2),
          i => struct(element_at(col("toks"), i + 1).as("w1"),
            concat_ws(" ", element_at(col("toks"), i + 1),
              element_at(col("toks"), i + 2)).as("b")))).as("p"))
      .select(col(idCol), col("p.w1").as("w1"), col("p.b").as("b"))
    pairs
      .join(bc, Seq("b"), "left")
      .join(uc, Seq("w1"), "left")
      .crossJoin(broadcast(vsz))
      .withColumn("p_scaled",
        expr(s"cast(cast(coalesce(cb, 0) + 1 as decimal(38,0)) * $LmScale" +
          " div (coalesce(cw, 0) + vsz) as bigint)"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_pairs"), sum("p_scaled").as("mass_scaled"))
      .withColumn("avg_scaled", expr("mass_scaled div n_pairs"))
  }
}
