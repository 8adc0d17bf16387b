package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Within-document repetition signals and corpus-level boilerplate
  * coverage — the classic pretraining-corpus quality rules (the
  * "repetitious text" filters of Gopher/MassiveText and the CCNet-style
  * shared-paragraph removal), recast on the word stream the `documents`
  * table carries (its text is a single line, so the unit is the token
  * n-gram rather than the paragraph).
  *
  * Everything is integer-exact by design (counts, not ratios): the
  * oracle-gated outputs are BIGINT numerators + denominators and the
  * consumer picks its own thresholds, so no cross-engine float
  * discipline is needed (CLAUDE.md round() ground rule).
  *
  * Scale design: one explode per n-gram order, then groupBy
  * (doc_id, gram) — partial aggregation combines map-side inside each
  * doc's partition slice, and the shuffle carries distinct (doc, gram)
  * pairs, ≤ the token count. No self-joins, no windows over the corpus;
  * the boilerplate set (grams above the doc-frequency threshold) is tiny
  * by construction and broadcast back as a semi-join filter.
  *
  * Cache ownership: persists internal frames the returned (lazy)
  * result depends on; the CALLER releases after materializing —
  * graft.Caches.releaseAll(spark) (docs/CACHE_POLICY.md rule 1).
  */
object Repetition {

  /** (id, gram) — one row per n-gram START position (multiplicity
    * preserved), so downstream counts are position counts. The token
    * array is bound to an attribute before the transform (interpreted
    * HOFs re-evaluate captured non-attribute expressions per element —
    * see Dedup.minhashSigOf), and the generator is bound to a column
    * before explode (a generator cannot nest inside an expression).
    *
    * explode_OUTER + isNotNull, not inner explode: an inner Generate
    * makes InferFiltersFromGenerate synthesize `size(grams) > 0 AND
    * isnotnull(grams)`, and predicate pushdown then substitutes the
    * WHOLE gram expression — split included — below the Project,
    * recreating the captured-split-per-lambda-element trap the toks
    * binding exists to avoid (found by GlobalPlanAuditSpec's
    * captured-array detector; the filter re-tokenized per element, an
    * O(tokens²) pass per doc). The outer generate infers no filter;
    * the null row an empty gram array produces is dropped on the
    * GENERATED attribute, which nothing can push below. Short docs
    * (< n tokens) are absent either way. */
  def grams(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("id"), split(col(textCol), " ").as("toks"))
      .withColumn("grams", expr(
        s"""CASE WHEN size(toks) >= $n
           |  THEN transform(sequence(0, size(toks) - $n),
           |                 i -> array_join(slice(toks, i + 1, $n), ' '))
           |  ELSE slice(toks, 1, 0) END""".stripMargin))
      .select(col("id"), explode_outer(col("grams")).as("gram"))
      .filter(col("gram").isNotNull)

  /** Per-doc repetition stats: token count, the most frequent 2-gram's
    * occurrence count (`top2_cnt` — Gopher's "top n-gram fraction"
    * numerator), and the number of 5-gram start positions whose gram
    * occurs ≥2 times inside the doc (`dup5_pos` — the "duplicated
    * n-gram fraction" numerator). Docs shorter than the gram order get
    * zeros. */
  def docRepetition(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      size(split(col(textCol), " ")).cast("long").as("tok_cnt"))
    val top2 = grams(docs, idCol, textCol, 2)
      .groupBy(col("id").as("doc_id"), col("gram")).count()
      .groupBy("doc_id").agg(max("count").as("top2_cnt"))
    val dup5 = grams(docs, idCol, textCol, 5)
      .groupBy(col("id").as("doc_id"), col("gram")).count()
      .filter(col("count") >= 2)
      .groupBy("doc_id").agg(sum("count").as("dup5_pos"))
    base.join(top2, Seq("doc_id"), "left")
      .join(dup5, Seq("doc_id"), "left")
      .select(col("doc_id"), col("tok_cnt"),
        coalesce(col("top2_cnt"), lit(0L)).as("top2_cnt"),
        coalesce(col("dup5_pos"), lit(0L)).as("dup5_pos"))
  }

  /** Corpus boilerplate coverage: an n-gram is "boilerplate" when it
    * appears in at least ⌈nDocs / denom⌉ DISTINCT docs (denom=20 → 5%
    * of the corpus); each doc reports how many of its n-gram positions
    * fall inside boilerplate grams (`bp_hits`) next to its token count.
    * The threshold is integer ceil — no float corpus-fraction math.
    *
    * Two aggregates: gram → distinct-doc frequency (the only corpus-wide
    * shuffle, keyed by gram), then the small above-threshold set
    * semi-joins back into the per-doc position stream (broadcast — its
    * size is bounded by vocab^n / threshold, independent of corpus
    * rows). */
  def boilerplateCoverage(docs: DataFrame, idCol: String, textCol: String,
                          n: Int = 3, denom: Int = 20): DataFrame = {
    val nDocs = docs.select(col(idCol)).distinct().count()
    val threshold = (nDocs + denom - 1) / denom
    val g = grams(docs, idCol, textCol, n)
    val boiler = g.select("id", "gram").distinct()
      .groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") >= threshold)
      .select("gram")
    val cov = g.join(broadcast(boiler), Seq("gram"), "left_semi")
      .groupBy(col("id").as("doc_id")).agg(count(lit(1)).as("bp_hits"))
    docs.select(col(idCol).as("doc_id"),
        size(split(col(textCol), " ")).cast("long").as("tok_cnt"))
      .join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("tok_cnt"),
        coalesce(col("bp_hits"), lit(0L)).as("bp_hits"))
  }

  /** Per-doc n-gram novelty against everything EARLIER (ids as arrival
    * order): n_grams = the doc's gram positions, n_novel = positions
    * whose gram no earlier doc contains — the dedup-novelty curve that
    * tells a crawl pipeline when a source stops contributing new
    * content. Docs shorter than n tokens are absent (no grams).
    *
    * Scale design: one gram-keyed agg (min doc id per gram = its
    * first-seen owner, map-side combined) + one join back into the
    * position stream — cost Σ positions, no pairing term; "earlier" by
    * id needs no global ordering structure, just the min. */
  def noveltyRate(docs: DataFrame, idCol: String, textCol: String,
                  n: Int): DataFrame =
    // Positions collapse to distinct (gram, id) COUNTS in the first
    // map-side-combined aggregation (r13 optimization round, guide
    // §2.3 shuffle-fewer-bytes): the old shape persisted the raw
    // position stream and shuffled its full multiplicity by gram into
    // the first-seen join; here only collapsed pairs cross the
    // network, the join stage and the persist disappear, and the
    // per-gram min rides a window ON the pair frame (one gram
    // exchange — a hot boilerplate gram concentrates its ≤ #docs pair
    // rows in one window task, the measured-faster trade of the CC
    // star minima; the old gram-keyed SMJ had the same hot key).
    // n_grams = Σ npos, n_novel = Σ npos over first-seen grams —
    // identical position counts.
    grams(docs, idCol, textCol, n)
      .groupBy("gram", "id").agg(count(lit(1)).as("npos"))
      .withColumn("first_seen",
        min(col("id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("gram")))
      .groupBy(col("id").as("doc_id"))
      .agg(sum(col("npos")).as("n_grams"),
        sum(when(col("first_seen") === col("id"), col("npos"))
          .otherwise(0L)).as("n_novel"))

  /** Cross-source contamination matrix: for every pair of sources
    * (src_a < src_b), how many DISTINCT token n-grams they share — the
    * corpus-health audit run before mixing crawls/dumps (a high count
    * means one source republishes the other, so per-source dedup stats
    * and mixture weights double-count). Output (src_a, src_b, shared),
    * ordered; non-overlapping pairs are absent.
    *
    * Scale design (r13 optimization round, guide §2.4 — the
    * witnessFrames adjacency trick on the gram-posting shape): source
    * pairs explode ROW-LOCALLY from a per-gram sorted source list built
    * in ONE gram-keyed collect_set aggregation — the set dedupes
    * (source, gram) map-side, so the separate distinct AND the posting
    * self-join (two more gram exchanges + a join stage + the persist
    * the two consumers forced) disappear; the pair agg still combines
    * map-side. Per-gram fan-out is unchanged: the source list is
    * bounded by #sources — catalog-sized (thousands), never
    * corpus-sized — so the agg buffer and the C(|srcs|,2) local explode
    * are bounded the same way the old join's per-gram output was.
    * sort_array + position-slice emits each unordered pair once with
    * the old strict src_a < src_b semantics. The slice lambda captures
    * only an agg-barrier output (the captured-array HOF rule;
    * GlobalPlanAuditSpec walks this plan). */
  def crossSourceOverlap(docs: DataFrame, srcCol: String, textCol: String,
                         n: Int): DataFrame = {
    grams(docs, srcCol, textCol, n)
      .groupBy("gram").agg(sort_array(collect_set(col("id"))).as("srcs"))
      .filter(size(col("srcs")) >= 2)
      .select(posexplode(col("srcs")).as(Seq("i", "src_a")), col("srcs"))
      .select(col("src_a"),
        explode(slice(col("srcs"), col("i") + lit(2),
          size(col("srcs")) - col("i") - lit(1))).as("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("shared"))
      .orderBy("src_a", "src_b")
  }

  /** Split-document rejoin candidates: pairs (left, right) where the
    * LAST k tokens of `left` equal the FIRST k tokens of `right` — the
    * detector for documents a crawler/chunker split mid-text (the
    * inverse failure mode of q75's packing), whose halves should be
    * re-joined before dedup/training. One head-key and one tail-key
    * projection (row-local slices), an equi join on the bridge gram,
    * and the q69 posting-list guard: bridge keys with document
    * frequency above `maxDf` on either side are boilerplate
    * (headers/footers), contribute candidates quadratically, and are
    * excluded BY SEMANTICS (the oracle applies the same cap) — so join
    * fan-out is bounded by maxDf² per key. Docs shorter than k tokens
    * have no bridge. Self-pairs excluded. */
  def splitRejoinCandidates(docs: DataFrame, idCol: String, textCol: String,
                            k: Int, maxDf: Long): DataFrame = {
    val t = docs.select(col(idCol).as("id"), split(col(textCol), " ").as("ts"))
      .filter(size(col("ts")) >= k)
    val tails = t.select(col("id"),
      array_join(slice(col("ts"), -k, k), " ").as("bridge"))
    val heads = t.select(col("id"),
      array_join(slice(col("ts"), 1, k), " ").as("bridge"))
    def capped(side: DataFrame) = {
      val df = side.groupBy("bridge").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDf).select("bridge")
      side.join(df, "bridge")
    }
    capped(tails).select(col("bridge"), col("id").as("left_id"))
      .join(capped(heads).select(col("bridge"), col("id").as("right_id")),
        Seq("bridge"))
      .filter(col("left_id") =!= col("right_id"))
      .select("left_id", "right_id", "bridge")
  }

  /** Per-doc n-gram coverage against a REFERENCE sub-corpus: for every
    * non-reference doc, how many of its gram positions carry a gram
    * the reference contains — the held-out familiarity proxy behind
    * "is this candidate in-distribution for the model we trained on
    * ref?" (the doc-level sibling of [[noveltyRate]]'s arrival-order
    * novelty). Returns (doc_id, n_grams, n_known); docs shorter than
    * the gram order yield no row.
    *
    * Scale design: two [[grams]] scans over DISJOINT partitions of the
    * corpus (ref / eval — no doc is scanned twice), the reference side
    * collapsed to DISTINCT grams, one gram-keyed equi join (NOT a
    * broadcast — a reference corpus is corpus-scale, unlike q74's tiny
    * benchmark set), one doc-keyed aggregation. All-integer. */
  def referenceCoverage(docs: DataFrame, idCol: String, textCol: String,
                        isRef: Column, n: Int): DataFrame = {
    val ref = grams(docs.filter(isRef), idCol, textCol, n)
      .select("gram").distinct()
    // NOT collapsed to (gram, id) counts before the join (the
    // noveltyRate r13 rewrite): measured at sf0.1/32 cores the
    // pre-agg made q246 WORSE (0.713 → 0.808 s stable-pass medians) —
    // a bigram stream has ≈ as many distinct (gram, id) pairs as
    // positions, so the extra exchange buys almost no byte shrink,
    // unlike noveltyRate where it also replaced a join + persist.
    grams(docs.filter(!isRef), idCol, textCol, n)
      .join(ref.withColumn("known", lit(1L)), Seq("gram"), "left")
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("known"), lit(0L))).as("n_known"))
  }
}
