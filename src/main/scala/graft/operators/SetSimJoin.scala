package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prefix-filtering set-similarity self-join — the AllPairs/PPJoin
  * candidate-generation family (Bayardo, Ma, Srikant, "Scaling Up All
  * Pairs Similarity Search", WWW 2007; Xiao et al. PPJoin) as a Spark
  * plan. This is the LOSSLESS counterpart to
  * [[Dedup.ngramJaccardNearDupsFromPostings]]'s df-cap heuristic: the
  * df cap drops candidate pairs whose every shared token is frequent
  * (provably safe only when such pairs can't clear the threshold on the
  * given data); the prefix filter is safe on EVERY input by the prefix
  * theorem — order each record's tokens by a global total order
  * (ascending document frequency, so rarest first), keep only the first
  * p(x) = |x| − ⌈t·|x|⌉ + 1 tokens as index keys, and any pair with
  * J(x,y) ≥ t must collide on at least one prefix token: a miss would
  * leave |x∩y| ≤ |x| − p(x) = ⌈t·|x|⌉ − 1 < t·|x| ≤ t·|x∪y|.
  *
  * Scale design: the candidate join touches Σ over PREFIX tokens of
  * df², and prefix tokens are by construction each record's rarest —
  * frequent tokens (the df² blow-up) sit in suffixes and are never
  * index keys. Verification gathers each candidate's full token set
  * once (groupBy collect_set — one doc-sized array per side) and
  * intersects per pair, so verify cost is candidates × avg set size,
  * never corpus². The threshold is a rational tNum/tDen compared by
  * integer cross-multiplication (|∩|·tDen ≥ |∪|·tNum), so results are
  * exact and engine-independent — q113's DuckDB oracle states the
  * UNFILTERED all-pairs join and must agree exactly, which is the
  * losslessness theorem checked on real data.
  *
  * Cache ownership: persists internal frames the returned (lazy)
  * result depends on; the CALLER releases after materializing —
  * graft.Caches.releaseAll(spark) (docs/CACHE_POLICY.md rule 1).
  */
object SetSimJoin {

  /** All pairs with Jaccard ≥ tNum/tDen over a distinct posting list
    * `tokens` = (id, tok). Requires one row per (id, tok) — feed
    * [[Dedup.ngramPostings]] output or `.distinct()` raw postings.
    * Returns (id_a, id_b, inter, uni) with id_a < id_b — all BIGINT,
    * no floats anywhere. */
  def jaccardJoin(tokens: DataFrame, tNum: Int, tDen: Int,
                  idCol: String = "id", tokCol: String = "tok"): DataFrame = {
    require(tNum > 0 && tNum <= tDen, s"threshold $tNum/$tDen not in (0,1]")
    val toks = tokens.select(col(idCol).cast("long").as("id"),
      col(tokCol).as("tok"))
    // broadcast: |distinct tokens| ≪ |postings| by Heaps' law; on inputs
    // where that fails the hint degrades to a plain shuffled join
    val dfreq = broadcast(toks.groupBy("tok").agg(count(lit(1)).as("df")))
    // global total order (df, tok): ties broken by the token itself so
    // every engine/partitioning ranks identically
    val ranked = toks.join(dfreq, "tok")
      .withColumn("rnk",
        row_number().over(Window.partitionBy("id").orderBy("df", "tok")))
      .withColumn("sz", count(lit(1)).over(Window.partitionBy("id")))
    // p = sz − ceil(t·sz) + 1, integer ceil; windows are per-id (no
    // global window), so the rank pass stays partition-parallel.
    //
    // persist (MLlib-style internal caching): `pref` feeds BOTH sides of
    // the candidate self-join and `arrs` BOTH sides of the verify join —
    // AQE's runtime broadcast conversion rewrites each side's Exchange
    // independently, so ReuseExchange never collapses them and the whole
    // join+window chain would execute twice (measured 4.6 s → 1.0 s at
    // sf0.1 from caching the two stages; both are prefix/array digests,
    // ~|corpus| rows, far smaller than the postings input). Entries are
    // matched per logical plan by the CacheManager, so repeat executions
    // of the same query reuse one entry rather than accreting.
    val pref = ranked.filter(
      col("rnk") <= col("sz") - expr(s"(($tNum * sz) + $tDen - 1) div $tDen") + 1)
      .select("id", "tok", "rnk", "sz").persist()
    // Candidate pruning BEYOND the prefix filter (r13 optimization
    // round, guide §2.3 — shuffle fewer candidates into the verify
    // join), both LOSSLESS by the AllPairs/PPJoin theorems and checked
    // on real data by the oracle (the unfiltered all-pairs join):
    //  - length filter: J ≥ t forces t·|x| ≤ |y| ≤ |x|/t
    //    (integer cross-multiplied);
    //  - positional filter: a collision at positions (i, j) of the two
    //    (df, tok)-sorted lists bounds the overlap by
    //    min(i,j) − 1 + 1 + min(|x|−i, |y|−j) — shared tokens ordered
    //    before the collision fit below BOTH positions, those from it
    //    on fit in the shorter remaining suffix. The bound holds at
    //    EVERY collision, so a pair survives iff min over its
    //    collisions reaches α = overlap form of t (inter·(tN+tD) ≥
    //    tN·(|x|+|y|)); the min-aggregation replaces the old
    //    .distinct() at the same exchange count.
    val cand = pref.select(col("id").as("id_a"), col("tok"),
        col("rnk").as("ra"), col("sz").as("sa"))
      .join(pref.select(col("id").as("id_b"), col("tok"),
        col("rnk").as("rb"), col("sz").as("sb")), "tok")
      .filter(col("id_a") < col("id_b"))
      .filter(col("sb") * tDen >= col("sa") * tNum &&
        col("sa") * tDen >= col("sb") * tNum)
      .withColumn("_ub", least(col("ra"), col("rb"))
        + least(col("sa") - col("ra"), col("sb") - col("rb")))
      .groupBy("id_a", "id_b")
      .agg(min(col("_ub")).as("_ub"),
        max(col("sa")).as("sa"), max(col("sb")).as("sb"))
      .filter(col("_ub") * (tNum + tDen) >= (col("sa") + col("sb")) * tNum)
      .select("id_a", "id_b")
    val arrs = toks.groupBy("id").agg(collect_set(col("tok")).as("ts")).persist()
    cand
      .join(arrs.select(col("id").as("id_a"), col("ts").as("ta")), "id_a")
      .join(arrs.select(col("id").as("id_b"), col("ts").as("tb")), "id_b")
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .withColumn("uni",
        (size(col("ta")) + size(col("tb"))).cast("long") - col("inter"))
      .filter(col("inter") * tDen >= col("uni") * tNum)
      .select("id_a", "id_b", "inter", "uni")
  }

  /** Asymmetric containment join: all ordered pairs (a, b), a ≠ b, with
    * |A∩B| ≥ t·|A| — "document a is (nearly) contained in document b".
    * The dedup signal Jaccard misses: a quote, excerpt or
    * concat-of-documents has low Jaccard to its source but containment
    * ≈ 1, which is why curation pipelines run BOTH (Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better", ACL
    * 2022 measures exactly this asymmetric overlap).
    *
    * Prefix filter, containment variant: the required overlap is
    * o = ⌈t·|A|⌉, so if a pair shares NO token among A's
    * |A| − o + 1 rarest, every shared token sits in A's o−1 suffix
    * slots — impossible. Index only A-side prefixes (rarest-first by
    * global (df, tok) order) but probe the FULL posting list on the
    * B side (B's size never bounds the overlap, so B cannot be
    * prefix-pruned). Same verify shape as [[jaccardJoin]]: gather each
    * candidate's token set once, intersect per pair, compare by integer
    * cross-multiplication. Returns (id_a, id_b, inter, sz_a), BIGINT
    * throughout; q133's oracle is the UNFILTERED all-pairs join, so
    * exact agreement is the losslessness proof on real data. */
  def containmentJoin(tokens: DataFrame, tNum: Int, tDen: Int,
                      idCol: String = "id", tokCol: String = "tok"): DataFrame = {
    require(tNum > 0 && tNum <= tDen, s"threshold $tNum/$tDen not in (0,1]")
    val toks = tokens.select(col(idCol).cast("long").as("id"),
      col(tokCol).as("tok"))
    val dfreq = broadcast(toks.groupBy("tok").agg(count(lit(1)).as("df")))
    // persist ranked (not just the prefix slice): the r13 positional
    // filter probes the FULL B-side posting list WITH positions, so
    // the ranked frame feeds both the prefix filter and the probe —
    // without caching the df-join + window chain runs once per
    // consumer (AQE ReuseExchange gap)
    val ranked = toks.join(dfreq, "tok")
      .withColumn("rnk",
        row_number().over(Window.partitionBy("id").orderBy("df", "tok")))
      .withColumn("sz", count(lit(1)).over(Window.partitionBy("id")))
      .persist()
    val pref = ranked.filter(
      col("rnk") <= col("sz") - expr(s"(($tNum * sz) + $tDen - 1) div $tDen") + 1)
    // Candidate pruning beyond the A-side prefix filter (r13, guide
    // §2.3; see jaccardJoin — containment variants, both lossless,
    // oracle = unfiltered all-pairs): size filter |B| ≥ ⌈t·|A|⌉
    // (inter ≤ |B|), and the positional collision bound
    // min(i,j) − 1 + 1 + min(|A|−i, |B|−j) ≥ ⌈t·|A|⌉ folded by min
    // over a pair's collisions (the min-agg replaces .distinct()).
    val cand = pref.select(col("id").as("id_a"), col("tok"),
        col("rnk").as("ra"), col("sz").as("sa"))
      .join(ranked.select(col("id").as("id_b"), col("tok"),
        col("rnk").as("rb"), col("sz").as("sb")), "tok")
      .filter(col("id_a") =!= col("id_b"))
      .filter(col("sb") * tDen >= col("sa") * tNum)
      .withColumn("_ub", least(col("ra"), col("rb"))
        + least(col("sa") - col("ra"), col("sb") - col("rb")))
      .groupBy("id_a", "id_b")
      .agg(min(col("_ub")).as("_ub"), max(col("sa")).as("sa"))
      .filter(col("_ub") * tDen >= col("sa") * tNum)
      .select("id_a", "id_b")
    val arrs = toks.groupBy("id").agg(collect_set(col("tok")).as("ts")).persist()
    cand
      .join(arrs.select(col("id").as("id_a"), col("ts").as("ta")), "id_a")
      .join(arrs.select(col("id").as("id_b"), col("ts").as("tb")), "id_b")
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .withColumn("sz_a", size(col("ta")).cast("long"))
      .filter(col("inter") * tDen >= col("sz_a") * tNum)
      .select("id_a", "id_b", "inter", "sz_a")
  }
}
