package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Apportion, AsofJoin, Bars, Bfs, BloomJoin, Bpe,
  ChangeCapture, Cooccur, CountMin, Curation, Dedup, Drift, Fifo, Funnel,
  Fuzzy, GraphStats, Hierarchy, Intervals, IvfIndex, Kcore, Lpa, PageRank,
  PrefixSum, RangeJoin, QDigestAgg, RankStats, Repetition, Retrieval, Scd,
  SetSimJoin, Skyline, SpanDedup, Sssp, Streaks, TableSync, TopKAgg,
  Triangles, ZOrder}

/** Scale-stress harness for the dedup/ANN families: measures how runtime
  * grows with corpus size, so the "candidate cost is Σ df²" / "probe
  * touches nprobe cells" scale claims in the scaladocs are MEASURED, not
  * argued.
  *
  * Method: synthesize k× fixtures under /tmp/graft_scale from the sf0.1
  * documents/embeddings tables (driver data is fixed and read-only).
  * Documents are scaled by unioning k copies with offset ids and
  * per-copy word salting (`regexp_replace` appends a copy tag to every
  * word), so copies share NO word-3-shingles — the corpus behaves like k
  * independent corpora of identical density rather than one corpus where
  * every doc gained k−1 planted near-dups (which would quadratically
  * inflate the true answer, not the algorithm's overhead). Embeddings
  * are scaled with offset ids and unchanged vectors: IVF cell density
  * grows k× and per-probe scan cost should follow it linearly.
  *
  * For each family the per-scale wall time is a median over
  * SPARK_GRAFT_BENCH_RUNS runs (default 3), and the growth exponent
  * alpha is the least-squares slope of log(time) vs log(k). Fixed
  * per-query overhead (~0.25 s session cost at local[32]) biases alpha
  * DOWNWARD at these sizes, so the check is one-sided: alpha well above
  * 1 (superlinear) is the failure signal. Prints one JSON line per
  * family plus a summary; exits nonzero if any family exceeds
  * ALPHA_MAX (default 1.35).
  */
object BenchScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "1,4,16")
      .split(",").map(_.trim.toInt).toSeq
    val alphaMax = sys.env.getOrElse("SPARK_GRAFT_ALPHA_MAX", "1.35").toDouble
    // keyed by source sf so sf0.01-derived fixtures are never reused for
    // an sf0.1 run; completeness via the writer's _SUCCESS marker, not a
    // bare dir-exists (a killed run leaves a partial dir behind)
    val scratch = s"/tmp/graft_scale/${new java.io.File(sfDir).getName}"

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- synthesize the k× fixtures (materialized so timings measure
    // scan→operator, not the union-generation DAG) ----
    val docs = tables.Tables.documents(spark, sfDir).select("doc_id", "text")
    val emb = tables.Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    // events scale by cloning users (ids offset, timestamps unchanged):
    // k× users with identical per-user streams — the right shape for
    // asof/range joins, whose cost is per-key
    val ev = tables.Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type")
    scales.foreach { k =>
      val dDir = s"$scratch/k$k/documents.parquet"
      val eDir = s"$scratch/k$k/embeddings.parquet"
      if (!new java.io.File(dDir, "_SUCCESS").exists()) {
        (0 until k).map { c =>
          docs.select((col("doc_id") + lit(c.toLong * 1000000L)).as("doc_id"),
            (if (c == 0) col("text")
             else regexp_replace(col("text"), "(\\S+)", "$1~c" + c)).as("text"))
        }.reduce(_.unionByName(_))
          .repartition(cpus.toInt).write.mode("overwrite").parquet(dDir)
      }
      if (!new java.io.File(eDir, "_SUCCESS").exists()) {
        (0 until k).map { c =>
          emb.select((col("vec_id") + lit(c.toLong * 1000000L)).as("vec_id"),
            col("embedding"))
        }.reduce(_.unionByName(_))
          .repartition(cpus.toInt).write.mode("overwrite").parquet(eDir)
      }
      val vDir = s"$scratch/k$k/events.parquet"
      if (!new java.io.File(vDir, "_SUCCESS").exists()) {
        (0 until k).map { c =>
          ev.select((col("event_id") + lit(c.toLong * 100000000L)).as("event_id"),
            col("ts"), (col("user_id") + lit(c.toLong * 10000000L)).as("user_id"),
            col("event_type"))
        }.reduce(_.unionByName(_))
          .repartition(cpus.toInt).write.mode("overwrite").parquet(vDir)
      }
    }

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    def time(body: => Long): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // least-squares slope of log(t) vs log(k)
    def alpha(ks: Seq[Int], ts: Seq[Double]): Double = {
      val xs = ks.map(k => math.log(k.toDouble))
      val ys = ts.map(math.log)
      val (mx, my) = (xs.sum / xs.size, ys.sum / ys.size)
      xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum /
        xs.map(x => (x - mx) * (x - mx)).sum
    }

    val queryVecs = emb.filter(col("vec_id") < 3)

    // Each family reads the materialized k× fixture and runs the SAME
    // operator pipeline as its oracle-gated query (q37/q38/q69/q54),
    // minus the aux-parquet round-trip the oracle needs.
    val families: Seq[(String, Int => Long)] = Seq(
      "minhash_lsh" -> { k =>
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
        Dedup.minhashNearDupsFromSigs(
          Dedup.minhashSigs(d, "doc_id", "text"),
          threshold = 0.5, bands = 16, rowsPerBand = 4).count()
      },
      "simhash" -> { k =>
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
        Dedup.simhashNearDupsFromBits(
          d.select(col("doc_id").as("id"), Dedup.simhashUdf(col("text")).as("bits")),
          maxHamming = 3).count()
      },
      "ngram_jaccard" -> { k =>
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
        Dedup.ngramJaccardNearDupsFromPostings(
          Dedup.ngramPostings(d, "doc_id", "text"),
          threshold = 0.6, maxDf = 4, assumeDistinct = true).count()
      },
      "ivf_build" -> { k =>
        val e = spark.read.parquet(s"$scratch/k$k/embeddings.parquet")
        IvfIndex.build(e, "vec_id", "embedding", nlist = 8).assigned.count()
      },
      "ivf_search" -> { k =>
        val e = spark.read.parquet(s"$scratch/k$k/embeddings.parquet")
        val idx = IvfIndex.buildCached(s"scale:k$k", e, "vec_id", "embedding", nlist = 8)
        idx.assigned.cache().count() // pin assignment so search timing is search
        IvfIndex.topK(idx, queryVecs, "vec_id", "embedding", k = 5, nprobe = 3).count()
      },
      "vocabulary" -> { k =>
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
        Curation.vocabulary(d, "doc_id", "text", minTf = 5L).count()
      },
      "band_suppress" -> { k =>
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
        Dedup.bandSuppressed(Dedup.minhashSigs(d, "doc_id", "text"),
          bands = 16, rowsPerBand = 4).count()
      },
      "contamination" -> { k =>
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
        Curation.contaminationScreen(
          Dedup.ngramPostings(d, "doc_id", "text"), col("id") % 97 === 0).count()
      },
      "countofcounts" -> { k =>
        // word salting makes each copy's bigram space disjoint, so the
        // distinct-bigram shuffle frame ALSO grows k× — the worst case
        // for the wide exchange (a repetitive corpus would shrink it)
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
        Retrieval.bigramCountOfCounts(d, "text").count()
      },
      "retrieval" -> { k =>
        // probe terms survive un-salted only in copy 0: the posting set
        // is fixed while the corpus grows k×, so this measures the
        // dominant cost — the scan→explode→term-filter pass — with the
        // scoring tail held constant
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
        Retrieval.rankedRetrieval(d, "doc_id", "text",
          Seq("spark", "join", "window"), topK = 20).count()
      },
      "asof_join" -> { k =>
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        AsofJoin.asofMatch(
          e.filter(col("event_type") === "click"),
          e.filter(col("event_type") === "view"),
          "user_id", "ts", "ts", "event_id", "event_id").count()
      },
      "range_join" -> { k =>
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
          .withColumn("value", lit(0.0)) // sessionizeBatch aggregates value
        val sessions = graft.streaming.EventStreams
          .sessionizeBatch(e, gapMinutes = 30)
          .select("user_id", "session_idx", "session_start_ms", "session_end_ms")
        val errors = e.filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id"),
            unix_millis(col("ts")).as("ts_ms"))
        RangeJoin.pointInInterval(errors, sessions, "user_id", "ts_ms",
          "session_start_ms", "session_end_ms", chunkWidth = 3600000L).count()
      },
      "bloom_semi" -> { k =>
        // fixed dim (copy-0 users only), k× fact: measures the
        // scan-side prune + semi join as the fact side grows — the
        // 100 TB shape (the bloom build cost is constant)
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        val dim = e.filter(col("user_id") < 10000000L &&
            col("user_id") % 10 === 0)
          .select(col("user_id").as("dim_uid")).distinct()
        BloomJoin.semiPruned(e, "user_id", dim, "dim_uid",
          expectedItems = 20000L, fpp = 0.01).count()
      },
      "prefix_sum" -> { k =>
        // rows grow k× inside a FIXED day span: chunk count constant,
        // per-chunk window sort grows k·log k — the operator's worst
        // axis (a longer timespan would instead add parallel chunks)
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
          .withColumn("value", (col("event_id") % 1000).cast("double") / 10.0)
        PrefixSum.runningTotal(e, "ts", "event_id", col("value"),
          unix_millis(date_trunc("day", col("ts"))), "run").count()
      },
      "funnel" -> { k =>
        // users grow k× with identical per-user streams: the chained
        // conditional-min windows are per-key work, so this is the
        // embarrassingly-parallel axis — same operator the q88 oracle
        // gates
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        Funnel.perKey(e, "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"), horizonHours = 6).count()
      },
      "zorder_box" -> { k =>
        // store built once per k (write-once cache, like ivf_search's
        // pinned assignment); the timed portion converges to the box
        // query — cover enumeration is bounded by the QUERY box, and
        // the pruned scan reads only intersecting cells, so k× rows
        // grow only the per-cell file sizes
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
          .withColumn("value", (col("event_id") % 1000).cast("double") / 10.0)
          .select("event_id", "user_id", "value")
        val path = ZOrder.store(e, "user_id", "value", 3,
          s"$scratch/k$k/zstore")
        ZOrder.boxQuery(spark, path, 3,
          "user_id", 2, 8, "value", 10.0, 30.0).count()
      },
      "pagerank" -> { k =>
        // k× users each wired to a FIXED set of 1000 hub nodes (and
        // back): edges grow k×, the per-round join + dst-sum follow —
        // the embarrassingly-parallel axis; rounds are constant (3)
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        val pair = e.select(col("user_id").as("c"),
          (col("event_id") % 1000).as("s")).distinct()
        val edges = pair.select((col("c") * 2).as("src"), (col("s") * 2 + 1).as("dst"))
          .unionByName(pair.select((col("s") * 2 + 1).as("src"), (col("c") * 2).as("dst")))
        PageRank.ranks(edges, iters = 3).count()
      },
      "phrase_search" -> { k =>
        // like `retrieval`: the probe phrase survives un-salted only in
        // copy 0, so the position-join tail is fixed while the
        // scan→posexplode→term-filter front grows k×
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
        Retrieval.phraseSearch(d, "doc_id", "text", Seq("table", "hash")).count()
      },
      "fuzzy_join" -> { k =>
        // fixed probe side (30 copy-0 names, 3rd char dropped), k×
        // right side: candidates grow with the right side only, the
        // length-band equi-join keeps the scan one pass
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
        val names = d.select(col("doc_id").as("rid"),
          substring(col("text"), 1, 12).as("rname"))
        val probes = names.filter(col("rid") < 30)
          .select(col("rid").as("pid"),
            expr("concat(substr(rname, 1, 2), substr(rname, 4))").as("pname"))
        Fuzzy.fuzzyJoin(probes, names, "pname", "rname", maxDist = 2).count()
      },
      "cooccur" -> { k =>
        // the top-20 vocab cap holds the pair space constant while the
        // wordcount + distinct-postings front end grows k×
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
        Cooccur.frequentPairs(d, "doc_id", "text", 20, 2L).count()
      },
      "snapshot_diff" -> { k =>
        // both snapshots grow k×; the diff is one key-partitioned
        // full-outer join, so cost tracks the shuffle volume linearly
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
        val oldS = d.filter(col("doc_id") % 10 =!= 3)
        val newS = d.filter(col("doc_id") % 10 =!= 7)
          .select(col("doc_id"),
            when(col("doc_id") % 5 === 0, concat(col("text"), lit(" edited")))
              .otherwise(col("text")).as("text"))
        ChangeCapture.snapshotDiff(oldS, newS, Seq("doc_id"), Seq("text")).count()
      },
      "triangles" -> { k =>
        // co-membership graph with the copy tag INSIDE the group key:
        // cloned users carry identical streams, so without the tag each
        // group would grow k× and edges k² — with it, k independent
        // copies of the k=1 graph (groups, edges, triangles all k×)
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        val g = e.select(col("user_id").as("u"),
          struct(col("event_type"), date_trunc("minute", col("ts")),
            expr("user_id div 10000000")).as("grp")).distinct()
        val g2 = g.select(col("u").as("u2"), col("grp").as("grp2"))
        val edges = g.join(g2, col("grp") === col("grp2") && col("u") < col("u2"))
          .select(col("u").as("a"), col("u2").as("b")).distinct()
        Triangles.enumerate(edges).count()
      },
      "scd2" -> { k =>
        // k× users, identical per-user change logs: run collapse is
        // per-key window work — the embarrassingly-parallel axis
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        Scd.intervals(e, "user_id", "ts", "event_id", "event_type").count()
      },
      "hierarchy" -> { k =>
        // k× users in per-copy binary-halving forests (user ids are
        // contiguous 0..1499 per copy, so local div 2 always exists):
        // depth is ~11 at EVERY k, so the doubling round count is
        // constant and each round's self-join grows k× — the operator's
        // claim is exactly "cost = O(log depth) linear-size joins"
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        val nodes = e.select(col("user_id")).distinct()
          .withColumn("local", col("user_id") % 10000000L)
          .select(col("user_id"),
            when(col("local") < 4, col("user_id"))
              .otherwise(col("user_id") - col("local") + expr("local div 2"))
              .as("parent"))
        Hierarchy.rootAndDepth(nodes, "user_id", "parent").count()
      },
      "countmin" -> { k =>
        // sketch build is the measured path: the scan+explode front
        // grows k× while the only shuffle's key space stays ≤ d·w;
        // the probe side (copy-0 users) is fixed
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        val sk = CountMin.sketch(e, col("user_id"), w = 256)
        CountMin.estimate(sk,
          e.filter(col("user_id") < 100), "user_id", w = 256).count()
      },
      "skyline" -> { k =>
        // the frontier stays tiny while the scanned input grows k×:
        // measures that local pruning (not the merge task) absorbs the
        // growth
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
          .withColumn("v", (col("event_id") % 1000).cast("double"))
          .withColumn("t_us", unix_micros(col("ts")))
        Skyline.pareto(e, Seq(("v", true), ("t_us", false))).count()
      },
      "bfs" -> { k =>
        // k× users all within 2 hops of the FIXED hub set (bipartite
        // user↔hub graph): eccentricity — and so the round count — is
        // constant, while each round's frontier⋈edges neighborhood
        // grows k×; cost should track edge volume linearly
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        val pair = e.select(col("user_id").as("c"),
          (col("event_id") % 1000).as("s")).distinct()
        val edges = pair.select((col("c") * 2).as("src"), (col("s") * 2 + 1).as("dst"))
          .unionByName(pair.select((col("s") * 2 + 1).as("src"), (col("c") * 2).as("dst")))
        val sources = pair.select((col("s") * 2 + 1).as("node"))
          .filter(col("node") < 21).distinct()
        Bfs.distances(edges, sources).count()
      },
      "sssp" -> { k =>
        // same k×-users / fixed-hubs bipartite construction as "bfs":
        // round count pinned by the 2-hop eccentricity, per-round
        // relaxation neighborhood grows k× — cost should track edge
        // volume ~linearly (weights from event_id make min-combining
        // non-trivial without changing the round structure)
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        val pair = e.groupBy(col("user_id").as("c"),
            (col("event_id") % 1000).as("s"))
          .agg((min(col("event_id")) % 7 + 1).as("w"))
        val edges = pair.select((col("c") * 2).as("src"),
            (col("s") * 2 + 1).as("dst"), col("w"))
          .unionByName(pair.select((col("s") * 2 + 1).as("src"),
            (col("c") * 2).as("dst"), col("w")))
        val sources = pair.select((col("s") * 2 + 1).as("node"))
          .filter(col("node") < 21).distinct()
        Sssp.shortestPaths(edges, sources).count()
      },
      "setsim_prefix" -> { k =>
        // word salting keeps each copy's shingle space disjoint: the
        // prefix index grows k× but collides only within a copy, so
        // candidates (and true pairs) grow k×, never k²
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
        SetSimJoin.jaccardJoin(Dedup.ngramPostings(d, "doc_id", "text"),
          tNum = 1, tDen = 2, idCol = "id", tokCol = "shingle").count()
      },
      "table_sync" -> { k =>
        // both snapshots grow k×, planted edits grow k×: the digest
        // pass is two scans + a 64-row digest compare, and the repair
        // join touches only dirty-bucket rows
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
          .select(col("event_id").as("id"), col("user_id").as("u"))
        val oldS = e
        val newS = e.filter(col("id") % 1000 =!= 7)
          .withColumn("u",
            when(col("id") % 1000 === 13, col("u") + 1).otherwise(col("u")))
        TableSync.syncDiff(oldS, newS,
          keyH = TableSync.rowHash(Seq(col("id"))),
          rowH = TableSync.rowHash(Seq(col("id"), col("u"))),
          buckets = 64, keyCols = Seq("id"), cmpCols = Seq("u")).count()
      },
      "topk_group" -> { k =>
        // k× users (groups), identical per-user streams: the bounded
        // buffer keeps per-group work constant while groups scale out
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        TopKAgg.topKPerGroup(
          e.withColumn("v", col("event_id") % 1000),
          "user_id", "v", "event_id", k = 3).count()
      },
      "bpe_pairs" -> { k =>
        // salted copies have disjoint pair spaces: the pair-count
        // shuffle's key space grows k× along with the scan
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
        Bpe.adjacentPairCounts(d, "text").count()
      },
      "cdc_replay" -> { k =>
        // k× keys, same per-key log depth: one map-side-combined
        // shuffle whose output is key-sized
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"),
            when(col("event_type") === "error", lit("D")).otherwise(lit("U"))
              .as("op"))
        ChangeCapture.replay(e, Seq("user_id"), Seq("ts", "event_id"),
          "op", Seq("event_type")).count()
      },
      "subtree_rollup" -> { k =>
        // same per-copy binary forests as `hierarchy`: depth (and so
        // squaring rounds) constant, closure rows grow k×
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        val nodes = e.select(col("user_id")).distinct()
          .withColumn("local", col("user_id") % 10000000L)
          .select(col("user_id"),
            when(col("local") < 4, col("user_id"))
              .otherwise(col("user_id") - col("local") + expr("local div 2"))
              .as("parent"),
            (col("user_id") % 100L).as("v"))
        Hierarchy.subtreeAgg(nodes, "user_id", "parent", "v").count()
      },
      "components_star" -> { k =>
        // copy tag inside the hub id keeps the k copies' graphs
        // disjoint: k independent copies of the k=1 graph, so the
        // star-contraction round count stays constant while every
        // round's edge-list shuffles grow k× (user ids shifted to 1e9+
        // so the two namespaces never collide)
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        val pairs = e.select((col("user_id") + lit(1000000000L)).as("id_a"),
          (expr("user_id div 10000000") * 1000L + col("event_id") % 1000).as("id_b"))
          .distinct()
        Dedup.connectedComponents(pairs, maxIter = 40).count()
      },
      "components_hub" -> { k =>
        // SKEWED-HUB stress for the CC star minima: ONE global hub
        // owns ~20% of all edges at every k (hub degree grows k× with
        // the row count — the power-law celebrity case), the rest is
        // a sparse id chain. Guards the default window shape's alpha
        // under skew; the r13 A/B of window vs the skewSafeMinima
        // groupBy+join-back shape on this fixture is recorded in
        // OPTIMIZATION_r13.md (window 6.5 s vs 7.9 s at k16 — the
        // hub task only becomes the stage at ~10^7+ rows on one key,
        // which is when callers flip skewSafeMinima).
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        val ids = e.select((col("user_id") * 17 + col("event_id") % 13)
          .as("id")).distinct()
        val hubEdges = ids.filter(col("id") % 5 === 0)
          .select(lit(0L).as("id_a"), (col("id") + 10L).as("id_b"))
        val chain = ids.select((col("id") + 10L).as("id_a"),
          (col("id") + 11L).as("id_b"))
        Dedup.connectedComponents(hubEdges.unionByName(chain), maxIter = 40)
          .count()
      },
      "interval_merge" -> { k =>
        // k× users with identical per-user interval sets: the island
        // sweep is per-key window work — the embarrassingly-parallel
        // axis (one exchange on the key, per-key n log n sort)
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        val iv = e.select(col("user_id"), col("event_id"),
            expr("unix_micros(ts) div 86400000000").as("s"))
          .withColumn("e", col("s") + 30)
        Intervals.mergeIntervals(iv, "user_id", "event_id", "s", "e").count()
      },
      "ohlc" -> { k =>
        // rows grow k× inside FIXED (series, hour-bucket) partitions:
        // the two in-bucket rank sorts are the k·log k axis (same worst
        // axis as prefix_sum; a longer history would instead add
        // parallel buckets)
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
          .withColumn("value", (col("event_id") % 1000).cast("double") / 10.0)
        Bars.ohlc(e, bucketMinutes = 60).count()
      },
      "kcore" -> { k =>
        // copy tag inside the hub id (components_star pattern): k
        // disjoint copies of the k=1 bipartite graph — peel depth
        // constant, each round's degree count + semi joins grow k×
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        val pair = e.select((col("user_id") + lit(1000000000L)).as("c"),
          (expr("user_id div 10000000") * 1000L + col("event_id") % 1000).as("s"))
          .distinct()
        val edges = pair.select(col("c").as("src"), col("s").as("dst"))
          .unionByName(pair.select(col("s").as("src"), col("c").as("dst")))
        Kcore.kcore(edges, k = 5, maxRounds = 40).count()
      },
      "twohop" -> { k =>
        // per-copy binary forests (the `hierarchy` construction, made
        // symmetric): 2-hop sets are degree-bounded (grandparent,
        // sibling, grandchildren), so 2-paths grow k× with users —
        // never the hub-squared blow-up a dense bipartite fixture
        // would fake
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        val nodes = e.select(col("user_id")).distinct()
          .withColumn("local", col("user_id") % 10000000L)
          .select(col("user_id").as("src"),
            when(col("local") < 4, col("user_id"))
              .otherwise(col("user_id") - col("local") + expr("local div 2"))
              .as("dst"))
        val edges = nodes.unionByName(
          nodes.select(col("dst").as("src"), col("src").as("dst")))
        GraphStats.twoHopCounts(edges).count()
      },
      "containment" -> { k =>
        // word salting keeps copies' shingle spaces disjoint (the
        // setsim_prefix argument): the A-side prefix index grows k×
        // but collides only within a copy — candidates k×, never k²
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
        SetSimJoin.containmentJoin(Dedup.ngramPostings(d, "doc_id", "text"),
          tNum = 4, tDen = 5, idCol = "id", tokCol = "shingle").count()
      },
      "collocations" -> { k =>
        // salted copies → disjoint bigram spaces: unigram + pair key
        // spaces grow k× along with the scan (worst case for the two
        // count shuffles; a repetitive corpus would shrink them)
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
        Retrieval.collocationStats(d, "text", minPair = 25L).count()
      },
      "lpa" -> { k =>
        // kcore's fixture: k disjoint copies of the bipartite
        // user-event graph — 4 fixed rounds, each round's label join +
        // two aggs grow k× with the edge list
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        val pair = e.select((col("user_id") + lit(1000000000L)).as("c"),
          (expr("user_id div 10000000") * 1000L + col("event_id") % 1000).as("s"))
          .distinct()
        val edges = pair.select(col("c").as("src"), col("s").as("dst"))
          .unionByName(pair.select(col("s").as("src"), col("c").as("dst")))
        Lpa.communities(edges, rounds = 4).count()
      },
      "dup_spans" -> { k =>
        // salted copies → disjoint span spaces: span positions, the
        // span-df shuffle and the dup-set join all grow k×; cross-copy
        // duplicate spans are impossible by construction, so the
        // duplicated-span set stays per-copy-shaped
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
        SpanDedup.dupSpanStats(d, "doc_id", "text", k = 8).count()
      },
      "streaks" -> { k =>
        // k× users with identical per-user day sets: the islands
        // window + both groupBys are per-key work on one user-keyed
        // exchange — the embarrassingly-parallel axis (q171's pipeline)
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        Streaks.dailyStreaks(
          e.select(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("day")),
          "user_id", "day").count()
      },
      "churn" -> { k =>
        // k× users, each with the same calendar-bounded week set: ONE
        // user-keyed collect_set + row-local RETAINED/NEW/CHURNED
        // emission (q197's pipeline after the r13 rewrite) — the agg
        // buffer is calendar-bounded per user, so the axis is
        // embarrassingly parallel in users and the status explode is
        // O(#periods) per user
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        val acts = e.select(col("user_id").as("s"),
            expr("unix_micros(ts) div 604800000000").as("m"))
          .groupBy("s").agg(collect_set(col("m")).as("ms"))
        acts.select(explode(concat(
            transform(col("ms"), m => struct(m.as("m"),
              when(array_contains(col("ms"), m - 1), "RETAINED")
                .otherwise("NEW").as("status"))),
            transform(filter(col("ms"),
                m => !array_contains(col("ms"), m + 1)),
              m => struct((m + 1).as("m"),
                lit("CHURNED").as("status"))))).as("e"))
          .select(col("e.m").as("m"), col("e.status").as("status"))
          .groupBy("m", "status").agg(count(lit(1)).as("n"))
          .count()
      },
      "fifo" -> { k =>
        // per-user receipt ledgers (clicks receive, purchases consume):
        // running window + per-key consumption agg + equi-join back,
        // all on the user key — per-key history is k-invariant
        // (q177's pipeline shape)
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        val rec = e.filter(col("event_type") =!= "purchase")
          .select(col("user_id"), col("event_id"),
            (col("event_id") % 20 + 1).as("qty"))
        val con = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), (col("event_id") % 50 + 1).as("qty"))
        Fifo.remainingByReceipt(rec, con, "user_id", Seq("event_id"), "qty")
          .count()
      },
      "mannwhitney" -> { k =>
        // FIXED strata (event types) whose pooled samples grow k×: the
        // per-stratum rank sort is the k·log k axis — the intended
        // worst case for a rank statistic (more strata would instead
        // add parallelism; q179's pipeline)
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        RankStats.mannWhitney2U(
          e.select(col("event_type").as("st"),
            when(col("user_id") % 2 === 0, "A").otherwise("B").as("fl"),
            (col("event_id") % 100000).as("v")),
          "st", "fl", "v", "A", "B").count()
      },
      "drift" -> { k =>
        // k× users, per-user (day, event-type) histograms unchanged:
        // the counts agg and the (entity, bucket, p+1) self-join both
        // grow k× with disjoint keys — never k² (q178's pipeline)
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        Drift.l1Adjacent(
          e.select(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("p"),
            col("event_type").as("b")),
          "user_id", "p", "b").count()
      },
      "triples" -> { k =>
        // baskets = (user, day) with a 5-item type domain: per-basket
        // C(b,3) is constant, baskets grow k× — the triple generator's
        // linear axis (a wider item domain would instead grow the
        // combination count per basket; q182's pipeline)
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        Cooccur.frequentTriples(
          e.select((col("user_id") * 1024L +
              expr("unix_micros(ts) div 86400000000") % 1024).as("bk"),
            col("event_type").as("it")),
          "bk", "it", minSupport = 2L).count()
      },
      "pit" -> { k =>
        // k× users with identical per-user version/fact streams: the
        // union-tag as-of carry is one user-keyed window — per-key
        // history constant, keys k× (q181's pipeline)
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        val dims = Scd.intervals(
          e.filter(col("event_type") =!= "purchase")
            .select(col("user_id"), col("ts"), col("event_id"),
              col("event_type")),
          "user_id", "ts", "event_id", "event_type")
        Scd.pitJoin(
          e.filter(col("event_type") === "purchase")
            .select(col("user_id"), col("ts"), col("event_id")),
          dims, "user_id", "ts", "event_id", "valid_from", "value").count()
      },
      "qdigest" -> { k =>
        // k× rows into per-type q-digest buffers: map-side partial
        // aggregation carries ≤3·64 nodes per buffer, the shuffle's
        // key space stays |event_type| — linear scan, constant state
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        e.groupBy("event_type")
          .agg(QDigestAgg.qdigest((col("event_id") % 256).cast("long"),
            k = 64, levels = 8, probesPerMille = Seq(500, 950)).as("sk"))
          .count()
      },
      "countmin_agg" -> { k =>
        // the aggregate-buffer CMS twin of the countmin family: one
        // d·w grid per event_type buffer, cell-wise merge — shuffle
        // payload constant while the scan grows k×
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        e.groupBy("event_type")
          .agg(graft.operators.CountMinAgg.countmin(col("user_id"), w = 256,
            probes = Seq(1L, 2L, 3L, 5L)).as("sk"))
          .count()
      },
      // ---- Zipf-skew twins of the sketch aggregates: the uniform-key
      // families above don't stress the bounded-buffer claim where it
      // matters (hot keys). zipfKey is a DETERMINISTIC Zipf(~2) draw —
      // 1048576 div (uniform hash in [1, 2^20]) puts half the mass on
      // key 1, a quarter on key 2, … — so one key dominates every
      // buffer. The claim under test: buffers stay bounded (MG/CMS by
      // construction, q-digest by compression) and runtime stays linear
      // in the SCAN regardless of key concentration.
      "qdigest_zipf" -> { k =>
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        e.withColumn("zv", expr(
            "CAST(1048576 DIV (pmod(xxhash64(event_id), 1048576) + 1) AS LONG) % 256"))
          .groupBy("event_type")
          .agg(QDigestAgg.qdigest(col("zv"),
            k = 64, levels = 8, probesPerMille = Seq(500, 950)).as("sk"))
          .count()
      },
      "countmin_agg_zipf" -> { k =>
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        e.withColumn("zk", expr(
            "CAST(1048576 DIV (pmod(xxhash64(event_id), 1048576) + 1) AS LONG)"))
          .groupBy("event_type")
          .agg(graft.operators.CountMinAgg.countmin(col("zk"), w = 256,
            probes = Seq(1L, 2L, 3L, 5L)).as("sk"))
          .count()
      },
      "chunker" -> { k =>
        // pure row-local explode — should track the scan exactly
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
        graft.operators.Chunker.slidingChunks(d, "doc_id", "text", 40, 30).count()
      },
      "hll_registers" -> { k =>
        // per-type register vectors: constant 256-long output per group,
        // map-side combined — runtime tracks the scan
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        e.groupBy("event_type")
          .agg(graft.operators.HllAgg.hll_registers(col("user_id"), 8).as("r"))
          .count()
      },
      "kmv_overlap" -> { k =>
        // cloned users give k× distinct (type, user) pairs — the input-
        // sized distinct shuffle; everything after runs on ≤|types|·k
        // kept rows
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        graft.operators.Kmv.overlapComponents(e, "event_type", "user_id", 128)
          .count()
      },
      "gram" -> { k =>
        // fixed 2080-key groupBy under a k× scan; the D² fan-out is
        // row-local and partial aggregation collapses it map-side
        val em = spark.read.parquet(s"$scratch/k$k/embeddings.parquet")
        val x = em.select(col("vec_id"),
            posexplode(col("embedding")).as(Seq("i", "v")))
          .select(col("vec_id"), col("i").cast("long").as("i"),
            floor(col("v").cast("double") * 1000000d).cast("long").as("v"))
        x.as("a").join(x.as("b"),
            col("a.vec_id") === col("b.vec_id") && col("a.i") <= col("b.i"))
          .select(col("a.i").as("i"), col("b.i").as("j"),
            (col("a.v") * col("b.v")).as("p"))
          .groupBy("i", "j")
          .agg(sum(col("p").cast("decimal(38,0)")).cast("string").as("dot"))
          .count()
      },
      "repetition" -> { k =>
        // per-doc gram counting: salted copies have disjoint grams, so
        // the (doc, gram) shuffle key space grows k× with the scan —
        // linear, like bpe_pairs
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
        graft.operators.Repetition.docRepetition(d, "doc_id", "text").count()
      },
      "boilerplate" -> { k =>
        // gram→doc-frequency agg + broadcast semi join back; threshold
        // scales with nDocs so the boilerplate set stays corpus-fraction
        // sized
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
        graft.operators.Repetition.boilerplateCoverage(
          d, "doc_id", "text", n = 3, denom = 20).count()
      },
      "topk_zipf" -> { k =>
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        e.withColumn("zk", expr(
            "CAST(1048576 DIV (pmod(xxhash64(event_id), 1048576) + 1) AS LONG)"))
          .groupBy("event_type")
          .agg(graft.operators.MisraGriesAgg.misra_gries(
            col("zk").cast("string"), k = 8).as("mg"))
          .count()
      },
      "semdedup_assign" -> { k =>
        // the linear stage of SemDeDup: one explode + fixed-8-seed
        // broadcast join + two map-side-combined aggs. The within-
        // cluster pair join is measured by semdedup_pairs below with
        // k_seeds ∝ n (the paper's intended budget); at FIXED seeds
        // the verbatim-clone fixture would measure the degenerate
        // all-identical worst case, not the operator
        val em = spark.read.parquet(s"$scratch/k$k/embeddings.parquet")
        graft.operators.SemDedup.assignments(em, 8).count()
      },
      "selection" -> { k =>
        // q292: one histogram agg + ≤3 targeted bucket refines — the
        // driver walk is O(range/2^shift) scalars, corpus-independent
        val ev = spark.read.parquet(s"$scratch/k$k/events.parquet")
          .selectExpr("CAST(event_id % 10000000 AS LONG) AS v")
        graft.operators.Selection.globalProfile(spark, ev, "v").count()
      },
      "ks_stat" -> { k =>
        // q286: one (strata, v) count agg + a distinct-value-sized
        // cumulative window + a two-row argmax join — cost is the
        // token-count pass, linear in docs
        val docs = spark.read.parquet(s"$scratch/k$k/documents.parquet")
          .select((col("doc_id") % 5).cast("string").as("lang"),
            when(col("doc_id") % 2 === 0, "a").otherwise("b").as("side"),
            size(split(col("text"), " ", -1)).cast("long").as("v"))
        // release is the harness's per-run sweep — an in-body call
        // would land its cost inside this family's samples only
        graft.operators.RankStats
          .ksStat(docs, "lang", "side", "v", "a", "b").count()
      },
      "cms_join" -> { k =>
        // q289: two one-pass 4×64 sketches + a 256-row join — the
        // estimate side is corpus-linear with a constant-size shuffle
        val ev = spark.read.parquet(s"$scratch/k$k/events.parquet")
        val skA = graft.operators.CountMin.sketch(
          ev.filter(col("event_type") === "click"), col("user_id"), w = 64)
        val skB = graft.operators.CountMin.sketch(
          ev.filter(col("event_type") === "purchase"), col("user_id"), w = 64)
        graft.operators.CountMin.innerProduct(skA, skB).count()
      },
      "semdedup_pairs" -> { k =>
        // the PAIR stage under the scaladoc's "k_seeds is the scale
        // knob" claim, measured: seeds grow with the corpus (8·k over
        // k× vectors), so expected cluster size is constant — the
        // verbatim clones of an original vector all assign to its
        // cluster, and with seeds = 8·k the per-cluster DISTINCT
        // membership shrinks 1/k while copies multiply ×k, holding
        // |cluster| ≈ n₁/8. Total pair rows Σ|c|² ≈ (8k)·(n₁/8)² ∝ n.
        // Full report(): assignment + one-row-per-pair kernel join +
        // near-dup filter + the per-cluster rollup
        val em = spark.read.parquet(s"$scratch/k$k/embeddings.parquet")
        graft.operators.SemDedup.report(em, 8 * k, 9, 10).count()
      },
      "linkpred" -> { k =>
        // bfs's k×-users / fixed-hubs bipartite graph: hubs outgrow
        // the cap and stop being middles, users keep constant degree —
        // candidate pairs track Σ_{deg≤cap} deg² = users·const, linear
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        val pair = e.select(col("user_id").as("c"),
          (col("event_id") % 1000).as("s")).distinct()
        val edges = pair.select((col("c") * 2).as("src"), (col("s") * 2 + 1).as("dst"))
          .unionByName(pair.select((col("s") * 2 + 1).as("src"), (col("c") * 2).as("dst")))
        graft.operators.GraphStats.linkPrediction(edges, hubCap = 64, topK = 100)
          .count()
      },
      "importance" -> { k =>
        // two token scans; the vocab cap keeps the weight table at 512
        // rows regardless of the k× (salted, disjoint) token space, so
        // the broadcast join payload is constant
        val dd = spark.read.parquet(s"$scratch/k$k/documents.parquet")
        val v = graft.operators.Importance.vocabCounts(
          dd, "doc_id", "text", col("doc_id") % 2 === 0, 512)
        graft.operators.Importance.scores(dd, "doc_id", "text",
          graft.operators.Importance.weights(spark, v)).count()
      },
      "overlap" -> { k =>
        // synthetic sources spread clones; salted clones make grams
        // disjoint, so distinct (source, gram) grows with the scan and
        // per-gram join fan-out stays bounded by the source count
        val dd = spark.read.parquet(s"$scratch/k$k/documents.parquet")
          .withColumn("source", (col("doc_id") % 97).cast("string"))
        graft.operators.Repetition.crossSourceOverlap(dd, "source", "text", 5)
          .count()
      },
      "ref_coverage" -> { k =>
        // ref side = even doc ids (half the k× corpus); salted clones
        // keep gram spaces disjoint per copy, so the ref-distinct set
        // AND the eval gram stream both grow k× while per-gram join
        // fan-out stays ~1 — the gram-keyed equi join should be linear
        val dd = spark.read.parquet(s"$scratch/k$k/documents.parquet")
        graft.operators.Repetition.referenceCoverage(
          dd, "doc_id", "text", col("doc_id") % 2 === 0, 2).count()
      },
      "shard_balance" -> { k =>
        // row-local hash + one 16-group agg: the textbook linear scan
        val dd = spark.read.parquet(s"$scratch/k$k/documents.parquet")
          .withColumn("n_chars", length(col("text")).cast("long"))
        graft.operators.Curation.shardBalance(
          dd, "doc_id", "text", "n_chars", 16).count()
      },
      "minhash_calib" -> { k =>
        // q243: band-bucket candidates (no all-pairs term) + the
        // codegen'd sig_agree kernel + an L+1-group final agg. The sig
        // frame has THREE consumers inside minhashCalibration
        // (candidates + sig_a/sig_b join-backs) — persist or the UDF
        // signature chain recomputes per consumer (CACHE_POLICY rule 2)
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
        val sigs = Dedup.minhashSigs(d, "doc_id", "text").persist()
        try Dedup.minhashCalibration(sigs, bands = 16, rowsPerBand = 4).count()
        finally sigs.unpersist(blocking = false)
      },
      "lsh_sweep" -> { k =>
        // q250: ONE signature store banded three ways; per config the
        // candidates stay band-bucket-bounded, so three configs cost
        // three bounded passes over the same sigs (persisted — three
        // consumers — and released inside the timed body, rule 2 of
        // docs/CACHE_POLICY.md)
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
        val sigs = Dedup.minhashSigs(d, "doc_id", "text").persist()
        try {
          val sh = sigs.select(col("id"), col("sh"))
          Seq((32, 2), (16, 4), (8, 8)).map { case (b, r) =>
            Dedup.minhashCandidatesFromSigs(sigs, b, r)
              .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")),
                Seq("id_a"))
              .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")),
                Seq("id_b"))
              .select(when(size(array_intersect(col("sh_a"), col("sh_b"))) * 2
                  >= size(array_union(col("sh_a"), col("sh_b"))), 1L)
                .otherwise(0L).as("hit"))
              .agg(count(lit(1)).as("n_cands"), sum("hit").as("n_true"))
          }.reduce(_.unionByName(_)).count()
        } finally sigs.unpersist(blocking = false)
      },
      "split_rejoin" -> { k =>
        // q253: head/tail bridge keys df-capped ≤16 BOTH sides → join
        // fan-out ≤ maxDf² per key; word salting keeps copies' bridge
        // spaces disjoint, so the candidate answer grows ~k, not k²
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
        Repetition.splitRejoinCandidates(d, "doc_id", "text",
          k = 3, maxDf = 16).count()
      },
      "admission" -> { k =>
        // q252: corpus (4/5 of docs) collapses to DISTINCT hashes and
        // shuffles once on the hash — the append-only ingest gate's
        // claimed linear path
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
        Dedup.admissionFlags(d.filter(col("doc_id") % 5 =!= 0),
          d.filter(col("doc_id") % 5 === 0), "doc_id", "text").count()
      },
      "temperature_mix" -> { k =>
        // q245: the data-bound stage is the (lang, source) count scan;
        // the apportionment windows run over #groups rows (fixed 35
        // here — ids offset by 1e6 preserve %5/%7 group structure)
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
        val n = d.groupBy((col("doc_id") % 5).cast("string").as("lang"),
            (col("doc_id") % 7).cast("string").as("source"))
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("w",
            floor(sqrt(col("n_docs").cast("double")) * 1000).cast("long"))
        Apportion.largestRemainder(n, "lang", "source", "w", 100).count()
      },
      "quantile_bands" -> { k =>
        // q258: one rank window + one agg on the same 5-group key —
        // pure partition-parallel scan, expect ~linear
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
          .withColumn("g", (col("doc_id") % 5).cast("string"))
          .withColumn("v", length(col("text")).cast("long"))
        graft.operators.Robust.quantileBands(d, "g", "v", "doc_id").count()
      },
      "mix_schedule" -> { k =>
        // q259: output is Σ min(alloc, n) ≤ #groups·100 rows at ANY k
        // — the rank window scans everything once, the join side is
        // #groups×#sources, expect ~linear in the scan
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
          .withColumn("lang", (col("doc_id") % 5).cast("string"))
          .withColumn("source", (col("doc_id") % 7).cast("string"))
        val n = d.groupBy("lang", "source").agg(count(lit(1)).as("n_docs"))
          .withColumn("w",
            floor(sqrt(col("n_docs").cast("double")) * 1000).cast("long"))
        val alloc = Apportion.largestRemainder(n, "lang", "source", "w", 100)
          .select(col("lang"), col("source"), col("alloc"))
        graft.operators.Mixing.interleave(
          d, alloc, "lang", "source", "doc_id", "alloc", 100).count()
      },
      "pps_sample" -> { k =>
        // q260: two-level prefix scan — per-chunk windows + O(#chunks)
        // driver offsets (chunks grow k×, rows-per-chunk constant)
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
          .withColumn("w", length(col("text")).cast("long"))
        graft.operators.Sampling.ppsSystematic(
          d.select(col("doc_id"), col("w")), "doc_id", "w",
          target = 256, chunkWidth = 512L).count()
      },
      "rebalance" -> { k =>
        // q261: 17 row-local md5s per row + two ≤8-group aggs — the
        // textbook linear scan (shuffle width is the shard count)
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
        val out = graft.operators.Curation.rebalanceAudit(
          d, "doc_id", from = 8, to = 9)
        val n = out.count()
        graft.Caches.releaseAll(spark)
        n
      },
      "ktruss" -> { k =>
        // disjoint K4s over the k×-user id space: every edge support 2,
        // peel depth constant (one round + confirm), each round's
        // oriented wedge join grows with the edge count — linear
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        val nodes = e.select(col("user_id").as("n")).distinct()
          .withColumn("b", expr("n div 4"))
        val edges = nodes.as("a")
          .join(nodes.withColumnRenamed("n", "m").as("bb"), Seq("b"))
          .filter(col("n") < col("m"))
          .select(col("n").as("u"), col("m").as("v"))
        graft.operators.Truss.ktruss(edges, k = 4).count()
      },
      "interarrival" -> { k =>
        // q265: per-user lag window + profile agg + median rank pass,
        // all partitioned by user_id (users grow k×) — linear
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("tus"), col("event_id"))
        val gaps = e.select(col("user_id"),
            unix_micros(col("ts").cast("timestamp")).as("tus"), col("event_id"))
          .withColumn("gap", col("tus") - lag(col("tus"), 1).over(w))
          .filter(col("gap").isNotNull)
          .persist()
        try {
          val prof = gaps.groupBy("user_id")
            .agg(count(lit(1)).as("n_gaps"), min("gap").as("mn"),
              max("gap").as("mx"))
          val med = graft.operators.Robust
            .groupMedian(gaps, "user_id", "gap", "event_id")
          prof.join(med, "user_id").count()
        } finally gaps.unpersist(blocking = false)
      },
      "constraints" -> { k =>
        // q266: every row rule in ONE map-side-combined agg + a
        // count-distinct — two scans regardless of rule count
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
        graft.operators.Constraints.rowAudit(d, Seq(
            ("text_not_null", col("text").isNull),
            ("text_nonempty", length(col("text")) === 0),
            ("id_positive", col("doc_id") < 0)))
          .unionByName(graft.operators.Constraints.uniqueAudit(
            d, "doc_id_unique", Seq("doc_id")))
          .count()
      },
      "incremental_audit" -> { k =>
        // q267: row rules additive (one agg pass per side), uniqueness
        // via the standing DISTINCT-key index + delta anti join — the
        // q252 append-only shape, linear in the corpus
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
        val snap = d.filter(col("doc_id") % 10 =!= 0)
        val delta = d.filter(col("doc_id") % 10 === 0)
        val rules = Seq(("nonempty", length(col("text")) === 0))
        val sc = snap.agg(count(lit(1)), count_distinct(col("text"))).head()
        graft.operators.Constraints.mergeReports(
            graft.operators.Constraints.rowAudit(snap, rules),
            graft.operators.Constraints.rowAudit(delta, rules))
          .unionByName(graft.operators.Constraints.uniqueMerge(
            snap.select("text").distinct(), sc.getLong(0), sc.getLong(1),
            delta, "text", "uniq"))
          .count()
      },
      "theil_sen" -> { k =>
        // q268: pairs are months² — CONSTANT as rows grow (ord is
        // calendar-granular by contract); the k× cost is the monthly
        // pre-aggregation scan
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        val monthly = e.groupBy(col("event_type").as("g"),
            (col("event_id") % 64).as("oi"))
          .agg(sum(col("user_id") % 1000).as("vi"))
        graft.operators.Robust.theilSenScaled(monthly, "g", "oi", "vi",
          scale = 1000L, shift = 1000000000L).count()
      },
      "embedding_drift" -> { k =>
        // q262: assignment is semdedup_assign's linear stage; the
        // drift arithmetic runs over a k_seeds-row frame (released
        // inside the timed body — CACHE_POLICY rule 2)
        val em = spark.read.parquet(s"$scratch/k$k/embeddings.parquet")
        val n = graft.operators.SemDedup.clusterDrift(
          em, 8, col("vec_id") % 2 === 1).count()
        graft.Caches.releaseAll(spark)
        n
      },
      "linkage" -> { k =>
        // q263: candidates from the blocking equi-join only — a
        // SALTED high-cardinality block key keeps block sizes O(1) as
        // the corpus grows (the production blocking discipline), so
        // pairs grow ~k
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
          .select(col("doc_id").as("id"),
            (col("doc_id") % (2000L * k)).as("blk"),
            substring(col("text"), 1, 16).as("name"),
            length(col("text")).as("phone"))
        graft.operators.Linkage.scorePairs(
          d, d.withColumn("id", col("id") + 10000000L),
          Seq("blk"), "id",
          Seq(("name", 10L, 5L), ("phone", 10L, 5L)), 0L, 15L).count()
      },
      "bigram_lm" -> { k =>
        // q269: model tables grow with the salted vocabulary (~k), the
        // pair stream ~k, both joins gram-keyed equi — linear
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
        graft.operators.Retrieval.bigramLmScores(d, "doc_id", "text")
          .count()
      },
      "attribution" -> { k =>
        // q270: users are CLONED (timestamps unchanged), so per-user
        // touch×conversion structure is constant and chunked-range-join
        // candidates grow ~k; windows partition by conv_id
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
          .withColumn("ts", col("ts").cast("timestamp"))
        graft.operators.Attribution.positionCredits(
          e, horizonMs = 604800000L).count()
      },
      "decayed_counts" -> { k =>
        // q271: row-local shift ladder + 1-row max broadcast + one
        // 5-group agg — the textbook linear scan
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
          .withColumn("ts", col("ts").cast("timestamp"))
        graft.operators.Decay.halfLifeWeights(e, Seq("event_type"))
          .groupBy("event_type").agg(sum("wt").as("d")).count()
      },
      "quantile_norm" -> { k =>
        // q273: two rank-window passes (5-lang partitions grow k×
        // rows each) + the union-tag as-of shuffle + one join back —
        // all lang/source-partitioned, expect ~linear
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
          .withColumn("lang", (col("doc_id") % 5).cast("string"))
          .withColumn("source", (col("doc_id") % 7).cast("string"))
          .withColumn("v", length(col("text")).cast("long"))
        graft.operators.Robust.quantileNormalize(
          d, "lang", "source", "v", "doc_id").count()
      },
      "interval_overlap" -> { k =>
        // q280: both sides explode to ≤2 chunks, join on (user, chunk)
        // with the first-shared-chunk residual; cloned users keep
        // per-key density constant → candidates ~k
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
          .withColumn("ms", expr("unix_micros(cast(ts as timestamp)) div 1000"))
        val a = e.filter(col("event_type") === "view")
          .select(col("user_id").as("kk"), col("event_id").as("aid"),
            col("ms").as("s"), (col("ms") + 600000L).as("e"))
        val b = e.filter(col("event_type") === "click")
          .select(col("user_id").as("kk"), col("event_id").as("bid"),
            col("ms").as("s2"), (col("ms") + 600000L).as("e2"))
        graft.operators.RangeJoin.intervalOverlap(
          a, b, "kk", "s", "e", "s2", "e2", chunkWidth = 600000L).count()
      },
      "weighted_jaccard" -> { k =>
        // q281: df-capped bigram posting join (Σ df² contract) + one
        // per-doc size agg; salted copies keep posting spaces disjoint
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
        graft.operators.SparseSim.weightedJaccardComponents(
          d, "doc_id", "text", maxDf = 16L, minShared = 2L).count()
      },
      "densest_peel" -> { k =>
        // q282: disjoint K4s — constant peel depth, per-round degree
        // count + semi joins scan the k×-growing edge list
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        val nodes = e.select(col("user_id").as("n")).distinct()
          .withColumn("b", expr("n div 4"))
        val edges = nodes.as("a")
          .join(nodes.withColumnRenamed("n", "m").as("bb"), Seq("b"))
          .filter(col("n") =!= col("m"))
          .select(col("n").as("src"), col("m").as("dst"))
        graft.operators.Densest.peelProfile(edges).count()
      },
      "active_users" -> { k =>
        // q277: (user, day) distinct + BOUNDED 7-day explode + one
        // count-distinct per day — fanout is a constant 7×, linear
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
          .withColumn("ts", col("ts").cast("timestamp"))
        val ud = e.select(col("user_id"),
          expr("unix_micros(ts) div 86400000000L").as("day")).distinct()
        ud.withColumn("tday",
            explode(sequence(col("day"), col("day") + 6)))
          .groupBy("tday")
          .agg(count_distinct(col("user_id")).as("wau")).count()
      },
      "pseudo_diameter" -> { k =>
        // q274: disjoint K4s over the k×-user id space — constant
        // depth (2 sweeps × 2 rounds), per-round frontier join grows
        // with the edge count
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        val nodes = e.select(col("user_id").as("n")).distinct()
          .withColumn("b", expr("n div 4"))
        val edges = nodes.as("a")
          .join(nodes.withColumnRenamed("n", "m").as("bb"), Seq("b"))
          .filter(col("n") =!= col("m"))
          .select(col("n").as("src"), col("m").as("dst"))
        graft.operators.GraphStats.pseudoDiameter(edges).count()
      },
      "kcenter" -> { k =>
        // q294: FIXED 8 Gonzalez rounds; each is one scan + a
        // TakeOrdered(1) reduce, so data cost is 8 linear passes and
        // the driver term is 8 one-row collects
        val em = spark.read.parquet(s"$scratch/k$k/embeddings.parquet")
        graft.operators.Coreset.kcenter(em, 8).count()
      },
      "knn_shapley" -> { k =>
        // q295: the probe panel filter keeps |T| = 24 at every k
        // (clone ids are offset ≥ 10⁶, so only copy 0 matches
        // vec_id < 600) — pairs grow n·|T| ∝ n, the per-test windows
        // sort n rows × 24 fixed partitions
        val em = spark.read.parquet(s"$scratch/k$k/embeddings.parquet")
          .withColumn("label", (col("vec_id") % 10).cast("int"))
        graft.operators.Valuation.knnShapley(em,
          col("vec_id") % 25 === 0 && col("vec_id") < 600, 5).count()
      },
      "four_cycles" -> { k =>
        // q297: per-copy disjoint hub space (hub id salted by the
        // event_id copy offset), so the k× fixture is k independent
        // graphs — wedge volume Σdeg² grows linearly, not k²
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
        val pair = e.select(col("user_id").as("u"),
          (col("event_id") % 1000 +
            expr("event_id div 100000000L") * 10000L).as("s")).distinct()
        val edges = pair.select((col("u") * 2).as("a"), (col("s") * 2 + 1).as("b"))
          .distinct()
        graft.operators.GraphStats.fourCycles(edges).count()
      },
      "kruskal_wallis" -> { k =>
        // q296: one stratum-partitioned rank sort over k× rows + a
        // distinct-value tie agg — n log n per stratum
        val e = spark.read.parquet(s"$scratch/k$k/events.parquet")
          .select(col("event_type").as("st"),
            (col("user_id") % 5).cast("string").as("g"),
            (col("event_id") % 100000).as("v"))
        graft.operators.RankStats.kruskalWallis(e, "st", "g", "v").count()
      },
      "neyman" -> { k =>
        // q298: one stratum agg + stratum-partitioned selection
        // windows; strata count fixed (97), rows per stratum grow k×
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
          .select((col("doc_id") % 5).cast("string").as("g"),
            (col("doc_id") % 97).cast("string").as("st"),
            col("doc_id"), length(col("text")).cast("long").as("x"))
        graft.operators.Sampling.neymanSelect(
          d, "g", "st", "doc_id", "x", 100).count()
      },
      "bpe_train" -> { k =>
        // q309: 3 rounds × (map-side-combined pair count + 1-row argmax
        // + row-local merge) — cost is rounds corpus scans; the salted
        // copies k× the pair vocabulary (shuffle carries distinct
        // pairs) while per-round work stays linear in tokens
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
        graft.operators.Bpe.trainMerges(d, "text", rounds = 3).count()
      },
      "url_canon" -> { k =>
        // q311: row-local string canonicalization + ONE canonical-key
        // groupBy — the shuffle carries distinct canonical URLs
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
          .select(col("doc_id"), concat(
            when(col("doc_id") % 2 === 0, "http://").otherwise("https://"),
            when(col("doc_id") % 3 === 0, "www.").otherwise(""),
            lit("h"), (col("doc_id") % 10).cast("string"),
            lit(".example.com/d/"), expr("doc_id div 40").cast("string"),
            when(col("doc_id") % 5 === 0, "/").otherwise(""),
            when(col("doc_id") % 4 < 2, "?b=2&a=1").otherwise("?a=1&b=2"))
            .as("url"))
        graft.operators.UrlCanon.firstWins(d, "url", "doc_id").count()
      },
      "jl_project" -> { k =>
        // q314's projection stage: row-local 16-plane dot folds — a
        // pure map; the agg forces pj against column pruning
        val em = spark.read.parquet(s"$scratch/k$k/embeddings.parquet")
        graft.operators.RandomProjection.projectQuantized(
            em, graft.operators.Dedup.hyperplanes(64, 16))
          .agg(sum(element_at(col("pj"), 1))).collect().length.toLong
      },
      "inverted_build" -> { k =>
        // q315's segment build: one posexplode scan + the bucket
        // shuffle (groupBy forces it; the write itself is I/O-bound)
        val d = spark.read.parquet(s"$scratch/k$k/documents.parquet")
        graft.operators.InvertedIndex.postings(d, "doc_id", "text")
          .groupBy("bucket").count().count()
      },
    )

    // dev-only family filter (SPARK_GRAFT_SCALE_ONLY=bfs,components_star)
    // for single-family tuning; the round sweep never sets it
    val only = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val picked = families.filter { case (n, _) => only.forall(_.contains(n)) }

    // warmup: session + codegen
    spark.range(1000000L).selectExpr("sum(id)").collect()
    picked.foreach { case (_, fn) => fn(scales.head) }
    Caches.releaseAll(spark) // timed runs all start cold-cache

    // Locale.ROOT like Bench.f3: the f-interpolator is locale-sensitive
    // and a comma-decimal locale would emit invalid JSON
    def fmt(v: Double, dec: Int): String =
      s"%.${dec}f".formatLocal(java.util.Locale.ROOT, v)
    // SPARK_GRAFT_PARTS_PER_K=p: scale shuffle partitions WITH the data
    // (max(cpus, p·k) for the k× fixture) instead of the harness's fixed
    // `cpus`. This is the knob a real cluster turns (AQE's
    // initialPartitionNum / dynamic allocation) — the fixed-32 default
    // deliberately measures the SMALL-cluster worst case, which makes
    // the top decade of the shuffle-heaviest families spill (r11: ~15M
    // rows/partition at k64). The round-12 decade re-runs record alpha
    // under parts ∝ k, turning the "it's the partitioning, not the
    // plan" prose into a measurement (BASELINE.md round-12).
    val partsPerK = sys.env.get("SPARK_GRAFT_PARTS_PER_K").map(_.toInt)
    var worst = ("", 0.0)
    val lines = picked.map { case (name, fn) =>
      // same per-run cache hygiene as Bench (docs/CACHE_POLICY.md rule
      // 3): without the sweep, runs 2..n of a persist-heavy family
      // reuse run 1's caches (CacheManager dedupes by logical plan)
      // and the measured growth is the warm path, not the operator's
      val ts = scales.map { k =>
        partsPerK.foreach { p =>
          spark.conf.set("spark.sql.shuffle.partitions",
            math.max(cpus.toInt, p * k).toString)
        }
        k -> median((1 to runs).map { _ =>
          val t = time(fn(k)); Caches.releaseAll(spark); t
        })
      }
      partsPerK.foreach(_ => spark.conf.set("spark.sql.shuffle.partitions", cpus))
      val a = alpha(ts.map(_._1), ts.map(_._2))
      if (a > worst._2) worst = (name, a)
      val tsJson = ts.map { case (k, t) => s""""k$k":${fmt(t, 3)}""" }.mkString(",")
      val partsJson = partsPerK.map(p => s""","parts_per_k":$p""").getOrElse("")
      s"""{"family":"$name","alpha":${fmt(a, 2)},$tsJson,"runs":$runs$partsJson}"""
    }
    spark.sparkContext.setLogLevel("ERROR")
    lines.foreach(println)
    println(s"""{"metric":"scale_alpha_max","family":"${worst._1}","value":${fmt(worst._2, 2)},"limit":$alphaMax,"scales":"${scales.mkString(",")}"}""")
    spark.stop()
    if (worst._2 > alphaMax) sys.exit(1)
  }
}
