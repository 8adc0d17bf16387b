package graft.federate

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Multi-source federation: fan-out, per-source limits, heterogeneous
  * union, stats, fair-quota application, and ordered dedup.
  *
  * Reference lifecycle (SURVEY §3.2, Optimade_Server/server.py:97-198):
  * per-provider fetch with max_results_per_provider → gather with
  * exception tolerance → stats per (clause, url) → quota plan →
  * first-provider-wins dedup by id → truncation.
  *
  * Spark mapping / scale design:
  *  - each source is a DataFrame; "fan-out" is one unionByName plan, so all
  *    sources scan in parallel across the cluster (no driver-side loop);
  *  - per-source failure tolerance substitutes an empty frame (O1/O2)
  *    without failing the query;
  *  - stats are a groupBy().count() — a few rows per source on the driver;
  *  - the quota plan is applied distributively: row_number() window per
  *    (provider, url) + broadcast-joined quota + rank filter, shuffling
  *    once on the window key;
  *  - ordered dedup is a window over id ordered by provider precedence —
  *    deterministic "first provider wins" (D1) instead of dropDuplicates'
  *    arbitrary survivor.
  */
object Federation {

  /** A federated source: precedence = position in the registry. */
  final case class Source(provider: String, url: String, load: () => DataFrame)

  final case class FanOutResult(data: DataFrame, failures: Seq[(String, String)])

  /** Fan out over sources, tolerating per-source failures; each source is
    * tagged with provider/url/precedence columns and per-source limited
    * (limit pushdown ≡ max_results_per_provider, T4). When `orderCol` is
    * given the limit is an ordered top-k (TakeOrderedAndProject per
    * source) — deterministic, unlike a bare limit's arbitrary rows.
    *
    * Failure tolerance layers: load()/analysis errors are always caught
    * per source. With `probeSources = true`, each source additionally
    * runs a 1-row execution probe, so sources that analyze fine but die
    * at RUNTIME (corrupt file, dead connection) are also quarantined
    * into `failures` instead of failing the whole union job later — the
    * reference's per-provider fetch tolerance
    * (Optimade_Server/server.py:130-147). Cost: one tiny Spark job per
    * source; leave it off when sources are trusted local parquet and the
    * single-plan scan parallelism matters more. */
  def fanOut(spark: SparkSession, sources: Seq[Source],
             filter: Option[Column] = None,
             perSourceLimit: Option[Int] = None,
             orderCol: Option[String] = None,
             probeSources: Boolean = false): FanOutResult = {
    val failures = Seq.newBuilder[(String, String)]
    val frames = sources.zipWithIndex.flatMap { case (s, rank) =>
      try {
        val base = s.load()
        if (probeSources) base.limit(1).collect()
        val filtered = filter.fold(base)(base.filter)
        val ordered = orderCol.filter(_ => perSourceLimit.isDefined)
          .fold(filtered)(c => filtered.orderBy(col(c)))
        val limited = perSourceLimit.fold(ordered)(ordered.limit)
        Some(limited
          .withColumn("provider", lit(s.provider))
          .withColumn("provider_url", lit(s.url))
          .withColumn("provider_rank", lit(rank)))
      } catch {
        case e: Exception =>
          failures += ((s"${s.provider}@${s.url}", e.getMessage))
          None
      }
    }
    val unioned = frames.reduceLeftOption(
      (a, b) => a.unionByName(b, allowMissingColumns = true))
      .getOrElse(spark.emptyDataFrame)
    FanOutResult(unioned, failures.result())
  }

  /** A7: observed counts per (provider, url) — the input to the planner.
    * Counts are capped at `capPerUrl` when given, matching the reference's
    * stats which observe at most max_results_per_provider rows per URL.
    * Providers are ordered by PRECEDENCE (min provider_rank, the registry
    * order fanOut stamped), not alphabetically — the quota planner's
    * leftover-distribution walks providers in order, so alphabetical
    * ordering silently re-prioritized sources. */
  def stats(df: DataFrame, capPerUrl: Option[Int] = None): QuotaPlanner.Stats = {
    require(df.columns.contains("provider_rank"),
      "stats expects a fanOut-tagged frame (provider_rank column)")
    val rows = df.groupBy("provider", "provider_url")
      .agg(count(lit(1)).as("n"), min(col("provider_rank")).as("rank"))
      .orderBy(col("rank"), col("provider_url"))
      .collect()
    val byProvider = scala.collection.mutable.LinkedHashMap
      .empty[String, Vector[(String, Int)]]
    rows.foreach { r =>
      val n = r.getLong(2).toInt
      val capped = r.getString(1) -> capPerUrl.fold(n)(math.min(n, _))
      byProvider.updateWith(r.getString(0)) {
        case Some(us) => Some(us :+ capped)
        case None     => Some(Vector(capped))
      }
    }
    byProvider.toSeq.map { case (p, us) => p -> us.toSeq }
  }

  /** Apply a quota plan distributively: rank rows within each
    * (provider, url) by `orderCol` and keep rank ≤ quota. */
  def applyPlan(df: DataFrame, plan: QuotaPlanner.Plan, orderCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val quotaDf = broadcast(
      plan.flatMap { case (p, us) => us.map { case (u, q) => (p, u, q) } }
        .toDF("provider", "provider_url", "quota"))
    val w = Window.partitionBy("provider", "provider_url").orderBy(col(orderCol))
    df.withColumn("__rank", row_number().over(w))
      .join(quotaDf, Seq("provider", "provider_url"))
      .filter(col("__rank") <= col("quota"))
      .drop("__rank", "quota")
  }

  /** D1: deterministic cross-source dedup — first provider (lowest
    * precedence rank) wins; ties inside a provider broken by `orderCol`. */
  def dedupById(df: DataFrame, idCol: String, orderCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("provider_rank"), col(orderCol))
    df.withColumn("__dd", row_number().over(w))
      .filter(col("__dd") === 1)
      .drop("__dd")
  }

  final case class FederatedResult(data: DataFrame, stats: QuotaPlanner.Stats,
                                   plan: QuotaPlanner.Plan,
                                   failures: Seq[(String, String)])

  /** Full federated query: fan-out → stats → fair plan → distributed
    * application → ordered dedup → global truncation (T3). */
  def federatedQuery(spark: SparkSession, sources: Seq[Source],
                     filter: Option[Column], nResults: Int,
                     idCol: String, orderCol: String,
                     maxReturned: Int = 30): FederatedResult = {
    val fo = fanOut(spark, sources, filter,
      perSourceLimit = Some(nResults), orderCol = Some(orderCol))
    if (fo.data.columns.isEmpty)
      return FederatedResult(fo.data, Seq.empty, Seq.empty, fo.failures)
    val st = stats(fo.data, capPerUrl = Some(nResults))
    val plan = QuotaPlanner.distributeQuotaFair(st, nResults)
    val planned = applyPlan(fo.data, plan, orderCol)
    val deduped = dedupById(planned, idCol, orderCol)
    FederatedResult(
      deduped.orderBy(col("provider_rank"), col(orderCol)).limit(maxReturned),
      st, plan, fo.failures)
  }
}
