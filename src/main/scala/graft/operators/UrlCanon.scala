package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + per-canonical-URL first-wins dedup — the
  * Common-Crawl-style curation gate that runs BEFORE any content
  * hashing: the same page is typically crawled under many surface forms
  * (http/https, www., trailing slash, query-param order), and collapsing
  * them is a pure string normalization, no content reads at all. The
  * string-key analog of q35's content fingerprinting; the reference's
  * closest surface is provider-URL normalization in its federation layer
  * (optimade_database/Optimade_Server/utils.py:253-384 keys quotas by
  * provider URL strings).
  *
  * Canonical form (all engine-neutral ASCII string ops, mirrored
  * operation-for-operation by the DuckDB oracle):
  *  1. split off the query string at the first '?';
  *  2. strip a leading `http://`/`https://` scheme, then a leading
  *     `www.`;
  *  3. strip one trailing '/' from the path part;
  *  4. sort the '&'-separated query params byte-lexicographically and
  *     rejoin (param ORDER never distinguishes pages; param SET does).
  *
  * Scale shape: canonicalization is row-local codegen'd string work (no
  * UDF); the dedup is ONE groupBy on the canonical key — map-side
  * combined, shuffle bounded by distinct canonical URLs. First-wins =
  * min(id), the deterministic survivor rule shared with exact dedup
  * (q36). */
object UrlCanon {

  /** Canonical form of a URL column (see object scaladoc for the four
    * normalization steps). */
  def canonicalUrl(url: Column): Column = {
    val hostpath = regexp_replace(
      regexp_replace(expr_part(url, 1), "^https?://", ""), "^www\\.", "")
    val params = expr_part(url, 2)
    val cleanPath = regexp_replace(hostpath, "/$", "")
    val sortedParams = array_join(array_sort(split(params, "&")), "&")
    concat(cleanPath,
      when(params === "", lit("")).otherwise(concat(lit("?"), sortedParams)))
  }

  // split_part(url, '?', n): n=1 path side, n=2 query side ('' if none)
  private def expr_part(url: Column, part: Int): Column =
    split_part(url, lit("?"), lit(part))

  /** Per-canonical-URL groups: (canon, n_urls, n_variants = distinct
    * RAW forms, keeper = min id — first-wins). One row per canonical
    * URL; callers filter n_urls > 1 for the dup report or join keeper
    * back for the survivor set. */
  def firstWins(df: DataFrame, urlCol: String, idCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("_id"), col(urlCol).as("_url"))
      .withColumn("canon", canonicalUrl(col("_url")))
      .groupBy("canon")
      .agg(count(lit(1)).as("n_urls"),
        count_distinct(col("_url")).as("n_variants"),
        min(col("_id")).as("keeper"))
}
