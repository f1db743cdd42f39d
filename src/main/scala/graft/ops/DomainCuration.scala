package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Domain-level corpus curation — the URL-keyed gate of a web-crawl
  * pipeline (CommonCrawl-style): extract the host from each
  * document's URL, audit per-domain volume, and cap documents per
  * domain so no single site dominates the training mixture (the
  * standard defense against SEO farms and boilerplate-heavy hosts).
  *
  * Scale shape: host extraction is a zero-shuffle narrow regexp map;
  * stats are one domain-keyed partial-agg shuffle; the cap is one
  * (domain)-keyed ranked window with a deterministic hash order —
  * the A42 rate-limit shape, bounded by per-domain counts, never a
  * global sort. Domains are a natural heavy-hitter skew source: at
  * 100 TB pair the stats pass with C23's Misra-Gries to find the
  * whales cheaply, and AQE's skew handling covers the cap window.
  */
object DomainCuration {

  /** Host component of a `scheme://host/...` URL, scheme case-
    * insensitive ('' if no match — identically in the DuckDB twin's
    * regexp_extract).
    */
  def host(url: Column): Column =
    regexp_extract(url, "^[a-zA-Z]+://([^/]+)", 1)

  /** Per-domain audit: (domain, n_docs, n_chars, first_doc). */
  def domainStats(df: DataFrame, url: Column, id: Column, chars: Column): DataFrame =
    df.select(host(url).as("domain"), id.cast("bigint").as("doc_id"),
        chars.cast("bigint").as("n"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_chars"),
        min(col("doc_id")).as("first_doc"))

  /** Canonicalize a URL for dedup keys (the crawl-frontier device:
    * raw URLs differ in case/tracking noise while naming one page):
    * fragment stripped, scheme+host lowercased (path case kept —
    * significant on most servers), `utm_*` tracking params removed
    * (a dangling leading `&` re-anchored to `?`, bare trailing `?`
    * dropped), trailing slashes dropped. Pure regexp chain — a
    * zero-shuffle narrow map, identical semantics in the twin.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    // URLs without a scheme://host shape pass through un-lowered:
    // collapsing every malformed/relative URL onto one key would
    // declare them all duplicates of each other
    val lowered = when(regexp_extract(noFrag, "^([a-zA-Z]+)://", 1) === "", noFrag)
      .otherwise(concat(
        lower(regexp_extract(noFrag, "^([a-zA-Z]+)://", 1)), lit("://"),
        lower(regexp_extract(noFrag, "^[a-zA-Z]+://([^/?#]+)", 1)),
        regexp_extract(noFrag, "^[a-zA-Z]+://[^/?#]+(.*)$", 1)))
    // rebuild the query string from its parts rather than patching
    // with replaces: split on '&', drop utm_* params wherever they
    // sit, rejoin — '&' in a query-less path is never touched
    val base = regexp_replace(lowered, "\\?.*$", "")
    val params = filter(split(regexp_extract(lowered, "\\?(.*)$", 1), "&"),
      p => !p.rlike("^utm_"))
    val rebuilt = when(array_join(params, "&") === "", base)
      .otherwise(concat(base, lit("?"), array_join(params, "&")))
    regexp_replace(rebuilt, "/+$", "")
  }

  /** SQL twin of [[canonicalizeUrl]] over `urlExpr` (DuckDB regexp
    * dialect: explicit 'g' for global, list_filter for the query
    * rebuild).
    */
  def canonicalizeUrlSql(urlExpr: String): String = {
    val noFrag = s"regexp_replace($urlExpr, '#.*$$', '')"
    val lowered = "(CASE WHEN regexp_extract(" + noFrag + ", '^([a-zA-Z]+)://', 1) = '' THEN " + noFrag +
      " ELSE lower(regexp_extract(" + noFrag + ", '^([a-zA-Z]+)://', 1)) || '://' || " +
      "lower(regexp_extract(" + noFrag + ", '^[a-zA-Z]+://([^/?#]+)', 1)) || " +
      "regexp_extract(" + noFrag + ", '^[a-zA-Z]+://[^/?#]+(.*)$', 1) END)"
    val base = s"regexp_replace($lowered, '\\?.*$$', '')"
    // coalesce: DuckDB's array_to_string over an EMPTY list (every
    // param filtered away) returns NULL, not '' — Spark's array_join
    // returns ''
    val joined = s"coalesce(array_to_string(list_filter(string_split(regexp_extract($lowered, '\\?(.*)$$', 1), '&'), " +
      "p -> NOT regexp_matches(p, '^utm_')), '&'), '')"
    val rebuilt = s"(CASE WHEN $joined = '' THEN $base ELSE $base || '?' || $joined END)"
    s"regexp_replace($rebuilt, '/+$$', '')"
  }

  /** Dedup by canonical URL: (canonical_url, n_docs, kept_doc) per
    * canonical key, keep-smallest survivor. The SHUFFLE key is the
    * 60-bit md5 of the canonical string, not the string itself — URL
    * keys average ~80 bytes and a 100 TB crawl shuffles billions of
    * them, so hashing first cuts the exchange payload ~10× and keeps
    * every downstream comparator fixed-width; the canonical string
    * rides as a min-aggregated payload column. A 60-bit collision
    * (≳2^30 distinct URLs for a 50% birthday chance) merges the two
    * colliding keys identically in the twin (same md5 prefix device),
    * so the oracle still matches bit-for-bit.
    */
  def urlDedup(df: DataFrame, url: Column, id: Column): DataFrame =
    df.select(canonicalizeUrl(url).as("canonical_url"), id.cast("bigint").as("doc_id"))
      .groupBy(Dedup.md5Hash60(col("canonical_url")).as("url_key"))
      .agg(min(col("canonical_url")).as("canonical_url"),
        count(lit(1)).as("n_docs"), min(col("doc_id")).as("kept_doc"))
      .select(col("canonical_url"), col("n_docs"), col("kept_doc"))

  /** Keep at most `maxDocs` documents per domain, chosen by the
    * engine-portable hash rank (deterministic under any partitioning
    * — not arrival order, which is engine-private). Returns
    * (domain, doc_id) kept rows.
    */
  def capPerDomain(df: DataFrame, url: Column, id: Column, maxDocs: Int): DataFrame = {
    require(maxDocs >= 1)
    val w = Window.partitionBy(col("domain"))
      .orderBy(col("hrank"), col("doc_id"))
    df.select(host(url).as("domain"), id.cast("bigint").as("doc_id"))
      .withColumn("hrank", Dedup.md5Hash60(col("doc_id").cast("string")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= maxDocs)
      .select(col("domain"), col("doc_id"))
  }
}
