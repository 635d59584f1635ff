package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Crawl-side URL hygiene: canonicalization + URL-level dedup — the
  * cheapest first pass of a web-scale training pipeline. Deduping by
  * canonical URL costs one hash aggregation over a short-string key and
  * typically removes a third of a raw crawl before any text is parsed,
  * so at 100 TB it runs BEFORE content dedup ever sees a byte of body
  * text. Reference scope: extension beyond the cascading surface (no
  * URL ops upstream); the canonical rules are the common subset of the
  * crawl literature (lowercase scheme/host, default-port and fragment
  * and tracking-param stripping, sorted query).
  */
object Web {

  /** Query params dropped during canonicalization: analytics/tracking
    * noise that never changes the fetched content. Prefix match for
    * `utm_` (utm_source/medium/campaign/...), exact-key match for the
    * rest. */
  val TrackingPrefixes: Seq[String] = Seq("utm_", "gclid=", "fbclid=")

  /** Canonicalize a well-formed absolute http(s) URL — one pure Column
    * composition (no UDF, one scan):
    *  - fragment (`#...`) dropped
    *  - scheme and host lowercased; leading `www.` stripped
    *  - default ports stripped (`:80` for http, `:443` for https)
    *  - trailing `/` of the path dropped (so `/p/` ≡ `/p`)
    *  - query: tracking params ([[TrackingPrefixes]]) and empty params
    *    removed, the rest SORTED (param order never changes content)
    *
    * Assumes one `://` and a host terminated by `/`, `?` or end —
    * the grammar crawl frontiers emit; not a general RFC 3986 parser. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    val scheme = lower(substring_index(noFrag, "://", 1))
    val rest = substring_index(noFrag, "://", -1)
    val hostPort = substring_index(substring_index(rest, "/", 1), "?", 1)
    val pathq = substr(rest, length(hostPort) + 1, length(rest))
    val hostLc = regexp_replace(lower(hostPort), "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(hostLc, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostLc, ":443$", ""))
      .otherwise(hostLc)
    val path = regexp_replace(substring_index(pathq, "?", 1), "/$", "")
    val query = when(pathq.contains("?"), substring_index(pathq, "?", -1))
      .otherwise(lit(""))
    val kept = array_sort(filter(split(query, "&"), p =>
      p =!= "" && !TrackingPrefixes
        .map(t => startswith(p, lit(t))).reduce(_ || _)))
    concat(scheme, lit("://"), host, path,
      when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
        .otherwise(lit("")))
  }

  /** URL-level dedup: group by canonical URL, keep the minimum id (the
    * q24 exact-dedup contract). Output (canon_url, keep_id, n_dups) —
    * one hash aggregation on a uniform short key, no skew risk beyond
    * what AQE already splits. */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol).as("id"), canonicalizeUrl(col(urlCol)).as("canon_url"))
      .groupBy(col("canon_url"))
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("n_dups"))

  /** DuckDB spelling of [[canonicalizeUrl]] over a URL expression —
    * generated next to the Spark form so the two cannot drift. */
  def oracleCanonicalUrl(urlExpr: String): String = {
    val noFrag = s"split_part($urlExpr, '#', 1)"
    val scheme = s"lower(split_part($noFrag, '://', 1))"
    val rest = s"split_part($noFrag, '://', 2)"
    val hostPort = s"split_part(split_part($rest, '/', 1), '?', 1)"
    val pathq = s"substr($rest, length($hostPort) + 1)"
    val hostLc = s"regexp_replace(lower($hostPort), '^www\\.', '')"
    val host = s"""CASE WHEN $scheme = 'http'
      THEN regexp_replace($hostLc, ':80$$', '')
      WHEN $scheme = 'https' THEN regexp_replace($hostLc, ':443$$', '')
      ELSE $hostLc END"""
    val path = s"regexp_replace(split_part($pathq, '?', 1), '/$$', '')"
    val query = s"CASE WHEN contains($pathq, '?') " +
      s"THEN split_part($pathq, '?', 2) ELSE '' END"
    val keptPred = TrackingPrefixes
      .map(t => s"NOT starts_with(p, '$t')").mkString(" AND ")
    val kept = s"list_sort(list_filter(string_split($query, '&'), " +
      s"p -> p <> '' AND $keptPred))"
    s"""($scheme || '://' || $host || $path ||
       |  CASE WHEN len($kept) > 0
       |       THEN '?' || array_to_string($kept, '&') ELSE '' END)""".stripMargin
  }
}
