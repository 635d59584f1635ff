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
  * and tracking-param stripping, percent-encoding case normalization,
  * sorted query).
  */
object Web {

  /** Query params dropped during canonicalization: analytics/tracking
    * noise that never changes the fetched content. Prefix match for
    * `utm_` (utm_source/medium/campaign/...), exact-key match for the
    * rest. */
  val TrackingPrefixes: Seq[String] = Seq("utm_", "gclid=", "fbclid=")

  /** Scheme grammar (RFC 3986 §3.1, lowercased): URLs whose prefix
    * before the FIRST `://` does not match are NOT canonicalized — they
    * pass through verbatim rather than being mis-parsed (a mis-parse
    * here is silent data deletion downstream in [[urlDedup]]). */
  private val SchemeRe = "^[a-z][a-z0-9+.-]*$"

  /** RFC 3986 §6.2.2.1 percent-encoding case normalization: the hex
    * digits of every `%xx` escape uppercased (`%2f` ≡ `%2F`), malformed
    * escapes (`%zz`, `%a`, trailing `%`) left untouched. Split on `%`
    * and rejoin with `%` — the pieces between separators are exactly
    * the post-escape tails, so uppercasing each valid 2-hex head
    * normalizes every escape in one pass. HOF form (CodegenFallback) is
    * fine here: per-row cost is O(escapes), and URLs are short. */
  private def pctNorm(c: Column): Column =
    array_join(
      transform(split(c, "%", -1), (p, i) =>
        when(i === lit(0), p).otherwise(
          when(substring(p, 1, 2).rlike("^[0-9a-fA-F]{2}$"),
            concat(upper(substring(p, 1, 2)), substr(p, lit(3), length(p))))
            .otherwise(p))),
      "%")

  /** Canonicalize a well-formed absolute URL — one pure Column
    * composition (no UDF, one scan):
    *  - fragment (`#...`) dropped
    *  - scheme and host lowercased; leading `www.` stripped
    *  - default ports stripped (`:80` for http, `:443` for https);
    *    non-default ports KEPT (a different port IS a different origin)
    *  - trailing `/` of the path dropped (so `/p/` ≡ `/p`)
    *  - percent-escapes in path+query uppercased ([[pctNorm]]; the host
    *    is lowercased wholesale — percent-escapes are not legal there,
    *    IDN hosts travel as punycode which lowercasing canonicalizes)
    *  - query: tracking params ([[TrackingPrefixes]]) and empty params
    *    removed, the rest SORTED (param order never changes content)
    *
    * Parsing is anchored at the FIRST `://` and the FIRST `?` — an
    * embedded absolute URL in a query param (`/r?next=https://x.com/p`,
    * ubiquitous in real crawls) stays payload, it never becomes the
    * parsed host. A URL with no `://`, or whose scheme violates
    * [[SchemeRe]], passes through VERBATIM (guarded, not mis-parsed).
    * Still not a general RFC 3986 parser: no userinfo@, no IPv6
    * bracket-literal hosts (both pass the guard and canonicalize
    * host-wholesale, documented). */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    val scheme = lower(substring_index(noFrag, "://", 1))
    // everything after the FIRST "://" — substring_index(…, -1) would
    // anchor at the LAST one and adopt an embedded URL's host
    val rest = substr(noFrag, length(scheme) + lit(4), length(noFrag))
    val hostPort = substring_index(substring_index(rest, "/", 1), "?", 1)
    val pathq = pctNorm(substr(rest, length(hostPort) + lit(1), length(rest)))
    val hostLc = regexp_replace(lower(hostPort), "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(hostLc, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostLc, ":443$", ""))
      .otherwise(hostLc)
    val pathRaw = substring_index(pathq, "?", 1) // before the FIRST "?"
    val path = regexp_replace(pathRaw, "/$", "")
    // after the FIRST "?" — a second literal "?" is query payload
    val query = when(pathq.contains("?"),
      substr(pathq, length(pathRaw) + lit(2), length(pathq)))
      .otherwise(lit(""))
    val kept = array_sort(filter(split(query, "&", -1), p =>
      p =!= "" && !TrackingPrefixes
        .map(t => startswith(p, lit(t))).reduce(_ || _)))
    val canon = concat(scheme, lit("://"), host, path,
      when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
        .otherwise(lit("")))
    when(noFrag.contains("://") && scheme.rlike(SchemeRe), canon)
      .otherwise(url)
  }

  /** The canonical HOST of a URL (lowercased, `www.`/default-port
    * stripped), or NULL for URLs failing the [[canonicalizeUrl]] grammar
    * guard — the group key of [[domainStats]]. Same first-`://` anchor
    * as canonicalization, so the two can never disagree on the host. */
  def canonicalHost(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    val scheme = lower(substring_index(noFrag, "://", 1))
    val rest = substr(noFrag, length(scheme) + lit(4), length(noFrag))
    val hostPort = substring_index(substring_index(rest, "/", 1), "?", 1)
    val hostLc = regexp_replace(lower(hostPort), "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(hostLc, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostLc, ":443$", ""))
      .otherwise(hostLc)
    when(noFrag.contains("://") && scheme.rlike(SchemeRe), host)
      .otherwise(lit(null).cast("string"))
  }

  /** URL-level dedup: group by canonical URL, keep the minimum id (the
    * q24 exact-dedup contract). Output (canon_url, keep_id, n_dups) —
    * one hash aggregation on a uniform short key, no skew risk beyond
    * what AQE already splits. */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol).as("id"), canonicalizeUrl(col(urlCol)).as("canon_url"))
      .groupBy(col("canon_url"))
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Per-domain crawl-frontier diagnostic: for each canonical host, the
    * page count and the count of DISTINCT canonical URLs — the ratio is
    * the domain's URL-level duplication factor, the first thing a crawl
    * operator reads when deciding recrawl budgets. Grammar-failing URLs
    * aggregate under host NULL (kept visible — they are the parser's
    * error budget, not silently dropped). Two hash aggregations on
    * short uniform keys; at 100 TB the distinct runs as a partial
    * aggregate under AQE like any count_distinct. */
  def domainStats(df: DataFrame, urlCol: String): DataFrame =
    df.select(canonicalHost(col(urlCol)).as("host"),
        canonicalizeUrl(col(urlCol)).as("canon_url"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_pages"),
        count_distinct(col("canon_url")).as("n_canon_urls"))

  /** DuckDB spelling of [[pctNorm]] over a string expression. */
  private def oraclePctNorm(x: String): String =
    s"""array_to_string(list_transform(string_split($x, '%'), (p, i) ->
       |    CASE WHEN i = 1 THEN p
       |         WHEN regexp_matches(substr(p, 1, 2), '^[0-9a-fA-F]{2}$$')
       |         THEN upper(substr(p, 1, 2)) || substr(p, 3)
       |         ELSE p END), '%')""".stripMargin

  /** DuckDB spelling of [[canonicalizeUrl]] over a URL expression —
    * generated next to the Spark form so the two cannot drift. Both
    * sides anchor at the FIRST `://` / `?` (substr past the scheme /
    * raw path, never a last-occurrence or between-occurrence split). */
  def oracleCanonicalUrl(urlExpr: String): String = {
    val noFrag = s"split_part($urlExpr, '#', 1)"
    val scheme = s"lower(split_part($noFrag, '://', 1))"
    val rest = s"substr($noFrag, length($scheme) + 4)"
    val hostPort = s"split_part(split_part($rest, '/', 1), '?', 1)"
    val pathq = oraclePctNorm(s"substr($rest, length($hostPort) + 1)")
    val hostLc = s"regexp_replace(lower($hostPort), '^www\\.', '')"
    val host = s"""CASE WHEN $scheme = 'http'
      THEN regexp_replace($hostLc, ':80$$', '')
      WHEN $scheme = 'https' THEN regexp_replace($hostLc, ':443$$', '')
      ELSE $hostLc END"""
    val pathRaw = s"split_part($pathq, '?', 1)"
    val path = s"regexp_replace($pathRaw, '/$$', '')"
    val query = s"CASE WHEN contains($pathq, '?') " +
      s"THEN substr($pathq, length($pathRaw) + 2) ELSE '' END"
    val keptPred = TrackingPrefixes
      .map(t => s"NOT starts_with(p, '$t')").mkString(" AND ")
    val kept = s"list_sort(list_filter(string_split($query, '&'), " +
      s"p -> p <> '' AND $keptPred))"
    s"""(CASE WHEN contains($noFrag, '://')
       |       AND regexp_matches($scheme, '$SchemeRe')
       |  THEN $scheme || '://' || $host || $path ||
       |    CASE WHEN len($kept) > 0
       |         THEN '?' || array_to_string($kept, '&') ELSE '' END
       |  ELSE $urlExpr END)""".stripMargin
  }

  /** DuckDB spelling of [[canonicalHost]]. */
  def oracleCanonicalHost(urlExpr: String): String = {
    val noFrag = s"split_part($urlExpr, '#', 1)"
    val scheme = s"lower(split_part($noFrag, '://', 1))"
    val rest = s"substr($noFrag, length($scheme) + 4)"
    val hostPort = s"split_part(split_part($rest, '/', 1), '?', 1)"
    val hostLc = s"regexp_replace(lower($hostPort), '^www\\.', '')"
    val host = s"""CASE WHEN $scheme = 'http'
      THEN regexp_replace($hostLc, ':80$$', '')
      WHEN $scheme = 'https' THEN regexp_replace($hostLc, ':443$$', '')
      ELSE $hostLc END"""
    s"""(CASE WHEN contains($noFrag, '://')
       |       AND regexp_matches($scheme, '$SchemeRe')
       |  THEN $host ELSE NULL END)""".stripMargin
  }
}
