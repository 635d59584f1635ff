package graft

import org.apache.spark.sql.functions._
import graft.functions.Web

class WebSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("u").select(Web.canonicalizeUrl(col("u"))).collect()
      .head.getString(0)

  test("canonicalizeUrl: case, www, default port, fragment, tracking, sort") {
    assert(canon("HTTP://WWW.Example.COM:80/A/B/?b=2&a=1&utm_source=x#frag")
      == "http://example.com/A/B?a=1&b=2") // path case PRESERVED
    assert(canon("https://Site.org:443/x") == "https://site.org/x")
    // non-default ports survive (they change the fetched content)
    assert(canon("https://site.org:8443/x") == "https://site.org:8443/x")
    assert(canon("http://site.org:8080/x") == "http://site.org:8080/x")
    // :443 is only default for https, :80 only for http
    assert(canon("http://site.org:443/x") == "http://site.org:443/x")
  }

  test("canonicalizeUrl: roots, empty queries, tracking-only queries") {
    assert(canon("http://a.com/") == "http://a.com")
    assert(canon("http://a.com/p?utm_source=x&utm_medium=y") == "http://a.com/p")
    assert(canon("http://a.com/p?gclid=1&fbclid=2") == "http://a.com/p")
    // non-tracking params that merely share letters are kept
    assert(canon("http://a.com/p?refresh=1&gclid2=x")
      == "http://a.com/p?gclid2=x&refresh=1")
  }

  test("canonicalizeUrl: first-'://' anchor — embedded absolute URLs stay payload") {
    // an embedded URL in a query param must NOT become the parsed host
    // (a last-occurrence anchor would collapse unrelated hosts into one
    // dedup group — silent data deletion). The param sorts but survives.
    assert(canon("http://a.com/r?next=https://x.com/p")
      == "http://a.com/r?next=https://x.com/p")
    // and two pages differing only in the embedded target stay DISTINCT
    assert(canon("http://a.com/r?next=https://y.com/p")
      != canon("http://a.com/r?next=https://x.com/p"))
  }

  test("canonicalizeUrl: first-'?' anchor — literal '?' in query is payload") {
    assert(canon("https://ex.com/a?q=what?really&b=1")
      == "https://ex.com/a?b=1&q=what?really")
  }

  test("canonicalizeUrl: percent-escape case normalization (RFC 3986 6.2.2.1)") {
    assert(canon("http://ex.com/a%2fb?x=%3d1") == "http://ex.com/a%2Fb?x=%3D1")
    // malformed escapes left untouched, trailing '%' survives
    assert(canon("http://ex.com/a%zz?x=%a") == "http://ex.com/a%zz?x=%a")
    assert(canon("http://ex.com/trail%") == "http://ex.com/trail%")
  }

  test("canonicalizeUrl: grammar guard — non-matching URLs pass through verbatim") {
    assert(canon("not a url") == "not a url")
    assert(canon("://nohost.com/x") == "://nohost.com/x")
    assert(canon("mailto:someone@example.com") == "mailto:someone@example.com")
    // non-http(s) schemes with valid grammar DO canonicalize (no port rule)
    assert(canon("ftp://Files.Example.com/Pub/") == "ftp://files.example.com/Pub")
    // punycode (IDN) hosts lowercase like any host; non-default port kept
    assert(canon("http://xn--BCHER-kva.example:8080/P")
      == "http://xn--bcher-kva.example:8080/P")
  }

  test("canonicalHost + domainStats: per-domain page/distinct-url counts") {
    val df = Seq(
      (1L, "http://www.A.com/p/?b=2&a=1"),
      (2L, "HTTP://a.com:80/p?a=1&b=2&utm_campaign=z"),
      (3L, "http://a.com/q"),
      (4L, "https://B.org/x"),
      (5L, "nonsense")).toDF("id", "url")
    val got = Web.domainStats(df, "url").collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (Some("a.com"), 3L, 2L),   // 3 pages, 2 distinct canonical urls
      (Some("b.org"), 1L, 1L),
      (None, 1L, 1L)))           // the parser's error budget stays visible
  }

  test("canonicalizeUrl is idempotent over randomized messy URLs") {
    // canon(canon(u)) == canon(u): the canonical form must be a fixed
    // point — a second pass finding more to normalize means the dedup
    // key depends on HOW MANY times a pipeline canonicalized, which
    // silently splits groups between ingest paths
    val rnd = new scala.util.Random(1234)
    val schemes = Seq("http", "HTTP", "https", "ftp", "mailto:x@y", "")
    val hosts = Seq("Example.COM", "www.site.org", "a.b.c", "xn--BCHER-kva.de",
      "site.org:8080", "site.org:80", "site.org:443")
    val paths = Seq("", "/", "/A/b/", "/a%2fb", "/p%zz", "/trail%", "/x/y")
    val queries = Seq("", "?b=2&a=1", "?utm_source=x&a=1", "?q=wh?at&z=1",
      "?next=https://other.com/p", "?x=%3d1&y=%2F", "?gclid=1", "?a=&b=1")
    val frags = Seq("", "#sec", "#a?b=1")
    val urls = (1 to 400).map { _ =>
      val s = schemes(rnd.nextInt(schemes.length))
      val sep = if (rnd.nextBoolean()) "://" else ":"
      s + sep + hosts(rnd.nextInt(hosts.length)) +
        paths(rnd.nextInt(paths.length)) +
        queries(rnd.nextInt(queries.length)) + frags(rnd.nextInt(frags.length))
    } :+ "not a url at all" :+ "://x" :+ ""
    val df = urls.toDF("u")
      .select(Web.canonicalizeUrl(col("u")).as("c1"))
      .select(col("c1"), Web.canonicalizeUrl(col("c1")).as("c2"))
    val bad = df.filter(!(col("c1") <=> col("c2"))).collect()
    assert(bad.isEmpty, s"non-idempotent canon: ${bad.take(5).mkString("; ")}")
  }

  test("urlDedup: messy variants of one URL collapse to min id") {
    val df = Seq(
      (1L, "http://www.A.com/p/?b=2&a=1"),
      (2L, "HTTP://a.com:80/p?a=1&b=2&utm_campaign=z"),
      (3L, "http://a.com/p?a=1&b=2#s"),
      (9L, "http://a.com/q")).toDF("id", "url")
    val got = Web.urlDedup(df, "id", "url").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      ("http://a.com/p?a=1&b=2", 1L, 3L),
      ("http://a.com/q", 9L, 1L)))
  }
}
