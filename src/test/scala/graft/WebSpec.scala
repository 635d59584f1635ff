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
