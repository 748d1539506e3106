package graft

import org.apache.spark.sql.functions.col

import graft.ext.Urls

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  test("canonicalize: case, default ports, fragments, tracking params, param order, empty path") {
    val cases = Seq(
      // scheme+host lowercase, default port stripped, params sorted,
      // fragment dropped; PATH case is preserved (paths are case-sensitive)
      ("HTTP://WWW.Example.COM:80/A/B?b=2&a=1#frag",
        "http://www.example.com/A/B?a=1&b=2"),
      ("https://site.org:443/x?utm_source=a&utm_campaign=b&gclid=1&z=1",
        "https://site.org/x?z=1"),
      ("https://site.org:8443/x", "https://site.org:8443/x"), // non-default port kept
      ("http://h.example.com", "http://h.example.com/"),      // empty path -> /
      ("https://a.b.c.co?ref=x", "https://a.b.c.co/"),        // only tracking -> no ?
      ("http://e.com/p?fbclid=22", "http://e.com/p"),
      ("http://e.com:443/p", "http://e.com:443/p"))           // 443 is NOT http's default
      .toDF("url", "expected")
    val out = cases
      .select(Urls.canonicalize(col("url")).as("got"), col("expected"))
      .as[(String, String)].collect()
    out.foreach { case (got, exp) => assert(got == exp) }
  }

  test("apex domain: last two labels, single-label hosts yield empty") {
    val out = Seq("www.example.com", "a.b.c.co", "localhost")
      .toDF("h").select(Urls.apexDomain(col("h"))).as[String].collect().toSeq
    assert(out == Seq("example.com", "c.co", ""))
  }

  test("dedupByCanonicalUrl: refetch variants collapse, best score " +
      "survives, ties to smallest id, singletons pass through") {
    val df = Seq(
      // three fetches of one page: tracking params / port / case noise
      (1L, "https://E.com/p?utm_source=a", 100L),
      (2L, "https://e.com:443/p", 300L),
      (3L, "http://other.com/q", 50L),
      (4L, "https://e.com/p?fbclid=z", 300L), // ties doc 2 on score
      (5L, "https://other.com/q", 70L))       // DIFFERENT scheme: not a dup
      .toDF("doc_id", "url", "chars")
    val r = Urls.dedupByCanonicalUrl(df, "doc_id", "url", "chars")
      .as[(String, Long, Long, Long)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    assert(r("https://e.com/p") == ((2L, 300L, 3L)),
      "best score wins; score tie keeps the smaller id")
    assert(r("http://other.com/q") == ((3L, 50L, 1L)))
    assert(r("https://other.com/q") == ((5L, 70L, 1L)))
    assert(r.size == 3)
  }

  test("domainStats: subdomains fold to the apex, refetch rate counts " +
      "canonical collisions, char sums exact") {
    val rows = Seq(
      // www.a.org, a.org, cdn.a.org are DIFFERENT pages (canonical
      // keeps the host) but the SAME apex domain; case/port/tracking
      // variants of one host+path are the same page
      ("HTTPS://WWW.A.ORG:443/x?utm_source=t", 100L),
      ("https://www.a.org/x", 200L), // same canonical as above
      ("https://a.org/x", 300L), // same apex, different page
      ("http://cdn.a.org:80/y", 400L), // same apex, third page
      ("https://b.net/z", 50L),
      ("https://b.net/z?gclid=1", 60L) // same canonical as /z
    ).toDF("url", "chars")
    val d = graft.ext.Urls.domainStats(rows, "url", "chars")
      .as[(String, Long, Long, Double, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val a = d("a.org")
    assert(a._2 == 4L && a._3 == 3L, s"4 docs, 3 distinct pages: $a")
    assert(a._4 == 0.25 && a._5 == 1000L && a._6 == 250.0)
    val b = d("b.net")
    assert(b._2 == 2L && b._3 == 1L && b._4 == 0.5 && b._5 == 110L)
    assert(d.size == 2)
  }
}
