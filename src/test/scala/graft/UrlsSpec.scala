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
}
