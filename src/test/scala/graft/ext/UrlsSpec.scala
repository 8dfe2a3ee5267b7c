package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Urls]] — canonicalization contract + registered-domain label
  * arithmetic. The cross-engine face (URL synthesis + canonicalization
  * reproduced in DuckDB SQL) is oracle-checked as x59_url_canon. */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("u").select(Urls.canonicalize(col("u"))).as[String].head()

  test("canonicalize: case, userinfo, default port, tracking params, fragment") {
    assert(canon("HTTP://User:pw@WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag")
      === "http://www.example.com/a/b?a=1&b=2")
  }

  test("canonicalize: default https port strips, root path collapses") {
    assert(canon("HTTPS://Site.com:443/") === "https://site.com")
    assert(canon("https://site.com") === "https://site.com")
  }

  test("canonicalize: non-default port kept, params sorted, empties dropped") {
    assert(canon("http://site.com:8080/x?z=1&&a=2") ===
      "http://site.com:8080/x?a=2&z=1")
  }

  test("canonicalize: all-tracking query vanishes entirely") {
    assert(canon("https://s.com/p?utm_source=a&utm_medium=b&gclid=x&fbclid=y&ref=z")
      === "https://s.com/p")
  }

  test("canonicalize is idempotent") {
    val urls = Seq(
      "HTTP://User:pw@WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag",
      "https://site.com:8443/x/?q=1", "http://a.co/")
    for (u <- urls) assert(canon(canon(u)) === canon(u))
  }

  test("registeredDomain: plain, deep, second-level suffix, bare host") {
    val got = Seq("www.example.com", "a.b.site.io", "www.bbc.co.uk",
      "deep.sub.shop.com.au", "localhost", "site.org")
      .toDF("h").select(Urls.registeredDomain(col("h"))).as[String]
      .collect().toSeq
    assert(got === Seq("example.com", "site.io", "bbc.co.uk",
      "shop.com.au", "localhost", "site.org"))
  }

  test("malformed URLs canonicalize to NULL, never a thrown task (ANSI-safe)") {
    val got = Seq("http://exa mple.com/a", "not a url at all",
      "https://ok.com/x").toDF("u")
      .select(Urls.canonicalize(col("u"))).as[String].collect()
    assert(got(0) == null && got(1) == null)
    assert(got(2) === "https://ok.com/x")
  }

  test("host/port extraction") {
    val df = Seq("https://U:p@Host.COM:8443/x").toDF("u")
    assert(df.select(Urls.host(col("u"))).as[String].head() === "host.com")
    assert(df.select(Urls.port(col("u"))).as[String].head() === "8443")
    assert(Seq("https://host.com/x").toDF("u")
      .select(Urls.port(col("u"))).as[String].head() === null)
  }
}
