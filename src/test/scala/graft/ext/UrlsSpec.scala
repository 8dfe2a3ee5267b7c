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

  test("kernel canonicalize/host == try_parse_url composition (property)") {
    // the r16 single-parse kernels must NULL and format exactly like the
    // builtin composition they replaced — adversarial + random URLs
    val adversarial = Seq(
      "HTTP://User:pw@WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag",
      "HTTPS://Site.com:443/", "https://site.com", "http://a.co/",
      "http://site.com:8080/x?z=1&&a=2", "https://s.com/p?ref=z&a=",
      "http://h:/p", "http://h:80x/p", "ftp://h:21/f", "http://h:008080/",
      "not a url", "http://", "://x", "//host/path", "relative/path",
      "mailto:a@b.com", "http://[::1]:8080/p?b=1&a=2",
      "http://h/p?a=%20&b=%2F", "http://h/p/?a=1#f?g",
      "http://h/p??", "http://h/p?&&", "http://h/p?a&a&a",
      "http://h/p?A=1&a=1",     // case-distinct params sort bytewise
      "http://EX.com:80:90/p",  // multi-colon authority
      "http://u@h@x/p",         // double '@': strip through FIRST only
      "HtTp://MiXeD.CaSe/PaTh/", "http://h./p", "http://h/p%ZZ",
      "http://h/p?q=\u00e9&\u00e9=1", "http://h/\u2028ws?a=1",
      "", " ", "http://h/p?" + "k=v&" * 50 + "utm_x=1")
    val rnd = new scala.util.Random(16L)
    val atoms = Seq("http", "HTTPS", "://", "www.", "site", ".com", ":80",
      ":443", ":8080", "/", "/p", "?", "&", "=", "a", "1", "#f", "@",
      "user:pw@", "%2F", "é", " ", "utm_a", "ref", ":")
    val soups = (1 to 300).map { _ =>
      (1 to rnd.nextInt(12)).map(_ => atoms(rnd.nextInt(atoms.size))).mkString
    }
    val all = adversarial ++ soups
    val got = all.toDF("u").select(
        Urls.canonicalize(col("u")).as("ck"),
        Urls.canonicalizeComposed(col("u")).as("cc"),
        Urls.host(col("u")).as("hk"),
        Urls.hostComposed(col("u")).as("hc"))
      .as[(Option[String], Option[String], Option[String], Option[String])]
      .collect()
    got.zip(all).foreach { case ((ck, cc, hk, hc), in) =>
      assert(ck === cc, s"canonical kernel diverged on: ${in.take(100)}")
      assert(hk === hc, s"host kernel diverged on: ${in.take(100)}")
    }
    // the fused registered-domain kernel == the Column composition
    val rds = all.toDF("u").select(
        Urls.registeredDomainOfUrl(col("u")).as("rk"),
        Urls.registeredDomain(Urls.hostComposed(col("u"))).as("rc"))
      .as[(Option[String], Option[String])].collect()
    rds.zip(all).foreach { case ((rk, rc), in) =>
      assert(rk === rc, s"fused rdom kernel diverged on: ${in.take(100)}")
    }
    // plus hosts with dotted edge shapes routed through a URL
    val hostEdges = Seq("h", "a.b", "a.b.c", "x.co.uk", "a.x.co.uk", "h.",
      "a.b.c.", "..", ".a.b", "deep.sub.shop.com.au")
      .map(h => s"http://$h/p")
    val rds2 = hostEdges.toDF("u").select(
        Urls.registeredDomainOfUrl(col("u")).as("rk"),
        Urls.registeredDomain(Urls.hostComposed(col("u"))).as("rc"))
      .as[(Option[String], Option[String])].collect()
    rds2.zip(hostEdges).foreach { case ((rk, rc), in) =>
      assert(rk === rc, s"fused rdom kernel diverged on: $in")
    }
  }

  test("kernel DropParams/suffixes stay in sync with the documented contract") {
    assert(graft.functions.UrlKernel.DropParams.toSeq === Urls.DropParams)
    assert(graft.functions.UrlKernel.SecondLevelSuffixes.size ===
      Urls.SecondLevelSuffixes.size)
    Urls.SecondLevelSuffixes.foreach(s =>
      assert(graft.functions.UrlKernel.SecondLevelSuffixes.contains(s), s))
  }

  test("registeredDomain: plain, deep, second-level suffix, bare host") {
    val got = Seq("www.example.com", "a.b.site.io", "www.bbc.co.uk",
      "deep.sub.shop.com.au", "localhost", "site.org")
      .toDF("h").select(Urls.registeredDomain(col("h"))).as[String]
      .collect().toSeq
    assert(got === Seq("example.com", "site.io", "bbc.co.uk",
      "shop.com.au", "localhost", "site.org"))
  }

  // -------------------------------------------------------------- full PSL

  private val pslLines = Seq(
    "// a subset of publicsuffix.org exercising every rule kind",
    "",
    "com",
    "co.uk  // trailing comment text dropped",
    "co.jp",
    "uk",
    "jp",
    "ck",
    "*.ck",
    "!www.ck")

  test("parsePsl: comments/blanks skipped, wildcard and exception flagged") {
    val rules = Urls.parsePsl(pslLines)
    assert(rules.map(_.suffix).toSet ===
      Set("com", "co.uk", "co.jp", "uk", "jp", "ck", "www.ck"))
    assert(rules.filter(_.wildcard).map(_.suffix) === Seq("ck"))
    assert(rules.filter(_.exception).map(_.suffix) === Seq("www.ck"))
    assert(rules.find(_.suffix == "co.uk").get.labels === 2)
  }

  test("registeredDomainPsl: plain, second-level, wildcard, exception rules") {
    val rules = Urls.parsePsl(pslLines)
    val hosts = Seq(
      "www.example.com",     // plain TLD rule
      "a.b.example.co.uk",   // second-level suffix: registrable is 3rd label
      "shop.co.jp",          // host exactly suffix+1: registrable unchanged
      "sub.bar.ck",          // wildcard *.ck: bar.ck is the public suffix,
                             // so the registrable name is sub.bar.ck
      "bar.ck",              // IS a public suffix under *.ck -> NULL
      "www.ck",              // exception !www.ck re-opens it: registrable
      "a.www.ck",            // under the exception, apex is www.ck
      "example.nosuchtld",   // no rule: implicit * default (last label)
      "nosuchtld",           // single-label unknown host -> NULL
      "MiXeD.ExAmPlE.CoM")   // case-folded before matching
      .toDF("h")
    val got = Urls.registeredDomainPsl(hosts, "h", rules, "rd")
      .select("h", "rd").as[(String, String)].collect().toMap
    assert(got("www.example.com") === "example.com")
    assert(got("a.b.example.co.uk") === "example.co.uk")
    assert(got("shop.co.jp") === "shop.co.jp")
    assert(got("sub.bar.ck") === "sub.bar.ck")
    assert(got("bar.ck") === null)
    assert(got("www.ck") === "www.ck")
    assert(got("a.www.ck") === "www.ck")
    assert(got("example.nosuchtld") === "example.nosuchtld")
    assert(got("nosuchtld") === null)
    assert(got("MiXeD.ExAmPlE.CoM") === "example.com")
  }

  test("registeredDomainPsl: deep 4-label chain picks the longest MATCHED rule") {
    // every ancestor is itself a rule (the real PSL's us-state chain):
    // precedence must be by matched labels, not by the deepest rule in
    // the table
    val rules = Urls.parsePsl(Seq(
      "us", "ma.us", "k12.ma.us", "pvt.k12.ma.us"))
    val hosts = Seq(
      "myschool.pvt.k12.ma.us",   // 4-label rule wins: rd = whole host
      "a.myschool.pvt.k12.ma.us", // still the 4-label suffix: rd drops 'a.'
      "pvt.k12.ma.us",            // IS a public suffix -> NULL
      "web.k12.ma.us",            // 3-label rule: rd = whole host
      "a.web.ma.us",              // only the 2-label ancestor matches
      "city.ma.us",               // 2-label rule: rd = whole host
      "example.us")               // 1-label rule
      .toDF("h")
    val got = Urls.registeredDomainPsl(hosts, "h", rules, "rd")
      .select("h", "rd").as[(String, String)].collect().toMap
    assert(got("myschool.pvt.k12.ma.us") === "myschool.pvt.k12.ma.us")
    assert(got("a.myschool.pvt.k12.ma.us") === "myschool.pvt.k12.ma.us")
    assert(got("pvt.k12.ma.us") === null)
    assert(got("web.k12.ma.us") === "web.k12.ma.us")
    assert(got("a.web.ma.us") === "web.ma.us")
    assert(got("city.ma.us") === "city.ma.us")
    assert(got("example.us") === "example.us")
  }

  test("registeredDomainPsl agrees with the built-in subset on its own turf") {
    // feed the pragmatic SecondLevelSuffixes as a PSL (plus plain TLDs):
    // where both faces are defined they must agree
    val rules = Urls.parsePsl(
      Urls.SecondLevelSuffixes ++ Seq("com", "io", "org", "uk", "au"))
    val hosts = Seq("www.example.com", "a.b.site.io", "www.bbc.co.uk",
      "deep.sub.shop.com.au", "site.org").toDF("h")
    val psl = Urls.registeredDomainPsl(hosts, "h", rules, "rd")
      .select("h", "rd").as[(String, String)].collect().toMap
    val simple = hosts.select(col("h"), Urls.registeredDomain(col("h")).as("rd"))
      .as[(String, String)].collect().toMap
    for ((h, rd) <- simple) assert(psl(h) === rd, s"host $h")
  }

  test("registeredDomainPslTable: a caller-supplied raw-lines table " +
      "matches the Seq face rule for rule") {
    // the full-PSL deployment path: the published file read as a text
    // DataFrame, parsed in-plan — no driver round-trip, no kernel fork
    val lineDf = pslLines.toDF("value")
    val hosts = Seq("www.example.com", "a.b.example.co.uk", "shop.co.jp",
      "sub.bar.ck", "bar.ck", "www.ck", "a.www.ck", "example.nosuchtld",
      "nosuchtld", "MiXeD.ExAmPlE.CoM").toDF("h")
    val viaTable = Urls.registeredDomainPslTable(hosts, "h", lineDf, "rd")
      .select("h", "rd").as[(String, String)].collect().toMap
    val viaSeq = Urls.registeredDomainPsl(hosts, "h",
        Urls.parsePsl(pslLines), "rd")
      .select("h", "rd").as[(String, String)].collect().toMap
    assert(viaTable === viaSeq)
    // the rule table is broadcast into the probe join, not shuffled
    val plan = Urls.registeredDomainPslTable(hosts, "h", lineDf, "rd")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "PSL join must broadcast")
    intercept[IllegalArgumentException] {
      Urls.registeredDomainPslTable(hosts, "h",
        Seq(("com", 1)).toDF("a", "b"))
    }
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
