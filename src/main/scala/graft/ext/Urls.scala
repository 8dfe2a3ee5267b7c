package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** X59 — URL canonicalization + registered-domain extraction: the
  * web-corpus prerequisite the curation passes assume away. CommonCrawl
  * pipelines dedup by URL, cap per-domain contributions ([[Curation
  * .domainCap]]) and join crawls across snapshots — none of which works
  * until `HTTP://www.Site.com:80/a/?utm_source=x&b=1#frag` and
  * `http://www.site.com/a?b=1` are the same key.
  *
  * Everything is built from codegen'd builtins — `parse_url` for the
  * piecewise split, `filter`/`array_sort`/`array_join` HOFs for the query
  * string — so canonicalization runs row-local at scan speed inside
  * whole-stage codegen: no UDF, no shuffle, 100 TB-indifferent.
  *
  * Canonical form (the pinned contract, hash-checked cross-engine by
  * x59_url_canon):
  *  - scheme and host lowercased; userinfo dropped (credentials never
  *    belong in a corpus key);
  *  - port kept ONLY when non-default for the scheme (http:80 and
  *    https:443 strip);
  *  - fragment dropped (never sent to the server — two URLs differing
  *    only in fragment fetch the same bytes);
  *  - trailing slashes stripped from the path (`/a/` ≡ `/a`; the root
  *    path collapses to the bare authority);
  *  - query parameters: empties and tracking params (`utm_*`, `fbclid`,
  *    `gclid`, `ref`) removed, the rest SORTED and rejoined — parameter
  *    order is transport noise, not identity.
  */
object Urls {

  /** Tracking-parameter prefixes dropped by [[canonicalize]]. */
  val DropParams: Seq[String] = Seq("utm_", "fbclid=", "gclid=", "ref=")

  /** `parse_url` that NEVER throws: under ANSI mode (the Spark 4 default)
    * `parse_url` raises INVALID_URL on malformed input — one bad URL in a
    * 100 TB crawl must become NULL, not a dead task (the q69 ingestion
    * contract). */
  private def part(url: Column, p: String): Column =
    try_parse_url(url, lit(p))

  private def authority(url: Column): Column =
    // userinfo ('user:pass@') dropped, rest lowercased
    lower(regexp_replace(part(url, "AUTHORITY"), "^[^@]*@", ""))

  /** Host without port, lowercased, userinfo stripped.
    * Caveat: bracketed IPv6 authorities (`[::1]:8080`) are not special-
    * cased — the first ':' splits them. Registrable-domain work targets
    * DNS hostnames; IP-literal URLs should be screened out upstream. */
  def host(url: Column): Column = substring_index(authority(url), ":", 1)

  /** Explicit port as a string, or NULL when absent. */
  def port(url: Column): Column = {
    val auth = authority(url)
    when(auth.contains(":"), substring_index(auth, ":", -1))
  }

  /** Canonical query string: params filtered (empties + [[DropParams]]),
    * sorted, rejoined; '' when nothing survives. */
  private def canonicalQuery(url: Column): Column = {
    val params = filter(
      split(coalesce(part(url, "QUERY"), lit("")), "&"),
      p => p =!= "" && DropParams.map(d => p.startsWith(d))
        .reduce(_ || _).unary_!)
    array_join(array_sort(params), "&")
  }

  /** The canonical URL per the contract above. */
  def canonicalize(url: Column): Column = {
    val proto = lower(part(url, "PROTOCOL"))
    val h = host(url)
    val p = port(url)
    val keepPort = p.isNotNull &&
      !(proto === "http" && p === "80") && !(proto === "https" && p === "443")
    val path = regexp_replace(
      coalesce(part(url, "PATH"), lit("")), "/+$", "")
    val q = canonicalQuery(url)
    concat(
      proto, lit("://"), h,
      when(keepPort, concat(lit(":"), p)).otherwise(""),
      path,
      when(q =!= "", concat(lit("?"), q)).otherwise(""))
  }

  /** Second-level public suffixes where the registrable name is the THIRD
    * label from the right (bbc.co.uk, not co.uk). A pragmatic subset of
    * the public-suffix list — callers with full-PSL needs supply their own
    * table and join; the engine contract is the label arithmetic. */
  val SecondLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "co.in", "co.nz", "co.za", "co.kr", "com.br", "com.cn",
    "com.mx", "com.tr", "com.sg", "com.hk", "com.ar")

  /** Registered (apex) domain of a HOST column: the last two labels, or
    * the last three when the trailing two form a second-level public
    * suffix; hosts with fewer labels pass through unchanged. */
  def registeredDomain(hostCol: Column): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    val lastTwo = array_join(slice(labels, -2, 2), ".")
    val suffixHit = SecondLevelSuffixes
      .map(s => lastTwo === s).reduce(_ || _)
    when(n <= 2, hostCol)
      .when(suffixHit && n >= 3, array_join(slice(labels, -3, 3), "."))
      .otherwise(lastTwo)
  }
}
