package graft.text

import graft.functions.GraftFunctions.md5Long
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL curation for web-scale corpus building: canonicalization,
  * registered-domain (eTLD+1) extraction, and per-domain document caps
  * — the provenance stage every crawl pipeline runs before text-level
  * dedup (the same URL re-crawled, the same page behind tracking
  * params, and one domain flooding the mixture are all cheaper to kill
  * here than at content granularity).
  *
  * Everything except the cap is a pure `Column` expression over
  * built-in string/array functions — map-side, whole-stage-codegen,
  * zero shuffle, and replayable verbatim by the DuckDB oracle. Scope
  * is deliberately syntactic: lowercase scheme/host, `www.` strip,
  * default-port drop, fragment drop, tracking-parameter removal,
  * query-parameter sort, trailing-slash normalization. Semantic
  * equivalences that need network or content evidence (redirects,
  * percent-encoding case, IDN/punycode) are out of scope — those
  * collapse later in the content-hash stage.
  */
object Urls {

  /** Query parameters that carry click provenance, not content
    * identity (the CCNet/C4-style strip list): any `utm_*` plus the
    * common ad-click and newsletter ids.
    */
  val TrackingParams: Seq[String] =
    Seq("fbclid", "gclid", "msclkid", "mc_cid", "mc_eid", "igshid", "ref")

  /** Multi-label public suffixes the registered-domain split must not
    * cut through (an embedded subset of the Mozilla Public Suffix
    * List: country-code second-level registries plus the big shared
    * hosting suffixes; pass a fuller list for production crawls).
    */
  val MultiLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk",
    "com.au", "net.au", "org.au", "co.jp", "or.jp", "ne.jp",
    "co.in", "co.nz", "com.br", "com.mx", "com.cn", "com.tr",
    "github.io", "gitlab.io", "blogspot.com")

  private def schemeOf(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Lowercased host without port, `www.` stripped. */
  def hostOf(url: Column): Column =
    regexp_replace(
      lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)", 1)),
      "^www\\.", "")

  private def portOf(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#:]*:([0-9]+)", 1)

  /** URL path with trailing slashes trimmed — the robots-decision and
    * canonicalization path form.
    */
  def pathOf(url: Column): Column =
    regexp_replace(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1),
      "/+$", "")

  /** The query string with tracking parameters removed and the rest
    * sorted — parameter ORDER is transport noise (servers treat the
    * query as a multimap), so sorting makes `?a=1&b=2` and `?b=2&a=1`
    * one URL. Empty string when nothing survives.
    */
  private def sortedQueryOf(url: Column): Column = {
    val q = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = filter(split(q, "&"), p => {
      val name = lower(element_at(split(p, "="), 1))
      p =!= "" && !name.startsWith("utm_") &&
        !name.isin(TrackingParams: _*)
    })
    array_join(array_sort(kept), "&")
  }

  /** Canonical form of an absolute http(s)-style URL: lowercase
    * scheme + host, `www.` and fragment stripped, default ports (80
    * on http, 443 on https) dropped, non-default ports kept, path
    * trailing slashes trimmed, tracking params removed, surviving
    * params sorted. Malformed rows (no `scheme://`) canonicalize to
    * the empty string — filter on it rather than crashing mid-crawl.
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = schemeOf(url)
    val host = hostOf(url)
    val port = portOf(url)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val sq = sortedQueryOf(url)
    when(scheme === "" || host === "", lit(""))
      .otherwise(concat(
        scheme, lit("://"), host,
        when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
        pathOf(url),
        when(sq =!= "", concat(lit("?"), sq)).otherwise(lit(""))))
  }

  /** Registered domain (eTLD+1) of a host: the last two labels,
    * or the last three when the last two form a multi-label public
    * suffix (`a.b.co.uk` → `b.co.uk`, not `co.uk`). Single-label
    * hosts (intranet names) pass through unchanged.
    */
  def registeredDomain(host: Column,
                       suffixes: Seq[String] = MultiLabelSuffixes)
      : Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = array_join(slice(labels, greatest(n - 1, lit(1)), lit(2)), ".")
    val last3 = array_join(slice(labels, greatest(n - 2, lit(1)), lit(3)), ".")
    when(n >= 3 && last2.isin(suffixes: _*), last3).otherwise(last2)
  }

  /** Keep at most `cap` documents per registered domain, best-first by
    * `order` (ties MUST be broken to a total order by the caller —
    * append a unique id column); `key` is any unique row id, used only
    * to spread rows across salt partitions. The domain-flood guard of
    * the mixture stage: without it one mega-domain owns the training
    * distribution.
    *
    * Scale: a plain `row_number() OVER (PARTITION BY domain)` puts a
    * hot domain (crawls routinely have one domain at 1%+ of the
    * corpus) in ONE task. This runs two phases instead: a salted
    * window takes the per-(domain, salt) top `cap` — hot domains
    * spread over `salts` tasks — then the final window ranks at most
    * `cap · salts` survivors per domain, a bounded input no matter how
    * hot the domain. Top-`cap` under a total order is closed under
    * this split (any global top row is a top row of its salt
    * partition), so the result is EXACTLY the single-window answer —
    * the oracle replays the plain `row_number` twin.
    */
  def perDomainCap(df: DataFrame, domain: Column, order: Seq[Column],
                   key: Column, cap: Int, salts: Int = 32): DataFrame = {
    require(cap >= 1, s"cap=$cap must be positive")
    require(salts >= 1, s"salts=$salts must be positive")
    val withDom = df.withColumn("_dom", domain)
      .withColumn("_salt", pmod(md5Long(key.cast("string"), 8), lit(salts)))
    val w1 = Window.partitionBy(col("_dom"), col("_salt")).orderBy(order: _*)
    val w2 = Window.partitionBy(col("_dom")).orderBy(order: _*)
    withDom
      .withColumn("_r1", row_number().over(w1))
      .where(col("_r1") <= cap)
      .withColumn("domain_rank", row_number().over(w2))
      .where(col("domain_rank") <= cap)
      .drop("_dom", "_salt", "_r1")
  }
}
