package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL parsing + canonicalization column functions — the identity key
  * for URL-level dedup of web corpora (Common Crawl-style pipelines
  * dedup by canonical URL before any content pass, because refetches of
  * one page arrive under case variants, default ports, tracking
  * parameters, fragments, and trailing slashes).
  *
  * All pure `regexp_extract`/`regexp_replace`/`when` chains over the
  * Java-regex ∩ RE2 common subset (no backreferences, no lookaround),
  * so the DuckDB oracle replays the exact same canonicalization —
  * same discipline as the PII patterns in [[TextFunctions]].
  */
object UrlFunctions {

  /** Scheme prefix (before `://`), lowercased; '' when absent. */
  def urlScheme(c: Column): Column =
    lower(regexp_extract(c, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** host[:port] authority component, lowercased; '' when absent. */
  def urlHostPort(c: Column): Column =
    lower(regexp_extract(c, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))

  /** Canonical host: lowercased, default ports (:80, :443) stripped.
    * Non-default ports are PRESERVED — for identity dedup,
    * `http://h:8080/x` and `http://h/x` are different resources. */
  def urlHost(c: Column): Column =
    regexp_replace(urlHostPort(c), ":(80|443)$", "")

  /** Authority reduced to the bare host for SECURITY matching:
    * userinfo (`user:pass@`) and ANY port stripped, so
    * `http://u@evil.com/` or `http://evil.com:8080/` still hits a
    * blocklist entry for `evil.com`. The userinfo strip is GREEDY
    * (`^.*@` — everything through the LAST '@' in the authority):
    * WHATWG/browser parsers split host at the last '@', so a lazy
    * strip would let `http://x@y@evil.com/` keep `y@evil.com` and
    * bypass the blocklist while the browser fetches `evil.com`.
    * Distinct from [[urlHost]], which keeps non-default ports as part
    * of dedup identity. */
  def urlBareHost(c: Column): Column =
    regexp_replace(regexp_replace(urlHostPort(c), "^.*@", ""),
      ":[0-9]*$", "")

  /** path + query with the fragment already excluded (the `[^#]*`
    * capture stops at '#'); case preserved — paths are case-sensitive. */
  def urlPathQuery(c: Column): Column =
    regexp_extract(c, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)

  /** Tracking parameters stripped by the canonicalizer. The leading
    * `\b` keeps the name match anchored (so `href=` is not clipped at
    * its embedded `ref=`); `\b` is in the Java ∩ RE2 subset. */
  val TrackingParamsPattern = "\\b(utm_[a-z]+|fbclid|gclid|ref)=[^&#]*&?"

  /** True when the bare host is a blocklisted domain or any
    * subdomain of one (`ads.example.com` matches blocked `example.com`
    * but `notexample.com` does not) — the crawl-pipeline domain
    * filter. Matches on [[urlBareHost]] (userinfo and every port
    * stripped) so `http://evil.com:8080/` and `http://u@evil.com/`
    * cannot slip past a blocklist entry for `evil.com`. NULL host
    * (unparseable URL) yields false: quarantine routing decides those
    * rows, not the blocklist. Pure codegen'd literal-array `exists`,
    * broadcast-free for list sizes a filter config realistically
    * holds; a million-domain list would move to a broadcast join on a
    * reversed-host prefix instead. */
  def hostBlocked(c: Column, blockedDomains: Seq[String]): Column = {
    require(blockedDomains.nonEmpty, "hostBlocked: empty blocklist")
    val h = urlBareHost(c)
    val hit = exists(array(blockedDomains.map(d => lit(d.toLowerCase)): _*),
      d => h === d || h.endsWith(concat(lit("."), d)))
    coalesce(hit && h =!= "", lit(false))
  }

  /** Canonical URL: lowercased scheme + canonical host + path/query
    * with tracking params, fragments, dangling `?`/`&`, and trailing
    * slashes (path-only URLs) removed. Rows that don't parse as
    * absolute URLs canonicalize to NULL (scheme/host extract to ''),
    * which callers should route to a quarantine, not dedup. */
  def canonicalizeUrl(c: Column): Column = {
    val noTrack = regexp_replace(urlPathQuery(c), TrackingParamsPattern, "")
    val noDangle = regexp_replace(noTrack, "[?&]+$", "")
    // strip trailing slashes only when no query survived: a '/' at the
    // end of a query VALUE is data, not path decoration
    val cleanPath = when(noDangle.contains("?"), noDangle)
      .otherwise(rtrim(noDangle, "/"))
    when(urlScheme(c) === "" || urlHost(c) === "", lit(null).cast("string"))
      .otherwise(concat(urlScheme(c), lit("://"), urlHost(c), cleanPath))
  }
}
