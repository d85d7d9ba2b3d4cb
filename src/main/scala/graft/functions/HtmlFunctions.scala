package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML main-content extraction — step 0 of every crawl-derived
  * training-data pipeline (CommonCrawl WARCs carry HTML; everything
  * downstream — dedup, quality gates, LM filters — assumes extracted
  * text). This is the jusText/trafilatura family of heuristics
  * (Pomikálek 2011: segment into blocks, score each by link density
  * and length, keep content blocks, drop boilerplate), reduced to the
  * regex/HOF subset that both Spark codegen AND the DuckDB oracle can
  * evaluate identically:
  *
  *  - every kernel is built-ins only (`regexp_replace` /
  *    `regexp_extract_all` / `transform` / `filter`) — whole-stage
  *    codegen'd, zero UDFs, and a pure per-row projection: at 100 TB
  *    the extraction runs AT THE SCAN with no shuffle, exactly like
  *    the Gopher gate;
  *  - the regex dialect is the Java ∩ RE2 subset (inline `(?is)`
  *    flags, non-greedy `.*?`, character classes; NO backreferences
  *    — RE2 has none, so script/style/noscript are three literal
  *    passes instead of one `</\1>` pattern), which is what makes the
  *    whole operator SQL-replayable;
  *  - this is a heuristic extractor for CORPUS building, not a
  *    conformant HTML5 parser: malformed markup degrades to extra or
  *    lost whitespace, never an exception, which is the right failure
  *    mode inside a billion-page scan.
  */
object HtmlFunctions {

  /** Block-level elements whose open/close tags terminate a text
    * block. Inline markup (`<a> <b> <em> <span>`…) survives
    * segmentation so per-block link density can still see anchors. */
  val BlockTags: String =
    "p|div|br|li|ul|ol|h1|h2|h3|h4|h5|h6|table|thead|tbody|tr|td|th|" +
      "section|article|header|footer|nav|aside|blockquote|form|figure|" +
      "figcaption|pre|hr|dl|dt|dd|main|body|title"

  /** [[mainText]]'s keep thresholds — named so query-side audit
    * columns (q_html_extract's n_kept) and the DuckDB oracles cite
    * the SAME values the md5'd text was cut with. */
  val DefaultMinWords: Int = 10
  val DefaultMaxLinkDensity: Double = 0.35

  /** Comments and non-content element bodies removed wholesale —
    * `<script>`/`<style>`/`<noscript>` interiors are code, not text.
    * Three literal passes because RE2 (the oracle engine) has no
    * backreferences for a shared `</\1>` close. */
  def stripNonContent(c: Column): Column = {
    val noComment = regexp_replace(c, "(?s)<!--.*?-->", " ")
    Seq("script", "style", "noscript").foldLeft(noComment) { (acc, t) =>
      regexp_replace(acc, s"(?is)<$t[^>]*>.*?</$t>", " ")
    }
  }

  /** All remaining tags to spaces (run AFTER [[stripNonContent]] and
    * BEFORE [[decodeEntities]], so decoded `&lt;` cannot resurrect a
    * tag). */
  def stripTags(c: Column): Column = regexp_replace(c, "<[^>]*>", " ")

  /** The five named entities + apostrophe that dominate real crawl
    * text. `&amp;` decodes LAST — the standard order, so `&amp;lt;`
    * yields the literal string `&lt;` instead of double-decoding. */
  def decodeEntities(c: Column): Column =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(c) { case (acc, (e, ch)) => replace(acc, lit(e), lit(ch)) }

  private def normWs(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** [[visibleText]] minus the non-content strip — for callers that
    * already hold a [[stripNonContent]]'d body (linkDensity strips
    * once and reuses it; re-running four full-page regex passes in
    * the documented hot path would double the scan cost). */
  private def visibleOfStripped(body: Column): Column =
    normWs(decodeEntities(stripTags(body)))

  /** Everything the page renders, flattened: non-content stripped,
    * tags to spaces, entities decoded, whitespace collapsed. The
    * "view-source:" complement of [[mainText]] — keeps nav chrome and
    * footers, so use it for page-level signals, not training text. */
  def visibleText(c: Column): Column =
    visibleOfStripped(stripNonContent(c))

  /** `<title>` contents (first match), entity-decoded and
    * whitespace-collapsed; empty string when absent. */
  def htmlTitle(c: Column): Column =
    normWs(decodeEntities(
      regexp_extract(c, "(?is)<title[^>]*>(.*?)</title>", 1)))

  /** Anchor-element matcher: `<a>` bare or `<a ...attrs>` — the
    * `(?:\s[^>]*)?` keeps `<article>`/`<aside>`/`<abbr>`/`<audio>`
    * from being read as anchor opens (a prefix-match there would
    * lazily swallow prose up to the next real `</a>` and score whole
    * articles as link text). The close is exact: `</article>` does
    * not contain `</a>` followed by `>`. */
  private val AnchorRe = "(?is)<a(?:\\s[^>]*)?>.*?</a>"

  private def anchorVisible(c: Column): Column =
    normWs(decodeEntities(stripTags(
      array_join(regexp_extract_all(c, lit(AnchorRe), lit(0)), " "))))

  /** Share of visible characters that sit inside `<a>` anchors — THE
    * boilerplate signal (nav bars and footers are nearly all links;
    * prose is nearly none). 0.0 on empty pages. */
  def linkDensity(c: Column): Column = {
    val body = stripNonContent(c)
    val vis = length(visibleOfStripped(body)).cast("double")
    val anc = length(anchorVisible(body)).cast("double")
    when(vis > 0, round(anc / vis, 6)).otherwise(lit(0.0))
  }

  /** Raw block segments: non-content stripped, block-level tags
    * replaced by a \\u0001 sentinel, split. Inline tags (anchors!)
    * survive inside each segment for per-block scoring. The
    * `(\\s[^>]*|/)?` suffix anchors the tag NAME: `<path>`/`<param>`
    * must not match the `p` alternative, while `<p>`, `<p class=x>`,
    * and `<br/>` all do. */
  private def rawBlocks(c: Column): Column =
    split(regexp_replace(stripNonContent(c),
      s"(?i)</?($BlockTags)(\\s[^>]*|/)?>", "\u0001"), "\u0001")

  /** Per-block structs: cleaned text, word count, link density —
    * the audit surface behind [[mainText]]'s keep decision. */
  def blockStats(c: Column): Column =
    filter(
      transform(rawBlocks(c), b => {
        val txt = normWs(decodeEntities(stripTags(b)))
        val anc = anchorVisible(b)
        struct(
          txt.as("text"),
          when(length(txt) === 0, lit(0))
            .otherwise(size(split(txt, " "))).cast("long").as("words"),
          when(length(txt) > 0,
            round(length(anc).cast("double") / length(txt), 6))
            .otherwise(lit(0.0)).as("link_density"))
      }),
      b => b.getField("words") > 0)

  /** All anchor href targets (quoted attribute values, double- then
    * single-quoted — two RE2-safe passes since RE2 cannot express
    * "either quote" without a backreference). Raw values: relative
    * links and fragments included, so the caller decides what enters
    * the link graph (the absolute-scheme filter in q_outlink_hosts is
    * the usual one). Unquoted hrefs — rare in real markup, invalid in
    * XHTML — are not matched; documented, not silent. */
  def outlinks(c: Column): Column =
    concat(
      regexp_extract_all(c, lit("(?is)<a\\s[^>]*?href\\s*=\\s*\"([^\"]*)\""),
        lit(1)),
      regexp_extract_all(c, lit("(?is)<a\\s[^>]*?href\\s*=\\s*'([^']*)'"),
        lit(1)))

  /** jusText-lite content extraction: keep blocks with at least
    * `minWords` words AND link density at most `maxLinkDensity`; the
    * kept blocks joined by single newlines are the training text.
    * Nav bars and footers fail the density test, short chrome
    * ("Menu", "© 2026") fails the length test, prose passes both —
    * the two-signal core of jusText with the stopword refinement left
    * to the downstream Gopher gate (which already owns a stopword
    * list). */
  def mainText(c: Column, minWords: Int = DefaultMinWords,
               maxLinkDensity: Double = DefaultMaxLinkDensity): Column =
    array_join(
      transform(
        filter(blockStats(c), b =>
          b.getField("words") >= minWords &&
            b.getField("link_density") <= maxLinkDensity),
        b => b.getField("text")),
      "\n")
}
