package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.UrlFunctions

/** robots.txt parsing and URL gating (RFC 9309, the Robots Exclusion
  * Protocol) — the compliance step between outlink extraction and
  * fetch scheduling in a crawl pipeline. The reference charter has no
  * crawl surface; this extends the engine alongside
  * [[graft.functions.HtmlFunctions.outlinks]] / [[LinkGraph]].
  *
  * Scope: group resolution (consecutive `User-agent` lines share a
  * group; rules bind to every agent of the group), specific-agent
  * precedence over `*`, longest-match rule selection with Allow
  * winning ties, `*` wildcards and the `$` end anchor, comment and
  * blank-line handling. Out of scope: `Crawl-delay`/`Sitemap`
  * extensions (non-normative) — unknown directives are ignored, as
  * the RFC requires.
  */
object Robots {

  /** Parse robots.txt bodies into a rules table: one row per
    * Allow/Disallow line × agent of its group —
    * `(host, agent, rule, pattern)`, agent lowercased, empty-value
    * rules dropped (an empty `Disallow:` permits everything — a
    * no-op as a rule row).
    *
    * Plan: split + posexplode the body (per-row work), then two
    * per-HOST windows (group-start detection via lag, group id via
    * running sum) — window partitions are one robots FILE each,
    * bounded by the file's line count, never by corpus size. */
  def parseRules(robots: DataFrame, hostCol: String,
                 txtCol: String): DataFrame = {
    val lines = robots
      .select(col(hostCol).as("host"),
        posexplode(split(col(txtCol), "\n")).as(Seq("line_no", "raw")))
      // strip comments, then whitespace
      .withColumn("line", trim(regexp_replace(col("raw"), "#.*$", "")))
      .filter(length(col("line")) > 0)
      .select(col("host"), col("line_no"),
        lower(trim(regexp_extract(col("line"),
          "^([A-Za-z-]+)\\s*:", 1))).as("directive"),
        trim(regexp_extract(col("line"), "^[A-Za-z-]+\\s*:(.*)$", 1))
          .as("value"))
      .filter(col("directive").isin("user-agent", "allow", "disallow"))
    val byLine = Window.partitionBy("host").orderBy("line_no")
    val grouped = lines
      // a user-agent line NOT preceded by another user-agent line
      // starts a new group (consecutive UA lines share the group)
      .withColumn("starts_group",
        (col("directive") === "user-agent" &&
          coalesce(lag(col("directive"), 1).over(byLine), lit("")) =!=
            "user-agent").cast("int"))
      .withColumn("grp", sum(col("starts_group")).over(byLine))
      .filter(col("grp") > 0) // rules before any user-agent line: ignored
    val agents = grouped.filter(col("directive") === "user-agent")
      .select(col("host"), col("grp"), lower(col("value")).as("agent"))
      .distinct()
    val rules = grouped
      .filter(col("directive") =!= "user-agent" && length(col("value")) > 0)
      .select(col("host"), col("grp"), col("directive").as("rule"),
        col("value").as("pattern"))
    agents.join(rules, Seq("host", "grp"))
      .select("host", "agent", "rule", "pattern")
  }

  /** Translate a robots path pattern into a SQL LIKE pattern (escape
    * `\ % _`, `*` becomes `%`, a trailing `$` anchors the end,
    * otherwise the pattern is a prefix). Plain string `replace` —
    * replays verbatim in any engine. */
  private def likePattern(p: Column): Column = {
    val esc = replace(replace(replace(p,
      lit("\\"), lit("\\\\")), lit("%"), lit("\\%")), lit("_"), lit("\\_"))
    val anchored = p.endsWith("$")
    // the '$' anchor is always the LAST char, and the escapes above
    // never append — so stripping esc's last char strips exactly it
    val core = when(anchored, esc.substr(lit(1), length(esc) - 1))
      .otherwise(esc)
    concat(replace(core, lit("*"), lit("%")),
      when(anchored, lit("")).otherwise(lit("%")))
  }

  /** Gate URLs against parsed rules for `agent`: each URL joined to
    * its host's applicable group (the agent's own group when the host
    * defines one, else the `*` group — RFC precedence), every rule
    * LIKE-matched against the path, and the longest matching pattern
    * decides (Allow wins length ties). URLs whose host has no rules,
    * or no matching rule, are allowed — the RFC default.
    *
    * 100-TB shape: the rules side is robots-file-sized (crawl-scale:
    * millions of hosts × tens of rules — still dwarfed by the URL
    * side); the join is a plain equi-join on host, so Spark broadcasts
    * it when it fits and shuffles by host otherwise, and the decisive
    * aggregation is a map-side-combinable max(struct) per URL. One
    * scan of the URL side, no window over URLs.
    *
    * Output: url, host, path, allowed, rule + pattern that decided
    * (null when the default applied). */
  def gate(urls: DataFrame, urlCol: String, rules: DataFrame,
           agent: String): DataFrame = {
    val u = urls.select(col(urlCol).as("url"),
      UrlFunctions.urlBareHost(col(urlCol)).as("host"),
      // empty path means "/" for matching purposes
      when(length(UrlFunctions.urlPathQuery(col(urlCol))) === 0, lit("/"))
        .otherwise(UrlFunctions.urlPathQuery(col(urlCol))).as("path"))
    val a = lit(agent.toLowerCase)
    // per host: does a group for OUR agent exist?
    val hostHasSpecific = rules.filter(col("agent") === a)
      .select(col("host")).distinct()
      .withColumn("has_specific", lit(true))
    val applicable = rules
      .join(hostHasSpecific, Seq("host"), "left")
      .filter(col("agent") === a ||
        (col("agent") === "*" && col("has_specific").isNull))
      .select(col("host"), col("rule"), col("pattern"),
        likePattern(col("pattern")).as("like_pat"))
    val matched = u.join(applicable, Seq("host"), "left")
      .withColumn("hit",
        col("pattern").isNotNull &&
          expr("path like like_pat escape '\\\\'"))
      // decisive rule: longest pattern, allow beats disallow on ties
      .groupBy("url", "host", "path")
      .agg(max(when(col("hit"), struct(
        length(col("pattern")).as("len"),
        (col("rule") === "allow").as("is_allow"),
        col("rule").as("rule"),
        col("pattern").as("pattern")))).as("win"))
    matched.select(col("url"), col("host"), col("path"),
      coalesce(col("win.is_allow"), lit(true)).as("allowed"),
      col("win.rule").as("rule"), col("win.pattern").as("pattern"))
  }
}
