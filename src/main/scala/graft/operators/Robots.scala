package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Robots Exclusion Protocol (RFC 9309) evaluation — the crawl-
  * etiquette filter every pipeline re-applies when reprocessing an
  * archive: a URL is fetchable iff the governing robots.txt group's
  * MOST SPECIFIC matching rule allows it (longest pattern wins; a tie
  * between Allow and Disallow resolves to Allow — the RFC's
  * least-restrictive rule). No matching rule → allowed.
  *
  * Scale shape: robots bodies are one small document per HOST — a
  * bounded dimension next to the URL corpus — so the rule table
  * parses once ([[graft.plans.RobotsRules]], regexes precompiled into
  * the rows) and joins BROADCAST onto the URLs by host; the per-URL
  * decision is a narrow HOF over that host's few rules.
  */
object Robots {

  /** body + agent → array<struct<allow, pattern, regex>> (RFC 9309
    * group selection: exact-agent groups beat `*`, same-agent groups
    * merge) */
  def rules(body: Column, agent: String): Column = {
    import org.apache.spark.sql.graftshim.GraftShim
    GraftShim.column(graft.plans.RobotsRules(GraftShim.expression(body), agent))
  }

  /** the decision for `pathStr` (path + optional ?query) under
    * `rulesCol`: longest matching pattern wins, ties go to Allow,
    * nothing matches → allowed */
  def isAllowed(pathStr: Column, rulesCol: Column): Column = {
    // Column.rlike only takes a literal; build the expression form
    // (non-foldable pattern → per-row compile, fine for a host's few rules)
    def rlikeCol(s: Column, re: Column): Column = {
      import org.apache.spark.sql.graftshim.GraftShim
      GraftShim.column(org.apache.spark.sql.catalyst.expressions.RLike(
        GraftShim.expression(s), GraftShim.expression(re)))
    }
    val matched = filter(rulesCol, r => rlikeCol(pathStr, r.getField("regex")))
    val best = aggregate(
      matched,
      struct(lit(-1).as("l"), lit(true).as("a")),
      (acc, r) => {
        val len = length(r.getField("pattern"))
        val take = len > acc.getField("l") ||
          (len === acc.getField("l") && r.getField("allow"))
        struct(
          when(take, len).otherwise(acc.getField("l")).as("l"),
          when(take, r.getField("allow")).otherwise(acc.getField("a")).as("a"))
      },
      acc => acc.getField("a"))
    coalesce(best, lit(true))
  }

  /** URL → the string robots matching runs on: path + `?query`
    * (fragment ignored); bare "/" for URLs without a path */
  def matchPath(url: Column): Column = {
    val afterScheme = regexp_replace(substring_index(url, "#", 1),
      "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val pq = regexp_replace(afterScheme, "^[^/?]*", "")
    when(length(pq) === 0, lit("/")).otherwise(pq)
  }

  /** Corpus minus robots-disallowed URLs: `robots` is (host, body) —
    * one row per host, parsed once and broadcast; URLs join by
    * [[TextFns.extractDomain]] host. A URL whose host has no
    * robots.txt row is ALLOWED (the RFC's missing-file semantics). */
  def dropDisallowed(
      df: DataFrame,
      urlCol: String,
      robots: DataFrame,
      agent: String = "*"): DataFrame = {
    val hostCol = robots.columns.head
    val bodyCol = robots.columns(1)
    val parsed = robots.select(
      lower(col(hostCol)).as("__rhost"),
      rules(col(bodyCol), agent).as("__rules"))
    df.join(broadcast(parsed),
        lower(TextFns.extractDomain(col(urlCol))) === col("__rhost"), "left")
      .filter(col("__rules").isNull ||
        isAllowed(matchPath(col(urlCol)), col("__rules")))
      .drop("__rhost", "__rules")
  }
}
