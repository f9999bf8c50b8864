package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** robots.txt compliance filtering (RFC 9309, public) — the crawl-
  * politeness leg of the curation front door beside WarcSource/q119/
  * q123: a corpus built from crawl data must be able to EXCLUDE
  * documents whose URLs the origin disallowed. Beyond-reference
  * component motivated by SURVEY §2.E's curation chain.
  *
  * Three pieces, each independently spec'd and composed under q146:
  *
  *  - [[parseRules]]: the robots.txt GROUP grammar — consecutive
  *    User-agent lines introduce a group, rules bind to the nearest
  *    preceding group, field names are case-insensitive, `#` starts
  *    a comment, empty Allow/Disallow values are no-ops (the
  *    original "Disallow:" nothing = allow-everything convention),
  *    and only groups naming `*` apply (per-product tokens are a
  *    caller concern).
  *  - [[pathMatches]]: RFC path patterns — literal octets plus `*`
  *    (any run, including empty) and a TERMINAL `$` end anchor
  *    (non-terminal `$` is literal); an unanchored pattern matches
  *    any path it prefixes. Iterative greedy-backtrack glob, O(n·m)
  *    worst case, no regex compilation per row.
  *  - [[decide]]: the precedence rule — among matching rules the
  *    MOST SPECIFIC (longest pattern in octets) wins, an Allow beats
  *    a Disallow of equal length, no match defaults to allow. The
  *    priority is the combined integer key len·2 + allow (the q138
  *    argmin discipline applied to argmax), tie on the full key
  *    broken by the lexicographically LARGEST rule path (max-struct
  *    semantics, deterministic on any engine).
  *
  * Scale shape: rules tables are domains × a handful of rows —
  * broadcast; the match is map-side; the per-URL argmax is one
  * partial-aggregated groupBy on the URL id. The corpus never
  * shuffles beyond that single bounded aggregate.
  */
object Robots {

  /** One group rule: Allow (true) / Disallow (false) + path pattern. */
  case class Rule(allow: Boolean, path: String)

  /** Parse a robots.txt body, returning the rules of every group
    * that names user-agent `*`. Null-safe (null → no rules). */
  def parseRules(txt: String): Seq[Rule] = {
    if (txt == null) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[Rule]
    var agents = Set.empty[String]
    var collectingAgents = true
    txt.split("\n", -1).foreach { raw =>
      val noComment = {
        val h = raw.indexOf('#')
        if (h >= 0) raw.substring(0, h) else raw
      }
      val line = noComment.trim
      if (line.nonEmpty) {
        val c = line.indexOf(':')
        if (c > 0) {
          val key = line.substring(0, c).trim.toLowerCase
          val value = line.substring(c + 1).trim
          key match {
            case "user-agent" =>
              if (!collectingAgents) { agents = Set.empty; collectingAgents = true }
              agents += value.toLowerCase
            case "allow" | "disallow" =>
              collectingAgents = false
              if (value.nonEmpty && agents.contains("*"))
                out += Rule(key == "allow", value)
            case _ =>
              // Crawl-delay, Sitemap, unknown fields: close the
              // agent-collection phase but contribute no rules
              collectingAgents = false
          }
        }
      }
    }
    out.toSeq
  }

  /** RFC 9309 path-pattern match: `*` matches any octet run, a
    * TERMINAL `$` anchors the end, everything else is literal; an
    * unanchored pattern matches any path it prefixes (equivalent to
    * appending `*`). Iterative greedy backtracking. */
  def pathMatches(path: String, pattern: String): Boolean = {
    if (path == null || pattern == null) return false
    val anchored = pattern.endsWith("$")
    val body = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    val p = if (anchored) body else body + "*"
    var i = 0
    var j = 0
    var star = -1
    var mark = 0
    while (i < path.length) {
      if (j < p.length && (p.charAt(j) == path.charAt(i))) { i += 1; j += 1 }
      else if (j < p.length && p.charAt(j) == '*') { star = j; mark = i; j += 1 }
      else if (star >= 0) { j = star + 1; mark += 1; i = mark }
      else return false
    }
    while (j < p.length && p.charAt(j) == '*') j += 1
    j == p.length
  }

  /** Rules of the `*` group as an exploded column of
    * array<struct<allow, path>> (map-side, for parsing a per-domain
    * robots corpus). */
  def parseRulesUdf: UserDefinedFunction =
    udf((txt: String) => parseRules(txt).map(r => (r.allow, r.path)))

  def pathMatchesUdf: UserDefinedFunction =
    udf((path: String, pattern: String) => pathMatches(path, pattern))

  /** Per-URL crawl decision under per-domain rules.
    * @param urls  (idCol, domainCol, pathCol)
    * @param rules (domainCol, "allow": boolean, "rpath": string) —
    *              domains × few rows; broadcast by size
    * @return idCol, domainCol, pathCol, allowed, rule_path
    *         (null = default allow), rule_len (null likewise)
    */
  def decide(urls: DataFrame, rules: DataFrame, idCol: String,
             domainCol: String, pathCol: String): DataFrame = {
    val m = urls.join(rules, Seq(domainCol))
      .filter(pathMatchesUdf(col(pathCol), col("rpath")))
      .withColumn("_prio",
        length(col("rpath")).cast("long") * 2 + col("allow").cast("long"))
    val won = m.groupBy(col(idCol))
      .agg(max(struct(col("_prio"), col("rpath"))).as("_w"))
      .select(col(idCol), col("_w._prio").as("_prio"), col("_w.rpath").as("rule_path"))
    urls.join(won, Seq(idCol), "left")
      .select(col(idCol), col(domainCol), col(pathCol),
        coalesce(col("_prio") % 2 === 1, lit(true)).as("allowed"),
        col("rule_path"),
        expr("_prio div 2").as("rule_len"))
  }
}
