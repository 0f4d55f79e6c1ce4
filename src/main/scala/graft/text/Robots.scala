package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt evaluation (RFC 9309 semantics) — the crawl-POLICY gate
  * next to the page-level `<meta robots>` check ([[Html.htmlNoindex]]):
  * Common Crawl archives carry each host's robots.txt capture, and a
  * compliant corpus drops pages those rules disallow.
  *
  * Group selection follows the RFC: if any group names the agent
  * exactly (case-insensitive token match), ONLY those groups apply;
  * otherwise the `*` groups do. Rule matching is longest-match-wins by
  * rule length with Allow beating Disallow on ties; `*` wildcards and
  * the `$` end anchor are supported; no matching rule → allowed; an
  * empty/missing robots.txt → allowed.
  *
  * The parser is an irreducibly line-stateful scan (groups are
  * positional), so it runs as a row-local UDF — the wiki-markup
  * precedent, not a codegen loss: it executes once per (host, path)
  * row inside a scan. Scale shape of [[filterAllowed]]: the per-host
  * robots frame is orders smaller than the page corpus; the join keys
  * on the host (AQE handles hot-host skew), and evaluation never
  * shuffles page payloads anywhere else.
  */
object Robots {

  /** Parsed (allow, pathPattern) rules applying to `agent`. */
  def rulesFor(robots: String, agent: String = "*"): Seq[(Boolean, String)] = {
    if (robots == null) return Seq.empty
    val a = agent.toLowerCase
    // (agents, rules) per group; consecutive user-agent lines share rules
    val groups = scala.collection.mutable.ArrayBuffer
      .empty[(scala.collection.mutable.ArrayBuffer[String],
        scala.collection.mutable.ArrayBuffer[(Boolean, String)])]
    var inAgents = false
    for (raw <- robots.linesIterator) {
      val line = raw.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (i > 0) {
        val key = line.substring(0, i).trim.toLowerCase
        val value = line.substring(i + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgents || groups.isEmpty) {
              groups += ((scala.collection.mutable.ArrayBuffer(value.toLowerCase),
                scala.collection.mutable.ArrayBuffer.empty))
            } else groups.last._1 += value.toLowerCase
            inAgents = true
          case "allow" | "disallow" =>
            if (groups.nonEmpty && value.nonEmpty)
              groups.last._2 += ((key == "allow", value))
            inAgents = false
          case _ => inAgents = false
        }
      }
    }
    val exact = groups.filter(_._1.contains(a))
    val chosen = if (exact.nonEmpty) exact else groups.filter(_._1.contains("*"))
    chosen.flatMap(_._2).toSeq
  }

  /** Longest-match verdict for one path (query string included by the
    * caller if desired); Allow wins ties; no match → true.
    */
  def isAllowed(rules: Seq[(Boolean, String)], path: String): Boolean = {
    if (path == null) return true
    def matches(rule: String): Boolean = {
      val anchored = rule.endsWith("$")
      val body = if (anchored) rule.dropRight(1) else rule
      val rx = body.split("\\*", -1).map(java.util.regex.Pattern.quote)
        .mkString(".*")
      val p = java.util.regex.Pattern.compile(
        "^" + rx + (if (anchored) "$" else ".*"))
      p.matcher(path).matches()
    }
    val hit = rules.filter { case (_, r) => matches(r) }
    if (hit.isEmpty) true
    else {
      // longest rule wins; allow beats disallow at equal length
      val maxLen = hit.map(_._2.length).max
      hit.filter(_._2.length == maxLen).exists(_._1)
    }
  }

  /** Column form: allowed(robotsTxt, path) for `agent`. Null robots →
    * allowed; null path → allowed.
    */
  def allowed(robotsTxt: Column, path: Column, agent: String = "*"): Column = {
    val u = udf { (robots: String, p: String) =>
      isAllowed(rulesFor(robots, agent), p)
    }
    u(robotsTxt, path)
  }

  /** Lowercased host of a URL (scheme optional) — the robots join key. */
  def urlHost(url: Column): Column =
    lower(regexp_extract(
      regexp_replace(trim(url), "^[A-Za-z][A-Za-z0-9+.-]*://", ""),
      "^([^/?#]*)", 1))

  /** URL path (+ query) — what robots rules match against. */
  def urlPath(url: Column): Column = {
    val rest = regexp_replace(
      regexp_replace(trim(url), "^[A-Za-z][A-Za-z0-9+.-]*://", ""),
      "^[^/?#]*", "")
    when(rest === "", lit("/")).otherwise(regexp_replace(rest, "#.*$", ""))
  }

  /** Drop pages their host's robots.txt disallows for `agent`.
    * `robotsByHost` needs (host, robots_txt) — build it from the crawl's
    * own robots captures; hosts with no capture allow everything.
    */
  def filterAllowed(pages: DataFrame, urlCol: String,
                    robotsByHost: DataFrame,
                    agent: String = "*"): DataFrame = {
    val joined = pages
      .withColumn("__h", urlHost(col(urlCol)))
      .join(robotsByHost.withColumnRenamed("host", "__h"), Seq("__h"), "left")
    joined
      .filter(col("robots_txt").isNull ||
        allowed(col("robots_txt"), urlPath(col(urlCol)), agent))
      .drop("__h", "robots_txt")
  }
}
