package graft.operators

import scala.collection.mutable.ArrayBuffer

/**
 * Robots Exclusion Protocol (RFC 9309) — the fetch-policy side of the
 * crawl stack: before a frontier URL is fetched, the host's
 * `/robots.txt` decides whether this crawler may take it. Completes
 * the ingest chain next to [[UrlOps]] (frontier keys) and
 * [[HtmlExtract]] (link discovery): discovered edge → canonical URL →
 * POLICY GATE → fetch. Pure Scala, scan-local, total — robots.txt in
 * the wild is as hostile as every other crawl input.
 *
 * Semantics per RFC 9309:
 *  - groups: one or more `User-agent:` lines followed by
 *    `Allow:`/`Disallow:` rules; a crawler obeys EXACTLY ONE group —
 *    the most specific matching user-agent, else the `*` group, else
 *    everything is allowed (§2.2.1);
 *  - rule paths support `*` (any char run) and `$` (end anchor), and
 *    match as PATH PREFIXES otherwise (§2.2.2);
 *  - among matching rules the LONGEST pattern wins; at equal length
 *    Allow beats Disallow (§2.2.2);
 *  - an empty `Disallow:` value allows everything (matches nothing);
 *  - `Sitemap:` is collected globally; `Crawl-delay:` (the de-facto
 *    extension) is kept per group;
 *  - unknown fields and malformed lines are skipped, comments (`#`)
 *    stripped — parsing never throws.
 */
object RobotsTxt {

  /** One access rule; `pattern` as written (including a trailing `$`),
    * so specificity comparisons use the written length. */
  final case class Rule(allow: Boolean, pattern: String)

  /** One user-agent group: the agent tokens (lowercased) it names,
    * its rules in file order, and an optional crawl delay. */
  final case class Group(
      agents: Seq[String], rules: Seq[Rule], crawlDelay: Option[Double])

  final case class Robots(groups: Seq[Group], sitemaps: Seq[String])

  val AllowAll: Robots = Robots(Nil, Nil)

  /** Parse a robots.txt body. Total: malformed lines are skipped. */
  def parse(content: String): Robots = {
    if (content == null) return AllowAll
    val groups = ArrayBuffer.empty[(ArrayBuffer[String], ArrayBuffer[Rule], Option[Double])]
    val sitemaps = ArrayBuffer.empty[String]
    var inAgentRun = false // consecutive user-agent lines share a group
    content.split("\n", -1).foreach { rawLine =>
      val noComment = {
        val h = rawLine.indexOf('#')
        if (h < 0) rawLine else rawLine.substring(0, h)
      }
      val line = noComment.trim
      val ci = line.indexOf(':')
      if (ci > 0) {
        val field = line.substring(0, ci).trim.toLowerCase
        val value = line.substring(ci + 1).trim
        field match {
          case "user-agent" =>
            if (!inAgentRun || groups.isEmpty) {
              groups += ((ArrayBuffer.empty[String], ArrayBuffer.empty[Rule], None))
              inAgentRun = true
            }
            if (value.nonEmpty) groups.last._1 += value.toLowerCase
          case "allow" | "disallow" =>
            inAgentRun = false
            if (groups.nonEmpty && value.nonEmpty)
              groups.last._2 += Rule(field == "allow", value)
          case "sitemap" =>
            inAgentRun = false
            if (value.nonEmpty) sitemaps += value
          case "crawl-delay" =>
            inAgentRun = false
            if (groups.nonEmpty && groups.last._3.isEmpty)
              try {
                val d = value.toDouble
                if (!d.isNaN && !d.isInfinite && d >= 0) {
                  val (a, r, _) = groups.last
                  groups(groups.length - 1) = (a, r, Some(d))
                }
              } catch { case _: NumberFormatException => () }
          case _ => inAgentRun = false // unknown field: skipped
        }
      }
    }
    Robots(groups.map { case (a, r, cd) => Group(a.toSeq, r.toSeq, cd) }.toSeq,
      sitemaps.toSeq)
  }

  /** Does rule `pattern` match `path`? Prefix semantics with `*` any-
    * run and `$` end anchor (RFC 9309 §2.2.2 "octet-by-octet"). */
  def matches(pattern: String, path: String): Boolean = {
    if (pattern.isEmpty || path == null) return false
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.dropRight(1) else pattern
    val segs = p.split("\\*", -1)
    var pos = 0
    var i = 0
    while (i < segs.length) {
      val seg = segs(i)
      if (i == 0) {
        if (!path.startsWith(seg)) return false
        pos = seg.length
      } else if (i == segs.length - 1 && anchored) {
        // final segment must end the path, at or after pos
        return path.endsWith(seg) && path.length - seg.length >= pos
      } else {
        val idx = path.indexOf(seg, pos)
        if (idx < 0) return false
        pos = idx + seg.length
      }
      i += 1
    }
    if (anchored) pos == path.length else true
  }

  /** The ONE group a crawler obeys: the most specific (longest) agent
    * token that prefixes the crawler's lowercased product token, else
    * the `*` group, else None (→ everything allowed). */
  def selectGroup(robots: Robots, userAgent: String): Option[Group] = {
    val ua = if (userAgent == null) "" else userAgent.toLowerCase
    val named = robots.groups
      .flatMap(g => g.agents.filter(a => a != "*" && ua.startsWith(a))
        .map(a => (a.length, g)))
    if (named.nonEmpty) Some(named.maxBy(_._1)._2)
    else robots.groups.find(_.agents.contains("*"))
  }

  /** RFC 9309 §2.2.2 decision for (crawler, path): longest matching
    * pattern wins; equal length → Allow; no match → allowed. */
  def isAllowed(robots: Robots, userAgent: String, path: String): Boolean =
    selectGroup(robots, userAgent) match {
      case None => true
      case Some(g) =>
        val applicable = g.rules.filter(r => matches(r.pattern, path))
        if (applicable.isEmpty) true
        else {
          val maxLen = applicable.map(_.pattern.length).max
          applicable.filter(_.pattern.length == maxLen).exists(_.allow)
        }
    }

  /** The group's crawl delay for this crawler, if declared. */
  def crawlDelay(robots: Robots, userAgent: String): Option[Double] =
    selectGroup(robots, userAgent).flatMap(_.crawlDelay)
}
