package graft.sources

import scala.collection.mutable.ArrayBuffer

/** robots.txt parsing + allow/deny evaluation — the crawl-side gate every
  * pipeline applies before a URL enters the corpus. From-scratch
  * implementation of the de-facto standard (RFC 9309):
  *
  *   - groups: consecutive `User-agent:` lines share the following rules;
  *     group selection is longest-agent-substring match, `*` as fallback
  *   - rules: `Allow:` / `Disallow:` path patterns; `*` matches any char
  *     run, a trailing `$` anchors the end; empty Disallow = allow all
  *   - decision: the MOST SPECIFIC matching rule wins (longest pattern,
  *     ties → Allow), per RFC 9309 §2.2.2; no match = allowed
  *   - `Crawl-delay` and `Sitemap` are surfaced, comments (`#`) stripped,
  *     unknown directives ignored (spec behavior)
  *
  * Pure per-host function: parse once, evaluate per URL — at scale robots
  * rows live in a small per-host table broadcast against the frontier.
  */
object Robots {

  final case class Rule(allow: Boolean, pattern: String)

  final case class Policy(
      groups: Map[String, Seq[Rule]], // lowercased agent token -> rules
      crawlDelay: Map[String, Double],
      sitemaps: Seq[String]) {

    /** Rules for `agent`: longest agent token that is a substring of the
      * lowercased agent string; `*` fallback; none → empty (allow all).
      */
    def rulesFor(agent: String): Seq[Rule] = {
      val a = agent.toLowerCase
      val named = groups.keys.filter(k => k != "*" && a.contains(k))
      if (named.nonEmpty) groups(named.maxBy(_.length))
      else groups.getOrElse("*", Seq.empty)
    }

    /** Crawl-delay for `agent` — GROUP-consistent with [[rulesFor]]: when
      * a NAMED group governs this agent (even one declaring no delay), the
      * `*` group's delay does NOT apply — a site that addressed the agent
      * specifically and imposed no delay must not be throttled by the
      * generic one. Only agents governed by `*` (or by nothing) inherit
      * the `*` delay; absent everywhere → 0.0 = no politeness constraint.
      * The per-host fetch-budget input: a frontier scheduler multiplies
      * this by the host's queued-page count to plan crawl time.
      */
    def delayFor(agent: String): Double = {
      val a = agent.toLowerCase
      val named = crawlDelay.keys.filter(k => k != "*" && a.contains(k))
      if (named.nonEmpty) crawlDelay(named.maxBy(_.length))
      else if (groups.keys.exists(k => k != "*" && a.contains(k))) 0.0
      else crawlDelay.getOrElse("*", 0.0)
    }

    def isAllowed(agent: String, path: String): Boolean = {
      val matching = rulesFor(agent).filter(r => patternMatches(r.pattern, path))
      if (matching.isEmpty) true
      else {
        // most specific wins; ties -> Allow
        val maxLen = matching.map(_.pattern.length).max
        matching.filter(_.pattern.length == maxLen).exists(_.allow)
      }
    }
  }

  /** `*`-wildcard, `$`-anchored prefix match per RFC 9309 §2.2.3. */
  private[sources] def patternMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.dropRight(1) else pattern
    // greedy segment match: split on '*', require segments in order
    val segs = p.split("\\*", -1)
    var pos = 0
    var i = 0
    while (i < segs.length) {
      val seg = segs(i)
      if (i == 0) {
        if (!path.startsWith(seg)) return false
        pos = seg.length
      } else if (i == segs.length - 1 && anchored) {
        // last segment must END the path
        return path.length - pos >= seg.length && path.endsWith(seg)
      } else {
        val at = path.indexOf(seg, pos)
        if (at < 0) return false
        pos = at + seg.length
      }
      i += 1
    }
    if (anchored) pos == path.length else true
  }

  def parse(content: String): Policy = {
    val groups = scala.collection.mutable.LinkedHashMap.empty[String, ArrayBuffer[Rule]]
    val delays = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val sitemaps = ArrayBuffer.empty[String]
    var currentAgents: List[String] = Nil
    var lastWasAgent = false
    content.linesIterator.foreach { raw =>
      val line = {
        val h = raw.indexOf('#')
        (if (h >= 0) raw.substring(0, h) else raw).trim
      }
      if (line.nonEmpty) {
        val c = line.indexOf(':')
        if (c > 0) {
          val key = line.substring(0, c).trim.toLowerCase
          val value = line.substring(c + 1).trim
          key match {
            case "user-agent" =>
              val agent = value.toLowerCase
              currentAgents = if (lastWasAgent) agent :: currentAgents else List(agent)
              currentAgents.foreach(a => groups.getOrElseUpdate(a, ArrayBuffer.empty))
              lastWasAgent = true
            case "allow" | "disallow" =>
              lastWasAgent = false
              // empty Disallow means "allow everything" — no rule at all
              if (value.nonEmpty) currentAgents.foreach { a =>
                groups.getOrElseUpdate(a, ArrayBuffer.empty) +=
                  Rule(key == "allow", value)
              }
            case "crawl-delay" =>
              lastWasAgent = false
              try currentAgents.foreach(a => delays(a) = value.toDouble)
              catch { case _: NumberFormatException => }
            case "sitemap" =>
              lastWasAgent = false
              if (value.nonEmpty) sitemaps += value
            case _ => lastWasAgent = false // unknown directive: ignored
          }
        } else lastWasAgent = false
      }
    }
    Policy(groups.view.mapValues(_.toSeq).toMap, delays.toMap, sitemaps.toSeq)
  }
}
