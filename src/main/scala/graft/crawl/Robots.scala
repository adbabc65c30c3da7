package graft.crawl

/**
 * Minimal robots.txt parsing (north rule: "robots.txt gating"; the
 * reference's closest analog is its ban-avoidance pacing,
 * /root/reference/weibo.py:697-705 — robots rules are the web-scale
 * generalization).
 *
 * Implements the subset the gating stage consumes: `Disallow:` path prefixes
 * for `User-agent: *` (or a named agent), case-insensitive field names,
 * `#` comments, group semantics per RFC 9309 §2.1 (a group ends at the next
 * user-agent line that starts a new group). `Allow:` is intentionally not
 * modeled — the engine gates on disallow prefixes only (conservative).
 */
object Robots {

  /** Parse a robots.txt body → disallow path prefixes that apply to `agent`
    * (or to `*`). Empty `Disallow:` (allow-all marker) rows are dropped. */
  def disallowPrefixes(robotsTxt: String, agent: String = "*"): Seq[String] = {
    if (robotsTxt == null) return Nil
    val out = Seq.newBuilder[String]
    var inMatchingGroup = false
    var groupHasAgents = false
    robotsTxt.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) {
        val idx = line.indexOf(':')
        if (idx > 0) {
          val field = line.substring(0, idx).trim.toLowerCase
          val value = line.substring(idx + 1).trim
          field match {
            case "user-agent" =>
              if (!groupHasAgents) {
                // continuing the same group's agent list
                inMatchingGroup ||= (value == "*" || value.equalsIgnoreCase(agent))
              } else {
                // a new group starts
                inMatchingGroup = value == "*" || value.equalsIgnoreCase(agent)
              }
              groupHasAgents = false
            case "disallow" =>
              groupHasAgents = true
              if (inMatchingGroup && value.nonEmpty) out += value
            case _ =>
              groupHasAgents = true // any rule line closes the agent list
          }
        }
      }
    }
    out.result()
  }

  /** (host, robotsTxt) pairs → the engine's gating rule rows. */
  def toRules(perHost: Seq[(String, String)], agent: String = "*"): Seq[(String, String)] =
    perHost.flatMap { case (host, txt) =>
      disallowPrefixes(txt, agent).map(p => (host, p))
    }
}
