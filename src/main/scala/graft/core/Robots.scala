package graft.core

/** robots.txt parsing + longest-match allow/disallow per RFC 9309.
  *
  * Absent in the reference (SURVEY.md §2.H H5) — added by the north rule.
  * Only the `*` user-agent group is honored (the engine presents one agent).
  * Pure Scala; rules are broadcast as a small per-host table in the engine.
  */
object Robots {

  final case class Rules(
      allow: Vector[String],
      disallow: Vector[String],
      crawlDelay: Option[Double]
  )

  val empty: Rules = Rules(Vector.empty, Vector.empty, None)

  /** Parse a robots.txt body. Collects rules from every `User-agent: *`
    * group (multiple groups merge, per RFC 9309 §2.2.1). */
  def parse(body: String): Rules = {
    var inStar = false
    var sawAgentLine = false
    var allow = Vector.empty[String]
    var disallow = Vector.empty[String]
    var delay: Option[Double] = None
    body.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.take(colon).trim.toLowerCase
        val value = line.drop(colon + 1).trim
        key match {
          case "user-agent" =>
            // a new agent line after rules starts a new group
            if (!sawAgentLine) { inStar = value == "*"; sawAgentLine = true }
            else inStar = inStar || value == "*"
          case "allow" =>
            sawAgentLine = false
            if (inStar && value.nonEmpty) allow :+= value
          case "disallow" =>
            sawAgentLine = false
            if (inStar && value.nonEmpty) disallow :+= value
          case "crawl-delay" =>
            sawAgentLine = false
            if (inStar) delay = value.toDoubleOption.orElse(delay)
          case _ => sawAgentLine = false
        }
      }
    }
    Rules(allow, disallow, delay)
  }

  /** Does `rule` (with `*` wildcards and `$` end-anchor) match path? Returns
    * the matched rule length for specificity ranking, or -1. */
  private[core] def matchLen(rule: String, path: String): Int = {
    val anchored = rule.endsWith("$")
    val r = if (anchored) rule.dropRight(1) else rule
    val parts = r.split("\\*", -1)
    // greedy sequential match of literal parts
    var pos = 0
    var ok = true
    var i = 0
    while (ok && i < parts.length) {
      val part = parts(i)
      if (i == 0) {
        if (path.startsWith(part)) pos = part.length else ok = false
      } else {
        val found = path.indexOf(part, pos)
        if (found < 0) ok = false else pos = found + part.length
      }
      i += 1
    }
    if (!ok) -1
    else if (anchored && pos != path.length && parts.last.nonEmpty) -1
    else r.length
  }

  /** RFC 9309 §2.2.2: most-specific (longest) rule wins; tie → allow. */
  def allowed(rules: Rules, path: String): Boolean = {
    val bestAllow = rules.allow.map(matchLen(_, path)).foldLeft(-1)(math.max)
    val bestDisallow = rules.disallow.map(matchLen(_, path)).foldLeft(-1)(math.max)
    bestAllow >= bestDisallow // no match at all (-1 vs -1) ⇒ allowed
  }
}
