package graft.extract

/** robots.txt evaluation — the crawl-politeness operator every fetch
  * frontier needs: given a host's robots.txt and a URL path, decide
  * whether the default agent may fetch it, and surface Crawl-delay.
  *
  * Implements the core of REP (RFC 9309) for `User-agent: *` groups:
  * longest-match wins between Allow/Disallow prefixes, Allow wins ties,
  * empty Disallow = allow-all, missing file = allow-all. Line-tolerant
  * (comments, stray whitespace, unknown directives ignored) — the same
  * never-throw discipline as the rest of the extraction kernel.
  */
object Robots {

  final case class Rules(allows: Seq[String], disallows: Seq[String],
                         crawlDelay: Option[Int])

  /** Parse the `User-agent: *` group(s) of a robots.txt body. */
  def parse(body: String): Rules = {
    if (body == null) return Rules(Nil, Nil, None)
    var inStar = false
    var afterAgentLine = false // directives attach to the last UA group
    val allows = Seq.newBuilder[String]
    val disallows = Seq.newBuilder[String]
    var delay: Option[Int] = None
    body.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val c = line.indexOf(':')
      if (c > 0) {
        val key = line.substring(0, c).trim.toLowerCase
        val value = line.substring(c + 1).trim
        key match {
          case "user-agent" =>
            // a UA line after directives starts a NEW group (RFC 9309 §2.1)
            if (afterAgentLine) inStar = value == "*"
            else inStar = inStar || value == "*"
            afterAgentLine = false
          case "allow" =>
            afterAgentLine = true
            if (inStar && value.nonEmpty) allows += value
          case "disallow" =>
            afterAgentLine = true
            if (inStar && value.nonEmpty) disallows += value
          case "crawl-delay" =>
            afterAgentLine = true
            if (inStar) delay = value.toIntOption.orElse(delay)
          case _ => afterAgentLine = true // unknown directive: tolerated
        }
      }
    }
    Rules(allows.result(), disallows.result(), delay)
  }

  /** longest-prefix-match decision; Allow wins equal-length ties */
  def allowed(rules: Rules, path: String): Boolean = {
    val p = if (path == null || path.isEmpty) "/" else path
    val bestAllow = rules.allows.filter(p.startsWith).map(_.length).maxOption.getOrElse(-1)
    val bestDis = rules.disallows.filter(p.startsWith).map(_.length).maxOption.getOrElse(-1)
    bestAllow >= bestDis
  }
}
