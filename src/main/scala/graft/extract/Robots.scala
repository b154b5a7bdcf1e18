package graft.extract

/** robots.txt evaluation — the crawl-politeness operator every fetch
  * frontier needs: given a host's robots.txt and a URL path, decide
  * whether the default agent may fetch it, and surface Crawl-delay.
  *
  * Implements the core of REP (RFC 9309) for `User-agent: *` groups:
  * rule values are matched as path patterns with the RFC §2.2.3 special
  * characters — `*` matches any (possibly empty) character sequence and
  * a trailing `$` anchors the pattern to the end of the path; without
  * `$` a rule matches any path it covers as a prefix. The most specific
  * match wins (octet length of the rule value, the RFC's longest-match),
  * Allow wins ties, empty Disallow = allow-all, missing file =
  * allow-all. Percent-encodings are normalized on BOTH sides before
  * matching (RFC 9309 §2.2.2 consistency): escapes of unreserved
  * characters decode ("%7E" ≡ "~"), other escapes keep their encoding
  * with uppercased hex ("%2f" ≡ "%2F" but ≠ "/"); escapes never decode
  * into `*`/`$` metacharacters since those are reserved. Line-tolerant
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

  private def isUnreserved(v: Int): Boolean =
    (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') || (v >= '0' && v <= '9') ||
      v == '-' || v == '.' || v == '_' || v == '~'

  /** Percent-encoding normalization (RFC 9309 §2.2.2 / RFC 3986 §6.2.2):
    * decode escapes of unreserved characters, uppercase the hex of the
    * rest, pass malformed escapes through literally. Cheap fast-path
    * when no '%' is present.
    */
  private[graft] def normalizePct(s: String): String = {
    if (s == null || s.indexOf('%') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val hex =
        if (c == '%' && i + 2 < s.length)
          (Character.digit(s.charAt(i + 1), 16), Character.digit(s.charAt(i + 2), 16))
        else (-1, -1)
      if (hex._1 >= 0 && hex._2 >= 0) {
        val v = (hex._1 << 4) | hex._2
        if (isUnreserved(v)) sb.append(v.toChar)
        else sb.append('%').append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Does `rule` (with `*` wildcards and an optional trailing `$`
    * end-anchor, RFC 9309 §2.2.3) match `path`? Unanchored rules match
    * any path they cover as a prefix; a `$` anywhere but the end is a
    * literal octet. Iterative star-backtracking — linear-ish, no regex
    * compilation per call.
    */
  private[graft] def matches(rule: String, path: String): Boolean = {
    val anchored = rule.nonEmpty && rule.charAt(rule.length - 1) == '$'
    val pat = if (anchored) rule.substring(0, rule.length - 1) else rule
    var pi = 0
    var si = 0
    var star = -1 // index just past the last '*' tried
    var ss = 0 // path position that star is currently consuming up to
    while (true) {
      if (!anchored && pi == pat.length) return true // prefix matched
      if (si == path.length) {
        var p = pi // trailing stars match the empty tail
        while (p < pat.length && pat.charAt(p) == '*') p += 1
        return p == pat.length
      }
      if (pi < pat.length && pat.charAt(pi) == '*') { star = pi + 1; pi += 1; ss = si }
      else if (pi < pat.length && pat.charAt(pi) == path.charAt(si)) { pi += 1; si += 1 }
      else if (star >= 0) { pi = star; ss += 1; si = ss } // widen the last star
      else return false
    }
    false // unreachable
  }

  /** most-specific-match decision (octet length of the rule value, the
    * RFC's longest-match); Allow wins equal-specificity ties
    */
  def allowed(rules: Rules, path: String): Boolean = {
    val p = normalizePct(if (path == null || path.isEmpty) "/" else path)
    def best(rs: Seq[String]): Int =
      rs.iterator.map(normalizePct)
        .filter(matches(_, p)).map(_.length).maxOption.getOrElse(-1)
    best(rules.allows) >= best(rules.disallows)
  }
}
