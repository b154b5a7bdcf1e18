package graft.extract

/** robots.txt evaluation — the crawl-politeness operator every fetch
  * frontier needs: given a host's robots.txt, a crawler product token
  * and a URL path, decide whether that agent may fetch it, and surface
  * Crawl-delay.
  *
  * Implements the core of REP (RFC 9309):
  *
  * Group selection (§2.2.1): the file is parsed into groups (one or more
  * `User-agent` lines followed by rules). For a crawler product token,
  * the applicable rules are the union of every group whose user-agent
  * value matches the token EXACTLY (case-insensitive) — the RFC requires
  * merging multiple matching groups. When no group matches exactly, the
  * widely-implemented prefix extension applies (the Googlebot behavior:
  * a `User-agent: graft` group governs the `graftbot` token): groups
  * whose value is the LONGEST prefix of the token win, merged on ties.
  * Only then do the `User-agent: *` groups apply; with no `*` group
  * either, everything is allowed.
  *
  * Rule matching (§2.2.3): rule values are path patterns — `*` matches
  * any (possibly empty) character sequence and a trailing `$` anchors
  * the pattern to the end of the path; without `$` a rule matches any
  * path it covers as a prefix. The most specific match wins (octet
  * length of the rule value, the RFC's longest-match), Allow wins ties,
  * empty Disallow = allow-all, missing file = allow-all.
  *
  * Percent-encodings are normalized on BOTH sides before matching
  * (§2.2.2 consistency): escapes of unreserved characters decode
  * ("%7E" ≡ "~"), other escapes keep their encoding with uppercased hex
  * ("%2f" ≡ "%2F" but ≠ "/"); escapes never decode into `*`/`$`
  * metacharacters since those are reserved. Rule values are normalized
  * ONCE at parse time (they never change after parse); `allowed` only
  * normalizes the probe path — per-row evaluation does zero rule-side
  * allocation. Line-tolerant (comments, stray whitespace, unknown
  * directives ignored) — the same never-throw discipline as the rest of
  * the extraction kernel.
  */
object Robots {

  /** Rule values are stored percent-normalized (see [[normalizePct]]). */
  final case class Rules(allows: Seq[String], disallows: Seq[String],
                         crawlDelay: Option[Int])

  /** one parsed group: its (lowercased) user-agent values + raw rules */
  private final case class Group(agents: List[String], allows: List[String],
                                 disallows: List[String], delay: Option[Int])

  /** Rules for the default `User-agent: *` group(s). */
  def parse(body: String): Rules = parse(body, "*")

  /** Rules applicable to crawler product token `agent` per §2.2.1
    * (exact case-insensitive match merged; else longest-prefix match
    * merged; else the `*` groups merged; else allow-all).
    */
  def parse(body: String, agent: String): Rules = {
    val groups = parseGroups(body)
    val token = if (agent == null) "*" else agent.trim.toLowerCase
    val selected: Seq[Group] =
      if (token == "*") groups.filter(_.agents.contains("*"))
      else {
        val exact = groups.filter(_.agents.contains(token))
        if (exact.nonEmpty) exact
        else {
          val prefixLen = groups.iterator
            .flatMap(_.agents.iterator.filter(a => a != "*" && token.startsWith(a)))
            .map(_.length).maxOption.getOrElse(0)
          if (prefixLen > 0)
            groups.filter(_.agents.exists(a =>
              a.length == prefixLen && a != "*" && token.startsWith(a)))
          else groups.filter(_.agents.contains("*"))
        }
      }
    // merge matching groups (§2.2.1) in document order; rule values are
    // normalized HERE, once, so allowed() never re-normalizes them
    Rules(
      selected.flatMap(_.allows).map(normalizePct),
      selected.flatMap(_.disallows).map(normalizePct),
      selected.flatMap(_.delay).lastOption)
  }

  /** Split a robots.txt body into its groups. Tolerant: comments, blank
    * lines, unknown directives and rules preceding any User-agent line
    * are ignored.
    */
  private def parseGroups(body: String): Seq[Group] = {
    if (body == null) return Nil
    val out = Seq.newBuilder[Group]
    var agents = List.empty[String]
    var allows = List.empty[String]
    var disallows = List.empty[String]
    var delay: Option[Int] = None
    var inAgentRun = false // consecutive UA lines share one group
    var groupOpen = false
    def flush(): Unit = {
      if (groupOpen)
        out += Group(agents.reverse, allows.reverse, disallows.reverse, delay)
      agents = Nil; allows = Nil; disallows = Nil; delay = None
      groupOpen = false
    }
    body.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val c = line.indexOf(':')
      if (c > 0) {
        val key = line.substring(0, c).trim.toLowerCase
        val value = line.substring(c + 1).trim
        key match {
          case "user-agent" =>
            // a UA line after directives starts a NEW group (§2.1)
            if (!inAgentRun) flush()
            inAgentRun = true
            groupOpen = true
            agents ::= value.toLowerCase
          case "allow" =>
            inAgentRun = false
            if (groupOpen && value.nonEmpty) allows ::= value
          case "disallow" =>
            inAgentRun = false
            if (groupOpen && value.nonEmpty) disallows ::= value
          case "crawl-delay" =>
            inAgentRun = false
            if (groupOpen) delay = value.toIntOption.orElse(delay)
          case _ => inAgentRun = false // unknown directive: tolerated
        }
      }
    }
    flush()
    out.result()
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
    * RFC's longest-match); Allow wins equal-specificity ties. Rule
    * values in `rules` are already normalized (parse did it once) — only
    * the probe path is normalized here.
    */
  def allowed(rules: Rules, path: String): Boolean = {
    val p = normalizePct(if (path == null || path.isEmpty) "/" else path)
    def best(rs: Seq[String]): Int =
      rs.iterator.filter(matches(_, p)).map(_.length).maxOption.getOrElse(-1)
    best(rules.allows) >= best(rules.disallows)
  }
}
