package graft

import graft.extract.Robots
import org.scalatest.funsuite.AnyFunSuite

/** robots.txt evaluator: RFC 9309 star-group semantics, longest-match,
  * tie-break, group attachment, tolerance.
  */
class RobotsSpec extends AnyFunSuite {

  test("longest prefix wins; Allow wins equal-length ties") {
    val r = Robots.parse("User-agent: *\nDisallow: /doc/\nAllow: /doc/pub\n")
    assert(!Robots.allowed(r, "/doc/private"))
    assert(Robots.allowed(r, "/doc/pub/x"))
    assert(Robots.allowed(r, "/other"))
    val tie = Robots.parse("User-agent: *\nDisallow: /a/\nAllow: /a/\n")
    assert(Robots.allowed(tie, "/a/x"), "Allow wins the tie")
  }

  test("directives attach to their group; multiple UA lines share one group") {
    val r = Robots.parse(
      "User-agent: evilbot\nDisallow: /\n\nUser-agent: *\nDisallow: /doc/\n")
    assert(Robots.allowed(r, "/open"))
    assert(!Robots.allowed(r, "/doc/1"))
    val multi = Robots.parse("User-agent: a\nUser-agent: *\nDisallow: /x/\n")
    assert(!Robots.allowed(multi, "/x/y"), "second UA line joins the group")
    val foreignOnly = Robots.parse("User-agent: evilbot\nDisallow: /\n")
    assert(Robots.allowed(foreignOnly, "/anything"), "no star group = allow all")
  }

  test("RFC 9309 §2.2.3 wildcard matching: * and $ (the RFC's own examples)") {
    import Robots.matches
    // /fish* — anything starting with /fish
    assert(matches("/fish*", "/fish"))
    assert(matches("/fish*", "/fishheads"))
    assert(matches("/fish*", "/fish/salmon.html"))
    assert(!matches("/fish*", "/Fish.asp"), "matching is case-sensitive")
    // /*.php — any path containing .php
    assert(matches("/*.php", "/index.php"))
    assert(matches("/*.php", "/folder/filename.php"))
    assert(matches("/*.php", "/folder/filename.php?parameters"))
    assert(!matches("/*.php", "/"))
    assert(!matches("/*.php", "/windows.PHP"))
    // /*.php$ — ends with .php
    assert(matches("/*.php$", "/filename.php"))
    assert(matches("/*.php$", "/folder/filename.php"))
    assert(!matches("/*.php$", "/filename.php?parameters"))
    assert(!matches("/*.php$", "/filename.php5"))
    // /fish*.php — /fish then anything then .php
    assert(matches("/fish*.php", "/fish.php"))
    assert(matches("/fish*.php", "/fishheads/catfish.php?parameters"))
    assert(!matches("/fish*.php", "/Fish.PHP"))
    // plain rules are unchanged prefix semantics; /$ matches only the root
    assert(matches("/doc/", "/doc/123") && !matches("/doc/", "/docs"))
    assert(matches("/$", "/") && !matches("/$", "/x"))
  }

  test("wildcard rules participate in most-specific-match with $-anchors") {
    val r = Robots.parse("User-agent: *\nDisallow: /doc/*\nAllow: /doc/*2$\n")
    assert(Robots.allowed(r, "/doc/42"), "Allow has more octets where both match")
    assert(!Robots.allowed(r, "/doc/43"))
    assert(!Robots.allowed(r, "/doc/42x"), "$ anchor: 42x does not end in 2")
    val pdf = Robots.parse("User-agent: *\nDisallow: /*.pdf$\n")
    assert(!Robots.allowed(pdf, "/a/b/report.pdf"))
    assert(Robots.allowed(pdf, "/a/b/report.pdf.html"))
    val htm = Robots.parse("User-agent: *\nAllow: /page\nDisallow: /*.htm\n")
    assert(!Robots.allowed(htm, "/page.htm"), "Disallow /*.htm is more specific (6 > 5)")
    assert(Robots.allowed(htm, "/page"))
  }

  test("percent-encoding normalization: unreserved decode, reserved keep uppercase hex") {
    import Robots.normalizePct
    assert(normalizePct("/a%7Eb") == "/a~b", "unreserved escapes decode")
    assert(normalizePct("/a%7eb") == "/a~b", "hex case-insensitive")
    assert(normalizePct("/a%2fb") == "/a%2Fb", "reserved escapes keep encoding, hex uppercased")
    assert(normalizePct("/a%xyb") == "/a%xyb", "malformed escape passes through")
    assert(normalizePct("/a%2A") == "/a%2A", "escapes never decode into * metachar")
    val r = Robots.parse("User-agent: *\nDisallow: /tmp%7E/\n")
    assert(!Robots.allowed(r, "/tmp~/x"), "rule %7E matches literal ~ in path")
    assert(!Robots.allowed(r, "/tmp%7e/x"), "and the encoded path form")
    val slash = Robots.parse("User-agent: *\nDisallow: /a%2Fb\n")
    assert(Robots.allowed(slash, "/a/b"), "%2F stays distinct from a literal /")
    assert(!Robots.allowed(slash, "/a%2fb"), "but matches its own encoded form")
  }

  test("comments, unknown directives, empty Disallow, missing file") {
    val r = Robots.parse(
      "# politeness\nUser-agent: *\nUnknown: x\nDisallow:\nCrawl-delay: 3\n")
    assert(Robots.allowed(r, "/anything"), "empty Disallow allows all")
    assert(r.crawlDelay.contains(3))
    assert(Robots.allowed(Robots.parse(null), "/x"), "missing file = allow all")
    assert(Robots.allowed(Robots.parse(""), "/x"))
  }

  test("§2.2.1 named-group selection: exact match overrides *, merges, ci") {
    val body = "User-agent: GraftBot\nAllow: /doc/\n\n" +
      "User-agent: *\nDisallow: /\n\n" +
      "User-agent: graftbot\nCrawl-delay: 2\n"
    val r = Robots.parse(body, "graftbot")
    assert(Robots.allowed(r, "/doc/1"), "exact group overrides * Disallow:/")
    assert(r.crawlDelay.contains(2), "second exact group merges in (RFC merge)")
    val star = Robots.parse(body, "otherbot")
    assert(!Robots.allowed(star, "/doc/1"), "unmatched token falls back to *")
    assert(star.crawlDelay.isEmpty)
    assert(!Robots.allowed(Robots.parse(body), "/doc/1"), "parse(body) ≡ * agent")
  }

  test("§2.2.1 prefix fallback: longest prefix group, only without exact") {
    val body = "User-agent: graft\nDisallow: /a/\n\n" +
      "User-agent: graftbot-img\nDisallow: /b/\n\n" +
      "User-agent: *\nDisallow: /\n"
    val r = Robots.parse(body, "graftbot")
    assert(!Robots.allowed(r, "/a/x"), "prefix group 'graft' governs 'graftbot'")
    assert(Robots.allowed(r, "/b/x"), "'graftbot-img' is NOT a prefix of the token")
    assert(Robots.allowed(r, "/c"), "* group ignored once a prefix group matched")
    val longest = Robots.parse(
      "User-agent: g\nDisallow: /short/\n\nUser-agent: graft\nDisallow: /long/\n",
      "graftbot")
    assert(Robots.allowed(longest, "/short/x"), "longest prefix wins")
    assert(!Robots.allowed(longest, "/long/x"))
    val exactBeats = Robots.parse(
      "User-agent: graft\nDisallow: /p/\n\nUser-agent: graftbot\nDisallow: /e/\n",
      "graftbot")
    assert(Robots.allowed(exactBeats, "/p/x"), "exact group beats prefix group")
    assert(!Robots.allowed(exactBeats, "/e/x"))
  }

  test("no matching group at all = allow-all for that token") {
    val r = Robots.parse("User-agent: evilbot\nDisallow: /\n", "graftbot")
    assert(Robots.allowed(r, "/anything"))
    assert(r.crawlDelay.isEmpty)
  }

  test("rule values normalize once at parse (stored normalized)") {
    val r = Robots.parse("User-agent: *\nDisallow: /tmp%7e/\nAllow: /a%2fb\n")
    assert(r.disallows == Seq("/tmp~/"), "unreserved escape decoded at parse")
    assert(r.allows == Seq("/a%2Fb"), "reserved escape kept, hex uppercased")
  }
}
