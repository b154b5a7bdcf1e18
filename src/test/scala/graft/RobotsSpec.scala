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

  test("comments, unknown directives, empty Disallow, missing file") {
    val r = Robots.parse(
      "# politeness\nUser-agent: *\nUnknown: x\nDisallow:\nCrawl-delay: 3\n")
    assert(Robots.allowed(r, "/anything"), "empty Disallow allows all")
    assert(r.crawlDelay.contains(3))
    assert(Robots.allowed(Robots.parse(null), "/x"), "missing file = allow all")
    assert(Robots.allowed(Robots.parse(""), "/x"))
  }
}
