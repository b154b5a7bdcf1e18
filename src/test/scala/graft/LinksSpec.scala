package graft

import graft.extract.Links
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Outlink extractor: document order, attribute forms, and the E1
  * tolerance contract (never throws, undecodable → Nil).
  */
class LinksSpec extends AnyFunSuite {

  private def links(html: String): Seq[String] =
    Links.outlinks(html.getBytes("UTF-8"))

  test("anchors in document order, href from any quote style") {
    val html =
      """<a href="/one">x</a><p>t</p><a href='/two'>y</a><a href=/three>z</a>"""
    assert(links(html) == Seq("/one", "/two", "/three"))
  }

  test("href entity-decoded; non-anchor hrefs ignored; a without href skipped") {
    val html =
      """<link href="/style.css"><a id="n" href="/q?a=1&amp;b=2">x</a><a name="no">y</a>"""
    assert(links(html) == Seq("/q?a=1&b=2"))
  }

  test("case-insensitive tag/attr names") {
    assert(links("""<A HREF="/up">x</A>""") == Seq("/up"))
  }

  test("anchors inside script/style raw text are NOT links") {
    val html = """<script>var s = '<a href="/fake">';</script><a href="/real">x</a>"""
    assert(links(html) == Seq("/real"))
  }

  test("null and undecodable bytes yield no links (tolerance contract)") {
    assert(Links.outlinks(null).isEmpty)
    assert(Links.outlinks(graft.fixtures.PageHtml.garbageBytes(7L)).isEmpty)
  }

  test("totality: never throws on arbitrary bytes") {
    val p = Prop.forAll(
      Gen.containerOf[Array, Byte](Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bs =>
      Links.outlinks(bs) // must not throw
      true
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(r.passed, r.status.toString)
  }
}
