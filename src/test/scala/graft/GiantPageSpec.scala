package graft

import graft.extract.Extractor
import graft.fixtures.PageHtml
import org.scalatest.funsuite.AnyFunSuite

/** Giant-document robustness — the web-scale analog of the reference's
  * 1 MiB blob unit case (/root/reference/test/test_s3_client.py:85-103),
  * pushed to 10 MB: a real crawl contains multi-MB pages, and the
  * extractor must stay byte-exact, memory-bounded (streaming tokenizer,
  * iterative not recursive structure handling) and never-throw at that
  * size.
  */
class GiantPageSpec extends AnyFunSuite {

  private val vocab = ("alpha beta gamma delta epsilon zeta eta theta iota " +
    "kappa lambda mu nu xi omicron pi rho sigma tau upsilon").split(' ')

  /** deterministic single-space text of ~`nWords` words (no wall clock) */
  private def bigText(nWords: Int): String = {
    val sb = new java.lang.StringBuilder(nWords * 8)
    var i = 0
    while (i < nWords) {
      if (i > 0) sb.append(' ')
      sb.append(vocab((i * 31 + i / 97) % vocab.length))
      i += 1
    }
    sb.toString
  }

  test("10 MB page with embedded payload extracts byte-exactly") {
    val text = bigText(2000000) // ~11 MB of content
    val html = PageHtml.build(424242L, text, "en", withPayload = true, variant = 3)
    val raw = html.getBytes("UTF-8")
    assert(raw.length > 10 * 1024 * 1024, s"fixture must exceed 10 MB, got ${raw.length}")
    val doc = Extractor.extract("https://h0.example.org/doc/giant", raw, "en")
      .toOption.get
    // byte-identity invariant holds at 10 MB exactly as at 1 KB
    assert(doc.extracted_text == text)
    // the span extractor still finds the embedded payload at byte offsets
    // beyond the multi-MB content
    assert(doc.spans.nonEmpty)
    assert(doc.spans.head.text == PageHtml.payloadText(424242L))
    assert(doc.spans.head.start > 10L * 1024 * 1024)
  }

  test("10 MB page survives the gzipped WARC container byte-exactly") {
    // giant record through the full container path: serialize → one gzip
    // member → tolerant parse → identical bytes (content-length framing
    // must hold at multi-MB body sizes, and the multi-member gunzip must
    // not truncate a large member)
    val text = bigText(2000000)
    val html = PageHtml.build(424242L, text, "en", variant = 1).getBytes("UTF-8")
    val small = PageHtml.build(7L, "tiny page body here", "de").getBytes("UTF-8")
    val rec = graft.sources.WarcTestAccess.record(
      "https://h0.example.org/doc/giant", 1767225600000L, "en", html)
    val rec2 = graft.sources.WarcTestAccess.record(
      "https://h0.example.org/doc/small", 1767225601000L, "de", small)
    val bos = new java.io.ByteArrayOutputStream(rec.length / 2)
    val g1 = new java.util.zip.GZIPOutputStream(bos); g1.write(rec); g1.finish()
    val g2 = new java.util.zip.GZIPOutputStream(bos); g2.write(rec2); g2.finish()
    val docs = graft.sources.WarcTestAccess.parseGz(bos.toByteArray)
    assert(docs.map(_.url) ==
      Seq("https://h0.example.org/doc/giant", "https://h0.example.org/doc/small"))
    assert(java.util.Arrays.equals(docs.head.html, html), "giant body drifted")
    assert(docs.head.lang == "en" && docs(1).lang == "de")
  }

  test("10 MB of garbage bytes never throws (tolerant-decode contract)") {
    val raw = PageHtml.garbageBytes(7L, 10 * 1024 * 1024)
    val r = Extractor.extract("https://x/giant-garbage", raw, "en")
    // undecodable input degrades, never raises (ocr_engine.py:54-56 analog)
    assert(r.isRight || r.swap.toOption.get.reason == "payload")
    r.foreach(d => assert(d.extracted_text == ""))
  }

  test("10 MB of pathologically nested markup completes without stack overflow") {
    // 1.4M unclosed <div><a> opens: a recursive DOM builder dies here;
    // the fused streaming block pass must track depth iteratively
    val n = 700000
    val sb = new java.lang.StringBuilder(n * 16)
    var i = 0
    while (i < n) { sb.append("<div><a href=x>"); i += 1 }
    sb.append("deep text")
    val raw = sb.toString.getBytes("UTF-8")
    assert(raw.length > 10 * 1024 * 1024)
    val r = Extractor.extract("https://x/giant-nested", raw, "en")
    assert(r.isRight || r.isLeft) // completion IS the assertion — no throw
  }
}
