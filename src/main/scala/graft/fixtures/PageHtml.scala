package graft.fixtures

/** Deterministic page-HTML builder — the fixture format shared by unit
  * tests, the golden corpus, and the oracle-checked round-trip queries.
  *
  * The template is engineered so that, under the FROZEN classifier rules
  * (graft.extract.Classifier), extraction recovers the source text
  * byte-for-byte:
  *   - nav boilerplate has link density in (1/3, 5/9]: dropped by the
  *     link-density rule, but NOT "very link dense", so the following
  *     content paragraph is classified by the word-count branch where
  *     prev(nav).words = 8 > 4 ⇒ every content paragraph is kept
  *     regardless of its own length;
  *   - footer boilerplate has link density > 1/3: always dropped;
  *   - content paragraphs are plain text chunks of [[WordsPerPara]] words;
  *     joining kept blocks with " " reproduces the input text exactly
  *     (input text must already be single-space separated — the documents
  *     testdata table is).
  *
  * Mirrors the reference's golden-fixture discipline: pinned inputs with
  * frozen expected outputs (/root/reference/test/test_ocr_engine.py:30-48).
  */
object PageHtml {

  /** Bump whenever the page template / routing rules change — keys the
    * benchmark's staged-corpus cache so it never serves stale bytes.
    */
  val CorpusVersion = 4

  val WordsPerPara = 25

  def escape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case '"' => sb.append("&quot;")
        case c   => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Geometric host skew (Zipf-ish), pure integer arithmetic so the same
    * mapping is expressible in oracle SQL: m = id % 1024 → host index.
    * Half of all docs land on h0, a quarter on h1, ... (exercises the
    * skewed-host salting path, SURVEY.md §7.2 step 5).
    */
  def hostIndex(id: Long): Int = {
    val m = (id % 64).toInt
    if (m < 32) 0      // h0 carries half the corpus — the hot host
    else if (m < 48) 1
    else if (m < 56) 2
    else if (m < 60) 3
    else if (m < 62) 4
    else if (m == 62) 5
    else 6
  }

  def url(id: Long): String = s"https://h${hostIndex(id)}.example.org/doc/$id"

  /** The block immediately preceding the first content paragraph must
    * have link density in (1/3, 5/9]: dropped, but not "very link dense"
    * (see class scaladoc). Measured: 25 anchor chars / 48 chars = 0.52.
    */
  private val Nav =
    """<header><nav>Navigation menu home <a href="/">start page</a> <a href="/news">news today</a> <a href="/sport">sport</a></nav></header>"""

  private val Footer =
    """<footer><a href="/imprint">imprint legal notice</a> <a href="/contact">contact us</a> copyright</footer>"""

  /** Extra boilerplate blocks for template variants — each is strictly
    * link-dense (> 1/3 anchor chars) so the classifier drops it on its
    * own features, wherever it appears.
    */
  private val LinkFarm =
    """<nav class="mega"><a href="/a">politics world</a> <a href="/b">economy markets</a> <a href="/c">culture arts</a> <a href="/d">science tech</a> <a href="/e">travel food</a></nav>"""
  private val Related =
    """<aside><h2><a href="/rel">related articles overview</a></h2><ul><li><a href="/r1">first related story</a></li><li><a href="/r2">second related story</a></li></ul></aside>"""
  private val AdBlock =
    """<div class="ad"><a href="/buy">sponsored offer click here</a></div>"""
  private val FooterBig =
    """<footer><div><a href="/imprint">imprint legal notice</a> <a href="/privacy">privacy policy text</a></div><div><a href="/contact">contact us</a> <a href="/jobs">jobs careers</a> copyright</div></footer>"""

  /** Base64 payload body for an embedded fake-PDF with the given text. */
  def payloadB64(kind: String, text: String): String = {
    val magic = if (kind == "pdf") "%GPDF\n" else "%GLAY\n"
    java.util.Base64.getEncoder.encodeToString((magic + text).getBytes("UTF-8"))
  }

  /** Deterministic payload text for doc `id` (oracle-expressible). */
  def payloadText(id: Long): String = s"embedded payload $id"

  /** Build the page html for (id, text, lang).
    * @param withPayload  embed a fake-PDF object whose decoded text is
    *                     [[payloadText]] — span-extractor cases
    * @param corruptPayload embed a syntactically valid base64 body that is
    *                     missing the payload magic — "payload" error route
    */
  /** @param variant page-structure variant 0..3 — different boilerplate
    *                 arrangements around the same content; extraction must
    *                 recover `text` under every one (the round-trip oracle
    *                 exercises all four). Invariants each variant keeps:
    *                 every boilerplate block is link-dense, and the block
    *                 directly before the first content paragraph is [[Nav]].
    */
  /** @param poisonPayload embed a WELL-FORMED layout payload (valid base64,
    *                 valid magic) whose decoded text contains a NUL byte —
    *                 trips the span extractor's data-integrity invariant →
    *                 "unexpected" error route (the reference's third reason,
    *                 /root/reference/test/test_kafka_consumer.py:160-195)
    */
  def build(id: Long, text: String, lang: String,
            withPayload: Boolean = false, corruptPayload: Boolean = false,
            poisonPayload: Boolean = false,
            variant: Int = 0): String = {
    val words = if (text == null || text.isEmpty) Array.empty[String] else text.split(' ')
    val paras = words.grouped(WordsPerPara)
      .map(ws => s"<p>${escape(ws.mkString(" "))}</p>")
      .mkString("\n")
    val payload =
      if (corruptPayload)
        // valid base64, wrong magic → PayloadException → "payload" reason
        s"""<object data="data:application/pdf;base64,${java.util.Base64.getEncoder.encodeToString(("not a pdf " + id).getBytes("UTF-8"))}"></object>"""
      else if (poisonPayload)
        s"""<object data="data:application/x-layout;base64,${payloadB64("layout", "poison" + 0.toChar + id)}"></object>"""
      else if (withPayload)
        s"""<object data="data:application/pdf;base64,${payloadB64("pdf", payloadText(id))}"></object>"""
      else ""
    val body = variant match {
      case 1 => // mega-menu + sidebar layout with related links after content
        s"""$LinkFarm
$Nav
<div class="layout"><article>
$paras
</article>
$Related</div>
$payload
$FooterBig"""
      case 2 => // heading-in-anchor + ad block after content
        s"""<header><h1><a href="/home">site name banner</a></h1></header>
$Nav
<section id="story">
$paras
</section>
$AdBlock
$payload
$Footer"""
      case 3 => // everything: menu, related, ads, big footer
        s"""$LinkFarm
$Related
$Nav
<main>
$paras
</main>
$AdBlock
$payload
$FooterBig"""
      case _ =>
        s"""$Nav
<main id="content">
$paras
</main>
$payload
$Footer"""
    }
    s"""<!DOCTYPE html>
<html lang="${escape(lang)}">
<head>
<meta charset="utf-8">
<title>Document $id</title>
<style>body { color: #000; }</style>
<script>var docId = $id;</script>
</head>
<body>
$body
</body>
</html>"""
  }

  /** Deterministic garbage bytes (non-text: contains NULs) for the
    * undecodable→"" route (/root/reference/test/test_ocr_engine.py:52-67).
    * Simple LCG keyed on id — no wall clock, no java Random state.
    */
  def garbageBytes(id: Long, n: Int = 64): Array[Byte] = {
    val out = new Array[Byte](n)
    var x = id * 6364136223846793005L + 1442695040888963407L
    var i = 0
    while (i < n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      out(i) = (x >>> 32).toByte
      i += 1
    }
    out(0) = 0 // guarantee a NUL in the sniff window
    out
  }
}
