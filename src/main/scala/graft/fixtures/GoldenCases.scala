package graft.fixtures

/** Hand-built adversarial page corpus for the FROZEN golden files
  * (FIXTURES.md §2): richer than the documents-derived round-trip corpus
  * — entities, malformed markup, charsets, tables/lists, br runs, rcdata
  * traps, payloads, garbage, empties. Inputs are deterministic; the
  * expected outputs are produced ONCE by the engine at freeze time
  * (tools.GoldenGen) and committed under src/test/resources/golden/ —
  * the same discipline as the reference pinning its mock OCR outputs
  * (/root/reference/test/test_ocr_engine.py:30-48).
  */
object GoldenCases {

  private def b(s: String): Array[Byte] = s.getBytes("UTF-8")
  private val W = (1 to 30).map(i => s"word$i").mkString(" ")

  val cases: Seq[(String, Array[Byte], String)] = Seq(
    ("golden://entities", b(s"<html><body><p>Fish &amp; Chips &lt;tag&gt; &quot;quoted&quot; &#65;&#x42; caf&eacute; &uuml;ber &nbsp;end $W</p></body></html>"), "de"),

    ("golden://malformed-unclosed", b(s"<html><body><p><b>bold <i>italic $W<p>second para $W"), "en"),

    ("golden://stray-angles", b(s"<p>compare 1 < 2 and 3 > 2 in text $W</p>"), "en"),

    ("golden://comments-cdata", b(s"<!-- <p>ghost</p> --><p>$W</p><![CDATA[<p>cdata ghost</p>]]><p>$W</p>"), "en"),

    ("golden://script-trap", b(s"""<script>document.write("<p>script ghost</p>");</script><p>$W</p><style>p{color:red}</style>"""), "en"),

    ("golden://rcdata-trap", b(s"<title>title ghost</title><textarea><p>textarea ghost</p></textarea><p>$W</p>"), "en"),

    ("golden://table", b(s"<table><tr><th>h1</th><th>h2</th></tr><tr><td>cell one $W</td><td>cell two $W</td></tr></table>"), "en"),

    ("golden://lists", b(s"<ul><li>first item $W<li>second item $W</ul><ol><li>third $W</li></ol>"), "en"),

    ("golden://br-runs", b(s"<p>line one $W<br>line two $W<br><br>new block $W</p>"), "en"),

    ("golden://latin1", ("<html><head><meta charset=\"iso-8859-1\"></head><body><p>café über straße " + W + "</p></body></html>").getBytes("ISO-8859-1"), "de"),

    ("golden://utf16", ("<html><body><p>utf sixteen content " + W + "</p></body></html>").getBytes("UTF-16"), "en"),

    ("golden://bom-utf8", (Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ b(s"<p>bom content $W</p>")), "en"),

    ("golden://nested-anchors", b(s"""<p>$W</p><div><a href="/x">link farm one two three four five six seven eight nine ten</a> <a href="/y">more links here now</a></div><p>$W</p>"""), "en"),

    ("golden://boilerplate-page", b(PageHtml.build(424242L, W + " " + W, "en")), "en"),

    ("golden://payload-pdf", b(PageHtml.build(31337L, W, "en", withPayload = true)), "en"),

    ("golden://payload-multi", b(s"""<p>$W</p><object data="data:application/pdf;base64,${PageHtml.payloadB64("pdf", "first payload")}"></object><embed src="data:application/x-layout;base64,${PageHtml.payloadB64("layout", "layout payload")}"><p>$W</p>"""), "en"),

    ("golden://payload-corrupt", b(PageHtml.build(999L, W, "en", corruptPayload = true)), "en"),

    ("golden://payload-poison-nul", b(PageHtml.build(888L, W, "en", poisonPayload = true)), "en"),

    // lang-keyed stopword rescue (E4): the SAME short free-standing block
    // is kept iff it reads as prose in the page's declared language
    ("golden://short-prose-en", b("<p>this is the end of the story and it is good</p>"), "en"),
    ("golden://short-prose-wrong-lang", b("<p>this is the end of the story and it is good</p>"), "de"),
    ("golden://short-prose-de", b("<p>das ist der anfang und das ende hier gut</p>"), "de"),
    ("golden://short-no-stopwords", b("<p>alpha beta gamma delta epsilon zeta eta</p>"), "en"),

    ("golden://data-uri-image-ignored", b(s"""<p>$W</p><img src="data:image/png;base64,iVBORw0KGgo="><p>$W</p>"""), "en"),

    ("golden://garbage", PageHtml.garbageBytes(7L, 256), "en"),

    ("golden://empty", Array.emptyByteArray, "en"),

    ("golden://whitespace-soup", b(s"<p>  a\t\tb\r\nc   d  $W  </p>"), "en"),

    ("golden://mixed-case-tags", b(s"<P>$W</P><DIV>$W</DIV>"), "en"),

    ("golden://attr-soup", b(s"""<p class=unquoted id="x" data-a='y' broken=>$W</p>"""), "en"),

    ("golden://deep-nesting", b("<div>" * 40 + s"<p>$W</p>" + "</div>" * 40), "en"),

    ("golden://implicit-close", b(s"<p>para one $W<p>para two $W<div>div text $W</div>"), "en"))
}
