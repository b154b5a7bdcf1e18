package graft.extract

import graft.model.Span
import scala.collection.mutable.ArrayBuffer

/** Embedded-payload corruption — routed to the "payload" error reason,
  * the analog of the reference's blob-fetch failure propagating out of the
  * extraction operator (/root/reference/src/s3_client.py:57-59 →
  * /root/reference/test/test_ocr_engine.py:141-150).
  */
final case class PayloadException(msg: String) extends RuntimeException(msg)

/** Embedded-payload span extractor (op E7 in SURVEY.md §2.3, mandated by
  * north_star): locate `data:application/pdf;base64,...` /
  * `data:application/x-layout;base64,...` payloads in the RAW html bytes,
  * decode them, and emit spans with byte offsets of the base64 body.
  *
  * Payload container format is our own deterministic fixture format
  * (no PDF library resolves offline): decoded bytes must start with the
  * magic `%GPDF\n` (pdf) or `%GLAY\n` (layout), followed by UTF-8 text.
  * Anything else — bad base64, missing magic — is a corrupt payload and
  * throws [[PayloadException]].
  */
object Spans {

  // single shared prefix so the scan over the raw bytes happens ONCE
  private val Prefix = "data:application/".getBytes("US-ASCII")
  private val PdfSuffix = "pdf;base64,".getBytes("US-ASCII")
  private val LaySuffix = "x-layout;base64,".getBytes("US-ASCII")

  private val MagicPdf = "%GPDF\n".getBytes("US-ASCII")
  private val MagicLay = "%GLAY\n".getBytes("US-ASCII")

  @inline private def isB64(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') ||
      b == '+' || b == '/' || b == '='

  @inline private def matchesAt(hay: Array[Byte], at: Int, needle: Array[Byte]): Boolean = {
    if (at + needle.length > hay.length) return false
    var k = 0
    while (k < needle.length) { if (hay(at + k) != needle(k)) return false; k += 1 }
    true
  }

  private def startsWith(a: Array[Byte], prefix: Array[Byte]): Boolean = {
    if (a.length < prefix.length) return false
    var i = 0
    while (i < prefix.length) { if (a(i) != prefix(i)) return false; i += 1 }
    true
  }

  /** Scan raw html bytes for embedded payloads, document order (single
    * pass — spans come out already offset-sorted).
    * @throws PayloadException on corrupt payloads (routed to "payload").
    */
  def extract(html: Array[Byte]): Seq[Span] = {
    var out: ArrayBuffer[Span] = null
    val n = html.length
    var i = 0
    val limit = n - Prefix.length
    while (i <= limit) {
      if (html(i) == 'd' && matchesAt(html, i, Prefix)) {
        val rest = i + Prefix.length
        var kind: String = null
        var b64Start = -1
        if (matchesAt(html, rest, PdfSuffix)) { kind = "pdf"; b64Start = rest + PdfSuffix.length }
        else if (matchesAt(html, rest, LaySuffix)) { kind = "layout"; b64Start = rest + LaySuffix.length }
        if (kind != null) {
          var end = b64Start
          while (end < n && isB64(html(end))) end += 1
          val body = java.util.Arrays.copyOfRange(html, b64Start, end)
          val decoded =
            try java.util.Base64.getDecoder.decode(body)
            catch {
              case e: IllegalArgumentException =>
                throw PayloadException(s"bad base64 at $b64Start: ${e.getMessage}")
            }
          val magic = if (kind == "pdf") MagicPdf else MagicLay
          if (!startsWith(decoded, magic)) throw PayloadException(s"missing $kind magic at $b64Start")
          val text = new String(decoded, magic.length, decoded.length - magic.length, "UTF-8")
          // data-integrity invariant: span text must be NUL-free (it flows
          // into the extracted-text contract). A well-formed container
          // (valid base64 + magic) carrying NUL bytes is not a corrupt
          // payload — it is an unexpected internal state, routed to the
          // reference's third reason code "unexpected"
          // (/root/reference/src/kafka_consumer.py:139-142).
          if (text.indexOf(0.toChar) >= 0)
            throw new IllegalStateException(s"NUL byte in decoded $kind payload at $b64Start")
          if (out == null) out = ArrayBuffer.empty[Span]
          out += Span(kind, b64Start.toLong, end.toLong, text)
          i = end
        } else i += 1
      } else i += 1
    }
    if (out == null) Nil else out.toSeq
  }
}
