package graft.html

import scala.collection.mutable.ArrayBuffer

/** Lightweight DOM: just enough structure for block segmentation —
  * tag, attrs, children, depth. The analog of the reference's decoded
  * image matrix (/root/reference/src/ocr_engine.py:51-52): a value object
  * that lives only inside the map stage, never a Spark type.
  */
sealed trait DomNode
final case class DomText(s: String) extends DomNode
final class DomElement(val tag: String, val attrs: List[(String, String)], val depth: Int) extends DomNode {
  val children: ArrayBuffer[DomNode] = ArrayBuffer.empty
  def attr(name: String): Option[String] = attrs.collectFirst { case (k, v) if k == name => v }
}

object Dom {

  /** HTML void elements — never pushed on the open stack. */
  private val Void = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr")

  /** Implicit-close tolerance (HTML5-ish): when `incoming` starts while
    * `open` is on top of the stack, `open` is closed first.
    */
  private val pLike = Set("p")
  private val closesP = Set(
    "p", "div", "section", "article", "aside", "header", "footer", "nav",
    "main", "ul", "ol", "li", "h1", "h2", "h3", "h4", "h5", "h6",
    "table", "blockquote", "pre", "form", "figure", "dl", "dd", "dt")
  /** exposed for the fused token→blocks path (Blocks.fromTokens) */
  def impliesCloseTag(open: String, incoming: String): Boolean = impliesClose(open, incoming)
  def isVoid(tag: String): Boolean = Void.contains(tag)

  private def impliesClose(open: String, incoming: String): Boolean =
    (pLike.contains(open) && closesP.contains(incoming)) ||
      (open == "li" && incoming == "li") ||
      (open == "dd" && (incoming == "dd" || incoming == "dt")) ||
      (open == "dt" && (incoming == "dd" || incoming == "dt")) ||
      ((open == "td" || open == "th") && (incoming == "td" || incoming == "th" || incoming == "tr")) ||
      (open == "tr" && incoming == "tr") ||
      (open == "option" && incoming == "option")

  /** Build a tree from the token stream. Tolerant: unmatched end tags are
    * ignored; unclosed elements are closed at EOF; never throws.
    */
  def build(tokens: Seq[Token]): DomElement = {
    val root = new DomElement("#root", Nil, 0)
    val stack = ArrayBuffer[DomElement](root)

    def top: DomElement = stack(stack.length - 1)

    tokens.foreach {
      case TextRun(s) =>
        top.children += DomText(s)
      case StartTag(name, attrs, selfClosing) =>
        while (stack.length > 1 && impliesClose(top.tag, name)) stack.remove(stack.length - 1)
        val el = new DomElement(name, attrs, stack.length)
        top.children += el
        if (!selfClosing && !Void.contains(name)) stack += el
      case EndTag(name) =>
        // pop to the nearest matching open element; ignore if none
        var idx = stack.length - 1
        while (idx >= 1 && stack(idx).tag != name) idx -= 1
        if (idx >= 1) stack.remove(idx, stack.length - idx)
    }
    root
  }
}
