package graft.extract

/** Boilerpipe/Readability-style block classifier (op E4 in SURVEY.md
  * §2.3): shallow text features — word count, link density, neighbor
  * context — decide content vs boilerplate. This is the deterministic
  * analog of the reference's per-region recognition model
  * (/root/reference/src/ocr_engine.py:58): block in, keep/drop out.
  *
  * Rule set follows the densometric "NumWordsRulesClassifier" shape from
  * Kohlschütter et al., "Boilerplate Detection using Shallow Text
  * Features" (WSDM 2010) — a public, widely reimplemented decision list.
  * Thresholds are FROZEN constants; all comparisons are on exact rational
  * values (words are ints; link density compares via cross-multiplication
  * to avoid float-platform drift), per the byte-identity requirement
  * (SURVEY.md §4.3).
  */
object Classifier {

  /** linkDensity > 1/3 ⇒ boilerplate (exact: 3*anchorChars > chars). */
  @inline private def linkDense(b: Block): Boolean = 3L * b.anchorChars > b.chars
  /** prev link density > 5/9 gate (exact: 9*anchorChars > 5*chars). */
  @inline private def veryLinkDense(b: Block): Boolean = 9L * b.anchorChars > 5L * b.chars

  /** Lang-keyed stopword tables (op E4's language dimension — the analog
    * of the reference loading a lang-specific recognition model,
    * /root/reference/src/ocr_engine.py:21 lang='de'). Same marker sets as
    * the t_langid query. Unknown/unsupported lang → no table → the
    * stopword feature never fires (classification falls back to the pure
    * densometric rules).
    */
  private val Stopwords: Map[String, Set[String]] = Map(
    "en" -> Set("the", "a", "of", "is", "and"),
    "de" -> Set("der", "die", "das", "und", "ist"),
    "fr" -> Set("le", "la", "les", "et", "est"),
    "es" -> Set("el", "los", "las", "y", "es"))

  /** Stopword rescue (Kohlschütter's densometric stopword feature, used
    * conservatively): a short free-standing block that the word-count
    * rules would drop is kept if it reads like prose in the page's
    * language — stopword ratio >= 1/6 (exact integer compare) over at
    * least 5 words. KEEP-only: it can never drop a block, never fires on
    * link-dense blocks (rejected earlier), and never fires inside the
    * stricter very-link-dense-context branch — so it cannot affect pages
    * the densometric rules already decide.
    */
  private def stopwordRescue(b: Block, lang: String): Boolean = {
    if (b.words < 5 || lang == null) return false
    val sw = Stopwords.getOrElse(lang, null)
    if (sw == null) return false
    var hits = 0
    var start = 0
    val t = b.text
    var i = 0
    while (i <= t.length) {
      if (i == t.length || t.charAt(i) == ' ') {
        if (i > start && sw.contains(t.substring(start, i).toLowerCase(java.util.Locale.ROOT)))
          hits += 1
        start = i + 1
      }
      i += 1
    }
    6 * hits >= b.words
  }

  /** Returns keep-flags aligned with `blocks` (document order). */
  def classify(blocks: IndexedSeq[Block], lang: String): IndexedSeq[Boolean] = {
    val n = blocks.length
    val keep = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      val cur = blocks(i)
      val prevOpt = if (i > 0) Some(blocks(i - 1)) else None
      val nextWords = if (i + 1 < n) blocks(i + 1).words else 0
      val prevWords = prevOpt.map(_.words).getOrElse(0)
      keep(i) =
        if (cur.words == 0) false
        else if (linkDense(cur)) false
        else if (prevOpt.exists(veryLinkDense))
          cur.words > 40 || nextWords > 17
        else
          cur.words > 16 || nextWords > 15 || prevWords > 4 ||
            stopwordRescue(cur, lang)
      i += 1
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(keep)
  }

  /** Project kept block texts and fold with a single space — exact
    * `" ".join` semantics of the reference (/root/reference/src/ocr_engine.py:64):
    * no trailing separator, "" for zero kept blocks.
    */
  def extractText(blocks: IndexedSeq[Block], lang: String): String = {
    val keep = classify(blocks, lang)
    val sb = new java.lang.StringBuilder(256)
    var first = true
    var i = 0
    while (i < blocks.length) {
      if (keep(i)) {
        if (!first) sb.append(' ')
        sb.append(blocks(i).text)
        first = false
      }
      i += 1
    }
    sb.toString
  }
}
