package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Style/lint gate — the analog of the reference's flake8 CI gate
  * (/root/reference/.github/workflows/ci-build.yml:14-55). No scalafmt
  * artifact is resolvable in this offline sandbox, so the invariants are
  * enforced directly; running inside `sbt test` wires the gate into the
  * same command CI runs (.github/workflows/ci.yml).
  */
class LintSpec extends AnyFunSuite {

  private val MaxLine = 120

  /** flake8 per-file-ignores analog: fixture files hold single-line HTML
    * template literals whose VALUES are frozen (splitting them is safe
    * but noisy; they are data, not code).
    */
  private val lineLengthExempt = Set("PageHtml.scala", "GoldenCases.scala")

  private def scalaSources: Seq[java.nio.file.Path] = {
    val s = java.nio.file.Files.walk(java.nio.file.Paths.get("src"))
    try s.iterator().asScala.filter(_.toString.endsWith(".scala")).toList
    finally s.close()
  }

  test("no tabs, no trailing whitespace, no CRLF, final newline") {
    val bad = scalaSources.flatMap { p =>
      val bytes = java.nio.file.Files.readAllBytes(p)
      val text = new String(bytes, "UTF-8")
      val issues = scala.collection.mutable.ListBuffer.empty[String]
      if (text.contains('\t')) issues += s"$p: tab character"
      if (text.contains('\r')) issues += s"$p: CRLF line ending"
      if (bytes.nonEmpty && bytes.last != '\n') issues += s"$p: missing final newline"
      text.linesIterator.zipWithIndex.foreach { case (l, i) =>
        if (l.nonEmpty && (l.last == ' ')) issues += s"$p:${i + 1}: trailing whitespace"
      }
      issues
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test(s"line length <= $MaxLine (fixture template files exempt)") {
    val bad = scalaSources
      .filterNot(p => lineLengthExempt.contains(p.getFileName.toString))
      .flatMap { p =>
        val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        text.linesIterator.zipWithIndex.collect {
          case (l, i) if l.length > MaxLine => s"$p:${i + 1}: ${l.length} chars"
        }
      }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("no stubs or deferred work markers in source") {
    // split so this file does not flag itself
    val markers = Seq("?" * 3, "TO" + "DO", "FIX" + "ME", "XX" + "X:")
    val bad = scalaSources.flatMap { p =>
      val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      markers.filter(text.contains).map(m => s"$p: contains $m")
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("imports are not wildcard-hidden behind _root_ hacks and files declare the graft package") {
    val bad = scalaSources.filterNot { p =>
      val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      text.linesIterator.exists(_.startsWith("package graft"))
    }
    assert(bad.isEmpty, s"files without a graft package declaration: $bad")
  }
}
