package graft

import graft.curation.Gates
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parameterized curation gates: user-supplied blocklists/rules drive
  * the operators (the fixture-bound queries are just one instantiation).
  */
class GatesSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionTestBase.spark
  import spark.implicits._

  test("urlFilter applies a user-supplied blocklist, one row per page") {
    val pages = Seq(
      (1L, "https://good.example.com/a"),
      (2L, "https://evil.example.com/a"),
      (3L, "https://good.example.com/buy-pills-and-pills-now"), // word hits TWICE
      (4L, "https://good.example.com/pills-spam"), // two DIFFERENT words hit
      (5L, "https://evil.example.com/pills") // domain wins over word
    ).toDF("doc_id", "url")
    val out = Gates.urlFilter(pages,
        blockedHosts = Seq("evil.example.com").toDF("host"),
        blockedWords = Seq("pills", "spam").toDF("word"))
      .select(col("doc_id"), col("verdict")).orderBy(col("doc_id"))
      .as[(Long, String)].collect().toSeq
    assert(out == Seq(1L -> "ok", 2L -> "blocked_domain", 3L -> "blocked_word",
      4L -> "blocked_word", 5L -> "blocked_domain"))
    assert(out.size == pages.count(), "multi-word matches must not duplicate rows")
  }

  test("urlFilter stays map-side: broadcasts only, corpus never shuffles") {
    val pages = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        concat(lit("https://h"), col("doc_id") % 7, lit(".example.org/doc/"),
          col("doc_id")).as("url"))
    val plan = Gates.urlFilter(pages,
        Seq("h5.example.org").toDF("host"), Seq("casino").toDF("word"))
      .queryExecution.sparkPlan.toString
    assert(plan.contains("Broadcast"), s"blocklists must broadcast:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"the page corpus must not shuffle through the gate:\n$plan")
  }

  test("c4Filter honors custom rules (relaxed punctuation, own bad words)") {
    val docs = Seq(
      (1L, Seq("two words", "contains verboten here", "fine line kept")),
      (2L, Seq("totally fine line", "DROP THIS DOC marker", "another line"))
    ).toDF("doc_id", "lines")
    val rules = Gates.C4Rules(minWordsPerLine = 2, requireTerminalPunct = false,
      badLineWords = Seq("verboten"), killDocPhrases = Seq("DROP THIS DOC"),
      minKeptLines = 2)
    val out = Gates.c4Filter(docs, rules)
      .select(col("doc_id"), col("n_kept"), col("doc_keep"), col("kept_text"))
      .orderBy(col("doc_id")).as[(Long, Long, Boolean, String)].collect().toSeq
    assert(out(0) == ((1L, 2L, true, "two words\nfine line kept")),
      "bad-word line dropped, no-punct lines kept under relaxed rules")
    assert(out(1) == ((2L, 0L, false, "")), "kill phrase drops the whole doc")
    // and the default rules reproduce the C4 contract on the same input
    val strict = Gates.c4Filter(docs, Gates.C4Rules())
      .select(col("n_kept")).as[Long].collect().toSeq
    assert(strict == Seq(0L, 0L), "default rules require terminal punctuation")
  }
}
