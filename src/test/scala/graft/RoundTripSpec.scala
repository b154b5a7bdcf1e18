package graft

import graft.fixtures.{Corpus, PageHtml}
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end golden gate (SURVEY.md §5.2 item 3): run the full
  * extraction over the sf0.001 page corpus on local Spark, full-outer-join
  * produced vs expected on url, assert ZERO byte-level mismatches — the
  * Spark-scale analog of the reference's pinned golden strings
  * (/root/reference/test/test_ocr_engine.py:30-48).
  */
class RoundTripSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionTestBase.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("sf0.001 corpus: extracted_text byte-identical to expected for every url") {
    GraftFunctions.register(spark)
    val pages = Corpus.pages(spark, sfDir)
    val out = pages
      .withColumn("r", call_function("extract_content", col("url"), col("html"), col("lang")))
      .select(col("doc_id"), col("url"), col("r.extracted_text"), col("r.spans"), col("r.error"))
      .cache()

    // expected from the frozen doc_id routing rule (fixtures.Corpus)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val expected = docs.select(
      col("doc_id"),
      when(col("doc_id") % 20 === 13, lit("validation"))
        .when(col("doc_id") % 20 === 19, lit("payload"))
        .when(col("doc_id") % 20 === 3, lit("unexpected"))
        .otherwise(lit(null)).as("exp_error"),
      when(col("doc_id") % 20 === 7, lit(""))
        .when((col("doc_id") % 20).isin(3, 13, 19), lit(null))
        .otherwise(col("text")).as("exp_text"))

    val joined = out.join(expected, Seq("doc_id"), "full_outer").cache()
    val total = docs.count()
    assert(joined.count() == total, "row count preserved through extraction")

    val errMismatch = joined.filter(!(col("error") <=> col("exp_error"))).count()
    assert(errMismatch == 0, "error routing matches the frozen doc_id rule")

    // byte identity: compare as binary, null-safe
    val textMismatch = joined.filter(
      !(col("extracted_text").cast("binary") <=> col("exp_text").cast("binary"))).count()
    if (textMismatch > 0) {
      joined.filter(!(col("extracted_text").cast("binary") <=> col("exp_text").cast("binary")))
        .select("doc_id", "extracted_text", "exp_text").show(5, 120)
    }
    assert(textMismatch == 0, "extracted_text byte-identical for every url")

    // spans: exactly the doc_id%10==0 rows (minus error rows) carry one
    // pdf span with the deterministic payload text
    val spanRows = out.filter(size(col("spans")) > 0)
      .select(col("doc_id"), element_at(col("spans"), 1).getField("kind").as("kind"),
        element_at(col("spans"), 1).getField("text").as("stext"))
    val badSpans = spanRows.filter(col("doc_id") % 10 =!= 0 ||
      col("kind") =!= "pdf" ||
      col("stext") =!= concat(lit("embedded payload "), col("doc_id").cast("string"))).count()
    assert(badSpans == 0)
    val expectedSpanCount = docs.filter(col("doc_id") % 10 === 0 &&
      !(col("doc_id") % 20).isin(3, 7, 13, 19)).count()
    assert(spanRows.count() == expectedSpanCount)
    out.unpersist(); joined.unpersist()
  }

  test("column pruning: extraction plan never reads the crawler text guess") {
    GraftFunctions.register(spark)
    // when pages come from a parquet table, the scan must prune `text`
    val tmp = java.nio.file.Files.createTempDirectory("graft-pages").toString
    Corpus.pages(spark, sfDir).write.mode("overwrite").parquet(tmp)
    val pages = spark.read.parquet(tmp)
    val out = pages.select(col("url"),
      call_function("extract_content", col("url"), col("html"), col("lang")).as("r"))
    val scan = out.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")
    assert(scan.contains("url") && !scan.contains(
      "ReadSchema: struct<doc_id:bigint,url:string,warc_ts:timestamp,html:binary,text:string"),
      s"scan must not read the full row:\n$scan")
    assert(!scan.matches("(?s).*ReadSchema:[^\\n]*\\btext\\b.*"), s"crawler text column must be pruned:\n$scan")
    graft.util.Staging.deleteRec(java.nio.file.Paths.get(tmp))
  }
}
