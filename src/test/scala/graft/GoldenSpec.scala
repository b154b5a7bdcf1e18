package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The frozen golden gate: the engine (through the Spark expression
  * path, i.e. the production code path) must reproduce the checked-in
  * golden outputs byte-for-byte — text, error reasons, span kinds/texts
  * AND byte offsets. Any behavior drift in tokenizer/DOM/classifier/
  * spans fails here first.
  */
class GoldenSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionTestBase.spark
  private val goldenPath = "src/test/resources/golden/golden.parquet"

  test("frozen golden corpus reproduced byte-for-byte (spark expression path)") {
    GraftFunctions.register(spark)
    val g = spark.read.parquet(goldenPath)
    assert(g.count() >= 25, "golden corpus present")
    val got = g.withColumn("r",
        call_function("extract_content", col("url"), col("html"), col("lang")))
      .withColumn("got_spans",
        expr("transform(r.spans, s -> struct(s.kind as _1, s.start as _2, s.end as _3, s.text as _4))"))
    val bad = got.filter(
      !(col("r.extracted_text").cast("binary") <=> col("expected_text").cast("binary")) ||
        !(col("r.error") <=> col("expected_error")) ||
        !(col("got_spans") <=> col("expected_spans")))
    val n = bad.count()
    if (n > 0) bad.select("url", "r.extracted_text", "expected_text", "r.error", "expected_error").show(10, 80)
    assert(n == 0, s"$n golden mismatches")
  }
}
