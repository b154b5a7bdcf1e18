package graft.functions

import graft.extract.Extractor
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-level kernel behind [[ExtractContent]]. Static so generated code
  * can call it directly (one virtual-free call per row — the extraction
  * pipeline E1–E7 stays inside the whole-stage-codegen span instead of
  * falling back to interpreted expression eval).
  */
object ExtractKernel {
  val spanType: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("start", LongType, nullable = false),
    StructField("end", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  val schema: StructType = StructType(Seq(
    StructField("extracted_text", StringType, nullable = true),
    StructField("spans", ArrayType(spanType, containsNull = false), nullable = true),
    StructField("error", StringType, nullable = true)))

  /** (url, html, lang) → InternalRow(extracted_text, spans, error).
    * Exactly one of (extracted_text, error) is non-null. Never throws,
    * never returns null — the skip-and-log contract of the reference
    * (/root/reference/src/kafka_consumer.py:135-142).
    */
  def eval(url: Any, html: Any, lang: Any): InternalRow = {
    val u = if (url == null) null else url.asInstanceOf[UTF8String].toString
    val h = if (html == null) null else html.asInstanceOf[Array[Byte]]
    val l = if (lang == null) null else lang.asInstanceOf[UTF8String].toString
    Extractor.extract(u, h, l) match {
      case Right(doc) =>
        val spans = new GenericArrayData(doc.spans.map { s =>
          new GenericInternalRow(Array[Any](
            UTF8String.fromString(s.kind),
            java.lang.Long.valueOf(s.start),
            java.lang.Long.valueOf(s.end),
            UTF8String.fromString(s.text)))
        }.toArray[Any])
        new GenericInternalRow(Array[Any](UTF8String.fromString(doc.extracted_text), spans, null))
      case Left(bad) =>
        new GenericInternalRow(Array[Any](null, null, UTF8String.fromString(bad.reason)))
    }
  }
}

/** `extract_content(url, html, lang)` — the whole extraction operator as a
  * native Catalyst expression, usable from both the Column API and SQL.
  * Returns struct(extracted_text, spans, error); never null (errors are
  * data, not exceptions — op C2 in SURVEY.md §2.4).
  */
case class ExtractContent(url: Expression, html: Expression, lang: Expression)
    extends TernaryExpression {

  override def first: Expression = url
  override def second: Expression = html
  override def third: Expression = lang

  override def dataType: DataType = ExtractKernel.schema
  override def nullable: Boolean = false
  override def prettyName: String = "extract_content"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (url.dataType != StringType) TypeCheckFailure(s"url must be string, got ${url.dataType}")
    else if (html.dataType != BinaryType) TypeCheckFailure(s"html must be binary, got ${html.dataType}")
    else if (lang.dataType != StringType) TypeCheckFailure(s"lang must be string, got ${lang.dataType}")
    else TypeCheckSuccess
  }

  override def eval(input: InternalRow): Any =
    ExtractKernel.eval(url.eval(input), html.eval(input), lang.eval(input))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val u = url.genCode(ctx)
    val h = html.genCode(ctx)
    val l = lang.genCode(ctx)
    val code =
      code"""
        ${u.code}
        ${h.code}
        ${l.code}
        InternalRow ${ev.value} = graft.functions.ExtractKernel.eval(
          ${u.isNull} ? null : (Object) ${u.value},
          ${h.isNull} ? null : (Object) ${h.value},
          ${l.isNull} ? null : (Object) ${l.value});
      """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(url = newFirst, html = newSecond, lang = newThird)
}

/** Session-side registration so `extract_content` is callable from SQL and
  * via `call_function` from the Column API.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "extract_content",
      (exprs: Seq[Expression]) => ExtractContent(exprs(0), exprs(1), exprs(2)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize",
      (exprs: Seq[Expression]) => NfcNormalize(exprs(0)),
      "scala_udf")
  }
}
