package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row kernel, static so generated code calls it virtual-free (same
  * pattern as [[ExtractKernel]]). java.text.Normalizer is the JDK's
  * ICU-derived implementation — no extra jars.
  */
object NfcKernel {
  def nfc(s: UTF8String): UTF8String = {
    // fast path: pure-ASCII bytes are NFC by definition — the dominant
    // web-text case returns the input object without materializing a
    // java String at all
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) { if (s.getByte(i) < 0) ascii = false; i += 1 }
    if (ascii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `nfc_normalize(text)` — Unicode NFC normalization as a native codegen
  * Catalyst expression: the canonical-composition pass every web-corpus
  * pipeline runs before hashing/dedup (combining sequences, compatibility
  * singletons like U+212B, all collapse to one canonical byte form, so
  * byte-equality dedup stops being sensitive to how a crawler's source
  * encoded its accents). Null-safe, codegen-resident (no UDF), exactly
  * DuckDB's `nfc_normalize` — which is what makes it oracle-checkable.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType != StringType)
      TypeCheckFailure(s"nfc_normalize takes a string, got ${child.dataType}")
    else TypeCheckSuccess
  }

  override protected def nullSafeEval(input: Any): Any =
    NfcKernel.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcKernel.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
