package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd Catalyst expression — the
  * first step of Unicode-aware text canonicalization (a decomposed
  * `e` + U+0301 and the composed `é` must fingerprint identically, or
  * visually-equal documents never dedup). Spark ships no NFC builtin;
  * a Scala UDF would force the surrounding projection out of
  * whole-stage codegen, so this rides `defineCodeGen` like the other
  * custom kernels ([[TextStats]], [[Md5Hash64]]).
  *
  * Cross-engine contract: `java.text.Normalizer` (ICU-derived JDK
  * tables) and DuckDB's utf8proc `nfc_normalize` both implement
  * canonical composition from the Unicode character database — pinned
  * equal by the `text_*_unicode` oracle gates over mixed-script text
  * with combining sequences.
  *
  * Fast path: NFC quick-check is O(n) and allocation-free for the
  * overwhelmingly-common already-composed input; only strings that
  * actually need composition pay the normalize allocation.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc requires a string input, got ${t.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
