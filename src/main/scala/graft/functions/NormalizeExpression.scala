package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native, WHOLE-STAGE-CODEGEN
  * expression — the canonical first step of text curation (decomposed
  * accents, compatibility singletons like OHM SIGN → Ω, Hangul jamo
  * runs: all byte-distinct spellings of the same text, which would
  * defeat exact dedup (q11), shingle hashing (q12/q13) and token
  * counting alike unless folded first).
  *
  * Unlike the per-row-loop expressions in this package
  * ([[SimHash]]/[[MinHashSignature]], CodegenFallback by design), this
  * one implements `doGenCode`: the generated code is a single static
  * call into [[NfcNormalize.normalize]], so the projection stays inside
  * the WholeStageCodegen span with no boxed eval bridge — the
  * preference order the build brief names (native codegen Expression >
  * fallback > UDF). The JDK's `java.text.Normalizer` supplies the
  * Unicode algorithm (standard library, not a dependency); the fast
  * path skips allocation entirely when `Normalizer.isNormalized`
  * already holds (the overwhelmingly common case in a real corpus).
  *
  * Cross-engine note: the q84 oracle replays this with DuckDB's
  * `nfc_normalize` (utf8proc). Both implement the same stable Unicode
  * canonical-composition tables; the fixture pins the classic shapes
  * (combining accents, canonical reordering, singletons, Hangul,
  * non-BMP) so an implementation drift hash-fails.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static entry shared by interpreted eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

object NormalizeFns {
  import org.apache.spark.sql.graftbridge.Bridge

  def nfcNormalize(text: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(text)))
}
