package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native, WHOLE-STAGE-CODEGEN expression,
  * parameterized by form (r19 generalization of the r18 NFC-only
  * expression) — the canonical first step of text curation:
  *
  *  - `form = "NFC"`, `casefold = false` (q84): canonical composition —
  *    decomposed accents, compatibility singletons like OHM SIGN → Ω,
  *    Hangul jamo runs: byte-distinct spellings of the same text, which
  *    would defeat exact dedup (q11), shingle hashing (q12/q13) and
  *    token counting alike unless folded first.
  *  - `form = "NFKC"`, `casefold = true` (q89): the PRODUCTION dedup
  *    key — compatibility decomposition (ligatures ﬁ → fi, fullwidth
  *    ２３ → 23, unit squares ㎞ → km) plus case folding, so "ＨＥＬＬＯ"
  *    and "hello" share one key. Casefold here is
  *    `String.toLowerCase(Locale.ROOT)` followed by an NFC re-normalize
  *    (lowercasing can emit non-composed sequences, e.g. İ → i +
  *    combining dot) — deliberately the JDK's simple lowercase, NOT
  *    Unicode full case folding: ß stays ß (full folding maps it to
  *    ss). The q89 fixture DECLARES that choice so a drift is a hash
  *    failure, not a silent redefinition.
  *
  * Unlike the per-row-loop expressions in this package
  * ([[SimHash]]/[[MinHashSignature]], CodegenFallback by design), this
  * one implements `doGenCode`: the generated code is a single static
  * call into [[UnicodeNormalize.fold]], so the projection stays inside
  * the WholeStageCodegen span with no boxed eval bridge — the
  * preference order the build brief names (native codegen Expression >
  * fallback > UDF). The JDK's `java.text.Normalizer` supplies the
  * Unicode algorithm (standard library, not a dependency); the fast
  * path skips allocation entirely when the input is already normalized
  * (the overwhelmingly common case in a real corpus).
  *
  * Cross-engine note: the q84 oracle replays NFC with DuckDB's
  * `nfc_normalize` (utf8proc — see the version-skew caveat on
  * [[graft.operators.TextAnalysis.qUnicodeNormalizeSql]]). DuckDB has
  * NO NFKC, so q89's oracle instead declares expected folded forms in
  * its fixture and derives organic rows from `lower(nfc_normalize(…))`
  * — exact on this corpus, where NFC ≡ NFKC and ASCII lower ≡ fold
  * (the q72 oracle pattern).
  */
case class UnicodeNormalize(child: Expression, form: String,
    casefold: Boolean) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize expects string, got ${child.dataType.catalogString}")
    else if (!UnicodeNormalize.Forms.contains(form))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"unknown normalization form '$form' (one of ${UnicodeNormalize.Forms.mkString(", ")})")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormalize.fold(input.asInstanceOf[UTF8String], form, casefold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // form is validated against the enum whitelist above, so splicing
    // it as a string literal is safe
    defineCodeGen(ctx, ev, c =>
      s"""graft.functions.UnicodeNormalize.fold($c, "$form", $casefold)""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Static entry shared by interpreted eval and generated code. */
  def fold(s: UTF8String, form: String, casefold: Boolean): UTF8String = {
    val f = java.text.Normalizer.Form.valueOf(form)
    val str = s.toString
    val normed =
      if (java.text.Normalizer.isNormalized(str, f)) str
      else java.text.Normalizer.normalize(str, f)
    if (!casefold) {
      if (normed eq str) s else UTF8String.fromString(normed)
    } else {
      // lowercasing can denormalize (e.g. İ U+0130 lowers to i + U+0307,
      // a decomposition), so re-normalize — to the REQUESTED form, not a
      // hardcoded NFC: form=NFKD/NFD with casefold=true must yield output
      // in that form (r19 advice: the old NFC constant silently returned
      // composed output for the decomposed forms)
      val lower = normed.toLowerCase(java.util.Locale.ROOT)
      val out =
        if (java.text.Normalizer.isNormalized(lower, f)) lower
        else java.text.Normalizer.normalize(lower, f)
      if (out == str) s else UTF8String.fromString(out)
    }
  }
}

object NormalizeFns {
  import org.apache.spark.sql.graftbridge.Bridge

  def nfcNormalize(text: Column): Column =
    Bridge.column(UnicodeNormalize(Bridge.expression(text), "NFC",
      casefold = false))

  /** The production dedup-key fold: NFKC + ROOT-locale lowercase + NFC
    * re-normalize (see the casefold note on [[UnicodeNormalize]]). */
  def nfkcCasefold(text: Column): Column =
    Bridge.column(UnicodeNormalize(Bridge.expression(text), "NFKC",
      casefold = true))
}
