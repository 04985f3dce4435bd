package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused SimHash of a document in ONE per-row pass: split on whitespace,
  * md5 each token once (every occurrence votes — NOT distinct tokens,
  * matching the composable formulation and the DuckDB oracle), accumulate
  * the ±1 per-bit votes into a local int array, pack the sign bits.
  *
  * Semantically identical to the nested-HOF formulation it replaces
  * (`aggregate(zip_with(aggregate(transform(...))))` in
  * [[graft.operators.Dedup]]) — same `md5[0:15hex]` 60-bit token hash as
  * [[MinHashSignature]], same `vote > 0` sign rule — asserted equal in
  * DedupSpec and pinned by the q15/q36/q52 oracles. The HOF version paid
  * ~2·bits boxed lambda invocations per TOKEN (zip_with allocates a fresh
  * 60-element array per token) and dominated the q15 cold bench.
  *
  * CodegenFallback is deliberate, as with [[MinHashSignature]]: evaluated
  * once per row with all work inside this loop; whole-stage codegen
  * granularity buys nothing.
  */
case class SimHash(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {

  require(bits >= 1 && bits <= 60, s"simhash bits must be in [1,60], got $bits")

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash expects string, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any = {
    // Same tokenization as the HOF `split(trim(text), '\s+')`: Java's
    // trim+split yields [""] for empty text exactly as Spark's does, so
    // the empty-document hash matches (md5 of "" still votes).
    val words = input.asInstanceOf[UTF8String].toString.trim.split("\\s+")
    val votes = new Array[Int](bits)
    val md = java.security.MessageDigest.getInstance("MD5")
    var w = 0
    while (w < words.length) {
      md.reset()
      val dig = md.digest(words(w).getBytes("UTF-8"))
      // first 15 hex chars = 60 bits: bytes 0..6 full + high nibble of
      // byte 7 — identical to MinHashSignature's token hash
      var h = 0L
      var i = 0
      while (i < 7) { h = (h << 8) | (dig(i) & 0xffL); i += 1 }
      h = (h << 4) | ((dig(7) & 0xf0L) >> 4)
      var b = 0
      while (b < bits) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      w += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) { if (votes(b) > 0) out |= 1L << b; b += 1 }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashFns {
  import org.apache.spark.sql.graftbridge.Bridge

  def simhash(text: Column, bits: Int): Column =
    Bridge.column(SimHash(Bridge.expression(text), bits))
}
