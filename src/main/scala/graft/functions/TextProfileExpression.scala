package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Every per-row count the text-analysis family needs, in ONE fused pass
  * over the document — the single-scan replacement for the ~10 separate
  * `split`/`regexp_extract_all`/`filter` array passes the composable
  * formulations in [[graft.operators.TextAnalysis]] run per row. On a
  * pretraining-data pipeline the per-row text pass IS the dominant CPU
  * cost (it touches every byte of the corpus), so collapsing the passes
  * is a direct executor-hours multiplier at 100 TB; the plan shape is
  * unchanged (narrow projection, no shuffle, embarrassingly parallel).
  *
  * Semantics are bit-for-bit those of the composable forms (asserted in
  * TextAnalysisSpec and transitively by the q7/q8/q9/q38/q50 DuckDB
  * oracles):
  *
  *  - `ws_tokens`/`distinct_tokens`/`stop_hits` tokenize like
  *    `split(trim(text), "\\s+")`: SQL `trim` strips 0x20 only, and the
  *    split keeps LEADING and TRAILING empty segments the way Spark's
  *    `split(str, re)` (limit -1) does — `"\ta b\n"` has FOUR ws tokens,
  *    two of them empty.
  *  - `n_chars` counts codepoints (Spark `length`), not UTF-16 units.
  *  - `n_punct` counts codepoints matching `[^A-Za-z0-9\s]` over the RAW
  *    text; `re_tokens` counts `[A-Za-z0-9]+|[^A-Za-z0-9\s]` matches,
  *    i.e. maximal ASCII-alnum runs plus those punct codepoints.
  *  - `stop_hits` is case-SENSITIVE (the composable form compares raw
  *    tokens), `hits_<lang>` is the marker-hit count over tokens of
  *    `lower(text)` — lowercasing never maps to/from whitespace, so the
  *    token boundaries are the raw ones and each token lowercases
  *    independently, under UTF8String.toLowerCase's whole-string branch
  *    (all-ASCII text → locale-free map; otherwise default-locale
  *    `String.toLowerCase`, matched exactly — see [[lowerToken]]).
  *
  * CodegenFallback is deliberate (the MinHashSignature precedent): all
  * work is inside this hand-written loop, evaluated once per row —
  * references to the struct's fields share the one evaluation via
  * whole-stage codegen's subexpression elimination (cpu-asserted by the
  * RunOne numbers in SCALE.md, not just argued).
  */
case class TextProfile(child: Expression, stopwords: Seq[String],
    markers: Seq[(String, Seq[String])])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(
    Seq(
      StructField("n_chars", LongType, nullable = false),
      StructField("ws_tokens", LongType, nullable = false),
      StructField("distinct_tokens", LongType, nullable = false),
      StructField("re_tokens", LongType, nullable = false),
      StructField("n_punct", LongType, nullable = false),
      StructField("stop_hits", LongType, nullable = false)) ++
      markers.map { case (lang, _) =>
        StructField(s"hits_$lang", LongType, nullable = false)
      })

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"text_profile expects string, got ${child.dataType.catalogString}")

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(s.add)
    s
  }
  @transient private lazy val markerSets: Array[java.util.HashSet[String]] =
    markers.map { case (_, words) =>
      val s = new java.util.HashSet[String]()
      words.foreach(s.add)
      s
    }.toArray

  private def isWs(c: Char): Boolean = // Java regex \s
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
  private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  /** Lowercase a token EXACTLY like the composable `lower(text)` path.
    * UTF8String.toLowerCase branches on the WHOLE string: all-ASCII →
    * locale-free char map; any non-ASCII byte anywhere → java
    * `String.toLowerCase()` under the DEFAULT locale for the entire
    * string. So the branch here keys on `asciiText` (the whole row's
    * text), not on the token — on a tr/az-locale JVM an ASCII "IS"
    * inside a text containing "café" must lowercase to "ıs" exactly as
    * the composable form does, or the equality specs (and any
    * cross-release diff) would depend on the JVM locale. */
  private def lowerToken(t: String, asciiText: Boolean): String = {
    if (asciiText) {
      var i = 0
      var needs = false
      while (i < t.length && !needs) {
        val c = t.charAt(i)
        if (c >= 'A' && c <= 'Z') needs = true
        i += 1
      }
      if (!needs) t
      else {
        val a = t.toCharArray
        var j = 0
        while (j < a.length) {
          val c = a(j)
          if (c >= 'A' && c <= 'Z') a(j) = (c + 32).toChar
          j += 1
        }
        new String(a)
      }
    } else t.toLowerCase() // default locale — UTF8String's slow path
  }

  override protected def nullSafeEval(input: Any): Any = {
    val str = input.asInstanceOf[UTF8String].toString
    val len = str.length

    // -- raw-text pass: n_chars (codepoints), n_punct, re_tokens, and
    // whether the whole text is ASCII (drives the lowercase branch) ----
    var nChars = 0L
    var nPunct = 0L
    var reTokens = 0L
    var inAlnumRun = false
    var asciiText = true
    var i = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      nChars += 1
      if (cp >= 0x80) asciiText = false
      if (cp < 0x80 && isAlnum(cp.toChar)) {
        if (!inAlnumRun) { reTokens += 1; inAlnumRun = true }
      } else {
        inAlnumRun = false
        // \s in Java regex is ASCII-only; anything else non-alnum is punct
        if (!(cp < 0x80 && isWs(cp.toChar))) { nPunct += 1; reTokens += 1 }
      }
      i += Character.charCount(cp)
    }

    // -- token pass over trim(text): SQL trim strips spaces (0x20) only -
    var lo = 0
    var hi = len
    while (lo < hi && str.charAt(lo) == ' ') lo += 1
    while (hi > lo && str.charAt(hi - 1) == ' ') hi -= 1

    var wsTokens = 0L
    var stopHits = 0L
    val markerHits = new Array[Long](markerSets.length)
    val distinct = new java.util.HashSet[String]()

    // Replicates Pattern.compile("\\s+").split(s, -1): segments between
    // whitespace runs, KEEPING a leading empty segment when the string
    // starts with a run and a trailing one when it ends with a run;
    // the empty string yields the single segment "".
    def emit(tokStart: Int, tokEnd: Int): Unit = {
      val t = str.substring(tokStart, tokEnd)
      wsTokens += 1
      distinct.add(t)
      if (stopSet.contains(t)) stopHits += 1
      val lt = lowerToken(t, asciiText)
      var m = 0
      while (m < markerSets.length) {
        if (markerSets(m).contains(lt)) markerHits(m) += 1
        m += 1
      }
    }
    var segStart = lo
    var j = lo
    while (j < hi) {
      if (isWs(str.charAt(j))) {
        emit(segStart, j)
        j += 1
        while (j < hi && isWs(str.charAt(j))) j += 1
        segStart = j
      } else j += 1
    }
    emit(segStart, hi) // final segment ("" after a trailing run / for "")

    val out = new Array[Any](6 + markerHits.length)
    out(0) = nChars
    out(1) = wsTokens
    out(2) = distinct.size.toLong
    out(3) = reTokens
    out(4) = nPunct
    out(5) = stopHits
    var m = 0
    while (m < markerHits.length) { out(6 + m) = markerHits(m); m += 1 }
    InternalRow.fromSeq(out.toIndexedSeq)
  }

  override protected def withNewChildInternal(newChild: Expression): TextProfile =
    copy(child = newChild)
  override def prettyName: String = "text_profile"
}

object TextProfileFns {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.Bridge

  /** The fused profile struct for a text column, with the engine's
    * stopword list and language-marker lexicons baked in. */
  def textProfile(c: Column, stopwords: Seq[String],
      markers: Seq[(String, Seq[String])]): Column =
    Bridge.column(TextProfile(Bridge.expression(c), stopwords, markers))
}
