package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Presto/Athena dialect-compatibility helpers.
  *
  * The reference executes its analytics in Athena (Presto SQL); three of its
  * scalar functions have semantics that do NOT line up 1:1 with Spark
  * built-ins (SURVEY.md §2.8 F4-F6, §4 hazards 1-3):
  *
  *  - `date_parse(str, '%m/%d/%Y %T %p')` — MySQL-style format strings
  *    (reference: CDK/cdk/athena_queries/fixed_dates_violent.txt:7)
  *  - `date_format(ts, '%W')` — full weekday name
  *    (reference: CDK/cdk/athena_queries/fixed_dates_violent.txt:3)
  *  - `DAY_OF_WEEK(ts)` — ISO numbering Monday=1..Sunday=7, whereas Spark's
  *    `dayofweek` is Sunday=1..Saturday=7
  *    (reference: CDK/cdk/athena_queries/fixed_dates_violent.txt:4)
  *
  * These compile to *compositions of Spark built-ins* — no custom Catalyst
  * expression is needed, so everything stays inside whole-stage codegen.
  */
object PrestoCompat {

  /** Translate a MySQL/Presto `date_parse`/`date_format` pattern to a JDK
    * `DateTimeFormatter` pattern (the dialect Spark's `to_timestamp` /
    * `date_format` take). Literal text is single-quoted so stray letters
    * can't be misread as pattern characters.
    */
  def prestoPatternToJava(fmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    // Consecutive literal letters must share ONE quoted run: quoting each
    // letter separately would emit 'a''m' which the JDK parser reads as
    // the single literal a'm (escaped quote), not am.
    val litRun = new StringBuilder
    def flushLit(): Unit = if (litRun.nonEmpty) {
      sb.append('\'').append(litRun.toString.replace("'", "''")).append('\'')
      litRun.clear()
    }
    def lit(c: Char): Unit =
      if (c.isLetter || c == '\'') litRun.append(c)
      else { flushLit(); sb.append(c) }
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        flushLit()
        val code = fmt.charAt(i + 1)
        val mapped = code match {
          case 'Y' => "yyyy"
          case 'y' => "yy"
          case 'm' => "MM"
          case 'c' => "M"
          case 'd' => "dd"
          case 'e' => "d"
          case 'H' => "HH"
          case 'k' => "H"
          case 'h' | 'I' => "hh"
          case 'l' => "h"
          case 'i' => "mm"
          case 's' | 'S' => "ss"
          case 'f' => "SSSSSS"
          case 'p' => "a"
          case 'T' => "HH:mm:ss"
          case 'W' => "EEEE"
          case 'a' => "EEE"
          case 'M' => "MMMM"
          case 'b' => "MMM"
          case 'j' => "DDD"
          case '%' => "%"
          case other => other.toString // unknown code: pass through bare
        }
        sb.append(mapped); i += 2
      } else { lit(c); i += 1 }
    }
    flushLit()
    sb.toString
  }

  /** Pattern translation for the PARSE direction. The reference's pattern
    * `'%m/%d/%Y %T %p'` pairs a 24-hour `%T` with an AM/PM marker; Presto
    * honors the meridiem, so the *intent* is a 12-hour parse — translate
    * `%T` alongside `%p` to `hh:mm:ss` rather than transliterating `%T`
    * literally (SURVEY.md §2.8 F4). Single shared implementation — used by
    * both the Column helper below and the SQL-text translator. */
  def parsePatternToJava(prestoFmt: String): String =
    prestoPatternToJava(prestoFmt) match {
      case p if p.contains("HH:mm:ss") && p.contains("a") =>
        p.replace("HH:mm:ss", "hh:mm:ss")
      case p => p
    }

  /** Presto `date_parse(str, fmt)` → timestamp. */
  def dateParse(c: Column, prestoFmt: String): Column =
    to_timestamp(c, parsePatternToJava(prestoFmt))

  /** Presto `date_format(ts, fmt)` → string. */
  def dateFormatP(c: Column, prestoFmt: String): Column =
    date_format(c, prestoPatternToJava(prestoFmt))

  /** Presto `DAY_OF_WEEK` / `dow`: ISO numbering Monday=1 .. Sunday=7.
    * Spark `weekday` is Monday=0 .. Sunday=6, so `weekday + 1`. Long, like
    * Presto's bigint return type. */
  def dayOfWeekIso(c: Column): Column = (weekday(c) + lit(1)).cast("long")
}
