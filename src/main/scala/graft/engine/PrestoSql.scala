package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Presto/Athena SQL → Spark SQL view translation — so the engine can
  * execute Athena view DDL text directly (the reference stores its
  * analytics as `CREATE OR REPLACE VIEW` NamedQueries,
  * CDK/cdk/cdk_stack.py:307-326, executed in dependency order).
  *
  * Per SURVEY.md §3/§2.8, only three constructs in the reference dialect
  * diverge from Spark SQL; everything else passes through the parser
  * unchanged:
  *
  *  - `date_parse(x, '<mysql fmt>')` → `to_timestamp(x, '<jdk fmt>')`
  *    with [[PrestoCompat.prestoPatternToJava]] pattern translation
  *    (12-hour `%T %p` intent preserved);
  *  - `date_format(x, '<mysql fmt>')` → same with translated pattern;
  *  - `DAY_OF_WEEK(x)` → `(weekday(x) + 1)` (ISO Monday=1..Sunday=7 —
  *    Spark's `dayofweek` is Sunday=1, the classic off-by-rotation);
  *  - double-quoted identifiers (`"count"`) → backticks.
  *
  * Deliberately a targeted rewriter, not a SQL parser: the function
  * rewrites are token-local and the quoting rewrite is outside string
  * literals only.
  */
object PrestoSql {

  /** Translate a single Presto-dialect SQL statement to Spark SQL. */
  def translate(sql: String): String = {
    var out = rewriteQuotedIdentifiers(sql)
    out = rewritePatternFn(out, "date_parse", "to_timestamp",
      p => {
        val j = PrestoCompat.prestoPatternToJava(p)
        // 24-hour %T paired with %p means 12-hour intent (SURVEY F4)
        if (j.contains("HH:mm:ss") && j.contains("a")) j.replace("HH:mm:ss", "hh:mm:ss") else j
      })
    out = rewritePatternFn(out, "date_format", "date_format",
      PrestoCompat.prestoPatternToJava)
    out = "(?i)\\bday_of_week\\s*\\(".r.replaceAllIn(out, "(weekday(")
    // close the extra paren we opened: weekday(x) + 1 needs the original
    // call's closing paren doubled — handled by rewriting the call shape:
    out = fixDayOfWeekParens(out)
    out
  }

  /** `day_of_week(expr)` was rewritten to `(weekday(expr)` above; append
    * `+ 1)` at the matching close paren. */
  private def fixDayOfWeekParens(sql: String): String = {
    val marker = "(weekday("
    val sb = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val at = sql.indexOf(marker, i)
      if (at < 0) { sb.append(sql.substring(i)); i = sql.length }
      else {
        sb.append(sql.substring(i, at)).append(marker)
        var depth = 1
        var j = at + marker.length
        while (j < sql.length && depth > 0) {
          val c = sql.charAt(j)
          if (c == '(') depth += 1
          else if (c == ')') depth -= 1
          if (depth > 0) sb.append(c)
          j += 1
        }
        sb.append(") + 1)")
        i = j
      }
    }
    sb.toString
  }

  /** Rewrite `fn(args..., '<pattern>')` to `newFn(args..., '<translated>')`
    * (pattern = last single-quoted literal inside the call). Paren-matching
    * scanner rather than a regex so nested calls in the args are handled. */
  private def rewritePatternFn(sql: String, fn: String, newFn: String,
      translate: String => String): String = {
    val lower = sql.toLowerCase
    val sb = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val at = lower.indexOf(fn.toLowerCase + "(", i) match {
        case -1 => lower.indexOf(fn.toLowerCase + " (", i)
        case x => x
      }
      val isWordStart = at >= 0 && (at == 0 || !sql.charAt(at - 1).isLetterOrDigit)
      if (at < 0 || !isWordStart) {
        if (at < 0) { sb.append(sql.substring(i)); i = sql.length }
        else { sb.append(sql.substring(i, at + fn.length)); i = at + fn.length }
      } else {
        sb.append(sql.substring(i, at))
        val open = sql.indexOf('(', at)
        // scan to the matching close paren, tracking string literals
        var depth = 1; var j = open + 1; var inStr = false
        while (j < sql.length && depth > 0) {
          val c = sql.charAt(j)
          if (c == '\'') inStr = !inStr
          else if (!inStr && c == '(') depth += 1
          else if (!inStr && c == ')') depth -= 1
          j += 1
        }
        val inner = sql.substring(open + 1, j - 1)
        // recurse so nested calls of the same fn are rewritten first
        val innerRw = rewritePatternFn(inner, fn, newFn, translate)
        val lastQuote = innerRw.lastIndexOf('\'')
        val firstQuote = innerRw.lastIndexOf('\'', lastQuote - 1)
        if (firstQuote >= 0 && lastQuote > firstQuote) {
          val pat = translate(innerRw.substring(firstQuote + 1, lastQuote))
          sb.append(newFn).append('(')
            .append(innerRw.substring(0, firstQuote + 1))
            .append(pat).append(innerRw.substring(lastQuote))
            .append(')')
        } else {
          sb.append(newFn).append('(').append(innerRw).append(')')
        }
        i = j
      }
    }
    sb.toString
  }

  /** Double-quoted identifiers → backticks (outside string literals). */
  private def rewriteQuotedIdentifiers(sql: String): String = {
    val sb = new StringBuilder
    var inStr = false
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\'') { inStr = !inStr; sb.append(c) }
      else if (c == '"' && !inStr) sb.append('`')
      else sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** Execute a (possibly Presto-dialect) view DDL against the session. */
  def executeView(spark: SparkSession, prestoDdl: String): DataFrame =
    spark.sql(translate(prestoDdl))
}
