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
  *    with [[PrestoCompat]] pattern translation (12-hour `%T %p` intent
  *    preserved);
  *  - `date_format(x, '<mysql fmt>')` → same with translated pattern;
  *  - `DAY_OF_WEEK(x)` → `(weekday(x) + 1)` (ISO Monday=1..Sunday=7 —
  *    Spark's `dayofweek` is Sunday=1, the classic off-by-rotation);
  *  - double-quoted identifiers (`"count"`) → backticks.
  *
  * Deliberately a targeted rewriter, not a SQL parser. All scanning is
  * string-literal-aware (text inside '...' is never rewritten), and
  * `translate` is idempotent on its own output: DAY_OF_WEEK rewrites in
  * one pass, and date_format patterns without a '%' (i.e. already-JDK
  * output of a prior pass) are left untouched. The one trade: a Presto
  * date_format whose pattern is pure literal text (no '%' codes at all)
  * passes through unquoted — pathological, since such a call formats to
  * a constant.
  */
object PrestoSql {

  /** Translate a single Presto-dialect SQL statement to Spark SQL. */
  def translate(sql: String): String = {
    // the translated JDK pattern goes back INSIDE a SQL string literal,
    // and JDK patterns quote literal letter runs with single quotes
    // ('%d at %W' -> "dd' at 'EEEE") — those must be doubled or the
    // emitted SQL literal ends early (found by the §2.8 property sweep)
    def sqlLit(pat: String): String = pat.replace("'", "''")
    var out = rewriteQuotedIdentifiers(sql)
    out = rewriteCalls(out, "date_parse") { inner =>
      val (args, pat) = splitLastLiteral(inner)
      if (pat.isEmpty) s"date_parse($inner)"
      else s"to_timestamp($args'${sqlLit(PrestoCompat.parsePatternToJava(pat))}')"
    }
    out = rewriteCalls(out, "date_format") { inner =>
      val (args, pat) = splitLastLiteral(inner)
      // A pattern with no '%' is already a JDK pattern (Spark's
      // date_format shares the name): rewriting it would quote its
      // letters into literals ('EEEE' -> ''EEEE''). Leaving it alone is
      // what makes translate(translate(x)) == translate(x) for
      // date_format too, not just DAY_OF_WEEK.
      if (pat.isEmpty || !pat.contains('%')) s"date_format($inner)"
      else s"date_format($args'${sqlLit(PrestoCompat.prestoPatternToJava(pat))}')"
    }
    out = rewriteCalls(out, "day_of_week")(inner => s"(weekday($inner) + 1)")
    out
  }

  /** Split "args..., '<pattern>'" at its LAST single-quoted literal;
    * returns (everything through the opening quote, the literal body). */
  private def splitLastLiteral(inner: String): (String, String) = {
    val lastQuote = inner.lastIndexOf('\'')
    val firstQuote = inner.lastIndexOf('\'', lastQuote - 1)
    if (firstQuote < 0 || lastQuote <= firstQuote) (inner, "")
    else (inner.substring(0, firstQuote + 1).dropRight(1),
      inner.substring(firstQuote + 1, lastQuote))
  }

  /** Find every call of `fn` OUTSIDE string literals (case-insensitive,
    * optional whitespace before the paren, word-boundary checked), rewrite
    * recursively-inner-first via `emit(innerArgs)`. */
  private def rewriteCalls(sql: String, fn: String)(emit: String => String): String = {
    val lower = sql.toLowerCase
    val f = fn.toLowerCase
    val sb = new StringBuilder
    var i = 0
    var inStr = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\'') { inStr = !inStr; sb.append(c); i += 1 }
      else if (!inStr && lower.startsWith(f, i) &&
        (i == 0 || !(sql.charAt(i - 1).isLetterOrDigit || sql.charAt(i - 1) == '_'))) {
        // require '(' after optional whitespace, else it's not a call
        var j = i + f.length
        while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
        if (j < sql.length && sql.charAt(j) == '(') {
          // scan to the matching close paren, literal-aware
          var depth = 1; var k = j + 1; var inS = false
          while (k < sql.length && depth > 0) {
            val ch = sql.charAt(k)
            if (ch == '\'') inS = !inS
            else if (!inS && ch == '(') depth += 1
            else if (!inS && ch == ')') depth -= 1
            k += 1
          }
          val inner = rewriteCalls(sql.substring(j + 1, k - 1), fn)(emit)
          sb.append(emit(inner))
          i = k
        } else { sb.append(sql.substring(i, j)); i = j }
      } else { sb.append(c); i += 1 }
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
