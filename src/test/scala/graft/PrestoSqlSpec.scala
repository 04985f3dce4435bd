package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.PrestoSql

/** Presto→Spark SQL view translation, exercised on crime-shaped DDL
  * using the same dialect constructs as the reference's Athena views
  * (date_parse %T %p, date_format %W, DAY_OF_WEEK, quoted identifiers). */
class PrestoSqlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("translate rewrites the three divergent constructs") {
    val t = PrestoSql.translate(
      """SELECT date_parse(d, '%m/%d/%Y %T %p') AS ts,
        |       date_format(date_parse(d, '%m/%d/%Y %T %p'), '%W') AS dow_name,
        |       DAY_OF_WEEK(date_parse(d, '%m/%d/%Y %T %p')) AS dow_num,
        |       COUNT(*) AS "count"
        |FROM t GROUP BY 1, 2, 3""".stripMargin)
    assert(t.contains("to_timestamp(d, 'MM/dd/yyyy hh:mm:ss a')"))
    assert(t.contains("'EEEE'"))
    assert(t.contains("(weekday(to_timestamp(d, 'MM/dd/yyyy hh:mm:ss a')) + 1)"))
    assert(t.contains("`count`"))
    assert(!t.toLowerCase.contains("date_parse"))
  }

  test("translation edge cases: literals untouched, spaced calls, idempotence") {
    // function-like text inside string literals is never rewritten
    val lit = PrestoSql.translate("SELECT 'day_of_week(' AS lbl, 'date_parse(x,' AS p FROM t")
    assert(lit == "SELECT 'day_of_week(' AS lbl, 'date_parse(x,' AS p FROM t")
    // spaced call form before an unspaced one — both rewritten
    val spaced = PrestoSql.translate(
      "SELECT date_parse (a, '%Y'), date_parse(b, '%Y') FROM t")
    assert(!spaced.toLowerCase.contains("date_parse"), spaced)
    assert(spaced.contains("to_timestamp (a, 'yyyy')") || spaced.contains("to_timestamp(a, 'yyyy')"))
    // idempotent: translating already-translated SQL changes nothing
    val once = PrestoSql.translate(
      "SELECT DAY_OF_WEEK(date_parse(d, '%m/%d/%Y %T %p')) AS n FROM t")
    assert(PrestoSql.translate(once) == once)
    assert(once.contains("(weekday(to_timestamp(d, 'MM/dd/yyyy hh:mm:ss a')) + 1)"))
    // ...including for date_format: the first pass leaves a JDK pattern
    // ('EEEE') under the same function name, which a second pass must not
    // re-quote into a literal (''EEEE'')
    val fmtOnce = PrestoSql.translate("SELECT date_format(ts, '%W') AS n FROM t")
    assert(fmtOnce.contains("'EEEE'"))
    assert(PrestoSql.translate(fmtOnce) == fmtOnce, PrestoSql.translate(fmtOnce))
  }

  test("translated view executes with Presto semantics end to end") {
    Seq(
      (1L, "06/15/2021 09:30:00 PM"), // Tuesday
      (2L, "07/04/2021 08:00:00 AM"), // Sunday
    ).toDF("id", "date").createOrReplaceTempView("crimes_sqltest")
    PrestoSql.executeView(spark,
      """CREATE OR REPLACE TEMP VIEW fixed_sqltest AS
        |SELECT id,
        |       date_parse(date, '%m/%d/%Y %T %p') AS date_timestamp,
        |       date_format(date_parse(date, '%m/%d/%Y %T %p'), '%W') AS day_of_week,
        |       DAY_OF_WEEK(date_parse(date, '%m/%d/%Y %T %p')) AS day_of_week_num
        |FROM crimes_sqltest""".stripMargin)
    val got = spark.table("fixed_sqltest").collect()
      .map(r => r.getLong(0) -> (r.getTimestamp(1).toString, r.getString(2), r.getInt(3))).toMap
    assert(got(1L) == (("2021-06-15 21:30:00.0", "Tuesday", 2)))  // PM honored
    assert(got(2L) == (("2021-07-04 08:00:00.0", "Sunday", 7)))   // ISO numbering
  }
}
