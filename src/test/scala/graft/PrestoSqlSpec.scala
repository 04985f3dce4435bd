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

  test("property: generated format strings — SQL path == Column path == independent oracle") {
    // Sweep the FULL SURVEY §2.8 code map (not just the 4 codes the
    // reference views use) with seeded-random patterns, checked three
    // ways: the SQL-text translator path (PrestoSql.translate →
    // spark.sql), the Column path (PrestoCompat.dateFormatP), and an
    // INDEPENDENT driver-side oracle that implements each MySQL code
    // directly via java.time accessors — so a drift in the pattern
    // translation can't hide behind itself.
    import java.time.format.TextStyle
    import java.util.Locale
    def oracle(ts: java.time.LocalDateTime, fmt: String): String = {
      val sb = new StringBuilder
      var i = 0
      def h12 = ((ts.getHour + 11) % 12) + 1
      while (i < fmt.length) {
        val c = fmt.charAt(i)
        if (c == '%' && i + 1 < fmt.length) {
          sb.append(fmt.charAt(i + 1) match {
            case 'Y' => f"${ts.getYear}%04d"
            case 'y' => f"${ts.getYear % 100}%02d"
            case 'm' => f"${ts.getMonthValue}%02d"
            case 'c' => ts.getMonthValue.toString
            case 'd' => f"${ts.getDayOfMonth}%02d"
            case 'e' => ts.getDayOfMonth.toString
            case 'H' => f"${ts.getHour}%02d"
            case 'k' => ts.getHour.toString
            case 'h' | 'I' => f"$h12%02d"
            case 'l' => h12.toString
            case 'i' => f"${ts.getMinute}%02d"
            case 's' | 'S' => f"${ts.getSecond}%02d"
            case 'f' => f"${ts.getNano / 1000}%06d"
            case 'p' => if (ts.getHour < 12) "AM" else "PM"
            case 'T' => f"${ts.getHour}%02d:${ts.getMinute}%02d:${ts.getSecond}%02d"
            case 'W' => ts.getDayOfWeek.getDisplayName(TextStyle.FULL, Locale.US)
            case 'a' => ts.getDayOfWeek.getDisplayName(TextStyle.SHORT, Locale.US)
            case 'M' => ts.getMonth.getDisplayName(TextStyle.FULL, Locale.US)
            case 'b' => ts.getMonth.getDisplayName(TextStyle.SHORT, Locale.US)
            case 'j' => f"${ts.getDayOfYear}%03d"
            case '%' => "%"
          })
          i += 2
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }
    val fixtures = Seq(
      "2021-06-15 21:30:00",        // PM, double-digit day
      "2021-07-04 08:00:00",        // AM on the hour, Sunday
      "2021-01-02 00:00:59",        // midnight (12 AM edge)
      "2020-12-31 12:00:00",        // noon (12 PM edge), year end, leap year
      "2021-02-03 04:05:06.123456", // single digits + fractional seconds
    ).map(java.sql.Timestamp.valueOf)
    fixtures.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("id", "ts").createOrReplaceTempView("presto_prop")
    val codes = "YymcdeHkhIlispTWaMbj".map("%" + _) :+ "%%"
    // no empty separator: adjacent codes would concatenate into JDK
    // letter-runs with different meaning (%d%d -> dddd, rejected) —
    // separator-free code runs are out of the dialect's scope
    val seps = Seq(" ", "/", ":", "-", ", ", " at ")
    val rnd = new scala.util.Random(2024L)
    val patterns = (0 until 60).map { _ =>
      (0 until 1 + rnd.nextInt(5))
        .map(_ => codes(rnd.nextInt(codes.size)))
        .mkString(seps(rnd.nextInt(seps.size)))
    } ++ Seq("%m/%d/%Y %T %p", "%W", "%Y-%m-%d %H:%i:%s.%f") // the reference shapes
    patterns.foreach { pat =>
      val viaSql = spark.sql(PrestoSql.translate(
        s"SELECT id, date_format(ts, '$pat') AS out FROM presto_prop"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val viaCol = spark.table("presto_prop")
        .select($"id", graft.engine.PrestoCompat.dateFormatP($"ts", pat).as("out"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      fixtures.zipWithIndex.foreach { case (t, i) =>
        val want = oracle(t.toLocalDateTime, pat)
        assert(viaSql(i.toLong) == want, s"SQL path: pattern '$pat' on $t")
        assert(viaCol(i.toLong) == want, s"Column path: pattern '$pat' on $t")
      }
    }
  }

  test("property: parse round-trip over generated date x time patterns with ||") {
    // The PARSE direction: oracle-formatted strings (independent of the
    // translator) for every date-part x time-part combination must parse
    // back to the exact instant through the SQL-text path — including
    // the reference's 12-hour %T-with-%p intent and the || operator
    // (pass-through: Spark concat-pipes are null-propagating like
    // Presto's). %k:%i drops seconds, so its expectation truncates.
    val dateParts = Seq("%m/%d/%Y", "%Y-%m-%d", "%d.%m.%Y", "%c/%e/%Y")
    val timeParts = Seq("%T %p", "%H:%i:%s", "%h:%i:%s %p", "%k:%i")
    val fixtures = Seq("2021-06-15 21:30:00", "2021-07-04 08:00:00",
      "2021-01-02 00:00:59", "2020-12-31 12:00:00")
      .map(java.sql.Timestamp.valueOf)
    def fmtOracle(ts: java.time.LocalDateTime, fmt: String): String = {
      def h12 = ((ts.getHour + 11) % 12) + 1
      // the SURVEY §2.8 F4 intent: a %T that travels WITH %p is 12-hour
      // text (the reference's crime exports are 'hh:mm:ss a' strings),
      // so round-trip inputs for that combo are 12-hour shaped
      val tT = if (fmt.contains("%p"))
        f"$h12%02d:${ts.getMinute}%02d:${ts.getSecond}%02d"
      else f"${ts.getHour}%02d:${ts.getMinute}%02d:${ts.getSecond}%02d"
      fmt.replace("%T", tT)
        .replace("%Y", f"${ts.getYear}%04d")
        .replace("%m", f"${ts.getMonthValue}%02d")
        .replace("%c", ts.getMonthValue.toString)
        .replace("%d", f"${ts.getDayOfMonth}%02d")
        .replace("%e", ts.getDayOfMonth.toString)
        .replace("%H", f"${ts.getHour}%02d")
        .replace("%k", ts.getHour.toString)
        .replace("%h", f"$h12%02d")
        .replace("%i", f"${ts.getMinute}%02d")
        .replace("%s", f"${ts.getSecond}%02d")
        .replace("%p", if (ts.getHour < 12) "AM" else "PM")
    }
    for (dp <- dateParts; tp <- timeParts) {
      val pat = s"$dp $tp"
      fixtures.zipWithIndex
        .map { case (t, i) =>
          val lt = t.toLocalDateTime
          (i.toLong, fmtOracle(lt, dp), fmtOracle(lt, tp))
        }
        .toDF("id", "d_str", "t_str").createOrReplaceTempView("presto_parse")
      val got = spark.sql(PrestoSql.translate(
        s"SELECT id, date_parse(d_str || ' ' || t_str, '$pat') AS ts FROM presto_parse"))
        .collect().map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
      fixtures.zipWithIndex.foreach { case (t, i) =>
        val want = if (tp == "%k:%i")
          java.sql.Timestamp.valueOf(t.toLocalDateTime.withSecond(0))
        else t
        assert(got(i.toLong) == want, s"pattern '$pat' on $t")
      }
    }
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
