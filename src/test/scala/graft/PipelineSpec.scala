package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Pipeline
import graft.sources.Ingest
import java.nio.file.{Files, Paths}
import java.time.LocalDate

/** End-to-end replay of the reference pipeline (SURVEY.md §5 item 4):
  * two daily CSV drops → ingest → bookmark-incremental processing →
  * partitioned parquet → views, asserting bookmark semantics, duplicate
  * preservation (hazard 7), partition layout, and view outputs. */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def freshDirs(): Pipeline.Dirs = {
    val root = Files.createTempDirectory("graft-pipe").toString
    Pipeline.Dirs(s"$root/input", s"$root/processed", s"$root/checkpoint")
  }

  // crime-shaped source rows (id, date, primary_type, description, arrest,
  // community_area, year, updated_on)
  def srcRows(upTo: String) = Seq(
    (1L, "06/15/2021 09:30:00 PM", "ROBBERY", "ARMED - HANDGUN", true, 25L, 2021L, "2021-06-16 01:00:00"),
    (2L, "06/15/2021 11:00:00 AM", "THEFT", "OVER $500", false, 25L, 2021L, "2021-06-16 01:00:00"),
    (3L, "07/01/2021 08:00:00 AM", "ASSAULT", "AGGRAVATED", true, 7L, 2021L, "2021-07-02 01:00:00"),
    (4L, "07/02/2021 10:00:00 PM", "BATTERY", "SIMPLE", false, 7L, 2021L, "2021-07-03 01:00:00"),
  ).toDF("id", "date", "primary_type", "description", "arrest",
      "community_area", "year", "updated_on")
    .withColumn("case_number", concat(lit("JE"), col("id")))
    .withColumn("domestic", lit(false))
    .withColumn("latitude", lit(41.88))
    .withColumn("longitude", lit(-87.63))
    .filter(col("updated_on") <= upTo)
    // CSV schema binds by position: emit the canonical crime column order
    .select(Ingest.crimeSchemaDdl.split(",").map(_.trim.split(" ")(0)).map(col): _*)

  test("two-run pipeline: bookmark increments, duplicates preserved, partition layout, views") {
    val dirs = freshDirs()

    // Day 1: rows updated through 2021-06-16 land and process.
    Pipeline.run(spark, srcRows("2021-06-30"), dirs,
      since = "2021-01-01", fileDate = LocalDate.parse("2021-06-16"))
    val afterDay1 = spark.read.parquet(dirs.processed).count()
    assert(afterDay1 == 2)

    // Day 2: a new file lands with day-3+4 rows PLUS re-fetched row 3
    // (late update) — the reference appends without dedup (hazard 7).
    Pipeline.run(spark, srcRows("2021-07-31"), dirs,
      since = "2021-06-30", fileDate = LocalDate.parse("2021-07-03"))
    val processed = spark.read.parquet(dirs.processed)
    assert(processed.count() == 4, "day-1 file NOT reprocessed (bookmark), day-2 file appended")

    // Partition layout year=YYYY/month=M (from the derived month column).
    assert(Files.exists(Paths.get(dirs.processed, "year=2021", "month=6")))
    assert(Files.exists(Paths.get(dirs.processed, "year=2021", "month=7")))

    // Third run with NO new file: bookmark means zero new rows.
    Ingest.processNewFiles(spark, dirs.landing, dirs.processed, dirs.checkpoint)
    assert(spark.read.parquet(dirs.processed).count() == 4)

    // Views resolve in dependency order and compute reference semantics.
    Pipeline.refreshViews(spark, dirs.processed)
    val violent = Pipeline.view(spark, "dependency1_violent_crimes")
    assert(violent.select("id").as[Long].collect().toSet == Set(1L, 3L, 4L))
    val pct = Pipeline.view(spark, "arrest_pct_by_community_violent")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(pct(25L) == 100.0) // 1 violent, 1 arrest
    assert(pct(7L) == 50.0)   // 2 violent, 1 arrest
    val fixed = Pipeline.view(spark, "fixed_dates_violent")
      .select("id", "day_of_week", "day_of_week_num")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(fixed.contains((1L, "Tuesday", 2L)))
  }

  test("SQL-path view refresh (Presto dialect DDL) equals the DataFrame path") {
    val dirs = freshDirs()
    Pipeline.run(spark, srcRows("2021-07-31"), dirs,
      since = "2021-01-01", fileDate = LocalDate.parse("2021-07-03"))
    def snapshot(): Map[String, Seq[String]] =
      Seq("dependency1_violent_crimes", "count_by_crime_type",
        "arrest_pct_by_community_violent", "fixed_dates_violent").map { v =>
        val df = Pipeline.view(spark, v)
        // sorted multiset, not a Set: a duplicated/dropped row must fail
        v -> df.select(df.columns.sorted.map(col): _*)
          .collect().map(_.toString).toSeq.sorted
      }.toMap
    Pipeline.refreshViews(spark, dirs.processed)
    val dataframePath = snapshot()
    Pipeline.refreshViewsSql(spark, dirs.processed)
    val sqlPath = snapshot()
    assert(dataframePath == sqlPath)
  }

  test("ingest guard: header-only extract is not written") {
    val dirs = freshDirs()
    val none = Ingest.fetchRecent(srcRows("2021-12-31"), since = "2099-01-01",
      dirs.landing, LocalDate.parse("2022-01-01"))
    assert(none.isEmpty)
    assert(!Files.exists(Paths.get(dirs.landing, "recent_source_data_2022-01-01.csv")))
  }

  test("late re-fetch duplicates append (no dedup), matching reference") {
    val dirs = freshDirs()
    Pipeline.run(spark, srcRows("2021-07-31"), dirs,
      since = "2021-01-01", fileDate = LocalDate.parse("2021-07-03"))
    // same rows land again under a new date -> duplicates by design
    Pipeline.run(spark, srcRows("2021-07-31"), dirs,
      since = "2021-01-01", fileDate = LocalDate.parse("2021-07-04"))
    val processed = spark.read.parquet(dirs.processed)
    assert(processed.count() == 8)
    assert(processed.groupBy("id").count().filter(col("count") === 2).count() == 4)
  }
}
