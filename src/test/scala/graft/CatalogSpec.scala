package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Catalogs, Pipeline}
import java.time.LocalDate

/** Persistent-catalog semantics (SURVEY.md §2.1 S6/S7): catalog tables and
  * views must outlive the session that created them — a FRESH session over
  * the same catalog (newSession: fresh session state, shared external
  * catalog = shared warehouse) still resolves them, while temp views die
  * with their session. This is the Glue-catalog behavior the reference
  * relies on (crawler registers once, Athena queries forever). */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def processedZone(): String = {
    val root = java.nio.file.Files.createTempDirectory("graft-cat").toString
    val dirs = Pipeline.Dirs(s"$root/input", s"$root/processed", s"$root/checkpoint")
    import spark.implicits._
    val src = Seq(
      (1L, "06/15/2021 09:30:00 PM", "ROBBERY", "ARMED - HANDGUN", true, 25L, 2021L, "2021-06-16 01:00:00"),
      (2L, "06/15/2021 11:00:00 AM", "THEFT", "OVER $500", false, 25L, 2021L, "2021-06-16 01:00:00"),
      (3L, "07/01/2021 08:00:00 AM", "ASSAULT", "AGGRAVATED", true, 7L, 2021L, "2021-07-02 01:00:00"),
    ).toDF("id", "date", "primary_type", "description", "arrest",
        "community_area", "year", "updated_on")
      .withColumn("case_number", concat(lit("JE"), col("id")))
      .withColumn("domestic", lit(false))
      .withColumn("latitude", lit(41.88))
      .withColumn("longitude", lit(-87.63))
      .select(graft.sources.Ingest.crimeSchemaDdl.split(",")
        .map(_.trim.split(" ")(0)).map(col): _*)
    Pipeline.run(spark, src, dirs, since = "2021-01-01",
      fileDate = LocalDate.parse("2021-07-02"))
    dirs.processed
  }

  test("persistent views survive into a fresh session; temp views do not") {
    val processed = processedZone()
    Pipeline.refreshViews(spark, processed) // temp-view path, for contrast
    Catalogs.refreshViewsPersistent(spark, processed)

    val fresh = spark.newSession()
    // catalog objects: visible from the fresh session
    assert(fresh.catalog.tableExists(s"${Catalogs.CrimeDb}.processed"))
    assert(fresh.catalog.tableExists(s"${Catalogs.CrimeDb}.dependency1_violent_crimes"))
    val violent = fresh.table(s"${Catalogs.CrimeDb}.dependency1_violent_crimes")
    assert(violent.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    // partition recovery registered both months' partitions
    assert(fresh.table(s"${Catalogs.CrimeDb}.processed").count() == 3)
    // temp views: session-scoped, gone in the fresh session
    assert(!fresh.catalog.tableExists("dependency1_violent_crimes"))

    // persistent views compute the same results as the temp-view path
    val tempPct = Pipeline.view(spark, "arrest_pct_by_community_violent")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val persPct = fresh.table(s"${Catalogs.CrimeDb}.arrest_pct_by_community_violent")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(tempPct == persPct)
    val dow = fresh.table(s"${Catalogs.CrimeDb}.fixed_dates_violent")
      .select("id", "day_of_week", "day_of_week_num")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(dow.contains((1L, "Tuesday", 2L)))
  }

  test("verbatim reference DDL files execute and row-equal the paraphrased views") {
    // The E3 contract proper: the four Athena NamedQuery files run
    // BYTE-FOR-BYTE (read straight from the reference tree, no edits),
    // with their qualified "glue_crime_db"."..." names resolving against
    // a real catalog database, and each resulting persistent view equals
    // the paraphrased refreshViews temp-view path row-for-row.
    val refDir = java.nio.file.Paths.get("/root/reference/CDK/cdk/athena_queries")
    assume(java.nio.file.Files.isDirectory(refDir), "reference tree not mounted")
    def slurp(f: String): String =
      new String(java.nio.file.Files.readAllBytes(refDir.resolve(f)), "UTF-8")
    val processed = processedZone()
    Pipeline.refreshViews(spark, processed)
    Catalogs.refreshViewsVerbatim(spark, processed, Seq(
      slurp("dependency1_violent_crimes.txt"),
      slurp("count_by_crime_type.txt"),
      slurp("arrest_pct_by_community_VIOLENT.txt"),
      slurp("fixed_dates_violent.txt")))

    // column ORDER differs by design (e.g. the verbatim arrest view
    // interleaves tot_arrests/tot_reports); compare on sorted column
    // names, values via toString (int-vs-long width is representation)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val cols = df.columns.sorted.map(col)
      df.select(cols.toIndexedSeq: _*).collect().map(_.toString).toSeq.sorted
    }
    val fresh = spark.newSession()
    Seq("dependency1_violent_crimes", "count_by_crime_type",
      "arrest_pct_by_community_violent", "fixed_dates_violent").foreach { v =>
      val verbatim = fresh.table(s"glue_crime_db.$v")
      val paraphrase = Pipeline.view(spark, v)
      assert(verbatim.columns.sorted.toSeq == paraphrase.columns.sorted.toSeq,
        s"$v column sets differ")
      assert(rows(verbatim) == rows(paraphrase), s"$v rows differ")
    }
  }

  test("second catalog domain: lookup table registered and broadcast-joined") {
    Catalogs.registerNeighborhoodDb(spark, "/root/testdata/sf0.001")
    val fresh = spark.newSession()
    assert(fresh.catalog.tableExists(s"${Catalogs.NeighborhoodDb}.community_lookup"))
    val out = Catalogs.lookupJoin(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.length == 15)
    assert(rows.forall(r => r.getAs[String]("community_name") != null))
    // the lookup side must be broadcast, never shuffled
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }

  test("lookup registration survives a RELATIVE sf dir") {
    // regression: CREATE TABLE ... LOCATION resolves a relative path
    // against the warehouse dir, not the CWD — registering from e.g.
    // target/scale/sf0.5 used to point at an empty path and fail with
    // UNABLE_TO_INFER_SCHEMA at first read
    val rel = "target/catalogspec-rel"
    val abs = new java.io.File(rel)
    org.apache.commons.io.FileUtils.deleteQuietly(abs)
    spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
      .write.parquet(s"$rel/nation.parquet")
    try {
      Catalogs.registerNeighborhoodDb(spark, rel)
      assert(spark.table(s"${Catalogs.NeighborhoodDb}.community_lookup")
        .count() == 25)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(abs)
  }

  test("lookup registration survives a path with spaces") {
    // regression: scheme detection used java.net.URI.create, which throws
    // IllegalArgumentException on URI-illegal characters — a path a
    // filesystem happily allows and Spark's LOCATION parsing tolerates
    val rel = "target/catalogspec dir with spaces"
    val abs = new java.io.File(rel)
    org.apache.commons.io.FileUtils.deleteQuietly(abs)
    spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
      .write.parquet(s"$rel/nation.parquet")
    try {
      Catalogs.registerNeighborhoodDb(spark, rel)
      assert(spark.table(s"${Catalogs.NeighborhoodDb}.community_lookup")
        .count() == 25)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(abs)
  }
}
