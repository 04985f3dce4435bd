package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.time.LocalDate

/** The end-to-end pipeline driver — the reference's event-driven
  * orchestration collapsed into ordinary control flow (SURVEY.md §3):
  * CloudTrail→EventBridge→Glue-workflow triggers become function calls;
  * the four Athena views run in dependency order after each processing
  * run (the absent `execute_queries` Lambda's observable contract,
  * CDK/cdk/cdk_stack.py:307-367).
  */
object Pipeline {

  case class Dirs(landing: String, processed: String, checkpoint: String)

  /** One scheduled run (reference cadence: weekdays 10:00 UTC,
    * CDK/cdk/cdk_stack.py:50-53): fetch yesterday's updates → land CSV →
    * process only new files → refresh views. */
  def run(spark: SparkSession, source: DataFrame, dirs: Dirs,
      since: String, fileDate: LocalDate = LocalDate.now()): Unit = {
    graft.sources.Ingest.fetchRecent(source, since, dirs.landing, fileDate)
    graft.sources.Ingest.processNewFiles(
      spark, dirs.landing, dirs.processed, dirs.checkpoint)
    refreshViews(spark, dirs.processed)
  }

  /** Register the four views over the processed zone in dependency order:
    * dependency1_violent_crimes first (its consumers read it by name),
    * matching the reference's NamedQuery set (CDK/cdk/athena_queries/). */
  def refreshViews(spark: SparkSession, processedDir: String): Unit = {
    val processed = spark.read.parquet(processedDir)
    processed.createOrReplaceTempView("processed")
    val violent = CrimeViews.violentCrimes(processed)
    violent.createOrReplaceTempView("dependency1_violent_crimes")
    CrimeViews.countByCrimeType(processed)
      .createOrReplaceTempView("count_by_crime_type")
    CrimeViews.arrestPctByCommunity(violent)
      .createOrReplaceTempView("arrest_pct_by_community_violent")
    CrimeViews.fixedDates(violent)
      .createOrReplaceTempView("fixed_dates_violent")
  }

  def view(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
