package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.time.LocalDate

/** Incremental ingest — the reference's Lambda + job-bookmark semantics
  * re-expressed locally (SURVEY.md §2.1 S2/S3/S5, §3 E1/E2):
  *
  *  - [[fetchRecent]] ≈ Additional_Data_Function/get_data_api.py:10-24 —
  *    pull rows updated since `since` (server-side predicate pushdown in
  *    the reference's SoQL `$where`; here a filter over a source table),
  *    land them verbatim as `input/recent_source_data_<date>.csv`, and
  *    skip the write when only a header would land (the `len(text) > 250`
  *    guard at get_data_api.py:16). Re-fetches DUPLICATE rows updated late
  *    — the reference never dedups (SURVEY.md §4 hazard 7) and parity
  *    requires preserving that.
  *
  *  - [[processNewFiles]] ≈ the Glue job with `--job-bookmark-option:
  *    job-bookmark-enable` (CDK/cdk/cdk_stack.py:165): a Structured
  *    Streaming CSV file source with checkpoint + Trigger.AvailableNow
  *    gives exactly-once-per-file processing across restarts — the Spark-
  *    native bookmark. Output is the processed zone: parquet partitioned
  *    by (year, month) like Glue Script/process_crime_data.py:32-37.
  */
object Ingest {

  /** Fetch source rows with `updated_on > since` and land them as a dated
    * CSV in `landingDir`. Returns the written path, or None when the
    * extract was effectively empty (header-only guard). */
  def fetchRecent(source: DataFrame, since: String, landingDir: String,
      fileDate: LocalDate = LocalDate.now()): Option[Path] = {
    import org.apache.spark.sql.functions.col
    val fresh = source.filter(col("updated_on") > since)
    val header = source.columns.mkString(",")
    val rows = fresh.collect().map(_.toSeq.map {
      case null => ""
      case s: String if s.exists(ch => ch == ',' || ch == '"' || ch == '\n' || ch == '\r') =>
        "\"" + s.replace("\"", "\"\"") + "\""
      case v => v.toString
    }.mkString(","))
    val body = (header +: rows).mkString("\n")
    // reference guard: only a header (<= 250 chars, get_data_api.py:16)
    if (body.length <= 250) return None
    Files.createDirectories(Paths.get(landingDir))
    // Never overwrite an already-landed file: the streaming bookmark keys
    // seen files by PATH, so rewriting a processed path would silently
    // drop the new rows forever. A same-day re-fetch lands under a
    // unique suffixed name instead (the duplicates this can introduce
    // are reference semantics — SURVEY.md §4 hazard 7).
    val base = s"recent_source_data_$fileDate"
    val out = Iterator.from(0)
      .map(i => Paths.get(landingDir, if (i == 0) s"$base.csv" else s"$base-$i.csv"))
      .find(!Files.exists(_)).get
    Files.writeString(out, body, StandardOpenOption.CREATE_NEW)
    Some(out)
  }

  /** Crime CSV schema (the columns the reference reads, FIXTURES.md §B).
    * Declared rather than inferred so the streaming source is stable when
    * daily files drift (the crawler's CombineCompatibleSchemas analog is
    * spark's permissive column-by-name union at read). */
  val crimeSchemaDdl: String =
    "id bigint, case_number string, date string, primary_type string, " +
      "description string, arrest boolean, domestic boolean, " +
      "community_area bigint, year bigint, updated_on string, " +
      "latitude double, longitude double"

  /** Process all not-yet-seen CSVs in `landingDir` into the partitioned
    * processed zone, exactly once per file (checkpoint = bookmark). Blocks
    * until the AvailableNow run drains. Returns count of batches run. */
  def processNewFiles(spark: SparkSession, landingDir: String,
      processedDir: String, checkpointDir: String): Unit = {
    val raw = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(crimeSchemaDdl))
      .option("header", "true")
      .csv(landingDir)
    val enriched = graft.engine.CrimeViews.enrich(raw)
    val q = enriched.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append")
          .partitionBy("year", "month")
          .option("compression", "uncompressed") // process_crime_data.py:37
          .parquet(processedDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
