package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import graft.operators.{DedupState, IncrementalDedup}

/** Streaming admission for the incremental dedup state — the reference's
  * daily-drop topology (landing zone → bookmark-incremental processing)
  * applied to near-duplicate clustering: each micro-batch of newly
  * landed documents is admitted against the PERSISTED [[DedupState]]
  * with [[IncrementalDedup.admitBatch]], never re-reading old text.
  *
  * State lives as four parquet relations under `stateDir`, promoted by
  * a pointer file — the same atomic-swap shape a Delta/Iceberg table
  * commit provides, kept here to plain parquet + one rename so the
  * engine stays dependency-free. Readers (and the next batch) always
  * load the last COMMITTED version; a crash mid-write leaves garbage
  * uncommitted files and an intact previous version.
  *
  * Layout exploits that `bands` and `shingles` are APPEND-ONLY by
  * construction ([[IncrementalDedup.admitBatch]] only ever unions the
  * new batch's rows in): they live as day-partitioned log segments
  * (`bands/seg0 … segN`) and each commit writes ONLY the new batch's
  * segment — per-day state-write bytes are batch-sized, not
  * corpus-sized (asserted in DedupStreamSpec). Readers list segments
  * `0..CURRENT` as multiple root paths of one scan, so a crashed
  * segment write (pointer never moved) is invisible and plan size stays
  * constant in the day index. Only `labels`/`sizes` — the two relations
  * incremental admission actually mutates, two longs per doc / per
  * cluster — are rewritten per version (`v$N/`), which is the residual
  * cost a merge-on-write table format (Delta/Iceberg/Hudi) would remove.
  *
  * Scale notes: the per-batch compute is [[IncrementalDedup.admitBatch]]'s
  * frontier-sized plan (labels never shuffle — plan-pinned in
  * IncrementalDedupSpec); the per-batch WRITE is the new segment plus
  * the labels/sizes rewrite.
  */
object DedupStream {

  private def versionOf(stateDir: String): Option[Long] = {
    val f = new java.io.File(stateDir, "CURRENT")
    if (f.isFile) Some(java.nio.file.Files.readString(f.toPath).trim.toLong)
    else None
  }

  /** Load the last committed state, or None before the first commit.
    * `bands`/`shingles` come from the append log: every segment up to
    * the committed version, read as multiple root paths of ONE scan
    * (constant plan size; uncommitted/garbage segments above CURRENT
    * are never listed). */
  def loadState(spark: SparkSession, stateDir: String): Option[DedupState] =
    versionOf(stateDir).map { v =>
      def rd(t: String) = spark.read.parquet(s"$stateDir/v$v/$t")
      def log(t: String) = spark.read.parquet(
        (0L to v).map(i => s"$stateDir/$t/seg$i")
          .filter(p => new java.io.File(p).isDirectory): _*)
      DedupState(rd("labels"), rd("sizes"), log("bands"), log("shingles"))
    }

  /** Write the next state version and promote it. Materializes every
    * relation BEFORE the pointer moves, so a failed write never
    * publishes a partial state.
    *
    * `newBands`/`newShingles` are the CURRENT BATCH's rows only — the
    * append-log delta. Because both relations are append-only by
    * construction, the previous segments already hold everything else
    * and the commit writes O(batch) bytes for them, not O(corpus).
    * Omitting the deltas is only legal on the very first commit (the
    * full snapshot IS the delta there); passing a later full state
    * without deltas would double-count rows against the existing log,
    * so it fails loudly instead. After the pointer moves, version
    * directories older than the previous one are pruned — `labels`/
    * `sizes` history would otherwise grow O(days · corpus). */
  def commitState(st: DedupState, stateDir: String,
      newBands: Option[DataFrame] = None,
      newShingles: Option[DataFrame] = None): Long = {
    val next = versionOf(stateDir).getOrElse(-1L) + 1
    require(next == 0 || (newBands.isDefined && newShingles.isDefined),
      "commitState on an existing state requires the batch deltas for the " +
        "bands/shingles append log (a full rewrite would double-count)")
    def wr(df: DataFrame, path: String): Unit =
      df.write.mode("overwrite").parquet(s"$stateDir/$path")
    wr(st.labels, s"v$next/labels"); wr(st.sizes, s"v$next/sizes")
    wr(newBands.getOrElse(st.bands), s"bands/seg$next")
    wr(newShingles.getOrElse(st.shingles), s"shingles/seg$next")
    val tmp = java.nio.file.Paths.get(stateDir, s".CURRENT.$next.tmp")
    java.nio.file.Files.writeString(tmp, next.toString)
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(stateDir, "CURRENT"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // retention: keep current + previous version (in-flight readers of
    // the prior commit stay valid); the append log is never touched
    (0L until next - 1).map(i => new java.io.File(stateDir, s"v$i"))
      .filter(_.isDirectory)
      .foreach { d =>
        try org.apache.commons.io.FileUtils.deleteDirectory(d)
        catch { case _: Exception => } // stale history is harmless
      }
    next
  }

  /** Admit every not-yet-seen parquet drop under `docsPath` into the
    * persisted state, exactly once per file (streaming checkpoint =
    * bookmark, like [[graft.sources.Ingest.processNewFiles]]), blocking
    * until the AvailableNow run drains. Batch 0 against an empty
    * `stateDir` bootstraps with [[IncrementalDedup.initialState]].
    *
    * `docsPath` goes to the file source verbatim — when each day lands
    * as its own directory (`drops/day1/`, `drops/day2/`, the landing-
    * zone shape), pass the glob `drops/&#42;`; the file source does not
    * recurse on its own. `schemaDdl` is declared (streaming sources
    * require it) — defaults to the documents fixture shape. */
  def admitNewDrops(spark: SparkSession, docsPath: String, stateDir: String,
      checkpointDir: String,
      schemaDdl: String = "doc_id bigint, text string"): Unit = {
    val drops = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(schemaDdl))
      .parquet(docsPath)
    val q = drops.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // foreachBatch hands a streaming-backed DataFrame; admitBatch
        // builds an iterative multi-action plan over it, so pin the
        // batch to a stable local copy first
        val pinned = batch.localCheckpoint()
        if (!pinned.isEmpty) {
          val st = loadState(spark, stateDir) match {
            case Some(prev) => IncrementalDedup.admitBatch(prev, pinned)
            case None       => IncrementalDedup.initialState(pinned)
          }
          // the batch's bands/shingles are the append-log deltas; the
          // per-batch memo makes these the SAME relations admitBatch
          // already computed, not a recompute
          commitState(st, stateDir,
            newBands = Some(graft.operators.Dedup.lshBands(pinned)),
            newShingles = Some(graft.operators.Dedup.shingleSets(pinned)))
          // per-batch shingle/band memos are keyed on this batch's plan
          // and never hit again — drop them so a long-running stream
          // doesn't accumulate cached relations
          graft.operators.Dedup.clearShingleCaches()
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
