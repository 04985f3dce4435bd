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
  * State lives as four parquet relations under `stateDir`, written to a
  * fresh versioned directory per batch and promoted by a pointer file —
  * the same atomic-swap shape a Delta/Iceberg table commit provides,
  * kept here to plain parquet + one rename so the engine stays
  * dependency-free. Readers (and the next batch) always load the last
  * COMMITTED version; a crash mid-write leaves a garbage uncommitted
  * directory and an intact previous version.
  *
  * Scale notes: the per-batch work is [[IncrementalDedup.admitBatch]]'s
  * frontier-sized plan (labels never shuffle — plan-pinned in
  * IncrementalDedupSpec); the state REWRITE is the simple-parquet cost
  * of this formulation (bands/shingles/labels are corpus-sized files
  * copied forward per commit). A production deployment swaps the store
  * for a format with merge-on-write (Delta/Iceberg/Hudi) and keeps the
  * admission plan unchanged — the rewrite, not the computation, is what
  * those formats remove.
  */
object DedupStream {

  private def versionOf(stateDir: String): Option[Long] = {
    val f = new java.io.File(stateDir, "CURRENT")
    if (f.isFile) Some(java.nio.file.Files.readString(f.toPath).trim.toLong)
    else None
  }

  /** Load the last committed state, or None before the first commit. */
  def loadState(spark: SparkSession, stateDir: String): Option[DedupState] =
    versionOf(stateDir).map { v =>
      def rd(t: String) = spark.read.parquet(s"$stateDir/v$v/$t")
      DedupState(rd("labels"), rd("sizes"), rd("bands"), rd("shingles"))
    }

  /** Write `st` as the next version and promote it. Materializes every
    * relation BEFORE the pointer moves, so a failed write never
    * publishes a partial state. */
  def commitState(st: DedupState, stateDir: String): Long = {
    val next = versionOf(stateDir).getOrElse(-1L) + 1
    def wr(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$stateDir/v$next/$t")
    wr(st.labels, "labels"); wr(st.sizes, "sizes")
    wr(st.bands, "bands"); wr(st.shingles, "shingles")
    val tmp = java.nio.file.Paths.get(stateDir, s".CURRENT.$next.tmp")
    java.nio.file.Files.writeString(tmp, next.toString)
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(stateDir, "CURRENT"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
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
          commitState(st, stateDir)
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
