package graft

import org.apache.spark.sql.DataFrame

/** Where lineage-truncating materializations go.
  *
  * Several operators pin an intermediate relation so its expensive
  * upstream runs exactly once and downstream iteration (connected-
  * component fixpoints, candidate verifies, recall ground truths) does
  * not re-plan an ever-growing lineage. On a single machine
  * `localCheckpoint()` — executor block-manager replicas — is the right
  * tool: zero filesystem round-trips. On a 1000-executor fleet those
  * replicas die with their executor and take the whole multi-stage job
  * with them past the stage-retry budget, so deployments use RELIABLE
  * checkpoints (HDFS/S3-backed `df.checkpoint()`), trading a write+read
  * of the pinned relation for fault isolation. This knob makes that a
  * configuration decision instead of prose: every load-bearing pin site
  * routes through [[Checkpoints.pin]], and results are policy-invariant
  * (spec-pinned).
  */
sealed trait CheckpointPolicy
object CheckpointPolicy {
  /** Executor block-manager storage (`df.localCheckpoint`) — fast,
    * process-local, lost on executor failure. The default. */
  case object Local extends CheckpointPolicy

  /** Filesystem-backed `df.checkpoint()` rooted at `dir` (HDFS/S3 at
    * deployment; any shared path locally) — survives executor loss. */
  final case class Reliable(dir: String) extends CheckpointPolicy
}

object Checkpoints {

  /** Process-wide policy; deployments set it once at startup. */
  @volatile var policy: CheckpointPolicy = CheckpointPolicy.Local

  /** Scoped override (tests / one-off jobs). Not re-entrant across
    * concurrently-running queries with different policies — the policy
    * is process-wide by design. */
  def withPolicy[A](p: CheckpointPolicy)(f: => A): A = {
    val prev = policy
    policy = p
    try f finally policy = prev
  }

  // SparkContext holds exactly ONE current checkpoint dir, so "is OUR
  // dir set" must track the LAST dir set per context — a seen-it-ever
  // set would skip setCheckpointDir after an intervening Reliable(other)
  // scope and silently land checkpoints under the other (possibly
  // node-local, possibly deleted) dir. Recorded only AFTER a successful
  // setCheckpointDir, so a failed set (unwritable dir) is retried, not
  // remembered.
  private val currentDir =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  // Lazy Reliable pins keep their MEMORY_AND_DISK cache alive so the one
  // later materialization feeds the checkpoint write — but that cache is a
  // CacheManager entry on the ORIGINAL plan, which free() (which only sees
  // the returned LogicalRDD) cannot reach. Track it here, keyed weakly on
  // the checkpoint RDD, so free() can drop the cache entry too instead of
  // leaking a corpus-sized cached relation for process life.
  private val lazyPinCaches =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[org.apache.spark.rdd.RDD[_], DataFrame]())

  /** Materialize `df` now (or lazily with `eager = false`) and truncate
    * its lineage, under the current [[policy]]. Identical result rows
    * either way; only the storage substrate differs.
    *
    * The Reliable path persists the plan before checkpointing:
    * `df.checkpoint()` alone runs the lineage once for the eager
    * materialization and a SECOND time inside the checkpoint-write job
    * (Spark's own documented gotcha) — the persist turns that into
    * compute-once + write-from-cache. Eager pins drop the cache as soon
    * as the files are written; lazy pins keep it so the single later
    * materialization feeds the write, released by [[free]]. */
  def pin(df: DataFrame, eager: Boolean = true): DataFrame = policy match {
    case CheckpointPolicy.Local => df.localCheckpoint(eager)
    case CheckpointPolicy.Reliable(dir) =>
      val sc = df.sparkSession.sparkContext
      if (currentDir.get(sc.applicationId) != dir) {
        sc.setCheckpointDir(dir)
        currentDir.put(sc.applicationId, dir)
      }
      val persisted =
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cp = persisted.checkpoint(eager)
      if (eager) { persisted.unpersist(blocking = false); () }
      else cp.queryExecution.analyzed.foreach {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lazyPinCaches.put(lr.rdd, persisted)
        case _ => ()
      }
      cp
  }

  /** Release the storage behind a [[pin]]ned DataFrame: block-manager
    * blocks (Local pins — checkpoint blocks are NOT CacheManager
    * entries, so `df.unpersist()` misses them) AND the checkpoint files
    * of a Reliable pin (`cleanCheckpoints` defaults to false in Spark,
    * so without this a long-running admission stream accumulates one
    * directory per pinned batch on the shared filesystem). No-op on
    * non-pinned frames. */
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
        // lazy Reliable pins also hold a CacheManager entry on the
        // original plan (see lazyPinCaches) — drop it with the pin
        Option(lazyPinCaches.remove(lr.rdd))
          .foreach(_.unpersist(blocking = false))
        lr.rdd.getCheckpointFile.foreach { f =>
          try {
            val p = new org.apache.hadoop.fs.Path(f)
            p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
              .delete(p, true)
            ()
          } catch { case _: Exception => () } // best-effort cleanup
        }
      case _ => ()
    }
}
