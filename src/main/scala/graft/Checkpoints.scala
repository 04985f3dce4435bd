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

  // setCheckpointDir appends a random child dir per call, so "is it
  // already set to OUR dir" cannot be read back from the context —
  // track the (context, dir) pairs this process already configured.
  private val configured =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String)]()

  /** Materialize `df` now (or lazily with `eager = false`) and truncate
    * its lineage, under the current [[policy]]. Identical result rows
    * either way; only the storage substrate differs. */
  def pin(df: DataFrame, eager: Boolean = true): DataFrame = policy match {
    case CheckpointPolicy.Local => df.localCheckpoint(eager)
    case CheckpointPolicy.Reliable(dir) =>
      val sc = df.sparkSession.sparkContext
      if (configured.add((sc.applicationId, dir))) sc.setCheckpointDir(dir)
      df.checkpoint(eager)
  }
}
