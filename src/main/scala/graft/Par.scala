package graft

/** Shared concurrency/diagnostic helpers for the persisted-state commit
  * paths (text [[graft.streaming.DedupStream]] and embedding
  * [[graft.operators.EmbeddingIncremental]] /
  * [[graft.streaming.EmbedStream]] sides — one definition, no drift). */
private[graft] object Par {

  /** Run independent Spark actions as concurrent jobs (one commit's
    * segment/tier writes touch disjoint paths and share no lineage
    * beyond already-pinned blocks) — wall time is the slowest task, not
    * the sum. AWAITS EVERY task before propagating the first failure:
    * returning on first error would leave sibling writers running in
    * the background, and a same-process retry of the commit would then
    * race those zombies on the very seg paths it overwrites. */
  def inParallel(tasks: (() => Unit)*): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.util.Try
    val done = Await.result(
      Future.sequence(tasks.map(tk => Future(Try(tk())))), Duration.Inf)
    done.foreach(_.get)
  }

  /** Stable identity of a streaming checkpoint LINEAGE, recorded in
    * state manifests next to the admitting micro-batch id. Batch ids
    * are monotonic only WITHIN one lineage — a fresh checkpoint
    * restarts at 0, and a bare id comparison would then skip
    * legitimate new batches — so the replay guard requires BOTH the id
    * and this identity to match (the Delta txnAppId/txnVersion
    * recipe). The identity is the streaming QUERY ID Spark persists in
    * `<ckpt>/metadata` at query start (stable across restarts, and
    * across a checkpoint image restored to a different path — the
    * crash-recovery case the guard exists for); the path itself is the
    * fallback for a not-yet-initialized checkpoint. Returned VERBATIM,
    * not hashed: the manifest is free-form JSON, and a compressed hash
    * (a 32-bit value colliding between a fresh lineage and the recorded
    * one) would silently skip legitimate new batches. */
  def ckptIdentity(checkpointDir: String): String = {
    val meta = new java.io.File(checkpointDir, "metadata")
    (if (meta.isFile)
      """"id"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(
        java.nio.file.Files.readString(meta.toPath)).map(_.group(1))
    else None)
      .getOrElse(new java.io.File(checkpointDir).getAbsolutePath)
  }

  /** Run `body`; on failure, JOIN the given in-flight writer before
    * rethrowing — the single place encoding the no-zombie-writers
    * contract ([[background]]'s counterpart). The join handle is
    * memoized, so when the WRITER ITSELF was the failure that `body`
    * rethrew, the re-join yields the identical exception instance —
    * guarded, because `addSuppressed(self)` throws IllegalArgument and
    * would replace the real diagnostic. */
  def joinOnFailure[A](join: () => Unit)(body: => A): A =
    try body
    catch { case e: Throwable =>
      try join()
      catch { case w: Throwable => if (w ne e) e.addSuppressed(w) }
      throw e
    }

  /** Identity forms the replay guard accepts for the CURRENT lineage:
    * the raw query-id string (what this build records), plus the
    * `murmur:`-tagged 32-bit hash form older manifests recorded — a
    * store committed by a previous build keeps its (weaker, but
    * existing) guard across the upgrade instead of silently admitting a
    * redelivered batch twice. New commits always record the raw id;
    * the legacy form ages out with the manifest that carries it. */
  def ckptIdentityCandidates(checkpointDir: String): Seq[String] = {
    val id = ckptIdentity(checkpointDir)
    Seq(id,
      "murmur:" + scala.util.hashing.MurmurHash3.stringHash(id).toLong)
  }

  /** Run `f` with adaptive query execution OFF — for the daily-admission
    * paths, whose relations are frontier/batch-sized BY CONSTRUCTION
    * (bounded takes, pinned batches, touched-bucket reads). AQE's
    * runtime re-planning buys nothing at that size and materializes
    * every exchange as its own Spark job: measured ~7 pure scheduling
    * jobs per admission day on the text chain (23 → 16 jobs/day, equal
    * or better wall). Corpus-sized work (bootstrap clustering feeds,
    * analytic queries) keeps AQE — only the admission commit scope is
    * static. Session-scoped set/restore: admissions are sequential by
    * the single-writer store contract, and an admission's own
    * backgrounded writes are joined inside the scope. */
  def withStaticPlan[A](spark: org.apache.spark.sql.SparkSession)(f: => A): A = {
    val k = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(k, "true")
    spark.conf.set(k, "false")
    try f finally spark.conf.set(k, prev)
  }

  /** Start `task` as a concurrent Spark-action thread NOW and return its
    * join handle — for a commit write whose inputs are ready before the
    * rest of the admission's work, so the write overlaps it instead of
    * queueing behind it. The handle MUST be invoked on every path
    * (including failure of the intervening work — join-then-rethrow, the
    * same no-zombie-writers contract as [[inParallel]]): it awaits
    * completion and rethrows the task's failure. */
  def background(task: () => Unit): () => Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.util.Try
    val fut = Future(Try(task()))
    () => Await.result(fut, Duration.Inf).get
  }

  /** Minimal JSON string escaping for manifest fields ([[ckptIdentity]]
    * values are UUIDs or filesystem paths — backslash and quote are the
    * only characters that can break the manifest's hand-rolled JSON). */
  def jsonEscape(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  def jsonUnescape(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")

  /** Cumulative (Spark job count, task-input bytes) meter — ONE
    * listener per instance; both reads drain the listener bus first so
    * a just-finished action's events are counted. Shared by the
    * GRAFT_CHAIN_DEBUG phase timer below and the ChainProbe read
    * columns, so the two can never measure different things. */
  final class Meter(sc: org.apache.spark.SparkContext,
      drainTimeoutMs: Long = 10000) {
    private val jobCount = new java.util.concurrent.atomic.AtomicLong
    private val readBytes = new java.util.concurrent.atomic.AtomicLong
    private val listener =
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobCount.incrementAndGet(); ()
        }
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) readBytes.addAndGet(m.inputMetrics.bytesRead)
          ()
        }
      }
    sc.addSparkListener(listener)

    /** Unregister from the listener bus. A Meter is registered for the
      * JVM's lifetime otherwise — a probe run creating one meter per
      * variant would accumulate listeners that keep counting (and
      * paying bus dispatch) long after their columns were printed.
      * Drains the bus FIRST so events already emitted but not yet
      * dispatched land in the counters — reads after close() then
      * return the final counts (a remove-without-drain would silently
      * drop the last action's queued events). */
    def close(): Unit = {
      drain()
      sc.removeSparkListener(listener)
    }
    // only a drain TIMEOUT degrades to a possibly-stale read (the
    // counters are still monotone); any other failure means the meter's
    // numbers can't be trusted and must fail loudly — these columns are
    // committed bench evidence
    private def drain(): Unit =
      try org.apache.spark.sql.graftbridge.Bridge
        .drainListenerBus(sc, drainTimeoutMs)
      catch { case _: java.util.concurrent.TimeoutException => () }
    def jobs: Long = { drain(); jobCount.get }
    def read: Long = { drain(); readBytes.get }
    def jobsAndRead: (Long, Long) = { drain(); (jobCount.get, readBytes.get) }
  }

  /** Env-gated (GRAFT_CHAIN_DEBUG) phase timer for the admission
    * paths; `tag` carries the side-specific prefix. Also reports the
    * Spark JOB count the phase launched — the chains' floor is
    * sequential small jobs, so the count is the thing to optimize —
    * and the task-metric INPUT BYTES the phase read, the column that
    * attributes any per-day cpu trend at a fixed job count (a probe
    * whose read mass tracks state size shows up here, per phase).
    *
    * CAVEAT: both deltas are GLOBAL counters, so phases timed
    * CONCURRENTLY (the commit's inParallel write tasks) inflate each
    * other — trust the per-phase numbers only for sequential phases
    * (the admit.* chain); for a parallel group only the enclosing
    * phase's delta is attributable. */
  def timed[A](tag: String)(f: => A): A =
    if (sys.env.contains("GRAFT_CHAIN_DEBUG")) {
      debugMeter match {
        case null =>
          val t0 = System.nanoTime(); val r = f
          System.err.println(
            f"[chain] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
        case m =>
          val (j0, b0) = m.jobsAndRead
          val t0 = System.nanoTime(); val r = f
          val (j1, b1) = m.jobsAndRead
          System.err.println(
            f"[chain] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s" +
              s" jobs=${j1 - j0}" +
              f" read=${(b1 - b0) / 1048576.0}%.2f MB"); r
      }
    } else f

  // debug-only meter; registered once per JVM on first use (volatile
  // single-field publish — the Meter is fully constructed before the
  // reference is visible, so no half-initialized read is possible)
  @volatile private var debugMeterRef: Meter = null
  private def debugMeter: Meter = {
    if (debugMeterRef == null) synchronized {
      if (debugMeterRef == null)
        org.apache.spark.sql.SparkSession.getActiveSession.foreach(s =>
          debugMeterRef = new Meter(s.sparkContext, drainTimeoutMs = 2000))
    }
    debugMeterRef
  }
}
