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

  /** Minimal JSON string escaping for manifest fields ([[ckptIdentity]]
    * values are UUIDs or filesystem paths — backslash and quote are the
    * only characters that can break the manifest's hand-rolled JSON). */
  def jsonEscape(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  def jsonUnescape(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")

  /** Env-gated (GRAFT_CHAIN_DEBUG) phase timer for the admission
    * paths; `tag` carries the side-specific prefix. */
  def timed[A](tag: String)(f: => A): A =
    if (sys.env.contains("GRAFT_CHAIN_DEBUG")) {
      val t0 = System.nanoTime(); val r = f
      System.err.println(
        f"[chain] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    } else f
}
