package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic versioned-commit protocol shared by the persisted ANN index
  * stores ([[Similarity.buildIvfIndex]]'s centroids + assignments and
  * the PQ codebook + codes store) — the same manifest-plus-pointer
  * shape as the dedup state store ([[graft.streaming.DedupStream]]),
  * specialized to an APPEND-ONLY data log:
  *
  * {{{
  * indexDir/
  *   CURRENT              # last committed version number (atomic move)
  *   v$N/MANIFEST         # {"trainedRows":…,"totalRows":…,"segs":[…]}
  *   v$N/<model dirs>     # K-row model relations (centroids/codebook)
  *   <log>/seg=$M/…       # one data segment per committing version
  * }}}
  *
  * The data log (`assignments` for IVF, `codes` for PQ) is a single
  * partitioned tree whose FIRST partition level is the writing version
  * (`seg=$N`) — every path segment below the log root is `key=value`,
  * so the committed segments read as ONE multi-path scan with uniform
  * partition columns (a flat `v$N/<log>` layout cannot: Spark's
  * partition discovery rejects non-partition directories between the
  * base path and the files). Readers list exactly the manifest's `segs`
  * — a crashed commit's half-written segment sits outside every
  * committed manifest and is invisible; the retried commit overwrites
  * it (same version number, `mode("overwrite")`). This closes the r12
  * advice finding: appends used to `mode("append")` into the LIVE
  * version's directory, publishing partial batches to every reader.
  *
  * `trainedRows` is the drift baseline (rows the model was last fit
  * on), `totalRows` the committed log size — carried in the manifest so
  * the append path never runs a corpus-sized (even footer-only) count
  * job. Retention after each promote keeps the current + previous
  * versions' dirs and segments (in-flight readers of the prior commit
  * stay valid) and deletes the rest. */
private[graft] object VersionedIndex {

  /** The committed state a reader resolves: version, drift baseline,
    * log size, the log segments this version references, and (when the
    * writer is a streaming admission) the micro-batch id that produced
    * it — the replay guard: a crash between this commit and the
    * streaming checkpoint's own commit redelivers the same batch, and
    * the recorded id lets the admission skip it instead of
    * double-admitting (manifests without the field read as None). */
  final case class Meta(version: Long, trainedRows: Long, totalRows: Long,
      segs: Vector[Long], streamBatchId: Option[Long] = None,
      streamCkptId: Option[String] = None,
      retainVersions: Option[Int] = None)

  def currentVersion(indexDir: String): Option[Long] = {
    val f = new java.io.File(indexDir, "CURRENT")
    if (f.isFile) Some(java.nio.file.Files.readString(f.toPath).trim.toLong)
    else None
  }

  def meta(indexDir: String): Option[Meta] =
    currentVersion(indexDir).map(v => metaAt(indexDir, v))

  /** Time-travel resolve: the committed state of a RETAINED version —
    * retention keeps the latest `retainVersions` commits (default 2:
    * current + previous), so an in-flight reader of a prior commit, or
    * an explicit read-at-version, stays valid across `retainVersions-1`
    * promotes. Throws, naming the version, once retention has reclaimed
    * it. */
  def metaAt(indexDir: String, v: Long): Meta = {
      val f = new java.io.File(indexDir, s"v$v/MANIFEST")
      if (!f.isFile) throw new IllegalStateException(
        s"$indexDir/v$v has no MANIFEST — lost or deleted committed state")
      val txt = java.nio.file.Files.readString(f.toPath)
      // a manifest with trainedRows but no segs/totalRows is the
      // pre-seg-log layout (data under v$N/<log>): a VALID old index,
      // not corruption — name it and prescribe the rebuild
      def legacy(): Nothing = throw new IllegalStateException(
        s"$indexDir/v$v uses the pre-seg-log index layout (manifest " +
          s"$txt) — this reader needs the seg-log protocol; rebuild " +
          "the index (buildIvfIndex/buildPqIndex) to migrate")
      def num(k: String): Long =
        s""""$k":(\\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toLong)
          .getOrElse(if (txt.contains("trainedRows")) legacy()
            else throw new IllegalStateException(
              s"unreadable index manifest v$v: $txt"))
      val segs = s""""segs":\\[([\\d,]*)\\]""".r.findFirstMatchIn(txt)
        .map(m => if (m.group(1).isEmpty) Vector.empty[Long]
                  else m.group(1).split(",").map(_.toLong).toVector)
        .getOrElse(if (txt.contains("trainedRows")) legacy()
          else throw new IllegalStateException(
            s"unreadable index manifest v$v: $txt"))
      val sb = """"streamBatchId":(\d+)""".r.findFirstMatchIn(txt)
        .map(_.group(1).toLong)
      val sc = """"streamCkptId":"((?:[^"\\]|\\.)*)"""".r
        .findFirstMatchIn(txt).map(m => graft.Par.jsonUnescape(m.group(1)))
        // legacy manifests recorded a 32-bit hash — surface it in the
        // tagged form Par.ckptIdentityCandidates also produces, so an
        // upgraded store keeps its replay guard
        .orElse(""""streamCkptHash":(-?\d+)""".r.findFirstMatchIn(txt)
          .map(m => "murmur:" + m.group(1)))
      val rv = """"retain":(\d+)""".r.findFirstMatchIn(txt)
        .map(_.group(1).toInt)
      Meta(v, num("trainedRows"), num("totalRows"), segs, sb, sc, rv)
  }

  def metaOrThrow(indexDir: String): Meta = meta(indexDir).getOrElse(
    throw new IllegalStateException(
      s"$indexDir holds no committed index (no CURRENT pointer) — " +
        "build one first"))

  /** Committed segment directories of the data log, for a multi-path
    * read rooted at `$indexDir/$log` (so `seg` and any lower partition
    * columns are discovered uniformly). */
  def segPaths(indexDir: String, log: String, segs: Seq[Long]): Seq[String] =
    segs.map { s =>
      val p = s"$indexDir/$log/seg=$s"
      if (!new java.io.File(p).isDirectory) throw new IllegalStateException(
        s"committed index references $log/seg=$s but $p does not exist — " +
          "lost or deleted committed state")
      p
    }

  /** One scan over the committed log segments: declared data schema,
    * partition columns (`seg`, …) discovered against the log root; the
    * bookkeeping `seg` column is dropped. Empty segment list → empty
    * relation of the declared schema PLUS `partitionDdl` — the
    * partition columns below `seg=` (e.g. `cid INT`) that the
    * non-empty branch discovers from paths; without them the two
    * branches would return different schemas and an empty log would
    * break downstream joins on the partition key. */
  def readLog(spark: SparkSession, indexDir: String, log: String,
      segs: Seq[Long], ddl: String, partitionDdl: String = ""): DataFrame =
    if (segs.isEmpty) {
      val full = if (partitionDdl.isEmpty) ddl else s"$ddl, $partitionDdl"
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(full))
    } else spark.read
      .schema(org.apache.spark.sql.types.StructType.fromDDL(ddl))
      .option("basePath", s"$indexDir/$log")
      .parquet(segPaths(indexDir, log, segs): _*)
      .drop("seg")

  /** Publish version `next` (everything under `v$next/` and
    * `<log>/seg=$next` is already written): manifest, atomic pointer
    * move, then retention. `logs` names the data-log roots to prune. */
  /** Versions every commit keeps readable (current inclusive). The
    * default preserves the original current+previous contract; a
    * deployment that needs deeper time travel ([[metaAt]] /
    * `loadStateAt` audit reads) raises it per commit, and each
    * manifest RECORDS the depth used (`"retain"`) so the reachability
    * boundary is auditable from the store itself. */
  val DefaultRetainVersions: Int = 2

  def commit(indexDir: String, next: Long, trainedRows: Long,
      totalRows: Long, segs: Vector[Long], logs: Seq[String],
      streamBatchId: Option[Long] = None,
      streamCkptId: Option[String] = None,
      retainVersions: Int = DefaultRetainVersions): Unit = {
    require(retainVersions >= 1,
      s"retainVersions must be >= 1, got $retainVersions")
    val dir = java.nio.file.Paths.get(indexDir, s"v$next")
    java.nio.file.Files.createDirectories(dir)
    // single-writer guard: the protocol assumes one writer per index
    // dir; a double-launched append would interleave seg overwrites and
    // silently lose a batch. Detect the realistic double-commit: if
    // v$next is ALREADY COMMITTED (CURRENT >= next) another writer won
    // the race — fail loudly instead of re-publishing over it. A
    // manifest left by a CRASHED attempt (CURRENT still < next) is the
    // documented retry case: remove it and re-commit; CREATE_NEW then
    // catches a live racer that recreates it inside this window. (The
    // earlier segment-write phase of two LIVE concurrent writers is
    // not detectable here — single-writer remains the contract.)
    val mf = dir.resolve("MANIFEST")
    val cur = currentVersion(indexDir)
    if (java.nio.file.Files.exists(mf)) {
      if (cur.exists(_ >= next)) throw new IllegalStateException(
        s"$indexDir/v$next is already committed (CURRENT=${cur.get}) — " +
          "concurrent writer detected; the index store is single-writer")
      java.nio.file.Files.delete(mf) // stale manifest from a crashed commit
    }
    // buildId: random identity for THIS commit of this version. The
    // model cache keys on it (not the manifest mtime): on filesystems
    // with 1s mtime granularity a delete+rebuild landing the same
    // version number within the same tick would alias an mtime key and
    // serve the old model — the silent-recall-collapse scenario the key
    // exists to prevent (r13 advice).
    java.nio.file.Files.writeString(mf,
      s"""{"trainedRows":$trainedRows,"totalRows":$totalRows,""" +
        s""""buildId":"${java.util.UUID.randomUUID()}",""" +
        streamBatchId.map(id => s""""streamBatchId":$id,""").getOrElse("") +
        streamCkptId.map(h =>
          s""""streamCkptId":"${graft.Par.jsonEscape(h)}",""").getOrElse("") +
        s""""retain":$retainVersions,""" +
        s""""segs":[${segs.mkString(",")}]}""",
      java.nio.file.StandardOpenOption.CREATE_NEW)
    // strict parse (metaAt): a CORRUPT retained manifest must abort the
    // commit, not silently read as segs=[] and let retention delete the
    // segments that version still references. Live segments = the union
    // over every RETAINED version's manifest (not just next-1): with
    // retention depth > 2, an old retained version's log segments must
    // survive until IT is reclaimed.
    val keepFrom = next - retainVersions + 1
    val prevSegs: Set[Long] = (math.max(0L, keepFrom) until next)
      .filter(v => new java.io.File(indexDir, s"v$v/MANIFEST").isFile)
      .flatMap(v => metaAt(indexDir, v).segs)
      .toSet
    val tmp = java.nio.file.Paths.get(indexDir, s".CURRENT.$next.tmp")
    java.nio.file.Files.writeString(tmp, next.toString)
    java.nio.file.Files.move(tmp,
      java.nio.file.Paths.get(indexDir, "CURRENT"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // retention: the latest `retainVersions` versions stay readable
    def rmQuiet(d: java.io.File): Unit =
      try org.apache.commons.io.FileUtils.deleteDirectory(d)
      catch { case _: Exception => } // stale history is harmless
    val vDirs = Option(new java.io.File(indexDir).listFiles()).toSeq.flatten
      .filter(d => d.isDirectory && d.getName.matches("v\\d+")
        && d.getName.drop(1).toLong < keepFrom)
    vDirs.foreach(rmQuiet)
    val live = segs.toSet ++ prevSegs
    logs.foreach { log =>
      val root = new java.io.File(indexDir, log)
      if (root.isDirectory) root.listFiles.foreach { d =>
        if (d.isDirectory && d.getName.startsWith("seg=")
            && !live.contains(d.getName.drop(4).toLong)) rmQuiet(d)
      }
    }
  }

  /** Copy a K-row model directory (centroids/codebook) into the next
    * version by plain file copy — zero Spark jobs for data that is a
    * handful of KB. */
  def copyModelDir(indexDir: String, from: Long, next: Long,
      name: String): Unit = {
    val src = new java.io.File(indexDir, s"v$from/$name")
    val dst = new java.io.File(indexDir, s"v$next/$name")
    org.apache.commons.io.FileUtils.deleteDirectory(dst) // crashed try
    org.apache.commons.io.FileUtils.copyDirectory(src, dst)
  }

  /** Driver-side per-(dir, version) model cache — the append/query
    * paths re-use collected K-row models instead of re-reading them
    * per call. Bounded LRU (access-ordered LinkedHashMap, capacity
    * [[ModelCacheCapacity]]): a long-lived session juggling more than
    * the capacity in index versions evicts only the least-recently-used
    * entry instead of thrashing the whole cache wholesale (entries are
    * a few KB each; temp-dir churn in tests would otherwise grow it
    * unboundedly). */
  private[graft] val ModelCacheCapacity = 64
  private val modelCache =
    new java.util.LinkedHashMap[(String, Long, String), AnyRef](
        ModelCacheCapacity * 2, 0.75f, /*accessOrder=*/ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long, String), AnyRef]): Boolean =
        size() > ModelCacheCapacity
    }

  /** Test hook: current LRU key set (insertion/access order, eldest
    * first). */
  private[graft] def modelCacheKeys: Seq[(String, Long, String)] =
    modelCache.synchronized {
      import scala.jdk.CollectionConverters._
      modelCache.keySet.asScala.toSeq
    }

  /** Cache key carries the manifest's `buildId` as build identity: a
    * dir deleted and rebuilt from a different corpus restarts at the
    * same version number, and a pure (dir, version) key would serve the
    * old centroids against the new assignments — silent recall
    * collapse, no error. The buildId is a fresh UUID per commit (mtime,
    * the previous identity, aliases under 1s-granularity filesystems);
    * manifests from older builds without the field fall back to mtime.
    *
    * The manifest is a <200-byte file re-read on every call —
    * deliberate: identity must be re-validated per call or the
    * same-tick rebuild aliasing returns through a cached id, and a
    * small-file read is the same one-round-trip cost class as the
    * lastModified stat it replaced (this cache's job is eliminating
    * the K-row Spark read, not the manifest peek). */
  private def modelKey(indexDir: String, version: Long,
      name: String): (String, Long, String) = {
    val mf = new java.io.File(indexDir, s"v$version/MANIFEST")
    val id = (try {
      val txt = java.nio.file.Files.readString(mf.toPath)
      """"buildId":"([^"]+)"""".r.findFirstMatchIn(txt).map(_.group(1))
    } catch { case _: Exception => None })
      .getOrElse(mf.lastModified.toString)
    (new java.io.File(indexDir).getCanonicalPath, version, s"$name@$id")
  }

  def cachedModel[A <: AnyRef](indexDir: String, version: Long, name: String)(
      load: => A): A = {
    val key = modelKey(indexDir, version, name)
    modelCache.synchronized {
      val hit = modelCache.get(key)
      if (hit != null) return hit.asInstanceOf[A]
    }
    // load OUTSIDE the lock (it runs Spark jobs); worst case two racing
    // loads of the same key compute the same model and one wins
    val loaded = load
    modelCache.synchronized { modelCache.put(key, loaded) }
    loaded
  }

  /** Warm the model cache at commit time — the builder already holds
    * the model rows driver-side, so later appends/queries in this
    * process skip even the K-row read. */
  def putModel(indexDir: String, version: Long, name: String,
      model: AnyRef): Unit = {
    val key = modelKey(indexDir, version, name)
    modelCache.synchronized { modelCache.put(key, model) }
    ()
  }
}
