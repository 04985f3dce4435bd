package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, IncrementalDedup}
import graft.streaming.DedupStream

/** Dev tool: isolate the per-day cost drivers of the chained
  * persisted-state dedup path. Runs the 10-day chain three ways WITHOUT
  * the streaming machinery (direct loadState → admitBatch → commitState),
  * timing process-cpu per day:
  *
  *   A  default layout (fold every MaxLiveSegments commits)
  *   B  no folds (segments only — the pre-compaction layout)
  *   C  no folds AND buckets stripped before admission (no touched-bucket
  *      collect, no bucket columns — the round-9 code path shape)
  *   D  labels-lookup A/B: would bucketing the labels tier BY DOC_ID
  *      (a second, doc-keyed index copy) beat the current full
  *      broadcast-stream read ([[IncrementalDedup.repLookup]])? Chains
  *      10 days, then times the frontier rep lookup both ways at
  *      frontier sizes 64 and 2048 (the KeyPushMax cap), plus a
  *      small-batch admission wall for the %-of-admit context.
  *   L  LONG-HORIZON chain: 100 daily admissions (1% of the corpus per
  *      day) per fold cadence K ∈ {4, 8, 16} (maxLiveSegments), with
  *      per-day wall/cpu/jobs/state-bytes-written — the flatness claim
  *      a production deployment actually depends on: the 10-day chains
  *      above only ever exercise ~2 fold generations; this runs ~25.
  *      Prints per-day series plus first-vs-last-decile summaries.
  *
  * Usage: ChainProbe [sfDir] [variants e.g. ABC, D or L]
  */
object ChainProbe {
  /** One day of the long-horizon chain (variant L). */
  private final case class LDay(wall: Double, cpu: Double, jobs: Long,
      writtenMb: Double, stateMb: Double,
      readAdmitMb: Double, readCommitMb: Double)

  /** The shared (job-count, task-input-bytes) meter — one definition in
    * [[graft.Par.Meter]], so these columns and the GRAFT_CHAIN_DEBUG
    * phase columns can never drift apart. */
  private def newMeter(spark: SparkSession): graft.Par.Meter =
    new graft.Par.Meter(spark.sparkContext)

  private def cpuSec: Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean =>
        os.getProcessCpuTime / 1e9
      case _ => -1.0
    }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val variants = if (args.length > 1) args(1) else "ABC"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.limit.initialNumPartitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.engine.Tables.documents(spark, sfDir)

    def chain(tag: String, maxSegs: Int, strip: Boolean): Unit = {
      val root = java.nio.file.Files.createTempDirectory(s"chainprobe$tag").toString
      val days = (0 until 10).map { d =>
        val batch = docs.filter(col("doc_id") % 10 === d).localCheckpoint()
        val w0 = System.nanoTime(); val c0 = cpuSec
        DedupStream.loadState(spark, s"$root/state") match {
          case Some(prev) if !strip =>
            val delta = IncrementalDedup.admitBatchDelta(prev, batch)
            // fixed layout: these variants A/B the FOLD CADENCE, so the
            // bucket count must stay a controlled constant (L carries
            // the auto-migration knobs)
            DedupStream.commitDelta(spark, s"$root/state", prev, delta,
              maxLiveSegments = maxSegs, autoMigrate = false)
            delta.release()
          case Some(prev) => // stripped variant: full-state write path
            DedupStream.commitState(
              IncrementalDedup.admitBatch(prev.copy(buckets = None), batch),
              s"$root/state",
              newBands = Some(Dedup.lshBands(batch)),
              newShingles = Some(Dedup.shingleSets(batch)),
              maxLiveSegments = maxSegs)
          case None =>
            DedupStream.commitState(IncrementalDedup.initialState(batch),
              s"$root/state", maxLiveSegments = maxSegs)
        }
        Dedup.clearShingleCaches()
        (cpuSec - c0, (System.nanoTime() - w0) / 1e9)
      }
      println(s"[$tag] cpu  " + days.map(d => f"${d._1}%.1f").mkString(" "))
      println(s"[$tag] wall " + days.map(d => f"${d._2}%.1f").mkString(" "))
      try org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(root))
      catch { case _: Exception => }
    }

    // one untimed warmup admit so JIT doesn't bias variant A
    chain("warm", 4, strip = false)
    variants.foreach {
      case 'A' => chain("A", DedupStream.MaxLiveSegments, strip = false)
      case 'B' => chain("B", 100000, strip = false)
      case 'C' => chain("C", 100000, strip = true)
      case 'D' => labelsLookupAb(spark, docs)
      case 'L' => longChain(spark, docs)
      case 'E' => embeddingChain(spark, sfDir)
      case 'P' => probeScaling(spark, docs)
      case 'M' => migrationTrickle(spark, docs)
      case _ => ()
    }
    spark.stop()
  }

  /** Variant M: the auto-migration policy's DEPLOYMENT story, at toy
    * scale via scaled-down knobs — bootstrap most of the corpus at 32
    * buckets (deliberately undersized: per-bucket mass starts above the
    * toy mass target), then trickle small daily batches with
    * auto-migration ON, mass target/floor scaled to the corpus
    * (GRAFT_CHAIN_MASS_TARGET / GRAFT_CHAIN_BUCKET_FLOOR, defaults
    * 32 KiB / 4 KiB here). Claim: the MASS trigger fires without any
    * manual call, the layout self-migrates to the tier where per-bucket
    * mass is back under target, and per-day read_admit DROPS at the
    * migration and stays flat after — bounded by
    * touched-buckets × per-bucket target, the invariant a real
    * deployment holds by raising the same two knobs to block-size
    * numbers. (The companion L A/B measured the OTHER regime: a bulk
    * chain below the footer-floor crossover, where the floor must
    * BLOCK migration — see AutoMigrateMinBucketBytes.) */
  private def migrationTrickle(spark: SparkSession,
      docs: org.apache.spark.sql.DataFrame): Unit = {
    val meter = newMeter(spark)
    val days = sys.env.get("GRAFT_CHAIN_DAYS").map(_.toInt).getOrElse(100)
    val target = sys.env.get("GRAFT_CHAIN_MASS_TARGET").map(_.toLong)
      .getOrElse(32L * 1024)
    val floor = sys.env.get("GRAFT_CHAIN_BUCKET_FLOOR").map(_.toLong)
      .getOrElse(4096L)
    println(s"[M] days=$days massTarget=$target floor=$floor start=32 buckets")
    val root = java.nio.file.Files.createTempDirectory("chainM").toString
    val boot = docs.filter(col("doc_id") % 10 =!= 0)
    DedupStream.commitState(IncrementalDedup.initialState(boot),
      s"$root/state", buckets = 32)
    Dedup.clearShingleCaches()
    val series = (0 until days).map { d =>
      val batch = graft.Checkpoints.pin(docs.filter(
        col("doc_id") % 10 === 0 && (col("doc_id") / 10) % 100 === d))
      val r0 = meter.read
      val w0 = System.nanoTime()
      val prev = DedupStream.loadState(spark, s"$root/state").get
      val delta = IncrementalDedup.admitBatchDelta(prev, batch,
        probeMode = IncrementalDedup.ProbePruned)
      val rAdmit = meter.read - r0
      DedupStream.commitDelta(spark, s"$root/state", prev, delta,
        bucketBytesTarget = target, bucketBytesFloor = floor)
      delta.release()
      Dedup.clearShingleCaches()
      graft.Checkpoints.free(batch)
      val b = DedupStream.loadState(spark, s"$root/state").get
        .buckets.getOrElse(-1)
      (rAdmit / 1048576.0, b, (System.nanoTime() - w0) / 1e9)
    }
    println("[M] read_admit " + series.map(s => f"${s._1}%.3f").mkString(" "))
    println("[M] buckets    " + series.map(_._2).mkString(" "))
    println("[M] wall       " + series.map(s => f"${s._3}%.2f").mkString(" "))
    val migDays = series.zipWithIndex.collect {
      case ((_, b, _), i) if i == 0 || b != series(i - 1)._2 => i -> b }
    println(s"[M] layout trajectory: ${migDays.mkString(" ")}")
    meter.close()
    try org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
    catch { case _: Exception => }
  }

  /** Variant P: is the admission's probe READ bounded by the layout's
    * bucket-count knob? Variant L's read_admit column grows with state
    * at the default 32-bucket layout because a 50-doc batch carries
    * ~200 band keys — it SATURATES the grid, so bucket pruning cannot
    * reduce the read (the fixed-grid saturation story; the fold cadence
    * is irrelevant — live segments are k·batch by construction and
    * read_commit measures flat). The deployment answer is the bucket
    * count, which [[DedupStream.migrateBuckets]] re-sizes as the corpus
    * grows (its doc: one bucket ≈ a few block-sized files). This
    * variant measures exactly that: bootstrap 90% of the corpus ONCE,
    * then trickle `TrickleDays` small daily batches (~5 docs ≈ 20 band
    * keys) against layouts of 32 / 128 / 512 buckets, forcing
    * ProbePruned (auto would full-scan at toy state sizes — its
    * measured-cheaper choice below [[IncrementalDedup.FullScanBytesMax]]).
    * Claim: per-day read_admit falls roughly with touched/total buckets
    * and is FLAT in the day index, i.e. the probe reads O(touched
    * bucket mass + batch), not O(corpus). */
  private def probeScaling(spark: SparkSession,
      docs: org.apache.spark.sql.DataFrame): Unit = {
    val meter = newMeter(spark)
    val trickleDays = sys.env.get("GRAFT_CHAIN_DAYS").map(_.toInt).getOrElse(12)
    val bucketCounts = sys.env.get("GRAFT_CHAIN_BUCKETS")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(32, 128, 512))
    println(s"[P] trickleDays=$trickleDays buckets=${bucketCounts.mkString(",")}")
    for (b <- bucketCounts) {
      val root = java.nio.file.Files.createTempDirectory(s"chainP$b").toString
      val boot = docs.filter(col("doc_id") % 10 =!= 0)
      DedupStream.commitState(IncrementalDedup.initialState(boot),
        s"$root/state", buckets = b)
      Dedup.clearShingleCaches()
      val days = (0 until trickleDays).map { d =>
        val batch = graft.Checkpoints.pin(docs.filter(
          col("doc_id") % 10 === 0 && (col("doc_id") / 10) % 100 === d))
        val r0 = meter.read; val j0 = meter.jobs
        val w0 = System.nanoTime()
        val prev = DedupStream.loadState(spark, s"$root/state").get
        val delta = IncrementalDedup.admitBatchDelta(prev, batch,
          probeMode = IncrementalDedup.ProbePruned)
        val rAdmit = meter.read - r0
        // fixed layout: this variant MEASURES specific bucket counts
        DedupStream.commitDelta(spark, s"$root/state", prev, delta,
          autoMigrate = false)
        delta.release()
        Dedup.clearShingleCaches()
        graft.Checkpoints.free(batch)
        (rAdmit / 1048576.0, (meter.read - r0 - rAdmit) / 1048576.0,
          meter.jobs - j0, (System.nanoTime() - w0) / 1e9)
      }
      val stateMb = org.apache.commons.io.FileUtils
        .sizeOfDirectory(new java.io.File(s"$root/state")) / 1048576.0
      println(s"[P b=$b] read_admit  " + days.map(d => f"${d._1}%.3f").mkString(" "))
      println(s"[P b=$b] read_commit " + days.map(d => f"${d._2}%.3f").mkString(" "))
      println(s"[P b=$b] jobs        " + days.map(d => s"${d._3}").mkString(" "))
      println(s"[P b=$b] wall        " + days.map(d => f"${d._4}%.2f").mkString(" "))
      println(f"[P b=$b] state=$stateMb%.1f MB mean read_admit=" +
        f"${days.map(_._1).sum / days.size}%.3f MB")
      try org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(root))
      catch { case _: Exception => }
    }
    meter.close() // one meter per variant; unregister when its columns are done
  }

  /** Variant E: 20 daily EMBEDDING admissions against the persisted
    * store ([[graft.operators.EmbeddingIncremental.admitDrop]]) — the
    * per-day cost evidence for the vector-side chain: wall/cpu per day
    * plus per-log bytes written that day (bucket log AND label log must
    * stay O(batch) outside fold days) and the composed-remap size (the
    * O(cumulative merges) read-repair relation). */
  private def embeddingChain(spark: SparkSession, sfDir: String): Unit = {
    import graft.operators.EmbeddingIncremental
    val meter = newMeter(spark)
    val emb = graft.engine.Tables.embeddings(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("embchain").toString
    def dirMb(sub: String): Double = {
      val f = new java.io.File(dir, sub)
      if (f.isDirectory)
        org.apache.commons.io.FileUtils.sizeOfDirectory(f) / 1048576.0
      else 0.0
    }
    // GRAFT_EMBCHAIN_DAYS=60 runs ~4 fold generations at the default
    // K=16 — the cross-generation flatness evidence (the 20-day run
    // sees exactly one fold)
    val nDays = sys.env.get("GRAFT_EMBCHAIN_DAYS").map(_.toInt).getOrElse(20)
    EmbeddingIncremental.saveState(
      EmbeddingIncremental.initialState(emb.filter(col("vec_id") % nDays === 0)),
      dir)
    val days = (1 until nDays).map { d =>
      val batch = graft.Checkpoints.pin(emb.filter(col("vec_id") % nDays === d))
      val beforeB = dirMb("buckets"); val beforeL = dirMb("labels")
      val w0 = System.nanoTime(); val c0 = cpuSec; val r0 = meter.read
      EmbeddingIncremental.admitDrop(spark, dir, batch)
      val m = graft.operators.VersionedIndex.metaOrThrow(dir)
      val res = ((System.nanoTime() - w0) / 1e9, cpuSec - c0,
        dirMb("buckets") - beforeB, dirMb("labels") - beforeL,
        dirMb(s"v${m.version}/remap") * 1024,
        (meter.read - r0) / 1048576.0)
      // the commit is durable — release the day's pinned batch so the
      // series measures steady-state cost, not accumulating blocks
      graft.Checkpoints.free(batch)
      res
    }
    println("[E] wall        " + days.map(d => f"${d._1}%.2f").mkString(" "))
    println("[E] cpu         " + days.map(d => f"${d._2}%.2f").mkString(" "))
    println("[E] bucketlog+mb " + days.map(d => f"${d._3}%.3f").mkString(" "))
    println("[E] labellog+mb " + days.map(d => f"${d._4}%.3f").mkString(" "))
    println("[E] remap_kb    " + days.map(d => f"${d._5}%.1f").mkString(" "))
    println("[E] read_mb     " + days.map(d => f"${d._6}%.2f").mkString(" "))
    meter.close()
    try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    catch { case _: Exception => }
  }

  /** Variant L — see the header. Per (K, day): wall, cpu, Spark jobs,
    * MB newly written into the state dir, total state-dir MB after the
    * commit, and MB READ by tasks (task input metrics), split into the
    * admit phase (probe + verify + fixpoint) and the commit phase
    * (touched-bucket rewrite + segment append + fold). Flat
    * jobs/written-MB across fold GENERATIONS (not just days) is the
    * claim; the read columns attribute any cpu trend at fixed job
    * counts — a probe whose read mass tracks STATE size rather than
    * batch size shows up as a slope in read_admit against state_mb.
    *
    * GRAFT_CHAIN_PROBEMODE=pruned|full forces the admission's probe
    * route (default auto) — the A/B behind the routing claim: auto
    * full-scans below [[IncrementalDedup.FullScanBytesMax]] (read mass
    * = state mass, the measured-cheaper choice at toy state sizes),
    * pruned bounds the read at O(batch + touched buckets).
    * GRAFT_CHAIN_DAYS / GRAFT_CHAIN_KS override the horizon/cadences. */
  private def longChain(spark: SparkSession,
      docs: org.apache.spark.sql.DataFrame): Unit = {
    val nDays = sys.env.get("GRAFT_CHAIN_DAYS").map(_.toInt).getOrElse(100)
    val ks = sys.env.get("GRAFT_CHAIN_KS")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(4, 8, 16))
    val probeMode = sys.env.get("GRAFT_CHAIN_PROBEMODE") match {
      case Some("pruned") => IncrementalDedup.ProbePruned
      case Some("full") => IncrementalDedup.ProbeFull
      case _ => IncrementalDedup.ProbeAuto
    }
    // the r17 policy A/B: GRAFT_CHAIN_AUTOMIGRATE=off pins the layout at
    // its bootstrap bucket count; GRAFT_CHAIN_BUCKET_BYTES scales the
    // mass trigger down to toy state sizes
    val autoMigrate = !sys.env.get("GRAFT_CHAIN_AUTOMIGRATE").contains("off")
    val bucketBytes = sys.env.get("GRAFT_CHAIN_BUCKET_BYTES").map(_.toLong)
      .getOrElse(DedupStream.AutoMigrateBucketBytes)
    println(s"[L] days=$nDays ks=${ks.mkString(",")} probeMode=$probeMode " +
      s"autoMigrate=$autoMigrate bucketBytes=$bucketBytes")
    val meter = newMeter(spark)
    def jobsNow: Long = meter.jobs
    def readNow: Long = meter.read
    def fileSizes(dir: java.io.File): Map[String, Long] =
      if (!dir.isDirectory) Map.empty
      else {
        import scala.jdk.CollectionConverters._
        org.apache.commons.io.FileUtils.listFiles(dir, null, true)
          .asScala.map(f => f.getPath -> f.length).toMap
      }
    for (k <- ks) {
      val root = java.nio.file.Files.createTempDirectory(s"chainL$k").toString
      val stateDir = new java.io.File(s"$root/state")
      val days = (0 until nDays).map { d =>
        val batch = graft.Checkpoints.pin(
          docs.filter(col("doc_id") % nDays === d))
        val before = fileSizes(stateDir)
        val w0 = System.nanoTime(); val c0 = cpuSec; val j0 = jobsNow
        val r0 = readNow
        val rAdmit = DedupStream.loadState(spark, s"$root/state") match {
          case Some(prev) =>
            val delta = IncrementalDedup.admitBatchDelta(prev, batch,
              probeMode = probeMode)
            val mid = readNow
            DedupStream.commitDelta(spark, s"$root/state", prev, delta,
              maxLiveSegments = k, autoMigrate = autoMigrate,
              bucketBytesTarget = bucketBytes,
              bucketBytesFloor = sys.env.get("GRAFT_CHAIN_BUCKET_FLOOR")
                .map(_.toLong)
                .getOrElse(DedupStream.AutoMigrateMinBucketBytes))
            delta.release()
            mid - r0
          case None =>
            DedupStream.commitState(IncrementalDedup.initialState(batch),
              s"$root/state", maxLiveSegments = k)
            0L
        }
        Dedup.clearShingleCaches()
        val wall = (System.nanoTime() - w0) / 1e9
        val after = fileSizes(stateDir)
        val writtenMb = after
          .collect { case (p, n) if !before.contains(p) => n }.sum / 1048576.0
        LDay(wall, cpuSec - c0, jobsNow - j0, writtenMb,
          after.values.sum / 1048576.0,
          rAdmit / 1048576.0, (readNow - r0 - rAdmit) / 1048576.0)
      }
      def col1(f: LDay => String) = days.map(f).mkString(" ")
      println(s"[L k=$k] wall        " + col1(d => f"${d.wall}%.2f"))
      println(s"[L k=$k] cpu         " + col1(d => f"${d.cpu}%.2f"))
      println(s"[L k=$k] jobs        " + col1(d => s"${d.jobs}"))
      println(s"[L k=$k] written_mb  " + col1(d => f"${d.writtenMb}%.2f"))
      println(s"[L k=$k] state_mb    " + col1(d => f"${d.stateMb}%.2f"))
      println(s"[L k=$k] read_admit  " + col1(d => f"${d.readAdmitMb}%.2f"))
      println(s"[L k=$k] read_commit " + col1(d => f"${d.readCommitMb}%.2f"))
      // flatness summary: decile means, skipping day 0 (bootstrap)
      def decile(from: Int, until: Int) = {
        val s = days.slice(from, until)
        (s.map(_.wall).sum / s.size, s.map(_.jobs).sum.toDouble / s.size,
          s.map(_.writtenMb).sum / s.size,
          s.map(_.readAdmitMb).sum / s.size,
          s.map(_.readCommitMb).sum / s.size)
      }
      val (w1, j1, m1, ra1, rc1) = decile(1, 11)
      val (w10, j10, m10, ra10, rc10) = decile(nDays - 10, nDays)
      println(f"[L k=$k] days 1-10 mean: wall=$w1%.2f s jobs=$j1%.1f " +
        f"written=$m1%.2f MB read_admit=$ra1%.2f read_commit=$rc1%.2f | " +
        f"days ${nDays - 10}-${nDays - 1}: " +
        f"wall=$w10%.2f s jobs=$j10%.1f written=$m10%.2f MB " +
        f"read_admit=$ra10%.2f read_commit=$rc10%.2f | " +
        f"final state=${days.last.stateMb}%.1f MB")
      // final layout (the policy's landing point when auto-migration ran)
      DedupStream.loadState(spark, s"$root/state").foreach(st =>
        println(s"[L k=$k] final buckets=${st.buckets.getOrElse(-1)}"))
      // final tier composition, for attributing the read columns
      val fin = fileSizes(stateDir)
      def tier(t: String) = fin.collect {
        case (p, n) if p.contains(s"/$t/") => n }.sum / 1048576.0
      println(f"[L k=$k] final tiers: bands=${tier("bands")}%.2f " +
        f"shingles=${tier("shingles")}%.2f labels=${tier("labels")}%.2f " +
        f"sizes=${tier("sizes")}%.2f MB")
      try org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(root))
      catch { case _: Exception => }
    }
    meter.close()
  }

  /** Variant D: A/B the admission's labels READ. Side A is the shipped
    * path — stream the whole committed labels relation through the
    * broadcast rep lookup. Side B is the hypothetical doc_id-bucketed
    * second copy (256 buckets, the deployment shape): read ONLY the
    * endpoint ids' bucket directories, then the same IN filter. Both
    * sides return identical rows (asserted). The copy's build cost is
    * untimed — it is the ongoing maintenance cost the A/B's winner
    * would have to justify. */
  private def labelsLookupAb(spark: SparkSession,
      docs: org.apache.spark.sql.DataFrame): Unit = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("chainprobeD").toString
    (0 until 10).foreach { d =>
      val batch = docs.filter(col("doc_id") % 10 === d).localCheckpoint()
      DedupStream.loadState(spark, s"$root/state") match {
        case Some(prev) =>
          val delta = IncrementalDedup.admitBatchDelta(prev, batch)
          // fixed layout: the A/B below measures the 32-bucket labels
          // read; a mid-run migration would change the measured layout
          DedupStream.commitDelta(spark, s"$root/state", prev, delta,
            autoMigrate = false)
          delta.release()
        case None =>
          DedupStream.commitState(IncrementalDedup.initialState(batch),
            s"$root/state")
      }
      Dedup.clearShingleCaches()
    }
    val st = DedupStream.loadState(spark, s"$root/state").get
    val nDocs = st.labels.count()
    val labelBytes = org.apache.commons.io.FileUtils.sizeOfDirectory(
      new java.io.File(s"$root/state/labels"))
    println(f"[D] corpus docs=$nDocs labels_bytes=$labelBytes")
    // the hypothetical doc-keyed copy: 256 buckets, one file each
    val dBuckets = 256
    st.labels
      .withColumn("dbucket", IncrementalDedup.docBucket(col("doc_id"), dBuckets))
      .repartition(dBuckets, col("dbucket"))
      .sortWithinPartitions(col("dbucket"), col("doc_id"))
      .write.partitionBy("dbucket").mode("overwrite")
      .parquet(s"$root/labels_by_doc")
    Seq(64, 2048).foreach { n =>
      val stride = math.max(1L, nDocs / n)
      val ids = (0 until n).map(_ * stride)
      val idsDf = ids.toDF("doc_id")
      def median(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      val fullTimes = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        val rows = IncrementalDedup.repLookup(st.labels, idsDf).collect()
        require(rows.nonEmpty)
        (System.nanoTime() - t0) / 1e9
      }
      val touched = ids.map(IncrementalDedup.docBucketLocal(_, dBuckets))
        .distinct.sorted
      val bucketTimes = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        val pruned = spark.read
          .schema("doc_id BIGINT, cluster_id BIGINT")
          .option("basePath", s"$root/labels_by_doc")
          .parquet(touched.map(k => s"$root/labels_by_doc/dbucket=$k"): _*)
          .filter(col("doc_id").isin(ids: _*))
          .select(col("doc_id"), col("cluster_id")).collect()
        require(pruned.nonEmpty)
        (System.nanoTime() - t0) / 1e9
      }
      // identity: both sides resolve the same reps
      val a = IncrementalDedup.repLookup(st.labels, idsDf).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val b = spark.read.schema("doc_id BIGINT, cluster_id BIGINT")
        .option("basePath", s"$root/labels_by_doc")
        .parquet(touched.map(k => s"$root/labels_by_doc/dbucket=$k"): _*)
        .filter(col("doc_id").isin(ids: _*))
        .select(col("doc_id"), col("cluster_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      require(a == b, s"lookup A/B rows diverge: ${a.size} vs ${b.size}")
      println(f"[D] frontier=$n buckets_touched=${touched.size} " +
        f"full_med=${median(fullTimes)}%.3f s bucketed_med=${median(bucketTimes)}%.3f s " +
        f"(full ${fullTimes.map(t => f"$t%.3f").mkString(",")} | " +
        f"bucketed ${bucketTimes.map(t => f"$t%.3f").mkString(",")})")
    }
    // context: a small-batch admission's total wall on this state
    val tiny = docs.orderBy("doc_id").limit(50)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
      .localCheckpoint()
    val admitTimes = (0 until 3).map { _ =>
      Dedup.clearShingleCaches()
      val t0 = System.nanoTime()
      val delta = IncrementalDedup.admitBatchDelta(st, tiny)
      Seq(delta.newAssign, delta.remap)
        .foreach(_.write.format("noop").mode("overwrite").save())
      delta.release()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[D] admit_wall_50doc " +
      admitTimes.map(t => f"$t%.3f").mkString(" "))
    try org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
    catch { case _: Exception => }
  }
}
