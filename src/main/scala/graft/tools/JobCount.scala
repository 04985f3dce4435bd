package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-phase Spark JOB counts of one steady-state admission on
  * each chain (text q54 / embedding q63 shape) — the fixed-overhead floor
  * is sequential small jobs, so the cut list starts from exact counts.
  *
  * Usage: JobCount [sfDir] [days]
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val days = if (args.length > 1) args(1).toInt else 4
    // batch = 1/divisor of the corpus per day (the 100-day probe admits 1%)
    val divisor = if (args.length > 2) args(2).toInt else days
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.limit.initialNumPartitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var jobs = 0L
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs += 1
      })
    def phase[A](tag: String)(f: => A): A = {
      val j0 = jobs
      val t0 = System.nanoTime()
      val r = f
      org.apache.spark.sql.graftbridge.Bridge
        .drainListenerBus(spark.sparkContext, 10000)
      println(f"[jobs] $tag%-28s jobs=${jobs - j0}%3d wall=${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    println("== text chain (q54 shape) ==")
    val docs = graft.engine.Tables.documents(spark, sfDir)
    val troot = java.nio.file.Files.createTempDirectory("jobcount_t").toString
    (0 until days).foreach { d =>
      val batch = docs.filter(col("doc_id") % divisor === d).localCheckpoint()
      phase(s"text day $d") {
        graft.streaming.DedupStream.loadState(spark, s"$troot/state") match {
          case Some(prev) =>
            val delta = phase(s"  t$d admitBatchDelta")(
              graft.operators.IncrementalDedup.admitBatchDelta(prev, batch))
            phase(s"  t$d commitDelta")(
              graft.streaming.DedupStream.commitDelta(
                spark, s"$troot/state", prev, delta))
            delta.release()
          case None =>
            phase(s"  t$d bootstrap")(
              graft.streaming.DedupStream.commitState(
                graft.operators.IncrementalDedup.initialState(batch),
                s"$troot/state"))
        }
      }
      graft.operators.Dedup.clearShingleCaches()
    }

    println("== embed chain (q63 shape, direct admissions) ==")
    val emb = graft.engine.Tables.embeddings(spark, sfDir)
    val eroot = java.nio.file.Files.createTempDirectory("jobcount_e").toString
    (0 until days).foreach { d =>
      val batch = emb.filter(col("vec_id") % divisor === d).localCheckpoint()
      phase(s"embed day $d") {
        if (graft.operators.VersionedIndex.currentVersion(s"$eroot/state").isEmpty)
          phase(s"  e$d bootstrap")(graft.operators.EmbeddingIncremental.saveState(
            graft.operators.EmbeddingIncremental.initialState(batch),
            s"$eroot/state"))
        else
          phase(s"  e$d admitDrop")(graft.operators.EmbeddingIncremental.admitDrop(
            spark, s"$eroot/state", batch, maxLiveSegments = 1))
      }
    }

    println("== embed chain via streaming (full q63) ==")
    phase("q63 full")(graft.streaming.EmbedStream.qEmbedChain(spark, sfDir)
      .write.format("noop").mode("overwrite").save())

    Seq(troot, eroot).foreach(r =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(r)))
    spark.stop()
  }
}
