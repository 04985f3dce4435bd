package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.DedupStream
import graft.operators.IncrementalDedup

/** Dev tool: time the phases of q54's chained-admission payload.
  * Usage: Q54Probe [sfDir] [mode: single|triple] */
object Q54Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val mode = if (args.length > 1) args(1) else "single"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.limit.initialNumPartitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q54probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (0 until 2).foreach { iter =>
      println(s"[q54probe] ---- iter $iter mode=$mode ----")
      val docs = graft.engine.Tables.documents(spark, sfDir)
        .filter(col("doc_id") < 500)
      val root = java.nio.file.Files.createTempDirectory("q54probe").toString
      if (mode == "single") {
        t("stage-days") {
          docs.withColumn("day", pmod(col("doc_id"), lit(3)))
            .repartition(3, col("day"))
            .write.partitionBy("day").parquet(s"$root/docs")
        }
        t("one-stream-3-batches") {
          DedupStream.admitNewDrops(spark, s"$root/docs/day=*", s"$root/state",
            s"$root/ckpt", maxLiveSegments = 1, maxFilesPerBatch = Some(1))
        }
      } else
        // the pre-round-12 q54 shape: each day staged and then streamed
        // by its own AvailableNow run — staging INSIDE the loop, or the
        // first run would drain every day in one batch and the A/B would
        // compare one 3x bootstrap against three chained admissions
        (0 until 3).foreach { k =>
          docs.filter(col("doc_id") % 3 === k).coalesce(1)
            .write.parquet(s"$root/docs/day$k")
          t(s"stream-$k") {
            DedupStream.admitNewDrops(spark, s"$root/docs/*", s"$root/state",
              s"$root/ckpt", maxLiveSegments = 1)
          }
        }
      t("read-result") {
        val n = IncrementalDedup.labelsWithSizes(
          DedupStream.loadState(spark, s"$root/state").get).count()
        println(s"[q54probe] rows=$n version=" + java.nio.file.Files
          .readString(java.nio.file.Paths.get(s"$root/state", "CURRENT")))
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
    spark.stop()
  }
}
