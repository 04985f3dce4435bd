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
  *
  * Usage: ChainProbe [sfDir] [variants e.g. ABC]
  */
object ChainProbe {
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
            DedupStream.commitDelta(spark, s"$root/state", prev, delta,
              maxLiveSegments = maxSegs)
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
      case _ => ()
    }
    spark.stop()
  }
}
