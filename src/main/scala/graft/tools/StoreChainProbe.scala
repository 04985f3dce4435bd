package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r20 multi-day chain evidence for the round-19 stores (the q51/q62
  * long-horizon treatment applied to the two new incrementals):
  *
  *   substring — [[graft.operators.SubstringDedup]] window/span store:
  *     bootstrap on the pmod-11 day-0 slice of sf0.1 documents, then
  *     10 daily admissions; per day: wall, process-cpu, this version's
  *     segment bytes (the O(batch) claim) and window-log rows.
  *   cms — [[graft.operators.HeavyHitters]] persisted sketch:
  *     bootstrap + 30 daily admissions (pmod 31); per day the same,
  *     expecting O(grid) ≈ flat few-hundred-KB segments.
  *
  * Usage: StoreChainProbe [sfDir] [substring|cms|both] [maxLiveSegments]
  */
object StoreChainProbe {
  private def cpuSec: Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean =>
        os.getProcessCpuTime / 1e9
      case _ => -1.0
    }

  private def dirMb(path: String): Double = {
    def walk(f: java.io.File): Long =
      if (!f.exists()) 0L
      else if (f.isFile) f.length()
      else f.listFiles().map(walk).sum
    walk(new java.io.File(path)) / 1e6
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val which = if (args.length > 1) args(1) else "both"
    val maxLive = if (args.length > 2) args(2).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.limit.initialNumPartitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.engine.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"corpus: ${docs.count()} docs at $sfDir; maxLiveSegments=$maxLive")

    def day(mod: Int, i: Int) = docs.filter(pmod(col("doc_id"), lit(mod)) === i)

    if (which == "substring" || which == "both") {
      import graft.operators.SubstringDedup
      val root = java.nio.file.Files.createTempDirectory("chain-sub").toString
      val dir = s"$root/state"
      println(s"\n== substring store: bootstrap + 10 admissions (pmod 11) ==")
      val (w0, c0) = { val t = System.nanoTime(); val c = cpuSec
        SubstringDedup.bootstrapStore(spark, dir, day(11, 0))
        ((System.nanoTime() - t) / 1e9, cpuSec - c) }
      println(f"day  0 bootstrap wall=$w0%7.2f cpu=$c0%7.2f " +
        f"seg_mb=${dirMb(s"$dir/windows/seg=0") + dirMb(s"$dir/spans/seg=0")}%8.3f " +
        f"win_rows=${spark.read.parquet(s"$dir/windows/seg=0").count()}%8d")
      (1 to 10).foreach { i =>
        val t = System.nanoTime(); val c = cpuSec
        SubstringDedup.admitDrop(spark, dir, day(11, i),
          maxLiveSegments = maxLive)
        val (w, cd) = ((System.nanoTime() - t) / 1e9, cpuSec - c)
        val segMb = dirMb(s"$dir/windows/seg=$i") + dirMb(s"$dir/spans/seg=$i")
        val rows = spark.read.parquet(s"$dir/windows/seg=$i").count()
        val m = graft.operators.VersionedIndex.metaOrThrow(dir)
        println(f"day $i%2d admit     wall=$w%7.2f cpu=$cd%7.2f " +
          f"seg_mb=$segMb%8.3f win_rows=$rows%8d segs=${m.segs.size}%2d" +
          (if (m.segs == Vector(i.toLong)) " FOLD" else ""))
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }

    if (which == "cms" || which == "both") {
      import graft.operators.HeavyHitters
      val root = java.nio.file.Files.createTempDirectory("chain-cms").toString
      val dir = s"$root/state"
      println(s"\n== cms sketch store: bootstrap + 30 admissions (pmod 31) ==")
      val (w0, c0) = { val t = System.nanoTime(); val c = cpuSec
        HeavyHitters.bootstrapSketch(spark, dir, day(31, 0))
        ((System.nanoTime() - t) / 1e9, cpuSec - c) }
      println(f"day  0 bootstrap wall=$w0%7.2f cpu=$c0%7.2f " +
        f"seg_mb=${dirMb(s"$dir/cells/seg=0")}%8.3f")
      (1 to 30).foreach { i =>
        val t = System.nanoTime(); val c = cpuSec
        HeavyHitters.admitDrop(spark, dir, day(31, i),
          maxLiveSegments = maxLive)
        val (w, cd) = ((System.nanoTime() - t) / 1e9, cpuSec - c)
        val m = graft.operators.VersionedIndex.metaOrThrow(dir)
        println(f"day $i%2d admit     wall=$w%7.2f cpu=$cd%7.2f " +
          f"seg_mb=${dirMb(s"$dir/cells/seg=$i")}%8.3f segs=${m.segs.size}%2d" +
          (if (m.segs == Vector(i.toLong)) " FOLD" else ""))
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
    spark.stop()
  }
}
