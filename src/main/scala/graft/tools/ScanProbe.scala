package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures small-corpus scan parallelism: Spark packs parquet files into
  * input splits of size `min(maxPartitionBytes, max(openCostInBytes,
  * totalBytes/defaultParallelism))`, so when a table's total bytes fall
  * below `cores * openCostInBytes` (4 MB default) the scan collapses to
  * `totalBytes / 4MB` partitions and a tokenize-heavy first stage runs on
  * a couple of cores regardless of `local[32]`. This probe prints, per
  * table and per `openCostInBytes` setting, the scan partition count and
  * the wall of a scan-heavy aggregation, to decide whether the session
  * default should change. At cluster scale `bytesPerCore` exceeds
  * `maxPartitionBytes`, so this knob only affects small-corpus runs.
  *
  * Usage: ScanProbe [sfDir] [iters]
  */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val iters = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    // warm: JIT + page cache for the probed table
    val warm = spark.read.parquet(s"$sfDir/documents.parquet")
    warm.agg(sum(length(col("text")))).collect()

    for (openCost <- Seq("4194304", "262144", "16384")) {
      spark.conf.set("spark.sql.files.openCostInBytes", openCost)
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val parts = docs.rdd.getNumPartitions
      // tokenize-heavy single-stage shape: the per-row cost dominates and
      // the scan stage's partition count is the whole parallelism story
      val walls = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        docs.select(explode(split(lower(col("text")), "\\s+")).as("tok"))
          .agg(count("*"), approx_count_distinct("tok")).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scanprobe] openCost=$openCost%8s scanParts=$parts%3d " +
        f"tokenizeAgg walls=${walls.map(w => f"$w%.2f").mkString(",")} s")
    }
    spark.stop()
  }
}
