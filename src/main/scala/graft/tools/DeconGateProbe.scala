package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r20: the per-admission COST of the streaming decontamination gates
  * (the r19 "bench the decon-gated admitNewDrops path" item) — the
  * text chain ([[graft.streaming.DedupStream]], q78's window kernel)
  * and the vector chain ([[graft.streaming.EmbedStream]], the exact
  * cosine kernel) each run bootstrap + one daily admission at sf0.1,
  * gated vs ungated, clean probe (the steady case: the gate runs, flags
  * nothing, quarantines nothing). Reports per-variant walls; the delta
  * is the gate's per-day price.
  *
  * Usage: DeconGateProbe [sfDir] [reps]
  */
object DeconGateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.limit.initialNumPartitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timeIt(tag: String)(f: => Unit): Double = {
      val walls = (1 to reps).map { _ =>
        val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
      }
      println(f"$tag%-28s best ${walls.min}%7.2f s " +
        f"(all: ${walls.map(w => f"$w%.2f").mkString(", ")})")
      walls.min
    }

    // ---- text chain -------------------------------------------------------
    val docs = graft.engine.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    // an 8-doc benchmark probe that matches nothing organic
    val probe = (0 until 8).map(i =>
      (8000000L + i, (0 until 16).map(j => s"zz${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    def textRun(gated: Boolean): Unit = {
      val root = java.nio.file.Files.createTempDirectory("dgp-text").toString
      docs.withColumn("day", pmod(col("doc_id"), lit(2)))
        .repartition(2, col("day"))
        .write.partitionBy("day").parquet(s"$root/docs")
      graft.streaming.DedupStream.admitNewDrops(spark, s"$root/docs/day=*",
        s"$root/state", s"$root/ckpt", maxFilesPerBatch = Some(1),
        deconProbe = if (gated) Some(probe) else None,
        quarantineDir = if (gated) Some(s"$root/quar") else None)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
    println(s"== text chain (bootstrap + 1 admission over $sfDir) ==")
    val tU = timeIt("text ungated")(textRun(false))
    val tG = timeIt("text decon-gated")(textRun(true))
    println(f"text gate per-chain price: ${tG - tU}%.2f s (${tG / tU}%.2fx)")

    // ---- vector chain -----------------------------------------------------
    val emb = graft.engine.Tables.embeddings(spark, sfDir)
    val vprobe = (0 until 8).map { i =>
      val rnd = new scala.util.Random(1000 + i)
      (8000000L + i, Array.fill(64)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    def embRun(gated: Boolean): Unit = {
      val root = java.nio.file.Files.createTempDirectory("dgp-emb").toString
      emb.withColumn("day", pmod(col("vec_id"), lit(2)))
        .repartition(2, col("day"))
        .write.partitionBy("day").parquet(s"$root/vecs")
      graft.streaming.EmbedStream.admitNewDrops(spark, s"$root/vecs/day=*",
        s"$root/state", s"$root/ckpt", maxFilesPerBatch = Some(1),
        deconProbe = if (gated) Some(vprobe) else None,
        quarantineDir = if (gated) Some(s"$root/quar") else None,
        deconTheta = 0.8)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
    println(s"== vector chain (bootstrap + 1 admission over $sfDir) ==")
    val eU = timeIt("embed ungated")(embRun(false))
    val eG = timeIt("embed decon-gated")(embRun(true))
    println(f"embed gate per-chain price: ${eG - eU}%.2f s (${eG / eU}%.2fx)")
    spark.stop()
  }
}
