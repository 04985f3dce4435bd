package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Measurements behind the learned-IVF-PQ design calls (re-run after
  * touching the PQ/IVF model code):
  *
  * 1. Real fixtures, fair footing (seed models from vec_id 16..31,
  *    disjoint from the queries): the learned index beats seed at every
  *    scale — r14 measured 0.29/0.23/0.24 vs 0.20/0.10/0.11 recall@10
  *    at sf0.001/0.01/0.1. Pinned (aggregate ≥) in DedupSpec.
  *
  * 2. Tight-cluster fixture (16 directions × ~40 members, 0.25 noise):
  *    the coarse stage is PERFECT (learned IVF recall 1.0) yet composed
  *    recall collapses to ~k/cluster_size (r14: 0.275 with all 16 cells
  *    probed) — a near-perfect codebook reconstructs every member of a
  *    cluster to ~the same point, so ADC cannot order WITHIN a cluster.
  *    At that granularity the production fix is an exact re-rank of the
  *    ADC shortlist, not a better codebook; documented on
  *    [[Similarity.pqCodebookTrained]].
  */
object IvfPqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def recallOf(exact: Set[(Long, Long)], name: String, df: DataFrame): Unit = {
      val approx = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"[ivfpq] $name%-24s recall=${(exact intersect approx).size.toDouble / exact.size}%.3f")
    }
    def groundTruth(emb: DataFrame): Set[(Long, Long)] =
      Similarity.bruteForceTopK(emb, 8, 10).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    // 1. real fixtures, learned vs disjoint seed
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = graft.engine.Tables.embeddings(spark, s"/root/testdata/$sf").cache()
      val exact = groundTruth(emb)
      val root = java.nio.file.Files.createTempDirectory("ivfpqp").toString
      val seedC = Similarity.collectCentroids(emb, 16, 16)
      Similarity.buildIvfPqIndexWith(emb, s"$root/s", seedC,
        seedC.map(_._2.map(_.toDouble).toSeq).toSeq)
      Similarity.buildIvfPqIndexLearned(emb, s"$root/l")
      recallOf(exact, s"$sf seed16", Similarity.annIvfPqIndexed(emb, s"$root/s"))
      recallOf(exact, s"$sf learned", Similarity.annIvfPqIndexed(emb, s"$root/l"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      emb.unpersist()
    }

    // 2. tight-cluster fixture: the within-cluster ADC collapse
    val rnd = new scala.util.Random(1717L)
    val dirs = Array.fill(16)(Array.fill(64)(rnd.nextGaussian()))
    val emb = (0 until 640).map { i =>
      val d = dirs(rnd.nextInt(16))
      (i.toLong, d.map(x => (x + 0.25 * rnd.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding").cache()
    val exact = groundTruth(emb)
    recallOf(exact, "cluster ivf-kmeans", Similarity.annIvfKmeans(emb))
    val root = java.nio.file.Files.createTempDirectory("ivfpqp").toString
    Similarity.buildIvfPqIndexLearned(emb, s"$root/l")
    recallOf(exact, "cluster learned-np4", Similarity.annIvfPqIndexed(emb, s"$root/l"))
    recallOf(exact, "cluster learned-np16",
      Similarity.annIvfPqIndexed(emb, s"$root/l", nprobe = 16))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    spark.stop()
  }
}
