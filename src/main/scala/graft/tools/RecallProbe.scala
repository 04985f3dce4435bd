package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Prints per-query recall@10 of every ANN family against brute force
  * at the given corpus dirs — the measurement behind the
  * [[Similarity.KmeansRecallFloor]] / [[Similarity.IvfPqLearnedRecallFloor]]
  * constants (re-run after changing any index family):
  *
  * {{{ tools/run_verify.sh graft.tools.RecallProbe sf0.001 sf0.01 sf0.1 }}}
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfs = if (args.nonEmpty) args.toSeq else Seq("sf0.001", "sf0.01", "sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- sfs) {
      val d = s"/root/testdata/$sf"
      val emb = graft.engine.Tables.embeddings(spark, d)
      val exact = graft.Checkpoints.pin(Similarity.bruteForceTopK(emb, 8, 10)
        .select(col("query_id"), col("cand_id")))
      def recalls(name: String, ap: DataFrame): Unit = {
        val r = exact
          .join(ap.select(col("query_id"), col("cand_id"), lit(1L).as("hit")),
            Seq("query_id", "cand_id"), "left")
          .groupBy("query_id")
          .agg((sum(coalesce(col("hit"), lit(0L))) / 10.0).as("rec"))
          .orderBy("query_id").collect().map(_.getDouble(1))
        println(f"[recall] $sf%-8s $name%-14s min=${r.min}%.2f " +
          s"per-query=${r.map(x => f"$x%.2f").mkString(",")}")
      }
      recalls("lsh", Similarity.annLsh(emb))
      recalls("lsh-mp2", Similarity.annLshMultiProbe(emb))
      recalls("ivf-seed", Similarity.annIvf(emb))
      recalls("ivf-kmeans", Similarity.annIvfIndexed(emb,
        Similarity.ensureIvfIndex(spark, d)))
      recalls("pq", Similarity.annPqIndexed(emb,
        Similarity.ensurePqIndex(spark, d)))
      recalls("ivfpq-seed", Similarity.annIvfPqIndexed(emb,
        Similarity.ensureIvfPqIndex(spark, d)))
      recalls("ivfpq-learned", Similarity.annIvfPqIndexed(emb,
        Similarity.ensureIvfPqLearnedIndex(spark, d)))
      recalls("ivfpq-lrn-np6", Similarity.annIvfPqIndexed(emb,
        Similarity.ensureIvfPqLearnedIndex(spark, d), nprobe = 6))
      recalls("ivfpq-lrn-np8", Similarity.annIvfPqIndexed(emb,
        Similarity.ensureIvfPqLearnedIndex(spark, d), nprobe = 8))
      recalls("ivfpq-refined", Similarity.annIvfPqRefined(emb,
        Similarity.ensureIvfPqIndex(spark, d)))
      recalls("ivfpq-ref-sl100", Similarity.annIvfPqRefined(emb,
        Similarity.ensureIvfPqIndex(spark, d), shortlist = 100))
      recalls("ivfpq-ref-sl200", Similarity.annIvfPqRefined(emb,
        Similarity.ensureIvfPqIndex(spark, d), shortlist = 200))
      recalls("ivfpq-ref-deep", Similarity.annIvfPqRefinedDeep(emb,
        Similarity.ensureIvfPqIndex(spark, d)))
      recalls("ivfpq-lrn-refined", Similarity.annIvfPqRefined(emb,
        Similarity.ensureIvfPqLearnedIndex(spark, d)))
      recalls("ivfpq-lrn-ref-deep", Similarity.annIvfPqRefinedDeep(emb,
        Similarity.ensureIvfPqLearnedIndex(spark, d)))
    }
    spark.stop()
  }
}
