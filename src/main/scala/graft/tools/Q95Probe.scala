package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r20 margin-measurement probe for q95 (model-rate budget gate): per
  * source and scale, the holdout weak-label budget vs the trained
  * model's budget, honest and inverted-fit. Usage:
  *   tools/run_verify.sh graft.tools.Q95Probe /root/testdata/sf0.01
  */
object Q95Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = 1000L
    for (dir <- args) {
      val docs = graft.engine.Tables.documents(spark, dir)
      val lab = graft.operators.QualityModel.labeled(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def rates(l: org.apache.spark.sql.DataFrame, tag: String): Unit = {
        val (model, asm) = graft.operators.QualityModel.fit(l)
        val hold = model.transform(asm.transform(
            l.filter(col("split") === "holdout")))
          .select(col("doc_id"), col("weak_label"),
            (col("prediction") === 1.0).cast("long").as("pred_pos"))
          .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n"), sum(col("weak_label")).as("wpos"),
            sum(col("pred_pos")).as("mpos"))
          .orderBy("source").collect()
        hold.foreach { r =>
          val (s, n, w, m) = (r.getString(0), r.getLong(1), r.getLong(2),
            r.getLong(3))
          val wb = base * w / n; val mb = base * m / n
          println(f"$dir $tag%-9s $s%-10s n=$n%5d weak_budget=$wb%5d " +
            f"model_budget=$mb%5d delta=${math.abs(wb - mb)}%5d")
        }
      }
      rates(lab, "honest")
      rates(lab.withColumn("weak_label",
        when(col("split") === "train", lit(1L) - col("weak_label"))
          .otherwise(col("weak_label"))), "inverted")
      lab.unpersist()
    }
    spark.stop()
  }
}
