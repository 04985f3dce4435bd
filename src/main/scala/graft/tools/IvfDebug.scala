package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic for IVF centroid quality (dev tool, not part of the
  * engine surface). */
object IvfDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.engine.Tables.embeddings(spark, "/root/testdata/sf0.001")
    println("labels: " + emb.groupBy("label").count().orderBy("label")
      .collect().map(r => s"${r.get(0)}:${r.get(1)}").mkString(" "))
    // k-means cell sizes
    val feats = emb.withColumn("features",
      org.apache.spark.ml.functions.array_to_vector(col("embedding")))
    for (dist <- Seq("cosine", "euclidean")) {
      val model = new org.apache.spark.ml.clustering.KMeans()
        .setK(16).setSeed(42L).setMaxIter(20)
        .setDistanceMeasure(dist).setFeaturesCol("features").fit(feats)
      val sizes = model.transform(feats).groupBy("prediction").count()
        .orderBy("prediction").collect().map(_.getLong(1))
      println(s"$dist cell sizes: ${sizes.mkString(" ")} (${sizes.length} cells)")
      // cross-tab: how concentrated is each label in cells
      val tab = model.transform(feats).groupBy("label", "prediction").count()
        .orderBy("label", "prediction").collect()
        .map(r => s"${r.get(0)}->${r.get(1)}:${r.get(2)}").mkString(" ")
      println(s"$dist label->cell: $tab")
    }
    // recall scan: k-means iterations vs the seed-centroid variant
    import graft.operators.Similarity
    val exact = Similarity.bruteForceTopK(emb, 8, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val approx = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    println(f"seed-centroid recall (centroids ⊇ queries): ${recallOf(Similarity.annIvf(emb, 8, 10))}%.3f")
    println(f"seed-centroid recall (disjoint, from 16): ${recallOf(Similarity.annIvf(emb, 8, 10, centroidFrom = 16))}%.3f")
    println(f"seed-centroid recall (disjoint, from 100): ${recallOf(Similarity.annIvf(emb, 8, 10, centroidFrom = 100))}%.3f")
    for (it <- Seq(0, 1, 2, 5, 20))
      println(f"kmeans maxIter=$it%2d recall: ${recallOf(Similarity.annIvfKmeans(emb, 8, 10, maxIter = it))}%.3f")
    spark.stop()
  }
}
