package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** The recall-vs-cost frontier of the LSH near-dup route across its
  * banding grid (tables × planes) at the three threshold regimes — the
  * committed evidence behind [[Dedup.embeddingNearDupsLsh]]'s recall
  * prose and the router's sampled-recall column:
  *
  *   recall = |lsh pairs| / |exact pairs|   (lsh ⊆ exact: verify is exact)
  *   verify_mass = Σ_groups occ·(occ−1)/2   (dot products the route pays)
  *   exact_mass  = n·(n−1)/2                (what the exact kernel pays)
  *
  * {{{ tools/run_verify.sh graft.tools.NearDupSweep /root/testdata/sf0.01 }}}
  *
  * Output (stdout table) is committed per round as
  * `bench/NEARDUP_SWEEP_r{N}_<sf>.txt`.
  */
object NearDupSweep {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.limit.initialNumPartitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // the synthetic corpus has no natural pairs above ~0.6 cosine, so
    // the high-threshold regimes would read NaN (no evidence). Plant
    // controlled-cosine twins of corpus vectors (v' = cos·v̂ + sin·ŵ⊥,
    // seeded) at every regime's operating point, so each threshold row
    // measures recall against a non-empty exact set.
    val base = graft.engine.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val rnd = new scala.util.Random(1515L)
    val hosts = base.orderBy("vec_id").limit(120)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val planted = hosts.zipWithIndex.map { case ((id, v), i) =>
      val target = Seq(0.5, 0.65, 0.85, 0.95)(i % 4)
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      val w = Array.fill(v.length)(rnd.nextGaussian())
      // orthogonalize w against v, then scale: cos(target)·v̂ + sin·ŵ
      val dot = v.zip(w).map { case (a, b) => a * b }.sum
      val wo = w.zip(v).map { case (b, a) => b - dot / (norm * norm) * a }
      val wn = math.sqrt(wo.map(x => x * x).sum)
      val s = math.sin(math.acos(target))
      (10000000L + id, v.indices.map(k =>
        (target * v(k) / norm + s * wo(k) / wn).toFloat).toArray)
    }
    val emb = base.unionByName(
      planted.toSeq.toDF("vec_id", "embedding")).localCheckpoint()
    val n = emb.count()
    println(s"# LSH near-dup recall-vs-cost sweep  corpus=$d n=$n " +
      s"(${hosts.length} planted twins at cos {0.5,0.65,0.85,0.95}) " +
      s"exact_mass=${n * (n - 1) / 2}")
    println(f"${"thr"}%5s ${"tables"}%7s ${"planes"}%7s ${"probes"}%7s " +
      f"${"recall"}%7s ${"pairs"}%7s ${"exact"}%7s ${"verify_mass"}%12s ${"wall_s"}%7s")
    for (threshold <- Seq(0.45, 0.6, 0.8)) {
      val exactPairs = Dedup.embeddingNearDups(emb, threshold).count()
      for ((tables, planes, probes) <- Seq((8, 8, 0), (16, 8, 0), (32, 8, 0),
          (16, 6, 0), (16, 10, 0), (64, 10, 0),
          (16, 8, 1), (16, 8, 2), (16, 8, 3), (8, 8, 2), (16, 10, 2))) {
        val t0 = System.nanoTime()
        val lshPairs = Dedup.embeddingNearDupsLsh(emb, threshold,
          nTables = tables, planes = planes, probes = probes).count()
        val wall = (System.nanoTime() - t0) / 1e9
        // verify mass: pair products actually scored inside buckets
        val bucketsCol =
          if (probes == 0) graft.functions.LshFns.lshBuckets(col("embedding"),
            Dedup.nearDupPlaneWeights(tables, planes), planes)
          else graft.functions.LshFns.lshBucketsMultiProbe(col("embedding"),
            Dedup.nearDupPlaneWeights(tables, planes), planes, probes)
        val mass = emb.select(col("vec_id"),
            posexplode(bucketsCol).as(Seq("pos", "bucket")))
          .select((col("pos") / (1 + probes)).cast("int").as("t"), col("bucket"))
          .groupBy(col("t"), col("bucket")).agg(count(lit(1)).as("occ"))
          .agg(sum(expr("occ * (occ - 1) / 2"))).head().getDouble(0)
        val recall =
          if (exactPairs == 0) Double.NaN else lshPairs.toDouble / exactPairs
        println(f"$threshold%5.2f $tables%7d $planes%7d $probes%7d $recall%7.3f " +
          f"$lshPairs%7d $exactPairs%7d ${mass.toLong}%12d $wall%7.2f")
      }
    }
    spark.stop()
  }
}
