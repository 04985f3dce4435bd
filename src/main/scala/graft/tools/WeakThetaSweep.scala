package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev instrument behind the router's WEAK-THRESHOLD tier: the r17
  * attribution showed the default grid (16×10+2) reading 0.76 on
  * sf0.1's ORGANIC weak pairs (90% of them in cos [0.45, 0.50)) while
  * the planted-twin sweep read 0.93 — the planted mix just put its mass
  * where hyperplane LSH is near-complete. This sweep measures candidate
  * tiers ON THE ORGANIC CORPUS at θ=0.45 (full-corpus truth, no
  * stratum), with the verify-mass accounting of [[NearDupSweep]], to
  * pick the tier that buys ≥0.9 organic recall at bounded mass.
  *
  * {{{ tools/run_verify.sh graft.tools.WeakThetaSweep /root/testdata/sf0.1 }}}
  * Committed per round as `bench/WEAKTHETA_r{N}_<sf>.txt`.
  */
object WeakThetaSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val threshold = if (args.length > 1) args(1).toDouble else 0.45
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.limit.initialNumPartitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.engine.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val n = emb.count()
    println(s"# weak-theta organic sweep corpus=$sfDir n=$n thr=$threshold " +
      s"exact_mass=${n * (n - 1) / 2}")
    println(f"${"tables"}%7s ${"planes"}%7s ${"probes"}%7s ${"overall"}%8s " +
      f"${"@<0.50"}%8s ${"@0.60"}%7s ${"verify_mass"}%12s ${"wall_s"}%7s")
    val grids = Seq(
      (Dedup.AutoLshTables, Dedup.AutoLshPlanes, Dedup.AutoLshProbes),
      (16, 10, 3), (16, 10, 4), (16, 8, 2), (16, 8, 3), (16, 8, 4),
      (24, 10, 3), (32, 10, 2), (16, 6, 2), (24, 8, 3))
    for ((tables, planes, probes) <- grids) {
      val t0 = System.nanoTime()
      val buckets = Dedup.lshRouteRecallDecomposed(emb, threshold, n,
        cap = n, nTables = tables, planes = planes, probes = probes)
      val wall = (System.nanoTime() - t0) / 1e9
      val bucketsCol = graft.functions.LshFns.lshBucketsMultiProbe(
        col("embedding"),
        Dedup.nearDupPlaneWeights(tables, planes), planes, probes)
      val mass = emb.select(col("vec_id"),
          posexplode(bucketsCol).as(Seq("pos", "bucket")))
        .select((col("pos") / (1 + probes)).cast("int").as("t"), col("bucket"))
        .groupBy(col("t"), col("bucket")).agg(count(lit(1)).as("occ"))
        .agg(sum(expr("occ * (occ - 1) / 2"))).head().getDouble(0)
      val weakOnly = buckets.filter(_._1 < 0.50 - 1e-9)
      val weak =
        if (weakOnly.map(_._2).sum == 0) Double.NaN
        else weakOnly.map(_._3).sum.toDouble / weakOnly.map(_._2).sum
      println(f"$tables%7d $planes%7d $probes%7d " +
        f"${Dedup.recallFromBuckets(buckets)}%8.3f $weak%8.3f " +
        f"${Dedup.recallFromBuckets(buckets, 0.60)}%7.3f " +
        f"${mass.toLong}%12d $wall%7.1f")
    }
    spark.stop()
  }
}
