package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev instrument: attribute the gap between the STAMPED route_recall
  * (sampled stratum, `Dedup.lshRouteRecallSample`) and the planted-twin
  * sweep number that justified the router grid's promotion
  * (`bench/NEARDUP_SWEEP_r16_sf001.txt`: 0.930 at θ=0.45 vs the stamped
  * 0.757 at sf0.1). Three candidate explanations, each directly
  * measurable at sf0.1 because the corpus is small enough to run the
  * exact kernel on in full:
  *
  *   1. ORGANIC DISTRIBUTION: the corpus's true pairs concentrate at
  *      weaker cosine than the sweep's planted twins (uniform over
  *      {0.5..0.95}), and hyperplane-LSH recall falls with cosine by
  *      nature — print the full-corpus recall DECOMPOSED by cos bucket.
  *   2. STRATUM NOISE: a ~4k-vector stratum keeps only pairs with BOTH
  *      endpoints sampled (~(cap/n)² of pairs), so the estimate rides
  *      on few pairs — print per-offset resamples and their spread.
  *   3. STRATUM BIAS: the gate is a per-vector hash, so pair survival
  *      is uniform — resamples scattering AROUND the full-corpus truth
  *      (not consistently below) refutes bias.
  *
  * Usage: RouteRecallProbe [sfDir] [threshold] [nOffsets] [caps,csv]
  */
object RouteRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val threshold = if (args.length > 1) args(1).toDouble else 0.45
    val nOffsets = if (args.length > 2) args(2).toInt else 5
    val caps = if (args.length > 3) args(3).split(",").map(_.trim.toLong).toSeq
      else Seq(4096L, 8192L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.limit.initialNumPartitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    val emb = graft.engine.Tables.embeddings(spark, sfDir)
    val n = emb.count()
    println(s"[route] sfDir=$sfDir n=$n threshold=$threshold " +
      s"grid=${Dedup.AutoLshTables}x${Dedup.AutoLshPlanes}+" +
      s"${Dedup.AutoLshProbes}probes")

    def show(tag: String, buckets: Seq[(Double, Long, Long)]): Unit = {
      val curve = buckets.map { case (lo, ex, hit) =>
        f"$lo%.2f:$hit%d/$ex%d" }.mkString(" ")
      println(f"[route] $tag overall=${Dedup.recallFromBuckets(buckets)}%.3f " +
        f"@0.50=${Dedup.recallFromBuckets(buckets, 0.50)}%.3f " +
        f"@0.60=${Dedup.recallFromBuckets(buckets, 0.60)}%.3f " +
        f"@0.80=${Dedup.recallFromBuckets(buckets, 0.80)}%.3f " +
        f"pairs=${buckets.map(_._2).sum}  curve: $curve")
    }

    // ground truth: the full corpus IS the stratum (cap >= n disables
    // the gate) — the number every stratum estimate below is estimating
    show("FULL  ", Dedup.lshRouteRecallDecomposed(emb, threshold, n, cap = n))

    // resamples rotate the gate by WHOLE WINDOWS (off * keep): strata
    // are disjoint partitions of the hash space, not sliding windows
    // that share most of their vectors. When the gate is inactive
    // (cap >= n, keep == denom) every resample would be the identical
    // full corpus — say so once instead of printing fake replicates.
    val denom = 1L << 20
    for (cap <- caps) {
      val keep = math.max(1L, math.min(denom, cap * denom / math.max(1L, n)))
      if (keep >= denom)
        println(s"[route] cap=$cap gate inactive (cap >= n): the FULL row " +
          "above IS the stamped stratum; no independent resamples exist")
      else for (off <- 0 until math.min(nOffsets.toLong, denom / keep).toInt)
        show(f"cap=$cap%-5d off=$off",
          Dedup.lshRouteRecallDecomposed(emb, threshold, n, cap,
            gateOffset = off * keep))
    }
    spark.stop()
  }
}
