package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: does q81's hot-cluster sub-grid actually buy parallelism,
  * or only pass the exactness spec? Two measurements on a deliberately
  * skewed corpus:
  *
  *  1. An incidental finding the first probe version surfaced: when the
  *     DOMINANT direction appears among the low vec_ids, the seed-
  *     centroid rule (first K corpus vectors) seeds MANY centroids in
  *     that direction and the argmax FRAGMENTS the hot mass across
  *     them — a natural hot-cluster splitter that keeps every cluster
  *     under the sub-grid threshold with no help.
  *  2. The adversarial layout (hot direction only ABOVE the centroid
  *     id range — e.g. boilerplate concentrated in late-ingested
  *     files): the whole hot mass lands on ONE centroid, the cluster
  *     blows past the 4k sub-grid threshold, and `forcedBlocks=1`
  *     (every cluster one task — what a naive groupBy-cluster kernel
  *     does) serializes a quadratic kernel on one core while the
  *     size-derived grid shatters it into b² parallel cells. eps sits
  *     ABOVE the hot cosine so the measurement is pure kernel work,
  *     not pair materialization. Row identity between arms asserted.
  *
  * Usage: SemDedupProbe [nHot] [nBg] [dim]   (defaults 30000 10000 64)
  */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val nHot = if (args.length > 0) args(0).toInt else 30000
    val nBg = if (args.length > 1) args(1).toInt else 10000
    val dim = if (args.length > 2) args(2).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val rnd = new scala.util.Random(1234L)
    val dir = Array.fill(dim)(rnd.nextGaussian())
    // background FIRST: ids [0, 16+nBg) — the centroid range (first K
    // ids) is all seeds/background, so the hot direction cannot seed a
    // centroid and the hot mass lands on one cluster
    val rows = (0 until 16 + nBg).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat))) ++
      (0 until nHot).map(i => (16L + nBg + i,
        dir.map(x => (x + 0.15 * rnd.nextGaussian()).toFloat)))
    val emb = rows.toDF("vec_id", "embedding")
      .repartition(cpus.toInt).persist()
    println(s"[probe] corpus: $nBg background+seeds FIRST, then $nHot hot, dim $dim")

    // eps above the hot-hot cosine (~0.978): pure kernel work, ~no
    // emitted pairs — the measurement isolates the quadratic dot loop
    val eps = 0.995
    def run(label: String, forced: Int): (Double, Long) = {
      graft.operators.Dedup.clearShingleCaches()
      val t0 = System.nanoTime()
      val out = graft.operators.Dedup.semanticDedup(emb, eps = eps,
        forcedBlocks = forced)
      // aggregate over `status` — a plain count() lets Catalyst
      // ELIMINATE the left join against the (unique-keyed) dupOf side
      // and the pair kernel never runs; status forces it
      val n = out.select(
        sum(when(col("status") === "drop", 1L).otherwise(0L))).head().getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label: $sec%.1f s, $n drops")
      (sec, n)
    }
    // warm JIT on a small slice
    graft.operators.Dedup.semanticDedup(emb.limit(2000), eps = eps).count()

    // cluster-size distribution: prove the hot cluster actually formed
    graft.operators.Dedup.clearShingleCaches()
    val sizes = graft.operators.Dedup.semanticDedup(emb, eps = eps)
      .groupBy("cid").count().orderBy(desc("count")).limit(3).collect()
      .map(r => s"cid=${r.getLong(0)}:${r.getLong(1)}").mkString(", ")
    println(s"[probe] largest clusters: $sizes")

    val (tGrid, nGrid) = run("auto sub-grid", 0)
    val (tSerial, nSerial) = run("forcedBlocks=1 (one task per cluster)", 1)
    require(nGrid == nSerial, s"row counts diverged: $nGrid vs $nSerial")
    graft.operators.Dedup.clearShingleCaches()
    val a = graft.operators.Dedup.semanticDedup(emb, eps = eps)
    graft.operators.Dedup.clearShingleCaches()
    val b = graft.operators.Dedup.semanticDedup(emb, eps = eps,
      forcedBlocks = 1)
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    require(diff == 0, s"sub-grid diverged from serial kernel: $diff rows")
    println(f"[probe] RESULT serial/grid wall = ${tSerial / tGrid}%.2fx " +
      f"(grid $tGrid%.1f s vs serial $tSerial%.1f s); outputs row-identical")
    spark.stop()
  }
}
