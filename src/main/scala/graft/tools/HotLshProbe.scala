package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the salt-grid's value on a HOT corpus — the case q57 exists
  * for: `hotShare` of the docs are near-identical boilerplate (one
  * trailing variant token, so exact dedup keeps them and they collide in
  * every LSH band), the rest unique. Times `lshCandidatePairs` unsalted
  * vs salted and asserts row-set identity. The unsalted join's hottest
  * (band, band_hash) reducer does |hot|² work in ONE task; the grid
  * splits it into B² cells.
  *
  * The 5th arg selects the band family: `minhash` (16 bands — a hot doc
  * set spreads 16 ways before any salt) or `simhash` (4 bands — hot work
  * concentrates in 4 reducers, the local-scale case where the grid can
  * actually win).
  *
  * Usage: HotLshProbe [nDocs] [hotShare] [saltBuckets] [iters] [family]
  */
object HotLshProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 20000
    val hotShare = if (args.length > 1) args(1).toDouble else 0.10
    val salt = if (args.length > 2) args(2).toInt else 8
    val iters = if (args.length > 3) args(3).toInt else 3
    val family = if (args.length > 4) args(4) else "minhash"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nHot = (n * hotShare).toInt
    val docs = spark.range(n.toLong).select(col("id").as("doc_id"),
      when(col("id") < nHot,
        concat(lit("common boilerplate page body text repeated across the crawl v"),
          col("id")))
        .otherwise(concat(lit("unique document "), col("id"),
          lit(" with distinct content "), md5(col("id").cast("string"))))
        .as("text"))
      .repartition(32).localCheckpoint() // pin the input outside the timing

    def pairsOf(saltBuckets: Int) = family match {
      case "simhash" =>
        graft.operators.Dedup.simhashPairs(docs, saltBuckets = saltBuckets)
          .select("doc_a", "doc_b")
      case _ => graft.operators.Dedup.lshCandidatePairs(docs, saltBuckets)
    }
    def time(saltBuckets: Int): (Double, Long) = {
      val walls = (1 to iters).map { _ =>
        graft.operators.Dedup.clearShingleCaches() // defeat the memo per run
        val t0 = System.nanoTime()
        val c = pairsOf(saltBuckets).count()
        ((System.nanoTime() - t0) / 1e9, c)
      }
      (walls.map(_._1).min, walls.head._2)
    }
    val (wUnsalted, cU) = time(1)
    val (wSalted, cS) = time(salt)
    // identity via distributed checksum — collecting 10^8 pairs to the
    // driver is the thing this probe exists to avoid. Count + SUM alone
    // can alias (two equal-size pair sets can hash-sum equal, r13
    // advice), so the signature also carries DISTINCT count, min, and
    // max of the pair hash: a decomposition bug now has to preserve
    // all five moments at once to print identical=true. (The spec-level
    // guarantee stays DedupSpec's exact set equality at test scale.)
    def sig(saltBuckets: Int): Seq[Any] = {
      graft.operators.Dedup.clearShingleCaches()
      val h = xxhash64(col("doc_a"), col("doc_b"))
      pairsOf(saltBuckets)
        .agg(count(lit(1)), sum(h.cast("decimal(38,0)")),
          count_distinct(h), min(h), max(h))
        .collect().head.toSeq
    }
    val same = sig(1) == sig(salt)
    println(f"[hotlsh] family=$family n=$n hot=$nHot pairs=$cU (salted $cS) identical=$same")
    println(f"[hotlsh] unsalted best $wUnsalted%.2f s | salted(B=$salt) best $wSalted%.2f s" +
      f" | speedup ${wUnsalted / wSalted}%.2fx")
    spark.stop()
  }
}
