package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarial auto-salt probe (r20): an intentionally hot window-hash
  * corpus — `nHot` docs all sharing one k-token run (an nHot² join
  * group on a single reducer) next to `nCold` unique docs — timed
  * through [[graft.operators.SubstringDedup.duplicateSpans]] three
  * ways: unsalted, manual full salt grid, and autoSalt (CMS-flagged
  * keys only). Prints per-variant walls and asserts the three span
  * sets identical. Usage:
  *
  *   SPARK_GRAFT_CPUS=32 tools/run_verify.sh graft.tools.SaltProbe [nHot] [nCold] [reps]
  */
object SaltProbe {
  def main(args: Array[String]): Unit = {
    val nHot = if (args.length > 0) args(0).toInt else 3000
    val nCold = if (args.length > 1) args(1).toInt else 20000
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    // SPARK_GRAFT_SALTPROBE_AQE=off simulates the STATIC-PLAN admission
    // context (Par.withStaticPlan — q85's append path), where AQE's
    // skew-join splitting is unavailable and the hot reducer serializes
    val aqe = !sys.env.get("SPARK_GRAFT_SALTPROBE_AQE").contains("off")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    println(s"AQE: $aqe")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val k = graft.operators.SubstringDedup.DedupK
    val hotRun = (1 to k).map(i => s"hz$i").mkString(" ")
    // hot docs: the shared k-run + 2 unique tokens; cold docs: k+2
    // unique tokens (windows exist, none repeat)
    val docs = spark.range(nHot)
      .select(col("id").as("doc_id"),
        concat(lit(s"$hotRun "), lit("hu"), col("id"), lit(" hv"),
          col("id")).as("text"))
      .unionByName(spark.range(nCold)
        .select((col("id") + 1000000L).as("doc_id"),
          concat_ws(" ", (0 until k + 2).map(j =>
            concat(lit(s"cw${j}_"), col("id"))): _*).as("text")))
      .repartition(cpus.toInt)
    docs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"corpus: $nHot hot + $nCold cold docs (${docs.count()} rows)")
    def time(tag: String)(f: => DataFrame): (Double, Long) = {
      val walls = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = f.count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val best = walls.map(_._1).min
      println(f"$tag%-12s best $best%7.2f s over $reps reps " +
        f"(all: ${walls.map(w => f"${w._1}%.2f").mkString(", ")}) " +
        s"rows=${walls.head._2}")
      (best, walls.head._2)
    }
    import graft.operators.SubstringDedup
    import SubstringDedup.{duplicateSpans, AutoSaltBuckets}
    // STAGE-LEVEL: the window-hash self-join alone (count aggregates in
    // the join tasks — no downstream shuffle). This is the stage the
    // salt targets: unsalted, ONE task emits the hot key's quadratic
    // pair set while every other core idles; at deployment width the
    // downstream stages scale with the cluster but this task does not.
    val wins = SubstringDedup
      .windowRel(docs, SubstringDedup.DedupK)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"windows: ${wins.count()}")
    // repartition forces the matched pairs through a real exchange —
    // a bare count would collapse inside the join's codegen stage and
    // hide the serialized shuffle WRITE of the one hot task
    val (jPlain, jnP) = time("join:plain")(
      SubstringDedup.matchedPairs(wins, 1).repartition(cpus.toInt))
    val (jSalt, jnS) = time("join:salted")(
      SubstringDedup.matchedPairs(wins, AutoSaltBuckets)
        .repartition(cpus.toInt))
    require(jnP == jnS, s"pair counts diverged: $jnP / $jnS")
    println(f"JOIN-STAGE speedup from the salt grid: ${jPlain / jSalt}%.2fx")
    // END-TO-END: the full operator (the quadratic span output flows
    // through the islands window shuffle, identical for all variants —
    // at local[32] that stage dilutes the join-stage win; on a wide
    // cluster it scales out while the hot join task cannot)
    val (wPlain, nPlain) = time("unsalted")(duplicateSpans(docs))
    val (wFull, nFull) = time("full-salt")(
      duplicateSpans(docs, saltBuckets = AutoSaltBuckets))
    val (wAuto, nAuto) = time("auto-salt")(duplicateSpans(docs, autoSalt = true))
    require(nPlain == nFull && nPlain == nAuto,
      s"span counts diverged: $nPlain / $nFull / $nAuto")
    val idAuto = graft.operators.SubstringDedup.duplicateSpans(docs)
      .exceptAll(duplicateSpans(docs, autoSalt = true)).isEmpty
    println(s"row-identity (plain vs auto): $idAuto")
    println(f"end-to-end: auto-salt ${wPlain / wAuto}%.2fx vs unsalted; " +
      f"full-salt ${wPlain / wFull}%.2fx")
    spark.stop()
  }
}
