package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, DedupState, IncrementalDedup}

/** Incremental duplicate clustering: admit a day-2 batch against persisted
  * state, never touching day-1 text.
  *
  * The fixture words are pinned to a searched seed: a sliding 8-word window
  * over tokens w23_0..w23_11 gives shingle-set Jaccards of exactly 0.5
  * (bridge↔each old cluster, at the inclusive threshold) and 0.2 (old↔old,
  * below it), AND — verified against the md5 minhash family offline — the
  * bridge's LSH bands genuinely collide with BOTH old clusters while the
  * old pair's don't. At j=0.5 a 4×4-band collision only happens ~23% of
  * the time per pair, so an arbitrary fixture would silently skip the
  * merge path this spec exists to pin. */
class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def w(is: Range): String = is.map(i => s"w23_$i").mkString(" ")

  /** Two old near-dup clusters {10,11} and {20,21}, labels 10 and 20. */
  def oldDocs = Seq(
    (10L, w(0 until 8)), (11L, w(0 until 8)),
    (20L, w(4 until 12)), (21L, w(4 until 12)),
    (30L, "an unrelated old singleton document about nothing shared"),
  ).toDF("doc_id", "text")

  /** Day-2 drop: doc 1 bridges both old clusters (j = 0.5 to each) and its
    * id is the global minimum, so the merged label must become 1 — the
    * case a naive attach-new-docs-to-old-clusters implementation gets
    * wrong twice (no merge, wrong min). Doc 40 is a new singleton. */
  def newBatch = Seq(
    (1L, w(2 until 10)),
    (40L, "a fresh singleton about entirely novel material today"),
  ).toDF("doc_id", "text")

  private def labelMap(st: DedupState): Map[Long, (Long, Long)] =
    IncrementalDedup.labelsWithSizes(st).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("bridge doc merges two old clusters and its id becomes the min label") {
    val st = IncrementalDedup.admitBatch(
      IncrementalDedup.initialState(oldDocs), newBatch)
    val out = labelMap(st)
    assert(out.keySet == Set(1L, 10L, 11L, 20L, 21L, 30L, 40L))
    for (id <- Seq(1L, 10L, 11L, 20L, 21L))
      assert(out(id) == (1L, 5L), s"doc $id: ${out(id)}")
    assert(out(30L) == (30L, 1L))
    assert(out(40L) == (40L, 1L))
  }

  test("incremental result equals a from-scratch recompute on old ∪ new") {
    val inc = labelMap(IncrementalDedup.admitBatch(
      IncrementalDedup.initialState(oldDocs), newBatch))
    val full = Dedup.duplicateClusters(oldDocs.union(newBatch)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(inc == full)
  }

  test("admitBatch runs from persisted state with day-1 text DELETED") {
    val dir = java.nio.file.Files.createTempDirectory("inc_dedup").toString
    oldDocs.write.parquet(s"$dir/day1_docs")
    val day1 = spark.read.parquet(s"$dir/day1_docs")
    val st0 = IncrementalDedup.initialState(day1)
    st0.labels.write.parquet(s"$dir/labels")
    st0.sizes.write.parquet(s"$dir/sizes")
    st0.bands.write.parquet(s"$dir/bands")
    st0.shingles.write.parquet(s"$dir/shingles")
    // the structural claim: day-2 admission depends ONLY on the persisted
    // state — delete the day-1 corpus and the result is still correct.
    Dedup.clearShingleCaches() // drop in-memory intermediates keyed on day1
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$dir/day1_docs"))
    val st = IncrementalDedup.admitBatch(
      DedupState(
        labels = spark.read.parquet(s"$dir/labels"),
        sizes = spark.read.parquet(s"$dir/sizes"),
        bands = spark.read.parquet(s"$dir/bands"),
        shingles = spark.read.parquet(s"$dir/shingles")),
      newBatch)
    val out = labelMap(st)
    assert(out(1L) == (1L, 5L) && out(10L) == (1L, 5L) && out(21L) == (1L, 5L))
    assert(out(30L) == (30L, 1L) && out(40L) == (40L, 1L))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("admitBatch never shuffles the corpus-sized labels relation") {
    // The frontier-only scale claim, pinned on the physical plan: `labels`
    // (two longs per corpus doc — the big persisted relation) must only
    // ever flow through map-side operators (scan → broadcast joins);
    // `sizes` may feed ONE aggregation shuffle, but only AFTER the inner
    // broadcast join with the frontier-sized remap has filtered it.
    // AQE off so the static plan (with its explicit broadcast() pins) is
    // what's inspected.
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val dir = java.nio.file.Files.createTempDirectory("inc_dedup_plan").toString
    val st0 = IncrementalDedup.initialState(oldDocs)
    st0.labels.write.parquet(s"$dir/labels")
    st0.sizes.write.parquet(s"$dir/sizes")
    st0.bands.write.parquet(s"$dir/bands")
    st0.shingles.write.parquet(s"$dir/shingles")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val st = IncrementalDedup.admitBatch(
        DedupState(
          labels = spark.read.parquet(s"$dir/labels"),
          sizes = spark.read.parquet(s"$dir/sizes"),
          bands = spark.read.parquet(s"$dir/bands"),
          shingles = spark.read.parquet(s"$dir/shingles")),
        newBatch)
      def scansOf(p: org.apache.spark.sql.execution.SparkPlan, name: String) =
        p.collect { case f: FileSourceScanExec => f }
          .filter(_.metadata.get("Location").exists(_.contains(s"/$name")))
      val labelsPlan = st.labels.queryExecution.executedPlan
      assert(scansOf(labelsPlan, "labels").nonEmpty, s"no labels scan?\n$labelsPlan")
      val labelShuffles = labelsPlan.collect {
        case e: ShuffleExchangeExec if scansOf(e.child, "labels").nonEmpty => e
      }
      assert(labelShuffles.isEmpty,
        s"labels relation crosses a shuffle:\n$labelsPlan")
      val sizesPlan = st.sizes.queryExecution.executedPlan
      val sizeShuffles = sizesPlan.collect {
        case e: ShuffleExchangeExec if scansOf(e.child, "sizes").nonEmpty => e
      }
      sizeShuffles.foreach { e =>
        val guarded = e.child.collect {
          case b: BroadcastHashJoinExec if scansOf(b, "sizes").nonEmpty => b
        }
        assert(guarded.nonEmpty,
          s"sizes reaches a shuffle un-filtered by the remap broadcast join:\n$sizesPlan")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("batch with no near-dups leaves old clusters untouched, adds singletons") {
    val lone = Seq(
      (50L, "completely fresh words never seen in any older document"),
      (51L, "yet more vocabulary disjoint from everything else entirely"),
    ).toDF("doc_id", "text")
    val st = IncrementalDedup.admitBatch(
      IncrementalDedup.initialState(oldDocs), lone)
    val out = labelMap(st)
    assert(out(10L) == (10L, 2L) && out(11L) == (10L, 2L))
    assert(out(20L) == (20L, 2L) && out(21L) == (20L, 2L))
    assert(out(50L) == (50L, 1L) && out(51L) == (51L, 1L))
  }

  test("sizes maintained incrementally equal a direct count over the labels") {
    val st = IncrementalDedup.admitBatch(
      IncrementalDedup.initialState(oldDocs), newBatch)
    val direct = st.labels.groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val maintained = st.sizes.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(maintained == direct)
  }

  test("second-day state admits a third day (chained incrementality)") {
    val day3 = Seq((2L, w(0 until 8))).toDF("doc_id", "text") // dup of 10/11
    val st2 = IncrementalDedup.admitBatch(
      IncrementalDedup.admitBatch(IncrementalDedup.initialState(oldDocs), newBatch),
      day3)
    val out = labelMap(st2)
    // doc 2 joins the already-merged cluster 1; size grows to 6
    for (id <- Seq(1L, 2L, 10L, 11L, 20L, 21L)) assert(out(id) == (1L, 6L))
    val full = Dedup.duplicateClusters(
      oldDocs.union(newBatch).union(day3)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == full)
  }

  test("endpoint rep lookup streams labels through a broadcast join — no shuffle") {
    // the admission-time contraction's labels access: a frontier-left-
    // join-labels formulation would shuffle the corpus-sized relation on
    // doc_id every day (left-outer can only broadcast its build side);
    // repLookup must plan as ONE BroadcastHashJoin with labels streaming
    // and zero exchanges
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val dir = java.nio.file.Files.createTempDirectory("rep_lookup").toString
    (0L until 200L).map(i => (i, i % 7)).toDF("doc_id", "cluster_id")
      .write.parquet(s"$dir/labels")
    val labels = spark.read.parquet(s"$dir/labels")
    val endpoints = Seq(3L, 11L, 42L).toDF("doc_id")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val looked = IncrementalDedup.repLookup(labels, endpoints)
      val plan = looked.queryExecution.executedPlan
      assert(plan.collect { case b: BroadcastHashJoinExec => b }.nonEmpty,
        s"rep lookup is not a broadcast join:\n$plan")
      assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"rep lookup shuffles:\n$plan")
      assert(looked.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
        Map(3L -> 3L, 11L -> 4L, 42L -> 0L))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("bandBucketLocal agrees with the bandBucket column expression") {
    // the fused band-probe take computes touched buckets driver-side by
    // evaluating the same Catalyst expression; divergence would prune
    // the wrong BAND buckets and silently lose candidates
    val rows = Seq((0L, "d41d8cd98f00b204e9800998ecf8427e"),
      (1L, "0cc175b9c0f1b6a831c399e269772661"),
      (3L, ""), (Long.MaxValue, "zz"), (-7L, "abc"))
    for (n <- Seq(8, 32)) {
      val fromExpr = rows.toDF("band", "band_hash")
        .select(col("band"), col("band_hash"),
          IncrementalDedup.bandBucket(col("band"), col("band_hash"), n).as("b"))
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getInt(2)).toMap
      rows.foreach { case (band, h) =>
        assert(IncrementalDedup.bandBucketLocal(band, h, n) ==
          fromExpr((band, h)),
          s"bandBucketLocal($band, $h, $n) diverged from the column expression")
      }
    }
  }

  test("probe routing modes are row-identical (auto ≡ pruned ≡ full)") {
    // adaptive routing may only ever change the READ plan, never the
    // result — pin all three modes against each other on a persisted
    // bucketed state (the only shape where routing has any effect)
    import graft.operators.IncrementalDedup.{ProbeAuto, ProbeFull, ProbePruned}
    val root = java.nio.file.Files.createTempDirectory("probe_route").toString
    oldDocs.write.parquet(s"$root/docs/day1")
    graft.streaming.DedupStream.admitNewDrops(
      spark, s"$root/docs/*", s"$root/state", s"$root/ckpt")
    Dedup.clearShingleCaches()
    val st = graft.streaming.DedupStream.loadState(spark, s"$root/state").get
    assert(st.buckets.isDefined)
    val outs = Seq(ProbeAuto, ProbePruned, ProbeFull).map { m =>
      Dedup.clearShingleCaches()
      labelMap(IncrementalDedup.admitBatch(st, newBatch, probeMode = m))
    }
    assert(outs(0) == outs(1) && outs(1) == outs(2),
      s"probe modes diverged: $outs")
    assert(outs(0)(1L) == (1L, 5L)) // the bridge-merge still happens
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("docBucketLocal agrees with the docBucket column expression") {
    // the zero-job endpoint-bucket computation replicates Spark's
    // xxhash64(long) + pmod driver-side; any divergence would silently
    // prune the WRONG shingle buckets — pin exact agreement across
    // sign/extreme ids and both layout sizes in play
    val ids = (-5L to 5L) ++ Seq(Long.MaxValue, Long.MinValue,
      Long.MaxValue - 1, 1234567890123L, -987654321L)
    for (n <- Seq(32, 64)) {
      val fromExpr = ids.toDF("id")
        .select(col("id"), IncrementalDedup.docBucket(col("id"), n).as("b"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      ids.foreach { id =>
        assert(IncrementalDedup.docBucketLocal(id, n) == fromExpr(id),
          s"docBucketLocal($id, $n) diverged from the column expression")
      }
    }
  }
}
