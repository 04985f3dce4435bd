package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, IncrementalDedup}
import graft.streaming.DedupStream
import java.nio.file.Files

/** Streaming admission of daily document drops into the persisted dedup
  * state: file-drop bookkeeping (checkpoint bookmark), versioned state
  * commits, and batch≡streaming equivalence. Fixture words mirror
  * IncrementalDedupSpec's searched seed (bridge doc merges two old
  * clusters at the j=0.5 threshold with verified band collisions). */
class DedupStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def w(is: Range): String = is.map(i => s"w23_$i").mkString(" ")

  def day1 = Seq(
    (10L, w(0 until 8)), (11L, w(0 until 8)),
    (20L, w(4 until 12)), (21L, w(4 until 12)),
    (30L, "an unrelated old singleton document about nothing shared"),
  ).toDF("doc_id", "text")
  def day2 = Seq(
    (1L, w(2 until 10)), // bridges clusters {10,11} and {20,21}; new min
    (40L, "a fresh singleton about entirely novel material today"),
  ).toDF("doc_id", "text")

  test("daily drops stream into versioned state; equals batch recompute") {
    val root = Files.createTempDirectory("dedup_stream").toString
    val (docs, state, ckpt) = (s"$root/docs", s"$root/state", s"$root/ckpt")

    // day 1: bootstrap commit (v0)
    day1.write.parquet(s"$docs/day1")
    DedupStream.admitNewDrops(spark, s"$docs/*", state, ckpt)
    val v0 = DedupStream.loadState(spark, state).get
    assert(IncrementalDedup.labelsWithSizes(v0).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap ==
      Map(10L -> (10L, 2L), 11L -> (10L, 2L), 20L -> (20L, 2L),
        21L -> (20L, 2L), 30L -> (30L, 1L)))

    // day 2 drop: only the NEW file is processed (bookmark), the bridge
    // doc merges both old clusters, and the streamed state equals a
    // from-scratch batch recompute over day1 ∪ day2
    day2.write.parquet(s"$docs/day2")
    DedupStream.admitNewDrops(spark, s"$docs/*", state, ckpt)
    val v1 = DedupStream.loadState(spark, state).get
    val streamed = IncrementalDedup.labelsWithSizes(v1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = Dedup.duplicateClusters(day1.union(day2)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed == batch)
    assert(streamed(1L) == (1L, 5L) && streamed(21L) == (1L, 5L))

    // no new drops: AvailableNow drains without a commit
    val before = Files.readString(java.nio.file.Paths.get(state, "CURRENT"))
    DedupStream.admitNewDrops(spark, s"$docs/*", state, ckpt)
    assert(Files.readString(java.nio.file.Paths.get(state, "CURRENT")) == before,
      "an empty run must not publish a new state version")

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("10 chained daily admissions: bounded lineage, equals batch recompute") {
    // The compounding hazard of incremental state: if day N's state were a
    // DataFrame chained over day N-1's (unions on unions), plan size would
    // grow with the day count and day-10 admission would replay the whole
    // history. The persisted-state path must instead reload committed
    // parquet each day — plan size CONSTANT in the day index — and still
    // equal a from-scratch batch recompute over all 10 days.
    val root = Files.createTempDirectory("dedup_chain").toString
    val (docs, state, ckpt) = (s"$root/docs", s"$root/state", s"$root/ckpt")
    // day d brings one duplicate of the day-0 doc (guaranteed band
    // collision + jaccard 1.0 — every day merges into the same growing
    // cluster through the full LSH+verify path) plus one singleton
    def dayDocs(d: Int) = Seq(
      (d * 10L, w(0 until 8)),
      (d * 10L + 1, s"standalone document for day $d with unshared words")
    ).toDF("doc_id", "text")
    val planSizes = (0 until 10).map { d =>
      dayDocs(d).write.parquet(s"$docs/day$d")
      DedupStream.admitNewDrops(spark, s"$docs/*", state, ckpt)
      val st = DedupStream.loadState(spark, state).get
      st.labels.queryExecution.optimizedPlan.collect { case p => p }.size
    }
    assert(planSizes.distinct.size == 1,
      s"labels plan size grew across chained days: $planSizes")
    // the write-amplification hazard: bands/shingles are append-only, so
    // each day must commit ONE batch-sized log segment — flat in the day
    // index — rather than rewriting the O(corpus) relation (the old
    // scheme's day-9 write would be ~10x day-1's)
    def dirBytes(p: String): Long = {
      val d = new java.io.File(p)
      if (!d.isDirectory) 0L
      else org.apache.commons.io.FileUtils.sizeOfDirectory(d)
    }
    val segBytes = (0 until 10).map { d =>
      dirBytes(s"$state/bands/seg$d") + dirBytes(s"$state/shingles/seg$d") }
    assert(segBytes.forall(_ > 0), s"missing per-day log segment: $segBytes")
    assert(segBytes.max <= 3 * segBytes.min,
      s"per-day state write is not batch-sized: $segBytes")
    // labels/sizes version retention: only current + previous survive
    val vdirs = new java.io.File(state).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("v")).map(_.getName).toSet
    assert(vdirs == Set("v8", "v9"), s"stale versions not pruned: $vdirs")
    val streamed = IncrementalDedup.labelsWithSizes(
        DedupStream.loadState(spark, state).get).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = Dedup.duplicateClusters(
        (0 until 10).map(dayDocs).reduce(_ union _)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed == batch)
    // the rolling w-window chains day d to day d-1: all chained docs in
    // ONE cluster labeled by day 0's doc, built up over 10 separate admits
    assert(streamed(90L)._1 == 0L, s"chained merge broke: ${streamed(90L)}")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }
}
