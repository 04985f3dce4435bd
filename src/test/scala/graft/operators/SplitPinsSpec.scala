package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{IncrementalDedup, SplitPins}

/** The pinned leakage-safe split store (q93): a document's split is
  * written once and never moves; merges inherit the OLDEST pin.
  * Reuses IncrementalDedupSpec's searched fixture (the bridge's LSH
  * bands verifiably collide with both old clusters), whose cluster
  * labels land on opposite sides of the nibble rule by construction:
  * md5("10") starts 'd' → val, md5("20") starts '9' → train. */
class SplitPinsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def w(is: Range): String = is.map(i => s"w23_$i").mkString(" ")

  def oldDocs = Seq(
    (10L, w(0 until 8)), (11L, w(0 until 8)),
    (20L, w(4 until 12)), (21L, w(4 until 12)),
    (30L, "an unrelated old singleton document about nothing shared"),
  ).toDF("doc_id", "text")

  def newBatch = Seq(
    (1L, w(2 until 10)), // bridges clusters 10 (val) and 20 (train)
    (40L, "a fresh singleton about entirely novel material today"),
  ).toDF("doc_id", "text")

  private def splitsMap(dir: String): Map[Long, (String, Long)] =
    SplitPins.loadSplits(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

  test("bridge merge moves ZERO docs; new docs inherit the oldest pin") {
    val root = java.nio.file.Files.createTempDirectory("pins1").toString
    val dir = s"$root/state"
    val st = IncrementalDedup.initialState(oldDocs)
    SplitPins.bootstrapStore(spark, dir, st.labels)
    val before = splitsMap(dir)
    // the q91 rule at day 0: cluster 10 → val, cluster 20 → train,
    // singleton 30 → train (md5("30") starts '3')
    assert(before == Map(
      10L -> ("val", 0L), 11L -> ("val", 0L),
      20L -> ("train", 0L), 21L -> ("train", 0L), 30L -> ("train", 0L)))
    // day 2: doc 1 merges clusters 10 and 20 under new label 1 — q91
    // would re-nibble the merged cluster id and MOVE four documents;
    // the pin store must move none
    val d = IncrementalDedup.admitBatchDelta(st, newBatch)
    SplitPins.admitDelta(spark, dir, d.newAssign, d.remap)
    d.release()
    val after = splitsMap(dir)
    before.foreach { case (id, v) =>
      assert(after(id) == v, s"doc $id moved: ${before(id)} -> ${after(id)}")
    }
    // the bridge doc inherits the merged cluster's OLDEST pin — both
    // pins are seq 0, so the tiebreak is min pin_src = cluster 10 → val
    // (NOT the re-nibbled merged label: md5("1") starts 'c' → val too,
    // so also pin the pin TABLE to rule out the coincidence)
    assert(after(1L) == ("val", 1L))
    // the fresh singleton gets its own nibble: md5("40") starts 'd'
    assert(after(40L) == ("val", 1L))
    val pins = SplitPins.loadPins(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // merged cluster 1 carries BOTH re-keyed seq-0 pins (effective =
    // min pin_src → val from src 10), plus the fresh pin for 40
    assert(pins.toSet.filter(_._1 == 1L) ==
      Set((1L, "val", 0L, 10L), (1L, "train", 0L, 20L)))
    assert(pins.exists(p => p == (40L, "val", 1L, 40L)))
    // O(batch) append: the admission's splits segment holds exactly the
    // batch's rows, not the corpus
    val segRows = spark.read.parquet(s"$dir/splits/seg=1").count()
    assert(segRows == 2, s"append segment must be batch-sized, got $segRows")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("oldest pin wins by seq before src; fold preserves effective pins") {
    val root = java.nio.file.Files.createTempDirectory("pins2").toString
    val dir = s"$root/state"
    // synthetic deltas drive the pin logic directly (the clustering
    // itself is IncrementalDedupSpec's subject). Bootstrap: cluster 100
    // = {100, 101}; md5("100") starts 'f' → test.
    SplitPins.bootstrapStore(spark, dir,
      Seq((100L, 100L), (101L, 100L)).toDF("doc_id", "cluster_id"))
    val emptyRemap = Seq.empty[(Long, Long)].toDF("cluster_id", "merged")
    // seq 1: fresh cluster 50 = {50, 51}; md5("50") starts 'c' → val
    SplitPins.admitDelta(spark, dir,
      Seq((50L, 50L), (51L, 50L)).toDF("doc_id", "cluster_id"), emptyRemap)
    // seq 2: doc 40 bridges clusters 100 and 50 → merged label 40.
    // Cluster 50's pin has the SMALLER src (50 < 100) but the LARGER
    // seq — the seq-0 pin must win: doc 40 → test, not val (and not
    // md5("40")'s own 'd' → val nibble either)
    SplitPins.admitDelta(spark, dir,
      Seq((40L, 40L)).toDF("doc_id", "cluster_id"),
      Seq((100L, 40L), (50L, 40L)).toDF("cluster_id", "merged"))
    val m = splitsMap(dir)
    assert(m(40L) == ("test", 2L),
      s"merge must inherit the seq-0 pin (test), got ${m(40L)}")
    assert(m(50L) == ("val", 1L) && m(100L) == ("test", 0L),
      "pinned docs must not move on merge")
    // seq 3 with maxLiveSegments = 1 forces a FOLD; a later joiner of
    // the merged cluster must still resolve the seq-0 pin through the
    // folded (min-reduced) pin log
    SplitPins.admitDelta(spark, dir,
      Seq((900L, 900L)).toDF("doc_id", "cluster_id"), emptyRemap,
      maxLiveSegments = 1)
    SplitPins.admitDelta(spark, dir,
      Seq((41L, 40L)).toDF("doc_id", "cluster_id"), emptyRemap,
      maxLiveSegments = 1)
    val m2 = splitsMap(dir)
    assert(m2(41L) == ("test", 4L),
      s"post-fold joiner must inherit the folded effective pin, got ${m2(41L)}")
    assert(m2(40L) == ("test", 2L) && m2(50L) == ("val", 1L),
      "fold must not rewrite pinned assignments")
    // the fold reduced cluster 40's two pin rows to the effective one
    val pins40 = SplitPins.loadPins(spark, dir).filter(col("cluster_id") === 40L)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(pins40 == Set(("test", 0L, 100L)),
      s"folded pin log must hold one effective row per key, got $pins40")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }
}
