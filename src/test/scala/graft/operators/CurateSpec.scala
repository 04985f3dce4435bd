package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Corpus, SubstringDedup, TextAnalysis}

/** The composed curation ladder (q94): dispositions partition the
  * input, every rung fires, and each family's planted fixture lands in
  * its expected bucket. */
class CurateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("q94: dispositions partition the input; planted fixtures land per rung") {
    val out = Corpus.qCurate(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) null else r.getString(3),
          if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val nInput = docs.count() + TextAnalysis.FoldedDedupFixture.size +
      SubstringDedup.ContaminatedTrainFixture.size
    // exactly one disposition per input doc (the partition property)
    assert(out.size == nInput, s"${out.size} rows for $nInput input docs")
    // fold rung: the planted trio and pair roll up to their min ids
    assert(out(4700001L)._1 == "fold_dup" && out(4700001L)._2 == 4700000L)
    assert(out(4700002L)._1 == "fold_dup" && out(4700002L)._2 == 4700000L)
    assert(out(4700011L)._1 == "fold_dup" && out(4700011L)._2 == 4700010L)
    // decon rung: the 10-token quote and the full copy flag; the
    // 7-token near-miss (k-1) must NOT
    assert(out(4200000L)._1 == "contaminated")
    assert(out(4200002L)._1 == "contaminated")
    assert(out(4200001L)._1 != "contaminated",
      s"k-1 near-miss must pass decon, got ${out(4200001L)._1}")
    // every rung fires on this corpus, and the ladder is monotone (each
    // count is a drop from the previous rung's survivors, so a positive
    // count at every rung implies strict shrinkage end to end)
    val counts = out.values.groupBy(_._1).view.mapValues(_.size).toMap
    for (d <- Seq("fold_dup", "near_dup", "contaminated", "low_quality",
        "over_budget", "kept"))
      assert(counts.getOrElse(d, 0) > 0, s"rung $d dropped/kept nothing")
    // split/shard present iff kept, and shard within range
    out.values.foreach { case (d, _, split, shard) =>
      if (d == "kept") {
        assert(Set("train", "val", "test")(split))
        assert(shard >= 0 && shard < Corpus.CurateShards)
      } else assert(split == null && shard == -1L, s"$d must not carry split")
    }
    // dup_of only on the dedup rungs, and always an earlier-or-equal id
    out.foreach { case (id, (d, dupOf, _, _)) =>
      if (d == "fold_dup" || d == "near_dup")
        assert(dupOf >= 0 && dupOf < id, s"$d dup_of $dupOf for $id")
      else assert(dupOf == -1L)
    }
  }
}
