package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.HeavyHitters

/** CMS heavy hitters (q88): hash-twin agreement, CMS completeness
  * (every true heavy gram surfaces), exact-count fidelity of the fused
  * verify, and the structural never-undercount bound. */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bucketLocal agrees with the bucketCol column expression") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val grams = Seq("the quick fox", "a b c", "", "bp01 bp02 bp03",
      "x y z").toDF("gram")
    (0 until HeavyHitters.CmsDepth).foreach { d =>
      val fromCol = grams.select(col("gram"),
          HeavyHitters.bucketCol(d, col("gram")))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      fromCol.foreach { case (g, b) =>
        assert(HeavyHitters.bucketLocal(d, g, HeavyHitters.CmsWidth, md)
          == b, s"divergence at row $d gram '$g'")
      }
    }
  }

  test("persisted sketch: chained admissions' grid == one-shot grid cell for cell; append segment is O(grid)") {
    import graft.operators.VersionedIndex
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
      .unionByName(HeavyHitters.BoilerplateFixture.toDF("doc_id", "text"))
    val root = java.nio.file.Files.createTempDirectory("graft-cmsinc").toString
    try {
      def day(i: Int) = docs.filter(pmod(col("doc_id"), lit(3)) === i)
      HeavyHitters.bootstrapSketch(spark, s"$root/state", day(0))
      HeavyHitters.admitDrop(spark, s"$root/state", day(1),
        maxLiveSegments = 2) // append
      // O(grid) writes: the appended segment is bounded by the grid,
      // never the corpus or the distinct-gram space
      val segRows = spark.read.parquet(s"$root/state/cells/seg=1").count()
      assert(segRows <= HeavyHitters.CmsDepth.toLong * HeavyHitters.CmsWidth,
        s"append segment $segRows rows exceeds the grid bound")
      HeavyHitters.admitDrop(spark, s"$root/state", day(2),
        maxLiveSegments = 2) // fold
      val m = VersionedIndex.metaOrThrow(s"$root/state")
      assert(m.segs == Vector(2L), s"fold did not collapse segs: ${m.segs}")
      val chained = HeavyHitters.loadGrid(spark, s"$root/state")
      // linearity: the chained grid equals a one-shot build over the
      // union, cell for cell (exact, not approximate)
      val oneShot = graft.operators.HeavyHittersSpecAccess.oneShotGrid(docs)
      (0 until HeavyHitters.CmsDepth).foreach { d =>
        assert(chained(d).sameElements(oneShot(d)),
          s"grid row $d diverged from the one-shot sketch")
      }
      // the manifest's mass equals the one-shot stream mass
      assert(m.totalRows == oneShot(0).sum,
        s"manifest mass ${m.totalRows} != stream mass ${oneShot(0).sum}")
    } finally {
      try org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(root))
      catch { case _: Exception => }
    }
  }

  test("completeness + exact verify: every true heavy gram surfaces with its exact count; cms never undercounts") {
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
      .unionByName(HeavyHitters.BoilerplateFixture.toDF("doc_id", "text"))
    val got = HeavyHitters.heavyGrams(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    // ground truth the slow way (test scale only): exact counts of all
    // grams, threshold replayed from the constants
    val exact = docs.select(explode(
        graft.functions.TextFns.shingles(col("text"), HeavyHitters.GramN))
        .as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val threshold =
      math.max(HeavyHitters.MinSupport, n / HeavyHitters.SupportDivisor)
    val trueHeavy = exact.filter(_._2 >= threshold)
    // the three planted boilerplate grams ARE the heavy set here
    assert(trueHeavy.keySet == Set("bp01 bp02 bp03", "bp02 bp03 bp04",
      "bp03 bp04 bp05"), s"unexpected ground truth: ${trueHeavy.keySet}")
    // CMS completeness: estimate >= count, so every true hitter is a
    // candidate — and the fused verify reports its exact count
    trueHeavy.foreach { case (g, c) =>
      assert(got.contains(g), s"true heavy gram '$g' missing")
      val (cms, ex, _) = got(g)
      assert(ex == c, s"'$g' exact $ex != ground truth $c")
      assert(cms >= ex, s"'$g' cms $cms undercounts exact $ex")
    }
    // structural bound on EVERY emitted row (false positives included):
    // cms >= exact always; and each candidate's exact matches truth
    got.foreach { case (g, (cms, ex, _)) =>
      assert(cms >= ex, s"'$g' cms $cms < exact $ex — broken sketch")
      assert(exact(g) == ex, s"'$g' fused verify count diverged")
      assert(cms >= threshold, s"'$g' emitted under threshold")
    }
  }
}
