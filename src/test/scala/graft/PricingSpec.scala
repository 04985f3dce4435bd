package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.PricingQueries
import graft.operators.Events

class PricingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.01"

  test("approximate aggregates land within documented error bounds of exact") {
    val approx = PricingQueries.approxAggregatesRaw(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), Seq(r.getDouble(2), r.getDouble(3)))).toMap
    val exact = PricingQueries.distinctCounts(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactQuantiles = graft.engine.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.5, 0.99))").as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    exact.foreach { case (flag, exactDistinct) =>
      val (approxDistinct, quantiles) = approx(flag)
      val err = math.abs(approxDistinct - exactDistinct).toDouble / exactDistinct
      assert(err < 0.1, s"$flag: approx=$approxDistinct exact=$exactDistinct err=$err")
      // sketch quantiles within 2% relative error of exact percentiles
      quantiles.zip(exactQuantiles(flag)).foreach { case (a, e) =>
        assert(math.abs(a - e) / e < 0.02, s"$flag quantile: approx=$a exact=$e")
      }
    }
  }

  test("q32 derivative pins every within-bound boolean TRUE at oracle scale") {
    // Same role as DedupSpec's q35 floor test: the oracle pins TRUE per
    // group; this fails first if a sketch ever drifts out of bound.
    val rows = PricingQueries.approxAggregates(spark, sf).collect()
    assert(rows.length == 3, s"expected 3 return flags, got ${rows.length}")
    rows.foreach { r =>
      Seq("parts_ok", "p50_ok", "p99_ok").foreach { c =>
        assert(r.getBoolean(r.fieldIndex(c)), s"${r.getString(0)}: $c is false")
      }
    }
  }

  test("q32 booleans survive tie mass at the percentile and tiny n") {
    // 96% of rows share ONE price. p50 lands on the tied value, whose
    // at-or-below rank fraction is ~1.0 — the old check
    // (|n_le/n - q| <= 0.005) read that as sketch error and flipped the
    // boolean; p99's target rank (198) falls in the 8-row distinct tail,
    // so it exercises rank granularity at tiny n (1/n steps against the
    // 2/n bound), not tie mass. The rank-RANGE check (strict-below vs
    // at-or-below bracketing the target, bound widened to
    // greatest(0.005, 2/n)) certifies only sketch error in both regimes.
    import spark.implicits._
    val dir = "target/pricingspec-ties"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    (1 to 200).map { i =>
      val price = if (i <= 192) 100.0 else 100.0 + i // 96% tied at 100.0
      ("T", i.toLong, price)
    }.toDF("l_returnflag", "l_partkey", "l_extendedprice")
      .write.parquet(s"$dir/lineitem.parquet")
    try {
      val rows = PricingQueries.approxAggregates(spark, dir).collect()
      assert(rows.length == 1)
      Seq("parts_ok", "p50_ok", "p99_ok").foreach { c =>
        assert(rows(0).getBoolean(rows(0).fieldIndex(c)), s"$c is false on ties")
      }
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(dir))
  }

  test("bucketed range join equals the direct range predicate") {
    val events = graft.engine.Tables.events(spark, "/root/testdata/sf0.001")
    val got = Events.rangeJoinPriorCount(events).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // direct O(n^2) formulation as ground truth at tiny scale
    val e1 = events.select(col("event_id").as("id1"), col("ts").as("t1"))
    val e2 = events.select(col("event_id").as("id2"), col("ts").as("t2"))
    val direct = e1.join(e2,
        col("t2") > col("t1") - expr("INTERVAL 60 SECONDS") &&
          col("t2") <= col("t1") && col("id2") =!= col("id1"), "left")
      .groupBy("id1").agg(count(col("id2")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == direct)
    assert(got.values.sum > 0, "some events have prior neighbors")
    // NULL-ts rows must surface with n_prior = 0 (the v1 join's
    // NULL-propagating predicate semantics), not crash the kernel
    val spark0 = spark
    import spark0.implicits._
    val withNull = events.select(col("event_id"), col("ts"))
      .unionByName(Seq((999999L, None: Option[java.sql.Timestamp]))
        .toDF("event_id", "ts"))
    val n = Events.rangeJoinPriorCount(withNull).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n(999999L) == 0L, "a NULL-ts event must emit n_prior = 0")
    assert(n.size == got.size + 1)
    // NULL-ID rows collapse to ONE output group (v1's groupBy(event_id)
    // and the oracle's GROUP BY semantics treat all NULL ids as equal),
    // not one row per input
    val withNullIds = events.select(col("event_id"), col("ts"))
      .unionByName(Seq(
        (None: Option[Long], Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))),
        (None: Option[Long], Some(java.sql.Timestamp.valueOf("2024-01-02 00:00:00"))))
        .toDF("event_id", "ts"))
    val nid = Events.rangeJoinPriorCount(withNullIds).collect()
    val nullIdRows = nid.filter(_.isNullAt(0))
    assert(nullIdRows.length == 1,
      "two NULL-id events must collapse to a single NULL-id output group")
    assert(nullIdRows.head.getLong(1) == 0L)
    assert(nid.length == got.size + 1)
  }

  test("HLL column profile lands within 10% of the exact profile") {
    val exact = graft.operators.Profile.qProfile(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    val approx = graft.operators.Profile.profile(
      graft.engine.Tables.orders(spark, "/root/testdata/sf0.001")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderpriority"))
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    exact.foreach { case (c, ex) =>
      val ap = approx(c)
      assert(math.abs(ap - ex) <= math.max(2L, (ex * 0.10).toLong),
        s"$c: approx=$ap exact=$ex")
    }
  }
}
