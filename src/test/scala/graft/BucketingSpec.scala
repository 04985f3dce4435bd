package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bucketing

class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bucketed join plans with zero Exchange and matches unbucketed results") {
    val sf = "/root/testdata/sf0.001"
    // force a non-broadcast join so the exchange-free claim is about
    // bucket co-location, not about broadcasting a tiny table
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      runAssertions(sf)
    } finally {
      // restore even on assertion failure: the session is shared across
      // suites and a stuck -1 would silently change their join plans
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10 * 1024 * 1024)
    }
  }

  private def runAssertions(sf: String): Unit = {
    val joined = Bucketing.colocatedOrderJoin(spark, sf, buckets = 4)

    val plan = joined.queryExecution.executedPlan.toString
    // the co-located join itself must not shuffle either side; the final
    // small aggregation exchange is expected, so count shuffles upstream
    // of the join: the SortMergeJoin/ShuffledHashJoin node's children must
    // contain no Exchange.
    val joinIdx = plan.indexOf("Join")
    assert(joinIdx >= 0, s"join missing in plan:\n$plan")
    val afterJoin = plan.substring(joinIdx)
    assert(!afterJoin.contains("Exchange"),
      s"join inputs must be exchange-free (bucketed co-location):\n$plan")

    // result equality vs plain join
    val direct = graft.engine.Tables.lineitem(spark, sf)
      .join(graft.engine.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey", "o_orderstatus")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
    val a = joined.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val b = direct.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(a == b)
  }
}
