package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Events
import graft.streaming.EventStreams
import java.nio.file.Files

/** Streaming/batch parity: the Structured Streaming formulations must
  * produce the same results as their batch twins (SURVEY.md §2.9 — the
  * reference's micro-batch semantics under Trigger.AvailableNow). */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  /** Stage the fixture events as a micro-precision parquet dir (the
    * fixture file itself is nano-precision, which file streaming with an
    * explicit micro schema can't read). */
  lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("graft-events").toString
    graft.engine.Tables.events(spark, sf).write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming hourly windows == batch hourly windows") {
    val stream = EventStreams.hourlyWindows(EventStreams.readEvents(spark, eventsDir))
    val got = EventStreams.runAvailableNow(stream, "hw", "update")
      .select("window_start", "event_type", "n_events", "sum_value")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDecimal(3).toString)).toSet
    val want = Events.hourlyWindows(graft.engine.Tables.events(spark, sf))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        java.math.BigDecimal.valueOf(r.getDouble(3)).setScale(2).toString)).toSet
    assert(got == want)
  }

  test("stateful streaming sessionization == batch sessionization") {
    val evs = spark.read.parquet(eventsDir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventStreams.Ev]
    // batch Dataset through the same flatMapGroupsWithState logic
    val got = EventStreams.sessionizeStream(evs)
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"), min("ts").as("session_start"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getTimestamp(3))).toSet
    val want = Events.sessionize(graft.engine.Tables.events(spark, sf))
      .select("user_id", "session_id", "n_events", "session_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getTimestamp(3))).toSet
    assert(got == want)
  }

  test("as-of join: every event gets the user's latest prior order") {
    val out = Events.asOfJoinOrders(
      graft.engine.Tables.events(spark, sf),
      graft.engine.Tables.orders(spark, sf))
    val n = graft.engine.Tables.events(spark, sf).count()
    assert(out.count() == n) // left semantics: no event dropped
    // spot-check one user with orders: asof key must belong to that user
    val orders = graft.engine.Tables.orders(spark, sf)
      .select($"o_custkey", $"o_orderkey").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    out.filter($"asof_orderkey".isNotNull).limit(50).collect().foreach { r =>
      val uid = r.getLong(1); val key = r.getLong(4)
      assert(orders(uid).contains(key), s"order $key belongs to user $uid")
    }
  }
}
