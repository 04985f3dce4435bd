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

  test("stream-static enrichment == the equivalent batch broadcast join") {
    val customer = graft.engine.Tables.customer(spark, sf)
    val stream = EventStreams.enrichWithCustomer(
      EventStreams.readEvents(spark, eventsDir), customer)
    val got = EventStreams.runAvailableNow(stream, "enr", "append")
      .collect().map(r => (r.getLong(0), r.getString(5))).toSet
    val want = EventStreams.enrichWithCustomer(
      spark.read.parquet(eventsDir), customer)
      .collect().map(r => (r.getLong(0), r.getString(5))).toSet
    assert(got == want && got.nonEmpty)
    // decoration, not expansion: one output row per (matched) input event
    assert(got.size == spark.read.parquet(eventsDir)
      .join(customer, col("user_id") === col("c_custkey")).count())
  }

  test("streaming corpus gate == batch gate (stateless per-row operators)") {
    val docsDir = Files.createTempDirectory("graft-docs").toString
    val batchDocs = spark.read.parquet(s"$sf/documents.parquet")
    batchDocs.write.mode("overwrite").parquet(docsDir)
    val schema = batchDocs.schema
    val stream = graft.operators.Corpus.gateStream(
      spark.readStream.schema(schema).parquet(docsDir))
    val got = EventStreams.runAvailableNow(stream, "gate", "append")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("quality"))).toSet
    val want = graft.operators.Corpus.gateStream(batchDocs)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("quality"))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("watermark drops events later than 2 hours behind the max seen ts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, t: String, v: Double) =
      EventStreams.Ev(id, java.sql.Timestamp.valueOf(t), 1L, "click", v)

    val input = MemoryStream[EventStreams.Ev]
    val windows = EventStreams.hourlyWindows(
      input.toDF().withColumn("props", lit("{}")))
    val q = windows.writeStream.format("memory").queryName("wm")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // batch 1: establish watermark at 12:00 - 2h = 10:00
      input.addData(ev(1, "2024-01-01 09:30:00", 1.0), ev(2, "2024-01-01 12:00:00", 2.0))
      q.processAllAvailable()
      // batch 2: 09:45 is within the 09:00 window, behind the 10:00
      // watermark -> dropped; 13:00 advances and will close earlier windows
      input.addData(ev(3, "2024-01-01 09:45:00", 100.0), ev(4, "2024-01-01 15:00:00", 4.0))
      q.processAllAvailable()
      // batch 3: push watermark far ahead so all open windows emit
      input.addData(ev(5, "2024-01-02 00:00:00", 5.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("wm")
      .collect().map(r => r.getTimestamp(0).toString -> r.getLong(2)).toMap
    // the 09:00 window emitted with ONLY the on-time event — the late
    // 09:45 row (behind watermark) was discarded
    assert(rows("2024-01-01 09:00:00.0") == 1L)
    assert(rows("2024-01-01 12:00:00.0") == 1L)
  }

  test("streaming dedup drops re-delivered event ids within the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, t: String) =
      EventStreams.Ev(id, java.sql.Timestamp.valueOf(t), 1L, "click", 1.0)
    val input = MemoryStream[EventStreams.Ev]
    val deduped = EventStreams.dedupStream(
      input.toDF().withColumn("props", lit("{}")))
    val q = deduped.writeStream.format("memory").queryName("dedup")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:01:00"))
      q.processAllAvailable()
      // re-delivery of id 1 (the reference's late re-fetch) + a new id
      input.addData(ev(1, "2024-01-01 10:30:00"), ev(3, "2024-01-01 10:31:00"))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dedup").select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L), "id 1 emitted exactly once")
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
