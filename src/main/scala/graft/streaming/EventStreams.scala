package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import java.sql.Timestamp

/** Structured Streaming formulations of the event analytics: the reference
  * pipeline is micro-batch by construction (daily file drops + job
  * bookmarks, SURVEY.md §2.9) and these are its native Spark expression —
  * file source + checkpoint = bookmark, watermark bounds state, and
  * `Trigger.AvailableNow` reproduces "process everything new, then stop".
  *
  * Tests assert each streaming result equals its batch twin from
  * [[graft.operators.Events]] — the micro-batch/batch parity the engine
  * promises.
  */
object EventStreams {

  /** Open a file-source stream over a directory of event parquet files. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id bigint, ts timestamp, user_id bigint, event_type string, " +
        "value double, props string")
    spark.readStream.schema(schema).parquet(dir)
  }

  /** Tumbling 1-hour windowed counts/sums with a 2-hour watermark: the
    * streaming twin of Events.hourlyWindows. Late rows beyond the
    * watermark are dropped; state is bounded by (watermark / window) many
    * open windows per type. */
  def hourlyWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionState(sessionId: Long, lastTs: Long)
  case class SessionOut(user_id: Long, session_id: Long, event_id: Long,
      ts: Timestamp, value: Double)

  /** Stateful gap-sessionization via flatMapGroupsWithState — the
    * "custom state" extension point (KeyValueGroupedDataset) the reference
    * has no analog for. Each user's state is (current session id, last
    * event time); a gap > 30 min opens a new session. Emits each event
    * tagged with its session id (Append mode).
    *
    * Correct under AvailableNow because events arrive time-ordered per
    * micro-batch after a sort within the group iterator.
    */
  def sessionizeStream(events: Dataset[Ev],
      gapMinutes: Int = graft.operators.Events.SessionGapMinutes): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Ev], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
          val out = sorted.map { e =>
            val t = e.ts.getTime / 1000
            val isStart = st.lastTs == Long.MinValue || t - st.lastTs > gapMinutes * 60L
            st = SessionState(if (isStart) st.sessionId + 1 else st.sessionId, t)
            SessionOut(userId, st.sessionId, e.event_id, e.ts, e.value)
          }
          state.update(st)
          out.iterator
      }
  }

  /** Streaming exact dedup: drop events whose id was already seen, with
    * the watermark bounding how long ids are retained (late duplicates
    * beyond the watermark are dropped as late data rather than kept as
    * state forever — the standard bounded-state dedup at scale). The
    * reference pipeline's late `updated_on` re-fetches create exactly
    * these duplicates (SURVEY.md §4 hazard 7); parity mode keeps them,
    * this operator is the opt-in cleanup. */
  def dedupStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment: decorate the event stream with the static
    * customer dimension (events.user_id is a customer key, the same
    * convention as Events.asOfJoinOrders). Spark plans the static side as
    * a broadcast re-resolved per micro-batch, so dimension updates
    * between batches are picked up and the stream side never shuffles —
    * the standard pattern for decorating a 100 TB/day event firehose
    * with reference data. Stateless (inner join on a static side needs
    * no watermark). */
  def enrichWithCustomer(events: DataFrame, customer: DataFrame): DataFrame =
    events.join(
      broadcast(customer.select(col("c_custkey"), col("c_mktsegment"))),
      events("user_id") === col("c_custkey"), "inner")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("c_mktsegment"))

  /** Run a streaming DataFrame to completion over existing files
    * (Trigger.AvailableNow ≈ Glue job-bookmark run) into an in-memory
    * table; returns the result. Test/driver utility. */
  def runAvailableNow(df: DataFrame, name: String, outputMode: String = "update"): DataFrame = {
    val q = df.writeStream
      .format("memory").queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    df.sparkSession.table(name)
  }
}
