package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Pipeline, Scheduler}
import java.nio.file.{Files, Paths}
import java.time.{Duration, Instant}

/** Fake-clock tests for the weekday-cadence runner (reference:
  * EventBridge `cron(0 10 ? * MON-FRI *)`). */
class SchedulerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** A clock that only moves when the scheduler sleeps. */
  private class FakeTime(start: String) {
    var now: Instant = Instant.parse(start)
    val scheduler = new Scheduler(
      clock = () => now,
      sleeper = d => { assert(!d.isNegative); now = now.plus(d) })
  }

  test("nextFire picks the coming weekday 10:00, never a weekend") {
    val s = new FakeTime("2021-07-01T09:00:00Z").scheduler // Thursday, pre-10
    assert(s.nextFire(Instant.parse("2021-07-01T09:00:00Z"), 10) ==
      Instant.parse("2021-07-01T10:00:00Z"), "same day when before the hour")
    assert(s.nextFire(Instant.parse("2021-07-01T10:00:00Z"), 10) ==
      Instant.parse("2021-07-02T10:00:00Z"), "strictly after: at 10:00 rolls to Friday")
    assert(s.nextFire(Instant.parse("2021-07-02T11:00:00Z"), 10) ==
      Instant.parse("2021-07-05T10:00:00Z"), "Friday post-hour rolls over the weekend")
    assert(s.nextFire(Instant.parse("2021-07-03T01:00:00Z"), 10) ==
      Instant.parse("2021-07-05T10:00:00Z"), "Saturday rolls to Monday")
  }

  test("runDaily fires once per weekday at the hour, in order") {
    val t = new FakeTime("2021-07-01T12:00:00Z") // Thursday afternoon
    val fired = scala.collection.mutable.ArrayBuffer.empty[String]
    t.scheduler.runDaily(times = 4) { d => fired += d.toString }
    // Fri, Mon, Tue, Wed — weekend skipped, one tick per day
    assert(fired.toSeq == Seq("2021-07-02", "2021-07-05", "2021-07-06", "2021-07-07"))
    assert(t.now == Instant.parse("2021-07-07T10:00:00Z"))
  }

  test("scheduled HTTP pipeline lands one dated file per tick; bad day skips") {
    val root = Files.createTempDirectory("graft-sched").toString
    val dirs = Pipeline.Dirs(s"$root/input", s"$root/processed", s"$root/checkpoint")
    val header = graft.sources.Ingest.crimeSchemaDdl
      .split(",").map(_.trim.split(" ")(0)).mkString(",")
    // one row per scheduled day, keyed by updated_on = fire date
    val rows = Seq(
      SoqlTestServer.Row("2021-07-05 01:00:00",
        "5,JE5,07/04/2021 09:00:00 PM,THEFT,OVER $500,false,false,25,2021,2021-07-05 01:00:00,41.88,-87.63"),
      SoqlTestServer.Row("2021-07-06 01:00:00",
        "6,JE6,07/05/2021 09:00:00 PM,ASSAULT,AGGRAVATED,true,false,7,2021,2021-07-06 01:00:00,41.88,-87.63"),
    )
    SoqlTestServer.withInstrumentedServer(header, rows) { (url, log) =>
      val t = new FakeTime("2021-07-04T12:00:00Z") // Sunday
      // tick 1 = Monday 07-05 (serves row 5 + row 6's later timestamp is
      // also > since — both land; dedup-free append is reference parity),
      // tick 2 = Tuesday 07-06 (row 6 refetched: updated_on > 07-05)
      Pipeline.runHttpScheduled(spark, url, dirs, t.scheduler, times = 2)
      assert(Files.exists(Paths.get(dirs.landing, "recent_source_data_2021-07-05.csv")))
      assert(Files.exists(Paths.get(dirs.landing, "recent_source_data_2021-07-06.csv")))
      assert(log.requests.exists(_.contains("updated_on > '2021-07-04'")))
      assert(log.requests.exists(_.contains("updated_on > '2021-07-05'")))
      // tick2's since '2021-07-05' re-fetches BOTH rows: the timestamps
      // compare as strings and '2021-07-05 01:00:00' > '2021-07-05' —
      // exactly the reference's late-update duplicate behavior (hazard 7)
      assert(spark.read.parquet(dirs.processed).count() == 4,
        "tick1: rows 5+6; tick2: both again (no dedup)")

      // a 500-day: the fetch skips, the schedule keeps going, nothing new lands
      log.failNext(100)
      Pipeline.runHttpScheduled(spark, url, dirs, t.scheduler, times = 1)
      assert(t.now == Instant.parse("2021-07-07T10:00:00Z"), "Wednesday still fired")
      assert(spark.read.parquet(dirs.processed).count() == 4, "failed day landed nothing")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }
}
