package graft.engine

import java.time.{Duration, Instant, LocalDate, ZoneId, ZoneOffset}

/** Scheduled-cadence runner — the reference's EventBridge rule
  * (`cron(0 10 ? * MON-FRI *)`, CDK/cdk/cdk_stack.py:50-53) expressed as
  * a driver loop. The clock and sleeper are injectable so tests drive it
  * with fake time; production uses the defaults and simply blocks the
  * scheduling thread between fires (the JVM-local analog of the
  * EventBridge trigger — a real deployment hands the same `job` to cron/
  * Airflow/EventBridge and this class becomes unnecessary, which is why
  * it stays ~40 lines).
  *
  * @param clock   source of "now"
  * @param sleeper blocks for the given duration (fake-time tests advance
  *                their clock here instead)
  * @param zone    the schedule's civil timezone (reference: UTC)
  */
final class Scheduler(
    clock: () => Instant = () => Instant.now(),
    sleeper: Duration => Unit = d => Thread.sleep(d.toMillis),
    zone: ZoneId = ZoneOffset.UTC) {

  private def isWeekend(d: LocalDate): Boolean = {
    val dow = d.getDayOfWeek
    dow == java.time.DayOfWeek.SATURDAY || dow == java.time.DayOfWeek.SUNDAY
  }

  /** First weekday instant at `hour`:00 strictly after `now` —
    * MON-FRI-only, matching the reference cron. */
  def nextFire(now: Instant, hour: Int): Instant = {
    var d = now.atZone(zone).toLocalDate
    if (!d.atTime(hour, 0).atZone(zone).toInstant.isAfter(now)) d = d.plusDays(1)
    while (isWeekend(d)) d = d.plusDays(1)
    d.atTime(hour, 0).atZone(zone).toInstant
  }

  /** Fire `job(fireDate)` at the next `times` weekday-`hour` ticks. A
    * job that throws aborts the schedule: per-day laxity belongs in the
    * job (e.g. [[graft.sources.Ingest.fetchRecentHttp]]'s skip-the-day
    * contract), not the clock loop. */
  def runDaily(times: Int, hour: Int = 10)(job: LocalDate => Unit): Unit =
    (1 to times).foreach { _ =>
      val now = clock()
      val at = nextFire(now, hour)
      sleeper(Duration.between(now, at))
      job(at.atZone(zone).toLocalDate)
    }
}
