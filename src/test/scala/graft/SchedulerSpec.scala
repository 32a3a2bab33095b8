package graft

import java.time.{Duration, Instant, LocalDate}
import graft.ingest.Scheduler
import graft.ingest.Scheduler._
import org.scalatest.funsuite.AnyFunSuite

/** Fake-clock replay of the reference DAG's scheduling contract
  * (spotify_ingest.py:148-153): @daily at interval END, catchup=False,
  * retries=1 with a 5-minute delay, AirflowSkipException → skip (no
  * retry). No real sleeping — the sleeper records durations.
  */
class SchedulerSpec extends AnyFunSuite {

  private def at(s: String): Instant = Instant.parse(s)
  private def d(s: String): LocalDate = LocalDate.parse(s)

  test("@daily: the run for day D becomes due at midnight UTC of D+1") {
    // mid-day Jan 2: the latest COMPLETED day is Jan 1
    assert(dueRun(None, at("2025-01-02T12:00:00Z")) === Some(d("2025-01-01")))
    // Jan 1 already ran -> nothing due until Jan 3 00:00
    assert(dueRun(Some(d("2025-01-01")), at("2025-01-02T23:59:59Z")) === None)
    assert(dueRun(Some(d("2025-01-01")), at("2025-01-03T00:00:00Z"))
      === Some(d("2025-01-02")))
  }

  test("catchup=False: a multi-day gap schedules ONLY the most recent day") {
    // last ran for Jan 1; the box slept a week
    assert(dueRun(Some(d("2025-01-01")), at("2025-01-09T08:00:00Z"))
      === Some(d("2025-01-08")))
  }

  test("retries=1 after 5 minutes: first failure retries, second is terminal") {
    var calls = 0
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Duration]
    val rec = runWithRetry(d("2025-01-01"),
      _ => { calls += 1; throw new RuntimeException(s"boom $calls") },
      sleeps += _)
    assert(calls === 2)
    assert(sleeps.toSeq === Seq(Duration.ofMinutes(5)))
    assert(rec === RunRecord(d("2025-01-01"), 2, Failed("boom 2")))
  }

  test("a failure then a success consumes the single retry and succeeds") {
    var calls = 0
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Duration]
    val rec = runWithRetry(d("2025-01-01"),
      _ => { calls += 1; if (calls == 1) throw new RuntimeException("flaky")
             else Some("landed") },
      sleeps += _)
    assert(rec === RunRecord(d("2025-01-01"), 2, Succeeded))
    assert(sleeps.size === 1)
  }

  test("skip-on-empty: None is a SKIP, not a failure — no retry fires") {
    var calls = 0
    val rec = runWithRetry(d("2025-01-01"),
      _ => { calls += 1; None },
      _ => fail("a skip must never sleep/retry"))
    assert(calls === 1)
    assert(rec === RunRecord(d("2025-01-01"), 1, Skipped))
  }

  test("tick: due day runs with the LOGICAL date and advances the watermark") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[LocalDate]
    val (rec1, wm1) = tick(None, at("2025-03-10T09:00:00Z"),
      day => { seen += day; Some("ok") }, _ => ())
    assert(rec1.map(_.outcome) === Some(Succeeded))
    assert(seen.toSeq === Seq(d("2025-03-09"))) // execution_date convention
    assert(wm1 === Some(d("2025-03-09")))
    // same day again: idle tick
    val (rec2, wm2) = tick(wm1, at("2025-03-10T23:00:00Z"),
      day => { seen += day; Some("ok") }, _ => ())
    assert(rec2 === None && wm2 === wm1 && seen.size === 1)
  }

  test("a failed run still advances the watermark (no automatic re-run of a failed interval)") {
    val (rec, wm) = tick(None, at("2025-03-10T09:00:00Z"),
      _ => throw new RuntimeException("down"), _ => ())
    assert(rec.map(_.outcome.isInstanceOf[Failed]) === Some(true))
    assert(wm === Some(d("2025-03-09")))
    val (rec2, _) = tick(wm, at("2025-03-10T10:00:00Z"), _ => Some("ok"), _ => ())
    assert(rec2 === None, "failed interval must not silently re-run")
  }

  test("end-to-end shape: the daily task composes ingest -> publish -> AvailableNow drain") {
    // a stub pipeline with the Pipelines P4 contract: day 1 lands
    // items, day 2 is empty (skip). The drain step runs only when the
    // ingest landed something — exactly how the production wiring
    // composes Pipelines.ingestPlaylist with TracksStream.runFromFiles.
    var drains = 0
    def dailyTask(landed: Boolean)(day: LocalDate): Option[String] =
      if (!landed) None
      else { drains += 1; Some(s"drained for $day") }
    val (r1, wm1) = tick(None, at("2025-05-02T01:00:00Z"),
      dailyTask(landed = true), _ => ())
    assert(r1.map(_.outcome) === Some(Succeeded) && drains === 1)
    val (r2, _) = tick(wm1, at("2025-05-03T01:00:00Z"),
      dailyTask(landed = false), _ => ())
    assert(r2.map(_.outcome) === Some(Skipped) && drains === 1)
  }
}
