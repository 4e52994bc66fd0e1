package graft.ranges

import java.time.LocalDate
import java.time.temporal.TemporalAdjusters

import graft.model.ServiceSpec.DateRange
import graft.model.RangeGrain

/** Pure date-window generators driving incremental loads.
  *
  * Behavioral spec from the reference's range generators
  * (`config.py:152-208`): windows are INCLUSIVE on both ends, cover
  * `[start, end]` exactly (no gap, no overlap), and the last window is
  * clamped to `end`. Monthly windows roll over Dec->Jan correctly
  * (`config.py:158-166`).
  *
  * These run on the driver (they only *plan* batches); the per-window work
  * itself is distributed. At 100 TB the window count stays tiny (one per
  * day/month), so a driver-side list is the right tool — the data volume
  * scales inside each window, not across the plan.
  */
object Ranges {

  /** One window per calendar month intersecting `[start, end]`
    * (reference `get_monthly_ranges`, `config.py:152-172`).
    */
  def monthly(start: LocalDate, end: LocalDate): Seq[DateRange] = {
    require(!end.isBefore(start), s"end $end before start $start")
    Iterator
      .iterate(start)(d => d.`with`(TemporalAdjusters.firstDayOfMonth()).plusMonths(1))
      .takeWhile(!_.isAfter(end))
      .map { s =>
        val monthEnd = s.`with`(TemporalAdjusters.lastDayOfMonth())
        DateRange(s, if (monthEnd.isAfter(end)) end else monthEnd)
      }
      .toSeq
  }

  /** One window per day (reference `get_daily_ranges`, `config.py:175-189`). */
  def daily(start: LocalDate, end: LocalDate): Seq[DateRange] =
    customDays(start, end, 1)

  /** Windows of `daysInBatch` days, last one clamped
    * (reference `get_custom_day_ranges`, `config.py:192-208`).
    */
  def customDays(start: LocalDate, end: LocalDate, daysInBatch: Int): Seq[DateRange] = {
    require(daysInBatch >= 1, s"daysInBatch must be >=1, got $daysInBatch")
    require(!end.isBefore(start), s"end $end before start $start")
    Iterator
      .iterate(start)(_.plusDays(daysInBatch.toLong))
      .takeWhile(!_.isAfter(end))
      .map { s =>
        val e = s.plusDays(daysInBatch.toLong - 1)
        DateRange(s, if (e.isAfter(end)) end else e)
      }
      .toSeq
  }

  /** The recent-refresh window re-pulled on every run: `[today - N days,
    * today]`, i.e. N+1 calendar days (reference `utils.py:406-451`,
    * `DAYS_FOR_RECENT_REFRESH = 7` at `config.py:19`).
    */
  def refreshWindow(today: LocalDate, daysBack: Int = 7): DateRange =
    DateRange(today.minusDays(daysBack.toLong), today)

  /** Dispatch on a spec's grain (reference `main.py:36-49`). */
  def forGrain(grain: RangeGrain, start: LocalDate, end: LocalDate): Seq[DateRange] =
    grain match {
      case RangeGrain.Full => Seq(DateRange(start, end))
      case RangeGrain.Monthly => monthly(start, end)
      case RangeGrain.Daily => daily(start, end)
      case RangeGrain.CustomDays(n) => customDays(start, end, n)
    }
}
