package graft.ranges

import java.time.LocalDate
import java.time.temporal.ChronoUnit

import scala.util.Random

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.model.ServiceSpec.DateRange

/** Property tests for the range generators (SURVEY §5.3): windows must
  * partition `[start, end]` exactly — inclusive bounds, no gaps, no
  * overlaps — mirroring reference `config.py:152-208` behavior.
  * (Seeded random sampling: the scalatest↔scalacheck bridge artifact is
  * not available offline.)
  */
class RangesSpec extends AnyFlatSpec with Matchers {

  private val rnd = new Random(42)
  private def randDate(): LocalDate = LocalDate.of(1990, 1, 1).plusDays(rnd.nextLong(365L * 30))

  private def checkPartition(ranges: Seq[DateRange], start: LocalDate, end: LocalDate): Unit = {
    ranges.head.start shouldBe start
    ranges.last.end shouldBe end
    ranges.sliding(2).foreach {
      case Seq(a, b) => b.start shouldBe a.end.plusDays(1) // no gap, no overlap
      case _ =>
    }
    ranges.foreach(r => r.end.isBefore(r.start) shouldBe false)
  }

  "monthly" should "partition any interval with no gaps or overlaps" in {
    (1 to 200).foreach { _ =>
      val start = randDate()
      val end = start.plusDays(rnd.nextLong(1000))
      checkPartition(Ranges.monthly(start, end), start, end)
    }
  }

  it should "roll over Dec -> Jan correctly (config.py:158-166)" in {
    val rs = Ranges.monthly(LocalDate.of(1999, 11, 15), LocalDate.of(2000, 2, 10))
    rs.map(r => (r.start.toString, r.end.toString)) shouldBe Seq(
      ("1999-11-15", "1999-11-30"),
      ("1999-12-01", "1999-12-31"),
      ("2000-01-01", "2000-01-31"),
      ("2000-02-01", "2000-02-10"))
  }

  it should "produce a single clamped range inside one month" in {
    Ranges.monthly(LocalDate.of(1999, 3, 10), LocalDate.of(1999, 3, 20)) shouldBe
      Seq(DateRange(LocalDate.of(1999, 3, 10), LocalDate.of(1999, 3, 20)))
  }

  "daily" should "produce one range per day, inclusive" in {
    (1 to 100).foreach { _ =>
      val start = randDate()
      val span = rnd.nextLong(200)
      val end = start.plusDays(span)
      val rs = Ranges.daily(start, end)
      rs.size.toLong shouldBe span + 1
      rs.foreach(r => r.start shouldBe r.end)
      checkPartition(rs, start, end)
    }
  }

  "customDays" should "partition with the last batch clamped (config.py:192-208)" in {
    (1 to 200).foreach { _ =>
      val start = randDate()
      val end = start.plusDays(rnd.nextLong(500))
      val n = 1 + rnd.nextInt(40)
      val rs = Ranges.customDays(start, end, n)
      checkPartition(rs, start, end)
      rs.init.foreach(r => ChronoUnit.DAYS.between(r.start, r.end) shouldBe (n - 1).toLong)
    }
  }

  "refreshWindow" should "span 8 calendar days for the default 7-day lookback (utils.py:412-417)" in {
    val w = Ranges.refreshWindow(LocalDate.of(2024, 3, 15))
    w.start shouldBe LocalDate.of(2024, 3, 8)
    w.end shouldBe LocalDate.of(2024, 3, 15)
    ChronoUnit.DAYS.between(w.start, w.end) + 1 shouldBe 8L
  }

  "forGrain" should "dispatch Full to a single range" in {
    val s = LocalDate.of(2000, 1, 1); val e = LocalDate.of(2000, 3, 15)
    Ranges.forGrain(graft.model.RangeGrain.Full, s, e) shouldBe Seq(DateRange(s, e))
    Ranges.forGrain(graft.model.RangeGrain.Monthly, s, e).size shouldBe 3
    Ranges.forGrain(graft.model.RangeGrain.Daily, s, e).size shouldBe 75
    Ranges.forGrain(graft.model.RangeGrain.CustomDays(10), s, e).size shouldBe 8
  }
}
