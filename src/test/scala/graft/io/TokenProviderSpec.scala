package graft.io

import java.time.{Clock, Instant, ZoneOffset}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Token TTL cache semantics (reference `utils.py:24-28, 90-144`):
  * reuse within TTL, refetch after expiry, explicit invalidation.
  */
class TokenProviderSpec extends AnyFlatSpec with Matchers {

  private class FakeClock(var now: Instant) extends Clock {
    override def instant(): Instant = now
    override def getZone = ZoneOffset.UTC
    override def withZone(z: java.time.ZoneId): Clock = this
  }

  "TokenProvider" should "fetch once within the 10-minute TTL" in {
    val n = new AtomicInteger(0)
    val clock = new FakeClock(Instant.parse("2024-01-01T00:00:00Z"))
    val tp = new TokenProvider(() => s"tok-${n.incrementAndGet()}", clock = clock)
    tp.token() shouldBe "tok-1"
    clock.now = clock.now.plusSeconds(599)
    tp.token() shouldBe "tok-1" // still cached
    n.get() shouldBe 1
  }

  it should "refetch after expiry (utils.py:95-117)" in {
    val n = new AtomicInteger(0)
    val clock = new FakeClock(Instant.parse("2024-01-01T00:00:00Z"))
    val tp = new TokenProvider(() => s"tok-${n.incrementAndGet()}", clock = clock)
    tp.token() shouldBe "tok-1"
    clock.now = clock.now.plusSeconds(601)
    tp.token() shouldBe "tok-2"
  }

  it should "refetch after invalidate" in {
    val n = new AtomicInteger(0)
    val tp = new TokenProvider(() => s"tok-${n.incrementAndGet()}")
    tp.token() shouldBe "tok-1"
    tp.invalidate()
    tp.token() shouldBe "tok-2"
  }
}
