package graft.io

import java.time.{Clock, Instant}

/** Memoized auth-token provider with TTL (reference S3: OAuth
  * password-grant token cached per process for 10 minutes,
  * `utils.py:24-28, 90-144`).
  *
  * The engine treats authentication as a *connector* concern — the fetch
  * function is injected (in production an OAuth POST; in tests a counter)
  * and the provider guarantees at most one live fetch per TTL window,
  * thread-safe, which is exactly the reference's `TOKEN_CACHE` behavior
  * without its per-worker-process duplication (a Spark driver holds ONE
  * cache for all executors' planning needs).
  */
final class TokenProvider(
    fetch: () => String,
    ttlSeconds: Long = TokenProvider.DefaultTtlSeconds,
    clock: Clock = Clock.systemUTC(),
) {

  private case class Cached(token: String, fetchedAt: Instant)
  @volatile private var cached: Option[Cached] = None

  /** Current token, fetching only if absent or past TTL
    * (reference reuse-if-valid check, `utils.py:95-117`).
    */
  def token(): String = synchronized {
    val now = clock.instant()
    cached match {
      case Some(c) if c.fetchedAt.plusSeconds(ttlSeconds).isAfter(now) => c.token
      case _ =>
        val t = fetch()
        cached = Some(Cached(t, now))
        t
    }
  }

  /** Drop the cache (force re-auth on next call). */
  def invalidate(): Unit = synchronized { cached = None }
}

object TokenProvider {
  /** 10 minutes (reference `TOKEN_LIFESPAN_MINUTES`, `utils.py:28`). */
  val DefaultTtlSeconds: Long = 600L
}
