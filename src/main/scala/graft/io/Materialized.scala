package graft.io

import java.util.concurrent.ConcurrentHashMap
import java.util.function.{Function => JFunction}

import org.apache.spark.sql.DataFrame

/** Process-lifetime cache of expensive deterministic intermediates —
  * the in-session stand-in for the materialized table a production
  * pipeline writes once and joins many times (e.g. the near-dup groups
  * table: three downstream operators consume it, and connected
  * components is the costliest stage of each).
  *
  * `localCheckpoint` materializes the result (executor-local blocks —
  * the same storage class a cluster materialization would use before
  * promotion to a real table) and truncates lineage, so every consumer
  * reuses the computed rows instead of replanning the whole CC pipeline.
  * Entries key on (session, label): results are deterministic per source
  * path and fixtures are immutable — a mutating deployment would key on
  * a snapshot/version id, exactly as with [[CorpusStats]].
  */
object Materialized {

  private val cache = new ConcurrentHashMap[String, DataFrame]()

  /** The materialized frame for `label`, computed at most once per
    * (session, label) for the life of the process. `compute` must be
    * deterministic; callers apply any output ordering AFTER this call so
    * the cached plan stays sort-free.
    */
  def of(session: org.apache.spark.sql.SparkSession, label: String)
      (compute: => DataFrame): DataFrame =
    cache.computeIfAbsent(s"${System.identityHashCode(session)}|$label",
      new JFunction[String, DataFrame] {
        def apply(k: String): DataFrame = compute.localCheckpoint(eager = true)
      })

  /** Visible for tests: number of cached entries. */
  private[graft] def cacheSize: Int = cache.size

  /** Visible for tests: drop all cached intermediates. */
  private[graft] def clear(): Unit = cache.clear()
}
