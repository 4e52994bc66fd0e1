package graft

import graft.io.Materialized

/** The [[SharedTables]] registry must stay COMPLETE: if an operator
  * adds a new `Materialized.of` site without a registry row, the bench's
  * materialization phase misses it and its build cost lands on whichever
  * query runs first — the exact order-dependence the phase exists to
  * remove. Constructing every `SparkEntry` query (query construction is
  * what populates the session cache; no action needed) after a full warm
  * must therefore add zero new cache entries.
  */
class SharedTablesSpec extends SparkSpec {

  "SharedTables.warmAll" should "cover every Materialized entry any query creates" in {
    Materialized.clear()
    SharedTables.warmAll(spark, sfDir)
    val warmed = Materialized.cacheSize
    warmed shouldBe SharedTables.entries.size
    SparkEntry.queries.foreach { case (_, fn) => fn(spark, sfDir) }
    Materialized.cacheSize shouldBe warmed
  }

  it should "be idempotent per (session, fixture)" in {
    val n = Materialized.cacheSize
    SharedTables.warmAll(spark, sfDir)
    Materialized.cacheSize shouldBe n
  }

  /** The model registry must stay COMPLETE too: against a COLD store
    * (fresh root — the on-disk home store would otherwise serve
    * everything and the assertion would be vacuous), a full warm
    * followed by constructing every query must record zero new
    * ModelStore train events. A new `ensure*` site without a
    * `SharedTables.models` row fails here — its training cost would
    * otherwise land on the first query that serves it.
    */
  it should "pre-train every ModelStore artifact any query serves" in {
    val io = graft.io.ModelStore
    val prevRoot = io.rootOverride
    io.rootOverride = Some(tmpDir("graft-models-cold"))
    try {
      Materialized.clear()
      SharedTables.warmAll(spark, sfDir)
      val trainedAfterWarm = io.trainEvents.size
      trainedAfterWarm should be > 0 // cold store: the warm really trained
      SparkEntry.queries.foreach { case (_, fn) => fn(spark, sfDir) }
      io.trainEvents.size shouldBe trainedAfterWarm
    } finally {
      io.rootOverride = prevRoot
      // drop Materialized frames built against the throwaway store so
      // later suites rebuild against the real root
      Materialized.clear()
    }
  }
}
