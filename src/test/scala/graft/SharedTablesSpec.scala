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
}
