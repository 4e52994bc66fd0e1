package graft.io

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** Process-lifetime cache of cheap corpus statistics keyed by table path.
  *
  * Index-sizing decisions (LSH signature bits, IVF cell counts) need the
  * corpus row count; computing it is cheap per call (Parquet footer
  * metadata — the count-star plan never touches row data), but a library
  * routine invoked many times per session shouldn't re-plan and re-run
  * the sizing job on every call. In a production deployment this role is
  * played by catalog statistics (`ANALYZE TABLE`); against raw paths we
  * memoize the first count. Entries are per (path, table) and never
  * invalidated — fixtures are immutable; a mutating deployment would key
  * on a snapshot/version id instead.
  */
object CorpusStats {

  private val counts = new ConcurrentHashMap[String, Long]()

  /** Row count of `sfDir/table.parquet`, computed at most once per path
    * for the life of the process.
    */
  def rowCount(s: SparkSession, sfDir: String, table: String): Long =
    counts.computeIfAbsent(s"$sfDir/$table",
      _ => Sources.table(s, sfDir, table).count())

  private val sums = new ConcurrentHashMap[String, BigInt]()

  /** Exact integer sum of `colExpr` (a DECIMAL(38,0)-typed expression)
    * over `sfDir/table.parquet`, computed at most once per
    * (path, expression) for the life of the process. One column-pruned
    * scan on first call — the magnitude half of a data-derived
    * overflow-lattice gate (the row-count half is [[rowCount]]); in a
    * catalog deployment this is an `ANALYZE TABLE ... FOR COLUMNS`
    * statistic.
    */
  def columnSum(s: SparkSession, sfDir: String, table: String,
      colExpr: String): BigInt =
    sums.computeIfAbsent(s"$sfDir/$table/$colExpr", _ => {
      val r = Sources.table(s, sfDir, table)
        .selectExpr(s"sum($colExpr) AS s").head()
      if (r.isNullAt(0)) BigInt(0) else BigInt(r.getDecimal(0).toBigInteger)
    })

  /** Visible for tests: number of cached entries. */
  private[graft] def cacheSize: Int = counts.size

  /** Visible for tests: drop all cached stats. */
  private[graft] def clear(): Unit = { counts.clear(); sums.clear() }
}
