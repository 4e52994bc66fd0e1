package graft.model

import java.time.LocalDate

/** Load disposition of a RAW table.
  *
  * Mirrors the reference's BigQuery write dispositions
  * (reference `config.py:67-131`, `utils.py:309-313`):
  *  - `WRITE_TRUNCATE`  -> [[FullTruncate]]  (Spark `SaveMode.Overwrite`)
  *  - delete-range + `WRITE_APPEND` -> [[IncrementalByDate]] (Spark dynamic
  *    partition overwrite of the touched date partitions).
  */
sealed trait LoadMode
object LoadMode {
  case object FullTruncate extends LoadMode
  case object IncrementalByDate extends LoadMode
}

/** Batch granularity for incremental extraction windows.
  *
  * Mirrors `range_type in {None, "monthly", "daily"}` plus the dead-code
  * N-day batcher (reference `config.py:152-208`, `main.py:36-49`).
  */
sealed trait RangeGrain
object RangeGrain {
  case object Full extends RangeGrain
  case object Monthly extends RangeGrain
  case object Daily extends RangeGrain
  final case class CustomDays(daysInBatch: Int) extends RangeGrain
}

/** One ETL unit: a named source table with its load policy.
  *
  * The reference models this as the `SERVICE_MAP` config dict
  * (`config.py:67-131`): `{api_name, filter_field, load_mode, range_type}`.
  * Here the "API name" doubles as the fixture parquet name and the
  * filter field is the date column driving range extraction, delete-range
  * idempotency and physical partitioning.
  */
final case class ServiceSpec(
    name: String,
    filterField: Option[String],
    loadMode: LoadMode,
    rangeGrain: RangeGrain,
)

object ServiceSpec {

  /** Inclusive date window, the unit of incremental work
    * (reference `config.py:152-208` returns inclusive `(start, end)` pairs).
    */
  final case class DateRange(start: LocalDate, end: LocalDate) {
    require(!end.isBefore(start), s"range end $end before start $start")
  }

  /** Engine service map over the driver fixtures — the structural analog of
    * the reference's 10-table `SERVICE_MAP` (`config.py:67-131`): small
    * cadastral tables load full-truncate; fact tables load incrementally by
    * their date field, daily or monthly.
    */
  val serviceMap: Seq[ServiceSpec] = Seq(
    ServiceSpec("region", None, LoadMode.FullTruncate, RangeGrain.Full),
    ServiceSpec("nation", None, LoadMode.FullTruncate, RangeGrain.Full),
    ServiceSpec("supplier", None, LoadMode.FullTruncate, RangeGrain.Full),
    ServiceSpec("customer", None, LoadMode.FullTruncate, RangeGrain.Full),
    ServiceSpec("part", None, LoadMode.FullTruncate, RangeGrain.Full),
    ServiceSpec("orders", Some("o_orderdate"), LoadMode.IncrementalByDate, RangeGrain.Monthly),
    ServiceSpec("lineitem", Some("l_shipdate"), LoadMode.IncrementalByDate, RangeGrain.Daily),
    ServiceSpec("events", Some("ts"), LoadMode.IncrementalByDate, RangeGrain.Daily),
    ServiceSpec("documents", None, LoadMode.FullTruncate, RangeGrain.Full),
    ServiceSpec("embeddings", None, LoadMode.FullTruncate, RangeGrain.Full),
  )

  /** RAW -> GOLD trigger edges (reference `TRIGGER_MAP`, `main.py:26-30`). */
  val triggerMap: Map[String, String] = Map(
    "orders" -> "gold_orders_daily",
    "lineitem" -> "gold_lineitem_daily",
    "events" -> "gold_events_hourly",
  )
}
