package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global rank / running (prefix) aggregation.
  *
  * Spark plans a `Window.orderBy(...)` with no `partitionBy` as an
  * `Exchange SinglePartition` — every row shuffles into ONE partition and
  * one task sorts the whole input. Correct, but a scale-killer whenever
  * the windowed input grows with the corpus (customer aggregates,
  * vocabularies, price levels). This helper implements the standard
  * two-pass alternative with identical results:
  *
  *  1. range-partition by the order key (Spark's distributed
  *     `RangePartitioning`, the same machinery a global ORDER BY uses)
  *     and pin the layout with a lazy local checkpoint so both passes
  *     see the same partition ids;
  *  2. compute per-partition LOCAL ranks / prefix aggregates with a
  *     window partitioned by the physical partition id — a distributed
  *     window, never a single-partition exchange;
  *  3. reduce each partition to one summary row (count / sum / max),
  *     turn the k summaries (k = shuffle-partition count: bounded by
  *     config, never by data) into per-partition prefix OFFSETS with an
  *     exclusive-frame window over the k-row summary table, and
  *     broadcast-join the offsets back: global = local + offset. The
  *     whole helper is ONE lazy plan — no driver collect, no eager
  *     checkpoint job, no separate offset job (r13 optimization; the
  *     original paid 3 extra driver-visible jobs per call).
  *
  * Running sums and maxes are restricted to `LongType` so the two-pass
  * regrouping is bit-exact: integer addition is associative, so the
  * result cannot drift from a sequential single-partition evaluation the
  * way floating-point re-association can. Callers with monetary values
  * convert to minor units (cents) first — which also makes the DuckDB
  * oracle's window sum exact, closing the float-tie class entirely.
  *
  * The pinned layout goes through [[graft.io.Checkpoints]]: default is
  * `localCheckpoint` (executor-local blocks — right for local[32]);
  * `spark.graft.checkpoint.reliable=true` switches to a reliable
  * checkpoint dir so executor loss on a real cluster cannot invalidate
  * the two-pass layout — the plan shape is unchanged either way.
  */
object Prefix {

  /** A running max requested over `value` (LongType): `inclusiveOut`
    * gets max(rows ≤ current), `exclusiveOut` (if set) gets
    * max(rows < current) — null when no preceding row exists, matching
    * `lag` over a global running max.
    */
  final case class RunMax(value: Column, inclusiveOut: String, exclusiveOut: Option[String] = None)

  /** Adds, in global `order`: an optional dense 1-based global
    * `row_number` (LongType) as `rankOut`, exact running sums (LongType
    * inputs) for each `(value, out)` in `sums`, and running maxes per
    * `maxes`. Output rows keep all input columns; no ordering guarantee
    * on the returned frame itself (add `.orderBy` downstream as usual).
    */
  def running(
      df: DataFrame,
      order: Seq[Column],
      rankOut: Option[String] = None,
      sums: Seq[(Column, String)] = Nil,
      maxes: Seq[RunMax] = Nil): DataFrame = {
    // r13 optimization: the original form paid FOUR driver-visible jobs
    // per call (range-boundary sample, eager checkpoint, offset collect,
    // then the caller's action). This form is ONE lazy plan: the offsets
    // are an exclusive prefix over the ≤ k per-partition summary rows
    // (k = shuffle-partition count — bounded by CONFIG, never by data,
    // the exact argument the driver-collect made), built by a k-row
    // unpartitioned window and broadcast-joined back. The partition
    // count stays EXPLICIT (user-specified repartitions are exempt from
    // AQE coalescing): letting AQE coalesce was measured to collapse
    // tiny-byte/CPU-heavy inputs to ONE partition and serialize the
    // local-window pass (agg_weighted_median 1.9 → 3.5 s) — shuffle
    // BYTES are the wrong proxy for window CPU. Results are
    // bit-identical (exact Long arithmetic, any partitioning).
    val s = df.sparkSession
    val nParts = s.conf.get("spark.sql.shuffle.partitions").toInt
    val parted = graft.io.Checkpoints.pin(
      df.repartitionByRange(nParts, order: _*)
        .withColumn("__pid", spark_partition_id()),
      // lazy: the broadcast (offset) side materializes the checkpoint
      // inside the caller's action; the probe side then re-reads the
      // same blocks — one execution, zero extra jobs
      eager = false)

    val w = Window.partitionBy("__pid").orderBy(order: _*)
    val wIncl = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wExcl = w.rowsBetween(Window.unboundedPreceding, -1)

    var local = parted
    rankOut.foreach { c => local = local.withColumn(s"__loc_$c", row_number().over(w).cast("long")) }
    sums.foreach { case (v, out) => local = local.withColumn(s"__loc_$out", sum(v).over(wIncl)) }
    maxes.foreach { m =>
      local = local.withColumn(s"__loc_${m.inclusiveOut}", max(m.value).over(wIncl))
      m.exclusiveOut.foreach { e => local = local.withColumn(s"__loc_$e", max(m.value).over(wExcl)) }
    }

    // one summary row per partition: row count + sum/max totals
    val summaryExprs: Seq[Column] =
      Seq(count(lit(1)).as("__n")) ++
        sums.map { case (v, out) => sum(v).as(s"__t_$out") } ++
        maxes.map(m => max(m.value).as(s"__t_${m.inclusiveOut}"))
    val summary = parted.groupBy("__pid").agg(summaryExprs.head, summaryExprs.tail: _*)

    // exclusive prefix of each total over the ≤ k summary rows: the ONE
    // sanctioned unpartitioned window in the codebase — its input is
    // groupBy(__pid), ≤ shuffle-partition-count rows by construction
    // (PlanShapesSpec recognizes exactly this shape structurally)
    val wOff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    var offsets = summary
      .withColumn("__rank_off", coalesce(sum("__n").over(wOff), lit(0L)))
    sums.foreach { case (_, out) =>
      offsets = offsets.withColumn(s"__off_$out",
        coalesce(sum(s"__t_$out").over(wOff), lit(0L)))
    }
    maxes.foreach { m =>
      // no coalesce: null (no preceding partition) must stay null to
      // reproduce the global lag's null on the very first row
      offsets = offsets.withColumn(s"__off_${m.inclusiveOut}",
        max(s"__t_${m.inclusiveOut}").over(wOff))
    }
    offsets = offsets.select(col("__pid") +: (Seq(col("__rank_off")) ++
      sums.map { case (_, out) => col(s"__off_$out") } ++
      maxes.map(m => col(s"__off_${m.inclusiveOut}"))): _*)

    var out = local.join(broadcast(offsets), Seq("__pid"))
    rankOut.foreach { c => out = out.withColumn(c, col(s"__loc_$c") + col("__rank_off")) }
    sums.foreach { case (_, o) => out = out.withColumn(o, col(s"__loc_$o") + col(s"__off_$o")) }
    maxes.foreach { m =>
      // greatest() skips nulls, so a null offset (first partition) or a
      // null exclusive-local (first row in partition) falls through to
      // the other side; both null → null, matching the global lag.
      out = out.withColumn(m.inclusiveOut,
        greatest(col(s"__loc_${m.inclusiveOut}"), col(s"__off_${m.inclusiveOut}")))
      m.exclusiveOut.foreach { e =>
        out = out.withColumn(e, greatest(col(s"__loc_$e"), col(s"__off_${m.inclusiveOut}")))
      }
    }
    val dropCols = Seq("__pid", "__rank_off") ++
      rankOut.map(c => s"__loc_$c") ++
      sums.flatMap { case (_, o) => Seq(s"__loc_$o", s"__off_$o") } ++
      maxes.flatMap(m =>
        Seq(s"__loc_${m.inclusiveOut}", s"__off_${m.inclusiveOut}") ++ m.exclusiveOut.map(e => s"__loc_$e"))
    out.drop(dropCols: _*)
  }
}
