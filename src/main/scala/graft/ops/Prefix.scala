package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
  *     `RangePartitioning`, the same machinery a global ORDER BY uses) and
  *     pin the layout with an eager local checkpoint so both passes see
  *     the same partition ids;
  *  2. compute per-partition LOCAL ranks / prefix aggregates with a
  *     window partitioned by the physical partition id — a distributed
  *     window, never a single-partition exchange;
  *  3. reduce each partition to one summary row (count / sum / max),
  *     collect the k summaries (k = shuffle-partition count: bounded by
  *     config, never by data — a model-sized collect), turn them into
  *     per-partition prefix OFFSETS on the driver, and broadcast-join the
  *     k-row offset table back: global value = local value + offset.
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
    val s = df.sparkSession
    val nParts = s.conf.get("spark.sql.shuffle.partitions").toInt

    val parted = graft.io.Checkpoints.pin(
      df.repartitionByRange(nParts, order: _*)
        .withColumn("__pid", spark_partition_id()))

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
    val partials = parted.groupBy("__pid").agg(summaryExprs.head, summaryExprs.tail: _*)
      .collect().sortBy(_.getAs[Int]("__pid"))

    // driver pass over ≤ nParts rows: exclusive prefix of each total
    var rankOff = 0L
    val sumOff = Array.fill(sums.size)(0L)
    val maxOff = Array.fill[Option[Long]](maxes.size)(None)
    val offsetRows = partials.map { r =>
      // Seq[Any] with explicit boxing: Seq(int, long) would widen the
      // Int to Long and corrupt the IntegerType __pid field
      val row = Row.fromSeq(
        Seq[Any](Int.box(r.getAs[Int]("__pid")), Long.box(rankOff)) ++
          sumOff.toSeq.map(Long.box) ++
          maxOff.map(_.map(java.lang.Long.valueOf).orNull).toSeq)
      rankOff += r.getAs[Long]("__n")
      sums.zipWithIndex.foreach { case ((_, out), i) =>
        sumOff(i) += r.getAs[Long](s"__t_$out")
      }
      maxes.zipWithIndex.foreach { case (m, i) =>
        val t = r.getAs[Long](s"__t_${m.inclusiveOut}")
        maxOff(i) = Some(maxOff(i).fold(t)(math.max(_, t)))
      }
      row
    }
    val offsetSchema = StructType(
      Seq(StructField("__pid", IntegerType), StructField("__rank_off", LongType)) ++
        sums.map { case (_, out) => StructField(s"__off_$out", LongType) } ++
        maxes.map(m => StructField(s"__off_${m.inclusiveOut}", LongType, nullable = true)))
    val offsets = s.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(offsetRows: _*)), offsetSchema)

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
