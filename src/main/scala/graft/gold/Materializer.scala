package graft.gold

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** GOLD-layer materializer (reference `materialize_gold.py:42-79`).
  *
  * The reference emits `DROP TABLE IF EXISTS` + `CREATE TABLE … PARTITION BY
  * DATE(col) CLUSTER BY c1,c2,c3 AS SELECT * FROM view` to BigQuery
  * (`materialize_gold.py:63-74`). The Spark-native equivalent:
  *
  *  - PARTITION BY  -> `df.write.partitionBy(dateCol)` (directory layout =
  *    partition pruning for readers);
  *  - CLUSTER BY    -> `sortWithinPartitions(clusterCols)` (intra-file
  *    ordering = Parquet row-group min/max skipping on the cluster keys —
  *    the same scan-reduction BigQuery clustering buys);
  *  - DROP + CTAS   -> `SaveMode.Overwrite`.
  *
  * `repartition(partitionCol)` before the sorted write keeps one task per
  * date partition writing one file, instead of every task writing a sliver
  * of every partition — at 1000 executors that is the difference between
  * p×t small files and p files.
  */
object Materializer {

  final case class GoldSpec(
      name: String,
      partitionCol: String,
      clusterCols: Seq[String],
  )

  /** The 3 gold tables (reference `TABLES_TO_OPTIMIZE`,
    * `materialize_gold.py:26-39`: partition `DTMOVIMENTO`, cluster
    * `EMPRESA`/product/section), re-keyed to fixture columns.
    */
  val goldSpecs: Seq[GoldSpec] = Seq(
    GoldSpec("gold_orders_daily", "o_orderdate_date", Seq("o_custkey", "o_orderpriority")),
    GoldSpec("gold_lineitem_daily", "l_shipdate_date", Seq("l_suppkey", "l_partkey")),
    GoldSpec("gold_events_hourly", "ts_date", Seq("user_id", "event_type")),
  )

  /** Gold battery mode (reference `materialize_gold.py:104-137`, O4):
    * materialize every gold spec sequentially from its RAW table.
    */
  def materializeAll(spark: org.apache.spark.sql.SparkSession,
      rawPathFor: String => String, goldPathFor: String => String): Seq[String] = {
    val rawByGold = graft.model.ServiceSpec.triggerMap.map(_.swap)
    goldSpecs.map { spec =>
      val rawName = rawByGold.getOrElse(spec.name,
        throw new IllegalStateException(s"no RAW trigger edge for ${spec.name}"))
      materialize(spark.read.parquet(rawPathFor(rawName)), spec, goldPathFor(spec.name))
      spec.name
    }
  }

  /** Snapshot `view` into a partitioned + clustered table at `path`. */
  def materialize(view: DataFrame, spec: GoldSpec, path: String): Unit = {
    val base =
      if (view.columns.contains(spec.partitionCol)) view
      else {
        val src = spec.partitionCol.stripSuffix("_date")
        view.withColumn(spec.partitionCol, to_date(col(src)))
      }
    base
      .repartition(col(spec.partitionCol))
      .sortWithinPartitions(spec.clusterCols.map(col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy(spec.partitionCol)
      .parquet(path)
  }
}
