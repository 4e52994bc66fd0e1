package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-partitioned) tables for shuffle-free large-large joins.
  *
  * The reference delegates all joins to BigQuery views with `CLUSTER BY`
  * (`materialize_gold.py:29,33,37`) — BQ's clustering co-locates rows by
  * key so its engine can skip block shuffles. Spark's native analog is a
  * bucketed table: `bucketBy(n, key)` + `sortBy(key)` at write time hashes
  * rows into a fixed number of files per key, so a later equi-join (or
  * groupBy) on that key needs **no Exchange and no Sort** — the single
  * biggest cost cut available for repeated fact-fact joins at 100 TB,
  * where a lineitem⋈orders shuffle would move the whole table across the
  * cluster on every query. Bucket once at ingest, join shuffle-free
  * forever after.
  *
  * Both sides must share the bucket count and key; a mismatched side
  * falls back to a normal shuffle on that side only.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (parquet). Buckets are
    * the unit of join parallelism — size them so one bucket of the
    * *largest* co-bucketed table fits an executor core's memory slice
    * (at 100 TB / 1024 buckets ≈ 100 GB per bucket file group, further
    * split by parquet row groups for read parallelism).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Equi-join two co-bucketed tables on their bucket key. With matching
    * bucket specs the plan is a SortMergeJoin whose children are raw
    * FileScans — no ShuffleExchange, no Sort (bucket files are pre-sorted).
    */
  def coBucketedJoin(spark: SparkSession, leftTable: String,
                     rightTable: String, leftKey: String,
                     rightKey: String): DataFrame =
    spark.table(leftTable)
      .join(spark.table(rightTable),
        spark.table(leftTable)(leftKey) === spark.table(rightTable)(rightKey))

  /** Aggregation on the bucket key also skips the exchange: partial and
    * final hash aggregate collapse into one stage per bucket.
    */
  def bucketedAgg(spark: SparkSession, table: String, key: String,
                  aggs: Seq[org.apache.spark.sql.Column]): DataFrame =
    spark.table(table).groupBy(key).agg(aggs.head, aggs.tail: _*)
}
