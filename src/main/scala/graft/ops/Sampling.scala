package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Sources

/** Sampling and dataset-splitting operators — the selection half of a
  * training-data pipeline (alongside §2.13's dedup/quality filters).
  *
  * All sampling here is HASH-based, not RNG-based: membership is a pure
  * function of a row's id, so splits are reproducible across runs,
  * engines, partitionings and cluster sizes — the property that matters
  * when a 100 TB corpus must yield the same train/val/test assignment
  * every rebuild. (`df.sample()` is seeded per-partition and reshuffles
  * membership whenever the partitioning changes.)
  */
object Sampling {

  /** Deterministic split bucket in [0, buckets) from a uniform-ish hash of
    * the id. xxhash64 scrambles sequential ids so bucket assignment is
    * uncorrelated with insertion order.
    */
  def hashBucket(idCol: String, buckets: Int) =
    pmod(xxhash64(col(idCol)), lit(buckets.toLong))

  /** Train/val/test tags with an 8/1/1 default over 10 hash buckets. */
  def split(df: DataFrame, idCol: String, trainBuckets: Int = 8, valBuckets: Int = 1,
      buckets: Int = 10): DataFrame = {
    val b = hashBucket(idCol, buckets)
    df.withColumn("split",
      when(b < trainBuckets, "train")
        .when(b < trainBuckets + valBuckets, "val")
        .otherwise("test"))
  }

  /** Stratified deterministic k-per-group sample: the first `k` rows per
    * stratum in `orderCol` order (one window pass; WindowGroupLimit keeps
    * it a partial top-k, no full sort).
    */
  def stratifiedFirstK(df: DataFrame, strata: Seq[String], orderCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(strata.map(col): _*).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k).drop("__rn")
  }

  /** Every-nth systematic sample by id (deterministic, oracle-friendly). */
  def everyNth(df: DataFrame, idCol: String, n: Int): DataFrame =
    df.filter(pmod(col(idCol), lit(n.toLong)) === 0)

  // ---- fixture-bound query forms ----

  /** Split sizes per language — id-modulo buckets so the DuckDB oracle can
    * reproduce the assignment with plain arithmetic.
    */
  def sampleSplitCounts(s: SparkSession, d: String): DataFrame = {
    val b = pmod(col("doc_id"), lit(10L))
    Sources.documents(s, d)
      .withColumn("split",
        when(b < 8, "train").when(b < 9, "val").otherwise("test"))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .orderBy("lang", "split")
  }

  /** First-3-per-language stratified sample. */
  def sampleStratified(s: SparkSession, d: String): DataFrame =
    stratifiedFirstK(Sources.documents(s, d), Seq("lang"), "doc_id", 3)
      .select(col("lang"), col("doc_id"), col("n_chars"))
      .orderBy("lang", "doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_split_counts" -> (sampleSplitCounts _),
    "sample_stratified" -> (sampleStratified _),
  )

  val oracles: Map[String, String] = Map(
    "sample_split_counts" ->
      """SELECT lang,
        | CASE WHEN doc_id % 10 < 8 THEN 'train' WHEN doc_id % 10 < 9 THEN 'val' ELSE 'test' END AS split,
        | count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang, split ORDER BY lang, split""".stripMargin,
    "sample_stratified" ->
      """SELECT lang, doc_id, n_chars FROM (
        | SELECT lang, doc_id, n_chars,
        |  row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        | FROM documents) WHERE rn <= 3 ORDER BY lang, doc_id""".stripMargin,
  )
}
