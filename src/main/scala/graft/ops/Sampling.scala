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

  /** Domain-mixture downsampling: each source (domain) gets a target
    * keep-rate and rows are kept by a DETERMINISTIC per-row uniform draw
    * — how a corpus is rebalanced to target mixture weights (e.g. cap
    * over-represented web domains) while staying reproducible across
    * runs, engines and partitionings.
    *
    * The draw is a Knuth multiplicative hash of the id reduced mod 2²⁰:
    * r = (id · 2654435761) mod 2²⁰ / 2²⁰ — exact integer arithmetic and
    * an exact dyadic rational, so `r < rate` is bit-reproducible in any
    * engine (no RNG, no float accumulation). Rates cycle ¼..1 by source
    * index so every rate bin is exercised by the fixture.
    *
    * Plan: keep-decision is a pure map-side projection (no shuffle); the
    * per-source audit is one hash aggregate. At 100 TB the decision
    * streams with the scan — the mixture rebalance costs zero extra
    * passes.
    */
  def sampleDomainMixture(s: SparkSession, d: String): DataFrame = {
    val rate = when(pmod(substring(col("source"), 4, 10).cast("long"), lit(4L)) === 0, 1.0)
      .when(pmod(substring(col("source"), 4, 10).cast("long"), lit(4L)) === 1, 0.75)
      .when(pmod(substring(col("source"), 4, 10).cast("long"), lit(4L)) === 2, 0.5)
      .otherwise(0.25)
    val draw = pmod(col("doc_id") * lit(2654435761L), lit(1048576L))
      .cast("double") / lit(1048576.0)
    Sources.documents(s, d)
      .withColumn("rate", rate)
      .withColumn("kept", draw < col("rate"))
      .groupBy("source", "rate")
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
      .withColumn("observed_rate",
        round(col("n_kept").cast("double") / col("n_total").cast("double"), 4))
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_split_counts" -> (sampleSplitCounts _),
    "sample_stratified" -> (sampleStratified _),
    "sample_domain_mixture" -> (sampleDomainMixture _),
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
    "sample_domain_mixture" ->
      """WITH t AS (
        | SELECT source,
        |  CASE CAST(substr(source, 4) AS BIGINT) % 4
        |   WHEN 0 THEN 1.0 WHEN 1 THEN 0.75 WHEN 2 THEN 0.5 ELSE 0.25 END AS rate,
        |  ((doc_id * 2654435761) % 1048576)::DOUBLE / 1048576.0 AS draw
        | FROM documents)
        |SELECT source, rate, count(*) AS n_total,
        | CAST(sum(CASE WHEN draw < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        | round(sum(CASE WHEN draw < rate THEN 1 ELSE 0 END)::DOUBLE / count(*), 4) AS observed_rate
        |FROM t GROUP BY source, rate ORDER BY source""".stripMargin,
  )
}
