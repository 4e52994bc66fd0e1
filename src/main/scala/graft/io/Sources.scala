package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Fixture/table readers.
  *
  * The reference's source is a paginated REST scan with a source-pushed
  * BETWEEN predicate (`utils.py:150-235`); the harness form is a Parquet
  * scan, where Catalyst provides the same pushdown automatically
  * (`PushedFilters` on the date column reach the Parquet row-group stats).
  * Explicit per-table accessors keep call sites typo-safe.
  */
object Sources {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Fixture parquet may carry timestamps either UTC-adjusted (read as
    * TIMESTAMP) or timezone-naive (read as TIMESTAMP_NTZ under Spark 4's
    * `inferTimestampNTZ` default). Every session here runs with
    * `spark.sql.session.timeZone=UTC`, so casting NTZ back to TIMESTAMP is
    * value-preserving and gives all downstream operators (`unix_micros`,
    * watermarks, interval joins) one consistent instant type — the same
    * wall-clock values DuckDB's naive reader hands the oracle.
    */
  private def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (acc, f) =>
      if (f.dataType == TimestampNTZType) acc.withColumn(f.name, col(f.name).cast("timestamp"))
      else acc
    }

  /** Generic accessor — routes `events` through its ns-timestamp handling
    * so every caller (Pipeline, gold battery, tests) gets a readable ts.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else normalizeTs(spark.read.parquet(s"$sfDir/$name.parquet"))

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` is nanosecond-precision in the fixture parquet, which
    * Spark's vectorized reader rejects as a timestamp; read it as raw
    * nanos (`legacy.parquet.nanosAsLong`) and truncate to Spark's native
    * microsecond timestamps (`ts div 1000` in integer space — a double
    * division would lose precision above 2^53 ns).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$d/events.parquet")
    normalizeTs(
      if (raw.schema("ts").dataType == LongType)
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else raw)
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
