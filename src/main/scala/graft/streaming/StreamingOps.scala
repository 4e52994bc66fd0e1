package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Minimal typed event for custom-state streaming. */
case class UserEvent(user_id: Long, value: Double)

/** Per-user running totals held in the state store. */
case class UserTotal(user_id: Long, n_events: Long, sum_value: Double)

/** Emitted by [[HighWaterProcessor]] whenever a user's maximum improves. */
case class UserHighWater(user_id: Long, high: Double)

/** Spark 4 arbitrary-state v2 (`StatefulProcessor` / `transformWithState`
  * — the successor to `mapGroupsWithState` with typed per-key state
  * primitives): a per-user high-water mark in a `ValueState[Double]`,
  * emitting only on improvement (the dedup/alerting shape: suppress
  * non-improving events, state is one double per key). Requires the
  * RocksDB state store provider, which is what a production deployment
  * runs anyway for large keyed state.
  */
class HighWaterProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[Long, UserEvent, UserHighWater] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var high: ValueState[Double] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    high = getHandle.getValueState[Double]("high",
      org.apache.spark.sql.Encoders.scalaDouble, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[UserEvent],
      timers: TimerValues): Iterator[UserHighWater] = {
    val prev = if (high.exists()) high.get() else Double.NegativeInfinity
    val mx = rows.foldLeft(prev)((a, e) => math.max(a, e.value))
    if (mx > prev) {
      high.update(mx)
      Iterator.single(UserHighWater(key, mx))
    } else Iterator.empty
  }
}

/** True Structured Streaming forms of the batch analogs in
  * [[graft.ops.StreamingAnalogs]] — the same aggregation expressions wired
  * with `readStream` semantics: watermarks bound state, window aggregates
  * emit per-watermark, `dropDuplicatesWithinWatermark` handles late
  * duplicate events (the streaming form of the reference's refresh-window
  * re-pull, `utils.py:406-451`).
  *
  * These take an already-streaming DataFrame (tests feed a MemoryStream;
  * production feeds `spark.readStream.format(...)`), so the transforms are
  * source-agnostic. Each returns a streaming DataFrame ready for
  * `writeStream`.
  */
object StreamingOps {

  /** Tumbling hourly counts with a 10-minute watermark. */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))

  /** Session windows (30-minute gap) per user with watermark-bounded state. */
  def sessionPerUser(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))

  /** Late-duplicate removal inside the watermark horizon — the streaming
    * idempotency analog of the reference's delete-range+append.
    */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(Seq("event_id"))

  /** Stream-stream interval join: each purchase joined to clicks of the
    * same user within the preceding hour. Both sides carry watermarks so
    * Spark can bound the join state (clicks older than purchase-watermark
    * − 1 h are evicted) — the state-safety requirement that makes
    * stream-stream joins run indefinitely.
    */
  def purchasesWithRecentClicks(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("value").as("p_value"))
    val c = clicks.withWatermark("ts", "1 hour")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
  }

  /** Stream-static enrichment: the event stream joined to a STATIC
    * dimension frame. The static side's JOIN executes per micro-batch
    * (with `broadcast()` it re-broadcasts each batch), but a plain
    * parquet-backed frame pins its file listing at plan time — swapping
    * the dimension files under a running query throws FILE_NOT_EXIST
    * (verified in StreamingOpsSpec' s sibling test during development);
    * live dimension refresh needs a table format with snapshot isolation
    * or a query restart. The stream side never shuffles on the join key;
    * only the windowed aggregate exchanges. Batch twin:
    * `StreamingAnalogs.staticEnrich` (oracle-checked — same expressions).
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), "1 hour"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))

  /** Arbitrary state v2: see [[HighWaterProcessor]]. Update-mode emission,
    * processing-time semantics (no timers needed for a high-water mark).
    */
  def highWaterPerUser(events: org.apache.spark.sql.Dataset[UserEvent]):
      org.apache.spark.sql.Dataset[UserHighWater] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events.groupByKey(_.user_id)
      .transformWithState(new HighWaterProcessor, TimeMode.None(), OutputMode.Update())
  }

  /** Custom arbitrary state (SURVEY §2.10: `mapGroupsWithState`): running
    * per-user totals — event count and value sum accumulated across
    * micro-batches in a typed state store. The state is one fixed-size
    * record per user; at scale that is exactly the keyed-state layout
    * RocksDB-backed stores shard across executors.
    */
  def runningUserTotals(events: org.apache.spark.sql.Dataset[UserEvent]):
      org.apache.spark.sql.Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserTotal, UserTotal](GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[UserEvent], state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(user, 0L, 0.0))
          val (n, sum) = batch.foldLeft((prev.n_events, prev.sum_value)) {
            case ((c, s), e) => (c + 1, s + e.value)
          }
          val next = UserTotal(user, n, sum)
          state.update(next)
          next
      }
  }
}
