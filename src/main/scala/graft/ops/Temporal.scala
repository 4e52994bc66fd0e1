package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Sources

/** Temporal / history operators — the three time-shaped transforms every
  * warehouse pipeline ends up needing beyond plain windowed aggregation:
  * SCD2 dimension-history compaction (gaps-and-islands), calendar
  * gap-filling for time series, and first-order event-transition
  * statistics. All three extend the reference's batch-window surface
  * (`utils.py` date-range batching) to stateful history semantics.
  *
  * Scale notes: every operator here is a window + hash-aggregate over a
  * single key (`custkey` / `user_id`) — one shuffle each, no self-joins,
  * no driver-side state. The gap-fill spine is `sequence` + `explode`
  * (rows = keys × days, generated distributed, never collected).
  */
object Temporal {

  /** SCD2 history from a change stream (gaps-and-islands): collapse each
    * customer's order-priority timeline into validity intervals
    * `[valid_from, valid_to)`. Classic two-window shape — `lag` marks
    * change points, a running `sum` numbers the runs, a `lead` over the
    * run aggregate closes each interval. One shuffle on `custkey`; run
    * numbering is per-key and order-deterministic (ties broken by
    * `o_orderkey`), so the result is reproducible under any partitioning.
    */
  def scd2History(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("custkey").orderBy("ts", "ok")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("prio"), 1).over(w)
    val runs = Sources.orders(s, d)
      .select(col("o_custkey").as("custkey"), col("o_orderdate").as("ts"),
        col("o_orderkey").as("ok"), col("o_orderpriority").as("prio"))
      .withColumn("chg", when(prev.isNull || prev =!= col("prio"), 1L).otherwise(0L))
      .withColumn("version", sum("chg").over(wRun))
    val wv = Window.partitionBy("custkey").orderBy("version")
    runs.groupBy("custkey", "version", "prio")
      .agg(to_date(min("ts")).as("vf"), count(lit(1)).as("n_orders"))
      .withColumn("vt", lead("vf", 1).over(wv))
      // dates ship as ISO strings: engine-neutral for the oracle compare
      .select(col("custkey"), col("version"), col("prio"),
        date_format(col("vf"), "yyyy-MM-dd").as("valid_from"),
        date_format(col("vt"), "yyyy-MM-dd").as("valid_to"), col("n_orders"))
      .orderBy("custkey", "version")
  }

  /** AS-OF snapshot read over the [[scd2History]] intervals — the
    * time-travel query an SCD2 table exists for: reconstruct every
    * customer's state at one instant T by keeping the single version
    * whose `[valid_from, valid_to)` interval covers T. Same one-shuffle
    * gaps-and-islands construction as the history build, then a
    * map-side interval filter — snapshotting 100 TB of history costs
    * exactly the history pass, with no extra shuffle and no per-version
    * fan-out.
    */
  def asofSnapshot(s: SparkSession, d: String): DataFrame = {
    val asOf = "1996-06-30"
    val w = Window.partitionBy("custkey").orderBy("ts", "ok")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("prio"), 1).over(w)
    val runs = Sources.orders(s, d)
      .select(col("o_custkey").as("custkey"), col("o_orderdate").as("ts"),
        col("o_orderkey").as("ok"), col("o_orderpriority").as("prio"))
      .withColumn("chg", when(prev.isNull || prev =!= col("prio"), 1L).otherwise(0L))
      .withColumn("version", sum("chg").over(wRun))
    val wv = Window.partitionBy("custkey").orderBy("version")
    runs.groupBy("custkey", "version", "prio")
      .agg(to_date(min("ts")).as("vf"))
      .withColumn("vt", lead("vf", 1).over(wv))
      .filter(col("vf") <= lit(asOf).cast("date") &&
        (col("vt").isNull || col("vt") > lit(asOf).cast("date")))
      .select(col("custkey"), col("version"), col("prio"),
        date_format(col("vf"), "yyyy-MM-dd").as("valid_from"))
      .orderBy("custkey")
  }

  /** Calendar gap-fill: per-customer daily order totals over Jan 1995
    * with explicit zero rows for order-free days. The date spine is
    * generated with `sequence` + `explode` per key — distributed, linear
    * in keys × days — then left-joined back to the observed aggregate.
    * The join is on (custkey, day): co-partitioned with the aggregate's
    * own shuffle, and AQE folds both into one exchange reuse at scale.
    */
  def gapfillDaily(s: SparkSession, d: String): DataFrame = {
    val jan = Sources.orders(s, d)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("date") &&
        col("o_orderdate") < lit("1995-02-01").cast("date"))
      .groupBy(col("o_custkey").as("custkey"), to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("spend"))
    val spine = jan.select("custkey").distinct()
      .select(col("custkey"), explode(sequence(
        lit("1995-01-01").cast("date"), lit("1995-01-31").cast("date"))).as("day"))
    spine.join(jan, Seq("custkey", "day"), "left")
      .select(col("custkey"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("spend"), lit(0.0)).as("spend"))
      .orderBy("custkey", "day")
  }

  /** First-order transition matrix over the event stream: for each
    * ordered pair of consecutive event types per user, the transition
    * count and row-normalized probability. `lag` over (user, time) then a
    * tiny (|types|²-row) aggregate — the heavy lift is the one user-keyed
    * window shuffle; the probability normalization windows over the
    * aggregate, which is sketch-sized at any corpus scale.
    */
  def transitionMatrix(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val tr = Sources.events(s, d)
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("nxt"))
      .agg(count(lit(1)).as("n"))
    tr.withColumn("p", round(
        col("n").cast("double") / sum("n").over(Window.partitionBy("prev")), 4))
      .orderBy("prev", "nxt")
  }

  /** Per-user EWMA (α = 0.5) over the event-value series — the classic
    * exponential smoother, computed as an exact left fold per user. The
    * fold `e ← e + α(v − e)` runs imperatively inside a typed
    * `flatMapGroups` — the batch mirror of the streaming twin's
    * `transformWithState` handler — in ONE linear pass per key: sort the
    * group by (ts, event_id) in-task, fold a single scalar, emit every
    * intermediate. (An earlier HOF-`aggregate` form rebuilt the
    * accumulator array with `concat` per element — O(n²) copying per
    * series; the typed fold is O(n) time and memory at the same per-key
    * bound.) The fold's IEEE op sequence is written IDENTICALLY in the
    * DuckDB recursive-CTE oracle, so the doubles hash-match bit-for-bit
    * with NO rounding — the strongest determinism class in the suite.
    *
    * Scale: one shuffle on user_id; state is one user's series per task
    * (the same bound as any per-key session reassembly — an unbounded
    * key's running EWMA belongs to the streaming twin shape,
    * `transformWithState`, which keeps only the scalar `e`).
    */
  def ewma(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Sources.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("tsl"), col("event_id"), col("value"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (user, rows) =>
        val sorted = rows.toArray.sortBy(r => (r._2, r._3))
        var e = 0.0
        var first = true
        sorted.iterator.zipWithIndex.map { case (r, i) =>
          val v = r._4
          e = if (first) { first = false; v } else e + 0.5 * (v - e)
          (user, (i + 1).toLong, v, e)
        }
      }
      .toDF("user_id", "rn", "value", "ewma")
      .orderBy("user_id", "rn")
  }

  /** Max-concurrency sweep line over order "activity" intervals
    * ([start = order date, end = start + (orderkey mod 30 + 1) days) —
    * a deterministic synthetic duration, the same discipline as the
    * Audit module's synthetic snapshots): the classic interval-overlap
    * counting algorithm as a relational plan. Every interval emits a +1
    * delta at its start day and a −1 at its (exclusive) end day; the
    * day-grain aggregate reduces the corpus to calendar-sized rows; the
    * running prefix sum of the net deltas IS the concurrency on each
    * day. The prefix sum runs through the two-pass [[Prefix]]
    * aggregation — exact integer arithmetic, no single-partition
    * window — so the shape survives any corpus scale (the sweep input
    * is 2 rows per fact, the cumsum input is calendar-bounded).
    */
  def concurrentIntervals(s: SparkSession, d: String): DataFrame = {
    val o = Sources.orders(s, d).select(
      to_date(col("o_orderdate")).as("start_day"),
      expr("date_add(to_date(o_orderdate), cast(o_orderkey % 30 + 1 as int))").as("end_day"))
    val deltas = o.select(col("start_day").as("day"), lit(1L).as("delta"))
      .unionAll(o.select(col("end_day").as("day"), lit(-1L).as("delta")))
    val daily = deltas.groupBy("day").agg(
      sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_starts"),
      sum(when(col("delta") === -1L, 1L).otherwise(0L)).as("n_ends"),
      sum(col("delta")).as("net"))
    Prefix.running(daily, Seq(col("day")), sums = Seq((col("net"), "concurrency")))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_starts"), col("n_ends"), col("concurrency"))
      .orderBy("day")
  }

  /** Day-of-week seasonality profile (`ts_seasonal_dow`): per event
    * type, each ISO weekday's share of events and of monetary value in
    * integer basis points — the weekly traffic shape a scheduler uses
    * to place backfills in quiet windows. Two keyed aggregates (weekday
    * counts, then type totals joined back — the totals table is
    * type-count-sized, broadcast); shares use integer floor division so
    * both engines emit identical Longs. ISO weekday (Mon=1..Sun=7) is
    * the one day-numbering Spark (`weekday()+1`) and DuckDB (`isodow`)
    * express identically — `dayofweek` starts Sunday at 1 in Spark and
    * at 0 in DuckDB, a cross-engine trap this query documents.
    */
  def seasonalDow(s: SparkSession, d: String): DataFrame = {
    val byDow = Sources.events(s, d)
      .select(col("event_type"), (weekday(col("ts")) + 1).cast("long").as("isodow"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy("event_type", "isodow")
      .agg(count(lit(1)).as("n"), sum("cents").as("c"))
    val totals = byDow.groupBy("event_type")
      .agg(sum("n").as("tn"), sum("c").as("tc"))
    byDow.join(broadcast(totals), "event_type")
      .select(col("event_type"), col("isodow"), col("n").as("n_events"),
        expr("(10000 * n) div tn").as("share_bp"),
        expr("CASE WHEN tc > 0 THEN (10000 * c) div tc ELSE null END").as("value_share_bp"))
      .orderBy("event_type", "isodow")
  }

  /** Seasonally-adjusted daily anomaly scores (`ts_anomaly_zscore`) —
    * each order day's revenue as a z-score against its OWN WEEKDAY's
    * distribution (raw daily z flags every weekend; deseasonalizing by
    * weekday is the standard first-order correction), |z| > 2 flagged.
    * Exactness follows the Welch discipline per weekday: integer-cent
    * day sums, the exact integral-divide weekday mean re-centers the
    * deviations, squared deviations sum in decimal(38,0), and z derives
    * from single deterministic casts — bit-identical in both engines.
    * The weekday stats table is 7 rows — a broadcast — so scoring is
    * map-side; the only corpus shuffle is the daily rollup. Degenerate
    * weekdays (one observation, or zero variance) score NULL in BOTH
    * engines by an explicit guard — Spark's x/0 yields NaN/Infinity
    * where DuckDB yields NULL, so without the CASE a degenerate group
    * would diverge instead of failing loudly.
    */
  def anomalyZscore(s: SparkSession, d: String): DataFrame = {
    val daily = Sources.orders(s, d)
      .select(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
        (weekday(col("o_orderdate")) + 1).cast("long").as("isodow"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy("day", "isodow").agg(sum("cents").as("rev"))
    val pass1 = daily.groupBy("isodow")
      .agg(count(lit(1)).as("n"), sum(col("rev").cast("decimal(38,0)")).as("sw"))
    val pass2 = daily.join(broadcast(pass1), "isodow")
      .withColumn("dev", col("rev") - expr("sw div n"))
      .groupBy("isodow")
      .agg(first("n").as("n"), first("sw").as("sw"),
        sum((col("dev").cast("decimal(19,0)") *
          col("dev").cast("decimal(19,0)")).cast("decimal(38,0)")).as("m2"))
      .withColumn("mean_rev", expr("cast(sw as double) / n"))
      .withColumn("sd_rev",
        expr("CASE WHEN n > 1 THEN sqrt(cast(m2 as double) / (n - 1)) END"))
    val zExpr = expr(
      "CASE WHEN sd_rev IS NOT NULL AND sd_rev <> 0 THEN (rev - mean_rev) / sd_rev END")
    daily.join(broadcast(pass2.select("isodow", "mean_rev", "sd_rev")), "isodow")
      .select(col("day"), col("isodow"), col("rev"),
        graft.functions.Num.roundNorm(zExpr, 6).as("z"),
        (abs(zExpr) > 2.0).as("is_anomaly"))
      .orderBy("day")
  }

  /** Per-brand revenue trend (`ts_trend_slope`): OLS slope of monthly
    * shipped-revenue cents against the month index — the
    * grow-or-shrink signal per product line. Two keyed aggregates: the
    * monthly rollup (brand × month, integer cents), then the five
    * integer power sums per brand over that month-count-bounded table,
    * with the closed-form slope assembled ONCE from identical Longs in
    * both engines (at cents magnitude the engines' streaming `regr_*`
    * paths differ in the last float bits, so the power-sum form is the
    * hash-safe one — the Stats-module discipline on a time series).
    */
  def trendSlope(s: SparkSession, d: String): DataFrame = {
    val li = Sources.lineitem(s, d).select(col("l_partkey"),
      ((year(col("l_shipdate")) - 1992) * 12 + month(col("l_shipdate")) - 1)
        .cast("long").as("mi"),
      round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val brand = Sources.part(s, d).select(col("p_partkey").as("l_partkey"), col("p_brand"))
    val monthly = li.join(brand, "l_partkey")
      .groupBy("p_brand", "mi").agg(sum("cents").as("y"))
    // slope from exact integer power sums — at cents magnitude the
    // engines' streaming regr_slope paths can differ in the last float
    // bits, so the closed form is assembled once from identical Longs
    monthly.groupBy("p_brand")
      .agg(count(lit(1)).as("n"), sum("mi").as("sx"), sum("y").as("sy"),
        sum(col("mi") * col("y")).as("sxy"),
        sum(col("mi") * col("mi")).as("sxx"))
      .select(col("p_brand"),
        graft.functions.Num.roundNorm(
          (col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 4)
          .as("slope_cents_per_month"),
        col("n").as("n_months"))
      .orderBy("p_brand")
  }

  /** Gap-filled daily order-revenue series in exact integer dollars with
    * a dense 0-based day index — the shared input of the
    * autocorrelation and changepoint queries. The daily rollup is one
    * shuffle on the day key (calendar-bounded output at any corpus
    * scale); the spine explodes a `sequence` from the 1-row min/max
    * bounds aggregate — a calendar-sized generate, never a collect.
    * Integer dollars (not cents) keep every downstream power sum well
    * inside Long to sf100 (daily total ≤ ~1e7 → Σxy ≤ ~2.4e17).
    */
  private[graft] def dailyRevenueSeries(s: SparkSession, d: String): DataFrame = {
    val daily = Sources.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice")).cast("long")).as("x"))
    val bounds = daily.agg(min("day").as("d0"), max("day").as("d1"))
    val spine = bounds.select(col("d0"),
      explode(sequence(col("d0"), col("d1"))).as("day"))
    spine.join(daily, Seq("day"), "left")
      .select(datediff(col("day"), col("d0")).cast("long").as("i"),
        col("day"), coalesce(col("x"), lit(0L)).as("x"))
  }

  /** Sample autocorrelation (`ts_autocorr`): lag-k Pearson correlation
    * of the gap-filled daily revenue series for k = 1..7 — the
    * signature statistic separating weekly-periodic load from white
    * noise, and the input to any seasonal-model order choice. Each lag
    * is an equi-join of the series against itself on the shifted day
    * index (the 7 lags ride one exploded join, fan-out ×7 — never a
    * window over the whole series), then six integer power sums per lag
    * and one closed-form float finish. The sums are exact Longs; the
    * finish casts each sum to double ONCE and runs the identical
    * IEEE expression in both engines (same discipline as
    * `graph_assortativity` / `agg_spearman`).
    */
  def autocorr(s: SparkSession, d: String): DataFrame = {
    val ser = dailyRevenueSeries(s, d)
    val a = ser.select(col("i"), col("x"),
      explode(array((1 to 7).map(lit(_)): _*)).as("k"))
      .withColumn("ti", col("i") + col("k"))
    val b = ser.select(col("i").as("ti"), col("x").as("y"))
    def D(c: Column): Column = c.cast("double")
    a.join(b, "ti")
      .groupBy("k")
      .agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("k").cast("long").as("lag"), col("n").as("n_pairs"),
        graft.functions.Num.roundNorm(
          (D(col("n")) * D(col("sxy")) - D(col("sx")) * D(col("sy"))) /
            (sqrt(D(col("n")) * D(col("sxx")) - D(col("sx")) * D(col("sx"))) *
              sqrt(D(col("n")) * D(col("syy")) - D(col("sy")) * D(col("sy")))), 6)
          .as("acf"))
      .orderBy("lag")
  }

  /** CUSUM changepoint scan (`ts_cusum_changepoint`): over the same
    * daily series, the cumulative-sum statistic
    * `S_i = n·P_i − (i+1)·T` (P_i = prefix sum, T = total) — an
    * integer rescaling of the classic mean-shift CUSUM
    * `Σ_{j≤i}(x_j − x̄)`, exact in Longs (n·P ≤ ~6e13 at sf0.1; safe
    * to sf1000). The day with maximal |S| is the best single
    * mean-shift split. The prefix sum runs through the two-pass
    * [[Prefix]] aggregation (no single-partition window); the (n, T)
    * scalars attach as a 1-row broadcast; the top-5 finish is
    * TakeOrderedAndProject. Series length is calendar-bounded, so
    * every stage is corpus-scale-safe.
    */
  def cusumChangepoint(s: SparkSession, d: String): DataFrame = {
    val ser = dailyRevenueSeries(s, d)
    val tot = ser.agg(count(lit(1)).as("n"), sum("x").as("t"))
    Prefix.running(ser, Seq(col("i")), sums = Seq((col("x"), "p")))
      .crossJoin(broadcast(tot))
      .filter(col("i") < col("n") - 1)
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        (col("n") * col("p") - (col("i") + 1) * col("t")).as("cusum"))
      .withColumn("cusum_abs", abs(col("cusum")))
      .orderBy(col("cusum_abs").desc, col("day"))
      .limit(5)
  }

  /** Page's one-sided CUSUM per user (`ts_page_cusum`): the ONLINE
    * mean-shift detector complementing the offline argmax scan of
    * [[cusumChangepoint]] — `S ← max(0, S + x − T)` with target
    * T = 5000 cents (≈ the fixture's mean event value) and alarm
    * threshold H = 60000; on alarm the statistic restarts at 0 (the
    * standard Page restart). All integer cents, so the recursion is
    * bit-exact and the DuckDB recursive-CTE oracle replays it
    * row-for-row. Per-user summary out: event count, alarm count,
    * final statistic. One shuffle on user_id; the per-key fold is the
    * same in-memory bound as any session reassembly — the unbounded-key
    * form is the [[graft.streaming.PageCusumProcessor]] twin, which
    * keeps only the (S, alarms, n) scalars as state.
    */
  def pageCusum(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Sources.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("tsl"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (user, rows) =>
        val sorted = rows.toArray.sortBy(r => (r._2, r._3))
        var sAcc = 0L
        var alarms = 0L
        sorted.foreach { r =>
          val base = math.max(0L, sAcc + r._4 - 5000L)
          if (base > 60000L) { alarms += 1; sAcc = 0L } else sAcc = base
        }
        (user, sorted.length.toLong, alarms, sAcc)
      }
      .toDF("user_id", "n_events", "n_alarms", "final_s")
      .orderBy("user_id")
  }

  /** Order inter-arrival histogram (`ts_interarrival`): per customer,
    * the day gaps between consecutive orders, bucketed into weeks
    * (capped at 8+) with integer basis-point shares — the
    * arrival-process profile a capacity planner reads before choosing a
    * refresh cadence. One window shuffle on the customer key (the
    * per-key `lag` is partitioned — never a global sort), then a
    * 9-row aggregate; the share denominator attaches by a window-free
    * broadcast of the 1-row total. All integers, engine-exact.
    */
  def interarrival(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("custkey").orderBy("day", "ok")
    val gaps = Sources.orders(s, d)
      .select(col("o_custkey").as("custkey"), to_date(col("o_orderdate")).as("day"),
        col("o_orderkey").as("ok"))
      .withColumn("prev", lag(col("day"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(expr("least(CAST(datediff(day, prev) AS BIGINT) div 7, CAST(8 AS BIGINT))").as("bucket"))
    val byBucket = gaps.groupBy("bucket").agg(count(lit(1)).as("n_gaps"))
    val tot = byBucket.agg(sum("n_gaps").as("tn"))
    byBucket.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_gaps"),
        expr("(10000 * n_gaps) div tn").as("share_bp"))
      .orderBy("bucket")
  }

  /** Holt linear (double-exponential) smoothing (`ts_holt_linear`) of
    * the gap-filled daily revenue series with α = β = ½:
    * `l' = ½·x + ½·(l + b)`, `b' = ½·(l' − l) + ½·b`, seeded
    * l₀ = x₀, b₀ = x₁ − x₀ — the level+trend filter behind every
    * short-range capacity forecast. Halving is EXACT in binary floating
    * point, so the recursion is the same IEEE op sequence in both
    * engines and the DuckDB recursive CTE replays it bit-for-bit (the
    * `ts_ewma` argument, extended to the coupled two-term recursion).
    * The series is CALENDAR-bounded, so the single-group fold is a
    * bounded single task by construction (same class as the Prefix
    * offset collect — bounded by the calendar, never the corpus); the
    * heavy lift, the daily rollup, stays distributed. Output: the last
    * 10 days with level, trend and the one-step-ahead forecast.
    */
  def holtLinear(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val n = 10
    val fitted = dailyRevenueSeries(s, d)
      .select(col("i"), date_format(col("day"), "yyyy-MM-dd").as("day"), col("x"))
      .as[(Long, String, Long)]
      .groupByKey(_ => 0)
      .flatMapGroups { (_, rows) =>
        val ser = rows.toArray.sortBy(_._1)
        // the trend seed needs two points: a shorter series emits
        // nothing (mirrored by the oracle's `mi >= 1` guard) instead of
        // throwing on ser(1) while DuckDB degrades to NULL seeds
        if (ser.length < 2) Iterator.empty
        else {
          var l = ser(0)._3.toDouble
          var b = ser(1)._3.toDouble - ser(0)._3.toDouble
          ser.iterator.zipWithIndex.map { case ((i, day, x), idx) =>
            if (idx > 0) {
              val lNew = 0.5 * x + 0.5 * (l + b)
              b = 0.5 * (lNew - l) + 0.5 * b
              l = lNew
            }
            (i, day, x, l, b, l + b)
          }
        }
      }
      .toDF("i", "day", "x", "level", "trend", "forecast_next")
    val top = fitted.agg(max("i").as("mi"))
    fitted.crossJoin(broadcast(top))
      .filter(col("i") > col("mi") - n)
      .select(col("day"), col("x"),
        graft.functions.Num.roundNorm(col("level"), 4).as("level"),
        graft.functions.Num.roundNorm(col("trend"), 4).as("trend"),
        graft.functions.Num.roundNorm(col("forecast_next"), 4).as("forecast_next"))
      .orderBy("day")
  }

  /** Batch sessionization (`ts_sessionize`): gaps-and-islands over the
    * event stream — a new session starts after a > 30-minute silence;
    * each session reports its ordinal, event count, duration and value
    * total. The batch twin of the streaming session window
    * (`stream_session_per_user`), producing the session IDs an offline
    * feature pipeline joins on. Two stacked per-user windows (lag marks
    * boundaries, a running sum numbers sessions — both PARTITIONED by
    * user, never global) and one keyed aggregate; cents exact.
    */
  def sessionize(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ev = Sources.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("prev", lag(col("us"), 1).over(w))
      .withColumn("brk",
        when(col("prev").isNull || col("us") - col("prev") > 1800000000L, 1L).otherwise(0L))
      .withColumn("session_n", sum("brk").over(wRun))
    ev.groupBy("user_id", "session_n")
      .agg(count(lit(1)).as("n_events"), min("us").as("mn"), max("us").as("mx"),
        sum("cents").as("value_cents"))
      .select(col("user_id"), col("session_n"), col("n_events"),
        expr("(mx - mn) div 1000000").as("duration_sec"), col("value_cents"))
      .orderBy("user_id", "session_n")
  }

  /** Trailing-7-day distinct active users per day (`ts_wau_daily`) —
    * the WAU curve. A rolling COUNT DISTINCT has no window form in
    * either engine; the scale shape is the COVER-SET explode: each
    * (day, user) activity row replicates to the ≤7 window-END days it
    * falls into (map-side ×7, no window state), then one
    * distinct-aggregate per end day. At 100 TB that is one shuffle of
    * 7×|daily-active| rows — linear, partitionable, and exact; output
    * restricted to days that actually occur (leading partial windows
    * are real WAU semantics and kept). Documented alternative for much
    * wider windows: per-day HLL sketch union (`sketch_hll_rollup`).
    */
  def wauDaily(s: SparkSession, d: String): DataFrame = {
    val act = Sources.events(s, d)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val days = act.select("day").distinct()
    val spread = act.select(
      explode(sequence(col("day"), date_add(col("day"), 6))).as("wday"),
      col("user_id"))
    spread.join(days.withColumnRenamed("day", "wday"), Seq("wday"), "left_semi")
      .groupBy("wday").agg(countDistinct("user_id").as("wau"))
      .select(date_format(col("wday"), "yyyy-MM-dd").as("day"), col("wau"))
      .orderBy("day")
  }

  /** Month-over-month growth (`ts_mom_growth`): monthly revenue with
    * the previous month's value, absolute delta, and growth in integer
    * basis points — computed WINDOW-free: the monthly rollup
    * equi-joins its own (ym+1)-shifted self, so there is no global
    * ordering operator at all (the lag-over-calendar trap). First
    * month reports null prev/growth. All integers except nothing —
    * growth is floor-division bp of exact Longs.
    */
  def momGrowth(s: SparkSession, d: String): DataFrame = {
    val monthly = Sources.orders(s, d)
      .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
        .cast("long").as("mi"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val prev = monthly.select((col("mi") + 1).as("mi"), col("cents").as("prev_cents"))
    monthly.join(prev, Seq("mi"), "left")
      .select(col("mi"),
        expr("mi div 12").as("yr"), (pmod(col("mi"), lit(12L)) + 1).as("mo"),
        col("cents"), col("prev_cents"),
        (col("cents") - col("prev_cents")).as("delta_cents"),
        expr("CASE WHEN prev_cents > 0 THEN (10000 * (cents - prev_cents)) div prev_cents END")
          .as("growth_bp"))
      .orderBy("mi")
  }

  /** Kaplan-Meier survival estimator over customer lifetimes
    * (`ts_kaplan_meier`): duration = days between a customer's first and
    * last order; a lifetime is an observed churn EVENT when the last
    * order predates the corpus horizon (global max order date − 90
    * days), otherwise right-CENSORED. At each event time t:
    * `n_risk = #{duration ≥ t}`, `d_events = churns at t`, and
    * `S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ)` via the exp-of-summed-logs window
    * — both cumulatives run through the two-pass [[Prefix]] shape, so
    * there is no single-partition window: pass 1 in DESCENDING duration
    * order yields `n_risk` directly as the inclusive suffix count (no
    * global-total attach needed), pass 2 in ascending order accumulates
    * the log-survival terms on a 1e-9 integer lattice
    * (`round(ln(1−d/n)·1e9)` as BIGINT — integer addition is
    * associative, so the two-pass regrouping is bit-exact and the
    * DuckDB oracle's window sum replays it term-for-term). The
    * `d = n` terminal row — only possible at the maximum duration,
    * since d ≤ n and n counts the tail — short-circuits to 0 before
    * the log.
    *
    * Scale: one custkey-shuffled aggregate over the fact table; both
    * prefix passes run over the duration-grouped table, whose row count
    * is bounded by the CALENDAR SPAN in days (≤ a few thousand at any
    * corpus volume) — and the two-pass shape would hold even if it
    * were not.
    */
  def kaplanMeier(s: SparkSession, d: String): DataFrame = {
    import graft.functions.Num.roundNorm
    val life = Sources.orders(s, d)
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("day"))
      .groupBy("o_custkey")
      .agg(min(col("day")).as("first_day"), max(col("day")).as("last_day"))
    val horizon = life.agg(date_sub(max(col("last_day")), 90).as("cutoff"))
    val times = life.crossJoin(broadcast(horizon)) // 1-row horizon attach
      .select(datediff(col("last_day"), col("first_day")).cast("long").as("t_day"),
        when(col("last_day") < col("cutoff"), 1L).otherwise(0L).as("event"))
      .groupBy("t_day")
      .agg(count(lit(1)).as("n_leave"), sum(col("event")).as("d_events"))
    val atRisk = Prefix.running(times, Seq(col("t_day").desc),
      sums = Seq((col("n_leave"), "n_risk")))
      .withColumn("lg_e9", coalesce(
        round(log(lit(1.0) -
          col("d_events").cast("double") / col("n_risk").cast("double")) * 1e9)
          .cast("long"),
        lit(0L)))
    Prefix.running(atRisk, Seq(col("t_day")),
      sums = Seq((col("lg_e9"), "cum_lg_e9")))
      .filter(col("d_events") > 0)
      .select(col("t_day"), col("n_risk"), col("d_events"),
        when(col("d_events") === col("n_risk"), lit(0.0))
          .otherwise(roundNorm(exp(col("cum_lg_e9").cast("double") / 1e9), 6))
          .as("survival"))
      .orderBy("t_day")
  }

  /** Classical additive seasonal decomposition (`ts_seasonal_decompose`)
    * of the gap-filled daily revenue series: trend = centered 7-day
    * moving average, seasonal = per-weekday mean of the detrended
    * residue, remainder = what's left — the STL-lite diagnostic every
    * demand/forecast pipeline starts from.
    *
    * The centered MA is NOT a window over the global series (a
    * single-partition sort at scale): it's the stencil self-join — each
    * day i scatters its value to targets i−3..i+3 (map-side ×7 explode),
    * and a keyed aggregate on the target index rebuilds every 7-day sum
    * in parallel; only complete frames (count = 7) survive, dropping the
    * 3-day boundary exactly as classical decomposition does. Weekday
    * comes from the dense index (i mod 7) — the spine is contiguous, so
    * this is engine-identical with no day-of-week convention risk.
    *
    * Exactness: the series is integer dollars; 7·x − Σ₇ (detrended ×7)
    * and cnt·detr − Σ_dow (remainder ×7·cnt) stay exact BIGINTs, so
    * trend/seasonal/remainder are each ONE long→double division + round
    * — the identical IEEE operation in both engines. The 7-row seasonal
    * table broadcasts back map-side.
    */
  def seasonalDecompose(s: SparkSession, d: String): DataFrame = {
    // lazy pin: the series feeds the stencil scatter AND the join-back
    val ser = graft.io.Checkpoints.pin(dailyRevenueSeries(s, d), eager = false)
    val win = ser
      .withColumn("off", explode(sequence(lit(-3L), lit(3L))))
      .groupBy((col("i") + col("off")).as("i"))
      .agg(count(lit(1)).as("c7"), sum(col("x")).as("sum7"))
      .filter(col("c7") === 7)
    val j = win.join(ser, Seq("i"))
      .withColumn("detr_e", lit(7L) * col("x") - col("sum7"))
      .withColumn("dow", col("i") % 7)
    val dw = j.groupBy("dow")
      .agg(sum(col("detr_e")).as("sd"), count(lit(1)).as("cnt"))
    j.join(broadcast(dw), Seq("dow"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("x"),
        round(col("sum7").cast("double") / 7.0, 4).as("trend"),
        round(col("sd").cast("double") / (col("cnt").cast("double") * 7.0), 4)
          .as("seasonal"),
        round((col("cnt") * col("detr_e") - col("sd")).cast("double") /
          (col("cnt").cast("double") * 7.0), 4).as("remainder"))
      .orderBy("day")
  }

  /** Seasonal strength (`ts_seasonal_strength`, r13): Hyndman's
    * F_s = max(0, 1 − Var(remainder)/Var(detrended)) over the
    * [[seasonalDecompose]] lattice — the single number that says
    * whether the weekly cycle is real enough to model (F_s near 1) or
    * the "seasonal" component is fit noise (near 0); the gate before
    * any seasonal forecaster ([[Temporal]]'s naive-seasonal baseline
    * included) is worth running. Components replay the decompose
    * arithmetic exactly (7-day stencil trend, per-dow means), then
    * round PER ROW onto the whole-dollar lattice (detr_r =
    * round(detr_e/7), rem_r = round((cnt·detr_e − sd)/(7·cnt)) — the
    * psi rule, so both engines sum identical integers; dollar squares
    * keep Σx² < 2⁶³ to ~10⁸-dollar days × 10⁵ days). One mirrored
    * double computes F from the exact moments, rounded 6.
    */
  def seasonalStrength(s: SparkSession, d: String): DataFrame = {
    val ser = graft.io.Checkpoints.pin(dailyRevenueSeries(s, d), eager = false)
    val win = ser
      .withColumn("off", explode(sequence(lit(-3L), lit(3L))))
      .groupBy((col("i") + col("off")).as("i"))
      .agg(count(lit(1)).as("c7"), sum(col("x")).as("sum7"))
      .filter(col("c7") === 7)
    val j = win.join(ser, Seq("i"))
      .withColumn("detr_e", lit(7L) * col("x") - col("sum7"))
      .withColumn("dow", col("i") % 7)
    val dw = j.groupBy("dow")
      .agg(sum(col("detr_e")).as("sd"), count(lit(1)).as("cnt"))
    def D(c: Column): Column = c.cast("double")
    val r = j.join(broadcast(dw), Seq("dow"))
      .withColumn("detr_r", round(D(col("detr_e")) / 7.0, 0).cast("long"))
      .withColumn("rem_r", round(
        D(col("cnt") * col("detr_e") - col("sd")) /
          (D(col("cnt")) * 7.0), 0).cast("long"))
    r.agg(count(lit(1)).as("n_days"),
        sum("detr_r").as("s_d"), sum(col("detr_r") * col("detr_r")).as("ss_d"),
        sum("rem_r").as("s_r"), sum(col("rem_r") * col("rem_r")).as("ss_r"))
      .withColumn("strength", {
        val varD = D(col("n_days")) * D(col("ss_d")) - D(col("s_d")) * D(col("s_d"))
        val varR = D(col("n_days")) * D(col("ss_r")) - D(col("s_r")) * D(col("s_r"))
        graft.functions.Num.roundNorm(
          greatest(lit(0.0), lit(1.0) - varR / varD), 6)
      })
  }

  /** Croston's intermittent-demand forecast (`ts_croston`, r13): the
    * estimator for series where ZEROS are the signal — per priority,
    * demand days are sparse, and naive/SMA forecasters smear demand
    * over the gaps. Croston maintains two α = 1/2 EWMAs updated ONLY
    * on demand days: z (demand size) and p (inter-demand interval);
    * the rate forecast is z/p per day. Sequential by nature — the
    * engine's [[ewma]] discipline applies: the fold runs inside
    * `flatMapGroups` per priority (groups are calendar-bounded), both
    * recurrences are the identical IEEE sequence the oracle's
    * recursive CTE replays bitwise, and only the final state leaves
    * the task. First-day conventions published: z₀ = first demand,
    * p₀ = first demand day's 1-based index from the global series
    * start.
    */
  def croston(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = Sources.orders(s, d)
      .groupBy(col("o_orderpriority"),
        to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice")).cast("long")).as("x"))
    val d0 = Sources.orders(s, d)
      .agg(min(to_date(col("o_orderdate"))).as("d0"))
    daily.crossJoin(broadcast(d0))
      .select(col("o_orderpriority"),
        (datediff(col("day"), col("d0")) + 1).cast("long").as("idx"),
        col("x"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (prio, rows) =>
        val sorted = rows.toArray.sortBy(_._2)
        var z = 0.0; var p = 0.0
        var prevIdx = 0L; var first = true; var n = 0L
        sorted.foreach { case (_, idx, x) =>
          val q = x.toDouble
          val gap = (idx - prevIdx).toDouble
          if (first) { z = q; p = gap; first = false }
          else { z = z + 0.5 * (q - z); p = p + 0.5 * (gap - p) }
          prevIdx = idx; n += 1
        }
        // half-up on positives — matches DuckDB round() exactly
        (prio, n, math.round(z * 1e4) / 1e4, math.round(p * 1e4) / 1e4,
          math.round(z / p * 1e4) / 1e4)
      }
      .toDF("o_orderpriority", "n_demand_days", "z_final", "p_final",
        "croston_rate")
      .orderBy("o_orderpriority")
  }

  /** Pinball (quantile) loss of the naive-seasonal forecaster
    * (`ts_pinball_loss`, r13): the quantile-forecast metric —
    * L_τ(e) = max(τ·e, (τ−1)·e) with e = actual − forecast — at the
    * published τ ∈ {0.1, 0.5, 0.9}, for x̂ᵢ = xᵢ₋₇ (the
    * [[forecastError]] baseline). Pinball is WHAT a quantile model
    * optimizes, so evaluating the point baseline under it quantifies
    * exactly how much a true quantile forecaster could gain at each
    * tail — the decision metric for stocking/capacity models that
    * care about P90, not the mean. On the ×10 lattice the loss is
    * pure integer: 10·L = max(τ₁₀·e, (τ₁₀−10)·e) with τ₁₀ ∈ {1,5,9}
    * (both branches Long-exact; e is whole dollars). One lag-7
    * equi-join with a ×3 tau fan-out, one keyed aggregate.
    */
  def pinballLoss(s: SparkSession, d: String): DataFrame = {
    val ser = graft.io.Checkpoints.pin(dailyRevenueSeries(s, d), eager = false)
    val j = ser.join(ser.select((col("i") + 7).as("i"), col("x").as("xf")), "i")
      .withColumn("e", col("x") - col("xf"))
      .withColumn("tau10", explode(array(lit(1L), lit(5L), lit(9L))))
    j.groupBy("tau10")
      .agg(count(lit(1)).as("n"),
        sum(greatest(col("tau10") * col("e"),
          (col("tau10") - 10) * col("e"))).as("sum_loss_x10"))
      .select(col("tau10"), col("n"), col("sum_loss_x10"),
        expr("sum_loss_x10 div (10L * n)").as("mean_loss_usd"))
      .orderBy("tau10")
  }

  /** Ljung-Box portmanteau test (`stats_ljung_box`, r13): the single
    * statistic summarizing whether ANY of the first 7 autocorrelations
    * is real — Q = n(n+2)·Σ_k r_k²/(n−k) — the standard residual-
    * whiteness gate after fitting any of the engine's forecasters
    * (naive-seasonal, Holt, SMA): significant Q on residuals means
    * structure was left on the table. r_k rides the exact
    * [[autocorr]] lag-join moments (contiguous spine ⇒ the pair count
    * IS n−k, so no separate length pass); each lag's r²/(n−k) rounds
    * onto the e9 lattice PER LAG before the sum (psi rule), the seven
    * lattice terms ship as gate columns, and Q is one mirrored double
    * off the exact term sum. Plan: the ×7 exploded lag join + one
    * keyed agg + a 7-row reduce.
    */
  def ljungBox(s: SparkSession, d: String): DataFrame = {
    val ser = graft.io.Checkpoints.pin(dailyRevenueSeries(s, d), eager = false)
    val a = ser.select(col("i"), col("x"),
      explode(array((1 to 7).map(lit(_)): _*)).as("k"))
      .withColumn("ti", col("i") + col("k"))
    val b = ser.select(col("i").as("ti"), col("x").as("y"))
    def D(c: Column): Column = c.cast("double")
    val byK = a.join(b, "ti").groupBy("k")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .withColumn("r",
        (D(col("n")) * D(col("sxy")) - D(col("sx")) * D(col("sy"))) /
          (sqrt(D(col("n")) * D(col("sxx")) - D(col("sx")) * D(col("sx"))) *
            sqrt(D(col("n")) * D(col("syy")) - D(col("sy")) * D(col("sy")))))
      .withColumn("term_e9",
        round(lit(1e9) * col("r") * col("r") / D(col("n")), 0).cast("long"))
    def pick(k: Int): Column =
      max(when(col("k") === k, col("term_e9"))).as(s"t$k")
    byK.agg((max(when(col("k") === 1, col("n"))) + 1).as("n_days"),
        sum("term_e9").as("sum_term_e9"),
        pick(1), pick(2), pick(3), pick(4), pick(5), pick(6), pick(7))
      .withColumn("q_stat", graft.functions.Num.roundNorm(
        D(col("n_days")) * D(col("n_days") + 2) * D(col("sum_term_e9"))
          / 1e9, 4))
  }

  /** Wald-Wolfowitz runs test (`stats_runs_test`, r13): is the daily
    * revenue sequence RANDOM around its median, or does it cluster
    * (fewer, longer runs = positive serial dependence; more, shorter
    * runs = oscillation)? The nonparametric sibling of `ts_autocorr`
    * that needs no lag choice and no moment assumptions — the first
    * screen before trusting any i.i.d.-based interval on the series.
    * Published dichotomy: above = x > lower-median (the exact order
    * statistic at rank (n+1) div 2 — no interpolation; ties at the
    * median fall BELOW by convention). R = 1 + #{sign flips between
    * consecutive days}; E[R] = 1 + 2n₁n₂/n and Var[R] =
    * 2n₁n₂(2n₁n₂−n)/(n²(n−1)) assemble from exact Longs (2n₁n₂ ≤ n²/2
    * keeps every product ≤ n⁴/4 — exact to 55k-day calendars), z is
    * ONE mirrored double rounded 4. All windows are calendar-bounded
    * (the daily table), the median pick is one conditional MIN.
    */
  def runsTest(s: SparkSession, d: String): DataFrame = {
    val ser = graft.io.Checkpoints.pin(dailyRevenueSeries(s, d), eager = false)
    val nn = ser.agg(count(lit(1)).as("n"))
    val medKern = ser.groupBy("x").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(Window.orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(nn))
      .agg(min(when(col("cum") >= expr("(n + 1L) div 2L"), col("x")))
        .as("med"))
    val signs = ser.crossJoin(broadcast(medKern))
      .select(col("i"), (col("x") > col("med")).cast("long").as("sg"))
    val flips = signs
      .withColumn("prev", lag("sg", 1).over(Window.orderBy("i")))
      .agg(sum(col("sg")).as("n1"),
        sum(lit(1L) - col("sg")).as("n2"),
        (sum(when(col("prev").isNotNull && col("prev") =!= col("sg"), 1L)
          .otherwise(0L)) + 1L).as("runs"))
    def D(c: Column): Column = c.cast("double")
    flips
      .withColumn("n", col("n1") + col("n2"))
      .withColumn("two12", lit(2L) * col("n1") * col("n2"))
      .select(col("n").as("n_days"), col("n1"), col("n2"), col("runs"),
        graft.functions.Num.roundNorm(
          (D(col("runs")) - (lit(1.0) + D(col("two12")) / D(col("n")))) /
            sqrt(D(col("two12")) * D(col("two12") - col("n")) /
              (D(col("n")) * D(col("n")) * D(col("n") - 1))), 4).as("z"))
  }

  /** Rescaled-range Hurst estimate (`ts_hurst_rs`, r13): Mandelbrot's
    * R/S analysis over the gap-filled daily revenue series at the
    * published dyadic window sizes {16, 32, 64} — the long-memory
    * diagnostic (H ≈ 0.5 random walk, H > 0.5 persistent trends,
    * H < 0.5 mean-reverting) that decides whether yesterday's load
    * carries information about next week's, i.e. whether the
    * forecasting family upstream of capacity planning is even
    * applicable. Per full block of w days (hundred-dollar units — the
    * lattice keeps w·Σx² − S² Long-exact to ~10⁹-dollar days): the
    * range of w-scaled cumulative deviations Z_t = w·cum_t − (t+1)·S
    * is exact BIGINT (Z_w = 0 by construction, so the zero anchor is
    * always included), the denominator identity R/S =
    * (maxZ − minZ)/√(w·Σx² − S²) makes the block statistic ONE
    * mirrored double rounded e6 PER BLOCK before the per-w mean (psi
    * rule; zero-variance blocks are excluded by published convention
    * and the used-block census ships); Ĥ = ln(RS̄₆₄/RS̄₁₆)/ln 4 — one
    * mirrored double off the e6 lattice. All windows partition by
    * (w, block) — 16-to-64-row frames, calendar-bounded overall.
    */
  def hurstRs(s: SparkSession, d: String): DataFrame = {
    val xb = dailyRevenueSeries(s, d)
      .select(col("i"), expr("x div 100").as("x"))
      .withColumn("w", explode(array(lit(16L), lit(32L), lit(64L))))
      .withColumn("blk", expr("i div w"))
      .withColumn("t", col("i") % col("w"))
    val blkWin = Window.partitionBy("w", "blk")
    val cumWin = blkWin.orderBy("i")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val z = xb
      .withColumn("nblk", count(lit(1)).over(blkWin))
      .filter(col("nblk") === col("w"))
      .withColumn("sblk", sum("x").over(blkWin))
      .withColumn("ssq", sum(col("x") * col("x")).over(blkWin))
      .withColumn("cum", sum("x").over(cumWin))
      .withColumn("z",
        col("w") * col("cum") - (col("t") + 1) * col("sblk"))
    val blocks = z.groupBy("w", "blk")
      .agg((max("z") - min("z")).as("r_scaled"),
        max(col("w") * col("ssq") - col("sblk") * col("sblk"))
          .as("var_scaled"))
      .filter(col("var_scaled") > 0)
      .withColumn("rs_e6", round(lit(1e6) * col("r_scaled").cast("double") /
        sqrt(col("var_scaled").cast("double")), 0).cast("long"))
    val byW = blocks.groupBy("w")
      .agg(count(lit(1)).as("nb"), sum("rs_e6").as("srs"))
      .withColumn("rsbar_e6", expr("srs div nb"))
    def pick(w: Long, c: String): Column = max(when(col("w") === w, col(c)))
    byW.agg(
        pick(16, "nb").as("n16"), pick(16, "rsbar_e6").as("rs16_e6"),
        pick(32, "nb").as("n32"), pick(32, "rsbar_e6").as("rs32_e6"),
        pick(64, "nb").as("n64"), pick(64, "rsbar_e6").as("rs64_e6"))
      .withColumn("h_est", graft.functions.Num.roundNorm(
        log(col("rs64_e6").cast("double") / col("rs16_e6").cast("double")) /
          log(lit(4.0)), 6))
  }

  /** Mann-Kendall trend test (`ts_mann_kendall`, r13): the
    * distribution-free monotone-trend detector that PAIRS with
    * [[theilSen]] — Sen's slope says how steep, Mann-Kendall says
    * whether the trend is statistically there at all (a pure sign
    * statistic, immune to the revenue spikes that would inflate an OLS
    * t-test). S = Σ_{i<j} sign(x_j − x_i) over the gap-filled daily
    * revenue series; the variance carries the standard tie correction
    * Var·18 = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) (gap-filled zero days
    * form one big tie group — the correction is load-bearing here, not
    * decorative). The O(n²) pair join is the [[theilSen]] argument
    * verbatim: the series is calendar-bounded (≤3.7k days → ≤7M pairs
    * at ANY corpus size), the bounded side broadcasts, and S sums as
    * ±1 Longs — exact. n, S and 18·Var ship as exact BIGINT gate
    * columns; the continuity-corrected z = (S∓1)/√(Var18/18) is ONE
    * mirrored double expression, rounded 4.
    */
  def mannKendall(s: SparkSession, d: String): DataFrame = {
    // lazy pin: the series feeds both pair-join sides, ties, and n
    val ser = graft.io.Checkpoints.pin(dailyRevenueSeries(s, d), eager = false)
    val a = ser.select(col("i").as("ia"), col("x").as("xa"))
    val b = ser.select(col("i").as("ib"), col("x").as("xb"))
    val sstat = a.join(broadcast(b), col("ia") < col("ib"))
      .agg(sum(when(col("xb") > col("xa"), 1L)
        .when(col("xb") < col("xa"), -1L).otherwise(0L)).as("s_stat"))
    val ties = ser.groupBy("x").agg(count(lit(1)).as("t"))
      .filter(col("t") > 1)
      .agg(coalesce(sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)),
        lit(0L)).as("tie_term"))
    val nn = ser.agg(count(lit(1)).as("n_days"))
    nn.crossJoin(broadcast(sstat)).crossJoin(broadcast(ties)) // 1-row attaches
      .withColumn("var18",
        col("n_days") * (col("n_days") - 1) * (col("n_days") * 2 + 5)
          - col("tie_term"))
      .select(col("n_days"), col("s_stat"), col("var18"),
        graft.functions.Num.roundNorm(
          (when(col("s_stat") > 0, (col("s_stat") - 1).cast("double"))
            .when(col("s_stat") < 0, (col("s_stat") + 1).cast("double"))
            .otherwise(lit(0.0))) /
            sqrt(col("var18").cast("double") / 18.0), 4).as("z"))
  }

  /** Theil-Sen robust trend slope (`ts_theil_sen`): the median of ALL
    * pairwise slopes of the gap-filled daily revenue series — the
    * estimator with a 29% breakdown point that the OLS fit
    * (`ts_trend_slope`) lacks: one corrupted ingest day drags the OLS
    * line, while the pairwise median ignores it entirely. The O(n²)
    * pair join is honest here because the SERIES is calendar-bounded —
    * ten years is ≈3.7k points → ≤7M pairs regardless of corpus size;
    * the upstream daily aggregate compresses 100 TB of orders to the
    * calendar, so the quadratic is over days, never rows. The bounded
    * right side broadcasts (a nested-loop over a dim-sized table, the
    * sanctioned shape); each slope is ONE IEEE division of exact
    * Longs, the median interpolates identically in both engines, and
    * the final round(4) absorbs the one-ulp interpolation difference.
    */
  def theilSen(s: SparkSession, d: String): DataFrame = {
    // lazy pin: the series feeds both join sides and the n_days agg
    val ser = graft.io.Checkpoints.pin(dailyRevenueSeries(s, d), eager = false)
    val a = ser.select(col("i").as("ia"), col("x").as("xa"))
    val b = ser.select(col("i").as("ib"), col("x").as("xb"))
    val slopes = a.join(broadcast(b), col("ia") < col("ib"))
      .select(((col("xb") - col("xa")).cast("double") /
        (col("ib") - col("ia")).cast("double")).as("slope"))
    val n = ser.agg(count(lit(1)).as("n_days"))
    slopes
      .agg(count(lit(1)).as("n_pairs"),
        graft.functions.Num.roundNorm(expr("percentile(slope, 0.5)"), 4)
          .as("ts_slope"))
      .crossJoin(broadcast(n)) // 1-row aggregate attach
      .select(col("n_days"), col("n_pairs"), col("ts_slope"))
  }

  /** Time-weighted average price per order priority (`ts_twap`): the
    * step-function TWAP of an IRREGULAR series — the finance/ops
    * estimator that, unlike a row mean, is invariant to how densely a
    * period was sampled. Per (priority, day) the day's closing price is
    * the LAST order's total (max orderkey — a total order, fetched by
    * aggregate-then-self-join rather than a struct max_by, which would
    * degrade the corpus aggregate to a SortAggregate); each daily close
    * then holds until the next observed day (`lead`, last day weight 1).
    * The corpus pays one keyed aggregate + one equi-join; the gap
    * windows run over the per-priority DAILY table — calendar-bounded
    * (≤ 2.4k rows each) regardless of corpus size, the same argument as
    * [[theilSen]]. TWAP numerator/denominator ship as exact BIGINT gate
    * columns; the one division is identical IEEE in both engines.
    *
    * Multi-consumer audit (r12 verdict task 4): `o` IS consumed twice
    * (the last-key aggregate and the join-back), but deliberately
    * UN-pinned — its lineage is a pruned 4-column scan+project with no
    * compute, and at 100 TB two pruned parquet scans beat
    * checkpointing a corpus-sized projection. The expensive pattern the
    * pin discipline targets (re-executed AGGREGATE lineage) is what
    * [[drawdown]]/[[ohlcBars]] pin; [[clampedBalance]] is single-chain.
    */
  def twap(s: SparkSession, d: String): DataFrame = {
    val o = Sources.orders(s, d).select(col("o_orderpriority"),
      to_date(col("o_orderdate")).as("day"), col("o_orderkey"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    val lastKey = o.groupBy("o_orderpriority", "day")
      .agg(max("o_orderkey").as("o_orderkey"))
    val daily = lastKey.join(o, Seq("o_orderpriority", "day", "o_orderkey"))
      .select(col("o_orderpriority"), col("day"), col("cents"))
    val w = Window.partitionBy("o_orderpriority").orderBy("day")
    daily
      .withColumn("gap", coalesce(
        datediff(lead(col("day"), 1).over(w), col("day"))
          .cast("long"), lit(1L)))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("cents") * col("gap")).as("twap_num"),
        sum("gap").as("twap_den"))
      .withColumn("twap", graft.functions.Num.roundNorm(
        col("twap_num").cast("double") / col("twap_den") / 100, 4))
      .orderBy("o_orderpriority")
  }

  /** Zero-clamped running balance per customer (`ts_clamped_balance`) —
    * inventory/wallet semantics: stock_t = max(0, stock_{t−1} + Δ_t),
    * the Lindley recursion, which naive engines evaluate with recursive
    * SQL or a sequential per-key fold. It has a CLOSED FORM — the
    * reflection identity stock_t = S_t − min(0, min_{j≤t} S_j) over the
    * plain prefix sums — so the whole operator is two frames over ONE
    * per-key window (running sum + running min of that sum): a single
    * shuffle on custkey, no recursion, no per-group iteration, exact
    * integers end-to-end, and the oracle replays the identical
    * arithmetic. (A balance capped on BOTH sides has no such closed
    * form — that variant genuinely needs the sequential fold; the
    * at-zero clamp is the overwhelmingly common case.) Deltas here:
    * even order keys deposit the order's cents, odd keys withdraw.
    */
  def clampedBalance(s: SparkSession, d: String): DataFrame = {
    val deltas = Sources.orders(s, d)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("day"),
        (when(col("o_orderkey") % 2 === 0, lit(1L)).otherwise(lit(-1L)) *
          round(col("o_totalprice") * 100).cast("long")).as("delta_c"))
      .groupBy("o_custkey", "day")
      .agg(sum("delta_c").as("net_c"))
    val w = Window.partitionBy("o_custkey").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .withColumn("s", sum("net_c").over(w))
      .withColumn("stock_c", col("s") - least(lit(0L), min("s").over(w)))
      .select(col("o_custkey"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("net_c"), col("stock_c"))
      .orderBy("o_custkey", "day")
  }

  /** Maximum drawdown per priority (`ts_drawdown`): over the daily
    * cumulative NET-FLOW series (signed by orderkey parity, the
    * [[clampedBalance]] fixture convention — a pure-revenue cum is
    * monotone and its drawdown identically 0),
    * dd_t = runmax_{s≤t}(cum_s) − cum_t and
    * the headline max_dd = max_t dd_t — the standard risk statistic,
    * and the same reflection-trick family as [[clampedBalance]] (one
    * extra frame over the SAME per-key window, no recursion, no
    * second shuffle). The corpus pays one keyed (priority, day) agg;
    * both windows run over the CALENDAR-BOUNDED daily table (≤3.7k
    * rows per priority regardless of corpus — the TWAP/Theil-Sen
    * argument). Exact cents end-to-end; the peak day is the EARLIEST
    * day the global peak was reached, recovered by one keyed join
    * back over the same bounded daily table.
    */
  /** Frozen-basis periodogram at the weekly cycle
    * (`ts_periodogram_frozen`, r13): spectral energy of daily revenue
    * at harmonics k = 1..3 of the 7-day period — the seasonality
    * detector behind every weekly-pattern dashboard, in the frozen
    * discipline: the 7 cos/sin phase constants ship as published e6
    * integers ([[Stats.kdeGrid]]'s grid rule — no engine's trig is in
    * the hash path), harmonic k reads the SAME table at phase (k·t)
    * mod 7, and the mean is removed on the integer lattice (x′ = x −
    * (Σx div n), exact; un-centered, the DC term swamps every bin).
    * re/im are exact BIGINT dot products (|x′| ≲ 10⁷ dollars × 10⁶
    * constants × 10⁴ days < 2⁶³ to ~10¹⁷ daily-dollar-days); only the
    * amplitude does one mirrored sqrt, rounded 2. Plan: one daily
    * keyed agg, a 1-row mean attach, a 3×7-row published-constant
    * broadcast, one final 3-key agg.
    */
  def periodogramFrozen(s: SparkSession, d: String): DataFrame = {
    val cosT = Seq(1000000L, 623490L, -222521L, -900969L, -900969L,
      -222521L, 623490L)
    val sinT = Seq(0L, 781831L, 974928L, 433884L, -433884L, -974928L,
      -781831L)
    import s.implicits._
    val trig = (for (k <- 1L to 3L; j <- 0L to 6L)
      yield (k, j, cosT(j.toInt), sinT(j.toInt))).toDF("k", "ph", "c", "sn")
    val daily = Sources.orders(s, d)
      .select(to_date(col("o_orderdate")).as("day"),
        round(col("o_totalprice")).cast("long").as("x"))
      .groupBy("day").agg(sum("x").as("x"))
      .withColumn("t", datediff(col("day"), lit("1970-01-01").cast("date"))
        .cast("long"))
    val m = daily.agg(sum("x").as("sx"), count(lit(1)).as("nd"))
      .select(expr("sx div nd").as("m"))
    daily.crossJoin(broadcast(m))
      .withColumn("xc", col("x") - col("m"))
      .join(broadcast(trig), pmod(col("t") * col("k"), lit(7L)) === col("ph"))
      .groupBy("k").agg(
        count(lit(1)).as("n_days"),
        sum(col("xc") * col("c")).as("re_e6"),
        sum(col("xc") * col("sn")).as("im_e6"))
      .select(col("k"), col("n_days"), col("re_e6"), col("im_e6"),
        graft.functions.Num.roundNorm(sqrt(
          col("re_e6").cast("double") * col("re_e6").cast("double") +
            col("im_e6").cast("double") * col("im_e6").cast("double")) / 1e6,
          2).as("amp"))
      .orderBy("k")
  }

  /** New-vs-returning census (`ts_new_returning`, r13): per month, how
    * many active customers are ordering for the FIRST time vs coming
    * back — the growth-accounting split behind every acquisition
    * dashboard (flat actives can hide collapsing acquisition). Two
    * keyed aggs: first-order month per customer (a customer-keyed MIN —
    * map-side combinable), then the monthly distinct-active census with
    * the new/returning partition decided by one broadcast-joinable
    * equality. New + returning = active by construction (spec-pinned);
    * month ships as a string (the driver dtype rule).
    */
  def newReturning(s: SparkSession, d: String): DataFrame = {
    // integer month key, NOT the string month: min over a string
    // degrades the customer-grain aggregate to a per-partition
    // SortAggregate over corpus-sized input (the audit_column_profile
    // bug class) — the Long key keeps it a hash aggregate
    val cm = Sources.orders(s, d)
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12L + month(col("o_orderdate")) - 1L)
          .as("mk"))
      .distinct()
    val first = cm.groupBy("o_custkey").agg(min("mk").as("first_mk"))
    cm.join(first, Seq("o_custkey"))
      .groupBy("mk")
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("mk") === col("first_mk"), 1L).otherwise(0L))
          .as("n_new"))
      .select(
        concat(expr("mk div 12"), lit("-"),
          lpad((pmod(col("mk"), lit(12L)) + 1).cast("string"), 2, "0"))
          .as("month"),
        col("n_active"), col("n_new"),
        (col("n_active") - col("n_new")).as("n_returning"))
      .orderBy("month")
  }

  /** Haar wavelet detail energy (`ts_haar_energy`, r13): the multi-
    * resolution change profile of daily revenue — at level L the detail
    * coefficient of dyadic window w is Σ(left half) − Σ(right half) of
    * the 2^L-day block, and the per-level energy Σd² localizes WHERE
    * variance lives (L=1 day-to-day noise, L=3 week-ish swings) — the
    * complement to [[periodogramFrozen]]'s global frequencies. Exact
    * by construction: no irrational filter coefficients exist in the
    * Haar basis, so the whole transform is integer sign-sums on the
    * hundred-dollar lattice (v div 100, keeping Σd² < 2⁶³ to ~10⁹
    * daily-hundred-dollars); absent days contribute 0 implicitly
    * (windows group by t div 2^L — no gap-fill pass), and partial tail
    * windows are included as-is (published convention). Plan: one
    * daily keyed agg, a 1-row min-date attach, a 3-row level explode,
    * one (level, window)-keyed agg + a 3-key rollup.
    */
  def haarEnergy(s: SparkSession, d: String): DataFrame = {
    val daily = Sources.orders(s, d)
      .select(to_date(col("o_orderdate")).as("day"),
        round(col("o_totalprice")).cast("long").as("x"))
      .groupBy("day").agg(expr("sum(x) div 100").as("h"))
    val t0 = daily.agg(min("day").as("d0"))
    val lv = daily.crossJoin(broadcast(t0))
      .withColumn("t", datediff(col("day"), col("d0")).cast("long"))
      .withColumn("lvl", explode(array(lit(1L), lit(2L), lit(3L))))
      .withColumn("blk", expr(
        "CASE WHEN lvl = 1 THEN 2L WHEN lvl = 2 THEN 4L ELSE 8L END"))
      .withColumn("w", expr("t div blk"))
      .withColumn("sgn",
        when(expr("(t % blk) < (blk div 2)"), 1L).otherwise(-1L))
    lv.groupBy("lvl", "w").agg(sum(col("sgn") * col("h")).as("dcoef"))
      .groupBy("lvl").agg(
        count(lit(1)).as("n_windows"),
        sum(col("dcoef") * col("dcoef")).as("energy"),
        max(abs(col("dcoef"))).as("max_abs"))
      .orderBy("lvl")
  }

  /** Local-peak detection (`ts_peak_days`, r13): days whose revenue
    * strictly exceeds both calendar-adjacent observations AND clears
    * 150 % of the integer corpus mean — the campaign-spike / anomaly
    * shortlist a revenue dashboard surfaces. Scale-free by
    * construction: the prominence floor is 3·(Σx div n) div 2, so the
    * same published rule binds at any SF. One daily keyed agg, one
    * day-ordered lag/lead window over the calendar-bounded series
    * (≤ 3.7k rows), one 1-row mean attach; day ships as a formatted
    * string (the driver dtype rule). Exact integers throughout.
    */
  /** SAX symbolization (`ts_sax_symbols`, r13): the daily-revenue
    * series rendered as Symbolic Aggregate approXimation words — one
    * letter per day from the 4-symbol N(0,1) breakpoint alphabet
    * (±0.6745, 0), concatenated per ISO-epoch week (Lin & Keogh 2003;
    * the discretization under time-series motif/anomaly mining). The
    * symbol decision is quantize-then-compare: with exact lattice
    * moments (v = day cents div 10⁴, dev_n = n·v − Σv,
    * var_n2 = n·Σv² − (Σv)² — hundred-dollar units keep n·Σv² < 2⁶³
    * to ~10⁵ days × 10⁹/day, the Haar-lattice rule), the ONLY double
    * is one mirrored sqrt rounded to the integer s = round(√var_n2) =
    * n·σ; every breakpoint test is then the integer comparison
    * 100·dev_n ⋛ ±67·s, so a 1-ulp sqrt wobble is the single guarded
    * leaf and symbols can't flip engine-to-engine past it. The week
    * key is the epoch-day floor-7 (engine-neutral — never ISO
    * weekofyear, which the engines number differently). Plan: one
    * calendar-bounded daily agg + a 1-row moment attach + one
    * week-keyed ordered string fold.
    */
  def saxSymbols(s: SparkSession, d: String): DataFrame = {
    val daily = Sources.orders(s, d)
      .select(to_date(col("o_orderdate")).as("day"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy("day").agg(expr("sum(cents) div 10000").as("v"))
    val m = daily.agg(count(lit(1)).as("n"), sum("v").as("sv"),
      sum(col("v") * col("v")).as("svv"))
      .select(col("n"), col("sv"),
        round(sqrt((col("n") * col("svv") - col("sv") * col("sv"))
          .cast("double")), 0).cast("long").as("s_scaled"))
    val sym = daily.crossJoin(broadcast(m))
      .withColumn("dev_n", col("n") * col("v") - col("sv"))
      .withColumn("sym",
        when(col("dev_n") * 100 < col("s_scaled") * -67, "a")
          .when(col("dev_n") < 0, "b")
          .when(col("dev_n") * 100 < col("s_scaled") * 67, "c")
          .otherwise("d"))
      .withColumn("week", expr("datediff(day, DATE'1970-01-01') div 7"))
    sym.groupBy("week")
      .agg(count(lit(1)).as("n_days"),
        array_join(transform(
          array_sort(collect_list(struct(col("day"), col("sym")))),
          x => x.getField("sym")), "").as("sax_word"))
      .orderBy("week")
  }

  def peakDays(s: SparkSession, d: String): DataFrame = {
    val daily = Sources.orders(s, d)
      .select(to_date(col("o_orderdate")).as("day"),
        round(col("o_totalprice")).cast("long").as("x"))
      .groupBy("day").agg(sum("x").as("v"))
    val m = daily.agg(sum("v").as("sv"), count(lit(1)).as("nd"))
      .select(expr("(3L * (sv div nd)) div 2").as("floor150"))
    val w = Window.orderBy("day")
    daily
      .withColumn("pv", lag("v", 1).over(w))
      .withColumn("nv", lead("v", 1).over(w))
      .crossJoin(broadcast(m))
      .filter(col("pv").isNotNull && col("nv").isNotNull &&
        col("v") > col("pv") && col("v") > col("nv") &&
        col("v") > col("floor150"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("v"),
        (col("v") - col("floor150")).as("excess"))
      .orderBy("day")
  }

  def drawdown(s: SparkSession, d: String): DataFrame = {
    val daily = Sources.orders(s, d)
      .select(col("o_orderpriority").as("prio"),
        to_date(col("o_orderdate")).as("day"),
        (when(col("o_orderkey") % 2 === 0, lit(1L)).otherwise(lit(-1L)) *
          round(col("o_totalprice") * 100).cast("long")).as("net_c"))
      .groupBy("prio", "day")
      .agg(sum("net_c").as("flow_c"))
    val w = Window.partitionBy("prio").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // pinned (lazy): `heads` and `peakDay` BOTH traverse this table and
    // the final join re-derives `heads` — un-pinned, the corpus-sized
    // orders scan+agg re-executed ~4x in one query (r12 verdict task 4;
    // the graph_hits lesson). The pinned table itself is the
    // calendar-bounded daily series (≤3.7k rows/priority), so the pin
    // costs nothing and every consumer re-reads, never re-derives.
    val cums = graft.io.Checkpoints.pin(daily
      .withColumn("cum", sum("flow_c").over(w))
      .withColumn("runmax", max("cum").over(w))
      .withColumn("dd", col("runmax") - col("cum")), eager = false)
    val heads = cums.groupBy("prio")
      .agg(count(lit(1)).as("n_days"),
        max("cum").as("peak_c"),
        max("dd").as("max_drawdown_c"))
    // peak day = earliest day the global peak was reached (keyed join
    // back over the same calendar-bounded daily table)
    val peakDay = cums.join(heads.select(col("prio"), col("peak_c")), Seq("prio"))
      .filter(col("cum") === col("peak_c"))
      .groupBy("prio").agg(min("day").as("peak_day_raw"))
    heads.join(peakDay, Seq("prio"))
      .select(col("prio"), col("n_days"), col("peak_c"),
        col("max_drawdown_c"),
        date_format(col("peak_day_raw"), "yyyy-MM-dd").as("peak_day"))
      .orderBy("prio")
  }

  /** Monthly OHLC bars per priority (`ts_ohlc_bars`): the candlestick
    * reduction every market/telemetry store ships — open = first
    * day's total, high/low = extreme daily totals, close = last
    * day's total, per (priority, month). High/low are plain keyed
    * aggregates; open/close use the join-back discipline (min/max day
    * per bar, then one keyed equi-join back to the daily table) —
    * NO struct-max SortAggregate, no window: every stage is a
    * map-side-combinable agg or an equi-join on the calendar-bounded
    * daily table (≤3.7k rows per priority regardless of corpus).
    * Exact cents end-to-end.
    */
  def ohlcBars(s: SparkSession, d: String): DataFrame = {
    // pinned (lazy): `bars` plus the two open/close join-backs make
    // THREE consumers of this table — un-pinned, the corpus orders
    // scan+agg re-executed 3x (r12 verdict task 4). The pinned table is
    // calendar-bounded (≤3.7k rows/priority), so the pin is ~free.
    val daily = graft.io.Checkpoints.pin(Sources.orders(s, d)
      .select(col("o_orderpriority").as("prio"),
        to_date(col("o_orderdate")).as("day"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy("prio", "day")
      .agg(sum("cents").as("tot_c"))
      .withColumn("month", date_format(col("day"), "yyyy-MM")), eager = false)
    val bars = daily.groupBy("prio", "month")
      .agg(count(lit(1)).as("n_days"),
        max("tot_c").as("high_c"), min("tot_c").as("low_c"),
        min("day").as("open_day"), max("day").as("close_day"))
    bars
      .join(daily.select(col("prio"), col("day").as("open_day"),
        col("tot_c").as("open_c")), Seq("prio", "open_day"))
      .join(daily.select(col("prio"), col("day").as("close_day"),
        col("tot_c").as("close_c")), Seq("prio", "close_day"))
      .select(col("prio"), col("month"), col("n_days"),
        col("open_c"), col("high_c"), col("low_c"), col("close_c"))
      .orderBy("prio", "month")
  }

  /** Trailing-window self-join over the gap-filled daily series: one
    * exploded offset array (0..w−1) + one equi-join on the shifted
    * index — the [[autocorr]] shape, distributed and bounded, never a
    * single-partition global window. Returns (i, day, x, plus one row
    * per window member y at offset k).
    */
  private def trailing(ser: DataFrame, w: Int): DataFrame = {
    val a = ser.select(col("i"), col("day"), col("x"),
      explode(array((0 until w).map(lit(_)): _*)).as("k"))
      .withColumn("ti", col("i") - col("k"))
    a.join(ser.select(col("i").as("ti"), col("x").as("y")), "ti")
  }

  /** Lagged cross-correlation (`ts_crosscorr`, r13): Pearson
    * correlation between daily revenue and daily ORDER COUNT at lags
    * −7..+7 — the lead/lag diagnostic behind any "does volume lead
    * value?" question, and the cross-series twin of [[autocorr]]
    * (same exploded-lag-join shape: 15 lags ride one join, never a
    * window over the series). Both series share one gap-filled spine;
    * six integer power sums per lag (counts and integer dollars —
    * exact Longs), one mirrored IEEE finish. Zero-variance windows
    * (degenerate at tiny SFs) emit NULL-free 0.0 by convention.
    */
  /** Partial autocorrelations at lags 1..3 (`ts_pacf_frozen`, r13): the
    * AR-order identification statistic — ACF says "lag 7 correlates",
    * PACF says whether that is DIRECT structure or just propagated
    * lag-1 memory (the Box-Jenkins model-selection step). Published
    * estimator convention: ρ_k = the per-lag Pearson correlation of the
    * zero-filled daily series against its k-shift (the [[crossCorr]]
    * moments — exact BIGINTs in 10⁴-dollar units so n·Σxy < 2⁶³ far
    * past the calendar bound), fed through the Durbin-Levinson
    * recursion closed forms: φ11 = ρ1, φ22 = (ρ2−ρ1²)/(1−ρ1²),
    * φ33 = (ρ3 − φ21ρ2 − φ22ρ1)/(1 − φ21ρ1 − φ22ρ2) with
    * φ21 = ρ1(1−ρ2)/(1−ρ1²). Each ρ/φ is ONE mirrored double
    * expression over the exact per-lag moments, rounded 6. Plan: one
    * calendar-bounded spine + a 4-value exploded lag join + a 4-row
    * conditional pivot — nothing grows with the corpus.
    */
  def pacfFrozen(s: SparkSession, d: String): DataFrame = {
    val daily = Sources.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(expr("sum(CAST(round(o_totalprice * 100) AS LONG)) div 1000000")
        .as("v"))
    val bounds = daily.agg(min("day").as("d0"), max("day").as("d1"))
    val spine = bounds.select(col("d0"),
      explode(sequence(col("d0"), col("d1"))).as("day"))
    val ser = graft.io.Checkpoints.pin(
      spine.join(daily, Seq("day"), "left")
        .select(datediff(col("day"), col("d0")).cast("long").as("i"),
          coalesce(col("v"), lit(0L)).as("v")),
      eager = false)
    val a = ser.select(col("i"), col("v").as("x"),
      explode(array((0 to 3).map(lit(_)): _*)).as("k"))
      .withColumn("ti", col("i") + col("k"))
    val byK = a.join(ser.select(col("i").as("ti"), col("v").as("y")), "ti")
      .groupBy("k")
      .agg(count(lit(1)).as("nk"), sum("x").as("sa"), sum("y").as("sb"),
        sum(col("x") * col("x")).as("saa"),
        sum(col("y") * col("y")).as("sbb"),
        sum(col("x") * col("y")).as("sab"))
    def pick(k: Int, c: String): Column =
      max(when(col("k") === k, col(c))).as(s"$c$k")
    val wide = byK.groupBy().agg(
      Seq("nk", "sa", "sb", "saa", "sbb", "sab")
        .flatMap(c => (0 to 3).map(k => pick(k, c))).head,
      Seq("nk", "sa", "sb", "saa", "sbb", "sab")
        .flatMap(c => (0 to 3).map(k => pick(k, c))).tail: _*)
    def D(c: Column): Column = c.cast("double")
    def rho(k: Int): Column = {
      val num = D(col(s"nk$k")) * D(col(s"sab$k")) -
        D(col(s"sa$k")) * D(col(s"sb$k"))
      val den = sqrt(D(col(s"nk$k")) * D(col(s"saa$k")) -
          D(col(s"sa$k")) * D(col(s"sa$k"))) *
        sqrt(D(col(s"nk$k")) * D(col(s"sbb$k")) -
          D(col(s"sb$k")) * D(col(s"sb$k")))
      num / den
    }
    val (r1, r2, r3) = (rho(1), rho(2), rho(3))
    val phi22 = (r2 - r1 * r1) / (lit(1.0) - r1 * r1)
    val phi21 = r1 * (lit(1.0) - r2) / (lit(1.0) - r1 * r1)
    val phi33 = (r3 - phi21 * r2 - phi22 * r1) /
      (lit(1.0) - phi21 * r1 - phi22 * r2)
    import graft.functions.Num.roundNorm
    wide.select(col("nk0").as("n_days"),
      roundNorm(r1, 6).as("rho1"), roundNorm(r2, 6).as("rho2"),
      roundNorm(r3, 6).as("rho3"),
      roundNorm(r1, 6).as("pacf1"), roundNorm(phi22, 6).as("pacf2"),
      roundNorm(phi33, 6).as("pacf3"))
  }

  def crossCorr(s: SparkSession, d: String): DataFrame = {
    val daily = Sources.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice")).cast("long")).as("x"),
        count(lit(1)).as("y"))
    val bounds = daily.agg(min("day").as("d0"), max("day").as("d1"))
    val spine = bounds.select(col("d0"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val ser = graft.io.Checkpoints.pin(
      spine.join(daily, Seq("day"), "left")
        .select(datediff(col("day"), col("d0")).cast("long").as("i"),
          coalesce(col("x"), lit(0L)).as("x"),
          coalesce(col("y"), lit(0L)).as("y")),
      eager = false)
    val a = ser.select(col("i"), col("x"),
      explode(array((-7 to 7).map(lit(_)): _*)).as("k"))
      .withColumn("ti", col("i") + col("k"))
    val b = ser.select(col("i").as("ti"), col("y"))
    def D(c: Column): Column = c.cast("double")
    a.join(b, "ti")
      .groupBy("k")
      .agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .withColumn("xcorr", {
        val num = D(col("n")) * D(col("sxy")) - D(col("sx")) * D(col("sy"))
        val den = sqrt(D(col("n")) * D(col("sxx")) - D(col("sx")) * D(col("sx"))) *
          sqrt(D(col("n")) * D(col("syy")) - D(col("sy")) * D(col("sy")))
        when(den === 0.0, lit(0.0))
          .otherwise(graft.functions.Num.roundNorm(num / den, 6))
      })
      .select(col("k").cast("long").as("k"), col("n"), col("xcorr"))
      .orderBy("k")
  }

  /** Naive-seasonal forecast error (`ts_forecast_error`, r13): the
    * WAPE/MAE/bias of the week-ago-naive forecast x̂_i = x_{i−7} — the
    * baseline every forecasting effort must beat, and the error
    * arithmetic is EXACT (integer dollars: Σ|err| and Σ|x| are BIGINT
    * gates, the two ratios are single mirrored divisions). One lag
    * equi-join on the gap-filled spine, one global aggregate.
    */
  def forecastError(s: SparkSession, d: String): DataFrame = {
    val ser = graft.io.Checkpoints.pin(dailyRevenueSeries(s, d), eager = false)
    def D(c: Column): Column = c.cast("double")
    ser.join(ser.select((col("i") + 7).as("i"), col("x").as("xf")), "i")
      .agg(count(lit(1)).as("n"),
        sum(abs(col("x") - col("xf"))).as("abs_err"),
        sum(abs(col("x"))).as("abs_actual"),
        sum(col("x") - col("xf")).as("bias"))
      .withColumn("wape", graft.functions.Num.roundNorm(
        D(col("abs_err")) / D(col("abs_actual")), 6))
      .withColumn("mae", graft.functions.Num.roundNorm(
        D(col("abs_err")) / D(col("n")), 4))
  }

  /** Monthly VWAP (`ts_vwap`): volume-weighted average unit price per
    * ship month — Σ extended-price / Σ quantity, the market-data
    * reduction (extendedprice = unitprice·qty, so the ratio IS the
    * quantity-weighted mean unit price; the unweighted mean of unit
    * prices is the classic wrong answer this operator exists to
    * avoid). ONE map-side-combinable keyed aggregate over lineitem —
    * the cheapest possible 100 TB shape; numerator/denominator ship as
    * exact BIGINT gate columns, one rounded division.
    */
  def vwap(s: SparkSession, d: String): DataFrame =
    Sources.lineitem(s, d)
      .select(date_format(col("l_shipdate"), "yyyy-MM").as("month"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"),
        round(col("l_quantity")).cast("long").as("qty"))
      .groupBy("month")
      .agg(count(lit(1)).as("n_items"),
        sum("cents").as("price_c"), sum("qty").as("qty_sum"))
      .withColumn("vwap", graft.functions.Num.roundNorm(
        col("price_c").cast("double") / 100.0 / col("qty_sum").cast("double"), 4))
      .orderBy("month")

  /** 14-day RSI (`ts_rsi`): the relative-strength index over the daily
    * revenue series — trailing-14 sums of up-moves vs down-moves,
    * RSI = 100·ΣG/(ΣG+ΣL) (the 1/14 averaging cancels in the ratio, so
    * the statistic is an exact-integer ratio with ONE double division).
    * Deltas via a lag equi-join, the window via [[trailing]] — no
    * global window. All-flat windows (ΣG+ΣL = 0, real at small SFs
    * where the gap-filled series has long zero runs) emit the neutral
    * 50 by convention rather than 0/0. Gate columns: exact gain/loss
    * sums; emitted once the delta window is full (i ≥ 14).
    */
  def rsi(s: SparkSession, d: String): DataFrame = {
    val ser = graft.io.Checkpoints.pin(dailyRevenueSeries(s, d), eager = false)
    val deltas = ser
      .join(ser.select((col("i") + 1).as("i"), col("x").as("xp")), "i")
      .select(col("i"), col("day"), (col("x") - col("xp")).as("dx"))
    val win = deltas.select(col("i"),
        explode(array((0 until 14).map(lit(_)): _*)).as("k"))
      .withColumn("ti", col("i") - col("k"))
      .join(deltas.select(col("i").as("ti"), col("dx").as("dy")), "ti")
      .groupBy(col("i"))
      .agg(sum(greatest(col("dy"), lit(0L))).as("gain_sum"),
        sum(greatest(-col("dy"), lit(0L))).as("loss_sum"))
      .filter(col("i") >= 14)
    win.join(deltas.select(col("i"), col("day")), "i")
      .withColumn("rsi",
        when(col("gain_sum") + col("loss_sum") === 0, lit(50.0))
          .otherwise(graft.functions.Num.roundNorm(
            lit(100.0) * col("gain_sum").cast("double") /
              (col("gain_sum") + col("loss_sum")).cast("double"), 4)))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("gain_sum"), col("loss_sum"), col("rsi"))
      .orderBy("day")
  }

  /** 20-day Bollinger bands (`ts_bollinger`): trailing mean ± 2
    * population σ over the daily series, with the BREAKOUT decision
    * made in exact integers — x > μ + 2σ ⇔ (n·x − S) > 0 ∧
    * (n·x − S)² > 4·(n·Q − S²), all BIGINT cross-multiplications (the
    * float bands are display-rounded; the flag both engines hash can
    * never diverge on a boundary ulp). Full windows only (i ≥ 19);
    * IEEE sqrt is correctly rounded, so the σ column rounds
    * identically in both engines.
    */
  def bollinger(s: SparkSession, d: String): DataFrame = {
    val ser = graft.io.Checkpoints.pin(dailyRevenueSeries(s, d), eager = false)
    val w = 20
    trailing(ser, w)
      .groupBy(col("i"), col("day"), col("x"))
      .agg(count(lit(1)).as("n"), sum("y").as("sx"),
        sum(col("y") * col("y")).as("qx"))
      .filter(col("i") >= w - 1)
      .withColumn("mean", graft.functions.Num.roundNorm(
        col("sx").cast("double") / w, 4))
      .withColumn("sigma", graft.functions.Num.roundNorm(
        sqrt((col("n") * col("qx") - col("sx") * col("sx")).cast("double")) / w, 4))
      .withColumn("breakout_hi",
        (col("n") * col("x") - col("sx") > 0) &&
          (col("n") * col("x") - col("sx")) * (col("n") * col("x") - col("sx")) >
            lit(4L) * (col("n") * col("qx") - col("sx") * col("sx")))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("x"),
        col("mean"), col("sigma"), col("breakout_hi"))
      .orderBy("day")
  }

  /** SMA crossover signals (`ts_sma_crossover`): trailing 7-day vs
    * 28-day means of daily revenue; a signal fires when the fast mean
    * crosses the slow one. The comparison is the exact integer
    * cross-multiplication c = 4·S₇ − S₂₈ (28/7 = 4 — means never
    * materialize as floats), state = c > 0, event = state flip vs the
    * previous day. One [[trailing]] join builds BOTH sums (conditional
    * on offset < 7); the flip test is a lag equi-join. Output: signal
    * days only, with direction and the exact c before/after.
    */
  def smaCrossover(s: SparkSession, d: String): DataFrame = {
    val ser = graft.io.Checkpoints.pin(dailyRevenueSeries(s, d), eager = false)
    val sums = trailing(ser, 28)
      .groupBy(col("i"), col("day"))
      .agg(sum(when(col("k") < 7, col("y")).otherwise(lit(0L))).as("s7"),
        sum("y").as("s28"))
      .filter(col("i") >= 27)
      .withColumn("c", lit(4L) * col("s7") - col("s28"))
    val prev = sums.select((col("i") + 1).as("i"), col("c").as("c_prev"))
    sums.join(prev, "i")
      .filter((col("c") > 0) =!= (col("c_prev") > 0))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        when(col("c") > 0, lit("golden")).otherwise(lit("death")).as("signal"),
        col("c_prev"), col("c"))
      .orderBy("day")
  }

  /** X̄ control chart zone census (`ts_xbar_control`, r13): the
    * Shewhart statistical-process-control read of the daily revenue
    * series — center line and sigma from a FROZEN 30-day baseline
    * window (days 0–29 of the gap-filled series: control limits must
    * come from an in-control reference period, not from the data being
    * judged), then every day is z-scored against the baseline and
    * censused into the standard SPC zones (beyond 3σ = out of control,
    * zone A 2–3σ, zone B 1–2σ, zone C <1σ, per side — the Western
    * Electric vocabulary). Exact-arithmetic shape: baseline (n, S, Q)
    * are exact Longs (daily revenue in whole dollars; the count-gated
    * DECIMAL widening applies past ~2e9-dollar days, the ts_twap
    * convention), the per-day z is ONE mirrored finish in the
    * s2/n − m² sample form, and zone assignment compares the e6
    * INTEGER z against integer thresholds — a one-ulp z divergence
    * cannot flip a zone unless it flips the e6 rounding itself.
    * Plan: the pinned calendar-bounded series, a 1-row baseline
    * broadcast attach, and one ≤8-row census driven from the LITERAL
    * side × zone domain so empty zones publish as zeros at every SF.
    */
  def xbarControl(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ser = graft.io.Checkpoints.pin(dailyRevenueSeries(s, d),
      eager = false)
    val base = ser.filter(col("i") < 30)
      .agg(count(lit(1)).as("n"), sum("x").as("s1"),
        sum(col("x") * col("x")).as("s2"))
    val nD = col("n").cast("double")
    val varS = (col("s2").cast("double") / nD -
      (col("s1").cast("double") / nD) * (col("s1").cast("double") / nD)) *
      (nD / (col("n") - lit(1L)).cast("double"))
    val z = ser.crossJoin(broadcast(base))
      .withColumn("z_e6", round(lit(1e6) *
        (col("x").cast("double") - col("s1").cast("double") / nD) /
        sqrt(varS)).cast("long"))
    val zoned = z.select(
      when(col("z_e6") >= 0, lit("hi")).otherwise(lit("lo")).as("side"),
      when(abs(col("z_e6")) >= 3000000L, lit("beyond_3s"))
        .when(abs(col("z_e6")) >= 2000000L, lit("zone_a"))
        .when(abs(col("z_e6")) >= 1000000L, lit("zone_b"))
        .otherwise(lit("zone_c")).as("zone"),
      col("x"))
    val dom = Seq("hi", "lo").flatMap(sd =>
      Seq("beyond_3s", "zone_a", "zone_b", "zone_c").map(zn => (sd, zn)))
      .toDF("side", "zone")
    dom.join(zoned.groupBy("side", "zone")
        .agg(count(lit(1)).as("nd"), sum("x").as("sx")),
        Seq("side", "zone"), "left")
      .select(col("side"), col("zone"),
        coalesce(col("nd"), lit(0L)).as("n_days"),
        coalesce(col("sx"), lit(0L)).as("sum_x"))
      .orderBy("side", "zone")
  }

  /** Markov hitting times to 'purchase' (`stream_markov_hitting`, r13):
    * the question the [[transitionMatrix]] exists to answer — from each
    * behavioural state, how many steps until a purchase? — via the
    * standard first-step recursion h(s) = 1 + Σ_t P(s,t)·h(t) with
    * h(purchase) = 0, iterated for a FROZEN 8-round horizon from h ≡ 0
    * (partial sums converge from below; a data-dependent stop would
    * put the round count outside the hash gate — the pathCounts
    * discipline). Arithmetic is e6 FIXED-POINT integers end to end:
    * transition probabilities are exact floors (n·1e6 div rowtotal),
    * each round is one integer multiply-sum-divide — bit-reproducible,
    * no lattice rounding to mirror. Plan: the corpus pays ONE
    * user-keyed window shuffle for the transition counts (the
    * transitionMatrix shape); the 8 rounds run on the pinned
    * |types|²-row matrix — model-sized at any corpus scale, the
    * ml_tree_depth2 class. States never observed as predecessors are
    * treated absorbing (left join, documented); the row-mass audit
    * ships alongside.
    */
  def markovHitting(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val tr = Sources.events(s, d)
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("nxt"))
      .agg(count(lit(1)).as("n"))
    // Bounded local finish (r13 optimization; the connectedGroups
    // localFinishMaxEdges discipline): the transition matrix is
    // event-type-DOMAIN-sized — |types|² rows regardless of corpus — so
    // the corpus pays exactly one window + one keyed aggregate, and the
    // 8 value-iteration rounds fold over the collected matrix on the
    // driver instead of paying 8 distributed join+agg+pin rounds over a
    // ≤ |types|² row table (measured 2.3 s of pure round overhead at
    // sf0.1). The arithmetic is the IDENTICAL integer sequence the
    // distributed loop ran and the oracle replays: p_e6 = n·10⁶ div tot,
    // h' = 10⁶ + (Σ p_e6·h_e6) div 10⁶ with `purchase` pinned to 0;
    // every quantity is a nonneg Long, so `div` = `/`.
    val cells = tr.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2)))
    val tot = cells.groupBy(_._1).map { case (p, cs) => p -> cs.map(_._3).sum }
    val pm = cells.map { case (p, nx, n) => (p, nx, n * 1000000L / tot(p)) }
    val states = pm.map(_._1).distinct.sorted
    var h = states.map(_ -> 0L).toMap
    for (_ <- 1 to 8) {
      val acc = pm.groupBy(_._1).map { case (p, cs) =>
        p -> cs.map { case (_, nx, pe6) => pe6 * h.getOrElse(nx, 0L) }.sum
      }
      h = states.map { st =>
        st -> (if (st == "purchase") 0L
               else 1000000L + acc.getOrElse(st, 0L) / 1000000L)
      }.toMap
    }
    val mass = pm.groupBy(_._1).map { case (p, cs) => p -> cs.map(_._3).sum }
    states.map(st => (st, mass(st), h(st))).toSeq
      .toDF("state", "p_out_e6", "h_e6")
      .orderBy("state")
  }

  /** Additive Holt-Winters, frozen parameters
    * (`ts_holt_winters_frozen`, r13): triple exponential smoothing —
    * level + trend + weekly seasonality — over the gap-filled daily
    * revenue series with α = 1/2, β = 1/4, γ = 1/4 and m = 7
    * PUBLISHED (a fitted parameterization would put the optimizer
    * outside the hash gate; the croston/ewma frozen-smoother
    * discipline). Init is the standard first-cycle recipe: l₀ = mean
    * of days 0–6, b₀ = 0, s_j = x_j − l₀; each step t ≥ 7 emits the
    * one-step-ahead error x_t − (l + b + s_{t mod 7}) BEFORE updating
    * (l, b, s). Determinism class: the fold's IEEE op sequence is
    * written IDENTICALLY in the DuckDB recursive CTE (the ts_ewma
    * strongest class) — per-step errors round to the e2 lattice and
    * accumulate as exact integers, so the release (error mass, max
    * error, final state) has no summation-order exposure. The fold
    * runs imperatively in one typed flatMapGroups over the
    * CALENDAR-BOUNDED series (≤ span days by construction — the
    * ts_peak_days bound; a recursive smoother over a corpus-growing
    * key set would instead shard per key, the ewma shape).
    */
  def holtWintersFrozen(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e2 = (v: Double) => BigDecimal(v)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    dailyRevenueSeries(s, d).select(col("i"), col("x")).as[(Long, Long)]
      .groupByKey(_ => 0)
      .flatMapGroups { (_, rows) =>
        val xs = rows.toArray.sortBy(_._1).map(_._2.toDouble)
        if (xs.length < 8) Iterator.empty
        else {
          val l0 = xs.take(7).sum / 7.0
          var l = l0
          var b = 0.0
          val sArr = Array.tabulate(7)(j => xs(j) - l0)
          var sumAbs = 0L
          var maxAbs = 0L
          var n = 0L
          var t = 7
          while (t < xs.length) {
            val j = t % 7
            val err = xs(t) - (l + b + sArr(j))
            val errE2 = e2(err * 100.0)
            sumAbs += math.abs(errE2)
            if (math.abs(errE2) > maxAbs) maxAbs = math.abs(errE2)
            n += 1
            val lNew = 0.5 * (xs(t) - sArr(j)) + 0.5 * (l + b)
            b = 0.25 * (lNew - l) + 0.75 * b
            sArr(j) = 0.25 * (xs(t) - lNew) + 0.75 * sArr(j)
            l = lNew
            t += 1
          }
          Iterator.single((n, sumAbs, maxAbs, e2(l * 100.0), e2(b * 100.0)))
        }
      }
      .toDF("n_steps", "sum_abs_err_e2", "max_abs_err_e2", "level_e2",
        "trend_e2")
  }

  /** MAD-robust anomaly census (`ts_anomaly_mad`, r13): the modified
    * z-score M = 0.6745·(x − median)/MAD with the |M| > 3.5 flag
    * (Iglewicz & Hoaglin 1993, both constants published) over the
    * daily revenue series — the robust companion of
    * [[anomalyZscore]]: mean/σ move WITH the outliers they are
    * supposed to find (masking), the median/MAD pair does not.
    * Exact shape: median and MAD are nearest-rank order statistics —
    * two [[graft.ops.Prefix]] passes (values, then absolute
    * deviations), each pick a conditional MIN, all exact Longs; the
    * only doubles are ONE mirrored M per day on the e6 lattice, and
    * the flag compares e6 integers against the published 3.5e6
    * threshold. Census: days, median, MAD, flagged days, max |M|,
    * flagged revenue mass.
    */
  def anomalyMad(s: SparkSession, d: String): DataFrame = {
    val ser = graft.io.Checkpoints.pin(
      dailyRevenueSeries(s, d).select("i", "x"), eager = false)
    // lazy pin (r13): r1 feeds the count attach AND the median pick —
    // un-pinned, the ranked subplan re-executed per broadcast subtree
    // (the weightedMedian multi-consumer discipline)
    val r1 = graft.io.Checkpoints.pin(
      graft.ops.Prefix.running(ser, Seq(col("x"), col("i")),
        rankOut = Some("rk")),
      eager = false)
    val n1 = r1.agg(count(lit(1)).as("n"))
    val med = r1.crossJoin(broadcast(n1))
      .agg(min(when(col("rk") >= expr("(n + 1) div 2"), col("x")))
        .as("med"))
    val dev = graft.io.Checkpoints.pin(
      ser.crossJoin(broadcast(med))
        .withColumn("ad", abs(col("x") - col("med"))),
      eager = false)
    val r2 = graft.ops.Prefix.running(dev.select(col("i"), col("ad")),
      Seq(col("ad"), col("i")), rankOut = Some("rk2"))
    val mad = r2.crossJoin(broadcast(n1))
      .agg(min(when(col("rk2") >= expr("(n + 1) div 2"), col("ad")))
        .as("mad"))
    dev.crossJoin(broadcast(mad))
      .withColumn("m_e6", when(col("mad") > 0,
        round(lit(1e6) * lit(0.6745) *
          (col("x") - col("med")).cast("double") /
          col("mad").cast("double")).cast("long")).otherwise(lit(0L)))
      .agg(count(lit(1)).as("n_days"), max("med").as("med_x"),
        max("mad").as("mad_x"),
        sum(when(abs(col("m_e6")) > 3500000L, 1L).otherwise(0L))
          .as("n_flagged"),
        max(abs(col("m_e6"))).as("max_m_e6"),
        sum(when(abs(col("m_e6")) > 3500000L, col("x")).otherwise(0L))
          .as("flagged_x_sum"))
  }

  /** Chain-ladder development factors (`ts_chain_ladder`, r13): the
    * actuarial run-off triangle — orders are "claims" by origin year,
    * line-item ship lag (months from order to ship, capped at 5) is
    * the development age (early-ship dirty rows — the etl_dq_quarantine
    * quirk — clamp into bucket 0), and the volume-weighted development factor
    * f_j = Σᵢ C[i, j+1] / Σᵢ C[i, j] (Mack 1993) projects how much
    * more an origin will develop — the standard IBNR estimation
    * machinery, and the same cohort-maturation algebra a
    * revenue-recognition or cohort-LTV forecast runs. The triangle is
    * genuinely CENSORED: cell (i, j) enters only if origin-year-end +
    * j months ≤ the as-of date (max ship date), so late origins have
    * short rows — exactly the missing corner chain-ladder exists to
    * fill; factor j sums only origins observed at BOTH j and j+1.
    * All exact: cumulative cents via a ≤6-bucket per-origin window,
    * factors as Σ·1e6 div Σ floors (positive). Plan: one fact scan,
    * one (origin, dev) aggregate, a per-origin cumulative window over
    * ≤6 rows, a 5-row factor aggregate.
    */
  def chainLadder(s: SparkSession, d: String): DataFrame = {
    val li = Sources.lineitem(s, d)
      .join(Sources.orders(s, d),
        col("l_orderkey") === col("o_orderkey"))
      .select(year(col("o_orderdate")).cast("long").as("origin"),
        // CALENDAR month lag (year·12 + month deltas) — identical
        // arithmetic in both engines; months_between's day-fraction
        // semantics have no DuckDB twin
        greatest(lit(0L), least(lit(5L),
          (year(col("l_shipdate")) * 12 + month(col("l_shipdate")) -
            year(col("o_orderdate")) * 12 - month(col("o_orderdate")))
            .cast("long"))).as("dev"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val asof = Sources.lineitem(s, d)
      .agg(max(to_date(col("l_shipdate"))).as("ao"))
    val cells = li.groupBy("origin", "dev").agg(sum("cents").as("inc"))
    val wC = Window.partitionBy("origin").orderBy("dev")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cells.withColumn("c", sum("inc").over(wC))
      .crossJoin(broadcast(asof))
      // censor: the cell is observed iff its development window closed
      .filter(expr("add_months(make_date(origin + 1, 1, 1), CAST(dev AS INT)) <= ao"))
      .select(col("origin"), col("dev"), col("c"))
    val pinned = graft.io.Checkpoints.pin(cum, eager = false)
    pinned.as("a")
      .join(pinned.as("b"),
        col("a.origin") === col("b.origin") &&
          col("a.dev") + 1L === col("b.dev"))
      .groupBy(col("a.dev").as("dev"))
      .agg(count(lit(1)).as("n_origins"), sum(col("a.c")).as("sum_c_j"),
        sum(col("b.c")).as("sum_c_j1"))
      .withColumn("f_e6", expr("(sum_c_j1 * 1000000L) div sum_c_j"))
      .orderBy("dev")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_xbar_control" -> (xbarControl _),
    "ts_chain_ladder" -> (chainLadder _),
    "ts_anomaly_mad" -> (anomalyMad _),
    "ts_holt_winters_frozen" -> (holtWintersFrozen _),
    "stream_markov_hitting" -> (markovHitting _),
    "ts_crosscorr" -> (crossCorr _),
    "ts_forecast_error" -> (forecastError _),
    "ts_vwap" -> (vwap _),
    "ts_rsi" -> (rsi _),
    "ts_bollinger" -> (bollinger _),
    "ts_sma_crossover" -> (smaCrossover _),
    "ts_ohlc_bars" -> (ohlcBars _),
    "ts_drawdown" -> (drawdown _),
    "ts_periodogram_frozen" -> (periodogramFrozen _),
    "ts_peak_days" -> (peakDays _),
    "ts_sax_symbols" -> (saxSymbols _),
    "ts_pacf_frozen" -> (pacfFrozen _),
    "ts_seasonal_strength" -> (seasonalStrength _),
    "ts_haar_energy" -> (haarEnergy _),
    "ts_new_returning" -> (newReturning _),
    "ts_clamped_balance" -> (clampedBalance _),
    "ts_twap" -> (twap _),
    "ts_theil_sen" -> (theilSen _),
    "ts_mann_kendall" -> (mannKendall _),
    "ts_hurst_rs" -> (hurstRs _),
    "stats_runs_test" -> (runsTest _),
    "stats_ljung_box" -> (ljungBox _),
    "ts_pinball_loss" -> (pinballLoss _),
    "ts_croston" -> (croston _),
    "ts_seasonal_decompose" -> (seasonalDecompose _),
    "ts_kaplan_meier" -> (kaplanMeier _),
    "ts_mom_growth" -> (momGrowth _),
    "ts_wau_daily" -> (wauDaily _),
    "ts_sessionize" -> (sessionize _),
    "ts_holt_linear" -> (holtLinear _),
    "ts_interarrival" -> (interarrival _),
    "ts_page_cusum" -> (pageCusum _),
    "ts_autocorr" -> (autocorr _),
    "ts_cusum_changepoint" -> (cusumChangepoint _),
    "ts_trend_slope" -> (trendSlope _),
    "ts_anomaly_zscore" -> (anomalyZscore _),
    "ts_seasonal_dow" -> (seasonalDow _),
    "etl_scd2_history" -> (scd2History _),
    "ts_asof_snapshot" -> (asofSnapshot _),
    "ts_gapfill_daily" -> (gapfillDaily _),
    "stream_transition_matrix" -> (transitionMatrix _),
    "ts_ewma" -> (ewma _),
    "ts_concurrent_intervals" -> (concurrentIntervals _),
  )

  /** Shared oracle CTE: the gap-filled daily integer-dollar series with
    * a dense 0-based index — mirrors [[dailyRevenueSeries]] exactly.
    */
  private val seriesCte: String =
    """dd AS (SELECT CAST(o_orderdate AS DATE) AS day,
      |   CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS x
      |  FROM orders GROUP BY 1),
      | bnd AS (SELECT min(day) AS d0, max(day) AS d1 FROM dd),
      | sp AS (SELECT unnest(generate_series((SELECT d0 FROM bnd),
      |     (SELECT d1 FROM bnd), INTERVAL 1 DAY))::DATE AS day),
      | ser AS (SELECT datediff('day', (SELECT d0 FROM bnd), sp.day) AS i,
      |   sp.day, coalesce(dd.x, 0) AS x
      |  FROM sp LEFT JOIN dd USING (day))""".stripMargin

  val oracles: Map[String, String] = Map(
    // same e6-floor transition matrix, same 8 unrolled integer
    // first-step rounds with the absorbing-purchase clamp
    "stream_markov_hitting" -> {
      def round(i: Int): String =
        s"""h$i AS MATERIALIZED (SELECT p.prev AS state,
           |   CASE WHEN p.prev = 'purchase' THEN CAST(0 AS BIGINT)
           |     ELSE 1000000 + CAST(sum(p.p_e6 * coalesce(h.h_e6, 0))
           |       AS BIGINT) // 1000000 END AS h_e6
           |  FROM pm p LEFT JOIN h${i - 1} h ON p.nxt = h.state
           |  GROUP BY 1)""".stripMargin
      s"""WITH tr AS (SELECT prev, nxt, CAST(count(*) AS BIGINT) AS n FROM (
        |   SELECT lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev,
        |     event_type AS nxt FROM events)
        |  WHERE prev IS NOT NULL GROUP BY 1, 2),
        | pm AS MATERIALIZED (SELECT t.prev, t.nxt,
        |    (t.n * 1000000) // r.tot AS p_e6
        |   FROM tr t JOIN (SELECT prev, CAST(sum(n) AS BIGINT) AS tot
        |     FROM tr GROUP BY 1) r USING (prev)),
        | h0 AS (SELECT DISTINCT prev AS state, CAST(0 AS BIGINT) AS h_e6
        |   FROM pm),
        | ${(1 to 8).map(round).mkString(",\n ")},
        | mass AS (SELECT prev AS state, CAST(sum(p_e6) AS BIGINT)
        |    AS p_out_e6 FROM pm GROUP BY 1)
        |SELECT h8.state, mass.p_out_e6, h8.h_e6
        |FROM h8 JOIN mass USING (state) ORDER BY state""".stripMargin
    },
    // same calendar-month lag, same censoring rule, same common-origin
    // factor sums and e6 floors
    "ts_chain_ladder" ->
      """WITH li AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS origin,
        |   greatest(0, least(5, CAST(year(l_shipdate) * 12
        |     + month(l_shipdate) - year(o_orderdate) * 12
        |     - month(o_orderdate) AS BIGINT))) AS dev,
        |   CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        | ao AS (SELECT max(CAST(l_shipdate AS DATE)) AS aod
        |   FROM lineitem),
        | cells AS (SELECT origin, dev, CAST(sum(cents) AS BIGINT) AS inc
        |  FROM li GROUP BY 1, 2),
        | cum AS (SELECT origin, dev,
        |   CAST(sum(inc) OVER (PARTITION BY origin ORDER BY dev
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS c
        |  FROM cells),
        | obs AS (SELECT cum.* FROM cum CROSS JOIN ao
        |  WHERE make_date(CAST(origin + 1 AS INT), 1, 1)
        |    + INTERVAL (dev) MONTH <= aod)
        |SELECT a.dev, CAST(count(*) AS BIGINT) AS n_origins,
        | CAST(sum(a.c) AS BIGINT) AS sum_c_j,
        | CAST(sum(b.c) AS BIGINT) AS sum_c_j1,
        | (CAST(sum(b.c) AS BIGINT) * 1000000) // CAST(sum(a.c) AS BIGINT)
        |   AS f_e6
        |FROM obs a JOIN obs b ON a.origin = b.origin AND a.dev + 1 = b.dev
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // same two nearest-rank picks, same published 0.6745/3.5
    // constants, same mirrored e6 M per day
    "ts_anomaly_mad" ->
      (s"""WITH $seriesCte,
        | n1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ser),
        | r1 AS (SELECT x, row_number() OVER (ORDER BY x, i) AS rk FROM ser),
        | med AS (SELECT min(CASE WHEN rk >= (n + 1) // 2 THEN x END)
        |    AS med FROM r1 CROSS JOIN n1),
        | dev AS (SELECT ser.i, ser.x, med.med,
        |    abs(ser.x - med.med) AS ad FROM ser CROSS JOIN med),
        | r2 AS (SELECT ad, row_number() OVER (ORDER BY ad, i) AS rk2
        |   FROM dev),
        | mad AS (SELECT min(CASE WHEN rk2 >= (n + 1) // 2 THEN ad END)
        |    AS mad FROM r2 CROSS JOIN n1),
        | m AS (SELECT dev.x, dev.med, mad.mad,
        |   CASE WHEN mad.mad > 0 THEN
        |     CAST(round(1e6 * 0.6745 * CAST(dev.x - dev.med AS DOUBLE)
        |       / CAST(mad.mad AS DOUBLE)) AS BIGINT)
        |    ELSE 0 END AS m_e6
        |  FROM dev CROSS JOIN mad)
        |SELECT CAST(count(*) AS BIGINT) AS n_days,
        | CAST(max(med) AS BIGINT) AS med_x,
        | CAST(max(mad) AS BIGINT) AS mad_x,
        | CAST(sum(CASE WHEN abs(m_e6) > 3500000 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_flagged,
        | CAST(max(abs(m_e6)) AS BIGINT) AS max_m_e6,
        | CAST(sum(CASE WHEN abs(m_e6) > 3500000 THEN x ELSE 0 END)
        |   AS BIGINT) AS flagged_x_sum
        |FROM m""".stripMargin),
    // the fold's IEEE op sequence written identically step for step:
    // same init recipe, same pre-update error, same e2 lattice
    "ts_holt_winters_frozen" -> {
      val sj = "(CASE s.i % 7 WHEN 0 THEN r.s0 WHEN 1 THEN r.s1" +
        " WHEN 2 THEN r.s2 WHEN 3 THEN r.s3 WHEN 4 THEN r.s4" +
        " WHEN 5 THEN r.s5 ELSE r.s6 END)"
      val xd = "CAST(s.x AS DOUBLE)"
      val lNew = s"(0.5 * ($xd - $sj) + 0.5 * (r.l + r.b))"
      val e2 = s"CAST(round(($xd - (r.l + r.b + $sj)) * 100.0) AS BIGINT)"
      val sCols = (0 to 6).map(j =>
        s"CASE WHEN s.i % 7 = $j THEN 0.25 * ($xd - $lNew) + 0.75 * r.s$j" +
          s" ELSE r.s$j END AS s$j").mkString(",\n        |    ")
        .replace("|", "")
      s"""WITH RECURSIVE $seriesCte,
        | x7 AS (SELECT ${(0 to 6).map(j =>
             s"max(CASE WHEN i = $j THEN x END) AS x$j").mkString(", ")}
        |   FROM ser WHERE i < 7),
        | init AS (SELECT l, ${(0 to 6).map(j =>
             s"CAST(x$j AS DOUBLE) - l AS s$j").mkString(", ")}
        |  FROM (SELECT (CAST(x0 AS DOUBLE) + x1 + x2 + x3 + x4 + x5 + x6)
        |      / 7.0 AS l, * FROM x7)),
        | r AS (
        |  SELECT CAST(6 AS BIGINT) AS i, l, CAST(0.0 AS DOUBLE) AS b,
        |    s0, s1, s2, s3, s4, s5, s6,
        |    CAST(0 AS BIGINT) AS sum_abs, CAST(0 AS BIGINT) AS max_abs,
        |    CAST(0 AS BIGINT) AS n
        |  FROM init
        |  UNION ALL
        |  SELECT s.i, $lNew AS l,
        |    0.25 * ($lNew - r.l) + 0.75 * r.b AS b,
        |    $sCols,
        |    r.sum_abs + abs($e2), greatest(r.max_abs, abs($e2)), r.n + 1
        |  FROM ser s JOIN r ON s.i = r.i + 1)
        |SELECT n AS n_steps, sum_abs AS sum_abs_err_e2,
        | max_abs AS max_abs_err_e2,
        | CAST(round(l * 100.0) AS BIGINT) AS level_e2,
        | CAST(round(b * 100.0) AS BIGINT) AS trend_e2
        |FROM r ORDER BY i DESC LIMIT 1""".stripMargin
    },
    // same frozen 30-day baseline, same mirrored s2/n − m² z finish,
    // same e6 integer zone thresholds and literal 8-row domain
    "ts_xbar_control" ->
      (s"""WITH $seriesCte,
        | base AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS s1,
        |    CAST(sum(x * x) AS BIGINT) AS s2
        |   FROM ser WHERE i < 30),
        | z AS (SELECT ser.x,
        |   CAST(round(1e6 * (CAST(ser.x AS DOUBLE)
        |       - CAST(b.s1 AS DOUBLE) / CAST(b.n AS DOUBLE)) /
        |     sqrt((CAST(b.s2 AS DOUBLE) / CAST(b.n AS DOUBLE) -
        |       (CAST(b.s1 AS DOUBLE) / CAST(b.n AS DOUBLE)) *
        |       (CAST(b.s1 AS DOUBLE) / CAST(b.n AS DOUBLE))) *
        |      (CAST(b.n AS DOUBLE) / CAST(b.n - 1 AS DOUBLE))))
        |    AS BIGINT) AS z_e6
        |  FROM ser CROSS JOIN base b),
        | zoned AS (SELECT
        |   CASE WHEN z_e6 >= 0 THEN 'hi' ELSE 'lo' END AS side,
        |   CASE WHEN abs(z_e6) >= 3000000 THEN 'beyond_3s'
        |     WHEN abs(z_e6) >= 2000000 THEN 'zone_a'
        |     WHEN abs(z_e6) >= 1000000 THEN 'zone_b'
        |     ELSE 'zone_c' END AS zone, x FROM z),
        | dom AS (SELECT s.side, zn.zone
        |   FROM (SELECT unnest(['hi', 'lo']) AS side) s,
        |    (SELECT unnest(['beyond_3s', 'zone_a', 'zone_b', 'zone_c'])
        |      AS zone) zn),
        | cen AS (SELECT side, zone, CAST(count(*) AS BIGINT) AS nd,
        |    CAST(sum(x) AS BIGINT) AS sx FROM zoned GROUP BY 1, 2)
        |SELECT dom.side, dom.zone,
        | coalesce(cen.nd, 0) AS n_days, coalesce(cen.sx, 0) AS sum_x
        |FROM dom LEFT JOIN cen USING (side, zone)
        |ORDER BY side, zone""".stripMargin),
    // bitwise replay of both EWMA folds via a recursive CTE — the
    // ts_ewma discipline on the (z, p) pair
    "ts_croston" ->
      """WITH RECURSIVE dd AS (SELECT o_orderpriority AS prio,
        |    CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS x
        |   FROM orders GROUP BY 1, 2),
        | d0 AS (SELECT min(CAST(o_orderdate AS DATE)) AS dmin FROM orders),
        | sq AS (SELECT prio,
        |    CAST(datediff('day', dmin, day) + 1 AS BIGINT) AS idx, x,
        |    row_number() OVER (PARTITION BY prio ORDER BY day) AS rn
        |   FROM dd, d0),
        | r AS (
        |  SELECT prio, rn, idx, x::DOUBLE AS z, idx::DOUBLE AS p
        |  FROM sq WHERE rn = 1
        |  UNION ALL
        |  SELECT s.prio, s.rn, s.idx,
        |   r.z + 0.5 * (s.x::DOUBLE - r.z),
        |   r.p + 0.5 * ((s.idx - r.idx)::DOUBLE - r.p)
        |  FROM sq s JOIN r ON s.prio = r.prio AND s.rn = r.rn + 1),
        | fin AS (SELECT prio, max(rn) AS n FROM r GROUP BY 1)
        |SELECT r.prio AS o_orderpriority,
        | CAST(fin.n AS BIGINT) AS n_demand_days,
        | round(r.z, 4) + 0.0 AS z_final, round(r.p, 4) + 0.0 AS p_final,
        | round(r.z / r.p, 4) + 0.0 AS croston_rate
        |FROM r JOIN fin ON r.prio = fin.prio AND r.rn = fin.n
        |ORDER BY o_orderpriority""".stripMargin,
    // same x10 integer pinball branches, same lag-7 join
    "ts_pinball_loss" ->
      (s"""WITH $seriesCte,
        | j AS (SELECT a.x - b.x AS e, t.tau10
        |  FROM ser a JOIN ser b ON a.i = b.i + 7,
        |   unnest([1, 5, 9]) t(tau10))
        |SELECT CAST(tau10 AS BIGINT) AS tau10,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(greatest(tau10 * e, (tau10 - 10) * e)) AS BIGINT)
        |   AS sum_loss_x10,
        | CAST(sum(greatest(tau10 * e, (tau10 - 10) * e)) AS BIGINT)
        |   // (10 * count(*)) AS mean_loss_usd
        |FROM j GROUP BY 1 ORDER BY tau10""".stripMargin),
    // same lag-join moments, per-lag e9 terms before the sum, one
    // mirrored Q off the exact term total
    "stats_ljung_box" ->
      (s"""WITH $seriesCte,
        | aa AS (SELECT i, x, k, i + k AS ti
        |  FROM ser, unnest([1, 2, 3, 4, 5, 6, 7]) t(k)),
        | byk AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
        |   CAST(sum(aa.x) AS BIGINT) AS sx, CAST(sum(b.x) AS BIGINT) AS sy,
        |   CAST(sum(aa.x * aa.x) AS BIGINT) AS sxx,
        |   CAST(sum(b.x * b.x) AS BIGINT) AS syy,
        |   CAST(sum(aa.x * b.x) AS BIGINT) AS sxy
        |  FROM aa JOIN ser b ON aa.ti = b.i GROUP BY 1),
        | rr AS (SELECT k, n,
        |   (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        |   / (sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
        |      * sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE))
        |     AS r FROM byk),
        | tm AS (SELECT k, n,
        |   CAST(round(1e9 * r * r / n::DOUBLE) AS BIGINT) AS term_e9
        |  FROM rr),
        | agg AS (SELECT
        |   CAST(max(CASE WHEN k = 1 THEN n END) + 1 AS BIGINT) AS n_days,
        |   CAST(sum(term_e9) AS BIGINT) AS sum_term_e9,
        |   max(CASE WHEN k = 1 THEN term_e9 END) AS t1,
        |   max(CASE WHEN k = 2 THEN term_e9 END) AS t2,
        |   max(CASE WHEN k = 3 THEN term_e9 END) AS t3,
        |   max(CASE WHEN k = 4 THEN term_e9 END) AS t4,
        |   max(CASE WHEN k = 5 THEN term_e9 END) AS t5,
        |   max(CASE WHEN k = 6 THEN term_e9 END) AS t6,
        |   max(CASE WHEN k = 7 THEN term_e9 END) AS t7
        |  FROM tm)
        |SELECT n_days, sum_term_e9, t1, t2, t3, t4, t5, t6, t7,
        | round(n_days::DOUBLE * (n_days + 2)::DOUBLE
        |   * sum_term_e9::DOUBLE / 1e9, 4) + 0.0 AS q_stat
        |FROM agg""".stripMargin),
    // same lower-median dichotomy, same flip count, one mirrored z
    "stats_runs_test" ->
      (s"""WITH $seriesCte,
        | nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ser),
        | vc AS (SELECT x, CAST(count(*) AS BIGINT) AS cnt
        |  FROM ser GROUP BY 1),
        | cm AS (SELECT x, CAST(sum(cnt) OVER (ORDER BY x
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM vc),
        | med AS (SELECT min(CASE WHEN cum >= (n + 1) // 2 THEN x END)
        |    AS med FROM cm, nn),
        | sg AS (SELECT i, CASE WHEN x > med THEN 1 ELSE 0 END AS sg
        |  FROM ser, med),
        | fl AS (SELECT CAST(sum(sg) AS BIGINT) AS n1,
        |    CAST(sum(1 - sg) AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN prev IS NOT NULL AND prev <> sg
        |      THEN 1 ELSE 0 END) + 1 AS BIGINT) AS runs
        |  FROM (SELECT sg, lag(sg) OVER (ORDER BY i) AS prev FROM sg)),
        | k AS (SELECT n1 + n2 AS n, n1, n2, runs, 2 * n1 * n2 AS two12
        |  FROM fl)
        |SELECT n AS n_days, n1, n2, runs,
        | round((runs::DOUBLE - (1.0 + two12::DOUBLE / n::DOUBLE))
        |  / sqrt(two12::DOUBLE * (two12 - n)::DOUBLE
        |     / (n::DOUBLE * n::DOUBLE * (n - 1)::DOUBLE)), 4) + 0.0 AS z
        |FROM k""".stripMargin),
    // identical block lattice, per-block e6 rounding before the mean,
    // one mirrored H off the e6 integers
    "ts_hurst_rs" ->
      s"""WITH $seriesCte,
        | xb AS (SELECT i, x // 100 AS x, w, (i // w) AS blk, i % w AS t
        |  FROM ser, unnest([16, 32, 64]) ws(w)),
        | zz AS (SELECT w, blk, i, t, x,
        |   count(*) OVER (PARTITION BY w, blk) AS nblk,
        |   CAST(sum(x) OVER (PARTITION BY w, blk) AS BIGINT) AS sblk,
        |   CAST(sum(x * x) OVER (PARTITION BY w, blk) AS BIGINT) AS ssq,
        |   CAST(sum(x) OVER (PARTITION BY w, blk ORDER BY i
        |     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM xb),
        | zf AS (SELECT w, blk, sblk, ssq,
        |   w * cum - (t + 1) * sblk AS z FROM zz WHERE nblk = w),
        | blocks AS (SELECT w, blk,
        |   CAST(max(z) - min(z) AS BIGINT) AS r_scaled,
        |   CAST(max(w * ssq - sblk * sblk) AS BIGINT) AS var_scaled
        |  FROM zf GROUP BY 1, 2),
        | rs AS (SELECT w,
        |   CAST(round(1e6 * r_scaled::DOUBLE / sqrt(var_scaled::DOUBLE))
        |     AS BIGINT) AS rs_e6
        |  FROM blocks WHERE var_scaled > 0),
        | byw AS (SELECT w, CAST(count(*) AS BIGINT) AS nb,
        |   CAST(sum(rs_e6) AS BIGINT) // count(*) AS rsbar_e6
        |  FROM rs GROUP BY 1),
        | p AS (SELECT
        |   max(CASE WHEN w = 16 THEN nb END) AS n16,
        |   max(CASE WHEN w = 16 THEN rsbar_e6 END) AS rs16_e6,
        |   max(CASE WHEN w = 32 THEN nb END) AS n32,
        |   max(CASE WHEN w = 32 THEN rsbar_e6 END) AS rs32_e6,
        |   max(CASE WHEN w = 64 THEN nb END) AS n64,
        |   max(CASE WHEN w = 64 THEN rsbar_e6 END) AS rs64_e6
        |  FROM byw)
        |SELECT n16, rs16_e6, n32, rs32_e6, n64, rs64_e6,
        | round(ln(rs64_e6::DOUBLE / rs16_e6::DOUBLE) / ln(4.0), 6) + 0.0
        |   AS h_est
        |FROM p""".stripMargin,
    // identical pair-sign sum, tie-corrected 18·Var, one mirrored z
    "ts_mann_kendall" ->
      s"""WITH $seriesCte,
        | p AS (SELECT CAST(sum(CASE WHEN bb.x > aa.x THEN 1
        |     WHEN bb.x < aa.x THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
        |  FROM ser aa JOIN ser bb ON aa.i < bb.i),
        | tt AS (SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)
        |     AS BIGINT) AS tie_term
        |  FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM ser
        |        GROUP BY x HAVING count(*) > 1)),
        | nn AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM ser)
        |SELECT n_days, s_stat,
        | n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS var18,
        | round((CASE WHEN s_stat > 0 THEN (s_stat - 1)::DOUBLE
        |    WHEN s_stat < 0 THEN (s_stat + 1)::DOUBLE ELSE 0.0 END)
        |  / sqrt((n_days * (n_days - 1) * (2 * n_days + 5) - tie_term)::DOUBLE
        |     / 18.0), 4) + 0.0 AS z
        |FROM nn, p, tt""".stripMargin,
    "ts_forecast_error" ->
      s"""WITH $seriesCte,
        | j AS (SELECT a.x, b.x AS xf FROM ser a JOIN ser b ON a.i = b.i + 7)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(abs(x - xf)) AS BIGINT) AS abs_err,
        | CAST(sum(abs(x)) AS BIGINT) AS abs_actual,
        | CAST(sum(x - xf) AS BIGINT) AS bias,
        | round(sum(abs(x - xf))::DOUBLE / sum(abs(x))::DOUBLE, 6) + 0.0 AS wape,
        | round(sum(abs(x - xf))::DOUBLE / count(*)::DOUBLE, 4) + 0.0 AS mae
        |FROM j""".stripMargin,
    "ts_crosscorr" ->
      """WITH dd AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS x,
        |   CAST(count(*) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        | bnd AS (SELECT min(day) AS d0, max(day) AS d1 FROM dd),
        | sp AS (SELECT unnest(generate_series((SELECT d0 FROM bnd),
        |     (SELECT d1 FROM bnd), INTERVAL 1 DAY))::DATE AS day),
        | ser AS (SELECT datediff('day', (SELECT d0 FROM bnd), sp.day) AS i,
        |   coalesce(dd.x, 0) AS x, coalesce(dd.y, 0) AS y
        |  FROM sp LEFT JOIN dd USING (day)),
        | lags AS (SELECT unnest(range(-7, 8)) AS k),
        | j AS (SELECT l.k, a.x, b.y
        |  FROM ser a CROSS JOIN lags l JOIN ser b ON b.i = a.i + l.k),
        | g AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM j GROUP BY k)
        |SELECT CAST(k AS BIGINT) AS k, n,
        | CASE WHEN sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
        |     * sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE) = 0
        |   THEN 0.0
        |   ELSE round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        |     / (sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
        |       * sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)), 6)
        |     + 0.0 END AS xcorr
        |FROM g ORDER BY k""".stripMargin,
    "ts_vwap" ->
      """SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS month,
        | CAST(count(*) AS BIGINT) AS n_items,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |   AS price_c,
        | CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty_sum,
        | round(sum(CAST(round(l_extendedprice * 100) AS BIGINT))::DOUBLE
        |   / 100.0 / sum(CAST(round(l_quantity) AS BIGINT))::DOUBLE, 4) + 0.0
        |   AS vwap
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "ts_rsi" ->
      s"""WITH RECURSIVE $seriesCte,
        | d AS (SELECT i, day, x - lag(x) OVER (ORDER BY i) AS dx FROM ser),
        | win AS (SELECT i, day,
        |    CAST(sum(greatest(dx, 0)) OVER (ORDER BY i
        |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT) AS gain_sum,
        |    CAST(sum(greatest(-dx, 0)) OVER (ORDER BY i
        |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT) AS loss_sum
        |  FROM d WHERE dx IS NOT NULL)
        |SELECT strftime(day, '%Y-%m-%d') AS day, gain_sum, loss_sum,
        | CASE WHEN gain_sum + loss_sum = 0 THEN 50.0
        |      ELSE round(100.0 * gain_sum::DOUBLE
        |        / (gain_sum + loss_sum)::DOUBLE, 4) + 0.0 END AS rsi
        |FROM win WHERE i >= 14 ORDER BY day""".stripMargin,
    "ts_bollinger" ->
      s"""WITH RECURSIVE $seriesCte,
        | w AS (SELECT i, day, x,
        |    CAST(count(*) OVER tw AS BIGINT) AS n,
        |    CAST(sum(x) OVER tw AS BIGINT) AS sx,
        |    CAST(sum(x * x) OVER tw AS BIGINT) AS qx
        |  FROM ser WINDOW tw AS (ORDER BY i
        |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
        |SELECT strftime(day, '%Y-%m-%d') AS day, x,
        | round(sx::DOUBLE / 20, 4) + 0.0 AS mean,
        | round(sqrt((n * qx - sx * sx)::DOUBLE) / 20, 4) + 0.0 AS sigma,
        | n * x - sx > 0 AND (n * x - sx) * (n * x - sx) > 4 * (n * qx - sx * sx)
        |   AS breakout_hi
        |FROM w WHERE i >= 19 ORDER BY day""".stripMargin,
    "ts_sma_crossover" ->
      s"""WITH RECURSIVE $seriesCte,
        | sums AS (SELECT i, day,
        |    CAST(sum(x) OVER (ORDER BY i
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS s7,
        |    CAST(sum(x) OVER (ORDER BY i
        |      ROWS BETWEEN 27 PRECEDING AND CURRENT ROW) AS BIGINT) AS s28
        |  FROM ser),
        | c AS (SELECT i, day, 4 * s7 - s28 AS c FROM sums WHERE i >= 27),
        | f AS (SELECT *, lag(c) OVER (ORDER BY i) AS c_prev FROM c)
        |SELECT strftime(day, '%Y-%m-%d') AS day,
        | CASE WHEN c > 0 THEN 'golden' ELSE 'death' END AS signal, c_prev, c
        |FROM f WHERE c_prev IS NOT NULL AND (c > 0) <> (c_prev > 0)
        |ORDER BY day""".stripMargin,
    "ts_ohlc_bars" ->
      """WITH daily AS (SELECT o_orderpriority AS prio,
        |    CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS tot_c,
        |    strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month
        |   FROM orders GROUP BY 1, 2, 4),
        | bars AS (SELECT prio, month, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(max(tot_c) AS BIGINT) AS high_c,
        |    CAST(min(tot_c) AS BIGINT) AS low_c,
        |    min(day) AS open_day, max(day) AS close_day
        |   FROM daily GROUP BY 1, 2)
        |SELECT bars.prio, bars.month, bars.n_days,
        | o.tot_c AS open_c, bars.high_c, bars.low_c, c.tot_c AS close_c
        |FROM bars
        |JOIN daily o ON o.prio = bars.prio AND o.day = bars.open_day
        |JOIN daily c ON c.prio = bars.prio AND c.day = bars.close_day
        |ORDER BY bars.prio, bars.month""".stripMargin,
    // first-month MIN per customer, then the monthly census with the
    // new/returning equality split
    "ts_new_returning" ->
      """WITH cm AS (SELECT DISTINCT o_custkey,
        |   CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
        |     AS mk FROM orders),
        | f AS (SELECT o_custkey, min(mk) AS first_mk FROM cm GROUP BY 1),
        | g AS (SELECT mk, CAST(count(*) AS BIGINT) AS n_active,
        |    CAST(sum(CASE WHEN mk = first_mk THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_new
        |  FROM cm JOIN f USING (o_custkey) GROUP BY mk)
        |SELECT CAST(mk // 12 AS VARCHAR) || '-' ||
        |  lpad(CAST(mk % 12 + 1 AS VARCHAR), 2, '0') AS month,
        | n_active, n_new,
        | CAST(n_active - n_new AS BIGINT) AS n_returning
        |FROM g ORDER BY month""".stripMargin,
    // integer Haar: sign-sums on the hundred-dollar lattice, dyadic
    // windows keyed by t div 2^L, partial tails included as-is
    "ts_haar_energy" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice) AS BIGINT)) // 100 AS BIGINT)
        |     AS h
        |  FROM orders GROUP BY 1),
        | t0 AS (SELECT min(day) AS d0 FROM daily),
        | dt AS (SELECT h, CAST(datediff('day', d0, day) AS BIGINT) AS t
        |  FROM daily CROSS JOIN t0),
        | lv AS (SELECT h, t, CAST(unnest([1, 2, 3]) AS BIGINT) AS lvl
        |  FROM dt),
        | sg AS (SELECT lvl, t // (1 << lvl) AS w,
        |    CASE WHEN t % (1 << lvl) < (1 << (lvl - 1)) THEN h ELSE -h END
        |      AS sh
        |  FROM lv),
        | dc AS (SELECT lvl, w, CAST(sum(sh) AS BIGINT) AS dcoef
        |  FROM sg GROUP BY 1, 2)
        |SELECT lvl, CAST(count(*) AS BIGINT) AS n_windows,
        | CAST(sum(dcoef * dcoef) AS BIGINT) AS energy,
        | CAST(max(abs(dcoef)) AS BIGINT) AS max_abs
        |FROM dc GROUP BY 1 ORDER BY lvl""".stripMargin,
    // identical stencil/dow lattice, per-row whole-dollar rounding,
    // one mirrored F from exact moments
    "ts_seasonal_strength" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        | b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        | ser AS (SELECT datediff('day', s.d0, s.day) AS i,
        |   CAST(coalesce(d.x, 0) AS BIGINT) AS x
        |  FROM (SELECT d0, CAST(unnest(generate_series(d0, d1,
        |     INTERVAL 1 DAY)) AS DATE) AS day FROM b) s
        |  LEFT JOIN daily d ON s.day = d.day),
        | win AS (SELECT a.i + off AS i, CAST(count(*) AS BIGINT) AS c7,
        |   CAST(sum(a.x) AS BIGINT) AS sum7
        |  FROM ser a, unnest([-3, -2, -1, 0, 1, 2, 3]) t(off)
        |  GROUP BY 1 HAVING count(*) = 7),
        | j AS (SELECT win.i, 7 * ser.x - win.sum7 AS detr_e,
        |   win.i % 7 AS dow FROM win JOIN ser ON win.i = ser.i),
        | dw AS (SELECT dow, CAST(sum(detr_e) AS BIGINT) AS sd,
        |   CAST(count(*) AS BIGINT) AS cnt FROM j GROUP BY 1),
        | r AS (SELECT
        |   CAST(round(detr_e::DOUBLE / 7.0) AS BIGINT) AS detr_r,
        |   CAST(round((cnt * detr_e - sd)::DOUBLE / (cnt::DOUBLE * 7.0))
        |     AS BIGINT) AS rem_r
        |  FROM j JOIN dw ON j.dow = dw.dow),
        | a AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
        |   CAST(sum(detr_r) AS BIGINT) AS s_d,
        |   CAST(sum(detr_r * detr_r) AS BIGINT) AS ss_d,
        |   CAST(sum(rem_r) AS BIGINT) AS s_r,
        |   CAST(sum(rem_r * rem_r) AS BIGINT) AS ss_r FROM r)
        |SELECT n_days, s_d, ss_d, s_r, ss_r,
        | round(greatest(0.0, 1.0
        |   - (n_days::DOUBLE * ss_r::DOUBLE - s_r::DOUBLE * s_r::DOUBLE)
        |   / (n_days::DOUBLE * ss_d::DOUBLE - s_d::DOUBLE * s_d::DOUBLE)), 6)
        |  + 0.0 AS strength
        |FROM a""".stripMargin,
    // same per-lag Pearson moments, same Durbin-Levinson closed forms —
    // one mirrored double expression per emitted statistic
    "ts_pacf_frozen" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |     // 1000000 AS v
        |  FROM orders GROUP BY 1),
        | b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        | spine AS (SELECT d0, CAST(unnest(generate_series(d0, d1,
        |    INTERVAL 1 DAY)) AS DATE) AS day FROM b),
        | ser AS (SELECT datediff('day', s.d0, s.day) AS i,
        |   CAST(coalesce(d.v, 0) AS BIGINT) AS v
        |  FROM spine s LEFT JOIN daily d ON s.day = d.day),
        | byk AS (SELECT k, CAST(count(*) AS BIGINT) AS nk,
        |   CAST(sum(a.v) AS BIGINT) AS sa, CAST(sum(c.v) AS BIGINT) AS sb,
        |   CAST(sum(a.v * a.v) AS BIGINT) AS saa,
        |   CAST(sum(c.v * c.v) AS BIGINT) AS sbb,
        |   CAST(sum(a.v * c.v) AS BIGINT) AS sab
        |  FROM ser a, unnest([0, 1, 2, 3]) t(k), ser c
        |  WHERE c.i = a.i + k GROUP BY 1),
        | w AS (SELECT
        |   max(CASE WHEN k = 0 THEN nk END) AS nk0,
        |   max(CASE WHEN k = 1 THEN nk END) AS nk1,
        |   max(CASE WHEN k = 1 THEN sa END) AS sa1,
        |   max(CASE WHEN k = 1 THEN sb END) AS sb1,
        |   max(CASE WHEN k = 1 THEN saa END) AS saa1,
        |   max(CASE WHEN k = 1 THEN sbb END) AS sbb1,
        |   max(CASE WHEN k = 1 THEN sab END) AS sab1,
        |   max(CASE WHEN k = 2 THEN nk END) AS nk2,
        |   max(CASE WHEN k = 2 THEN sa END) AS sa2,
        |   max(CASE WHEN k = 2 THEN sb END) AS sb2,
        |   max(CASE WHEN k = 2 THEN saa END) AS saa2,
        |   max(CASE WHEN k = 2 THEN sbb END) AS sbb2,
        |   max(CASE WHEN k = 2 THEN sab END) AS sab2,
        |   max(CASE WHEN k = 3 THEN nk END) AS nk3,
        |   max(CASE WHEN k = 3 THEN sa END) AS sa3,
        |   max(CASE WHEN k = 3 THEN sb END) AS sb3,
        |   max(CASE WHEN k = 3 THEN saa END) AS saa3,
        |   max(CASE WHEN k = 3 THEN sbb END) AS sbb3,
        |   max(CASE WHEN k = 3 THEN sab END) AS sab3
        |  FROM byk),
        | r AS (SELECT nk0,
        |   (nk1::DOUBLE * sab1::DOUBLE - sa1::DOUBLE * sb1::DOUBLE)
        |    / (sqrt(nk1::DOUBLE * saa1::DOUBLE - sa1::DOUBLE * sa1::DOUBLE)
        |     * sqrt(nk1::DOUBLE * sbb1::DOUBLE - sb1::DOUBLE * sb1::DOUBLE))
        |    AS r1,
        |   (nk2::DOUBLE * sab2::DOUBLE - sa2::DOUBLE * sb2::DOUBLE)
        |    / (sqrt(nk2::DOUBLE * saa2::DOUBLE - sa2::DOUBLE * sa2::DOUBLE)
        |     * sqrt(nk2::DOUBLE * sbb2::DOUBLE - sb2::DOUBLE * sb2::DOUBLE))
        |    AS r2,
        |   (nk3::DOUBLE * sab3::DOUBLE - sa3::DOUBLE * sb3::DOUBLE)
        |    / (sqrt(nk3::DOUBLE * saa3::DOUBLE - sa3::DOUBLE * sa3::DOUBLE)
        |     * sqrt(nk3::DOUBLE * sbb3::DOUBLE - sb3::DOUBLE * sb3::DOUBLE))
        |    AS r3
        |  FROM w),
        | p AS (SELECT nk0, r1, r2, r3,
        |   (r2 - r1 * r1) / (1.0 - r1 * r1) AS phi22,
        |   r1 * (1.0 - r2) / (1.0 - r1 * r1) AS phi21
        |  FROM r)
        |SELECT nk0 AS n_days,
        | round(r1, 6) + 0.0 AS rho1, round(r2, 6) + 0.0 AS rho2,
        | round(r3, 6) + 0.0 AS rho3,
        | round(r1, 6) + 0.0 AS pacf1, round(phi22, 6) + 0.0 AS pacf2,
        | round((r3 - phi21 * r2 - phi22 * r1)
        |   / (1.0 - phi21 * r1 - phi22 * r2), 6) + 0.0 AS pacf3
        |FROM p""".stripMargin,
    // exact lattice moments, ONE rounded sqrt, integer breakpoint
    // compares; weeks keyed by epoch-day div 7 (engine-neutral)
    "ts_sax_symbols" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |     // 10000 AS v
        |  FROM orders GROUP BY 1),
        | m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |   CAST(sum(v) AS BIGINT) AS sv,
        |   CAST(round(sqrt((CAST(count(*) AS BIGINT) * sum(v * v)
        |     - sum(v) * sum(v))::DOUBLE)) AS BIGINT) AS s_scaled
        |  FROM daily),
        | sym AS (SELECT day,
        |   datediff('day', DATE '1970-01-01', day) // 7 AS week,
        |   CASE WHEN (n * v - sv) * 100 < s_scaled * -67 THEN 'a'
        |    WHEN n * v - sv < 0 THEN 'b'
        |    WHEN (n * v - sv) * 100 < s_scaled * 67 THEN 'c'
        |    ELSE 'd' END AS sy
        |  FROM daily CROSS JOIN m)
        |SELECT week, CAST(count(*) AS BIGINT) AS n_days,
        | string_agg(sy, '' ORDER BY day) AS sax_word
        |FROM sym GROUP BY week ORDER BY week""".stripMargin,
    // strict 3-point local max + the scale-free 150%-of-integer-mean
    // prominence floor, all exact integers
    "ts_peak_days" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS v
        |  FROM orders GROUP BY 1),
        | m AS (SELECT CAST((3 * (sum(v) // count(*))) // 2 AS BIGINT)
        |    AS floor150 FROM daily),
        | lagd AS (SELECT day, v,
        |    lag(v) OVER (ORDER BY day) AS pv,
        |    lead(v) OVER (ORDER BY day) AS nv
        |  FROM daily)
        |SELECT strftime(day, '%Y-%m-%d') AS day, v,
        | CAST(v - floor150 AS BIGINT) AS excess
        |FROM lagd CROSS JOIN m
        |WHERE pv IS NOT NULL AND nv IS NOT NULL AND v > pv AND v > nv
        | AND v > floor150
        |ORDER BY day""".stripMargin,
    // the 7 phase constants are published integers; harmonic k reads
    // the same table at phase (k*t) mod 7 — no trig in the hash path
    "ts_periodogram_frozen" ->
      """WITH tg AS (SELECT k, ph, c, sn FROM (VALUES
        |   (1, 0, 1000000, 0), (1, 1, 623490, 781831), (1, 2, -222521, 974928),
        |   (1, 3, -900969, 433884), (1, 4, -900969, -433884),
        |   (1, 5, -222521, -974928), (1, 6, 623490, -781831),
        |   (2, 0, 1000000, 0), (2, 1, 623490, 781831), (2, 2, -222521, 974928),
        |   (2, 3, -900969, 433884), (2, 4, -900969, -433884),
        |   (2, 5, -222521, -974928), (2, 6, 623490, -781831),
        |   (3, 0, 1000000, 0), (3, 1, 623490, 781831), (3, 2, -222521, 974928),
        |   (3, 3, -900969, 433884), (3, 4, -900969, -433884),
        |   (3, 5, -222521, -974928), (3, 6, 623490, -781831))
        |  t(k, ph, c, sn)),
        | daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        | dt AS (SELECT x, CAST(datediff('day', DATE '1970-01-01', day)
        |    AS BIGINT) AS t FROM daily),
        | mm AS (SELECT CAST(sum(x) // count(*) AS BIGINT) AS m FROM dt),
        | j AS (SELECT tg.k, (dt.x - mm.m) AS xc, tg.c, tg.sn
        |  FROM dt CROSS JOIN mm
        |  JOIN tg ON (dt.t * tg.k) % 7 = tg.ph)
        |SELECT CAST(k AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n_days,
        | CAST(sum(xc * c) AS BIGINT) AS re_e6,
        | CAST(sum(xc * sn) AS BIGINT) AS im_e6,
        | round(sqrt((CAST(sum(xc * c) AS BIGINT))::DOUBLE
        |     * (CAST(sum(xc * c) AS BIGINT))::DOUBLE
        |   + (CAST(sum(xc * sn) AS BIGINT))::DOUBLE
        |     * (CAST(sum(xc * sn) AS BIGINT))::DOUBLE) / 1e6, 2) + 0.0 AS amp
        |FROM j GROUP BY 1 ORDER BY k""".stripMargin,
    "ts_drawdown" ->
      """WITH daily AS (SELECT o_orderpriority AS prio,
        |    CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum((CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE -1 END)
        |      * CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS flow_c
        |   FROM orders GROUP BY 1, 2),
        | c AS (SELECT prio, day, flow_c,
        |    CAST(sum(flow_c) OVER (PARTITION BY prio ORDER BY day) AS BIGINT) AS cum
        |   FROM daily),
        | cd AS (SELECT *, CAST(max(cum) OVER (PARTITION BY prio ORDER BY day)
        |    - cum AS BIGINT) AS dd FROM c),
        | heads AS (SELECT prio, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(max(cum) AS BIGINT) AS peak_c,
        |    CAST(max(dd) AS BIGINT) AS max_drawdown_c
        |   FROM cd GROUP BY 1),
        | pk AS (SELECT cd.prio, min(cd.day) AS peak_day_raw
        |   FROM cd JOIN heads ON cd.prio = heads.prio AND cd.cum = heads.peak_c
        |   GROUP BY 1)
        |SELECT heads.prio, heads.n_days, heads.peak_c, heads.max_drawdown_c,
        | strftime(pk.peak_day_raw, '%Y-%m-%d') AS peak_day
        |FROM heads JOIN pk ON heads.prio = pk.prio ORDER BY heads.prio""".stripMargin,
    "ts_clamped_balance" ->
      """WITH d AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum((CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE -1 END)
        |      * CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS net_c
        |   FROM orders GROUP BY 1, 2),
        | p AS (SELECT *, CAST(sum(net_c) OVER (PARTITION BY o_custkey
        |      ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS s FROM d)
        |SELECT o_custkey, strftime(day, '%Y-%m-%d') AS day, net_c,
        | CAST(s - least(0, min(s) OVER (PARTITION BY o_custkey ORDER BY day
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS BIGINT)
        |   AS stock_c
        |FROM p ORDER BY o_custkey, day""".stripMargin,
    "ts_twap" ->
      """WITH o AS (SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
        |    o_orderkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        | lk AS (SELECT o_orderpriority, day,
        |    max(o_orderkey) AS o_orderkey FROM o GROUP BY 1, 2),
        | daily AS (SELECT o.o_orderpriority, o.day, o.cents
        |   FROM lk JOIN o USING (o_orderpriority, day, o_orderkey)),
        | g AS (SELECT *, CAST(coalesce(datediff('day', day,
        |      lead(day) OVER (PARTITION BY o_orderpriority
        |        ORDER BY day)), 1) AS BIGINT) AS gap
        |   FROM daily)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_days,
        | CAST(sum(cents * gap) AS BIGINT) AS twap_num,
        | CAST(sum(gap) AS BIGINT) AS twap_den,
        | round(sum(cents * gap)::DOUBLE / sum(gap) / 100, 4) + 0.0 AS twap
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    "ts_theil_sen" ->
      s"""WITH $seriesCte,
         | p AS (SELECT (b.x - a.x)::DOUBLE / (b.i - a.i) AS slope
         |   FROM ser a JOIN ser b ON a.i < b.i)
         |SELECT (SELECT count(*) FROM ser) AS n_days,
         | count(*) AS n_pairs,
         | round(quantile_cont(slope, 0.5), 4) AS ts_slope
         |FROM p""".stripMargin,
    "ts_seasonal_decompose" ->
      s"""WITH $seriesCte,
         | win AS (SELECT s.i + off AS i, count(*) AS c7,
         |    CAST(sum(s.x) AS BIGINT) AS sum7
         |  FROM ser s CROSS JOIN (SELECT unnest([-3,-2,-1,0,1,2,3]) AS off)
         |  GROUP BY 1 HAVING count(*) = 7),
         | j AS (SELECT w.i, ser.day, ser.x, w.sum7,
         |    7 * ser.x - w.sum7 AS detr_e, ser.i % 7 AS dow
         |  FROM win w JOIN ser ON ser.i = w.i),
         | dw AS (SELECT dow, CAST(sum(detr_e) AS BIGINT) AS sd,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM j GROUP BY 1)
         |SELECT strftime(j.day, '%Y-%m-%d') AS day, CAST(j.x AS BIGINT) AS x,
         |  round(sum7 / 7.0, 4) AS trend,
         |  round(sd / (cnt * 7.0), 4) AS seasonal,
         |  round((cnt * detr_e - sd) / (cnt * 7.0), 4) AS remainder
         |FROM j JOIN dw USING (dow) ORDER BY day""".stripMargin,
    "ts_kaplan_meier" ->
      """WITH cl AS (SELECT o_custkey, min(CAST(o_orderdate AS DATE)) AS f,
        |    max(CAST(o_orderdate AS DATE)) AS l
        |  FROM orders GROUP BY 1),
        | hz AS (SELECT max(l) - 90 AS cutoff FROM cl),
        | lt AS (SELECT date_diff('day', f, l) AS t_day,
        |    CASE WHEN l < (SELECT cutoff FROM hz) THEN 1 ELSE 0 END AS event
        |  FROM cl),
        | tm AS (SELECT CAST(t_day AS BIGINT) AS t_day,
        |    CAST(count(*) AS BIGINT) AS n_leave,
        |    CAST(sum(event) AS BIGINT) AS d_events
        |  FROM lt GROUP BY 1),
        | rk AS (SELECT t_day, n_leave, d_events,
        |    CAST(sum(n_leave) OVER (ORDER BY t_day DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS n_risk
        |   FROM tm),
        | lg AS (SELECT t_day, n_risk, d_events,
        |    coalesce(CAST(round(
        |      ln(nullif(1 - d_events::DOUBLE / n_risk::DOUBLE, 0)) * 1e9)
        |      AS BIGINT), 0) AS lg_e9
        |   FROM rk),
        | cm AS (SELECT t_day, n_risk, d_events,
        |    sum(lg_e9) OVER (ORDER BY t_day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |   FROM lg)
        |SELECT t_day, n_risk, d_events,
        |  CASE WHEN d_events = n_risk THEN 0.0
        |    ELSE round(exp(cum::DOUBLE / 1e9), 6) + 0.0
        |  END AS survival
        |FROM cm WHERE d_events > 0 ORDER BY t_day""".stripMargin,
    "ts_anomaly_zscore" ->
      """WITH daily AS (
        |  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
        |    CAST(isodow(o_orderdate) AS BIGINT) AS isodow,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders GROUP BY day, isodow),
        |p1 AS (SELECT isodow, count(*) AS n, sum(rev) AS sw
        |       FROM daily GROUP BY isodow),
        |p2 AS (SELECT daily.isodow, any_value(n) AS n, any_value(sw) AS sw,
        |         sum(CAST(rev - CAST(sw // n AS BIGINT) AS HUGEINT)
        |           * (rev - CAST(sw // n AS BIGINT))) AS m2
        |       FROM daily JOIN p1 ON daily.isodow = p1.isodow
        |       GROUP BY daily.isodow),
        |st AS (SELECT isodow, CAST(sw AS DOUBLE) / n AS mean_rev,
        |         CASE WHEN n > 1 THEN sqrt(CAST(m2 AS DOUBLE) / (n - 1)) END
        |           AS sd_rev FROM p2)
        |SELECT day, daily.isodow, rev,
        |  round(CASE WHEN sd_rev IS NOT NULL AND sd_rev <> 0
        |    THEN (rev - mean_rev) / sd_rev END, 6) + 0.0 AS z,
        |  abs(CASE WHEN sd_rev IS NOT NULL AND sd_rev <> 0
        |    THEN (rev - mean_rev) / sd_rev END) > 2.0 AS is_anomaly
        |FROM daily JOIN st ON daily.isodow = st.isodow
        |ORDER BY day""".stripMargin,
    "ts_mom_growth" ->
      """WITH m AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS mi,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1)
        |SELECT a.mi, a.mi // 12 AS yr, a.mi % 12 + 1 AS mo,
        | a.cents, b.cents AS prev_cents,
        | a.cents - b.cents AS delta_cents,
        | CASE WHEN b.cents > 0
        |   THEN (10000 * (a.cents - b.cents)) // b.cents END AS growth_bp
        |FROM m a LEFT JOIN m b ON a.mi = b.mi + 1
        |ORDER BY a.mi""".stripMargin,
    "ts_wau_daily" ->
      """WITH e AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        | days AS (SELECT DISTINCT day FROM e),
        | sp AS (SELECT unnest(generate_series(day, day + 6, INTERVAL 1 DAY))::DATE
        |   AS wday, user_id FROM e),
        | w AS (SELECT wday, count(DISTINCT user_id) AS wau FROM sp GROUP BY wday)
        |SELECT strftime(w.wday, '%Y-%m-%d') AS day, CAST(wau AS BIGINT) AS wau
        |FROM w JOIN days ON w.wday = days.day ORDER BY day""".stripMargin,
    "ts_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id,
        |   CAST(round(value * 100) AS BIGINT) AS cents,
        |   lag(epoch_us(ts)) OVER
        |     (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
        |  FROM events),
        | b AS (SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000
        |    THEN 1 ELSE 0 END AS brk FROM e),
        | sn AS (SELECT *, sum(brk) OVER
        |   (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_n FROM b)
        |SELECT user_id, CAST(session_n AS BIGINT) AS session_n,
        | count(*) AS n_events,
        | CAST((max(us) - min(us)) // 1000000 AS BIGINT) AS duration_sec,
        | CAST(sum(cents) AS BIGINT) AS value_cents
        |FROM sn GROUP BY user_id, session_n
        |ORDER BY user_id, session_n""".stripMargin,
    "ts_holt_linear" ->
      (s"""WITH RECURSIVE $seriesCte,
        | r AS (
        |  SELECT CAST(0 AS BIGINT) AS i,
        |    CAST((SELECT x FROM ser WHERE i = 0) AS DOUBLE) AS l,
        |    CAST((SELECT x FROM ser WHERE i = 1) AS DOUBLE)
        |      - CAST((SELECT x FROM ser WHERE i = 0) AS DOUBLE) AS b
        |  UNION ALL
        |  SELECT r.i + 1,
        |    0.5 * s.x + 0.5 * (r.l + r.b),
        |    0.5 * ((0.5 * s.x + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b
        |  FROM r JOIN ser s ON s.i = r.i + 1),
        | mx AS (SELECT max(i) AS mi FROM ser)
        |SELECT strftime(ser.day, '%Y-%m-%d') AS day, ser.x,
        | round(r.l, 4) + 0.0 AS level, round(r.b, 4) + 0.0 AS trend,
        | round(r.l + r.b, 4) + 0.0 AS forecast_next
        |FROM r JOIN ser ON ser.i = r.i CROSS JOIN mx
        |WHERE r.i > mx.mi - 10 AND mx.mi >= 1
        |ORDER BY day""".stripMargin),
    "ts_interarrival" ->
      """WITH g AS (SELECT o_custkey,
        |   CAST(o_orderdate AS DATE) AS day, o_orderkey,
        |   lag(CAST(o_orderdate AS DATE)) OVER
        |     (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS prev
        |  FROM orders),
        | b AS (SELECT least(CAST(datediff('day', prev, day) AS BIGINT) // 7,
        |     CAST(8 AS BIGINT)) AS bucket
        |  FROM g WHERE prev IS NOT NULL),
        | h AS (SELECT bucket, count(*) AS n_gaps FROM b GROUP BY bucket),
        | t AS (SELECT sum(n_gaps) AS tn FROM h)
        |SELECT bucket, CAST(n_gaps AS BIGINT) AS n_gaps,
        | CAST((10000 * n_gaps) // tn AS BIGINT) AS share_bp
        |FROM h CROSS JOIN t ORDER BY bucket""".stripMargin,
    "ts_page_cusum" ->
      """WITH RECURSIVE s AS (
        | SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
        |   row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        | FROM events),
        | r AS (
        |  SELECT user_id, rn,
        |    CASE WHEN greatest(0, cents - 5000) > 60000 THEN 0
        |         ELSE greatest(0, cents - 5000) END AS sacc,
        |    CASE WHEN greatest(0, cents - 5000) > 60000 THEN 1 ELSE 0 END AS alarms
        |  FROM s WHERE rn = 1
        |  UNION ALL
        |  SELECT s.user_id, s.rn,
        |    CASE WHEN greatest(0, r.sacc + s.cents - 5000) > 60000 THEN 0
        |         ELSE greatest(0, r.sacc + s.cents - 5000) END,
        |    r.alarms + CASE WHEN greatest(0, r.sacc + s.cents - 5000) > 60000
        |      THEN 1 ELSE 0 END
        |  FROM s JOIN r ON s.user_id = r.user_id AND s.rn = r.rn + 1),
        | last AS (SELECT user_id, max(rn) AS mr FROM r GROUP BY user_id)
        |SELECT r.user_id, CAST(last.mr AS BIGINT) AS n_events,
        | CAST(r.alarms AS BIGINT) AS n_alarms, CAST(r.sacc AS BIGINT) AS final_s
        |FROM r JOIN last ON r.user_id = last.user_id AND r.rn = last.mr
        |ORDER BY r.user_id""".stripMargin,
    "ts_autocorr" ->
      (s"""WITH $seriesCte,
        | ks AS (SELECT unnest(range(1, 8)) AS k),
        | p AS (SELECT ks.k, a.x AS x, c.x AS y
        |   FROM ks CROSS JOIN ser a JOIN ser c ON c.i = a.i + ks.k),
        | g AS (SELECT k, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |   sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
        |  FROM p GROUP BY k)
        |SELECT CAST(k AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_pairs,
        | round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |   (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |    sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) + 0.0 AS acf
        |FROM g ORDER BY lag""".stripMargin),
    "ts_cusum_changepoint" ->
      (s"""WITH $seriesCte,
        | agg AS (SELECT count(*) AS n, sum(x) AS t FROM ser),
        | c AS (SELECT i, day,
        |   sum(x) OVER (ORDER BY i ROWS UNBOUNDED PRECEDING) AS p FROM ser),
        | v AS (SELECT strftime(c.day, '%Y-%m-%d') AS day,
        |   CAST(agg.n * c.p - (c.i + 1) * agg.t AS BIGINT) AS cusum
        |  FROM c, agg WHERE c.i < agg.n - 1)
        |SELECT day, cusum, abs(cusum) AS cusum_abs FROM v
        |ORDER BY cusum_abs DESC, day LIMIT 5""".stripMargin),
    "ts_trend_slope" ->
      """WITH m AS (SELECT p.p_brand,
        |   CAST((year(l.l_shipdate) - 1992) * 12 + month(l.l_shipdate) - 1 AS BIGINT) AS mi,
        |   CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2),
        | p AS (SELECT p_brand, count(*) AS n,
        |   CAST(sum(mi) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |   CAST(sum(mi * y) AS BIGINT) AS sxy, CAST(sum(mi * mi) AS BIGINT) AS sxx
        |  FROM m GROUP BY p_brand)
        |SELECT p_brand,
        | round((n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE), 4) + 0.0
        |   AS slope_cents_per_month,
        | n AS n_months
        |FROM p ORDER BY p_brand""".stripMargin,
    "ts_seasonal_dow" ->
      """WITH b AS (SELECT event_type, CAST(isodow(ts) AS BIGINT) AS isodow,
        |   count(*) AS n, sum(CAST(round(value * 100) AS BIGINT)) AS c
        |  FROM events GROUP BY 1, 2),
        | t AS (SELECT event_type, sum(n) AS tn, sum(c) AS tc
        |  FROM b GROUP BY event_type)
        |SELECT b.event_type, b.isodow, CAST(b.n AS BIGINT) AS n_events,
        | CAST((10000 * b.n) // t.tn AS BIGINT) AS share_bp,
        | CAST(CASE WHEN t.tc > 0 THEN (10000 * b.c) // t.tc ELSE NULL END AS BIGINT) AS value_share_bp
        |FROM b JOIN t ON b.event_type = t.event_type
        |ORDER BY b.event_type, b.isodow""".stripMargin,
    "ts_asof_snapshot" ->
      """WITH m AS (
        | SELECT o_custkey AS custkey, o_orderdate AS ts, o_orderkey AS ok,
        |   o_orderpriority AS prio,
        |   CASE WHEN lag(o_orderpriority) OVER
        |     (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |     IS DISTINCT FROM o_orderpriority THEN 1 ELSE 0 END AS chg
        | FROM orders),
        | r AS (SELECT *, sum(chg) OVER (PARTITION BY custkey ORDER BY ts, ok
        |   ROWS UNBOUNDED PRECEDING) AS version FROM m),
        | a AS (SELECT custkey, CAST(version AS BIGINT) AS version, prio,
        |   CAST(min(ts) AS DATE) AS vf
        |   FROM r GROUP BY custkey, version, prio),
        | iv AS (SELECT *, lead(vf) OVER (PARTITION BY custkey ORDER BY version) AS vt
        |   FROM a)
        |SELECT custkey, version, prio, strftime(vf, '%Y-%m-%d') AS valid_from
        |FROM iv
        |WHERE vf <= DATE '1996-06-30' AND (vt IS NULL OR vt > DATE '1996-06-30')
        |ORDER BY custkey""".stripMargin,
    "etl_scd2_history" ->
      """WITH m AS (
        | SELECT o_custkey AS custkey, o_orderdate AS ts, o_orderkey AS ok,
        |   o_orderpriority AS prio,
        |   CASE WHEN lag(o_orderpriority) OVER
        |     (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |     IS DISTINCT FROM o_orderpriority THEN 1 ELSE 0 END AS chg
        | FROM orders),
        | r AS (SELECT *, sum(chg) OVER (PARTITION BY custkey ORDER BY ts, ok
        |   ROWS UNBOUNDED PRECEDING) AS version FROM m),
        | a AS (SELECT custkey, CAST(version AS BIGINT) AS version, prio,
        |   CAST(min(ts) AS DATE) AS vf, count(*) AS n_orders
        |   FROM r GROUP BY custkey, version, prio)
        |SELECT custkey, version, prio, strftime(vf, '%Y-%m-%d') AS valid_from,
        | strftime(lead(vf) OVER (PARTITION BY custkey ORDER BY version),
        |   '%Y-%m-%d') AS valid_to,
        | n_orders
        |FROM a ORDER BY custkey, version""".stripMargin,
    "ts_gapfill_daily" ->
      """WITH jan AS (
        | SELECT o_custkey AS custkey, CAST(o_orderdate AS DATE) AS day,
        |   count(*) AS n_orders, round(sum(o_totalprice), 2) AS spend
        | FROM orders
        | WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-02-01'
        | GROUP BY 1, 2),
        | spine AS (SELECT custkey, CAST(g AS DATE) AS day
        |   FROM (SELECT DISTINCT custkey FROM jan),
        |     generate_series(DATE '1995-01-01', DATE '1995-01-31', INTERVAL 1 DAY) s(g))
        |SELECT spine.custkey, strftime(spine.day, '%Y-%m-%d') AS day,
        | coalesce(n_orders, 0) AS n_orders, coalesce(spend, 0.0) AS spend
        |FROM spine LEFT JOIN jan USING (custkey, day)
        |ORDER BY custkey, day""".stripMargin,
    "stream_transition_matrix" ->
      """WITH tr AS (
        | SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |   AS prev, event_type AS nxt
        | FROM events),
        | c AS (SELECT prev, nxt, count(*) AS n FROM tr
        |   WHERE prev IS NOT NULL GROUP BY prev, nxt)
        |SELECT prev, nxt, n,
        | round(n::DOUBLE / sum(n) OVER (PARTITION BY prev), 4) AS p
        |FROM c ORDER BY prev, nxt""".stripMargin,
    // identical IEEE fold (e + 0.5*(v - e)) as the Spark HOF — the
    // doubles hash-match with NO rounding on either side
    "ts_ewma" ->
      """WITH RECURSIVE s AS (
        | SELECT user_id, value,
        |   row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        | FROM events),
        | r AS (
        |  SELECT user_id, rn, value, value AS ewma FROM s WHERE rn = 1
        |  UNION ALL
        |  SELECT s.user_id, s.rn, s.value, r.ewma + 0.5 * (s.value - r.ewma)
        |  FROM s JOIN r ON s.user_id = r.user_id AND s.rn = r.rn + 1)
        |SELECT user_id, rn, value, ewma FROM r ORDER BY user_id, rn""".stripMargin,
    "ts_concurrent_intervals" ->
      """WITH o AS (SELECT CAST(o_orderdate AS DATE) AS sd,
        |   CAST(CAST(o_orderdate AS DATE) + (o_orderkey % 30 + 1) * INTERVAL 1 DAY AS DATE) AS ed
        | FROM orders),
        | dl AS (SELECT sd AS dy, 1 AS delta FROM o
        |   UNION ALL SELECT ed, -1 FROM o),
        | g AS (SELECT dy,
        |   sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS n_starts,
        |   sum(CASE WHEN delta = -1 THEN 1 ELSE 0 END) AS n_ends,
        |   sum(delta) AS net FROM dl GROUP BY dy)
        |SELECT strftime(dy, '%Y-%m-%d') AS day,
        | CAST(n_starts AS BIGINT) AS n_starts, CAST(n_ends AS BIGINT) AS n_ends,
        | CAST(sum(net) OVER (ORDER BY dy ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |   AS concurrency
        |FROM g ORDER BY day""".stripMargin,
  )
}
