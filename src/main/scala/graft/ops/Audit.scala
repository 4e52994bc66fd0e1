package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Num.roundNorm
import graft.io.Sources

/** Data-audit operators — the checks a pipeline runs BEFORE and AFTER
  * moving 100 TB: snapshot diffing (what changed between two loads),
  * join-key skew diagnosis (will this key distribution melt a shuffle),
  * blocked fuzzy entity matching (near-identical records that exact
  * dedup misses), and a rolling-median window (robust trend baseline).
  *
  * Scale notes: the diff is one full-outer equi-join on the snapshot
  * key (co-partitioned shuffle; zero-shuffle under bucketing); the skew
  * audit is a two-level aggregate whose second level is
  * |distinct keys|-sized; fuzzy matching only compares within bounded
  * blocks (never all-pairs); the rolling median windows over a
  * day-grain aggregate, which is calendar-sized at any corpus scale.
  */
object Audit {

  /** Snapshot diff: inserts / deletes / updates between two versions of
    * the orders table (simulated deterministically from the fixture: v1
    * lacks keys ≡0 mod 89, v2 lacks keys ≡0 mod 97 and bumps totals on
    * keys ≡0 mod 101 by exactly +1.0 — IEEE-exact, so change detection
    * compares identical bit patterns). One full-outer equi-join on the
    * key; unchanged rows filtered out. At scale this is the table-diff
    * primitive for validating an incremental load against a full
    * re-snapshot: co-partitioned single shuffle, or zero shuffles when
    * both snapshots are bucketed by the key.
    */
  def snapshotDiff(s: SparkSession, d: String): DataFrame = {
    val o = Sources.orders(s, d)
    val v1 = o.filter(pmod(col("o_orderkey"), lit(89)) =!= 0)
      .select(col("o_orderkey"), col("o_totalprice").as("old_total"))
    val v2 = o.filter(pmod(col("o_orderkey"), lit(97)) =!= 0)
      .select(col("o_orderkey"),
        when(pmod(col("o_orderkey"), lit(101)) === 0, col("o_totalprice") + lit(1.0))
          .otherwise(col("o_totalprice")).as("new_total"))
    v1.join(v2, Seq("o_orderkey"), "full_outer")
      .withColumn("change",
        when(col("old_total").isNull, lit("insert"))
          .when(col("new_total").isNull, lit("delete"))
          .when(col("old_total") =!= col("new_total"), lit("update")))
      .filter(col("change").isNotNull)
      .select(col("o_orderkey"), col("change"), col("old_total"), col("new_total"))
      .orderBy("o_orderkey")
  }

  /** Join-key skew audit over `events.user_id`: per-key frequencies
    * reduced to the top-10 heavy hitters with share, cumulative share,
    * and ratio-to-mean — the numbers that decide between a plain
    * shuffle join, AQE skew splitting, and manual salting. Two-level
    * aggregate: the per-key count is one map-side-combinable shuffle;
    * everything after runs on the |keys|-sized table. Shares are exact
    * integer ratios rounded at 6 decimals.
    */
  def keySkew(s: SparkSession, d: String): DataFrame = {
    val perKey = Sources.events(s, d).groupBy("user_id")
      .agg(count(lit(1)).as("cnt"))
    val totals = perKey.agg(
      sum("cnt").as("total"), count(lit(1)).as("n_keys"))
    // top-10 via orderBy+limit = TakeOrderedAndProject (distributed
    // per-partition top-k, then a 10·partitions driver merge) — never a
    // single-partition window over all |keys| rows
    val top = perKey.orderBy(col("cnt").desc, col("user_id")).limit(10)
    val wTop = Window.orderBy(col("cnt").desc, col("user_id")) // 10-row set
    top.crossJoin(broadcast(totals)) // 1-row aggregate attach
      .withColumn("rnk", row_number().over(wTop))
      .withColumn("share", roundNorm(col("cnt").cast("double") / col("total").cast("double"), 6))
      .withColumn("cum_share", roundNorm(
        sum("cnt").over(wTop.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double") / col("total").cast("double"), 6))
      .withColumn("ratio_to_mean", roundNorm(
        col("cnt").cast("double") * col("n_keys").cast("double") / col("total").cast("double"), 4))
      .select(col("rnk").cast("long").as("rnk"), col("user_id"), col("cnt"), col("share"),
        col("cum_share"), col("ratio_to_mean"))
      .orderBy("rnk")
  }

  /** Blocked fuzzy entity matching over part names: within each
    * (brand, size) block, report pairs whose names are within
    * Levenshtein distance 4 — the record-linkage shape (blocking keeps
    * candidate pairs bounded; the edit-distance predicate runs only
    * inside blocks, never all-pairs). The self-join is an equi-join on
    * the block key; at 100 TB block sizes are capped by the blocking
    * scheme, which is the standard ER trade-off.
    */
  def fuzzyMatch(s: SparkSession, d: String): DataFrame = {
    val p = Sources.part(s, d)
      .select(col("p_brand"), col("p_size"), col("p_partkey"), col("p_name"))
    val a = p.select(col("p_brand"), col("p_size"),
      col("p_partkey").as("key_a"), col("p_name").as("name_a"))
    val b = p.select(col("p_brand"), col("p_size"),
      col("p_partkey").as("key_b"), col("p_name").as("name_b"))
    a.join(b, Seq("p_brand", "p_size"))
      .filter(col("key_a") < col("key_b") &&
        col("name_a") =!= col("name_b") &&
        levenshtein(col("name_a"), col("name_b")) <= 4)
      .select(col("p_brand"), col("p_size").cast("long").as("p_size"),
        col("key_a"), col("key_b"), col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"))
      .orderBy("p_brand", "p_size", "key_a", "key_b")
  }

  /** Rolling 7-day median of daily order counts per priority class —
    * the robust-baseline window (medians shrug off the spike days that
    * drag a mean). Exact `percentile` as a WINDOW aggregate over a
    * rows-frame; the input is the day-grain aggregate, so the window's
    * sort is calendar-sized however large the fact table. Medians of
    * integer counts interpolate identically in both engines (average of
    * the two middle values).
    */
  def rollingMedian(s: SparkSession, d: String): DataFrame = {
    val daily = Sources.orders(s, d)
      .groupBy(col("o_orderpriority"), to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n_orders"))
    val w = Window.partitionBy("o_orderpriority").orderBy("day").rowsBetween(-6, 0)
    daily
      .withColumn("med7", percentile(col("n_orders"), lit(0.5)).over(w))
      .withColumn("n_days", count(lit(1)).over(w))
      .filter(col("n_days") === 7) // only full windows: stable baseline
      .select(col("o_orderpriority"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_orders"), roundNorm(col("med7"), 1).as("med7"))
      .orderBy("o_orderpriority", "day")
  }

  private val histBuckets = 16

  /** Equi-depth (equal-height) histogram over `lineitem.l_extendedprice`
    * — the optimizer-statistics / data-profiling primitive: 16 buckets
    * that each hold (as near as integer division allows) the same row
    * count, with the value range [lo, hi] each bucket spans. Bucket
    * assignment is pure integer arithmetic on the GLOBAL sort rank,
    * `(rank−1)·b div n`, so bucket populations differ by at most one —
    * by construction, not by estimation.
    *
    * The rank comes from the two-pass [[Prefix]] aggregation (range
    * partition → local row_number → broadcast offsets), never a
    * single-partition window; the row total rides in as a 1-row
    * broadcast attach; the per-bucket reduce is one map-side-combinable
    * aggregate. Contrast with `approx_percentile` bounds: this is the
    * EXACT histogram at one extra (distributed) pass.
    */
  def equidepthHist(s: SparkSession, d: String): DataFrame = {
    val li = Sources.lineitem(s, d)
      .select(col("l_extendedprice").as("v"), col("l_orderkey"), col("l_linenumber"))
    val ranked = Prefix.running(li,
      Seq(col("v"), col("l_orderkey"), col("l_linenumber")), rankOut = Some("rnk"))
    val tot = li.agg(count(lit(1)).as("n_total"))
    ranked.crossJoin(broadcast(tot)) // 1-row aggregate attach
      .withColumn("bucket", expr(s"(rnk - 1) * $histBuckets div n_total"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), min("v").as("lo"), max("v").as("hi"))
      .orderBy("bucket")
  }

  /** Robust per-segment outlier detection via MAD (median absolute
    * deviation) — the anomaly screen that survives the very outliers it
    * hunts, unlike mean/stddev z-scores which the outliers themselves
    * inflate. Two exact-`percentile` aggregation passes (median, then
    * median of |x − med|), a broadcast join of the 5-row segment stats
    * back onto the fact rows, and one counting pass — every stage is a
    * keyed aggregate, nothing concentrates. The 1.4826 factor (σ
    * consistency under normality) is pre-folded to one literal `4.4478`
    * (3·1.4826) written identically in both engines, so the flag
    * comparison is one IEEE multiply + compare on each side.
    *
    * med/mad ship UNROUNDED (the `ts_ewma` discipline): the interpolated
    * exact percentile is the same IEEE op sequence in both engines, so
    * the raw doubles compare bitwise — while rounding to 2 decimals
    * introduced the only divergence (a `.885` value that decimal-rounds
    * differently from its binary expansion across engines, observed at
    * sf0.01).
    */
  def robustOutliers(s: SparkSession, d: String): DataFrame = {
    val cust = Sources.customer(s, d).select(col("c_mktsegment"), col("c_acctbal"))
    val med = cust.groupBy("c_mktsegment")
      .agg(percentile(col("c_acctbal"), lit(0.5)).as("med"))
    val mad = cust.join(broadcast(med), "c_mktsegment")
      .groupBy("c_mktsegment")
      .agg(percentile(abs(col("c_acctbal") - col("med")), lit(0.5)).as("mad"))
    cust.join(broadcast(med), "c_mktsegment").join(broadcast(mad), "c_mktsegment")
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(abs(col("c_acctbal") - col("med")) > lit(4.4478) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"),
        first(col("med")).as("med"),
        first(col("mad")).as("mad"))
      .orderBy("c_mktsegment")
  }

  /** Histogram-based selectivity estimation (`audit_selectivity_est`)
    * — the second CBO primitive next to `sketch_join_size`: price a
    * range predicate from the 16-bucket equi-depth histogram
    * ([[equidepthHist]]) instead of scanning the fact table. Buckets
    * that INTERSECT the range count fully, so the estimate is a
    * guaranteed integer upper bound (every qualifying row lives in an
    * intersecting bucket); the query reports it against the exact
    * count. At 100 TB the histogram is the persisted statistic — the
    * estimate reads 16 rows.
    */
  def selectivityEst(s: SparkSession, d: String): DataFrame = {
    val (lo, hi) = (2000.0, 5000.0)
    val est = equidepthHist(s, d)
      .filter(col("hi") >= lo && col("lo") <= hi)
      .agg(coalesce(sum("n_rows"), lit(0L)).as("est_rows"))
    val exact = Sources.lineitem(s, d)
      .filter(col("l_extendedprice").between(lo, hi))
      .agg(count(lit(1)).as("exact_rows"))
    est.crossJoin(broadcast(exact)) // 1-row × 1-row attach
      .select(col("est_rows"), col("exact_rows"),
        (col("est_rows") - col("exact_rows")).as("overest"))
  }

  /** Data-contract check (`audit_contract_check`) — the admission gate a
    * lakehouse runs before promoting a batch: each declared constraint
    * (non-null, positive amount, enum membership, date range,
    * referential integrity) is evaluated as a map-side predicate and the
    * violation counts come back in one aggregate pass; the FK rule is a
    * broadcast anti-join on the dimension. One scan prices the whole
    * contract at any corpus size — rules are columns, not passes.
    */
  def contractCheck(s: SparkSession, d: String): DataFrame = {
    val orders = Sources.orders(s, d)
    val rowRules: Seq[(String, Column)] = Seq(
      "totalprice_positive" -> (col("o_totalprice") <= 0),
      "status_enum" -> !col("o_orderstatus").isin("F", "O", "P"),
      "orderdate_range" ->
        (col("o_orderdate") < lit("1990-01-01").cast("timestamp") ||
          col("o_orderdate") >= lit("2000-01-01").cast("timestamp")),
      "priority_nonnull" -> col("o_orderpriority").isNull)
    val rowCounts = orders.agg(
      sum(when(rowRules.head._2, 1L).otherwise(0L)).as(rowRules.head._1),
      rowRules.tail.map { case (n, c) => sum(when(c, 1L).otherwise(0L)).as(n) }: _*)
    val fkViolations = orders
      .join(broadcast(Sources.customer(s, d).select(col("c_custkey"))),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("custkey_fk"))
    rowCounts.crossJoin(broadcast(fkViolations)) // 1-row × 1-row attach
      .select(expr(
        "stack(5, " + (rowRules.map(_._1) :+ "custkey_fk")
          .map(n => s"'$n', $n").mkString(", ") + ") AS (rule, n_violations)"))
      .orderBy("rule")
  }

  /** PSI drift (`audit_psi_drift`) — the population-stability index ML
    * monitoring runs between a baseline and a current window: decile
    * edges come from the BASELINE's exact percentiles, both periods are
    * bucketed against those frozen edges, and each bucket contributes
    * `(p_b − p_a)·ln(p_b/p_a)` with Laplace smoothing (+1 per bucket,
    * +10 per period) so an empty current bucket yields a finite,
    * deterministic contribution instead of ±∞. The ratio inside the log
    * multiplies counts AS DOUBLES (`(cb+1)·(na+10) / ((nb+10)·(ca+1))`,
    * each factor cast first): an integer product would overflow Long
    * once window counts pass ~3e9 (the 100 TB framing), while the
    * double product is exact below 2^52 and merely rounds above it —
    * and both engines run the identical IEEE op sequence either way,
    * so the rounded contributions hash-match; per-bucket rows ship WITHOUT a
    * float total (the consumer sums — no cross-engine sum-order
    * divergence). Bucketing is a map-side HOF over the 9-edge broadcast
    * array: one scan per period at any scale.
    */
  def psiDrift(s: SparkSession, d: String): DataFrame = {
    val split = lit("2024-01-16").cast("timestamp")
    val ev = Sources.events(s, d).select(col("value"), col("ts"))
    val a = ev.filter(col("ts") < split)
    val b = ev.filter(col("ts") >= split)
    val edges = a.agg(expr(
      "percentile(value, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))").as("edges"))
    def bucketCounts(df: DataFrame, out: String): DataFrame =
      df.crossJoin(broadcast(edges))
        .select(size(filter(col("edges"),
          e => col("value") > e)).cast("long").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as(out))
    val na = a.agg(count(lit(1)).as("na"))
    val nb = b.agg(count(lit(1)).as("nb"))
    s.range(10).select(col("id").as("bucket"))
      .join(bucketCounts(a, "ca0"), Seq("bucket"), "left")
      .join(bucketCounts(b, "cb0"), Seq("bucket"), "left")
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .select(col("bucket"),
        coalesce(col("ca0"), lit(0L)).as("ca"),
        coalesce(col("cb0"), lit(0L)).as("cb"),
        col("na"), col("nb"))
      .withColumn("psi", roundNorm(expr(
        "(cast(cb+1 as double)/(nb+10) - cast(ca+1 as double)/(na+10)) * " +
          "ln((cast(cb+1 as double)*(na+10))/(cast(nb+10 as double)*(ca+1)))"), 6))
      .select(col("bucket"), col("ca"), col("cb"), col("psi"))
      .orderBy("bucket")
  }

  /** A/B experiment analysis (`audit_ab_experiment`) — the readout a
    * data-ablation experiment runs: users split into two deterministic
    * arms (`user_id % 2` — the hash-mod assignment an experimentation
    * system uses), per-arm user counts, converted-user counts (more
    * purchases than errors — a scale-free split; "≥ 1 purchase"
    * saturates at p = 1 on any fixture dense enough, degenerating the
    * test), conversion rates, and the pooled two-proportion
    * z-statistic, 0 by convention when the pooled variance is 0. One
    * scan + one per-user aggregate; the z arithmetic runs on the four
    * integer counts only, in a mirrored expression tree, so the
    * rounded statistic hash-matches across engines. At 100 TB the
    * per-user aggregate is the only shuffle and the final reduction is
    * 2 rows.
    */
  def abExperiment(s: SparkSession, d: String): DataFrame = {
    val perUser = Sources.events(s, d)
      .select(col("user_id"), col("event_type"))
      .groupBy("user_id")
      .agg(when(
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >
          sum(when(col("event_type") === "error", 1L).otherwise(0L)), 1L)
        .otherwise(0L).as("conv"))
      .withColumn("arm", pmod(col("user_id"), lit(2L)))
    perUser.groupBy()
      .agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("conv_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("conv_b"))
      .withColumn("rate_a", roundNorm(col("conv_a").cast("double") / col("n_a"), 6))
      .withColumn("rate_b", roundNorm(col("conv_b").cast("double") / col("n_b"), 6))
      .withColumn("z_conversion", roundNorm(expr(
        "CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b THEN 0.0 ELSE " +
          "(cast(conv_a as double)/n_a - cast(conv_b as double)/n_b) / " +
          "sqrt((cast(conv_a+conv_b as double)/(n_a+n_b)) * " +
          "(1.0 - cast(conv_a+conv_b as double)/(n_a+n_b)) * " +
          "(1.0/n_a + 1.0/n_b)) END"), 6))
      .select("n_a", "conv_a", "n_b", "conv_b", "rate_a", "rate_b", "z_conversion")
  }

  /** Mutual information between order priority and status
    * (`ml_mutual_info`) — the feature-selection signal a pipeline uses
    * to rank categorical columns against a label: per-cell
    * `p(x,y)·ln(p(x,y)/(p(x)p(y)))` from one contingency scan. Ships
    * PER-CELL contributions (the consumer sums — no cross-engine
    * sum-order divergence, the PSI pattern) with the counts; the log
    * ratio multiplies counts as DOUBLES (exact below 2^52; a Long
    * product overflows at ~3e9×3e9 cells). Marginals attach by
    * broadcast map-side joins — one shuffle total for the cell
    * aggregate.
    */
  def mutualInfo(s: SparkSession, d: String): DataFrame = {
    val o = Sources.orders(s, d)
      .select(col("o_orderpriority").as("x"), col("o_orderstatus").as("y"))
    val cells = o.groupBy("x", "y").agg(count(lit(1)).as("n_xy"))
    val mx = o.groupBy("x").agg(count(lit(1)).as("n_x"))
    val my = o.groupBy("y").agg(count(lit(1)).as("n_y"))
    val tot = o.agg(count(lit(1)).as("n"))
    cells.join(broadcast(mx), "x").join(broadcast(my), "y")
      .crossJoin(broadcast(tot))
      .withColumn("mi_contrib", roundNorm(expr(
        "(cast(n_xy as double)/n) * " +
          "ln((cast(n_xy as double)*n)/(cast(n_x as double)*n_y))"), 6))
      .select(col("x"), col("y"), col("n_xy"), col("mi_contrib"))
      .orderBy("x", "y")
  }

  /** Referential-integrity audit (`audit_referential`) — the FK orphan
    * counts an admission gate checks before promoting a snapshot:
    * orders whose customer is missing, lineitems whose order / part /
    * supplier is missing. Each probe is one `left_anti` equi-join
    * against the DISTINCT key projection of the dimension (broadcast
    * for the small ones, shuffle for orders — Catalyst picks), then a
    * count: no row payload ever shuffles, only keys. One output row so
    * dashboards can alert on any nonzero cell.
    */
  def referential(s: SparkSession, d: String): DataFrame = {
    def orphans(fact: DataFrame, key: String, dim: DataFrame, dimKey: String,
        out: String): DataFrame =
      fact.select(col(key)).join(
        dim.select(col(dimKey).as(key)).distinct(), Seq(key), "left_anti")
        .agg(count(lit(1)).as(out))
    val li = Sources.lineitem(s, d)
    // one lazy plan: four independent anti-join counts, 1-row crossJoins
    orphans(Sources.orders(s, d), "o_custkey", Sources.customer(s, d),
        "c_custkey", "orphan_orders")
      .crossJoin(orphans(li, "l_orderkey", Sources.orders(s, d),
        "o_orderkey", "orphan_li_orders"))
      .crossJoin(orphans(li, "l_partkey", Sources.part(s, d),
        "p_partkey", "orphan_li_parts"))
      .crossJoin(orphans(li, "l_suppkey", Sources.supplier(s, d),
        "s_suppkey", "orphan_li_suppliers"))
  }

  /** Order-independent content checksum (`audit_content_checksum`) —
    * the cross-engine table-compare primitive a 100 TB replication
    * validator runs: per month, a commutative fingerprint of the
    * orders partition that two engines can compute WITHOUT sorting or
    * co-locating rows. Each row maps to an integer digest
    * `pmod(k·P1 + c·P2 + cents, M)` (cents via the exact cent cast, so
    * floats never enter); digests SUM in DECIMAL(38,0) — exact, so
    * accumulation order cannot perturb the total the way a double sum
    * would — and reduce mod M at the edge. Any single-row difference
    * changes the month's checksum with probability ~1−1/M. One
    * map-side digest + one partial-aggregated shuffle of (month,
    * decimal) — the cheapest possible cross-replica diff.
    */
  def contentChecksum(s: SparkSession, d: String): DataFrame = {
    val M = 9007199254740881L // largest prime < 2^53
    Sources.orders(s, d)
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        expr(s"pmod(o_orderkey * 1000003 + o_custkey * 8191 + " +
          s"cast(round(o_totalprice * 100) as bigint), ${M}L)").as("digest"))
      .groupBy("month")
      .agg(count(lit(1)).as("n_rows"),
        expr(s"cast(pmod(sum(cast(digest as decimal(38,0))), ${M}L) as bigint)")
          .as("checksum"))
      .orderBy("month")
  }

  /** Column profile (`audit_column_profile`) of the orders table: per
    * column — null count, distinct count, min/max as (lexicographic)
    * strings — the schema-on-read triage every ingestion pipeline runs
    * before trusting a new drop. TWO hash-path passes, deliberately not
    * one: folding the string min/max into the same aggregate as the
    * five `count_distinct`s makes Spark plan the whole thing as
    * SortAggregate (string aggregation buffers don't fit the hash
    * aggregate's UnsafeRow), which SORTS the 6×-expanded corpus on a
    * six-column key twice — measured 3.3 s vs 0.6 s at sf0.1, and at
    * 100 TB a corpus-sized sort vs a second column-pruned scan is no
    * contest. Pass 1: nulls + string min/max + count, a global
    * aggregate (no grouping key, so the SortAggregate it still plans
    * needs no sort). Pass 2: the five distincts alone — all-Long
    * buffers, so the Expand(5×) stays HashAggregate end-to-end. The two
    * 1-row results cross-join (broadcast) and transpose to (column,
    * stat) rows via `inline(array(struct...))` — no collect.
    */
  def columnProfile(s: SparkSession, d: String): DataFrame = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
    val src = Sources.orders(s, d)
    val basicAggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
        min(col(c).cast("string")).as(s"mn_$c"),
        max(col(c).cast("string")).as(s"mx_$c"))
    } :+ count(lit(1)).as("n_rows")
    val basic = src.agg(basicAggs.head, basicAggs.tail: _*)
    val distinctAggs = cols.map(c => count_distinct(col(c)).as(s"nd_$c"))
    val dist = src.agg(distinctAggs.head, distinctAggs.tail: _*)
    val one = basic.crossJoin(broadcast(dist))
    val rows = cols.map { c =>
      struct(lit(c).as("col_name"), col("n_rows").as("n_rows"),
        col(s"nn_$c").as("n_null"), col(s"nd_$c").cast("long").as("n_distinct"),
        col(s"mn_$c").as("min_s"), col(s"mx_$c").as("max_s"))
    }
    one.select(inline(array(rows: _*))).orderBy("col_name")
  }

  /** Benford first-digit audit (`audit_benford`): distribution of the
    * leading digit of order totals against Benford's law — the classic
    * fabricated-data / unit-mixup screen for monetary columns (organic
    * multi-scale amounts follow log10(1+1/d); truncated, capped, or
    * synthesized ones don't). The digit is extracted from the exact
    * integer-dollar string (engine-neutral — no float log10 in the
    * grouping key); shares and the Benford expectation ship as integer
    * basis points (expectation precomputed as ⌊10⁴·log10(1+1/d)⌋, a
    * 9-row constant). One hash aggregate to 9 rows plus a 1-row total
    * attach — a full-column audit for the cost of a count(*).
    */
  def benford(s: SparkSession, d: String): DataFrame = {
    val byDigit = Sources.orders(s, d)
      .select(round(col("o_totalprice")).cast("long").as("v"))
      .filter(col("v") > 0)
      .select(substring(col("v").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val tot = byDigit.agg(sum("n").as("tn"))
    val expected = (1 to 9).map(dd =>
      (dd.toLong, math.floor(10000 * math.log10(1 + 1.0 / dd)).toLong))
    val expDf = s.createDataFrame(expected).toDF("digit", "expected_bp")
    byDigit.crossJoin(broadcast(tot))
      .join(broadcast(expDf), Seq("digit"))
      .select(col("digit"), col("n"),
        expr("(10000 * n) div tn").as("share_bp"),
        col("expected_bp"),
        (expr("(10000 * n) div tn") - col("expected_bp")).as("dev_bp"))
      .orderBy("digit")
  }

  /** Calendar continuity audit (`audit_day_islands`): the contiguous
    * runs ("islands") of days that have orders — the first check a
    * backfill scheduler runs, since every island boundary is either a
    * legitimate outage or a missing ingest batch. Built without any
    * global window: island STARTS are days whose predecessor is absent
    * (one anti join of the day set against its shifted self), island
    * ENDS are days whose successor is absent, and each start pairs with
    * the nearest end ≥ it (a theta join + min aggregate — both sides
    * calendar-bounded, so the broadcast nested-loop stays island-count
    * sized at any corpus scale; the day set itself is one distinct
    * aggregate over the scan). sf0.001 has ~hundreds of islands,
    * sf0.1 exactly one — both shapes verified.
    */
  def dayIslands(s: SparkSession, d: String): DataFrame = {
    val days = Sources.orders(s, d)
      .select(to_date(col("o_orderdate")).as("day")).distinct()
    val starts = days.join(
      days.select(date_add(col("day"), 1).as("day")), Seq("day"), "left_anti")
      .select(col("day").as("s"))
    val ends = days.join(
      days.select(date_sub(col("day"), 1).as("day")), Seq("day"), "left_anti")
      .select(col("day").as("e"))
    starts.join(ends, col("e") >= col("s"))
      .groupBy("s").agg(min("e").as("e"))
      .select(date_format(col("s"), "yyyy-MM-dd").as("island_start"),
        date_format(col("e"), "yyyy-MM-dd").as("island_end"),
        (datediff(col("e"), col("s")) + 1).cast("long").as("n_days"))
      .orderBy("island_start")
  }

  /** Primary-key uniqueness audit (`audit_pk_uniqueness`): per table,
    * rows vs distinct key values and the count of duplicated keys — the
    * first invariant every snapshot load asserts (a duplicated key
    * silently doubles a downstream join). One aggregate per table
    * (count-distinct is the two-level partial/final plan), unioned into
    * a 5-row report; each scan reads only the key column (verified
    * pushdown class).
    */
  def pkUniqueness(s: SparkSession, d: String): DataFrame = {
    def check(table: String, df: DataFrame, key: String): DataFrame =
      df.select(col(key).as("k"))
        .agg(count(lit(1)).as("n_rows"), countDistinct(col("k")).as("n_distinct"))
        .select(lit(table).as("table_name"), col("n_rows"), col("n_distinct"),
          (col("n_rows") - col("n_distinct")).as("n_dup_rows"))
    // events goes through Sources.events (ns-timestamp normalization)
    Seq(
      check("customer", Sources.customer(s, d), "c_custkey"),
      check("events", Sources.events(s, d), "event_id"),
      check("orders", Sources.orders(s, d), "o_orderkey"),
      check("part", Sources.part(s, d), "p_partkey"),
      check("supplier", Sources.supplier(s, d), "s_suppkey"))
      .reduce(_ unionAll _)
      .orderBy("table_name")
  }

  /** Chi-square independence audit (`audit_chi2_segment_nation`) — is
    * market segment independent of nation in the customer base? Ships
    * PER-CELL contributions `(obs−exp)²/exp` alongside the observed and
    * expected counts (the PSI/mutual-info pattern: the consumer sums the
    * 125 cells; no cross-engine sum-order divergence in the shipped
    * rows). Marginals are integer counts attached by broadcast joins —
    * one contingency shuffle total, any corpus size. Expected counts
    * multiply marginals as DOUBLES: exact below 2^52, and a Long product
    * of two ~3e9 marginals would overflow where the double stays exact.
    */
  def chi2SegmentNation(s: SparkSession, d: String): DataFrame = {
    val cust = Sources.customer(s, d).select("c_mktsegment", "c_nationkey")
    val cells = cust.groupBy("c_mktsegment", "c_nationkey")
      .agg(count(lit(1)).as("obs"))
    val rowTot = cells.groupBy("c_mktsegment").agg(sum("obs").as("seg_n"))
    val colTot = cells.groupBy("c_nationkey").agg(sum("obs").as("nat_n"))
    val n = cells.agg(sum("obs").as("n"))
    cells
      .join(broadcast(rowTot), "c_mktsegment")
      .join(broadcast(colTot), "c_nationkey")
      .crossJoin(broadcast(n))
      .withColumn("expected", roundNorm(
        col("seg_n").cast("double") * col("nat_n") / col("n"), 6))
      .withColumn("chi2_cell", roundNorm(
        expr("pow(obs - cast(seg_n as double) * nat_n / n, 2) / " +
          "(cast(seg_n as double) * nat_n / n)"), 6))
      .select(col("c_mktsegment"), col("c_nationkey"), col("obs"),
        col("seg_n"), col("nat_n"), col("expected"), col("chi2_cell"))
      .orderBy("c_mktsegment", "c_nationkey")
  }

  /** Welch two-sample t-test (`audit_welch_ttest`) — do MACHINERY and
    * AUTOMOBILE customers differ in mean order value? The unequal-
    * variance test a pipeline runs before acting on a segment gap.
    * Numerically this follows the Decomp two-pass mean-shift discipline
    * AND stays engine-exact end to end: pass one sums integer cents into
    * decimal(38,0) (DuckDB's HUGEINT twin — a plain Long sum overflows
    * at ~1e12 rows × $50k orders), pass two re-centers every row on the
    * FLOOR-integer arm mean (so deviations are small exact Longs) and
    * sums their squares in decimal(38,0) — exact to 1e38, i.e. to ~1e12
    * rows of $500k deviations. The only float roundings are the final
    * casts, so mean/sd/t/df are BIT-IDENTICAL doubles in both engines —
    * no rounding-boundary luck involved. Two shuffles on the arm key;
    * the pass-one means travel back as a 2-row broadcast.
    */
  def welchTtest(s: SparkSession, d: String): DataFrame = {
    val joined = Sources.orders(s, d)
      .join(Sources.customer(s, d)
        .filter(col("c_mktsegment").isin("MACHINERY", "AUTOMOBILE"))
        .select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("arm"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val pass1 = joined.groupBy("arm")
      .agg(count(lit(1)).as("n"),
        sum(col("cents").cast("decimal(38,0)")).as("s"))
    val pass2 = joined.join(broadcast(pass1), "arm")
      // `div` = IntegralDivide: EXACT integral quotient on decimals
      // (a float-division floor could flip at a .999… boundary)
      .withColumn("dev", col("cents") - expr("s div n"))
      .groupBy("arm")
      .agg(first("n").as("n"), first("s").as("s"),
        sum((col("dev").cast("decimal(19,0)") *
          col("dev").cast("decimal(19,0)")).cast("decimal(38,0)")).as("m2"))
      .withColumn("mean_usd", expr("cast(s as double) / n / 100"))
      .withColumn("var_usd2", expr("cast(m2 as double) / (n - 1) / 1e4"))
    val wide = pass2.groupBy()
      .agg(
        max(when(col("arm") === "MACHINERY", col("n"))).as("n_a"),
        max(when(col("arm") === "MACHINERY", col("mean_usd"))).as("mean_ua"),
        max(when(col("arm") === "MACHINERY", col("var_usd2"))).as("var_ua"),
        max(when(col("arm") === "AUTOMOBILE", col("n"))).as("n_b"),
        max(when(col("arm") === "AUTOMOBILE", col("mean_usd"))).as("mean_ub"),
        max(when(col("arm") === "AUTOMOBILE", col("var_usd2"))).as("var_ub"))
    wide
      .select(col("n_a"), roundNorm(col("mean_ua"), 6).as("mean_a"),
        roundNorm(expr("sqrt(var_ua)"), 6).as("sd_a"),
        col("n_b"), roundNorm(col("mean_ub"), 6).as("mean_b"),
        roundNorm(expr("sqrt(var_ub)"), 6).as("sd_b"),
        roundNorm(expr(
          "(mean_ua - mean_ub) / sqrt(var_ua / n_a + var_ub / n_b)"), 6)
          .as("t_stat"),
        roundNorm(expr(
          "pow(var_ua / n_a + var_ub / n_b, 2) / " +
            "(pow(var_ua / n_a, 2) / (n_a - 1) + pow(var_ub / n_b, 2) / (n_b - 1))"), 4)
          .as("df_welch"))
  }

  /** Two-sample Kolmogorov–Smirnov test (`audit_ks_test`) — the
    * nonparametric complement to [[welchTtest]] on the same two segment
    * arms: D = max over values of |F_A − F_B|. EXACT at any scale: the
    * value stream first collapses to per-distinct-cent arm counts (one
    * hash aggregate — the only corpus-sized shuffle), the two CDFs come
    * from [[Prefix]] two-pass running sums (never a single-partition
    * window), and the sup-gap comparison is cross-multiplied to the
    * integer lattice `|cumA·n_B − cumB·n_A|` so the argmax cannot sit on
    * a float boundary. Both CDFs only step at observed values, so
    * evaluating after each step covers the sup. Ships the exact rational
    * (d_num, d_den), the smallest cent value attaining it, and the
    * double quotient. Long products are exact to [[KsLongBound]] rows
    * per arm; past that the plan BRANCHES to a DECIMAL(38,0) lattice
    * ([[ksFromPerValue]] `wide` — gated by a metadata-cheap source
    * count, property-tested at planted >2³¹ counts in AuditSpec).
    */
  def ksTest(s: SparkSession, d: String): DataFrame = {
    val rows = Sources.orders(s, d)
      .join(Sources.customer(s, d)
        .filter(col("c_mktsegment").isin("MACHINERY", "AUTOMOBILE"))
        .select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("arm"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val perValue = rows.groupBy("cents").agg(
      sum(when(col("arm") === "MACHINERY", 1L).otherwise(0L)).as("a"),
      sum(when(col("arm") === "AUTOMOBILE", 1L).otherwise(0L)).as("b"))
    // lattice-width gate: orders row count bounds each arm count, and a
    // filterless parquet count is metadata-cheap at any corpus size.
    // Under the bound the Long lattice is exact (the fixture/oracle
    // path); past it the cross terms branch to DECIMAL(38,0) — the
    // 100 TB claim held by code, not by a doc-comment. The count goes
    // through CorpusStats so building this DataFrame stays job-free
    // after the first call — plan sweeps construct every query
    // repeatedly, and an eager per-construction count job is a
    // side effect no queries-map entry is allowed to have.
    val wide = graft.io.CorpusStats.rowCount(s, d, "orders") > KsLongBound
    ksFromPerValue(perValue, wide)
  }

  /** Per-arm row-count bound for the Long gap lattice: each cross term
    * is `cum · n_other ≤ n_a · n_b`, so Long (< 9.22e18) is exact while
    * both arms stay under ~3.03e9 rows; 2e9 leaves a 2.3× margin.
    */
  private[graft] val KsLongBound = 2000000000L

  /** The KS sup-gap reduction over per-distinct-value arm counts
    * `(cents, a, b)` — shared by the fixture query and the wide-count
    * property test. `wide=false` keeps the exact Long lattice;
    * `wide=true` lifts the cross terms to DECIMAL(38,0) — good to
    * n_a·n_b < 1e38, i.e. ~1e19 rows per arm. The shipped schema is
    * IDENTICAL in both branches (count-gated widening must never
    * change the table a consumer reads): the exact rational
    * `(d_num, d_den)` — which genuinely exceeds Int64 past the bound —
    * ships as decimal strings (the Int64-in-JSON interchange
    * discipline) from both lattices.
    */
  private[graft] def ksFromPerValue(perValue: DataFrame, wide: Boolean): DataFrame = {
    val cum = Prefix.running(perValue, Seq(col("cents")),
      sums = Seq((col("a"), "cum_a"), (col("b"), "cum_b")))
    val tot = cum.agg(sum("a").as("n_a"), sum("b").as("n_b"))
    def w(c: Column): Column = if (wide) c.cast("decimal(38,0)") else c
    val gaps = cum.crossJoin(broadcast(tot))
      .withColumn("gap",
        abs(w(col("cum_a")) * w(col("n_b")) - w(col("cum_b")) * w(col("n_a"))))
    val dmax = gaps.agg(max("gap").as("d_num"))
    gaps.crossJoin(broadcast(dmax))
      .filter(col("gap") === col("d_num"))
      .groupBy()
      .agg(first("n_a").as("n_a"), first("n_b").as("n_b"),
        first("d_num").as("d_numi"), min("cents").as("at_cents"))
      .withColumn("d_deni", w(col("n_a")) * w(col("n_b")))
      .withColumn("ks_d", roundNorm(
        expr("cast(d_numi as double) / (cast(n_a as double) * n_b)"), 8))
      .select(col("n_a"), col("n_b"),
        col("d_numi").cast("string").as("d_num"),
        col("d_deni").cast("string").as("d_den"),
        col("at_cents"), col("ks_d"))
  }

  /** Cramér's V (`audit_cramers_v`) — the [0,1]-normalized effect size
    * over the same segment×nation contingency as [[chi2SegmentNation]]:
    * the one-number answer to "is this dependence big enough to care".
    * The χ² total is reduced on the INTEGER lattice — each cell's
    * contribution rounds to 1e-6 units and sums as BIGINT — because a
    * double Σ over cells is partition-order-dependent and the two
    * engines would disagree in the last bits; the integer sum is
    * associative, so the reduction is exact and V derives from one
    * deterministic cast. Same one-shuffle contingency plan, then a
    * cell-count-sized aggregate.
    */
  def cramersV(s: SparkSession, d: String): DataFrame = {
    val cells = chi2SegmentNation(s, d)
      .withColumn("cell_e6", round(col("chi2_cell") * 1e6).cast("long"))
    val dims = cells.agg(
      countDistinct("c_mktsegment").as("r"),
      countDistinct("c_nationkey").as("c"),
      sum("obs").as("n"),
      sum("cell_e6").as("chi2_e6"))
    dims.select(col("r"), col("c"), col("n"), col("chi2_e6"),
      roundNorm(expr(
        "sqrt(chi2_e6 / 1e6 / (n * least(r - 1, c - 1)))"), 6).as("cramers_v"))
  }

  /** Key-gap census (`audit_key_gaps`, r13): the sequence-completeness
    * audit for a surrogate-key column — run over the order keys SEEN BY
    * LINEITEM, where childless orders leave genuine holes (the
    * referential gap the DQ quarantine routes) — total missing keys in the
    * occupied range, the number of contiguous gap RUNS, and the
    * occupancy density. The run count needs adjacency but NO window:
    * a gap run starts exactly at a key whose successor k+1 is absent
    * (and k ≠ max), so runs = (keys without a successor) − 1, and the
    * successor census is one self-equi-join on k+1 = k′ — the
    * [[graft.ops.Graph]] edge-join shape, shuffle-partitioned on the
    * key, scale-clean where a lead() window would serialize the corpus.
    */
  def keyGaps(s: SparkSession, d: String): DataFrame = {
    val keys = Sources.lineitem(s, d).select(col("l_orderkey").as("k"))
      .distinct()
    val succ = keys.join(keys.select((col("k") - 1).as("k")), Seq("k"),
      "left_semi")
    val nSucc = succ.agg(count(lit(1)).as("n_with_succ"))
    keys.agg(count(lit(1)).as("n_keys"), min("k").as("min_key"),
        max("k").as("max_key"))
      .crossJoin(broadcast(nSucc))
      .select(col("n_keys"), col("min_key"), col("max_key"),
        (col("max_key") - col("min_key") + 1 - col("n_keys"))
          .as("missing_total"),
        (col("n_keys") - col("n_with_succ") - 1).as("n_gap_runs"),
        expr("(10000L * n_keys) div (max_key - min_key + 1)")
          .as("density_bp"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "audit_key_gaps" -> (keyGaps _),
    "audit_cramers_v" -> (cramersV _),
    "audit_ks_test" -> (ksTest _),
    "audit_chi2_segment_nation" -> (chi2SegmentNation _),
    "audit_welch_ttest" -> (welchTtest _),
    "audit_pk_uniqueness" -> (pkUniqueness _),
    "audit_day_islands" -> (dayIslands _),
    "audit_benford" -> (benford _),
    "audit_column_profile" -> (columnProfile _),
    "audit_ab_experiment" -> (abExperiment _),
    "audit_referential" -> (referential _),
    "audit_content_checksum" -> (contentChecksum _),
    "ml_mutual_info" -> (mutualInfo _),
    "audit_psi_drift" -> (psiDrift _),
    "audit_contract_check" -> (contractCheck _),
    "audit_selectivity_est" -> (selectivityEst _),
    "audit_snapshot_diff" -> (snapshotDiff _),
    "audit_key_skew" -> (keySkew _),
    "audit_fuzzy_match" -> (fuzzyMatch _),
    "win_rolling_median" -> (rollingMedian _),
    "audit_equidepth_hist" -> (equidepthHist _),
    "audit_robust_outliers" -> (robustOutliers _),
  )

  private def profileCol(c: String): String =
    s"""SELECT '$c' AS col_name, count(*) AS n_rows,
       | CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       | CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
       | min(CAST($c AS VARCHAR)) AS min_s, max(CAST($c AS VARCHAR)) AS max_s
       |FROM orders""".stripMargin

  val oracles: Map[String, String] = Map(
    // successor census via the k+1 self-join, runs = no-successor - 1
    "audit_key_gaps" ->
      """WITH k AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
        | sc AS (SELECT CAST(count(*) AS BIGINT) AS n_with_succ
        |  FROM k a JOIN k b ON a.k + 1 = b.k),
        | g AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |    CAST(min(k) AS BIGINT) AS min_key,
        |    CAST(max(k) AS BIGINT) AS max_key FROM k)
        |SELECT n_keys, min_key, max_key,
        | CAST(max_key - min_key + 1 - n_keys AS BIGINT) AS missing_total,
        | CAST(n_keys - n_with_succ - 1 AS BIGINT) AS n_gap_runs,
        | CAST((10000 * n_keys) // (max_key - min_key + 1) AS BIGINT)
        |   AS density_bp
        |FROM g CROSS JOIN sc""".stripMargin,
    "audit_cramers_v" ->
      """WITH cells AS (
        |  SELECT c_mktsegment, c_nationkey, count(*) AS obs
        |  FROM customer GROUP BY c_mktsegment, c_nationkey),
        |rt AS (SELECT c_mktsegment, CAST(sum(obs) AS BIGINT) AS seg_n
        |       FROM cells GROUP BY c_mktsegment),
        |ct AS (SELECT c_nationkey, CAST(sum(obs) AS BIGINT) AS nat_n
        |       FROM cells GROUP BY c_nationkey),
        |tt AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM cells),
        |contrib AS (
        |  SELECT CAST(round(round(pow(obs - CAST(seg_n AS DOUBLE) * nat_n / n, 2) /
        |      (CAST(seg_n AS DOUBLE) * nat_n / n), 6) * 1e6) AS BIGINT) AS cell_e6,
        |    cells.c_mktsegment, cells.c_nationkey, obs
        |  FROM cells
        |  JOIN rt ON cells.c_mktsegment = rt.c_mktsegment
        |  JOIN ct ON cells.c_nationkey = ct.c_nationkey, tt)
        |SELECT CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS r,
        |  CAST(count(DISTINCT c_nationkey) AS BIGINT) AS c,
        |  CAST(sum(obs) AS BIGINT) AS n,
        |  CAST(sum(cell_e6) AS BIGINT) AS chi2_e6,
        |  round(sqrt(sum(cell_e6) / 1e6 /
        |    (sum(obs) * least(count(DISTINCT c_mktsegment) - 1,
        |                      count(DISTINCT c_nationkey) - 1))), 6) + 0.0 AS cramers_v
        |FROM contrib""".stripMargin,
    "audit_ks_test" ->
      """WITH j AS (
        |  SELECT c_mktsegment AS arm,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('MACHINERY', 'AUTOMOBILE')),
        |pv AS (SELECT cents,
        |    CAST(sum(CASE WHEN arm = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN arm = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS b
        |  FROM j GROUP BY cents),
        |cum AS (SELECT cents,
        |    CAST(sum(a) OVER (ORDER BY cents) AS BIGINT) AS cum_a,
        |    CAST(sum(b) OVER (ORDER BY cents) AS BIGINT) AS cum_b
        |  FROM pv),
        |tot AS (SELECT CAST(sum(a) AS BIGINT) AS n_a,
        |    CAST(sum(b) AS BIGINT) AS n_b FROM pv),
        |gaps AS (SELECT cents, abs(cum_a * n_b - cum_b * n_a) AS gap, n_a, n_b
        |  FROM cum, tot),
        |dm AS (SELECT max(gap) AS d_num FROM gaps)
        |SELECT any_value(gaps.n_a) AS n_a, any_value(gaps.n_b) AS n_b,
        |  CAST(CAST(any_value(dm.d_num) AS BIGINT) AS VARCHAR) AS d_num,
        |  CAST(CAST(any_value(gaps.n_a) * any_value(gaps.n_b) AS BIGINT) AS VARCHAR) AS d_den,
        |  min(cents) AS at_cents,
        |  round(CAST(any_value(dm.d_num) AS DOUBLE)
        |    / (CAST(any_value(gaps.n_a) AS DOUBLE) * any_value(gaps.n_b)), 8) + 0.0 AS ks_d
        |FROM gaps, dm WHERE gap = d_num""".stripMargin,
    "audit_chi2_segment_nation" ->
      """WITH cells AS (
        |  SELECT c_mktsegment, c_nationkey, count(*) AS obs
        |  FROM customer GROUP BY c_mktsegment, c_nationkey),
        |rt AS (SELECT c_mktsegment, CAST(sum(obs) AS BIGINT) AS seg_n
        |       FROM cells GROUP BY c_mktsegment),
        |ct AS (SELECT c_nationkey, CAST(sum(obs) AS BIGINT) AS nat_n
        |       FROM cells GROUP BY c_nationkey),
        |tt AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM cells)
        |SELECT cells.c_mktsegment, cells.c_nationkey,
        |  CAST(obs AS BIGINT) AS obs, seg_n, nat_n,
        |  round(CAST(seg_n AS DOUBLE) * nat_n / n, 6) + 0.0 AS expected,
        |  round(pow(obs - CAST(seg_n AS DOUBLE) * nat_n / n, 2) /
        |        (CAST(seg_n AS DOUBLE) * nat_n / n), 6) + 0.0 AS chi2_cell
        |FROM cells
        |JOIN rt ON cells.c_mktsegment = rt.c_mktsegment
        |JOIN ct ON cells.c_nationkey = ct.c_nationkey, tt
        |ORDER BY cells.c_mktsegment, cells.c_nationkey""".stripMargin,
    "audit_welch_ttest" ->
      """WITH j AS (
        |  SELECT c_mktsegment AS arm,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('MACHINERY', 'AUTOMOBILE')),
        |p1 AS (SELECT arm, count(*) AS n, sum(cents) AS s FROM j GROUP BY arm),
        |p2 AS (SELECT j.arm, any_value(n) AS n, any_value(s) AS s,
        |         sum(CAST(cents - CAST(s // n AS BIGINT) AS HUGEINT)
        |           * (cents - CAST(s // n AS BIGINT))) AS m2
        |       FROM j JOIN p1 ON j.arm = p1.arm GROUP BY j.arm),
        |st AS (SELECT arm, n, CAST(s AS DOUBLE) / n / 100 AS mean_usd,
        |         CAST(m2 AS DOUBLE) / (n - 1) / 1e4 AS var_usd2 FROM p2),
        |w AS (SELECT
        |  max(CASE WHEN arm = 'MACHINERY' THEN n END) AS n_a,
        |  max(CASE WHEN arm = 'MACHINERY' THEN mean_usd END) AS mean_ua,
        |  max(CASE WHEN arm = 'MACHINERY' THEN var_usd2 END) AS var_ua,
        |  max(CASE WHEN arm = 'AUTOMOBILE' THEN n END) AS n_b,
        |  max(CASE WHEN arm = 'AUTOMOBILE' THEN mean_usd END) AS mean_ub,
        |  max(CASE WHEN arm = 'AUTOMOBILE' THEN var_usd2 END) AS var_ub
        |  FROM st)
        |SELECT CAST(n_a AS BIGINT) AS n_a,
        |  round(mean_ua, 6) + 0.0 AS mean_a, round(sqrt(var_ua), 6) + 0.0 AS sd_a,
        |  CAST(n_b AS BIGINT) AS n_b,
        |  round(mean_ub, 6) + 0.0 AS mean_b, round(sqrt(var_ub), 6) + 0.0 AS sd_b,
        |  round((mean_ua - mean_ub) / sqrt(var_ua / n_a + var_ub / n_b), 6) + 0.0 AS t_stat,
        |  round(pow(var_ua / n_a + var_ub / n_b, 2) /
        |    (pow(var_ua / n_a, 2) / (n_a - 1) + pow(var_ub / n_b, 2) / (n_b - 1)), 4) + 0.0 AS df_welch
        |FROM w""".stripMargin,
    "audit_pk_uniqueness" ->
      (Seq(("customer", "c_custkey"), ("events", "event_id"), ("orders", "o_orderkey"),
        ("part", "p_partkey"), ("supplier", "s_suppkey"))
        .map { case (t, k) =>
          s"""SELECT '$t' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
             | CAST(count(DISTINCT $k) AS BIGINT) AS n_distinct,
             | CAST(count(*) - count(DISTINCT $k) AS BIGINT) AS n_dup_rows
             |FROM $t""".stripMargin
        }.mkString("", "\nUNION ALL\n", "\nORDER BY table_name")),
    "audit_day_islands" ->
      """WITH days AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS day FROM orders),
        | st AS (SELECT day FROM days WHERE day - 1 NOT IN (SELECT day FROM days)),
        | en AS (SELECT day FROM days WHERE day + 1 NOT IN (SELECT day FROM days)),
        | isl AS (SELECT st.day AS s, min(en.day) AS e
        |   FROM st JOIN en ON en.day >= st.day GROUP BY st.day)
        |SELECT strftime(s, '%Y-%m-%d') AS island_start,
        | strftime(e, '%Y-%m-%d') AS island_end,
        | CAST(datediff('day', s, e) + 1 AS BIGINT) AS n_days
        |FROM isl ORDER BY island_start""".stripMargin,
    "audit_benford" ->
      """WITH v AS (SELECT CAST(round(o_totalprice) AS BIGINT) AS v
        |  FROM orders WHERE round(o_totalprice) > 0),
        | b AS (SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit,
        |   count(*) AS n FROM v GROUP BY 1),
        | t AS (SELECT sum(n) AS tn FROM b),
        | j AS (SELECT digit, CAST(n AS BIGINT) AS n,
        |   CAST((10000 * n) // tn AS BIGINT) AS share_bp,
        |   CAST(CASE digit WHEN 1 THEN 3010 WHEN 2 THEN 1760 WHEN 3 THEN 1249
        |     WHEN 4 THEN 969 WHEN 5 THEN 791 WHEN 6 THEN 669 WHEN 7 THEN 579
        |     WHEN 8 THEN 511 ELSE 457 END AS BIGINT) AS expected_bp
        |  FROM b CROSS JOIN t)
        |SELECT digit, n, share_bp, expected_bp,
        | share_bp - expected_bp AS dev_bp
        |FROM j ORDER BY digit""".stripMargin,
    "audit_column_profile" ->
      (Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        .map(profileCol).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")),
    "audit_content_checksum" ->
      """WITH o AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |   (o_orderkey * 1000003 + o_custkey * 8191 +
        |    CAST(round(o_totalprice * 100) AS BIGINT)) % 9007199254740881 AS digest
        |  FROM orders)
        |SELECT month, CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(sum(digest) % 9007199254740881 AS BIGINT) AS checksum
        |FROM o GROUP BY month ORDER BY month""".stripMargin,
    "audit_referential" ->
      """SELECT
        | (SELECT CAST(count(*) AS BIGINT) FROM orders
        |   WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) AS orphan_orders,
        | (SELECT CAST(count(*) AS BIGINT) FROM lineitem
        |   WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS orphan_li_orders,
        | (SELECT CAST(count(*) AS BIGINT) FROM lineitem
        |   WHERE l_partkey NOT IN (SELECT p_partkey FROM part)) AS orphan_li_parts,
        | (SELECT CAST(count(*) AS BIGINT) FROM lineitem
        |   WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier)) AS orphan_li_suppliers""".stripMargin,
    "audit_ab_experiment" ->
      """WITH pu AS (SELECT user_id,
        |   CAST(CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >
        |     sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |     THEN 1 ELSE 0 END AS BIGINT) AS conv
        |  FROM events GROUP BY user_id),
        | a AS (SELECT
        |   CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |   CAST(sum(CASE WHEN user_id % 2 = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
        |   CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |   CAST(sum(CASE WHEN user_id % 2 = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_b
        |  FROM pu)
        |SELECT n_a, conv_a, n_b, conv_b,
        | round(CAST(conv_a AS DOUBLE)/n_a, 6) + 0.0 AS rate_a,
        | round(CAST(conv_b AS DOUBLE)/n_b, 6) + 0.0 AS rate_b,
        | round(CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b THEN 0.0 ELSE
        |   (CAST(conv_a AS DOUBLE)/n_a - CAST(conv_b AS DOUBLE)/n_b) /
        |   sqrt((CAST(conv_a+conv_b AS DOUBLE)/(n_a+n_b)) *
        |   (1.0 - CAST(conv_a+conv_b AS DOUBLE)/(n_a+n_b)) *
        |   (1.0/n_a + 1.0/n_b)) END, 6) + 0.0 AS z_conversion
        |FROM a""".stripMargin,
    "ml_mutual_info" ->
      """WITH o AS (SELECT o_orderpriority AS x, o_orderstatus AS y FROM orders),
        | cells AS (SELECT x, y, CAST(count(*) AS BIGINT) AS n_xy FROM o GROUP BY x, y),
        | mx AS (SELECT x, CAST(count(*) AS BIGINT) AS n_x FROM o GROUP BY x),
        | my AS (SELECT y, CAST(count(*) AS BIGINT) AS n_y FROM o GROUP BY y),
        | tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM o)
        |SELECT cells.x, cells.y, n_xy,
        | round((CAST(n_xy AS DOUBLE)/n) *
        |   ln((CAST(n_xy AS DOUBLE)*n)/(CAST(n_x AS DOUBLE)*n_y)), 6) + 0.0 AS mi_contrib
        |FROM cells JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot
        |ORDER BY x, y""".stripMargin,
    "audit_snapshot_diff" ->
      """WITH v1 AS (SELECT o_orderkey, o_totalprice AS old_total
        |   FROM orders WHERE o_orderkey % 89 <> 0),
        | v2 AS (SELECT o_orderkey,
        |   CASE WHEN o_orderkey % 101 = 0 THEN o_totalprice + 1.0
        |        ELSE o_totalprice END AS new_total
        |   FROM orders WHERE o_orderkey % 97 <> 0)
        |SELECT coalesce(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
        | CASE WHEN v1.o_orderkey IS NULL THEN 'insert'
        |      WHEN v2.o_orderkey IS NULL THEN 'delete'
        |      WHEN old_total <> new_total THEN 'update' END AS change,
        | old_total, new_total
        |FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
        |WHERE v1.o_orderkey IS NULL OR v2.o_orderkey IS NULL
        |   OR old_total <> new_total
        |ORDER BY o_orderkey""".stripMargin,
    "audit_key_skew" ->
      """WITH per_key AS (
        |   SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
        | tot AS (SELECT sum(cnt) AS total, count(*) AS n_keys FROM per_key),
        | ranked AS (SELECT user_id, cnt,
        |   row_number() OVER (ORDER BY cnt DESC, user_id) AS rnk,
        |   sum(cnt) OVER (ORDER BY cnt DESC, user_id
        |     ROWS UNBOUNDED PRECEDING) AS cum
        |   FROM per_key)
        |SELECT CAST(rnk AS BIGINT) AS rnk, user_id, cnt,
        | round(cnt::DOUBLE / total::DOUBLE, 6) + 0.0 AS share,
        | round(cum::DOUBLE / total::DOUBLE, 6) + 0.0 AS cum_share,
        | round(cnt::DOUBLE * n_keys::DOUBLE / total::DOUBLE, 4) + 0.0 AS ratio_to_mean
        |FROM ranked, tot WHERE rnk <= 10 ORDER BY rnk""".stripMargin,
    "audit_fuzzy_match" ->
      """SELECT a.p_brand, CAST(a.p_size AS BIGINT) AS p_size,
        | a.p_partkey AS key_a, b.p_partkey AS key_b,
        | a.p_name AS name_a, b.p_name AS name_b,
        | CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
        | AND a.p_partkey < b.p_partkey
        |WHERE a.p_name <> b.p_name
        |  AND levenshtein(a.p_name, b.p_name) <= 4
        |ORDER BY a.p_brand, p_size, key_a, key_b""".stripMargin,
    "win_rolling_median" ->
      """WITH daily AS (
        |   SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
        |     count(*) AS n_orders
        |   FROM orders GROUP BY 1, 2),
        | rolled AS (SELECT o_orderpriority, day, n_orders,
        |   median(n_orders) OVER (PARTITION BY o_orderpriority ORDER BY day
        |     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med7,
        |   count(*) OVER (PARTITION BY o_orderpriority ORDER BY day
        |     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS n_days
        |   FROM daily)
        |SELECT o_orderpriority, strftime(day, '%Y-%m-%d') AS day, n_orders,
        | round(med7, 1) + 0.0 AS med7
        |FROM rolled WHERE n_days = 7
        |ORDER BY o_orderpriority, day""".stripMargin,
    "audit_psi_drift" ->
      """WITH a AS (SELECT value FROM events WHERE ts < TIMESTAMP '2024-01-16'),
        | b AS (SELECT value FROM events WHERE ts >= TIMESTAMP '2024-01-16'),
        | e AS (SELECT quantile_cont(value,
        |   [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS edges FROM a),
        | ba AS (SELECT CAST(len(list_filter(e.edges, x -> value > x)) AS BIGINT)
        |   AS bucket, count(*) AS ca FROM a CROSS JOIN e GROUP BY 1),
        | bb AS (SELECT CAST(len(list_filter(e.edges, x -> value > x)) AS BIGINT)
        |   AS bucket, count(*) AS cb FROM b CROSS JOIN e GROUP BY 1),
        | na AS (SELECT count(*) AS na FROM a),
        | nb AS (SELECT count(*) AS nb FROM b),
        | g AS (SELECT CAST(r.range AS BIGINT) AS bucket,
        |   coalesce(ba.ca, 0) AS ca, coalesce(bb.cb, 0) AS cb, na.na, nb.nb
        |  FROM range(0, 10) r
        |  LEFT JOIN ba ON r.range = ba.bucket
        |  LEFT JOIN bb ON r.range = bb.bucket
        |  CROSS JOIN na CROSS JOIN nb)
        |SELECT bucket, ca, cb,
        | round((CAST(cb+1 AS DOUBLE)/(nb+10) - CAST(ca+1 AS DOUBLE)/(na+10)) *
        |   ln((CAST(cb+1 AS DOUBLE)*(na+10))/(CAST(nb+10 AS DOUBLE)*(ca+1))), 6) + 0.0 AS psi
        |FROM g ORDER BY bucket""".stripMargin,
    "audit_contract_check" ->
      """WITH rc AS (SELECT
        |  CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS totalprice_positive,
        |  CAST(sum(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P') THEN 1 ELSE 0 END)
        |    AS BIGINT) AS status_enum,
        |  CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01'
        |    OR o_orderdate >= TIMESTAMP '2000-01-01' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS orderdate_range,
        |  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS priority_nonnull
        | FROM orders),
        | fk AS (SELECT count(*) AS custkey_fk FROM orders o
        |   LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |   WHERE c.c_custkey IS NULL)
        |SELECT rule, n_violations FROM (
        |  SELECT 'totalprice_positive' AS rule, totalprice_positive AS n_violations FROM rc
        |  UNION ALL SELECT 'status_enum', status_enum FROM rc
        |  UNION ALL SELECT 'orderdate_range', orderdate_range FROM rc
        |  UNION ALL SELECT 'priority_nonnull', priority_nonnull FROM rc
        |  UNION ALL SELECT 'custkey_fk', custkey_fk FROM fk)
        |ORDER BY rule""".stripMargin,
    "audit_selectivity_est" ->
      """WITH r AS (SELECT l_extendedprice AS v,
        |   row_number() OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rnk,
        |   count(*) OVER () AS n_total
        | FROM lineitem),
        | h AS (SELECT (rnk - 1) * 16 // n_total AS bucket,
        |   count(*) AS n_rows, min(v) AS lo, max(v) AS hi
        |  FROM r GROUP BY 1),
        | est AS (SELECT CAST(coalesce(sum(n_rows), 0) AS BIGINT) AS est_rows
        |   FROM h WHERE hi >= 2000 AND lo <= 5000),
        | ex AS (SELECT count(*) AS exact_rows FROM lineitem
        |   WHERE l_extendedprice BETWEEN 2000 AND 5000)
        |SELECT est_rows, exact_rows, est_rows - exact_rows AS overest
        |FROM est CROSS JOIN ex""".stripMargin,
    "audit_robust_outliers" ->
      """WITH med AS (SELECT c_mktsegment, quantile_cont(c_acctbal, 0.5) AS med
        |   FROM customer GROUP BY c_mktsegment),
        | mad AS (SELECT c.c_mktsegment,
        |   quantile_cont(abs(c.c_acctbal - med.med), 0.5) AS mad
        |   FROM customer c JOIN med ON c.c_mktsegment = med.c_mktsegment
        |   GROUP BY c.c_mktsegment)
        |SELECT c.c_mktsegment, count(*) AS n_rows,
        | CAST(sum(CASE WHEN abs(c.c_acctbal - med.med) > 4.4478 * mad.mad
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        | any_value(med.med) AS med,
        | any_value(mad.mad) AS mad
        |FROM customer c
        |JOIN med ON c.c_mktsegment = med.c_mktsegment
        |JOIN mad ON c.c_mktsegment = mad.c_mktsegment
        |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin,
    "audit_equidepth_hist" ->
      """WITH r AS (SELECT l_extendedprice AS v,
        |   row_number() OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rnk,
        |   count(*) OVER () AS n_total
        | FROM lineitem)
        |SELECT (rnk - 1) * 16 // n_total AS bucket,
        | count(*) AS n_rows, min(v) AS lo, max(v) AS hi
        |FROM r GROUP BY 1 ORDER BY bucket""".stripMargin,
  )
}
