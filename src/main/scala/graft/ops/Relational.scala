package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Sources

/** Relational Q-series: joins, aggregations, windows, sort/limit, set ops,
  * scalar functions (SURVEY §2.4-2.9).
  *
  * The reference delegates all of this surface to BigQuery SQL it emits
  * (GOLD `VW_*` views, `materialize_gold.py:72`); here it is declared with
  * the DataFrame API so Catalyst plans it (partial aggregation, broadcast
  * vs sort-merge choice, AQE skew handling are automatic).
  *
  * Every query is deterministic: explicit `orderBy` on a unique key and
  * `round` on float aggregates, so the driver's DuckDB hash-compare is
  * stable. Aliases match the oracle SQL exactly (driver sorts columns by
  * name before hashing).
  *
  * Scale notes (100 TB):
  *  - dims (region/nation/customer bands) are broadcast — no shuffle of the
  *    fact side for those joins;
  *  - fact-fact joins (orders⋈lineitem) shuffle on the join key once; AQE
  *    handles skewed keys;
  *  - all aggregates are hash aggregates with map-side partial aggregation;
  *  - window functions shuffle once on the partition key — the same
  *    partitioning a real deployment would bucket by.
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1-style pricing summary: the flagship aggregation
    * (reference analog: the revenue rollups its GOLD views feed).
    */
  def aggPricingSummary(s: SparkSession, d: String): DataFrame =
    Sources.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 2).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"),
      )
      .orderBy("l_returnflag", "l_linestatus")

  /** Star join: broadcast dims (nation, region), shuffle join facts;
    * revenue per region/nation for one order year (TPC-H Q5 flavor).
    */
  def joinRegionRevenue(s: SparkSession, d: String): DataFrame =
    Sources.lineitem(s, d)
      .join(
        Sources.orders(s, d)
          .filter(col("o_orderdate").between(lit("1996-01-01"), lit("1996-12-31 23:59:59"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(Sources.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Sources.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Sources.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"),
      )
      .orderBy("r_name", "n_name")

  /** Theta (non-equi band) join: orders against broadcast price bands —
    * BroadcastNestedLoopJoin with a 10-row build side; at any scale the
    * fact side streams through without a shuffle.
    */
  def joinPriceBands(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bands = (0 until 10)
      .map(i => (i.toLong, i * 50000.0, (i + 1) * 50000.0))
      .toDF("band", "lo", "hi")
    Sources.orders(s, d)
      .join(broadcast(bands), col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_orders"), round(avg("o_totalprice"), 2).as("avg_price"))
      .orderBy("band")
  }

  /** Left-semi: customers that placed ≥1 order in a window, per segment. */
  def joinSemiSegment(s: SparkSession, d: String): DataFrame =
    Sources.customer(s, d)
      .join(
        Sources.orders(s, d)
          .filter(col("o_orderdate").between(lit("1995-01-01"), lit("1995-06-30 23:59:59"))),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_cust"))
      .orderBy("c_mktsegment")

  /** Left-anti: customers with NO orders in a window — the relational dual
    * of the reference's delete-range (SURVEY §2.4, S5).
    */
  def joinAntiCustomers(s: SparkSession, d: String): DataFrame =
    Sources.customer(s, d)
      .join(
        Sources.orders(s, d)
          .filter(col("o_orderdate") <= lit("1995-03-31 23:59:59")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_cust"), round(sum("c_acctbal"), 2).as("acctbal"))
      .orderBy("c_mktsegment")

  /** As-of join: for every purchase event, the latest click of the same
    * user at-or-before it. Implemented scale-first: a single window pass
    * over the unioned stream (`last(_, ignoreNulls)` over rows preceding),
    * i.e. one shuffle on `user_id` — NOT a pairwise range join, which would
    * be quadratic per user. Oracle cross-checks with DuckDB's native ASOF
    * JOIN.
    */
  def joinAsofLastClick(s: SparkSession, d: String): DataFrame = {
    val ev = Sources.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"))
    Joins.asofJoin(purchases, clicks, "user_id", "ts", Seq("ts"))
      .select(
        col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        date_format(col("asof_ts"), "yyyy-MM-dd HH:mm:ss").as("last_click_ts"),
      )
      .orderBy("event_id")
  }

  /** Nearest-click attribution within ±30 minutes ([[Joins.nearestJoin]]):
    * unlike the backward-only as-of, a purchase may match a click shortly
    * AFTER it (post-purchase confirmation clicks) — whichever is closer;
    * exact ties go to the earlier click.
    */
  def joinNearestClick(s: SparkSession, d: String): DataFrame = {
    val ev = Sources.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    Joins.nearestJoin(purchases, clicks, "user_id", "ts",
        Seq("click_id"), tolMicros = 1800000000L)
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        col("near_click_id"), col("near_delta_us"))
      .orderBy("event_id")
  }

  /** Exact distinct aggregation (Catalyst expands to a two-phase plan). */
  def aggDistinctPriority(s: SparkSession, d: String): DataFrame =
    Sources.orders(s, d)
      .groupBy("o_orderpriority")
      .agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"),
        round(max("o_totalprice"), 2).as("max_price"),
      )
      .orderBy("o_orderpriority")

  /** Approximate distinct via HLL++ — the built-in sketch; no SQL oracle
    * (approximate), rows-only checked. At 100 TB this replaces the exact
    * two-phase distinct wherever a ~2% error is acceptable.
    */
  def aggApproxDistinct(s: SparkSession, d: String): DataFrame =
    Sources.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
        count(lit(1)).as("n_rows"),
      )
      .orderBy("l_returnflag")

  /** Exact twin of [[aggApproxDistinct]] — same grouping, exact two-phase
    * distinct, hash-checked: pairs the sketch with an oracle-verified
    * companion (sketch accuracy itself is tolerance-tested in OpsSpec).
    */
  def aggExactDistinct(s: SparkSession, d: String): DataFrame =
    Sources.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_rows"),
      )
      .orderBy("l_returnflag")

  /** Exact twin of [[aggApproxPercentile]] — exact interpolated
    * percentiles over the same groups, hash-checked against DuckDB's
    * quantile_cont.
    */
  def aggExactPercentile(s: SparkSession, d: String): DataFrame =
    Sources.events(s, d)
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("median_value"),
        round(expr("percentile(value, 0.9)"), 4).as("p90_value"),
        count(lit(1)).as("n_rows"),
      )
      .orderBy("event_type")

  /** ROLLUP over the region→nation hierarchy, via the SQL surface (the
    * DataFrame `rollup` + post-agg sort trips Spark's ambiguous-self-join
    * detection on the Expand-duplicated grouping attributes; SQL resolves
    * the sort against the aggregate output unambiguously).
    */
  def aggRollupRegion(s: SparkSession, d: String): DataFrame = {
    Sources.customer(s, d)
      .join(broadcast(Sources.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Sources.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("n_name"), col("c_acctbal"))
      .createOrReplaceTempView("graft_rollup_in")
    s.sql(
      """SELECT r_name, n_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS acctbal
        |FROM graft_rollup_in GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
  }

  /** CUBE over the two lineitem flags. */
  def aggCubeFlags(s: SparkSession, d: String): DataFrame =
    Sources.lineitem(s, d)
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_rows"), round(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Per-group top-k via row_number — the scalable "top N per key" idiom
    * (single shuffle on the partition key; no global sort).
    */
  def winTopkOrders(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Sources.orders(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
      .orderBy("o_custkey", "rn")
  }

  /** lag/lead deltas per user (event_id is the deterministic order key). */
  def winLagDelta(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    Sources.events(s, d)
      .select(
        col("event_id"), col("user_id"),
        graft.functions.Num.roundNorm(col("value") - lag("value", 1).over(w), 2).as("delta_prev"),
        graft.functions.Num.roundNorm(lead("value", 1).over(w) - col("value"), 2).as("delta_next"),
      )
      .orderBy("event_id")
  }

  /** Running total frame (rows between unbounded preceding and current). */
  def winRunningSpend(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Sources.orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"),
        round(sum("o_totalprice").over(w), 2).as("running_spend"),
        count(lit(1)).over(w).as("nth_order"),
      )
      .orderBy("o_orderkey")
  }

  /** rank / dense_rank of suppliers by balance within nation. */
  def winRankSuppliers(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("s_nationkey").orderBy(col("s_acctbal").desc, col("s_suppkey"))
    Sources.supplier(s, d)
      .select(
        col("s_nationkey"), col("s_suppkey"),
        round(col("s_acctbal"), 2).as("s_acctbal"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
      )
      .orderBy("s_nationkey", "rnk", "s_suppkey")
  }

  /** Global top-k — Spark plans TakeOrderedAndProject: each partition keeps
    * k rows, driver merges k·p rows; no full sort at any scale.
    */
  def topkGlobalOrders(s: SparkSession, d: String): DataFrame =
    Sources.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
      .limit(10)

  /** EXCEPT (set-distinct) of active customer keys across two years. */
  /** Symmetric difference (`setop_symmetric_diff`, r13): customers
    * active in exactly ONE of 1995/1996, tagged by side — the churn ∪
    * acquisition set in one pass. Planned as two anti joins over the
    * two distinct-key sets (each dim-sized), unioned with the side
    * tag; a single full-outer-join + null-filter would carry both
    * sides' payloads through one shuffle for the same answer — this
    * form keeps each side semi-join-prunable.
    */
  def setopSymmetricDiff(s: SparkSession, d: String): DataFrame = {
    val ord = Sources.orders(s, d)
    def yr(y: Int) = ord.filter(year(col("o_orderdate")) === y)
      .select(col("o_custkey").as("custkey")).distinct()
    val a = yr(1995)
    val b = yr(1996)
    a.join(b, Seq("custkey"), "left_anti").withColumn("side", lit("only_1995"))
      .unionAll(
        b.join(a, Seq("custkey"), "left_anti").withColumn("side", lit("only_1996")))
      .orderBy("custkey", "side")
  }

  def setopExceptYears(s: SparkSession, d: String): DataFrame = {
    val ord = Sources.orders(s, d)
    val y95 = ord.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey").as("custkey")).distinct()
    val y96 = ord.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey").as("custkey")).distinct()
    y95.except(y96).orderBy("custkey")
  }

  /** EXCEPT ALL — BAG semantics (`setop_except_all`): the multiset of
    * 1995 part purchases minus the 1996 multiset, i.e. per part the
    * surplus purchase count 1995 carried over 1996 (set EXCEPT would
    * collapse every surviving part to one row and lose the magnitude).
    * Spark plans `exceptAll` as the generated-count union + aggregate
    * + replicate — no pairwise matching; the result is aggregated per
    * part so the output is deterministic, top-20 by (surplus, part).
    */
  def setopExceptAll(s: SparkSession, d: String): DataFrame = {
    val li = Sources.lineitem(s, d)
    val y95 = li.filter(year(col("l_shipdate")) === 1995).select(col("l_partkey").as("part"))
    val y96 = li.filter(year(col("l_shipdate")) === 1996).select(col("l_partkey").as("part"))
    y95.exceptAll(y96)
      .groupBy("part").agg(count(lit(1)).as("surplus_95"))
      .orderBy(col("surplus_95").desc, col("part"))
      .limit(20)
  }

  /** INTERSECT of active customer keys across two years. */
  def setopIntersectYears(s: SparkSession, d: String): DataFrame = {
    val ord = Sources.orders(s, d)
    val y95 = ord.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey").as("custkey")).distinct()
    val y96 = ord.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey").as("custkey")).distinct()
    y95.intersect(y96).orderBy("custkey")
  }

  /** UNION ALL with a tag column then re-aggregate (schema-aligned union,
    * the load-job relaxation analog of SURVEY §2.8).
    */
  def setopUnionTagged(s: SparkSession, d: String): DataFrame = {
    val ord = Sources.orders(s, d)
    val a = ord.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey"), lit("y1995").as("yr"))
    val b = ord.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey"), lit("y1996").as("yr"))
    a.unionByName(b)
      .groupBy("yr")
      .agg(count(lit(1)).as("n_orders"), countDistinct(col("o_custkey")).as("n_cust"))
      .orderBy("yr")
  }

  /** String scalar surface (reference uses lower/upper/replace/concat,
    * `utils.py:268,307`, `main.py:83-119`).
    */
  def scalarStringFuncs(s: SparkSession, d: String): DataFrame =
    Sources.part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        lower(col("p_brand")).as("lbrand"),
        substring(col("p_name"), 1, 8).as("prefix"),
        length(col("p_name")).cast("long").as("name_len"),
        regexp_replace(col("p_type"), "[aeiou]", "_").as("devowel"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        trim(col("p_name")).as("trimmed"),
      )
      .orderBy("p_partkey")

  /** Date scalar surface (reference date math: `config.py:152-208`,
    * `utils.py:168-175,268`).
    */
  def scalarDateFuncs(s: SparkSession, d: String): DataFrame =
    Sources.orders(s, d)
      .select(
        col("o_orderkey"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
        date_format(add_months(col("o_orderdate"), 1), "yyyy-MM-dd").as("next_month"),
        date_format(date_add(col("o_orderdate"), 7), "yyyy-MM-dd").as("plus_week"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mon"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
      )
      .orderBy("o_orderkey")

  /** Math scalar surface over a bounded key range. */
  def scalarMathFuncs(s: SparkSession, d: String): DataFrame =
    Sources.lineitem(s, d)
      .filter(col("l_orderkey") < 200)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(abs(lit(0) - col("l_discount")), 4).as("abs_disc"),
        ceil(col("l_quantity")).as("ceil_qty"),
        floor(col("l_quantity")).as("floor_qty"),
        round(pow(col("l_quantity"), 2), 2).as("qty_sq"),
        round(sqrt(col("l_extendedprice")), 4).as("sqrt_price"),
        round(greatest(col("l_tax"), col("l_discount")), 4).as("max_rate"),
        round(least(col("l_tax"), col("l_discount")), 4).as("min_rate"),
        signum(col("l_extendedprice") - lit(30000)).as("price_sign"),
      )
      .orderBy("l_orderkey", "l_linenumber")

  /** JSON extraction from the events `props` payload
    * (reference parses JSON API payloads, `utils.py:123,209`).
    */
  def scalarJsonProps(s: SparkSession, d: String): DataFrame =
    Sources.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        round(avg("k"), 2).as("avg_k"),
        min("k").as("min_k"),
        max("k").as("max_k"),
      )
      .orderBy("event_type")

  /** Array scalar surface over the embedding column (no UDFs — slice /
    * element_at / transform are codegen'd Catalyst expressions).
    */
  def scalarArrayOps(s: SparkSession, d: String): DataFrame =
    Sources.embeddings(s, d)
      .select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        graft.functions.Num.roundNorm(element_at(col("embedding"), 1).cast("double"), 6).as("first_v"),
        graft.functions.Num.roundNorm(element_at(col("embedding"), -1).cast("double"), 6).as("last_v"),
        // CSV, not a raw array: the oracle harness hashes scalar columns only;
        // `+ 0.0` collapses -0.0 so both engines format identically
        concat_ws(",", transform(slice(col("embedding"), 1, 3),
          x => format_string("%.4f", round(x.cast("double"), 4) + lit(0.0)))).as("head3_csv"),
      )
      .orderBy("vec_id")

  /** Approximate percentile sketch (GK/QuantileSummaries) — the quantile
    * analog of HLL: mergeable fixed-size state per group, the only
    * quantile that scales to 100 TB without a global sort. No oracle
    * (approximate); rows-only + tolerance-tested against exact.
    */
  def aggApproxPercentile(s: SparkSession, d: String): DataFrame =
    Sources.events(s, d)
      .groupBy("event_type")
      .agg(
        round(expr("approx_percentile(value, 0.5, 1000)"), 2).as("approx_median"),
        round(expr("approx_percentile(value, 0.99, 1000)"), 2).as("approx_p99"),
        count(lit(1)).as("n_events"),
      )
      .orderBy("event_type")

  val queries: Map[String, Q] = Map(
    "agg_pricing_summary" -> (aggPricingSummary _),
    "agg_approx_percentile" -> (aggApproxPercentile _),
    "join_region_revenue" -> (joinRegionRevenue _),
    "join_price_bands" -> (joinPriceBands _),
    "join_semi_segment" -> (joinSemiSegment _),
    "join_anti_customers" -> (joinAntiCustomers _),
    "join_asof_last_click" -> (joinAsofLastClick _),
    "join_nearest_click" -> (joinNearestClick _),
    "agg_distinct_priority" -> (aggDistinctPriority _),
    "agg_approx_distinct" -> (aggApproxDistinct _),
    "agg_rollup_region" -> (aggRollupRegion _),
    "agg_cube_flags" -> (aggCubeFlags _),
    "win_topk_orders" -> (winTopkOrders _),
    "win_lag_delta" -> (winLagDelta _),
    "win_running_spend" -> (winRunningSpend _),
    "win_rank_suppliers" -> (winRankSuppliers _),
    "topk_global_orders" -> (topkGlobalOrders _),
    "setop_except_years" -> (setopExceptYears _),
    "setop_symmetric_diff" -> (setopSymmetricDiff _),
    "setop_except_all" -> (setopExceptAll _),
    "setop_intersect_years" -> (setopIntersectYears _),
    "setop_union_tagged" -> (setopUnionTagged _),
    "scalar_string_funcs" -> (scalarStringFuncs _),
    "scalar_date_funcs" -> (scalarDateFuncs _),
    "scalar_math_funcs" -> (scalarMathFuncs _),
    "scalar_json_props" -> (scalarJsonProps _),
    "scalar_array_ops" -> (scalarArrayOps _),
    "agg_exact_distinct" -> (aggExactDistinct _),
    "agg_exact_percentile" -> (aggExactPercentile _),
  )

  val oracles: Map[String, String] = Map(
    "agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        | round(avg(l_quantity),2) AS avg_qty, round(avg(l_discount),4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "join_region_revenue" ->
      """SELECT r_name, n_name,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue, count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        | AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 23:59:59'
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "join_price_bands" ->
      """SELECT band, count(*) AS n_orders, round(avg(o_totalprice),2) AS avg_price
        |FROM orders JOIN (SELECT i AS band, i*50000.0 AS lo, (i+1)*50000.0 AS hi
        |                  FROM range(0,10) t(i)) b
        | ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band ORDER BY band""".stripMargin,
    "join_semi_segment" ->
      """SELECT c_mktsegment, count(*) AS n_cust FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders
        |  WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00' AND TIMESTAMP '1995-06-30 23:59:59')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "join_anti_customers" ->
      """SELECT c_mktsegment, count(*) AS n_cust, round(sum(c_acctbal),2) AS acctbal
        |FROM customer WHERE c_custkey NOT IN
        | (SELECT o_custkey FROM orders WHERE o_orderdate <= TIMESTAMP '1995-03-31 23:59:59')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "join_nearest_click" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events
        |   WHERE event_type = 'purchase'),
        | c AS (SELECT user_id, ts AS cts, event_id AS click_id FROM events
        |   WHERE event_type = 'click'),
        | cand AS (SELECT p.event_id, c.click_id,
        |   abs(epoch_us(CAST(p.ts AS TIMESTAMP)) -
        |       epoch_us(CAST(c.cts AS TIMESTAMP))) AS d_us,
        |   row_number() OVER (PARTITION BY p.event_id ORDER BY
        |     abs(epoch_us(CAST(p.ts AS TIMESTAMP)) -
        |         epoch_us(CAST(c.cts AS TIMESTAMP))),
        |     epoch_us(CAST(c.cts AS TIMESTAMP)), c.click_id) AS rn
        |  FROM p JOIN c ON p.user_id = c.user_id
        |  WHERE abs(epoch_us(CAST(p.ts AS TIMESTAMP)) -
        |        epoch_us(CAST(c.cts AS TIMESTAMP))) <= 1800000000),
        | best AS (SELECT event_id, click_id, d_us FROM cand WHERE rn = 1)
        |SELECT p.event_id, p.user_id,
        | strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        | best.click_id AS near_click_id, best.d_us AS near_delta_us
        |FROM p LEFT JOIN best ON p.event_id = best.event_id
        |ORDER BY p.event_id""".stripMargin,
    "join_asof_last_click" ->
      """SELECT p.event_id, p.user_id,
        | strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        | strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS last_click_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        | ON p.user_id = c.user_id AND c.ts <= p.ts
        |ORDER BY p.event_id""".stripMargin,
    "agg_distinct_priority" ->
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust,
        | count(*) AS n_orders, round(max(o_totalprice),2) AS max_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "agg_rollup_region" ->
      """SELECT r_name, n_name, count(*) AS n_cust, round(sum(c_acctbal),2) AS acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "agg_cube_flags" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows, round(sum(l_quantity),2) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "win_topk_orders" ->
      """SELECT o_custkey, rn, o_orderkey, round(o_totalprice,2) AS o_totalprice FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "win_lag_delta" ->
      """SELECT event_id, user_id,
        | round(value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id), 2) + 0.0 AS delta_prev,
        | round(lead(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) - value, 2) + 0.0 AS delta_next
        |FROM events ORDER BY event_id""".stripMargin,
    "win_running_spend" ->
      """SELECT o_custkey, o_orderkey,
        | round(sum(o_totalprice) OVER w, 2) AS running_spend,
        | count(*) OVER w AS nth_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "win_rank_suppliers" ->
      """SELECT s_nationkey, s_suppkey, round(s_acctbal,2) AS s_acctbal,
        | rank() OVER w AS rnk, dense_rank() OVER w AS drnk
        |FROM supplier
        |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
        |ORDER BY s_nationkey, rnk, s_suppkey""".stripMargin,
    "topk_global_orders" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice,2) AS o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "setop_except_all" ->
      """WITH r AS (
        |  SELECT l_partkey AS part FROM lineitem WHERE year(l_shipdate) = 1995
        |  EXCEPT ALL
        |  SELECT l_partkey AS part FROM lineitem WHERE year(l_shipdate) = 1996)
        |SELECT part, count(*) AS surplus_95 FROM r
        |GROUP BY part ORDER BY surplus_95 DESC, part LIMIT 20""".stripMargin,
    "setop_except_years" ->
      """SELECT DISTINCT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
        |EXCEPT SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |ORDER BY custkey""".stripMargin,
    "setop_symmetric_diff" ->
      """WITH a AS (SELECT DISTINCT o_custkey AS custkey FROM orders
        |  WHERE year(CAST(o_orderdate AS DATE)) = 1995),
        | b AS (SELECT DISTINCT o_custkey AS custkey FROM orders
        |  WHERE year(CAST(o_orderdate AS DATE)) = 1996)
        |SELECT custkey, side FROM (
        |  SELECT custkey, 'only_1995' AS side FROM a
        |   WHERE custkey NOT IN (SELECT custkey FROM b)
        |  UNION ALL
        |  SELECT custkey, 'only_1996' FROM b
        |   WHERE custkey NOT IN (SELECT custkey FROM a))
        |ORDER BY custkey, side""".stripMargin,
    "setop_intersect_years" ->
      """SELECT DISTINCT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
        |INTERSECT SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |ORDER BY custkey""".stripMargin,
    "setop_union_tagged" ->
      """SELECT yr, count(*) AS n_orders, count(DISTINCT o_custkey) AS n_cust FROM (
        | SELECT o_custkey, 'y1995' AS yr FROM orders WHERE year(o_orderdate) = 1995
        | UNION ALL
        | SELECT o_custkey, 'y1996' AS yr FROM orders WHERE year(o_orderdate) = 1996)
        |GROUP BY yr ORDER BY yr""".stripMargin,
    "scalar_string_funcs" ->
      """SELECT p_partkey, upper(p_name) AS uname, lower(p_brand) AS lbrand,
        | substring(p_name, 1, 8) AS prefix, length(p_name) AS name_len,
        | regexp_replace(p_type, '[aeiou]', '_', 'g') AS devowel,
        | concat_ws('|', p_brand, p_type) AS brand_type, trim(p_name) AS trimmed
        |FROM part ORDER BY p_partkey""".stripMargin,
    "scalar_date_funcs" ->
      """SELECT o_orderkey,
        | strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        | strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
        | strftime(o_orderdate + INTERVAL 1 MONTH, '%Y-%m-%d') AS next_month,
        | strftime(o_orderdate + INTERVAL 7 DAY, '%Y-%m-%d') AS plus_week,
        | year(o_orderdate) AS yr, month(o_orderdate) AS mon,
        | dayofmonth(o_orderdate) AS dom, dayofweek(o_orderdate) + 1 AS dow
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "scalar_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        | round(abs(0 - l_discount), 4) AS abs_disc,
        | CAST(ceil(l_quantity) AS BIGINT) AS ceil_qty,
        | CAST(floor(l_quantity) AS BIGINT) AS floor_qty,
        | round(pow(l_quantity, 2), 2) AS qty_sq,
        | round(sqrt(l_extendedprice), 4) AS sqrt_price,
        | round(greatest(l_tax, l_discount), 4) AS max_rate,
        | round(least(l_tax, l_discount), 4) AS min_rate,
        | CAST(sign(l_extendedprice - 30000) AS DOUBLE) AS price_sign
        |FROM lineitem WHERE l_orderkey < 200 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "scalar_json_props" ->
      """SELECT event_type, count(*) AS n_events,
        | round(avg(k), 2) AS avg_k, min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "agg_exact_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_exact_percentile" ->
      """SELECT event_type, round(quantile_cont(value, 0.5), 4) AS median_value,
        | round(quantile_cont(value, 0.9), 4) AS p90_value, count(*) AS n_rows
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "scalar_array_ops" ->
      """SELECT vec_id, len(embedding) AS dim,
        | round(CAST(embedding[1] AS DOUBLE), 6) + 0.0 AS first_v,
        | round(CAST(embedding[-1] AS DOUBLE), 6) + 0.0 AS last_v,
        | array_to_string(list_transform(embedding[1:3],
        |   x -> printf('%.4f', round(CAST(x AS DOUBLE), 4) + 0.0)), ',') AS head3_csv
        |FROM embeddings ORDER BY vec_id""".stripMargin,
  )
}
