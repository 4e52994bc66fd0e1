package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Sources

/** Decision-support analytics — the complex-query surface of the engine:
  * correlated subqueries (which Catalyst decorrelates into aggregate +
  * join plans), EXISTS / NOT EXISTS (semi / anti joins), and the two
  * event-history analyses every product pipeline runs (conversion
  * funnel, retention cohorts).
  *
  * The three `complex_*` queries are deliberately expressed through
  * `spark.sql` over registered views rather than the DataFrame API: they
  * exercise the SQL surface end-to-end (parser → analyzer → decorrelation
  * rules), proving a reference user could bring their SQL unchanged. The
  * oracle text is near-identical SQL, so the pair also documents engine
  * parity at the language level.
  */
object Analytics {

  /** Register the TPC-H-ish fixture tables as temp views for spark.sql. */
  private def views(s: SparkSession, d: String, names: String*): Unit =
    names.foreach(n => Sources.table(s, d, n).createOrReplaceTempView(n))

  /** Q2-style correlated scalar subquery: for every part, the suppliers
    * offering its minimum unit cost. `unit_cost` is a MIN over exact
    * per-row divisions (no accumulation), so the correlated equality is
    * bit-deterministic in any engine — best_cost ships UNROUNDED because
    * both engines produce the identical IEEE double, while decimal
    * rounding of a binary double is engine-dependent at ties. Catalyst
    * decorrelates the subquery
    * into a per-part aggregate joined back on the part key — two
    * shuffles over the cost table, no per-row subquery execution.
    */
  def minCostSupplier(s: SparkSession, d: String): DataFrame = {
    views(s, d, "lineitem", "part", "supplier")
    s.sql("""
      WITH costs AS (
        SELECT l_partkey AS partkey, l_suppkey AS suppkey,
               min(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey)
      SELECT p.p_partkey, s.s_suppkey, p.p_name, s.s_name,
             c.unit_cost AS best_cost
      FROM costs c
      JOIN part p ON c.partkey = p.p_partkey
      JOIN supplier s ON c.suppkey = s.s_suppkey
      WHERE c.unit_cost = (SELECT min(c2.unit_cost) FROM costs c2
                           WHERE c2.partkey = c.partkey)
      ORDER BY p.p_partkey, s.s_suppkey""")
  }

  /** Q18-style IN-subquery with HAVING: large-quantity orders and their
    * customers. The IN rewrites to a semi join against the HAVING
    * aggregate; quantities are integer-valued doubles, so the sums and
    * the threshold comparison are exact.
    */
  def bigOrders(s: SparkSession, d: String): DataFrame = {
    views(s, d, "customer", "orders", "lineitem")
    s.sql("""
      SELECT c_name, o_orderkey, round(sum(l_quantity), 1) AS total_qty
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
      GROUP BY c_name, o_orderkey
      ORDER BY total_qty DESC, o_orderkey""")
  }

  /** Churn via EXISTS / NOT EXISTS: customers who ordered in 1995 but
    * never again in 1996. Catalyst plans the pair as a semi join plus an
    * anti join on the customer key — the scale-correct shape (never a
    * per-customer probe).
    */
  def churnedCustomers(s: SparkSession, d: String): DataFrame = {
    views(s, d, "customer", "orders")
    s.sql("""
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND year(o.o_orderdate) = 1995)
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey AND year(o.o_orderdate) = 1996)
      ORDER BY c_custkey""")
  }

  /** Conversion funnel with per-stage 1-day windows: first view → first
    * click within a day of it → first purchase within a day of that
    * click. Each stage is a user-keyed aggregate then an equi-join back
    * to the event stream — at 100 TB the funnel costs three shuffles on
    * user_id, and the time windows keep the join fan-out per user
    * bounded. The fixture yields a real dropoff (150 → 60 → 25 at
    * sf0.01), so every stage binds.
    */
  def funnel(s: SparkSession, d: String): DataFrame = {
    val ev = Sources.events(s, d)
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val c = v.join(ev.filter(col("event_type") === "click").select(col("user_id"), col("ts")), "user_id")
      .filter(col("ts") > col("t1") && col("ts") <= col("t1") + expr("INTERVAL 1 DAY"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val p = c.join(ev.filter(col("event_type") === "purchase").select(col("user_id"), col("ts")), "user_id")
      .filter(col("ts") > col("t2") && col("ts") <= col("t2") + expr("INTERVAL 1 DAY"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    v.agg(count(lit(1)).as("n_users")).select(lit("1_view").as("stage"), col("n_users"))
      .unionAll(c.agg(count(lit(1)).as("n_users")).select(lit("2_click").as("stage"), col("n_users")))
      .unionAll(p.agg(count(lit(1)).as("n_users")).select(lit("3_purchase").as("stage"), col("n_users")))
      .orderBy("stage")
  }

  /** Retention cohorts over order history: customers grouped by first-
    * order year, counted as retained in each later year they ordered
    * (offsets 0-3). Two aggregates and one equi-join on the customer key
    * — cohort analysis over any corpus size is three linear shuffles.
    */
  def retentionCohorts(s: SparkSession, d: String): DataFrame = {
    val orders = Sources.orders(s, d)
    val f = orders.groupBy("o_custkey")
      .agg(min(year(col("o_orderdate"))).cast("long").as("cohort"))
    val act = orders
      .select(col("o_custkey"), year(col("o_orderdate")).cast("long").as("yr"))
      .distinct()
    f.join(act, "o_custkey")
      .withColumn("yr_offset", col("yr") - col("cohort"))
      .filter(col("yr_offset") <= 3)
      .groupBy("cohort", "yr_offset")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("cohort", "yr_offset")
  }

  /** 2-D skyline (Pareto frontier) over parts: the cheapest-for-their-
    * size parts — p survives iff NO part is (price ≤, size ≥) with at
    * least one strict. Computed WITHOUT a self-join: collapse to price
    * levels (distinct price → max size), then one running-max window
    * ordered by price gives, per level, the best size at-or-below and
    * strictly-below; a part is dominated iff either beats its size.
    * The running max uses the algebraic skyline merge —
    * skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B)) — in its two-pass
    * [[Prefix]] form: each range partition's LOCAL running max IS its
    * local frontier, the k per-partition maxima are the frontier
    * summaries (merged on the driver, k = #partitions), and the broadcast
    * prefix-max offset folds the earlier partitions' frontier into each
    * local one. Max is exact and associative, so results are
    * bit-identical to the global window with no single-partition sort
    * however many price levels exist (the NOT-EXISTS oracle is the
    * quadratic semantics this plan avoids).
    */
  def skylineParts(s: SparkSession, d: String): DataFrame = {
    val pts = Sources.part(s, d)
      .select(col("p_partkey"), col("p_size").cast("long").as("p_size"), col("p_retailprice"))
    val levels = Prefix.running(
      pts.groupBy("p_retailprice").agg(max("p_size").as("lvl_size")),
      order = Seq(col("p_retailprice").asc),
      maxes = Seq(Prefix.RunMax(col("lvl_size"), "best_le", Some("best_lt"))))
    pts.join(levels.select("p_retailprice", "best_le", "best_lt"), Seq("p_retailprice"))
      .filter(!(coalesce(col("best_lt") >= col("p_size"), lit(false)) ||
        col("best_le") > col("p_size")))
      .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
      .orderBy("p_retailprice", "p_partkey")
  }

  /** Linear (equal-weight) revenue attribution — the marketing-science
    * twin of the funnel: each purchase's revenue is split equally across
    * the user's touch events (click / view / signup) in the 7 days
    * before it, with purchases that had no preceding touch reported as
    * unattributed. Revenue is integer CENTS and each channel's share is
    * `(cents · n_channel) div n_total` — integer floor division, with
    * the per-purchase remainder reported as its own `residual` channel,
    * so total mass is conserved and the gate is an EXACT compare.
    *
    * Scale shape: ONE shuffle on `user_id`, then per-purchase touch
    * counts come from a RANGE frame (`[ts − 7d, ts]` in micros) over the
    * unioned touch+purchase stream — never the `p ⨝ t ON t.ts BETWEEN …`
    * range join, which degenerates to a per-user cross product (the
    * oracle runs that quadratic form; the engine must not).
    */
  /** Exact Shapley channel attribution (`join_attribution_shapley`,
    * r13): the game-theoretic credit split the linear/U-shaped
    * heuristics approximate — with a 4-channel universe the coalition
    * space is 16 subsets, so the EXACT Shapley value is a closed
    * enumeration, not a simulation: per converting user, the channel
    * set touched BEFORE the first purchase collapses to a 4-bit mask
    * (one bit_or aggregate); the characteristic function
    * v(S) = #conversions with mask ⊆ S is a 16×16 broadcast
    * subset-sum; and φ_c = Σ_{S∌c} w(|S|)·(v(S∪c) − v(S)) uses the
    * published ×24 integer weights {6,2,2,6} (s!(3−s)! for s = |S|) —
    * every credit is an exact multiple of 1/24, shipped as phi_24 with
    * the e6 ratio alongside. Efficiency (Σφ = v(full) − v(∅)) is
    * spec-pinned. One events scan + user-keyed aggs; everything after
    * is 16-row model-sized algebra.
    */
  def attributionShapley(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val chans = Seq("click" -> 1L, "view" -> 2L, "signup" -> 4L, "error" -> 8L)
    val ev = Sources.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"))
    val firstP = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min("us").as("p_us"))
    val maskOf = chans.foldLeft(lit(0L)) { case (acc, (t, b)) =>
      acc + when(col("event_type") === t, lit(b)).otherwise(0L)
    }
    val masks = ev.join(firstP, Seq("user_id"))
      .filter(col("us") < col("p_us"))
      .select(col("user_id"), maskOf.as("mb"))
      .groupBy("user_id")
      .agg(expr("bit_or(mb)").as("mask"))
    val nOf = masks.groupBy("mask").agg(count(lit(1)).as("n_conv"))
    val subsets = s.range(0, 16).select(col("id").as("s_mask"))
    val vOf = subsets.join(broadcast(nOf),
        (col("mask").bitwiseAND(col("s_mask"))) === col("mask"), "left")
      .groupBy("s_mask").agg(coalesce(sum("n_conv"), lit(0L)).as("v"))
    val chanDf = chans.toDF("channel", "cbit")
    val terms = chanDf.crossJoin(broadcast(vOf.as("vs")))
      .filter((col("s_mask").bitwiseAND(col("cbit"))) === 0L)
      .withColumn("w24", expr(
        "CASE bit_count(s_mask) WHEN 0 THEN 6L WHEN 1 THEN 2L " +
          "WHEN 2 THEN 2L ELSE 6L END"))
      .join(broadcast(vOf.select(col("s_mask").as("su_mask"),
        col("v").as("v_up"))),
        col("su_mask") === (col("s_mask") + col("cbit")))
      .groupBy("channel")
      .agg(sum(col("w24") * (col("v_up") - col("v"))).as("phi_24"))
    terms
      .select(col("channel"), col("phi_24"),
        expr("(phi_24 * 1000000L) div 24").as("phi_e6"))
      .orderBy("channel")
  }

  def attributionLinear(s: SparkSession, d: String): DataFrame = {
    val touch = Seq("click", "view", "signup")
    val base = Sources.events(s, d)
      .filter(col("event_type").isin("purchase" +: touch: _*))
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_type"),
        when(col("event_type") === "purchase",
          round(col("value") * 100).cast("long")).as("cents"))
    val w = Window.partitionBy("user_id").orderBy("us")
      .rangeBetween(-7L * 86400L * 1000000L, 0L)
    val nOf = touch.map { t =>
      t -> sum(when(col("event_type") === t, 1L).otherwise(0L)).over(w)
    }
    val perPurchase = nOf.foldLeft(base) { case (df, (t, c)) => df.withColumn(s"n_$t", c) }
      .filter(col("event_type") === "purchase")
      .withColumn("total", touch.map(t => col(s"n_$t")).reduce(_ + _))
    val shares = touch.map { t =>
      sum(expr(s"CASE WHEN total > 0 THEN (cents * n_$t) div total ELSE 0 END"))
        .as(s"c_$t")
    }
    val resid = sum(expr(
      "CASE WHEN total > 0 THEN cents - (" +
        touch.map(t => s"(cents * n_$t) div total").mkString(" + ") +
        ") ELSE 0 END")).as("c_residual")
    val unatt = sum(when(col("total") === 0, col("cents")).otherwise(0L)).as("c_unattributed")
    perPurchase.agg(shares.head, (shares.tail :+ resid :+ unatt): _*)
      .select(expr(
        "stack(5, 'click', c_click, 'view', c_view, 'signup', c_signup, " +
          "'residual', c_residual, 'unattributed', c_unattributed) " +
          "AS (channel, attributed_cents)"))
      .orderBy("channel")
  }

  /** Position-based (U-shaped) attribution
    * (`join_attribution_ushaped`, r13): the 40/20/40 model next to
    * [[attributionLinear]]'s equal split — first and last touch in the
    * 7-day window carry 40 % each, middles share the 20 %. Exact
    * integer allocation with every convention PINNED (conventions are
    * where attribution implementations silently diverge): n = 1 →
    * 100 % to the only touch; n = 2 → div-2 split, remainder cent to
    * the FIRST; n ≥ 3 → first = last = (2·cents) div 5, middles split
    * the exact remainder by div with the division residue reported as
    * its own 'residual' channel (the largest-remainder discipline of
    * `agg_largest_remainder`, simplified to a visible residue row).
    * First/last identified by min/max over a struct (us, event_id,
    * type) — a TOTAL order, so the oracle's identical window replays
    * them bit-for-bit. One windowed pass over the user-keyed event
    * stream + one global aggregate.
    */
  def attributionUShaped(s: SparkSession, d: String): DataFrame = {
    val touch = Seq("click", "view", "signup")
    val base = Sources.events(s, d)
      .filter(col("event_type").isin("purchase" +: touch: _*))
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        col("event_type"),
        when(col("event_type") === "purchase",
          round(col("value") * 100).cast("long")).as("cents"))
    val w = Window.partitionBy("user_id").orderBy("us")
      .rangeBetween(-7L * 86400L * 1000000L, 0L)
    val tStruct = when(col("event_type").isin(touch: _*),
      struct(col("us"), col("event_id"), col("event_type")))
    val counted = touch.foldLeft(
      base
        .withColumn("fst", min(tStruct).over(w))
        .withColumn("lst", max(tStruct).over(w))) { (df, t) =>
      df.withColumn(s"n_$t",
        sum(when(col("event_type") === t, 1L).otherwise(0L)).over(w))
    }
    val per = counted
      .filter(col("event_type") === "purchase")
      .withColumn("total", touch.map(t => col(s"n_$t")).reduce(_ + _))
      .withColumn("f_type", col("fst.event_type"))
      .withColumn("l_type", col("lst.event_type"))
      .withColumn("first_c",
        when(col("total") === 0, lit(0L))
          .when(col("total") === 1, col("cents"))
          .when(col("total") === 2, col("cents") - expr("cents div 2"))
          .otherwise(expr("(2 * cents) div 5")))
      .withColumn("last_c",
        when(col("total") <= 1, lit(0L))
          .when(col("total") === 2, expr("cents div 2"))
          .otherwise(expr("(2 * cents) div 5")))
      .withColumn("mtot",
        when(col("total") >= 3, col("cents") - col("first_c") - col("last_c"))
          .otherwise(lit(0L)))
      .withColumn("per_mid", when(col("total") >= 3,
        expr("mtot div (total - 2)")).otherwise(lit(0L)))
      .withColumn("resid", when(col("total") >= 3,
        col("mtot") - col("per_mid") * (col("total") - 2)).otherwise(lit(0L)))
    val channelCredit = touch.map { t =>
      sum(
        when(col("total") === 0, lit(0L)).otherwise(
          when(col("f_type") === t, col("first_c")).otherwise(lit(0L)) +
            when(col("l_type") === t && col("total") >= 2, col("last_c"))
              .otherwise(lit(0L)) +
            col("per_mid") * (col(s"n_$t") -
              when(col("f_type") === t, 1L).otherwise(0L) -
              when(col("l_type") === t && col("total") >= 2, 1L).otherwise(0L))))
        .as(s"c_$t")
    }
    val resid = sum(col("resid")).as("c_residual")
    val unatt = sum(when(col("total") === 0, col("cents")).otherwise(0L))
      .as("c_unattributed")
    per.agg(channelCredit.head, (channelCredit.tail :+ resid :+ unatt): _*)
      .select(expr(
        "stack(5, 'click', c_click, 'view', c_view, 'signup', c_signup, " +
          "'residual', c_residual, 'unattributed', c_unattributed) " +
          "AS (channel, attributed_cents)"))
      .orderBy("channel")
  }

  /** Q5-style local-supplier revenue (`join_local_supplier_rev`): the
    * canonical star-schema plan — the lineitem fact joins orders on the
    * shuffle side, then customer/supplier by key PLUS the
    * nation-locality predicate, while nation and region attach as
    * explicit `broadcast()`s (dims stay dim-sized at any corpus scale,
    * so the fact table never shuffles for them). Revenue is the exact
    * integer Σ cents·(100−disc_cents) in 10⁻⁴-dollar units — no float
    * accumulation, so the five-way join is hash-gate exact. The 1995
    * year filter sits on orders ahead of every join (pushdown visible in
    * the scan's PushedFilters).
    */
  def localSupplierRevenue(s: SparkSession, d: String): DataFrame = {
    val li = Sources.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"),
      round(col("l_extendedprice") * 100).cast("long").as("cents"),
      round(col("l_discount") * 100).cast("long").as("disc"))
    val ord = Sources.orders(s, d).filter(year(col("o_orderdate")) === 1995)
      .select("o_orderkey", "o_custkey")
    val cust = Sources.customer(s, d).select("c_custkey", "c_nationkey")
    val sup = Sources.supplier(s, d).select("s_suppkey", "s_nationkey")
    val nat = Sources.nation(s, d).select("n_nationkey", "n_name", "n_regionkey")
    val reg = Sources.region(s, d).select("r_regionkey", "r_name")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(sum(col("cents") * (lit(100L) - col("disc"))).as("revenue_e4"),
        count(lit(1)).as("n_lines"))
      .orderBy("r_name", "n_name")
  }

  /** Q14-style promotion share: per ship month, promo revenue as an
    * integer basis-point share of total revenue. One fact-side join to
    * `part` (broadcast at dimension scale, shuffle + AQE beyond), one
    * month-grain aggregate; revenue in exact 1e-4-dollar units
    * (cents × (100 − disc-in-%)) and the share via integer floor
    * division, so every output value is an exact Long in both engines.
    */
  def promoShare(s: SparkSession, d: String): DataFrame = {
    views(s, d, "lineitem", "part")
    s.sql("""
      WITH m AS (
        SELECT (year(l_shipdate) * 100 + month(l_shipdate)) AS ym,
               CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev,
               p_type
        FROM lineitem JOIN part ON l_partkey = p_partkey)
      SELECT CAST(ym AS BIGINT) AS ym,
             CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS BIGINT) AS promo_e4,
             CAST(sum(rev) AS BIGINT) AS total_e4,
             CAST((10000 * sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END))
               DIV sum(rev) AS BIGINT) AS promo_share_bp
      FROM m GROUP BY ym ORDER BY ym""")
  }

  /** Q17-style small-quantity revenue: per brand, the revenue carried by
    * lineitems whose quantity is below 20% of their part's average. The
    * correlated `avg` decorrelates into a per-part aggregate joined back
    * on the part key; the threshold comparison is cross-multiplied to
    * integers (`5·qty·n < Σqty` ⇔ `qty < 0.2·avg`), so the filter — the
    * part both engines could disagree on in float — is exact. Quantities
    * are integer-valued doubles; the BIGINT cast is value-preserving in
    * both engines.
    */
  def smallQtyRev(s: SparkSession, d: String): DataFrame = {
    views(s, d, "lineitem", "part")
    s.sql("""
      WITH pa AS (SELECT l_partkey AS pk,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
               count(*) AS n
             FROM lineitem GROUP BY l_partkey)
      SELECT p_brand,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
             count(*) AS n_lines
      FROM lineitem
      JOIN pa ON l_partkey = pa.pk
      JOIN part ON l_partkey = p_partkey
      WHERE 5 * CAST(l_quantity AS BIGINT) * pa.n < pa.sq
      GROUP BY p_brand ORDER BY p_brand""")
  }

  /** Q4-style late-shipment priority count: orders (by priority) with at
    * least one lineitem shipped more than a year after the order date.
    * The correlated EXISTS carries a non-equi conjunct referencing the
    * outer row (`l_shipdate > o_orderdate + 365d`); Catalyst plans it as
    * a semi join on the order key with the date comparison as the join
    * residual — one shuffle, never a per-order probe.
    */
  def lateOrders(s: SparkSession, d: String): DataFrame = {
    views(s, d, "orders", "lineitem")
    s.sql("""
      SELECT o_orderpriority, count(*) AS n_orders
      FROM orders o
      WHERE EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey
                      AND l.l_shipdate > o.o_orderdate + INTERVAL 365 DAY)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")
  }

  /** Q15-style top supplier: the supplier(s) achieving the maximum 1995
    * shipped revenue. The scalar `max` subquery over the revenue CTE is
    * the classic max-join decorrelation — Catalyst evaluates the 1-row
    * scalar subquery once and broadcasts it into the filter, never a
    * per-row rescan. Revenue in exact 1e-4-dollar integer units, so the
    * `=` against the max — where float engines disagree — compares
    * exact Longs, and ALL tied suppliers surface (the Q15 semantics).
    */
  def topSupplier(s: SparkSession, d: String): DataFrame = {
    views(s, d, "lineitem", "supplier")
    s.sql("""
      WITH rev AS (SELECT l_suppkey AS suppkey,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS total_rev
             FROM lineitem WHERE year(l_shipdate) = 1995 GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_rev
      FROM supplier JOIN rev ON s_suppkey = suppkey
      WHERE total_rev = (SELECT max(total_rev) FROM rev)
      ORDER BY s_suppkey""")
  }

  /** Q3-style shipping priority: top-10 building-segment orders by the
    * revenue still unshipped at the cutoff (ordered before, shipped
    * after 1998-01-01). Three-way fact join with both date predicates
    * pushed to the scans; revenue in exact 1e-4-dollar units so the
    * DESC sort and the top-10 cut (tie-broken by date and key — a total
    * order) are engine-exact. TakeOrderedAndProject finishes it.
    */
  def shippingPriority(s: SparkSession, d: String): DataFrame = {
    views(s, d, "customer", "orders", "lineitem")
    s.sql("""
      SELECT l_orderkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4,
             date_format(o_orderdate, 'yyyy-MM-dd') AS orderdate, o_orderpriority
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < DATE '1998-01-01' AND l_shipdate > DATE '1998-01-01'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue_e4 DESC, orderdate, l_orderkey LIMIT 10""")
  }

  /** Q10-style returned-item report: top-20 customers by revenue they
    * returned in 1996Q1 — the churn-risk ranking. Four-way join
    * (nation broadcast at dimension scale), quarter predicate pushed to
    * the orders scan, exact integer revenue, total-order top-20.
    */
  def returnedItems(s: SparkSession, d: String): DataFrame = {
    views(s, d, "customer", "orders", "lineitem", "nation")
    s.sql("""
      SELECT c_custkey, c_name, n_name,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue_e4 DESC, c_custkey LIMIT 20""")
  }

  /** Q8-style national market share: NATION_3's share of supplier
    * revenue within the EUROPE customer region, per order year, in
    * integer basis points. Six-way star join (nation aliased twice —
    * once for the customer side, once for the supplier side; region +
    * both nation arms broadcast at dimension scale), year-grain
    * aggregate, integer floor-division share. The 10⁴·Σrev product
    * stays in Long to ~sf1 per year-group (≈8.6e17 at sf0.1); a larger
    * deployment promotes the share numerator to DECIMAL — same note as
    * the assortativity power sums.
    */
  def marketShare(s: SparkSession, d: String): DataFrame = {
    views(s, d, "lineitem", "orders", "customer", "nation", "region", "supplier")
    s.sql("""
      WITH j AS (
        SELECT year(o_orderdate) AS yr,
               CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev,
               sn.n_name AS supp_nation
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE r_name = 'EUROPE')
      SELECT CAST(yr AS BIGINT) AS yr,
             CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev ELSE 0 END) AS BIGINT) AS nation_e4,
             CAST(sum(rev) AS BIGINT) AS total_e4,
             CAST((10000 * sum(CASE WHEN supp_nation = 'NATION_3' THEN rev ELSE 0 END))
               DIV sum(rev) AS BIGINT) AS share_bp
      FROM j GROUP BY yr ORDER BY yr""")
  }

  /** Q6-style forecast-revenue change: the revenue that would be gained
    * by eliminating small discounts on low-quantity 1996 lineitems —
    * a pure scan-filter-aggregate whose every predicate (year band,
    * integer discount band via the exact cents representation, quantity
    * cap) pushes to the parquet scan. One row, exact integer output.
    */
  def forecastRevenue(s: SparkSession, d: String): DataFrame = {
    views(s, d, "lineitem")
    s.sql("""
      SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_e4,
             count(*) AS n_lines
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
        AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
        AND l_quantity < 24""")
  }

  /** Q19-style disjunctive band revenue: three OR-ed (brand, quantity
    * band, size band) conjunctions — the classic test that the planner
    * pushes a disjunction of conjunctions into one scan + join instead
    * of three unions. Exact integer revenue per matching band tag.
    */
  def disjunctBands(s: SparkSession, d: String): DataFrame = {
    views(s, d, "lineitem", "part")
    s.sql("""
      SELECT CASE WHEN p_brand = 'Brand#1' THEN 'small'
                  WHEN p_brand = 'Brand#2' THEN 'medium'
                  ELSE 'large' END AS band,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4,
             count(*) AS n_lines
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
         OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
         OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
      GROUP BY band ORDER BY band""")
  }

  /** Q7-style bilateral volume: yearly shipped revenue where the
    * supplier sits in one three-nation bloc and the customer in the
    * other (either direction) — the cross-border flow report. Five-way join, both nation
    * arms broadcast, the (supplier, customer) nation pair as the
    * grouping key alongside the year; exact integer revenue.
    */
  def nationVolume(s: SparkSession, d: String): DataFrame = {
    views(s, d, "lineitem", "orders", "customer", "supplier", "nation")
    s.sql("""
      SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS yr,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      WHERE (sn.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
              AND cn.n_name IN ('NATION_4', 'NATION_5', 'NATION_6'))
         OR (sn.n_name IN ('NATION_4', 'NATION_5', 'NATION_6')
              AND cn.n_name IN ('NATION_1', 'NATION_2', 'NATION_3'))
      GROUP BY supp_nation, cust_nation, yr
      ORDER BY supp_nation, cust_nation, yr""")
  }

  /** Q13-style customer order-count distribution: how many customers
    * placed exactly k orders, INCLUDING the zero bucket — the left
    * outer join whose null-preserving count is the whole point (an
    * inner join silently drops never-ordered customers). Two
    * aggregates over one outer equi-join; exact integers.
    */
  def custOrderDist(s: SparkSession, d: String): DataFrame = {
    views(s, d, "customer", "orders")
    s.sql("""
      WITH c AS (
        SELECT c_custkey, count(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey)
      SELECT n_orders, count(*) AS n_customers
      FROM c GROUP BY n_orders
      ORDER BY n_customers DESC, n_orders""")
  }

  /** Q16-style supplier-count report: per (brand, size band), how many
    * distinct suppliers ship the part family — the assortment-breadth
    * report, with the part-supplier incidence derived from lineitem
    * (the fixture has no partsupp table; the distinct aggregate is the
    * same shape). One distinct + one count-distinct aggregate over a
    * dimension join.
    */
  def partSuppliers(s: SparkSession, d: String): DataFrame = {
    views(s, d, "lineitem", "part")
    s.sql("""
      WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
      SELECT p_brand, CAST((p_size - 1) DIV 10 AS BIGINT) AS size_band,
             CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
             CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
      FROM ps JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand, size_band
      ORDER BY p_brand, size_band""")
  }

  /** Q9-style product profit: per (supplier nation, order year), profit
    * = revenue − 80%-of-retail supply cost (the fixture has no partsupp
    * supply cost; 0.8·p_retailprice is the stand-in, stated in the
    * oracle identically). Four-way star join — fact side shuffles once
    * on the order key, the part/supplier/nation dims broadcast at
    * dimension scale. Profit is computed entirely in exact 1e-4-dollar
    * integers: cents·(100−disc) for revenue, 80·retail_cents·qty for
    * cost (quantities are integer-valued doubles), so the per-group sum
    * is engine-independent at any scale — no float accumulation order
    * to disagree on across 1000 executors.
    */
  def productProfit(s: SparkSession, d: String): DataFrame = {
    views(s, d, "lineitem", "orders", "part", "supplier", "nation")
    s.sql("""
      SELECT n_name AS supp_nation, CAST(year(o_orderdate) AS BIGINT) AS yr,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))
                  - 80 * CAST(round(p_retailprice * 100) AS BIGINT)
                    * CAST(l_quantity AS BIGINT)) AS BIGINT) AS profit_e4,
             count(*) AS n_lines
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY supp_nation, yr
      ORDER BY supp_nation, yr""")
  }

  /** Q11-style important parts: parts whose discounted revenue exceeds
    * 1.5× the mean per-part revenue — the HAVING-against-a-global-scalar
    * shape (Catalyst plans the scalar subquery as a one-row broadcast
    * over the per-part aggregate, one shuffle total). The threshold is
    * scale-INVARIANT (a fraction-of-total cut like TPC-H's 0.0001 stops
    * binding as the part count grows) and the comparison is
    * cross-multiplied to exact integers: v > 1.5·T/n ⇔ 2·n·v > 3·T with
    * v, T in 1e-4-dollar units — the one row both engines could disagree
    * on in float sits exactly on the boundary, and integers have no
    * boundary ulps.
    */
  def importantParts(s: SparkSession, d: String): DataFrame = {
    views(s, d, "lineitem", "part")
    s.sql("""
      WITH pr AS (
        SELECT l_partkey,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS v_e4
        FROM lineitem GROUP BY l_partkey),
      tot AS (SELECT CAST(sum(v_e4) AS BIGINT) AS t_e4,
                     CAST(count(*) AS BIGINT) AS n FROM pr)
      SELECT p_partkey, p_brand, v_e4
      FROM pr JOIN part ON l_partkey = p_partkey, tot
      WHERE 2 * n * v_e4 > 3 * t_e4
      ORDER BY v_e4 DESC, p_partkey""")
  }

  /** Q4-style priority check: per order priority, how many orders have
    * at least one line shipped more than 90 days after the order date
    * (the fixture has no commit/receipt dates; ship-lag is the
    * equivalent lateness predicate). The EXISTS plans as a left SEMI
    * join — each order contributes at most once no matter how many late
    * lines it has, which a plain join+distinct would pay a dedup
    * shuffle to express. Date arithmetic stays on the DATE lattice
    * (integer days), so the 90-day boundary is exact in both engines.
    */
  def priorityWaiting(s: SparkSession, d: String): DataFrame = {
    views(s, d, "orders", "lineitem")
    s.sql("""
      SELECT o_orderpriority, count(*) AS n_orders
      FROM orders
      WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 90 DAY)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")
  }

  /** Q21-style "suppliers who alone kept the order waiting": among
    * completed ('F') multi-supplier orders, count each supplier's late
    * lineitems (the repo's 90-day ship-lag lattice) in orders where it
    * was the ONLY late supplier. The textbook form is a double
    * EXISTS / NOT EXISTS self-join on lineitem — two extra corpus
    * shuffles and a decorrelation headache; here the same predicate is
    * an AGGREGATE over the order: `n_supp >= 2 AND n_late_supp = 1`
    * per orderkey, computed in one keyed shuffle and joined back, so
    * the whole query is two shuffles on l_orderkey plus the broadcast
    * supplier dim. Lateness is a date comparison (integer days) and
    * numwait an exact count — hash-safe in both engines. Top-20 by
    * (numwait DESC, suppkey) is a total order.
    */
  def soloLateSupplier(s: SparkSession, d: String): DataFrame = {
    views(s, d, "orders", "lineitem", "supplier")
    s.sql("""
      WITH lo AS (
        SELECT l_orderkey, l_suppkey,
          CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 90 DAY AS late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'),
      os AS (SELECT l_orderkey,
          count(DISTINCT l_suppkey) AS n_supp,
          count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_supp
        FROM lo GROUP BY l_orderkey)
      SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
      FROM lo JOIN os USING (l_orderkey) JOIN supplier ON s_suppkey = l_suppkey
      WHERE late AND n_supp >= 2 AND n_late_supp = 1
      GROUP BY s_suppkey, s_name
      ORDER BY numwait DESC, s_suppkey
      LIMIT 20""")
  }

  /** Q20-style "dominant supplier" promotion screen: suppliers shipping
    * MORE THAN HALF of some red-named part's total quantity — the
    * quantity-threshold nested aggregate → semi-join shape (Q20's
    * `ps_availqty > 0.5 * sum(l_quantity)` recast over the shipped
    * volumes this schema has). Two keyed aggregates — (part, supplier)
    * quantity, then part totals re-aggregated from those partials —
    * and the comparison stays on the integer lattice (`2·sq > tq`), so
    * the dominance set is exact in any engine. The 1995 ship-year
    * restriction keeps the predicate BINDING at every fixture SF (the
    * all-years volume spreads each part across too many suppliers for
    * a true majority to exist — verified 8/49/536 dominant suppliers
    * at sf0.001/0.01/0.1). The part-name prefix
    * filter pushes to the part scan (StartsWith); the supplier dim
    * broadcasts. Output: each dominant supplier with how many parts it
    * dominates.
    */
  def dominantSupplier(s: SparkSession, d: String): DataFrame = {
    views(s, d, "lineitem", "part", "supplier")
    s.sql("""
      WITH rq AS (
        SELECT l_partkey, l_suppkey,
          CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sq
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'red%' AND year(l_shipdate) = 1995
        GROUP BY l_partkey, l_suppkey),
      pt AS (SELECT l_partkey, CAST(sum(sq) AS BIGINT) AS tq
             FROM rq GROUP BY l_partkey)
      SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS n_dom_parts
      FROM rq JOIN pt USING (l_partkey)
      JOIN supplier ON s_suppkey = l_suppkey
      WHERE 2 * sq > tq
      GROUP BY s_suppkey, s_name
      ORDER BY s_suppkey""")
  }

  /** Relational division (`complex_all_quarters`, r13): customers who
    * ordered in EVERY quarter of 1995 — the classic "suppliers of all
    * parts" shape, reduced Codd-style to a count-distinct-equals-
    * divisor-size aggregate instead of the textbook double-NOT-EXISTS
    * (which plans as two correlated anti joins; the aggregate is ONE
    * keyed pass with map-side partial distinct). Divisor size 4 is a
    * literal — the quarter domain, not data-derived.
    */
  def allQuarters(s: SparkSession, d: String): DataFrame =
    Sources.orders(s, d)
      .filter(year(col("o_orderdate")) === 1995)
      .groupBy(col("o_custkey"))
      .agg(countDistinct(quarter(col("o_orderdate"))).as("n_quarters"),
        count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("spend_c"))
      .filter(col("n_quarters") === 4)
      .select(col("o_custkey"), col("n_orders"), col("spend_c"))
      .orderBy("o_custkey")

  /** Longest consecutive-order-day streak per customer
    * (`win_streaks`, r13): gaps-and-islands over each customer's
    * DISTINCT order days — island key = day − row_number (constant
    * within a run of consecutive days), max island length per
    * customer. Windows partition by customer and are bounded by the
    * calendar (≤ 2.4k distinct days per key), never the corpus; one
    * shuffle on custkey. Only multi-day-history customers are
    * interesting at the fixture's density, but ALL are emitted — the
    * streak-1 mass is the honest answer, not a filter artifact.
    */
  def orderStreaks(s: SparkSession, d: String): DataFrame = {
    val days = Sources.orders(s, d)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("day"))
      .distinct()
    val w = Window.partitionBy("o_custkey").orderBy("day")
    days
      .withColumn("island",
        datediff(col("day"), lit("1990-01-01").cast("date")).cast("long") -
          row_number().over(w))
      .groupBy("o_custkey", "island")
      .agg(count(lit(1)).as("len"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_islands"), sum("len").as("n_days"),
        max("len").as("max_streak"))
      .orderBy("o_custkey")
  }

  /** Shannon entropy of the priority mix per market segment
    * (`agg_entropy_segment`, r13): the order-mix diversity signal —
    * a segment whose priority distribution collapses to one value is
    * operationally different from a uniform one. The priority DOMAIN
    * is fixed (5 values), so the five counts land as conditional-sum
    * columns and the entropy expression combines them in FIXED textual
    * order — the float sum is a deterministic expression tree, never
    * an order-dependent aggregate over rows (the stats_jsd lesson,
    * solved the other way because the domain is enumerable). Exact
    * BIGINT count gates; H in nats, rounded 6; empty terms contribute
    * 0 by the `when` guard.
    */
  def entropySegment(s: SparkSession, d: String): DataFrame = {
    val joined = Sources.orders(s, d)
      .join(Sources.customer(s, d)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")), "o_custkey")
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val aggCols = count(lit(1)).as("n") +:
      prios.zipWithIndex.map { case (p, i) =>
        sum(when(col("o_orderpriority") === p, 1L).otherwise(0L)).as(s"c$i")
      }
    val counted = joined.groupBy("c_mktsegment")
      .agg(aggCols.head, aggCols.tail: _*)
    def D(c: Column): Column = c.cast("double")
    val h = prios.indices.map { i =>
      when(col(s"c$i") > 0,
        -(D(col(s"c$i")) / D(col("n"))) * log(D(col(s"c$i")) / D(col("n"))))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    counted
      .withColumn("entropy", graft.functions.Num.roundNorm(h, 6))
      .orderBy("c_mktsegment")
  }

  /** Late-arriving dimension handling (`etl_late_arriving`, r13): the
    * data-warehouse pattern — facts whose dimension key has not landed
    * yet must neither drop (losing revenue) nor fail the load; they
    * park on the UNKNOWN surrogate member and back-fill later. Fixture:
    * customers with c_custkey % 20 == 0 are "late"; orders LEFT-join
    * the present dimension and missing rows roll up under nation −1 /
    * 'UNKNOWN'. Output per nation: order count, exact spend cents, and
    * the parked-row share — the audit that tells the backfill job how
    * much is waiting. One broadcastable dim join + one keyed agg.
    */
  def lateArriving(s: SparkSession, d: String): DataFrame = {
    val dim = Sources.customer(s, d)
      .filter(col("c_custkey") % 20 =!= 0)
      .select(col("c_custkey").as("o_custkey"), col("c_nationkey"))
    Sources.orders(s, d)
      .select(col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .join(dim, Seq("o_custkey"), "left")
      .select(coalesce(col("c_nationkey").cast("long"), lit(-1L)).as("nationkey"),
        (col("c_nationkey").isNull).as("parked"), col("cents"))
      .groupBy("nationkey")
      .agg(count(lit(1)).as("n_orders"), sum("cents").as("spend_c"),
        sum(when(col("parked"), 1L).otherwise(0L)).as("n_parked"))
      .orderBy("nationkey")
  }

  /** Skew-salted join as an ORACLE-CHECKED query
    * (`join_salted_revenue`, r13): per-priority revenue computed
    * through [[Joins.saltedEquiJoin]] (saltFactor 4 — fact keys split
    * into content-hashed sub-keys, the dim side replicated 4×) while
    * the DuckDB oracle runs the PLAIN join — hash equality is the
    * proof that salting is result-transparent, promoting the skew tool
    * from test-only coverage (GenericOpsSpec) to the correctness gate.
    */
  def saltedRevenue(s: SparkSession, d: String): DataFrame = {
    val li = Sources.lineitem(s, d)
      .select(col("l_orderkey"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val dim = Sources.orders(s, d)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    Joins.saltedEquiJoin(li, dim, "l_orderkey", saltFactor = 4)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"), sum("cents").as("revenue_c"))
      .orderBy("o_orderpriority")
  }

  /** RFM quintile scoring (`win_rfm_scores`, r13): the classic
    * customer-value segmentation — Recency (days since last order,
    * relative to the corpus max date), Frequency (order count),
    * Monetary (exact spend cents), each ranked into quintiles by the
    * explicit `(5·(rk−1)) div n + 1` formula over a TOTAL order
    * (metric, custkey) — the lift-deciles discipline: never NTILE,
    * never an unpartitioned window (three two-pass [[Prefix]] ranks).
    * Scores orient 5 = best (most recent / most frequent / highest
    * spend); composite = 100·R + 10·F + M.
    */
  def rfmScores(s: SparkSession, d: String): DataFrame = {
    val maxDay = Sources.orders(s, d).agg(max(to_date(col("o_orderdate"))).as("mx"))
    val base = Sources.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(max(to_date(col("o_orderdate"))).as("last_day"),
        count(lit(1)).as("freq"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("money_c"))
      .crossJoin(broadcast(maxDay))
      .select(col("o_custkey"),
        datediff(col("mx"), col("last_day")).cast("long").as("recency_d"),
        col("freq"), col("money_c"))
    val n1 = base.agg(count(lit(1)).as("n"))
    def quint(metric: Column, asc: Boolean, out: String)(df: DataFrame): DataFrame = {
      val ord = if (asc) Seq(metric.asc, col("o_custkey").asc)
      else Seq(metric.desc, col("o_custkey").asc)
      Prefix.running(df, ord, rankOut = Some(s"__rk_$out"))
        .crossJoin(broadcast(n1))
        .withColumn(out, lit(6L) - (expr(s"(5 * (__rk_$out - 1)) div n") + 1))
        .drop(s"__rk_$out", "n")
    }
    // quintile 1 = best metric value, so score = 6 - quintile = 5 best:
    // recency ranks ASC (smaller = more recent = better), freq/money DESC
    val scored = quint(col("recency_d"), asc = true, "r_score")(
      quint(col("freq"), asc = false, "f_score")(
        quint(col("money_c"), asc = false, "m_score")(base)))
    scored
      .select(col("o_custkey"), col("recency_d"), col("freq"), col("money_c"),
        col("r_score"), col("f_score"), col("m_score"),
        (col("r_score") * 100 + col("f_score") * 10 + col("m_score")).as("rfm"))
      .orderBy("o_custkey")
  }

  /** Price/volume/mix revenue bridge (`complex_price_volume_mix`, r13):
    * the FP&A waterfall decomposing the 1996→1997 revenue change into
    * volume effect (q₂−q₁)·p₁, price effect (p₂−p₁)·q₂, new-part and
    * exited-part contributions — per part, then rolled up. The
    * identity (q₂−q₁)p₁ + (p₂−p₁)q₂ = q₂p₂ − q₁p₁ holds EXACTLY in
    * the reals, so the published residual column is pure e2-lattice
    * rounding (bounded by ~0.5 cent·e2 per common part — the spec
    * asserts the bound); delta/new/exit ship as exact cents. Unit
    * prices are the rational e/q (extendedprice is already the line
    * total), so the two effect terms are the only mirrored doubles —
    * one (div, sub, mul, round) chain per common part on exact Long
    * inputs. Plan: one year-filtered scan (pushed predicate), one
    * (part, year) pre-aggregate, a part-keyed FULL OUTER self-join of
    * the two year slices (equi join — AQE picks broadcast vs SMJ by
    * SF), and one global roll-up. At 100 TB the pre-aggregate bounds
    * the join at part-dimension cardinality.
    */
  def priceVolumeMix(s: SparkSession, d: String): DataFrame = {
    val per = Sources.lineitem(s, d)
      .filter(year(col("l_shipdate")).isin(1996, 1997))
      .groupBy(col("l_partkey"), year(col("l_shipdate")).as("y"))
      .agg(sum(col("l_quantity").cast("long")).as("q"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("e"))
    val j = per.filter(col("y") === 1996)
      .select(col("l_partkey"), col("q").as("q1"), col("e").as("e1"))
      .join(per.filter(col("y") === 1997)
        .select(col("l_partkey"), col("q").as("q2"), col("e").as("e2")),
        Seq("l_partkey"), "full_outer")
    val common = col("q1").isNotNull && col("q2").isNotNull
    val eff = j.select(
      when(common, 1L).otherwise(0L).as("is_common"),
      when(col("q1").isNull, 1L).otherwise(0L).as("is_new"),
      when(col("q2").isNull, 1L).otherwise(0L).as("is_exit"),
      (coalesce(col("e2"), lit(0L)) - coalesce(col("e1"), lit(0L)))
        .as("delta"),
      when(common, round(lit(100.0) *
        (col("q2") - col("q1")).cast("double") *
        (col("e1").cast("double") / col("q1").cast("double")))
        .cast("long")).otherwise(0L).as("vol"),
      when(common, round(lit(100.0) *
        (col("e2").cast("double") / col("q2").cast("double") -
          col("e1").cast("double") / col("q1").cast("double")) *
        col("q2").cast("double")).cast("long")).otherwise(0L).as("price"),
      when(col("q1").isNull, col("e2")).otherwise(0L).as("newc"),
      when(col("q2").isNull, -col("e1")).otherwise(0L).as("exitc"))
    eff.agg(sum("is_common").as("n_common"), sum("is_new").as("n_new"),
        sum("is_exit").as("n_exit"), sum("delta").as("delta_cents"),
        sum("vol").as("vol_e2"), sum("price").as("price_e2"),
        sum("newc").as("new_cents"), sum("exitc").as("exit_cents"))
      .withColumn("resid_e2",
        col("delta_cents") * 100L - col("vol_e2") - col("price_e2") -
          col("new_cents") * 100L - col("exit_cents") * 100L)
  }

  /** Allen interval-relation census (`complex_allen_relations`, r13):
    * classify every order's validity interval (orderdate, +1..30 days
    * — the ts_concurrent_intervals derivation) against one published
    * window (1995-06-01 .. 1995-06-30) into Allen's thirteen interval
    * relations (Allen 1983) — the complete, mutually-exclusive
    * taxonomy temporal reasoning is built on, and the vocabulary of
    * every bitemporal-join predicate. The CASE chain tests the seven
    * equality-boundary relations FIRST (equals/starts/started_by/
    * finishes/finished_by/meets/met_by), then the four strict-boundary
    * ones (before/after/during/contains), leaving overlaps/
    * overlapped_by with loose residual conditions — exhaustiveness is
    * enforced by an 'other' sentinel the spec pins to zero, the
    * 14-row literal domain keeps empty relations as zeros. All date
    * comparisons; n + Σ orderkey signatures per relation.
    */
  def allenRelations(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val iv = Sources.orders(s, d).select(
      to_date(col("o_orderdate")).as("xs"),
      expr("date_add(CAST(o_orderdate AS DATE), " +
        "CAST(o_orderkey % 30 + 1 AS INT))").as("xe"),
      col("o_orderkey"))
    val ys = lit("1995-06-01").cast("date")
    val ye = lit("1995-06-30").cast("date")
    val rel = when(col("xs") === ys && col("xe") === ye, "equals")
      .when(col("xs") === ys && col("xe") < ye, "starts")
      .when(col("xs") === ys && col("xe") > ye, "started_by")
      .when(col("xe") === ye && col("xs") > ys, "finishes")
      .when(col("xe") === ye && col("xs") < ys, "finished_by")
      .when(col("xe") === ys, "meets")
      .when(col("xs") === ye, "met_by")
      .when(col("xe") < ys, "before")
      .when(col("xs") > ye, "after")
      .when(col("xs") > ys && col("xe") < ye, "during")
      .when(col("xs") < ys && col("xe") > ye, "contains")
      .when(col("xs") < ys && col("xe") > ys && col("xe") < ye, "overlaps")
      .when(col("xs") > ys && col("xs") < ye && col("xe") > ye,
        "overlapped_by")
      .otherwise("other")
    val dom = Seq("after", "before", "contains", "during", "equals",
      "finished_by", "finishes", "meets", "met_by", "other", "overlapped_by",
      "overlaps", "started_by", "starts").toDF("rel")
    dom.join(iv.select(rel.as("rel"), col("o_orderkey"))
        .groupBy("rel").agg(count(lit(1)).as("nn"),
          sum("o_orderkey").as("sk")), Seq("rel"), "left")
      .select(col("rel"), coalesce(col("nn"), lit(0L)).as("n_orders"),
        coalesce(col("sk"), lit(0L)).as("sum_keys"))
      .orderBy("rel")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "complex_price_volume_mix" -> (priceVolumeMix _),
    "complex_allen_relations" -> (allenRelations _),
    "join_salted_revenue" -> (saltedRevenue _),
    "win_rfm_scores" -> (rfmScores _),
    "agg_entropy_segment" -> (entropySegment _),
    "etl_late_arriving" -> (lateArriving _),
    "complex_all_quarters" -> (allQuarters _),
    "win_streaks" -> (orderStreaks _),
    "complex_solo_late_supplier" -> (soloLateSupplier _),
    "complex_dominant_supplier" -> (dominantSupplier _),
    "complex_priority_waiting" -> (priorityWaiting _),
    "complex_product_profit" -> (productProfit _),
    "complex_important_parts" -> (importantParts _),
    "complex_cust_order_dist" -> (custOrderDist _),
    "complex_part_suppliers" -> (partSuppliers _),
    "complex_forecast_revenue" -> (forecastRevenue _),
    "complex_disjunct_bands" -> (disjunctBands _),
    "complex_nation_volume" -> (nationVolume _),
    "complex_market_share" -> (marketShare _),
    "complex_shipping_priority" -> (shippingPriority _),
    "complex_returned_items" -> (returnedItems _),
    "complex_top_supplier" -> (topSupplier _),
    "complex_promo_share" -> (promoShare _),
    "complex_small_qty_rev" -> (smallQtyRev _),
    "complex_late_orders" -> (lateOrders _),
    "complex_min_cost_supplier" -> (minCostSupplier _),
    "join_local_supplier_rev" -> (localSupplierRevenue _),
    "complex_big_orders" -> (bigOrders _),
    "complex_churned_customers" -> (churnedCustomers _),
    "stream_funnel_1day" -> (funnel _),
    "agg_retention_cohorts" -> (retentionCohorts _),
    "complex_skyline_parts" -> (skylineParts _),
    "join_attribution_linear" -> (attributionLinear _),
    "join_attribution_shapley" -> (attributionShapley _),
    "join_attribution_ushaped" -> (attributionUShaped _),
  )

  val oracles: Map[String, String] = Map(
    // the IDENTICAL case chain (equality relations first), same
    // sentinel and 14-row literal domain
    "complex_allen_relations" ->
      """WITH iv AS (SELECT CAST(o_orderdate AS DATE) AS xs,
        |   CAST(o_orderdate AS DATE)
        |     + CAST(o_orderkey % 30 + 1 AS INT) * INTERVAL 1 DAY AS xe0,
        |   o_orderkey FROM orders),
        | iv2 AS (SELECT xs, CAST(xe0 AS DATE) AS xe, o_orderkey FROM iv),
        | c AS (SELECT o_orderkey,
        |   CASE
        |    WHEN xs = DATE '1995-06-01' AND xe = DATE '1995-06-30'
        |      THEN 'equals'
        |    WHEN xs = DATE '1995-06-01' AND xe < DATE '1995-06-30'
        |      THEN 'starts'
        |    WHEN xs = DATE '1995-06-01' AND xe > DATE '1995-06-30'
        |      THEN 'started_by'
        |    WHEN xe = DATE '1995-06-30' AND xs > DATE '1995-06-01'
        |      THEN 'finishes'
        |    WHEN xe = DATE '1995-06-30' AND xs < DATE '1995-06-01'
        |      THEN 'finished_by'
        |    WHEN xe = DATE '1995-06-01' THEN 'meets'
        |    WHEN xs = DATE '1995-06-30' THEN 'met_by'
        |    WHEN xe < DATE '1995-06-01' THEN 'before'
        |    WHEN xs > DATE '1995-06-30' THEN 'after'
        |    WHEN xs > DATE '1995-06-01' AND xe < DATE '1995-06-30'
        |      THEN 'during'
        |    WHEN xs < DATE '1995-06-01' AND xe > DATE '1995-06-30'
        |      THEN 'contains'
        |    WHEN xs < DATE '1995-06-01' AND xe > DATE '1995-06-01'
        |      AND xe < DATE '1995-06-30' THEN 'overlaps'
        |    WHEN xs > DATE '1995-06-01' AND xs < DATE '1995-06-30'
        |      AND xe > DATE '1995-06-30' THEN 'overlapped_by'
        |    ELSE 'other' END AS rel
        |  FROM iv2),
        | dom AS (SELECT unnest(['after', 'before', 'contains', 'during',
        |   'equals', 'finished_by', 'finishes', 'meets', 'met_by',
        |   'other', 'overlapped_by', 'overlaps', 'started_by', 'starts'])
        |   AS rel),
        | cen AS (SELECT rel, CAST(count(*) AS BIGINT) AS nn,
        |    CAST(sum(o_orderkey) AS BIGINT) AS sk FROM c GROUP BY 1)
        |SELECT dom.rel, coalesce(cen.nn, 0) AS n_orders,
        | coalesce(cen.sk, 0) AS sum_keys
        |FROM dom LEFT JOIN cen USING (rel) ORDER BY rel""".stripMargin,
    // same (part, year) pre-aggregate, same mirrored effect chain per
    // common part, same exact residual algebra
    "complex_price_volume_mix" ->
      """WITH per AS (SELECT l_partkey, year(l_shipdate) AS y,
        |   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
        |   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |     AS BIGINT) AS e
        |  FROM lineitem WHERE year(l_shipdate) IN (1996, 1997)
        |  GROUP BY 1, 2),
        | j AS (SELECT coalesce(a.l_partkey, b.l_partkey) AS pk,
        |    a.q AS q1, a.e AS e1, b.q AS q2, b.e AS e2
        |   FROM (SELECT * FROM per WHERE y = 1996) a
        |   FULL OUTER JOIN (SELECT * FROM per WHERE y = 1997) b
        |    ON a.l_partkey = b.l_partkey),
        | eff AS (SELECT
        |   CASE WHEN q1 IS NOT NULL AND q2 IS NOT NULL THEN 1 ELSE 0 END
        |     AS is_common,
        |   CASE WHEN q1 IS NULL THEN 1 ELSE 0 END AS is_new,
        |   CASE WHEN q2 IS NULL THEN 1 ELSE 0 END AS is_exit,
        |   coalesce(e2, 0) - coalesce(e1, 0) AS delta,
        |   CASE WHEN q1 IS NOT NULL AND q2 IS NOT NULL THEN
        |     CAST(round(100.0 * CAST(q2 - q1 AS DOUBLE) *
        |       (CAST(e1 AS DOUBLE) / CAST(q1 AS DOUBLE))) AS BIGINT)
        |    ELSE 0 END AS vol,
        |   CASE WHEN q1 IS NOT NULL AND q2 IS NOT NULL THEN
        |     CAST(round(100.0 * (CAST(e2 AS DOUBLE) / CAST(q2 AS DOUBLE) -
        |       CAST(e1 AS DOUBLE) / CAST(q1 AS DOUBLE)) *
        |       CAST(q2 AS DOUBLE)) AS BIGINT)
        |    ELSE 0 END AS price,
        |   CASE WHEN q1 IS NULL THEN e2 ELSE 0 END AS newc,
        |   CASE WHEN q2 IS NULL THEN -e1 ELSE 0 END AS exitc
        |  FROM j)
        |SELECT CAST(sum(is_common) AS BIGINT) AS n_common,
        | CAST(sum(is_new) AS BIGINT) AS n_new,
        | CAST(sum(is_exit) AS BIGINT) AS n_exit,
        | CAST(sum(delta) AS BIGINT) AS delta_cents,
        | CAST(sum(vol) AS BIGINT) AS vol_e2,
        | CAST(sum(price) AS BIGINT) AS price_e2,
        | CAST(sum(newc) AS BIGINT) AS new_cents,
        | CAST(sum(exitc) AS BIGINT) AS exit_cents,
        | CAST(sum(delta) * 100 - sum(vol) - sum(price)
        |   - sum(newc) * 100 - sum(exitc) * 100 AS BIGINT) AS resid_e2
        |FROM eff""".stripMargin,
    // the PLAIN join — hash equality proves the engine's salted join
    // (content-hashed sub-keys, 4x replicated dim) is result-transparent
    "join_salted_revenue" ->
      """SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
        | CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |   AS revenue_c
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "win_rfm_scores" ->
      """WITH mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS m FROM orders),
        | b AS (SELECT o_custkey,
        |    CAST(datediff('day', max(CAST(o_orderdate AS DATE)),
        |      (SELECT m FROM mx)) AS BIGINT) AS recency_d,
        |    CAST(count(*) AS BIGINT) AS freq,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS money_c
        |  FROM orders GROUP BY 1),
        | nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
        | r AS (SELECT *,
        |    CAST(row_number() OVER (ORDER BY recency_d ASC, o_custkey ASC)
        |      AS BIGINT) AS rk_r,
        |    CAST(row_number() OVER (ORDER BY freq DESC, o_custkey ASC)
        |      AS BIGINT) AS rk_f,
        |    CAST(row_number() OVER (ORDER BY money_c DESC, o_custkey ASC)
        |      AS BIGINT) AS rk_m
        |  FROM b)
        |SELECT o_custkey, recency_d, freq, money_c,
        | CAST(6 - ((5 * (rk_r - 1)) // n + 1) AS BIGINT) AS r_score,
        | CAST(6 - ((5 * (rk_f - 1)) // n + 1) AS BIGINT) AS f_score,
        | CAST(6 - ((5 * (rk_m - 1)) // n + 1) AS BIGINT) AS m_score,
        | CAST((6 - ((5 * (rk_r - 1)) // n + 1)) * 100
        |   + (6 - ((5 * (rk_f - 1)) // n + 1)) * 10
        |   + (6 - ((5 * (rk_m - 1)) // n + 1)) AS BIGINT) AS rfm
        |FROM r CROSS JOIN nn ORDER BY o_custkey""".stripMargin,
    "agg_entropy_segment" ->
      """WITH j AS (SELECT c.c_mktsegment, o.o_orderpriority
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        | g AS (SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |   CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |   CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |   CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS c2,
        |   CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS c3,
        |   CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS c4
        |  FROM j GROUP BY 1)
        |SELECT c_mktsegment, n, c0, c1, c2, c3, c4,
        | round(
        |   (CASE WHEN c0 > 0 THEN -(c0::DOUBLE / n::DOUBLE) * ln(c0::DOUBLE / n::DOUBLE) ELSE 0.0 END)
        |   + (CASE WHEN c1 > 0 THEN -(c1::DOUBLE / n::DOUBLE) * ln(c1::DOUBLE / n::DOUBLE) ELSE 0.0 END)
        |   + (CASE WHEN c2 > 0 THEN -(c2::DOUBLE / n::DOUBLE) * ln(c2::DOUBLE / n::DOUBLE) ELSE 0.0 END)
        |   + (CASE WHEN c3 > 0 THEN -(c3::DOUBLE / n::DOUBLE) * ln(c3::DOUBLE / n::DOUBLE) ELSE 0.0 END)
        |   + (CASE WHEN c4 > 0 THEN -(c4::DOUBLE / n::DOUBLE) * ln(c4::DOUBLE / n::DOUBLE) ELSE 0.0 END),
        |   6) + 0.0 AS entropy
        |FROM g ORDER BY c_mktsegment""".stripMargin,
    "etl_late_arriving" ->
      """WITH dim AS (SELECT c_custkey, c_nationkey FROM customer
        |  WHERE c_custkey % 20 <> 0),
        | f AS (SELECT coalesce(CAST(d.c_nationkey AS BIGINT), -1) AS nationkey,
        |    d.c_nationkey IS NULL AS parked,
        |    CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders o LEFT JOIN dim d ON o.o_custkey = d.c_custkey)
        |SELECT nationkey, CAST(count(*) AS BIGINT) AS n_orders,
        | CAST(sum(cents) AS BIGINT) AS spend_c,
        | CAST(sum(CASE WHEN parked THEN 1 ELSE 0 END) AS BIGINT) AS n_parked
        |FROM f GROUP BY nationkey ORDER BY nationkey""".stripMargin,
    "complex_all_quarters" ->
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
        | CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |   AS spend_c
        |FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1995
        |GROUP BY o_custkey
        |HAVING count(DISTINCT quarter(CAST(o_orderdate AS DATE))) = 4
        |ORDER BY o_custkey""".stripMargin,
    "win_streaks" ->
      """WITH days AS (SELECT DISTINCT o_custkey,
        |   CAST(o_orderdate AS DATE) AS day FROM orders),
        | isl AS (SELECT o_custkey,
        |    datediff('day', DATE '1990-01-01', day)
        |      - row_number() OVER (PARTITION BY o_custkey ORDER BY day)
        |      AS island
        |  FROM days),
        | runs AS (SELECT o_custkey, island, CAST(count(*) AS BIGINT) AS len
        |  FROM isl GROUP BY 1, 2)
        |SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_islands,
        | CAST(sum(len) AS BIGINT) AS n_days,
        | CAST(max(len) AS BIGINT) AS max_streak
        |FROM runs GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "complex_solo_late_supplier" ->
      """WITH lo AS (
        |  SELECT l_orderkey, l_suppkey,
        |    CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 90 DAY AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'),
        |os AS (SELECT l_orderkey,
        |    count(DISTINCT l_suppkey) AS n_supp,
        |    count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_supp
        |  FROM lo GROUP BY l_orderkey)
        |SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM lo JOIN os USING (l_orderkey) JOIN supplier ON s_suppkey = l_suppkey
        |WHERE late AND n_supp >= 2 AND n_late_supp = 1
        |GROUP BY s_suppkey, s_name
        |ORDER BY numwait DESC, s_suppkey
        |LIMIT 20""".stripMargin,
    "complex_dominant_supplier" ->
      """WITH rq AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sq
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_name LIKE 'red%' AND year(l_shipdate) = 1995
        |  GROUP BY l_partkey, l_suppkey),
        |pt AS (SELECT l_partkey, CAST(sum(sq) AS BIGINT) AS tq
        |       FROM rq GROUP BY l_partkey)
        |SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS n_dom_parts
        |FROM rq JOIN pt USING (l_partkey)
        |JOIN supplier ON s_suppkey = l_suppkey
        |WHERE 2 * sq > tq
        |GROUP BY s_suppkey, s_name
        |ORDER BY s_suppkey""".stripMargin,
    "complex_priority_waiting" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey
        |    AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "complex_product_profit" ->
      """SELECT n_name AS supp_nation, CAST(year(o_orderdate) AS BIGINT) AS yr,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l_discount * 100) AS BIGINT))
        |  - 80 * CAST(round(p_retailprice * 100) AS BIGINT)
        |    * CAST(l_quantity AS BIGINT)) AS BIGINT) AS profit_e4,
        | count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY supp_nation, yr
        |ORDER BY supp_nation, yr""".stripMargin,
    "complex_important_parts" ->
      """WITH pr AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS v_e4
        |  FROM lineitem GROUP BY l_partkey),
        |tot AS (SELECT CAST(sum(v_e4) AS BIGINT) AS t_e4,
        |               CAST(count(*) AS BIGINT) AS n FROM pr)
        |SELECT p_partkey, p_brand, v_e4
        |FROM pr JOIN part ON l_partkey = p_partkey, tot
        |WHERE 2 * n * v_e4 > 3 * t_e4
        |ORDER BY v_e4 DESC, p_partkey""".stripMargin,
    "complex_cust_order_dist" ->
      """WITH c AS (
        |  SELECT c_custkey, count(o_orderkey) AS n_orders
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |SELECT CAST(n_orders AS BIGINT) AS n_orders, count(*) AS n_customers
        |FROM c GROUP BY n_orders
        |ORDER BY n_customers DESC, n_orders""".stripMargin,
    "complex_part_suppliers" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |SELECT p_brand, CAST((p_size - 1) // 10 AS BIGINT) AS size_band,
        | CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
        | CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
        |FROM ps JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand, size_band
        |ORDER BY p_brand, size_band""".stripMargin,
    "complex_forecast_revenue" ->
      """SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |   * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_e4,
        | count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
        |  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
        |  AND l_quantity < 24""".stripMargin,
    "complex_disjunct_bands" ->
      """SELECT CASE WHEN p_brand = 'Brand#1' THEN 'small'
        |            WHEN p_brand = 'Brand#2' THEN 'medium'
        |            ELSE 'large' END AS band,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |   * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4,
        | count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
        |   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
        |   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
        |GROUP BY band ORDER BY band""".stripMargin,
    "complex_nation_volume" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        | CAST(year(l_shipdate) AS BIGINT) AS yr,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |   * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE (sn.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
        |        AND cn.n_name IN ('NATION_4', 'NATION_5', 'NATION_6'))
        |   OR (sn.n_name IN ('NATION_4', 'NATION_5', 'NATION_6')
        |        AND cn.n_name IN ('NATION_1', 'NATION_2', 'NATION_3'))
        |GROUP BY supp_nation, cust_nation, yr
        |ORDER BY supp_nation, cust_nation, yr""".stripMargin,
    "complex_market_share" ->
      """WITH j AS (
        |  SELECT year(o_orderdate) AS yr,
        |         CAST(round(l_extendedprice * 100) AS BIGINT)
        |           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev,
        |         sn.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN region ON cn.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  WHERE r_name = 'EUROPE')
        |SELECT CAST(yr AS BIGINT) AS yr,
        |  CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev ELSE 0 END) AS BIGINT) AS nation_e4,
        |  CAST(sum(rev) AS BIGINT) AS total_e4,
        |  CAST((10000 * sum(CASE WHEN supp_nation = 'NATION_3' THEN rev ELSE 0 END))
        |    // sum(rev) AS BIGINT) AS share_bp
        |FROM j GROUP BY yr ORDER BY yr""".stripMargin,
    "complex_shipping_priority" ->
      """SELECT l_orderkey,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |   * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4,
        | strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < DATE '1998-01-01' AND l_shipdate > DATE '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue_e4 DESC, orderdate, l_orderkey LIMIT 10""".stripMargin,
    "complex_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |   * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue_e4 DESC, c_custkey LIMIT 20""".stripMargin,
    "complex_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey AS suppkey,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS total_rev
        |  FROM lineitem WHERE year(l_shipdate) = 1995 GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_rev
        |FROM supplier JOIN rev ON s_suppkey = suppkey
        |WHERE total_rev = (SELECT max(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "complex_promo_share" ->
      """WITH m AS (
        |  SELECT (year(l_shipdate) * 100 + month(l_shipdate)) AS ym,
        |         CAST(round(l_extendedprice * 100) AS BIGINT)
        |           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev,
        |         p_type
        |  FROM lineitem JOIN part ON l_partkey = p_partkey)
        |SELECT CAST(ym AS BIGINT) AS ym,
        |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS BIGINT) AS promo_e4,
        |  CAST(sum(rev) AS BIGINT) AS total_e4,
        |  CAST((10000 * sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END))
        |    // sum(rev) AS BIGINT) AS promo_share_bp
        |FROM m GROUP BY ym ORDER BY ym""".stripMargin,
    "complex_small_qty_rev" ->
      """WITH pa AS (SELECT l_partkey AS pk,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
        |    count(*) AS n
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT p_brand,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN pa ON l_partkey = pa.pk
        |JOIN part ON l_partkey = p_partkey
        |WHERE 5 * CAST(l_quantity AS BIGINT) * pa.n < pa.sq
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "complex_late_orders" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 365 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "join_local_supplier_rev" ->
      """SELECT r_name, n_name,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |   * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4,
        | count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE year(o_orderdate) = 1995
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "join_attribution_ushaped" ->
      """WITH p AS (SELECT event_id, user_id, ts,
        |   CAST(round(value * 100) AS BIGINT) AS cents
        |   FROM events WHERE event_type = 'purchase'),
        | t AS (SELECT user_id, ts, event_id, event_type FROM events
        |   WHERE event_type IN ('click', 'view', 'signup')),
        | j AS (SELECT p.event_id, any_value(p.cents) AS cents,
        |   CAST(count(*) FILTER (WHERE t.event_type = 'click') AS BIGINT) AS n_click,
        |   CAST(count(*) FILTER (WHERE t.event_type = 'view') AS BIGINT) AS n_view,
        |   CAST(count(*) FILTER (WHERE t.event_type = 'signup') AS BIGINT) AS n_signup,
        |   min(struct_pack(a := t.ts, b := t.event_id, c := t.event_type)) AS fst,
        |   max(struct_pack(a := t.ts, b := t.event_id, c := t.event_type)) AS lst
        |  FROM p LEFT JOIN t ON p.user_id = t.user_id
        |    AND t.ts BETWEEN p.ts - INTERVAL 7 DAY AND p.ts
        |  GROUP BY p.event_id),
        | k AS (SELECT *, n_click + n_view + n_signup AS total,
        |   struct_extract(fst, 'c') AS f_type,
        |   struct_extract(lst, 'c') AS l_type FROM j),
        | m AS (SELECT *,
        |   CASE WHEN total = 0 THEN 0 WHEN total = 1 THEN cents
        |        WHEN total = 2 THEN cents - cents // 2
        |        ELSE (2 * cents) // 5 END AS first_c,
        |   CASE WHEN total <= 1 THEN 0 WHEN total = 2 THEN cents // 2
        |        ELSE (2 * cents) // 5 END AS last_c
        |  FROM k),
        | q AS (SELECT *,
        |   CASE WHEN total >= 3 THEN cents - first_c - last_c ELSE 0 END AS mtot
        |  FROM m),
        | r AS (SELECT *,
        |   CASE WHEN total >= 3 THEN mtot // (total - 2) ELSE 0 END AS per_mid
        |  FROM q),
        | agg AS (SELECT
        |   CAST(sum(CASE WHEN total = 0 THEN 0 ELSE
        |     (CASE WHEN f_type = 'click' THEN first_c ELSE 0 END)
        |     + (CASE WHEN l_type = 'click' AND total >= 2 THEN last_c ELSE 0 END)
        |     + per_mid * (n_click
        |        - (CASE WHEN f_type = 'click' THEN 1 ELSE 0 END)
        |        - (CASE WHEN l_type = 'click' AND total >= 2 THEN 1 ELSE 0 END))
        |    END) AS BIGINT) AS c_click,
        |   CAST(sum(CASE WHEN total = 0 THEN 0 ELSE
        |     (CASE WHEN f_type = 'view' THEN first_c ELSE 0 END)
        |     + (CASE WHEN l_type = 'view' AND total >= 2 THEN last_c ELSE 0 END)
        |     + per_mid * (n_view
        |        - (CASE WHEN f_type = 'view' THEN 1 ELSE 0 END)
        |        - (CASE WHEN l_type = 'view' AND total >= 2 THEN 1 ELSE 0 END))
        |    END) AS BIGINT) AS c_view,
        |   CAST(sum(CASE WHEN total = 0 THEN 0 ELSE
        |     (CASE WHEN f_type = 'signup' THEN first_c ELSE 0 END)
        |     + (CASE WHEN l_type = 'signup' AND total >= 2 THEN last_c ELSE 0 END)
        |     + per_mid * (n_signup
        |        - (CASE WHEN f_type = 'signup' THEN 1 ELSE 0 END)
        |        - (CASE WHEN l_type = 'signup' AND total >= 2 THEN 1 ELSE 0 END))
        |    END) AS BIGINT) AS c_signup,
        |   CAST(sum(CASE WHEN total >= 3
        |     THEN mtot - per_mid * (total - 2) ELSE 0 END) AS BIGINT) AS c_residual,
        |   CAST(sum(CASE WHEN total = 0 THEN cents ELSE 0 END) AS BIGINT)
        |     AS c_unattributed
        |  FROM r)
        |SELECT channel, attributed_cents FROM (
        |  SELECT 'click' AS channel, c_click AS attributed_cents FROM agg
        |  UNION ALL SELECT 'view', c_view FROM agg
        |  UNION ALL SELECT 'signup', c_signup FROM agg
        |  UNION ALL SELECT 'residual', c_residual FROM agg
        |  UNION ALL SELECT 'unattributed', c_unattributed FROM agg)
        |ORDER BY channel""".stripMargin,
    // the same 4-bit masks, the same 16-subset characteristic function,
    // the same x24 integer weights — the whole game replays
    "join_attribution_shapley" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS us, event_type
        |  FROM events),
        | fp AS (SELECT user_id, min(us) AS p_us FROM ev
        |  WHERE event_type = 'purchase' GROUP BY 1),
        | mk AS (SELECT ev.user_id, bit_or(
        |    CASE ev.event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2
        |      WHEN 'signup' THEN 4 WHEN 'error' THEN 8 ELSE 0 END) AS mask
        |  FROM ev JOIN fp ON ev.user_id = fp.user_id AND ev.us < fp.p_us
        |  GROUP BY 1),
        | nf AS (SELECT mask, CAST(count(*) AS BIGINT) AS n_conv FROM mk
        |  GROUP BY 1),
        | ss AS (SELECT CAST(unnest(range(0, 16)) AS BIGINT) AS s_mask),
        | vf AS (SELECT s_mask,
        |    CAST(coalesce(sum(CASE WHEN (mask & s_mask) = mask
        |      THEN n_conv END), 0) AS BIGINT) AS v
        |  FROM ss LEFT JOIN nf ON (mask & s_mask) = mask GROUP BY 1),
        | ch AS (SELECT * FROM (VALUES ('click', 1), ('view', 2),
        |   ('signup', 4), ('error', 8)) t(channel, cbit)),
        | terms AS (SELECT channel,
        |    CASE bit_count(CAST(s_mask AS INTEGER)) WHEN 0 THEN 6
        |      WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END
        |      * (vu.v_up - vf.v) AS term
        |  FROM ch JOIN vf ON (vf.s_mask & cbit) = 0
        |  JOIN (SELECT s_mask AS su_mask, v AS v_up FROM vf) vu
        |   ON vu.su_mask = vf.s_mask + cbit)
        |SELECT channel, CAST(sum(term) AS BIGINT) AS phi_24,
        | CAST((sum(term) * 1000000) // 24 AS BIGINT) AS phi_e6
        |FROM terms GROUP BY 1 ORDER BY channel""".stripMargin,
    "join_attribution_linear" ->
      """WITH p AS (SELECT event_id, user_id, ts,
        |   CAST(round(value * 100) AS BIGINT) AS cents
        |   FROM events WHERE event_type = 'purchase'),
        | t AS (SELECT user_id, ts, event_type FROM events
        |   WHERE event_type IN ('click', 'view', 'signup')),
        | j AS (SELECT p.event_id, any_value(p.cents) AS cents,
        |   CAST(count(*) FILTER (WHERE t.event_type = 'click') AS BIGINT) AS n_click,
        |   CAST(count(*) FILTER (WHERE t.event_type = 'view') AS BIGINT) AS n_view,
        |   CAST(count(*) FILTER (WHERE t.event_type = 'signup') AS BIGINT) AS n_signup
        |  FROM p LEFT JOIN t ON p.user_id = t.user_id
        |    AND t.ts BETWEEN p.ts - INTERVAL 7 DAY AND p.ts
        |  GROUP BY p.event_id),
        | k AS (SELECT *, n_click + n_view + n_signup AS total FROM j),
        | agg AS (SELECT
        |   CAST(sum(CASE WHEN total > 0 THEN (cents * n_click) // total ELSE 0 END) AS BIGINT) AS c_click,
        |   CAST(sum(CASE WHEN total > 0 THEN (cents * n_view) // total ELSE 0 END) AS BIGINT) AS c_view,
        |   CAST(sum(CASE WHEN total > 0 THEN (cents * n_signup) // total ELSE 0 END) AS BIGINT) AS c_signup,
        |   CAST(sum(CASE WHEN total > 0 THEN cents - ((cents * n_click) // total
        |     + (cents * n_view) // total + (cents * n_signup) // total)
        |     ELSE 0 END) AS BIGINT) AS c_residual,
        |   CAST(sum(CASE WHEN total = 0 THEN cents ELSE 0 END) AS BIGINT) AS c_unattributed
        |  FROM k)
        |SELECT channel, attributed_cents FROM (
        |  SELECT 'click' AS channel, c_click AS attributed_cents FROM agg
        |  UNION ALL SELECT 'view', c_view FROM agg
        |  UNION ALL SELECT 'signup', c_signup FROM agg
        |  UNION ALL SELECT 'residual', c_residual FROM agg
        |  UNION ALL SELECT 'unattributed', c_unattributed FROM agg)
        |ORDER BY channel""".stripMargin,
    "complex_min_cost_supplier" ->
      """WITH costs AS (
        |  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
        |         min(l_extendedprice / l_quantity) AS unit_cost
        |  FROM lineitem GROUP BY l_partkey, l_suppkey)
        |SELECT p.p_partkey, s.s_suppkey, p.p_name, s.s_name,
        |       c.unit_cost AS best_cost
        |FROM costs c
        |JOIN part p ON c.partkey = p.p_partkey
        |JOIN supplier s ON c.suppkey = s.s_suppkey
        |WHERE c.unit_cost = (SELECT min(c2.unit_cost) FROM costs c2
        |                     WHERE c2.partkey = c.partkey)
        |ORDER BY p.p_partkey, s.s_suppkey""".stripMargin,
    "complex_big_orders" ->
      """SELECT c_name, o_orderkey, round(sum(l_quantity), 1) AS total_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                     GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
        |GROUP BY c_name, o_orderkey
        |ORDER BY total_qty DESC, o_orderkey""".stripMargin,
    "complex_churned_customers" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND year(o.o_orderdate) = 1995)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND year(o.o_orderdate) = 1996)
        |ORDER BY c_custkey""".stripMargin,
    "stream_funnel_1day" ->
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        | c AS (SELECT v.user_id, min(e.ts) AS t2 FROM v JOIN events e
        |       ON e.user_id = v.user_id AND e.event_type = 'click'
        |        AND e.ts > v.t1 AND e.ts <= v.t1 + INTERVAL 1 DAY
        |       GROUP BY v.user_id),
        | p AS (SELECT c.user_id, min(e.ts) AS t3 FROM c JOIN events e
        |       ON e.user_id = c.user_id AND e.event_type = 'purchase'
        |        AND e.ts > c.t2 AND e.ts <= c.t2 + INTERVAL 1 DAY
        |       GROUP BY c.user_id)
        |SELECT stage, n_users FROM (
        | SELECT '1_view' AS stage, count(*) AS n_users FROM v
        | UNION ALL SELECT '2_click', count(*) FROM c
        | UNION ALL SELECT '3_purchase', count(*) FROM p)
        |ORDER BY stage""".stripMargin,
    "agg_retention_cohorts" ->
      """WITH f AS (SELECT o_custkey, min(year(o_orderdate)) AS cohort
        |           FROM orders GROUP BY o_custkey),
        | act AS (SELECT DISTINCT o_custkey, year(o_orderdate) AS yr FROM orders)
        |SELECT cohort, yr - cohort AS yr_offset, count(*) AS n_customers
        |FROM f JOIN act USING (o_custkey)
        |WHERE yr - cohort <= 3
        |GROUP BY cohort, yr_offset ORDER BY cohort, yr_offset""".stripMargin,
    // the oracle states the quadratic NOT-EXISTS semantics the window
    // plan avoids — strict Pareto domination on (price min, size max)
    "complex_skyline_parts" ->
      """SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size, p_retailprice
        |FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
        |ORDER BY p_retailprice, p_partkey""".stripMargin,
  )
}
