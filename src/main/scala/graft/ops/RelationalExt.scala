package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Sources

/** Extended relational surface (SURVEY §2.5-2.9 breadth): statistical
  * aggregates, analytic window functions, extended scalar families,
  * pivot, grouping sets, outer/cross joins, collection aggregates.
  * Same determinism/type-parity conventions as [[Relational]].
  */
object RelationalExt {

  /** Statistical aggregates: stddev/variance/correlation/covariance and
    * exact interpolated percentile (all two-phase partial aggregates in
    * Spark — scale is one shuffle of constant-size state per group).
    */
  def aggStatsSummary(s: SparkSession, d: String): DataFrame =
    Sources.events(s, d)
      .groupBy("event_type")
      .agg(
        round(stddev_samp(col("value")), 4).as("sd_value"),
        round(var_samp(col("value")), 4).as("var_value"),
        graft.functions.Num.roundNorm(corr(col("value"), col("user_id").cast("double")), 4).as("corr_vu"),
        graft.functions.Num.roundNorm(covar_samp(col("value"), col("user_id").cast("double")), 4).as("covar_vu"),
        round(expr("percentile(value, 0.5)"), 4).as("median_value"),
        round(expr("percentile(value, 0.9)"), 4).as("p90_value"),
      )
      .orderBy("event_type")

  /** Collection aggregates: sorted collect_list / collect_set and the
    * string_agg analog (`concat_ws` over a sorted set).
    */
  def aggCollect(s: SparkSession, d: String): DataFrame =
    Sources.events(s, d)
      .groupBy("user_id")
      .agg(
        concat_ws(",", array_sort(collect_set(col("event_type")))).as("types_csv"),
        // CSV, not a raw array: the oracle harness hashes scalar columns only.
        // `+ 0.0` collapses IEEE -0.0 to 0.0 before formatting so both
        // engines print the same string; numeric sort BEFORE formatting.
        concat_ws(",", transform(array_sort(collect_list(round(col("value"), 2))),
          x => format_string("%.2f", x + lit(0.0)))).as("values_csv"),
        count(lit(1)).as("n_events"),
      )
      .orderBy("user_id")

  /** GROUPING SETS via the SQL surface (same ambiguity note as rollup). */
  def aggGroupingSets(s: SparkSession, d: String): DataFrame = {
    Sources.lineitem(s, d)
      .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"))
      .createOrReplaceTempView("graft_gsets_in")
    s.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty
        |FROM graft_gsets_in
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  /** Pivot: event counts per user fanned to one column per event type
    * (Spark `pivot` with explicit values = a single-pass conditional
    * aggregation, no extra shuffle vs plain groupBy).
    */
  def pivotEventCounts(s: SparkSession, d: String): DataFrame =
    Sources.events(s, d)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count()
      // fill ONLY the pivoted count columns: a bare na.fill(0) would also
      // rewrite a NULL group key into user 0
      .na.fill(0L, Seq("click", "error", "purchase", "signup", "view"))
      .orderBy("user_id")

  /** Row-normalized pivot (`pivot_share_matrix`, r13): per nation, the
    * SHARE of each order priority as integer basis points — the
    * conditional-aggregation pivot (explicit value list, single pass)
    * followed by exact `div` normalization against the row total; the
    * residue basis points from flooring stay visible in the row total
    * column rather than being forced to sum to 10 000 (the honest
    * flooring contract, same as text_hapax).
    */
  def pivotShareMatrix(s: SparkSession, d: String): DataFrame = {
    val joined = Sources.orders(s, d)
      .join(Sources.customer(s, d)
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey")), "o_custkey")
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val counts = prios.zipWithIndex.map { case (p, i) =>
      sum(when(col("o_orderpriority") === p, 1L).otherwise(0L)).as(s"c$i")
    }
    val base = joined.groupBy(col("c_nationkey"))
      .agg(counts.head, counts.tail :+ count(lit(1)).as("n"): _*)
    prios.indices.foldLeft(base) { (df, i) =>
      df.withColumn(s"bp$i", expr(s"(10000 * c$i) div n"))
    }
      .select((col("c_nationkey").cast("long").as("nationkey") +: col("n") +:
        prios.indices.map(i => col(s"bp$i"))): _*)
      .orderBy("nationkey")
  }

  /** Days to the next order per customer (`win_next_order_gap`, r13):
    * the inter-purchase interval — `lead` over the per-customer order
    * stream (ties broken by orderkey: a total order), last order per
    * customer emits NULL-free −1 by convention. One shuffle on
    * custkey; windows bounded per key.
    */
  def nextOrderGap(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("day"), col("o_orderkey"))
    Sources.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), to_date(col("o_orderdate")).as("day"))
      .withColumn("next_day", lead(col("day"), 1).over(w))
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(datediff(col("next_day"), col("day")).cast("long"), lit(-1L))
          .as("gap_days"))
      .orderBy("o_custkey", "day", "o_orderkey")
  }

  /** Cumulative revenue share per nation over months
    * (`win_cumulative_share`, r13): the market-penetration curve — per
    * nation, the running month-by-month revenue as exact cents plus
    * its share of the nation's total in integer basis points. Windows
    * partition by nation over the MONTH grain (calendar-bounded per
    * key); the total attaches by a nation-keyed join of the same
    * monthly table (pinned lazily — two consumers).
    */
  def cumulativeShare(s: SparkSession, d: String): DataFrame = {
    val monthly = graft.io.Checkpoints.pin(
      Sources.orders(s, d)
        .join(Sources.customer(s, d)
          .select(col("c_custkey").as("o_custkey"), col("c_nationkey")), "o_custkey")
        .groupBy(col("c_nationkey").cast("long").as("nationkey"),
          date_format(to_date(col("o_orderdate")), "yyyy-MM").as("month"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev_c")),
      eager = false)
    val tot = monthly.groupBy("nationkey").agg(sum("rev_c").as("tot_c"))
    val w = Window.partitionBy("nationkey").orderBy("month")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    monthly
      .withColumn("cum_c", sum("rev_c").over(w))
      .join(tot, "nationkey")
      .withColumn("cum_bp", expr("(10000 * cum_c) div tot_c"))
      .select(col("nationkey"), col("month"), col("rev_c"), col("cum_c"),
        col("cum_bp"))
      .orderBy("nationkey", "month")
  }

  /** Key/date inversion audit (`audit_key_inversions`, r13): per
    * customer, the pairs of orders where the LARGER orderkey carries
    * the EARLIER date — the monotonicity contract every
    * sequence-assigned key should satisfy, and the first check on a
    * suspected out-of-order ingest. Per-key self-join (bounded by
    * orders-per-customer, never corpus²), exact counts; only violating
    * customers are emitted.
    */
  def keyInversions(s: SparkSession, d: String): DataFrame = {
    val o = Sources.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), to_date(col("o_orderdate")).as("day"))
    o.as("a").join(o.as("b"),
        col("a.o_custkey") === col("b.o_custkey") &&
          col("a.o_orderkey") < col("b.o_orderkey"))
      .groupBy(col("a.o_custkey").as("o_custkey"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("a.day") > col("b.day"), 1L).otherwise(0L)).as("n_inversions"))
      .filter(col("n_inversions") > 0)
      .orderBy("o_custkey")
  }

  /** Analytic window functions over the full-partition frame. */
  def winAnalytics(s: SparkSession, d: String): DataFrame = {
    val byId = Window.partitionBy("user_id").orderBy("event_id")
    val full = byId.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Sources.events(s, d)
      .select(
        col("event_id"), col("user_id"),
        ntile(4).over(byId).cast("long").as("quartile"),
        round(percent_rank().over(byId), 6).as("pct_rank"),
        round(cume_dist().over(byId), 6).as("cume"),
        round(first(col("value")).over(full), 2).as("first_value"),
        round(last(col("value")).over(full), 2).as("last_value"),
        round(nth_value(col("value"), 2).over(full), 2).as("second_value"),
      )
      .orderBy("event_id")
  }

  /** max_by / min_by (argmax/argmin aggregates). The ordering value is the
    * UNIQUE o_orderkey — argmax over a column with ties (o_totalprice has
    * duplicate values at sf≥0.01) is engine-arbitrary and would flake the
    * oracle hash.
    */
  def aggMinmaxBy(s: SparkSession, d: String): DataFrame =
    Sources.orders(s, d)
      .groupBy("o_orderpriority")
      .agg(
        max_by(col("o_orderstatus"), col("o_orderkey")).as("latest_status"),
        min_by(col("o_orderstatus"), col("o_orderkey")).as("first_status"),
        round(max_by(col("o_totalprice"), col("o_orderkey")), 2).as("latest_price"),
        round(max("o_totalprice"), 2).as("max_price"),
      )
      .orderBy("o_orderpriority")

  /** RANGE window frame (value-based, not row-based): sliding sum over a
    * key distance of 5 event ids.
    */
  def winRangeFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id").rangeBetween(-5, 0)
    Sources.events(s, d)
      .select(col("event_id"), col("user_id"),
        round(sum("value").over(w), 2).as("sum_5back"),
        count(lit(1)).over(w).as("n_5back"))
      .orderBy("event_id")
  }

  /** Cast surface incl. failure-tolerant try_cast (semantics shared by
    * both engines: int↔double exact, int→string, floor-then-cast for
    * double→int since bare double→int casts ROUND in DuckDB but TRUNCATE
    * in Spark).
    */
  def scalarCasts(s: SparkSession, d: String): DataFrame =
    Sources.orders(s, d)
      .select(
        col("o_orderkey"),
        col("o_orderkey").cast("double").as("key_dbl"),
        col("o_orderkey").cast("string").as("key_str"),
        floor(col("o_totalprice")).cast("long").as("price_floor"),
        expr("try_cast(o_orderstatus AS BIGINT)").as("bad_cast"),
        col("o_custkey").cast("int").as("cust_int"),
      )
      .orderBy("o_orderkey")

  /** Extended string scalar family. */
  def scalarStringExt(s: SparkSession, d: String): DataFrame =
    Sources.part(s, d)
      .select(
        col("p_partkey"),
        lpad(col("p_brand"), 12, "*").as("padded"),
        rpad(col("p_brand"), 12, ".").as("rpadded"),
        translate(col("p_type"), "aeiou", "AEIOU").as("caps_vowels"),
        expr("repeat(p_brand, 2)").as("doubled"),
        reverse(col("p_name")).as("reversed"),
        expr("left(p_name, 6)").as("l6"),
        expr("right(p_name, 4)").as("r4"),
        instr(col("p_name"), "o").cast("long").as("first_o"),
        regexp_extract(col("p_name"), "[0-9]+", 0).as("digits"),
        levenshtein(col("p_brand"), lit("Brand#0")).cast("long").as("lev"),
      )
      .orderBy("p_partkey")

  /** Base64 round-trip census (`scalar_base64_census`, r13): the
    * binary↔text bridge every ingest API crosses (payload columns
    * arrive base64-wrapped in JSON; the reference's REST extraction
    * ships strings) — per source: RFC 4648 encode of each document's
    * 16-char prefix, decode-back equality census (must be total — a
    * failed round trip means an encoder/decoder disagreement), the
    * exact encoded-length sum (4·⌈len/3⌉ with '=' padding counted),
    * and a doc_id-weighted length checksum pinning every encoded
    * string to its row. Spark `base64`/`unbase64` vs DuckDB
    * `to_base64`/`from_base64` — same RFC, so hash equality is a
    * cross-engine conformance check of the codecs themselves. One
    * map-side projection + one keyed agg.
    */
  def scalarBase64Census(s: SparkSession, d: String): DataFrame =
    Sources.documents(s, d)
      .select(col("doc_id"), col("source"),
        base64(substring(col("text"), 1, 16).cast("binary")).as("b64"),
        substring(col("text"), 1, 16).as("head16"))
      .withColumn("ok",
        (unbase64(col("b64")).cast("string") === col("head16")).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("ok").as("n_roundtrip_ok"),
        sum(length(col("b64")).cast("long")).as("b64_len_sum"),
        sum(col("doc_id") * length(col("b64")).cast("long")).as("len_chk"))
      .orderBy("source")

  /** Extended date scalar family. */
  def scalarDateExt(s: SparkSession, d: String): DataFrame =
    Sources.orders(s, d)
      .select(
        col("o_orderkey"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        dayofyear(col("o_orderdate")).cast("long").as("doy"),
        weekofyear(col("o_orderdate")).cast("long").as("woy"),
        datediff(col("o_orderdate"), lit("1995-01-01")).cast("long").as("days_since_epoch_start"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        date_format(make_date(year(col("o_orderdate")), month(col("o_orderdate")), lit(1)), "yyyy-MM-dd").as("month_floor"),
      )
      .orderBy("o_orderkey")

  /** Conditional / null-handling scalar family. */
  def scalarConditional(s: SparkSession, d: String): DataFrame =
    Sources.lineitem(s, d)
      .filter(col("l_orderkey") < 300)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(coalesce(nullif(col("l_discount"), lit(0.0)), lit(-1.0)), 4).as("disc_or_neg1"),
        when(col("l_quantity") > 25, "bulk").when(col("l_quantity") > 10, "mid").otherwise("small").as("qty_band"),
        (col("l_returnflag") === "R").cast("boolean").as("is_return"),
        round(expr("if(l_tax > l_discount, l_tax, l_discount)"), 4).as("max_rate_if"),
      )
      .orderBy("l_orderkey", "l_linenumber")

  /** Map-typed JSON: parse `props` into a MapType, explode entries, and
    * aggregate per key (SURVEY §2.9 map/JSON family — `from_json`,
    * `explode` over maps, `map_keys`).
    */
  def scalarMapProps(s: SparkSession, d: String): DataFrame =
    Sources.events(s, d)
      .select(explode(from_json(col("props"), lit("map<string,int>"))).as(Seq("key", "val")))
      .groupBy("key")
      .agg(count(lit(1)).as("n"), sum("val").cast("long").as("sum_val"))
      .orderBy("key")

  /** Quantified array HOFs: exists / forall / filter over the embedding
    * vectors (all codegen'd Catalyst lambda expressions).
    */
  def scalarHofQuantifiers(s: SparkSession, d: String): DataFrame =
    Sources.embeddings(s, d)
      .select(
        col("vec_id"),
        size(filter(col("embedding"), x => x > 0.2f)).cast("long").as("n_big"),
        exists(col("embedding"), x => x > 0.2f).as("has_big"),
        forall(col("embedding"), x => abs(x) < lit(1.0f)).as("all_unit"),
      )
      .orderBy("vec_id")

  /** Explicit CROSS JOIN (the pruned-cross pattern underlies the
    * similarity operators; here the bare operator over two tiny dims).
    */
  def joinCrossRegions(s: SparkSession, d: String): DataFrame =
    Sources.region(s, d).select(col("r_name").as("name_a"))
      .crossJoin(Sources.region(s, d).select(col("r_name").as("name_b")))
      .orderBy("name_a", "name_b")

  /** LEFT OUTER: every customer with their order count in a window,
    * including zero-order customers (NULL-preserving side).
    */
  def joinLeftOuterCounts(s: SparkSession, d: String): DataFrame =
    Sources.customer(s, d)
      .join(
        Sources.orders(s, d)
          .filter(col("o_orderdate").between(lit("1995-01-01"), lit("1995-03-31 23:59:59"))),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("spend"))
      .orderBy("c_custkey")

  /** FULL OUTER over per-year activity — rows surviving from either side. */
  def joinFullOuterYears(s: SparkSession, d: String): DataFrame = {
    val ord = Sources.orders(s, d)
    val y95 = ord.filter(year(col("o_orderdate")) === 1995)
      .groupBy(col("o_custkey").as("ck95")).agg(count(lit(1)).as("n95"))
    val y96 = ord.filter(year(col("o_orderdate")) === 1996)
      .groupBy(col("o_custkey").as("ck96")).agg(count(lit(1)).as("n96"))
    y95.join(y96, col("ck95") === col("ck96"), "full_outer")
      .select(
        coalesce(col("ck95"), col("ck96")).as("custkey"),
        coalesce(col("n95"), lit(0L)).as("n95"),
        coalesce(col("n96"), lit(0L)).as("n96"))
      .orderBy("custkey")
  }

  /** Pareto / contribution analysis: customers ranked by revenue with
    * cumulative share and an 80%-head flag. The rank and running sum use
    * the two-pass prefix aggregation in [[Prefix]] — range-partition by
    * (revenue desc, custkey), per-partition local rank/prefix, broadcast
    * the k partition offsets back — so NO single-partition window exists
    * even though customers grow with the corpus. Revenue converts to
    * exact integer cents before summing: integer prefix sums are
    * associative, so the two-pass regrouping is bit-identical to a
    * sequential scan (and the oracle's window sum is exact too — the
    * float-accumulation-order tie class cannot occur).
    */
  def aggParetoCustomers(s: SparkSession, d: String): DataFrame = {
    val rev = Sources.orders(s, d)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(round(sum("o_totalprice"), 2).as("revenue"))
      .withColumn("cents", round(col("revenue") * 100).cast("long"))
    val tot = rev.agg(sum("cents").as("tot_cents"))
    Prefix.running(rev,
        order = Seq(col("revenue").desc, col("custkey").asc),
        rankOut = Some("rk"),
        sums = Seq(col("cents") -> "cum_cents"))
      .crossJoin(broadcast(tot))
      .withColumn("cum_share",
        round(col("cum_cents").cast("double") / col("tot_cents").cast("double"), 4))
      .withColumn("in_top80", col("cum_share") <= 0.8)
      .select("custkey", "rk", "revenue", "cum_share", "in_top80")
      .orderBy("rk")
  }

  /** Pairwise correlation matrix (`agg_corr_matrix`) of the four
    * lineitem measures (quantity, price dollars, discount %, tax %) — the
    * feature-redundancy screen run before any modeling. All six
    * pairwise Pearson coefficients from ONE scan: a single aggregate
    * computes the 4 sums, 4 sums of squares and 6 cross sums as exact
    * Longs (every measure integer-encoded; price in whole dollars so
    * the sum of squares stays inside Long to ~sf10), then each coefficient is
    * the identical-IEEE closed form from identical Longs (the
    * `ts_trend_slope` discipline). Built-in `corr()` would stream
    * float-state in partition order — not hash-stable cross-engine.
    */
  def corrMatrix(s: SparkSession, d: String): DataFrame = {
    val vars = Seq(
      "qty" -> col("l_quantity").cast("long"),
      "usd" -> round(col("l_extendedprice")).cast("long"),
      "disc" -> round(col("l_discount") * 100).cast("long"),
      "tax" -> round(col("l_tax") * 100).cast("long"))
    val base = Sources.lineitem(s, d)
      .select(vars.map { case (n, c) => c.as(n) }: _*)
    val sums: Seq[Column] =
      Seq(count(lit(1)).as("n")) ++
        vars.map { case (n, _) => sum(col(n)).as(s"s_$n") } ++
        vars.map { case (n, _) => sum(col(n) * col(n)).as(s"ss_$n") } ++
        vars.combinations(2).toSeq.map { case Seq((a, _), (b, _)) =>
          sum(col(a) * col(b)).as(s"sp_${a}_$b")
        }
    val g = base.agg(sums.head, sums.tail: _*)
    def D(c: Column): Column = c.cast("double")
    val rows = vars.combinations(2).toSeq.map { case Seq((a, _), (b, _)) =>
      struct(lit(a).as("var_a"), lit(b).as("var_b"),
        graft.functions.Num.roundNorm(
          (D(col("n")) * D(col(s"sp_${a}_$b")) - D(col(s"s_$a")) * D(col(s"s_$b"))) /
            (sqrt(D(col("n")) * D(col(s"ss_$a")) - D(col(s"s_$a")) * D(col(s"s_$a"))) *
              sqrt(D(col("n")) * D(col(s"ss_$b")) - D(col(s"s_$b")) * D(col(s"s_$b")))), 6)
          .as("corr"))
    }
    g.select(explode(array(rows: _*)).as("r"))
      .select(col("r.var_a"), col("r.var_b"), col("r.corr"))
      .orderBy("var_a", "var_b")
  }

  /** Herfindahl–Hirschman concentration index (`agg_hhi_segment`): per
    * market segment, Σ(customer revenue share)² on the 1e-8 lattice —
    * the regulator's concentration measure, and (with sources for
    * segments) the same statistic a data pipeline uses to flag domains
    * dominated by a few hosts. Complements the Gini
    * (`agg_gini_segment`): HHI weights the head, Gini the whole curve.
    * The index is ONE exact floor division at the end —
    * `hhi = (10⁸·Σcents²) div tc²` — not a sum of per-customer floored
    * shares: flooring each share to basis points first would zero every
    * customer under 1 bp of segment revenue, collapsing the index
    * toward 0 exactly when the tail is long (i.e. at scale). Squares
    * sum in decimal(38,0) (exact to ~1e9 customers × ~1e9-cent
    * revenues; 10⁸·Σc² ≤ ~1e35 < 1e38), the quotient is a Long ≤ 10⁸
    * (= monopoly), and both engines replay the identical integer
    * arithmetic. Two keyed aggregates, no join.
    */
  def hhiSegment(s: SparkSession, d: String): DataFrame = {
    val rev = Sources.orders(s, d)
      .join(Sources.customer(s, d),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"), col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    rev.groupBy("segment")
      .agg(count(lit(1)).as("n_customers"),
        sum("cents").as("tc"),
        sum((col("cents").cast("decimal(19,0)") *
          col("cents").cast("decimal(19,0)")).cast("decimal(38,0)")).as("sc2"))
      .select(col("segment"), col("n_customers"),
        expr("(100000000 * sc2) div (cast(tc as decimal(19,0)) * cast(tc as decimal(19,0)))")
          .as("hhi"))
      .orderBy("segment")
  }

  /** Scale-safe global NTILE (`win_ntile_quartiles`): customers split
    * into revenue quartiles WITHOUT `Window.orderBy` — a global ntile
    * plans a single-partition exchange, so the quartile comes from the
    * two-pass [[Prefix]] rank plus the 1-row count attach:
    * `q = (4·(rk−1)) div n + 1`. That formula reproduces SQL ntile's
    * remainder-to-the-FIRST-buckets rule only when 4 | n, so the oracle
    * states the identical row_number arithmetic rather than DuckDB's
    * `ntile` (whose remainder layout differs — documented cross-engine
    * trap). Output is the quartile census: bounds and mass per bucket,
    * all exact cents.
    */
  def ntileQuartiles(s: SparkSession, d: String): DataFrame = {
    val rev = Sources.orders(s, d)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val tot = rev.agg(count(lit(1)).as("n"))
    Prefix.running(rev,
        order = Seq(col("cents").desc, col("custkey").asc),
        rankOut = Some("rk"))
      .crossJoin(broadcast(tot))
      .withColumn("quartile", expr("(4 * (rk - 1)) div n + 1"))
      .groupBy("quartile")
      .agg(count(lit(1)).as("n_customers"),
        max("cents").as("max_cents"), min("cents").as("min_cents"),
        sum("cents").as("total_cents"))
      .orderBy("quartile")
  }

  /** Cumulative distinct count over a window — not natively expressible
    * (no `count(DISTINCT)` window in either engine), composed from the
    * standard two-window trick: a first-occurrence flag (row_number = 1
    * per (user, type)) running-summed over the user's timeline. Both
    * windows partition by user — one exchange, two sorts.
    */
  def winCumDistinct(s: SparkSession, d: String): DataFrame = {
    val firstSeen = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    val timeline = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Sources.events(s, d)
      .withColumn("first_seen",
        when(row_number().over(firstSeen) === 1, 1L).otherwise(0L))
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
        col("event_type"),
        sum("first_seen").over(timeline).as("n_distinct_types"))
      .orderBy("user_id", "event_id")
  }

  /** Exact WEIGHTED median per group (`agg_weighted_median`): the
    * smallest price whose running quantity-weight reaches half the
    * group's total — robust pricing where a 50-unit line should pull
    * the median 50× harder than a single unit, which plain `median`
    * cannot express. Scale-safe: the running weight comes from the
    * two-pass [[Prefix]] aggregation over the GLOBAL
    * (group, price, tie-break) order — groups are contiguous in that
    * order, so the per-group running weight is the global running sum
    * minus the group's start offset (one extra keyed aggregate), and
    * no 3-partition `Window.partitionBy(flag)` sort of the whole fact
    * table ever exists. All weights are integer units, so the
    * threshold test `2·cum ≥ total` is exact in both engines.
    */
  def weightedMedian(s: SparkSession, d: String): DataFrame = {
    val li = Sources.lineitem(s, d).select(
      col("l_returnflag"), col("l_extendedprice"),
      col("l_quantity").cast("long").as("q"),
      col("l_orderkey"), col("l_linenumber"))
    // lazy pin: `run` feeds both the per-group offset aggregate and the
    // threshold join below — unpinned, the per-partition running-sum
    // window would re-execute once per consumer subplan (dedup of the
    // duplicated lineage otherwise rides on timing-sensitive AQE
    // exchange reuse — the graph_hits lesson)
    val run = graft.io.Checkpoints.pin(
      Prefix.running(li,
        Seq(col("l_returnflag"), col("l_extendedprice"),
          col("l_orderkey"), col("l_linenumber")),
        sums = Seq((col("q"), "gs"))),
      eager = false)
    val off = run.groupBy("l_returnflag")
      .agg(min(col("gs") - col("q")).as("off"), sum("q").as("tw"))
    run.join(broadcast(off), "l_returnflag")
      .filter((col("gs") - col("off")) * 2 >= col("tw"))
      .groupBy("l_returnflag")
      .agg(min("l_extendedprice").as("wmedian_price"), min("tw").as("total_qty"))
      .orderBy("l_returnflag")
  }

  /** Deterministic MODE per group (`agg_mode`): the most frequent
    * quantity per return flag, ties resolved to the SMALLEST value —
    * spelled out as count + argmax rather than a `mode()` builtin
    * precisely because builtins leave tie order unspecified and an
    * unspecified tie is a hash-gate coin flip. Two keyed aggregates
    * (map-side combinable); the argmax is `min(struct(-cnt, value))`,
    * one struct comparison per candidate.
    */
  def modePerGroup(s: SparkSession, d: String): DataFrame = {
    Sources.lineitem(s, d)
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("qty"))
      .groupBy("l_returnflag", "qty").agg(count(lit(1)).as("cnt"))
      .groupBy("l_returnflag")
      .agg(min(struct((-col("cnt")).as("nc"), col("qty"))).as("m"))
      .select(col("l_returnflag"), col("m.qty").as("mode_qty"),
        (-col("m.nc")).as("n_occurrences"))
      .orderBy("l_returnflag")
  }

  /** Bitwise aggregate + scalar surface (`agg_bitwise`): AND/OR/XOR
    * aggregates over per-order flag masks (built with shifts from order
    * facts) — the permission-mask / feature-flag rollup shape. Exact
    * integer semantics in any engine; one map-side-combinable pass.
    */
  def bitwiseAgg(s: SparkSession, d: String): DataFrame =
    Sources.orders(s, d)
      .select(col("o_orderpriority"),
        shiftleft(when(col("o_orderstatus") === "F", 1L).otherwise(0L), 0)
          .bitwiseOR(shiftleft(when(col("o_totalprice") > 100000.0, 1L).otherwise(0L), 1))
          .bitwiseOR(shiftleft(pmod(col("o_custkey"), lit(4L)), 2)).as("mask"))
      .groupBy("o_orderpriority")
      .agg(
        bit_and(col("mask")).as("mask_and"),
        bit_or(col("mask")).as("mask_or"),
        bit_xor(col("mask")).as("mask_xor"),
        count(lit(1)).as("n_rows"))
      .orderBy("o_orderpriority")

  /** Unpivot (melt) round-trip (`pivot_unpivot_quarters`): quarterly
    * revenue pivoted wide (one LONG cents column per quarter) and
    * immediately melted back to long form with `unpivot` — the
    * wide↔long reshaping pair every feature-engineering pipeline needs
    * (pandas melt / SQL UNPIVOT). The oracle is the DIRECT
    * `GROUP BY (year, quarter)`, so the hash check proves
    * `unpivot ∘ pivot` is the identity on populated cells. Scale:
    * pivot is one keyed aggregate carrying 4 columns of state; unpivot
    * is a pure map-side ×4 row expansion (a `Expand` node — no
    * shuffle, no UDF); absent cells surface as NULLs and are dropped
    * to match the direct aggregate exactly.
    */
  def unpivotQuarters(s: SparkSession, d: String): DataFrame = {
    val wide = Sources.orders(s, d)
      .select(
        year(col("o_orderdate")).cast("long").as("o_year"),
        concat(lit("q"), quarter(col("o_orderdate"))).as("qtr"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy("o_year")
      .pivot("qtr", Seq("q1", "q2", "q3", "q4"))
      .agg(sum("cents"))
    wide.unpivot(
        Array(col("o_year")),
        Array(col("q1"), col("q2"), col("q3"), col("q4")),
        "qtr", "rev_cents")
      .filter(col("rev_cents").isNotNull)
      .orderBy("o_year", "qtr")
  }

  /** Exact distinct count via 64-bit bitmap words
    * (`agg_bitmap_distinct`): distinct customers per order priority
    * WITHOUT shuffling raw (priority, custkey) rows — keys pack into
    * per-(priority, custkey div 64) words with `bit_or(1 << k mod 64)`
    * (the map-side partial aggregate ORs up to 64 keys into ONE Long
    * before the exchange), then a second keyed aggregate sums
    * `bit_count(word)`. The roaring-bitmap trick on a flat 64-bit
    * lattice: shuffle width is bounded by |key domain|/64 words per
    * group regardless of row count, where `count(distinct)` shuffles
    * (and spills) every distinct row. Dense key domains only — a
    * sparse 2⁶⁴ domain wants HLL ([[Sketches]]) or a real roaring
    * container; the TPC-H custkey space is exactly the dense case.
    */
  def bitmapDistinct(s: SparkSession, d: String): DataFrame =
    Sources.orders(s, d)
      .select(col("o_orderpriority"),
        expr("o_custkey div 64").as("wslot"),
        expr("shiftleft(1L, CAST(o_custkey % 64 AS INT))").as("bit"))
      .groupBy("o_orderpriority", "wslot")
      .agg(bit_or(col("bit")).as("word"))
      .groupBy("o_orderpriority")
      .agg(sum(bit_count(col("word"))).as("n_distinct"))
      .orderBy("o_orderpriority")

  /** Business-day order-to-ship latency per return flag
    * (`scalar_business_days`): the weekday count between order and ship
    * dates via the CLOSED-FORM
    * prefix function — B(e) = 5·((e+3) div 7) + least((e+3) mod 7, 5) − 3
    * counts business days in [epoch, e) on Monday-indexed weeks
    * (1970-01-01 was a Thursday, hence the +3 shift) — so
    * busdays(d₀, d₁] = B(e₁+1) − B(e₀+1) with NO calendar spine, no
    * per-day explode, no UDF: four integer ops per row, identical in
    * both engines (Spark `div`/`%` vs DuckDB `//`/`%`, truncation-equal
    * on these positive epochs). Weekday-number builtins are
    * deliberately avoided — Spark's dayofweek is 1=Sunday, DuckDB's
    * isodow is 1=Monday; epoch arithmetic sidesteps the whole class.
    */
  def scalarBusinessDays(s: SparkSession, d: String): DataFrame = {
    val li = Sources.lineitem(s, d).select(col("l_orderkey"),
      col("l_returnflag"),
      datediff(to_date(col("l_shipdate")), lit("1970-01-01").cast("date"))
        .cast("long").as("er"))
    val o = Sources.orders(s, d).select(col("o_orderkey").as("l_orderkey"),
      datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date"))
        .cast("long").as("ec"))
    def b(c: Column): Column =
      lit(5L) * call_function("div", c + 4, lit(7L)) +
        least((c + 4) % 7, lit(5L)) - 3L
    li.join(o, "l_orderkey")
      .withColumn("busdays", b(col("er")) - b(col("ec")))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum("busdays").as("busdays_sum"),
        min("busdays").as("busdays_min"),
        max("busdays").as("busdays_max"))
      .withColumn("busdays_avg", graft.functions.Num.roundNorm(
        col("busdays_sum").cast("double") / col("n_items"), 4))
      .orderBy("l_returnflag")
  }

  /** Luhn mod-10 validation (`scalar_luhn_check`, r13): the checksum
    * every PII-bearing ingest runs to tell REAL card-like identifiers
    * from noise before redaction ([[graft.ops.TextOps]]' PII family,
    * here as the pure scalar kernel). Synthetic 13-digit PANs derive
    * deterministically from the customer key (pan = 4·10¹² + key·7919 —
    * the '4' IIN prefix keeps the domain realistic); the Luhn sum
    * unrolls over 16 fixed digit positions — d_i = (pan div 10^i) mod
    * 10, positions odd-from-rightmost doubled with digit-sum folding
    * (2d div 10 + 2d mod 10) — one branch-free integer expression,
    * whole-stage-codegen'd, no UDF. Census per segment: how many
    * synthetic PANs happen to be Luhn-valid (≈ 1/10 by construction —
    * the spec pins the exact fixture counts).
    */
  def scalarLuhnCheck(s: SparkSession, d: String): DataFrame = {
    val pan = lit(4000000000000L) + col("c_custkey") * lit(7919L)
    val luhnSum = (0 until 16).map { i =>
      val di = pmod(call_function("div", pan, lit(math.pow(10, i).toLong)),
        lit(10L))
      if (i % 2 == 1)
        call_function("div", di * 2L, lit(10L)) + (di * 2L) % 10L
      else di
    }.reduce(_ + _)
    Sources.customer(s, d)
      .select(col("c_mktsegment"), luhnSum.as("lsum"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(when(col("lsum") % 10L === 0L, 1L).otherwise(0L)).as("n_valid"),
        sum("lsum").as("sum_luhn"))
      .orderBy("c_mktsegment")
  }

  /** IPv4 parse/validate census (`scalar_ipv4_parse`, r13): the
    * log-ingest cleaning kernel — synthetic dotted-quad strings derive
    * from the customer key with the FIRST octet drawn on a 0..299
    * domain (so ~15 % of rows carry an out-of-range octet, the real
    * dirty-feed shape), then the string is parsed BACK (split + cast —
    * the round trip through the string domain is the point: the
    * parser, not the generator, is under test), octets validated
    * against 0..255, and the valid population censused per segment
    * with the RFC-1918 10/8 private-range flag. Pure string/integer
    * expressions, codegen'd, no UDF.
    */
  def scalarIpv4Parse(s: SparkSession, d: String): DataFrame = {
    val ip = concat_ws(".",
      (col("c_custkey") * 31L % 300L).cast("string"),
      (col("c_custkey") * 17L % 256L).cast("string"),
      (col("c_custkey") * 13L % 256L).cast("string"),
      (col("c_custkey") * 7L % 256L).cast("string"))
    val parts = split(col("ip"), "\\.")
    def oct(i: Int): Column = parts.getItem(i).cast("long")
    Sources.customer(s, d)
      .select(col("c_mktsegment"), ip.as("ip"))
      .withColumn("valid",
        oct(0) <= 255L && oct(1) <= 255L && oct(2) <= 255L && oct(3) <= 255L)
      .withColumn("priv10", col("valid") && oct(0) === 10L)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(col("valid").cast("long")).as("n_valid"),
        sum(col("priv10").cast("long")).as("n_private10"),
        sum(when(col("valid"), oct(3)).otherwise(0L)).as("sum_o4"))
      .orderBy("c_mktsegment")
  }

  /** Unrolled (r·10 + dᵢ) mod 97 fold over a fixed-width digit-string
    * column — ONE generated expression text shared verbatim by Spark
    * and the DuckDB oracle (the soundexSql discipline). 97 keeps every
    * intermediate < 970, so the fold never leaves small-integer range.
    */
  private def mod97Sql(c: String, len: Int): String =
    (1 to len).foldLeft("CAST(0 AS BIGINT)") { (acc, i) =>
      s"(($acc * 10 + CAST(substr($c, $i, 1) AS BIGINT)) % 97)"
    }

  /** IBAN mod-97 check census (`scalar_iban_mod97`, r13): the ISO 13616
    * checksum — the OTHER standard account-number validator next to
    * [[scalarLuhnCheck]]'s mod-10, and a different algorithm class: a
    * single big-integer residue over the whole rearranged number, not a
    * per-digit parity sum, computed here as the standard streaming fold
    * (r = (r·10 + d) mod 97, unrolled over the fixed 24-digit width; no
    * big-int type needed in either engine). Round-trip discipline: the
    * check digits are DERIVED (kk = 98 − (BBAN‖'131400') mod 97), the
    * account number is then PRESENTED as a string — with every 11th
    * record's BBAN corrupted by +1, the dirty-feed pattern — and the
    * validator re-parses and re-folds the string; a corrupted BBAN
    * shifts the residue by 10⁶ mod 97 = 27 ≠ 0, so every corrupt row
    * must fail and every clean row must pass (the spec asserts the
    * exact reconciliation). Pure codegen'd string/integer expressions,
    * map-side + one keyed census.
    */
  def scalarIbanMod97(s: SparkSession, d: String): DataFrame = {
    val numChk = "lpad(CAST(c_custkey * 7919 AS STRING), 18, '0') || '131400'"
    val numVal = "lpad(CAST(c_custkey * 7919 + " +
      "(CASE WHEN c_custkey % 11 = 0 THEN 1 ELSE 0 END) AS STRING), 18, '0')" +
      " || '1314' || lpad(CAST(kk AS STRING), 2, '0')"
    Sources.customer(s, d)
      .select(col("c_mktsegment"), col("c_custkey"))
      .withColumn("numchk", expr(numChk))
      .withColumn("kk", expr(s"98 - ${mod97Sql("numchk", 24)}"))
      .withColumn("numval", expr(numVal))
      .withColumn("valid",
        expr(s"CASE WHEN ${mod97Sql("numval", 24)} = 1 THEN 1L ELSE 0L END"))
      .withColumn("corrupt",
        when(col("c_custkey") % 11 === 0, 1L).otherwise(0L))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum("valid").as("n_valid"),
        sum("corrupt").as("n_corrupt"), sum("kk").as("sum_kk"))
      .orderBy("c_mktsegment")
  }

  /** Bowley quartile skewness (`agg_bowley_skew`, r13): (Q₁ + Q₃ −
    * 2·Q₂)/(Q₃ − Q₁) per segment on nearest-rank (type-1) quartiles —
    * the robust skewness a profiling sweep publishes when moments are
    * outlier-dominated ([[Stats.grubbsOutlier]] is the companion
    * diagnostic). Fully integer until one mirrored e6 round: the
    * global (segment, cents, key) rank comes from ONE
    * [[graft.ops.Prefix]] pass (segments are contiguous in that
    * order, so the per-segment rank is rank − segment-min + 1 via a
    * 5-row broadcast), the three quartiles are conditional-MIN
    * order-statistic picks in ONE grouped pass (the stats_qq_normal
    * pattern), and the skew coefficient mirrors as round(1e6·num/den)
    * — NOT an integer div, whose truncate-toward-zero (Spark) vs
    * floor (DuckDB) semantics diverge on the negative numerators a
    * left-skewed segment produces.
    */
  def bowleySkew(s: SparkSession, d: String): DataFrame = {
    val recs = Sources.customer(s, d)
      .select(col("c_mktsegment").as("seg"), col("c_custkey"),
        round(col("c_acctbal") * 100).cast("long").as("cents"))
    val ranked = Prefix.running(recs,
      Seq(col("seg"), col("cents"), col("c_custkey")), rankOut = Some("rk"))
    val segs = ranked.groupBy("seg")
      .agg(min("rk").as("rk0"), count(lit(1)).as("n"))
      .withColumn("r1", expr("(n + 3) div 4"))
      .withColumn("r2", expr("(n + 1) div 2"))
      .withColumn("r3", expr("(3 * n + 3) div 4"))
    ranked.join(broadcast(segs), "seg")
      .withColumn("relrk", col("rk") - col("rk0") + 1L)
      .groupBy("seg")
      .agg(max("n").as("n"),
        min(when(col("relrk") >= col("r1"), col("cents"))).as("q1"),
        min(when(col("relrk") >= col("r2"), col("cents"))).as("q2"),
        min(when(col("relrk") >= col("r3"), col("cents"))).as("q3"))
      .withColumn("bowley_e6",
        when(col("q3") > col("q1"), round(lit(1e6) *
          (col("q1") + col("q3") - lit(2L) * col("q2")).cast("double") /
          (col("q3") - col("q1")).cast("double")).cast("long"))
          .otherwise(lit(0L)))
      .orderBy("seg")
  }

  /** Interpolated percentiles, EXACT (`agg_percentile_cont`, r13): the
    * type-7 / PERCENTILE_CONT convention (h = 1 + (n−1)·p, linear
    * interpolation between the two bracketing order statistics) that
    * every BI tool defaults to — made lattice-exact instead of a
    * float interpolation: with p ∈ {25, 50, 75}/100 the fractional
    * part of h is always a multiple of 1/100, so the interpolated
    * value lives EXACTLY on the cents×100 lattice: q·100 = 100·x_lo +
    * ((n−1)·p mod 100)·(x_hi − x_lo). No doubles anywhere — the
    * companion [[bowleySkew]] shows the type-1 (nearest-rank) picks;
    * this is the continuous twin, same one-Prefix-pass shape with SIX
    * conditional-MIN order-statistic picks (lo and lo+1 per
    * percentile; lo+1 ≤ n always since p < 100).
    */
  def percentileCont(s: SparkSession, d: String): DataFrame = {
    val recs = Sources.customer(s, d)
      .select(col("c_mktsegment").as("seg"), col("c_custkey"),
        round(col("c_acctbal") * 100).cast("long").as("cents"))
    val ranked = Prefix.running(recs,
      Seq(col("seg"), col("cents"), col("c_custkey")), rankOut = Some("rk"))
    var segs = ranked.groupBy("seg")
      .agg(min("rk").as("rk0"), count(lit(1)).as("n"))
    for (p <- Seq(25, 50, 75)) {
      segs = segs
        .withColumn(s"lo$p", expr(s"1 + ((n - 1) * $p) div 100"))
        .withColumn(s"fr$p", expr(s"((n - 1) * $p) % 100"))
    }
    val picks = Seq(25, 50, 75).flatMap { p =>
      Seq(
        min(when(col("relrk") >= col(s"lo$p"), col("cents"))).as(s"xlo$p"),
        min(when(col("relrk") >= col(s"lo$p") + 1L, col("cents")))
          .as(s"xhi$p"))
    }
    val agg = ranked.join(broadcast(segs), "seg")
      .withColumn("relrk", col("rk") - col("rk0") + 1L)
      .groupBy("seg")
      .agg(max("n").as("n"), picks: _*)
    Seq(25, 50, 75).foldLeft(agg.join(broadcast(segs.select(
      col("seg"), col("fr25"), col("fr50"), col("fr75"))), "seg")) {
      (df, p) =>
        df.withColumn(s"p${p}_x100",
          lit(100L) * col(s"xlo$p") + col(s"fr$p") *
            (coalesce(col(s"xhi$p"), col(s"xlo$p")) - col(s"xlo$p")))
    }
      .select(col("seg"), col("n"), col("p25_x100"), col("p50_x100"),
        col("p75_x100"))
      .orderBy("seg")
  }

  /** CIDR longest-prefix-match join (`join_cidr_lpm`, r13): the
    * routing-table / IP-blocklist join — every record's IP is matched
    * against a table of CIDR blocks and the MOST SPECIFIC (longest
    * prefix) covering block wins, the lookup semantics of both routers
    * and curation-pipeline IP filters (a /20 allowlist entry overrides
    * the /8 block around it). IPs are synthesized as exact uint32s via
    * the Knuth multiplicative hash of the customer key (uniform over
    * the 32-bit space, so every published block sees traffic at the
    * gated SFs); the 8-block table nests three deep (64/2 ⊃ 80/4 ⊃
    * 84/7, 10/8 ⊃ 10.32/11) so the argmax is genuinely load-bearing —
    * a join-only plan without the LPM election double-counts every
    * nested IP. Plan: broadcast theta-join (ip BETWEEN lo AND hi)
    * against the 8-row block table — at 100 TB a real 1M-entry routing
    * table still broadcasts (~24 MB) — then a per-key row_number
    * argmax on (plen DESC, block) partitioned by the record key (never
    * a global window), LEFT join-back so unmatched IPs census under
    * the sentinel, and one grouped count. All integer arithmetic.
    */
  def joinCidrLpm(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val blocks = Seq(
      ("any64/2", 64L, 2), ("mid80/4", 80L, 4), ("fine84/7", 84L, 7),
      ("ten10/8", 10L, 8), ("teninner10.32/11", 10L * 256L + 32L, 11),
      ("private172.16/12", 172L * 256L + 16L, 12),
      ("upper192/3", 192L, 3), ("high224/4", 224L, 4))
      .map { case (n, topBits, p) =>
        val lo = topBits << (32 - (if (p <= 8) 8 else 16))
        (n, lo, lo + (1L << (32 - p)) - 1L, p.toLong)
      }.toDF("block", "lo", "hi", "plen")
    val cust = Sources.customer(s, d).select(col("c_custkey"),
      col("c_mktsegment"),
      pmod(col("c_custkey") * lit(2654435761L), lit(4294967296L)).as("ip"))
    val wLpm = Window.partitionBy("c_custkey")
      .orderBy(col("plen").desc, col("block"))
    val best = cust.join(broadcast(blocks),
      col("ip") >= col("lo") && col("ip") <= col("hi"))
      .withColumn("rn", row_number().over(wLpm)).filter(col("rn") === 1)
      .select(col("c_custkey"), col("block"), col("plen"))
    cust.join(best, Seq("c_custkey"), "left")
      .select(col("c_mktsegment"),
        coalesce(col("block"), lit("unmatched")).as("block"),
        coalesce(col("plen"), lit(0L)).as("plen"), col("ip"))
      .groupBy("c_mktsegment", "block", "plen")
      .agg(count(lit(1)).as("n_ips"), sum("ip").as("sum_ip"))
      .orderBy("c_mktsegment", "block")
  }

  /** URL parse census (`scalar_url_parse`, r13): deterministic URLs
    * synthesized per customer (the [[scalarIpv4Parse]] dirty-data
    * pattern — every 7th key gets an `ftp` scheme so validation binds,
    * every 4th a bare root path, every 5th a query string), then parsed
    * back with anchored regexes: scheme validation (`^https?://`), host
    * and path extraction via `regexp_extract` group 1 (the pattern
    * `^[a-z]+://…` matches EVERY synthesized row, so neither engine
    * hits the no-match return-value divergence). Census per segment:
    * valid share, query/root-path counts, distinct host count — all
    * exact integers. Map-side string work + one keyed agg; the ETL
    * log/clickstream-parsing staple.
    */
  def scalarUrlParse(s: SparkSession, d: String): DataFrame = {
    val k = col("c_custkey")
    val url = concat(
      when(k % 7 === 0, lit("ftp")).when(k % 3 === 0, lit("http"))
        .otherwise(lit("https")),
      lit("://shop"), (k % 50).cast("string"), lit(".example.com"),
      when(k % 4 === 0, lit("")).otherwise(
        concat(lit("/cat/"), (k % 20).cast("string"))),
      when(k % 5 === 0, concat(lit("?q="), (k % 9).cast("string"),
        lit("&page=2"))).otherwise(lit("")))
    Sources.customer(s, d)
      .select(col("c_mktsegment"), url.as("url"))
      .withColumn("valid", col("url").rlike("^https?://"))
      .withColumn("host", regexp_extract(col("url"),
        "^[a-z]+://([a-z0-9.-]+)", 1))
      .withColumn("path", regexp_extract(col("url"),
        "^[a-z]+://[a-z0-9.-]+([^?]*)", 1))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(col("valid").cast("long")).as("n_valid"),
        sum(col("url").contains("?").cast("long")).as("n_query"),
        sum((col("path") === "").cast("long")).as("n_root"),
        countDistinct("host").as("n_hosts"))
      .orderBy("c_mktsegment")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scalar_base64_census" -> (scalarBase64Census _),
    "scalar_url_parse" -> (scalarUrlParse _),
    "scalar_ipv4_parse" -> (scalarIpv4Parse _),
    "scalar_iban_mod97" -> (scalarIbanMod97 _),
    "agg_bowley_skew" -> (bowleySkew _),
    "agg_percentile_cont" -> (percentileCont _),
    "join_cidr_lpm" -> (joinCidrLpm _),
    "scalar_luhn_check" -> (scalarLuhnCheck _),
    "scalar_business_days" -> (scalarBusinessDays _),
    "pivot_unpivot_quarters" -> (unpivotQuarters _),
    "agg_bitmap_distinct" -> (bitmapDistinct _),
    "win_ntile_quartiles" -> (ntileQuartiles _),
    "agg_hhi_segment" -> (hhiSegment _),
    "agg_corr_matrix" -> (corrMatrix _),
    "agg_bitwise" -> (bitwiseAgg _),
    "agg_mode" -> (modePerGroup _),
    "agg_weighted_median" -> (weightedMedian _),
    "agg_pareto_customers" -> (aggParetoCustomers _),
    "win_cum_distinct" -> (winCumDistinct _),
    "agg_stats_summary" -> (aggStatsSummary _),
    "agg_minmax_by" -> (aggMinmaxBy _),
    "scalar_map_props" -> (scalarMapProps _),
    "scalar_hof_quantifiers" -> (scalarHofQuantifiers _),
    "win_range_frame" -> (winRangeFrame _),
    "scalar_casts" -> (scalarCasts _),
    "agg_collect" -> (aggCollect _),
    "agg_grouping_sets" -> (aggGroupingSets _),
    "pivot_event_counts" -> (pivotEventCounts _),
    "pivot_share_matrix" -> (pivotShareMatrix _),
    "win_next_order_gap" -> (nextOrderGap _),
    "win_cumulative_share" -> (cumulativeShare _),
    "audit_key_inversions" -> (keyInversions _),
    "win_analytics" -> (winAnalytics _),
    "scalar_string_ext" -> (scalarStringExt _),
    "scalar_date_ext" -> (scalarDateExt _),
    "scalar_conditional" -> (scalarConditional _),
    "join_cross_regions" -> (joinCrossRegions _),
    "join_left_outer_counts" -> (joinLeftOuterCounts _),
    "join_full_outer_years" -> (joinFullOuterYears _),
  )

  /** One UNION arm of the correlation-matrix oracle: the identical
    * closed form from identical Longs, per variable pair.
    */
  private def corrArm(a: String, b: String): String =
    s"""SELECT '$a' AS var_a, '$b' AS var_b,
       | round((CAST(n AS DOUBLE) * CAST(sp_${a}_$b AS DOUBLE)
       |     - CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE)) /
       |   (sqrt(CAST(n AS DOUBLE) * CAST(ss_$a AS DOUBLE)
       |     - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE)) *
       |    sqrt(CAST(n AS DOUBLE) * CAST(ss_$b AS DOUBLE)
       |     - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE))), 6) + 0.0 AS corr
       |FROM g""".stripMargin

  val oracles: Map[String, String] = Map(
    // to_base64/from_base64 vs base64/unbase64 — same RFC 4648; hash
    // equality doubles as a cross-engine codec conformance check
    "scalar_base64_census" ->
      """WITH t AS (SELECT doc_id, source,
        |   substr(text, 1, 16) AS head16,
        |   to_base64(substr(text, 1, 16)::BLOB) AS b64
        |  FROM documents),
        | r AS (SELECT *, CASE WHEN from_base64(b64)::VARCHAR = head16
        |    THEN 1 ELSE 0 END AS ok FROM t)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(ok) AS BIGINT) AS n_roundtrip_ok,
        | CAST(sum(length(b64)) AS BIGINT) AS b64_len_sum,
        | CAST(sum(doc_id * length(b64)) AS BIGINT) AS len_chk
        |FROM r GROUP BY 1 ORDER BY source""".stripMargin,
    // the synthesized URLs all match ^[a-z]+:// so group extraction
    // never hits either engine's no-match convention
    "scalar_url_parse" ->
      """WITH t AS (SELECT c_mktsegment,
        |   (CASE WHEN c_custkey % 7 = 0 THEN 'ftp'
        |     WHEN c_custkey % 3 = 0 THEN 'http' ELSE 'https' END)
        |   || '://shop' || CAST(c_custkey % 50 AS VARCHAR) || '.example.com'
        |   || (CASE WHEN c_custkey % 4 = 0 THEN ''
        |     ELSE '/cat/' || CAST(c_custkey % 20 AS VARCHAR) END)
        |   || (CASE WHEN c_custkey % 5 = 0 THEN '?q='
        |     || CAST(c_custkey % 9 AS VARCHAR) || '&page=2' ELSE '' END)
        |   AS url
        |  FROM customer),
        | p AS (SELECT c_mktsegment, url,
        |   regexp_matches(url, '^https?://') AS valid,
        |   regexp_extract(url, '^[a-z]+://([a-z0-9.-]+)', 1) AS host,
        |   regexp_extract(url, '^[a-z]+://[a-z0-9.-]+([^?]*)', 1) AS path
        |  FROM t)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CASE WHEN valid THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
        | CAST(sum(CASE WHEN url LIKE '%?%' THEN 1 ELSE 0 END) AS BIGINT) AS n_query,
        | CAST(sum(CASE WHEN path = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_root,
        | CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    // generate the dotted string, then parse it back — split + cast,
    // validation and the 10/8 flag replay on the parsed octets
    // the SAME generated mod-97 fold text, spliced verbatim; same
    // derived check digits and +1 corruption on every 11th record
    "scalar_iban_mod97" ->
      (s"""WITH s1 AS (SELECT c_mktsegment, c_custkey,
        |   lpad(CAST(c_custkey * 7919 AS STRING), 18, '0') || '131400'
        |     AS numchk FROM customer),
        | s2 AS (SELECT c_mktsegment, c_custkey,
        |    98 - ${mod97Sql("numchk", 24)} AS kk FROM s1),
        | s3 AS (SELECT c_mktsegment, c_custkey, kk,
        |    lpad(CAST(c_custkey * 7919 +
        |      (CASE WHEN c_custkey % 11 = 0 THEN 1 ELSE 0 END) AS STRING),
        |      18, '0') || '1314' || lpad(CAST(kk AS STRING), 2, '0')
        |     AS numval FROM s2),
        | s4 AS (SELECT c_mktsegment, kk,
        |    CASE WHEN ${mod97Sql("numval", 24)} = 1 THEN 1 ELSE 0 END
        |      AS valid,
        |    CASE WHEN c_custkey % 11 = 0 THEN 1 ELSE 0 END AS corrupt
        |   FROM s3)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(valid) AS BIGINT) AS n_valid,
        | CAST(sum(corrupt) AS BIGINT) AS n_corrupt,
        | CAST(sum(kk) AS BIGINT) AS sum_kk
        |FROM s4 GROUP BY 1 ORDER BY c_mktsegment""".stripMargin),
    // same type-7 lattice identity (q·100 = 100·x_lo + fr·(x_hi −
    // x_lo)), same six conditional-MIN picks — no doubles anywhere
    "agg_percentile_cont" ->
      """WITH recs AS (SELECT c_mktsegment AS seg, c_custkey,
        |   CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer),
        | rk AS (SELECT seg, cents,
        |   row_number() OVER (PARTITION BY seg ORDER BY cents, c_custkey)
        |     AS relrk FROM recs),
        | segs AS (SELECT seg, CAST(count(*) AS BIGINT) AS n FROM recs
        |   GROUP BY 1),
        | q AS (SELECT rk.seg,
        |    min(CASE WHEN relrk >= 1 + ((s.n - 1) * 25) // 100
        |      THEN cents END) AS xlo25,
        |    min(CASE WHEN relrk >= 2 + ((s.n - 1) * 25) // 100
        |      THEN cents END) AS xhi25,
        |    min(CASE WHEN relrk >= 1 + ((s.n - 1) * 50) // 100
        |      THEN cents END) AS xlo50,
        |    min(CASE WHEN relrk >= 2 + ((s.n - 1) * 50) // 100
        |      THEN cents END) AS xhi50,
        |    min(CASE WHEN relrk >= 1 + ((s.n - 1) * 75) // 100
        |      THEN cents END) AS xlo75,
        |    min(CASE WHEN relrk >= 2 + ((s.n - 1) * 75) // 100
        |      THEN cents END) AS xhi75
        |   FROM rk JOIN segs s USING (seg) GROUP BY 1)
        |SELECT q.seg, s.n,
        | 100 * xlo25 + ((s.n - 1) * 25) % 100 *
        |   (coalesce(xhi25, xlo25) - xlo25) AS p25_x100,
        | 100 * xlo50 + ((s.n - 1) * 50) % 100 *
        |   (coalesce(xhi50, xlo50) - xlo50) AS p50_x100,
        | 100 * xlo75 + ((s.n - 1) * 75) % 100 *
        |   (coalesce(xhi75, xlo75) - xlo75) AS p75_x100
        |FROM q JOIN segs s USING (seg) ORDER BY seg""".stripMargin,
    // same one-pass rank, same conditional-MIN type-1 quartiles, same
    // mirrored e6 skew finish (never an integer div on a signed value)
    "agg_bowley_skew" ->
      """WITH recs AS (SELECT c_mktsegment AS seg, c_custkey,
        |   CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer),
        | rk AS (SELECT seg, cents,
        |   row_number() OVER (PARTITION BY seg ORDER BY cents, c_custkey)
        |     AS relrk FROM recs),
        | segs AS (SELECT seg, CAST(count(*) AS BIGINT) AS n FROM recs
        |   GROUP BY 1),
        | q AS (SELECT rk.seg,
        |    min(CASE WHEN relrk >= (s.n + 3) // 4 THEN cents END) AS q1,
        |    min(CASE WHEN relrk >= (s.n + 1) // 2 THEN cents END) AS q2,
        |    min(CASE WHEN relrk >= (3 * s.n + 3) // 4 THEN cents END) AS q3
        |   FROM rk JOIN segs s USING (seg) GROUP BY 1)
        |SELECT q.seg, s.n, q.q1, q.q2, q.q3,
        | CASE WHEN q.q3 > q.q1 THEN
        |   CAST(round(1e6 * CAST(q.q1 + q.q3 - 2 * q.q2 AS DOUBLE) /
        |     CAST(q.q3 - q.q1 AS DOUBLE)) AS BIGINT)
        |  ELSE 0 END AS bowley_e6
        |FROM q JOIN segs s USING (seg) ORDER BY seg""".stripMargin,
    // same Knuth-hash uint32 IPs, same 8-block table, same
    // (plen DESC, block) LPM election and unmatched sentinel
    "join_cidr_lpm" ->
      """WITH blocks(block, lo, hi, plen) AS (VALUES
        |   ('any64/2', 1073741824, 2147483647, 2),
        |   ('mid80/4', 1342177280, 1610612735, 4),
        |   ('fine84/7', 1409286144, 1442840575, 7),
        |   ('ten10/8', 167772160, 184549375, 8),
        |   ('teninner10.32/11', 169869312, 171966463, 11),
        |   ('private172.16/12', 2886729728, 2887778303, 12),
        |   ('upper192/3', 3221225472, 3758096383, 3),
        |   ('high224/4', 3758096384, 4026531839, 4)),
        | cust AS (SELECT c_custkey, c_mktsegment,
        |    (c_custkey * 2654435761) % 4294967296 AS ip FROM customer),
        | best AS (SELECT c_custkey, block, plen FROM (
        |   SELECT c.c_custkey, b.block, b.plen,
        |     row_number() OVER (PARTITION BY c.c_custkey
        |       ORDER BY b.plen DESC, b.block) AS rn
        |    FROM cust c JOIN blocks b ON c.ip >= b.lo AND c.ip <= b.hi)
        |  WHERE rn = 1)
        |SELECT c.c_mktsegment, coalesce(b.block, 'unmatched') AS block,
        | CAST(coalesce(b.plen, 0) AS BIGINT) AS plen,
        | CAST(count(*) AS BIGINT) AS n_ips,
        | CAST(sum(c.ip) AS BIGINT) AS sum_ip
        |FROM cust c LEFT JOIN best b USING (c_custkey)
        |GROUP BY 1, 2, 3 ORDER BY c_mktsegment, block""".stripMargin,
    "scalar_ipv4_parse" ->
      """WITH g AS (SELECT c_mktsegment,
        |   CAST(c_custkey * 31 % 300 AS VARCHAR) || '.' ||
        |   CAST(c_custkey * 17 % 256 AS VARCHAR) || '.' ||
        |   CAST(c_custkey * 13 % 256 AS VARCHAR) || '.' ||
        |   CAST(c_custkey * 7 % 256 AS VARCHAR) AS ip FROM customer),
        | p AS (SELECT c_mktsegment,
        |    CAST(string_split(ip, '.')[1] AS BIGINT) AS o1,
        |    CAST(string_split(ip, '.')[2] AS BIGINT) AS o2,
        |    CAST(string_split(ip, '.')[3] AS BIGINT) AS o3,
        |    CAST(string_split(ip, '.')[4] AS BIGINT) AS o4
        |  FROM g),
        | v AS (SELECT c_mktsegment,
        |    o1 <= 255 AND o2 <= 255 AND o3 <= 255 AND o4 <= 255 AS valid,
        |    o1 = 10 AS is10, o4 FROM p)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CASE WHEN valid THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
        | CAST(sum(CASE WHEN valid AND is10 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_private10,
        | CAST(sum(CASE WHEN valid THEN o4 ELSE 0 END) AS BIGINT) AS sum_o4
        |FROM v GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,
    // 16 unrolled digit positions, doubling folded as 2d//10 + 2d%10
    "scalar_luhn_check" ->
      s"""WITH p AS (SELECT c_mktsegment,
         |   4000000000000 + c_custkey * 7919 AS pan FROM customer),
         | l AS (SELECT c_mktsegment,
         |   ${(0 until 16).map { i =>
               val d = s"((pan // ${math.pow(10, i).toLong}) % 10)"
               if (i % 2 == 1) s"(($d * 2) // 10 + ($d * 2) % 10)" else d
             }.mkString("\n   + ")} AS lsum
         |  FROM p)
         |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
         | CAST(sum(CASE WHEN lsum % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_valid,
         | CAST(sum(lsum) AS BIGINT) AS sum_luhn
         |FROM l GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,
    "scalar_business_days" ->
      """WITH d AS (SELECT l_returnflag,
        |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS ec,
        |    datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS er
        |   FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        | b AS (SELECT l_returnflag,
        |    (5 * ((er + 4) // 7) + least((er + 4) % 7, 5) - 3)
        |    - (5 * ((ec + 4) // 7) + least((ec + 4) % 7, 5) - 3) AS busdays
        |   FROM d)
        |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items,
        | CAST(sum(busdays) AS BIGINT) AS busdays_sum,
        | CAST(min(busdays) AS BIGINT) AS busdays_min,
        | CAST(max(busdays) AS BIGINT) AS busdays_max,
        | round(sum(busdays)::DOUBLE / count(*), 4) + 0.0 AS busdays_avg
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_corr_matrix" ->
      ("""WITH v AS (SELECT CAST(l_quantity AS BIGINT) AS qty,
        |   CAST(round(l_extendedprice) AS BIGINT) AS usd,
        |   CAST(round(l_discount * 100) AS BIGINT) AS disc,
        |   CAST(round(l_tax * 100) AS BIGINT) AS tax FROM lineitem),
        | g AS (SELECT count(*) AS n,
        |   sum(qty) AS s_qty, sum(usd) AS s_usd,
        |   sum(disc) AS s_disc, sum(tax) AS s_tax,
        |   sum(qty*qty) AS ss_qty, sum(usd*usd) AS ss_usd,
        |   sum(disc*disc) AS ss_disc, sum(tax*tax) AS ss_tax,
        |   sum(qty*usd) AS sp_qty_usd, sum(qty*disc) AS sp_qty_disc,
        |   sum(qty*tax) AS sp_qty_tax, sum(usd*disc) AS sp_usd_disc,
        |   sum(usd*tax) AS sp_usd_tax, sum(disc*tax) AS sp_disc_tax
        |  FROM v)
        |SELECT var_a, var_b, corr FROM (
        |""".stripMargin +
        Seq(("qty", "usd"), ("qty", "disc"), ("qty", "tax"),
          ("usd", "disc"), ("usd", "tax"), ("disc", "tax"))
          .map { case (a, b) => corrArm(a, b) }.mkString("", "\nUNION ALL\n", "") +
        "\n) ORDER BY var_a, var_b"),
    "agg_hhi_segment" ->
      """WITH rev AS (SELECT c_mktsegment AS segment, o_custkey,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        | t AS (SELECT segment, count(*) AS n_customers,
        |   CAST(sum(cents) AS HUGEINT) AS tc,
        |   sum(CAST(cents AS HUGEINT) * cents) AS sc2
        |  FROM rev GROUP BY segment)
        |SELECT segment, CAST(n_customers AS BIGINT) AS n_customers,
        | CAST((100000000 * sc2) // (tc * tc) AS BIGINT) AS hhi
        |FROM t ORDER BY segment""".stripMargin,
    "win_ntile_quartiles" ->
      """WITH rev AS (SELECT o_custkey AS custkey,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY o_custkey),
        | n AS (SELECT count(*) AS n FROM rev),
        | r AS (SELECT custkey, cents,
        |   CAST(row_number() OVER (ORDER BY cents DESC, custkey) AS BIGINT) AS rk
        |  FROM rev),
        | q AS (SELECT cents, (4 * (rk - 1)) // n.n + 1 AS quartile FROM r CROSS JOIN n)
        |SELECT CAST(quartile AS BIGINT) AS quartile,
        | count(*) AS n_customers,
        | CAST(max(cents) AS BIGINT) AS max_cents,
        | CAST(min(cents) AS BIGINT) AS min_cents,
        | CAST(sum(cents) AS BIGINT) AS total_cents
        |FROM q GROUP BY quartile ORDER BY quartile""".stripMargin,
    "pivot_unpivot_quarters" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        | 'q' || CAST(quarter(o_orderdate) AS VARCHAR) AS qtr,
        | CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |   AS rev_cents
        |FROM orders GROUP BY 1, 2 ORDER BY o_year, qtr""".stripMargin,
    "agg_bitmap_distinct" ->
      """SELECT o_orderpriority,
        | CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_bitwise" ->
      """WITH m AS (SELECT o_orderpriority,
        |  (CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |   | ((CASE WHEN o_totalprice > 100000.0 THEN 1 ELSE 0 END) << 1)
        |   | ((o_custkey % 4) << 2) AS mask
        | FROM orders)
        |SELECT o_orderpriority,
        | CAST(bit_and(mask) AS BIGINT) AS mask_and,
        | CAST(bit_or(mask) AS BIGINT) AS mask_or,
        | CAST(bit_xor(mask) AS BIGINT) AS mask_xor,
        | count(*) AS n_rows
        |FROM m GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "agg_mode" ->
      """WITH c AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
        |   count(*) AS cnt FROM lineitem GROUP BY 1, 2),
        | m AS (SELECT l_returnflag, qty, cnt,
        |   row_number() OVER (PARTITION BY l_returnflag
        |     ORDER BY cnt DESC, qty) AS rn FROM c)
        |SELECT l_returnflag, qty AS mode_qty, cnt AS n_occurrences
        |FROM m WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,
    "agg_weighted_median" ->
      """WITH c AS (SELECT l_returnflag, l_extendedprice,
        |   CAST(l_quantity AS BIGINT) AS q,
        |   sum(CAST(l_quantity AS BIGINT)) OVER (PARTITION BY l_returnflag
        |     ORDER BY l_extendedprice, l_orderkey, l_linenumber
        |     ROWS UNBOUNDED PRECEDING) AS cw,
        |   sum(CAST(l_quantity AS BIGINT)) OVER (PARTITION BY l_returnflag) AS tw
        |  FROM lineitem)
        |SELECT l_returnflag, min(l_extendedprice) AS wmedian_price,
        | CAST(min(tw) AS BIGINT) AS total_qty
        |FROM c WHERE 2 * cw >= tw
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_pareto_customers" ->
      """WITH rev AS (SELECT o_custkey AS custkey, round(sum(o_totalprice), 2) AS revenue
        |   FROM orders GROUP BY o_custkey),
        | cents AS (SELECT custkey, revenue,
        |   CAST(round(revenue * 100) AS BIGINT) AS c FROM rev),
        | tot AS (SELECT sum(c) AS tot_cents FROM cents),
        | ranked AS (SELECT custkey, revenue,
        |   CAST(row_number() OVER w AS BIGINT) AS rk,
        |   sum(c) OVER (ORDER BY revenue DESC, custkey
        |     ROWS UNBOUNDED PRECEDING) AS cum_cents
        |  FROM cents WINDOW w AS (ORDER BY revenue DESC, custkey))
        |SELECT custkey, rk, revenue,
        | round(CAST(cum_cents AS DOUBLE) / CAST(tot_cents AS DOUBLE), 4) AS cum_share,
        | round(CAST(cum_cents AS DOUBLE) / CAST(tot_cents AS DOUBLE), 4) <= 0.8 AS in_top80
        |FROM ranked CROSS JOIN tot ORDER BY rk""".stripMargin,
    "win_cum_distinct" ->
      """WITH f AS (SELECT user_id, event_id, ts, event_type,
        |  CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
        |    ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END AS first_seen
        | FROM events)
        |SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
        | event_type,
        | CAST(sum(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_distinct_types
        |FROM f ORDER BY user_id, event_id""".stripMargin,
    "agg_minmax_by" ->
      """SELECT o_orderpriority,
        | arg_max(o_orderstatus, o_orderkey) AS latest_status,
        | arg_min(o_orderstatus, o_orderkey) AS first_status,
        | round(arg_max(o_totalprice, o_orderkey), 2) AS latest_price,
        | round(max(o_totalprice), 2) AS max_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "scalar_map_props" ->
      """SELECT k AS key, count(*) AS n,
        | CAST(sum(CAST(json_extract_string(props, '$.' || k) AS INT)) AS BIGINT) AS sum_val
        |FROM (SELECT unnest(json_keys(props)) AS k, props FROM events)
        |GROUP BY key ORDER BY key""".stripMargin,
    "scalar_hof_quantifiers" ->
      """SELECT vec_id,
        | len(list_filter(embedding, x -> x > 0.2)) AS n_big,
        | len(list_filter(embedding, x -> x > 0.2)) > 0 AS has_big,
        | len(list_filter(embedding, x -> abs(x) < 1.0)) = len(embedding) AS all_unit
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "win_range_frame" ->
      """SELECT event_id, user_id,
        | round(sum(value) OVER w, 2) AS sum_5back,
        | count(*) OVER w AS n_5back
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "scalar_casts" ->
      """SELECT o_orderkey,
        | CAST(o_orderkey AS DOUBLE) AS key_dbl,
        | CAST(o_orderkey AS VARCHAR) AS key_str,
        | CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
        | TRY_CAST(o_orderstatus AS BIGINT) AS bad_cast,
        | CAST(o_custkey AS INT) AS cust_int
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "agg_stats_summary" ->
      """SELECT event_type,
        | round(stddev_samp(value), 4) AS sd_value,
        | round(var_samp(value), 4) AS var_value,
        | round(corr(value, CAST(user_id AS DOUBLE)), 4) + 0.0 AS corr_vu,
        | round(covar_samp(value, CAST(user_id AS DOUBLE)), 4) + 0.0 AS covar_vu,
        | round(quantile_cont(value, 0.5), 4) AS median_value,
        | round(quantile_cont(value, 0.9), 4) AS p90_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "agg_collect" ->
      """SELECT user_id,
        | array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_csv,
        | array_to_string(list_transform(list_sort(list(round(value, 2))),
        |   x -> printf('%.2f', x + 0.0)), ',') AS values_csv,
        | count(*) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "pivot_event_counts" ->
      """SELECT user_id,
        | count(*) FILTER (event_type = 'click') AS click,
        | count(*) FILTER (event_type = 'error') AS error,
        | count(*) FILTER (event_type = 'purchase') AS purchase,
        | count(*) FILTER (event_type = 'signup') AS signup,
        | count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "win_cumulative_share" ->
      """WITH m AS (SELECT CAST(c.c_nationkey AS BIGINT) AS nationkey,
        |   strftime(CAST(o.o_orderdate AS DATE), '%Y-%m') AS month,
        |   CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |     AS rev_c
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        | t AS (SELECT nationkey, CAST(sum(rev_c) AS BIGINT) AS tot_c
        |  FROM m GROUP BY 1),
        | w AS (SELECT m.*, CAST(sum(rev_c) OVER (PARTITION BY nationkey
        |    ORDER BY month) AS BIGINT) AS cum_c FROM m)
        |SELECT w.nationkey, w.month, w.rev_c, w.cum_c,
        | CAST((10000 * w.cum_c) // t.tot_c AS BIGINT) AS cum_bp
        |FROM w JOIN t ON w.nationkey = t.nationkey
        |ORDER BY w.nationkey, w.month""".stripMargin,
    "audit_key_inversions" ->
      """WITH o AS (SELECT o_custkey, o_orderkey,
        |   CAST(o_orderdate AS DATE) AS day FROM orders)
        |SELECT a.o_custkey, CAST(count(*) AS BIGINT) AS n_pairs,
        | CAST(sum(CASE WHEN a.day > b.day THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_inversions
        |FROM o a JOIN o b ON a.o_custkey = b.o_custkey
        |  AND a.o_orderkey < b.o_orderkey
        |GROUP BY a.o_custkey
        |HAVING sum(CASE WHEN a.day > b.day THEN 1 ELSE 0 END) > 0
        |ORDER BY a.o_custkey""".stripMargin,
    "pivot_share_matrix" ->
      """WITH j AS (SELECT c.c_nationkey, o.o_orderpriority
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        | g AS (SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n,
        |   CAST(count(*) FILTER (o_orderpriority = '1-URGENT') AS BIGINT) AS c0,
        |   CAST(count(*) FILTER (o_orderpriority = '2-HIGH') AS BIGINT) AS c1,
        |   CAST(count(*) FILTER (o_orderpriority = '3-MEDIUM') AS BIGINT) AS c2,
        |   CAST(count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS c3,
        |   CAST(count(*) FILTER (o_orderpriority = '5-LOW') AS BIGINT) AS c4
        |  FROM j GROUP BY 1)
        |SELECT CAST(c_nationkey AS BIGINT) AS nationkey, n,
        | CAST((10000 * c0) // n AS BIGINT) AS bp0,
        | CAST((10000 * c1) // n AS BIGINT) AS bp1,
        | CAST((10000 * c2) // n AS BIGINT) AS bp2,
        | CAST((10000 * c3) // n AS BIGINT) AS bp3,
        | CAST((10000 * c4) // n AS BIGINT) AS bp4
        |FROM g ORDER BY nationkey""".stripMargin,
    "win_next_order_gap" ->
      """WITH o AS (SELECT o_custkey, o_orderkey,
        |   CAST(o_orderdate AS DATE) AS day FROM orders),
        | g AS (SELECT o_custkey, o_orderkey, day,
        |    lead(day) OVER (PARTITION BY o_custkey
        |      ORDER BY day, o_orderkey) AS next_day
        |  FROM o)
        |SELECT o_custkey, o_orderkey, strftime(day, '%Y-%m-%d') AS day,
        | CAST(coalesce(datediff('day', day, next_day), -1) AS BIGINT) AS gap_days
        |FROM g ORDER BY o_custkey, day, o_orderkey""".stripMargin,
    "win_analytics" ->
      """SELECT event_id, user_id,
        | ntile(4) OVER b AS quartile,
        | round(percent_rank() OVER b, 6) AS pct_rank,
        | round(cume_dist() OVER b, 6) AS cume,
        | round(first_value(value) OVER f, 2) AS first_value,
        | round(last_value(value) OVER f, 2) AS last_value,
        | round(nth_value(value, 2) OVER f, 2) AS second_value
        |FROM events
        |WINDOW b AS (PARTITION BY user_id ORDER BY event_id),
        |       f AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY event_id""".stripMargin,
    "scalar_string_ext" ->
      """SELECT p_partkey,
        | lpad(p_brand, 12, '*') AS padded,
        | rpad(p_brand, 12, '.') AS rpadded,
        | translate(p_type, 'aeiou', 'AEIOU') AS caps_vowels,
        | repeat(p_brand, 2) AS doubled,
        | reverse(p_name) AS reversed,
        | left(p_name, 6) AS l6,
        | right(p_name, 4) AS r4,
        | strpos(p_name, 'o') AS first_o,
        | coalesce(regexp_extract(p_name, '[0-9]+'), '') AS digits,
        | levenshtein(p_brand, 'Brand#0') AS lev
        |FROM part ORDER BY p_partkey""".stripMargin,
    "scalar_date_ext" ->
      """SELECT o_orderkey,
        | quarter(o_orderdate) AS qtr,
        | dayofyear(o_orderdate) AS doy,
        | weekofyear(o_orderdate) AS woy,
        | date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch_start,
        | CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        | strftime(make_date(CAST(year(o_orderdate) AS INT), CAST(month(o_orderdate) AS INT), 1), '%Y-%m-%d') AS month_floor
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "scalar_conditional" ->
      """SELECT l_orderkey, l_linenumber,
        | round(coalesce(nullif(l_discount, 0.0), -1.0), 4) AS disc_or_neg1,
        | CASE WHEN l_quantity > 25 THEN 'bulk' WHEN l_quantity > 10 THEN 'mid' ELSE 'small' END AS qty_band,
        | (l_returnflag = 'R') AS is_return,
        | round(CASE WHEN l_tax > l_discount THEN l_tax ELSE l_discount END, 4) AS max_rate_if
        |FROM lineitem WHERE l_orderkey < 300 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "join_cross_regions" ->
      """SELECT a.r_name AS name_a, b.r_name AS name_b
        |FROM region a CROSS JOIN region b ORDER BY name_a, name_b""".stripMargin,
    "join_left_outer_counts" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        | round(coalesce(sum(o_totalprice), 0.0), 2) AS spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        | AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00' AND TIMESTAMP '1995-03-31 23:59:59'
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "join_full_outer_years" ->
      """WITH y95 AS (SELECT o_custkey AS ck95, count(*) AS n95 FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1),
        | y96 AS (SELECT o_custkey AS ck96, count(*) AS n96 FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1)
        |SELECT coalesce(ck95, ck96) AS custkey, coalesce(n95, 0) AS n95, coalesce(n96, 0) AS n96
        |FROM y95 FULL OUTER JOIN y96 ON ck95 = ck96 ORDER BY custkey""".stripMargin,
  )
}
