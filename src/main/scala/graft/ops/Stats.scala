package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Num.roundNorm
import graft.io.Checkpoints.PinOps
import graft.io.Sources

/** Exact distributed evaluation statistics — the model-quality and
  * distribution-shape measures a curation pipeline computes over the
  * WHOLE corpus, not a sample: ROC-AUC as the Mann-Whitney rank
  * statistic, the Gini concentration coefficient, and Spearman rank
  * correlation. All three are rank statistics, i.e. exactly the class
  * naive implementations sort globally for — here each one reduces to
  * a keyed aggregate plus one [[Prefix]] two-pass running sum, so no
  * single-partition sort of corpus-sized data ever exists and every
  * intermediate is an exact integer both engines replay bit-for-bit
  * (reference analogue: the pandas `Series.rank`/`corr` post-processing
  * in `utils.py` — recomputed here as distributed plans).
  *
  * Scale notes: the rank products are Long; with per-key counts beyond
  * ~3e9 the `pos*neg` cross terms need DECIMAL — documented at each
  * site rather than paid on every row at today's scales.
  */
object Stats {

  /** Exact ROC-AUC (`ml_auc_exact`) of an integer score against a
    * deterministic planted label, via the tie-aware Mann-Whitney U:
    *
    *   AUC = [ Σ_s pos_s·negBelow_s + ½·Σ_s pos_s·neg_s ] / (P·N)
    *
    * summed over DISTINCT score values s — the per-row global sort a
    * textbook AUC does collapses to a groupBy(score) + one running sum
    * of negatives in score order ([[Prefix]]: distributed range
    * partition, never a single-partition window). Everything up to the
    * final division is Long (`u2 = 2·ΣposᐧnegBelow + Σpos·neg` is
    * emitted as an exact gate column); the label is a Knuth-hash
    * uniform thresholded by a score-dependent integer cut, so both
    * engines derive identical supervision with pure integer arithmetic.
    * Long bound: u2 < 2·P·N — overflows past P·N ≈ 4.6e18 (P,N ≈ 2e9);
    * past [[AucLongBound]] rows the cross terms BRANCH to
    * DECIMAL(38,0) ([[aucFromByScore]] `wide` — gated by a
    * metadata-cheap cached source count, property-tested at planted
    * >2³¹ per-side counts in StatsSpec), the same count-gated widening
    * as the KS lattice — the 100 TB claim held by code, not by a
    * doc-comment.
    */
  /** (cents, label) rows with the planted Knuth-hash teacher label —
    * shared by the AUC and ROC queries (and their oracles verbatim).
    */
  private[graft] def plantedScores(s: SparkSession, d: String): DataFrame =
    Sources.orders(s, d).select(
      round(col("o_totalprice") * 100).cast("long").as("cents"),
      col("o_orderkey"))
      .withColumn("u", pmod(col("o_orderkey") * lit(2654435761L), lit(4294967296L)) % 1000000L)
      .withColumn("label",
        (col("u") < least(lit(100000L) + expr("cents div 100"), lit(900000L))).cast("long"))

  def aucExact(s: SparkSession, d: String): DataFrame = {
    val scored = plantedScores(s, d)
    val byScore = scored.groupBy("cents").agg(
      sum(col("label")).as("pos"),
      sum(lit(1L) - col("label")).as("neg"))
    // orders row count bounds P+N; the cached parquet count is
    // metadata-cheap and construction stays job-free after first call
    val wide = graft.io.CorpusStats.rowCount(s, d, "orders") > AucLongBound
    aucFromByScore(byScore, wide)
  }

  /** Per-side row bound for the Long U lattice: u2 = 2·Σpos·negBelow +
    * Σpos·neg < 2·P·N, so Long (< 9.22e18) is exact while P·N < 4.6e18
    * — both sides under ~2.1e9 rows; 2e9 leaves margin.
    */
  private[graft] val AucLongBound = 2000000000L

  /** The tie-aware Mann-Whitney reduction over per-distinct-score
    * (cents, pos, neg) counts — shared by the fixture query and the
    * wide-count property test. `wide=false` keeps the exact Long
    * lattice (the fixture/oracle path, expression bit-identical to the
    * pre-branch query); `wide=true` lifts the cross terms to
    * DECIMAL(38,0) — good to P·N < 1e38/2. The shipped schema is
    * IDENTICAL in both branches: a count-gated lattice choice must not
    * change the table a consumer reads, so the exact-integer gate
    * column `u2` — which genuinely exceeds Int64 in the wide regime —
    * ships as its decimal-string rendering (the Int64-in-JSON
    * interchange discipline) from both lattices, and only the internal
    * arithmetic widens.
    */
  private[graft] def aucFromByScore(byScore: DataFrame, wide: Boolean): DataFrame = {
    def w(c: Column): Column = if (wide) c.cast("decimal(38,0)") else c
    val run = Prefix.running(byScore, Seq(col("cents")),
      sums = Seq((col("neg"), "cumneg")))
    run.agg(
        sum("pos").as("n_pos"),
        sum("neg").as("n_neg"),
        sum(w(col("pos")) * w(col("cumneg") - col("neg")) * 2 +
          w(col("pos")) * w(col("neg"))).as("u2i"))
      .select(col("n_pos"), col("n_neg"),
        col("u2i").cast("string").as("u2"),
        if (wide)
          // double-cast every factor: n_pos·n_neg itself overflows Long
          // past ~3e9 per side, which is the regime this branch serves
          roundNorm(col("u2i").cast("double") /
            (col("n_pos").cast("double") * col("n_neg").cast("double") * 2.0), 6).as("auc")
        else
          roundNorm(col("u2i") / (col("n_pos") * col("n_neg") * 2.0), 6).as("auc"))
  }

  /** Per-segment Gini coefficient (`agg_gini_segment`) of customer
    * revenue — how concentrated spend is inside each market segment,
    * the same statistic used to decide whether a domain's token counts
    * are dominated by a few hosts. Closed form over ascending x with
    * 1-based index i:  G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx).
    * The global index comes from one [[Prefix]] rank over
    * (segment, cents, custkey); segments are contiguous in that order,
    * so the per-segment index is the global rank minus the segment's
    * start offset (one keyed aggregate + broadcast-back), exactly the
    * weighted-median trick — no per-segment repartition, no global
    * sort. Long bound: `Σ i·x_i ≤ n·Σx` and the assembly's doubled /
    * `(n+1)·Σx` products cap the exact-Long regime at
    * 2·(n+1)·Σx < 9.2e18 — about 4e6 customers per segment at ~$5k
    * average spend. The gate is DATA-DERIVED (cached corpus count ×
    * cached corpus cent sum — see the inline note), so a spend-skewed
    * corpus flips to the DECIMAL(38,0) lattice exactly when the bound
    * demands ([[giniFromCustomerRevenue]] `wide`, property-tested at
    * planted magnitudes whose products exceed Long against a BigInt
    * reference) — exact to n·Σx < 1e38, i.e. ~1e18 customers at the
    * same spend.
    */
  def giniBySegment(s: SparkSession, d: String): DataFrame = {
    val rev = Sources.orders(s, d)
      .select(col("o_custkey"), round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy("o_custkey").agg(sum("cents").as("x"))
    val seg = Sources.customer(s, d).select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    // DATA-DERIVED lattice gate — unlike the AUC/KS/Spearman gates
    // (rigorous pure-count bounds), the Long Gini lattice's overflow
    // condition involves the data's magnitudes, not just n: the largest
    // narrow-branch intermediate is 2·six ≤ 2·n·Σx, and per-segment
    // n_s ≤ n, Σx_s ≤ Σx(corpus), so `2·(n+1)·Σcents ≤ Long.MaxValue`
    // over the WHOLE corpus rigorously bounds every segment. Both
    // factors come from CorpusStats (one cached metadata count + one
    // cached single-column scan), so a spend-skewed corpus flips wide
    // exactly when the exact-integer bound demands it — no assumed
    // per-customer spend ceiling anywhere.
    val n = BigInt(graft.io.CorpusStats.rowCount(s, d, "customer"))
    val totCents = graft.io.CorpusStats.columnSum(
      s, d, "orders", "cast(round(o_totalprice * 100) as decimal(38,0))")
    val wide = 2 * (n + 1) * totCents > BigInt(Long.MaxValue)
    giniFromCustomerRevenue(rev.join(seg, "o_custkey"), wide)
  }

  /** The per-segment Gini reduction over (c_mktsegment, x,
    * o_custkey) customer-revenue rows — shared by the fixture query
    * and the wide-count property test. `wide=false` is the exact Long
    * lattice, expression-identical to the pre-branch query. The
    * shipped schema is IDENTICAL in both branches (count-gated
    * widening must never change the table a consumer reads): Σx is
    * accumulated in DECIMAL(38,0) in BOTH branches — exact at any
    * magnitude, one extra aggregate column on the narrow path — and
    * `total_cents` ships as its decimal-string rendering (the
    * Int64-in-JSON interchange discipline; the planted-wide regime
    * admits Σx past Int64). Only the rank·value lattice widens.
    */
  private[graft] def giniFromCustomerRevenue(rows: DataFrame, wide: Boolean): DataFrame = {
    def w(c: Column): Column = if (wide) c.cast("decimal(38,0)") else c
    val ranked = Prefix.running(
      rows,
      Seq(col("c_mktsegment"), col("x"), col("o_custkey")),
      rankOut = Some("grank"))
    val off = ranked.groupBy("c_mktsegment").agg(min(col("grank") - 1).as("off"))
    // narrow re-reads Σx as Long for the bit-exact oracle lattice; the
    // gate in [[giniBySegment]] guarantees 2·(n+1)·Σx ≤ Long.MaxValue
    // corpus-wide, so the cast cannot overflow on the narrow path
    val tc: Column = if (wide) col("tcd") else col("tcd").cast("long")
    ranked.join(broadcast(off), "c_mktsegment")
      .withColumn("i", col("grank") - col("off"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("x").cast("decimal(38,0)")).as("tcd"),
        sum(w(col("i")) * w(col("x"))).as("six"))
      .select(col("c_mktsegment"), col("n_customers"),
        col("tcd").cast("string").as("total_cents"),
        roundNorm(
          (col("six") * 2 - (w(col("n_customers")) + 1) * tc)
            .cast("double") /
            (w(col("n_customers")) * tc).cast("double"), 6).as("gini"))
      .orderBy("c_mktsegment")
  }

  /** Spearman rank correlation (`agg_spearman`) between part size and
    * retail price, tie-aware (midranks). Midranks are built WITHOUT a
    * per-row global sort: groupBy(value) → counts, one [[Prefix]]
    * running sum in value order gives each distinct value's cumulative
    * count, and `2·midrank = 2·cum − cnt + 1` stays integer. Rows get
    * their ranks back by an equi-join on the value (distinct-value
    * table, shuffle-joined — never collected). The correlation itself
    * is assembled from the SIX exact integer power sums via the closed
    * form, so both engines perform the identical final float ops on
    * identical integers — the rounded value cannot straddle engines.
    *
    * This is the TIGHTEST Long bound in the module: doubled midranks
    * reach 2n, so `sx·sy ≤ 4n⁴` and `n·sxx ≤ 4n⁴` — Long overflows at
    * n ≈ 3.9e4 ROWS, i.e. barely past the sf0.1 fixture, not at some
    * remote exabyte scale. Past [[SpearmanLongBound]] rows the power
    * sums and the closed-form assembly BRANCH to DECIMAL(38,0)
    * ([[spearmanFromPairs]] `wide`, gated by a cached metadata count,
    * property-tested at n > the Long bound against a BigInt
    * reference) — exact to 4n⁴ < 1e38, n ≈ 1.2e9 rows; a deployment
    * beyond that splits the power sums or moves to 256-bit.
    */
  def spearman(s: SparkSession, d: String): DataFrame = {
    val t = Sources.part(s, d).select(
      col("p_size").cast("long").as("xv"),
      round(col("p_retailprice") * 100).cast("long").as("yv"))
    val wide = graft.io.CorpusStats.rowCount(s, d, "part") > SpearmanLongBound
    spearmanFromPairs(t, wide)
  }

  /** Row bound for the Long closed-form lattice: 4n⁴ ≤ 9.2e18 holds to
    * n ≈ 3.9e4; 3e4 leaves margin.
    */
  private[graft] val SpearmanLongBound = 30000L

  /** The tie-aware Spearman reduction over (xv, yv) value pairs —
    * shared by the fixture query and the wide-count property test.
    * `wide=false` is the exact Long lattice, expression-identical to
    * the pre-branch query; `wide=true` lifts the power sums and the
    * closed-form products to DECIMAL(38,0).
    */
  private[graft] def spearmanFromPairs(t: DataFrame, wide: Boolean): DataFrame = {
    def w(c: Column): Column = if (wide) c.cast("decimal(38,0)") else c

    def rank2(col0: String): DataFrame = {
      val g = t.groupBy(col0).agg(count(lit(1)).as("cnt"))
      Prefix.running(g, Seq(col(col0)), sums = Seq((col("cnt"), "cum")))
        .select(col(col0), (col("cum") * 2 - col("cnt") + 1).as(s"r_$col0"))
    }

    val withRanks = t
      .join(rank2("xv"), "xv")
      .join(rank2("yv"), "yv")
    withRanks.agg(
        count(lit(1)).as("n"),
        sum(w(col("r_xv"))).as("sx"), sum(w(col("r_yv"))).as("sy"),
        sum(w(col("r_xv")) * w(col("r_xv"))).as("sxx"),
        sum(w(col("r_yv")) * w(col("r_yv"))).as("syy"),
        sum(w(col("r_xv")) * w(col("r_yv"))).as("sxy"))
      .select(col("n"),
        roundNorm(
          ((w(col("n")) * col("sxy") - col("sx") * col("sy")).cast("double")) /
            (sqrt((w(col("n")) * col("sxx") - col("sx") * col("sx")).cast("double")) *
              sqrt((w(col("n")) * col("syy") - col("sy") * col("sy")).cast("double"))), 6)
          .as("spearman_rho"))
  }

  /** Percentile-rank normalization (`text_length_pct_rank`): each
    * document's corpus-wide length percentile in integer basis points —
    * the rank-normalize step a curation pipeline applies before
    * mixing heterogeneous quality signals (rank features are robust to
    * arbitrary monotone distortions of the raw score). The global rank
    * is one [[Prefix]] two-pass pass (distributed range partition,
    * never a single-partition window); the corpus count attaches as a
    * sanctioned 1-row broadcast; `pct = 10000·(rank−1) div (n−1)` is
    * integer floor math, identical in both engines.
    */
  def lengthPctRank(s: SparkSession, d: String): DataFrame = {
    val docs = Sources.documents(s, d).select("doc_id", "n_chars")
    val ranked = Prefix.running(docs,
      Seq(col("n_chars"), col("doc_id")), rankOut = Some("rk"))
    ranked.crossJoin(broadcast(docs.agg(count(lit(1)).as("n"))))
      .select(col("doc_id"), col("n_chars"),
        expr("(10000 * (rk - 1)) div (n - 1)").as("pct_bp"))
      .orderBy("doc_id")
  }

  /** ROC operating points (`ml_roc_curve`): TP/FP and basis-point
    * TPR/FPR at 19 equally spaced score thresholds between the min and
    * max observed score — the threshold-sweep a deployment runs to pick
    * an operating point once AUC says the scorer works at all. Same
    * planted integer teacher as [[aucExact]], so every count and the
    * bp rates are exact Longs: the sweep reduces the corpus ONCE to
    * |distinct scores| rows, then evaluates all 19 thresholds against
    * that bounded table via a 19-row broadcast — one conditional
    * aggregate, not 19 scans.
    */
  def rocCurve(s: SparkSession, d: String): DataFrame = {
    val byScore = plantedScores(s, d).groupBy("cents").agg(
      sum(col("label")).as("pos"), sum(lit(1L) - col("label")).as("neg"))
    val th = byScore
      .agg(min("cents").as("mn"), max("cents").as("mx"),
        sum("pos").as("np"), sum("neg").as("nn"))
      .select(explode(array((1 to 19).map(lit(_)): _*)).as("j"),
        col("mn"), col("mx"), col("np"), col("nn"))
      .select(col("j").cast("long").as("j"),
        (col("mn") + expr("j * (mx - mn) div 20")).as("t"), col("np"), col("nn"))
    byScore.crossJoin(broadcast(th))
      .groupBy("j", "t", "np", "nn")
      .agg(sum(when(col("cents") >= col("t"), col("pos")).otherwise(0L)).as("tp"),
        sum(when(col("cents") >= col("t"), col("neg")).otherwise(0L)).as("fp"))
      .select(col("j"), col("t").as("threshold_cents"), col("tp"), col("fp"),
        expr("(10000 * tp) div np").as("tpr_bp"),
        expr("(10000 * fp) div nn").as("fpr_bp"))
      .orderBy("j")
  }

  /** Precision–recall operating points (`ml_pr_curve`) — the curve
    * that matters when positives are rare (ROC flatters imbalanced
    * classifiers; a curation gate tunes its threshold on precision).
    * Same reduced machinery as [[rocCurve]]: the corpus collapses ONCE
    * to |distinct scores| rows, 19 lattice thresholds broadcast, and
    * precision/recall/F1 are exact integer basis points (`div` on
    * exact counts — no float threshold, no sum-order anywhere). A
    * threshold above the max score predicts nothing; its precision is
    * reported as NULL (0/0) rather than a fake 0, mirrored in the
    * oracle.
    */
  def prCurve(s: SparkSession, d: String): DataFrame = {
    val byScore = plantedScores(s, d).groupBy("cents").agg(
      sum(col("label")).as("pos"), sum(lit(1L) - col("label")).as("neg"))
    val th = byScore
      .agg(min("cents").as("mn"), max("cents").as("mx"), sum("pos").as("np"))
      .select(explode(array((1 to 19).map(lit(_)): _*)).as("j"),
        col("mn"), col("mx"), col("np"))
      .select(col("j").cast("long").as("j"),
        (col("mn") + expr("j * (mx - mn) div 20")).as("t"), col("np"))
    byScore.crossJoin(broadcast(th))
      .groupBy("j", "t", "np")
      .agg(sum(when(col("cents") >= col("t"), col("pos")).otherwise(0L)).as("tp"),
        sum(when(col("cents") >= col("t"), col("neg")).otherwise(0L)).as("fp"))
      .select(col("j"), col("t").as("threshold_cents"), col("tp"), col("fp"),
        when(col("tp") + col("fp") > 0,
          expr("(10000 * tp) div (tp + fp)")).as("precision_bp"),
        expr("(10000 * tp) div np").as("recall_bp"),
        when(col("tp") > 0,
          expr("(20000 * tp) div (2 * tp + fp + (np - tp))")).otherwise(0L)
          .as("f1_bp"))
      .orderBy("j")
  }

  /** Theil T inequality index per segment (`agg_theil_segment`) —
    * `T = Σ (x_i/X)·ln(n·x_i/X)` over customer spend: the decomposable
    * complement to [[giniBySegment]] (Theil is additively separable
    * into within/between components; Gini is not). No global rank
    * needed — unlike Gini this is one keyed aggregate. Each customer's
    * term is a deterministic double from exact integers, snapped to the
    * 1e-9 lattice and SUMMED AS BIGINT (the Cramér's-V discipline —
    * a double Σ over customers is partition-order-dependent); T then
    * derives from one cast. Segment totals attach by broadcast.
    * Zero-spend customers contribute 0 (lim x→0 of x·ln x), mirrored
    * in the oracle's CASE.
    */
  def theilBySegment(s: SparkSession, d: String): DataFrame = {
    val rev = Sources.orders(s, d)
      .select(col("o_custkey"), round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy("o_custkey").agg(sum("cents").as("x"))
      .join(Sources.customer(s, d)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")), "o_custkey")
    val tot = rev.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum("x").as("xs"))
    rev.join(broadcast(tot), "c_mktsegment")
      .withColumn("t_e9", when(col("x") > 0, round(expr(
        "1e9 * (cast(x as double) / xs) * ln(n * (cast(x as double) / xs))"))
        .cast("long")).otherwise(0L))
      .groupBy("c_mktsegment")
      .agg(first("n").as("n_customers"), first("xs").as("total_cents"),
        sum("t_e9").as("theil_e9"))
      .withColumn("theil", roundNorm(expr("theil_e9 / 1e9"), 6))
      .orderBy("c_mktsegment")
  }

  /** Robust location estimates per return flag (`agg_trimmed_mean`):
    * the 10 %-trimmed mean AND the 10 %-winsorized mean of the
    * extended price, computed WITHOUT any row-level sort — the same
    * value-histogram discipline as [[aucExact]]: one groupBy(flag,
    * cents) histogram pass, then per-flag running counts over the
    * DISTINCT price values (a histogram-sized window, never the
    * corpus), and each histogram cell contributes
    * `overlap([cumBefore+1, cumBefore+cnt], [k+1, n−k])` kept rows.
    * Ties need no tie-break at all — trimming is value-based, so equal
    * prices at the cut split a cell arithmetically. Winsorizing reuses
    * the same running counts to find the two clamp values (the cells
    * holding global ranks k+1 and n−k) and adds k of each back. All
    * sums are exact cents; the two means divide identical integers in
    * the identical order in both engines.
    */
  def trimmedMean(s: SparkSession, d: String): DataFrame = {
    val h = Sources.lineitem(s, d)
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .groupBy("l_returnflag", "cents")
      .agg(count(lit(1)).as("cnt"))
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy("l_returnflag").orderBy("cents")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("l_returnflag")
    val cells = h
      .withColumn("cum_before", coalesce(sum("cnt").over(wOrd), lit(0L)))
      .withColumn("n", sum("cnt").over(wAll))
      .withColumn("k", expr("n div 10"))
      .withColumn("kept", greatest(lit(0L),
        least(col("cum_before") + col("cnt"), col("n") - col("k"))
          - greatest(col("cum_before") + 1, col("k") + 1) + 1))
    val agg = cells.groupBy("l_returnflag")
      .agg(max("n").as("n_total"), max("k").as("k"),
        sum(col("kept") * col("cents")).as("trim_sum_c"),
        sum("kept").as("n_kept"),
        // clamp values: the cells holding global ranks k+1 and n-k
        max(when(col("cum_before") < col("k") + 1 &&
          col("k") + 1 <= col("cum_before") + col("cnt"), col("cents"))).as("lo_c"),
        max(when(col("cum_before") < col("n") - col("k") &&
          col("n") - col("k") <= col("cum_before") + col("cnt"), col("cents"))).as("hi_c"))
    agg
      .withColumn("winsor_sum_c",
        col("trim_sum_c") + col("k") * (col("lo_c") + col("hi_c")))
      .select(col("l_returnflag"), col("n_total"), col("n_kept"),
        col("lo_c"), col("hi_c"), col("trim_sum_c"), col("winsor_sum_c"),
        roundNorm(col("trim_sum_c").cast("double") / col("n_kept") / 100, 4)
          .as("trimmed_mean"),
        roundNorm(col("winsor_sum_c").cast("double") / col("n_total") / 100, 4)
          .as("winsor_mean"))
      .orderBy("l_returnflag")
  }

  /** Proportional allocation with largest-remainder rounding
    * (`agg_largest_remainder`): 10 000 basis points split across
    * nations proportional to exact order-revenue cents — floor shares
    * first, then the leftover points go to the largest scaled
    * remainders (ties to the smaller nation key). The classic
    * apportionment method (Hamilton/Hare); the allocation is over the
    * POST-AGGREGATE nation table (25 rows), so the single global
    * window is model-sized by construction; everything before it is
    * one join + keyed aggregate. Exact integers end-to-end:
    * base = (10⁴·rev) div total, remainder = 10⁴·rev − base·total.
    */
  def largestRemainder(s: SparkSession, d: String): DataFrame = {
    val rev = Sources.orders(s, d)
      .select(col("o_custkey"), round(col("o_totalprice") * 100).cast("long").as("cents"))
      .join(Sources.customer(s, d)
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey")), "o_custkey")
      .groupBy("c_nationkey").agg(sum("cents").as("rev_c"))
    val tot = rev.agg(sum("rev_c").as("total_c"))
    val based = rev.crossJoin(broadcast(tot))
      .withColumn("base_bps", expr("(10000 * rev_c) div total_c"))
      .withColumn("rem", lit(10000) * col("rev_c") - col("base_bps") * col("total_c"))
    val leftover = based.groupBy()
      .agg((lit(10000L) - sum("base_bps")).as("leftover"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col("c_nationkey").asc)
    based.crossJoin(broadcast(leftover))
      .withColumn("rk", row_number().over(w).cast("long"))
      .select(col("c_nationkey"), col("rev_c"), col("base_bps"),
        (col("base_bps") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
          .as("bps"))
      .orderBy("c_nationkey")
  }

  /** Kernel density estimate on a FROZEN evaluation grid
    * (`stats_kde_grid`): order totals (whole dollars) smoothed with the
    * Epanechnikov kernel K(u) ∝ 1 − u² at bandwidth H = 25 000 $,
    * evaluated at the 41 published grid points g = 12 500·j — the
    * standard distribution-shape diagnostic, in the frozen-basis
    * discipline so the whole computation sits under the hash gate. The
    * kernel is kept INTEGER: w(x, g) = max(0, H² − (x − g)²) — the
    * unnormalized Epanechnikov numerator — so `kde_num(g) = Σ_x w` is
    * exact BIGINT arithmetic identical in both engines; density needs
    * only the published constant factor (3/(4H³·n)), which a consumer
    * applies outside. Plan: one broadcast of the 41-row grid against
    * the corpus scan (fan-out bounded by |grid|, a published constant),
    * kernel-support filter, one keyed agg. Lattice headroom: w ≤ H² =
    * 6.25e8, so Σ fits BIGINT to ~10⁹ in-support rows per point; a
    * 10¹²-row corpus re-scales dollars→10-dollar units (same plan).
    */
  def kdeGrid(s: SparkSession, d: String): DataFrame = {
    val h = 25000L // bandwidth, whole dollars
    val grid = s.range(0, 41).select((col("id") * 12500L).as("g"))
    val x = Sources.orders(s, d)
      .select(round(col("o_totalprice")).cast("long").as("x"))
    x.crossJoin(broadcast(grid))
      .filter(abs(col("x") - col("g")) < h)
      .withColumn("w", lit(h * h) - (col("x") - col("g")) * (col("x") - col("g")))
      .groupBy("g")
      .agg(count(lit(1)).as("n_support"), sum("w").as("kde_num"))
      .orderBy("g")
  }

  /** Mann-Whitney U (`stats_mann_whitney`, r13): the rank-sum test
    * between urgent ('1-URGENT') and low ('5-LOW') order totals — the
    * nonparametric two-sample location test [[Audit.welchTtest]]'s
    * normality assumption can't cover. Midranks stay EXACT integers on
    * the doubled lattice (2·midrank = 2·cum − cnt + 1, the
    * [[spearman]] rank2 machinery: value-keyed counts + one Prefix
    * pass — never a global window), so 2U_A = Σ_A cnt_a·r2 −
    * n_A(n_A+1) and the identity 2U_A + 2U_B = 2·n_A·n_B are BIGINT
    * gate columns; the tie correction ΣT = Σ(t³−t) is exact too. Only
    * the z finish (normal approximation, no continuity correction —
    * documented, mirrored) casts to double once, rounded 4.
    */
  def mannWhitney(s: SparkSession, d: String): DataFrame = {
    val t = Sources.orders(s, d)
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(round(col("o_totalprice") * 100).cast("long").as("v"),
        (col("o_orderpriority") === "1-URGENT").as("is_a"))
    val g = t.groupBy("v").agg(
      sum(when(col("is_a"), 1L).otherwise(0L)).as("cnt_a"),
      sum(when(!col("is_a"), 1L).otherwise(0L)).as("cnt_b"),
      count(lit(1)).as("cnt"))
    val ranked = Prefix.running(g, Seq(col("v")), sums = Seq((col("cnt"), "cum")))
      .withColumn("r2", col("cum") * 2 - col("cnt") + 1)
    ranked.agg(
        sum("cnt_a").as("n_a"), sum("cnt_b").as("n_b"),
        sum(col("cnt_a") * col("r2")).as("r2_a"),
        sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("tie_term"))
      .select(col("n_a"), col("n_b"),
        (col("r2_a") - col("n_a") * (col("n_a") + 1)).as("u2_a"),
        (lit(2L) * col("n_a") * col("n_b") -
          (col("r2_a") - col("n_a") * (col("n_a") + 1))).as("u2_b"),
        col("tie_term"))
      .withColumn("z", {
        def D(c: Column): Column = c.cast("double")
        val n = col("n_a") + col("n_b")
        val varU = D(col("n_a")) * D(col("n_b")) / 12.0 *
          (D(n) + 1.0 - D(col("tie_term")) / (D(n) * (D(n) - 1.0)))
        roundNorm((D(col("u2_a")) / 2.0 - D(col("n_a")) * D(col("n_b")) / 2.0) /
          sqrt(varU), 4)
      })
  }

  /** Jensen-Shannon divergence by quantity bucket (`stats_jsd`, r13):
    * the symmetric, bounded drift measure between the returned ('R')
    * and accepted ('A') quantity distributions, emitted PER BUCKET
    * (the [[Audit.psiDrift]] discipline: per-row rounding is
    * deterministic; a global float sum over buckets would be
    * order-dependent across engines). Counts are exact BIGINTs; each
    * bucket's term ½p·ln(p/m) + ½q·ln(q/m) (m = (p+q)/2, zero terms
    * when the side is absent) runs the identical mirrored double
    * expression, rounded 6. One quantity-keyed conditional-count
    * aggregate + two 1-row attaches — map-side combinable.
    */
  def jsdBuckets(s: SparkSession, d: String): DataFrame = {
    val t = Sources.lineitem(s, d)
      .filter(col("l_returnflag").isin("R", "A"))
      .select(round(col("l_quantity")).cast("long").as("qty"),
        (col("l_returnflag") === "R").as("is_a"))
    val g = t.groupBy("qty").agg(
      sum(when(col("is_a"), 1L).otherwise(0L)).as("c_a"),
      sum(when(!col("is_a"), 1L).otherwise(0L)).as("c_b"))
    val tot = t.agg(
      sum(when(col("is_a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("is_a"), 1L).otherwise(0L)).as("n_b"))
    g.crossJoin(broadcast(tot))
      .withColumn("js_term", {
        def D(c: Column): Column = c.cast("double")
        val p = D(col("c_a")) / D(col("n_a"))
        val q = D(col("c_b")) / D(col("n_b"))
        val m = (p + q) / 2.0
        roundNorm(
          when(col("c_a") > 0, p / 2.0 * log(p / m)).otherwise(lit(0.0)) +
            when(col("c_b") > 0, q / 2.0 * log(q / m)).otherwise(lit(0.0)), 6)
      })
      .select(col("qty"), col("c_a"), col("c_b"), col("js_term"))
      .orderBy("qty")
  }

  /** Frozen learning curve (`ml_learning_curve_frozen`, r13): AUC of
    * the planted scorer on NESTED 25/50/75/100 % corpus prefixes —
    * the data-scaling diagnostic a curation pipeline runs before
    * buying more data ("is the ranker still improving with corpus
    * size?"). Prefix membership is a SECOND Knuth hash
    * (multiplier 2246822519, deliberately different from the label's
    * 2654435761 so band and label are uncorrelated) reduced mod 100 —
    * nested by construction (band < f). The whole sweep is ONE
    * corpus pass + ONE [[Prefix]] two-pass: the per-score table
    * carries 4 conditional (pos, neg) pairs, the running pass carries
    * 4 cumulative negatives (the aucBootstrap 16-replicate shape), and
    * each fraction's tie-aware doubled U assembles exactly as in
    * [[aucExact]] (Long-exact under [[AucLongBound]] per side). Output
    * stacks the 4 (frac, n_pos, n_neg, auc) rows.
    */
  def learningCurveFrozen(s: SparkSession, d: String): DataFrame = {
    val fracs = Seq(25L, 50L, 75L, 100L)
    val scored = plantedScores(s, d)
      .withColumn("band",
        pmod(col("o_orderkey") * lit(2246822519L), lit(4294967296L)) % 100L)
    val aggs = fracs.flatMap { f =>
      Seq(sum(when(col("band") < f && col("label") === 1, 1L).otherwise(0L))
          .as(s"pos_$f"),
        sum(when(col("band") < f && col("label") === 0, 1L).otherwise(0L))
          .as(s"neg_$f"))
    }
    val byScore = scored.groupBy("cents").agg(aggs.head, aggs.tail: _*)
    val run = Prefix.running(byScore, Seq(col("cents")),
      sums = fracs.map(f => (col(s"neg_$f"), s"cum_$f")))
    val finals = fracs.flatMap { f =>
      Seq(sum(col(s"pos_$f")).as(s"np_$f"), sum(col(s"neg_$f")).as(s"nn_$f"),
        sum(col(s"pos_$f") * ((col(s"cum_$f") - col(s"neg_$f")) * 2 +
          col(s"neg_$f"))).as(s"u2_$f"))
    }
    // pinned: the 4-row stack below fans out over this 1-row aggregate,
    // and without the pin each branch re-executes the corpus scan +
    // Prefix (measured 5.8 s -> the ts_drawdown multi-consumer class)
    val wide = graft.io.Checkpoints.pin(run.agg(finals.head, finals.tail: _*))
    fracs.map { f =>
      wide.select(lit(f).as("frac"), col(s"np_$f").as("n_pos"),
        col(s"nn_$f").as("n_neg"),
        roundNorm(col(s"u2_$f") /
          (col(s"np_$f") * col(s"nn_$f") * 2.0), 6).as("auc"))
    }.reduce(_.unionAll(_)).orderBy("frac")
  }

  /** Brown-Forsythe Levene test (`stats_levene_bf`, r13): the k-sample
    * VARIANCE-equality screen — the third member of the screening
    * family ([[anovaF]] = means, [[kruskalWallis]] = ranks, this =
    * spreads; ANOVA's equal-variance assumption is exactly what this
    * test checks). Brown-Forsythe centers on the per-group MEDIAN
    * (robust form): z = |x − med_g| with the LOWER median published as
    * the convention (min v whose running count reaches (n_g+1) div 2 —
    * an exact order statistic, no interpolation to diverge on), found
    * via a value-count table + a window PARTITIONED by the 5-group key
    * (value-domain input, never a global window). z re-scales to whole
    * dollars (z_d = z div 100) so Σz² stays < 2⁶³ to ~10¹⁰ rows (the
    * ANOVA bound), and the F assembly on z replays [[anovaF]]'s
    * lattice discipline verbatim: per-group between-terms rounded onto
    * the 10³ lattice BEFORE the cross-group sum, one mirrored division
    * for F. Plan: value-count agg + partitioned window + a 5-row
    * median broadcast back onto the scan + one keyed agg.
    */
  def leveneBf(s: SparkSession, d: String): DataFrame = {
    val t = Sources.orders(s, d)
      .select(col("o_orderpriority").as("grp"),
        round(col("o_totalprice") * 100).cast("long").as("v"))
    val vc = t.groupBy("grp", "v").agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("v")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val withCum = vc.withColumn("cum", sum("cnt").over(w))
    val nG = vc.groupBy("grp").agg(sum("cnt").as("n_g"))
    val med = withCum.join(broadcast(nG), Seq("grp"))
      .filter(col("cum") >= expr("(n_g + 1) div 2"))
      .groupBy("grp").agg(min("v").as("med_c"))
    val z = t.join(broadcast(med), Seq("grp"))
      .select(col("grp"), expr("abs(v - med_c) div 100").as("x"))
    val g = z.groupBy("grp").agg(
        count(lit(1)).as("n_g"), sum("x").as("s_g"))
      .withColumn("term", round(
        col("s_g").cast("double") * col("s_g").cast("double")
          / col("n_g").cast("double") / 1000.0, 0).cast("long"))
    val tot = z.agg(count(lit(1)).as("n_total"), sum("x").as("s_all"),
      sum(col("x") * col("x")).as("ssq"))
    g.agg(count(lit(1)).as("k_groups"), sum("term").as("bt"))
      .crossJoin(broadcast(tot))
      .withColumn("gt", round(
        col("s_all").cast("double") * col("s_all").cast("double")
          / col("n_total").cast("double") / 1000.0, 0).cast("long"))
      .withColumn("ssb_k", col("bt") - col("gt"))
      .withColumn("ssw_k",
        round(col("ssq").cast("double") / 1000.0, 0).cast("long") - col("bt"))
      .withColumn("f_stat", roundNorm(
        (col("ssb_k").cast("double") / (col("k_groups") - 1).cast("double")) /
          (col("ssw_k").cast("double") /
            (col("n_total") - col("k_groups")).cast("double")), 6))
      .select(col("k_groups"), col("n_total"), col("ssb_k"), col("ssw_k"),
        col("f_stat"))
  }

  /** Kruskal-Wallis H (`stats_kruskal_wallis`, r13): the k-sample RANK
    * test across all 5 order priorities — the nonparametric complement
    * to [[anovaF]] (same screening question, no normality assumption;
    * the k-group generalization of [[mannWhitney]], whose doubled-
    * midrank machinery it reuses verbatim). Ranks come from the cents
    * value-count table: one keyed agg to (value → per-group counts),
    * one [[Prefix]] two-pass for the running total, doubled midrank
    * r2 = 2·cum − cnt + 1 so midranks stay INTEGER under ties. Per-group
    * doubled rank sums r2_g = Σ c_g(v)·r2(v) and the tie term Σ(t³−t)
    * ship as exact BIGINTs; the per-group between-term (r2_g)²/(4·n_g)
    * is ONE mirrored double rounded onto a 10³ lattice per group BEFORE
    * the cross-group sum (the [[anovaF]] discipline — no engine-
    * dependent float accumulation), and H with the tie correction
    * divides once, rounded 6. r2_g ≤ 2·N² caps the exact lattice at
    * ~N = 3·10⁹ rows; past that, rank on a coarser value lattice (the
    * KDE re-scale rule). Plan: value-keyed agg + Prefix + a 5-row
    * conditional-sum aggregate — nothing wider than the value domain
    * shuffles after the scan.
    */
  def kruskalWallis(s: SparkSession, d: String): DataFrame = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val t = Sources.orders(s, d)
      .select(round(col("o_totalprice") * 100).cast("long").as("v"),
        col("o_orderpriority").as("grp"))
    val g = t.groupBy("v").agg(
      count(lit(1)).as("cnt"),
      prios.zipWithIndex.map { case (p, i) =>
        sum(when(col("grp") === p, 1L).otherwise(0L)).as(s"c$i")
      }: _*)
    val ranked = Prefix.running(g, Seq(col("v")), sums = Seq((col("cnt"), "cum")))
      .withColumn("r2", col("cum") * 2 - col("cnt") + 1)
    val aggs = Seq(
      sum("cnt").as("n_total"),
      sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("tie_term")) ++
      prios.indices.flatMap { i =>
        Seq(sum(col(s"c$i")).as(s"n_g$i"),
          sum(col(s"c$i") * col("r2")).as(s"r2_g$i"))
      }
    val wide = ranked.agg(aggs.head, aggs.tail: _*)
    // per-group between-term on the 10³ lattice BEFORE the cross-group sum
    val bt = prios.indices.map { i =>
      round(col(s"r2_g$i").cast("double") * col(s"r2_g$i").cast("double")
        / (col(s"n_g$i").cast("double") * 4000.0), 0).cast("long")
    }.reduce(_ + _)
    def D(c: Column): Column = c.cast("double")
    wide.withColumn("bt_k", bt)
      .withColumn("h_stat", {
        val n = D(col("n_total"))
        val h = lit(12.0) / (n * (n + lit(1.0))) * (D(col("bt_k")) * 1000.0) -
          lit(3.0) * (n + lit(1.0))
        val corr = lit(1.0) - D(col("tie_term")) / (n * n * n - n)
        roundNorm(h / corr, 6)
      })
      .select(Seq(col("n_total"), col("tie_term"), col("bt_k"), col("h_stat")) ++
        prios.indices.flatMap(i => Seq(col(s"n_g$i"), col(s"r2_g$i"))): _*)
  }

  /** One-way ANOVA F (`stats_anova_f`, r13): the k-sample mean-equality
    * test across order priorities on whole-dollar totals — the
    * parametric complement to [[mannWhitney]] (2-sample, rank) and
    * [[Audit.welchTtest]] (2-sample, unpooled): one statistic for "do
    * ANY of the k segments differ", the screening test run before any
    * pairwise drill-down. Lattice discipline: raw moments are exact
    * BIGINTs (Σx, Σx², n per group — whole dollars keep Σx² < 2⁶³ to
    * ~10¹⁰ rows; past that re-scale to 10-dollar units, the KDE rule);
    * each group's between-term S_g²/n_g is ONE mirrored double
    * expression rounded onto a 10³-dollar² lattice per group BEFORE the
    * cross-group sum — so the only float sums are over pre-rounded
    * integers and no engine-dependent accumulation order can leak into
    * the hash (the [[theilBySegment]] t_e9 discipline). SSB and SSW
    * ship as exact lattice BIGINTs; only F divides once, rounded 6.
    * Plan: one map-side-combinable keyed agg (k=5 groups) + one global
    * agg + a 1-row broadcast attach — no shuffle wider than k rows
    * after the scan.
    */
  def anovaF(s: SparkSession, d: String): DataFrame = {
    val t = Sources.orders(s, d)
      .select(col("o_orderpriority").as("grp"),
        round(col("o_totalprice")).cast("long").as("x"))
    val g = t.groupBy("grp").agg(
        count(lit(1)).as("n_g"), sum("x").as("s_g"))
      .withColumn("term", round(
        col("s_g").cast("double") * col("s_g").cast("double")
          / col("n_g").cast("double") / 1000.0, 0).cast("long"))
    val tot = t.agg(count(lit(1)).as("n_total"), sum("x").as("s_all"),
      sum(col("x") * col("x")).as("ssq"))
    g.agg(count(lit(1)).as("k_groups"), sum("term").as("bt"))
      .crossJoin(broadcast(tot))
      .withColumn("gt", round(
        col("s_all").cast("double") * col("s_all").cast("double")
          / col("n_total").cast("double") / 1000.0, 0).cast("long"))
      .withColumn("ssb_k", col("bt") - col("gt"))
      .withColumn("ssw_k",
        round(col("ssq").cast("double") / 1000.0, 0).cast("long") - col("bt"))
      .withColumn("f_stat", roundNorm(
        (col("ssb_k").cast("double") / (col("k_groups") - 1).cast("double")) /
          (col("ssw_k").cast("double") /
            (col("n_total") - col("k_groups")).cast("double")), 6))
      .select(col("k_groups"), col("n_total"), col("ssb_k"), col("ssw_k"),
        col("f_stat"))
  }

  /** Weight-of-Evidence / Information-Value bins (`ml_woe_bins`, r13):
    * the credit-scoring feature encoding — order totals banded into 6
    * FROZEN 100k-dollar bins (`least(cents div 10⁷, 5)`, published; a
    * quantile binning would put the engine's quantile algorithm in the
    * hash path), pos/neg counts from the same planted Knuth-hash
    * teacher as [[aucExact]], WOE = ln((pos⁺/P⁺)/(neg⁺/N⁺)) with +1/+B
    * Laplace smoothing (B = 6 bins, so zero cells stay finite). Counts
    * are exact BIGINTs; WOE and the per-bin IV term run ONE mirrored
    * double expression each, rounded 6 — the consumer sums iv_term for
    * the feature's IV, and no cross-bin float accumulation happens
    * inside either engine. Plan: one map-side-combinable 6-key agg +
    * one 1-row broadcast attach.
    */
  def woeBins(s: SparkSession, d: String): DataFrame = {
    val b = plantedScores(s, d)
      .withColumn("bin", least(expr("cents div 10000000"), lit(5L)))
      .groupBy("bin")
      .agg(sum("label").as("pos"), sum(lit(1L) - col("label")).as("neg"))
    val tot = b.agg(sum("pos").as("p_tot"), sum("neg").as("n_tot"))
    def D(c: Column): Column = c.cast("double")
    val pr = D(col("pos") + 1) / D(col("p_tot") + 6)
    val nr = D(col("neg") + 1) / D(col("n_tot") + 6)
    b.crossJoin(broadcast(tot))
      .withColumn("woe", roundNorm(log(pr / nr), 6))
      .withColumn("iv_term", roundNorm((pr - nr) * log(pr / nr), 6))
      .select(col("bin"), col("pos"), col("neg"), col("woe"), col("iv_term"))
      .orderBy("bin")
  }

  /** Pythagorean mean family (`agg_mean_family`, r13): arithmetic,
    * harmonic, contraharmonic and quadratic means of order totals per
    * priority — the scale-free location family (HM ≤ GM ≤ AM ≤ RMS ≤
    * CHM) whose spreads are classic skew/dispersion diagnostics (e.g.
    * CHM−AM is a size-biased-sampling premium). Everything stays on
    * exact integer lattices until one final op per mean: AM =
    * (100·Σx) div n (an exact e2 integer), HM via the per-row
    * reciprocal lattice r = 10¹² div x (integer floor-div per row —
    * deterministic in any engine, unlike a per-row double ln whose
    * 1-ulp wobble across 10⁵ rows WOULD eventually flip a lattice
    * round; the geometric mean is omitted for exactly that reason), CHM
    * = (100·Σx²) div Σx (exact — Σx² in whole dollars stays < 2⁶³ to
    * ~10¹⁰ rows), RMS = one sqrt of the exact ratio, rounded 4. One
    * map-side-combinable keyed agg over the scan — no second pass.
    */
  def meanFamily(s: SparkSession, d: String): DataFrame = {
    val t = Sources.orders(s, d)
      .select(col("o_orderpriority").as("grp"),
        round(col("o_totalprice")).cast("long").as("x"))
      .withColumn("r", expr("1000000000000L div x"))
    t.groupBy("grp").agg(
        count(lit(1)).as("n"), sum("x").as("sx"),
        sum(col("x") * col("x")).as("sxx"), sum("r").as("sr"))
      .select(col("grp"), col("n"), col("sx"),
        expr("(100L * sx) div n").as("am_e2"),
        expr("(n * 1000000000000L) div sr").as("hm_e0"),
        expr("(100L * sxx) div sx").as("chm_e2"),
        roundNorm(sqrt(col("sxx").cast("double") / col("n").cast("double")), 4)
          .as("rms"))
      .orderBy("grp")
  }

  /** Delta-method CI for a ratio-of-sums metric
    * (`stats_ratio_delta_ci`, r13): revenue-per-item by order priority —
    * the canonical A/B-test metric whose denominator is itself random,
    * so a naive mean-of-ratios or a per-order t-interval is WRONG; the
    * standard fix is the delta method on (Σx, Σy):
    * R = Σx/Σy, var(R) ≈ (s_xx − 2R·s_xy + R²·s_yy)/(n·ȳ²). All six
    * moments (n, Σx, Σy, Σx², Σy², Σxy) are exact BIGINTs in one
    * map-side-combinable keyed agg (whole dollars keep Σx² < 2⁶³ to
    * ~10¹⁰ rows, the ANOVA bound); R ships exactly as ratio_e6 =
    * (10⁶·Σx) div Σy, and se/lo/hi are ONE mirrored double expression
    * each, rounded 6 — the z = 1.96 normal quantile is a published
    * constant. Per-order item counts come from one lineitem
    * pre-aggregate joined on the order key.
    */
  def ratioDeltaCi(s: SparkSession, d: String): DataFrame = {
    val items = Sources.lineitem(s, d)
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(count(lit(1)).as("y"))
    val t = Sources.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority").as("grp"),
        round(col("o_totalprice")).cast("long").as("x"))
      .join(items, Seq("o_orderkey"))
    val g = t.groupBy("grp").agg(
      count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
    def D(c: Column): Column = c.cast("double")
    val r = D(col("sx")) / D(col("sy"))
    val nD = D(col("n"))
    val vxx = (D(col("sxx")) - D(col("sx")) * D(col("sx")) / nD) / (nD - 1.0)
    val vyy = (D(col("syy")) - D(col("sy")) * D(col("sy")) / nD) / (nD - 1.0)
    val vxy = (D(col("sxy")) - D(col("sx")) * D(col("sy")) / nD) / (nD - 1.0)
    val yBar = D(col("sy")) / nD
    val se = sqrt((vxx - lit(2.0) * r * vxy + r * r * vyy) / nD) / yBar
    g.select(col("grp"), col("n"), col("sx"), col("sy"),
        expr("(1000000L * sx) div sy").as("ratio_e6"),
        roundNorm(se, 6).as("se"),
        roundNorm(r - lit(1.96) * se, 6).as("lo"),
        roundNorm(r + lit(1.96) * se, 6).as("hi"))
      .orderBy("grp")
  }

  /** Bootstrap AUC replicates (`ml_auc_bootstrap`, r13): the
    * uncertainty every headline eval metric needs — 16 Poisson(1)
    * bootstrap replicates of the exact tie-aware AUC, using the SAME
    * hash-Poisson weights as [[Sampling.sampleBootstrapReps]] (CDF
    * thresholds on the 2²⁰ lattice keyed by (row, replicate) — fully
    * deterministic, so all 16 resampled U statistics sit under the
    * hash gate; an RNG bootstrap could only ever be rows-only). The
    * weighted U needs no new machinery: pos/neg become weight sums and
    * the identity U = Σ pos·negBelow + ½Σ pos·neg holds verbatim. ONE
    * corpus pass computes all 32 weight-moment columns
    * (map-side-combinable), ONE [[Prefix]] two-pass carries the 16
    * running negatives simultaneously (never 16 scans, never a global
    * sort), one final aggregate + stack emits the replicate table. The
    * consumer reads the spread as the CI; every value is an exact
    * integer.
    */
  def aucBootstrap(s: SparkSession, d: String): DataFrame = {
    val B = 16
    def wOf(b: Int): Column = {
      val u = pmod((pmod(col("o_orderkey"), lit(1048576L)) +
        lit(b.toLong * 7919L)) * lit(2654435761L), lit(1048576L))
      when(u < 385749L, 0L).when(u < 771499L, 1L).when(u < 964373L, 2L)
        .when(u < 1028665L, 3L).when(u < 1044738L, 4L).otherwise(5L)
    }
    val aggs = (0 until B).flatMap { b =>
      Seq(sum(wOf(b) * col("label")).as(s"pos$b"),
        sum(wOf(b) * (lit(1L) - col("label"))).as(s"neg$b"))
    }
    val by = plantedScores(s, d).groupBy("cents").agg(aggs.head, aggs.tail: _*)
    val run = Prefix.running(by, Seq(col("cents")),
      sums = (0 until B).map(b => (col(s"neg$b"), s"cum$b")))
    val finals = (0 until B).flatMap { b =>
      Seq(sum(col(s"pos$b")).as(s"p$b"), sum(col(s"neg$b")).as(s"n$b"),
        sum(col(s"pos$b") * (col(s"cum$b") - col(s"neg$b")) * 2 +
          col(s"pos$b") * col(s"neg$b")).as(s"u$b"))
    }
    run.agg(finals.head, finals.tail: _*)
      .selectExpr(s"stack($B, " + (0 until B).map { b =>
        s"${b}L, p$b, n$b, (u$b * 500000L) div (p$b * n$b)"
      }.mkString(", ") + ") AS (rep, n_pos_w, n_neg_w, auc_e6)")
      .orderBy("rep")
  }

  /** Count overdispersion profile (`stats_overdispersion`, r13): the
    * dispersion diagnostics for per-customer order counts by priority —
    * the modeling gate every count-valued pipeline runs BEFORE choosing
    * Poisson vs negative-binomial (dispersion index var/mean = 1 under
    * Poisson; > 1 demands NB), plus the NB method-of-moments size
    * r̂ = m²/(v − m). Two stacked keyed aggs (customer grain → priority
    * grain) with exact BIGINT count moments; mean/var/index/r̂ are ONE
    * mirrored double expression each, rounded 6 (the n−1 sample form;
    * r̂ is NULL-free because the under-dispersed branch ships the
    * documented −1 sentinel instead of a NULL dtype hazard).
    */
  def overdispersion(s: SparkSession, d: String): DataFrame = {
    val c = Sources.orders(s, d)
      .groupBy(col("o_orderpriority").as("grp"), col("o_custkey"))
      .agg(count(lit(1)).as("k"))
    val g = c.groupBy("grp").agg(count(lit(1)).as("n_cust"),
      sum("k").as("sk"), sum(col("k") * col("k")).as("skk"))
    def D(cc: Column): Column = cc.cast("double")
    val m = D(col("sk")) / D(col("n_cust"))
    val v = (D(col("skk")) - D(col("sk")) * D(col("sk")) / D(col("n_cust"))) /
      (D(col("n_cust")) - 1.0)
    g.select(col("grp"), col("n_cust"), col("sk"), col("skk"),
        roundNorm(m, 6).as("mean_k"),
        roundNorm(v, 6).as("var_k"),
        roundNorm(v / m, 6).as("dispersion"),
        when(v > m, roundNorm(m * m / (v - m), 6)).otherwise(lit(-1.0))
          .as("nb_r"))
      .orderBy("grp")
  }

  /** Cost-optimal decision threshold (`ml_cost_threshold`, r13): the
    * deployment step after every scored model — given published error
    * costs (c_fp = 1, c_fn = 5: a missed positive is five times a
    * false alarm), sweep every candidate threshold and release the
    * cost-minimizing one. Candidates are the distinct score values
    * ("predict positive iff score ≥ v"); FP/FN at every candidate come
    * from ONE [[Prefix]] running sum over the score-keyed table
    * (FP = N⁻ − cumneg + neg_at_v, FN = cumpos − pos_at_v — both exact
    * BIGINTs), and the argmin is a struct-MIN with the smaller
    * threshold breaking ties — never a global sort, never a per-
    * threshold rescan. The all-positive corner (min v) is in the sweep
    * by construction; the all-negative corner ships as the published
    * baseline column c_fn·P for comparison.
    */
  def costThreshold(s: SparkSession, d: String): DataFrame = {
    val by = plantedScores(s, d).groupBy("cents")
      .agg(sum("label").as("pos"), sum(lit(1L) - col("label")).as("neg"))
    val run = Prefix.running(by, Seq(col("cents")),
      sums = Seq((col("pos"), "cumpos"), (col("neg"), "cumneg")))
    val tot = run.agg(sum("pos").as("p_tot"), sum("neg").as("n_tot"))
    run.crossJoin(broadcast(tot))
      .withColumn("fp", col("n_tot") - col("cumneg") + col("neg"))
      .withColumn("fn", col("cumpos") - col("pos"))
      .withColumn("cost", col("fp") + lit(5L) * col("fn"))
      .agg(min(struct(col("cost"), col("cents"), col("fp"), col("fn")))
        .as("best"), max("p_tot").as("p_tot"), max("n_tot").as("n_tot"))
      .select(col("best.cents").as("threshold_cents"),
        col("best.fp").as("fp"), col("best.fn").as("fn"),
        col("best.cost").as("cost"),
        (lit(5L) * col("p_tot")).as("all_negative_cost"),
        col("n_tot").as("all_positive_cost"))
  }

  /** Exact VaR / expected shortfall per segment (`stats_cvar_segment`,
    * r13): the tail-risk pair for order totals by priority — VaR₉₅ =
    * the ⌈0.95·n⌉-th order statistic, ES₉₅ = the exact mean of the top
    * n−k+1 observations (tie-correct: the cutoff row contributes
    * exactly cum−k+1 of its copies). The whole tail machinery is ONE
    * global [[Prefix]] two-pass over (segment, value) carrying BOTH the
    * count and the value-weighted running sums; per-segment cumulatives
    * are recovered by subtracting earlier-segment offsets from a 5×5
    * broadcast theta self-join — never a per-segment sort, never a
    * partitioned window over corpus-sized value tables. All BIGINTs;
    * ES ships on the e2 cent lattice.
    */
  def cvarSegment(s: SparkSession, d: String): DataFrame = {
    val byV = Sources.orders(s, d)
      .select(col("o_orderpriority").as("grp"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy("grp", "cents").agg(count(lit(1)).as("c"))
      .withColumn("vc", col("c") * col("cents"))
    val run = Prefix.running(byV, Seq(col("grp"), col("cents")),
      sums = Seq((col("c"), "cumn"), (col("vc"), "cumv")))
    val segTot = byV.groupBy("grp")
      .agg(sum("c").as("n_g"), sum("vc").as("sum_g"))
    val off = segTot.as("a")
      .join(segTot.select(col("grp").as("bgrp"), col("n_g").as("bn"),
        col("sum_g").as("bs")), col("bgrp") < col("a.grp"), "left")
      .groupBy(col("a.grp").as("grp"), col("a.n_g").as("n_g"),
        col("a.sum_g").as("sum_g"))
      .agg(coalesce(sum("bn"), lit(0L)).as("off_n"),
        coalesce(sum("bs"), lit(0L)).as("off_v"))
      .withColumn("k_order", expr("(19L * n_g + 19L) div 20L"))
    // min cents then a join-back for its running sums — a struct-MIN
    // here would degrade to a SortAggregate over the tail value levels
    val inSeg = graft.io.Checkpoints.pin(
      run.join(broadcast(off), Seq("grp"))
        .withColumn("cum_in", col("cumn") - col("off_n"))
        .withColumn("vw_in", col("cumv") - col("off_v")),
      eager = false)
    val cutV = inSeg.filter(col("cum_in") >= col("k_order"))
      .groupBy("grp").agg(min("cents").as("var_cents"))
      .withColumnRenamed("grp", "cgrp")
    val cut = inSeg
      .join(broadcast(cutV),
        col("grp") === col("cgrp") && col("cents") === col("var_cents"))
      .select(col("grp"), col("var_cents"),
        col("cum_in").as("cum_at"), col("vw_in").as("vw_at"))
    cut.join(broadcast(off), Seq("grp"))
      .withColumn("n_tail", col("n_g") - col("k_order") + 1)
      .withColumn("tail_sum_c",
        col("sum_g") - col("vw_at") +
          col("var_cents") * (col("cum_at") - col("k_order") + 1))
      .select(col("grp"), col("n_g").as("n"), col("k_order"),
        col("var_cents"), col("n_tail"), col("tail_sum_c"),
        expr("(tail_sum_c * 100L) div n_tail").as("es_c_e2"))
      .orderBy("grp")
  }

  /** Fairness parity audit (`ml_fairness_audit`, r13): the group-metric
    * table every deployed classifier publishes — per customer segment
    * (the protected-attribute stand-in), the positive-decision rate of
    * the planted scorer's published decision rule (cents ≥ 2·10⁷, the
    * cost-threshold regime) and TPR/FPR against the planted teacher
    * (demographic parity needs rates; equalized odds needs the
    * conditional pair), plus the disparate-impact ratio of each group's
    * rate to the MAX group rate (the four-fifths-rule denominator
    * convention). All counts exact BIGINTs in one keyed conditional
    * agg + a 1-row max attach; every rate an e6 floor lattice.
    */
  def fairnessAudit(s: SparkSession, d: String): DataFrame = {
    val t = plantedScores(s, d)
      .join(Sources.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        Seq("o_orderkey"))
      .join(Sources.customer(s, d)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
        Seq("o_custkey"))
      .withColumn("dec", (col("cents") >= 20000000L).cast("long"))
    val g = t.groupBy("c_mktsegment").agg(
      count(lit(1)).as("n"),
      sum("dec").as("n_pos_dec"),
      sum(col("dec") * col("label")).as("tp"),
      sum(col("dec") * (lit(1L) - col("label"))).as("fp"),
      sum("label").as("n_pos_label"))
      // degenerate one-class segments ship the -1 sentinel instead of a
      // NULL-vs-error divergence between engines (r13 self-review find:
      // Spark `div 0` yields NULL where DuckDB `// 0` throws)
      .withColumn("rate_e6", expr("(n_pos_dec * 1000000L) div n"))
      .withColumn("tpr_e6", expr(
        "CASE WHEN n_pos_label = 0 THEN -1L " +
          "ELSE (tp * 1000000L) div n_pos_label END"))
      .withColumn("fpr_e6", expr(
        "CASE WHEN n = n_pos_label THEN -1L " +
          "ELSE (fp * 1000000L) div (n - n_pos_label) END"))
    val mx = g.agg(max("rate_e6").as("max_rate_e6"))
    g.crossJoin(broadcast(mx))
      .select(col("c_mktsegment"), col("n"), col("n_pos_dec"),
        col("rate_e6"), col("tpr_e6"), col("fpr_e6"),
        expr("(rate_e6 * 1000000L) div max_rate_e6").as("di_e6"))
      .orderBy("c_mktsegment")
  }

  /** Difference-in-differences (`stats_did`, r13): the workhorse
    * causal estimator — treated = customers of even nations, published
    * intervention date 1996-01-01, outcome = whole-dollar order total;
    * DiD = (T̄_post − T̄_pre) − (C̄_post − C̄_pre) cancels both the group
    * fixed effect and the common time trend. One conditional 4-cell
    * aggregate over the orders⋈customer scan; the four cell (n, Σ)
    * pairs ship as exact BIGINTs (the audit a referee recomputes) and
    * the estimate is ONE mirrored double expression over them, rounded
    * 4. The fixture's pre-period is thin (orders cluster post-1996),
    * so the point estimate carries real small-sample noise — shipping
    * the four cells alongside is exactly why: the consumer can judge
    * the design, not just the number.
    */
  def did(s: SparkSession, d: String): DataFrame = {
    val t = Sources.orders(s, d)
      .join(Sources.customer(s, d)
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey")),
        Seq("o_custkey"))
      .select((col("c_nationkey") % 2 === 0).cast("long").as("treated"),
        (to_date(col("o_orderdate")) >= lit("1996-01-01").cast("date"))
          .cast("long").as("post"),
        round(col("o_totalprice")).cast("long").as("x"))
    def cell(tr: Int, po: Int, nm: String): Seq[Column] = Seq(
      sum(when(col("treated") === tr && col("post") === po, 1L).otherwise(0L))
        .as(s"n_$nm"),
      sum(when(col("treated") === tr && col("post") === po, col("x"))
        .otherwise(0L)).as(s"s_$nm"))
    val aggs = cell(1, 1, "t1") ++ cell(1, 0, "t0") ++
      cell(0, 1, "c1") ++ cell(0, 0, "c0")
    def m(nm: String): Column =
      col(s"s_$nm").cast("double") / col(s"n_$nm").cast("double")
    t.agg(aggs.head, aggs.tail: _*)
      .withColumn("did", roundNorm((m("t1") - m("t0")) - (m("c1") - m("c0")), 4))
  }

  /** Distribution-shape profile (`stats_moments_profile`, r13):
    * skewness and excess kurtosis of order value per priority — the
    * two shape numbers that decide whether a mean±stddev summary (or a
    * z-score anomaly gate like `ts_anomaly_zscore`) is even meaningful
    * on this segment, and the standard screen before picking a
    * heavy-tail model. One conditional-sum corpus pass accumulates the
    * first four RAW power sums as exact BIGINTs on the THOUSAND-dollar
    * lattice (x = cents div 100000 — a floor of nonnegative ints, so
    * Spark `div` and DuckDB `//` agree; x ≤ ~600 keeps Σx⁴ ≤ 1.3e11·n,
    * exact to ~7e7 corpus rows per group under 2⁶³ — beyond that the
    * unit coarsens or the sums widen to DECIMAL(38,0), the
    * count-gated [[aucFromByScore]] pattern). Central moments come
    * from the raw-moment identities in ONE mirrored double expression
    * per emitted statistic (the [[anovaF]] discipline): m2 = s2/n−m²,
    * m3 = s3/n−3m·s2/n+2m³, m4 = s4/n−4m·s3/n+6m²·s2/n−3m⁴;
    * skew = m3/m2^1.5, exkurt = m4/m2²−3, each rounded 6. The four
    * sums ship as gate columns so the floats are referee-recomputable.
    */
  def momentsProfile(s: SparkSession, d: String): DataFrame = {
    val t = Sources.orders(s, d).select(col("o_orderpriority"),
      expr("CAST(round(o_totalprice * 100) AS LONG) div 100000").as("x"))
    def D(c: Column): Column = c.cast("double")
    t.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum("x").as("s1"),
        sum(col("x") * col("x")).as("s2"),
        sum(col("x") * col("x") * col("x")).as("s3"),
        sum(col("x") * col("x") * col("x") * col("x")).as("s4"))
      .withColumn("m", D(col("s1")) / D(col("n")))
      .withColumn("m2", D(col("s2")) / D(col("n")) - col("m") * col("m"))
      .withColumn("m3", D(col("s3")) / D(col("n"))
        - lit(3.0) * col("m") * D(col("s2")) / D(col("n"))
        + lit(2.0) * col("m") * col("m") * col("m"))
      .withColumn("m4", D(col("s4")) / D(col("n"))
        - lit(4.0) * col("m") * D(col("s3")) / D(col("n"))
        + lit(6.0) * col("m") * col("m") * D(col("s2")) / D(col("n"))
        - lit(3.0) * col("m") * col("m") * col("m") * col("m"))
      .select(col("o_orderpriority"), col("n"), col("s1"), col("s2"),
        col("s3"), col("s4"),
        roundNorm(col("m3") / pow(col("m2"), 1.5), 6).as("skewness"),
        roundNorm(col("m4") / (col("m2") * col("m2")) - lit(3.0), 6)
          .as("ex_kurtosis"))
      .orderBy("o_orderpriority")
  }

  /** Normal QQ deciles (`stats_qq_normal`, r13): the nine empirical
    * deciles of order value against the Gaussian line μ + z_p·σ — the
    * visual-test-as-table that localizes WHERE a distribution departs
    * from normal (tails vs shoulders), one level finer than
    * [[momentsProfile]]'s two summary shape numbers. The nine standard
    * z quantiles ship as PUBLISHED e6 integers (±1281552, ±841621,
    * ±524401, ±253347, 0), so the theoretical side is one mirrored
    * double per decile off exact dollar moments. Empirical deciles are
    * exact LOWER order statistics (rank = (n−1)·i div 10 + 1 — a
    * published discrete convention, no interpolation, no float): one
    * value-count aggregate, ONE [[Prefix]] running count (never a
    * single-partition sort), then all nine picks as conditional MINs
    * in a single pass over the value-domain table — no per-decile
    * join, no second scan.
    */
  def qqNormal(s: SparkSession, d: String): DataFrame = {
    val zE6 = Seq(-1281552L, -841621L, -524401L, -253347L, 0L,
      253347L, 524401L, 841621L, 1281552L)
    val t = Sources.orders(s, d).select(
      expr("CAST(round(o_totalprice * 100) AS LONG)").as("cents"))
    // dollar moments keep s2 Long-exact (cents² overflows at 1.5e5
    // rows); the variance finish is the mirrored s2/n − m² form — the
    // integer n·s2−s1² identity itself overflows past ~1.5e4 rows
    val mom = t.agg(count(lit(1)).as("n"),
      sum(expr("cents div 100")).as("s1"),
      sum(expr("(cents div 100) * (cents div 100)")).as("s2"))
    val vc = t.groupBy("cents").agg(count(lit(1)).as("cnt"))
    val pf = Prefix.running(vc, Seq(col("cents")),
      sums = Seq((col("cnt"), "cum")))
    val picks = (1 to 9).map { i =>
      min(when(col("cum") >= expr(s"((n - 1L) * ${i}L) div 10L + 1L"),
        col("cents"))).as(s"e$i")
    } ++ Seq(max("n").as("n"), max("s1").as("s1"), max("s2").as("s2"))
    val wide = pf.crossJoin(broadcast(mom)).agg(picks.head, picks.tail: _*)
    val long = wide.select(
      expr("stack(9, " + (1 to 9).map(i => s"${i * 10}L, e$i")
        .mkString(", ") + ") AS (p, emp_cents)"),
      col("n"), col("s1"), col("s2"))
    val zCol = (1 to 9).foldLeft(lit(0L)) { (acc, i) =>
      when(col("p") === i * 10, lit(zE6(i - 1))).otherwise(acc)
    }
    def D(c: Column): Column = c.cast("double")
    long.withColumn("z_e6", zCol)
      .select(col("p"), col("n"), col("emp_cents"), col("z_e6"),
        roundNorm(D(col("s1")) / D(col("n")) + D(col("z_e6")) / 1e6 *
          sqrt(D(col("s2")) / D(col("n")) -
            (D(col("s1")) / D(col("n"))) * (D(col("s1")) / D(col("n")))),
          2).as("theo_usd"))
      .orderBy("p")
  }

  /** Kendall's τ-b (`stats_kendall_tau_b`, r13): rank concordance
    * between basket size and the published price band (cents div
    * 2·10⁶, capped at 9) — the tie-robust alternative to
    * [[spearman]]: with only 7×10 distinct value pairs, ties ARE the
    * data, and τ-b's denominator corrects for both margins where
    * Spearman's rank transform just smears them. Both variables live
    * on BOUNDED published domains, so the whole statistic reduces to
    * the ≤70-cell contingency table: concordant/discordant mass is a
    * cell-pair join (≤70² rows — model-sized, never corpus pairs),
    * tie masses come from the margins, everything up to the final
    * division is exact Longs (C, D ≤ n²/2 — Long-exact to 4e9 rows),
    * and τ-b is ONE mirrored double over two √ factors, rounded 6.
    */
  def kendallTauB(s: SparkSession, d: String): DataFrame = {
    val t = Sources.orders(s, d)
      .join(Sources.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("x"),
        least(expr("max(CAST(round(o_totalprice * 100) AS LONG)) div 2000000"),
          lit(9L)).as("y"))
    val cells = t.groupBy("x", "y").agg(count(lit(1)).as("c"))
      .pinned(eager = false) // pair join (both sides), margins, total
    val a = cells.select(col("x").as("xa"), col("y").as("ya"), col("c").as("ca"))
    val b = cells.select(col("x").as("xb"), col("y").as("yb"), col("c").as("cb"))
    val conc = a.join(broadcast(b),
        col("xb") > col("xa") && col("yb") > col("ya"))
      .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("c_cnt"))
    val disc = a.join(broadcast(b),
        col("xb") > col("xa") && col("yb") < col("ya"))
      .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("d_cnt"))
    val n = cells.agg(sum("c").as("n"))
    val tx = cells.groupBy("x").agg(sum("c").as("m"))
      .agg(sum(expr("m * (m - 1L) div 2L")).as("tx"))
    val ty = cells.groupBy("y").agg(sum("c").as("m"))
      .agg(sum(expr("m * (m - 1L) div 2L")).as("ty"))
    def D(c: Column): Column = c.cast("double")
    n.crossJoin(broadcast(conc)).crossJoin(broadcast(disc))
      .crossJoin(broadcast(tx)).crossJoin(broadcast(ty))
      .withColumn("n0", expr("n * (n - 1L) div 2L"))
      .select(col("n"), col("c_cnt"), col("d_cnt"), col("tx"), col("ty"),
        graft.functions.Num.roundNorm(
          D(col("c_cnt") - col("d_cnt")) /
            (sqrt(D(col("n0") - col("tx"))) * sqrt(D(col("n0") - col("ty")))),
          6).as("tau_b"))
  }

  /** KS scorer separation (`ml_ks_separation`, r13): the
    * Kolmogorov-Smirnov distance between the positive and negative
    * score distributions of the planted scorer — credit-scoring's
    * standard companion to AUC ([[aucExact]]): AUC integrates ranking
    * quality over all thresholds, KS reports the SINGLE best
    * threshold's separation and WHERE it is (the released cutoff a
    * deployment actually uses). Entirely exact: per distinct score the
    * running positive/negative counts come from ONE [[Prefix]]
    * two-pass (never a single-partition sort); D's numerator is the
    * integer max |cumPos·N − cumNeg·P| (≤ P·N < 2⁶³ to ~2e9 rows per
    * side — the [[AucLongBound]] arithmetic), ks_e6 one floor
    * division, and the optimal threshold is the min-cents argmax by
    * max + join-back (the sanctioned argmin shape, no struct-max
    * SortAggregate). The prefix table is pinned lazily for its two
    * consumers (the max and the pick).
    */
  def ksSeparation(s: SparkSession, d: String): DataFrame = {
    val byScore = plantedScores(s, d).groupBy("cents").agg(
      sum(col("label")).as("pos"), sum(lit(1L) - col("label")).as("neg"))
    val run = Prefix.running(byScore, Seq(col("cents")),
      sums = Seq((col("pos"), "cum_pos"), (col("neg"), "cum_neg")))
    val tots = run.agg(max("cum_pos").as("p_tot"), max("cum_neg").as("n_tot"))
    val diff = run.crossJoin(broadcast(tots)) // 1-row total attach
      .withColumn("dn",
        abs(col("cum_pos") * col("n_tot") - col("cum_neg") * col("p_tot")))
      .pinned(eager = false) // consumed by the max AND the pick
    val dm = diff.agg(max("dn").as("d_num"))
    diff.join(broadcast(dm), col("dn") === col("d_num"))
      .agg(min("cents").as("ks_threshold_cents"))
      .crossJoin(broadcast(dm)).crossJoin(broadcast(tots))
      .select(col("p_tot"), col("n_tot"), col("d_num"),
        expr("(1000000L * d_num) div (p_tot * n_tot)").as("ks_e6"),
        col("ks_threshold_cents"))
  }

  /** Grubbs outlier statistic per segment (`stats_grubbs`, r13): G =
    * max|x − x̄| / s, the classic single-outlier test (Grubbs 1950) —
    * the per-group "how extreme is the most extreme point" number a
    * data-quality sweep publishes next to the moments (the decision
    * threshold is a t-quantile in n, left to the consumer; the
    * statistic itself is what the engine owes). Exact-arithmetic
    * shape: the deviation ranking currency is |n·x − S| — an exact
    * BIGINT, so the argmax (and its min-key tie-break) is pure integer
    * comparison — and the only doubles are ONE mirrored finish per
    * segment on the exact (n, S, Q, max|n·x−S|) tuple, in the
    * overflow-safe s2/n − m² form (the qq-normal lesson: n·Q − S²
    * leaves Long at ~2e9 corpus rows). Plan: the record table is
    * pinned once and consumed by the moment agg, the deviation argmax,
    * and the witness fetch; the argmax is the TWO-PASS hash-agg shape
    * (per-segment max, equi-join back, min-key among ties) — never a
    * keyed sort-aggregate or a low-cardinality window over the corpus,
    * so map-side partials survive at any scale.
    */
  def grubbsOutlier(s: SparkSession, d: String): DataFrame = {
    val recs = Sources.customer(s, d)
      .select(col("c_mktsegment"), col("c_custkey"),
        round(col("c_acctbal") * 100).cast("long").as("cents"))
      .pinned(eager = false)
    val m = recs.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum("cents").as("s1"),
        sum(col("cents") * col("cents")).as("s2"))
    val dev = recs.join(broadcast(m.select("c_mktsegment", "n", "s1")),
        "c_mktsegment")
      .withColumn("adev", abs(col("cents") * col("n") - col("s1")))
    val mx = dev.groupBy("c_mktsegment").agg(max("adev").as("adev"))
    val arg = dev.join(broadcast(mx), Seq("c_mktsegment", "adev"))
      .groupBy("c_mktsegment", "adev")
      .agg(min("c_custkey").as("outlier_key"))
    val witness = recs.join(broadcast(arg.select(col("c_mktsegment"),
        col("adev"), col("outlier_key").as("c_custkey"))),
        Seq("c_mktsegment", "c_custkey"))
      .select(col("c_mktsegment"), col("adev"),
        col("c_custkey").as("outlier_key"), col("cents").as("outlier_cents"))
    val nD = col("n").cast("double")
    val varS = (col("s2").cast("double") / nD -
      (col("s1").cast("double") / nD) * (col("s1").cast("double") / nD)) *
      (nD / (col("n") - lit(1L)).cast("double"))
    witness.join(broadcast(m), "c_mktsegment")
      .select(col("c_mktsegment"), col("n"), col("outlier_key"),
        col("outlier_cents"), col("adev"),
        round(lit(1e6) * (col("adev").cast("double") / nD) / sqrt(varS))
          .cast("long").as("g_e6"))
      .orderBy("c_mktsegment")
  }

  /** Theil T inequality decomposition (`stats_theil_decomp`, r13): the
    * entropy-based inequality index T = Σ (x_i/X)·ln(x_i/μ) over order
    * values, decomposed by priority group into WITHIN + BETWEEN — the
    * property Gini famously lacks (Theil 1967; Shorrocks 1980 on
    * additive decomposability): ln(x·N/S) = ln(x·N_g/S_g) +
    * ln(S_g·N/(S·N_g)) splits every record's contribution into its
    * within-group inequality and its group's positional term, exactly,
    * in the reals. Lattice shape: group moments (N_g, S_g) and totals
    * are exact Longs; each record contributes ONE mirrored
    * (x/S)·ln(x·N_g/S_g) double rounded to the e12 lattice (terms are
    * ≤ ~1e-4, so e12 keeps ~8 significant digits; integer sums from
    * there), and the ≤5 BETWEEN terms mirror at group level. The
    * revenue share ships as the exact integer floor (S_g·1e6) div S —
    * past ~9e12 total cents the share numerator needs the count-gated
    * DECIMAL widening (the aucExact convention). Plan: one grouped
    * moment pass, a ≤5-row broadcast back onto the pinned records, one
    * keyed sum — map-side partials throughout, no window.
    */
  def theilDecomp(s: SparkSession, d: String): DataFrame = {
    val recs = Sources.orders(s, d)
      .select(col("o_orderpriority").as("prio"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .pinned(eager = false)
    val g = recs.groupBy("prio")
      .agg(count(lit(1)).as("ng"), sum("cents").as("sg"))
    val tot = g.agg(sum("ng").as("n"), sum("sg").as("st"))
    val gm = g.crossJoin(broadcast(tot))
    val within = recs.join(broadcast(gm), "prio")
      .withColumn("t_e12", round(lit(1e12) *
        (col("cents").cast("double") / col("st").cast("double")) *
        log(col("cents").cast("double") * col("ng").cast("double") /
          col("sg").cast("double"))).cast("long"))
      .groupBy("prio").agg(sum("t_e12").as("within_e12"))
    gm.withColumn("between_e12", round(lit(1e12) *
        (col("sg").cast("double") / col("st").cast("double")) *
        log(col("sg").cast("double") * col("n").cast("double") /
          (col("st").cast("double") * col("ng").cast("double"))))
        .cast("long"))
      .join(within, "prio")
      .select(col("prio"), col("ng").as("n"), col("sg").as("cents_sum"),
        expr("(sg * 1000000L) div st").as("share_e6"),
        col("within_e12"), col("between_e12"))
      .orderBy("prio")
  }

  /** DeLong AUC variance and 95 % CI (`stats_auc_delong`, r13): the
    * standard error every reported AUC owes (DeLong, DeLong &
    * Clarke-Pearson 1988) — without it, "model A's 0.71 beats B's
    * 0.70" is numerology. The estimator is the two-sample U-statistic
    * variance: per-positive placements v10 (fraction of negatives
    * below, ties half) and per-negative placements v01; Var(AUC) =
    * Var(v10)/P + Var(v01)/N. Exact-lattice shape: placements live on
    * the ×(2N) / ×(2P) integer lattices (u10 = 2·negBelow + negTied,
    * exactly the [[aucExact]] u2 currency), their first/second moments
    * are exact Long sums off the SAME one-pass Prefix cumulative table
    * — the v01 side needs no second pass because variance is
    * shift-invariant: var(2P − w) = var(w) with w = 2·posBelowIncl −
    * posTied, so its moments (A1, A2) aggregate without knowing P.
    * One mirrored finish produces variance, SE, and the ±1.96 CI on
    * e12/e6 lattices. (Long bound: Q10 ≤ P·4N² ≈ 1.3e16 at sf0.1;
    * past the [[AucLongBound]] regime the moments need the DECIMAL
    * widening, the aucFromByScore convention.)
    */
  def aucDelong(s: SparkSession, d: String): DataFrame = {
    val byScore = plantedScores(s, d).groupBy("cents").agg(
      sum(col("label")).as("pos"),
      sum(lit(1L) - col("label")).as("neg"))
    val run = Prefix.running(byScore, Seq(col("cents")),
      sums = Seq((col("neg"), "cumneg"), (col("pos"), "cumpos")))
    val m = run.select(col("pos"), col("neg"),
        (lit(2L) * (col("cumneg") - col("neg")) + col("neg")).as("u10"),
        (lit(2L) * col("cumpos") - col("pos")).as("w01"))
      .agg(sum("pos").as("p"), sum("neg").as("n"),
        sum(col("pos") * col("u10")).as("s10"),
        sum(col("pos") * col("u10") * col("u10")).as("q10"),
        sum(col("neg") * col("w01")).as("a1"),
        sum(col("neg") * col("w01") * col("w01")).as("a2"))
    val pD = col("p").cast("double")
    val nD = col("n").cast("double")
    val var10 = (col("q10").cast("double") / pD -
      (col("s10").cast("double") / pD) * (col("s10").cast("double") / pD)) *
      (pD / (col("p") - lit(1L)).cast("double")) / (lit(4.0) * nD * nD)
    val var01 = (col("a2").cast("double") / nD -
      (col("a1").cast("double") / nD) * (col("a1").cast("double") / nD)) *
      (nD / (col("n") - lit(1L)).cast("double")) / (lit(4.0) * pD * pD)
    val auc = col("s10").cast("double") / (lit(2.0) * pD * nD)
    val varA = var10 / pD + var01 / nD
    m.select(col("p").as("n_pos"), col("n").as("n_neg"),
      roundNorm(auc, 6).as("auc"),
      round(varA * lit(1e12)).cast("long").as("var_e12"),
      round((auc - lit(1.96) * sqrt(varA)) * 1e6).cast("long").as("ci_lo_e6"),
      round((auc + lit(1.96) * sqrt(varA)) * 1e6).cast("long").as("ci_hi_e6"))
  }

  /** Two-proportion power analysis (`stats_power_twoprop`, r13): the
    * experiment-design number every A/B platform computes before a
    * test — the per-arm sample size to detect an absolute lift δ over
    * the observed baseline conversion at two-sided α = 0.05 and 80 %
    * power, by the standard normal-approximation formula n =
    * (z_{α/2}·√(2p̄q̄) + z_β·√(p₁q₁+p₂q₂))² / δ². The baseline p₁ is
    * the corpus purchase share (exact integer counts); the published
    * z constants (1.959964, 0.841621) are literals in BOTH engines;
    * each of the 3 published lifts gets ONE mirrored finish (q·q
    * instead of pow — DuckDB's ^ is POWER with different typing; ceil
    * mirrored on the identical double). Plan: one corpus aggregate,
    * a 3-row lift fan-out, map-side math.
    */
  def powerTwoProp(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Sources.events(s, d).agg(count(lit(1)).as("nt"),
      sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("np"))
    val deltas = Seq(10000L, 20000L, 50000L).toDF("delta_e6")
    val p1 = col("np").cast("double") / col("nt").cast("double")
    val p2 = p1 + col("delta_e6").cast("double") / lit(1000000.0)
    val pbar = (p1 + p2) / lit(2.0)
    val q = lit(1.959964) * sqrt(lit(2.0) * pbar * (lit(1.0) - pbar)) +
      lit(0.841621) * sqrt(p1 * (lit(1.0) - p1) + p2 * (lit(1.0) - p2))
    deltas.crossJoin(broadcast(base))
      .select(col("delta_e6"), col("nt").as("n_events"),
        col("np").as("n_purchase"),
        expr("(np * 1000000L) div nt").as("p1_e6"),
        ceil(q * q / ((p2 - p1) * (p2 - p1))).cast("long").as("n_per_arm"))
      .orderBy("delta_e6")
  }

  /** Distribution-free median CI (`stats_median_ci`, r13): the
    * binomial order-statistic confidence interval for the median — no
    * normality assumption, the interval every robust-reporting
    * guideline asks for next to the point estimate. Normal-
    * approximation ranks (the standard large-n recipe): lo =
    * max(1, ⌊(n − z√n)/2⌋), hi = min(n, ⌈1 + (n + z√n)/2⌉) with
    * z = 1.959964 published; the ONLY doubles are that one mirrored
    * rank pair per segment (floor/ceil on identical expressions —
    * a one-ulp flip needs n − z√n within an ulp of an even integer),
    * everything else is the [[graft.ops.Prefix]] one-pass rank +
    * THREE conditional-MIN order-statistic picks (lower median at
    * (n+1) div 2, the two bounds) — the bowleySkew shape exactly.
    */
  def medianCi(s: SparkSession, d: String): DataFrame = {
    val recs = Sources.customer(s, d)
      .select(col("c_mktsegment").as("seg"), col("c_custkey"),
        round(col("c_acctbal") * 100).cast("long").as("cents"))
    val ranked = graft.ops.Prefix.running(recs,
      Seq(col("seg"), col("cents"), col("c_custkey")), rankOut = Some("rk"))
    val nD = col("n").cast("double")
    val segs = ranked.groupBy("seg")
      .agg(min("rk").as("rk0"), count(lit(1)).as("n"))
      .withColumn("r_med", expr("(n + 1) div 2"))
      .withColumn("r_lo", greatest(lit(1L),
        floor((nD - lit(1.959964) * sqrt(nD)) / lit(2.0)).cast("long")))
      .withColumn("r_hi", least(col("n"),
        ceil(lit(1.0) + (nD + lit(1.959964) * sqrt(nD)) / lit(2.0))
          .cast("long")))
    ranked.join(broadcast(segs), "seg")
      .withColumn("relrk", col("rk") - col("rk0") + 1L)
      .groupBy("seg")
      .agg(max("n").as("n"), max("r_lo").as("r_lo"), max("r_hi").as("r_hi"),
        min(when(col("relrk") >= col("r_med"), col("cents"))).as("med_cents"),
        min(when(col("relrk") >= col("r_lo"), col("cents")))
          .as("ci_lo_cents"),
        min(when(col("relrk") >= col("r_hi"), col("cents")))
          .as("ci_hi_cents"))
      .orderBy("seg")
  }

  /** Average precision, threshold form (`ml_average_precision`, r13):
    * the area under the precision-recall curve by the step rule AP =
    * Σ_t (R_t − R_{t−1})·P_t over distinct score thresholds descending
    * — sklearn's `average_precision_score` definition, the PR-side
    * companion of [[aucExact]] and the metric that matters when
    * positives are rare (AUC saturates, AP doesn't). Tie-safe by
    * construction: thresholds are DISTINCT scores, so the ambiguity of
    * within-tie ordering never arises. Shape: the by-score table runs
    * through ONE descending [[Prefix]] pass (cumulative TP/FP at each
    * threshold are exact Longs), each threshold contributes ONE
    * mirrored (pos/P)·(TP/(TP+FP)) double on the e9 lattice, and AP is
    * their exact integer sum. 1-row P attach.
    */
  def averagePrecision(s: SparkSession, d: String): DataFrame = {
    val byScore = plantedScores(s, d).groupBy("cents").agg(
      sum(col("label")).as("pos"),
      sum(lit(1L) - col("label")).as("neg"))
      .withColumn("nc", -col("cents"))
    val run = Prefix.running(byScore, Seq(col("nc")),
      sums = Seq((col("pos"), "tp"), (col("neg"), "fp")))
    val tot = run.agg(sum("pos").as("p"), sum("neg").as("n"))
    run.crossJoin(broadcast(tot))
      .withColumn("term_e9", round(lit(1e9) *
        (col("pos").cast("double") / col("p").cast("double")) *
        (col("tp").cast("double") /
          (col("tp") + col("fp")).cast("double"))).cast("long"))
      .agg(max("p").as("n_pos"), max("n").as("n_neg"),
        count(lit(1)).as("n_thresholds"), sum("term_e9").as("ap_e9"))
  }

  /** Benjamini-Hochberg FDR control (`stats_bh_fdr`, r13): the
    * multiple-testing correction every per-segment metric sweep owes —
    * 25 nations each tested for a deviant negative-balance rate means
    * ~1 false "discovery" at α = 0.05 by chance alone; BH's step-up
    * rule (reject all ranks ≤ max{k : p₍ₖ₎ ≤ k·α/m}) controls the
    * expected false-discovery RATE instead of Bonferroni's family
    * blunderbuss. Determinism chain: exact per-nation counts → one
    * mirrored two-proportion z → two-sided p via the Abramowitz-Stegun
    * 26.2.17 polynomial (all six constants published; both engines run
    * the identical exp/multiply chain) → e9 lattice → from there PURE
    * INTEGERS: the BH threshold is (rank·50 000 000) div m exactly,
    * the step-up cutoff a 1-row max attach. The rank window runs over
    * the 25-row NATION DIMENSION (the agg_largest_remainder sanction
    * class), never the corpus.
    */
  def bhFdr(s: SparkSession, d: String): DataFrame = {
    val perN = Sources.customer(s, d)
      .select(col("c_nationkey").cast("long").as("nk"),
        (col("c_acctbal") < 0).cast("long").as("neg"))
      .groupBy("nk").agg(count(lit(1)).as("n"), sum("neg").as("k"))
    val tot = perN.agg(sum("n").as("nt"), sum("k").as("kt"),
      count(lit(1)).as("m"))
    val p0 = col("kt").cast("double") / col("nt").cast("double")
    val z = (col("k").cast("double") / col("n").cast("double") - p0) /
      sqrt(p0 * (lit(1.0) - p0) / col("n").cast("double"))
    val az = abs(z)
    val tt = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
    val poly = tt * (lit(0.319381530) + tt * (lit(-0.356563782) + tt *
      (lit(1.781477937) + tt * (lit(-1.821255978) +
        tt * lit(1.330274429)))))
    val pTwo = lit(2.0) * (lit(0.3989422804014327) *
      exp(lit(-0.5) * az * az)) * poly
    val scored = perN.crossJoin(broadcast(tot))
      .withColumn("p_e9", round(pTwo * lit(1e9)).cast("long"))
    val wR = org.apache.spark.sql.expressions.Window
      .orderBy(col("p_e9").asc, col("nk").asc)
    val ranked = scored
      .withColumn("rank", row_number().over(wR).cast("long"))
      .withColumn("thresh_e9", expr("(rank * 50000000L) div m"))
    val kmax = ranked.agg(coalesce(max(when(
      col("p_e9") <= col("thresh_e9"), col("rank"))), lit(0L)).as("kmax"))
    ranked.crossJoin(broadcast(kmax))
      .select(col("nk"), col("n"), col("k"),
        expr("(k * 1000000L) div n").as("neg_share_e6"),
        col("p_e9"), col("rank"), col("thresh_e9"),
        when(col("rank") <= col("kmax"), 1L).otherwise(0L).as("rejected"))
      .orderBy("rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stats_grubbs" -> (grubbsOutlier _),
    "stats_bh_fdr" -> (bhFdr _),
    "ml_average_precision" -> (averagePrecision _),
    "stats_median_ci" -> (medianCi _),
    "stats_power_twoprop" -> (powerTwoProp _),
    "stats_auc_delong" -> (aucDelong _),
    "stats_theil_decomp" -> (theilDecomp _),
    "ml_ks_separation" -> (ksSeparation _),
    "stats_kendall_tau_b" -> (kendallTauB _),
    "stats_qq_normal" -> (qqNormal _),
    "stats_moments_profile" -> (momentsProfile _),
    "stats_did" -> (did _),
    "ml_fairness_audit" -> (fairnessAudit _),
    "stats_cvar_segment" -> (cvarSegment _),
    "ml_cost_threshold" -> (costThreshold _),
    "stats_overdispersion" -> (overdispersion _),
    "ml_auc_bootstrap" -> (aucBootstrap _),
    "stats_ratio_delta_ci" -> (ratioDeltaCi _),
    "agg_mean_family" -> (meanFamily _),
    "ml_woe_bins" -> (woeBins _),
    "stats_anova_f" -> (anovaF _),
    "stats_kruskal_wallis" -> (kruskalWallis _),
    "stats_levene_bf" -> (leveneBf _),
    "ml_learning_curve_frozen" -> (learningCurveFrozen _),
    "stats_mann_whitney" -> (mannWhitney _),
    "stats_jsd" -> (jsdBuckets _),
    "stats_kde_grid" -> (kdeGrid _),
    "agg_trimmed_mean" -> (trimmedMean _),
    "agg_largest_remainder" -> (largestRemainder _),
    "agg_theil_segment" -> (theilBySegment _),
    "ml_pr_curve" -> (prCurve _),
    "ml_roc_curve" -> (rocCurve _),
    "text_length_pct_rank" -> (lengthPctRank _),
    "ml_auc_exact" -> (aucExact _),
    "agg_gini_segment" -> (giniBySegment _),
    "agg_spearman" -> (spearman _),
  )

  val oracles: Map[String, String] = Map(
    // same descending-threshold cumulative TP/FP, same mirrored
    // (pos/P)·(TP/(TP+FP)) e9 terms, exact integer AP sum
    "ml_average_precision" ->
      """WITH scored AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT)
        |    AS cents,
        |   CASE WHEN (o_orderkey * 2654435761) % 4294967296 % 1000000
        |     < least(100000 + CAST(round(o_totalprice * 100) AS BIGINT)
        |       // 100, 900000)
        |     THEN 1 ELSE 0 END AS label
        |  FROM orders),
        | bys AS (SELECT cents, CAST(sum(label) AS BIGINT) AS pos,
        |    CAST(sum(1 - label) AS BIGINT) AS neg
        |  FROM scored GROUP BY cents),
        | run AS (SELECT pos, neg,
        |   sum(pos) OVER (ORDER BY cents DESC ROWS UNBOUNDED PRECEDING)
        |     AS tp,
        |   sum(neg) OVER (ORDER BY cents DESC ROWS UNBOUNDED PRECEDING)
        |     AS fp
        |  FROM bys),
        | tot AS (SELECT CAST(sum(pos) AS BIGINT) AS p,
        |    CAST(sum(neg) AS BIGINT) AS n FROM run)
        |SELECT t.p AS n_pos, t.n AS n_neg,
        | CAST(count(*) AS BIGINT) AS n_thresholds,
        | CAST(sum(CAST(round(1e9 *
        |   (CAST(r.pos AS DOUBLE) / CAST(t.p AS DOUBLE)) *
        |   (CAST(r.tp AS DOUBLE) / CAST(r.tp + r.fp AS DOUBLE)))
        |  AS BIGINT)) AS BIGINT) AS ap_e9
        |FROM run r CROSS JOIN tot t GROUP BY t.p, t.n""".stripMargin,
    // same mirrored rank pair, same one-pass conditional-MIN picks
    "stats_median_ci" ->
      """WITH recs AS (SELECT c_mktsegment AS seg, c_custkey,
        |   CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer),
        | rk AS (SELECT seg, cents,
        |   row_number() OVER (PARTITION BY seg ORDER BY cents, c_custkey)
        |     AS relrk FROM recs),
        | segs AS (SELECT seg, CAST(count(*) AS BIGINT) AS n,
        |    (CAST(count(*) AS BIGINT) + 1) // 2 AS r_med,
        |    greatest(1, CAST(floor((CAST(count(*) AS DOUBLE)
        |      - 1.959964 * sqrt(CAST(count(*) AS DOUBLE))) / 2.0)
        |     AS BIGINT)) AS r_lo,
        |    least(CAST(count(*) AS BIGINT), CAST(ceil(1.0
        |      + (CAST(count(*) AS DOUBLE)
        |        + 1.959964 * sqrt(CAST(count(*) AS DOUBLE))) / 2.0)
        |     AS BIGINT)) AS r_hi
        |   FROM recs GROUP BY 1)
        |SELECT rk.seg, s.n, s.r_lo, s.r_hi,
        | min(CASE WHEN relrk >= s.r_med THEN cents END) AS med_cents,
        | min(CASE WHEN relrk >= s.r_lo THEN cents END) AS ci_lo_cents,
        | min(CASE WHEN relrk >= s.r_hi THEN cents END) AS ci_hi_cents
        |FROM rk JOIN segs s USING (seg)
        |GROUP BY 1, 2, 3, 4 ORDER BY seg""".stripMargin,
    // same exact baseline counts, same published z literals, same
    // mirrored q·q/δ² finish and ceil
    "stats_power_twoprop" ->
      """WITH base AS (SELECT CAST(count(*) AS BIGINT) AS nt,
        |   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |     AS BIGINT) AS np FROM events),
        | d AS (SELECT CAST(unnest([10000, 20000, 50000]) AS BIGINT)
        |   AS delta_e6),
        | t AS (SELECT delta_e6, nt, np,
        |    CAST(np AS DOUBLE) / CAST(nt AS DOUBLE) AS p1,
        |    CAST(np AS DOUBLE) / CAST(nt AS DOUBLE)
        |      + CAST(delta_e6 AS DOUBLE) / 1000000.0 AS p2
        |   FROM d CROSS JOIN base),
        | f AS (SELECT delta_e6, nt, np, p1, p2, (p1 + p2) / 2.0 AS pbar,
        |    1.959964 * sqrt(2.0 * ((p1 + p2) / 2.0) *
        |      (1.0 - (p1 + p2) / 2.0)) +
        |    0.841621 * sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)) AS q
        |   FROM t)
        |SELECT delta_e6, nt AS n_events, np AS n_purchase,
        | (np * 1000000) // nt AS p1_e6,
        | CAST(ceil(q * q / ((p2 - p1) * (p2 - p1))) AS BIGINT) AS n_per_arm
        |FROM f ORDER BY delta_e6""".stripMargin,
    // same one-pass cumulative moments (shift-invariant w01 trick),
    // same mirrored variance finish and ±1.96 lattice CI
    "stats_auc_delong" -> {
      val var10 = "((CAST(q10 AS DOUBLE) / CAST(p AS DOUBLE) - " +
        "(CAST(s10 AS DOUBLE) / CAST(p AS DOUBLE)) * " +
        "(CAST(s10 AS DOUBLE) / CAST(p AS DOUBLE))) * " +
        "(CAST(p AS DOUBLE) / CAST(p - 1 AS DOUBLE)) / " +
        "(4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))"
      val var01 = "((CAST(a2 AS DOUBLE) / CAST(n AS DOUBLE) - " +
        "(CAST(a1 AS DOUBLE) / CAST(n AS DOUBLE)) * " +
        "(CAST(a1 AS DOUBLE) / CAST(n AS DOUBLE))) * " +
        "(CAST(n AS DOUBLE) / CAST(n - 1 AS DOUBLE)) / " +
        "(4.0 * CAST(p AS DOUBLE) * CAST(p AS DOUBLE)))"
      val varA = s"($var10 / CAST(p AS DOUBLE) + $var01 / CAST(n AS DOUBLE))"
      val auc = "(CAST(s10 AS DOUBLE) / " +
        "(2.0 * CAST(p AS DOUBLE) * CAST(n AS DOUBLE)))"
      s"""WITH scored AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |   CASE WHEN (o_orderkey * 2654435761) % 4294967296 % 1000000
        |     < least(100000 + CAST(round(o_totalprice * 100) AS BIGINT) // 100, 900000)
        |     THEN 1 ELSE 0 END AS label
        |  FROM orders),
        | bys AS (SELECT cents, sum(label) AS pos, sum(1 - label) AS neg
        |  FROM scored GROUP BY cents),
        | run AS (SELECT pos, neg,
        |   sum(neg) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cumneg,
        |   sum(pos) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cumpos
        |  FROM bys),
        | t AS (SELECT pos, neg,
        |   2 * (cumneg - neg) + neg AS u10,
        |   2 * cumpos - pos AS w01 FROM run),
        | m AS (SELECT CAST(sum(pos) AS BIGINT) AS p,
        |   CAST(sum(neg) AS BIGINT) AS n,
        |   CAST(sum(pos * u10) AS BIGINT) AS s10,
        |   CAST(sum(pos * u10 * u10) AS BIGINT) AS q10,
        |   CAST(sum(neg * w01) AS BIGINT) AS a1,
        |   CAST(sum(neg * w01 * w01) AS BIGINT) AS a2 FROM t)
        |SELECT p AS n_pos, n AS n_neg,
        | round($auc, 6) + 0.0 AS auc,
        | CAST(round($varA * 1e12) AS BIGINT) AS var_e12,
        | CAST(round(($auc - 1.96 * sqrt($varA)) * 1e6) AS BIGINT) AS ci_lo_e6,
        | CAST(round(($auc + 1.96 * sqrt($varA)) * 1e6) AS BIGINT) AS ci_hi_e6
        |FROM m""".stripMargin
    },
    // same e12 per-row within terms, same ≤5 group-level between terms,
    // same exact share floor
    "stats_theil_decomp" ->
      """WITH recs AS (SELECT o_orderpriority AS prio,
        |   CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        | g AS (SELECT prio, CAST(count(*) AS BIGINT) AS ng,
        |    CAST(sum(cents) AS BIGINT) AS sg FROM recs GROUP BY 1),
        | tot AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
        |    CAST(sum(sg) AS BIGINT) AS st FROM g),
        | w AS (SELECT r.prio, CAST(sum(CAST(round(1e12 *
        |     (CAST(r.cents AS DOUBLE) / CAST(t.st AS DOUBLE)) *
        |     ln(CAST(r.cents AS DOUBLE) * CAST(g.ng AS DOUBLE) /
        |       CAST(g.sg AS DOUBLE))) AS BIGINT)) AS BIGINT) AS within_e12
        |  FROM recs r JOIN g USING (prio) CROSS JOIN tot t GROUP BY 1)
        |SELECT g.prio, g.ng AS n, g.sg AS cents_sum,
        | (g.sg * 1000000) // t.st AS share_e6,
        | w.within_e12,
        | CAST(round(1e12 * (CAST(g.sg AS DOUBLE) / CAST(t.st AS DOUBLE)) *
        |   ln(CAST(g.sg AS DOUBLE) * CAST(t.n AS DOUBLE) /
        |     (CAST(t.st AS DOUBLE) * CAST(g.ng AS DOUBLE)))) AS BIGINT)
        |  AS between_e12
        |FROM g CROSS JOIN tot t JOIN w USING (prio)
        |ORDER BY prio""".stripMargin,
    // same mirrored z → A&S 26.2.17 p chain, same integer BH
    // thresholds and step-up cutoff
    "stats_bh_fdr" ->
      """WITH perN AS (SELECT CAST(c_nationkey AS BIGINT) AS nk,
        |   CAST(count(*) AS BIGINT) AS n,
        |   CAST(sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |     AS k
        |  FROM customer GROUP BY 1),
        | tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
        |    CAST(sum(k) AS BIGINT) AS kt,
        |    CAST(count(*) AS BIGINT) AS m FROM perN),
        | sc AS (SELECT nk, n, k, m,
        |   abs((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
        |      - CAST(kt AS DOUBLE) / CAST(nt AS DOUBLE)) /
        |     sqrt(CAST(kt AS DOUBLE) / CAST(nt AS DOUBLE)
        |       * (1.0 - CAST(kt AS DOUBLE) / CAST(nt AS DOUBLE))
        |       / CAST(n AS DOUBLE))) AS az
        |  FROM perN CROSS JOIN tot),
        | pv AS (SELECT nk, n, k, m,
        |   CAST(round(2.0 * (0.3989422804014327 * exp(-0.5 * az * az)) *
        |     ((1.0 / (1.0 + 0.2316419 * az)) * (0.319381530
        |       + (1.0 / (1.0 + 0.2316419 * az)) * (-0.356563782
        |       + (1.0 / (1.0 + 0.2316419 * az)) * (1.781477937
        |       + (1.0 / (1.0 + 0.2316419 * az)) * (-1.821255978
        |       + (1.0 / (1.0 + 0.2316419 * az)) * 1.330274429)))))
        |    * 1e9) AS BIGINT) AS p_e9
        |  FROM sc),
        | rk AS (SELECT *, CAST(row_number() OVER (ORDER BY p_e9, nk)
        |    AS BIGINT) AS rank FROM pv),
        | th AS (SELECT *, (rank * 50000000) // m AS thresh_e9 FROM rk),
        | km AS (SELECT coalesce(max(CASE WHEN p_e9 <= thresh_e9
        |    THEN rank END), 0) AS kmax FROM th)
        |SELECT th.nk, th.n, th.k, (th.k * 1000000) // th.n AS neg_share_e6,
        | th.p_e9, th.rank, th.thresh_e9,
        | CAST(CASE WHEN th.rank <= km.kmax THEN 1 ELSE 0 END AS BIGINT)
        |   AS rejected
        |FROM th CROSS JOIN km ORDER BY rank""".stripMargin,
    // same integer |n·x − S| ranking currency, same min-key ties, same
    // single mirrored finish in the s2/n − m² form
    "stats_grubbs" ->
      """WITH recs AS (SELECT c_mktsegment, c_custkey,
        |   CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer),
        | m AS (SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(cents) AS BIGINT) AS s1,
        |    CAST(sum(cents * cents) AS BIGINT) AS s2
        |   FROM recs GROUP BY 1),
        | dev AS (SELECT r.c_mktsegment, r.c_custkey, r.cents,
        |    abs(r.cents * m.n - m.s1) AS adev
        |   FROM recs r JOIN m USING (c_mktsegment)),
        | mx AS (SELECT c_mktsegment, max(adev) AS adev FROM dev GROUP BY 1),
        | arg AS (SELECT d.c_mktsegment, d.adev,
        |    min(d.c_custkey) AS outlier_key
        |   FROM dev d JOIN mx ON d.c_mktsegment = mx.c_mktsegment
        |    AND d.adev = mx.adev
        |   GROUP BY 1, 2),
        | wit AS (SELECT a.c_mktsegment, a.adev, a.outlier_key,
        |    r.cents AS outlier_cents
        |   FROM arg a JOIN recs r ON r.c_mktsegment = a.c_mktsegment
        |    AND r.c_custkey = a.outlier_key)
        |SELECT w.c_mktsegment, m.n, w.outlier_key, w.outlier_cents, w.adev,
        | CAST(round(1e6 * (CAST(w.adev AS DOUBLE) / CAST(m.n AS DOUBLE)) /
        |   sqrt((CAST(m.s2 AS DOUBLE) / CAST(m.n AS DOUBLE) -
        |     (CAST(m.s1 AS DOUBLE) / CAST(m.n AS DOUBLE)) *
        |     (CAST(m.s1 AS DOUBLE) / CAST(m.n AS DOUBLE))) *
        |    (CAST(m.n AS DOUBLE) / CAST(m.n - 1 AS DOUBLE)))) AS BIGINT)
        |   AS g_e6
        |FROM wit w JOIN m USING (c_mktsegment)
        |ORDER BY c_mktsegment""".stripMargin,
    // same bounded-domain contingency, same cell-pair masses, one
    // mirrored tau-b
    "stats_kendall_tau_b" ->
      """WITH t AS (SELECT o_orderkey, CAST(count(*) AS BIGINT) AS x,
        |   least(max(CAST(round(o_totalprice * 100) AS BIGINT)) // 2000000,
        |     9) AS y
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  GROUP BY 1),
        | cells AS (SELECT x, y, CAST(count(*) AS BIGINT) AS c
        |  FROM t GROUP BY 1, 2),
        | conc AS (SELECT CAST(coalesce(sum(a.c * b.c), 0) AS BIGINT)
        |    AS c_cnt
        |  FROM cells a JOIN cells b ON b.x > a.x AND b.y > a.y),
        | disc AS (SELECT CAST(coalesce(sum(a.c * b.c), 0) AS BIGINT)
        |    AS d_cnt
        |  FROM cells a JOIN cells b ON b.x > a.x AND b.y < a.y),
        | nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
        | tx AS (SELECT CAST(sum(m * (m - 1) // 2) AS BIGINT) AS tx FROM
        |  (SELECT CAST(sum(c) AS BIGINT) AS m FROM cells GROUP BY x)),
        | ty AS (SELECT CAST(sum(m * (m - 1) // 2) AS BIGINT) AS ty FROM
        |  (SELECT CAST(sum(c) AS BIGINT) AS m FROM cells GROUP BY y)),
        | k AS (SELECT n, c_cnt, d_cnt, tx, ty, n * (n - 1) // 2 AS n0
        |  FROM nn, conc, disc, tx, ty)
        |SELECT n, c_cnt, d_cnt, tx, ty,
        | round((c_cnt - d_cnt)::DOUBLE
        |   / (sqrt((n0 - tx)::DOUBLE) * sqrt((n0 - ty)::DOUBLE)), 6) + 0.0
        |  AS tau_b
        |FROM k""".stripMargin,
    // same exact integer D numerator and min-cents argmax; the global
    // window replays the Prefix two-pass exactly
    "ml_ks_separation" ->
      """WITH scored AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT)
        |     AS cents,
        |   CASE WHEN (o_orderkey * 2654435761) % 4294967296 % 1000000
        |     < least(100000 + CAST(round(o_totalprice * 100) AS BIGINT) // 100, 900000)
        |     THEN 1 ELSE 0 END AS label
        |  FROM orders),
        | bs AS (SELECT cents, CAST(sum(label) AS BIGINT) AS pos,
        |   CAST(sum(1 - label) AS BIGINT) AS neg FROM scored GROUP BY 1),
        | run AS (SELECT cents,
        |   CAST(sum(pos) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
        |     AS BIGINT) AS cum_pos,
        |   CAST(sum(neg) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
        |     AS BIGINT) AS cum_neg
        |  FROM bs),
        | tots AS (SELECT max(cum_pos) AS p_tot, max(cum_neg) AS n_tot
        |  FROM run),
        | diff AS (SELECT cents,
        |   abs(cum_pos * n_tot - cum_neg * p_tot) AS dn FROM run, tots),
        | dm AS (SELECT CAST(max(dn) AS BIGINT) AS d_num FROM diff)
        |SELECT p_tot, n_tot, d_num,
        | (1000000 * d_num) // (p_tot * n_tot) AS ks_e6,
        | (SELECT CAST(min(cents) AS BIGINT) FROM diff, dm
        |   WHERE dn = d_num) AS ks_threshold_cents
        |FROM tots, dm""".stripMargin,
    // same published z_e6 constants, same lower-order-statistic ranks,
    // same dollar moments — one mirrored double per theoretical decile
    "stats_qq_normal" ->
      """WITH t AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT)
        |     AS cents FROM orders),
        | mom AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |   CAST(sum(cents // 100) AS BIGINT) AS s1,
        |   CAST(sum((cents // 100) * (cents // 100)) AS BIGINT) AS s2
        |  FROM t),
        | vc AS (SELECT cents, CAST(count(*) AS BIGINT) AS cnt
        |  FROM t GROUP BY 1),
        | pf AS (SELECT cents, CAST(sum(cnt) OVER (ORDER BY cents
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM vc),
        | picks AS (SELECT
        |   min(CASE WHEN cum >= ((n - 1) * 1) // 10 + 1 THEN cents END) AS e1,
        |   min(CASE WHEN cum >= ((n - 1) * 2) // 10 + 1 THEN cents END) AS e2,
        |   min(CASE WHEN cum >= ((n - 1) * 3) // 10 + 1 THEN cents END) AS e3,
        |   min(CASE WHEN cum >= ((n - 1) * 4) // 10 + 1 THEN cents END) AS e4,
        |   min(CASE WHEN cum >= ((n - 1) * 5) // 10 + 1 THEN cents END) AS e5,
        |   min(CASE WHEN cum >= ((n - 1) * 6) // 10 + 1 THEN cents END) AS e6,
        |   min(CASE WHEN cum >= ((n - 1) * 7) // 10 + 1 THEN cents END) AS e7,
        |   min(CASE WHEN cum >= ((n - 1) * 8) // 10 + 1 THEN cents END) AS e8,
        |   min(CASE WHEN cum >= ((n - 1) * 9) // 10 + 1 THEN cents END) AS e9,
        |   max(n) AS n, max(s1) AS s1, max(s2) AS s2
        |  FROM pf, mom),
        | longf AS (
        |  SELECT 10 AS p, e1 AS emp_cents, -1281552 AS z_e6, n, s1, s2 FROM picks
        |  UNION ALL SELECT 20, e2, -841621, n, s1, s2 FROM picks
        |  UNION ALL SELECT 30, e3, -524401, n, s1, s2 FROM picks
        |  UNION ALL SELECT 40, e4, -253347, n, s1, s2 FROM picks
        |  UNION ALL SELECT 50, e5, 0, n, s1, s2 FROM picks
        |  UNION ALL SELECT 60, e6, 253347, n, s1, s2 FROM picks
        |  UNION ALL SELECT 70, e7, 524401, n, s1, s2 FROM picks
        |  UNION ALL SELECT 80, e8, 841621, n, s1, s2 FROM picks
        |  UNION ALL SELECT 90, e9, 1281552, n, s1, s2 FROM picks)
        |SELECT CAST(p AS BIGINT) AS p, n, emp_cents,
        | CAST(z_e6 AS BIGINT) AS z_e6,
        | round(s1::DOUBLE / n::DOUBLE + z_e6::DOUBLE / 1e6
        |   * sqrt(s2::DOUBLE / n::DOUBLE
        |      - (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE)), 2)
        |  + 0.0 AS theo_usd
        |FROM longf ORDER BY p""".stripMargin,
    // same hundred-dollar floor lattice, same raw-moment identities,
    // one mirrored double expression per shape statistic
    "stats_moments_profile" ->
      """WITH t AS (SELECT o_orderpriority,
        |   CAST(round(o_totalprice * 100) AS BIGINT) // 100000 AS x
        |  FROM orders),
        | g AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |   CAST(sum(x) AS BIGINT) AS s1,
        |   CAST(sum(x * x) AS BIGINT) AS s2,
        |   CAST(sum(x * x * x) AS BIGINT) AS s3,
        |   CAST(sum(x * x * x * x) AS BIGINT) AS s4
        |  FROM t GROUP BY 1),
        | m AS (SELECT *, s1::DOUBLE / n::DOUBLE AS mu,
        |   s2::DOUBLE / n::DOUBLE - (s1::DOUBLE / n::DOUBLE)
        |     * (s1::DOUBLE / n::DOUBLE) AS m2,
        |   s3::DOUBLE / n::DOUBLE
        |    - 3.0 * (s1::DOUBLE / n::DOUBLE) * s2::DOUBLE / n::DOUBLE
        |    + 2.0 * (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE)
        |      * (s1::DOUBLE / n::DOUBLE) AS m3,
        |   s4::DOUBLE / n::DOUBLE
        |    - 4.0 * (s1::DOUBLE / n::DOUBLE) * s3::DOUBLE / n::DOUBLE
        |    + 6.0 * (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE)
        |      * s2::DOUBLE / n::DOUBLE
        |    - 3.0 * (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE)
        |      * (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE) AS m4
        |  FROM g)
        |SELECT o_orderpriority, n, s1, s2, s3, s4,
        | round(m3 / pow(m2, 1.5), 6) + 0.0 AS skewness,
        | round(m4 / (m2 * m2) - 3.0, 6) + 0.0 AS ex_kurtosis
        |FROM m ORDER BY o_orderpriority""".stripMargin,
    // four exact cells, one mirrored double finish
    "stats_did" ->
      """WITH t AS (SELECT
        |   CASE WHEN c_nationkey % 2 = 0 THEN 1 ELSE 0 END AS treated,
        |   CASE WHEN CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        |     THEN 1 ELSE 0 END AS post,
        |   CAST(round(o_totalprice) AS BIGINT) AS x
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        | g AS (SELECT
        |   CAST(sum(CASE WHEN treated = 1 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t1,
        |   CAST(sum(CASE WHEN treated = 1 AND post = 1 THEN x ELSE 0 END) AS BIGINT) AS s_t1,
        |   CAST(sum(CASE WHEN treated = 1 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_t0,
        |   CAST(sum(CASE WHEN treated = 1 AND post = 0 THEN x ELSE 0 END) AS BIGINT) AS s_t0,
        |   CAST(sum(CASE WHEN treated = 0 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_c1,
        |   CAST(sum(CASE WHEN treated = 0 AND post = 1 THEN x ELSE 0 END) AS BIGINT) AS s_c1,
        |   CAST(sum(CASE WHEN treated = 0 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c0,
        |   CAST(sum(CASE WHEN treated = 0 AND post = 0 THEN x ELSE 0 END) AS BIGINT) AS s_c0
        |  FROM t)
        |SELECT n_t1, s_t1, n_t0, s_t0, n_c1, s_c1, n_c0, s_c0,
        | round((s_t1::DOUBLE / n_t1::DOUBLE - s_t0::DOUBLE / n_t0::DOUBLE)
        |   - (s_c1::DOUBLE / n_c1::DOUBLE - s_c0::DOUBLE / n_c0::DOUBLE), 4)
        |   + 0.0 AS did
        |FROM g""".stripMargin,
    // same planted teacher and published decision rule; rates, the
    // conditional pair, and the DI ratio all replay on e6 lattices
    "ml_fairness_audit" ->
      """WITH scored AS (SELECT o_orderkey, o_custkey,
        |   CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |   CASE WHEN (o_orderkey * 2654435761) % 4294967296 % 1000000
        |     < least(100000 + CAST(round(o_totalprice * 100) AS BIGINT) // 100,
        |       900000)
        |     THEN 1 ELSE 0 END AS label
        |  FROM orders),
        | t AS (SELECT c_mktsegment,
        |    CASE WHEN cents >= 20000000 THEN 1 ELSE 0 END AS dec, label
        |  FROM scored JOIN customer ON o_custkey = c_custkey),
        | g AS (SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(dec) AS BIGINT) AS n_pos_dec,
        |    CAST(sum(dec * label) AS BIGINT) AS tp,
        |    CAST(sum(dec * (1 - label)) AS BIGINT) AS fp,
        |    CAST(sum(label) AS BIGINT) AS n_pos_label
        |  FROM t GROUP BY 1),
        | r AS (SELECT *,
        |    CAST((n_pos_dec * 1000000) // n AS BIGINT) AS rate_e6,
        |    CAST(CASE WHEN n_pos_label = 0 THEN -1
        |      ELSE (tp * 1000000) // n_pos_label END AS BIGINT) AS tpr_e6,
        |    CAST(CASE WHEN n = n_pos_label THEN -1
        |      ELSE (fp * 1000000) // (n - n_pos_label) END AS BIGINT)
        |      AS fpr_e6
        |  FROM g),
        | mx AS (SELECT max(rate_e6) AS max_rate_e6 FROM r)
        |SELECT c_mktsegment, n, n_pos_dec, rate_e6, tpr_e6, fpr_e6,
        | CAST((rate_e6 * 1000000) // max_rate_e6 AS BIGINT) AS di_e6
        |FROM r CROSS JOIN mx ORDER BY c_mktsegment""".stripMargin,
    // tie-correct tail algebra: the cutoff row contributes cum-k+1
    // copies; the oracle's per-segment window replays the Prefix
    // offsets exactly
    "stats_cvar_segment" ->
      """WITH t AS (SELECT o_orderpriority AS grp,
        |   CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        | byv AS (SELECT grp, cents, CAST(count(*) AS BIGINT) AS c
        |  FROM t GROUP BY 1, 2),
        | run AS (SELECT grp, cents, c, c * cents AS vc,
        |    CAST(sum(c) OVER (PARTITION BY grp ORDER BY cents
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_in,
        |    CAST(sum(c * cents) OVER (PARTITION BY grp ORDER BY cents
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vw_in
        |  FROM byv),
        | seg AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n_g,
        |    CAST(sum(c * cents) AS BIGINT) AS sum_g,
        |    CAST((19 * sum(c) + 19) // 20 AS BIGINT) AS k_order
        |  FROM byv GROUP BY 1),
        | cut AS (SELECT run.grp, min(cents) AS var_cents
        |  FROM run JOIN seg ON run.grp = seg.grp
        |  WHERE cum_in >= k_order GROUP BY 1),
        | at AS (SELECT run.grp, run.cum_in AS cum_at, run.vw_in AS vw_at,
        |    cut.var_cents
        |  FROM run JOIN cut ON run.grp = cut.grp
        |   AND run.cents = cut.var_cents)
        |SELECT seg.grp, n_g AS n, k_order, var_cents,
        | CAST(n_g - k_order + 1 AS BIGINT) AS n_tail,
        | CAST(sum_g - vw_at + var_cents * (cum_at - k_order + 1) AS BIGINT)
        |   AS tail_sum_c,
        | CAST((sum_g - vw_at + var_cents * (cum_at - k_order + 1)) * 100
        |   // (n_g - k_order + 1) AS BIGINT) AS es_c_e2
        |FROM seg JOIN at ON seg.grp = at.grp ORDER BY seg.grp""".stripMargin,
    // the sweep's FP/FN identities and the (cost, threshold) argmin
    // replay over the same running sums
    "ml_cost_threshold" ->
      """WITH scored AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |   CASE WHEN (o_orderkey * 2654435761) % 4294967296 % 1000000
        |     < least(100000 + CAST(round(o_totalprice * 100) AS BIGINT) // 100,
        |       900000)
        |     THEN 1 ELSE 0 END AS label
        |  FROM orders),
        | byv AS (SELECT cents, CAST(sum(label) AS BIGINT) AS pos,
        |    CAST(sum(1 - label) AS BIGINT) AS neg
        |  FROM scored GROUP BY 1),
        | run AS (SELECT cents, pos, neg,
        |    CAST(sum(pos) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cumpos,
        |    CAST(sum(neg) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cumneg
        |  FROM byv),
        | tot AS (SELECT CAST(sum(pos) AS BIGINT) AS p_tot,
        |    CAST(sum(neg) AS BIGINT) AS n_tot FROM byv),
        | sw AS (SELECT cents, n_tot - cumneg + neg AS fp,
        |    cumpos - pos AS fn,
        |    (n_tot - cumneg + neg) + 5 * (cumpos - pos) AS cost
        |  FROM run CROSS JOIN tot),
        | best AS (SELECT cents AS threshold_cents, fp, fn, cost FROM sw
        |  ORDER BY cost ASC, cents ASC LIMIT 1)
        |SELECT threshold_cents, CAST(fp AS BIGINT) AS fp,
        | CAST(fn AS BIGINT) AS fn, CAST(cost AS BIGINT) AS cost,
        | CAST(5 * p_tot AS BIGINT) AS all_negative_cost,
        | CAST(n_tot AS BIGINT) AS all_positive_cost
        |FROM best CROSS JOIN tot""".stripMargin,
    // customer-grain counts then priority-grain moments; the v > m
    // branch and the -1 sentinel mirror exactly
    "stats_overdispersion" ->
      """WITH c AS (SELECT o_orderpriority AS grp, o_custkey,
        |   CAST(count(*) AS BIGINT) AS k FROM orders GROUP BY 1, 2),
        | g AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_cust,
        |    CAST(sum(k) AS BIGINT) AS sk,
        |    CAST(sum(k * k) AS BIGINT) AS skk
        |  FROM c GROUP BY 1),
        | f AS (SELECT *, sk::DOUBLE / n_cust::DOUBLE AS m,
        |    (skk::DOUBLE - sk::DOUBLE * sk::DOUBLE / n_cust::DOUBLE)
        |      / (n_cust::DOUBLE - 1.0) AS v
        |  FROM g)
        |SELECT grp, n_cust, sk, skk,
        | round(m, 6) + 0.0 AS mean_k,
        | round(v, 6) + 0.0 AS var_k,
        | round(v / m, 6) + 0.0 AS dispersion,
        | CASE WHEN v > m THEN round(m * m / (v - m), 6) + 0.0
        |   ELSE -1.0 END AS nb_r
        |FROM f ORDER BY grp""".stripMargin,
    // the replicate dimension unnests oracle-side; weights, the running
    // negatives, and the weighted U identity replay exactly
    "ml_auc_bootstrap" ->
      """WITH scored AS (SELECT o_orderkey,
        |   CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |   CASE WHEN (o_orderkey * 2654435761) % 4294967296 % 1000000
        |     < least(100000 + CAST(round(o_totalprice * 100) AS BIGINT) // 100,
        |       900000)
        |     THEN 1 ELSE 0 END AS label
        |  FROM orders),
        | reps AS (SELECT CAST(unnest(range(0, 16)) AS BIGINT) AS rep),
        | wtd AS (SELECT rep, cents, label,
        |    CASE WHEN u < 385749 THEN 0 WHEN u < 771499 THEN 1
        |      WHEN u < 964373 THEN 2 WHEN u < 1028665 THEN 3
        |      WHEN u < 1044738 THEN 4 ELSE 5 END AS w
        |  FROM (SELECT rep, cents, label,
        |     ((o_orderkey % 1048576 + rep * 7919) * 2654435761) % 1048576 AS u
        |    FROM scored CROSS JOIN reps)),
        | byv AS (SELECT rep, cents, CAST(sum(w * label) AS BIGINT) AS pos,
        |    CAST(sum(w * (1 - label)) AS BIGINT) AS neg
        |  FROM wtd GROUP BY 1, 2),
        | run AS (SELECT rep, pos, neg, sum(neg) OVER (PARTITION BY rep
        |    ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cumneg
        |  FROM byv)
        |SELECT rep, CAST(sum(pos) AS BIGINT) AS n_pos_w,
        | CAST(sum(neg) AS BIGINT) AS n_neg_w,
        | CAST((CAST(sum(pos * (cumneg - neg) * 2 + pos * neg) AS BIGINT)
        |   * 500000) // (CAST(sum(pos) AS BIGINT) * CAST(sum(neg) AS BIGINT))
        |   AS BIGINT) AS auc_e6
        |FROM run GROUP BY rep ORDER BY rep""".stripMargin,
    // six exact moments, then ONE mirrored double expression per
    // emitted statistic — sample (co)variances use the n-1 form
    "stats_ratio_delta_ci" ->
      """WITH items AS (SELECT l_orderkey AS o_orderkey,
        |   CAST(count(*) AS BIGINT) AS y FROM lineitem GROUP BY 1),
        | t AS (SELECT o_orderpriority AS grp,
        |    CAST(round(o_totalprice) AS BIGINT) AS x, y
        |  FROM orders JOIN items USING (o_orderkey)),
        | g AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM t GROUP BY 1),
        | f AS (SELECT *,
        |    sx::DOUBLE / sy::DOUBLE AS r,
        |    (sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n::DOUBLE)
        |      / (n::DOUBLE - 1.0) AS vxx,
        |    (syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n::DOUBLE)
        |      / (n::DOUBLE - 1.0) AS vyy,
        |    (sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE / n::DOUBLE)
        |      / (n::DOUBLE - 1.0) AS vxy,
        |    sy::DOUBLE / n::DOUBLE AS ybar
        |  FROM g),
        | z AS (SELECT *,
        |    sqrt((vxx - 2.0 * r * vxy + r * r * vyy) / n::DOUBLE) / ybar AS se
        |  FROM f)
        |SELECT grp, n, sx, sy,
        | CAST((1000000 * sx) // sy AS BIGINT) AS ratio_e6,
        | round(se, 6) + 0.0 AS se,
        | round(r - 1.96 * se, 6) + 0.0 AS lo,
        | round(r + 1.96 * se, 6) + 0.0 AS hi
        |FROM z ORDER BY grp""".stripMargin,
    // per-row reciprocals are integer floor-divisions — deterministic
    // on any engine; the only double is the final RMS sqrt
    "agg_mean_family" ->
      """WITH t AS (SELECT o_orderpriority AS grp,
        |   CAST(round(o_totalprice) AS BIGINT) AS x FROM orders),
        | r AS (SELECT grp, x, 1000000000000 // x AS r FROM t),
        | g AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(r) AS BIGINT) AS sr
        |  FROM r GROUP BY 1)
        |SELECT grp, n, sx,
        | CAST((100 * sx) // n AS BIGINT) AS am_e2,
        | CAST((n * 1000000000000) // sr AS BIGINT) AS hm_e0,
        | CAST((100 * sxx) // sx AS BIGINT) AS chm_e2,
        | round(sqrt(sxx::DOUBLE / n::DOUBLE), 4) + 0.0 AS rms
        |FROM g ORDER BY grp""".stripMargin,
    // same planted teacher as ml_auc_exact; smoothing constants and the
    // ln expression mirrored exactly, one rounded double per bin
    "ml_woe_bins" ->
      """WITH scored AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |   CASE WHEN (o_orderkey * 2654435761) % 4294967296 % 1000000
        |     < least(100000 + CAST(round(o_totalprice * 100) AS BIGINT) // 100, 900000)
        |     THEN 1 ELSE 0 END AS label
        |  FROM orders),
        | b AS (SELECT least(cents // 10000000, 5) AS bin,
        |    CAST(sum(label) AS BIGINT) AS pos,
        |    CAST(sum(1 - label) AS BIGINT) AS neg
        |  FROM scored GROUP BY 1),
        | tot AS (SELECT CAST(sum(pos) AS BIGINT) AS p_tot,
        |    CAST(sum(neg) AS BIGINT) AS n_tot FROM b)
        |SELECT bin, pos, neg,
        | round(ln(((pos + 1)::DOUBLE / (p_tot + 6)::DOUBLE)
        |   / ((neg + 1)::DOUBLE / (n_tot + 6)::DOUBLE)), 6) + 0.0 AS woe,
        | round(((pos + 1)::DOUBLE / (p_tot + 6)::DOUBLE
        |     - (neg + 1)::DOUBLE / (n_tot + 6)::DOUBLE)
        |   * ln(((pos + 1)::DOUBLE / (p_tot + 6)::DOUBLE)
        |     / ((neg + 1)::DOUBLE / (n_tot + 6)::DOUBLE)), 6) + 0.0 AS iv_term
        |FROM b CROSS JOIN tot ORDER BY bin""".stripMargin,
    // identical per-group lattice rounding BEFORE the cross-group sum —
    // the only float sums are over pre-rounded BIGINTs in both engines
    "stats_anova_f" ->
      """WITH t AS (SELECT o_orderpriority AS grp,
        |   CAST(round(o_totalprice) AS BIGINT) AS x FROM orders),
        | g AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_g,
        |    CAST(sum(x) AS BIGINT) AS s_g FROM t GROUP BY 1),
        | gt AS (SELECT grp, CAST(round(s_g::DOUBLE * s_g::DOUBLE
        |    / n_g::DOUBLE / 1000.0) AS BIGINT) AS term FROM g),
        | tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total,
        |    CAST(sum(x) AS BIGINT) AS s_all,
        |    CAST(sum(x * x) AS BIGINT) AS ssq FROM t),
        | a AS (SELECT CAST(count(*) AS BIGINT) AS k_groups,
        |    CAST(sum(term) AS BIGINT) AS bt FROM gt),
        | f AS (SELECT k_groups, n_total,
        |    bt - CAST(round(s_all::DOUBLE * s_all::DOUBLE
        |      / n_total::DOUBLE / 1000.0) AS BIGINT) AS ssb_k,
        |    CAST(round(ssq::DOUBLE / 1000.0) AS BIGINT) - bt AS ssw_k
        |  FROM a CROSS JOIN tot)
        |SELECT k_groups, n_total, ssb_k, ssw_k,
        | round((ssb_k::DOUBLE / (k_groups - 1)::DOUBLE)
        |   / (ssw_k::DOUBLE / (n_total - k_groups)::DOUBLE), 6) + 0.0
        |  AS f_stat
        |FROM f""".stripMargin,
    // nested hash bands, one window cumsum, four tie-aware doubled Us
    "ml_learning_curve_frozen" ->
      """WITH s AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |   CASE WHEN (o_orderkey * 2654435761) % 4294967296 % 1000000
        |     < least(100000 + CAST(round(o_totalprice * 100) AS BIGINT) // 100, 900000)
        |     THEN 1 ELSE 0 END AS label,
        |   (o_orderkey * 2246822519) % 4294967296 % 100 AS band
        |  FROM orders),
        | g AS (SELECT cents,
        |   CAST(sum(CASE WHEN band < 25 AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS p25,
        |   CAST(sum(CASE WHEN band < 25 AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS g25,
        |   CAST(sum(CASE WHEN band < 50 AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS p50,
        |   CAST(sum(CASE WHEN band < 50 AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS g50,
        |   CAST(sum(CASE WHEN band < 75 AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS p75,
        |   CAST(sum(CASE WHEN band < 75 AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS g75,
        |   CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS p100,
        |   CAST(sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS g100
        |  FROM s GROUP BY 1),
        | r AS (SELECT *,
        |   CAST(sum(g25) OVER (ORDER BY cents) AS BIGINT) AS c25,
        |   CAST(sum(g50) OVER (ORDER BY cents) AS BIGINT) AS c50,
        |   CAST(sum(g75) OVER (ORDER BY cents) AS BIGINT) AS c75,
        |   CAST(sum(g100) OVER (ORDER BY cents) AS BIGINT) AS c100
        |  FROM g),
        | a AS (SELECT
        |   CAST(sum(p25) AS BIGINT) AS np25, CAST(sum(g25) AS BIGINT) AS nn25,
        |   CAST(sum(p25 * ((c25 - g25) * 2 + g25)) AS BIGINT) AS u25,
        |   CAST(sum(p50) AS BIGINT) AS np50, CAST(sum(g50) AS BIGINT) AS nn50,
        |   CAST(sum(p50 * ((c50 - g50) * 2 + g50)) AS BIGINT) AS u50,
        |   CAST(sum(p75) AS BIGINT) AS np75, CAST(sum(g75) AS BIGINT) AS nn75,
        |   CAST(sum(p75 * ((c75 - g75) * 2 + g75)) AS BIGINT) AS u75,
        |   CAST(sum(p100) AS BIGINT) AS np100, CAST(sum(g100) AS BIGINT) AS nn100,
        |   CAST(sum(p100 * ((c100 - g100) * 2 + g100)) AS BIGINT) AS u100
        |  FROM r)
        |SELECT * FROM (
        | SELECT CAST(25 AS BIGINT) AS frac, np25 AS n_pos, nn25 AS n_neg,
        |  round(u25::DOUBLE / (np25::DOUBLE * nn25::DOUBLE * 2.0), 6) + 0.0 AS auc FROM a
        | UNION ALL SELECT 50, np50, nn50,
        |  round(u50::DOUBLE / (np50::DOUBLE * nn50::DOUBLE * 2.0), 6) + 0.0 FROM a
        | UNION ALL SELECT 75, np75, nn75,
        |  round(u75::DOUBLE / (np75::DOUBLE * nn75::DOUBLE * 2.0), 6) + 0.0 FROM a
        | UNION ALL SELECT 100, np100, nn100,
        |  round(u100::DOUBLE / (np100::DOUBLE * nn100::DOUBLE * 2.0), 6) + 0.0 FROM a)
        |ORDER BY frac""".stripMargin,
    // same lower-median convention, same z = |v - med| div 100 lattice,
    // same per-group 10^3 rounding before the cross-group sum
    "stats_levene_bf" ->
      """WITH t AS (SELECT o_orderpriority AS grp,
        |   CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
        | vc AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS cnt FROM t
        |  GROUP BY 1, 2),
        | wc AS (SELECT *, CAST(sum(cnt) OVER (PARTITION BY grp ORDER BY v)
        |    AS BIGINT) AS cum FROM vc),
        | ng AS (SELECT grp, CAST(sum(cnt) AS BIGINT) AS n_g FROM vc
        |  GROUP BY 1),
        | med AS (SELECT wc.grp, CAST(min(v) AS BIGINT) AS med_c
        |  FROM wc JOIN ng ON wc.grp = ng.grp
        |  WHERE cum >= (n_g + 1) // 2 GROUP BY 1),
        | z AS (SELECT t.grp, abs(v - med_c) // 100 AS x
        |  FROM t JOIN med ON t.grp = med.grp),
        | g AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_g,
        |    CAST(sum(x) AS BIGINT) AS s_g FROM z GROUP BY 1),
        | gt AS (SELECT grp, CAST(round(s_g::DOUBLE * s_g::DOUBLE
        |    / n_g::DOUBLE / 1000.0) AS BIGINT) AS term FROM g),
        | tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total,
        |    CAST(sum(x) AS BIGINT) AS s_all,
        |    CAST(sum(x * x) AS BIGINT) AS ssq FROM z),
        | a AS (SELECT CAST(count(*) AS BIGINT) AS k_groups,
        |    CAST(sum(term) AS BIGINT) AS bt FROM gt),
        | f AS (SELECT k_groups, n_total,
        |    bt - CAST(round(s_all::DOUBLE * s_all::DOUBLE
        |      / n_total::DOUBLE / 1000.0) AS BIGINT) AS ssb_k,
        |    CAST(round(ssq::DOUBLE / 1000.0) AS BIGINT) - bt AS ssw_k
        |  FROM a CROSS JOIN tot)
        |SELECT k_groups, n_total, ssb_k, ssw_k,
        | round((ssb_k::DOUBLE / (k_groups - 1)::DOUBLE)
        |   / (ssw_k::DOUBLE / (n_total - k_groups)::DOUBLE), 6) + 0.0
        |  AS f_stat
        |FROM f""".stripMargin,
    // doubled midranks keep ties integer; per-group between-terms round
    // onto the 10^3 lattice BEFORE the cross-group sum (anova discipline)
    "stats_kruskal_wallis" ->
      """WITH t AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
        |   o_orderpriority AS grp FROM orders),
        | g AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt,
        |   CAST(sum(CASE WHEN grp = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |   CAST(sum(CASE WHEN grp = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |   CAST(sum(CASE WHEN grp = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS c2,
        |   CAST(sum(CASE WHEN grp = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS c3,
        |   CAST(sum(CASE WHEN grp = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS c4
        |  FROM t GROUP BY 1),
        | r AS (SELECT *, CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) * 2
        |    - cnt + 1 AS r2 FROM g),
        | a AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total,
        |   CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_term,
        |   CAST(sum(c0) AS BIGINT) AS n_g0, CAST(sum(c0 * r2) AS BIGINT) AS r2_g0,
        |   CAST(sum(c1) AS BIGINT) AS n_g1, CAST(sum(c1 * r2) AS BIGINT) AS r2_g1,
        |   CAST(sum(c2) AS BIGINT) AS n_g2, CAST(sum(c2 * r2) AS BIGINT) AS r2_g2,
        |   CAST(sum(c3) AS BIGINT) AS n_g3, CAST(sum(c3 * r2) AS BIGINT) AS r2_g3,
        |   CAST(sum(c4) AS BIGINT) AS n_g4, CAST(sum(c4 * r2) AS BIGINT) AS r2_g4
        |  FROM r),
        | b AS (SELECT *,
        |   CAST(round(r2_g0::DOUBLE * r2_g0::DOUBLE / (n_g0::DOUBLE * 4000.0)) AS BIGINT)
        |   + CAST(round(r2_g1::DOUBLE * r2_g1::DOUBLE / (n_g1::DOUBLE * 4000.0)) AS BIGINT)
        |   + CAST(round(r2_g2::DOUBLE * r2_g2::DOUBLE / (n_g2::DOUBLE * 4000.0)) AS BIGINT)
        |   + CAST(round(r2_g3::DOUBLE * r2_g3::DOUBLE / (n_g3::DOUBLE * 4000.0)) AS BIGINT)
        |   + CAST(round(r2_g4::DOUBLE * r2_g4::DOUBLE / (n_g4::DOUBLE * 4000.0)) AS BIGINT)
        |   AS bt_k FROM a)
        |SELECT n_total, tie_term, bt_k,
        | round((12.0 / (n_total::DOUBLE * (n_total::DOUBLE + 1.0))
        |     * (bt_k::DOUBLE * 1000.0) - 3.0 * (n_total::DOUBLE + 1.0))
        |   / (1.0 - tie_term::DOUBLE
        |     / (n_total::DOUBLE * n_total::DOUBLE * n_total::DOUBLE
        |       - n_total::DOUBLE)), 6) + 0.0 AS h_stat,
        | n_g0, r2_g0, n_g1, r2_g1, n_g2, r2_g2, n_g3, r2_g3, n_g4, r2_g4
        |FROM b""".stripMargin,
    "stats_mann_whitney" ->
      """WITH t AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
        |   o_orderpriority = '1-URGENT' AS is_a
        |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        | g AS (SELECT v,
        |    CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM t GROUP BY 1),
        | r AS (SELECT *, CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS cum
        |  FROM g),
        | a AS (SELECT CAST(sum(cnt_a) AS BIGINT) AS n_a,
        |    CAST(sum(cnt - cnt_a) AS BIGINT) AS n_b,
        |    CAST(sum(cnt_a * (2 * cum - cnt + 1)) AS BIGINT) AS r2_a,
        |    CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_term
        |  FROM r)
        |SELECT n_a, n_b,
        | r2_a - n_a * (n_a + 1) AS u2_a,
        | 2 * n_a * n_b - (r2_a - n_a * (n_a + 1)) AS u2_b,
        | tie_term,
        | round((CAST(r2_a - n_a * (n_a + 1) AS DOUBLE) / 2.0
        |    - n_a::DOUBLE * n_b::DOUBLE / 2.0)
        |  / sqrt(n_a::DOUBLE * n_b::DOUBLE / 12.0
        |    * ((n_a + n_b)::DOUBLE + 1.0 - tie_term::DOUBLE
        |      / ((n_a + n_b)::DOUBLE * ((n_a + n_b)::DOUBLE - 1.0)))), 4)
        |   + 0.0 AS z
        |FROM a""".stripMargin,
    "stats_jsd" ->
      """WITH t AS (SELECT CAST(round(l_quantity) AS BIGINT) AS qty,
        |   l_returnflag = 'R' AS is_a
        |  FROM lineitem WHERE l_returnflag IN ('R', 'A')),
        | g AS (SELECT qty,
        |    CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
        |    CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS c_b
        |  FROM t GROUP BY 1),
        | tot AS (SELECT CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT)
        |     AS n_a,
        |    CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
        |  FROM t)
        |SELECT qty, c_a, c_b,
        | round(
        |   (CASE WHEN c_a > 0 THEN (c_a::DOUBLE / n_a::DOUBLE) / 2.0
        |      * ln((c_a::DOUBLE / n_a::DOUBLE)
        |        / ((c_a::DOUBLE / n_a::DOUBLE + c_b::DOUBLE / n_b::DOUBLE) / 2.0))
        |     ELSE 0.0 END)
        |   + (CASE WHEN c_b > 0 THEN (c_b::DOUBLE / n_b::DOUBLE) / 2.0
        |      * ln((c_b::DOUBLE / n_b::DOUBLE)
        |        / ((c_a::DOUBLE / n_a::DOUBLE + c_b::DOUBLE / n_b::DOUBLE) / 2.0))
        |     ELSE 0.0 END), 6) + 0.0 AS js_term
        |FROM g CROSS JOIN tot ORDER BY qty""".stripMargin,
    // identical integer kernel over the identical frozen grid — any
    // rounding or support-boundary slip breaks the hash
    "stats_kde_grid" ->
      """WITH grid AS (SELECT 12500 * CAST(j AS BIGINT) AS g
        |   FROM generate_series(0, 40) AS t(j)),
        | x AS (SELECT CAST(round(o_totalprice) AS BIGINT) AS x FROM orders)
        |SELECT g, CAST(count(*) AS BIGINT) AS n_support,
        | CAST(sum(625000000 - (x - g) * (x - g)) AS BIGINT) AS kde_num
        |FROM x JOIN grid ON abs(x - g) < 25000
        |GROUP BY g ORDER BY g""".stripMargin,
    "agg_trimmed_mean" ->
      """WITH h AS (SELECT l_returnflag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
        |    CAST(count(*) AS BIGINT) AS cnt FROM lineitem GROUP BY 1, 2),
        | c AS (SELECT l_returnflag, cents, cnt,
        |    CAST(coalesce(sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS cum_before,
        |    CAST(sum(cnt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
        |   FROM h),
        | kc AS (SELECT *, n // 10 AS k,
        |    greatest(0, least(cum_before + cnt, n - n // 10)
        |      - greatest(cum_before + 1, n // 10 + 1) + 1) AS kept
        |   FROM c),
        | a AS (SELECT l_returnflag, max(n) AS n_total, max(k) AS k,
        |    CAST(sum(kept * cents) AS BIGINT) AS trim_sum_c,
        |    CAST(sum(kept) AS BIGINT) AS n_kept,
        |    max(CASE WHEN cum_before < k + 1 AND k + 1 <= cum_before + cnt
        |      THEN cents END) AS lo_c,
        |    max(CASE WHEN cum_before < n - k AND n - k <= cum_before + cnt
        |      THEN cents END) AS hi_c
        |   FROM kc GROUP BY 1)
        |SELECT l_returnflag, CAST(n_total AS BIGINT) AS n_total, n_kept,
        | lo_c, hi_c, trim_sum_c,
        | CAST(trim_sum_c + k * (lo_c + hi_c) AS BIGINT) AS winsor_sum_c,
        | round(trim_sum_c::DOUBLE / n_kept / 100, 4) + 0.0 AS trimmed_mean,
        | round((trim_sum_c + k * (lo_c + hi_c))::DOUBLE / n_total / 100, 4) + 0.0
        |   AS winsor_mean
        |FROM a ORDER BY l_returnflag""".stripMargin,
    "agg_largest_remainder" ->
      """WITH rev AS (SELECT c_nationkey,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
        |   FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1),
        | tot AS (SELECT CAST(sum(rev_c) AS BIGINT) AS total_c FROM rev),
        | b AS (SELECT c_nationkey, rev_c,
        |    (10000 * rev_c) // total_c AS base_bps,
        |    10000 * rev_c - ((10000 * rev_c) // total_c) * total_c AS rem
        |   FROM rev, tot),
        | l AS (SELECT 10000 - CAST(sum(base_bps) AS BIGINT) AS leftover FROM b),
        | r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, c_nationkey ASC)
        |   AS rk FROM b)
        |SELECT c_nationkey, rev_c, CAST(base_bps AS BIGINT) AS base_bps,
        | CAST(base_bps + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
        |   AS bps
        |FROM r, l ORDER BY c_nationkey""".stripMargin,
    "agg_theil_segment" ->
      """WITH rev AS (
        |  SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY o_custkey),
        |j AS (SELECT c_mktsegment, x FROM rev
        |      JOIN customer ON o_custkey = c_custkey),
        |tot AS (SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS xs FROM j GROUP BY c_mktsegment),
        |terms AS (SELECT j.c_mktsegment, n, xs,
        |    CASE WHEN x > 0 THEN CAST(round(
        |      1e9 * (CAST(x AS DOUBLE) / xs) * ln(n * (CAST(x AS DOUBLE) / xs))) AS BIGINT)
        |    ELSE 0 END AS t_e9
        |  FROM j JOIN tot ON j.c_mktsegment = tot.c_mktsegment)
        |SELECT c_mktsegment, any_value(n) AS n_customers,
        |  any_value(xs) AS total_cents,
        |  CAST(sum(t_e9) AS BIGINT) AS theil_e9,
        |  round(sum(t_e9) / 1e9, 6) + 0.0 AS theil
        |FROM terms GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "ml_pr_curve" ->
      """WITH scored AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |   CASE WHEN (o_orderkey * 2654435761) % 4294967296 % 1000000
        |     < least(100000 + CAST(round(o_totalprice * 100) AS BIGINT) // 100, 900000)
        |     THEN 1 ELSE 0 END AS label
        |  FROM orders),
        | bys AS (SELECT cents, CAST(sum(label) AS BIGINT) AS pos,
        |   CAST(sum(1 - label) AS BIGINT) AS neg FROM scored GROUP BY cents),
        | b AS (SELECT min(cents) AS mn, max(cents) AS mx,
        |   CAST(sum(pos) AS BIGINT) AS np FROM bys),
        | th AS (SELECT CAST(j AS BIGINT) AS j,
        |   mn + (j * (mx - mn)) // 20 AS t, np
        |  FROM b CROSS JOIN (SELECT unnest(range(1, 20)) AS j)),
        | g AS (SELECT j, t, np,
        |   CAST(sum(CASE WHEN cents >= t THEN pos ELSE 0 END) AS BIGINT) AS tp,
        |   CAST(sum(CASE WHEN cents >= t THEN neg ELSE 0 END) AS BIGINT) AS fp
        |  FROM bys CROSS JOIN th GROUP BY j, t, np)
        |SELECT j, t AS threshold_cents, tp, fp,
        |  CASE WHEN tp + fp > 0
        |    THEN CAST((10000 * tp) // (tp + fp) AS BIGINT) END AS precision_bp,
        |  CAST((10000 * tp) // np AS BIGINT) AS recall_bp,
        |  CASE WHEN tp > 0
        |    THEN CAST((20000 * tp) // (2 * tp + fp + (np - tp)) AS BIGINT)
        |    ELSE 0 END AS f1_bp
        |FROM g ORDER BY j""".stripMargin,
    "ml_roc_curve" ->
      """WITH scored AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |   CASE WHEN (o_orderkey * 2654435761) % 4294967296 % 1000000
        |     < least(100000 + CAST(round(o_totalprice * 100) AS BIGINT) // 100, 900000)
        |     THEN 1 ELSE 0 END AS label
        |  FROM orders),
        | bys AS (SELECT cents, CAST(sum(label) AS BIGINT) AS pos,
        |   CAST(sum(1 - label) AS BIGINT) AS neg FROM scored GROUP BY cents),
        | b AS (SELECT min(cents) AS mn, max(cents) AS mx,
        |   CAST(sum(pos) AS BIGINT) AS np, CAST(sum(neg) AS BIGINT) AS nn FROM bys),
        | th AS (SELECT CAST(j AS BIGINT) AS j,
        |   mn + (j * (mx - mn)) // 20 AS t, np, nn
        |  FROM b CROSS JOIN (SELECT unnest(range(1, 20)) AS j)),
        | g AS (SELECT j, t, np, nn,
        |   CAST(sum(CASE WHEN cents >= t THEN pos ELSE 0 END) AS BIGINT) AS tp,
        |   CAST(sum(CASE WHEN cents >= t THEN neg ELSE 0 END) AS BIGINT) AS fp
        |  FROM bys CROSS JOIN th GROUP BY j, t, np, nn)
        |SELECT j, t AS threshold_cents, tp, fp,
        | CAST((10000 * tp) // np AS BIGINT) AS tpr_bp,
        | CAST((10000 * fp) // nn AS BIGINT) AS fpr_bp
        |FROM g ORDER BY j""".stripMargin,
    "text_length_pct_rank" ->
      """WITH r AS (SELECT doc_id, n_chars,
        |   row_number() OVER (ORDER BY n_chars, doc_id) AS rk
        |  FROM documents),
        | n AS (SELECT count(*) AS n FROM documents)
        |SELECT doc_id, n_chars,
        | CAST((10000 * (rk - 1)) // (n - 1) AS BIGINT) AS pct_bp
        |FROM r CROSS JOIN n ORDER BY doc_id""".stripMargin,
    "ml_auc_exact" ->
      """WITH scored AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |   CASE WHEN (o_orderkey * 2654435761) % 4294967296 % 1000000
        |     < least(100000 + CAST(round(o_totalprice * 100) AS BIGINT) // 100, 900000)
        |     THEN 1 ELSE 0 END AS label
        |  FROM orders),
        | bys AS (SELECT cents, sum(label) AS pos, sum(1 - label) AS neg
        |  FROM scored GROUP BY cents),
        | run AS (SELECT pos, neg,
        |   sum(neg) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cumneg
        |  FROM bys)
        |SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
        | CAST(sum(neg) AS BIGINT) AS n_neg,
        | CAST(CAST(sum(pos * (cumneg - neg) * 2 + pos * neg) AS BIGINT) AS VARCHAR) AS u2,
        | round(CAST(sum(pos * (cumneg - neg) * 2 + pos * neg) AS BIGINT)
        |   / (CAST(sum(pos) AS BIGINT) * CAST(sum(neg) AS BIGINT) * 2.0), 6) + 0.0 AS auc
        |FROM run""".stripMargin,
    "agg_gini_segment" ->
      """WITH rev AS (SELECT o_custkey,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY o_custkey),
        | j AS (SELECT c.c_mktsegment, r.x,
        |   row_number() OVER (PARTITION BY c.c_mktsegment
        |     ORDER BY r.x, r.o_custkey) AS i
        |  FROM rev r JOIN customer c ON r.o_custkey = c.c_custkey)
        |SELECT c_mktsegment,
        | count(*) AS n_customers,
        | CAST(CAST(sum(x) AS BIGINT) AS VARCHAR) AS total_cents,
        | round((2 * CAST(sum(i * x) AS BIGINT) - (count(*) + 1) * CAST(sum(x) AS BIGINT))
        |   / CAST(count(*) * CAST(sum(x) AS BIGINT) AS DOUBLE), 6) + 0.0 AS gini
        |FROM j GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "agg_spearman" ->
      """WITH t AS (SELECT CAST(p_size AS BIGINT) AS xv,
        |   CAST(round(p_retailprice * 100) AS BIGINT) AS yv FROM part),
        | rx AS (SELECT xv, 2 * sum(cnt) OVER (ORDER BY xv ROWS UNBOUNDED PRECEDING)
        |     - cnt + 1 AS r_xv
        |   FROM (SELECT xv, count(*) AS cnt FROM t GROUP BY xv)),
        | ry AS (SELECT yv, 2 * sum(cnt) OVER (ORDER BY yv ROWS UNBOUNDED PRECEDING)
        |     - cnt + 1 AS r_yv
        |   FROM (SELECT yv, count(*) AS cnt FROM t GROUP BY yv)),
        | w AS (SELECT CAST(r_xv AS BIGINT) AS r_xv, CAST(r_yv AS BIGINT) AS r_yv
        |   FROM t JOIN rx USING (xv) JOIN ry USING (yv)),
        | p AS (SELECT count(*) AS n, sum(r_xv) AS sx, sum(r_yv) AS sy,
        |   sum(r_xv * r_xv) AS sxx, sum(r_yv * r_yv) AS syy,
        |   sum(r_xv * r_yv) AS sxy FROM w)
        |SELECT CAST(n AS BIGINT) AS n,
        | round((CAST(n AS BIGINT) * CAST(sxy AS BIGINT) - CAST(sx AS BIGINT) * CAST(sy AS BIGINT))
        |   / (sqrt(CAST(CAST(n AS BIGINT) * CAST(sxx AS BIGINT) - CAST(sx AS BIGINT) * CAST(sx AS BIGINT) AS DOUBLE))
        |     * sqrt(CAST(CAST(n AS BIGINT) * CAST(syy AS BIGINT) - CAST(sy AS BIGINT) * CAST(sy AS BIGINT) AS DOUBLE))), 6) + 0.0 AS spearman_rho
        |FROM p""".stripMargin,
  )
}
