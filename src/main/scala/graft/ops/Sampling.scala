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
    * r = ((id mod 2²⁰) · 2654435761) mod 2²⁰ / 2²⁰ — exact integer
    * arithmetic and an exact dyadic rational, so `r < rate` is
    * bit-reproducible in any engine (no RNG, no float accumulation).
    * The id is reduced mod 2²⁰ BEFORE the multiply: since 2²⁰ | 2⁶⁴ the
    * result is congruent to the unmasked product under either wrapping
    * (Spark/Scala) or arbitrary-precision (DuckDB) semantics, and the
    * masked intermediate stays < 2⁵² — no engine can overflow or
    * diverge at any id range. Rates cycle ¼..1 by source index so every
    * rate bin is exercised by the fixture.
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
    val draw = pmod(pmod(col("doc_id"), lit(1048576L)) * lit(2654435761L), lit(1048576L))
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

  /** Sequence packing — the assembly step between curation and training:
    * documents are concatenated in a canonical order (lang, doc_id) and
    * the resulting token stream is sliced into fixed-budget context
    * windows; each document is assigned to the window where it STARTS
    * (offset ÷ budget). The output audits the packing: documents and
    * tokens per sequence, and the doc-id range each window covers —
    * what a trainer needs to map a loss spike back to source documents.
    *
    * Assignment is a pure function of the running token cumsum, so it is
    * reproducible across engines and partitionings (no bin-packing
    * heuristic state). Plan: one window shuffle on lang for the cumsum,
    * one hash aggregate — the packing pass over 100 TB is 2 narrow
    * shuffles, and the per-lang windows parallelize across the
    * language key.
    */
  def sampleSeqPack(s: SparkSession, d: String): DataFrame = {
    val budget = 2048.0
    val w = Window.partitionBy("lang").orderBy("doc_id")
    Sources.documents(s, d)
      .withColumn("n_tokens", size(org.apache.spark.sql.functions.split(col("text"), " ")).cast("long"))
      .withColumn("off", sum("n_tokens").over(w) - col("n_tokens"))
      .withColumn("seq_id", floor(col("off") / lit(budget)).cast("long"))
      .groupBy("lang", "seq_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("sum_tokens"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
      .orderBy("lang", "seq_id")
  }

  /** Train/test leakage audit — after any split, the first integrity
    * check a training pipeline runs: does any val/test document's content
    * also appear in train? Membership is by a BAG-OF-WORDS fingerprint
    * (md5 of the sorted distinct word set), which catches reordered and
    * repetition-variant copies that byte-equality misses — the cheap
    * middle ground between exact-hash and n-gram decontamination. The
    * check is an equi-join on a 32-char key — shuffle-correct at 100 TB
    * (never a pairwise scan) — and the train side is reduced to DISTINCT
    * fingerprints first, so the probe build is bounded by unique-content
    * count, not corpus size. The fixture's near-dup families cross the
    * mod-10 split (3 val + 6 test hits at sf0.01), so both outcomes bind.
    */
  def sampleLeakageAudit(s: SparkSession, d: String): DataFrame = {
    val b = pmod(col("doc_id"), lit(10L))
    val docs = Sources.documents(s, d)
      .withColumn("split",
        when(b < 8, "train").when(b < 9, "val").otherwise("test"))
      .withColumn("fp", md5(concat_ws(" ",
        array_sort(array_distinct(org.apache.spark.sql.functions.split(col("text"), " "))))))
    val trainFps = docs.filter(col("split") === "train")
      .select(col("fp")).distinct().withColumn("leaked", lit(true))
    docs.filter(col("split") =!= "train")
      .join(trainFps, Seq("fp"), "left")
      .groupBy("split")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("leaked"), 1L).otherwise(0L)).as("n_leaked"))
      .withColumn("leak_rate",
        round(col("n_leaked").cast("double") / col("n_docs").cast("double"), 4))
      .orderBy("split")
  }

  /** Group-preserving split — the leakage-safe refinement of the plain
    * hash split: the split key is the near-dup GROUP id (from connected
    * components), not the document id, so an entire family of near-
    * duplicates lands in one split and can never straddle the
    * train/eval boundary. This is how production corpora split after
    * dedup clustering. Output audits the assignment: groups and
    * documents per split.
    *
    * Plan: the groups pipeline's CC output keyed by group_id, one
    * map-side bucket projection, one aggregate — the split itself adds
    * one narrow shuffle over the group table. The per-group atomicity is
    * structural (the key IS the group), asserted in the spec.
    */
  def sampleGroupSplit(s: SparkSession, d: String): DataFrame = {
    val b = pmod(col("group_id"), lit(10L))
    TextOps.textDedupGroupsRaw(s, d)
      .withColumn("split",
        when(b < 8, "train").when(b < 9, "val").otherwise("test"))
      .groupBy("split")
      .agg(countDistinct("group_id").as("n_groups"), count(lit(1)).as("n_docs"))
      .orderBy("split")
  }

  /** Weighted sampling without replacement via PRIORITY SAMPLING
    * (Duffield–Lund–Thorup): each document draws priority = weight / u
    * with u uniform on (0, 1], and the k = 64 largest priorities win —
    * heavier documents (weight = n_chars) win proportionally more often,
    * the weighted subset-selection step of corpus curation. The draw u
    * is the deterministic Knuth-hash dyadic rational
    * (hash(doc_id)+1)/2²⁰+1 — bit-reproducible, like every sampler in
    * this module — and the priority is two correctly-rounded IEEE
    * divisions per row, so both engines compute the identical double and
    * the top-k boundary cannot disagree. (The A-ES u^(1/w) key would
    * route through `pow`/`log`, whose last-ulp behavior is libm-specific
    * — priority sampling gives the same statistical guarantee on
    * division-only arithmetic.)
    *
    * Plan: priorities are a map-side projection over the scan; selection
    * is `orderBy(desc).limit(64)` = TakeOrderedAndProject (per-partition
    * top-k, driver merges k·partitions rows) — no global sort, no
    * single-partition window, no shuffle of the corpus.
    */
  def sampleWeightedReservoir(s: SparkSession, d: String): DataFrame = {
    val k = pmod(pmod(col("doc_id"), lit(1048576L)) * lit(2654435761L), lit(1048576L))
    val u = (k + lit(1L)).cast("double") / lit(1048577.0)
    Sources.documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        (col("n_chars").cast("double") / u).as("priority"))
      .orderBy(col("priority").desc, col("doc_id")).limit(64)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        round(col("priority"), 4).as("priority"))
      .orderBy("doc_id")
  }

  /** Temperature-scaled mixture allocation — the corpus-rebalancing step
    * of a multilingual / multi-domain training run (the mT5 / XLM-R
    * sampling scheme): a fixed document budget is split across sources
    * proportionally to `n_s^(1/T)`, flattening the head so low-resource
    * sources are not drowned out. T = 2, and the weight is the INTEGER
    * square root (`floor(sqrt(n))` — IEEE sqrt is correctly rounded, so
    * the floor is engine-exact), which keeps the whole allocation in
    * integer arithmetic: base seats are `(K·w_s) div ΣW`, leftover seats
    * go to the largest integer REMAINDERS `(K·w_s) mod ΣW` (Hamilton's
    * method, ties broken by source name) — so the seat vector sums to K
    * exactly and the DuckDB oracle replays it bit-for-bit, with no
    * float-sum association anywhere.
    *
    * Plan: one keyed aggregate for the counts; ΣW and the leftover-seat
    * count ride in as 1-row broadcast attaches; the remainder rank runs
    * through the two-pass [[Prefix]] aggregation, never a
    * single-partition window (the source taxonomy grows with a corpus's
    * provenance breadth).
    */
  def sampleTemperatureMix(s: SparkSession, d: String): DataFrame = {
    val budget = 100L
    val counts = Sources.documents(s, d)
      .groupBy("source").agg(count(lit(1)).as("n_total"))
      .withColumn("w", floor(sqrt(col("n_total").cast("double"))).cast("long"))
    val base = counts
      .crossJoin(broadcast(counts.agg(sum("w").as("wsum"))))
      .withColumn("base", expr(s"($budget * w) div wsum"))
      .withColumn("rem", expr(s"($budget * w) % wsum"))
    val extra = base.agg((lit(budget) - sum("base")).as("extra"))
    Prefix.running(base, Seq(col("rem").desc, col("source").asc), rankOut = Some("rnk"))
      .crossJoin(broadcast(extra))
      .select(col("source"), col("n_total"), col("w"),
        (col("base") + when(col("rnk") <= col("extra"), 1L).otherwise(0L)).as("alloc"))
      .orderBy("source")
  }

  /** Deterministic Poisson bootstrap (`sample_bootstrap_reps`): 32
    * bootstrap replicates of the mean order value, each row weighted by
    * a Poisson(1)-distributed pseudo-count — the online-bootstrap
    * construction (Oza & Russell) that replaces with-replacement
    * resampling at corpus scale, since every row's weight is computed
    * map-side from a hash, never by sampling row indices. The draw is
    * the Knuth multiplicative hash of (id, replicate) reduced mod 2²⁰
    * (the [[sampleDomainMixture]] discipline — masked intermediates
    * < 2⁵², identical under wrapping or arbitrary-precision
    * arithmetic), inverted through the exact integer-scaled Poisson(1)
    * CDF (385749/2²⁰ = P[X=0], …), so every weight is bit-reproducible
    * in any engine. Plan: ×32 map-side explode, then partial
    * aggregation collapses each partition to 32 rows before the one
    * shuffle — at 100 TB the bootstrap costs one scan regardless of
    * replicate count. The replicate means ship as exact integer cents
    * (floor division); CI construction is order statistics over the
    * 32-row output.
    */
  def sampleBootstrapReps(s: SparkSession, d: String): DataFrame = {
    val o = Sources.orders(s, d).select(col("o_orderkey").as("id"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    val u = pmod((pmod(col("id"), lit(1048576L)) + col("rep") * lit(7919L))
      * lit(2654435761L), lit(1048576L))
    val w = when(u < 385749L, 0L).when(u < 771499L, 1L).when(u < 964373L, 2L)
      .when(u < 1028665L, 3L).when(u < 1044738L, 4L).otherwise(5L)
    o.select(col("id"), col("cents"),
        explode(array((0 until 32).map(lit(_)): _*)).as("rep"))
      .withColumn("w", w)
      .groupBy(col("rep").cast("long").as("rep"))
      .agg(sum("w").as("n_eff"), sum(col("w") * col("cents")).as("wsum"))
      .select(col("rep"), col("n_eff"), expr("wsum div n_eff").as("mean_cents"))
      .orderBy("rep")
  }

  /** Deterministic negative sampling (`sample_negatives`): for every
    * customer, 3 pseudo-random parts they did NOT purchase — the
    * contrastive negatives a recommender or embedding trainer pairs
    * with each positive. Candidates come from the Knuth hash of
    * (customer, draw-index) reduced onto the dense part-key space
    * (the [[sampleDomainMixture]] arithmetic, so the draw is
    * bit-reproducible in any engine); an 8-draw oversample anti-joined
    * against the positives absorbs collisions, and a per-customer
    * (PARTITIONED) rank keeps the first 3 survivors by draw index.
    * Plan: one distinct positives shuffle, a ×8 map-side explode, one
    * anti join on (customer, part), one user-keyed window — every stage
    * keyed, nothing global. The part count attaches as a 1-row
    * broadcast.
    */
  def sampleNegatives(s: SparkSession, d: String): DataFrame = {
    // lazy pin: the positive set feeds both the candidate generator and
    // the anti-join — unpinned, the fact join+distinct would re-execute
    // per consumer (the graph_hits lesson)
    val pos = graft.io.Checkpoints.pin(
      Sources.lineitem(s, d).select("l_orderkey", "l_partkey")
        .join(Sources.orders(s, d)
          .select(col("o_orderkey").as("l_orderkey"), col("o_custkey")), "l_orderkey")
        .select(col("o_custkey").as("custkey"), col("l_partkey").as("part"))
        .distinct(),
      eager = false)
    val nParts = Sources.part(s, d).agg(count(lit(1)).as("np"))
    // intermediate lattice 2^40, NOT the repo's usual 2^20 draw lattice:
    // here the draw maps onto the PART-KEY DOMAIN, so a 2^20 lattice
    // would make parts with key >= 1,048,576 undrawable past ~sf5 and
    // bias the double-mod by up to np/2^20. At 2^40 the domain holds to
    // ~1.1e12 parts (far past 100 TB's ~2e10) and the double-mod bias
    // is <= np/2^40 ~ 2e-4 bp. The hash stays Long-exact: custkey *
    // 2654435761 overflows only past custkey ~ 3.4e9.
    val cands = pos.select("custkey").distinct()
      .crossJoin(broadcast(nParts))
      .select(col("custkey"), col("np"),
        explode(array((1 to 8).map(lit(_)): _*)).as("j"))
      .withColumn("part", pmod(
        pmod(col("custkey") * lit(2654435761L) + col("j") * lit(7919L),
          lit(1099511627776L)),
        col("np")))
    val survivors = cands.join(pos, Seq("custkey", "part"), "left_anti")
    val w = Window.partitionBy("custkey").orderBy("j")
    survivors.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("custkey"), col("rnk"), col("part").as("neg_part"))
      .orderBy("custkey", "rnk")
  }

  /** Temporal split audit (`sample_time_split`): orders split at a
    * fixed cutoff (train < 1999-01-01 ≤ test) with per-split volumes
    * and the count of customers appearing on BOTH sides — the
    * entity-overlap figure that quantifies temporal-leakage exposure
    * when per-customer features are trained on the past and evaluated
    * on the future (complements the group-leakage audit, which splits
    * by entity instead of time). Two filtered aggregates + one
    * distinct-key intersection via an inner join; all exact.
    */
  def sampleTimeSplit(s: SparkSession, d: String): DataFrame = {
    val o = Sources.orders(s, d)
      .select(col("o_custkey"), col("o_orderdate"),
        (col("o_orderdate") < lit("1999-01-01").cast("date")).as("is_train"))
    val bySplit = o.groupBy("is_train")
      .agg(count(lit(1)).as("n_orders"), countDistinct("o_custkey").as("n_customers"))
    val both = o.filter(col("is_train")).select("o_custkey").distinct()
      .join(o.filter(!col("is_train")).select("o_custkey").distinct(), "o_custkey")
      .agg(count(lit(1)).as("n_cust_both"))
    bySplit.crossJoin(broadcast(both))
      .select(
        when(col("is_train"), "train").otherwise("test").as("split"),
        col("n_orders"), col("n_customers"), col("n_cust_both"),
        expr("(10000 * n_cust_both) div n_customers").as("overlap_bp"))
      .orderBy("split")
  }

  /** Deterministic k-fold assignment with a balance audit
    * (`sample_kfold_balance`): customers hash onto 5 folds via the
    * Knuth-multiplicative draw (pure integer arithmetic — the same
    * engine-independent randomness as the negative sampler; no
    * stateful shuffle, any executor can compute any row's fold), and
    * the audit reports per (fold, segment) counts with integer
    * basis-point shares — the check that cross-validation folds are
    * exchangeable w.r.t. the stratifier before a CV run trusts them.
    * One contingency aggregate + a 5-row totals broadcast.
    */
  def sampleKfoldBalance(s: SparkSession, d: String): DataFrame = {
    val folds = Sources.customer(s, d)
      .select(col("c_mktsegment"),
        pmod(pmod(col("c_custkey"), lit(1048576L)) * lit(2654435761L),
          lit(1048576L)).mod(5).as("fold"))
    val cells = folds.groupBy("fold", "c_mktsegment")
      .agg(count(lit(1)).as("n"))
    val tot = cells.groupBy("fold").agg(sum("n").as("fold_n"))
    cells.join(broadcast(tot), "fold")
      .select(col("fold"), col("c_mktsegment"), col("n"), col("fold_n"),
        expr("(10000 * n) div fold_n").as("share_bp"))
      .orderBy("fold", "c_mktsegment")
  }

  /** PPS systematic sampling (`sample_pps_systematic`, r13):
    * probability-proportional-to-size selection of n = 100 customer
    * draws by systematic intervals over the cumulative spend line — the
    * survey-sampling workhorse (one pass, fixed sample size, inclusion
    * probability exactly proportional to size, large units selectable
    * multiple times). The random start is DERANDOMIZED to the published
    * midpoint r = s div 2 (s = T div 100) — the frozen-trajectory
    * discipline, so the full draw is hash-gated. A unit with cumulative
    * span [cum−size, cum) receives hits = g(cum−1) − g(cum−size−1)
    * where g(x) = (x − r + 2s) div s — the +2s shift keeps every
    * numerator strictly positive, sidestepping the Spark-truncation vs
    * DuckDB-floor division divergence on negatives (same family as the
    * business-days weekday-numbering sidestep). Cumulative spend comes
    * from the two-pass [[graft.ops.Prefix]] (never a single-partition
    * window); everything else is map-side integer arithmetic.
    */
  /** The PPS systematic design shared by [[ppsSystematic]] (the draw)
    * and [[hhEstimator]] (estimation under the draw): per selected
    * customer, spend size, cumulative position, hit multiplicity, and
    * the population spend total.
    */
  private def ppsHits(s: SparkSession, d: String): DataFrame = {
    val sizes = Sources.orders(s, d)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("sz_cents"))
    val cum = Prefix.running(sizes, Seq(col("custkey")),
      sums = Seq((col("sz_cents"), "cum")))
    val tot = cum.agg(max("cum").as("t_total"))
    cum.crossJoin(broadcast(tot))
      .withColumn("step", expr("t_total div 100"))
      .withColumn("start", expr("step div 2"))
      .withColumn("n_hits",
        expr("(cum - 1 - start + 2 * step) div step" +
          " - (cum - sz_cents - 1 - start + 2 * step) div step"))
      .filter(col("n_hits") > 0)
  }

  def ppsSystematic(s: SparkSession, d: String): DataFrame =
    ppsHits(s, d)
      .select(col("custkey"), col("sz_cents"), col("cum"), col("n_hits"))
      .orderBy("custkey")

  /** Hansen-Hurwitz estimation under the PPS design
    * (`sample_hh_estimator`, r13): estimate the population's total
    * LINEITEM count from the 100 spend-proportional draws — the
    * estimation half of the survey pair ([[ppsSystematic]] is the
    * design half; a sample without its estimator is scaffolding).
    * t̂_HH = (1/n)Σ_draws y_i/p_i with p_i = size_i/T, i.e.
    * (T/100)·Σ hits·y_i/size_i. Per-unit contributions floor onto the
    * e9 lattice BEFORE the sum (c_i = (y_i·10⁹) div size_i — the psi
    * per-row rounding rule; e9 because item-per-cent ratios sit near
    * 10⁻⁷, so an e6 floor would zero them), the estimate is one more
    * floor division (t_total·Σ < 2⁶³ to ~10³-scale SFs),
    * and the true total rides along so the design's efficiency is
    * visible under the hash gate. Plan: the design's Prefix pass + one
    * per-customer item-count pre-agg joined on the ~100 selected keys.
    */
  def hhEstimator(s: SparkSession, d: String): DataFrame = {
    val items = Sources.orders(s, d)
      .join(Sources.lineitem(s, d),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).as("y"))
    val tTrue = items.agg(sum("y").as("t_true"))
    val draws = ppsHits(s, d).join(items, Seq("custkey"))
      .withColumn("c_e9", expr("(y * 1000000000L) div sz_cents"))
    draws.agg(sum("n_hits").as("n_draws"),
        sum(col("n_hits") * col("c_e9")).as("sum_c_e9"),
        max("t_total").as("t_total"))
      .crossJoin(broadcast(tTrue))
      .select(col("n_draws"), col("t_total"), col("t_true"),
        expr("(t_total * sum_c_e9) div (100L * 1000000000L)").as("t_hh"),
        (expr("(t_total * sum_c_e9) div (100L * 1000000000L)") -
          col("t_true")).as("err"))
  }

  /** Horvitz-Thompson estimation under Poisson sampling
    * (`sample_ht_poisson`, r13): the without-replacement half of the
    * PPS pair — [[hhEstimator]] assumes with-replacement draws; a
    * Poisson design includes each order INDEPENDENTLY with
    * size-proportional probability π_i = min(1, m·yᵢ/T) (m = 200
    * published target size, certainty units capped at 1 — the cap is
    * the part textbooks gloss over and the census column makes
    * visible). Inclusion is the Knuth-hash lattice u(key) < π_e6, so
    * the whole draw is engine-replayable; t̂_HT = Σ_incl yᵢ/πᵢ with
    * each yᵢ/πᵢ floored onto cents PER ROW (psi rule); the Poisson
    * variance estimate V̂ = Σ_incl (1−πᵢ)(yᵢ/πᵢ)² accumulates on the
    * hundred-dollar lattice (terms ≤ ~1.2e14 — Long-exact to ~7e4
    * sampled rows; at larger m the unit coarsens, the
    * [[Stats.momentsProfile]] knob). Plan: one corpus aggregate for T
    * (1-row broadcast attach), one map-side inclusion filter, one
    * aggregate — no shuffle wider than the final 1-row reduce.
    */
  def htPoisson(s: SparkSession, d: String): DataFrame = {
    val o = Sources.orders(s, d).select(col("o_orderkey"),
      expr("CAST(round(o_totalprice * 100) AS LONG)").as("cents"))
    val tot = o.agg(sum("cents").as("t_cents"), count(lit(1)).as("n_pop"))
    val withPi = o.crossJoin(broadcast(tot))
      .withColumn("pi_e6",
        least(lit(1000000L), expr("(200L * cents * 1000000L) div t_cents")))
      .withColumn("u",
        pmod(col("o_orderkey") * lit(2654435761L), lit(4294967296L)) % 1000000L)
      .filter(col("u") < col("pi_e6"))
      .withColumn("y_over_pi", expr("(cents * 1000000L) div pi_e6"))
      .withColumn("yk", expr("(cents div 100000L) * 1000000L div pi_e6"))
      .withColumn("v_term",
        expr("(((1000000L - pi_e6) * yk) div 1000000L) * yk"))
    withPi.agg(
        max("n_pop").as("n_pop"), max("t_cents").as("t_true_cents"),
        count(lit(1)).as("n_sampled"),
        sum(when(col("pi_e6") === 1000000L, 1L).otherwise(0L))
          .as("n_certainty"),
        sum("y_over_pi").as("t_ht_cents"),
        sum("v_term").as("v_hat_kusd2"))
      .withColumn("err_cents", col("t_ht_cents") - col("t_true_cents"))
  }

  /** Two-stage cluster sampling (`sample_two_stage`, r13): the survey
    * design for when frame access is hierarchical (you can't sample
    * customers directly at 100 TB without first touching every
    * shard — but you CAN pick nation partitions, then sample within
    * the picked ones): stage 1 draws 10 of the 25 nations (lowest
    * Knuth hash, ties by key — a deterministic draw over the bounded
    * DIMENSION, π₁ = 2/5), stage 2 keeps customers at π₂ = 1/4 on an
    * independent second hash lattice. The two-stage HT estimator
    * t̂ = Σ y/(π₁π₂) = 10·Σy is EXACT integer (the inverse inclusion
    * probability is a whole number by design — the published
    * fractions are chosen so no per-row rational ever appears). Scale
    * story: stage 1 prunes to the sampled nations' partitions BEFORE
    * the corpus scan (the broadcast semi-join is partition pruning in
    * survey-design form); only sampled clusters are read.
    */
  def twoStage(s: SparkSession, d: String): DataFrame = {
    val cust = Sources.customer(s, d).select(
      col("c_custkey"), col("c_nationkey").cast("long").as("nk"),
      expr("CAST(round(c_acctbal * 100) AS LONG)").as("cents"))
    val nations = cust.select("nk").distinct() // bounded dimension
      .withColumn("u", pmod(col("nk") * lit(2654435761L), lit(4294967296L)))
      .orderBy("u", "nk").limit(10).select("nk")
    val sampled = cust.join(broadcast(nations), Seq("nk"))
      .filter(pmod(col("c_custkey") * lit(2246822519L),
        lit(4294967296L)) % 1000000L < 250000L)
    val truth = cust.agg(sum("cents").as("t_true_cents"),
      count(lit(1)).as("n_pop"))
    sampled.agg(countDistinct("nk").as("n_nations_hit"),
        count(lit(1)).as("n_sampled"),
        (sum("cents") * lit(10L)).as("t_hat_cents"))
      .crossJoin(broadcast(truth)) // 1-row truth attach
      .select(col("n_pop"), col("n_nations_hit"), col("n_sampled"),
        col("t_hat_cents"), col("t_true_cents"),
        (col("t_hat_cents") - col("t_true_cents")).as("err_cents"))
  }

  /** Sample-ratio-mismatch guardrail (`sample_srm_check`, r13): the #1
    * A/B-test validity check — if a 50/50 hash split doesn't land
    * 50/50, every downstream metric on that experiment is garbage
    * (Fabijan et al. 2019 report SRM in ~6 % of real experiments;
    * assignment bugs, bot filtering, and redirect loss are the usual
    * culprits). Assignment is the Knuth-hash parity bit; the test is
    * the 1-df chi-square (n_a − n_b)²/(n_a + n_b) as an exact e6
    * floor, with the two-sided p through the shared A&S 26.2.17
    * polynomial (z = √χ² for 1 df) and the published p < 0.001 alarm
    * threshold — a HEALTHY split must NOT alarm, which is itself the
    * assertion (a guardrail that cries wolf on clean data is worse
    * than none). One conditional-count aggregate, one row.
    */
  def srmCheck(s: SparkSession, d: String): DataFrame = {
    val counts = Sources.orders(s, d)
      .select((pmod(col("o_orderkey") * lit(2654435761L),
        lit(4294967296L)) % 2L).as("arm"))
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"))
    val chi = (col("n_a") - col("n_b")).cast("double") *
      (col("n_a") - col("n_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val az = sqrt(chi)
    val tt = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
    val poly = tt * (lit(0.319381530) + tt * (lit(-0.356563782) + tt *
      (lit(1.781477937) + tt * (lit(-1.821255978) +
        tt * lit(1.330274429)))))
    val pTwo = lit(2.0) * (lit(0.3989422804014327) *
      exp(lit(-0.5) * az * az)) * poly
    counts.select(col("n_a"), col("n_b"),
      expr("((n_a - n_b) * (n_a - n_b) * 1000000L) div (n_a + n_b)")
        .as("chi2_e6"),
      round(pTwo * lit(1e9)).cast("long").as("p_e9"),
      when(round(pTwo * lit(1e9)).cast("long") < 1000000L, 1L)
        .otherwise(0L).as("srm_alarm"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_srm_check" -> (srmCheck _),
    "sample_two_stage" -> (twoStage _),
    "sample_ht_poisson" -> (htPoisson _),
    "sample_pps_systematic" -> (ppsSystematic _),
    "sample_hh_estimator" -> (hhEstimator _),
    "sample_ess_weights" -> (essWeights _),
    "sample_neyman_alloc" -> (neymanAlloc _),
    "sample_kfold_balance" -> (sampleKfoldBalance _),
    "sample_time_split" -> (sampleTimeSplit _),
    "sample_negatives" -> (sampleNegatives _),
    "sample_bootstrap_reps" -> (sampleBootstrapReps _),
    "sample_temperature_mix" -> (sampleTemperatureMix _),
    "sample_weighted_reservoir" -> (sampleWeightedReservoir _),
    "sample_group_split" -> (sampleGroupSplit _),
    "sample_split_counts" -> (sampleSplitCounts _),
    "sample_stratified" -> (sampleStratified _),
    "sample_domain_mixture" -> (sampleDomainMixture _),
    "sample_quality_weighted" -> (sampleQualityWeighted _),
    "sample_seq_pack" -> (sampleSeqPack _),
    "sample_leakage_audit" -> (sampleLeakageAudit _),
  )

  /** Effective sample size under importance weights
    * (`sample_ess_weights`, r13): the Kish diagnostics every weighted
    * corpus mixture must publish BEFORE training on it — ESS =
    * (Σw)²/Σw² (how many unweighted samples the weighted set is worth)
    * and the design effect deff = n·Σw²/(Σw)² (variance inflation).
    * Weights come from a PUBLISHED 5-row priority table (the frozen
    * upweighting a mixture pipeline applies: urgent orders
    * oversampled), joined broadcast; per customer-nation cell the three
    * weight moments are exact BIGINTs in one map-side-combinable agg,
    * and ESS/deff/weighted-mean ship on exact floor lattices — no
    * float ever. A cell where every row shares one weight collapses to
    * ESS = n, deff = 10⁶ (e6 lattice) — the spec asserts the mixture
    * genuinely varies within cells.
    */
  def essWeights(s: SparkSession, d: String): DataFrame = {
    val wTab = Seq(("1-URGENT", 5L), ("2-HIGH", 4L), ("3-MEDIUM", 3L),
      ("4-NOT SPECIFIED", 2L), ("5-LOW", 1L))
    import s.implicits._
    val wDf = wTab.toDF("o_orderpriority", "wgt")
    val t = Sources.orders(s, d)
      .select(col("o_custkey"), col("o_orderpriority"),
        round(col("o_totalprice")).cast("long").as("x"))
      .join(broadcast(wDf), Seq("o_orderpriority"))
      .join(Sources.customer(s, d)
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey")),
        Seq("o_custkey"))
    t.groupBy("c_nationkey").agg(
        count(lit(1)).as("n"), sum("wgt").as("sw"),
        sum(col("wgt") * col("wgt")).as("sww"),
        sum(col("wgt") * col("x")).as("swx"))
      .select(col("c_nationkey"), col("n"), col("sw"), col("sww"),
        expr("(100L * swx) div sw").as("wmean_e2"),
        expr("(sw * sw * 1000000L) div sww").as("ess_e6"),
        expr("(n * sww * 1000000L) div (sw * sw)").as("deff_e6"))
      .orderBy("c_nationkey")
  }

  /** Neyman optimal stratified allocation (`sample_neyman_alloc`, r13):
    * the survey-design complement to [[essWeights]] — given a budget of
    * B = 1000 draws over the priority strata, allocate n_h ∝ N_h·S_h
    * (minimum-variance allocation for a stratified mean; Neyman 1934).
    * Stratum stddevs come from exact BIGINT moments with ONE mirrored
    * sqrt each; the integer weights w_h = round(N_h·s_h) then go
    * through the exact largest-remainder apportionment (the
    * [[Stats.largestRemainder]] discipline — floor shares plus ranked
    * remainders over the 5-row stratum dimension, so Σ alloc = B
    * EXACTLY, spec-pinned). All ratios exact floor lattices.
    */
  def neymanAlloc(s: SparkSession, d: String): DataFrame = {
    val b = 1000L
    val g = Sources.orders(s, d)
      .select(col("o_orderpriority").as("grp"),
        round(col("o_totalprice")).cast("long").as("x"))
      .groupBy("grp").agg(count(lit(1)).as("n_pop"), sum("x").as("sx"),
        sum(col("x") * col("x")).as("sxx"))
    def D(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      c.cast("double")
    val sd = sqrt((D(col("sxx")) - D(col("sx")) * D(col("sx")) / D(col("n_pop")))
      / (D(col("n_pop")) - 1.0))
    val wDf = g.withColumn("w_h", round(D(col("n_pop")) * sd, 0).cast("long"))
    val tot = wDf.agg(sum("w_h").as("w_tot"))
    val based = wDf.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"($b * w_h) div w_tot"))
      .withColumn("rem", lit(b) * col("w_h") - col("base") * col("w_tot"))
    val leftover = based.agg((lit(b) - sum("base")).as("leftover"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col("grp").asc)
    based.crossJoin(broadcast(leftover))
      .withColumn("rk", row_number().over(w).cast("long"))
      .select(col("grp"), col("n_pop"),
        graft.functions.Num.roundNorm(sd, 2).as("sd"),
        col("w_h"),
        (col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
          .as("alloc"))
      .orderBy("grp")
  }

  /** Importance-weighted sampling with a CONTINUOUS per-document rate:
    * keep probability = the doc's unique-word ratio (distinct/total
    * words), so repetitive documents are downweighted smoothly instead of
    * cut at a threshold — the soft version of the Gopher repetition
    * filter, used when the pipeline wants to *reduce* low-quality mass,
    * not eliminate it.
    *
    * The accept test never touches floating point: the draw is the
    * dyadic rational k/2²⁰ (Knuth hash, as in [[sampleDomainMixture]])
    * and the rate is the exact rational a/b, so `keep ⇔ k·b < a·2²⁰`
    * compares 64-bit integers (k < 2²⁰, b ≤ words-per-doc ⇒ no
    * overflow). Bit-reproducible in any engine at any id range.
    *
    * Plan: the keep decision is a map-side projection over the scan
    * (distinct-ratio via in-row array ops — no explode); the audit agg
    * is one shuffle on lang. At 100 TB the sampler streams with the scan.
    */
  def sampleQualityWeighted(s: SparkSession, d: String): DataFrame = {
    val ws = org.apache.spark.sql.functions.split(col("text"), " ")
    val a = size(array_distinct(ws)).cast("long")   // rate numerator
    val b = size(ws).cast("long")                   // rate denominator
    val k = pmod(pmod(col("doc_id"), lit(1048576L)) * lit(2654435761L), lit(1048576L))
    Sources.documents(s, d)
      .withColumn("kept", k * b < a * lit(1048576L))
      .withColumn("rate", a.cast("double") / b.cast("double"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        round(avg("rate"), 4).as("target_rate"))
      .withColumn("observed_rate",
        round(col("n_kept").cast("double") / col("n_total").cast("double"), 4))
      .orderBy("lang")
  }

  val oracles: Map[String, String] = Map(
    // same parity assignment, same exact chi-square floor, same A&S
    // polynomial p on z = sqrt(chi2)
    "sample_srm_check" ->
      """WITH c AS (SELECT
        |   CAST(sum(CASE WHEN (o_orderkey * 2654435761) % 4294967296 % 2
        |     = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |   CAST(sum(CASE WHEN (o_orderkey * 2654435761) % 4294967296 % 2
        |     = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM orders),
        | z AS (SELECT n_a, n_b,
        |   sqrt(CAST(n_a - n_b AS DOUBLE) * CAST(n_a - n_b AS DOUBLE)
        |     / CAST(n_a + n_b AS DOUBLE)) AS az
        |  FROM c),
        | pv AS (SELECT n_a, n_b, az,
        |   CAST(round(2.0 * (0.3989422804014327 * exp(-0.5 * az * az)) *
        |     ((1.0 / (1.0 + 0.2316419 * az)) * (0.319381530
        |       + (1.0 / (1.0 + 0.2316419 * az)) * (-0.356563782
        |       + (1.0 / (1.0 + 0.2316419 * az)) * (1.781477937
        |       + (1.0 / (1.0 + 0.2316419 * az)) * (-1.821255978
        |       + (1.0 / (1.0 + 0.2316419 * az)) * 1.330274429)))))
        |    * 1e9) AS BIGINT) AS p_e9
        |  FROM z)
        |SELECT n_a, n_b,
        | ((n_a - n_b) * (n_a - n_b) * 1000000) // (n_a + n_b) AS chi2_e6,
        | p_e9,
        | CAST(CASE WHEN p_e9 < 1000000 THEN 1 ELSE 0 END AS BIGINT)
        |   AS srm_alarm
        |FROM pv""".stripMargin,
    // same hash-ranked stage-1 draw, same quarter-lattice stage 2,
    // exact x10 inverse-probability expansion
    "sample_two_stage" ->
      """WITH cust AS (SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nk,
        |   CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer),
        | nat AS (SELECT nk FROM (SELECT DISTINCT nk FROM cust)
        |   ORDER BY (nk * 2654435761) % 4294967296, nk LIMIT 10),
        | samp AS (SELECT c.* FROM cust c JOIN nat USING (nk)
        |   WHERE (c_custkey * 2246822519) % 4294967296 % 1000000 < 250000),
        | tr AS (SELECT CAST(sum(cents) AS BIGINT) AS t_true_cents,
        |   CAST(count(*) AS BIGINT) AS n_pop FROM cust)
        |SELECT n_pop,
        | CAST(count(DISTINCT nk) AS BIGINT) AS n_nations_hit,
        | CAST(count(*) AS BIGINT) AS n_sampled,
        | CAST(sum(cents) * 10 AS BIGINT) AS t_hat_cents,
        | t_true_cents,
        | CAST(sum(cents) * 10 AS BIGINT) - t_true_cents AS err_cents
        |FROM samp, tr GROUP BY n_pop, t_true_cents""".stripMargin,
    // same capped pi_e6 lattice, same Knuth inclusion, per-row floors
    // for y/pi (cents) and the variance term (hundred-dollar units)
    "sample_ht_poisson" ->
      """WITH o AS (SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        | tot AS (SELECT CAST(sum(cents) AS BIGINT) AS t_cents,
        |    CAST(count(*) AS BIGINT) AS n_pop FROM o),
        | incl AS (SELECT cents,
        |    least(1000000, (200 * cents * 1000000) // t_cents) AS pi_e6
        |   FROM o, tot
        |   WHERE (o_orderkey * 2654435761) % 4294967296 % 1000000
        |     < least(1000000, (200 * cents * 1000000) // t_cents)),
        | terms AS (SELECT pi_e6,
        |    (cents * 1000000) // pi_e6 AS y_over_pi,
        |    (((1000000 - pi_e6) * ((cents // 100000) * 1000000 // pi_e6))
        |      // 1000000) * ((cents // 100000) * 1000000 // pi_e6) AS v_term
        |   FROM incl)
        |SELECT (SELECT n_pop FROM tot) AS n_pop,
        | (SELECT t_cents FROM tot) AS t_true_cents,
        | CAST(count(*) AS BIGINT) AS n_sampled,
        | CAST(sum(CASE WHEN pi_e6 = 1000000 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_certainty,
        | CAST(sum(y_over_pi) AS BIGINT) AS t_ht_cents,
        | CAST(sum(v_term) AS BIGINT) AS v_hat_kusd2,
        | CAST(sum(y_over_pi) AS BIGINT) - (SELECT t_cents FROM tot)
        |   AS err_cents
        |FROM terms""".stripMargin,
    // same frozen start, same +2s positivity shift — the Spark div and
    // DuckDB // agree because every numerator stays positive
    "sample_pps_systematic" ->
      """WITH sz AS (SELECT o_custkey AS custkey,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |     AS sz_cents
        |  FROM orders GROUP BY 1),
        | c AS (SELECT *, CAST(sum(sz_cents) OVER (ORDER BY custkey)
        |    AS BIGINT) AS cum FROM sz),
        | t AS (SELECT CAST(max(cum) AS BIGINT) AS t_total FROM c),
        | h AS (SELECT custkey, sz_cents, cum,
        |   (cum - 1 - (t_total // 100) // 2 + 2 * (t_total // 100))
        |     // (t_total // 100)
        |   - (cum - sz_cents - 1 - (t_total // 100) // 2
        |     + 2 * (t_total // 100)) // (t_total // 100) AS n_hits
        |  FROM c CROSS JOIN t)
        |SELECT custkey, sz_cents, cum, n_hits FROM h WHERE n_hits > 0
        |ORDER BY custkey""".stripMargin,
    // same design CTE as the draw; per-unit contributions floor onto
    // e9 BEFORE the weighted sum
    "sample_hh_estimator" ->
      """WITH sz AS (SELECT o_custkey AS custkey,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |     AS sz_cents
        |  FROM orders GROUP BY 1),
        | c AS (SELECT *, CAST(sum(sz_cents) OVER (ORDER BY custkey)
        |    AS BIGINT) AS cum FROM sz),
        | t AS (SELECT CAST(max(cum) AS BIGINT) AS t_total FROM c),
        | h AS (SELECT custkey, sz_cents,
        |   (cum - 1 - (t_total // 100) // 2 + 2 * (t_total // 100))
        |     // (t_total // 100)
        |   - (cum - sz_cents - 1 - (t_total // 100) // 2
        |     + 2 * (t_total // 100)) // (t_total // 100) AS n_hits
        |  FROM c CROSS JOIN t),
        | it AS (SELECT o_custkey AS custkey, CAST(count(*) AS BIGINT) AS y
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1),
        | tt AS (SELECT CAST(sum(y) AS BIGINT) AS t_true FROM it),
        | dr AS (SELECT h.custkey, h.n_hits,
        |   (it.y * 1000000000) // h.sz_cents AS c_e9
        |  FROM h JOIN it ON h.custkey = it.custkey WHERE h.n_hits > 0),
        | a AS (SELECT CAST(sum(n_hits) AS BIGINT) AS n_draws,
        |   CAST(sum(n_hits * c_e9) AS BIGINT) AS sum_c_e9 FROM dr)
        |SELECT n_draws, t_total, t_true,
        | (t_total * sum_c_e9) // (100 * CAST(1000000000 AS BIGINT)) AS t_hh,
        | (t_total * sum_c_e9) // (100 * CAST(1000000000 AS BIGINT)) - t_true AS err
        |FROM a CROSS JOIN t CROSS JOIN tt""".stripMargin,
    // exact moments, one mirrored sqrt per stratum, then the exact
    // largest-remainder apportionment — sum(alloc) = 1000 exactly
    "sample_neyman_alloc" ->
      """WITH g AS (SELECT o_orderpriority AS grp,
        |   CAST(count(*) AS BIGINT) AS n_pop,
        |   CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS sx,
        |   CAST(sum(CAST(round(o_totalprice) AS BIGINT)
        |     * CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS sxx
        |  FROM orders GROUP BY 1),
        | wd AS (SELECT grp, n_pop,
        |    sqrt((sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n_pop::DOUBLE)
        |      / (n_pop::DOUBLE - 1.0)) AS sd,
        |    CAST(round(n_pop::DOUBLE
        |      * sqrt((sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n_pop::DOUBLE)
        |        / (n_pop::DOUBLE - 1.0))) AS BIGINT) AS w_h
        |  FROM g),
        | tot AS (SELECT CAST(sum(w_h) AS BIGINT) AS w_tot FROM wd),
        | based AS (SELECT grp, n_pop, sd, w_h,
        |    CAST((1000 * w_h) // w_tot AS BIGINT) AS base,
        |    1000 * w_h - ((1000 * w_h) // w_tot) * w_tot AS rem
        |  FROM wd CROSS JOIN tot),
        | lo AS (SELECT CAST(1000 - sum(base) AS BIGINT) AS leftover
        |  FROM based),
        | rk AS (SELECT *, row_number() OVER (ORDER BY rem DESC, grp ASC)
        |    AS rk FROM based)
        |SELECT grp, n_pop, round(sd, 2) + 0.0 AS sd, w_h,
        | CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
        |   AS alloc
        |FROM rk CROSS JOIN lo ORDER BY grp""".stripMargin,
    // the Kish moments are pure BIGINTs; every ratio is a floor lattice
    "sample_ess_weights" ->
      """WITH wt AS (SELECT * FROM (VALUES ('1-URGENT', 5), ('2-HIGH', 4),
        |    ('3-MEDIUM', 3), ('4-NOT SPECIFIED', 2), ('5-LOW', 1))
        |   t(o_orderpriority, wgt)),
        | t AS (SELECT c_nationkey, CAST(wgt AS BIGINT) AS wgt,
        |    CAST(round(o_totalprice) AS BIGINT) AS x
        |  FROM orders JOIN wt USING (o_orderpriority)
        |  JOIN customer ON o_custkey = c_custkey),
        | g AS (SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(wgt) AS BIGINT) AS sw,
        |    CAST(sum(wgt * wgt) AS BIGINT) AS sww,
        |    CAST(sum(wgt * x) AS BIGINT) AS swx
        |  FROM t GROUP BY 1)
        |SELECT c_nationkey, n, sw, sww,
        | CAST((100 * swx) // sw AS BIGINT) AS wmean_e2,
        | CAST((sw * sw * 1000000) // sww AS BIGINT) AS ess_e6,
        | CAST((n * sww * 1000000) // (sw * sw) AS BIGINT) AS deff_e6
        |FROM g ORDER BY c_nationkey""".stripMargin,
    "sample_kfold_balance" ->
      """WITH f AS (SELECT c_mktsegment,
        |    ((c_custkey % 1048576) * 2654435761 % 1048576) % 5 AS fold
        |  FROM customer),
        |cells AS (SELECT fold, c_mktsegment, count(*) AS n
        |  FROM f GROUP BY fold, c_mktsegment),
        |tot AS (SELECT fold, sum(n) AS fold_n FROM cells GROUP BY fold)
        |SELECT cells.fold, c_mktsegment, CAST(n AS BIGINT) AS n,
        |  CAST(fold_n AS BIGINT) AS fold_n,
        |  CAST((10000 * n) // fold_n AS BIGINT) AS share_bp
        |FROM cells JOIN tot ON cells.fold = tot.fold
        |ORDER BY cells.fold, c_mktsegment""".stripMargin,
    "sample_time_split" ->
      """WITH o AS (SELECT o_custkey,
        |   o_orderdate < DATE '1999-01-01' AS is_train FROM orders),
        | s AS (SELECT is_train, count(*) AS n_orders,
        |   count(DISTINCT o_custkey) AS n_customers FROM o GROUP BY is_train),
        | b AS (SELECT count(*) AS n_cust_both FROM
        |   (SELECT DISTINCT o_custkey FROM o WHERE is_train) tr
        |   JOIN (SELECT DISTINCT o_custkey FROM o WHERE NOT is_train) te
        |     USING (o_custkey))
        |SELECT CASE WHEN is_train THEN 'train' ELSE 'test' END AS split,
        | CAST(n_orders AS BIGINT) AS n_orders,
        | CAST(n_customers AS BIGINT) AS n_customers,
        | CAST(n_cust_both AS BIGINT) AS n_cust_both,
        | CAST((10000 * n_cust_both) // n_customers AS BIGINT) AS overlap_bp
        |FROM s CROSS JOIN b ORDER BY split""".stripMargin,
    "sample_negatives" ->
      """WITH pos AS (SELECT DISTINCT o_custkey AS custkey, l_partkey AS part
        |   FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        | np AS (SELECT count(*) AS np FROM part),
        | c AS (SELECT custkey, j.j,
        |   ((custkey * 2654435761 + j.j * 7919) % 1099511627776) % np.np AS part
        |  FROM (SELECT DISTINCT custkey FROM pos) u
        |  CROSS JOIN (SELECT unnest(range(1, 9)) AS j) j
        |  CROSS JOIN np),
        | sv AS (SELECT c.custkey, c.j, c.part FROM c
        |  WHERE NOT EXISTS (SELECT 1 FROM pos
        |    WHERE pos.custkey = c.custkey AND pos.part = c.part)),
        | r AS (SELECT custkey, part,
        |   CAST(row_number() OVER (PARTITION BY custkey ORDER BY j) AS BIGINT) AS rnk
        |  FROM sv)
        |SELECT custkey, rnk, part AS neg_part FROM r
        |WHERE rnk <= 3 ORDER BY custkey, rnk""".stripMargin,
    "sample_bootstrap_reps" ->
      """WITH o AS (SELECT o_orderkey AS id,
        |   CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        | r AS (SELECT unnest(range(0, 32)) AS rep),
        | x AS (SELECT r.rep,
        |   ((id % 1048576 + rep * 7919) * 2654435761) % 1048576 AS u, cents
        |  FROM o CROSS JOIN r),
        | wt AS (SELECT rep,
        |   CASE WHEN u < 385749 THEN 0 WHEN u < 771499 THEN 1
        |        WHEN u < 964373 THEN 2 WHEN u < 1028665 THEN 3
        |        WHEN u < 1044738 THEN 4 ELSE 5 END AS w, cents FROM x)
        |SELECT CAST(rep AS BIGINT) AS rep, CAST(sum(w) AS BIGINT) AS n_eff,
        | CAST(sum(w * cents) // sum(w) AS BIGINT) AS mean_cents
        |FROM wt GROUP BY rep ORDER BY rep""".stripMargin,
    "sample_temperature_mix" ->
      """WITH c AS (SELECT source, count(*) AS n_total FROM documents GROUP BY source),
        | w AS (SELECT source, n_total,
        |   CAST(floor(sqrt(n_total)) AS BIGINT) AS w FROM c),
        | t AS (SELECT CAST(sum(w) AS BIGINT) AS wsum FROM w),
        | b AS (SELECT source, n_total, w,
        |   (100 * w) // wsum AS base, (100 * w) % wsum AS rem
        |   FROM w CROSS JOIN t),
        | e AS (SELECT CAST(100 - sum(base) AS BIGINT) AS extra FROM b),
        | r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rnk FROM b)
        |SELECT source, n_total, w,
        | CAST(base + CASE WHEN rnk <= extra THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM r CROSS JOIN e ORDER BY source""".stripMargin,
    "sample_weighted_reservoir" ->
      """WITH t AS (SELECT doc_id, lang, n_chars,
        |   n_chars::DOUBLE /
        |     ((((doc_id % 1048576) * 2654435761) % 1048576 + 1)::DOUBLE / 1048577.0)
        |   AS priority
        | FROM documents)
        |SELECT doc_id, lang, n_chars, round(priority, 4) AS priority
        |FROM (SELECT * FROM t ORDER BY priority DESC, doc_id LIMIT 64)
        |ORDER BY doc_id""".stripMargin,
    "sample_group_split" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, lang, n_chars, list_distinct(string_split(text,' ')) AS wset FROM documents),
        | p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |   AND abs(a.n_chars - b.n_chars) <= 3
        |  WHERE round(len(list_intersect(a.wset, b.wset))::DOUBLE /
        |        len(list_distinct(list_concat(a.wset, b.wset))), 4) >= 0.3),
        | e AS (SELECT id_a AS src, id_b AS dst FROM p
        |        UNION ALL SELECT id_b, id_a FROM p),
        | reach(src, dst) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src),
        | g AS (SELECT src AS doc_id, min(dst) AS group_id
        |        FROM reach GROUP BY src),
        | t AS (SELECT doc_id, group_id,
        |   CASE WHEN group_id % 10 < 8 THEN 'train' WHEN group_id % 10 < 9 THEN 'val'
        |    ELSE 'test' END AS split
        |  FROM g)
        |SELECT split, count(DISTINCT group_id) AS n_groups, count(*) AS n_docs
        |FROM t GROUP BY split ORDER BY split""".stripMargin,
    "sample_seq_pack" ->
      """WITH t AS (
        | SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tokens,
        |  sum(len(string_split(text, ' '))) OVER (PARTITION BY lang ORDER BY doc_id)
        |    - len(string_split(text, ' ')) AS off
        | FROM documents)
        |SELECT lang, CAST(floor(off / 2048.0) AS BIGINT) AS seq_id,
        | count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
        | min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM t GROUP BY lang, seq_id ORDER BY lang, seq_id""".stripMargin,
    "sample_leakage_audit" ->
      """WITH t AS (
        | SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp,
        |  CASE WHEN doc_id % 10 < 8 THEN 'train' WHEN doc_id % 10 < 9 THEN 'val'
        |   ELSE 'test' END AS split
        | FROM documents),
        | tr AS (SELECT DISTINCT fp FROM t WHERE split = 'train')
        |SELECT split, count(*) AS n_docs,
        | CAST(sum(CASE WHEN tr.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_leaked,
        | round(sum(CASE WHEN tr.fp IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE / count(*), 4) AS leak_rate
        |FROM t LEFT JOIN tr ON t.fp = tr.fp
        |WHERE split <> 'train'
        |GROUP BY split ORDER BY split""".stripMargin,
    "sample_quality_weighted" ->
      """WITH t AS (
        | SELECT lang,
        |  len(list_distinct(string_split(text, ' '))) AS a,
        |  len(string_split(text, ' ')) AS b,
        |  ((doc_id % 1048576) * 2654435761) % 1048576 AS k
        | FROM documents)
        |SELECT lang, count(*) AS n_total,
        | CAST(sum(CASE WHEN k * b < a * 1048576 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        | round(avg(a::DOUBLE / b), 4) AS target_rate,
        | round(sum(CASE WHEN k * b < a * 1048576 THEN 1 ELSE 0 END)::DOUBLE / count(*), 4) AS observed_rate
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,
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
        |  (((doc_id % 1048576) * 2654435761) % 1048576)::DOUBLE / 1048576.0 AS draw
        | FROM documents)
        |SELECT source, rate, count(*) AS n_total,
        | CAST(sum(CASE WHEN draw < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        | round(sum(CASE WHEN draw < rate THEN 1 ELSE 0 END)::DOUBLE / count(*), 4) AS observed_rate
        |FROM t GROUP BY source, rate ORDER BY source""".stripMargin,
  )
}
