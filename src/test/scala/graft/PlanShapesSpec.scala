package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
import org.apache.spark.sql.execution.{QueryExecution, SimpleMode}

/** Plan-shape regression guards: the audits PLANS.md documents, executed
  * on every build. A change that degrades a query to a cartesian product,
  * loses scan pushdown, or re-introduces a single-partition global window
  * should fail here, not in a round review.
  */
class PlanShapesSpec extends SparkSpec {

  // computed once: constructing some queries eagerly runs driver-side
  // work (quantizer training collects, the connected-components loop,
  // prefix-offset collects), and several tests sweep all of them
  private lazy val allQe: Map[String, QueryExecution] =
    SparkEntry.queries.keys.map { n =>
      n -> SparkEntry.queries(n)(spark, sfDir).queryExecution
    }.toMap

  private lazy val allPlans: Map[String, String] =
    allQe.map { case (n, qe) => n -> qe.explainString(SimpleMode) }

  private def planOf(name: String): String = allPlans(name)

  /** Queries whose *intended* shape is a broadcast nested-loop / cross
    * join of a bounded side: the 5×5 region cross, the 10-row theta band
    * build, the ≤8-row broadcast query sets of the top-k scans, and the
    * 1-row scalar-aggregate attaches (corpus size N, unigram total) that
    * TF-IDF / LM scoring crossJoin(broadcast(...)) onto every row — a
    * single-row build side is the cheapest way to attach a corpus scalar
    * without a shuffle.
    */
  private val sanctionedCross = Set(
    "join_cross_regions", "join_price_bands",
    "sim_cosine_topk", "sim_cosine_topk_native", "sim_mips_topk",
    // 8-row packed probe-word broadcast (the cosineTopK discipline)
    "sim_binary_hamming",
    "text_tfidf_keywords", "text_lm_score", "text_pmi_bigrams",
    "agg_pareto_customers", "text_bm25", "graph_triangle_stats",
    "audit_key_skew", "search_hybrid_rrf",
    // 1-row bounds / 3-row quantile / ≤64-row grid broadcast builds
    "sketch_qgrid_daily", "sketch_qgrid_quantiles",
    // 1-row aggregate attaches (basket total / row total / node count /
    // weight total + leftover seats)
    "mining_frequent_pairs", "mining_association_rules", "audit_equidepth_hist",
    "sample_temperature_mix",
    // 1-row revenue-total + 1-row leftover-points attaches
    "agg_largest_remainder",
    "sketch_join_size",
    "audit_selectivity_est", "audit_contract_check", "audit_psi_drift",
    // 1-row distinct-counts attach onto the 1-row basic-stats row
    "audit_column_profile",
    "ml_mutual_info", "audit_referential", "etl_zorder_stats",
    // 1-row corpus-count attach for the percentile denominator
    "text_length_pct_rank",
    // 1-row (n, total) attach for the CUSUM statistic
    "ts_cusum_changepoint",
    // 1-row digit-total attach for the Benford shares
    "audit_benford",
    // calendar-bounded island-start × island-end theta join
    "audit_day_islands",
    // 8-row query broadcast / 1-row gap-total attach
    "sim_prefix_recall", "ts_interarrival",
    // 1-row max-index / reciprocal-count attaches
    "ts_holt_linear", "graph_reciprocity",
    // 19-row threshold broadcast against the |distinct scores| table
    "ml_roc_curve", "ml_pr_curve",
    // 1-row customer-count attach for the ntile denominator
    "win_ntile_quartiles",
    // r13 1-row/bounded attaches: corpus (n, n_pos) for deciles and the
    // stump; (n_a, n_b) for the JS buckets; the 5-row segment census +
    // 1-row total grid for t-closeness (zero cells need the full grid)
    "ml_lift_deciles", "ml_decision_stump", "stats_jsd", "priv_t_closeness",
    // 32-row eval-request broadcast against the train scan (the
    // cosineTopK discipline)
    "ml_knn_eval",
    // 1-row max-date + 1-row customer-count attaches for the quintiles
    "win_rfm_scores",
    // 1-row part-count attach for the negative-sample hash range
    "sample_negatives",
    // 1-row both-sides-overlap attach for the split audit
    "sample_time_split",
    // 1-row contingency-total / arm-stat / gap-max attaches
    "audit_chi2_segment_nation", "audit_ks_test", "audit_cramers_v",
    // 1-row edge-count attach for the Q denominator
    "graph_modularity",
    // 5-row language-stats grid / 1-row global-mean attach
    "ml_nb_confusion", "ml_target_encoding",
    // 1-row global-revenue-scalar attach (the Q11 HAVING threshold)
    "complex_important_parts",
    // 1-row corpus-totals attach for the log-odds prior
    "text_keyness",
    // 1-row corpus min/max + max-key attaches for the Z-grid bounds
    "layout_zorder_spans",
    // 1-row churn-horizon attach (global max order date − 90d)
    "ts_kaplan_meier",
    // calendar-bounded series × series slope-pair theta join (≤3.7k-row
    // broadcast build by construction) + 1-row n_days attach
    "ts_theil_sen",
    // 1-row basket-total attach for the triple support denominator
    "mining_frequent_triples",
    // decile-domain-bounded j≤k segment and j≤i≤k triple theta joins
    // (≤55 / ≤220 rows by construction — the minimax isotonic lattice)
    "ml_isotonic_frozen",
    // 1-row respondent-total attach for the RR estimator denominator
    "priv_rr_frequency",
    // 41-row published-grid broadcast for the KDE evaluation points
    "stats_kde_grid",
    // r13 batch-61+ 1-row/bounded attaches: grand-moment totals for the
    // ANOVA F and the WOE priors; 10-row frozen weight table with the
    // rank-<=min(10,R) theta filter for IDCG; blocking-census scalars
    // (counts only) for the ER metrics row; 1-row base-AUC attach for
    // the permutation-importance deltas
    "stats_anova_f", "ml_woe_bins", "search_eval_ndcg",
    "er_blocking_metrics", "ml_perm_importance_frozen",
    // 1-row integer-mean attach for the centered periodogram; 1-row
    // theta/census attaches over the k<=64-bounded KMV sketches
    "ts_periodogram_frozen", "sketch_theta_intersect",
    // 1-row total-count attach for the median utility band
    "priv_dp_median",
    // 1-row prominence-floor attach over the calendar-bounded dailies;
    // 1-row conformal-quantile attach against the test split
    "ts_peak_days", "ml_conformal_frozen",
    // 1-row min-date attach for the dyadic time axis; 1-row census
    // scalars for the frozen-banding metrics row
    "ts_haar_energy", "dedup_minhash_metrics",
    // 1-row (P, N) totals attach for the cost sweep
    "ml_cost_threshold",
    // 5x5 segment-offset theta self-join + cutoff attaches for the
    // tail algebra; 1-row n attach for the ragged-tail cap; 8-probe
    // broadcast for the radius census (the cosineTopK class)
    "stats_cvar_segment", "priv_microaggregation", "sim_range_count",
    // 16-subset characteristic-function algebra (model-sized by
    // construction); 1-row successor-census attach for the gap audit
    "join_attribution_shapley", "audit_key_gaps",
    // 1-row max-rate attach for the disparate-impact denominator
    "ml_fairness_audit",
    // 1-row weight-total/leftover attaches for the Neyman apportionment
    "sample_neyman_alloc",
    // 1-row (n, P) totals attach for the per-bin Murphy terms (r13)
    "ml_brier_decomposition",
    // 1-row bigram-total attach for the G2 contingency (r13)
    "text_collocation_llr",
    // 1-row member/bit-census attaches onto the 1-row probe verdict;
    // 1-row spend-total attach for the systematic sample points (r13)
    "sketch_bloom_fpr", "sample_pps_systematic",
    // 1-row moment attach for the SAX breakpoint lattice (r13)
    "ts_sax_symbols",
    // 1-row grand-moment attach for the Brown-Forsythe F (r13)
    "stats_levene_bf",
    // 1-row moment/total attaches: Shapley means, HH true total (r13)
    "ml_shap_linear_frozen", "sample_hh_estimator",
    // 1-row doc-count attach for the VMR denominator (r13)
    "text_burstiness",
    // batches 81-86 (r13): all 1-row broadcast attaches — MK pair
    // stats + tie term, QQ/HT/partition-plan grand totals, runs-test
    // median kernel, Heaps 25%-base row, tree root-split pick
    "ts_mann_kendall", "stats_qq_normal", "stats_runs_test",
    "sample_ht_poisson", "etl_partition_plan", "text_heaps_law",
    "ml_tree_depth2",
    // batch 87 (r13): the 8-vector ColBERT query side broadcasts
    // (the cosineTopK probe shape); KS attaches its 1-row totals
    "sim_maxsim_late", "ml_ks_separation",
    // batch 88 (r13): Cook's-distance moment attach and the
    // two-stage truth attach — both 1-row broadcast sides
    "ml_cooks_distance", "sample_two_stage",
    // batch 89 (r13): regression-metrics moment attach; the
    // negative-assoc candidate table is the 50-row top-support
    // DIMENSION crossed with itself (1 225 rows by construction)
    "ml_regression_metrics", "mining_negative_assoc",
    // batch 90 (r13): cluster-purity margin/total attaches and the
    // linear-counting 1-row x 1-row attach
    "ml_cluster_purity", "sketch_linear_counting",
    // batch 92 (r13): the retention plan's 1-row as-of attach
    "etl_retention_plan",
    // batch 93 (r13): Rocchio's 8-row probe/expanded-probe broadcasts
    // (the cosineTopK class) and Croston's 1-row series-start attach
    "sim_rocchio_prf", "ts_croston",
    // batch 94 (r13): Kendall's ≤70-cell contingency pair joins +
    // 1-row attaches; the DP-consistency 1-row target attach
    "stats_kendall_tau_b", "priv_dp_consistency",
    // batch 95 (r13): the Dirichlet-LM ≤3-row term-stat × 1-row
    // corpus-length fan-out broadcast (the text_bm25 class), and the
    // CIDR range join's 8-row block-table broadcast build (a real
    // 1M-entry routing table still broadcasts — the cosineTopK class)
    "search_query_likelihood", "join_cidr_lpm",
    // batch 96 (r13): the control chart's 1-row frozen-baseline attach
    "ts_xbar_control",
    // batch 97 (r13): Theil's 1-row grand-total attach; the lateness
    // audit's 3-row policy fan-out broadcast
    "stats_theil_decomp", "stream_lateness_audit",
    // batch 99 (r13): the AMS sketch's 1-row exact-F2 attach; the
    // Hilbert face-off's three 1-row census attaches per curve arm
    "sketch_ams_f2", "layout_hilbert_compare",
    // batch 101 (r13): the power sweep's 1-row baseline attach on the
    // 3-row lift domain; the snapshot diff's 1-row max-key attach
    "stats_power_twoprop", "etl_snapshot_diff",
    // batch 103 (r13): Boruvka's per-round 1-row forest-census attach
    "graph_boruvka_msf",
    // batch 104 (r13): the sweep's 8-query broadcast exact arm + 1-row
    // candidate/hit attaches (cosineTopK class); AP's 1-row P attach;
    // the MAD census's 1-row median/MAD/count attaches
    "sim_ivf_nprobe_sweep", "ml_average_precision", "ts_anomaly_mad",
    // batch 105 (r13): Burrows' 10-row top-word broadcast fan-out of
    // the 20-row source table (a 200-row grid by construction)
    "text_burrows_delta",
    // batch 106 (r13): the erasure audit's four 1-row census attaches;
    // BH's 1-row totals/kmax attaches on the 25-row nation dimension
    "etl_gdpr_erasure", "stats_bh_fdr",
    // batch 107 (r13): the triangle's 1-row as-of-date attach
    "ts_chain_ladder")

  /** Queries allowed a `Window.orderBy` with NO partition key — i.e. a
    * single-partition window Exchange. Sanctioned ONLY when the windowed
    * input is bounded by construction, not merely aggregate-reduced:
    * `audit_key_skew` ranks a 10-row post-`limit` set;
    * `search_hybrid_rrf` assigns ranks on its two 20-row post-`limit`
    * top-k arms; `agg_largest_remainder` (r12) ranks remainders on the
    * per-NATION allocation table — bounded by the 25-row nation
    * DIMENSION, which does not grow with the corpus (an apportionment
    * is definitionally over the dimension being apportioned).
    * Corpus-growing inputs (customer aggregates, vocabularies, price
    * levels) must use the two-pass [[graft.ops.Prefix]] shape instead.
    */
  private val sanctionedGlobalWindow =
    Set("audit_key_skew", "search_hybrid_rrf", "agg_largest_remainder",
      // cumulative sums over the 10-row DECILE dimension (bucket =
      // least(floor(score*10), 9) is domain-bounded by definition,
      // like the nation apportionment above)
      "ml_isotonic_frozen",
      // cumulative gain over the 10-row rank-decile rollup (r13) —
      // the decile dimension again, post-aggregate
      "ml_lift_deciles",
      // lag/lead over the CALENDAR-bounded daily series (≤3.7k rows —
      // the ts_theil_sen bound), not a corpus-growing input
      "ts_peak_days",
      // remainder ranking over the 5-row stratum DIMENSION (the
      // agg_largest_remainder apportionment class)
      "sample_neyman_alloc",
      // island numbering over the CALENDAR-bounded missing-day set
      // (≤ span days by construction — the ts_peak_days class)
      "etl_backfill_plan",
      // rank over the 5-row post-limit release (audit_key_skew class)
      "priv_dp_topk",
      // runs test (r13): cumulative count over the CALENDAR-bounded
      // daily value domain + lag over the daily index — both the
      // ts_peak_days class (≤ span days by construction)
      "stats_runs_test",
      // DP consistency (r13): apportionment rank + base-sum window
      // over the ~40-cell RELEASE table (the priv_dp_topk class)
      "priv_dp_consistency",
      // BH rank over the 25-row NATION dimension (r13) — the
      // agg_largest_remainder apportionment class
      "stats_bh_fdr")

  "every query plan" should "be free of cartesian products" in {
    val offenders = allPlans.collect {
      case (name, plan) if plan.contains("CartesianProduct") => name
    }
    offenders.toSeq shouldBe empty
  }

  it should "use broadcast-NL joins only where a bounded build side is intended" in {
    val offenders = allPlans.collect {
      case (name, plan) if !sanctionedCross(name) &&
        plan.contains("BroadcastNestedLoopJoin") => name
    }
    offenders.toSeq shouldBe empty
  }

  /** The [[graft.ops.Prefix]] offset window is unpartitioned but bounded
    * BY CONSTRUCTION: its input is the per-partition summary aggregate
    * (groupBy `__pid`), ≤ shuffle-partition-count rows regardless of
    * data size — the same boundedness argument as the sanctioned
    * dimension windows, recognized structurally so every Prefix caller
    * stays covered without a per-query allowlist entry.
    */
  private def isPidSummaryWindow(w: LogicalWindow): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
    def pidAggregate(p: LogicalPlan): Boolean = p match {
      case a: Aggregate =>
        a.groupingExpressions.nonEmpty &&
          a.groupingExpressions.forall(_.references.forall(_.name == "__pid"))
      case pr: Project => pidAggregate(pr.child)
      case _ => false
    }
    pidAggregate(w.child)
  }

  it should "contain no unpartitioned window over an unbounded input" in {
    val offenders = allQe.collect {
      case (name, qe) if !sanctionedGlobalWindow(name) &&
        qe.optimizedPlan.collect {
          case w: LogicalWindow
            if w.partitionSpec.isEmpty && !isPidSummaryWindow(w) => w
        }.nonEmpty => name
    }
    offenders.toSeq shouldBe empty
  }

  /** Queries allowed a KEYED SortAggregate. String/struct aggregation
    * buffers don't fit the hash aggregate's UnsafeRow, so min/max over
    * strings or structs in a grouped aggregate degrades to
    * SortAggregate — which SORTS its input per partition. That is fine
    * when the input is model-sized or post-aggregate (these four:
    * `agg_minmax_by` exercises the max_by/min_by BUILT-INS over a
    * 5-group corpus — the operator itself is the coverage point;
    * `agg_mode`'s argmin input is the post-count (flag, qty) table;
    * `ml_nb_confusion` argmaxes the docs×5-language score grid;
    * `sim_pq_adc`'s min_by reduces the |q|-row serving grid) but a
    * corpus-sized input here is the audit_column_profile bug class —
    * the whole corpus sorted per partition for want of a two-pass
    * formulation. New offenders fail here.
    *
    * `er_best_link` (r12): the per-A argmax is a groupBy-MIN over a
    * rank struct, and its input is the ≥ 0.9-thresholded candidate set
    * — the same cardinality as the er_jaro_pairs MATCH output, never
    * the corpus or the unfiltered candidate cross — so the per-
    * partition sort is over survivor pairs only (and keeps map-side
    * partial aggregation, unlike the window formulation it replaced).
    */
  /** `priv_exponential_mech` (r13): the argmax-priority min(prio) is a
    * string MIN keyed by year over the years×5-priority CELL table —
    * bounded by the released dimension (the agg_mode post-count class),
    * never the order corpus.
    */
  /** `er_soundex_blocking` (r13): the min/max word witnesses aggregate
    * the VOCABULARY-sized type table (post-count, the agg_mode class).
    */
  private val sanctionedSortAgg =
    Set("agg_minmax_by", "agg_mode", "ml_nb_confusion", "sim_pq_adc",
      "er_best_link", "priv_exponential_mech", "er_soundex_blocking")

  it should "plan keyed SortAggregates only at sanctioned model-sized sites" in {
    val keyed = "SortAggregate\\(key=\\[[^\\]]".r
    val offenders = allPlans.collect {
      case (name, plan) if !sanctionedSortAgg(name) &&
        keyed.findFirstIn(plan).isDefined => name
    }
    offenders.toSeq shouldBe empty
  }

  "etl_range_filter" should "push its date range down to the parquet scan" in {
    val p = planOf("etl_range_filter")
    p should include("PushedFilters")
    p should include("GreaterThanOrEqual(l_shipdate")
  }

  "agg_pricing_summary" should "prune the scan to the referenced columns" in {
    val p = planOf("agg_pricing_summary")
    // 6 of lineitem's 11 columns are referenced; the scan must not read more
    p should include("ReadSchema")
    p should not include "l_partkey"
    p should not include "l_comment"
  }

  "win_topk_orders" should "push the rank limit below the window" in {
    planOf("win_topk_orders") should include("WindowGroupLimit")
  }

  "topk_global_orders" should "avoid a global sort via TakeOrderedAndProject" in {
    planOf("topk_global_orders") should include("TakeOrderedAndProject")
  }

  "text_vocab_coverage" should "take its top-10 via TakeOrderedAndProject" in {
    planOf("text_vocab_coverage") should include("TakeOrderedAndProject")
  }

  // The k-means E-step must stay a literal-centroid map-side projection:
  // centroids are driver-resident between iterations, so any join (the
  // old crossJoin(broadcast(seeds)) + groupBy(vec_id) shape re-shuffled
  // the full embedding payload k× per iteration) is a regression. The
  // only allowed Exchanges are the k-row census / M-step aggregates and
  // the final order.
  // Every PageRank-family loop pins its rank table per round, so the
  // final plan must be constant-depth regardless of iteration count:
  // a top-k over one RDD scan, with no join (and no 1-row broadcast
  // attach) surviving above the pin. A join here means a loop body
  // leaked into the final lineage — the unbounded-plan-growth failure
  // mode at scale.
  "the fixed-iteration graph loops" should "end constant-depth at a pinned rank table" in {
    Seq("graph_pagerank_parts", "graph_ppr_seeds", "graph_pagerank_weighted")
      .foreach { q =>
        planOf(q) should include("ExistingRDD")
        planOf(q) should not include "Join"
      }
  }

  "ml_kmeans_lloyd and ml_kmeans_assign" should "assign map-side with no join" in {
    planOf("ml_kmeans_lloyd") should not include "Join"
    planOf("ml_kmeans_assign") should not include "Join"
  }

  // r12 verdict task 4: drawdown/OHLC have multiple consumers of their
  // daily-aggregate lineage (heads + peakDay + final join; bars + two
  // join-backs). The fix pins the shared table lazily, so the final plan
  // must contain at most ONE orders parquet scan — every other consumer
  // reads the pinned LogicalRDD. Un-pinning regresses to 3-4 corpus
  // scans per query, invisible at sf0.1 but real money at 100 TB.
  "ts_drawdown and ts_ohlc_bars" should "scan orders at most once (pinned daily lineage)" in {
    Seq("ts_drawdown", "ts_ohlc_bars").foreach { q =>
      val p = planOf(q)
      val scans = "orders\\.parquet".r.findAllIn(p).size
      withClue(s"$q orders scans: ") { scans should be <= 1 }
      p should include("ExistingRDD") // the pinned daily table
    }
  }
}
