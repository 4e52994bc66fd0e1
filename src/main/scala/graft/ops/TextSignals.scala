package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Sources
import graft.io.Checkpoints.PinOps

/** Corpus-statistics quality signals — the filters a pre-training data
  * pipeline derives from GLOBAL corpus statistics rather than from a
  * single document in isolation (complementing [[TextOps]], whose
  * quality scores are per-document-local):
  *
  *  - repetition signals (top-word fraction, duplicate-bigram fraction) —
  *    the Gopher-style "repetitious document" filters;
  *  - TF-IDF keyword extraction — inverse document frequency needs the
  *    corpus-wide df table;
  *  - a unigram language-model score (mean log₂ p under the corpus
  *    unigram distribution) — the cheap perplexity proxy used to rank
  *    documents by "typicality" before a real LM scores them;
  *  - percentile-based length outlier trimming — thresholds derived from
  *    the observed per-language distribution, not hard-coded.
  *
  * Scale shapes: every corpus statistic here is either a broadcastable
  * aggregate (vocabulary-sized unigram/df tables, one row per distinct
  * word) or a window over a partitionable key (per-language ranks) — no
  * all-pairs stage anywhere. The explode → two-level aggregate pattern
  * keeps per-document word counting in map-side partial aggregation, and
  * the df/unigram joins broadcast because a vocabulary is bounded (≪
  * corpus size) by Heaps' law.
  */
object TextSignals {

  private def words(c: org.apache.spark.sql.Column) = split(c, " ")

  /** Repetition signals per document (Gopher-style): fraction of tokens
    * that are the single most frequent word, and the duplicate-bigram
    * fraction (1 − distinct/total bigrams). Both catch templated or
    * looping text that per-document length/stopword checks miss.
    *
    * The top-word count is explode → (doc, word) partial agg → per-doc
    * max — two shuffles of (doc_id, word) width, linear in corpus size.
    * The bigram fraction never leaves the row: a codegen'd higher-order
    * transform over the word array. The keep flag is evaluated on the
    * ROUNDED fractions so the decision is reproducible across engines.
    */
  def textRepetition(s: SparkSession, d: String): DataFrame = {
    val docs = Sources.documents(s, d)
    val wc = docs.select(col("doc_id"), explode(words(col("text"))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    val top = wc.groupBy("doc_id")
      .agg(max("c").as("top_c"), sum("c").as("n_words"))
      .select(col("doc_id"),
        round(col("top_c").cast("double") / col("n_words").cast("double"), 4)
          .as("top_word_frac"))
    val bgs = transform(
      sequence(lit(1), size(col("__w")) - 1),
      i => concat_ws(" ", slice(col("__w"), i, lit(2))))
    // <2 words ⇒ no bigrams: defined as 0.0 (CaseWhen short-circuits, so
    // the descending sequence(1, 0) / slice(_, 0, _) path never evaluates)
    val dup = docs.withColumn("__w", words(col("text")))
      .select(col("doc_id"),
        when(size(col("__w")) < 2, lit(0.0))
          .otherwise(round(lit(1.0) - size(array_distinct(bgs)).cast("double") /
            size(bgs).cast("double"), 4)).as("dup_2gram_frac"))
    top.join(dup, "doc_id")
      .withColumn("keep",
        col("top_word_frac") <= 0.11 && col("dup_2gram_frac") <= 0.05)
      .orderBy("doc_id")
  }

  /** Per-document top-3 keywords by TF-IDF. tf is the in-document count;
    * idf = ln(N / df) over the corpus document frequency. Ranking uses
    * the ROUNDED score (ties broken by word) so the top-3 cut is
    * engine-reproducible.
    *
    * Plan: the df table and the corpus size N are vocabulary-sized /
    * scalar aggregates — broadcast joins against the (doc, word, tf)
    * stream — and the top-3 is a per-doc window that WindowGroupLimit
    * reduces to a running top-k, not a full sort.
    */
  def tfidfKeywords(s: SparkSession, d: String): DataFrame = {
    val docs = Sources.documents(s, d)
    val wc = docs.select(col("doc_id"), explode(words(col("text"))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val dfTbl = wc.groupBy("w").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = wc
      .join(broadcast(dfTbl), "w")
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")), 4))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("w").asc)
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk"), col("w").as("word"), col("score"))
      .orderBy("doc_id", "rnk")
  }

  /** Unigram LM score: mean log₂ p(w) per document under the corpus
    * unigram distribution — the cheap "how typical is this text"
    * ranking used to pre-sort documents before an expensive model-based
    * quality pass. Every token is in-vocabulary by construction (the LM
    * is trained on the same corpus), so no smoothing term is needed.
    *
    * Plan: unigram counts + the total are vocabulary-sized broadcast
    * aggregates; the scoring pass is one explode + broadcast join + per-
    * doc average — linear, two narrow shuffles.
    */
  def lmScore(s: SparkSession, d: String): DataFrame = {
    val toks = Sources.documents(s, d)
      .select(col("doc_id"), explode(words(col("text"))).as("w"))
    val uni = toks.groupBy("w").agg(count(lit(1)).as("c"))
    val tot = uni.agg(sum("c").cast("double").as("t"))
    toks
      .join(broadcast(uni), "w")
      .crossJoin(broadcast(tot))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        graft.functions.Num.roundNorm(avg(log2(col("c").cast("double") / col("t"))), 4).as("lm_score"))
      .orderBy("doc_id")
  }

  /** Percentile-trimmed length filter: keep documents whose n_chars
    * percent_rank within their language lies in [0.05, 0.95] — thresholds
    * from the DATA's distribution, the way production corpus trimming
    * derives cutoffs (fixed byte cutoffs misbehave across languages).
    * percent_rank = (rank−1)/(n−1) is exact rational arithmetic, so the
    * cut is engine-reproducible; ties share a rank on both sides.
    * One window shuffle on the language key.
    */
  def lengthOutliers(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("lang").orderBy("n_chars")
    Sources.documents(s, d)
      .withColumn("pr", percent_rank().over(w))
      .filter(col("pr") >= 0.05 && col("pr") <= 0.95)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        round(col("pr"), 4).as("len_pct_rank"))
      .orderBy("doc_id")
  }

  /** Bigram LM score: mean log₂ P(wᵢ | wᵢ₋₁) per document under the
    * corpus MLE bigram model — the next step up from [[lmScore]]'s
    * unigram typicality; repetitive/templated text scores HIGH (its
    * transitions are corpus-common) while word-salad scores low, so the
    * two scores together separate "fluent", "templated" and "random"
    * regimes before any neural model runs. P(w|prev) = c(prev w) /
    * c(prev·): the denominator counts prev as a bigram CONTEXT, so the
    * conditional properly normalizes and every scored bigram is in-model
    * by construction (no smoothing term).
    *
    * Plan: bigram stream via the same guarded in-row shingle transform
    * as the dedup path (no cross-row work); the context-count table is
    * vocabulary-sized ⇒ broadcast; the bigram-count join keys on the
    * bigram string and is left to AQE — at 100 TB bigram vocabulary can
    * exceed broadcast size, and a shuffle equi-join on the bigram key is
    * the correct scale shape (one linear shuffle each side).
    */
  def bigramLmScore(s: SparkSession, d: String): DataFrame = {
    // fan out before tokenizing (single-file scan ⇒ one-core otherwise)
    // and BARRIER the split with a lazy pin of the small (doc_id, words)
    // table — without it Catalyst collapses the projection and the
    // shingle lambda re-tokenizes the document once per bigram, the
    // O(words²) trap shingleSetsRaw documents. The pin is ~5k word
    // arrays, not the exploded occurrences.
    val wtab = Sources.documents(s, d)
      .repartition(math.max(2, s.sparkContext.defaultParallelism))
      .select(col("doc_id"), words(col("text")).as("__w"))
      .filter(size(col("__w")) >= 2)
      .pinned(eager = false)
    val toks = wtab.select(col("doc_id"),
      explode(graft.ops.Dedup.wordShingles(col("__w"), 2)).as("bg"))
    // the conditional-probability table is DISTINCT-BIGRAM-sized (the
    // synthetic vocabulary keeps it sub-1k; natural corpora ~vocab²
    // observed, still model-sized): derive the prev totals from the
    // bigram counts (sum over cb ≡ counting occurrences by prev) so the
    // exploded table is aggregated ONCE, then broadcast the per-bigram
    // log-prob back — one shuffle over occurrences + one map-side join,
    // where the old plan shuffled the occurrences through two joins.
    val bgCounts = toks.groupBy("bg").agg(count(lit(1)).as("cb"))
      .withColumn("prev", split(col("bg"), " ").getItem(0))
    val prevCounts = bgCounts.groupBy("prev").agg(sum("cb").as("cp"))
    val probs = bgCounts.join(prevCounts, "prev")
      .select(col("bg"),
        log2(col("cb").cast("double") / col("cp").cast("double")).as("lp"))
    toks
      .join(broadcast(probs), "bg")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        graft.functions.Num.roundNorm(avg(col("lp")), 4).as("bigram_lm_score"))
      .orderBy("doc_id")
  }

  /** Vocabulary coverage — the tokenizer-design statistic: what fraction
    * of each language's token mass is covered by the corpus-wide top-K
    * words? A language whose coverage is low under a shared vocabulary
    * is under-served by it (the multilingual-tokenizer fairness check).
    * K = 10 here so the cut binds on the fixture's compact vocabulary
    * (coverage ~0.34-0.36, varying by language); production would use a
    * vocabulary-sized K — the plan is K-independent.
    *
    * The top-K cut is `orderBy(...).limit(K)` — Spark plans it as
    * `TakeOrderedAndProject`: per-partition top-K on every executor, then
    * a K·partitions-row driver merge. No row_number, no single-partition
    * sort, vocabulary growth never concentrates on one task; the ranked
    * head then broadcasts into a hash join against the token stream.
    * Ties break on the word so the cut is engine-reproducible.
    */
  def vocabCoverage(s: SparkSession, d: String): DataFrame = {
    val toks = Sources.documents(s, d)
      .select(col("lang"), explode(words(col("text"))).as("w"))
    val uni = toks.groupBy("w").agg(count(lit(1)).as("c"))
    val top = uni
      .orderBy(col("c").desc, col("w").asc).limit(10)
      .select(col("w")).withColumn("in_top", lit(true))
    toks.join(broadcast(top), Seq("w"), "left")
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("in_top"), 1L).otherwise(0L)).as("n_in_top"))
      .withColumn("coverage",
        round(col("n_in_top").cast("double") / col("n_tokens").cast("double"), 4))
      .orderBy("lang")
  }

  /** Pointwise mutual information of adjacent word pairs — the corpus
    * collocation statistic (which pairs co-occur far above chance). The
    * unigram and bigram tables are vocabulary-sized aggregates (broadcast
    * to the pair table); totals attach as 1-row broadcasts (sanctioned
    * BNLJ shape, see PlanShapesSpec). Min-count 5 keeps the estimate out
    * of the noisy tail. No all-pairs stage: pairs come from adjacency
    * within rows, counts from hash aggregation.
    */
  def pmiBigrams(s: SparkSession, d: String): DataFrame = {
    val docs = Sources.documents(s, d).withColumn("__w", words(col("text")))
    val uni = docs.select(explode(col("__w")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
    val tw = uni.agg(sum("cw").cast("double").as("tw"))
    val bg = docs.filter(size(col("__w")) >= 2)
      .select(explode(transform(
        sequence(lit(1), size(col("__w")) - 1),
        i => concat_ws(" ", slice(col("__w"), i, lit(2))))).as("bgs"))
      .select(split(col("bgs"), " ").getItem(0).as("wa"),
        split(col("bgs"), " ").getItem(1).as("wb"))
    val tb = bg.agg(count(lit(1)).cast("double").as("tb"))
    bg.groupBy("wa", "wb").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= 5)
      .join(broadcast(uni.select(col("w").as("wa"), col("cw").as("ca"))), "wa")
      .join(broadcast(uni.select(col("w").as("wb"), col("cw").as("cb"))), "wb")
      .crossJoin(broadcast(tw))
      .crossJoin(broadcast(tb))
      .withColumn("pmi", graft.functions.Num.roundNorm(log2((col("n_pair") / col("tb")) /
        ((col("ca") / col("tw")) * (col("cb") / col("tw")))), 4))
      .select("wa", "wb", "n_pair", "pmi")
      .orderBy("wa", "wb")
  }

  /** Per-document bigram novelty: the fraction of a document's distinct
    * bigrams that appear in NO earlier document (ownership attributed to
    * the minimum doc_id containing each bigram). A cheap contribution
    * signal for curriculum ordering / dedup triage — a document whose
    * bigrams all appeared before adds little. Pure integer arithmetic
    * (counts and a min), so the rounded ratio is bit-reproducible in any
    * engine. One equi-join on the bigram key — first-occurrence via
    * `min(doc_id)`, never a pairwise comparison.
    */
  def bigramNovelty(s: SparkSession, d: String): DataFrame = {
    val docBg = Sources.documents(s, d)
      .withColumn("__w", words(col("text")))
      .filter(size(col("__w")) >= 2)
      .select(col("doc_id"), explode(array_distinct(transform(
        sequence(lit(1), size(col("__w")) - 1),
        i => concat_ws(" ", slice(col("__w"), i, lit(2)))))).as("bg"))
    val first = docBg.groupBy("bg").agg(min("doc_id").as("first_doc"))
    docBg.join(first, "bg")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_bigrams").cast("double"), 4))
      .orderBy("doc_id")
  }

  /** Zipf-law fit over the corpus vocabulary: least-squares slope of
    * log-frequency vs log-rank (natural text ≈ −1; templated/synthetic
    * corpora drift toward 0 or over-steepen). Global rank comes from the
    * two-pass prefix aggregation in [[Prefix]] (range-partition by
    * (count desc, word), local row_number, broadcast k count-offsets) —
    * the rank is an exact integer, so the two-pass form is bit-identical
    * to a global window with no single-partition sort as the vocabulary
    * grows (Heaps' law); everything after is one constant-size aggregate.
    */
  def zipfSlope(s: SparkSession, d: String): DataFrame = {
    val uni = Sources.documents(s, d)
      .select(explode(words(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val pts = Prefix.running(uni,
        order = Seq(col("c").desc, col("w").asc),
        rankOut = Some("r"))
      .select(log(col("r").cast("double")).as("lr"), log(col("c").cast("double")).as("lc"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    pts.agg(
        count(lit(1)).cast("double").as("n"),
        sum("lr").as("sx"), sum("lc").as("sy"),
        sum(col("lr") * col("lc")).as("sxy"),
        sum(col("lr") * col("lr")).as("sxx"))
      .select(
        col("n").cast("long").as("n_types"),
        graft.functions.Num.roundNorm(slope, 4).as("zipf_slope"),
        graft.functions.Num.roundNorm((col("sy") - slope * col("sx")) / col("n"), 4).as("intercept"))
  }

  /** BM25 ranked retrieval for a fixed 3-term query — the IR scoring
    * function every keyword-search / retrieval-augmentation pipeline
    * runs (k1 = 1.2, b = 0.75, Robertson idf with the +1 floor). The
    * posting lists come from one token-filtered explode (scan-side
    * `isin` prune — only query terms survive the Generate), document
    * lengths and the corpus stats (N, avgdl) are one narrow aggregate
    * each, and scoring is a per-(doc, term) projection summed per doc.
    * Output keeps every matched doc ordered by doc_id (rank-order
    * assertions live in the spec; a rounded-score ORDER BY would be
    * tie-unstable across engines at the cutoff).
    */
  def bm25(s: SparkSession, d: String): DataFrame = {
    val terms = Seq("spark", "vector", "dup")
    val k1 = 1.2
    val b = 0.75
    val docs = Sources.documents(s, d)
    val lens = docs.select(col("doc_id"), size(words(col("text"))).cast("double").as("dl"))
    val stats = lens.agg(count(lit(1)).cast("double").as("n"), avg("dl").as("avgdl"))
    val tf = docs.select(col("doc_id"), explode(words(col("text"))).as("w"))
      .filter(col("w").isin(terms: _*))
      .groupBy("doc_id", "w").agg(count(lit(1)).cast("double").as("tf"))
    val dfT = tf.groupBy("w").agg(count(lit(1)).cast("double").as("df"))
    val idf = log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val score = idf * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    tf.join(broadcast(dfT), "w")
      .join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("sc", score)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms_matched"), round(sum("sc"), 4).as("bm25"))
      .orderBy("doc_id")
  }

  /** Burrows' Delta stylometry (`text_burrows_delta`, r13): the
    * standard authorship-attribution distance (Burrows 2002; Evert et
    * al. 2017 on why it works) — z-score the relative frequencies of
    * the corpus's top function words across sources, then Δ(s₁, s₂) =
    * mean |z₁ − z₂|; closest pairs share a "stylistic fingerprint".
    * Lattice shape: relative frequencies are exact e6 integer floors
    * (count·1e6 div source tokens — e6 keeps the squared moment sums
    * ≤ ~2e13, far inside Long), the per-(word, source) z is ONE
    * mirrored finish on the 20-source moments in the overflow-safe
    * s2/n − m² sample form, and Δ is then pure integer arithmetic
    * (sum of |z| differences div word count — positive, div-safe).
    * Plan: one token shuffle to (source, word) counts, a top-10 word
    * cut (TakeOrdered), the 20×10 frequency grid driven from the full
    * source×word domain so ZERO counts z-score too (a missing word IS
    * stylistic signal), a 10-row moment broadcast, and the 190-pair
    * self-join of the 200-row z grid. Top-10 closest pairs released.
    */
  def burrowsDelta(s: SparkSession, d: String): DataFrame = {
    val toks = Sources.documents(s, d)
      .select(col("source"), explode(words(col("text"))).as("w"))
    val srcTok = toks.groupBy("source").agg(count(lit(1)).as("nt"))
    val top = toks.groupBy("w").agg(count(lit(1)).as("cw"))
      .orderBy(col("cw").desc, col("w")).limit(10).select("w")
    val cnt = toks.join(broadcast(top), "w")
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    val f = srcTok.crossJoin(broadcast(top))
      .join(cnt, Seq("source", "w"), "left")
      .select(col("source"), col("w"),
        expr("(coalesce(c, 0L) * 1000000L) div nt").as("f_e6"))
    val stats = f.groupBy("w").agg(count(lit(1)).as("ns"),
      sum("f_e6").as("m1"), sum(col("f_e6") * col("f_e6")).as("m2"))
    val nsD = col("ns").cast("double")
    val varS = (col("m2").cast("double") / nsD -
      (col("m1").cast("double") / nsD) * (col("m1").cast("double") / nsD)) *
      (nsD / (col("ns") - lit(1L)).cast("double"))
    val z = f.join(broadcast(stats), "w")
      .select(col("source"), col("w"),
        // a word with identical frequency in every source has zero
        // variance — no stylistic signal, z pinned to 0 (NaN would
        // diverge between engines)
        when(col("m2") * col("ns") === col("m1") * col("m1"), lit(0L))
          .otherwise(round(lit(1e6) *
            (col("f_e6").cast("double") - col("m1").cast("double") / nsD) /
            sqrt(varS)).cast("long")).as("z_e6"))
    z.select(col("source").as("src_a"), col("w"), col("z_e6").as("za"))
      .join(z.select(col("source").as("src_b"), col("w"),
        col("z_e6").as("zb")), "w")
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("m"), sum(abs(col("za") - col("zb")))
        .as("sum_abs_dz"))
      .withColumn("delta_e6", expr("sum_abs_dz div m"))
      .orderBy(col("delta_e6").asc, col("src_a"), col("src_b")).limit(10)
  }

  /** Dirichlet-smoothed query-likelihood ranking
    * (`search_query_likelihood`, r13): the language-modelling
    * alternative to [[bm25]] — score(d) = Σ_t ln((tf + μ·cf_t/|C|) /
    * (|d| + μ)) with μ = 2000 (Zhai & Lafferty 2001), the ranking
    * function behind LM-based retrieval and the usual second arm of a
    * lexical A/B against BM25. Engine-parity design: the smoothed
    * probability is the exact integer rational (tf·|C| + μ·cf) /
    * ((|d| + μ)·|C|) — numerator and denominator are assembled as
    * BIGINTs in BOTH engines, so the single mirrored ln sees the
    * identical double ratio and the per-TERM e6 lattice value is
    * deterministic; scores are then exact integer sums (the per-row-
    * lattice-terms discipline of `ml_regression_metrics`). Unlike BM25
    * every document is scored against every query term (tf = 0 rows
    * carry the smoothing mass), so the plan fans the doc-length table
    * out by the ≤3-row term-stat broadcast and LEFT-joins the sparse
    * tf table — corpus × |q| rows, one shuffle for tf, one for the
    * final top-10 TakeOrderedAndProject. The term domain is the terms
    * PRESENT in the corpus (cf > 0; identical CTE in the oracle), so
    * ln never sees zero mass on any fixture.
    */
  def queryLikelihood(s: SparkSession, d: String): DataFrame = {
    val mu = 2000L
    val terms = Seq("spark", "vector", "dup")
    val docs = Sources.documents(s, d)
    val lens = docs.select(col("doc_id"),
      size(words(col("text"))).cast("long").as("dl"))
    val tok = docs.select(col("doc_id"), explode(words(col("text"))).as("w"))
      .filter(col("w").isin(terms: _*))
    val clen = lens.agg(sum("dl").as("clen"))
    val cf = tok.groupBy("w").agg(count(lit(1)).as("cf"))
    val tf = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val scored = lens.crossJoin(broadcast(cf.crossJoin(clen)))
      .join(tf, Seq("doc_id", "w"), "left")
      .withColumn("tfv", coalesce(col("tf"), lit(0L)))
      .withColumn("num", col("tfv") * col("clen") + lit(mu) * col("cf"))
      .withColumn("den", (col("dl") + lit(mu)) * col("clen"))
      .withColumn("term_e6", round(
        log(col("num").cast("double") / col("den").cast("double")) * 1e6)
        .cast("long"))
    scored.groupBy("doc_id")
      .agg(sum(when(col("tfv") > 0, 1L).otherwise(0L)).as("n_matched"),
        sum("term_e6").as("score_e6"))
      .select(col("doc_id"), col("n_matched"), col("score_e6"))
      .orderBy(col("score_e6").desc, col("doc_id")).limit(10)
  }

  /** Hybrid retrieval fusion (`search_hybrid_rrf`): reciprocal-rank
    * fusion (RRF, Cormack et al.) of the BM25 keyword arm and the
    * embedding-cosine arm for one request — the standard fusion step of
    * a RAG / hybrid-search serving stack (`score = Σ 1/(60 + rank)`,
    * rank-based so neither arm's score scale needs calibration).
    *
    * Engine-parity design: each arm ranks by its ROUNDED score with a
    * doc_id tie-break (rounded BM25 is already oracle-verified; cosine
    * runs in full double precision and rounds at 6), so ranks — integer
    * arithmetic from there on — are deterministic across engines. Each
    * arm's top-20 comes from `orderBy.limit` = TakeOrderedAndProject
    * (distributed top-k); rank assignment is a global window over the
    * bounded 20-row result (sanctioned in PlanShapesSpec, same class as
    * `audit_key_skew`). The fusion join is 20×20-row. At corpus scale
    * nothing outside the two top-k scans runs: BM25's posting lists are
    * term-filtered at the scan, the cosine arm is one map-side
    * projection against the broadcast 1-row query vector.
    */
  def hybridRrf(s: SparkSession, d: String): DataFrame = {
    val topN = 20
    // keyword arm: rounded-BM25 ranks on the bounded top-20
    val kwTop = bm25(s, d).select(col("doc_id"), col("bm25"))
      .orderBy(col("bm25").desc, col("doc_id")).limit(topN)
    val wK = Window.orderBy(col("bm25").desc, col("doc_id")) // 20-row set
    val kw = kwTop.withColumn("rank_kw", row_number().over(wK).cast("long"))
    // embedding arm: double-precision cosine to the doc-0 query vector,
    // rounded at 6 before ranking (rounded-equal values tie-break on
    // doc_id identically in both engines)
    val emb = graft.io.Sources.embeddings(s, d)
    val qv = emb.filter(col("vec_id") === 0)
      .select(transform(col("embedding"), x => x.cast("double")).as("q"))
    val vd = transform(col("embedding"), x => x.cast("double"))
    val dotQ = aggregate(zip_with(vd, col("q"), (x, y) => x * y), lit(0.0), (a, b) => a + b)
    val nV = aggregate(vd, lit(0.0), (a, x) => a + x * x)
    val nQ = aggregate(col("q"), lit(0.0), (a, x) => a + x * x)
    val embTop = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qv)) // 1-row query-vector attach
      .select(col("vec_id").as("doc_id"),
        graft.functions.Num.roundNorm(dotQ / (sqrt(nV) * sqrt(nQ)), 6).as("cos"))
      .orderBy(col("cos").desc, col("doc_id")).limit(topN)
    val wE = Window.orderBy(col("cos").desc, col("doc_id")) // 20-row set
    val embR = embTop.withColumn("rank_emb", row_number().over(wE).cast("long"))
    kw.select("doc_id", "rank_kw")
      .join(embR.select("doc_id", "rank_emb"), Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(60.0) + col("rank_kw")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + col("rank_emb")), lit(0.0)), 6))
      .select(col("doc_id"), col("rank_kw"), col("rank_emb"), col("rrf"))
      .orderBy("doc_id")
  }

  /** Boolean-AND retrieval (`search_boolean_and`) — the conjunctive
    * half of the search surface next to BM25 (ranked) and RRF (fusion):
    * documents containing EVERY query term, with per-term frequencies
    * for downstream ranking. The token stream is filtered to the query
    * terms BEFORE the per-document aggregate — the inverted-index probe
    * shape: only matching postings shuffle, so cost scales with the
    * terms' document frequencies, never the corpus token count.
    */
  def booleanAnd(s: SparkSession, d: String): DataFrame = {
    val terms = Seq("spark", "dup")
    val tf = Sources.documents(s, d)
      .select(col("doc_id"), explode(words(col("text"))).as("w"))
      .filter(col("w").isin(terms: _*))
      .groupBy("doc_id")
      .agg(
        sum(when(col("w") === terms.head, 1L).otherwise(0L)).as(s"tf_${terms.head}"),
        terms.tail.map(t =>
          sum(when(col("w") === t, 1L).otherwise(0L)).as(s"tf_$t")): _*)
    terms.foldLeft(tf)((df, t) => df.filter(col(s"tf_$t") > 0))
      .orderBy("doc_id")
  }

  /** Boolean OR/NOT retrieval (`search_boolean_or_not`) — the
    * disjunctive+exclusion half of the boolean surface next to
    * `search_boolean_and`: documents containing "merge" OR "stream" but
    * NOT "slow". Same inverted-index probe shape: the token stream is
    * filtered to the three query terms before any aggregate, so only
    * matching postings shuffle (cost ∝ the terms' document
    * frequencies); the NOT is a per-document counter test on that
    * bounded set, never an anti-join against the corpus.
    */
  def booleanOrNot(s: SparkSession, d: String): DataFrame = {
    val (t1, t2, neg) = ("merge", "stream", "slow")
    val tf = Sources.documents(s, d)
      .select(col("doc_id"), explode(words(col("text"))).as("w"))
      .filter(col("w").isin(t1, t2, neg))
      .groupBy("doc_id")
      .agg(
        sum(when(col("w") === t1, 1L).otherwise(0L)).as(s"tf_$t1"),
        sum(when(col("w") === t2, 1L).otherwise(0L)).as(s"tf_$t2"),
        sum(when(col("w") === neg, 1L).otherwise(0L)).as(s"tf_$neg"))
    tf.filter((col(s"tf_$t1") > 0 || col(s"tf_$t2") > 0) && col(s"tf_$neg") === 0)
      .select(col("doc_id"), col(s"tf_$t1"), col(s"tf_$t2"))
      .orderBy("doc_id")
  }

  /** Proximity search (`search_proximity`) — "window" followed by
    * "join" within 3 tokens: the within-k generalization of the
    * adjacency phrase match, the operator behind NEAR/k query syntax.
    * Both words' positional postings are filtered out of the token
    * stream first; the pairing is an equi-join on doc_id with the
    * distance band as a residual predicate, so per-document cost is
    * tf(w1)·tf(w2) on matching documents only — df-bounded like every
    * candidate generator in the engine, never a corpus scan.
    */
  def proximitySearch(s: SparkSession, d: String): DataFrame = {
    val (w1, w2, k) = ("window", "join", 3)
    val toks = Sources.documents(s, d)
      .select(col("doc_id"), posexplode(words(col("text"))).as(Seq("pos", "w")))
    val a = toks.filter(col("w") === w1).select(col("doc_id"), col("pos").as("pa"))
    val b = toks.filter(col("w") === w2).select(col("doc_id"), col("pos").as("pb"))
    a.join(b, "doc_id")
      .filter(col("pb") > col("pa") && col("pb") - col("pa") <= k)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pairs"),
        min(col("pb") - col("pa")).cast("long").as("min_dist"))
      .orderBy("doc_id")
  }

  /** Positional phrase match (`search_phrase_match`) — exact-phrase
    * retrieval ("window join") from a POSITIONAL posting join: tokens
    * carry their offset, each phrase word's postings are filtered out of
    * the token stream first, and adjacency is an equi-join on
    * `(doc_id, pos)` with the second word shifted by −1. Cost ∝ the two
    * words' posting sizes (the standard positional-index intersection),
    * never a substring scan over the corpus — and `LIKE '%w1 w2%'`
    * could not distinguish token boundaries anyway.
    */
  def phraseMatch(s: SparkSession, d: String): DataFrame = {
    val (w1, w2) = ("window", "join")
    val toks = Sources.documents(s, d)
      .select(col("doc_id"), posexplode(words(col("text"))).as(Seq("pos", "w")))
    val a = toks.filter(col("w") === w1).select(col("doc_id"), col("pos"))
    val b = toks.filter(col("w") === w2).select(col("doc_id"), (col("pos") - 1).as("pos"))
    a.join(b, Seq("doc_id", "pos"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_occurrences"), min("pos").cast("long").as("first_pos"))
      .orderBy("doc_id")
  }

  /** Corpus keyness (`text_keyness`) — per-word log-odds z-score of
    * source `src0` against the rest of the corpus (Monroe et al.'s
    * "Fightin' Words" with a flat +1 Dirichlet prior): which words are
    * DISTINCTIVE of one slice, the register/domain-shift readout a
    * curation pipeline runs when a new crawl source lands.
    * `δ_w = ln((y₀+1)/(n₀+V−y₀−1)) − ln((y₁+1)/(n₁+V−y₁−1))`,
    * `z_w = δ_w / √(1/(y₀+1) + 1/(y₁+1))`. Every input to the formula
    * is an exact integer (counts, totals, vocab size), so both engines
    * evaluate the identical double expression — one token-count
    * aggregate, a words×2 pivot, and two 1-row broadcasts; nothing
    * scales worse than the vocabulary. Words under 5 corpus occurrences
    * are dropped (their z is prior noise either way).
    */
  def keyness(s: SparkSession, d: String): DataFrame = {
    val tok = Sources.documents(s, d)
      .select((col("source") === "src0").cast("int").as("in0"),
        explode(words(col("text"))).as("w"))
      .filter(col("w") =!= "")
    val counts = tok.groupBy("w").agg(
      sum("in0").as("y0"),
      sum(lit(1) - col("in0")).as("y1"))
    val totals = counts.agg(
      sum("y0").as("n0"), sum("y1").as("n1"),
      count(lit(1)).as("v"))
    counts.filter(col("y0") + col("y1") >= 5)
      .crossJoin(broadcast(totals))
      .withColumn("z_keyness", graft.functions.Num.roundNorm(expr(
        "(ln((y0 + 1.0) / (n0 + v - y0 - 1.0)) - " +
          " ln((y1 + 1.0) / (n1 + v - y1 - 1.0))) / " +
          "sqrt(1.0 / (y0 + 1) + 1.0 / (y1 + 1))"), 6))
      .select("w", "y0", "y1", "z_keyness")
      .orderBy("w")
  }

  /** Retrieval evaluation (`search_eval_mrr`): MRR, hits@10 and
    * recall@10 of the tf-ranked posting lists against a CROSS-TERM
    * relevance label — for query term w, a retrieved doc is relevant
    * iff it ALSO contains the cycle partner (spark's relevant docs
    * also contain dup, vector's contain spark, dup's contain vector).
    * The label never looks at the ranking key, so first
    * ranks genuinely vary (a tf-correlated label like "tf ≥ 2" would
    * pin first_rank to 1 on every corpus — the r12 review catch).
    * Everything is exact integer arithmetic: ranks order by (tf desc,
    * doc_id asc), reciprocal ranks and recall ship on the 1e-6 lattice
    * via integer division. Scale shape: the FIRST-relevant rank is NOT
    * a full-posting window — the top relevant doc per query comes from
    * two keyed aggs (max tf among relevant, then min id at that tf),
    * and its rank is 1 + the count of postings ordered above it (one
    * broadcast of the |queries|-row table against the posting scan);
    * only the top-10 intersection uses a window, and `rank ≤ 10`
    * compiles to WindowGroupLimit. The eval loop every retrieval stack
    * runs nightly, in one oracle-checkable pass.
    */
  def searchEvalMrr(s: SparkSession, d: String): DataFrame = {
    val terms = Seq("spark", "vector", "dup")
    val relOf = Map("spark" -> "vector", "vector" -> "dup", "dup" -> "spark")
    val postings = Sources.documents(s, d)
      .select(col("doc_id"), explode(words(col("text"))).as("w"))
      .filter(col("w").isin(terms: _*))
      .groupBy("w", "doc_id").agg(count(lit(1)).as("tf"))
    // label table: doc relevant FOR w iff it contains rel(w)
    val relTerm = relOf.foldLeft(lit(""): org.apache.spark.sql.Column) {
      case (acc, (w0, r0)) =>
      when(col("w") === w0, lit(r0)).otherwise(acc)
    }
    val rel = postings
      .join(postings.select(relTerm.as("w"), col("doc_id")).distinct(),
        Seq("w", "doc_id"), "left_semi")
    val relStats = rel.groupBy("w").agg(count(lit(1)).as("n_relevant"),
      max("tf").as("max_tf"))
    val firstRel = rel
      .join(relStats.select(col("w"), col("max_tf")), Seq("w"))
      .filter(col("tf") === col("max_tf"))
      .groupBy("w").agg(min("doc_id").as("first_id"), min("max_tf").as("first_tf"))
    val firstRank = postings
      .join(broadcast(firstRel), Seq("w"))
      .groupBy("w")
      .agg((sum(when(col("tf") > col("first_tf") ||
          (col("tf") === col("first_tf") && col("doc_id") < col("first_id")),
          1L).otherwise(0L)) + 1L).as("first_rank"))
    val w10 = org.apache.spark.sql.expressions.Window
      .partitionBy("w").orderBy(col("tf").desc, col("doc_id").asc)
    val hits = postings.withColumn("rk", row_number().over(w10))
      .filter(col("rk") <= 10)
      .join(rel.select(col("w"), col("doc_id")), Seq("w", "doc_id"), "left_semi")
      .groupBy("w").agg(count(lit(1)).as("hits_at10"))
    relStats.select(col("w"), col("n_relevant"))
      .join(firstRank, Seq("w"))
      .join(hits, Seq("w"), "left")
      .na.fill(0L, Seq("hits_at10"))
      .withColumn("rr_e6", expr("1000000L div first_rank"))
      .withColumn("recall10_e6", expr("(hits_at10 * 1000000L) div n_relevant"))
      .select(col("w").as("term"), col("n_relevant"), col("first_rank"),
        col("rr_e6"), col("hits_at10"), col("recall10_e6"))
      .orderBy("term")
  }

  /** MAP@10 (`search_eval_map`, r13): mean-average-precision — the
    * third member of the retrieval-eval family ([[searchEvalMrr]] sees
    * the first hit, NDCG discounts by position, AP averages the
    * precision AT each relevant hit, rewarding front-loaded rankings
    * proportionally). Same tf-ranked lists, same cross-term label, same
    * (tf DESC, doc_id ASC) total order. The whole metric is exact
    * integer arithmetic: the i-th relevant hit at list rank rk
    * contributes prec_e6 = (i·10⁶) div rk — per-hit flooring, the
    * psi_drift per-row rounding discipline, so no float sum exists in
    * either engine — and ap_e6 = Σprec div min(R, 10). Plan: the
    * rank-window cut is WindowGroupLimit; the hit-index window rides
    * on the ≤10-rows-per-term top-10 table, bounded by construction.
    */
  def searchEvalMap(s: SparkSession, d: String): DataFrame = {
    val terms = Seq("spark", "vector", "dup")
    val relOf = Map("spark" -> "vector", "vector" -> "dup", "dup" -> "spark")
    val postings = Sources.documents(s, d)
      .select(col("doc_id"), explode(words(col("text"))).as("w"))
      .filter(col("w").isin(terms: _*))
      .groupBy("w", "doc_id").agg(count(lit(1)).as("tf"))
    val relTerm = relOf.foldLeft(lit(""): org.apache.spark.sql.Column) {
      case (acc, (w0, r0)) => when(col("w") === w0, lit(r0)).otherwise(acc)
    }
    val rel = postings
      .join(postings.select(relTerm.as("w"), col("doc_id")).distinct(),
        Seq("w", "doc_id"), "left_semi")
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy("w").orderBy(col("tf").desc, col("doc_id").asc)
    val top10 = postings.withColumn("rk", row_number().over(wRank).cast("long"))
      .filter(col("rk") <= 10)
    val wHit = org.apache.spark.sql.expressions.Window
      .partitionBy("w").orderBy(col("rk").asc)
    val hits = top10
      .join(rel.select(col("w"), col("doc_id")), Seq("w", "doc_id"), "left_semi")
      .withColumn("i", row_number().over(wHit).cast("long"))
      .withColumn("prec_e6", expr("(i * 1000000L) div rk"))
      .groupBy("w").agg(count(lit(1)).as("n_hits10"),
        sum("prec_e6").as("sum_prec_e6"))
    rel.groupBy("w").agg(count(lit(1)).as("n_relevant"))
      .join(hits, Seq("w"), "left")
      .na.fill(0L, Seq("n_hits10", "sum_prec_e6"))
      .withColumn("ap_e6", expr("sum_prec_e6 div least(n_relevant, 10L)"))
      .select(col("w").as("term"), col("n_relevant"), col("n_hits10"),
        col("sum_prec_e6"), col("ap_e6"))
      .orderBy("term")
  }

  /** Dunning log-likelihood-ratio collocations
    * (`text_collocation_llr`, r13): the statistically-sound upgrade of
    * [[pmiBigrams]] — PMI over-ranks rare pairs (two hapaxes that
    * co-occur once get maximal PMI); Dunning's G² weights the evidence
    * by count, which is why it's the standard collocation extractor
    * (Dunning 1993). Contingency from BIGRAM-position counts: k11 =
    * c(ab), R = c(a·), C = c(·b), N = all bigrams; k12/k21/k22 by
    * subtraction — all exact BIGINTs. G² = 2·Σ O·ln(O·N / (row·col))
    * over the four cells (zero cells contribute 0) runs as ONE mirrored
    * double expression per pair, rounded onto the e4 lattice — the
    * WOE/adamic-adar per-row-ln discipline — and the top-20 cut ranks
    * the INTEGER llr_e4 (ties by pair) via TakeOrderedAndProject.
    * Plan: adjacency-pair aggregation (never all-pairs), two broadcast
    * margin joins, a 1-row N attach (sanctioned).
    */
  def collocationLlr(s: SparkSession, d: String): DataFrame = {
    val docs = Sources.documents(s, d).withColumn("__w", words(col("text")))
    val bg = docs.filter(size(col("__w")) >= 2)
      .select(explode(transform(
        sequence(lit(1), size(col("__w")) - 1),
        i => concat_ws(" ", slice(col("__w"), i, lit(2))))).as("bgs"))
      .select(split(col("bgs"), " ").getItem(0).as("wa"),
        split(col("bgs"), " ").getItem(1).as("wb"))
    val pairC = bg.groupBy("wa", "wb").agg(count(lit(1)).as("k11"))
      .filter(col("k11") >= 5)
    val rC = bg.groupBy("wa").agg(count(lit(1)).as("r_cnt"))
    val cC = bg.groupBy("wb").agg(count(lit(1)).as("c_cnt"))
    val tot = bg.agg(count(lit(1)).as("n_bg"))
    def D(c: Column): Column = c.cast("double")
    def cell(k: Column, rowM: Column, colM: Column): Column =
      when(k > 0, D(k) * log(D(k) * D(col("n_bg")) / (D(rowM) * D(colM))))
        .otherwise(lit(0.0))
    val scored = pairC
      .join(broadcast(rC), Seq("wa"))
      .join(broadcast(cC), Seq("wb"))
      .crossJoin(broadcast(tot))
      .withColumn("k12", col("r_cnt") - col("k11"))
      .withColumn("k21", col("c_cnt") - col("k11"))
      .withColumn("k22", col("n_bg") - col("r_cnt") - col("c_cnt") + col("k11"))
      .withColumn("llr_e4", round((
        cell(col("k11"), col("r_cnt"), col("c_cnt")) +
          cell(col("k12"), col("r_cnt"), col("n_bg") - col("c_cnt")) +
          cell(col("k21"), col("n_bg") - col("r_cnt"), col("c_cnt")) +
          cell(col("k22"), col("n_bg") - col("r_cnt"),
            col("n_bg") - col("c_cnt"))) * 20000, 0).cast("long"))
    scored.orderBy(col("llr_e4").desc, col("wa"), col("wb")).limit(20)
      .select(col("wa"), col("wb"), col("k11"), col("r_cnt"), col("c_cnt"),
        col("llr_e4"))
      .orderBy(col("llr_e4").desc, col("wa"), col("wb"))
  }

  /** Term burstiness (`text_burstiness`, r13): variance-to-mean ratio
    * of per-document term counts over the WHOLE corpus (zero-count
    * documents included via the moment identity — no explode of
    * absences) — Church & Gale's burstiness: content words arrive in
    * bursts (VMR ≫ 1), function words arrive ~Poisson (VMR ≈ 1), so
    * the ranking separates topical terms from glue without any
    * stopword list. EXACT: with N docs, Σc and Σc² per term,
    * vmr_e6 = ((N·Σc² − (Σc)²)·10⁶) div (N·Σc) — pure BIGINTs, one
    * floor division. df ≥ 20 (published) keeps the tail out; top-20 by
    * (vmr DESC, term) via TakeOrderedAndProject. Plan: one per-(term,
    * doc) count agg + one per-term moment agg + a 1-row N attach.
    */
  def burstiness(s: SparkSession, d: String): DataFrame = {
    val perDoc = Sources.documents(s, d)
      .select(col("doc_id"), explode(words(col("text"))).as("w"))
      .groupBy("w", "doc_id").agg(count(lit(1)).as("c"))
    val nDocs = Sources.documents(s, d).agg(count(lit(1)).as("n_docs"))
    perDoc.groupBy("w")
      .agg(count(lit(1)).as("df"), sum("c").as("sc"),
        sum(col("c") * col("c")).as("scc"))
      .filter(col("df") >= 20)
      .crossJoin(broadcast(nDocs))
      .withColumn("vmr_e6",
        expr("((n_docs * scc - sc * sc) * 1000000L) div (n_docs * sc)"))
      .orderBy(col("vmr_e6").desc, col("w")).limit(20)
      .select(col("w"), col("df"), col("sc"), col("vmr_e6"))
      .orderBy(col("vmr_e6").desc, col("w"))
  }

  /** Bigram conditional entropy rate (`text_entropy_rate`, r13): per
    * language, H(next | current) = (1/N)·Σ_ab c(ab)·ln(r(a)/c(ab)) —
    * the first-order entropy-rate estimate that separates repetitive/
    * templated text from genuinely varied text better than the unigram
    * entropy ([[graft.ops.TextOps]]' `text_entropy`) because it prices
    * CONTEXT: a corpus that always follows "new" with "york" has low
    * conditional entropy however rich its vocabulary. Counts are exact
    * BIGINTs from one adjacency aggregation per language; each bigram's
    * term c·ln(r/c)·10⁶/N rounds onto the e6 lattice PER ROW before the
    * sum (the psi_drift discipline — the only float sums in either
    * engine are over pre-rounded integers), so h_cond_e6 is an exact
    * BIGINT. The unigram-context margin r(a) uses BIGRAM-position
    * counts (Σ_b c(ab)), making the conditional distribution exactly
    * normalized. Plan: two vocabulary-sized aggs + one broadcast
    * margin join — never all-pairs.
    */
  def entropyRate(s: SparkSession, d: String): DataFrame = {
    val bg = Sources.documents(s, d)
      .withColumn("__w", words(col("text")))
      .filter(size(col("__w")) >= 2)
      .select(col("lang"), explode(transform(
        sequence(lit(1), size(col("__w")) - 1),
        i => concat_ws(" ", slice(col("__w"), i, lit(2))))).as("bgs"))
      .select(col("lang"),
        split(col("bgs"), " ").getItem(0).as("wa"),
        split(col("bgs"), " ").getItem(1).as("wb"))
    val pc = bg.groupBy("lang", "wa", "wb").agg(count(lit(1)).as("c_ab"))
    val rc = bg.groupBy("lang", "wa").agg(count(lit(1)).as("r_a"))
    val n = bg.groupBy("lang").agg(count(lit(1)).as("n_bg"))
    pc.join(rc, Seq("lang", "wa"))
      .join(broadcast(n), Seq("lang"))
      .withColumn("term_e6", round(
        col("c_ab").cast("double") *
          log(col("r_a").cast("double") / col("c_ab").cast("double")) *
          lit(1e6) / col("n_bg").cast("double"), 0).cast("long"))
      .groupBy("lang")
      .agg(max("n_bg").as("n_bigrams"),
        count(lit(1)).as("n_types"),
        sum("term_e6").as("h_cond_e6"))
      .orderBy("lang")
  }

  /** Frozen integer NDCG@10 weights: w_i = round(10⁶ / log2(i+1)) for
    * ranks 1..10 — published constants (the frozen-twin discipline), so
    * DCG stays on an exact integer lattice in both engines and no
    * engine's log implementation is ever in the hash path.
    */
  private[graft] val NdcgWeights: Seq[(Long, Long)] = Seq(
    1L -> 1000000L, 2L -> 630930L, 3L -> 500000L, 4L -> 430677L,
    5L -> 386853L, 6L -> 356207L, 7L -> 333333L, 8L -> 315465L,
    9L -> 301030L, 10L -> 289065L)

  /** NDCG@10 (`search_eval_ndcg`, r13): the graded-position retrieval
    * metric [[searchEvalMrr]]'s reciprocal-rank can't express — MRR
    * sees only the FIRST relevant hit, NDCG credits every relevant doc
    * in the top 10 by a rank-discounted weight. Same tf-ranked
    * candidate lists, same cross-term relevance label, same
    * (tf DESC, doc_id ASC) total order. The log2 discount ships as the
    * FROZEN integer weight table [[NdcgWeights]] (10 published
    * constants), so DCG_s = Σ rel_i·w_i and the ideal IDCG_s =
    * Σ_{i≤min(10,R)} w_i are exact BIGINTs; ndcg_e6 is one integer
    * floor-division — nothing irrational ever leaves either engine.
    * Plan: the WindowGroupLimit top-10 per term (|terms| partitions),
    * a 10-row broadcast weight join, and |terms|-row aggregates — the
    * corpus is touched once by the posting scan.
    */
  def searchEvalNdcg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val terms = Seq("spark", "vector", "dup")
    val relOf = Map("spark" -> "vector", "vector" -> "dup", "dup" -> "spark")
    val postings = Sources.documents(s, d)
      .select(col("doc_id"), explode(words(col("text"))).as("w"))
      .filter(col("w").isin(terms: _*))
      .groupBy("w", "doc_id").agg(count(lit(1)).as("tf"))
    val relTerm = relOf.foldLeft(lit(""): org.apache.spark.sql.Column) {
      case (acc, (w0, r0)) =>
        when(col("w") === w0, lit(r0)).otherwise(acc)
    }
    val rel = postings
      .join(postings.select(relTerm.as("w"), col("doc_id")).distinct(),
        Seq("w", "doc_id"), "left_semi")
    val weights = NdcgWeights.toDF("rk", "wgt")
    val w10 = org.apache.spark.sql.expressions.Window
      .partitionBy("w").orderBy(col("tf").desc, col("doc_id").asc)
    val dcg = postings
      .withColumn("rk", row_number().over(w10).cast("long"))
      .filter(col("rk") <= 10)
      .join(rel.select(col("w"), col("doc_id"), lit(1L).as("is_rel")),
        Seq("w", "doc_id"), "left")
      .na.fill(0L, Seq("is_rel"))
      .join(broadcast(weights), Seq("rk"))
      .groupBy("w").agg(sum(col("is_rel") * col("wgt")).as("dcg_s"))
    val idcg = rel.groupBy("w").agg(count(lit(1)).as("n_relevant"))
      .crossJoin(broadcast(weights))
      .filter(col("rk") <= least(lit(10L), col("n_relevant")))
      .groupBy("w", "n_relevant").agg(sum("wgt").as("idcg_s"))
    dcg.join(idcg, Seq("w"))
      .select(col("w").as("term"), col("n_relevant"), col("dcg_s"),
        col("idcg_s"),
        expr("(dcg_s * 1000000L) div idcg_s").as("ndcg_e6"))
      .orderBy("term")
  }

  /** Chao1 vocabulary richness (`text_chao1_vocab`, r13): the
    * bias-corrected Chao1 estimate V̂ = V + f₁(f₁−1)/(2(f₂+1)) per
    * language — the species-richness answer to the question
    * [[heapsLaw]] only plots: how many word types exist that THIS
    * corpus hasn't seen yet (f₁ = singletons, f₂ = doubletons carry
    * the unseen-mass signal; Chao 1984). The curation read: a language
    * whose Chao1 sits far above its observed V needs more corpus; one
    * at V is saturated. The bc form is defined at f₂ = 0 (the reason
    * it ships instead of f₁²/2f₂), and on the ×100 lattice the whole
    * estimate is one integer floor — no float anywhere. One token
    * pass, one vocabulary-sized count, one frequency-of-frequency
    * aggregate per language.
    */
  def chao1Vocab(s: SparkSession, d: String): DataFrame = {
    val counts = Sources.documents(s, d)
      .select(col("lang"), explode(words(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("lang", "w").agg(count(lit(1)).as("c"))
    counts.groupBy("lang")
      .agg(count(lit(1)).as("v_obs"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("lang"), col("v_obs"), col("f1"), col("f2"),
        expr("100L * v_obs + (100L * f1 * (f1 - 1L)) div (2L * (f2 + 1L))")
          .as("chao1_x100"))
      .orderBy("lang")
  }

  /** RAKE keyword extraction (`text_rake_keywords`, r13): Rapid
    * Automatic Keyword Extraction (Rose et al. 2010) — candidate
    * phrases are the maximal stopword-free token runs, scored by
    * Σ deg(w)/freq(w) over member occurrences, where freq counts a
    * word's phrase occurrences and deg additionally credits the length
    * of each hosting phrase (so words that live in long multi-word
    * phrases outrank equally-frequent isolated ones). The degree/freq
    * ratio rounds onto the e4 lattice PER WORD before the phrase sum
    * (the psi rule — no cross-engine float accumulation; deg, freq > 0
    * so Spark `div` and DuckDB `//` agree). Plan: runs form by
    * gaps-and-islands over DOC-LOCAL positions (windows partition by
    * doc_id — bounded by document length, never corpus-wide); the
    * word-score table is vocabulary-sized; the phrase-score join is a
    * plain equi-join on the word (scale-safe — no broadcast assumption
    * on the vocabulary); top-20 via TakeOrderedAndProject.
    */
  def rakeKeywords(s: SparkSession, d: String): DataFrame = {
    val stop = Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")
    val tok = Sources.documents(s, d)
      .select(col("doc_id"), posexplode(words(col("text"))))
      .toDF("doc_id", "pos", "w")
      .filter(col("w") =!= "" && !col("w").isin(stop: _*))
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val runs = tok.withColumn("grp", col("pos") - row_number().over(byDoc))
    val occ = runs.withColumn("plen",
      count(lit(1)).over(Window.partitionBy("doc_id", "grp")))
    val occP = occ.pinned(eager = false) // feeds word stats AND phrase assembly
    val wordScore = occP.groupBy("w")
      .agg(count(lit(1)).as("freq"), sum("plen").as("deg"))
      .withColumn("wscore_e4", expr("(10000L * deg) div freq"))
    val phrases = occP.groupBy("doc_id", "grp")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("w")))),
        x => x.getField("w")), " ").as("phrase"))
    val phraseCounts = phrases.groupBy("phrase")
      .agg(count(lit(1)).as("n_occur"))
    val scored = phraseCounts
      .select(col("phrase"), col("n_occur"),
        explode(split(col("phrase"), " ")).as("w"))
      .join(wordScore.select("w", "wscore_e4"), Seq("w"))
      .groupBy("phrase", "n_occur")
      .agg(count(lit(1)).cast("long").as("n_words"),
        sum("wscore_e4").as("score_e4"))
    scored.orderBy(col("score_e4").desc, col("phrase")).limit(20)
      .select(col("phrase"), col("n_words"), col("n_occur"), col("score_e4"))
      .orderBy(col("score_e4").desc, col("phrase"))
  }

  /** Heaps-law vocabulary growth (`text_heaps_law`, r13): V(N) at
    * nested 25/50/75/100 % hash-prefix corpus budgets — the curve that
    * tells a data buyer whether more corpus still buys new vocabulary
    * (V ~ K·N^β, β < 1; β̂ near 1 means the corpus keeps minting tokens
    * — or near-duplicate inflation, the corpus-level twin of the
    * per-doc repetition filters). Budget membership is the
    * `ml_learning_curve_frozen` discipline: the Knuth-hash quartile
    * band of doc_id, so the budgets NEST and the whole trajectory sits
    * under the hash gate. One token pass: cum tokens = per-band sums;
    * cum vocabulary WITHOUT re-scanning per budget = each word
    * contributes at its MINIMUM band (the first budget containing it)
    * — a vocabulary-sized min-aggregate, then a 4-row cumulative
    * window (bounded by the published band count, not by data). β̂ vs
    * the 25 % base = ln(V/V₀)/ln(N/N₀), one mirrored double per row,
    * 0 at the base by convention.
    */
  def heapsLaw(s: SparkSession, d: String): DataFrame = {
    val tok = Sources.documents(s, d)
      .withColumn("band", least(
        expr("(((doc_id * 2654435761L) % 4294967296L) % 1000000L) div 250000L"),
        lit(3L)))
      .select(col("band"), explode(words(col("text"))).as("w"))
      .filter(col("w") =!= "")
    val tokP = tok.pinned(eager = false) // feeds the token census and the vocab min
    val nt = tokP.groupBy("band").agg(count(lit(1)).as("nt"))
    val nv = tokP.groupBy("w").agg(min("band").as("band"))
      .groupBy("band").agg(count(lit(1)).as("nv"))
    val w4 = Window.orderBy("band") // 4 rows — band-domain-bounded
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // LEFT join: a band with no first-seen words still emits its row
    // (the fixture vocabulary saturates inside the 25 % budget — that
    // flat V(N) tail IS the Heaps read, not a row to drop)
    val cum = nt.join(nv, Seq("band"), "left")
      .withColumn("n_tokens", sum("nt").over(w4))
      .withColumn("n_vocab", sum(coalesce(col("nv"), lit(0L))).over(w4))
      .pinned(eager = false) // 4 rows, two consumers (base + output)
    val base = cum.filter(col("band") === 0)
      .select(col("n_tokens").as("nt0"), col("n_vocab").as("nv0"))
    def D(c: Column): Column = c.cast("double")
    cum.crossJoin(broadcast(base)) // 1-row aggregate attach
      .select(((col("band") + 1) * 25).as("f_pct"),
        col("n_tokens"), col("n_vocab"),
        when(col("band") === 0, lit(0.0)).otherwise(
          graft.functions.Num.roundNorm(
            log(D(col("n_vocab")) / D(col("nv0"))) /
              log(D(col("n_tokens")) / D(col("nt0"))), 6)).as("beta_hat"))
      .orderBy("f_pct")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_rake_keywords" -> (rakeKeywords _),
    "text_chao1_vocab" -> (chao1Vocab _),
    "text_heaps_law" -> (heapsLaw _),
    "search_eval_ndcg" -> (searchEvalNdcg _),
    "search_eval_mrr" -> (searchEvalMrr _),
    "text_keyness" -> (keyness _),
    "search_phrase_match" -> (phraseMatch _),
    "search_boolean_and" -> (booleanAnd _),
    "search_boolean_or_not" -> (booleanOrNot _),
    "search_proximity" -> (proximitySearch _),
    "text_bm25" -> (bm25 _),
    "text_burrows_delta" -> (burrowsDelta _),
    "search_query_likelihood" -> (queryLikelihood _),
    "search_hybrid_rrf" -> (hybridRrf _),
    "text_zipf_slope" -> (zipfSlope _),
    "text_pmi_bigrams" -> (pmiBigrams _),
    "search_eval_map" -> (searchEvalMap _),
    "text_collocation_llr" -> (collocationLlr _),
    "text_entropy_rate" -> (entropyRate _),
    "text_burstiness" -> (burstiness _),
    "text_bigram_novelty" -> (bigramNovelty _),
    "text_vocab_coverage" -> (vocabCoverage _),
    "text_bigram_lm" -> (bigramLmScore _),
    "text_repetition" -> (textRepetition _),
    "text_tfidf_keywords" -> (tfidfKeywords _),
    "text_lm_score" -> (lmScore _),
    "text_length_outliers" -> (lengthOutliers _),
  )

  val oracles: Map[String, String] = Map(
    // same frequency-of-frequency counts, same x100 integer floor
    "text_chao1_vocab" ->
      """WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS w
        |   FROM documents),
        | c AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS c FROM tok
        |   WHERE w <> '' GROUP BY 1, 2),
        | f AS (SELECT lang, CAST(count(*) AS BIGINT) AS v_obs,
        |   CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
        |   CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
        |  FROM c GROUP BY 1)
        |SELECT lang, v_obs, f1, f2,
        | 100 * v_obs + (100 * f1 * (f1 - 1)) // (2 * (f2 + 1))
        |   AS chao1_x100
        |FROM f ORDER BY lang""".stripMargin,
    // same stopword-delimited islands, per-word e4 floor BEFORE the
    // phrase sum, identical (score desc, phrase) top-20
    "text_rake_keywords" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        | t AS (SELECT doc_id, unnest(ws) AS w,
        |   generate_subscripts(ws, 1) AS pos FROM w),
        | ns AS (SELECT doc_id, w, pos FROM t WHERE w <> '' AND w NOT IN
        |   ('the','a','of','and','to','in','is','it','for','on')),
        | runs AS (SELECT doc_id, w, pos, pos - row_number()
        |   OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM ns),
        | occ AS (SELECT doc_id, grp, w, pos,
        |   count(*) OVER (PARTITION BY doc_id, grp) AS plen FROM runs),
        | wst AS (SELECT w, CAST(count(*) AS BIGINT) AS freq,
        |   CAST(sum(plen) AS BIGINT) AS deg FROM occ GROUP BY 1),
        | wsc AS (SELECT w, (10000 * deg) // freq AS wscore_e4 FROM wst),
        | phr AS (SELECT doc_id, grp,
        |   string_agg(w, ' ' ORDER BY pos) AS phrase FROM occ GROUP BY 1, 2),
        | pc AS (SELECT phrase, CAST(count(*) AS BIGINT) AS n_occur
        |  FROM phr GROUP BY 1),
        | pw AS (SELECT phrase, n_occur,
        |   unnest(string_split(phrase, ' ')) AS w FROM pc),
        | psc AS (SELECT phrase, n_occur,
        |   CAST(count(*) AS BIGINT) AS n_words,
        |   CAST(sum(wscore_e4) AS BIGINT) AS score_e4
        |  FROM pw JOIN wsc USING (w) GROUP BY 1, 2)
        |SELECT phrase, n_words, n_occur, score_e4
        |FROM psc ORDER BY score_e4 DESC, phrase LIMIT 20""".stripMargin,
    // same Knuth quartile bands, min-band vocabulary attribution,
    // 4-row cumulative, one mirrored log-ratio per row
    "text_heaps_law" ->
      """WITH tok AS (SELECT
        |   least((((doc_id * 2654435761) % 4294967296) % 1000000) // 250000, 3)
        |     AS band,
        |   unnest(string_split(text, ' ')) AS w FROM documents),
        | tk AS (SELECT band, w FROM tok WHERE w <> ''),
        | nt AS (SELECT band, CAST(count(*) AS BIGINT) AS nt
        |  FROM tk GROUP BY 1),
        | nv AS (SELECT band, CAST(count(*) AS BIGINT) AS nv FROM
        |  (SELECT w, min(band) AS band FROM tk GROUP BY 1) GROUP BY 1),
        | cum AS (SELECT band,
        |   CAST(sum(nt.nt) OVER (ORDER BY band) AS BIGINT) AS n_tokens,
        |   CAST(sum(coalesce(nv.nv, 0)) OVER (ORDER BY band) AS BIGINT)
        |     AS n_vocab
        |  FROM nt LEFT JOIN nv USING (band)),
        | base AS (SELECT n_tokens AS nt0, n_vocab AS nv0 FROM cum
        |  WHERE band = 0)
        |SELECT CAST((band + 1) * 25 AS BIGINT) AS f_pct, n_tokens, n_vocab,
        | CASE WHEN band = 0 THEN 0.0 ELSE
        |   round(ln(n_vocab::DOUBLE / nv0::DOUBLE)
        |     / ln(n_tokens::DOUBLE / nt0::DOUBLE), 6) + 0.0 END AS beta_hat
        |FROM cum, base ORDER BY f_pct""".stripMargin,
    // same ranked lists as the MRR oracle; the frozen 10-constant
    // pure-BIGINT VMR via the moment identity; zero-count docs enter
    // through N, never through an explode
    "text_burstiness" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |   FROM documents),
        | pd AS (SELECT w, doc_id, CAST(count(*) AS BIGINT) AS c FROM tok
        |  GROUP BY 1, 2),
        | n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        | m AS (SELECT w, CAST(count(*) AS BIGINT) AS df,
        |   CAST(sum(c) AS BIGINT) AS sc, CAST(sum(c * c) AS BIGINT) AS scc
        |  FROM pd GROUP BY 1 HAVING count(*) >= 20)
        |SELECT w, df, sc,
        | ((n_docs * scc - sc * sc) * 1000000) // (n_docs * sc) AS vmr_e6
        |FROM m CROSS JOIN n ORDER BY vmr_e6 DESC, w LIMIT 20""".stripMargin,
    // per-bigram term rounds e6 PER ROW; only pre-rounded integers sum
    "text_entropy_rate" ->
      """WITH w AS (SELECT lang, string_split(text, ' ') AS ws
        |   FROM documents WHERE len(string_split(text, ' ')) >= 2),
        | bg AS (SELECT lang, ws[i] AS wa, ws[i + 1] AS wb
        |   FROM w, unnest(range(1, len(ws))) t(i)),
        | pc AS (SELECT lang, wa, wb, CAST(count(*) AS BIGINT) AS c_ab
        |  FROM bg GROUP BY 1, 2, 3),
        | rc AS (SELECT lang, wa, CAST(count(*) AS BIGINT) AS r_a
        |  FROM bg GROUP BY 1, 2),
        | n AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_bg
        |  FROM bg GROUP BY 1),
        | terms AS (SELECT pc.lang,
        |   CAST(round(pc.c_ab::DOUBLE
        |     * ln(rc.r_a::DOUBLE / pc.c_ab::DOUBLE)
        |     * 1e6 / n.n_bg::DOUBLE) AS BIGINT) AS term_e6, n.n_bg
        |  FROM pc JOIN rc ON pc.lang = rc.lang AND pc.wa = rc.wa
        |  JOIN n ON pc.lang = n.lang)
        |SELECT lang, CAST(max(n_bg) AS BIGINT) AS n_bigrams,
        | CAST(count(*) AS BIGINT) AS n_types,
        | CAST(sum(term_e6) AS BIGINT) AS h_cond_e6
        |FROM terms GROUP BY lang ORDER BY lang""".stripMargin,
    // per-hit precision floors onto e6 BEFORE the sum in both engines
    "search_eval_map" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |   FROM documents),
        | p AS (SELECT w, doc_id, CAST(count(*) AS BIGINT) AS tf FROM tok
        |   WHERE w IN ('spark', 'vector', 'dup') GROUP BY 1, 2),
        | lbl AS (SELECT DISTINCT CASE w WHEN 'spark' THEN 'vector'
        |    WHEN 'vector' THEN 'dup' ELSE 'spark' END AS w, doc_id FROM p),
        | rel AS (SELECT p.w, p.doc_id FROM p
        |   JOIN lbl ON p.w = lbl.w AND p.doc_id = lbl.doc_id),
        | r AS (SELECT *, CAST(row_number() OVER (PARTITION BY w
        |    ORDER BY tf DESC, doc_id ASC) AS BIGINT) AS rk FROM p),
        | h AS (SELECT r.w, r.rk, CAST(row_number() OVER (PARTITION BY r.w
        |    ORDER BY r.rk ASC) AS BIGINT) AS i
        |   FROM r JOIN rel ON r.w = rel.w AND r.doc_id = rel.doc_id
        |   WHERE r.rk <= 10),
        | agg AS (SELECT w, CAST(count(*) AS BIGINT) AS n_hits10,
        |    CAST(sum((i * 1000000) // rk) AS BIGINT) AS sum_prec_e6
        |   FROM h GROUP BY 1),
        | stats AS (SELECT w, CAST(count(*) AS BIGINT) AS n_relevant
        |   FROM rel GROUP BY 1)
        |SELECT s.w AS term, s.n_relevant,
        | coalesce(a.n_hits10, 0) AS n_hits10,
        | coalesce(a.sum_prec_e6, 0) AS sum_prec_e6,
        | coalesce(a.sum_prec_e6, 0) // least(s.n_relevant, 10) AS ap_e6
        |FROM stats s LEFT JOIN agg a ON s.w = a.w ORDER BY term""".stripMargin,
    // contingency cells exact; G^2 is one mirrored ln expression per
    // pair, rounded e4; the top-20 cut ranks the INTEGER lattice
    "text_collocation_llr" ->
      """WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents
        |   WHERE len(string_split(text, ' ')) >= 2),
        | bg AS (SELECT ws[i] AS wa, ws[i + 1] AS wb
        |   FROM w, unnest(range(1, len(ws))) t(i)),
        | pc AS (SELECT wa, wb, CAST(count(*) AS BIGINT) AS k11 FROM bg
        |   GROUP BY 1, 2 HAVING count(*) >= 5),
        | rc AS (SELECT wa, CAST(count(*) AS BIGINT) AS r_cnt FROM bg GROUP BY 1),
        | cc AS (SELECT wb, CAST(count(*) AS BIGINT) AS c_cnt FROM bg GROUP BY 1),
        | tot AS (SELECT CAST(count(*) AS BIGINT) AS n_bg FROM bg),
        | s AS (SELECT pc.wa, pc.wb, pc.k11, rc.r_cnt, cc.c_cnt, tot.n_bg,
        |   rc.r_cnt - pc.k11 AS k12, cc.c_cnt - pc.k11 AS k21,
        |   tot.n_bg - rc.r_cnt - cc.c_cnt + pc.k11 AS k22
        |  FROM pc JOIN rc ON pc.wa = rc.wa JOIN cc ON pc.wb = cc.wb
        |  CROSS JOIN tot),
        | g AS (SELECT wa, wb, k11, r_cnt, c_cnt,
        |   CAST(round((
        |    (CASE WHEN k11 > 0 THEN k11::DOUBLE * ln(k11::DOUBLE * n_bg::DOUBLE
        |      / (r_cnt::DOUBLE * c_cnt::DOUBLE)) ELSE 0 END)
        |    + (CASE WHEN k12 > 0 THEN k12::DOUBLE * ln(k12::DOUBLE * n_bg::DOUBLE
        |      / (r_cnt::DOUBLE * (n_bg - c_cnt)::DOUBLE)) ELSE 0 END)
        |    + (CASE WHEN k21 > 0 THEN k21::DOUBLE * ln(k21::DOUBLE * n_bg::DOUBLE
        |      / ((n_bg - r_cnt)::DOUBLE * c_cnt::DOUBLE)) ELSE 0 END)
        |    + (CASE WHEN k22 > 0 THEN k22::DOUBLE * ln(k22::DOUBLE * n_bg::DOUBLE
        |      / ((n_bg - r_cnt)::DOUBLE * (n_bg - c_cnt)::DOUBLE)) ELSE 0 END)
        |   ) * 20000) AS BIGINT) AS llr_e4 FROM s)
        |SELECT wa, wb, k11, r_cnt, c_cnt, llr_e4 FROM g
        |ORDER BY llr_e4 DESC, wa, wb LIMIT 20""".stripMargin,
    // weight table replays the log2 discount as exact integers
    "search_eval_ndcg" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |   FROM documents),
        | p AS (SELECT w, doc_id, CAST(count(*) AS BIGINT) AS tf FROM tok
        |   WHERE w IN ('spark', 'vector', 'dup') GROUP BY 1, 2),
        | lbl AS (SELECT DISTINCT CASE w WHEN 'spark' THEN 'vector'
        |    WHEN 'vector' THEN 'dup' ELSE 'spark' END AS w, doc_id FROM p),
        | r AS (SELECT *, row_number() OVER (PARTITION BY w
        |    ORDER BY tf DESC, doc_id ASC) AS rk FROM p),
        | rel AS (SELECT r.w, r.doc_id FROM r
        |   JOIN lbl ON r.w = lbl.w AND r.doc_id = lbl.doc_id),
        | stats AS (SELECT w, CAST(count(*) AS BIGINT) AS n_relevant
        |   FROM rel GROUP BY 1),
        | wt AS (SELECT CAST(rk AS BIGINT) AS rk, CAST(wgt AS BIGINT) AS wgt
        |   FROM (VALUES (1, 1000000), (2, 630930), (3, 500000),
        |     (4, 430677), (5, 386853), (6, 356207), (7, 333333),
        |     (8, 315465), (9, 301030), (10, 289065)) t(rk, wgt)),
        | dcg AS (SELECT r.w, CAST(sum(CASE WHEN lbl.doc_id IS NOT NULL
        |     THEN wt.wgt ELSE 0 END) AS BIGINT) AS dcg_s
        |   FROM r JOIN wt ON r.rk = wt.rk
        |   LEFT JOIN lbl ON r.w = lbl.w AND r.doc_id = lbl.doc_id
        |   WHERE r.rk <= 10 GROUP BY 1),
        | idcg AS (SELECT s.w, s.n_relevant,
        |    CAST(sum(wt.wgt) AS BIGINT) AS idcg_s
        |   FROM stats s JOIN wt ON wt.rk <= least(10, s.n_relevant)
        |   GROUP BY 1, 2)
        |SELECT d.w AS term, i.n_relevant, d.dcg_s, i.idcg_s,
        | CAST((d.dcg_s * 1000000) // i.idcg_s AS BIGINT) AS ndcg_e6
        |FROM dcg d JOIN idcg i ON d.w = i.w ORDER BY term""".stripMargin,
    // same cross-term label, same tie-breaks, same integer lattices —
    // the window formulation cross-checks the engine's aggregate-
    // derived first rank
    "search_eval_mrr" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |   FROM documents),
        | p AS (SELECT w, doc_id, CAST(count(*) AS BIGINT) AS tf FROM tok
        |   WHERE w IN ('spark', 'vector', 'dup') GROUP BY 1, 2),
        | lbl AS (SELECT DISTINCT CASE w WHEN 'spark' THEN 'vector'
        |    WHEN 'vector' THEN 'dup' ELSE 'spark' END AS w, doc_id FROM p),
        | r AS (SELECT *, row_number() OVER (PARTITION BY w
        |    ORDER BY tf DESC, doc_id ASC) AS rk FROM p),
        | rel AS (SELECT r.w, r.doc_id, r.rk FROM r
        |   JOIN lbl ON r.w = lbl.w AND r.doc_id = lbl.doc_id),
        | stats AS (SELECT w, CAST(count(*) AS BIGINT) AS n_relevant,
        |    CAST(min(rk) AS BIGINT) AS first_rank FROM rel GROUP BY 1),
        | h AS (SELECT w, CAST(count(*) AS BIGINT) AS hits_at10
        |   FROM rel WHERE rk <= 10 GROUP BY 1)
        |SELECT stats.w AS term, stats.n_relevant, stats.first_rank,
        | CAST(1000000 // stats.first_rank AS BIGINT) AS rr_e6,
        | CAST(coalesce(h.hits_at10, 0) AS BIGINT) AS hits_at10,
        | CAST((coalesce(h.hits_at10, 0) * 1000000) // stats.n_relevant
        |   AS BIGINT) AS recall10_e6
        |FROM stats LEFT JOIN h ON stats.w = h.w ORDER BY term""".stripMargin,
    "text_keyness" ->
      """WITH tok AS (SELECT CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS in0,
        |    unnest(string_split(text, ' ')) AS w FROM documents),
        |counts AS (SELECT w, CAST(sum(in0) AS BIGINT) AS y0,
        |    CAST(sum(1 - in0) AS BIGINT) AS y1
        |  FROM tok WHERE w <> '' GROUP BY w),
        |tot AS (SELECT CAST(sum(y0) AS BIGINT) AS n0,
        |    CAST(sum(y1) AS BIGINT) AS n1,
        |    CAST(count(*) AS BIGINT) AS v FROM counts)
        |SELECT w, y0, y1,
        |  round((ln((y0 + 1.0) / (n0 + v - y0 - 1.0)) -
        |     ln((y1 + 1.0) / (n1 + v - y1 - 1.0))) /
        |    sqrt(1.0 / (y0 + 1) + 1.0 / (y1 + 1)), 6) + 0.0 AS z_keyness
        |FROM counts, tot WHERE y0 + y1 >= 5
        |ORDER BY w""".stripMargin,
    "search_phrase_match" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        | p AS (SELECT doc_id, unnest(list_transform(
        |     range(1, greatest(len(ws), 2)),
        |     i -> CASE WHEN ws[i] = 'window' AND ws[i+1] = 'join'
        |          THEN i - 1 ELSE NULL END)) AS pos
        |   FROM w)
        |SELECT doc_id, count(*) AS n_occurrences,
        | CAST(min(pos) AS BIGINT) AS first_pos
        |FROM p WHERE pos IS NOT NULL GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "search_boolean_or_not" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |   FROM documents),
        | f AS (SELECT doc_id,
        |   CAST(sum(CASE WHEN w = 'merge' THEN 1 ELSE 0 END) AS BIGINT) AS tf_merge,
        |   CAST(sum(CASE WHEN w = 'stream' THEN 1 ELSE 0 END) AS BIGINT) AS tf_stream,
        |   CAST(sum(CASE WHEN w = 'slow' THEN 1 ELSE 0 END) AS BIGINT) AS tf_slow
        |  FROM w WHERE w IN ('merge', 'stream', 'slow') GROUP BY doc_id)
        |SELECT doc_id, tf_merge, tf_stream FROM f
        |WHERE (tf_merge > 0 OR tf_stream > 0) AND tf_slow = 0
        |ORDER BY doc_id""".stripMargin,
    "search_proximity" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        | t AS (SELECT doc_id, unnest(ws) AS w,
        |   generate_subscripts(ws, 1) AS pos FROM w),
        | a AS (SELECT doc_id, pos AS pa FROM t WHERE w = 'window'),
        | b AS (SELECT doc_id, pos AS pb FROM t WHERE w = 'join')
        |SELECT a.doc_id, count(*) AS n_pairs,
        | CAST(min(b.pb - a.pa) AS BIGINT) AS min_dist
        |FROM a JOIN b ON a.doc_id = b.doc_id
        | AND b.pb > a.pa AND b.pb - a.pa <= 3
        |GROUP BY a.doc_id ORDER BY a.doc_id""".stripMargin,
    "search_boolean_and" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |   FROM documents),
        | f AS (SELECT doc_id,
        |   CAST(sum(CASE WHEN w = 'spark' THEN 1 ELSE 0 END) AS BIGINT) AS tf_spark,
        |   CAST(sum(CASE WHEN w = 'dup' THEN 1 ELSE 0 END) AS BIGINT) AS tf_dup
        |  FROM w WHERE w IN ('spark', 'dup') GROUP BY doc_id)
        |SELECT doc_id, tf_spark, tf_dup FROM f
        |WHERE tf_spark > 0 AND tf_dup > 0 ORDER BY doc_id""".stripMargin,
    // same e6 frequency floors over the full source×word domain, same
    // mirrored sample-z, same integer Delta and (delta, pair) cut
    "text_burrows_delta" ->
      """WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        | st AS (SELECT source, CAST(count(*) AS BIGINT) AS nt FROM toks
        |  GROUP BY 1),
        | top AS (SELECT w FROM (SELECT w, count(*) AS cw FROM toks
        |   GROUP BY 1 ORDER BY cw DESC, w LIMIT 10)),
        | cnt AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
        |   FROM toks JOIN top USING (w) GROUP BY 1, 2),
        | f AS (SELECT st.source, top.w,
        |    (coalesce(cnt.c, 0) * 1000000) // st.nt AS f_e6
        |   FROM st CROSS JOIN top
        |   LEFT JOIN cnt ON cnt.source = st.source AND cnt.w = top.w),
        | mo AS (SELECT w, CAST(count(*) AS BIGINT) AS ns,
        |    CAST(sum(f_e6) AS BIGINT) AS m1,
        |    CAST(sum(f_e6 * f_e6) AS BIGINT) AS m2 FROM f GROUP BY 1),
        | z AS (SELECT f.source, f.w,
        |   CASE WHEN mo.m2 * mo.ns = mo.m1 * mo.m1 THEN CAST(0 AS BIGINT)
        |   ELSE CAST(round(1e6 * (CAST(f.f_e6 AS DOUBLE)
        |       - CAST(mo.m1 AS DOUBLE) / CAST(mo.ns AS DOUBLE)) /
        |     sqrt((CAST(mo.m2 AS DOUBLE) / CAST(mo.ns AS DOUBLE) -
        |       (CAST(mo.m1 AS DOUBLE) / CAST(mo.ns AS DOUBLE)) *
        |       (CAST(mo.m1 AS DOUBLE) / CAST(mo.ns AS DOUBLE))) *
        |      (CAST(mo.ns AS DOUBLE) / CAST(mo.ns - 1 AS DOUBLE))))
        |    AS BIGINT) END AS z_e6
        |  FROM f JOIN mo USING (w))
        |SELECT a.source AS src_a, b.source AS src_b,
        | CAST(count(*) AS BIGINT) AS m,
        | CAST(sum(abs(a.z_e6 - b.z_e6)) AS BIGINT) AS sum_abs_dz,
        | CAST(sum(abs(a.z_e6 - b.z_e6)) AS BIGINT)
        |   // CAST(count(*) AS BIGINT) AS delta_e6
        |FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY delta_e6 ASC, src_a, src_b
        |LIMIT 10""".stripMargin,
    // same integer rational per (doc, present-term), same mirrored ln
    // on the e6 lattice, same top-10 cut
    "search_query_likelihood" ->
      """WITH lens AS (SELECT doc_id,
        |   CAST(len(string_split(text,' ')) AS BIGINT) AS dl FROM documents),
        | cl AS (SELECT CAST(sum(dl) AS BIGINT) AS clen FROM lens),
        | tok AS (SELECT doc_id, w FROM (SELECT doc_id,
        |     unnest(string_split(text,' ')) AS w FROM documents)
        |  WHERE w IN ('spark', 'vector', 'dup')),
        | cf AS (SELECT w, CAST(count(*) AS BIGINT) AS cf FROM tok GROUP BY w),
        | tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
        |  FROM tok GROUP BY doc_id, w),
        | sc AS (SELECT lens.doc_id, coalesce(tf.tf, 0) AS tfv, cf.cf,
        |    lens.dl, cl.clen
        |   FROM lens CROSS JOIN cf CROSS JOIN cl
        |   LEFT JOIN tf ON tf.doc_id = lens.doc_id AND tf.w = cf.w),
        | terms AS (SELECT doc_id,
        |   CASE WHEN tfv > 0 THEN 1 ELSE 0 END AS m,
        |   CAST(round(ln(CAST(tfv * clen + 2000 * cf AS DOUBLE) /
        |     CAST((dl + 2000) * clen AS DOUBLE)) * 1e6) AS BIGINT) AS term_e6
        |  FROM sc)
        |SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_matched,
        | CAST(sum(term_e6) AS BIGINT) AS score_e6
        |FROM terms GROUP BY doc_id
        |ORDER BY score_e6 DESC, doc_id LIMIT 10""".stripMargin,
    "search_hybrid_rrf" ->
      """WITH lens AS (SELECT doc_id, len(string_split(text,' '))::DOUBLE AS dl
        |   FROM documents),
        | st AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM lens),
        | tf AS (SELECT doc_id, w, count(*)::DOUBLE AS tf FROM (
        |   SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents)
        |  WHERE w IN ('spark', 'vector', 'dup') GROUP BY doc_id, w),
        | dfq AS (SELECT w, count(*)::DOUBLE AS df FROM tf GROUP BY w),
        | scores AS (SELECT doc_id,
        |   round(sum(ln((n - df + 0.5) / (df + 0.5) + 1.0) * (tf * 2.2) /
        |     (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 4) AS bm25
        |  FROM tf JOIN dfq USING (w) JOIN lens USING (doc_id) CROSS JOIN st
        |  GROUP BY doc_id),
        | kw AS (SELECT doc_id,
        |   CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rank_kw
        |  FROM (SELECT * FROM scores ORDER BY bm25 DESC, doc_id LIMIT 20)),
        | q AS (SELECT list_transform(embedding, x -> x::DOUBLE) AS qe
        |   FROM embeddings WHERE vec_id = 0),
        | cosb AS (SELECT vec_id AS doc_id,
        |   round(list_cosine_similarity(
        |     list_transform(embedding, x -> x::DOUBLE), q.qe), 6) + 0.0 AS cos
        |  FROM embeddings, q WHERE vec_id <> 0),
        | embr AS (SELECT doc_id,
        |   CAST(row_number() OVER (ORDER BY cos DESC, doc_id) AS BIGINT) AS rank_emb
        |  FROM (SELECT * FROM cosb ORDER BY cos DESC, doc_id LIMIT 20))
        |SELECT COALESCE(kw.doc_id, embr.doc_id) AS doc_id, rank_kw, rank_emb,
        | round(COALESCE(1.0/(60 + rank_kw), 0) + COALESCE(1.0/(60 + rank_emb), 0), 6) AS rrf
        |FROM kw FULL OUTER JOIN embr ON kw.doc_id = embr.doc_id
        |ORDER BY doc_id""".stripMargin,
    "text_bm25" ->
      """WITH lens AS (SELECT doc_id, len(string_split(text,' '))::DOUBLE AS dl
        |   FROM documents),
        | st AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM lens),
        | tf AS (SELECT doc_id, w, count(*)::DOUBLE AS tf FROM (
        |   SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents)
        |  WHERE w IN ('spark', 'vector', 'dup') GROUP BY doc_id, w),
        | dfq AS (SELECT w, count(*)::DOUBLE AS df FROM tf GROUP BY w)
        |SELECT doc_id, count(*) AS n_terms_matched,
        | round(sum(ln((n - df + 0.5) / (df + 0.5) + 1.0) * (tf * 2.2) /
        |   (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 4) AS bm25
        |FROM tf JOIN dfq USING (w) JOIN lens USING (doc_id) CROSS JOIN st
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_zipf_slope" ->
      """WITH t AS (SELECT unnest(string_split(text,' ')) AS w FROM documents),
        | uni AS (SELECT w, count(*) AS c FROM t GROUP BY w),
        | pts AS (SELECT ln(CAST(row_number() OVER (ORDER BY c DESC, w) AS DOUBLE)) AS lr,
        |   ln(c::DOUBLE) AS lc FROM uni),
        | a AS (SELECT count(*)::DOUBLE AS n, sum(lr) AS sx, sum(lc) AS sy,
        |   sum(lr*lc) AS sxy, sum(lr*lr) AS sxx FROM pts)
        |SELECT CAST(n AS BIGINT) AS n_types,
        | round((n*sxy - sx*sy)/(n*sxx - sx*sx), 4) + 0.0 AS zipf_slope,
        | round((sy - ((n*sxy - sx*sy)/(n*sxx - sx*sx)) * sx)/n, 4) + 0.0 AS intercept
        |FROM a""".stripMargin,
    "text_pmi_bigrams" ->
      """WITH w AS (SELECT string_split(text,' ') AS ws FROM documents),
        | tok AS (SELECT unnest(ws) AS wd FROM w),
        | uni AS (SELECT wd, count(*) AS cw FROM tok GROUP BY wd),
        | tw AS (SELECT sum(cw)::DOUBLE AS tw FROM uni),
        | bg AS (SELECT string_split(bgs,' ')[1] AS wa, string_split(bgs,' ')[2] AS wb
        |   FROM (SELECT unnest(list_transform(range(1, len(ws)),
        |     i -> ws[i] || ' ' || ws[i+1])) AS bgs FROM w WHERE len(ws) >= 2)),
        | tb AS (SELECT count(*)::DOUBLE AS tb FROM bg),
        | bc AS (SELECT wa, wb, count(*) AS n_pair FROM bg
        |   GROUP BY wa, wb HAVING count(*) >= 5)
        |SELECT bc.wa, bc.wb, n_pair,
        | round(log2((n_pair / tb.tb) / ((ua.cw / tw.tw) * (ub.cw / tw.tw))), 4) + 0.0 AS pmi
        |FROM bc JOIN uni ua ON bc.wa = ua.wd JOIN uni ub ON bc.wb = ub.wd
        | CROSS JOIN tw CROSS JOIN tb
        |ORDER BY wa, wb""".stripMargin,
    "text_bigram_novelty" ->
      """WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents
        |   WHERE len(string_split(text,' ')) >= 2),
        | db AS (SELECT DISTINCT doc_id, bg FROM (
        |   SELECT doc_id, unnest(list_transform(range(1, len(ws)),
        |     i -> ws[i] || ' ' || ws[i+1])) AS bg FROM w)),
        | f AS (SELECT bg, min(doc_id) AS first_doc FROM db GROUP BY bg)
        |SELECT doc_id, count(*) AS n_bigrams,
        | CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        | round(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)::DOUBLE / count(*), 4)
        |   AS novelty
        |FROM db JOIN f USING (bg) GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_vocab_coverage" ->
      """WITH t AS (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents),
        | uni AS (SELECT w, count(*) AS c FROM t GROUP BY w),
        | topk AS (SELECT w FROM (
        |   SELECT w, row_number() OVER (ORDER BY c DESC, w) AS rn FROM uni)
        |  WHERE rn <= 10)
        |SELECT lang, count(*) AS n_tokens,
        | CAST(sum(CASE WHEN topk.w IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_in_top,
        | round(sum(CASE WHEN topk.w IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE / count(*), 4) AS coverage
        |FROM t LEFT JOIN topk ON t.w = topk.w
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "text_bigram_lm" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        | tp AS (SELECT doc_id, bg, string_split(bg, ' ')[1] AS prev FROM (
        |   SELECT doc_id, unnest(list_transform(range(1, len(ws)),
        |     i -> ws[i] || ' ' || ws[i+1])) AS bg FROM w WHERE len(ws) >= 2)),
        | bc AS (SELECT bg, count(*) AS cb FROM tp GROUP BY bg),
        | pc AS (SELECT prev, count(*) AS cp FROM tp GROUP BY prev)
        |SELECT doc_id, count(*) AS n_bigrams,
        | round(avg(log2(cb::DOUBLE / cp)), 4) + 0.0 AS bigram_lm_score
        |FROM tp JOIN bc USING (bg) JOIN pc USING (prev)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_repetition" ->
      """WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
        | wc AS (SELECT doc_id, word, count(*) AS c
        |   FROM (SELECT doc_id, unnest(ws) AS word FROM w) GROUP BY doc_id, word),
        | tw AS (SELECT doc_id, round(max(c)::DOUBLE / sum(c), 4) AS top_word_frac
        |   FROM wc GROUP BY doc_id),
        | bg AS (SELECT doc_id,
        |   CASE WHEN len(ws) < 2 THEN 0.0 ELSE
        |   round(1.0 - len(list_distinct(list_transform(range(1, len(ws)),
        |     i -> ws[i] || ' ' || ws[i+1])))::DOUBLE /
        |     len(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])), 4)
        |     END AS dup_2gram_frac
        |   FROM w)
        |SELECT doc_id, top_word_frac, dup_2gram_frac,
        | (top_word_frac <= 0.11 AND dup_2gram_frac <= 0.05) AS keep
        |FROM tw JOIN bg USING (doc_id) ORDER BY doc_id""".stripMargin,
    "text_tfidf_keywords" ->
      """WITH wc AS (SELECT doc_id, word, count(*) AS tf
        |   FROM (SELECT doc_id, unnest(string_split(text,' ')) AS word FROM documents)
        |   GROUP BY doc_id, word),
        | dfq AS (SELECT word, count(*) AS df FROM wc GROUP BY word),
        | n AS (SELECT count(*) AS n_docs FROM documents),
        | sc AS (SELECT doc_id, word,
        |   round(tf::DOUBLE * ln(n_docs::DOUBLE / df), 4) AS score
        |   FROM wc JOIN dfq USING (word) CROSS JOIN n)
        |SELECT doc_id, rnk, word, score FROM (
        | SELECT doc_id, word, score,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, word) AS rnk
        | FROM sc)
        |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,
    "text_lm_score" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text,' ')) AS word FROM documents),
        | uni AS (SELECT word, count(*) AS c FROM t GROUP BY word),
        | tot AS (SELECT sum(c)::DOUBLE AS tt FROM uni)
        |SELECT doc_id, count(*) AS n_tokens,
        | round(avg(log2(c::DOUBLE / tt)), 4) + 0.0 AS lm_score
        |FROM t JOIN uni USING (word) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_length_outliers" ->
      """SELECT doc_id, lang, n_chars, round(pr, 4) AS len_pct_rank FROM (
        | SELECT doc_id, lang, n_chars,
        |  percent_rank() OVER (PARTITION BY lang ORDER BY n_chars) AS pr
        | FROM documents)
        |WHERE pr >= 0.05 AND pr <= 0.95 ORDER BY doc_id""".stripMargin,
  )
}
