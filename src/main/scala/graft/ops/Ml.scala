package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Num.roundNorm
import graft.io.{ModelStore, Sources}
import graft.io.Checkpoints.PinOps

/** In-engine model training and scoring — the ML layer a curation
  * pipeline runs NEXT TO the data instead of exporting 100 TB to a
  * training framework: per-group OLS trend fits (closed-form, one
  * aggregate), and a quality classifier trained by IRLS/Newton logistic
  * regression where EVERY iteration is one distributed aggregate pass
  * (the exact shape MLlib uses for `LogisticRegression`: per-partition
  * partial Gram/gradient sums, map-side combined, k(k+1)/2 + k doubles
  * per partition — corpus rows never leave their executors).
  *
  * Scale notes: OLS is `regr_*` aggregates (codegen'd, partial+final).
  * IRLS trains on a k=5 feature vector, so each pass reduces to a
  * 21-double record per partition regardless of corpus size; the Newton
  * solve is a k×k driver-side step on that model-sized object. Scoring
  * broadcasts the 5 weights back as literals — a pure map-side
  * codegen'd expression, no join, no shuffle. Trained weights persist as
  * a versioned [[graft.io.ModelStore]] table: train once, serve from
  * the table in any later session.
  */
object Ml {

  // ---------------------------------------------------------------- OLS

  /** Per-brand OLS fit of retail price against part size — slope,
    * intercept, R², n — via the closed-form `regr_*` aggregates (one
    * partial+final hash aggregate; DuckDB computes the identical closed
    * form, so the fit is oracle-checkable bit-for-bit after rounding).
    */
  def linearFit(s: SparkSession, d: String): DataFrame =
    Sources.part(s, d)
      .groupBy("p_brand")
      .agg(
        expr("regr_slope(p_retailprice, p_size)").as("slope_raw"),
        expr("regr_intercept(p_retailprice, p_size)").as("icept_raw"),
        expr("regr_r2(p_retailprice, p_size)").as("r2_raw"),
        expr("regr_count(p_retailprice, p_size)").as("n"))
      .select(col("p_brand"),
        roundNorm(col("slope_raw"), 6).as("slope"),
        roundNorm(col("icept_raw"), 6).as("intercept"),
        roundNorm(col("r2_raw"), 6).as("r2"),
        col("n").cast("long").as("n"))
      .orderBy("p_brand")

  // ------------------------------------------------- logistic regression

  private[ops] val featureNames =
    Seq("intercept", "log_len", "avg_tok_len", "stop_ratio", "type_token_ratio")
  private val k = featureNames.size
  private val ridge = 1e-6
  private val maxIter = 25
  private val tol = 1e-10

  /** Planted teacher model: every fixture column is independent of every
    * other (verified — no natural label has signal), so supervision is
    * SIMULATED deterministically, the same discipline as the Audit
    * module's synthetic snapshots: label = 1 iff a hash-uniform
    * u(doc_id) falls under σ(teacher·x). Training then has a ground
    * truth — MlSpec certifies the trainer by RECOVERING the planted
    * weights and beating the base rate, which no real-data label in
    * this fixture could certify.
    */
  private[ops] val teacher = Array(-16.0, 3.0, -1.2, 25.0, 6.0)

  /** Surface-feature design matrix over `documents`: intercept,
    * log-length, mean token length, stopword-ish ratio, type–token
    * ratio — all codegen'd column math on one scan — plus the planted
    * label. The label's noise source is a Knuth-hash uniform from
    * doc_id (pure integer arithmetic, engine-independent).
    */
  private[ops] def featurized(s: SparkSession, d: String): DataFrame = {
    val toks = split(col("text"), " ")
    val nTok = size(toks).cast("double")
    val feats = Sources.documents(s, d).select(
      col("doc_id"),
      lit(1.0).as("f0"),
      log1p(col("n_chars").cast("double")).as("f1"),
      ((col("n_chars").cast("double") - (nTok - 1)) / nTok).as("f2"),
      (size(filter(toks, t => t === "a" || t === "the")).cast("double") / nTok).as("f3"),
      (size(array_distinct(toks)).cast("double") / nTok).as("f4"))
    val etaT = (0 until k).map(i => col(s"f$i") * lit(teacher(i))).reduce(_ + _)
    val u = pmod(col("doc_id") * lit(2654435761L), lit(4294967296L))
      .cast("double") / lit(4294967296.0)
    feats.withColumn("y",
      (u < lit(1.0) / (lit(1.0) + exp(-etaT))).cast("double"))
  }

  /** Solve `a x = b` (k×k, symmetric positive-definite after the ridge)
    * by Gaussian elimination with partial pivoting — model-sized,
    * driver-side, deterministic.
    */
  private[ops] def solve(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val n = b0.length
    val a = a0.map(_.clone()); val b = b0.clone()
    for (c <- 0 until n) {
      val p = (c until n).maxBy(r => math.abs(a(r)(c)))
      val (tr, tb) = (a(p), b(p)); a(p) = a(c); a(c) = tr; b(p) = b(c); b(c) = tb
      require(math.abs(a(c)(c)) > 1e-300, "singular normal matrix")
      for (r <- c + 1 until n) {
        val m = a(r)(c) / a(c)(c)
        for (j <- c until n) a(r)(j) -= m * a(c)(j)
        b(r) -= m * b(c)
      }
    }
    val x = Array.ofDim[Double](n)
    for (c <- n - 1 to 0 by -1) {
      var acc = b(c)
      for (j <- c + 1 until n) acc -= a(c)(j) * x(j)
      x(c) = acc / a(c)(c)
    }
    x
  }

  /** IRLS/Newton training loop. Each iteration is ONE distributed
    * aggregate: sums of `w·x_i·x_j` (upper triangle of X'WX),
    * `(y−μ)·x_i` (gradient), and the log-loss, with the current β
    * riding into the plan as literals. Returns (β, loss trace, iters).
    * Deterministic: fixed iteration cap, fixed ridge, convergence on the
    * Newton-step norm; float accumulation differences across partition
    * orders stay ~1e-15 and the trained weights round at 6 decimals
    * before anything oracle-visible consumes them.
    */
  private[ops] def train(s: SparkSession, d: String): (Array[Double], Seq[Double], Int) = {
    val data = featurized(s, d).pinned()
    val fs: Seq[Column] = (0 until k).map(i => col(s"f$i"))
    var beta = Array.fill(k)(0.0)
    val losses = scala.collection.mutable.ArrayBuffer[Double]()
    var iter = 0
    var stepNorm = Double.MaxValue
    while (iter < maxIter && stepNorm > tol) {
      val eta = fs.zip(beta).map { case (f, b) => f * lit(b) }.reduce(_ + _)
      val mu = lit(1.0) / (lit(1.0) + exp(-eta))
      val muC = least(greatest(mu, lit(1e-12)), lit(1.0 - 1e-12))
      val w = muC * (lit(1.0) - muC)
      val hessCols = for (i <- 0 until k; j <- i until k)
        yield sum(w * fs(i) * fs(j)).as(s"h_${i}_$j")
      val gradCols = (0 until k).map(i => sum((col("y") - muC) * fs(i)).as(s"g_$i"))
      val lossCol = sum(-(col("y") * log(muC) + (lit(1.0) - col("y")) * log(lit(1.0) - muC))).as("loss")
      val r = data.agg((hessCols ++ gradCols :+ lossCol).head,
        (hessCols ++ gradCols :+ lossCol).tail: _*).head()
      val h = Array.ofDim[Double](k, k)
      var idx = 0
      for (i <- 0 until k; j <- i until k) {
        h(i)(j) = r.getDouble(idx); h(j)(i) = h(i)(j); idx += 1
      }
      for (i <- 0 until k) h(i)(i) += ridge
      val g = (0 until k).map(i => r.getDouble(idx + i)).toArray
      losses += r.getDouble(idx + k)
      val step = solve(h, g)
      stepNorm = math.sqrt(step.map(x => x * x).sum)
      beta = beta.zip(step).map { case (b, st) => b + st }
      iter += 1
    }
    (beta, losses.toSeq, iter)
  }

  private def roundHalfUp(v: Double, scale: Int): Double =
    BigDecimal(v).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0

  /** Trained weights, persisted as a versioned model table (train once,
    * serve from the table — including fresh sessions) and served
    * rounded at 6 decimals so every consumer sees one deterministic β.
    */
  private[ops] def weights(s: SparkSession, d: String): Array[Double] = {
    val df = ModelStore.ensureDf(s, "logreg", d, "teacher-v1") {
      val (beta, losses, iters) = train(s, d)
      val rows = featureNames.zipWithIndex.map { case (f, i) =>
        (i.toLong, f, roundHalfUp(beta(i), 6), iters.toLong, roundHalfUp(losses.last, 4))
      }
      s.createDataFrame(rows).toDF("idx", "feature", "weight", "n_iter", "final_loss")
    }
    df.orderBy("idx").select("weight").collect().map(_.getDouble(0))
  }

  /** Weights table query — rows-only by contract (an iterative Newton
    * fit is not SQL-expressible); MlSpec certifies the trained model
    * against the defining properties (monotone loss, gradient ≈ 0 at
    * the optimum, determinism, separation on a crafted corpus).
    */
  def logregWeights(s: SparkSession, d: String): DataFrame = {
    weights(s, d): Unit // ensure trained + persisted
    ModelStore.ensureDf(s, "logreg", d, "teacher-v1")(
      sys.error("model must already be persisted"))
      .orderBy("idx")
  }

  /** Per-document quality scores from the persisted model: σ(x·β) as a
    * pure map-side codegen'd expression (β enters as literals — no
    * join, no shuffle, exactly how a 100 TB scoring pass should look).
    * Rows-only by contract; MlSpec pins score bounds and ranking.
    */
  def logregScore(s: SparkSession, d: String): DataFrame = {
    val b = weights(s, d)
    val fdf = featurized(s, d)
    val eta = (0 until k).map(i => col(s"f$i") * lit(b(i))).reduce(_ + _)
    fdf.select(col("doc_id"), col("y").cast("long").as("label"),
        roundNorm(lit(1.0) / (lit(1.0) + exp(-eta)), 6).as("score"))
      .withColumn("pred", (col("score") >= 0.5).cast("long"))
      .orderBy("doc_id")
  }

  /** Confusion summary of the classifier on its training corpus — one
    * aggregate over the scored scan (tp/fp/tn/fn, accuracy, base rate).
    */
  def logregEval(s: SparkSession, d: String): DataFrame =
    confusionOf(logregScore(s, d))

  /** Calibration table (`ml_calibration`) of the persisted classifier:
    * predicted-probability deciles vs observed positive rate — the
    * reliability diagram a quality-score consumer checks before using
    * scores as sampling weights (a well-ranked but mis-calibrated model
    * over/under-samples systematically). One map-side bucket assignment
    * on the scoring scan + one 10-row aggregate; rows-only like every
    * trained-model consumer, with MlSpec pinning the structural
    * invariants (bucket bounds contain their mean prediction, counts
    * sum to the corpus, observed rates in [0,1]).
    */
  def logregCalibration(s: SparkSession, d: String): DataFrame =
    calibrationOf(logregScore(s, d))

  /** Frozen-weight scoring (`ml_logreg_score_frozen`): σ(x·β₀) with the
    * PUBLISHED teacher vector riding in as the frozen literal model.
    * Serving a fixed model is plain column math — unlike the IRLS fit
    * that trains one — so this twin is SQL-expressible and moves the
    * entire scoring path (feature extraction → dot product → sigmoid →
    * threshold) under the DuckDB hash check; only the trained-β path
    * stays rows-only (MlSpec certifies it by property). Same 100 TB
    * shape as [[logregScore]]: β enters as literals, pure map-side
    * codegen'd expressions on one documents scan — no join, no
    * shuffle, nothing driver-side. `pred` thresholds the ROUNDED score
    * so both engines compare the identical 1e-6-lattice double.
    */
  def logregScoreFrozen(s: SparkSession, d: String): DataFrame = {
    val fdf = featurized(s, d)
    val eta = (0 until k).map(i => col(s"f$i") * lit(teacher(i))).reduce(_ + _)
    fdf.select(col("doc_id"), col("y").cast("long").as("label"),
        roundNorm(lit(1.0) / (lit(1.0) + exp(-eta)), 6).as("score"))
      .withColumn("pred", (col("score") >= 0.5).cast("long"))
      .orderBy("doc_id")
  }

  /** Confusion summary of the frozen scorer (`ml_logreg_eval_frozen`) —
    * the oracle-checked twin of [[logregEval]]: one aggregate over the
    * frozen scoring scan.
    */
  def logregEvalFrozen(s: SparkSession, d: String): DataFrame =
    confusionOf(logregScoreFrozen(s, d))

  /** Reliability diagram of the frozen scorer
    * (`ml_calibration_frozen`) — the oracle-checked twin of
    * [[logregCalibration]]: decile buckets over the ROUNDED score (an
    * exact double both engines share), one 10-row aggregate.
    */
  def logregCalibrationFrozen(s: SparkSession, d: String): DataFrame =
    calibrationOf(logregScoreFrozen(s, d))

  /** Permutation feature importance on the frozen scorer
    * (`ml_perm_importance_frozen`, r13): for each non-intercept
    * feature, break its association with the label by a DETERMINISTIC
    * cyclic-shift permutation — doc i takes the feature value of doc
    * (i + 17) mod N on the dense id space (a bijection, so the
    * permuted column keeps the exact marginal distribution the method
    * requires) — rescore with the published teacher weights, and
    * report the AUC drop. The standard model-debugging loop
    * (Breiman-style permutation importance), derandomized the
    * frozen-twin way so the full pipeline sits under the hash gate; at
    * scale the dense-id assumption is replaced by any keyed bijection
    * (Feistel on the key space) — same plan. AUC is the tie-aware U on
    * the round(μ·10⁶) score lattice (an exact integer both engines
    * derive from the same double): per variant one keyed agg + one
    * [[Prefix]] running sum — never a global sort; the featurized scan
    * is pinned once and read five times. Labels use the UNPERMUTED
    * teacher (permutation must only affect scoring, not supervision).
    */
  def permImportanceFrozen(s: SparkSession, d: String): DataFrame = {
    val n = graft.io.CorpusStats.rowCount(s, d, "documents")
    val fdf = graft.io.Checkpoints.pin(featurized(s, d), eager = false)
    val donors = fdf.select(((col("doc_id") + 17) % n).as("doc_id"),
      col("f1").as("g1"), col("f2").as("g2"),
      col("f3").as("g3"), col("f4").as("g4"))
    val joined = fdf.join(donors, "doc_id")
    def etaWith(j: Int): Column =
      (0 until k).map { i =>
        (if (i == j) col(s"g$i") else col(s"f$i")) * lit(teacher(i))
      }.reduce(_ + _)
    def scoredWith(j: Int): DataFrame = joined.select(
      round(lit(1000000.0) * (lit(1.0) / (lit(1.0) + exp(-etaWith(j)))))
        .cast("long").as("sc"),
      col("y").cast("long").as("y"))
    def aucRow(scored: DataFrame): DataFrame = {
      val by = scored.groupBy("sc")
        .agg(sum("y").as("pos"), sum(lit(1L) - col("y")).as("neg"))
      val run = Prefix.running(by, Seq(col("sc")),
        sums = Seq((col("neg"), "cumneg")))
      run.agg(sum("pos").as("p"), sum("neg").as("ng"),
          sum(col("pos") * (col("cumneg") - col("neg")) * 2 +
            col("pos") * col("neg")).as("u2"))
        .select(expr("(u2 * 500000L) div (p * ng)").as("auc_e6"))
    }
    val base = aucRow(scoredWith(-1)).withColumnRenamed("auc_e6", "auc_base_e6")
    val rows = (1 until k).map { j =>
      aucRow(scoredWith(j))
        .select(lit(featureNames(j)).as("feature"),
          col("auc_e6").as("auc_perm_e6"))
    }.reduce(_ unionByName _)
    rows.crossJoin(broadcast(base))
      .select(col("feature"), col("auc_base_e6"), col("auc_perm_e6"),
        (col("auc_base_e6") - col("auc_perm_e6")).as("delta_e6"))
      .orderBy("feature")
  }

  /** Split-conformal prediction interval (`ml_conformal_frozen`, r13):
    * the distribution-free uncertainty wrapper modern ML serving puts
    * around ANY point predictor — here the published linear rule
    * ŷ = 3600·(items per order) dollars (deliberately crude: conformal
    * calibration guarantees ≥ 90 % coverage REGARDLESS of fit quality,
    * which is the whole point and what the test split verifies). The
    * hash split (Knuth parity) sends half the orders to calibration;
    * the conformal quantile is the k = ⌈0.9·(n_c+1)⌉-th smallest
    * absolute residual — an EXACT order statistic found by one keyed
    * count + one [[Prefix]] running sum + a min-over-qualifying filter,
    * never a sort (the AUC-rank machinery); coverage on the held-out
    * split ships as an exact e6 share. Everything whole-dollar
    * integers.
    */
  def conformalFrozen(s: SparkSession, d: String): DataFrame = {
    val items = Sources.lineitem(s, d)
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(count(lit(1)).as("x"))
    val t = Sources.orders(s, d)
      .select(col("o_orderkey"),
        round(col("o_totalprice")).cast("long").as("y"))
      .join(items, Seq("o_orderkey"))
      .withColumn("calib",
        pmod(pmod(col("o_orderkey"), lit(1048576L)) * lit(2654435761L),
          lit(2L)) === 0L)
      .withColumn("resid", abs(col("y") - lit(3600L) * col("x")))
    val pinned = graft.io.Checkpoints.pin(t, eager = false)
    val byR = pinned.filter(col("calib"))
      .groupBy("resid").agg(count(lit(1)).as("c"))
    val run = Prefix.running(byR, Seq(col("resid")),
      sums = Seq((col("c"), "cum")))
    val nc = run.agg(sum("c").as("n_calib"))
    val q = run.crossJoin(broadcast(nc))
      .withColumn("k_order", expr("((n_calib + 1) * 9 + 9) div 10"))
      .filter(col("cum") >= col("k_order"))
      .agg(min(struct(col("resid"), col("n_calib"), col("k_order")))
        .as("qrow"))
      .select(col("qrow.n_calib").as("n_calib"),
        col("qrow.k_order").as("k_order"), col("qrow.resid").as("q_resid"))
    pinned.filter(!col("calib")).crossJoin(broadcast(q))
      .agg(max("n_calib").as("n_calib"), max("k_order").as("k_order"),
        max("q_resid").as("q_resid"), count(lit(1)).as("n_test"),
        sum(when(col("resid") <= col("q_resid"), 1L).otherwise(0L))
          .as("n_covered"))
      .select(col("n_calib"), col("k_order"), col("q_resid"), col("n_test"),
        col("n_covered"),
        expr("(n_covered * 1000000L) div n_test").as("coverage_e6"))
  }

  /** The confusion aggregate shared by the trained and frozen scorers. */
  private def confusionOf(scored: DataFrame): DataFrame =
    scored.agg(
        sum(when(col("label") === 1 && col("pred") === 1, 1L).otherwise(0L)).as("tp"),
        sum(when(col("label") === 0 && col("pred") === 1, 1L).otherwise(0L)).as("fp"),
        sum(when(col("label") === 0 && col("pred") === 0, 1L).otherwise(0L)).as("tn"),
        sum(when(col("label") === 1 && col("pred") === 0, 1L).otherwise(0L)).as("fn"),
        count(lit(1)).as("n"),
        avg(col("label").cast("double")).as("base_rate_raw"),
        avg((col("label") === col("pred")).cast("double")).as("acc_raw"))
      .select(col("tp"), col("fp"), col("tn"), col("fn"), col("n"),
        round(col("base_rate_raw"), 6).as("base_rate"),
        round(col("acc_raw"), 6).as("accuracy"))

  /** The decile-bucket aggregate shared by the trained and frozen
    * scorers. `mean_pred` follows the Cramér's-V lattice discipline:
    * the 1e-6-rounded scores are summed as exact integer micro-units
    * (a double Σ over bucket members is partition-order-dependent and
    * the two engines would disagree in the last bits), so the mean
    * derives from one deterministic cast. Label sums are exact in
    * double (0/1 counts < 2⁵³), so the rates need no lattice.
    */
  private def calibrationOf(scored: DataFrame): DataFrame =
    scored
      .withColumn("bucket", least(floor(col("score") * 10), lit(9.0)).cast("long"))
      .withColumn("score_e6", round(col("score") * 1e6).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        sum("label").as("n_pos"),
        sum("score_e6").as("s_e6"),
        round(avg(col("label").cast("double")), 6).as("obs_rate"))
      .select(col("bucket"), col("n"), col("n_pos"),
        roundNorm(col("s_e6").cast("double") / col("n") / 1e6, 6).as("mean_pred"),
        col("obs_rate"))
      .orderBy("bucket")

  // ------------------------------------------------- multinomial NB

  /** Multinomial Naive Bayes language classifier, trained on the even
    * doc_ids and evaluated on the odd ones — the cheap supervised
    * upgrade over the stop-word heuristic of
    * [[graft.ops.TextOps.langIdConfusion]], and the canonical
    * counts-only classifier a curation pipeline can train INSIDE the
    * engine (training is two hash aggregates over the token stream; no
    * gradient steps, no driver math).
    *
    * Determinism: every Laplace-smoothed log-probability is snapped to
    * FIXED-POINT MICRO-NATS — `round(1e6·ln(c+1))`, `round(1e6·ln(t_l+V))`,
    * `round(1e6·ln(n_l/N))` — so the per-document score
    * `P(l) − T_d·B(l) + Σ_w k_w·A(w,l)` is pure BIGINT arithmetic that
    * both engines replay exactly (a flip would need libm's ln to land
    * within ~1e-9 of a rounding boundary). The Σ k·A term only needs
    * the (word, lang) pairs PRESENT in the trained model — absent words
    * contribute the per-lang floor, factored out as −T_d·B(l) — so
    * scoring is one equi-join against the model table plus a 5-row
    * broadcast grid, never a vocab×docs cross product. Argmax breaks
    * ties by language code. At 100 TB the model table (vocab×langs) is
    * the only shuffled state; documents never leave their executors
    * except as (doc, lang, partial-sum) rows.
    */
  def nbConfusion(s: SparkSession, d: String): DataFrame = {
    val docs = Sources.documents(s, d).select(col("doc_id"), col("lang"), col("text"))
    val train = docs.filter(col("doc_id") % 2 === 0)
    val test = docs.filter(col("doc_id") % 2 === 1)
    val trainTok = train
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    // model: per-(lang, word) micro-nat evidence weight A(w,l)
    val model = trainTok.groupBy("lang", "w").agg(count(lit(1)).as("c"))
      .withColumn("am", round(log(col("c") + lit(1)) * 1e6).cast("long"))
    // per-lang stats + the two corpus scalars (1-row cross joins)
    val langStats = train.groupBy("lang").agg(count(lit(1)).as("n_l"))
      .join(trainTok.groupBy("lang").agg(count(lit(1)).as("t_l")), "lang")
      .crossJoin(trainTok.agg(countDistinct("w").as("v")))
      .crossJoin(train.agg(count(lit(1)).as("nd")))
      .select(col("lang").as("cand_lang"),
        round(log(col("t_l") + col("v")) * 1e6).cast("long").as("bm"),
        round(log(col("n_l").cast("double") / col("nd")) * 1e6).cast("long").as("pm"))
    val testTok = test
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    val kw = testTok.groupBy("doc_id", "w").agg(count(lit(1)).as("k"))
    val td = testTok.groupBy("doc_id")
      .agg(first("lang").as("actual"), count(lit(1)).as("t"))
    val sdl = kw.join(model, "w")
      .groupBy(col("doc_id"), col("lang").as("cand_lang"))
      .agg(sum(col("k") * col("am")).as("sm"))
    val grid = td.crossJoin(broadcast(langStats))
      .join(sdl, Seq("doc_id", "cand_lang"), "left")
      .withColumn("score",
        col("pm") - col("t") * col("bm") + coalesce(col("sm"), lit(0L)))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("cand_lang"))
    val pred = grid
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    val cells = pred.groupBy(col("actual").as("lang"),
      col("cand_lang").as("predicted_lang")).agg(count(lit(1)).as("n_docs"))
    val totals = cells.groupBy("lang").agg(sum("n_docs").as("tn"))
    cells.join(broadcast(totals), "lang")
      .select(col("lang"), col("predicted_lang"), col("n_docs"),
        expr("(10000 * n_docs) div tn").as("share_bp"))
      .orderBy("lang", "predicted_lang")
  }

  /** Leave-one-out smoothed target encoding (`ml_target_encoding`) —
    * the categorical-feature transform a training pipeline applies to
    * high-cardinality keys: each order's market segment becomes
    * `(S_g − x_o + m·μ) / (n_g − 1 + m)` with the row's OWN label
    * excluded (leakage-free by construction) and an m=20 pseudo-count
    * pull toward the global mean (rare groups shrink to the prior).
    * Group sums accumulate exact integer cents in decimal(38,0) (the
    * Welch discipline — Long sums overflow at ~1e12 rows), the global
    * mean and the encoding are then single deterministic double casts
    * of exact integers, so both engines produce identical bits. Plan:
    * one segment-keyed aggregate whose 5-row result broadcasts back —
    * the encoding itself is a map-side codegen'd expression over the
    * fact stream, no second shuffle at any corpus size.
    */
  def targetEncoding(s: SparkSession, d: String): DataFrame = {
    val rows = Sources.orders(s, d)
      .join(Sources.customer(s, d).select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_mktsegment"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val grp = rows.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_g"),
        sum(col("cents").cast("decimal(38,0)")).as("s_g"))
    val glob = rows.agg(count(lit(1)).as("n_all"),
      sum(col("cents").cast("decimal(38,0)")).as("s_all"))
    rows.join(broadcast(grp), "c_mktsegment")
      .crossJoin(broadcast(glob))
      .select(col("o_orderkey"), col("c_mktsegment"),
        roundNorm(expr(
          "(cast(s_g as double) - cents + 20.0 * (cast(s_all as double) / n_all)) " +
            "/ (n_g - 1 + 20) / 100"), 6).as("enc_usd"))
      .orderBy("o_orderkey")
  }

  /** The hashing trick (`ml_feature_hash`) — Weinberger et al. 2009:
    * sparse text features hashed into a FIXED 256-bucket space with a
    * sign bit to keep the estimator unbiased (collisions cancel in
    * expectation instead of inflating), the standard featurization for
    * linear models over unbounded vocabularies — no vocabulary table,
    * no fit step, memory O(buckets) per row regardless of corpus. One
    * map-side tokenize + per-token fold (the rolling 31·a+c polynomial
    * both engines already share via `text_fingerprint`), one keyed
    * aggregate to (doc, bucket) — the output IS the sparse feature
    * matrix in COO form, exact integers.
    */
  def featureHash(s: SparkSession, d: String): DataFrame = {
    val tok = Sources.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .withColumn("th", aggregate(split(col("t"), ""), lit(0L),
        (a, c) => (a * 31 + ascii(c)) % 1000000007L))
    tok
      .withColumn("bucket", col("th") % 256)
      .withColumn("sgn",
        when(expr("(th div 256) % 2") === 0, lit(1L)).otherwise(lit(-1L)))
      .groupBy("doc_id", "bucket")
      .agg(sum("sgn").as("fval"))
      .orderBy("doc_id", "bucket")
  }

  /** Isotonic calibration of the frozen scorer (`ml_isotonic_frozen`):
    * the PAVA (pool-adjacent-violators) fit of observed positive rate
    * vs score decile, computed through the MINIMAX closed form
    * iso(i) = max_{j≤i} min_{k≥i} rate(j..k) — the textbook identity
    * that replaces PAVA's sequential pooling loop with pure relational
    * algebra, which is what makes isotonic regression runnable inside
    * an engine (and SQL-oracle-checkable) at all. The corpus pays ONE
    * keyed aggregate (bucket → n, n_pos); everything after runs on the
    * BUCKET DOMAIN (10 rows): cumulative sums over the bounded bucket
    * window, the j≤k segment table (≤55 rows), and the (i,j,k) triple
    * join (≤220 rows) — corpus-size-independent like the nation-window
    * allocations. Rates compare on the exact integer 1e-9 lattice
    * (`(pos·1e9) div n`) — floor commutes with min/max, so `iso_e9` IS
    * floor(1e9·PAVA) exactly, no double ever ordered. Lattice headroom:
    * pos·1e9 needs pos < 9.2e9, fine to ~10⁹ positives per segment; a
    * 10¹² -row corpus would drop to a 1e6 lattice (same plan).
    */
  def isotonicFrozen(s: SparkSession, d: String): DataFrame = {
    val bk = logregScoreFrozen(s, d)
      .withColumn("bucket", least(floor(col("score") * 10), lit(9.0)).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum("label").as("n_pos"))
    // global window over the 10-row bucket table: domain-bounded
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bk
      .withColumn("cn", sum("n").over(w))
      .withColumn("cpos", sum("n_pos").over(w))
    val segJ = cum.select(col("bucket").as("j"), col("n").as("jn"),
      col("n_pos").as("jpos"), col("cn").as("jcn"), col("cpos").as("jcpos"))
    val segK = cum.select(col("bucket").as("k"),
      col("cn").as("kcn"), col("cpos").as("kcpos"))
    val seg = segJ.join(segK, col("j") <= col("k"))
      .select(col("j"), col("k"),
        (col("kcpos") - col("jcpos") + col("jpos")).as("spos"),
        (col("kcn") - col("jcn") + col("jn")).as("sn"))
      .withColumn("r_e9", expr("(spos * 1000000000L) div sn"))
    val idx = bk.select(col("bucket").as("i"), col("n"), col("n_pos"))
    val iso = idx.select("i")
      .join(seg, col("j") <= col("i") && col("i") <= col("k"))
      .groupBy("i", "j").agg(min("r_e9").as("mn"))
      .groupBy("i").agg(max("mn").as("iso_e9"))
    idx.join(iso, "i")
      .select(col("i").as("bucket"), col("n"), col("n_pos"), col("iso_e9"))
      .orderBy("bucket")
  }

  /** Lift/gain deciles of the frozen scorer (`ml_lift_deciles`, r13):
    * the campaign-targeting readout — documents ranked by score
    * (rounded-score desc, doc_id asc: a TOTAL order, so decile
    * membership is replayable), split into 10 equal-width rank deciles
    * via the explicit `(10·(rk−1)) div n + 1` formula (the
    * win_ntile_quartiles discipline — NTILE built-ins differ on
    * remainder placement; the formula doesn't), then per-decile
    * response rate, lift vs the base rate, and cumulative gain. The
    * rank is a two-pass [[Prefix]] scan, the rollup is 10 rows, and
    * the cumulative gain runs a window over those 10 rows — bounded by
    * the decile count, never the corpus.
    */
  def liftDeciles(s: SparkSession, d: String): DataFrame = {
    val scored = logregScoreFrozen(s, d)
      .select(col("doc_id"), col("label"), col("score"))
    val tot = scored.agg(count(lit(1)).as("n"), sum("label").as("n_pos"))
    val byDec = graft.ops.Prefix.running(scored,
        order = Seq(col("score").desc, col("doc_id").asc), rankOut = Some("rk"))
      .crossJoin(broadcast(tot))
      .withColumn("decile", expr("(10 * (rk - 1)) div n + 1"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"), sum("label").as("n_pos_d"),
        max("n").as("n"), max("n_pos").as("n_pos"))
    val w = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def D(c: Column): Column = c.cast("double")
    byDec
      .withColumn("cum_pos", sum("n_pos_d").over(w))
      .select(col("decile"), col("n_docs"), col("n_pos_d"),
        roundNorm(D(col("n_pos_d")) / D(col("n_docs")), 6).as("response_rate"),
        roundNorm(D(col("n_pos_d")) / D(col("n_docs")) /
          (D(col("n_pos")) / D(col("n"))), 4).as("lift"),
        roundNorm(D(col("cum_pos")) / D(col("n_pos")), 6).as("cum_gain"))
      .orderBy("decile")
  }

  /** Best decision stump (`ml_decision_stump`, r13): the single best
    * (feature, threshold ≤) split predicting the planted teacher label
    * over documents (the [[featurized]] `y` — n_chars genuinely drives
    * it through the teacher's f1 weight, so an informative split
    * EXISTS; the lineitem columns were measured independent and
    * rejected as a fixture), chosen by EXACT INTEGER misclassification
    * count — min(posL, negL) + min(posR, negR), the one impurity whose
    * argmin needs no per-candidate rational comparison (Gini/entropy
    * have per-side denominators, so an exact argmin needs pairwise
    * cross-multiplication; the misclassification objective IS the
    * stump's decision rule anyway). Ties break (errors, feature,
    * threshold) lexicographically; the winner's weighted Gini rides
    * along display-rounded. Plan: one `stack` unpivot (2 features:
    * char count, word count), one (feature, value)-keyed count
    * aggregate, a cumulative window PER FEATURE over the VALUE DOMAIN
    * (bounded by the max document length, never corpus-sized), a
    * 1-row totals attach, TakeOrdered(1).
    */
  def decisionStump(s: SparkSession, d: String): DataFrame = {
    val lab = featurized(s, d).select(col("doc_id"), col("y").cast("long").as("y"))
    val dims = Sources.documents(s, d).select(col("doc_id"),
      col("n_chars").cast("long").as("nchars"),
      size(split(col("text"), " ")).cast("long").as("nwords"))
    val base = lab.join(dims, "doc_id")
    val long = base.select(col("y"),
      expr("stack(2, 'nchars', nchars, 'nwords', nwords) AS (feature, value)"))
    val g = long.groupBy("feature", "value")
      .agg(count(lit(1)).as("n_v"), sum("y").as("pos_v"))
    val wCum = Window.partitionBy("feature").orderBy("value")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = base.agg(count(lit(1)).as("n_tot"), sum("y").as("pos_tot"))
    def D(c: Column): Column = c.cast("double")
    g.withColumn("n_l", sum("n_v").over(wCum))
      .withColumn("pos_l", sum("pos_v").over(wCum))
      .crossJoin(broadcast(tot))
      .withColumn("n_r", col("n_tot") - col("n_l"))
      .withColumn("pos_r", col("pos_tot") - col("pos_l"))
      .filter(col("n_r") > 0) // v <= max(value) is not a split
      .withColumn("errors",
        least(col("pos_l"), col("n_l") - col("pos_l")) +
          least(col("pos_r"), col("n_r") - col("pos_r")))
      .withColumn("baseline_errors",
        least(col("pos_tot"), col("n_tot") - col("pos_tot")))
      .withColumn("gini", roundNorm(
        (lit(2.0) * D(col("pos_l")) * D(col("n_l") - col("pos_l")) / D(col("n_l")) +
          lit(2.0) * D(col("pos_r")) * D(col("n_r") - col("pos_r")) / D(col("n_r"))) /
          D(col("n_tot")), 6))
      .select(col("feature"), col("value").as("threshold"),
        col("n_l"), col("pos_l"), col("n_r"), col("pos_r"),
        col("errors"), col("baseline_errors"), col("gini"))
      .orderBy(col("errors"), col("feature"), col("threshold"))
      .limit(1)
  }

  /** Cook's distance influence audit (`ml_cooks_distance`, r13): for
    * the simple OLS of order value on basket size, the top-20 most
    * INFLUENTIAL orders — D_i = e_i²·h_i / (p·s²·(1−h_i)²) with
    * leverage h_i = 1/n + (x_i−x̄)²/Sxx — the regression-diagnostics
    * verb that tells a pipeline which rows to quarantine before
    * refitting (an un-influential outlier is noise; an influential one
    * REWRITES the model). All raw moments are exact Longs on the
    * (items, dollars) lattice; every central-moment combination and
    * the per-row (e, h, D) are mirrored double expressions (the
    * [[Stats.momentsProfile]] discipline — the integer n·Σxy identity
    * itself would overflow at 1.5e5 rows), rounded onto the e9 lattice
    * PER ROW so the rank is an integer order. One aggregate + a 1-row
    * broadcast attach + TakeOrderedAndProject — no sort, no window.
    */
  /** (order, basket size x, order value y in whole dollars) — the
    * regression frame [[cooksDistance]] and [[regressionMetrics]]
    * share; lazily pinned because each consumer runs a moment pass
    * AND a per-row scan over it.
    */
  private def orderSizeValue(s: SparkSession, d: String): DataFrame =
    Sources.orders(s, d)
      .join(Sources.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("x"),
        expr("max(CAST(round(o_totalprice * 100) AS LONG)) div 100").as("y"))
      .pinned(eager = false)

  def cooksDistance(s: SparkSession, d: String): DataFrame = {
    val xy = orderSizeValue(s, d)
    val mom = xy.agg(count(lit(1)).as("n"), sum("x").as("sx"),
      sum(col("x") * col("x")).as("sxx"), sum("y").as("sy"),
      sum(col("y") * col("y")).as("syy"), sum(col("x") * col("y")).as("sxy"))
    def D(c: Column): Column = c.cast("double")
    xy.crossJoin(broadcast(mom))
      .withColumn("xb", D(col("sx")) / D(col("n")))
      .withColumn("yb", D(col("sy")) / D(col("n")))
      .withColumn("sxxc", D(col("sxx")) - D(col("n")) * col("xb") * col("xb"))
      .withColumn("sxyc", D(col("sxy")) - D(col("n")) * col("xb") * col("yb"))
      .withColumn("syyc", D(col("syy")) - D(col("n")) * col("yb") * col("yb"))
      .withColumn("b", col("sxyc") / col("sxxc"))
      .withColumn("s2",
        (col("syyc") - col("b") * col("sxyc")) / D(col("n") - 2))
      .withColumn("e",
        D(col("y")) - (col("yb") - col("b") * col("xb")) - col("b") * D(col("x")))
      .withColumn("h", lit(1.0) / D(col("n")) +
        (D(col("x")) - col("xb")) * (D(col("x")) - col("xb")) / col("sxxc"))
      .withColumn("d_e9", round(lit(1e9) *
        col("e") * col("e") * col("h") /
        (lit(2.0) * col("s2") * (lit(1.0) - col("h")) *
          (lit(1.0) - col("h"))), 0).cast("long"))
      .orderBy(col("d_e9").desc, col("o_orderkey")).limit(20)
      .select(col("o_orderkey"), col("x").as("n_items"), col("y").as("y_usd"),
        col("d_e9"))
      .orderBy(col("d_e9").desc, col("o_orderkey"))
  }

  /** Regression metrics battery (`ml_regression_metrics`, r13): the
    * evaluation quartet — MAE, RMSE, R², MAPE — for the
    * [[cooksDistance]] OLS of order value on basket size; the
    * deliverable every fitted model must publish before anything
    * consumes its predictions (the engine's forecasters publish WAPE;
    * this is the regression-side analogue). Per-row residuals are
    * mirrored doubles off the exact moments; each metric's row term
    * rounds onto its published lattice BEFORE aggregation (|e| and e²
    * to whole dollars, |e|/y to e6 — the psi rule, so both engines
    * sum identical integers; e² ≤ 2e11 keeps the square sum Long to
    * ~4e7 rows, then the unit coarsens). The finishes are one
    * mirrored double each off the integer sums. One moment aggregate
    * + one per-row scan + one reduce.
    */
  def regressionMetrics(s: SparkSession, d: String): DataFrame = {
    val xy = orderSizeValue(s, d)
    val mom = xy.agg(count(lit(1)).as("n"), sum("x").as("sx"),
      sum(col("x") * col("x")).as("sxx"), sum("y").as("sy"),
      sum(col("y") * col("y")).as("syy"), sum(col("x") * col("y")).as("sxy"))
    def D(c: Column): Column = c.cast("double")
    val terms = xy.crossJoin(broadcast(mom))
      .withColumn("xb", D(col("sx")) / D(col("n")))
      .withColumn("yb", D(col("sy")) / D(col("n")))
      .withColumn("b",
        (D(col("sxy")) - D(col("n")) * col("xb") * col("yb")) /
          (D(col("sxx")) - D(col("n")) * col("xb") * col("xb")))
      .withColumn("e",
        D(col("y")) - (col("yb") - col("b") * col("xb")) - col("b") * D(col("x")))
      .withColumn("abs_r", round(abs(col("e")), 0).cast("long"))
      .withColumn("sq_r", round(col("e") * col("e"), 0).cast("long"))
      .withColumn("ape_e6",
        round(lit(1e6) * abs(col("e")) / D(col("y")), 0).cast("long"))
    terms.agg(max("n").as("n"), sum("abs_r").as("sum_abs"),
        sum("sq_r").as("sum_sq"), sum("ape_e6").as("sum_ape_e6"),
        max("sy").as("sy"), max("syy").as("syy"))
      .select(col("n"), col("sum_abs"), col("sum_sq"),
        expr("sum_abs div n").as("mae_usd"),
        graft.functions.Num.roundNorm(
          sqrt(D(col("sum_sq")) / D(col("n"))), 4).as("rmse_usd"),
        graft.functions.Num.roundNorm(lit(1.0) - D(col("sum_sq")) /
          (D(col("syy")) - D(col("sy")) * D(col("sy")) / D(col("n"))), 6)
          .as("r2"),
        expr("sum_ape_e6 div n").as("mape_e6"))
  }

  /** Depth-2 decision tree (`ml_tree_depth2`, r13): one greedy level
    * past [[decisionStump]] — the root split is the stump's exact
    * integer-misclassification argmin, then EACH side greedily picks
    * its own best (feature, threshold) over the same two features.
    * The tree is fully data-driven yet deterministic (argmin ties
    * break on (errors, feature, threshold) — a total order), so the
    * whole 3-node trajectory sits under the hash gate; the leaf rows'
    * error sum ≤ the root's is the monotone-improvement read. Plan:
    * the stump machinery generalized by a branch key — per-branch
    * value-domain cumulative windows (partitioned by (branch,
    * feature) — value-domain-bounded), per-branch totals broadcast,
    * argmin per branch via one rank window (WindowGroupLimit); branch
    * assignment is a 1-row broadcast of the root pick. Two passes
    * over the corpus total — the depth is the published constant, so
    * no iterative driver loop exists.
    */
  def treeDepth2(s: SparkSession, d: String): DataFrame = {
    val lab = featurized(s, d).select(col("doc_id"), col("y").cast("long").as("y"))
    val dims = Sources.documents(s, d).select(col("doc_id"),
      col("n_chars").cast("long").as("nchars"),
      size(split(col("text"), " ")).cast("long").as("nwords"))
    val base = lab.join(dims, "doc_id")
      .pinned(eager = false) // feeds the root pass AND branch assignment
    def bestSplits(rows: DataFrame): DataFrame = {
      val long = rows.select(col("branch"), col("y"),
        expr("stack(2, 'nchars', nchars, 'nwords', nwords) AS (feature, value)"))
      val g = long.groupBy("branch", "feature", "value")
        .agg(count(lit(1)).as("n_v"), sum("y").as("pos_v"))
      val wCum = Window.partitionBy("branch", "feature").orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = rows.groupBy("branch")
        .agg(count(lit(1)).as("n_tot"), sum("y").as("pos_tot"))
      g.withColumn("n_l", sum("n_v").over(wCum))
        .withColumn("pos_l", sum("pos_v").over(wCum))
        .join(broadcast(tot), Seq("branch"))
        .withColumn("n_r", col("n_tot") - col("n_l"))
        .withColumn("pos_r", col("pos_tot") - col("pos_l"))
        .filter(col("n_r") > 0)
        .withColumn("errors",
          least(col("pos_l"), col("n_l") - col("pos_l")) +
            least(col("pos_r"), col("n_r") - col("pos_r")))
        .withColumn("rk", row_number().over(Window.partitionBy("branch")
          .orderBy(col("errors"), col("feature"), col("value"))))
        .filter(col("rk") === 1)
        .select(col("branch").as("node"), col("feature"),
          col("value").as("threshold"), col("n_tot").as("n_node"),
          col("pos_tot").as("pos_node"), col("errors"),
          least(col("pos_tot"), col("n_tot") - col("pos_tot"))
            .as("baseline_errors"))
    }
    val root = bestSplits(base.withColumn("branch", lit("root")))
      .pinned(eager = false) // output row AND the broadcast pick
    val pick = broadcast(
      root.select(col("feature").as("rf"), col("threshold").as("rt")))
    val branched = base.crossJoin(pick)
      .withColumn("branch", when(
        (col("rf") === "nchars" && col("nchars") <= col("rt")) ||
          (col("rf") === "nwords" && col("nwords") <= col("rt")),
        lit("L")).otherwise(lit("R")))
    root.unionAll(bestSplits(branched)).orderBy("node")
  }

  /** Cohen's kappa (`ml_cohens_kappa`, r13): chance-corrected agreement
    * between two frozen classifiers of order value — the planted
    * Knuth-hash teacher ([[graft.ops.Stats.plantedScores]]) vs the
    * published 100k-dollar threshold rule (`cents ≥ 10⁷`). Raw accuracy
    * overstates agreement when both raters say "no" most of the time;
    * kappa subtracts the chance agreement p_e implied by the marginals.
    * The whole statistic is EXACT INTEGER arithmetic: with 2×2 cells
    * (a,b,c,d), n = a+b+c+d, chance mass m = r1·c1 + r0·c0,
    * kappa_e6 = (10⁶·(n·(a+d) − m)) div (n² − m) — one floor division,
    * no doubles anywhere (n²·10⁶ < 2⁶³ to ~3·10⁶ rows per fixture;
    * past that drop to the mirrored-double finish, the AucLongBound
    * rule). Plan: one conditional-sum corpus aggregate — map-side
    * combinable, 1 output row.
    */
  def cohensKappa(s: SparkSession, d: String): DataFrame = {
    val t = Stats.plantedScores(s, d)
      .withColumn("pred", (col("cents") >= 10000000L).cast("long"))
    t.agg(
        sum(when(col("label") === 1 && col("pred") === 1, 1L).otherwise(0L)).as("a"),
        sum(when(col("label") === 1 && col("pred") === 0, 1L).otherwise(0L)).as("b"),
        sum(when(col("label") === 0 && col("pred") === 1, 1L).otherwise(0L)).as("c"),
        sum(when(col("label") === 0 && col("pred") === 0, 1L).otherwise(0L)).as("d"))
      .withColumn("n", col("a") + col("b") + col("c") + col("d"))
      .withColumn("m", (col("a") + col("b")) * (col("a") + col("c")) +
        (col("c") + col("d")) * (col("b") + col("d")))
      .select(col("a"), col("b"), col("c"), col("d"), col("n"),
        expr("(1000000L * (n * (a + d))) div (n * n)").as("po_e6"),
        expr("(1000000L * m) div (n * n)").as("pe_e6"),
        expr("(1000000L * (n * (a + d) - m)) div (n * n - m)").as("kappa_e6"))
  }

  /** Matthews correlation coefficient at two published thresholds
    * (`ml_mcc_threshold`, r13): the confusion-matrix summary that,
    * unlike accuracy or even [[cohensKappa]], stays honest under class
    * imbalance (it is the Pearson φ of the binary pair — zero iff the
    * rater is uninformative REGARDLESS of base rate). Evaluated at the
    * $100k kappa threshold AND at $200k, so the row pair shows how the
    * same planted teacher scores a strict rater vs a permissive one —
    * the threshold-sensitivity read a single-point MCC hides. One
    * corpus pass: thresholds explode map-side (×2 fan-out), the
    * confusion cells are exact BIGINT conditional sums per threshold;
    * mcc = (a·d − b·c)/(√(a+b)·√(a+c)·√(d+b)·√(d+c)) is ONE mirrored
    * double expression (the four √ factors keep every intermediate ≤
    * n² — the naive √ of the 4-way product overflows BIGINT at n >
    * 55k), rounded 6; the numerator ships exactly as `num` (|a·d −
    * b·c| ≤ n²/4 — Long-exact to 6e9 rows, then the count-gated
    * DECIMAL widening applies).
    */
  def mccThreshold(s: SparkSession, d: String): DataFrame = {
    val t = Stats.plantedScores(s, d)
      .withColumn("thr_cents", explode(array(lit(10000000L), lit(20000000L))))
      .withColumn("pred", (col("cents") >= col("thr_cents")).cast("long"))
    def D(c: Column): Column = c.cast("double")
    t.groupBy("thr_cents").agg(
        sum(when(col("label") === 1 && col("pred") === 1, 1L).otherwise(0L)).as("a"),
        sum(when(col("label") === 1 && col("pred") === 0, 1L).otherwise(0L)).as("b"),
        sum(when(col("label") === 0 && col("pred") === 1, 1L).otherwise(0L)).as("c"),
        sum(when(col("label") === 0 && col("pred") === 0, 1L).otherwise(0L)).as("d"))
      .withColumn("num", col("a") * col("d") - col("b") * col("c"))
      .select(col("thr_cents"), col("a"), col("b"), col("c"), col("d"),
        col("num"),
        roundNorm(D(col("num")) /
          (sqrt(D(col("a") + col("b"))) * sqrt(D(col("a") + col("c"))) *
            sqrt(D(col("d") + col("b"))) * sqrt(D(col("d") + col("c")))), 6)
          .as("mcc"))
      .orderBy("thr_cents")
  }

  /** Murphy decomposition of the Brier score
    * (`ml_brier_decomposition`, r13): BS = REL − RES + UNC over the 10
    * published decile forecasts f_k = (2k+1)/20 against the planted
    * teacher — the standard diagnostic separating calibration error
    * (REL: forecast vs realized rate per bin) from discrimination
    * (RES: how far bin rates spread from the base rate). Counts are
    * exact BIGINTs; the global Brier mass ships EXACTLY as
    * bs_400n = Σ_k (2k+1)²·n_k − 40(2k+1)·pos_k + 400·pos_k (y² = y);
    * per-bin REL/RES terms are ONE mirrored double each — REL_k =
    * ((2k+1)n_k − 20·pos_k)²/(400·n·n_k), RES_k = (n·pos_k − P·n_k)²/
    * (n³·n_k) — rounded onto the e9 lattice per bin BEFORE any
    * cross-bin sum (the [[Stats.anovaF]] discipline). The spec asserts
    * the decomposition identity REL − RES + UNC = BS to lattice
    * precision. Plan: one 10-key conditional agg + a 1-row broadcast
    * attach (sanctioned).
    */
  def brierDecomposition(s: SparkSession, d: String): DataFrame = {
    val t = Stats.plantedScores(s, d)
      .withColumn("bin", least(expr("cents div 10000000"), lit(9L)))
    val g = t.groupBy("bin").agg(
      count(lit(1)).as("n_k"), sum("label").as("pos_k"))
    val tot = g.agg(sum("n_k").as("n"), sum("pos_k").as("p_tot"))
    def D(c: Column): Column = c.cast("double")
    g.crossJoin(broadcast(tot))
      .withColumn("f_e3", (col("bin") * 2 + 1) * 50)
      .withColumn("rel_e9", {
        val a = D((col("bin") * 2 + 1) * col("n_k") - lit(20L) * col("pos_k"))
        round(a * a * lit(1e9) / (D(col("n_k")) * 400.0 * D(col("n"))), 0)
          .cast("long")
      })
      .withColumn("res_e9", {
        val b = D(col("n") * col("pos_k") - col("p_tot") * col("n_k"))
        round(b * b * lit(1e9) / (D(col("n")) * D(col("n")) * D(col("n")) * D(col("n_k"))), 0)
          .cast("long")
      })
      .withColumn("bs_term_400", (col("bin") * 2 + 1) * (col("bin") * 2 + 1)
        * col("n_k") - lit(40L) * (col("bin") * 2 + 1) * col("pos_k")
        + lit(400L) * col("pos_k"))
      .select(col("bin"), col("n_k"), col("pos_k"), col("f_e3"),
        col("rel_e9"), col("res_e9"), col("bs_term_400"))
      .orderBy("bin")
  }

  /** Closed-form ridge regression (`ml_ridge_frozen`, r13): the
    * regularized twin of [[linearFit]] — per-brand price-on-size fit
    * with the slope shrunk by a PUBLISHED penalty α = 50 added to the
    * scatter in scale-free form: slope = S_xy / (S_xx + 50·n²), where
    * S_xy = n·Σxy − Σx·Σy and S_xx = n·Σx² − (Σx)² are exact BIGINTs
    * (cents × integer sizes; α·n² matches S_xx's n²·var(x) scale, so
    * the shrinkage fraction is corpus-size-invariant — the sklearn
    * per-observation-alpha convention). No iteration, no matrix solve:
    * one keyed aggregate computes the five moments; slope/intercept/
    * OLS-slope are one mirrored double each, rounded 6, and the spec
    * asserts |ridge| < |OLS| strictly on every brand (shrinkage is
    * real, not decorative). The same five moments serve any λ — a grid
    * search reuses one corpus pass.
    */
  def ridgeFrozen(s: SparkSession, d: String): DataFrame = {
    val t = Sources.part(s, d).select(col("p_brand"),
      col("p_size").cast("long").as("x"),
      round(col("p_retailprice") * 100).cast("long").as("y"))
    def D(c: Column): Column = c.cast("double")
    t.groupBy("p_brand").agg(
        count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .withColumn("s_xy", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("s_xx", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("slope_ridge", roundNorm(
        D(col("s_xy")) / (D(col("s_xx")) + lit(50.0) * D(col("n")) * D(col("n"))), 6))
      .withColumn("slope_ols", roundNorm(D(col("s_xy")) / D(col("s_xx")), 6))
      .withColumn("icept_ridge", roundNorm(
        (D(col("sy")) - D(col("s_xy")) /
          (D(col("s_xx")) + lit(50.0) * D(col("n")) * D(col("n"))) * D(col("sx")))
          / D(col("n")), 4))
      .select(col("p_brand"), col("n"), col("s_xy"), col("s_xx"),
        col("slope_ridge"), col("slope_ols"), col("icept_ridge"))
      .orderBy("p_brand")
  }

  /** Exact Shapley attributions for a linear model
    * (`ml_shap_linear_frozen`, r13): for a linear scorer the Shapley
    * value has the CLOSED FORM φ_i(x) = w_i·(x_i − μ_i) — no sampling,
    * no kernel approximation — so the per-feature attribution audit
    * (which features carry the model's decisions, the explainability
    * report every deployed scorer ships) is computable exactly at
    * corpus scale. Model: four PUBLISHED integer weights (3, −5, 2, 7)
    * over four exact integer order features (value in 10⁴-dollar
    * units, priority index, order weekday, item count). The n-scaled
    * lattice keeps everything integer: φ_scaled = w_i·(n·x_i − S_i)
    * (the Kruskal dev_n trick — n·μ_i = S_i is exact), so the
    * per-feature mean-|φ| mass Σ|φ_scaled| and its share in basis
    * points are exact BIGINTs, and the efficiency axiom
    * Σ_i φ_i(x) = η(x) − η̄ holds exactly on the same lattice
    * (spec-asserted per row). Plan: one item-count pre-agg join + one
    * corpus aggregate emitting 4·2 longs; the long-form output is a
    * literal 4-row stack.
    */
  def shapLinearFrozen(s: SparkSession, d: String): DataFrame = {
    val weights = Seq(3L, -5L, 2L, 7L)
    val names = Seq("value_10k", "prio_idx", "weekday", "n_items")
    val items = Sources.lineitem(s, d)
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(count(lit(1)).as("x3"))
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val prioIdx = prios.zipWithIndex.init.foldRight(lit(4L): Column) {
      case ((p, i), rest) =>
        when(col("o_orderpriority") === p, lit(i.toLong)).otherwise(rest)
    }
    val t = Sources.orders(s, d)
      .select(col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS LONG) div 1000000").as("x0"),
        prioIdx.as("x1"),
        // weekday via epoch-day arithmetic (0 = Sunday) — never the
        // engines' differently-numbered dayofweek built-ins
        expr("(datediff(o_orderdate, DATE'1970-01-01') + 4) % 7").as("x2"))
      .join(items, Seq("o_orderkey"))
    val aggs = (0 until 4).flatMap { i =>
      Seq(sum(col(s"x$i")).as(s"s$i"))
    } :+ count(lit(1)).as("n")
    val m = t.agg(aggs.head, aggs.tail: _*)
    val withPhi = t.crossJoin(broadcast(m))
    val absAggs = (0 until 4).map { i =>
      sum(abs(lit(weights(i)) * (col("n") * col(s"x$i") - col(s"s$i"))))
        .as(s"a$i")
    }
    // pinned: the 4-feature stack fans out over this 1-row aggregate
    // (the multi-consumer pin discipline)
    val wide = graft.io.Checkpoints.pin(
      withPhi.agg(absAggs.head, absAggs.tail: _*).crossJoin(broadcast(m)))
    val total = (0 until 4).map(i => col(s"a$i")).reduce(_ + _)
    val rows = (0 until 4).map { i =>
      wide.select(lit(names(i)).as("feature"), lit(weights(i)).as("w"),
        col(s"s$i").as("s_i"), col("n"),
        col(s"a$i").as("sum_abs_phi_n"),
        call_function("div", col(s"a$i") * 10000L, total).as("share_bp"))
    }
    rows.reduce(_.unionAll(_)).orderBy("feature")
  }

  /** McNemar's test (`ml_mcnemar`, r13): the PAIRED model-comparison
    * test — on the same examples, is classifier B genuinely different
    * from classifier A, judged only on the DISCORDANT pairs (b = A
    * right & B wrong, c = A wrong & B right; the concordant mass is
    * evidence about neither)? The test every "model B beats model A"
    * claim owes when both are evaluated on one test set (accuracy
    * deltas double-count the shared examples; [[cohensKappa]] measures
    * agreement, this measures superiority). Raters: the published
    * 100k-dollar threshold rule vs the looser 50k rule, truth = the
    * planted Knuth-hash label. Continuity-corrected statistic
    * (|b − c| − 1)²/(b + c) as an exact e6 floor — both b, c and the
    * square are Longs, the division positive, no doubles anywhere.
    * One conditional-sum corpus aggregate.
    */
  def mcnemar(s: SparkSession, d: String): DataFrame = {
    val t = Stats.plantedScores(s, d)
      .withColumn("pa", (col("cents") >= 10000000L).cast("long"))
      .withColumn("pb", (col("cents") >= 5000000L).cast("long"))
    t.agg(count(lit(1)).as("n"),
        sum(when(col("pa") === col("label") && col("pb") =!= col("label"),
          1L).otherwise(0L)).as("b"),
        sum(when(col("pa") =!= col("label") && col("pb") === col("label"),
          1L).otherwise(0L)).as("c"),
        sum(when(col("pa") === col("label"), 1L).otherwise(0L)).as("acc_a"),
        sum(when(col("pb") === col("label"), 1L).otherwise(0L)).as("acc_b"))
      .select(col("n"), col("b"), col("c"), col("acc_a"), col("acc_b"),
        // two identical raters have no discordant mass — the test is
        // undefined; 0 sentinel in both engines
        expr("CASE WHEN b + c = 0 THEN 0L ELSE " +
          "(1000000L * (abs(b - c) - 1L) * (abs(b - c) - 1L))" +
          " div (b + c) END").as("chi2_e6"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml_mcnemar" -> (mcnemar _),
    "ml_shap_linear_frozen" -> (shapLinearFrozen _),
    "ml_cohens_kappa" -> (cohensKappa _),
    "ml_tree_depth2" -> (treeDepth2 _),
    "ml_cooks_distance" -> (cooksDistance _),
    "ml_regression_metrics" -> (regressionMetrics _),
    "ml_mcc_threshold" -> (mccThreshold _),
    "ml_brier_decomposition" -> (brierDecomposition _),
    "ml_ridge_frozen" -> (ridgeFrozen _),
    "ml_lift_deciles" -> (liftDeciles _),
    "ml_decision_stump" -> (decisionStump _),
    "ml_isotonic_frozen" -> (isotonicFrozen _),
    "ml_feature_hash" -> (featureHash _),
    "ml_target_encoding" -> (targetEncoding _),
    "ml_nb_confusion" -> (nbConfusion _),
    "ml_calibration" -> (logregCalibration _),
    "ml_linear_fit" -> (linearFit _),
    "ml_logreg_weights" -> (logregWeights _),
    "ml_logreg_score" -> (logregScore _),
    "ml_logreg_eval" -> (logregEval _),
    "ml_logreg_score_frozen" -> (logregScoreFrozen _),
    "ml_perm_importance_frozen" -> (permImportanceFrozen _),
    "ml_conformal_frozen" -> (conformalFrozen _),
    "ml_logreg_eval_frozen" -> (logregEvalFrozen _),
    "ml_calibration_frozen" -> (logregCalibrationFrozen _),
  )

  val oracles: Map[String, String] = Map(
    // closed-form linear Shapley on the n-scaled integer lattice;
    // weekday from epoch-day arithmetic in both engines
    "ml_shap_linear_frozen" ->
      """WITH it AS (SELECT l_orderkey AS o_orderkey,
        |   CAST(count(*) AS BIGINT) AS x3 FROM lineitem GROUP BY 1),
        | t AS (SELECT
        |   CAST(round(o_totalprice * 100) AS BIGINT) // 1000000 AS x0,
        |   CAST(CASE o_orderpriority WHEN '1-URGENT' THEN 0
        |    WHEN '2-HIGH' THEN 1 WHEN '3-MEDIUM' THEN 2
        |    WHEN '4-NOT SPECIFIED' THEN 3 ELSE 4 END AS BIGINT) AS x1,
        |   CAST((datediff('day', DATE '1970-01-01',
        |     CAST(o_orderdate AS DATE)) + 4) % 7 AS BIGINT) AS x2,
        |   it.x3
        |  FROM orders JOIN it USING (o_orderkey)),
        | m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |   CAST(sum(x0) AS BIGINT) AS s0, CAST(sum(x1) AS BIGINT) AS s1,
        |   CAST(sum(x2) AS BIGINT) AS s2, CAST(sum(x3) AS BIGINT) AS s3
        |  FROM t),
        | a AS (SELECT max(m.n) AS n, max(s0) AS s0, max(s1) AS s1,
        |   max(s2) AS s2, max(s3) AS s3,
        |   CAST(sum(abs(3 * (m.n * x0 - s0))) AS BIGINT) AS a0,
        |   CAST(sum(abs(-5 * (m.n * x1 - s1))) AS BIGINT) AS a1,
        |   CAST(sum(abs(2 * (m.n * x2 - s2))) AS BIGINT) AS a2,
        |   CAST(sum(abs(7 * (m.n * x3 - s3))) AS BIGINT) AS a3
        |  FROM t CROSS JOIN m)
        |SELECT * FROM (
        | SELECT 'n_items' AS feature, CAST(7 AS BIGINT) AS w, s3 AS s_i,
        |  n, a3 AS sum_abs_phi_n, (a3 * 10000) // (a0+a1+a2+a3) AS share_bp
        | FROM a
        | UNION ALL SELECT 'prio_idx', -5, s1, n, a1,
        |  (a1 * 10000) // (a0+a1+a2+a3) FROM a
        | UNION ALL SELECT 'value_10k', 3, s0, n, a0,
        |  (a0 * 10000) // (a0+a1+a2+a3) FROM a
        | UNION ALL SELECT 'weekday', 2, s2, n, a2,
        |  (a2 * 10000) // (a0+a1+a2+a3) FROM a)
        |ORDER BY feature""".stripMargin,
    // exact integer kappa: one floor division, no doubles anywhere
    // same two published threshold raters, same discordant-only
    // continuity-corrected integer statistic
    "ml_mcnemar" ->
      """WITH t AS (SELECT
        |   CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |   CASE WHEN (o_orderkey * 2654435761) % 4294967296 % 1000000
        |     < least(100000 + CAST(round(o_totalprice * 100) AS BIGINT)
        |       // 100, 900000) THEN 1 ELSE 0 END AS label
        |  FROM orders),
        | p AS (SELECT label,
        |    CASE WHEN cents >= 10000000 THEN 1 ELSE 0 END AS pa,
        |    CASE WHEN cents >= 5000000 THEN 1 ELSE 0 END AS pb FROM t),
        | agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |   CAST(sum(CASE WHEN pa = label AND pb <> label THEN 1 ELSE 0 END)
        |     AS BIGINT) AS b,
        |   CAST(sum(CASE WHEN pa <> label AND pb = label THEN 1 ELSE 0 END)
        |     AS BIGINT) AS c,
        |   CAST(sum(CASE WHEN pa = label THEN 1 ELSE 0 END) AS BIGINT)
        |     AS acc_a,
        |   CAST(sum(CASE WHEN pb = label THEN 1 ELSE 0 END) AS BIGINT)
        |     AS acc_b
        |  FROM p)
        |SELECT n, b, c, acc_a, acc_b,
        | CASE WHEN b + c = 0 THEN 0
        |  ELSE (1000000 * (abs(b - c) - 1) * (abs(b - c) - 1)) // (b + c)
        |  END AS chi2_e6
        |FROM agg""".stripMargin,
    "ml_cohens_kappa" ->
      """WITH s AS (SELECT
        |   CASE WHEN (o_orderkey * 2654435761) % 4294967296 % 1000000
        |     < least(100000 + CAST(round(o_totalprice * 100) AS BIGINT) // 100, 900000)
        |     THEN 1 ELSE 0 END AS label,
        |   CASE WHEN CAST(round(o_totalprice * 100) AS BIGINT) >= 10000000
        |     THEN 1 ELSE 0 END AS pred
        |  FROM orders),
        | c AS (SELECT
        |   CAST(sum(CASE WHEN label = 1 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |   CAST(sum(CASE WHEN label = 1 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |   CAST(sum(CASE WHEN label = 0 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |   CAST(sum(CASE WHEN label = 0 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM s),
        | k AS (SELECT *, a + b + c + d AS n,
        |   (a + b) * (a + c) + (c + d) * (b + d) AS m FROM c)
        |SELECT a, b, c, d, n,
        | (1000000 * (n * (a + d))) // (n * n) AS po_e6,
        | (1000000 * m) // (n * n) AS pe_e6,
        | (1000000 * (n * (a + d) - m)) // (n * n - m) AS kappa_e6
        |FROM k""".stripMargin,
    // same mirrored residuals, same per-row lattice terms, one
    // mirrored finish per metric
    "ml_regression_metrics" ->
      """WITH xy AS (SELECT o_orderkey, CAST(count(*) AS BIGINT) AS x,
        |   CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) // 100
        |     AS BIGINT) AS y
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  GROUP BY 1),
        | mom AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |   CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx,
        |   CAST(sum(y) AS BIGINT) AS sy, CAST(sum(y * y) AS BIGINT) AS syy,
        |   CAST(sum(x * y) AS BIGINT) AS sxy FROM xy),
        | k AS (SELECT x, y, n, sy, syy,
        |   sx::DOUBLE / n::DOUBLE AS xb, sy::DOUBLE / n::DOUBLE AS yb,
        |   (sxy::DOUBLE - n::DOUBLE * (sx::DOUBLE / n::DOUBLE)
        |      * (sy::DOUBLE / n::DOUBLE))
        |   / (sxx::DOUBLE - n::DOUBLE * (sx::DOUBLE / n::DOUBLE)
        |      * (sx::DOUBLE / n::DOUBLE)) AS b
        |  FROM xy, mom),
        | t AS (SELECT n, sy, syy,
        |   y::DOUBLE - (yb - b * xb) - b * x::DOUBLE AS e, y FROM k),
        | r AS (SELECT n, sy, syy,
        |   CAST(round(abs(e)) AS BIGINT) AS abs_r,
        |   CAST(round(e * e) AS BIGINT) AS sq_r,
        |   CAST(round(1e6 * abs(e) / y::DOUBLE) AS BIGINT) AS ape_e6
        |  FROM t),
        | agg AS (SELECT max(n) AS n, CAST(sum(abs_r) AS BIGINT) AS sum_abs,
        |   CAST(sum(sq_r) AS BIGINT) AS sum_sq,
        |   CAST(sum(ape_e6) AS BIGINT) AS sum_ape_e6,
        |   max(sy) AS sy, max(syy) AS syy FROM r)
        |SELECT n, sum_abs, sum_sq,
        | sum_abs // n AS mae_usd,
        | round(sqrt(sum_sq::DOUBLE / n::DOUBLE), 4) + 0.0 AS rmse_usd,
        | round(1.0 - sum_sq::DOUBLE
        |   / (syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n::DOUBLE), 6) + 0.0
        |   AS r2,
        | sum_ape_e6 // n AS mape_e6
        |FROM agg""".stripMargin,
    // same exact raw moments, same mirrored central combinations and
    // per-row e9 rounding, same (d_e9 desc, key) cut
    "ml_cooks_distance" ->
      """WITH xy AS (SELECT o_orderkey, CAST(count(*) AS BIGINT) AS x,
        |   CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) // 100
        |     AS BIGINT) AS y
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  GROUP BY 1),
        | mom AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |   CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx,
        |   CAST(sum(y) AS BIGINT) AS sy, CAST(sum(y * y) AS BIGINT) AS syy,
        |   CAST(sum(x * y) AS BIGINT) AS sxy FROM xy),
        | k AS (SELECT o_orderkey, x, y,
        |   sx::DOUBLE / n::DOUBLE AS xb, sy::DOUBLE / n::DOUBLE AS yb,
        |   sxx::DOUBLE - n::DOUBLE * (sx::DOUBLE / n::DOUBLE)
        |     * (sx::DOUBLE / n::DOUBLE) AS sxxc,
        |   sxy::DOUBLE - n::DOUBLE * (sx::DOUBLE / n::DOUBLE)
        |     * (sy::DOUBLE / n::DOUBLE) AS sxyc,
        |   syy::DOUBLE - n::DOUBLE * (sy::DOUBLE / n::DOUBLE)
        |     * (sy::DOUBLE / n::DOUBLE) AS syyc,
        |   n FROM xy, mom),
        | k2 AS (SELECT *, sxyc / sxxc AS b FROM k),
        | k3 AS (SELECT *, (syyc - b * sxyc) / (n - 2)::DOUBLE AS s2,
        |   y::DOUBLE - (yb - b * xb) - b * x::DOUBLE AS e,
        |   1.0 / n::DOUBLE + (x::DOUBLE - xb) * (x::DOUBLE - xb) / sxxc
        |     AS h FROM k2),
        | k4 AS (SELECT o_orderkey, x AS n_items, y AS y_usd,
        |   CAST(round(1e9 * e * e * h
        |     / (2.0 * s2 * (1.0 - h) * (1.0 - h))) AS BIGINT) AS d_e9
        |  FROM k3)
        |SELECT o_orderkey, n_items, y_usd, d_e9
        |FROM k4 ORDER BY d_e9 DESC, o_orderkey LIMIT 20""".stripMargin,
    // identical greedy trajectory: root argmin, broadcast pick,
    // per-branch argmin — every count and tie-break replayed
    "ml_tree_depth2" ->
      """WITH w AS (SELECT doc_id, n_chars, string_split(text, ' ') AS ws
        |           FROM documents),
        | f AS (SELECT doc_id, n_chars, len(ws) AS nw,
        |    ln(1.0 + CAST(n_chars AS DOUBLE)) AS f1,
        |    (CAST(n_chars AS DOUBLE) - (CAST(len(ws) AS DOUBLE) - 1))
        |      / CAST(len(ws) AS DOUBLE) AS f2,
        |    CAST(len(list_filter(ws, t -> t = 'a' OR t = 'the')) AS DOUBLE)
        |      / CAST(len(ws) AS DOUBLE) AS f3,
        |    CAST(len(list_distinct(ws)) AS DOUBLE)
        |      / CAST(len(ws) AS DOUBLE) AS f4
        |  FROM w),
        | p AS (SELECT doc_id, n_chars, nw,
        |    1.0 / (1.0 + exp(-(1.0 * (-16.0) + f1 * 3.0 + f2 * (-1.2)
        |      + f3 * 25.0 + f4 * 6.0))) AS mu,
        |    CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE) / 4294967296.0
        |      AS u
        |  FROM f),
        | base AS (SELECT
        |    CAST(CASE WHEN u < mu THEN 1 ELSE 0 END AS BIGINT) AS y,
        |    CAST(n_chars AS BIGINT) AS nchars, CAST(nw AS BIGINT) AS nwords
        |  FROM p),
        | rl AS (SELECT y, 'nchars' AS feature, nchars AS value FROM base
        |   UNION ALL SELECT y, 'nwords', nwords FROM base),
        | rg AS (SELECT feature, value, CAST(count(*) AS BIGINT) AS n_v,
        |    CAST(sum(y) AS BIGINT) AS pos_v FROM rl GROUP BY 1, 2),
        | rtot AS (SELECT CAST(count(*) AS BIGINT) AS n_tot,
        |    CAST(sum(y) AS BIGINT) AS pos_tot FROM base),
        | rc AS (SELECT feature, value,
        |    CAST(sum(n_v) OVER (PARTITION BY feature ORDER BY value)
        |      AS BIGINT) AS n_l,
        |    CAST(sum(pos_v) OVER (PARTITION BY feature ORDER BY value)
        |      AS BIGINT) AS pos_l
        |  FROM rg),
        | rsp AS (SELECT feature, value, n_l, pos_l, n_tot - n_l AS n_r,
        |    pos_tot - pos_l AS pos_r, n_tot, pos_tot
        |  FROM rc, rtot WHERE n_tot - n_l > 0),
        | rerr AS (SELECT *, least(pos_l, n_l - pos_l)
        |    + least(pos_r, n_r - pos_r) AS errors FROM rsp),
        | rbest AS (SELECT * FROM (SELECT *, row_number() OVER (
        |    ORDER BY errors, feature, value) AS rk FROM rerr) WHERE rk = 1),
        | br AS (SELECT CASE WHEN (b.feature = 'nchars'
        |      AND base.nchars <= b.value) OR (b.feature = 'nwords'
        |      AND base.nwords <= b.value) THEN 'L' ELSE 'R' END AS branch,
        |    y, nchars, nwords FROM base, rbest b),
        | ll AS (SELECT branch, y, 'nchars' AS feature, nchars AS value
        |   FROM br UNION ALL SELECT branch, y, 'nwords', nwords FROM br),
        | lg AS (SELECT branch, feature, value,
        |    CAST(count(*) AS BIGINT) AS n_v, CAST(sum(y) AS BIGINT) AS pos_v
        |  FROM ll GROUP BY 1, 2, 3),
        | ltot AS (SELECT branch, CAST(count(*) AS BIGINT) AS n_tot,
        |    CAST(sum(y) AS BIGINT) AS pos_tot FROM br GROUP BY 1),
        | lc AS (SELECT branch, feature, value,
        |    CAST(sum(n_v) OVER (PARTITION BY branch, feature ORDER BY value)
        |      AS BIGINT) AS n_l,
        |    CAST(sum(pos_v) OVER (PARTITION BY branch, feature ORDER BY value)
        |      AS BIGINT) AS pos_l
        |  FROM lg),
        | lsp AS (SELECT lc.branch, feature, value, n_l, pos_l,
        |    n_tot - n_l AS n_r, pos_tot - pos_l AS pos_r, n_tot, pos_tot
        |  FROM lc JOIN ltot ON lc.branch = ltot.branch
        |  WHERE n_tot - n_l > 0),
        | lerr AS (SELECT *, least(pos_l, n_l - pos_l)
        |    + least(pos_r, n_r - pos_r) AS errors FROM lsp),
        | lbest AS (SELECT * FROM (SELECT *, row_number() OVER (
        |    PARTITION BY branch ORDER BY errors, feature, value) AS rk
        |   FROM lerr) WHERE rk = 1),
        | outp AS (
        |  SELECT 'root' AS node, feature, value AS threshold,
        |    n_tot AS n_node, pos_tot AS pos_node, errors,
        |    least(pos_tot, n_tot - pos_tot) AS baseline_errors FROM rbest
        |  UNION ALL
        |  SELECT branch, feature, value, n_tot, pos_tot, errors,
        |    least(pos_tot, n_tot - pos_tot) FROM lbest)
        |SELECT node, feature, threshold, n_node, pos_node, errors,
        | baseline_errors
        |FROM outp ORDER BY node""".stripMargin,
    // same exploded thresholds, exact cells, num exact; mcc is the
    // identical four-sqrt-factor double expression, rounded 6
    "ml_mcc_threshold" ->
      """WITH s AS (SELECT thr_cents,
        |   CASE WHEN (o_orderkey * 2654435761) % 4294967296 % 1000000
        |     < least(100000 + CAST(round(o_totalprice * 100) AS BIGINT) // 100, 900000)
        |     THEN 1 ELSE 0 END AS label,
        |   CASE WHEN CAST(round(o_totalprice * 100) AS BIGINT) >= thr_cents
        |     THEN 1 ELSE 0 END AS pred
        |  FROM orders, unnest([10000000, 20000000]) t(thr_cents)),
        | c AS (SELECT CAST(thr_cents AS BIGINT) AS thr_cents,
        |   CAST(sum(CASE WHEN label = 1 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |   CAST(sum(CASE WHEN label = 1 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |   CAST(sum(CASE WHEN label = 0 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |   CAST(sum(CASE WHEN label = 0 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM s GROUP BY 1)
        |SELECT thr_cents, a, b, c, d, a * d - b * c AS num,
        | round((a * d - b * c)::DOUBLE
        |   / (sqrt((a + b)::DOUBLE) * sqrt((a + c)::DOUBLE)
        |      * sqrt((d + b)::DOUBLE) * sqrt((d + c)::DOUBLE)), 6) + 0.0 AS mcc
        |FROM c ORDER BY thr_cents""".stripMargin,
    // per-bin REL/RES terms round onto the e9 lattice BEFORE any
    // cross-bin sum; the Brier mass itself ships exact (x 400n)
    "ml_brier_decomposition" ->
      """WITH scored AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |   CASE WHEN (o_orderkey * 2654435761) % 4294967296 % 1000000
        |     < least(100000 + CAST(round(o_totalprice * 100) AS BIGINT) // 100, 900000)
        |     THEN 1 ELSE 0 END AS label
        |  FROM orders),
        | g AS (SELECT least(cents // 10000000, 9) AS bin,
        |    CAST(count(*) AS BIGINT) AS n_k,
        |    CAST(sum(label) AS BIGINT) AS pos_k
        |  FROM scored GROUP BY 1),
        | tot AS (SELECT CAST(sum(n_k) AS BIGINT) AS n,
        |    CAST(sum(pos_k) AS BIGINT) AS p_tot FROM g)
        |SELECT bin, n_k, pos_k,
        | CAST((bin * 2 + 1) * 50 AS BIGINT) AS f_e3,
        | CAST(round(((bin * 2 + 1) * n_k - 20 * pos_k)::DOUBLE
        |     * ((bin * 2 + 1) * n_k - 20 * pos_k)::DOUBLE * 1e9
        |   / (n_k::DOUBLE * 400.0 * n::DOUBLE)) AS BIGINT) AS rel_e9,
        | CAST(round((n * pos_k - p_tot * n_k)::DOUBLE
        |     * (n * pos_k - p_tot * n_k)::DOUBLE * 1e9
        |   / (n::DOUBLE * n::DOUBLE * n::DOUBLE * n_k::DOUBLE)) AS BIGINT) AS res_e9,
        | CAST((bin * 2 + 1) * (bin * 2 + 1) * n_k
        |   - 40 * (bin * 2 + 1) * pos_k + 400 * pos_k AS BIGINT) AS bs_term_400
        |FROM g CROSS JOIN tot ORDER BY bin""".stripMargin,
    // exact scatter moments; slope/intercept one mirrored double each
    "ml_ridge_frozen" ->
      """WITH t AS (SELECT p_brand, CAST(p_size AS BIGINT) AS x,
        |   CAST(round(p_retailprice * 100) AS BIGINT) AS y FROM part),
        | g AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
        |   CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |   CAST(sum(x * y) AS BIGINT) AS sxy,
        |   CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM t GROUP BY 1),
        | m AS (SELECT p_brand, n, sx, sy,
        |   n * sxy - sx * sy AS s_xy, n * sxx - sx * sx AS s_xx FROM g)
        |SELECT p_brand, n, s_xy, s_xx,
        | round(s_xy::DOUBLE / (s_xx::DOUBLE + 50.0 * n::DOUBLE * n::DOUBLE), 6)
        |   + 0.0 AS slope_ridge,
        | round(s_xy::DOUBLE / s_xx::DOUBLE, 6) + 0.0 AS slope_ols,
        | round((sy::DOUBLE - s_xy::DOUBLE
        |     / (s_xx::DOUBLE + 50.0 * n::DOUBLE * n::DOUBLE) * sx::DOUBLE)
        |   / n::DOUBLE, 4) + 0.0 AS icept_ridge
        |FROM m ORDER BY p_brand""".stripMargin,
    // frozen scoring CTE + explicit-formula rank deciles (NTILE
    // built-ins differ on remainder placement; the formula doesn't)
    "ml_lift_deciles" ->
      """WITH w AS (SELECT doc_id, n_chars, string_split(text, ' ') AS ws
        |           FROM documents),
        |f AS (SELECT doc_id,
        |    ln(1.0 + CAST(n_chars AS DOUBLE)) AS f1,
        |    (CAST(n_chars AS DOUBLE) - (CAST(len(ws) AS DOUBLE) - 1))
        |      / CAST(len(ws) AS DOUBLE) AS f2,
        |    CAST(len(list_filter(ws, t -> t = 'a' OR t = 'the')) AS DOUBLE)
        |      / CAST(len(ws) AS DOUBLE) AS f3,
        |    CAST(len(list_distinct(ws)) AS DOUBLE)
        |      / CAST(len(ws) AS DOUBLE) AS f4
        |  FROM w),
        |e AS (SELECT doc_id,
        |    1.0 * (-16.0) + f1 * 3.0 + f2 * (-1.2) + f3 * 25.0 + f4 * 6.0 AS eta
        |  FROM f),
        |p AS (SELECT doc_id, 1.0 / (1.0 + exp(-eta)) AS mu,
        |    CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE) / 4294967296.0 AS u
        |  FROM e),
        |sc AS (SELECT doc_id,
        |    CAST(CASE WHEN u < mu THEN 1 ELSE 0 END AS BIGINT) AS label,
        |    round(mu, 6) + 0.0 AS score FROM p),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(label) AS BIGINT) AS n_pos FROM sc),
        |rk AS (SELECT *, CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC)
        |    AS BIGINT) AS rk FROM sc),
        |dd AS (SELECT (10 * (rk - 1)) // n + 1 AS decile, label
        |  FROM rk CROSS JOIN tot),
        |bd AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(label) AS BIGINT) AS n_pos_d FROM dd GROUP BY 1),
        |cm AS (SELECT *, CAST(sum(n_pos_d) OVER (ORDER BY decile) AS BIGINT)
        |    AS cum_pos FROM bd)
        |SELECT decile, n_docs, n_pos_d,
        | round(n_pos_d::DOUBLE / n_docs::DOUBLE, 6) + 0.0 AS response_rate,
        | round(n_pos_d::DOUBLE / n_docs::DOUBLE
        |   / ((SELECT n_pos FROM tot)::DOUBLE / (SELECT n FROM tot)::DOUBLE), 4)
        |   + 0.0 AS lift,
        | round(cum_pos::DOUBLE / (SELECT n_pos FROM tot)::DOUBLE, 6) + 0.0
        |   AS cum_gain
        |FROM cm ORDER BY decile""".stripMargin,
    "ml_decision_stump" ->
      """WITH w AS (SELECT doc_id, n_chars, string_split(text, ' ') AS ws
        |           FROM documents),
        | f AS (SELECT doc_id, n_chars, len(ws) AS nw,
        |    ln(1.0 + CAST(n_chars AS DOUBLE)) AS f1,
        |    (CAST(n_chars AS DOUBLE) - (CAST(len(ws) AS DOUBLE) - 1))
        |      / CAST(len(ws) AS DOUBLE) AS f2,
        |    CAST(len(list_filter(ws, t -> t = 'a' OR t = 'the')) AS DOUBLE)
        |      / CAST(len(ws) AS DOUBLE) AS f3,
        |    CAST(len(list_distinct(ws)) AS DOUBLE)
        |      / CAST(len(ws) AS DOUBLE) AS f4
        |  FROM w),
        | p AS (SELECT doc_id, n_chars, nw,
        |    1.0 / (1.0 + exp(-(1.0 * (-16.0) + f1 * 3.0 + f2 * (-1.2)
        |      + f3 * 25.0 + f4 * 6.0))) AS mu,
        |    CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE) / 4294967296.0
        |      AS u
        |  FROM f),
        | base AS (SELECT
        |    CAST(CASE WHEN u < mu THEN 1 ELSE 0 END AS BIGINT) AS y,
        |    CAST(n_chars AS BIGINT) AS nchars, CAST(nw AS BIGINT) AS nwords
        |  FROM p),
        | lng AS (SELECT y, 'nchars' AS feature, nchars AS value FROM base
        |   UNION ALL SELECT y, 'nwords', nwords FROM base),
        | g AS (SELECT feature, value, CAST(count(*) AS BIGINT) AS n_v,
        |    CAST(sum(y) AS BIGINT) AS pos_v FROM lng GROUP BY 1, 2),
        | tot AS (SELECT CAST(count(*) AS BIGINT) AS n_tot,
        |    CAST(sum(y) AS BIGINT) AS pos_tot FROM base),
        | c AS (SELECT feature, value,
        |    CAST(sum(n_v) OVER (PARTITION BY feature ORDER BY value) AS BIGINT)
        |      AS n_l,
        |    CAST(sum(pos_v) OVER (PARTITION BY feature ORDER BY value) AS BIGINT)
        |      AS pos_l
        |  FROM g),
        | sp AS (SELECT feature, value, n_l, pos_l, n_tot - n_l AS n_r,
        |    pos_tot - pos_l AS pos_r, n_tot, pos_tot
        |  FROM c CROSS JOIN tot WHERE n_tot - n_l > 0),
        | er AS (SELECT *,
        |    least(pos_l, n_l - pos_l) + least(pos_r, n_r - pos_r) AS errors,
        |    least(pos_tot, n_tot - pos_tot) AS baseline_errors FROM sp)
        |SELECT feature, value AS threshold, n_l, pos_l, n_r, pos_r, errors,
        | baseline_errors,
        | round((2.0 * pos_l::DOUBLE * (n_l - pos_l)::DOUBLE / n_l::DOUBLE
        |   + 2.0 * pos_r::DOUBLE * (n_r - pos_r)::DOUBLE / n_r::DOUBLE)
        |   / n_tot::DOUBLE, 6) + 0.0 AS gini
        |FROM er ORDER BY errors, feature, threshold LIMIT 1""".stripMargin,
    // same frozen scoring CTE as ml_calibration_frozen, then the
    // minimax identity on the exact 1e-9 integer lattice
    "ml_isotonic_frozen" ->
      """WITH w AS (SELECT doc_id, n_chars, string_split(text, ' ') AS ws
        |           FROM documents),
        |f AS (SELECT doc_id,
        |    ln(1.0 + CAST(n_chars AS DOUBLE)) AS f1,
        |    (CAST(n_chars AS DOUBLE) - (CAST(len(ws) AS DOUBLE) - 1))
        |      / CAST(len(ws) AS DOUBLE) AS f2,
        |    CAST(len(list_filter(ws, t -> t = 'a' OR t = 'the')) AS DOUBLE)
        |      / CAST(len(ws) AS DOUBLE) AS f3,
        |    CAST(len(list_distinct(ws)) AS DOUBLE)
        |      / CAST(len(ws) AS DOUBLE) AS f4
        |  FROM w),
        |e AS (SELECT doc_id,
        |    1.0 * (-16.0) + f1 * 3.0 + f2 * (-1.2) + f3 * 25.0 + f4 * 6.0 AS eta
        |  FROM f),
        |p AS (SELECT doc_id, 1.0 / (1.0 + exp(-eta)) AS mu,
        |    CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE) / 4294967296.0 AS u
        |  FROM e),
        |sc AS (SELECT CASE WHEN u < mu THEN 1 ELSE 0 END AS label,
        |    round(mu, 6) + 0.0 AS score
        |  FROM p),
        |bk AS (SELECT least(CAST(floor(score * 10) AS BIGINT), 9) AS bucket,
        |    CAST(count(*) AS BIGINT) AS n, CAST(sum(label) AS BIGINT) AS n_pos
        |  FROM sc GROUP BY 1),
        |cum AS (SELECT bucket, n, n_pos,
        |    CAST(sum(n) OVER (ORDER BY bucket) AS BIGINT) AS cn,
        |    CAST(sum(n_pos) OVER (ORDER BY bucket) AS BIGINT) AS cpos
        |  FROM bk),
        |seg AS (SELECT j.bucket AS j, k.bucket AS k,
        |    (k.cpos - j.cpos + j.n_pos) AS spos, (k.cn - j.cn + j.n) AS sn
        |  FROM cum j JOIN cum k ON j.bucket <= k.bucket),
        |tri AS (SELECT i.bucket AS i, s.j,
        |    (s.spos * 1000000000) // s.sn AS r
        |  FROM bk i JOIN seg s ON s.j <= i.bucket AND i.bucket <= s.k),
        |mn AS (SELECT i, j, min(r) AS m FROM tri GROUP BY 1, 2),
        |iso AS (SELECT i, max(m) AS iso_e9 FROM mn GROUP BY 1)
        |SELECT bk.bucket, bk.n, bk.n_pos,
        | CAST(iso.iso_e9 AS BIGINT) AS iso_e9
        |FROM bk JOIN iso ON bk.bucket = iso.i ORDER BY 1""".stripMargin,
    "ml_feature_hash" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |   FROM documents),
        | h AS (SELECT doc_id, list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(t, ''), c -> CAST(ascii(c) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS th FROM tok),
        | f AS (SELECT doc_id, th % 256 AS bucket,
        |    CASE WHEN (th // 256) % 2 = 0 THEN 1 ELSE -1 END AS sgn FROM h)
        |SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
        | CAST(sum(sgn) AS BIGINT) AS fval
        |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ml_target_encoding" ->
      """WITH rows_ AS (
        |  SELECT o_orderkey, c_mktsegment,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |grp AS (SELECT c_mktsegment, count(*) AS n_g, sum(cents) AS s_g
        |        FROM rows_ GROUP BY c_mktsegment),
        |tots AS (SELECT count(*) AS n_all, sum(cents) AS s_all FROM rows_)
        |SELECT o_orderkey, rows_.c_mktsegment,
        |  round((CAST(s_g AS DOUBLE) - cents
        |      + 20.0 * (CAST(s_all AS DOUBLE) / n_all))
        |    / (n_g - 1 + 20) / 100, 6) + 0.0 AS enc_usd
        |FROM rows_ JOIN grp ON rows_.c_mktsegment = grp.c_mktsegment, tots
        |ORDER BY o_orderkey""".stripMargin,
    "ml_nb_confusion" ->
      """WITH train AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
        |test AS (SELECT * FROM documents WHERE doc_id % 2 = 1),
        |ttok AS (SELECT lang, unnest(string_split(text, ' ')) AS w FROM train),
        |ttok2 AS (SELECT * FROM ttok WHERE w <> ''),
        |model AS (SELECT lang, w, CAST(round(ln(count(*) + 1) * 1e6) AS BIGINT) AS am
        |          FROM ttok2 GROUP BY lang, w),
        |ls AS (SELECT nl.lang AS cand_lang,
        |         CAST(round(ln(t_l + v) * 1e6) AS BIGINT) AS bm,
        |         CAST(round(ln(CAST(n_l AS DOUBLE) / nd) * 1e6) AS BIGINT) AS pm
        |       FROM (SELECT lang, count(*) AS n_l FROM train GROUP BY lang) nl
        |       JOIN (SELECT lang, count(*) AS t_l FROM ttok2 GROUP BY lang) lt
        |         ON nl.lang = lt.lang,
        |       (SELECT count(DISTINCT w) AS v FROM ttok2),
        |       (SELECT count(*) AS nd FROM train)),
        |tt AS (SELECT doc_id, lang AS actual, unnest(string_split(text, ' ')) AS w
        |       FROM test),
        |tt2 AS (SELECT * FROM tt WHERE w <> ''),
        |kw AS (SELECT doc_id, w, count(*) AS k FROM tt2 GROUP BY doc_id, w),
        |td AS (SELECT doc_id, any_value(actual) AS actual, count(*) AS t
        |       FROM tt2 GROUP BY doc_id),
        |sdl AS (SELECT kw.doc_id, model.lang AS cand_lang, sum(k * am) AS sm
        |        FROM kw JOIN model ON kw.w = model.w GROUP BY kw.doc_id, model.lang),
        |grid AS (SELECT td.doc_id, td.actual, ls.cand_lang,
        |           pm - t * bm + coalesce(sm, 0) AS score
        |         FROM td CROSS JOIN ls
        |         LEFT JOIN sdl ON sdl.doc_id = td.doc_id AND sdl.cand_lang = ls.cand_lang),
        |pred AS (SELECT doc_id, actual, cand_lang AS predicted_lang,
        |           row_number() OVER (PARTITION BY doc_id
        |             ORDER BY score DESC, cand_lang) AS rn
        |         FROM grid),
        |cells AS (SELECT actual AS lang, predicted_lang, count(*) AS n_docs
        |          FROM pred WHERE rn = 1 GROUP BY actual, predicted_lang),
        |tot AS (SELECT lang, sum(n_docs) AS tn FROM cells GROUP BY lang)
        |SELECT cells.lang, predicted_lang, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST((10000 * n_docs) // tn AS BIGINT) AS share_bp
        |FROM cells JOIN tot ON cells.lang = tot.lang
        |ORDER BY cells.lang, predicted_lang""".stripMargin,
    // the conformal order statistic replays through the same running-sum
    // rank; ceil(0.9(n+1)) is the published integer formula
    "ml_conformal_frozen" ->
      """WITH items AS (SELECT l_orderkey AS o_orderkey,
        |   CAST(count(*) AS BIGINT) AS x FROM lineitem GROUP BY 1),
        | t AS (SELECT o_orderkey, x,
        |    ((o_orderkey % 1048576) * 2654435761) % 2 = 0 AS calib,
        |    abs(CAST(round(o_totalprice) AS BIGINT) - 3600 * x) AS resid
        |  FROM orders JOIN items USING (o_orderkey)),
        | byr AS (SELECT resid, CAST(count(*) AS BIGINT) AS c FROM t
        |  WHERE calib GROUP BY 1),
        | run AS (SELECT resid, c, CAST(sum(c) OVER (ORDER BY resid
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM byr),
        | nc AS (SELECT CAST(sum(c) AS BIGINT) AS n_calib FROM byr),
        | q AS (SELECT n_calib,
        |    CAST(((n_calib + 1) * 9 + 9) // 10 AS BIGINT) AS k_order,
        |    CAST(min(CASE WHEN cum >= ((n_calib + 1) * 9 + 9) // 10
        |      THEN resid END) AS BIGINT) AS q_resid
        |  FROM run CROSS JOIN nc GROUP BY 1)
        |SELECT q.n_calib, q.k_order, q.q_resid,
        | CAST(count(*) AS BIGINT) AS n_test,
        | CAST(sum(CASE WHEN t.resid <= q.q_resid THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_covered,
        | CAST((sum(CASE WHEN t.resid <= q.q_resid THEN 1 ELSE 0 END)
        |   * 1000000) // count(*) AS BIGINT) AS coverage_e6
        |FROM t CROSS JOIN q WHERE NOT t.calib
        |GROUP BY 1, 2, 3""".stripMargin,
    // same featurization/teacher as the frozen scorer; the cyclic-shift
    // donor join and per-variant tie-aware U replay the whole pipeline
    "ml_perm_importance_frozen" ->
      """WITH w AS (SELECT doc_id, n_chars, string_split(text, ' ') AS ws
        |           FROM documents),
        |f AS (SELECT doc_id,
        |    ln(1.0 + CAST(n_chars AS DOUBLE)) AS f1,
        |    (CAST(n_chars AS DOUBLE) - (CAST(len(ws) AS DOUBLE) - 1))
        |      / CAST(len(ws) AS DOUBLE) AS f2,
        |    CAST(len(list_filter(ws, t -> t = 'a' OR t = 'the')) AS DOUBLE)
        |      / CAST(len(ws) AS DOUBLE) AS f3,
        |    CAST(len(list_distinct(ws)) AS DOUBLE)
        |      / CAST(len(ws) AS DOUBLE) AS f4
        |  FROM w),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |lab AS (SELECT doc_id, f1, f2, f3, f4,
        |    CASE WHEN CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE)
        |        / 4294967296.0
        |      < 1.0 / (1.0 + exp(-(1.0 * (-16.0) + f1 * 3.0 + f2 * (-1.2)
        |        + f3 * 25.0 + f4 * 6.0)))
        |      THEN 1 ELSE 0 END AS y
        |  FROM f),
        |don AS (SELECT (doc_id + 17) % n AS doc_id,
        |    f1 AS g1, f2 AS g2, f3 AS g3, f4 AS g4
        |  FROM f CROSS JOIN nn),
        |j AS (SELECT lab.doc_id, f1, f2, f3, f4, g1, g2, g3, g4, y
        |  FROM lab JOIN don USING (doc_id)),
        |sc AS (SELECT y,
        |   CAST(round(1000000 * (1.0 / (1.0 + exp(-(1.0 * (-16.0) + f1 * 3.0
        |     + f2 * (-1.2) + f3 * 25.0 + f4 * 6.0))))) AS BIGINT) AS s0,
        |   CAST(round(1000000 * (1.0 / (1.0 + exp(-(1.0 * (-16.0) + g1 * 3.0
        |     + f2 * (-1.2) + f3 * 25.0 + f4 * 6.0))))) AS BIGINT) AS s1,
        |   CAST(round(1000000 * (1.0 / (1.0 + exp(-(1.0 * (-16.0) + f1 * 3.0
        |     + g2 * (-1.2) + f3 * 25.0 + f4 * 6.0))))) AS BIGINT) AS s2,
        |   CAST(round(1000000 * (1.0 / (1.0 + exp(-(1.0 * (-16.0) + f1 * 3.0
        |     + f2 * (-1.2) + g3 * 25.0 + f4 * 6.0))))) AS BIGINT) AS s3,
        |   CAST(round(1000000 * (1.0 / (1.0 + exp(-(1.0 * (-16.0) + f1 * 3.0
        |     + f2 * (-1.2) + f3 * 25.0 + g4 * 6.0))))) AS BIGINT) AS s4
        |  FROM j),
        |u AS (
        |  SELECT 'base' AS feature, s0 AS sc, y FROM sc
        |  UNION ALL SELECT 'log_len', s1, y FROM sc
        |  UNION ALL SELECT 'avg_tok_len', s2, y FROM sc
        |  UNION ALL SELECT 'stop_ratio', s3, y FROM sc
        |  UNION ALL SELECT 'type_token_ratio', s4, y FROM sc),
        |byv AS (SELECT feature, sc, CAST(sum(y) AS BIGINT) AS pos,
        |    CAST(sum(1 - y) AS BIGINT) AS neg
        |  FROM u GROUP BY 1, 2),
        |run AS (SELECT feature, pos, neg,
        |    sum(neg) OVER (PARTITION BY feature ORDER BY sc
        |      ROWS UNBOUNDED PRECEDING) AS cumneg
        |  FROM byv),
        |agg AS (SELECT feature, CAST(sum(pos) AS BIGINT) AS p,
        |    CAST(sum(neg) AS BIGINT) AS ng,
        |    CAST(sum(pos * (cumneg - neg) * 2 + pos * neg) AS BIGINT) AS u2
        |  FROM run GROUP BY 1),
        |base AS (SELECT CAST((u2 * 500000) // (p * ng) AS BIGINT)
        |    AS auc_base_e6 FROM agg WHERE feature = 'base')
        |SELECT a.feature, b.auc_base_e6,
        | CAST((a.u2 * 500000) // (a.p * a.ng) AS BIGINT) AS auc_perm_e6,
        | b.auc_base_e6 - CAST((a.u2 * 500000) // (a.p * a.ng) AS BIGINT)
        |   AS delta_e6
        |FROM agg a CROSS JOIN base b WHERE a.feature <> 'base'
        |ORDER BY a.feature""".stripMargin,
    "ml_logreg_score_frozen" ->
      """WITH w AS (SELECT doc_id, n_chars, string_split(text, ' ') AS ws
        |           FROM documents),
        |f AS (SELECT doc_id,
        |    ln(1.0 + CAST(n_chars AS DOUBLE)) AS f1,
        |    (CAST(n_chars AS DOUBLE) - (CAST(len(ws) AS DOUBLE) - 1))
        |      / CAST(len(ws) AS DOUBLE) AS f2,
        |    CAST(len(list_filter(ws, t -> t = 'a' OR t = 'the')) AS DOUBLE)
        |      / CAST(len(ws) AS DOUBLE) AS f3,
        |    CAST(len(list_distinct(ws)) AS DOUBLE)
        |      / CAST(len(ws) AS DOUBLE) AS f4
        |  FROM w),
        |e AS (SELECT doc_id,
        |    1.0 * (-16.0) + f1 * 3.0 + f2 * (-1.2) + f3 * 25.0 + f4 * 6.0 AS eta
        |  FROM f),
        |p AS (SELECT doc_id, 1.0 / (1.0 + exp(-eta)) AS mu,
        |    CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE) / 4294967296.0 AS u
        |  FROM e)
        |SELECT doc_id,
        |  CAST(CASE WHEN u < mu THEN 1 ELSE 0 END AS BIGINT) AS label,
        |  round(mu, 6) + 0.0 AS score,
        |  CAST(CASE WHEN round(mu, 6) + 0.0 >= 0.5 THEN 1 ELSE 0 END AS BIGINT) AS pred
        |FROM p ORDER BY doc_id""".stripMargin,
    "ml_logreg_eval_frozen" ->
      """WITH w AS (SELECT doc_id, n_chars, string_split(text, ' ') AS ws
        |           FROM documents),
        |f AS (SELECT doc_id,
        |    ln(1.0 + CAST(n_chars AS DOUBLE)) AS f1,
        |    (CAST(n_chars AS DOUBLE) - (CAST(len(ws) AS DOUBLE) - 1))
        |      / CAST(len(ws) AS DOUBLE) AS f2,
        |    CAST(len(list_filter(ws, t -> t = 'a' OR t = 'the')) AS DOUBLE)
        |      / CAST(len(ws) AS DOUBLE) AS f3,
        |    CAST(len(list_distinct(ws)) AS DOUBLE)
        |      / CAST(len(ws) AS DOUBLE) AS f4
        |  FROM w),
        |e AS (SELECT doc_id,
        |    1.0 * (-16.0) + f1 * 3.0 + f2 * (-1.2) + f3 * 25.0 + f4 * 6.0 AS eta
        |  FROM f),
        |p AS (SELECT doc_id, 1.0 / (1.0 + exp(-eta)) AS mu,
        |    CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE) / 4294967296.0 AS u
        |  FROM e),
        |sc AS (SELECT CASE WHEN u < mu THEN 1 ELSE 0 END AS label,
        |    CASE WHEN round(mu, 6) + 0.0 >= 0.5 THEN 1 ELSE 0 END AS pred
        |  FROM p)
        |SELECT
        |  CAST(sum(CASE WHEN label = 1 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |  CAST(sum(CASE WHEN label = 0 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |  CAST(sum(CASE WHEN label = 0 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
        |  CAST(sum(CASE WHEN label = 1 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(sum(label) AS DOUBLE) / count(*), 6) + 0.0 AS base_rate,
        |  round(CAST(sum(CASE WHEN label = pred THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) + 0.0 AS accuracy
        |FROM sc""".stripMargin,
    "ml_calibration_frozen" ->
      """WITH w AS (SELECT doc_id, n_chars, string_split(text, ' ') AS ws
        |           FROM documents),
        |f AS (SELECT doc_id,
        |    ln(1.0 + CAST(n_chars AS DOUBLE)) AS f1,
        |    (CAST(n_chars AS DOUBLE) - (CAST(len(ws) AS DOUBLE) - 1))
        |      / CAST(len(ws) AS DOUBLE) AS f2,
        |    CAST(len(list_filter(ws, t -> t = 'a' OR t = 'the')) AS DOUBLE)
        |      / CAST(len(ws) AS DOUBLE) AS f3,
        |    CAST(len(list_distinct(ws)) AS DOUBLE)
        |      / CAST(len(ws) AS DOUBLE) AS f4
        |  FROM w),
        |e AS (SELECT doc_id,
        |    1.0 * (-16.0) + f1 * 3.0 + f2 * (-1.2) + f3 * 25.0 + f4 * 6.0 AS eta
        |  FROM f),
        |p AS (SELECT doc_id, 1.0 / (1.0 + exp(-eta)) AS mu,
        |    CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE) / 4294967296.0 AS u
        |  FROM e),
        |sc AS (SELECT CASE WHEN u < mu THEN 1 ELSE 0 END AS label,
        |    round(mu, 6) + 0.0 AS score
        |  FROM p),
        |b AS (SELECT least(CAST(floor(score * 10) AS BIGINT), 9) AS bucket,
        |    label, CAST(round(score * 1e6) AS BIGINT) AS score_e6
        |  FROM sc)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(label) AS BIGINT) AS n_pos,
        |  round(CAST(sum(score_e6) AS DOUBLE) / count(*) / 1e6, 6) + 0.0 AS mean_pred,
        |  round(CAST(sum(label) AS DOUBLE) / count(*), 6) + 0.0 AS obs_rate
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    "ml_linear_fit" ->
      """SELECT p_brand,
        | round(regr_slope(p_retailprice, p_size), 6) + 0.0 AS slope,
        | round(regr_intercept(p_retailprice, p_size), 6) + 0.0 AS intercept,
        | round(regr_r2(p_retailprice, p_size), 6) + 0.0 AS r2,
        | CAST(regr_count(p_retailprice, p_size) AS BIGINT) AS n
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,
  )
}
