package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GramAggregator
import graft.io.Sources

/** Matrix decomposition over the `embeddings` table: the population
  * covariance matrix and PCA (principal directions, explained variance,
  * and the low-dimensional projection a curation pipeline visualizes or
  * clusters on).
  *
  * Scale split: the corpus-sized work is ONE distributed pass — the
  * [[graft.functions.GramAggregator]] moment sketch (d + d(d+1)/2
  * doubles per partition, map-side combined). Everything downstream
  * (covariance assembly, power iteration, component tables) operates on
  * that model-sized object driver-side, exactly like a trained k-means
  * model; the projection then broadcasts the d×k component matrix back
  * as literals and runs as a pure map-side codegen'd expression.
  * At 100 TB nothing here shuffles corpus rows.
  */
object Decomp {

  private val dim = 64

  /** Moment sketches memoized per (fixture path, shift) (immutable data —
    * a mutating deployment would key on a snapshot id, as with
    * [[graft.io.CorpusStats]]). Bounded: one 2 144-double array per entry,
    * two entries per path (raw pass for means, centered pass).
    */
  private val gramCache = new ConcurrentHashMap[String, (Long, Array[Double], Array[Double])]()

  private def gramStats(s: SparkSession, d: String, shift: Array[Double] = Array.empty)
      : (Long, Array[Double], Array[Double]) =
    gramCache.computeIfAbsent(s"$d|${shift.length}", _ => {
      val r = Sources.embeddings(s, d)
        .agg(GramAggregator.gram(dim, shift)(col("embedding")).as("m"))
        .select(col("m.n"), col("m.s"), col("m.g"))
        .head()
      (r.getLong(0), r.getSeq[Double](1).toArray, r.getSeq[Double](2).toArray)
    })

  /** Population covariance matrix (dense d×d), computed in the
    * numerically stable TWO-PASS form: a first moment pass yields the
    * per-dimension means, a second pass accumulates CENTERED moments
    * Σ(x−μ)(y−μ) (the shift rides into [[GramAggregator]]), and
    * cov(i,j) = E[(x−μx)(y−μy)] − E[x−μx]·E[y−μy] (the residual term is
    * ~0 but kept for exactness). The raw one-pass E[xy] − E[x]E[y] form
    * cancels catastrophically when |μ| dominates the covariance, leaving
    * ~1e-12 engine-dependent noise that can flip a 6-decimal rounding
    * boundary against the oracle's stable `covar_pop`; the centered form
    * agrees with it to machine precision. Still two linear corpus passes,
    * one d²-sized buffer per partition each.
    */
  private[ops] def covMatrix(s: SparkSession, d: String): Array[Array[Double]] = {
    val (n0, sums, _) = gramStats(s, d)
    val mean = sums.map(_ / n0)
    val (n, cs, cg) = gramStats(s, d, mean)
    val cmean = cs.map(_ / n)
    Array.tabulate(dim, dim) { (i, j) =>
      val (lo, hi) = if (i <= j) (i, j) else (j, i)
      cg(GramAggregator.triIdx(dim, lo, hi)) / n - cmean(lo) * cmean(hi)
    }
  }

  private def roundHalfUp(v: Double, scale: Int): Double =
    BigDecimal(v).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0

  /** Upper-triangle covariance entries (i ≤ j), rounded at 6 decimals —
    * the oracle-checkable anchor for the whole moment pipeline (DuckDB
    * recomputes each entry with `covar_pop` over an unnested self-join).
    * The d(d+1)/2 = 2 080 output rows are assembled driver-side from the
    * collected sketch: model-sized output from a model-sized object.
    */
  def covariance(s: SparkSession, d: String): DataFrame = {
    val cov = covMatrix(s, d)
    val rows = for (i <- 0 until dim; j <- i until dim)
      yield (i.toLong, j.toLong, roundHalfUp(cov(i)(j), 6))
    s.createDataFrame(rows).toDF("i", "j", "cov").orderBy("i", "j")
  }

  /** Top-k eigenpairs of a symmetric PSD matrix by power iteration with
    * deflation. Deterministic: init is the basis vector of the largest
    * diagonal entry (lowest index on ties), fixed tolerance, and a sign
    * convention (largest-|loading| coordinate positive, lowest index on
    * ties). O(k · iters · d²) driver-side flops on the d×d model.
    */
  private[ops] def powerEigen(m: Array[Array[Double]], k: Int): (Array[Double], Array[Array[Double]]) = {
    val a = m.map(_.clone())
    val values = Array.ofDim[Double](k)
    val vectors = Array.ofDim[Array[Double]](k)
    for (c <- 0 until k) {
      var v = Array.ofDim[Double](dim)
      v((0 until dim).maxBy(i => a(i)(i) - 1e-18 * i)) = 1.0
      var lambda = 0.0
      var iter = 0
      var delta = Double.MaxValue
      while (iter < 500 && delta > 1e-14) {
        val av = Array.tabulate(dim)(i => {
          var acc = 0.0; var j = 0
          while (j < dim) { acc += a(i)(j) * v(j); j += 1 }
          acc
        })
        val norm = math.sqrt(av.map(x => x * x).sum)
        if (norm == 0.0) { delta = 0.0 }
        else {
          val nv = av.map(_ / norm)
          delta = math.abs(norm - lambda)
          lambda = norm
          v = nv
          iter += 1
        }
      }
      // sign convention: largest-|x| coordinate positive (lowest index wins ties)
      val pivot = (0 until dim).maxBy(i => (math.abs(v(i)), -i))
      if (v(pivot) < 0) v = v.map(-_)
      values(c) = lambda
      vectors(c) = v
      // deflate: a ← a − λ v vᵀ
      for (i <- 0 until dim; j <- 0 until dim) a(i)(j) -= lambda * v(i) * v(j)
    }
    (values, vectors)
  }

  private val pcaK = 8

  /** PCA scree table: top-8 eigenvalues of the embedding covariance with
    * explained-variance and cumulative ratios (denominator = trace, the
    * total variance). Rows-only by contract: eigensolving is not
    * SQL-expressible; DecompSpec certifies the eigenpairs against the
    * defining identities (residual, orthonormality, trace bound).
    */
  def pcaVariance(s: SparkSession, d: String): DataFrame = {
    val cov = covMatrix(s, d)
    val trace = (0 until dim).map(i => cov(i)(i)).sum
    val (values, _) = powerEigen(cov, pcaK)
    var cum = 0.0
    val rows = values.zipWithIndex.map { case (v, i) =>
      cum += v
      (i + 1L, roundHalfUp(v, 6), roundHalfUp(v / trace, 6), roundHalfUp(cum / trace, 6))
    }
    s.createDataFrame(rows.toSeq)
      .toDF("component", "eigenvalue", "explained_ratio", "cum_ratio")
      .orderBy("component")
  }

  /** Projection of every embedding onto the top-2 principal directions.
    * The component matrix rides into the plan as array literals, so the
    * projection is a map-side codegen'd dot product per component — no
    * join, no shuffle, the same literal-model dispatch as small-k IVF
    * assignment ([[Similarity]]). Rows-only by contract (components are
    * not SQL-derivable); DecompSpec checks the projected variance
    * against the eigenvalues.
    */
  def pcaProject(s: SparkSession, d: String): DataFrame = {
    val (_, vectors) = powerEigen(covMatrix(s, d), 2)
    val Seq(p1, p2) = Seq(0, 1).map(c => lit(vectors(c)))
    Sources.embeddings(s, d)
      .select(col("vec_id"),
        graft.functions.Num.roundNorm(Similarity.dot(col("embedding"), p1), 4).as("pc1"),
        graft.functions.Num.roundNorm(Similarity.dot(col("embedding"), p2), 4).as("pc2"))
      .orderBy("vec_id")
  }

  /** Frozen-basis projection (`sim_project_frozen`) — the hash-checked
    * twin of [[pcaProject]]'s plan shape, with a PUBLISHED basis instead
    * of the trained one (the same move as the frozen-weight logreg
    * twins): two fixed integer directions c1[i] = (7i+3)%17 − 8,
    * c2[i] = (5i+11)%19 − 9 — a deterministic random-projection
    * (Johnson–Lindenstrauss-style) basis, the standard cheap
    * dimensionality reduction a curation pipeline runs before
    * clustering. Computed over the 1e4-quantized embedding lattice
    * ([[Similarity.quantEmb]]) so every product and sum is an exact
    * BIGINT both engines share. Identical 100 TB shape: basis literals
    * ride the closure, the scan is one map-side codegen'd HOF
    * projection — no join, no shuffle; only the trained-eigenbasis
    * path stays rows-only (DecompSpec certifies it by property).
    */
  def projectFrozen(s: SparkSession, d: String): DataFrame = {
    val c1 = Array.tabulate(dim)(i => ((7L * i + 3) % 17) - 8)
    val c2 = Array.tabulate(dim)(i => ((5L * i + 11) % 19) - 9)
    def dotQ(basis: Array[Long]): Column =
      aggregate(zip_with(col("qv"), lit(basis), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v)
    Similarity.quantEmb(s, d)
      .select(col("vec_id"), dotQ(c1).as("p1_q"), dotQ(c2).as("p2_q"))
      .orderBy("vec_id")
  }

  // ---- frozen-basis PCA twins (r12, verdict task 5) -----------------
  //
  // [[pcaProject]]/[[pcaVariance]] stay rows-only by contract (the
  // eigensolve is not SQL-expressible), so — the frozen-weight-logreg
  // move — these twins run the IDENTICAL two-pass PCA plan shape
  // (corpus stats pass → broadcast model → map-side projection) with a
  // PUBLISHED integer basis, putting the centering, projection,
  // explained-variance and trace arithmetic under the DuckDB hash gate.
  // Everything is exact BIGINT on the 1e4 embedding lattice
  // ([[Similarity.quantEmb]]); the only doubles are the final rounded
  // outputs of the variance query, computed from identical integers in
  // an identical operation order in both engines.

  private val frozenC1 = Array.tabulate(dim)(i => ((7L * i + 3) % 17) - 8)
  private val frozenC2 = Array.tabulate(dim)(i => ((5L * i + 11) % 19) - 9)

  private def dotQ(basis: Array[Long]): Column =
    aggregate(zip_with(col("qv"), lit(basis), (x, y) => x * y),
      lit(0L), (acc, v) => acc + v)

  /** Exact lattice projection stats — n, ΣD, ΣD² per frozen direction
    * plus the per-dimension (Σx, Σx²) trace ingredients — one corpus
    * aggregate each, collected as a model-sized handful of longs and
    * memoized per fixture. The n·ΣD² products downstream exceed Long
    * range (≈4e19 at sf0.1), so consumers combine these in BigInt; the
    * oracle's HUGEINT accumulation mirrors that exactly.
    */
  private val frozenStatsCache =
    new ConcurrentHashMap[String, (Long, Long, Long, Long, Long, BigInt)]()

  private def frozenStats(s: SparkSession, d: String): (Long, Long, Long, Long, Long, BigInt) =
    frozenStatsCache.computeIfAbsent(d, _ => {
      val q = Similarity.quantEmb(s, d)
      val r = q.select(dotQ(frozenC1).as("d1"), dotQ(frozenC2).as("d2"))
        .agg(count(lit(1)).as("n"), sum("d1").as("s1"), sum("d2").as("s2"),
          sum(col("d1") * col("d1")).as("s11"), sum(col("d2") * col("d2")).as("s22"))
        .head()
      val (n, s1, s2, s11, s22) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      // lattice trace (scaled by n²): Σ_i (n·Σx² − (Σx)²)
      val dims = q.select(posexplode(col("qv")).as(Seq("i", "x")))
        .groupBy("i").agg(sum("x").as("sx"), sum(col("x") * col("x")).as("sxx"))
        .collect()
      val t = dims.map(row =>
        BigInt(n) * row.getLong(2) - BigInt(row.getLong(1)) * row.getLong(1)).sum
      (n, s1, s2, s11, s22, t)
    })

  /** Centered frozen-basis projection (`sim_pca_project_frozen`): every
    * vector's exact CENTERED coordinates along the published basis,
    * scaled by n to stay on the integer lattice — p·n = n·(qv·c) −
    * Σ(qv·c). The mean never materializes as a rational: the corpus dot
    * sums ride the closure as two Long constants, so the scan is one
    * map-side codegen'd fold per direction (the [[pcaProject]] shape —
    * broadcast model, no join, no shuffle) and both engines emit
    * bit-identical BIGINTs.
    */
  def pcaProjectFrozen(s: SparkSession, d: String): DataFrame = {
    val (n, s1, s2, _, _, _) = frozenStats(s, d)
    Similarity.quantEmb(s, d)
      .select(col("vec_id"),
        (dotQ(frozenC1) * lit(n) - lit(s1)).as("p1_cn"),
        (dotQ(frozenC2) * lit(n) - lit(s2)).as("p2_cn"))
      .orderBy("vec_id")
  }

  private val frozenNormSq1: Long = frozenC1.map(c => c * c).sum
  private val frozenNormSq2: Long = frozenC2.map(c => c * c).sum

  /** Frozen-basis scree table (`sim_pca_variance_frozen`): population
    * variance of the corpus along each published direction (unit-
    * normalized, in original embedding units) and its share of the
    * total variance (trace) — [[pcaVariance]]'s output contract with
    * the eigenbasis swapped for the frozen one. All moments are exact
    * lattice integers (BigInt where n·ΣD² exceeds Long); the two final
    * doubles divide those integers in the same order as the oracle SQL
    * (`/n /n /1e8 /‖c‖²` and `/‖c‖² /T`), so both engines round the
    * same IEEE values. Model-sized output (2 rows) from model-sized
    * stats — the corpus pays two aggregate passes, nothing else.
    */
  def pcaVarianceFrozen(s: SparkSession, d: String): DataFrame = {
    val (n, s1, s2, s11, s22, t) = frozenStats(s, d)
    def varRow(comp: Long, sd: Long, sdd: Long, normSq: Long): (Long, Double, Double) = {
      val u = (BigInt(n) * sdd - BigInt(sd) * sd).toDouble
      val varAlong = roundHalfUp(u / n / n / 1e8 / normSq, 6)
      val ratio = roundHalfUp(u / normSq / t.toDouble, 6)
      (comp, varAlong, ratio)
    }
    s.createDataFrame(Seq(
      varRow(1L, s1, s11, frozenNormSq1),
      varRow(2L, s2, s22, frozenNormSq2)))
      .toDF("component", "var_along", "ratio_of_trace")
      .orderBy("component")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_covariance" -> (covariance _),
    "sim_pca_variance" -> (pcaVariance _),
    "sim_pca_project" -> (pcaProject _),
    "sim_project_frozen" -> (projectFrozen _),
    "sim_pca_project_frozen" -> (pcaProjectFrozen _),
    "sim_pca_variance_frozen" -> (pcaVarianceFrozen _),
  )

  val oracles: Map[String, String] = Map(
    "sim_covariance" ->
      """WITH el AS (
        |  SELECT vec_id, t.i, embedding[t.i + 1] AS x
        |  FROM embeddings, range(0, 64) t(i)
        |)
        |SELECT a.i AS i, b.i AS j,
        |  round(covar_pop(a.x, b.x), 6) + 0.0 AS cov
        |FROM el a JOIN el b ON a.vec_id = b.vec_id AND a.i <= b.i
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "sim_project_frozen" ->
      """WITH e AS (SELECT vec_id,
        |   list_transform(embedding,
        |     x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
        |  FROM embeddings),
        | eu AS (SELECT vec_id, generate_subscripts(qv, 1) AS i, unnest(qv) AS x
        |   FROM e)
        |SELECT vec_id,
        | CAST(sum(x * ((7 * (i - 1) + 3) % 17 - 8)) AS BIGINT) AS p1_q,
        | CAST(sum(x * ((5 * (i - 1) + 11) % 19 - 9)) AS BIGINT) AS p2_q
        |FROM eu GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    "sim_pca_project_frozen" ->
      """WITH e AS (SELECT vec_id,
        |   list_transform(embedding,
        |     x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
        |  FROM embeddings),
        | eu AS (SELECT vec_id, generate_subscripts(qv, 1) AS i, unnest(qv) AS x
        |   FROM e),
        | dots AS (SELECT vec_id,
        |    CAST(sum(x * ((7 * (i - 1) + 3) % 17 - 8)) AS BIGINT) AS d1,
        |    CAST(sum(x * ((5 * (i - 1) + 11) % 19 - 9)) AS BIGINT) AS d2
        |   FROM eu GROUP BY vec_id),
        | ag AS (SELECT CAST(count(*) AS BIGINT) AS nn,
        |    CAST(sum(d1) AS BIGINT) AS s1, CAST(sum(d2) AS BIGINT) AS s2
        |   FROM dots)
        |SELECT vec_id, nn * d1 - s1 AS p1_cn, nn * d2 - s2 AS p2_cn
        |FROM dots, ag ORDER BY vec_id""".stripMargin,
    "sim_pca_variance_frozen" ->
      """WITH e AS (SELECT vec_id,
        |   list_transform(embedding,
        |     x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
        |  FROM embeddings),
        | eu AS (SELECT vec_id, generate_subscripts(qv, 1) AS i, unnest(qv) AS x
        |   FROM e),
        | dots AS (SELECT vec_id,
        |    CAST(sum(x * ((7 * (i - 1) + 3) % 17 - 8)) AS BIGINT) AS d1,
        |    CAST(sum(x * ((5 * (i - 1) + 11) % 19 - 9)) AS BIGINT) AS d2
        |   FROM eu GROUP BY vec_id),
        | ag AS (SELECT CAST(count(*) AS BIGINT) AS nn,
        |    CAST(sum(d1) AS BIGINT) AS s1, CAST(sum(d2) AS BIGINT) AS s2,
        |    sum(d1::HUGEINT * d1) AS s11, sum(d2::HUGEINT * d2) AS s22
        |   FROM dots),
        | ds AS (SELECT i, CAST(sum(x) AS BIGINT) AS sx, sum(x::HUGEINT * x) AS sxx
        |   FROM eu GROUP BY i),
        | tr AS (SELECT sum((SELECT nn FROM ag)::HUGEINT * sxx - sx::HUGEINT * sx)
        |   AS t FROM ds)
        |SELECT * FROM (
        | SELECT CAST(1 AS BIGINT) AS component,
        |  round((nn::HUGEINT * s11 - s1::HUGEINT * s1)::DOUBLE
        |    / nn / nn / 1e8 / 1538, 6) + 0.0 AS var_along,
        |  round((nn::HUGEINT * s11 - s1::HUGEINT * s1)::DOUBLE
        |    / 1538 / t::DOUBLE, 6) + 0.0 AS ratio_of_trace
        | FROM ag, tr
        | UNION ALL
        | SELECT CAST(2 AS BIGINT),
        |  round((nn::HUGEINT * s22 - s2::HUGEINT * s2)::DOUBLE
        |    / nn / nn / 1e8 / 1925, 6) + 0.0,
        |  round((nn::HUGEINT * s22 - s2::HUGEINT * s2)::DOUBLE
        |    / 1925 / t::DOUBLE, 6) + 0.0
        | FROM ag, tr)
        |ORDER BY component""".stripMargin,
  )
}
