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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_covariance" -> (covariance _),
    "sim_pca_variance" -> (pcaVariance _),
    "sim_pca_project" -> (pcaProject _),
    "sim_project_frozen" -> (projectFrozen _),
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
  )
}
