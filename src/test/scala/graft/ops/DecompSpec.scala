package graft.ops

import graft.SparkSpec

/** Decomposition operators: the covariance sketch against a brute-force
  * recomputation, and the PCA eigenpairs against their defining
  * identities (residual, orthonormality, trace, projected variance).
  */
class DecompSpec extends SparkSpec {

  private val dim = 64

  private lazy val vectors: Array[Array[Double]] =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)

  private lazy val bruteCov: Array[Array[Double]] = {
    val n = vectors.length.toDouble
    val mean = Array.tabulate(dim)(i => vectors.map(_(i)).sum / n)
    Array.tabulate(dim, dim)((i, j) =>
      vectors.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n)
  }

  "Decomp.covariance" should "match the brute-force population covariance" in {
    val got = Decomp.covariance(spark, sfDir).collect()
      .map(r => ((r.getLong(0).toInt, r.getLong(1).toInt), r.getDouble(2))).toMap
    got should have size (dim * (dim + 1) / 2).toLong

    got.foreach { case ((i, j), cov) =>
      // rounded at 6; the one-pass moment formula may differ from the
      // two-pass centered sum by float-order noise only
      math.abs(cov - bruteCov(i)(j)) should be <= 1.0e-6 + 1e-9
    }
  }

  "Decomp.powerEigen" should "produce orthonormal eigenpairs with small residual" in {
    val cov = Decomp.covMatrix(spark, sfDir)
    val (values, vecs) = Decomp.powerEigen(cov, 8)

    // eigenvalues: nonnegative, nonincreasing (PSD covariance)
    values.foreach(_ should be >= 0.0)
    values.sliding(2).foreach { case Array(a, b) => b should be <= a + 1e-6; case _ => }

    // trace bound: top-8 cannot exceed total variance
    val trace = (0 until dim).map(i => cov(i)(i)).sum
    values.sum should be <= trace + 1e-9

    val lmax = values.head
    for (c <- 0 until 8) {
      val v = vecs(c)
      // unit norm
      math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) should be <= 1e-9
      // eigen residual ||Cv - λv|| small relative to the top eigenvalue
      // (spectrum is near-isotropic, so convergence is tolerance-bound)
      val av = Array.tabulate(dim)(i => (0 until dim).map(j => cov(i)(j) * v(j)).sum)
      val res = math.sqrt(av.zip(v).map { case (a, x) => (a - values(c) * x) * (a - values(c) * x) }.sum)
      res should be <= 5e-3 * lmax
      // sign convention: largest-|loading| coordinate is positive
      v((0 until dim).maxBy(i => (math.abs(v(i)), -i))) should be > 0.0
      // pairwise orthogonality
      for (c2 <- 0 until c) {
        math.abs(v.zip(vecs(c2)).map { case (a, b) => a * b }.sum) should be <= 5e-3
      }
    }
  }

  "Decomp.pcaVariance" should "report ratios consistent with its eigenvalues" in {
    val rows = Decomp.pcaVariance(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    rows.map(_._1).toSeq shouldBe (1L to 8L)

    val cov = Decomp.covMatrix(spark, sfDir)
    val trace = (0 until dim).map(i => cov(i)(i)).sum
    val (values, _) = Decomp.powerEigen(cov, 8)
    var cum = 0.0
    rows.zip(values).foreach { case ((_, ev, ratio, cumRatio), lambda) =>
      cum += lambda
      math.abs(ev - lambda) should be <= 1e-6
      math.abs(ratio - lambda / trace) should be <= 1e-6
      math.abs(cumRatio - cum / trace) should be <= 1e-6
    }
    rows.last._4 should be < 1.0 // 8 of 64 near-isotropic dims
  }

  "Decomp.pcaProject" should "carry variance equal to the top eigenvalues" in {
    val rows = Decomp.pcaProject(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    rows.length shouldBe vectors.length
    rows.map(_._1).toSeq shouldBe rows.map(_._1).toSeq.sorted

    val cov = Decomp.covMatrix(spark, sfDir)
    val (values, _) = Decomp.powerEigen(cov, 2)
    def popVar(xs: Array[Double]): Double = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / xs.length
    }
    math.abs(popVar(rows.map(_._2)) - values(0)) should be <= 1e-4
    math.abs(popVar(rows.map(_._3)) - values(1)) should be <= 1e-4
  }
}
