package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.Encoder

/** Raw second-moment statistics of a vector column: row count, per-dim
  * sums, and the upper triangle of Σ x·xᵀ (row-major: (0,0)…(0,d-1),
  * (1,1)…, so idx(i,j) = i·d − i(i−1)/2 + (j−i)).
  */
case class GramStats(n: Long, s: Array[Double], g: Array[Double])

/** One-pass distributed Gram/covariance moments (the input PCA and any
  * covariance analysis need): a typed `Aggregator` whose buffer is the
  * d + d(d+1)/2 moment state, combined map-side and merged pairwise.
  *
  * This is the scale-correct shape for covariance over 100 TB of
  * vectors: the corpus is streamed exactly once and the only shuffled
  * payload is one fixed-size (d²) buffer per partition — versus the
  * oracle-checkable explode+self-join form, which shuffles |corpus|·d
  * rows and materializes |corpus|·d² join outputs. The resulting moment
  * vector is model-sized (for d=64: 2 144 doubles), so collecting it
  * driver-side is a bounded 1-row fetch, same class as a trained
  * k-means model.
  *
  * An optional per-dimension `shift` (broadcast with the aggregator,
  * d doubles) is subtracted from every value before accumulation. A
  * second pass shifted by the first pass's means turns the raw moments
  * into CENTERED moments Σ(x−μ)(y−μ) — the numerically stable
  * covariance form, free of the catastrophic cancellation the raw
  * E[xy] − E[x]E[y] difference suffers when |μ| dominates the
  * covariance.
  */
class GramAggregator(dim: Int, shift: Array[Double] = Array.empty)
    extends Aggregator[Array[Float], GramStats, GramStats] {

  private val tri = dim * (dim + 1) / 2
  private val sh: Array[Double] = if (shift.isEmpty) Array.ofDim[Double](dim) else shift

  override def zero: GramStats = GramStats(0L, Array.ofDim[Double](dim), Array.ofDim[Double](tri))

  override def reduce(b: GramStats, v: Array[Float]): GramStats = {
    var i = 0
    var k = 0
    while (i < dim) {
      val xi = v(i).toDouble - sh(i)
      b.s(i) += xi
      var j = i
      while (j < dim) { b.g(k) += xi * (v(j).toDouble - sh(j)); k += 1; j += 1 }
      i += 1
    }
    GramStats(b.n + 1, b.s, b.g)
  }

  override def merge(a: GramStats, b: GramStats): GramStats = {
    var i = 0
    while (i < dim) { a.s(i) += b.s(i); i += 1 }
    var k = 0
    while (k < tri) { a.g(k) += b.g(k); k += 1 }
    GramStats(a.n + b.n, a.s, a.g)
  }

  override def finish(r: GramStats): GramStats = r

  override def bufferEncoder: Encoder[GramStats] = ExpressionEncoder[GramStats]()
  override def outputEncoder: Encoder[GramStats] = ExpressionEncoder[GramStats]()
}

object GramAggregator {
  /** Column-usable UDAF: `gram(64)(col("embedding"))`; pass `shift` (the
    * first pass's means) for the numerically stable centered second pass.
    */
  def gram(dim: Int, shift: Array[Double] = Array.empty): UserDefinedFunction =
    udaf(new GramAggregator(dim, shift))

  /** Flat upper-triangle index of (i, j), i ≤ j. */
  def triIdx(dim: Int, i: Int, j: Int): Int = i * dim - i * (i - 1) / 2 + (j - i)
}
