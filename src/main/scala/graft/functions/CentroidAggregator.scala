package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.UserDefinedFunction

/** Mutable aggregation buffer: running per-dimension sums + count. */
case class CentroidBuf(sums: Array[Double], n: Long)

/** Custom typed aggregate (SURVEY §2.5: "the one place a custom aggregate
  * is plausibly needed"): the element-wise mean of a vector column,
  * computed as a single-pass typed `Aggregator` with map-side partial
  * aggregation — the scalable form of a centroid (one fixed-size buffer
  * per group per partition, merged pairwise; no row explosion).
  *
  * Contrast with the oracle-checkable posexplode+avg form
  * ([[graft.ops.Similarity.centroidByLabel]]): that shuffles `dim` rows
  * per vector; this shuffles one buffer per group per partition.
  *
  * @param dim number of leading dimensions to aggregate
  */
class CentroidAggregator(dim: Int) extends Aggregator[Array[Float], CentroidBuf, Array[Double]] {

  override def zero: CentroidBuf = CentroidBuf(Array.ofDim[Double](dim), 0L)

  override def reduce(b: CentroidBuf, v: Array[Float]): CentroidBuf = {
    val n = math.min(dim, v.length)
    var i = 0
    while (i < n) { b.sums(i) += v(i); i += 1 }
    CentroidBuf(b.sums, b.n + 1)
  }

  override def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf = {
    var i = 0
    while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
    CentroidBuf(a.sums, a.n + b.n)
  }

  override def finish(r: CentroidBuf): Array[Double] =
    if (r.n == 0) Array.ofDim[Double](dim) else r.sums.map(_ / r.n)

  override def bufferEncoder: Encoder[CentroidBuf] = ExpressionEncoder[CentroidBuf]()
  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}

object CentroidAggregator {
  /** Column-usable UDAF: `centroid(col("embedding"))`. */
  def centroid(dim: Int): UserDefinedFunction =
    udaf(new CentroidAggregator(dim))
}
