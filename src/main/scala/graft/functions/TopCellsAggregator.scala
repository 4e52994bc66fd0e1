package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.Encoder

/** One (cell, score) candidate; field names are the public `cells` schema
  * (`array<struct<cs,cent_id>>`) shared with the literal assignment path.
  */
case class CellScore(cs: Double, cent_id: Int)

/** Bounded top-`nprobe` selection by (cs desc, cent_id asc) as a typed
  * `Aggregator` — the argmin/arg-top-n aggregate behind the large-k cell
  * assignment path ([[graft.ops.Similarity]]).
  *
  * Scale shape: the buffer holds at most `nprobe` entries (nprobe is 1-2
  * in practice), so map-side partial aggregation reduces the k scored
  * rows per vector to one bounded buffer before anything shuffles —
  * unlike a `collect_list`-then-sort form, whose buffer grows with k and
  * whose shuffle carries all k candidates. Ordering matches the literal
  * path's `array_sort` comparator exactly (cosine desc, cent_id asc on
  * ties) so the two assignment paths are bit-identical.
  */
class TopCellsAggregator(nprobe: Int)
    extends Aggregator[CellScore, Seq[CellScore], Seq[CellScore]] {

  /** Spark SQL's total order for doubles, so the two assignment paths
    * agree even on NaN scores (NaN-element embeddings): NaN = NaN and
    * NaN ranks above every other value, -0.0 = 0.0 — the semantics the
    * literal path's comparator inherits from Catalyst's `>`/`<`.
    */
  private def better(a: CellScore, b: CellScore): Boolean = {
    val tie = a.cs == b.cs || (a.cs.isNaN && b.cs.isNaN)
    if (tie) a.cent_id < b.cent_id
    else a.cs > b.cs || a.cs.isNaN
  }

  /** Insert into a best-first sorted buffer, keeping at most nprobe. */
  private def insert(buf: Seq[CellScore], v: CellScore): Seq[CellScore] =
    if (buf.length == nprobe && better(buf.last, v)) buf
    else {
      val (pre, post) = buf.span(better(_, v))
      (pre ++ (v +: post)).take(nprobe)
    }

  override def zero: Seq[CellScore] = Seq.empty

  override def reduce(b: Seq[CellScore], v: CellScore): Seq[CellScore] = insert(b, v)

  override def merge(a: Seq[CellScore], b: Seq[CellScore]): Seq[CellScore] =
    b.foldLeft(a)(insert)

  override def finish(r: Seq[CellScore]): Seq[CellScore] = r

  override def bufferEncoder: Encoder[Seq[CellScore]] = ExpressionEncoder[Seq[CellScore]]()
  override def outputEncoder: Encoder[Seq[CellScore]] = ExpressionEncoder[Seq[CellScore]]()
}

object TopCellsAggregator {
  /** Column-usable UDAF: `topCells(n)(col("cs"), col("cent_id"))`. */
  def topCells(nprobe: Int): UserDefinedFunction =
    udaf(new TopCellsAggregator(nprobe))
}
