package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.Encoder

/** One reported heavy hitter: the item and its (under)estimate. */
case class MGEntry(item: String, est: Long)

/** Misra–Gries heavy-hitters sketch as a typed `Aggregator` — the
  * BOUNDED-STATE form of top-k frequency: the exact heavy-hitters query
  * (`text_heavy_hitters`) carries one partial-aggregate row per
  * DISTINCT key, i.e. vocabulary-sized shuffle state; this sketch caps
  * state at k counters PER PARTITION, merges pairwise (the classic
  * mergeable-summaries result: union counts, subtract the (k+1)-th
  * largest, drop ≤ 0), and guarantees, for stream length n:
  *
  *  - every item with true frequency > n/(k+1) survives, and
  *  - every reported estimate lies in [true − n/(k+1), true].
  *
  * Estimates are NOT run-deterministic (merge order shifts them within
  * the error band — inherent to the sketch, so this is a spec-backed
  * component, not an oracle query); the GUARANTEES hold under any
  * partitioning, which is what `MisraGriesSpec` asserts under several
  * repartitionings. At 100 TB this is the difference between shuffling
  * a vocabulary and shuffling k counters per partition.
  *
  * @param k counter budget (report at most k items)
  */
class MisraGriesAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[MGEntry]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c) => b.updated(x, c + 1)
      case None if b.size < k => b.updated(x, 1L)
      case None =>
        // decrement-all: the O(k) step that amortizes to O(1) per item
        b.collect { case (w, c) if c > 1 => w -> (c - 1) }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val m = mutable.Map.from(a)
    b.foreach { case (w, c) => m(w) = m.getOrElse(w, 0L) + c }
    if (m.size <= k) m.toMap
    else {
      // subtract the (k+1)-th largest count, keep strictly-positive
      val thresh = m.values.toSeq.sorted(Ordering[Long].reverse)(k)
      m.collect { case (w, c) if c > thresh => w -> (c - thresh) }.toMap
    }
  }

  override def finish(b: Map[String, Long]): Seq[MGEntry] =
    b.toSeq.sortBy { case (w, c) => (-c, w) }
      .map { case (w, c) => MGEntry(w, c) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[MGEntry]] =
    ExpressionEncoder[Seq[MGEntry]]()
}

object MisraGriesAggregator {
  /** Column-usable UDAF: `heavyHitters(16)(col("word"))`. */
  def heavyHitters(k: Int): UserDefinedFunction =
    udaf(new MisraGriesAggregator(k))
}
