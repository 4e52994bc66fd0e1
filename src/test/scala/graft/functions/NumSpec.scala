package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bitwise determinism of [[Num.roundNorm]]: the correctness gate hashes
  * values bit-for-bit, so a `-0.0` emitted where the oracle engine emits
  * `+0.0` fails the hash even though the values compare equal (the round-5
  * `text_pmi_bigrams` failure). These tests craft the tie explicitly.
  */
class NumSpec extends SparkSpec {

  private def rawBits(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)

  "the + 0.0 identity" should "collapse a genuine IEEE -0.0 to the +0.0 bit pattern" in {
    // -1e-300 * 1e-300 underflows to -0.0 (sign bit set, value zero) —
    // the double DuckDB's round() emits for a negative infinitesimal.
    // (Spark's own round goes through BigDecimal, which has no signed
    // zero, so the Spark side never emits -0.0 — the helper exists to
    // keep BOTH engine sides of every oracle pair normalized.)
    val produced = col("p")
    val Seq(plain, normed) = spark.range(1)
      .select((lit(-1.0e-300) * lit(1.0e-300)).as("p"))
      .select(produced.as("raw"), (produced + lit(0.0)).as("n"))
      .collect()(0).toSeq.map(_.asInstanceOf[Double]).toSeq
    rawBits(plain) shouldBe java.lang.Double.doubleToRawLongBits(-0.0) // hazard is real
    rawBits(normed) shouldBe 0L                                       // +0.0 exactly
  }

  "roundNorm" should "emit the +0.0 bit pattern for a negative infinitesimal" in {
    val normed = spark.range(1)
      .select(Num.roundNorm(lit(-1.0e-9), 4).as("n"))
      .collect()(0).getDouble(0)
    rawBits(normed) shouldBe 0L
  }

  it should "leave every other double bit-identical (incl. negatives and ±0-adjacent)" in {
    val cases = Seq(-3.14159, -0.00006, 0.0, 0.00004, 2.5, 1e12)
    val row = spark.range(1)
      .select(cases.zipWithIndex.flatMap { case (v, i) =>
        Seq(round(lit(v), 4).as(s"p$i"), Num.roundNorm(lit(v), 4).as(s"n$i"))
      }: _*)
      .collect()(0)
    cases.indices.foreach { i =>
      val p = row.getAs[Double](s"p$i")
      val n = row.getAs[Double](s"n$i")
      withClue(s"case ${cases(i)}: ") { rawBits(n) shouldBe rawBits(p) }
    }
  }
}
