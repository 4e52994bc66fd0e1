package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {

  private def deinterleave(z: Long): (Long, Long) = {
    def compact(v0: Long): Long = {
      var x = v0 & 0x5555555555555555L
      x = (x | (x >> 1)) & 0x3333333333333333L
      x = (x | (x >> 2)) & 0x0F0F0F0F0F0F0F0FL
      x = (x | (x >> 4)) & 0x00FF00FF00FF00FFL
      x = (x | (x >> 8)) & 0x0000FFFF0000FFFFL
      (x | (x >> 16)) & 0x00000000FFFFFFFFL
    }
    (compact(z), compact(z >> 1))
  }

  "zorderKey" should "roundtrip through deinterleave for the full 31-bit range" in {
    val rnd = new scala.util.Random(42)
    val cases = Seq((0L, 0L), (0x7FFFFFFFL, 0x7FFFFFFFL), (1L, 0x7FFFFFFFL)) ++
      Seq.fill(200)((rnd.nextInt(Int.MaxValue).toLong, rnd.nextInt(Int.MaxValue).toLong))
    cases.foreach { case (a, b) =>
      deinterleave(Layout.zorderKeyLocal(a, b)) shouldBe ((a, b))
    }
  }

  it should "agree between the column expression and the local twin" in {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val in = Seq.fill(500)((rnd.nextInt(Int.MaxValue).toLong, rnd.nextInt(Int.MaxValue).toLong))
    val got = in.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zorderKey(col("a"), col("b")).as("z"))
      .collect()
    got.foreach { r =>
      r.getLong(2) shouldBe Layout.zorderKeyLocal(r.getLong(0), r.getLong(1))
    }
  }

  "zorderSpans" should "keep BOTH dimension spans tight relative to the corpus" in {
    // the pruning property the layout exists for: mean per-bucket span
    // well under the global span on BOTH dimensions (a single-column
    // sort keeps one tight and one corpus-wide)
    val spans = Layout.zorderSpans(spark, sfDir).collect()
    spans.length should be <= 64
    val ckGlobal = spans.map(_.getAs[Long]("ck_max")).max - spans.map(_.getAs[Long]("ck_min")).min
    val dyGlobal = spans.map(_.getAs[Long]("dy_max")).max - spans.map(_.getAs[Long]("dy_min")).min
    val meanCk = spans.map(_.getAs[Long]("ck_span")).sum.toDouble / spans.length
    val meanDy = spans.map(_.getAs[Long]("dy_span")).sum.toDouble / spans.length
    // measured ~11% of global on the fixtures; assert a loose 40% bound
    meanCk should be < ckGlobal * 0.4
    meanDy should be < dyGlobal * 0.4
  }
}
