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

  /** Textbook xy2d (Wikipedia/Hamilton), written as the imperative loop
    * — independent of the generated SQL stage chain under test.
    */
  private def hilbertRef(x0: Long, y0: Long): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = 128L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  "Layout.hilbertCompare" should "replay run counts and point censuses from the reference xy2d" in {
    val cellIdx = for {
      x <- 40L to 103L; y <- 20L to 83L
    } yield (hilbertRef(x, y), Layout.zorderKeyLocal(x, y))
    def runs(ds: Seq[Long]): Long = {
      val set = ds.toSet
      ds.count(v => !set(v - 1)).toLong
    }
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey").collect().map(_.getLong(0))
    val pts = cust.map { k =>
      val x = ((k * 2654435761L) % 4294967296L) % 256L
      val y = ((k * 2246822519L) % 4294967296L) % 256L
      (x, y)
    }.filter(p => p._1 >= 40 && p._1 <= 103 && p._2 >= 20 && p._2 <= 83)
    def armOf(curve: String, cellOf: ((Long, Long)) => Long,
        ptOf: ((Long, Long)) => Long) = {
      val nc = runs(cellIdx.map(cellOf))
      (curve, 4096L, nc, 4096L * 1000000L / nc, pts.length.toLong,
        pts.map(ptOf).sum)
    }
    val want = Seq(
      armOf("hilbert", _._1, p => hilbertRef(p._1, p._2)),
      armOf("morton", _._2, p => Layout.zorderKeyLocal(p._1, p._2)))
    val got = Layout.hilbertCompare(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    got shouldBe want
    // bijectivity of the reference curve on the full grid sample
    val sub = for (x <- 0L until 16L; y <- 0L until 16L)
      yield hilbertRef(x * 16, y * 16)
    sub.distinct.size shouldBe 256
    // the published claim (Moon et al.): Hilbert shatters a compact
    // rectangle into STRICTLY fewer contiguous runs than Z-order —
    // this is a deterministic property of the 4096-cell grid, not of
    // the data sample
    got.head._3 should be < got.last._3
  }
}
