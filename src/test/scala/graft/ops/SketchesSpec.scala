package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Sources

/** Certifies the sketch operators against their structural guarantees —
  * the properties that hold by construction, not by fixture luck.
  */
class SketchesSpec extends SparkSpec {

  behavior of "count-min sketch"

  it should "never underestimate (est >= exact for every probed key)" in {
    val rows = Sketches.cmsUsers(spark, sfDir).collect()
    rows.length shouldBe 10
    rows.foreach { r =>
      r.getAs[Long]("cms_est") should be >= r.getAs[Long]("exact_cnt")
      r.getAs[Long]("overest") shouldBe
        r.getAs[Long]("cms_est") - r.getAs[Long]("exact_cnt")
    }
  }

  it should "keep bounded state and conserve mass in every hash row" in {
    val sketch = Sketches.cmsTable(spark, sfDir).collect()
    sketch.length should be <= (4 * 512)
    val total = Sources.events(spark, sfDir).count()
    val perRow = sketch.groupBy(_.getAs[Long]("j")).view.mapValues(_.map(_.getAs[Long]("cnt")).sum)
    perRow.keySet shouldBe Set(0L, 1L, 2L, 3L)
    perRow.values.foreach(_ shouldBe total) // each hash row sees every event once
  }

  behavior of "quantile grid sketch"

  it should "keep day-grain state bounded and conserve total mass" in {
    val daily = Sketches.quantileGridDaily(spark, sfDir).collect()
    val days = daily.map(_.getAs[String]("day")).distinct.length
    daily.length should be <= (days * 64)
    daily.foreach(r => r.getAs[Long]("bucket") should (be >= 0L and be < 64L))
    daily.map(_.getAs[Long]("cnt")).sum shouldBe Sources.events(spark, sfDir).count()
  }

  it should "estimate every quantile within one bucket width of exact" in {
    val bounds = Sources.events(spark, sfDir)
      .agg(min("value").as("lo"), max("value").as("hi")).head()
    val width = (bounds.getAs[Double]("hi") - bounds.getAs[Double]("lo")) / 64.0
    val rows = Sketches.quantileGridMerged(spark, sfDir).collect()
    rows.map(_.getAs[Double]("q")).sorted.toSeq shouldBe Seq(0.5, 0.9, 0.99)
    rows.foreach { r =>
      // the estimate interpolates inside the bucket containing the true
      // quantile, so its error is bounded by the grid resolution
      r.getAs[Double]("abs_err") should be <= width
    }
  }

  behavior of "hyperloglog rollup"

  it should "estimate each day within the lgK=12 error envelope" in {
    val rows = Sketches.hllDailyUsers(spark, sfDir).collect()
    rows should not be empty
    rows.foreach { r =>
      r.getAs[Double]("rel_err") should be <= 0.05
      r.getAs[Long]("est_users") should be > 0L
    }
  }

  "Sketches.joinSizeEst" should "upper-bound the exact join size from sketches alone" in {
    val row = Sketches.joinSizeEst(spark, sfDir).head()
    val (est, exact, over) = (row.getLong(0), row.getLong(1), row.getLong(2))
    over shouldBe est - exact
    est should be >= exact // collisions only ADD cross terms
    // exact replay: per-key count dot product
    val ev = Sources.events(spark, sfDir).groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val or = Sources.orders(spark, sfDir).groupBy("o_custkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact shouldBe ev.map { case (k, n) => n * or.getOrElse(k, 0L) }.sum
  }

  it should "merge day sketches into exactly the whole-corpus sketch" in {
    // union-of-sketches == sketch-of-union: the rollup estimate must be
    // IDENTICAL (not merely close) to sketching all events in one pass
    val direct = Sources.events(spark, sfDir)
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .head().getAs[Long]("est")
    val rolled = Sketches.hllRollup(spark, sfDir).collect()
    rolled.map(_.getAs[Long]("est_users")).sum shouldBe direct // single-month fixture
    rolled.foreach { r =>
      r.getAs[Double]("rel_err") should be <= 0.05
    }
  }

  "Sketches.thetaIntersect" should "replay the KMV trajectory and land near the exact overlap" in {
    val yrs = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_custkey", "CAST(year(o_orderdate) AS LONG) AS yr")
      .filter("yr IN (1995, 1996)").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def side(y: Long): Set[Long] = yrs.filter(_._2 == y).map(_._1).toSet
    val (ca, cb) = (side(1995L), side(1996L))
    def hashes(cs: Set[Long]): Seq[Long] =
      cs.map(c => (c * 2654435761L) % 1048576L).toSeq.distinct.sorted
    val (ha, hb) = (hashes(ca), hashes(cb))
    def thetaOf(h: Seq[Long]): Long = if (h.size >= 64) h(63) else 1048576L
    val theta = math.min(thetaOf(ha), thetaOf(hb))
    val skA = ha.take(64).toSet
    val skB = hb.take(64).toSet
    val below = (skA intersect skB).count(_ < theta).toLong
    val est = below * 1048576L / theta
    val exact = (ca intersect cb).size.toLong
    val row = Sketches.thetaIntersect(spark, sfDir).collect().head
    row.getLong(0) shouldBe 64L
    row.getLong(1) shouldBe theta
    row.getLong(2) shouldBe below
    row.getLong(3) shouldBe est
    row.getLong(4) shouldBe exact
    // KMV at k=64: the estimate must land inside a broad error band
    est.toDouble shouldBe exact.toDouble +- math.max(10.0, exact * 0.6)
  }

  "Sketches.bloomFpr (r13)" should "replay the integer Bloom trajectory" in {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_custkey", "o_orderpriority").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val members = orders.filter(_._2 == "1-URGENT").map(_._1).toSet
    def pos(k: Long, i: Int): Long =
      (((k * 2654435761L + i * 40503L) % 4294967296L) + 4294967296L) % 4294967296L % 4096L
    val bitset = members.flatMap(k => Seq(pos(k, 0), pos(k, 1), pos(k, 2)))
    val probes = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey").collect().map(_.getLong(0)).filterNot(members)
    val falsePos = probes.count { k =>
      Seq(pos(k, 0), pos(k, 1), pos(k, 2)).forall(bitset) }
    val row = Sketches.bloomFpr(spark, sfDir).collect().head
    row.getLong(0) shouldBe members.size.toLong
    row.getLong(1) shouldBe bitset.size.toLong
    row.getLong(2) shouldBe probes.length.toLong
    row.getLong(3) shouldBe falsePos.toLong
    row.getLong(4) shouldBe falsePos.toLong * 1000000L / probes.length
    val b = bitset.size.toLong
    row.getLong(5) shouldBe b * b * b * 1000000L / 68719476736L
    // the filter genuinely discriminates: FPR well below 100% and the
    // fill-rate prediction is in the same decade as the measurement
    row.getLong(4) should be < 500000L
  }

  "Sketches.linearCounting (r13)" should "replay the bit census and the occupancy estimate" in {
    val keys = Sources.events(spark, sfDir)
      .select("user_id").collect().map(_.getLong(0))
    val setBits = keys.map(u => (u * 2654435761L) % 4294967296L % 1024L)
      .distinct.length.toLong
    val z = 1024L - setBits
    val est = math.round(1024.0 * math.log(1024.0 / z))
    val exact = keys.distinct.length.toLong
    val row = Sketches.linearCounting(spark, sfDir).collect().head
    (row.getLong(0), row.getLong(1), row.getLong(2)) shouldBe
      ((1024L, setBits, z))
    row.getLong(3) shouldBe est
    row.getLong(4) shouldBe exact
    row.getLong(5) shouldBe est - exact
    // in the n << m regime LC is tight: within 20% of the truth
    math.abs(est - exact).toDouble should be < math.max(2.0, 0.2 * exact)
  }

  "Sketches.countSketch (r13)" should "replay signed cells and the 3-read median" in {
    val keys = Sources.events(spark, sfDir)
      .select("user_id").collect().map(_.getLong(0))
    val P = 2147483647L
    val as = Seq(1103515245L, 1299709L, 15485863L)
    val bs = Seq(12345L, 7919L, 104729L)
    val sas = Seq(49979687L, 67867967L, 86028121L)
    val sbs = Seq(2750159L, 4256233L, 5800079L)
    def bucket(u: Long, j: Int): Long = ((u % P) * as(j) + bs(j)) % P % 64L
    def sign(u: Long, j: Int): Long = 1L - 2L * (((u % P) * sas(j) + sbs(j)) % P % 2L)
    val cells = scala.collection.mutable.HashMap.empty[(Int, Long), Long]
    keys.foreach { u =>
      (0 until 3).foreach { j =>
        val c = (j, bucket(u, j)); cells(c) = cells.getOrElse(c, 0L) + sign(u, j)
      }
    }
    val exact = keys.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val top10 = exact.toSeq.sortBy(t => (-t._2, t._1)).take(10)
    val want = top10.map { case (u, cnt) =>
      val reads = (0 until 3).map(j => sign(u, j) * cells((j, bucket(u, j))))
      (u, cnt, reads.sorted.apply(1))
    }
    val got = Sketches.countSketch(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got.map(t => (t._1, t._2, t._3)) shouldBe want
    // the estimate is signed-error (unbiased), not overestimate-only:
    // err = est - exact, and the median read lands near the truth
    got.foreach { case (_, cnt, est, err) =>
      err shouldBe est - cnt
      math.abs(err) should be < cnt // heavy hitters dominate their cells
    }
  }

  "Sketches.amsF2" should "replay all 16 sign-hash estimators exactly" in {
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect().flatMap(_.getString(0).split(" ", -1))
    val types = toks.groupBy(identity).map { case (w, xs) =>
      (w, xs.length.toLong)
    }.toSeq
    val f2 = types.map(t => t._2 * t._2).sum
    def wh(w: String): Long =
      (1 to 12).foldLeft(0L) { (acc, i) =>
        val c = if (i <= w.length) w.charAt(i - 1).toLong else 0L
        (acc * 31 + c) % 1000000007L
      }
    val want = (0L to 15L).map { h =>
      val z = types.map { case (w, f) =>
        val sgn =
          if ((wh(w) % 1048576L * (h * 2 + 3) * 2654435761L) % 4294967296L
            < 2147483648L) 1L else -1L
        f * sgn
      }.sum
      (h, z, z * z, f2, z * z * 1000000L / f2)
    }
    val got = Sketches.amsF2(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    got shouldBe want
    // AMS unbiasedness: the mean of 16 estimators lands within the
    // variance envelope (Var(Z^2) <= 2 F2^2 per estimator, so the mean
    // of 16 has relative sd <= sqrt(2)/4 ~ 0.35; 4 sds of slack)
    val mean = got.map(_._3).sum.toDouble / 16.0
    mean should be > (f2.toDouble * 0.1)
    mean should be < (f2.toDouble * 3.0)
  }

  "Stats.aucDelong" should "match a brute-force placement-variance replay" in {
    val rows = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_totalprice").collect()
      .map { r =>
        val cents = math.round(r.getDouble(1) * 100)
        val u = ((r.getLong(0) * 2654435761L) % 4294967296L) % 1000000L
        (cents, if (u < math.min(100000L + cents / 100, 900000L)) 1 else 0)
      }
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    val (p, n) = (pos.length.toLong, neg.length.toLong)
    // per-positive placements on the x(2N) lattice, brute force
    val u10 = pos.map(x => 2L * neg.count(_ < x) + neg.count(_ == x).toLong)
    val w01 = neg.map(x => 2L * pos.count(_ < x) + pos.count(_ == x).toLong)
    def varOf(v: Seq[Long], m: Long, scale: Long): Double = {
      val s1 = v.sum
      val s2 = v.map(x => x * x).sum
      (s2.toDouble / m - (s1.toDouble / m) * (s1.toDouble / m)) *
        (m.toDouble / (m - 1).toDouble) / (scale.toDouble * scale.toDouble)
    }
    val varA = varOf(u10, p, 2 * n) / p + varOf(w01, n, 2 * p) / n
    val auc = u10.sum.toDouble / (2.0 * p * n)
    val got = Stats.aucDelong(spark, sfDir).head()
    got.getLong(0) shouldBe p
    got.getLong(1) shouldBe n
    got.getDouble(2) shouldBe (auc +- 1e-6)
    got.getLong(3).toDouble shouldBe (varA * 1e12 +- 2.0)
    got.getLong(4).toDouble shouldBe ((auc - 1.96 * math.sqrt(varA)) * 1e6 +- 2.0)
    got.getLong(5).toDouble shouldBe ((auc + 1.96 * math.sqrt(varA)) * 1e6 +- 2.0)
    // the CI must bracket the point estimate and stay inside [0, 1]
    got.getLong(4) should be < got.getLong(5)
    got.getLong(4).toDouble / 1e6 should be > 0.0
    got.getLong(5).toDouble / 1e6 should be < 1.0
  }
}
