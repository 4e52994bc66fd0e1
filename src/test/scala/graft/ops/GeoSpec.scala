package graft.ops

import graft.SparkSpec

/** Grid-join correctness: the cell-bucketed neighborhood join must
  * equal the quadratic brute-force scan — completeness (no pair within
  * R escapes the 3×3 neighborhood) and soundness (the exact d2 filter
  * rejects out-of-radius cell-mates).
  */
class GeoSpec extends SparkSpec {

  private val M1 = 2654435761L
  private val M2 = 2246822519L

  private def custPts(): Seq[(Long, Long, Long)] =
    spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey").collect().map(_.getLong(0)).toSeq
      .map(k => (k, k % 1048576L * M1 % 10000L, k % 1048576L * M2 % 10000L))

  private def suppPts(): Seq[(Long, Long, Long)] =
    spark.read.parquet(s"$sfDir/supplier.parquet")
      .select("s_suppkey").collect().map(_.getLong(0)).toSeq
      .map(k => (k, (k + 777L) % 1048576L * M1 % 10000L,
        (k + 777L) % 1048576L * M2 % 10000L))

  private def brutePairs(r: Long): Seq[(Long, Long, Long)] =
    for {
      (ck, cx, cy) <- custPts()
      (sk, sx, sy) <- suppPts()
      d2 = (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy)
      if d2 <= r * r
    } yield (ck, sk, d2)

  "Geo.gridNeighbors" should "equal the brute-force within-500 scan" in {
    val expected = brutePairs(500L).sortBy(p => (p._1, p._2))
    val got = Geo.gridNeighbors(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe expected
    expected should not be empty
  }

  "Geo.nearestHub" should "elect the brute-force argmin hub per customer" in {
    val expected = brutePairs(1500L).groupBy(_._1).toSeq.map {
      case (ck, cands) =>
        val best = cands.minBy(c => (c._3, c._2))
        (ck, best._2, best._3)
    }.sortBy(_._1)
    val got = Geo.nearestHub(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe expected
    expected should not be empty
  }

  "Geo.cellDensity" should "census every occupied super-cell exactly" in {
    val cs = custPts().groupBy(p => (p._2 / 1000L, p._3 / 1000L))
    val ss = suppPts().groupBy(p => (p._2 / 1000L, p._3 / 1000L))
    val bal = spark.read.parquet(s"$sfDir/customer.parquet")
      .selectExpr("c_custkey", "CAST(round(c_acctbal * 100) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val cells = (cs.keySet ++ ss.keySet).toSeq.sorted
    val expected = cells.map { gk =>
      val custs = cs.getOrElse(gk, Seq.empty)
      (gk._1, gk._2, custs.size.toLong,
        ss.getOrElse(gk, Seq.empty).size.toLong,
        custs.map(p => bal(p._1)).sum)
    }
    val got = Geo.cellDensity(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    got shouldBe expected
  }

  behavior of "Geo.haversineHub (r13)"

  it should "match a driver-side haversine argmin replay" in {
    val hubs = Seq((0L, 48.8566, 2.3522), (1L, 40.7128, -74.006),
      (2L, 35.6762, 139.6503), (3L, -33.8688, 151.2093), (4L, -1.2921, 36.8219))
    val pts = spark.read.parquet(s"$sfDir/customer.parquet")
      .selectExpr("c_custkey").collect().map(_.getLong(0)).map { ck =>
        val cx = ck % 1048576L * 2654435761L % 10000L
        val cy = ck % 1048576L * 2246822519L % 10000L
        (ck, cx.toDouble / 10000.0 * 170.0 - 85.0,
          cy.toDouble / 10000.0 * 360.0 - 180.0)
      }
    def dE6(lat: Double, lon: Double, hlat: Double, hlon: Double): Long = {
      val dphi = (math.toRadians(hlat) - math.toRadians(lat)) / 2.0
      val dlmb = (math.toRadians(hlon) - math.toRadians(lon)) / 2.0
      val a = math.sin(dphi) * math.sin(dphi) +
        math.cos(math.toRadians(lat)) * math.cos(math.toRadians(hlat)) *
          math.sin(dlmb) * math.sin(dlmb)
      math.round(12742.0 * math.asin(math.sqrt(a)) * 1e6)
    }
    val want = pts.map { case (ck, la, lo) =>
      val best = hubs.map { case (h, hla, hlo) => (dE6(la, lo, hla, hlo), h) }.min
      (ck, best._2, math.round(best._1.toDouble / 1e6 * 1e4) / 1e4)
    }.sortBy(_._1).toSeq
    val got = Geo.haversineHub(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    got shouldBe want
    // hubs genuinely partition the lattice: several distinct winners
    got.map(_._2).toSet.size should be >= 4
    // sanity: distances inside the half-circumference
    got.foreach(_._3 should be <= 20015.1)
  }

  "Geo.gridDbscanOf" should "cluster synthetic blobs exactly (core, merge, diagonal, noise)" in {
    import spark.implicits._
    // blob A: 6 pts in cell (0,0); blob B: 5 pts in cell (0,1) — edge-adjacent → merge
    // blob C: 7 pts in cell (4,4); blob D: 5 pts in cell (5,5) — DIAGONAL-adjacent → merge
    // noise: 3 singleton cells (below minPts=5) → dropped
    val pts = (Seq.fill(6)((100L, 100L)) ++ Seq.fill(5)((120L, 600L)) ++
      Seq.fill(7)((2200L, 2200L)) ++ Seq.fill(5)((2700L, 2700L)) ++
      Seq((4000L, 9000L), (9000L, 1000L), (6000L, 5000L)))
      .toDF("cx", "cy")
    val got = Geo.gridDbscanOf(pts).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe Seq((0L, 2L, 11L), (4004L, 2L, 12L))
  }

  it should "match a driver-side grid DBSCAN replay on the fixture" in {
    val pts = spark.read.parquet(s"$sfDir/customer.parquet")
      .selectExpr("(c_custkey % 1048576) * 2654435761 % 10000 AS cx",
        "(c_custkey % 1048576) * 2246822519 % 10000 AS cy")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cnt = pts.groupBy { case (x, y) => (x / 500, y / 500) }
      .view.mapValues(_.length.toLong).toMap
    val core = cnt.filter(_._2 >= 5)
    // union-find over 8-adjacency
    val parent = scala.collection.mutable.Map(core.keys.map(c => c -> c).toSeq: _*)
    def find(c: (Long, Long)): (Long, Long) = {
      var a = c
      while (parent(a) != a) a = parent(a)
      a
    }
    for (c <- core.keys; dx <- -1L to 1L; dy <- -1L to 1L) {
      val nb = (c._1 + dx, c._2 + dy)
      if (core.contains(nb)) {
        val (ra, rb) = (find(c), find(nb))
        if (ra != rb) parent(ra) = rb
      }
    }
    def key(c: (Long, Long)): Long = c._1 * 1000L + c._2
    val want = core.keys.groupBy(find).map { case (_, cells) =>
      (cells.map(key).min, cells.size.toLong, cells.map(core).sum)
    }.toSeq.sortBy(_._1)
    val got = Geo.gridDbscan(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe want
  }

  "Geo.pointInPolygon" should "replay the five half-plane tests per nation" in {
    val pent = Geo.Pentagon
    def inside(px: Long, py: Long): Boolean =
      pent.zip(pent.tail :+ pent.head).forall { case ((ax, ay), (bx, by)) =>
        (bx - ax) * (py - ay) - (by - ay) * (px - ax) >= 0
      }
    // geometry sanity on known points: centroid in, far corner out
    inside(5000, 5000) shouldBe true
    inside(9999, 9999) shouldBe false
    inside(0, 0) shouldBe false
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .selectExpr("c_nationkey",
        "(c_custkey % 1048576) * 2654435761 % 10000 AS cx",
        "(c_custkey % 1048576) * 2246822519 % 10000 AS cy")
      .collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getLong(2)))
    val want = cust.groupBy(_._1).toSeq.sortBy(_._1).map { case (nat, g) =>
      val in = g.count(p => inside(p._2, p._3)).toLong
      (nat, g.length.toLong, in, 10000L * in / g.length)
    }
    val got = Geo.pointInPolygon(spark, sfDir).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    got shouldBe want
    // the clip genuinely separates: both sides populated corpus-wide
    got.map(_._3).sum should be > 0L
    got.map(_._3).sum should be < cust.length.toLong
  }
}
