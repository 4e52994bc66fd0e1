package graft.ops

import graft.SparkSpec

/** Audit operators: brute-force recomputation over collected sf0.001
  * fixtures (snapshot-diff classification, skew-share algebra, blocked
  * Levenshtein pairs, rolling-median windows).
  */
class AuditSpec extends SparkSpec {

  "Audit.snapshotDiff" should "classify every changed key by the modular simulation rules" in {
    val rows = Audit.snapshotDiff(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    rows should not be empty

    rows.foreach { case (k, change, oldT, newT) =>
      change match {
        case "insert" => // in v2 only: dropped from v1 (k%89==0) but kept in v2
          k % 89 shouldBe 0
          k % 97 should not be 0
          oldT shouldBe None
        case "delete" =>
          k % 97 shouldBe 0
          k % 89 should not be 0
          newT shouldBe None
        case "update" => // +1.0 is IEEE-exact on these magnitudes
          k % 101 shouldBe 0
          newT.get - oldT.get shouldBe 1.0
        case other => fail(s"unexpected change tag $other")
      }
    }
    // all three classes must be exercised by the fixture
    rows.map(_._2).distinct.sorted shouldBe Seq("delete", "insert", "update")
  }

  "Audit.keySkew" should "report top-10 shares consistent with the raw key counts" in {
    val perKey = graft.io.Sources.events(spark, sfDir)
      .groupBy("user_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val total = perKey.map(_._2).sum.toDouble
    val nKeys = perKey.length.toDouble
    val top10 = perKey.sortBy { case (id, c) => (-c, id) }.take(10)

    val rows = Audit.keySkew(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    rows.map(r => (r._2, r._3)).toSeq shouldBe top10.toSeq
    rows.map(_._1).toSeq shouldBe (1L to 10L)

    var cum = 0L
    rows.zip(top10).foreach { case ((_, _, cnt, share, cumShare, ratio), (_, c)) =>
      cum += c
      share shouldBe BigDecimal(cnt / total).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      cumShare shouldBe BigDecimal(cum / total).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      ratio shouldBe BigDecimal(cnt * nKeys / total).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // cumulative share is strictly increasing and bounded by 1
    rows.map(_._5).sliding(2).foreach { case Array(a, b) => a should be < b; case _ => }
    rows.last._5 should be <= 1.0
  }

  "Audit.fuzzyMatch" should "find exactly the within-block pairs at edit distance <= 4" in {
    val parts = spark.read.parquet(s"$sfDir/part.parquet")
      .selectExpr("p_brand", "CAST(p_size AS BIGINT) AS p_size", "p_partkey", "p_name")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))

    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }

    val expected = (for {
      Seq((br, sz, ka, na), (_, _, kb, nb)) <-
        parts.groupBy(p => (p._1, p._2)).values.flatMap(_.sortBy(_._3).toSeq.combinations(2))
      if na != nb && lev(na, nb) <= 4
    } yield (br, sz, ka, kb, na, nb, lev(na, nb).toLong)).toSet

    val got = Audit.fuzzyMatch(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5), r.getLong(6))).toSet
    got shouldBe expected
  }

  "Audit.abExperiment" should "match a driver-side two-proportion readout" in {
    val perUser = graft.io.Sources.events(spark, sfDir)
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues { es =>
        es.count(_._2 == "purchase") > es.count(_._2 == "error")
      }.toMap
    val (na, ca) = (perUser.count(_._1 % 2 == 0), perUser.count(u => u._1 % 2 == 0 && u._2))
    val (nb, cb) = (perUser.count(_._1 % 2 == 1), perUser.count(u => u._1 % 2 == 1 && u._2))
    val row = Audit.abExperiment(spark, sfDir).head()
    (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) shouldBe
      (na.toLong, ca.toLong, nb.toLong, cb.toLong)
    val p = (ca + cb).toDouble / (na + nb)
    val z = if (p == 0.0 || p == 1.0) 0.0
      else (ca.toDouble / na - cb.toDouble / nb) /
        math.sqrt(p * (1.0 - p) * (1.0 / na + 1.0 / nb))
    row.getAs[Double]("z_conversion") shouldBe
      (BigDecimal(z).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-6)
  }

  "Audit.mutualInfo" should "sum per-cell contributions to a non-negative MI" in {
    val rows = Audit.mutualInfo(spark, sfDir).collect()
    rows.map(_.getAs[Long]("n_xy")).sum shouldBe
      graft.io.Sources.orders(spark, sfDir).count()
    // MI >= 0 (rounding can push the tiny-dependence sum only ~1e-6 under)
    rows.map(_.getAs[Double]("mi_contrib")).sum should be >= -1e-5
  }

  "Audit.rollingMedian" should "match a brute-force 7-day rows-frame median" in {
    val daily = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_orderpriority", "date_format(CAST(o_orderdate AS DATE), 'yyyy-MM-dd') AS day")
      .groupBy("o_orderpriority", "day").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))

    val expected = daily.groupBy(_._1).flatMap { case (prio, ds) =>
      val sorted = ds.sortBy(_._2)
      sorted.indices.drop(6).map { i =>
        val window = (i - 6 to i).map(j => sorted(j)._3.toDouble).sorted
        val med = window(3) // 7 values: exact middle element
        ((prio, sorted(i)._2), (sorted(i)._3, med))
      }
    }

    val got = Audit.rollingMedian(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    got.keySet shouldBe expected.keySet
    got.foreach { case (k, (n, med)) =>
      expected(k)._1 shouldBe n
      med shouldBe BigDecimal(expected(k)._2).setScale(1, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
  }

  "Audit.dayIslands" should "match a sequential islands scan" in {
    val days = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("CAST(o_orderdate AS DATE) AS day").distinct().collect()
      .map(r => java.time.LocalDate.parse(r.get(0).toString)).sortBy(_.toEpochDay)
    val expected = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    var start = days.head
    var prev = days.head
    days.tail.foreach { d =>
      if (d.toEpochDay != prev.toEpochDay + 1) {
        expected += ((start.toString, prev.toString, prev.toEpochDay - start.toEpochDay + 1))
        start = d
      }
      prev = d
    }
    expected += ((start.toString, prev.toString, prev.toEpochDay - start.toEpochDay + 1))
    val got = Audit.dayIslands(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    got shouldBe expected.toSeq
    // islands tile the present-day set exactly
    got.map(_._3).sum shouldBe days.length.toLong
  }

  "Audit.benford" should "match a driver-side first-digit tally" in {
    val vs = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("CAST(round(o_totalprice) AS BIGINT) AS v").collect()
      .map(_.getLong(0)).filter(_ > 0)
    val byDigit = vs.groupBy(v => v.toString.head.asDigit.toLong)
      .view.mapValues(_.length.toLong).toMap
    val tn = byDigit.values.sum
    val got = Audit.benford(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    got.map(_._1).toSet shouldBe byDigit.keySet
    got.foreach { case (digit, n, shareBp, expBp, devBp) =>
      n shouldBe byDigit(digit)
      shareBp shouldBe (10000L * n) / tn
      expBp shouldBe math.floor(10000 * math.log10(1 + 1.0 / digit)).toLong
      devBp shouldBe shareBp - expBp
    }
    // the audit's job is the deviation report, not conformance — the
    // synthetic fixture peaks at digit 2, and dev_bp flags exactly that
    got.map(_._2).sum shouldBe vs.length.toLong
  }

  // The 100 TB claim for the KS lattice, held by code: with arm counts
  // beyond ~2^31 the Long cross terms cumA·n_B would overflow (here
  // they reach ~4e20, 40x past Long.MaxValue), so the wide branch must
  // reproduce the BigInt reference exactly on the DECIMAL(38,0) lattice.
  "Audit.ksFromPerValue(wide)" should "match a BigInt reference at planted >2^31 arm counts" in {
    import spark.implicits._
    val rows = Seq(
      (100L, 4000000000L, 1000000000L),
      (200L, 3000000000L, 5000000000L),
      (300L, 2500000000L, 4500000000L),
      (400L, 6000000000L, 2000000000L),
      (500L, 1500000000L, 7000000000L))
    val na = rows.map(_._2).sum
    val nb = rows.map(_._3).sum
    var ca = 0L; var cb = 0L
    val gaps = rows.sortBy(_._1).map { case (c, a, b) =>
      ca += a; cb += b
      (c, (BigInt(ca) * nb - BigInt(cb) * na).abs)
    }
    val dnum = gaps.map(_._2).max
    dnum should be > BigInt(Long.MaxValue) // the test is vacuous otherwise
    val got = Audit.ksFromPerValue(rows.toDF("cents", "a", "b"), wide = true).head()
    got.getLong(0) shouldBe na
    got.getLong(1) shouldBe nb
    // the exact rational ships as decimal strings in BOTH lattices
    // (schema stability across the count gate)
    BigInt(got.getString(2)) shouldBe dnum
    BigInt(got.getString(3)) shouldBe BigInt(na) * nb
    got.getLong(4) shouldBe gaps.filter(_._2 == dnum).map(_._1).min
    got.getDouble(5) shouldBe
      (BigDecimal(dnum) / (BigDecimal(na) * BigDecimal(nb))).toDouble +- 1e-8
  }

  it should "agree value-for-value with the Long lattice under the bound" in {
    import spark.implicits._
    val pv = Seq((1L, 3L, 9L), (2L, 5L, 1L), (3L, 2L, 4L), (4L, 0L, 6L))
      .toDF("cents", "a", "b")
    val n = Audit.ksFromPerValue(pv, wide = false).head()
    val w = Audit.ksFromPerValue(pv, wide = true).head()
    n.getLong(0) shouldBe w.getLong(0)
    n.getLong(1) shouldBe w.getLong(1)
    n.getString(2) shouldBe w.getString(2)
    n.getString(3) shouldBe w.getString(3)
    n.getLong(4) shouldBe w.getLong(4)
    n.getDouble(5) shouldBe w.getDouble(5)
  }

  // Count-gated widening must be invisible to consumers: the narrow
  // and wide KS lattices must ship ONE schema.
  it should "ship one schema across the narrow and wide lattices" in {
    import spark.implicits._
    val pv = Seq((1L, 3L, 9L)).toDF("cents", "a", "b")
    Audit.ksFromPerValue(pv, wide = false).schema shouldBe
      Audit.ksFromPerValue(pv, wide = true).schema
  }

  "Audit.keyGaps" should "match a sorted-walk gap census and genuinely bind" in {
    val ks = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey").distinct().collect().map(_.getLong(0)).sorted
    var missing = 0L
    var runs = 0L
    ks.zip(ks.tail).foreach { case (a, b) =>
      if (b - a > 1) { missing += b - a - 1; runs += 1 }
    }
    val row = Audit.keyGaps(spark, sfDir).collect().head
    row.getLong(0) shouldBe ks.length.toLong
    row.getLong(1) shouldBe ks.head
    row.getLong(2) shouldBe ks.last
    row.getLong(3) shouldBe missing
    row.getLong(4) shouldBe runs
    row.getLong(5) shouldBe 10000L * ks.length / (ks.last - ks.head + 1)
    // childless orders leave real holes in the lineitem key sequence
    missing should be > 0L
  }
}
