package graft.ops

import graft.SparkSpec
import graft.io.Sources

/** Driver-side brute-force replays of the rank-statistic module: AUC,
  * Gini, and Spearman are each recomputed with naive O(n log n) / O(n²)
  * reference code over the collected fixture and compared to the
  * distributed two-pass results, so the Prefix regrouping and the
  * closed-form integer assembly are checked against the *definition*,
  * not just the SQL oracle.
  */
class StatsSpec extends SparkSpec {

  behavior of "Stats.aucExact"

  it should "match the tie-aware pairwise AUC definition" in {
    val rows = Sources.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice").collect()
      .map { r =>
        val cents = math.round(r.getDouble(1) * 100)
        val u = ((r.getLong(0) * 2654435761L) % 4294967296L) % 1000000L
        val label = if (u < math.min(100000L + cents / 100, 900000L)) 1 else 0
        (cents, label)
      }
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    var num2 = 0L // 2·(wins) + ties, over all pos×neg pairs
    for (p <- pos; n <- neg) {
      if (p > n) num2 += 2
      else if (p == n) num2 += 1
    }
    val want = num2.toDouble / (2.0 * pos.length * neg.length)

    val got = Stats.aucExact(spark, sfDir).head()
    got.getAs[Long]("n_pos") shouldBe pos.length.toLong
    got.getAs[Long]("n_neg") shouldBe neg.length.toLong
    // exact >Int64-capable gate columns ship as decimal strings in
    // BOTH lattices (schema stability across the count gate)
    got.getAs[String]("u2") shouldBe num2.toString
    got.getAs[Double]("auc") shouldBe (BigDecimal(want)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-9)
  }

  // 100 TB widening: past ~2e9 rows per side the U cross terms exceed
  // Long (u2 < 2·P·N; at the planted counts below u2 reaches ~6e20,
  // 65x past Long.MaxValue), so the wide branch must reproduce the
  // BigInt reference exactly on the DECIMAL(38,0) lattice — the same
  // count-gated discipline as Audit.ksFromPerValue.
  "Stats.aucFromByScore(wide)" should "match a BigInt reference at planted >2^31 side counts" in {
    import spark.implicits._
    val rows = Seq( // (cents, pos, neg) per distinct score
      (100L, 4000000000L, 1000000000L),
      (200L, 3000000000L, 5000000000L),
      (300L, 2500000000L, 4500000000L),
      (400L, 6000000000L, 2000000000L),
      (500L, 1500000000L, 7000000000L))
    val nPos = rows.map(_._2).sum
    val nNeg = rows.map(_._3).sum
    var cumNeg = BigInt(0)
    var u2 = BigInt(0)
    rows.sortBy(_._1).foreach { case (_, p, n) =>
      u2 += BigInt(p) * cumNeg * 2 + BigInt(p) * n // negBelow wins ×2 + ties
      cumNeg += n
    }
    u2 should be > BigInt(Long.MaxValue) // the test is vacuous otherwise
    val got = Stats.aucFromByScore(rows.toDF("cents", "pos", "neg"), wide = true).head()
    got.getLong(0) shouldBe nPos
    got.getLong(1) shouldBe nNeg
    BigInt(got.getString(2)) shouldBe u2
    got.getDouble(3) shouldBe
      BigDecimal((BigDecimal(u2) / (BigDecimal(nPos) * BigDecimal(nNeg) * 2)).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-12
  }

  it should "agree value-for-value with the Long lattice under the bound" in {
    import spark.implicits._
    val byScore = Seq((1L, 3L, 9L), (2L, 5L, 1L), (3L, 2L, 4L), (4L, 7L, 6L))
      .toDF("cents", "pos", "neg")
    val n = Stats.aucFromByScore(byScore, wide = false).head()
    val w = Stats.aucFromByScore(byScore, wide = true).head()
    n.getLong(0) shouldBe w.getLong(0)
    n.getLong(1) shouldBe w.getLong(1)
    n.getString(2) shouldBe w.getString(2)
    n.getDouble(3) shouldBe w.getDouble(3)
  }

  // Count-gated widening must be invisible to consumers: the narrow
  // and wide lattices of every *FromX pair must ship ONE schema — a
  // deployment crossing the gate must not flip any column's type.
  it should "ship one schema across the narrow and wide lattices" in {
    import spark.implicits._
    val byScore = Seq((1L, 3L, 9L)).toDF("cents", "pos", "neg")
    Stats.aucFromByScore(byScore, wide = false).schema shouldBe
      Stats.aucFromByScore(byScore, wide = true).schema
    val gini = Seq(("A", 5L, 1L)).toDF("c_mktsegment", "x", "o_custkey")
    Stats.giniFromCustomerRevenue(gini, wide = false).schema shouldBe
      Stats.giniFromCustomerRevenue(gini, wide = true).schema
    val pairs = Seq((3L, 9L)).toDF("xv", "yv")
    Stats.spearmanFromPairs(pairs, wide = false).schema shouldBe
      Stats.spearmanFromPairs(pairs, wide = true).schema
  }

  // The module's TIGHTEST Long bound: doubled midranks reach 2n, so the
  // closed-form products hit 4n^4 — Long overflow at n ≈ 3.9e4 ROWS. At
  // the planted n = 100k below the Long lattice would wrap; the wide
  // branch must reproduce a BigInt reference.
  "Stats.spearmanFromPairs(wide)" should "match a BigInt reference past the Long row bound" in {
    import spark.implicits._
    val n = 100000
    val rows = (0 until n).map { i =>
      ((i * 7919L) % 37L, (i * 104729L) % 101L)
    }
    def midranks2(vs: Seq[Long]): Map[Long, Long] = {
      val cnt = vs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      var cum = 0L
      cnt.toSeq.sortBy(_._1).map { case (v, c) =>
        cum += c
        v -> (2 * cum - c + 1)
      }.toMap
    }
    val rx = midranks2(rows.map(_._1))
    val ry = midranks2(rows.map(_._2))
    val (sx, sy, sxx, syy, sxy) = rows.foldLeft(
      (BigInt(0), BigInt(0), BigInt(0), BigInt(0), BigInt(0))) {
      case ((a, b, c, dd, e), (x, y)) =>
        val gx = BigInt(rx(x)); val gy = BigInt(ry(y))
        (a + gx, b + gy, c + gx * gx, dd + gy * gy, e + gx * gy)
    }
    val bn = BigInt(n)
    (bn * sxx - sx * sx) should be > BigInt(Long.MaxValue) // vacuous otherwise
    val want = ((BigDecimal(bn * sxy - sx * sy)) /
      (BigDecimal(math.sqrt((bn * sxx - sx * sx).toDouble)) *
        BigDecimal(math.sqrt((bn * syy - sy * sy).toDouble)))).toDouble
    val got = Stats.spearmanFromPairs(rows.toDF("xv", "yv"), wide = true).head()
    got.getLong(0) shouldBe n.toLong
    got.getDouble(1) shouldBe
      BigDecimal(want).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble +- 2e-6
  }

  it should "agree value-for-value with the Long lattice under the bound" in {
    import spark.implicits._
    val small = Seq((3L, 9L), (5L, 1L), (5L, 4L), (7L, 6L), (2L, 2L), (9L, 9L))
      .toDF("xv", "yv")
    val n = Stats.spearmanFromPairs(small, wide = false).head()
    val w = Stats.spearmanFromPairs(small, wide = true).head()
    n.getLong(0) shouldBe w.getLong(0)
    n.getDouble(1) shouldBe w.getDouble(1)
  }

  // Gini widening: at planted per-customer revenues of 1e16 cents the
  // rank-weighted sum reaches ~5e21 — 500x past Long — so the wide
  // branch must reproduce the BigInt closed form exactly.
  "Stats.giniFromCustomerRevenue(wide)" should "match a BigInt reference past the Long product bound" in {
    import spark.implicits._
    val rows = (1 to 1000).flatMap { i =>
      Seq(("ALPHA", (i.toLong % 7 + 1) * 10000000000000000L, i.toLong),
          ("BETA", (i.toLong % 13 + 1) * 10000000000000000L, 10000L + i))
    }
    def ref(seg: String): (Long, BigInt, Double) = {
      val xs = rows.filter(_._1 == seg).sortBy(t => (t._2, t._3)).map(t => BigInt(t._2))
      val n = xs.length.toLong
      val sx = xs.sum
      val six = xs.zipWithIndex.map { case (x, i) => x * (i + 1) }.sum
      (six * 2) should be > BigInt(Long.MaxValue) // vacuous otherwise
      val g = (BigDecimal(six * 2 - (BigInt(n) + 1) * sx) /
        BigDecimal(BigInt(n) * sx)).toDouble
      (n, sx, g)
    }
    val wideOut = Stats.giniFromCustomerRevenue(
      rows.toDF("c_mktsegment", "x", "o_custkey"), wide = true).collect()
    Seq("ALPHA", "BETA").foreach { seg =>
      val (n, sx, g) = ref(seg)
      val row = wideOut.find(_.getString(0) == seg).get
      row.getLong(1) shouldBe n
      // Σx is also past Long at these magnitudes — total_cents ships
      // as its exact decimal-string rendering (both lattices)
      BigInt(row.getString(2)) shouldBe sx
      row.getDouble(3) shouldBe
        BigDecimal(g).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble +- 2e-6
    }
  }

  it should "agree value-for-value with the Long lattice under the bound" in {
    import spark.implicits._
    val small = Seq(("A", 500L, 1L), ("A", 100L, 2L), ("A", 400L, 3L),
      ("B", 900L, 4L), ("B", 50L, 5L), ("B", 50L, 6L))
      .toDF("c_mktsegment", "x", "o_custkey")
    val n = Stats.giniFromCustomerRevenue(small, wide = false).collect()
    val w = Stats.giniFromCustomerRevenue(small, wide = true).collect()
    n.map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSeq shouldBe
      w.map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSeq
  }

  behavior of "Stats.giniBySegment"

  it should "match the sorted closed-form Gini per segment" in {
    val rev = Sources.orders(spark, sfDir)
      .select("o_custkey", "o_totalprice").collect()
      .groupBy(_.getLong(0))
      .map { case (ck, rs) => ck -> rs.map(r => math.round(r.getDouble(1) * 100)).sum }
    val seg = Sources.customer(spark, sfDir)
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = rev.toSeq.map { case (ck, x) => (seg(ck), x, ck) }
      .groupBy(_._1).map { case (sg, xs) =>
        val sorted = xs.sortBy(t => (t._2, t._3)).map(_._2)
        val n = sorted.length.toLong
        val sx = sorted.sum
        val six = sorted.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
        sg -> (n, sx, (2.0 * six - (n + 1) * sx) / (n.toDouble * sx))
      }

    val got = Stats.giniBySegment(spark, sfDir).collect()
    got.length shouldBe want.size
    got.foreach { r =>
      val (n, sx, g) = want(r.getAs[String]("c_mktsegment"))
      r.getAs[Long]("n_customers") shouldBe n
      r.getAs[String]("total_cents") shouldBe sx.toString
      r.getAs[Double]("gini") shouldBe (g +- 1e-6)
    }
  }

  behavior of "Stats.spearman"

  it should "match midrank-based Spearman computed naively" in {
    val t = Sources.part(spark, sfDir)
      .select("p_size", "p_retailprice").collect()
      .map(r => (r.getInt(0).toLong, math.round(r.getDouble(1) * 100)))

    def midranks(vs: Array[Long]): Map[Long, Double] = {
      val sorted = vs.sorted
      vs.distinct.map { v =>
        val lo = sorted.indexOf(v) + 1
        val hi = sorted.lastIndexOf(v) + 1
        v -> (lo + hi) / 2.0
      }.toMap
    }
    val rx = midranks(t.map(_._1)); val ry = midranks(t.map(_._2))
    val xs = t.map(p => rx(p._1)); val ys = t.map(p => ry(p._2))
    val n = t.length.toDouble
    val mx = xs.sum / n; val my = ys.sum / n
    val cov = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
    val want = cov / math.sqrt(xs.map(a => (a - mx) * (a - mx)).sum *
      ys.map(b => (b - my) * (b - my)).sum)

    val got = Stats.spearman(spark, sfDir).head()
    got.getAs[Long]("n") shouldBe t.length.toLong
    got.getAs[Double]("spearman_rho") shouldBe (want +- 1e-6)
  }

  behavior of "Stats.trimmedMean"

  it should "match the sort-based textbook trimmed and winsorized means" in {
    val byFlag = Sources.lineitem(spark, sfDir)
      .select("l_returnflag", "l_extendedprice").collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1)
    val got = Stats.trimmedMean(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    got.keySet shouldBe byFlag.keySet
    byFlag.foreach { case (flag, rows) =>
      val sorted = rows.map(_._2).sorted // value sort IS the definition
      val n = sorted.length
      val k = n / 10
      val interior = sorted.slice(k, n - k)
      val winsor = sorted.take(k).map(_ => sorted(k)) ++ interior ++
        sorted.takeRight(k).map(_ => sorted(n - k - 1))
      val g = got(flag)
      withClue(s"flag $flag") {
        g.getAs[Long]("n_total") shouldBe n.toLong
        g.getAs[Long]("n_kept") shouldBe interior.length.toLong
        g.getAs[Long]("lo_c") shouldBe sorted(k)
        g.getAs[Long]("hi_c") shouldBe sorted(n - k - 1)
        g.getAs[Long]("trim_sum_c") shouldBe interior.sum
        g.getAs[Long]("winsor_sum_c") shouldBe winsor.sum
      }
    }
  }

  behavior of "Stats.largestRemainder"

  it should "apportion exactly 10000 points, each within 1 of the exact share" in {
    val got = Stats.largestRemainder(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got.map(_._4).sum shouldBe 10000L // the method's defining invariant
    val total = got.map(_._2).sum
    got.foreach { case (nk, rev, base, bps) =>
      withClue(s"nation $nk") {
        val exact = 10000.0 * rev / total
        bps should (be >= base and be <= base + 1)
        math.abs(bps - exact) should be < 1.0 // quota property
      }
    }
    // replay the election: leftover points go to the largest remainders
    val leftover = 10000L - got.map(_._3).sum
    val byRem = got.sortBy { case (nk, rev, base, _) =>
      (-(10000L * rev - base * total), nk)
    }
    byRem.take(leftover.toInt).foreach { case (_, _, base, bps) =>
      bps shouldBe base + 1
    }
    byRem.drop(leftover.toInt).foreach { case (_, _, base, bps) =>
      bps shouldBe base
    }
  }

  behavior of "Temporal.twap"

  it should "match a sequential step-function time-weighted average" in {
    val rows = Sources.orders(spark, sfDir)
      .select("o_orderpriority", "o_orderdate", "o_orderkey", "o_totalprice")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toLocalDateTime.toLocalDate,
        r.getLong(2), math.round(r.getDouble(3) * 100)))
    val got = Temporal.twap(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("twap_num"), r.getAs[Long]("twap_den")))
      .toMap
    rows.groupBy(_._1).foreach { case (pri, rs) =>
      val daily = rs.groupBy(_._2).toSeq.map { case (day, dayRows) =>
        (day, dayRows.maxBy(_._3)._4) // last order (max key) closes the day
      }.sortBy(_._1.toEpochDay)
      val gaps = daily.zip(daily.drop(1)).map { case ((d0, c), (d1, _)) =>
        (c, d1.toEpochDay - d0.toEpochDay)
      } :+ ((daily.last._2, 1L))
      withClue(s"priority $pri") {
        got(pri)._1 shouldBe daily.length.toLong
        got(pri)._2 shouldBe gaps.map { case (c, g) => c * g }.sum
        got(pri)._3 shouldBe gaps.map(_._2).sum
      }
    }
  }

  "Stats.kdeGrid" should "equal the brute-force Epanechnikov numerator" in {
    val xs = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("CAST(round(o_totalprice) AS LONG) AS x").collect()
      .map(_.getLong(0))
    val h = 25000L
    val want = (0 to 40).map(j => 12500L * j).flatMap { g =>
      val in = xs.filter(x => math.abs(x - g) < h)
      if (in.isEmpty) None
      else Some(g -> ((in.length.toLong, in.map(x => h * h - (x - g) * (x - g)).sum)))
    }.toMap
    val got = Stats.kdeGrid(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    got shouldBe want
    // the density shape is non-trivial on this fixture: several
    // populated points, and mass varies across the grid
    got.size should be > 10
    got.values.map(_._2).toSet.size should be > 5
  }

  behavior of "Stats.mannWhitney (r13)"

  it should "match a brute-force midrank replay and the U identity" in {
    val vs = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter("o_orderpriority IN ('1-URGENT', '5-LOW')")
      .selectExpr("CAST(round(o_totalprice * 100) AS LONG) AS v",
        "o_orderpriority = '1-URGENT' AS is_a")
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val sorted = vs.sortBy(_._1)
    // 2x midranks by value group
    val byV = sorted.groupBy(_._1)
    val cums = sorted.map(_._1).distinct.sorted
      .scanLeft((0L, 0L)) { case ((_, cum), v) => (v, cum + byV(v).length) }.drop(1).toMap
    def r2(v: Long): Long = 2 * cums(v) - byV(v).length + 1
    val nA = vs.count(_._2).toLong
    val nB = vs.length - nA
    val r2A = vs.filter(_._2).map(x => r2(x._1)).sum
    val u2A = r2A - nA * (nA + 1)
    val row = Stats.mannWhitney(spark, sfDir).collect()(0)
    row.getLong(0) shouldBe nA
    row.getLong(1) shouldBe nB
    row.getLong(2) shouldBe u2A
    row.getLong(2) + row.getLong(3) shouldBe 2 * nA * nB // U_A + U_B = n_A n_B
    row.getLong(4) should be >= 0L
  }

  behavior of "Stats.jsdBuckets (r13)"

  it should "hold the per-bucket JS invariants" in {
    val rows = Stats.jsdBuckets(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    rows.length should be > 10
    // per-bucket JS contribution is nonnegative (log-sum inequality)
    rows.foreach { case (q, _, _, t) => withClue(s"qty $q") {
      t should be >= -1e-9 } }
    // total bounded by ln 2 and strictly positive on this fixture
    val total = rows.map(_._4).sum
    total should be > 0.0
    total should be < math.log(2.0)
  }

  behavior of "Stats.learningCurveFrozen (r13)"

  it should "nest the bands and agree with aucExact at 100%" in {
    val rows = Stats.learningCurveFrozen(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    rows.map(_._1) shouldBe Array(25L, 50L, 75L, 100L)
    // nested prefixes: counts monotone in the fraction
    rows.sliding(2).foreach { case Array(a, b) =>
      a._2 should be <= b._2
      a._3 should be <= b._3
    }
    // the full-corpus point IS aucExact
    val full = Stats.aucExact(spark, sfDir).collect().head
    rows.last._2 shouldBe full.getLong(0)
    rows.last._3 shouldBe full.getLong(1)
    rows.last._4 shouldBe full.getDouble(3) +- 1e-9
    // the planted scorer genuinely ranks at every budget
    rows.foreach(_._4 should (be > 0.5 and be < 1.0))
  }

  behavior of "Stats.leveneBf (r13)"

  it should "replay the median-centered F assembly exactly" in {
    val xs = Sources.orders(spark, sfDir)
      .selectExpr("o_orderpriority", "CAST(round(o_totalprice * 100) AS LONG) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val groups = xs.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    // lower median: element at 1-based rank (n+1) div 2
    val med = groups.map { case (g, vs) => g -> vs(((vs.length + 1) / 2) - 1) }
    val z = xs.map { case (g, v) => (g, math.abs(v - med(g)) / 100) }
    val zg = z.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val bt = zg.values.map { v =>
      math.round(v.sum.toDouble * v.sum.toDouble / v.length.toDouble / 1000.0)
    }.sum
    val n = z.length.toLong
    val sAll = z.map(_._2).sum
    val ssq = z.map(t => t._2 * t._2).sum
    val gt = math.round(sAll.toDouble * sAll.toDouble / n.toDouble / 1000.0)
    val ssbK = bt - gt
    val sswK = math.round(ssq.toDouble / 1000.0) - bt
    val k = zg.size.toLong
    val f = (ssbK.toDouble / (k - 1)) / (sswK.toDouble / (n - k))
    val row = Stats.leveneBf(spark, sfDir).collect().head
    row.getLong(0) shouldBe k
    row.getLong(1) shouldBe n
    row.getLong(2) shouldBe ssbK
    row.getLong(3) shouldBe sswK
    row.getDouble(4) shouldBe (math.round(f * 1e6) / 1e6) +- 1e-9
    sswK should be > 0L
  }

  behavior of "Stats.kruskalWallis (r13)"

  it should "replay the doubled-midrank H assembly exactly" in {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val xs = Sources.orders(spark, sfDir)
      .selectExpr("CAST(round(o_totalprice * 100) AS LONG) AS v",
        "o_orderpriority")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val n = xs.length.toLong
    // doubled midrank per distinct value: 2*cum - cnt + 1
    val byV = xs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val sortedV = byV.keys.toSeq.sorted
    val cums = sortedV.scanLeft(0L)((acc, v) => acc + byV(v)).tail
    val r2 = sortedV.zip(cums).map { case (v, cum) =>
      v -> (2 * cum - byV(v) + 1) }.toMap
    val tieTerm = byV.values.map(c => c * c * c - c).sum
    val groups = prios.map { p =>
      val g = xs.filter(_._2 == p)
      (g.length.toLong, g.map(t => r2(t._1)).sum)
    }
    val btK = groups.map { case (ng, r2g) =>
      math.round(r2g.toDouble * r2g.toDouble / (ng.toDouble * 4000.0)) }.sum
    val nd = n.toDouble
    val h = (12.0 / (nd * (nd + 1.0)) * (btK.toDouble * 1000.0) - 3.0 * (nd + 1.0)) /
      (1.0 - tieTerm.toDouble / (nd * nd * nd - nd))
    val row = Stats.kruskalWallis(spark, sfDir).collect().head
    row.getLong(0) shouldBe n
    row.getLong(1) shouldBe tieTerm
    row.getLong(2) shouldBe btK
    row.getDouble(3) shouldBe (math.round(h * 1e6) / 1e6) +- 1e-9
    groups.zipWithIndex.foreach { case ((ng, r2g), i) =>
      row.getLong(4 + 2 * i) shouldBe ng
      row.getLong(5 + 2 * i) shouldBe r2g
    }
    // doubled rank sums partition the total doubled rank mass N(N+1)
    groups.map(_._2).sum shouldBe n * (n + 1)
    row.getDouble(3) should be >= 0.0
  }

  behavior of "Stats.anovaF (r13)"

  it should "replay the lattice ANOVA assembly exactly" in {
    val xs = Sources.orders(spark, sfDir)
      .selectExpr("o_orderpriority", "CAST(round(o_totalprice) AS LONG) AS x")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val groups = xs.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val bt = groups.values.map { v =>
      math.round(v.sum.toDouble * v.sum.toDouble / v.length.toDouble / 1000.0)
    }.sum
    val n = xs.length.toLong
    val sAll = xs.map(_._2).sum
    val ssq = xs.map(t => t._2 * t._2).sum
    val gt = math.round(sAll.toDouble * sAll.toDouble / n.toDouble / 1000.0)
    val ssbK = bt - gt
    val sswK = math.round(ssq.toDouble / 1000.0) - bt
    val k = groups.size.toLong
    val f = (ssbK.toDouble / (k - 1)) / (sswK.toDouble / (n - k))
    val row = Stats.anovaF(spark, sfDir).collect().head
    row.getLong(0) shouldBe k
    row.getLong(1) shouldBe n
    row.getLong(2) shouldBe ssbK
    row.getLong(3) shouldBe sswK
    row.getDouble(4) shouldBe (math.round(f * 1e6) / 1e6) +- 1e-9
    sswK should be > 0L // within-variance strictly positive on the fixture
  }

  behavior of "Stats.kendallTauB (r13)"

  it should "equal the brute-force pairwise concordance count" in {
    val items = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("l_orderkey").collect().map(_.getLong(0))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val xy = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_orderkey",
        "least(CAST(round(o_totalprice * 100) AS LONG) div 2000000, 9L) AS y")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(t => items.contains(t._1))
      .map { case (k, y) => (items(k), y) }
    var c = 0L; var dd = 0L
    for (i <- xy.indices; j <- (i + 1) until xy.length) {
      val dx = xy(i)._1 - xy(j)._1; val dy = xy(i)._2 - xy(j)._2
      if (dx * dy > 0) c += 1 else if (dx * dy < 0) dd += 1
    }
    val n = xy.length.toLong
    val n0 = n * (n - 1) / 2
    val tx = xy.groupBy(_._1).values.map(_.length.toLong)
      .map(m => m * (m - 1) / 2).sum
    val ty = xy.groupBy(_._2).values.map(_.length.toLong)
      .map(m => m * (m - 1) / 2).sum
    val row = Stats.kendallTauB(spark, sfDir).collect().head
    (row.getLong(0), row.getLong(1), row.getLong(2)) shouldBe ((n, c, dd))
    (row.getLong(3), row.getLong(4)) shouldBe ((tx, ty))
    val tau = (c - dd).toDouble /
      (math.sqrt((n0 - tx).toDouble) * math.sqrt((n0 - ty).toDouble))
    row.getDouble(5) shouldBe (math.round(tau * 1e6) / 1e6) +- 1e-9
    // tau is a valid correlation and the association is weak-positive
    // at most (basket size barely orders price bands)
    math.abs(row.getDouble(5)) should be < 1.0
  }

  behavior of "Stats.qqNormal (r13)"

  it should "replay lower order statistics and the Gaussian line" in {
    val cents = Sources.orders(spark, sfDir)
      .selectExpr("CAST(round(o_totalprice * 100) AS LONG) AS c")
      .collect().map(_.getLong(0)).sorted
    val n = cents.length.toLong
    val dollars = cents.map(_ / 100L)
    val (s1, s2) = (dollars.sum, dollars.map(x => x * x).sum)
    val m = s1.toDouble / n
    val sd = math.sqrt(s2.toDouble / n - m * m)
    val zE6 = Seq(-1281552L, -841621L, -524401L, -253347L, 0L,
      253347L, 524401L, 841621L, 1281552L)
    val rows = Stats.qqNormal(spark, sfDir).collect()
    rows.map(_.getLong(0)).toSeq shouldBe (1 to 9).map(_ * 10L)
    rows.zipWithIndex.foreach { case (r, i) =>
      r.getLong(1) shouldBe n
      val rank = ((n - 1) * (i + 1)) / 10 + 1
      r.getLong(2) shouldBe cents(rank.toInt - 1)
      r.getLong(3) shouldBe zE6(i)
      val theo = m + zE6(i).toDouble / 1e6 * sd
      r.getDouble(4) shouldBe (math.round(theo * 100) / 100.0) +- 1e-6
    }
    // both curves are monotone; the median pair sits closest in
    // relative terms for this near-symmetric distribution
    val emp = rows.map(_.getLong(2)).toSeq
    emp shouldBe emp.sorted
    rows.map(_.getDouble(4)).toSeq shouldBe rows.map(_.getDouble(4)).sorted.toSeq
  }

  behavior of "Stats.momentsProfile (r13)"

  it should "replay raw power sums and the central-moment identities per priority" in {
    val xs = Sources.orders(spark, sfDir)
      .selectExpr("o_orderpriority",
        "CAST(round(o_totalprice * 100) AS LONG) div 100000 AS x")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val rows = Stats.momentsProfile(spark, sfDir).collect()
    rows.map(_.getString(0)).toSeq shouldBe
      xs.map(_._1).distinct.sorted.toSeq
    rows.foreach { row =>
      val v = xs.filter(_._1 == row.getString(0)).map(_._2)
      val n = v.length.toLong
      val (s1, s2) = (v.sum, v.map(x => x * x).sum)
      val (s3, s4) = (v.map(x => x * x * x).sum, v.map(x => x * x * x * x).sum)
      (row.getLong(1), row.getLong(2), row.getLong(3)) shouldBe ((n, s1, s2))
      (row.getLong(4), row.getLong(5)) shouldBe ((s3, s4))
      val m = s1.toDouble / n
      val m2 = s2.toDouble / n - m * m
      val m3 = s3.toDouble / n - 3 * m * s2.toDouble / n + 2 * m * m * m
      val m4 = s4.toDouble / n - 4 * m * s3.toDouble / n +
        6 * m * m * s2.toDouble / n - 3 * m * m * m * m
      row.getDouble(6) shouldBe
        (math.round(m3 / math.pow(m2, 1.5) * 1e6) / 1e6) +- 1e-9
      row.getDouble(7) shouldBe
        (math.round((m4 / (m2 * m2) - 3.0) * 1e6) / 1e6) +- 1e-9
      // bounded support: both shape statistics must land in the sane
      // band for a sum-of-uniforms price distribution (not NaN/Inf)
      math.abs(row.getDouble(6)) should be < 3.0
      row.getDouble(7) should (be > -3.0 and be < 10.0)
    }
  }

  behavior of "Stats.woeBins (r13)"

  it should "replay the smoothed WOE/IV assembly per frozen bin" in {
    val scored = Sources.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice").collect()
      .map { r =>
        val cents = math.round(r.getDouble(1) * 100)
        val u = ((r.getLong(0) * 2654435761L) % 4294967296L) % 1000000L
        val label = if (u < math.min(100000L + cents / 100, 900000L)) 1L else 0L
        (math.min(cents / 10000000L, 5L), label)
      }
    val byBin = scored.groupBy(_._1).view.mapValues { g =>
      (g.map(_._2).sum, g.length - g.map(_._2).sum)
    }.toMap
    val pTot = byBin.values.map(_._1).sum
    val nTot = byBin.values.map(_._2).sum
    def r6(x: Double): Double = math.round(x * 1e6) / 1e6
    val want = byBin.toSeq.sortBy(_._1).map { case (bin, (pos, neg)) =>
      val pr = (pos + 1).toDouble / (pTot + 6)
      val nr = (neg + 1).toDouble / (nTot + 6)
      (bin, pos, neg, r6(math.log(pr / nr)), r6((pr - nr) * math.log(pr / nr)))
    }
    val got = Stats.woeBins(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toSeq
    got.map(t => (t._1, t._2, t._3)) shouldBe want.map(t => (t._1, t._2, t._3))
    got.zip(want).foreach { case (g, w) =>
      g._4 shouldBe w._4 +- 1e-9
      g._5 shouldBe w._5 +- 1e-9
    }
    // monotone signal: the planted teacher's WOE rises with price bin
    got.map(_._4) shouldBe got.map(_._4).sorted
    // IV terms are nonnegative by construction: (pr-nr) and ln share sign
    got.foreach(_._5 should be >= 0.0)
  }

  behavior of "Stats.meanFamily (r13)"

  it should "replay all four lattice means and order them HM <= AM <= RMS <= CHM" in {
    val xs = Sources.orders(spark, sfDir)
      .selectExpr("o_orderpriority", "CAST(round(o_totalprice) AS LONG) AS x")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = xs.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, rows) =>
      val v = rows.map(_._2)
      val n = v.length.toLong
      val sx = v.sum
      val sxx = v.map(x => x * x).sum
      val sr = v.map(x => 1000000000000L / x).sum
      (g, n, sx, 100L * sx / n, n * 1000000000000L / sr, 100L * sxx / sx,
        math.round(math.sqrt(sxx.toDouble / n) * 1e4) / 1e4)
    }
    val got = Stats.meanFamily(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    got.map(t => (t._1, t._2, t._3, t._4, t._5, t._6)) shouldBe
      want.map(t => (t._1, t._2, t._3, t._4, t._5, t._6))
    got.zip(want).foreach { case (g, w) => g._7 shouldBe w._7 +- 1e-9 }
    // Pythagorean-mean ordering (e2 units; 100 slack for lattice floors)
    got.foreach { case (_, _, _, am, hm, chm, rms) =>
      (hm * 100) should be <= am + 100
      am.toDouble should be <= rms * 100 + 100
      (rms * 100) should be <= chm.toDouble + 100
    }
  }

  behavior of "Stats.ratioDeltaCi (r13)"

  it should "replay the six moments and the delta-method interval" in {
    val items = Sources.lineitem(spark, sfDir)
      .groupBy("l_orderkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // inner join: orders without lineitems drop, exactly as the engine's
    val t = Sources.orders(spark, sfDir)
      .selectExpr("o_orderkey", "o_orderpriority",
        "CAST(round(o_totalprice) AS LONG) AS x")
      .collect().flatMap(r => items.get(r.getLong(0))
        .map(y => (r.getString(1), r.getLong(2), y)))
    val want = t.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, rows) =>
      val n = rows.length.toDouble
      val sx = rows.map(_._2).sum
      val sy = rows.map(_._3).sum
      val sxx = rows.map(r => r._2 * r._2).sum
      val syy = rows.map(r => r._3 * r._3).sum
      val sxy = rows.map(r => r._2 * r._3).sum
      val r0 = sx.toDouble / sy
      val vxx = (sxx - sx.toDouble * sx / n) / (n - 1)
      val vyy = (syy - sy.toDouble * sy / n) / (n - 1)
      val vxy = (sxy - sx.toDouble * sy / n) / (n - 1)
      val se = math.sqrt((vxx - 2 * r0 * vxy + r0 * r0 * vyy) / n) / (sy / n)
      (g, rows.length.toLong, sx, sy, 1000000L * sx / sy, se,
        r0 - 1.96 * se, r0 + 1.96 * se)
    }
    val got = Stats.ratioDeltaCi(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))).toSeq
    got.map(t => (t._1, t._2, t._3, t._4, t._5)) shouldBe
      want.map(t => (t._1, t._2, t._3, t._4, t._5))
    got.zip(want).foreach { case (g, w) =>
      g._6 shouldBe (math.round(w._6 * 1e6) / 1e6) +- 1e-9
      g._7 shouldBe (math.round(w._7 * 1e6) / 1e6) +- 1e-9
      g._8 shouldBe (math.round(w._8 * 1e6) / 1e6) +- 1e-9
      g._6 should be > 0.0
      g._7 should be < g._8
    }
  }

  behavior of "Stats.aucBootstrap (r13)"

  it should "replay the weighted tie-aware U for spot replicates" in {
    val scored = Sources.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice").collect()
      .map { r =>
        val cents = math.round(r.getDouble(1) * 100)
        val u = ((r.getLong(0) * 2654435761L) % 4294967296L) % 1000000L
        val label = if (u < math.min(100000L + cents / 100, 900000L)) 1L else 0L
        (r.getLong(0), cents, label)
      }
    def wOf(id: Long, rep: Long): Long = {
      val u = ((id % 1048576L + rep * 7919L) * 2654435761L) % 1048576L
      if (u < 385749L) 0L else if (u < 771499L) 1L else if (u < 964373L) 2L
      else if (u < 1028665L) 3L else if (u < 1044738L) 4L else 5L
    }
    def aucRep(rep: Long): (Long, Long, Long) = {
      val by = scored.groupBy(_._2).toSeq.sortBy(_._1).map { case (_, g) =>
        (g.map(t => wOf(t._1, rep) * t._3).sum,
          g.map(t => wOf(t._1, rep) * (1 - t._3)).sum)
      }
      var cum = 0L; var u2 = 0L; var p = 0L; var ng = 0L
      by.foreach { case (pos, neg) =>
        u2 += pos * cum * 2 + pos * neg; cum += neg; p += pos; ng += neg
      }
      (p, ng, u2 * 500000L / (p * ng))
    }
    val got = Stats.aucBootstrap(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got.map(_._1) shouldBe (0L until 16L)
    Seq(0L, 7L, 15L).foreach { rep =>
      val (p, ng, auc) = aucRep(rep)
      val row = got(rep.toInt)
      row._2 shouldBe p
      row._3 shouldBe ng
      row._4 shouldBe auc
    }
    // replicates spread around the point estimate but stay informative
    got.map(_._4).distinct.size should be > 1
    got.foreach(_._4 should (be > 500000L and be < 1000000L))
  }

  behavior of "Stats.overdispersion (r13)"

  it should "replay the count moments and the NB method-of-moments size" in {
    val ks = Sources.orders(spark, sfDir)
      .select("o_orderpriority", "o_custkey").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .map { case ((g, _), k) => (g, k) }
    val want = ks.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, rows) =>
      val n = rows.length.toLong
      val sk = rows.map(_._2).sum
      val skk = rows.map(r => r._2 * r._2).sum
      val m = sk.toDouble / n
      val v = (skk - sk.toDouble * sk / n) / (n - 1)
      def r6(x: Double) = math.round(x * 1e6) / 1e6
      (g, n, sk, skk, r6(m), r6(v), r6(v / m),
        if (v > m) r6(m * m / (v - m)) else -1.0)
    }
    val got = Stats.overdispersion(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))).toSeq
    got.map(t => (t._1, t._2, t._3, t._4)) shouldBe
      want.map(t => (t._1, t._2, t._3, t._4))
    got.zip(want).foreach { case (g, w) =>
      g._5 shouldBe w._5 +- 1e-9
      g._6 shouldBe w._6 +- 1e-9
      g._7 shouldBe w._7 +- 1e-9
      g._8 shouldBe w._8 +- 1e-9
      g._7 should be > 0.0
    }
  }

  behavior of "Stats.costThreshold (r13)"

  it should "replay the full sweep and beat both trivial corners" in {
    val scored = Sources.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice").collect()
      .map { r =>
        val cents = math.round(r.getDouble(1) * 100)
        val u = ((r.getLong(0) * 2654435761L) % 4294967296L) % 1000000L
        (cents, if (u < math.min(100000L + cents / 100, 900000L)) 1L else 0L)
      }
    val p = scored.map(_._2).sum
    val ng = scored.length - p
    val sweep = scored.map(_._1).distinct.sorted.map { v =>
      val fp = scored.count(t => t._2 == 0 && t._1 >= v).toLong
      val fn = scored.count(t => t._2 == 1 && t._1 < v).toLong
      (v, fp, fn, fp + 5 * fn)
    }
    val best = sweep.minBy(t => (t._4, t._1))
    val row = Stats.costThreshold(spark, sfDir).collect().head
    (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) shouldBe best
    row.getLong(4) shouldBe 5L * p
    row.getLong(5) shouldBe ng
    // the swept optimum beats (or ties) both trivial corners
    row.getLong(3) should be <= row.getLong(4)
    row.getLong(3) should be <= row.getLong(5)
  }

  behavior of "Stats.cvarSegment (r13)"

  it should "replay the tie-correct tail mean against a sorted reference" in {
    val rows = Sources.orders(spark, sfDir)
      .selectExpr("o_orderpriority", "CAST(round(o_totalprice * 100) AS LONG) AS c")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, rs) =>
      val v = rs.map(_._2).sorted
      val n = v.length.toLong
      val k = (19 * n + 19) / 20
      val tail = v.drop((k - 1).toInt) // positions k..n
      (g, n, k, v((k - 1).toInt), tail.length.toLong, tail.sum,
        tail.sum * 100 / tail.length)
    }
    val got = Stats.cvarSegment(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    got shouldBe want
    // ES dominates VaR (tail mean >= cutoff), strictly on this fixture
    got.foreach { case (_, _, _, varC, _, _, es) =>
      es should be > varC * 100L
    }
  }

  behavior of "Stats.did (r13)"

  it should "replay the four cells and the mirrored estimate" in {
    val nat = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey", "c_nationkey").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    val rows = Sources.orders(spark, sfDir)
      .selectExpr("o_custkey", "CAST(o_orderdate AS DATE) AS od",
        "CAST(round(o_totalprice) AS LONG) AS x").collect()
      .map { r =>
        (nat(r.getLong(0)) % 2 == 0,
          !r.getDate(1).toLocalDate.isBefore(java.time.LocalDate.of(1996, 1, 1)),
          r.getLong(2))
      }
    def cell(tr: Boolean, po: Boolean): (Long, Long) = {
      val g = rows.filter(t => t._1 == tr && t._2 == po)
      (g.length.toLong, g.map(_._3).sum)
    }
    val (nt1, st1) = cell(true, true); val (nt0, st0) = cell(true, false)
    val (nc1, sc1) = cell(false, true); val (nc0, sc0) = cell(false, false)
    val didRef = (st1.toDouble / nt1 - st0.toDouble / nt0) -
      (sc1.toDouble / nc1 - sc0.toDouble / nc0)
    val row = Stats.did(spark, sfDir).collect().head
    (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4), row.getLong(5), row.getLong(6), row.getLong(7)) shouldBe
      ((nt1, st1, nt0, st0, nc1, sc1, nc0, sc0))
    row.getDouble(8) shouldBe (math.round(didRef * 1e4) / 1e4) +- 1e-9
    // all four design cells are populated
    Seq(nt1, nt0, nc1, nc0).foreach(_ should be > 0L)
  }

  behavior of "Stats.fairnessAudit (r13)"

  it should "replay the group rates and the disparate-impact ratios" in {
    val seg = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Sources.orders(spark, sfDir)
      .selectExpr("o_orderkey", "o_custkey", "o_totalprice").collect()
      .map { r =>
        val cents = math.round(r.getDouble(2) * 100)
        val u = ((r.getLong(0) * 2654435761L) % 4294967296L) % 1000000L
        val label = if (u < math.min(100000L + cents / 100, 900000L)) 1L else 0L
        (seg(r.getLong(1)), if (cents >= 20000000L) 1L else 0L, label)
      }
    val byG = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, rs) =>
      val n = rs.length.toLong
      val pos = rs.map(_._2).sum
      val tp = rs.map(t => t._2 * t._3).sum
      val fp = rs.map(t => t._2 * (1 - t._3)).sum
      val pl = rs.map(_._3).sum
      (g, n, pos, pos * 1000000L / n, tp * 1000000L / pl,
        fp * 1000000L / (n - pl))
    }
    val mx = byG.map(_._4).max
    val want = byG.map(t =>
      (t._1, t._2, t._3, t._4, t._5, t._6, t._4 * 1000000L / mx))
    val got = Stats.fairnessAudit(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    got shouldBe want
    // exactly one reference group at DI = 1e6; none below four-fifths
    got.count(_._7 == 1000000L) shouldBe 1
    got.foreach(_._7 should be > 800000L)
  }

  "Stats.grubbsOutlier" should "match the max-studentized-deviation definition" in {
    val recs = Sources.customer(spark, sfDir)
      .select("c_mktsegment", "c_custkey", "c_acctbal").collect()
      .map(r => (r.getString(0), r.getLong(1),
        math.round(r.getDouble(2) * 100)))
    val want = recs.groupBy(_._1).toSeq.sortBy(_._1).map { case (seg, g) =>
      val n = g.length.toLong
      val s1 = g.map(_._3).sum
      val s2 = g.map(x => x._3 * x._3).sum
      // integer ranking currency |n·x − S|, min-key ties
      val (key, cents, adev) = g
        .map(r => (r._2, r._3, math.abs(r._3 * n - s1)))
        .minBy(t => (-t._3, t._1))
      val varS = (s2.toDouble / n - (s1.toDouble / n) * (s1.toDouble / n)) *
        (n.toDouble / (n - 1).toDouble)
      val g6 = BigDecimal(1e6 * (adev.toDouble / n) / math.sqrt(varS))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      (seg, n, key, cents, adev, g6)
    }
    val got = Stats.grubbsOutlier(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    got shouldBe want
    // the statistic is a maximum over studentized deviations, so it is
    // bounded below by the RMS deviation (~1) and above by (n-1)/sqrt(n)
    got.foreach { t =>
      t._6 should be > 1000000L
      t._6.toDouble / 1e6 should be < ((t._2 - 1).toDouble / math.sqrt(t._2.toDouble))
    }
  }

  "Stats.theilDecomp" should "decompose T into within + between exactly in the reals" in {
    val recs = Sources.orders(spark, sfDir)
      .select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
    val n = recs.length.toLong
    val st = recs.map(_._2).sum
    val groups = recs.groupBy(_._1)
    val want = groups.toSeq.sortBy(_._1).map { case (prio, g) =>
      val ng = g.length.toLong
      val sg = g.map(_._2).sum
      val within = g.map { case (_, x) =>
        BigDecimal(1e12 * (x.toDouble / st) *
          math.log(x.toDouble * ng / sg))
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }.sum
      val between = BigDecimal(1e12 * (sg.toDouble / st) *
        math.log(sg.toDouble * n / (st.toDouble * ng)))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      (prio, ng, sg, sg * 1000000L / st, within, between)
    }
    val got = Stats.theilDecomp(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    got shouldBe want
    // Shorrocks: Σ within + Σ between = the undecomposed global T, up
    // to per-row lattice rounding (≤ 0.5e0 per term on the e12 lattice)
    val totalT = recs.map { case (_, x) =>
      1e12 * (x.toDouble / st) * math.log(x.toDouble * n / st)
    }.sum
    val decomposed = got.map(t => t._5 + t._6).sum.toDouble
    math.abs(decomposed - totalT) should be < (recs.length.toDouble)
    // priorities are near-uniform slices of one distribution: between
    // inequality must be tiny relative to within
    math.abs(got.map(_._6).sum) should be <
      (got.map(_._5).sum / 10L)
  }

  "Stats.powerTwoProp" should "match the textbook normal-approximation sample size" in {
    val evs = graft.io.Sources.events(spark, sfDir)
      .select("event_type").collect().map(_.getString(0))
    val nt = evs.length.toLong
    val np = evs.count(_ == "purchase").toLong
    val want = Seq(10000L, 20000L, 50000L).map { dl =>
      val p1 = np.toDouble / nt.toDouble
      val p2 = p1 + dl.toDouble / 1000000.0
      val pbar = (p1 + p2) / 2.0
      val q = 1.959964 * math.sqrt(2.0 * pbar * (1.0 - pbar)) +
        0.841621 * math.sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2))
      (dl, nt, np, np * 1000000L / nt,
        math.ceil(q * q / ((p2 - p1) * (p2 - p1))).toLong)
    }
    val got = Stats.powerTwoProp(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    got shouldBe want
    // a bigger detectable lift needs fewer subjects — strictly
    got.map(_._5) shouldBe got.map(_._5).sorted.reverse
    got.map(_._5).distinct.size shouldBe 3
    // sanity vs the classic rule of thumb: ~16·p̄q̄/δ² within 2x
    got.foreach { t =>
      val p1 = t._3.toDouble / t._2
      val rough = 16.0 * p1 * (1 - p1) / math.pow(t._1.toDouble / 1e6, 2)
      (t._5.toDouble / rough) should (be > 0.5 and be < 2.0)
    }
  }

  "Stats.medianCi" should "bracket the median with the binomial order-statistic ranks" in {
    val cust = Sources.customer(spark, sfDir)
      .select("c_mktsegment", "c_custkey", "c_acctbal").collect()
      .map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 100)))
    val want = cust.groupBy(_._1).toSeq.sortBy(_._1).map { case (seg, g) =>
      val sorted = g.sortBy(t => (t._3, t._2)).map(_._3)
      val n = sorted.length.toLong
      val rMed = (n + 1) / 2
      val rLo = math.max(1L,
        math.floor((n.toDouble - 1.959964 * math.sqrt(n.toDouble)) / 2.0).toLong)
      val rHi = math.min(n,
        math.ceil(1.0 + (n.toDouble + 1.959964 * math.sqrt(n.toDouble)) / 2.0).toLong)
      (seg, n, rLo, rHi, sorted((rMed - 1).toInt), sorted((rLo - 1).toInt),
        sorted((rHi - 1).toInt))
    }
    val got = Stats.medianCi(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    got shouldBe want
    // the interval brackets the point estimate by construction
    got.foreach { t =>
      t._6 should be <= t._5
      t._5 should be <= t._7
    }
  }

  "Stats.averagePrecision" should "match the sklearn step-rule definition" in {
    val rows = Sources.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice").collect()
      .map { r =>
        val cents = math.round(r.getDouble(1) * 100)
        val u = ((r.getLong(0) * 2654435761L) % 4294967296L) % 1000000L
        (cents, if (u < math.min(100000L + cents / 100, 900000L)) 1L else 0L)
      }
    val p = rows.map(_._2).sum
    val n = rows.length - p
    val byScore = rows.groupBy(_._1).toSeq
      .map { case (c, g) => (c, g.map(_._2).sum, g.size - g.map(_._2).sum) }
      .sortBy(-_._1)
    var (tp, fp, ap) = (0L, 0L, 0L)
    byScore.foreach { case (_, pos, neg) =>
      tp += pos; fp += neg
      ap += BigDecimal(1e9 * (pos.toDouble / p) *
        (tp.toDouble / (tp + fp).toDouble))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val got = Stats.averagePrecision(spark, sfDir).head()
    (got.getLong(0), got.getLong(1)) shouldBe ((p, n))
    got.getLong(2) shouldBe byScore.length.toLong
    got.getLong(3) shouldBe ap
    // AP is a probability-like mass: within (base-rate, 1]·1e9 when
    // the score genuinely ranks positives above the base rate
    got.getLong(3) should be > (p * 1000000000L / rows.length)
    got.getLong(3) should be <= 1000000000L
  }

  "Stats.bhFdr" should "replay the A&S p-values and the step-up rule" in {
    val cust = Sources.customer(spark, sfDir)
      .selectExpr("CAST(c_nationkey AS BIGINT)", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val perN = cust.groupBy(_._1).toSeq.map { case (nk, g) =>
      (nk, g.length.toLong, g.count(_._2 < 0).toLong)
    }
    val (nt, kt, m) = (perN.map(_._2).sum, perN.map(_._3).sum,
      perN.length.toLong)
    val p0 = kt.toDouble / nt
    def pOf(n: Long, k: Long): Long = {
      val az = math.abs((k.toDouble / n - p0) /
        math.sqrt(p0 * (1.0 - p0) / n))
      val t = 1.0 / (1.0 + 0.2316419 * az)
      val poly = t * (0.319381530 + t * (-0.356563782 + t *
        (1.781477937 + t * (-1.821255978 + t * 1.330274429))))
      BigDecimal(2.0 * (0.3989422804014327 * math.exp(-0.5 * az * az)) *
        poly * 1e9).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val ranked = perN.map(t => (t._1, t._2, t._3, pOf(t._2, t._3)))
      .sortBy(t => (t._4, t._1)).zipWithIndex
      .map { case ((nk, n, k, p), i) =>
        (nk, n, k, k * 1000000L / n, p, (i + 1).toLong,
          (i + 1).toLong * 50000000L / m)
      }
    val kmax = ranked.filter(t => t._5 <= t._7).map(_._6)
      .foldLeft(0L)(math.max)
    val want = ranked.map(t =>
      (t._1, t._2, t._3, t._4, t._5, t._6, t._7,
        if (t._6 <= kmax) 1L else 0L))
    val got = Stats.bhFdr(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    got shouldBe want
    // p-values are probabilities, ranks a permutation, thresholds ramp
    got.foreach(_._5 should (be >= 0L and be <= 1000000000L))
    got.map(_._6).sorted shouldBe (1L to m)
    got.map(_._7) shouldBe got.map(_._7).sorted
  }
}
