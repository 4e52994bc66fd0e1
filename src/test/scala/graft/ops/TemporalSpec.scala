package graft.ops

import java.time.{Instant, LocalDate, ZoneOffset}

import graft.SparkSpec

/** Temporal operators: brute-force recomputation over collected sf0.001
  * fixtures (SCD2 run structure, gap-fill spine algebra, transition
  * counts/probabilities).
  */
class TemporalSpec extends SparkSpec {

  private def dayOf(us: Long): LocalDate =
    Instant.ofEpochMilli(us / 1000L).atZone(ZoneOffset.UTC).toLocalDate

  private lazy val orders: Seq[(Long, Long, Long, String)] =
    spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_custkey",
        // o_orderdate is TIMESTAMP_NTZ; session TZ is UTC so the cast is lossless
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS ts_us",
        "o_orderkey", "o_orderpriority")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq

  "Temporal.scd2History" should "collapse each customer's priority timeline into runs" in {
    val rows = Temporal.scd2History(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        LocalDate.parse(r.get(3).toString),
        Option(r.get(4)).map(d => LocalDate.parse(d.toString)), r.getLong(5)))

    // brute force: per customer, runs of consecutive equal priorities
    val expected = orders.groupBy(_._1).view.mapValues { os =>
      val sorted = os.sortBy(o => (o._2, o._3))
      val runs = sorted.foldLeft(List.empty[(String, Int)]) {
        case (acc, (_, _, _, prio)) => acc match {
          case (p, n) :: rest if p == prio => (p, n + 1) :: rest
          case _ => (prio, 1) :: acc
        }
      }.reverse
      runs
    }.toMap

    val got = rows.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(r => (r._3, r._6.toInt)).toList).toMap
    got shouldBe expected.map { case (k, v) => (k, v) }

    // interval chaining: valid_to of run i equals valid_from of run i+1
    rows.groupBy(_._1).values.foreach { rs =>
      val sorted = rs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          a._5 shouldBe Some(b._4)
          a._3 should not be b._3 // consecutive runs differ in priority
        case _ =>
      }
      sorted.last._5 shouldBe None // open-ended current version
    }
    // binding: some customer must have more than one version
    rows.groupBy(_._1).values.exists(_.length > 1) shouldBe true
  }

  "Temporal.gapfillDaily" should "emit a complete 31-day spine per active customer" in {
    val rows = Temporal.gapfillDaily(spark, sfDir).collect()
      .map(r => (r.getLong(0), LocalDate.parse(r.get(1).toString),
        r.getLong(2), r.getDouble(3)))

    val jan = orders.filter { o =>
      val d = dayOf(o._2)
      d.getYear == 1995 && d.getMonthValue == 1
    }
    val custs = jan.map(_._1).toSet
    custs.size should be > 0

    rows.length shouldBe custs.size * 31
    rows.groupBy(_._1).keySet shouldBe custs
    // every customer covers exactly Jan 1..31
    rows.groupBy(_._1).values.foreach { rs =>
      rs.map(_._2.getDayOfMonth).sorted shouldBe (1 to 31)
    }
    // order counts match the raw data; zero-filled days really are zero
    rows.map(_._3).sum shouldBe jan.size
    val activeDays = jan.map(o => (o._1, dayOf(o._2))).toSet
    rows.filterNot(r => activeDays((r._1, r._2))).foreach { r =>
      r._3 shouldBe 0L
      r._4 shouldBe 0.0
    }
    rows.filter(r => activeDays((r._1, r._2))).foreach(_._3 should be > 0L)
  }

  "Temporal.transitionMatrix" should "match brute-force pair counts and normalize per source" in {
    val events = graft.io.Sources.events(spark, sfDir)
      .selectExpr("user_id", "unix_micros(ts) AS ts_us", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq

    val expected = events.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._2, e._3)).map(_._4)
      sorted.zip(sorted.drop(1))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap

    val rows = Temporal.transitionMatrix(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2), r.getDouble(3)))
    rows.map(r => r._1 -> r._2).toMap shouldBe expected

    // probabilities are row-normalized (up to the 4-digit rounding)
    rows.groupBy(_._1._1).values.foreach { rs =>
      rs.map(_._3).sum shouldBe 1.0 +- (0.0001 * rs.size)
    }
  }

  "Temporal.ewma" should "fold exactly like the sequential recurrence" in {
    val rows = Temporal.ewma(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    rows should not be empty
    // replay the recurrence per user in plain Scala: must match BITWISE
    rows.groupBy(_._1).values.foreach { rs =>
      val sorted = rs.sortBy(_._2)
      sorted.head._2 shouldBe 1L
      var e = sorted.head._3
      sorted.head._4 shouldBe e
      sorted.drop(1).foreach { case (_, _, v, got) =>
        e = e + 0.5 * (v - e)
        got shouldBe e // exact double equality — same IEEE op sequence
      }
    }
  }

  it should "stay inside the running min/max envelope" in {
    Temporal.ewma(spark, sfDir).collect().groupBy(_.getLong(0)).values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(1))
      var (lo, hi) = (Double.MaxValue, Double.MinValue)
      sorted.foreach { r =>
        lo = math.min(lo, r.getDouble(2)); hi = math.max(hi, r.getDouble(2))
        r.getDouble(3) should (be >= lo and be <= hi)
      }
    }
  }

  "Temporal.asofSnapshot" should "agree with the covering scd2History interval per customer" in {
    val hist = Temporal.scd2History(spark, sfDir).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), Option(r.getString(4)))
    }
    val asOf = "1996-06-30"
    val expected = hist.filter { case (_, _, _, vf, vt) =>
      vf <= asOf && vt.forall(_ > asOf) // ISO strings compare like dates
    }.map { case (ck, v, prio, vf, _) => (ck, v, prio, vf) }.sortBy(_._1)
    val got = Temporal.asofSnapshot(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSeq
    got shouldBe expected.toSeq
    // exactly one covering interval per customer
    got.map(_._1).distinct.size shouldBe got.size
  }

  "Sampling.sampleTemperatureMix" should "allocate exactly the budget via Hamilton seats" in {
    val rows = Sampling.sampleTemperatureMix(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.map(_._4).sum shouldBe 100L
    // every source holds at least its floor seat share and at most +1
    val wsum = rows.map(_._3).sum
    rows.foreach { case (_, _, w, alloc) =>
      val base = 100L * w / wsum
      alloc should (be >= base and be <= base + 1)
    }
    // integer sqrt weights
    rows.foreach { case (_, n, w, _) =>
      w shouldBe math.floor(math.sqrt(n.toDouble)).toLong
    }
  }

  /** The gap-filled daily integer-dollar series, replayed driver-side. */
  private lazy val dailySeries: Vector[(LocalDate, Long)] = {
    val byDay = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("CAST(o_orderdate AS DATE) AS day",
        "CAST(round(o_totalprice) AS BIGINT) AS x")
      .groupBy("day").agg(org.apache.spark.sql.functions.sum("x").as("x"))
      .collect()
      .map(r => (LocalDate.parse(r.get(0).toString), r.getLong(1))).toMap
    val d0 = byDay.keys.min(Ordering.by[LocalDate, Long](_.toEpochDay))
    val d1 = byDay.keys.max(Ordering.by[LocalDate, Long](_.toEpochDay))
    Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1))
      .map(day => (day, byDay.getOrElse(day, 0L))).toVector
  }

  "Temporal.cusumChangepoint" should "match the sequential CUSUM argmax scan" in {
    val n = dailySeries.size.toLong
    val t = dailySeries.map(_._2).sum
    var p = 0L
    val svals = dailySeries.zipWithIndex.map { case ((day, x), i) =>
      p += x
      (day.toString, n * p - (i + 1) * t)
    }.dropRight(1)
    val expected = svals.map { case (d0, s0) => (d0, s0, math.abs(s0)) }
      .sortBy { case (d0, _, a) => (-a, d0) }.take(5)
    val got = Temporal.cusumChangepoint(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe expected
  }

  "Temporal.holtLinear" should "replay the level/trend recursion" in {
    val xs = dailySeries.map(_._2)
    var l = xs(0).toDouble
    var b = xs(1).toDouble - xs(0).toDouble
    val trace = dailySeries.zipWithIndex.map { case ((day, x), idx) =>
      if (idx > 0) {
        val lNew = 0.5 * x + 0.5 * (l + b)
        b = 0.5 * (lNew - l) + 0.5 * b
        l = lNew
      }
      (day.toString, x, l, b, l + b)
    }
    def r4(v: Double): Double =
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val expected = trace.takeRight(10)
      .map { case (day, x, lv, tr, fc) => (day, x, r4(lv), r4(tr), r4(fc)) }
    val got = Temporal.holtLinear(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toSeq
    got shouldBe expected
  }

  "Temporal.autocorr" should "match the lag-k Pearson definition" in {
    val xs = dailySeries.map(_._2)
    val got = Temporal.autocorr(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    got.map(_._1).toSeq shouldBe (1L to 7L)
    got.foreach { case (k, nPairs, acf) =>
      val pairs = xs.dropRight(k.toInt).zip(xs.drop(k.toInt))
      nPairs shouldBe pairs.size.toLong
      val n = pairs.size.toDouble
      val sx = pairs.map(_._1).sum.toDouble
      val sy = pairs.map(_._2).sum.toDouble
      val sxx = pairs.map(v => v._1 * v._1).sum.toDouble
      val syy = pairs.map(v => v._2 * v._2).sum.toDouble
      val sxy = pairs.map(v => v._1 * v._2).sum.toDouble
      val r = (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
      acf shouldBe (r +- 1e-6)
    }
  }

  "Temporal.kaplanMeier" should "match a sequential product-limit replay" in {
    import java.time.temporal.ChronoUnit
    val got = Temporal.kaplanMeier(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq

    // brute force: per-customer lifetimes, 90-day churn horizon, then
    // the textbook sequential product over event times
    val lives = orders.groupBy(_._1).values.map { os =>
      (dayOf(os.map(_._2).min), dayOf(os.map(_._2).max))
    }.toSeq
    val cutoff = lives.map(_._2).maxBy(_.toEpochDay).minusDays(90)
    val durs = lives.map { case (f, l) =>
      (ChronoUnit.DAYS.between(f, l), l.isBefore(cutoff))
    }
    val byT = durs.groupBy(_._1).view
      .mapValues(v => (v.size.toLong, v.count(_._2).toLong)).toMap
    val ts = byT.keys.toSeq.sorted
    var atRisk = durs.size.toLong
    var surv = 1.0
    val expected = ts.flatMap { t =>
      val (leave, d) = byT(t)
      val row = if (d > 0) {
        surv = if (d == atRisk) 0.0 else surv * (1.0 - d.toDouble / atRisk)
        Some((t, atRisk, d, surv))
      } else None
      atRisk -= leave
      row
    }

    got.map(r => (r._1, r._2, r._3)) shouldBe expected.map(r => (r._1, r._2, r._3))
    got.zip(expected).foreach { case (g, e) => g._4 shouldBe (e._4 +- 1e-5) }
    // survival is a non-increasing [0, 1] step function
    got.map(_._4).sliding(2).foreach {
      case Seq(a, b) => b should be <= a + 1e-12
      case _ =>
    }
  }

  "Temporal.seasonalDecompose" should "replay the classical additive decomposition" in {
    val ser = Temporal.dailyRevenueSeries(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    val x = ser.map(_._2)
    val n = x.length
    // interior days only (full 7-day centered frames)
    val expected = (3 until n - 3).map { i =>
      val sum7 = (i - 3 to i + 3).map(x(_)).sum
      (i, sum7, 7L * x(i) - sum7)
    }
    val byDow = expected.groupBy(_._1 % 7)
      .map { case (dw, rows) => dw -> (rows.map(_._3).sum, rows.size.toLong) }
    val got = Temporal.seasonalDecompose(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    got.length shouldBe expected.length
    got.zip(expected).foreach { case ((_, gx, trend, seasonal, remainder),
        (i, sum7, detr)) =>
      gx shouldBe x(i)
      val (sd, cnt) = byDow(i % 7)
      trend shouldBe (sum7 / 7.0 +- 1e-4)
      seasonal shouldBe (sd.toDouble / (7.0 * cnt) +- 1e-4)
      remainder shouldBe ((cnt * detr - sd).toDouble / (7.0 * cnt) +- 1e-4)
      // the decomposition reassembles the observation
      (trend + seasonal + remainder) shouldBe (gx.toDouble +- 2e-3)
    }
    // seasonal components sum to ~zero across the 7 weekdays (mean-centered
    // up to per-dow count imbalance)
    val seasonals = got.map(r => (r._1, r._4)).distinct
    seasonals should not be empty
  }

  "Temporal.theilSen" should "match the sequential pairwise-slope median on the sf0.001 series" in {
    import org.apache.spark.sql.functions._
    // rebuild the gap-filled series exactly as dailyRevenueSeries does
    val daily = spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice")).cast("long")).as("x"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1))).toMap
    val d0 = daily.keys.min(Ordering.by((d: LocalDate) => d.toEpochDay))
    val d1 = daily.keys.max(Ordering.by((d: LocalDate) => d.toEpochDay))
    val ser = (0L to (d1.toEpochDay - d0.toEpochDay)).map { i =>
      (i, daily.getOrElse(d0.plusDays(i), 0L))
    }
    val slopes = (for {
      a <- ser.indices; b <- (a + 1) until ser.length
    } yield (ser(b)._2 - ser(a)._2).toDouble / (ser(b)._1 - ser(a)._1)).sorted
    val mid = slopes.length
    val median =
      if (mid % 2 == 1) slopes(mid / 2)
      else (slopes(mid / 2 - 1) + slopes(mid / 2)) / 2.0

    val row = Temporal.theilSen(spark, sfDir).head()
    row.getLong(0) shouldBe ser.length.toLong
    row.getLong(1) shouldBe slopes.length.toLong
    row.getDouble(2) shouldBe (median +- 1e-3)
  }

  it should "shrug off a single corrupted day that drags the OLS slope" in {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // flat series with one huge spike: OLS slope moves, TS median stays ~0
    val base = (0L until 101L).map(i => (i, 100L)).toDF("i", "x")
    val spiked = (0L until 101L).map(i => (i, if (i == 50) 1000000L else 100L))
      .toDF("i", "x")
    def tsSlope(df: org.apache.spark.sql.DataFrame): Double = {
      val a = df.select(col("i").as("ia"), col("x").as("xa"))
      val b = df.select(col("i").as("ib"), col("x").as("xb"))
      a.join(broadcast(b), col("ia") < col("ib"))
        .select(((col("xb") - col("xa")).cast("double") /
          (col("ib") - col("ia")).cast("double")).as("slope"))
        .agg(expr("percentile(slope, 0.5)")).head().getDouble(0)
    }
    math.abs(tsSlope(spiked) - tsSlope(base)) should be < 1e-9
  }

  behavior of "Temporal.clampedBalance"

  it should "equal the sequential Lindley recursion stock_t = max(0, stock_{t-1} + delta_t)" in {
    // the operator ships the REFLECTION closed form (S_t - min(0, min S_j));
    // this replays the literal recursion it must equal, customer by customer
    val rows = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
      .collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1).toLocalDate,
        r.getLong(2), math.round(r.getDouble(3) * 100)))
    val expected = rows.groupBy(_._1).flatMap { case (cust, rs) =>
      val daily = rs.groupBy(_._2).toSeq.map { case (day, dayRows) =>
        (day, dayRows.map(t => if (t._3 % 2 == 0) t._4 else -t._4).sum)
      }.sortBy(_._1.toEpochDay)
      var stock = 0L
      daily.map { case (day, net) =>
        stock = math.max(0L, stock + net) // the recursion, literally
        (cust, day.toString, net, stock)
      }
    }.toSeq.sortBy(t => (t._1, t._2))
    val got = Temporal.clampedBalance(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe expected
    // the clamp must actually engage on the fixture (otherwise this
    // tests nothing beyond a running sum)
    val plainSums = expected.groupBy(_._1).values.exists { perCust =>
      perCust.map(_._3).scanLeft(0L)(_ + _).drop(1).exists(_ < 0)
    }
    plainSums shouldBe true
  }

  behavior of "Temporal.drawdown"

  it should "equal a literal running-peak walk over the daily flows" in {
    val daily = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_orderpriority AS prio", "CAST(o_orderdate AS DATE) AS day",
        "CAST((CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE -1 END)" +
          " * CAST(round(o_totalprice * 100) AS LONG) AS LONG) AS f")
      .groupBy("prio", "day").agg(org.apache.spark.sql.functions.sum("f").as("flow"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val want = daily.groupBy(_._1).map { case (prio, rows) =>
      val sorted = rows.sortBy(_._2)
      var cum = 0L
      var peak = Long.MinValue
      var maxDd = 0L
      var peakDay = ""
      sorted.foreach { case (_, day, f) =>
        cum += f
        if (cum > peak) { peak = cum; peakDay = day } // earliest by strict >
        maxDd = math.max(maxDd, peak - cum)
      }
      prio -> ((sorted.length.toLong, peak, maxDd, peakDay))
    }
    val got = Temporal.drawdown(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    got shouldBe want
    // the signed flow genuinely draws down on the fixture
    got.values.map(_._3).max should be > 0L
  }

  behavior of "Temporal.ohlcBars"

  it should "satisfy the candlestick invariants and match the daily extremes" in {
    val rows = Temporal.ohlcBars(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    rows should not be empty
    rows.foreach { case (prio, month, nDays, open, high, low, close) =>
      withClue(s"$prio $month") {
        low should be <= high
        open should (be >= low and be <= high)
        close should (be >= low and be <= high)
        nDays should be >= 1L
        if (nDays == 1) { open shouldBe close; high shouldBe low }
      }
    }
    // bars vary: not every month is one flat candle
    rows.count { case (_, _, _, o, h, l, c) => h != l } should be > 10
  }

  behavior of "the r13 market-stats family (rsi/bollinger/smaCrossover/vwap)"

  it should "replay RSI as a literal trailing-14 gain/loss walk" in {
    val xs = dailySeries.map(_._2).toArray
    val dx = xs.indices.drop(1).map(i => xs(i) - xs(i - 1))
    val want = (14 until xs.length).map { i =>
      // deltas dx(0)..; window for day i = deltas at days i-13..i
      val w = ((i - 14) until (i - 0)).map(dx) // dx(j) is the delta INTO day j+1
      val g = w.map(v => math.max(v, 0L)).sum
      val l = w.map(v => math.max(-v, 0L)).sum
      (g, l, if (g + l == 0) 50.0 else math.round(1e4 * 100.0 * g / (g + l)) / 1e4)
    }
    val got = Temporal.rsi(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    got.length shouldBe want.length
    got shouldBe want
    // both signs of motion genuinely present
    got.map(_._1).max should be > 0L
    got.map(_._2).max should be > 0L
  }

  it should "make the Bollinger breakout decision in exact integers" in {
    val xs = dailySeries.map(_._2).toArray
    val rows = Temporal.bollinger(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
    rows.length shouldBe xs.length - 19
    rows.zipWithIndex.foreach { case ((x, _, _, flag), idx) =>
      val i = idx + 19
      val w = xs.slice(i - 19, i + 1)
      val s = w.sum
      val q = w.map(v => v * v).sum
      x shouldBe xs(i)
      flag shouldBe (20 * x - s > 0 &&
        (20 * x - s) * (20 * x - s) > 4 * (20 * q - s * s))
    }
    rows.count(_._4) should be > 0 // breakouts genuinely occur
  }

  it should "fire SMA crossovers exactly at integer sign flips" in {
    val xs = dailySeries.map(_._2).toArray
    def c(i: Int): Long =
      4 * xs.slice(i - 6, i + 1).sum - xs.slice(i - 27, i + 1).sum
    val want = (28 until xs.length).filter(i => (c(i) > 0) != (c(i - 1) > 0))
      .map(i => (if (c(i) > 0) "golden" else "death", c(i - 1), c(i)))
    val got = Temporal.smaCrossover(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe want
    got.map(_._1).toSet shouldBe Set("golden", "death")
  }

  it should "weight VWAP by quantity, not average unit prices" in {
    val rows = Temporal.vwap(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    rows should not be empty
    rows.foreach { case (m, n, pc, qs, v) =>
      withClue(m) {
        n should be > 0L
        v shouldBe math.round(1e4 * pc.toDouble / 100.0 / qs) / 1e4
      }
    }
  }

  "Temporal.periodogramFrozen" should "replay the frozen-phase dot products per harmonic" in {
    val cosT = Seq(1000000L, 623490L, -222521L, -900969L, -900969L,
      -222521L, 623490L)
    val sinT = Seq(0L, 781831L, 974928L, 433884L, -433884L, -974928L,
      -781831L)
    val daily = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("CAST(o_orderdate AS DATE) AS day",
        "CAST(round(o_totalprice) AS LONG) AS x")
      .groupBy("day").agg(org.apache.spark.sql.functions.sum("x").as("x"))
      .selectExpr("CAST(datediff(day, DATE '1970-01-01') AS LONG) AS t", "x")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val m = daily.map(_._2).sum / daily.length
    val want = (1L to 3L).map { k =>
      val re = daily.map { case (t, x) => (x - m) * cosT(((t * k) % 7).toInt) }.sum
      val im = daily.map { case (t, x) => (x - m) * sinT(((t * k) % 7).toInt) }.sum
      val amp = math.round(math.sqrt(re.toDouble * re + im.toDouble * im) / 1e6 * 100) / 100.0
      (k, daily.length.toLong, re, im, amp)
    }
    val got = Temporal.periodogramFrozen(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    got.map(t => (t._1, t._2, t._3, t._4)) shouldBe
      want.map(t => (t._1, t._2, t._3, t._4))
    got.zip(want).foreach { case (g, w) => g._5 shouldBe w._5 +- 1e-6 }
    got.foreach(_._5 should be > 0.0)
  }

  "Temporal.peakDays" should "replay the 3-point local-max rule with the 150% floor" in {
    val daily = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("CAST(o_orderdate AS DATE) AS day",
        "CAST(round(o_totalprice) AS LONG) AS x")
      .groupBy("day").agg(org.apache.spark.sql.functions.sum("x").as("v"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
      .sortBy(_._1)
    val floor = 3L * (daily.map(_._2).sum / daily.length) / 2L
    val want = daily.indices.drop(1).dropRight(1).flatMap { i =>
      val v = daily(i)._2
      if (v > daily(i - 1)._2 && v > daily(i + 1)._2 && v > floor)
        Some((daily(i)._1, v, v - floor))
      else None
    }
    val got = Temporal.peakDays(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe want
    got should not be empty
    got.foreach(_._3 should be > 0L)
  }

  "Temporal.saxSymbols (r13)" should "replay the quantize-then-compare alphabet" in {
    val daily = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("CAST(o_orderdate AS DATE) AS day",
        "CAST(round(o_totalprice * 100) AS LONG) AS c")
      .groupBy("day")
      .agg(org.apache.spark.sql.functions.expr("sum(c) div 10000").as("v"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .sortBy(_._1.toEpochDay)
    val n = daily.length.toLong
    val sv = daily.map(_._2).sum
    val svv = daily.map(t => t._2 * t._2).sum
    val sS = math.round(math.sqrt((n * svv - sv * sv).toDouble))
    val want = daily.map { case (day, v) =>
      val dev = n * v - sv
      val sym = if (dev * 100 < -67 * sS) "a"
        else if (dev < 0) "b"
        else if (dev * 100 < 67 * sS) "c" else "d"
      (day.toEpochDay / 7, sym)
    }.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (wk, g) => (wk, g.length.toLong, g.map(_._2).mkString) }
    val got = Temporal.saxSymbols(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    got shouldBe want
    // all four symbols occur and no week exceeds 7 days
    val alphabet = got.flatMap(_._3).toSet
    alphabet shouldBe Set('a', 'b', 'c', 'd')
    got.foreach(_._2 should be <= 7L)
  }

  "Temporal.seasonalStrength (r13)" should "replay the Hyndman F from the decompose lattice" in {
    val daily = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("CAST(o_orderdate AS DATE) AS day",
        "CAST(round(o_totalprice) AS LONG) AS x")
      .groupBy("day").agg(org.apache.spark.sql.functions.sum("x").as("v"))
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)))
      .toMap
    val (d0, d1) = (daily.keys.min, daily.keys.max)
    val ser = (d0 to d1).map(e => daily.getOrElse(e, 0L)).toArray
    val full = (3 until ser.length - 3).map { i =>
      val sum7 = (-3 to 3).map(o => ser(i + o)).sum
      (i, 7L * ser(i) - sum7)
    }
    val byDow = full.groupBy(_._1 % 7).view
      .mapValues(g => (g.map(_._2).sum, g.length.toLong)).toMap
    val (detrR, remR) = full.map { case (i, de) =>
      val (sd, cnt) = byDow(i % 7)
      (math.round(de.toDouble / 7.0),
        math.round((cnt * de - sd).toDouble / (cnt.toDouble * 7.0)))
    }.unzip
    val n = full.length.toLong
    def varOf(xs: Seq[Long]): Double =
      n.toDouble * xs.map(x => x * x).sum - xs.sum.toDouble * xs.sum.toDouble
    val f = math.max(0.0, 1.0 - varOf(remR) / varOf(detrR))
    val row = Temporal.seasonalStrength(spark, sfDir).collect().head
    row.getLong(0) shouldBe n
    row.getLong(1) shouldBe detrR.sum
    row.getLong(3) shouldBe remR.sum
    row.getDouble(5) shouldBe (math.round(f * 1e6) / 1e6) +- 1e-9
    // strength is a proportion and the weekly cycle leaves SOME signal
    row.getDouble(5) should (be >= 0.0 and be <= 1.0)
  }

  "Temporal.pacfFrozen (r13)" should "replay the Durbin-Levinson closed forms" in {
    val daily = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("CAST(o_orderdate AS DATE) AS day",
        "CAST(round(o_totalprice * 100) AS LONG) AS c")
      .groupBy("day")
      .agg(org.apache.spark.sql.functions.expr("sum(c) div 1000000").as("v"))
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)))
      .toMap
    val (d0, d1) = (daily.keys.min, daily.keys.max)
    val ser = (d0 to d1).map(e => daily.getOrElse(e, 0L)).toArray
    def rho(k: Int): Double = {
      val n = ser.length - k
      val a = ser.dropRight(k); val b = ser.drop(k)
      val (sa, sb) = (a.sum, b.sum)
      val saa = a.map(x => x * x).sum; val sbb = b.map(x => x * x).sum
      val sab = a.zip(b).map(t => t._1 * t._2).sum
      (n.toDouble * sab - sa.toDouble * sb) /
        (math.sqrt(n.toDouble * saa - sa.toDouble * sa) *
          math.sqrt(n.toDouble * sbb - sb.toDouble * sb))
    }
    val (r1, r2, r3) = (rho(1), rho(2), rho(3))
    val phi22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    val phi21 = r1 * (1.0 - r2) / (1.0 - r1 * r1)
    val phi33 = (r3 - phi21 * r2 - phi22 * r1) /
      (1.0 - phi21 * r1 - phi22 * r2)
    def r6(x: Double): Double = math.round(x * 1e6) / 1e6
    val row = Temporal.pacfFrozen(spark, sfDir).collect().head
    row.getLong(0) shouldBe ser.length.toLong
    row.getDouble(1) shouldBe r6(r1) +- 1e-9
    row.getDouble(2) shouldBe r6(r2) +- 1e-9
    row.getDouble(3) shouldBe r6(r3) +- 1e-9
    row.getDouble(4) shouldBe r6(r1) +- 1e-9
    row.getDouble(5) shouldBe r6(phi22) +- 1e-9
    row.getDouble(6) shouldBe r6(phi33) +- 1e-9
    // PACF is a partial correlation: bounded by 1 in magnitude
    Seq(row.getDouble(4), row.getDouble(5), row.getDouble(6))
      .foreach(p => math.abs(p) should be <= 1.0)
  }

  "Temporal.haarEnergy" should "replay the integer Haar details per level" in {
    val daily = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("CAST(o_orderdate AS DATE) AS day",
        "CAST(round(o_totalprice) AS LONG) AS x")
      .groupBy("day")
      .agg(org.apache.spark.sql.functions.expr("sum(x) div 100").as("h"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val d0 = daily.map(_._1).minBy(_.toEpochDay)
    val ts = daily.map { case (dy, h) =>
      (java.time.temporal.ChronoUnit.DAYS.between(d0, dy), h)
    }
    val want = (1L to 3L).map { lvl =>
      val blk = 1L << lvl
      val coefs = ts.groupBy(_._1 / blk).values.map { g =>
        g.map { case (t, h) => if (t % blk < blk / 2) h else -h }.sum
      }.toSeq
      (lvl, coefs.length.toLong, coefs.map(c => c * c).sum,
        coefs.map(math.abs).max)
    }
    val got = Temporal.haarEnergy(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe want
    // coarser levels cover the same span with ~half the windows
    got.map(_._2) shouldBe got.map(_._2).sorted.reverse
    got.foreach(_._3 should be > 0L)
  }

  "Temporal.croston (r13)" should "fold both EWMAs exactly like the sequential recurrence" in {
    val rows = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_orderpriority", "CAST(o_orderdate AS DATE) AS day",
        "CAST(round(o_totalprice) AS LONG) AS x")
      .groupBy("o_orderpriority", "day")
      .agg(org.apache.spark.sql.functions.sum("x").as("x"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate,
        r.getLong(2)))
    val d0 = rows.map(_._2).minBy(_.toEpochDay)
    val want = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (p, g) =>
      val seq0 = g.sortBy(_._2.toEpochDay).map { case (_, dy, x) =>
        (java.time.temporal.ChronoUnit.DAYS.between(d0, dy) + 1, x)
      }
      var z = 0.0; var pp = 0.0; var prev = 0L; var first = true
      seq0.foreach { case (idx, x) =>
        val gap = (idx - prev).toDouble
        if (first) { z = x.toDouble; pp = gap; first = false }
        else { z = z + 0.5 * (x - z); pp = pp + 0.5 * (gap - pp) }
        prev = idx
      }
      (p, seq0.length.toLong, math.round(z * 1e4) / 1e4,
        math.round(pp * 1e4) / 1e4, math.round(z / pp * 1e4) / 1e4)
    }
    val got = Temporal.croston(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    got shouldBe want
    // demand is dense at the priority grain: mean interval barely
    // above 1 day, so the rate tracks the demand size
    got.foreach { case (_, n, z, p, rate) =>
      n should be > 0L
      p should be >= 1.0
      rate should be <= z
    }
  }

  "Temporal.pinballLoss (r13)" should "replay the x10 integer pinball branches" in {
    val rows = Temporal.pinballLoss(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.map(_._1).toSeq shouldBe Seq(1L, 5L, 9L)
    val es = {
      val got = dailySeries.map(_._2)
      got.drop(7).zip(got.dropRight(7)).map { case (x, xf) => x - xf }
    }
    rows.foreach { case (tau10, n, sumL, mean) =>
      n shouldBe es.length.toLong
      val want = es.map(e => math.max(tau10 * e, (tau10 - 10) * e)).sum
      sumL shouldBe want
      mean shouldBe want / (10 * n)
      sumL should be >= 0L // pinball is nonnegative
    }
    // the median loss is the MAE/2 identity: tau=0.5 pinball = |e|/2
    val mae2 = es.map(e => 5L * math.abs(e)).sum
    rows.find(_._1 == 5L).get._3 shouldBe mae2
  }

  "Temporal.ljungBox (r13)" should "replay per-lag e9 terms and the Q assembly" in {
    val daily = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("CAST(o_orderdate AS DATE) AS day",
        "CAST(round(o_totalprice) AS LONG) AS x")
      .groupBy("day").agg(org.apache.spark.sql.functions.sum("x").as("x"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val d0 = daily.map(_._1).minBy(_.toEpochDay)
    val d1 = daily.map(_._1).maxBy(_.toEpochDay)
    val m = daily.toMap
    val ser = (0L to java.time.temporal.ChronoUnit.DAYS.between(d0, d1))
      .map(i => m.getOrElse(d0.plusDays(i), 0L))
    val n = ser.length.toLong
    val terms = (1 to 7).map { k =>
      val pairs = ser.dropRight(k).zip(ser.drop(k))
      val np = pairs.length.toLong
      val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val sxx = pairs.map(t => t._1 * t._1).sum
      val syy = pairs.map(t => t._2 * t._2).sum
      val sxy = pairs.map(t => t._1 * t._2).sum
      val r = (np.toDouble * sxy - sx.toDouble * sy) /
        (math.sqrt(np.toDouble * sxx - sx.toDouble * sx) *
          math.sqrt(np.toDouble * syy - sy.toDouble * sy))
      math.round(1e9 * r * r / np)
    }
    val row = Temporal.ljungBox(spark, sfDir).collect().head
    row.getLong(0) shouldBe n
    row.getLong(1) shouldBe terms.sum
    (1 to 7).foreach(k => row.getLong(1 + k) shouldBe terms(k - 1))
    val q = n.toDouble * (n + 2) * terms.sum / 1e9
    row.getDouble(9) shouldBe (math.round(q * 1e4) / 1e4) +- 1e-6
    // Q accumulates nonnegative lattice terms and lands finite
    row.getDouble(9) should be >= 0.0
    terms.foreach(_ should be >= 0L)
  }

  "Temporal.runsTest (r13)" should "replay the median dichotomy and run count" in {
    val daily = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("CAST(o_orderdate AS DATE) AS day",
        "CAST(round(o_totalprice) AS LONG) AS x")
      .groupBy("day").agg(org.apache.spark.sql.functions.sum("x").as("x"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val d0 = daily.map(_._1).minBy(_.toEpochDay)
    val d1 = daily.map(_._1).maxBy(_.toEpochDay)
    val m = daily.toMap
    val ser = (0L to java.time.temporal.ChronoUnit.DAYS.between(d0, d1))
      .map(i => m.getOrElse(d0.plusDays(i), 0L))
    val n = ser.length.toLong
    val med = ser.sorted.apply(((n + 1) / 2).toInt - 1)
    val sg = ser.map(x => if (x > med) 1L else 0L)
    val n1 = sg.sum; val n2 = n - n1
    val runs = 1L + sg.sliding(2).count(p => p(0) != p(1))
    val row = Temporal.runsTest(spark, sfDir).collect().head
    (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) shouldBe
      ((n, n1, n2, runs))
    val two12 = 2.0 * n1 * n2
    val z = (runs - (1.0 + two12 / n)) /
      math.sqrt(two12 * (two12 - n) / (n.toDouble * n * (n - 1)))
    row.getDouble(4) shouldBe (math.round(z * 1e4) / 1e4) +- 1e-9
    // both sides of the dichotomy are populated and the statistic is
    // a finite, reproducible read
    n1 should be > 0L
    n2 should be > 0L
    java.lang.Double.isFinite(row.getDouble(4)) shouldBe true
  }

  "Temporal.hurstRs (r13)" should "replay the per-block R/S lattice and H" in {
    val daily = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("CAST(o_orderdate AS DATE) AS day",
        "CAST(round(o_totalprice) AS LONG) AS x")
      .groupBy("day").agg(org.apache.spark.sql.functions.sum("x").as("x"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val d0 = daily.map(_._1).minBy(_.toEpochDay)
    val d1 = daily.map(_._1).maxBy(_.toEpochDay)
    val m = daily.toMap
    val ser = (0L to java.time.temporal.ChronoUnit.DAYS.between(d0, d1))
      .map(i => m.getOrElse(d0.plusDays(i), 0L) / 100L)
    def rsBar(w: Int): (Long, Long) = {
      val rsList = ser.grouped(w).filter(_.length == w).flatMap { blk =>
        val sBlk = blk.sum
        val ssq = blk.map(v => v * v).sum
        val varS = w * ssq - sBlk * sBlk
        if (varS <= 0) None
        else {
          val zs = blk.scanLeft(0L)(_ + _).tail.zipWithIndex
            .map { case (cum, t) => w * cum - (t + 1) * sBlk }
          Some(math.round(1e6 * (zs.max - zs.min) / math.sqrt(varS.toDouble)))
        }
      }.toSeq
      (rsList.length.toLong, rsList.sum / rsList.length)
    }
    val (n16, rs16) = rsBar(16)
    val (n32, rs32) = rsBar(32)
    val (n64, rs64) = rsBar(64)
    val row = Temporal.hurstRs(spark, sfDir).collect().head
    (row.getLong(0), row.getLong(1)) shouldBe ((n16, rs16))
    (row.getLong(2), row.getLong(3)) shouldBe ((n32, rs32))
    (row.getLong(4), row.getLong(5)) shouldBe ((n64, rs64))
    val h = math.log(rs64.toDouble / rs16) / math.log(4.0)
    row.getDouble(6) shouldBe (math.round(h * 1e6) / 1e6) +- 1e-9
    // R/S grows with window size (the scaling law the exponent reads)
    rs64 should be > rs16
    // H lands in the physical band (0, 1)
    row.getDouble(6) should (be > 0.0 and be < 1.0)
  }

  "Temporal.mannKendall" should "replay S, the tie-corrected variance, and z" in {
    val daily = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("CAST(o_orderdate AS DATE) AS day",
        "CAST(round(o_totalprice) AS LONG) AS x")
      .groupBy("day").agg(org.apache.spark.sql.functions.sum("x").as("x"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val d0 = daily.map(_._1).minBy(_.toEpochDay)
    val d1 = daily.map(_._1).maxBy(_.toEpochDay)
    val m = daily.toMap
    val ser = (0L to java.time.temporal.ChronoUnit.DAYS.between(d0, d1))
      .map(i => m.getOrElse(d0.plusDays(i), 0L))
    val n = ser.length.toLong
    var sStat = 0L
    for (i <- ser.indices; j <- (i + 1) until ser.length)
      sStat += java.lang.Long.signum(ser(j) - ser(i))
    val tieTerm = ser.groupBy(identity).values.map(_.length.toLong)
      .filter(_ > 1).map(t => t * (t - 1) * (2 * t + 5)).sum
    val var18 = n * (n - 1) * (2 * n + 5) - tieTerm
    val row = Temporal.mannKendall(spark, sfDir).collect().head
    (row.getLong(0), row.getLong(1), row.getLong(2)) shouldBe ((n, sStat, var18))
    val zc = if (sStat > 0) sStat - 1.0 else if (sStat < 0) sStat + 1.0 else 0.0
    row.getDouble(3) shouldBe
      (math.round(zc / math.sqrt(var18 / 18.0) * 1e4) / 1e4) +- 1e-9
    // the gap-filled zero days are one big tie group: correction binds
    tieTerm should be > 0L
    var18 should be > 0L
  }

  "Temporal.newReturning" should "replay the acquisition split and conserve actives" in {
    val cm = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_custkey", "date_format(o_orderdate, 'yyyy-MM') AS month")
      .distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val first = cm.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val want = cm.groupBy(_._2).toSeq.sortBy(_._1).map { case (m, g) =>
      val nNew = g.count { case (c, _) => first(c) == m }.toLong
      (m, g.length.toLong, nNew, g.length - nNew)
    }
    val got = Temporal.newReturning(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe want
    got.foreach { case (_, a, nw, rt) => nw + rt shouldBe a }
    got.head._4 shouldBe 0L // the first month is all acquisition
    got.last._3 should be < got.last._2 // the tail has genuine returners
  }

  "Temporal.xbarControl" should "replay the frozen-baseline zone census" in {
    import org.apache.spark.sql.functions._
    // driver-side gap-filled daily series (same derivation as the op)
    val daily = graft.io.Sources.orders(spark, sfDir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice")).cast("long")).as("x"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1))).toMap
    val d0 = daily.keys.min
    val d1 = daily.keys.max
    val ser = Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1))
      .zipWithIndex.map { case (d, i) => (i.toLong, daily.getOrElse(d, 0L)) }
      .toSeq
    val base = ser.filter(_._1 < 30).map(_._2)
    val (n, s1, s2) = (base.length.toLong, base.sum, base.map(x => x * x).sum)
    val varS = (s2.toDouble / n - (s1.toDouble / n) * (s1.toDouble / n)) *
      (n.toDouble / (n - 1).toDouble)
    val zoned = ser.map { case (_, x) =>
      val z6 = BigDecimal(1e6 * (x.toDouble - s1.toDouble / n) /
        math.sqrt(varS)).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      val side = if (z6 >= 0) "hi" else "lo"
      val zone =
        if (math.abs(z6) >= 3000000L) "beyond_3s"
        else if (math.abs(z6) >= 2000000L) "zone_a"
        else if (math.abs(z6) >= 1000000L) "zone_b"
        else "zone_c"
      (side, zone, x)
    }
    val cen = zoned.groupBy(t => (t._1, t._2))
      .map { case (k, g) => k -> (g.size.toLong, g.map(_._3).sum) }
    val want = for {
      sd <- Seq("hi", "lo")
      zn <- Seq("beyond_3s", "zone_a", "zone_b", "zone_c")
    } yield {
      val (nd, sx) = cen.getOrElse((sd, zn), (0L, 0L))
      (sd, zn, nd, sx)
    }
    val got = Temporal.xbarControl(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    got shouldBe want
    got.length shouldBe 8 // the literal domain always publishes 8 zones
    got.map(_._3).sum shouldBe ser.length.toLong // every day zoned once
  }

  "Temporal.markovHitting" should "replay 8 fixed-point first-step rounds exactly" in {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val evs = graft.io.Sources.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = evs.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val sorted = g.sortBy(t => (t._2, t._3)).map(_._4).toSeq
      sorted.sliding(2).collect { case Seq(a, b) => (a, b) }
    }
    val counts = trans.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rowTot = counts.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val pm = counts.map { case ((a, b), n) =>
      (a, b, n * 1000000L / rowTot(a))
    }.toSeq
    val states = pm.map(_._1).distinct.sorted
    var h: Map[String, Long] = states.map(_ -> 0L).toMap
    for (_ <- 1 to 8) {
      h = states.map { st =>
        st -> (if (st == "purchase") 0L
        else 1000000L + pm.filter(_._1 == st)
          .map(t => t._3 * h.getOrElse(t._2, 0L)).sum / 1000000L)
      }.toMap
    }
    val want = states.map(st =>
      (st, pm.filter(_._1 == st).map(_._3).sum, h(st)))
    val got = Temporal.markovHitting(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe want
    // the absorbing target reports zero; every other state needs at
    // least one full step; row mass is an e6 floor of 1
    got.find(_._1 == "purchase").get._3 shouldBe 0L
    got.filter(_._1 != "purchase").foreach(_._3 should be >= 1000000L)
    got.foreach(_._2 should (be >= 999990L and be <= 1000000L))
  }

  "Temporal.holtWintersFrozen" should "replay the triple-smoothing fold step for step" in {
    import org.apache.spark.sql.functions._
    val daily = graft.io.Sources.orders(spark, sfDir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice")).cast("long")).as("x"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1))).toMap
    val d0 = daily.keys.min
    val d1 = daily.keys.max
    val xs = Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1))
      .map(d => daily.getOrElse(d, 0L).toDouble).toArray
    def e2(v: Double) = BigDecimal(v)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val l0 = xs.take(7).sum / 7.0
    var (l, b) = (l0, 0.0)
    val sA = Array.tabulate(7)(j => xs(j) - l0)
    var (sumAbs, maxAbs, n) = (0L, 0L, 0L)
    for (t <- 7 until xs.length) {
      val j = t % 7
      val err = e2((xs(t) - (l + b + sA(j))) * 100.0)
      sumAbs += math.abs(err); maxAbs = math.max(maxAbs, math.abs(err)); n += 1
      val lN = 0.5 * (xs(t) - sA(j)) + 0.5 * (l + b)
      b = 0.25 * (lN - l) + 0.75 * b
      sA(j) = 0.25 * (xs(t) - lN) + 0.75 * sA(j)
      l = lN
    }
    val got = Temporal.holtWintersFrozen(spark, sfDir).head()
    (got.getLong(0), got.getLong(1), got.getLong(2)) shouldBe ((n, sumAbs, maxAbs))
    got.getLong(3) shouldBe e2(l * 100.0)
    got.getLong(4) shouldBe e2(b * 100.0)
    // every post-init step is scored exactly once
    n shouldBe (xs.length - 7).toLong
    maxAbs should be <= sumAbs
  }

  "Temporal.anomalyMad" should "replay the modified-z census from nearest-rank picks" in {
    import org.apache.spark.sql.functions._
    val daily = graft.io.Sources.orders(spark, sfDir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice")).cast("long")).as("x"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1))).toMap
    val d0 = daily.keys.min
    val d1 = daily.keys.max
    val xs = Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1))
      .map(d => daily.getOrElse(d, 0L)).toArray
    val nd = xs.length.toLong
    def pick(v: Array[Long]): Long = v.sorted.apply(((nd + 1) / 2 - 1).toInt)
    val med = pick(xs)
    val mad = pick(xs.map(x => math.abs(x - med)))
    def m6(x: Long): Long =
      if (mad > 0) BigDecimal(1e6 * 0.6745 * (x - med).toDouble / mad.toDouble)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      else 0L
    val flagged = xs.filter(x => math.abs(m6(x)) > 3500000L)
    val got = Temporal.anomalyMad(spark, sfDir).head()
    (got.getLong(0), got.getLong(1), got.getLong(2)) shouldBe ((nd, med, mad))
    got.getLong(3) shouldBe flagged.length.toLong
    got.getLong(4) shouldBe xs.map(x => math.abs(m6(x))).max
    got.getLong(5) shouldBe flagged.sum
    // at sf0.001 the gap-filled series is majority-zero, so the
    // median/MAD collapse to 0 — the CLASSIC MAD failure mode — and
    // the guard must neutralize every score; on dense series (sf0.01+,
    // where the oracle gates it) MAD is positive and below the spread
    if (mad == 0) {
      got.getLong(3) shouldBe 0L
      got.getLong(4) shouldBe 0L
    } else mad should be < (xs.max - xs.min)
  }

  "Temporal.chainLadder" should "replay the censored-triangle factors" in {
    import org.apache.spark.sql.functions._
    val rows = graft.io.Sources.lineitem(spark, sfDir)
      .join(graft.io.Sources.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .selectExpr("CAST(year(o_orderdate) AS LONG) AS origin",
        "CAST(year(l_shipdate) * 12 + month(l_shipdate)" +
          " - year(o_orderdate) * 12 - month(o_orderdate) AS LONG) AS lag",
        "CAST(round(l_extendedprice * 100) AS LONG) AS cents",
        "CAST(l_shipdate AS DATE) AS sd")
      .collect()
      .map(r => (r.getLong(0), math.max(0L, math.min(5L, r.getLong(1))),
        r.getLong(2), r.getDate(3).toLocalDate))
    val asOf = rows.map(_._4).maxBy(_.toEpochDay)
    val inc = rows.groupBy(r => (r._1, r._2)).view
      .mapValues(_.map(_._3).sum).toMap
    val origins = rows.map(_._1).distinct
    // a cumulative ROW exists only where the incremental bucket does
    // (the engine's window runs over present buckets), and survives
    // only if its development window closed before the as-of date
    val cellMap = (for {
      (o, j) <- inc.keys.toSeq
      if !java.time.LocalDate.of((o + 1).toInt, 1, 1).plusMonths(j)
        .isAfter(asOf)
    } yield ((o, j),
      (0L to j).map(jj => inc.getOrElse((o, jj), 0L)).sum)).toMap
    val want = (0L to 4L).flatMap { j =>
      val pairs = origins.flatMap { o =>
        for {
          a <- cellMap.get((o, j)); b <- cellMap.get((o, j + 1))
        } yield (a, b)
      }
      if (pairs.isEmpty) None
      else Some((j, pairs.length.toLong, pairs.map(_._1).sum,
        pairs.map(_._2).sum,
        pairs.map(_._2).sum * 1000000L / pairs.map(_._1).sum))
    }
    val got = Temporal.chainLadder(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    got shouldBe want
    // development factors are >= 1e6: cumulatives only grow
    got.foreach(_._5 should be >= 1000000L)
  }
}
