package graft.ops

import graft.SparkSpec

/** Certifies the in-engine ML layer against ground truth: the linear
  * solver against a hand-checked system, OLS against an exact synthetic
  * fit, and the IRLS trainer against the PLANTED teacher model (the
  * label is simulated from known weights, so recovery — not just
  * convergence — is checkable).
  */
class MlSpec extends SparkSpec {

  "solve" should "invert a hand-checked 3x3 system" in {
    // [2 1 0; 1 3 1; 0 1 2] x = [4 10 8] -> x = (1, 2, 3)
    val x = Ml.solve(
      Array(Array(2.0, 1.0, 0.0), Array(1.0, 3.0, 1.0), Array(0.0, 1.0, 2.0)),
      Array(4.0, 10.0, 8.0))
    x(0) shouldBe 1.0 +- 1e-12
    x(1) shouldBe 2.0 +- 1e-12
    x(2) shouldBe 3.0 +- 1e-12
  }

  "linearFit" should "recover an exact linear relation" in {
    import spark.implicits._
    val df = (1 to 20).map(i => ("B", i, 2.0 * i + 1.0))
      .toDF("p_brand", "p_size", "p_retailprice")
    val tmp = tmpDir("mlols")
    df.write.parquet(s"$tmp/part.parquet")
    val fit = Ml.linearFit(spark, tmp).collect().head
    fit.getAs[Double]("slope") shouldBe 2.0 +- 1e-9
    fit.getAs[Double]("intercept") shouldBe 1.0 +- 1e-9
    fit.getAs[Double]("r2") shouldBe 1.0 +- 1e-9
    fit.getAs[Long]("n") shouldBe 20L
  }

  it should "produce bounded diagnostics on the fixture" in {
    val rows = Ml.linearFit(spark, sfDir).collect()
    rows should not be empty
    all(rows.map(_.getAs[Double]("r2"))) should (be >= 0.0 and be <= 1.0)
    all(rows.map(_.getAs[Long]("n"))) should be > 0L
  }

  behavior of "IRLS training"

  private lazy val trained = Ml.train(spark, "/root/testdata/sf0.01")

  it should "decrease the log-loss monotonically" in {
    val (_, losses, iters) = trained
    iters should be <= 25
    losses.size should be >= 3
    losses.sliding(2).foreach { case Seq(a, b) => b should be < a }
  }

  it should "recover the planted teacher weights" in {
    val (beta, _, _) = trained
    // finite-sample recovery: signs match the teacher everywhere and
    // the two dominant coordinates land in the teacher's neighborhood
    beta.zip(Ml.teacher).foreach { case (b, t) => math.signum(b) shouldBe math.signum(t) }
    beta(3) shouldBe Ml.teacher(3) +- 8.0 // stop_ratio 25.0
    beta(1) shouldBe Ml.teacher(1) +- 1.5 // log_len 3.0
  }

  it should "train deterministically" in {
    val (b1, _, _) = Ml.train(spark, "/root/testdata/sf0.01")
    b1.toSeq shouldBe trained._1.toSeq
  }

  behavior of "logreg scoring"

  it should "beat the base rate by a clear margin on the planted labels" in {
    val r = Ml.logregEval(spark, "/root/testdata/sf0.01").collect().head
    val base = math.max(r.getAs[Double]("base_rate"), 1.0 - r.getAs[Double]("base_rate"))
    r.getAs[Double]("accuracy") should be > base + 0.10
    (r.getAs[Long]("tp") + r.getAs[Long]("fp") +
      r.getAs[Long]("tn") + r.getAs[Long]("fn")) shouldBe r.getAs[Long]("n")
  }

  it should "emit calibrated-range scores with a consistent threshold" in {
    val rows = Ml.logregScore(spark, "/root/testdata/sf0.01").collect()
    rows.length shouldBe 500
    all(rows.map(_.getAs[Double]("score"))) should (be >= 0.0 and be <= 1.0)
    rows.foreach { r =>
      r.getAs[Long]("pred") shouldBe (if (r.getAs[Double]("score") >= 0.5) 1L else 0L)
    }
  }

  it should "produce a structurally sound calibration table" in {
    val scored = Ml.logregScore(spark, "/root/testdata/sf0.01").collect()
    val rows = Ml.logregCalibration(spark, "/root/testdata/sf0.01").collect()
    rows.map(_.getAs[Long]("bucket")).toSeq shouldBe rows.map(_.getAs[Long]("bucket")).toSeq.sorted
    all(rows.map(_.getAs[Long]("bucket"))) should (be >= 0L and be <= 9L)
    rows.map(_.getAs[Long]("n")).sum shouldBe scored.length.toLong
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val mp = r.getAs[Double]("mean_pred")
      // bucket 9 also absorbs score = 1.0 exactly
      mp should (be >= b / 10.0 and be <= (b + 1) / 10.0)
      r.getAs[Double]("obs_rate") should (be >= 0.0 and be <= 1.0)
      r.getAs[Long]("n_pos") should be <= r.getAs[Long]("n")
    }
    // replay the bucketing from the scored rows: counts must agree
    val want = scored.groupBy { r =>
      math.min((r.getAs[Double]("score") * 10).toInt, 9).toLong
    }.view.mapValues(_.length.toLong).toMap
    rows.map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("n")).toMap shouldBe want
  }

  "Ml.isotonicFrozen" should "equal the literal sequential PAVA pooling" in {
    val rows = Ml.isotonicFrozen(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    rows should not be empty
    // reference: textbook pool-adjacent-violators on (n, pos) buckets,
    // exact rational pools compared by cross-multiplication
    case class Pool(var n: Long, var pos: Long)
    val pools = scala.collection.mutable.ArrayBuffer[Pool]()
    val sizes = scala.collection.mutable.ArrayBuffer[Int]()
    rows.foreach { case (_, n, pos, _) =>
      pools += Pool(n, pos); sizes += 1
      while (pools.length > 1 && {
        val a = pools(pools.length - 2); val b = pools.last
        a.pos * b.n > b.pos * a.n // violator: rate drops
      }) {
        val b = pools.remove(pools.length - 1)
        pools.last.n += b.n; pools.last.pos += b.pos
        val s = sizes.remove(sizes.length - 1)
        sizes(sizes.length - 1) += s
      }
    }
    val pava = pools.iterator.zip(sizes.iterator).flatMap { case (p, s) =>
      Iterator.fill(s)((p.pos, p.n))
    }.toSeq
    // iso_e9 must be floor(1e9 * pooled rate) bucket by bucket
    rows.map(_._4) shouldBe pava.map { case (pos, n) => pos * 1000000000L / n }
    // and non-decreasing (the whole point of the fit)
    rows.map(_._4).sliding(2).foreach {
      case Array(a, b) => a should be <= b
      case _ => ()
    }
  }

  it should "serve weights from the persisted model table" in {
    val w1 = Ml.logregWeights(spark, "/root/testdata/sf0.01").collect()
    w1.length shouldBe 5
    // second call must serve from the table (ensureDf's thunk would
    // throw if re-entered after persistence — see Ml.logregWeights)
    val w2 = Ml.logregWeights(spark, "/root/testdata/sf0.01").collect()
    w2.map(_.getAs[Double]("weight")).toSeq shouldBe w1.map(_.getAs[Double]("weight")).toSeq
  }

  behavior of "Ml.decisionStump (r13)"

  it should "match a brute-force exhaustive split scan" in {
    val rows = Ml.featurized(spark, sfDir).select("doc_id", "y")
      .join(spark.read.parquet(s"$sfDir/documents.parquet")
        .selectExpr("doc_id", "CAST(n_chars AS LONG) AS nchars",
          "CAST(size(split(text, ' ')) AS LONG) AS nwords"), "doc_id")
      .selectExpr("CAST(y AS LONG) AS y", "nchars", "nwords")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nTot = rows.length.toLong
    val posTot = rows.map(_._1).sum
    val cands = Seq("nchars" -> rows.map(r => (r._1, r._2)),
        "nwords" -> rows.map(r => (r._1, r._3)))
      .flatMap { case (feat, fv) =>
        fv.map(_._2).distinct.sorted.dropRight(1).map { t =>
          val l = fv.filter(_._2 <= t)
          val nL = l.length.toLong
          val posL = l.map(_._1).sum
          val nR = nTot - nL
          val posR = posTot - posL
          val errs = math.min(posL, nL - posL) + math.min(posR, nR - posR)
          (errs, feat, t, nL, posL, nR, posR)
        }
      }
    val best = cands.minBy(c => (c._1, c._2, c._3))
    val got = Ml.decisionStump(spark, sfDir).collect()(0)
    (got.getLong(6), got.getString(0), got.getLong(1), got.getLong(2),
      got.getLong(3), got.getLong(4), got.getLong(5)) shouldBe
      (best._1, best._2, best._3, best._4, best._5, best._6, best._7)
    // the high-value label genuinely correlates with quantity: the
    // stump must beat always-predict-majority
    got.getLong(6) should be < got.getLong(7)
  }

  behavior of "Ml.liftDeciles (r13)"

  it should "hold the gain-curve invariants" in {
    val rows = Ml.liftDeciles(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    rows.map(_._1).toSeq shouldBe (1L to 10L)
    // equal-width rank deciles: sizes differ by at most 1
    val sizes = rows.map(_._2)
    (sizes.max - sizes.min) should be <= 1L
    // counts reconcile with the corpus
    val n = spark.read.parquet(s"$sfDir/documents.parquet").count()
    sizes.sum shouldBe n
    // cumulative gain is nondecreasing and ends at 1
    val gains = rows.map(_._6).toSeq
    gains.zip(gains.tail).foreach { case (a, b) => b should be >= a }
    gains.last shouldBe 1.0 +- 1e-9
    // the model ranks: top decile lifts above 1, bottom below
    rows.head._5 should be > 1.0
    rows.last._5 should be < 1.0
  }

  "Ml.permImportanceFrozen" should "replay all five AUCs through the cyclic-shift permutation" in {
    val teacher = Array(-16.0, 3.0, -1.2, 25.0, 6.0)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    val n = docs.length
    val feats = docs.map { case (id, nc, text) =>
      val ws = text.split(" ", -1)
      val nt = ws.length.toDouble
      val f = Array(1.0, math.log1p(nc.toDouble), (nc - (nt - 1)) / nt,
        ws.count(t => t == "a" || t == "the") / nt,
        ws.distinct.length / nt)
      val eta = (0 until 5).map(i => f(i) * teacher(i)).sum
      val u = ((id * 2654435761L) % 4294967296L).toDouble / 4294967296.0
      val y = if (u < 1.0 / (1.0 + math.exp(-eta))) 1L else 0L
      (id, f, y)
    }
    val byId = feats.map(t => t._1 -> t._2).toMap
    def aucE6(scored: Seq[(Long, Long)]): Long = {
      // tie-aware U over the score lattice
      val by = scored.groupBy(_._1).toSeq.sortBy(_._1).map { case (sc, g) =>
        (sc, g.count(_._2 == 1L).toLong, g.count(_._2 == 0L).toLong)
      }
      var cum = 0L; var u2 = 0L; var p = 0L; var ng = 0L
      by.foreach { case (_, pos, neg) =>
        u2 += pos * cum * 2 + pos * neg
        cum += neg; p += pos; ng += neg
      }
      u2 * 500000L / (p * ng)
    }
    def scoreWith(j: Int): Seq[(Long, Long)] = feats.toSeq.map { case (id, f, y) =>
      // donors are re-keyed +17, so recipient id draws donor id-17
      val g = byId((id - 17 + n) % n)
      val eta = (0 until 5).map { i =>
        (if (i == j) g(i) else f(i)) * teacher(i)
      }.foldLeft(0.0)(_ + _)
      (math.round(1000000.0 * (1.0 / (1.0 + math.exp(-eta)))), y)
    }
    val base = aucE6(scoreWith(-1))
    val names = Seq("log_len", "avg_tok_len", "stop_ratio", "type_token_ratio")
    val want = names.zipWithIndex.map { case (nm, i) =>
      val perm = aucE6(scoreWith(i + 1))
      (nm, base, perm, base - perm)
    }.sortBy(_._1)
    val got = Ml.permImportanceFrozen(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe want
    // the effectively-dominant feature (weight x variance) shows the
    // largest AUC drop on this fixture: log_len
    got.maxBy(_._4)._1 shouldBe "log_len"
    got.foreach(t => t._2 should be >= 500000L)
  }

  "Ml.conformalFrozen" should "replay the conformal order statistic and hit ~90% coverage" in {
    val items = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_orderkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_orderkey", "CAST(round(o_totalprice) AS LONG) AS y")
      .collect().flatMap { r =>
        items.get(r.getLong(0)).map { x =>
          val calib = ((r.getLong(0) % 1048576L) * 2654435761L) % 2L == 0L
          (calib, math.abs(r.getLong(1) - 3600L * x))
        }
      }
    val calibR = rows.filter(_._1).map(_._2).sorted
    val nc = calibR.length.toLong
    val k = ((nc + 1) * 9 + 9) / 10
    val q = calibR((k - 1).toInt)
    val test = rows.filterNot(_._1).map(_._2)
    val covered = test.count(_ <= q).toLong
    val row = Ml.conformalFrozen(spark, sfDir).collect().head
    row.getLong(0) shouldBe nc
    row.getLong(1) shouldBe k
    row.getLong(2) shouldBe q
    row.getLong(3) shouldBe test.length.toLong
    row.getLong(4) shouldBe covered
    row.getLong(5) shouldBe covered * 1000000L / test.length
    // the distribution-free guarantee: coverage lands near the 90% target
    row.getLong(5) should (be > 850000L and be < 960000L)
  }

  /** Replay of the planted Knuth-hash teacher over orders: (cents, label). */
  private def plantedReplay: Array[(Long, Long)] =
    graft.io.Sources.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice").collect().map { r =>
        val cents = math.round(r.getDouble(1) * 100)
        val u = ((r.getLong(0) * 2654435761L) % 4294967296L) % 1000000L
        val label = if (u < math.min(100000L + cents / 100, 900000L)) 1L else 0L
        (cents, label)
      }

  behavior of "Ml.shapLinearFrozen (r13)"

  it should "replay the closed form and satisfy the efficiency axiom" in {
    val items = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_orderkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val rows = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_orderkey", "o_totalprice", "o_orderpriority",
        "CAST(o_orderdate AS DATE) AS dt")
      .collect().flatMap { r =>
        items.get(r.getLong(0)).map { x3 =>
          Array(math.round(r.getDouble(1) * 100) / 1000000L,
            prios.indexOf(r.getString(2)).toLong,
            (r.getDate(3).toLocalDate.toEpochDay + 4) % 7, x3)
        }
      }
    val n = rows.length.toLong
    val w = Seq(3L, -5L, 2L, 7L)
    val sums = (0 until 4).map(i => rows.map(_(i)).sum)
    val absM = (0 until 4).map(i =>
      rows.map(r => math.abs(w(i) * (n * r(i) - sums(i)))).sum)
    val got = Ml.shapLinearFrozen(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val byName = got.map(t => t._1 -> t).toMap
    Seq(("value_10k", 0), ("prio_idx", 1), ("weekday", 2), ("n_items", 3))
      .foreach { case (nm, i) =>
        val t = byName(nm)
        t._2 shouldBe w(i)
        t._3 shouldBe sums(i)
        t._4 shouldBe n
        t._5 shouldBe absM(i)
        t._6 shouldBe absM(i) * 10000L / absM.sum
      }
    // efficiency axiom on the scaled lattice, checked on 5 rows:
    // sum_i w_i (n x_i - S_i) = n*eta(x) - sum_rows eta
    val etaSum = rows.map(r => (0 until 4).map(i => w(i) * r(i)).sum).sum
    rows.take(5).foreach { r =>
      val phiSum = (0 until 4).map(i => w(i) * (n * r(i) - sums(i))).sum
      val eta = (0 until 4).map(i => w(i) * r(i)).sum
      phiSum shouldBe n * eta - etaSum
    }
  }

  behavior of "Ml.cohensKappa (r13)"

  it should "replay the exact-integer kappa assembly" in {
    val cells = plantedReplay.map { case (cents, label) =>
      (label, if (cents >= 10000000L) 1L else 0L) }
    val a = cells.count(t => t._1 == 1 && t._2 == 1).toLong
    val b = cells.count(t => t._1 == 1 && t._2 == 0).toLong
    val c = cells.count(t => t._1 == 0 && t._2 == 1).toLong
    val dd = cells.count(t => t._1 == 0 && t._2 == 0).toLong
    val n = a + b + c + dd
    val m = (a + b) * (a + c) + (c + dd) * (b + dd)
    val row = Ml.cohensKappa(spark, sfDir).collect().head
    (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) shouldBe
      ((a, b, c, dd))
    row.getLong(4) shouldBe n
    row.getLong(5) shouldBe (1000000L * (n * (a + dd))) / (n * n)
    row.getLong(6) shouldBe (1000000L * m) / (n * n)
    row.getLong(7) shouldBe (1000000L * (n * (a + dd) - m)) / (n * n - m)
    // kappa is strictly below raw accuracy (chance correction binds) and
    // strictly positive (the raters genuinely correlate on the fixture)
    row.getLong(7) should be < row.getLong(5)
    row.getLong(7) should be > 0L
  }

  behavior of "Ml.regressionMetrics (r13)"

  it should "replay the per-row metric lattices and the mirrored finishes" in {
    val items = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("l_orderkey").collect().map(_.getLong(0))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val xy = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_orderkey", "CAST(round(o_totalprice * 100) AS LONG) div 100 AS y")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(t => items.contains(t._1))
      .map { case (k, y) => (items(k), y) }
    val n = xy.length.toLong
    val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
    val sxx = xy.map(t => t._1 * t._1).sum
    val syy = xy.map(t => t._2 * t._2).sum
    val sxy = xy.map(t => t._1 * t._2).sum
    val xb = sx.toDouble / n; val yb = sy.toDouble / n
    val b = (sxy - n * xb * yb) / (sxx - n * xb * xb)
    val es = xy.map { case (x, y) => (y.toDouble - (yb - b * xb) - b * x, y) }
    val sumAbs = es.map(t => math.round(math.abs(t._1))).sum
    val sumSq = es.map(t => math.round(t._1 * t._1)).sum
    val sumApe = es.map(t => math.round(1e6 * math.abs(t._1) / t._2)).sum
    val row = Ml.regressionMetrics(spark, sfDir).collect().head
    (row.getLong(0), row.getLong(1), row.getLong(2)) shouldBe ((n, sumAbs, sumSq))
    row.getLong(3) shouldBe sumAbs / n
    row.getDouble(4) shouldBe
      (math.round(math.sqrt(sumSq.toDouble / n) * 1e4) / 1e4) +- 1e-9
    val r2 = 1.0 - sumSq.toDouble / (syy - sy.toDouble * sy / n)
    row.getDouble(5) shouldBe (math.round(r2 * 1e6) / 1e6) +- 1e-9
    row.getLong(6) shouldBe sumApe / n
    // the fit is honest: R2 in [0, 1) (at sf0.001 basket size explains
    // little of the price variance - the metric reports that truthfully)
    row.getDouble(5) should (be >= 0.0 and be < 1.0)
    row.getLong(3) should be > 0L
  }

  behavior of "Ml.cooksDistance (r13)"

  it should "replay the OLS influence ranking on the e9 lattice" in {
    val items = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("l_orderkey").collect().map(_.getLong(0))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_orderkey", "CAST(round(o_totalprice * 100) AS LONG) div 100 AS y")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(t => items.contains(t._1))
    val xy = orders.map { case (k, y) => (k, items(k), y) }
    val n = xy.length.toLong
    val (sx, sxx) = (xy.map(_._2).sum, xy.map(t => t._2 * t._2).sum)
    val (sy, syy) = (xy.map(_._3).sum, xy.map(t => t._3 * t._3).sum)
    val sxy = xy.map(t => t._2 * t._3).sum
    val xb = sx.toDouble / n; val yb = sy.toDouble / n
    val sxxc = sxx.toDouble - n * xb * xb
    val sxyc = sxy.toDouble - n * xb * yb
    val syyc = syy.toDouble - n * yb * yb
    val b = sxyc / sxxc
    val s2 = (syyc - b * sxyc) / (n - 2).toDouble
    val scored = xy.map { case (k, x, y) =>
      val e = y.toDouble - (yb - b * xb) - b * x
      val h = 1.0 / n + (x - xb) * (x - xb) / sxxc
      (k, x, y, math.round(1e9 * e * e * h / (2.0 * s2 * (1 - h) * (1 - h))))
    }
    val want = scored.sortBy(t => (-t._4, t._1)).take(20).toSeq
    val got = Ml.cooksDistance(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe want
    // influence concentrates: the head dominates the 20th entry
    got.head._4 should be > got.last._4
  }

  behavior of "Stats.ksSeparation (r13)"

  it should "replay the exact KS numerator and the argmax threshold" in {
    val scored = plantedReplay
    val byScore = scored.groupBy(_._1).toSeq.sortBy(_._1).map { case (c, g) =>
      (c, g.count(_._2 == 1L).toLong, g.count(_._2 == 0L).toLong)
    }
    val p = byScore.map(_._2).sum; val n = byScore.map(_._3).sum
    var (cp, cn) = (0L, 0L)
    val diffs = byScore.map { case (c, pos, neg) =>
      cp += pos; cn += neg; (c, math.abs(cp * n - cn * p))
    }
    val dnum = diffs.map(_._2).max
    val thr = diffs.filter(_._2 == dnum).map(_._1).min
    val row = graft.ops.Stats.ksSeparation(spark, sfDir).collect().head
    (row.getLong(0), row.getLong(1), row.getLong(2)) shouldBe ((p, n, dnum))
    row.getLong(3) shouldBe 1000000L * dnum / (p * n)
    row.getLong(4) shouldBe thr
    // the scorer genuinely separates (KS well above noise) but is not
    // perfect (below 1)
    row.getLong(3) should (be > 100000L and be < 1000000L)
  }

  behavior of "Ml.treeDepth2 (r13)"

  it should "replay the greedy two-level split trajectory" in {
    // brute-force the teacher label + features exactly as featurized()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "n_chars", "text").collect()
      .map { r =>
        val id = r.getLong(0); val nc = r.getLong(1)
        val ws = r.getString(2).split(" ", -1)
        val nt = ws.length.toDouble
        val f1 = math.log1p(nc.toDouble)
        val f2 = (nc.toDouble - (nt - 1)) / nt
        val f3 = ws.count(t => t == "a" || t == "the") / nt
        val f4 = ws.distinct.length / nt
        val eta = -16.0 + f1 * 3.0 + f2 * -1.2 + f3 * 25.0 + f4 * 6.0
        val mu = 1.0 / (1.0 + math.exp(-eta))
        val u = ((id * 2654435761L) % 4294967296L).toDouble / 4294967296.0
        (if (u < mu) 1L else 0L, nc, ws.length.toLong)
      }
    def best(rows: Seq[(Long, Long, Long)]): (String, Long, Long) = {
      val cands = Seq("nchars", "nwords").flatMap { f =>
        val vals = rows.map(r => (if (f == "nchars") r._2 else r._3, r._1))
        val nTot = vals.length.toLong; val posTot = vals.map(_._2).sum
        vals.map(_._1).distinct.sorted.dropRight(1).map { thr =>
          val l = vals.filter(_._1 <= thr)
          val (nL, pL) = (l.length.toLong, l.map(_._2).sum)
          val (nR, pR) = (nTot - nL, posTot - pL)
          val err = math.min(pL, nL - pL) + math.min(pR, nR - pR)
          (err, f, thr)
        }
      }
      val (e, f, t) = cands.minBy(c => (c._1, c._2, c._3))
      (f, t, e)
    }
    val (rf, rt, rerr) = best(docs.toSeq)
    val (lRows, rRows) = docs.toSeq.partition(r =>
      (if (rf == "nchars") r._2 else r._3) <= rt)
    val (lf, lt, lerr) = best(lRows)
    val (rf2, rt2, rerr2) = best(rRows)
    val got = Ml.treeDepth2(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    got.map(_._1) shouldBe Seq("L", "R", "root")
    val byNode = got.map(t => t._1 -> t).toMap
    (byNode("root")._2, byNode("root")._3, byNode("root")._6) shouldBe
      ((rf, rt, rerr))
    (byNode("L")._2, byNode("L")._3, byNode("L")._6) shouldBe ((lf, lt, lerr))
    (byNode("R")._2, byNode("R")._3, byNode("R")._6) shouldBe
      ((rf2, rt2, rerr2))
    byNode("L")._4 shouldBe lRows.length.toLong
    byNode("R")._4 shouldBe rRows.length.toLong
    // greedy depth-2 cannot be worse than depth-1 on the training set
    (byNode("L")._6 + byNode("R")._6) should be <= byNode("root")._6
    // and the root split genuinely beats the majority-class baseline
    byNode("root")._6 should be < byNode("root")._7
  }

  behavior of "Ml.mccThreshold (r13)"

  it should "replay the confusion cells and the four-factor mcc at both thresholds" in {
    val rows = Ml.mccThreshold(spark, sfDir).collect()
    rows.map(_.getLong(0)).toSeq shouldBe Seq(10000000L, 20000000L)
    rows.foreach { row =>
      val thr = row.getLong(0)
      val cells = plantedReplay.map { case (cents, label) =>
        (label, if (cents >= thr) 1L else 0L) }
      val a = cells.count(t => t._1 == 1 && t._2 == 1).toLong
      val b = cells.count(t => t._1 == 1 && t._2 == 0).toLong
      val c = cells.count(t => t._1 == 0 && t._2 == 1).toLong
      val dd = cells.count(t => t._1 == 0 && t._2 == 0).toLong
      (row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4)) shouldBe
        ((a, b, c, dd))
      row.getLong(5) shouldBe a * dd - b * c
      val mcc = (a * dd - b * c).toDouble /
        (math.sqrt((a + b).toDouble) * math.sqrt((a + c).toDouble) *
          math.sqrt((dd + b).toDouble) * math.sqrt((dd + c).toDouble))
      row.getDouble(6) shouldBe (math.round(mcc * 1e6) / 1e6) +- 1e-9
      // the planted teacher correlates with price, so any price
      // threshold rater lands strictly inside (0, 1)
      row.getDouble(6) should be > 0.0
      row.getDouble(6) should be < 1.0
    }
    // MCC and kappa must agree in sign at the shared $100k threshold
    val kappa = Ml.cohensKappa(spark, sfDir).collect().head.getLong(7)
    (rows.head.getDouble(6) > 0) shouldBe (kappa > 0)
  }

  behavior of "Ml.brierDecomposition (r13)"

  it should "satisfy the Murphy identity REL - RES + UNC = BS on the lattice" in {
    val rows = Ml.brierDecomposition(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    rows.length should be > 2
    val n = rows.map(_._2).sum
    val p = rows.map(_._3).sum
    val bs = rows.map(_._7).sum.toDouble / (400.0 * n)
    val rel = rows.map(_._5).sum.toDouble / 1e9
    val res = rows.map(_._6).sum.toDouble / 1e9
    val oBar = p.toDouble / n
    val unc = oBar * (1.0 - oBar)
    (rel - res + unc) shouldBe bs +- 1e-6
    // resolution is strictly positive: the planted rate rises with price
    res should be > 0.0
    // per-bin replay of one bin's REL term
    val (bin, nk, pk, fe3, relE9, _, _) = rows.head
    fe3 shouldBe (2 * bin + 1) * 50
    val aa = ((2 * bin + 1) * nk - 20 * pk).toDouble
    relE9 shouldBe math.round(aa * aa * 1e9 / (nk.toDouble * 400.0 * n.toDouble))
  }

  behavior of "Ml.ridgeFrozen (r13)"

  it should "shrink every brand's slope strictly toward zero" in {
    val rows = Ml.ridgeFrozen(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    rows.length should be > 10
    rows.foreach { case (brand, n, sxy, sxx, ridge, ols) =>
      withClue(s"brand $brand") {
        sxx should be > 0L
        // shrinkage binds: |ridge| < |ols| whenever the fit is nonzero
        if (sxy != 0L) math.abs(ridge) should be < math.abs(ols)
        // replay the closed form
        ridge shouldBe math.round(sxy.toDouble /
          (sxx.toDouble + 50.0 * n.toDouble * n.toDouble) * 1e6) / 1e6 +- 1e-9
      }
    }
  }

  "Ml.mcnemar (r13)" should "count discordant pairs per the paired-test definition" in {
    val rows = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_totalprice").collect()
      .map { r =>
        val cents = math.round(r.getDouble(1) * 100)
        val u = ((r.getLong(0) * 2654435761L) % 4294967296L) % 1000000L
        val label = if (u < math.min(100000L + cents / 100, 900000L)) 1L else 0L
        val pa = if (cents >= 10000000L) 1L else 0L
        val pb = if (cents >= 5000000L) 1L else 0L
        (label, pa, pb)
      }
    val b = rows.count(t => t._2 == t._1 && t._3 != t._1).toLong
    val c = rows.count(t => t._2 != t._1 && t._3 == t._1).toLong
    val got = Ml.mcnemar(spark, sfDir).head()
    got.getLong(0) shouldBe rows.length.toLong
    (got.getLong(1), got.getLong(2)) shouldBe ((b, c))
    got.getLong(3) shouldBe rows.count(t => t._2 == t._1).toLong
    got.getLong(4) shouldBe rows.count(t => t._3 == t._1).toLong
    got.getLong(5) shouldBe
      1000000L * (math.abs(b - c) - 1) * (math.abs(b - c) - 1) / (b + c)
    // the paired design binds: discordant mass exists on both sides
    b should be > 0L
    c should be > 0L
  }
}
