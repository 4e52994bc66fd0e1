package graft.ops

import graft.SparkSpec

/** Round-5 curation operators (incremental dedup, PII redaction, bigram
  * LM, quality-weighted sampling, int8 quantization): semantics checked
  * against independent brute-force recomputation in plain Scala over the
  * collected sf0.001 fixture — no Spark code shared with the op under
  * test.
  */
class CurationOpsSpec extends SparkSpec {

  private def round4(x: Double): Double = BigDecimal(x)
    .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val docs: Seq[(Long, String, String)] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  private def shingles(text: String): Set[String] =
    text.split(" ", -1).toSeq.sliding(3).map(_.mkString(" ")).toSet

  "TextOps.dedupIncremental" should "match brute-force batch-vs-corpus near-dup verdicts" in {
    val batch = docs.filter(_._1 % 10 >= 8)
    val corpus = docs.filter(_._1 % 10 < 8)
    val corpusSets = corpus.map { case (id, t, _) => id -> shingles(t) }
    val expected = batch.map { case (id, t, _) =>
      val ss = shingles(t)
      val hits = corpusSets.filter { case (_, cs) =>
        val j = round4(ss.intersect(cs).size.toDouble / ss.union(cs).size)
        j >= 0.6
      }.map(_._1)
      id -> (if (hits.isEmpty) -1L else hits.min)
    }.toMap
    val got = TextOps.dedupIncremental(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    got.keySet shouldBe expected.keySet
    expected.foreach { case (id, dupOf) =>
      got(id)._1 shouldBe dupOf
      got(id)._2 shouldBe (dupOf == -1L)
    }
    // both verdicts must bind on the fixture
    got.values.count(_._2) should (be > 0 and be < got.size)
  }

  "TextOps.redactPii" should "count and scrub injected emails/phones" in {
    val emailPat = "[A-Za-z0-9]+@[A-Za-z0-9]+\\.[a-z]+".r
    val phonePat = "555-[0-9]{4}".r
    val got = TextOps.redactPii(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    got.size shouldBe docs.size
    docs.take(30).foreach { case (id, text, _) =>
      val injected = text +
        (if (id % 3 == 0) s" contact user$id@example.com" else "") +
        (if (id % 4 == 0) f" call 555-${id % 10000}%04d" else "")
      val redacted = phonePat.replaceAllIn(
        emailPat.replaceAllIn(injected, "[EMAIL]"), "[PHONE]")
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(redacted.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val (nE, nP, h) = got(id)
      nE shouldBe emailPat.findAllIn(injected).size.toLong
      nP shouldBe phonePat.findAllIn(injected).size.toLong
      h shouldBe md5
    }
    // injection must actually fire on the fixture
    got.values.map(_._1).sum should be > 0L
    got.values.map(_._2).sum should be > 0L
  }

  "TextSignals.bigramLmScore" should "match the brute-force corpus bigram MLE" in {
    val allBigrams = docs.flatMap(_._2.split(" ", -1).toSeq.sliding(2).map(_.mkString(" ")))
    val cb = allBigrams.groupBy(identity).map { case (b, o) => b -> o.size }
    val cp = allBigrams.map(_.split(" ")(0)).groupBy(identity).map { case (p, o) => p -> o.size }
    val got = TextSignals.bigramLmScore(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    docs.take(15).foreach { case (id, text, _) =>
      val bgs = text.split(" ", -1).toSeq.sliding(2).map(_.mkString(" ")).toSeq
      val exp = bgs.map(b => math.log(cb(b).toDouble / cp(b.split(" ")(0))) / math.log(2))
        .sum / bgs.size
      got(id)._1 shouldBe bgs.size.toLong
      got(id)._2 shouldBe round4(exp) +- 1e-9
    }
  }

  "Sampling.sampleQualityWeighted" should "match exact integer accept tests per lang" in {
    val perLang = docs.groupBy(_._3)
    val got = Sampling.sampleQualityWeighted(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    perLang.foreach { case (lang, rows) =>
      val kept = rows.count { case (id, text, _) =>
        val ws = text.split(" ", -1)
        val a = ws.distinct.length.toLong
        val b = ws.length.toLong
        val k = ((id % 1048576L) * 2654435761L) % 1048576L
        k * b < a * 1048576L
      }
      val rates = rows.map { case (_, text, _) =>
        val ws = text.split(" ", -1); ws.distinct.length.toDouble / ws.length
      }
      val (nTotal, nKept, targetRate) = got(lang)
      nTotal shouldBe rows.size.toLong
      nKept shouldBe kept.toLong
      targetRate shouldBe round4(rates.sum / rates.size) +- 1e-9
    }
    // the sampler must actually thin (rates < 1 somewhere)
    got.values.map(_._2).sum should be < docs.size.toLong
  }

  "Similarity.quantizeInt8" should "match brute-force scale, saturation and MSE" in {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq
    val got = Similarity.quantizeInt8(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    got.size shouldBe vecs.size
    vecs.take(25).foreach { case (id, v) =>
      val ma = v.map(math.abs).max
      val s = if (ma == 0.0) 0.0 else 127.0 / ma
      val q = v.map(x => if (s == 0.0) 0.0
        else math.max(-127.0, math.min(127.0, math.floor(x * s + 0.5))))
      val mse = v.zip(q).map { case (x, qi) =>
        val dq = if (s == 0.0) 0.0 else qi / s; (x - dq) * (x - dq)
      }.sum / v.length
      val (nSat, scale, gm) = got(id)
      nSat shouldBe q.count(qi => math.abs(qi) == 127.0).toLong
      scale shouldBe BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-12
      gm shouldBe mse +- 1e-9
      nSat should be >= 1L // the max-magnitude dim always saturates
    }
  }

  "Sampling.sampleBootstrapReps" should "replay the hash-Poisson weights and stay near the sample mean" in {
    val rows = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_orderkey", "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val thresholds = Seq(385749L, 771499L, 964373L, 1028665L, 1044738L)
    def weight(id: Long, rep: Int): Long = {
      val u = ((id % 1048576L + rep * 7919L) * 2654435761L) % 1048576L
      thresholds.indexWhere(u < _) match { case -1 => 5L; case i => i.toLong }
    }
    val got = Sampling.sampleBootstrapReps(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.map(_._1).toSeq shouldBe (0L until 32L)
    val n = rows.length.toLong
    val trueMean = rows.map(_._2).sum / n
    got.foreach { case (rep, nEff, meanCents) =>
      val ws = rows.map { case (id, c) => (weight(id, rep.toInt), c) }
      nEff shouldBe ws.map(_._1).sum
      meanCents shouldBe ws.map { case (w, c) => w * c }.sum / nEff
      // Poisson(1) weights: effective mass within 10% of n, and the
      // replicate mean within 10% of the sample mean
      math.abs(nEff - n).toDouble / n should be < 0.1
      math.abs(meanCents - trueMean).toDouble / trueMean should be < 0.1
    }
  }

  "Similarity.kmeansLloyd" should "replay three Lloyd iterations exactly" in {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => BigDecimal(x.toDouble * 10000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray))
    var cents: Map[Long, Array[Long]] = vecs.filter(_._1 < 8).toMap
    val expected = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
    for (t <- 1 to 3) {
      val assign = vecs.map { case (id, qv) =>
        val best = cents.toSeq.map { case (cid, cv) =>
          (qv.zip(cv).map { case (x, y) => (x - y) * (x - y) }.sum, cid)
        }.min
        (best._2, best._1, qv)
      }
      assign.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (cid, ms) =>
        expected += ((t.toLong, cid, ms.length.toLong, ms.map(_._2).sum))
      }
      if (t < 3) {
        val updated = assign.groupBy(_._1).map { case (cid, ms) =>
          val n = ms.length
          cid -> Array.tabulate(ms.head._3.length)(i =>
            ms.map(_._3(i)).sum / n) // truncation toward zero, like div
        }
        cents = cents ++ updated
      }
    }
    val got = Similarity.kmeansLloyd(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe expected.toSeq
    // inertia is non-increasing across Lloyd iterations (up to the
    // integer truncation of the M-step, which cannot raise it here)
    val inertia = got.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    inertia(2L) should be <= inertia(1L)
    inertia(3L) should be <= inertia(2L)
  }

  "Similarity.kmeansAssign" should "match a driver-side exact argmin assignment" in {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        // HALF_UP to mirror Spark's round() on negative components
        r.getSeq[Float](1).map(x => BigDecimal(x.toDouble * 10000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray))
    val seeds = vecs.filter(_._1 < 8)
    val assign = vecs.map { case (id, qv) =>
      val best = seeds.map { case (cid, cv) =>
        val d2 = qv.zip(cv).map { case (x, y) => (x - y) * (x - y) }.sum
        (d2, cid)
      }.min
      (best._2, best._1)
    }
    val expected = assign.groupBy(_._1).view.mapValues { ds =>
      (ds.length.toLong, ds.map(_._2).sum / ds.length)
    }.toMap
    val got = Similarity.kmeansAssign(spark, sfDir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    got shouldBe expected
  }

  "TextOps.dedupSimHashFrozen (r13)" should "match a driver-side replay" in {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def polyHash(w: String): Long =
      w.foldLeft(0L)((a, c) => (a * 31L + c.toLong) % (1L << 40))
    def sigOf(text: String): Long = {
      val hs = text.split(" ").filter(_.nonEmpty).map(polyHash)
      (0 until 32).map { j =>
        val v = hs.map(h => if (((h >> j) & 1L) == 1L) 1 else -1).sum
        if (v > 0) 1L << j else 0L
      }.sum
    }
    val sigs = docs.map { case (id, t) => id -> sigOf(t) }.toMap
    // brute-force pair set: hamming <= 3 AND sharing at least one of the
    // four 8-bit chunks (the banding is part of the operator contract)
    def chunks(sg: Long): Seq[Long] =
      (0 until 4).map(c => (sg >> (c * 8)) & 0xffL)
    val ids = docs.map(_._1).sorted
    val want = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      if chunks(sigs(a)).zip(chunks(sigs(b))).exists { case (x, y) => x == y }
      h = java.lang.Long.bitCount(sigs(a) ^ sigs(b)).toLong
      if h <= 3
    } yield (a, b, h)).toSet
    val got = TextOps.dedupSimHashFrozen(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    got shouldBe want
    got should not be empty
  }

  "TextOps.dedupMinhashMetrics" should "replay the frozen banding trajectory and the truth census" in {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def shingles(text: String): Seq[String] = {
      val ws = text.split(" ", -1)
      (1 to math.max(ws.length - 2, 1)).map(i =>
        ws.slice(i - 1, math.min(i + 2, ws.length)).mkString(" ")).distinct
    }
    def poly(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % (1L << 40))
    val hsets = docs.map { case (id, t) => id -> shingles(t).map(poly).distinct }
    val bands = hsets.flatMap { case (id, hs) =>
      val mh = (0 until 8).map(i => hs.map(h =>
        (h * (31 + 2 * i) + (7 + 13 * i)) % 1000000007L).min)
      (0 until 4).map(b =>
        ((b.toLong, (mh(2 * b) * 1000003L + mh(2 * b + 1)) % (1L << 40)), id))
    }
    val cand = bands.groupBy(_._1).values.flatMap { g =>
      val ids = g.map(_._2).sorted
      for (i <- ids.indices; j <- (i + 1) until ids.length) yield (ids(i), ids(j))
    }.toSet
    val ssets = docs.map { case (id, t) => id -> shingles(t).toSet }
    val truth = (for {
      (a, sa) <- ssets; (b, sb) <- ssets
      if a < b
      j = math.round(1e4 * (sa intersect sb).size.toDouble / (sa union sb).size) / 1e4
      if j >= 0.6
    } yield (a, b)).toSet
    val row = TextOps.dedupMinhashMetrics(spark, sfDir).collect().head
    row.getLong(0) shouldBe docs.length.toLong
    row.getLong(1) shouldBe docs.length.toLong * (docs.length - 1) / 2
    row.getLong(2) shouldBe cand.size.toLong
    row.getLong(3) shouldBe truth.size.toLong
    row.getLong(4) shouldBe (truth intersect cand).size.toLong
    row.getLong(6) should be > 990000L // banding must genuinely reduce
  }

  "Sampling.neymanAlloc" should "replay N_h*S_h weights and conserve the budget exactly" in {
    val xs = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_orderpriority", "CAST(round(o_totalprice) AS LONG) AS x")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val wd = xs.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, rows) =>
      val n = rows.length.toLong
      val sx = rows.map(_._2).sum
      val sxx = rows.map(t => t._2 * t._2).sum
      val sd = math.sqrt((sxx - sx.toDouble * sx / n) / (n - 1))
      (g, n, sd, math.round(n * sd))
    }
    val wTot = wd.map(_._4).sum
    val based = wd.map { case (g, n, sd, w) =>
      (g, n, sd, w, 1000L * w / wTot, 1000L * w - (1000L * w / wTot) * wTot)
    }
    val leftover = 1000L - based.map(_._5).sum
    val bump = based.sortBy { case (g, _, _, _, _, rem) => (-rem, g) }
      .take(leftover.toInt).map(_._1).toSet
    val want = based.map { case (g, n, sd, w, base, _) =>
      (g, n, math.round(sd * 100) / 100.0, w,
        base + (if (bump(g)) 1L else 0L))
    }
    val got = Sampling.neymanAlloc(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4))).toSeq
    got.map(t => (t._1, t._2, t._4, t._5)) shouldBe
      want.map(t => (t._1, t._2, t._4, t._5))
    got.zip(want).foreach { case (g, w0) => g._3 shouldBe w0._3 +- 1e-9 }
    got.map(_._5).sum shouldBe 1000L // exact budget conservation
  }

  "Sampling.essWeights" should "replay the Kish moments and bound ESS by n" in {
    val wTab = Map("1-URGENT" -> 5L, "2-HIGH" -> 4L, "3-MEDIUM" -> 3L,
      "4-NOT SPECIFIED" -> 2L, "5-LOW" -> 1L)
    val nat = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey", "c_nationkey").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    val rows = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_custkey", "o_orderpriority",
        "CAST(round(o_totalprice) AS LONG) AS x").collect()
      .map(r => (nat(r.getLong(0)), wTab(r.getString(1)), r.getLong(2)))
    val want = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (natk, g) =>
      val n = g.length.toLong
      val sw = g.map(_._2).sum
      val sww = g.map(t => t._2 * t._2).sum
      val swx = g.map(t => t._2 * t._3).sum
      (natk, n, sw, sww, 100L * swx / sw, sw * sw * 1000000L / sww,
        n * sww * 1000000L / (sw * sw))
    }
    val got = Sampling.essWeights(spark, sfDir).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    got shouldBe want
    // Kish: ESS <= n (equality only under constant weights) and deff >= 1
    got.foreach { case (_, n, _, _, _, ess, deff) =>
      ess should be <= n * 1000000L
      ess should be < n * 1000000L // mixture genuinely varies in-cell
      deff should be >= 1000000L
    }
  }

  "Sampling.hhEstimator (r13)" should "estimate the item total within PPS sampling error" in {
    val row = Sampling.hhEstimator(spark, sfDir).collect().head
    val (nDraws, tTrue, tHh, err) =
      (row.getLong(0), row.getLong(2), row.getLong(3), row.getLong(4))
    nDraws shouldBe 100L
    err shouldBe tHh - tTrue
    // spend-proportional draws estimating item counts: sizes correlate
    // with item counts, so HH lands well inside a 15% relative band
    math.abs(err).toDouble should be < 0.15 * tTrue.toDouble
    tHh should be > 0L
  }

  "Sampling.ppsSystematic (r13)" should "draw exactly 100 PPS hits with the frozen start" in {
    val sizes = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val cums = sizes.scanLeft(0L)((acc, t) => acc + t._2).tail
    val total = cums.last
    val step = total / 100
    val start = step / 2
    def g(x: Long): Long = (x - start + 2 * step) / step
    val want = sizes.zip(cums).map { case ((ck, sz), cum) =>
      (ck, sz, cum, g(cum - 1) - g(cum - sz - 1))
    }.filter(_._4 > 0)
    val got = Sampling.ppsSystematic(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe want
    // systematic PPS with s = T div 100, r = s div 2 lands exactly 100
    // draws (all 100 sample points fall inside [0, T))
    got.map(_._4).sum shouldBe 100L
    // a unit spanning more than one step gets multiple hits iff any do
    got.foreach { case (_, sz, _, h) => h should be <= sz / step + 1 }
  }

  "Sampling.twoStage (r13)" should "replay both stages and the x10 HT expansion" in {
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .selectExpr("c_custkey", "CAST(c_nationkey AS LONG) AS nk",
        "CAST(round(c_acctbal * 100) AS LONG) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nations = cust.map(_._2).distinct
      .sortBy(nk => ((nk * 2654435761L) % 4294967296L, nk)).take(10).toSet
    val samp = cust.filter(c => nations(c._2) &&
      (c._1 * 2246822519L) % 4294967296L % 1000000L < 250000L)
    val row = Sampling.twoStage(spark, sfDir).collect().head
    row.getLong(0) shouldBe cust.length.toLong
    row.getLong(1) shouldBe samp.map(_._2).distinct.length.toLong
    row.getLong(2) shouldBe samp.length.toLong
    row.getLong(3) shouldBe samp.map(_._3).sum * 10L
    row.getLong(4) shouldBe cust.map(_._3).sum
    row.getLong(5) shouldBe row.getLong(3) - row.getLong(4)
    // the design delivers: ~n/10 of the frame sampled, all 10 picked
    // clusters populated, estimate within half the truth's magnitude
    row.getLong(2) should be > 0L
    math.abs(row.getLong(5)) should be <
      math.max(math.abs(row.getLong(4)), 100000L)
  }

  "Sampling.htPoisson (r13)" should "replay the capped-pi inclusion and both estimators" in {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_orderkey", "CAST(round(o_totalprice * 100) AS LONG) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val t = orders.map(_._2).sum
    val incl = orders.flatMap { case (k, c) =>
      val pi = math.min(1000000L, 200L * c * 1000000L / t)
      val u = (k * 2654435761L) % 4294967296L % 1000000L
      if (u < pi) Some((c, pi)) else None
    }
    val tHt = incl.map { case (c, pi) => c * 1000000L / pi }.sum
    val vHat = incl.map { case (c, pi) =>
      val yk = (c / 100000L) * 1000000L / pi
      ((1000000L - pi) * yk) / 1000000L * yk
    }.sum
    val row = Sampling.htPoisson(spark, sfDir).collect().head
    row.getLong(0) shouldBe orders.length.toLong
    row.getLong(1) shouldBe t
    row.getLong(2) shouldBe incl.length.toLong
    row.getLong(3) shouldBe incl.count(_._2 == 1000000L).toLong
    row.getLong(4) shouldBe tHt
    row.getLong(5) shouldBe vHat
    row.getLong(6) shouldBe tHt - t
    // HT is unbiased: the draw's error is well inside 3 sigma of the
    // design (sigma^2 ~ vHat in hundred-dollar^2 units)
    val sigmaCents = math.sqrt(vHat.toDouble) * 100000.0
    math.abs((tHt - t).toDouble) should be < 4.0 * sigmaCents
    incl.length should be > 50 // the design lands near its target size
  }

  "Similarity.silhouetteFrozen (r13)" should "replay the centroid-form silhouette" in {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => BigDecimal(x.toDouble * 10000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray))
    val seeds = vecs.filter(_._1 < 8).sortBy(_._1)
    val rows = vecs.map { case (_, qv) =>
      val d2s = seeds.map { case (cid, cv) =>
        (qv.zip(cv).map { case (x, y) => (x - y) * (x - y) }.sum, cid)
      }
      val cid = d2s.minBy(t => (t._1, t._2))._2
      val sorted = d2s.map(_._1).sorted
      val (a2, b2) = (sorted(0), sorted(1))
      val s6 = if (b2 > 0)
        BigDecimal(1e6 * (math.sqrt(b2.toDouble) - math.sqrt(a2.toDouble)) /
          math.sqrt(b2.toDouble))
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      else 0L
      (cid, s6)
    }
    val want = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (c, g) =>
      val mean = BigDecimal(g.map(_._2).sum.toDouble / g.size.toDouble)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      (c, g.size.toLong, g.map(_._2).sum, g.map(_._2).min, mean)
    }
    val got = Similarity.silhouetteFrozen(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    got shouldBe want
    // silhouette lives in [-1e6, 1e6]; the 8 seed vectors themselves
    // score a perfect 1e6 (a = 0 against their own centroid)
    got.foreach(t => t._4 should (be >= -1000000L and be <= 1000000L))
    rows.count(_._2 == 1000000L) should be >= 8
  }

  "Similarity.ivfNprobeSweep (r13)" should "replay recall against a brute-force exact arm" in {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => BigDecimal(x.toDouble * 10000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray))
    val cents = Array.tabulate(8) { j =>
      val m = 13L + 2L * j
      Array.tabulate(64)(i => (((7L * j + 3L) * i + (11L * j + 5L)) % m - m / 2) * 100L)
    }
    def cellsOf(qv: Array[Long]): Seq[Long] =
      cents.zipWithIndex.map { case (c, j) =>
        (qv.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum, j.toLong)
      }.sortBy(t => (t._1, t._2)).map(_._2).toSeq
    val corpus = vecs.filter(_._1 >= 8).map(v => (v._1, v._2, cellsOf(v._2).head))
    val queries = vecs.filter(_._1 < 8)
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val exact = queries.map { case (q, qv) =>
      q -> corpus.map(c => (dot(qv, c._2), c._1))
        .sortBy(t => (-t._1, t._2)).take(10).map(_._2).toSet
    }.toMap
    val want = Seq(1, 2, 4).map { np =>
      var hits = 0L
      var nCand = 0L
      queries.foreach { case (q, qv) =>
        val cells = cellsOf(qv).take(np).toSet
        val cand = corpus.filter(c => cells(c._3))
        nCand += cand.length
        val approx = cand.map(c => (dot(qv, c._2), c._1))
          .sortBy(t => (-t._1, t._2)).take(10).map(_._2)
        hits += approx.count(exact(q))
      }
      (np.toLong, 8L, hits, hits * 1000000L / 80L, nCand)
    }
    val got = Similarity.ivfNprobeSweep(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    got shouldBe want
    // the tuning curve is monotone: more probes never lose recall or
    // shrink the candidate set
    got.map(_._3) shouldBe got.map(_._3).sorted
    got.map(_._5) shouldBe got.map(_._5).sorted
  }

  "Sampling.srmCheck (r13)" should "not alarm on a healthy hash split" in {
    val keys = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey").collect().map(_.getLong(0))
    val na = keys.count(k => (k * 2654435761L) % 4294967296L % 2 == 0).toLong
    val nb = keys.length - na
    val chi = (na - nb).toDouble * (na - nb).toDouble / (na + nb).toDouble
    val az = math.sqrt(chi)
    val t = 1.0 / (1.0 + 0.2316419 * az)
    val poly = t * (0.319381530 + t * (-0.356563782 + t *
      (1.781477937 + t * (-1.821255978 + t * 1.330274429))))
    val p = BigDecimal(2.0 * (0.3989422804014327 *
      math.exp(-0.5 * az * az)) * poly * 1e9)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val got = Sampling.srmCheck(spark, sfDir).head()
    (got.getLong(0), got.getLong(1)) shouldBe ((na, nb))
    got.getLong(2) shouldBe (na - nb) * (na - nb) * 1000000L / (na + nb)
    got.getLong(3) shouldBe p
    // the guardrail's own guardrail: a clean Knuth split must not trip
    // the p < 0.001 alarm
    got.getLong(4) shouldBe 0L
  }
}
