package graft.ops

import graft.SparkSpec

/** Corpus-statistics quality signals ([[TextSignals]]) and the mixture
  * sampler / embedding outlier ops added alongside them: semantics
  * checked against independent brute-force recomputation in plain Scala
  * over the collected sf0.001 fixture (500 docs / 500 vectors — small
  * enough to recompute exactly, no Spark code shared with the op under
  * test).
  */
class TextSignalsSpec extends SparkSpec {

  private def round4(x: Double): Double = BigDecimal(x)
    .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val docs: Seq[(Long, String, String, Long)] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  "TextSignals.textRepetition" should "match brute-force fractions and bind both keep outcomes" in {
    val got = TextSignals.textRepetition(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getBoolean(3)))).toMap
    got.size shouldBe docs.size
    docs.take(25).foreach { case (id, text, _, _) =>
      val ws = text.split(" ", -1).toSeq
      val topFrac = round4(ws.groupBy(identity).values.map(_.size).max.toDouble / ws.size)
      val bgs = ws.sliding(2).map(_.mkString(" ")).toSeq
      val dupFrac = round4(1.0 - bgs.distinct.size.toDouble / bgs.size)
      val (gTop, gDup, gKeep) = got(id)
      gTop shouldBe topFrac
      gDup shouldBe dupFrac
      gKeep shouldBe (topFrac <= 0.11 && dupFrac <= 0.05)
    }
    // thresholds must actually bind on the fixture (not vacuous)
    got.values.count(_._3) should (be > 0 and be < docs.size)
  }

  it should "define dup_2gram_frac = 0.0 for single-word documents" in {
    // the fixture has no 1-word docs, so exercise the guard directly:
    // without it, sequence(1, 0) descends and slice(_, 0, 2) throws
    import spark.implicits._
    import org.apache.spark.sql.{functions => F}
    val tmp = java.nio.file.Files.createTempDirectory("graft_tiny").toString
    Seq((1L, "solo"), (2L, "two words"), (3L, "a a"))
      .toDF("doc_id", "text")
      .withColumn("lang", F.lit("en"))
      .withColumn("n_chars", F.length($"text").cast("long"))
      .withColumn("source", F.lit("src0"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextSignals.textRepetition(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    got(1L) shouldBe ((1.0, 0.0))   // one word: top frac 1, no bigrams
    got(2L) shouldBe ((0.5, 0.0))   // "two words": 1 distinct bigram of 1
    got(3L) shouldBe ((1.0, 0.0))   // "a a": bigram "a a" unique
  }

  "TextSignals.tfidfKeywords" should "rank by rounded tf·idf with word tie-break" in {
    val n = docs.size.toDouble
    val df = docs.flatMap { case (_, t, _, _) => t.split(" ", -1).distinct }
      .groupBy(identity).map { case (w, o) => w -> o.size }
    val got = TextSignals.tfidfKeywords(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .groupBy(_._1)
    got.size shouldBe docs.size
    docs.take(15).foreach { case (id, text, _, _) =>
      val tf = text.split(" ", -1).toSeq.groupBy(identity).map { case (w, o) => w -> o.size }
      val exp = tf.map { case (w, f) => (w, round4(f * math.log(n / df(w)))) }
        .toSeq.sortBy { case (w, sc) => (-sc, w) }.take(3)
      val g = got(id).sortBy(_._2).map(r => (r._3, r._4))
      g shouldBe exp
    }
  }

  "TextSignals.lmScore" should "match the brute-force corpus unigram mean log-prob" in {
    val all = docs.flatMap(_._2.split(" ", -1))
    val uni = all.groupBy(identity).map { case (w, o) => w -> o.size }
    val tot = all.size.toDouble
    val got = TextSignals.lmScore(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    docs.take(15).foreach { case (id, text, _, _) =>
      val toks = text.split(" ", -1).toSeq
      val exp = round4(toks.map(w => math.log(uni(w) / tot) / math.log(2)).sum / toks.size)
      got(id)._1 shouldBe toks.size.toLong
      got(id)._2 shouldBe exp +- 1e-9
    }
  }

  "TextSignals.lengthOutliers" should "keep exactly the [0.05, 0.95] percent_rank band per language" in {
    val kept = TextSignals.lengthOutliers(spark, sfDir).collect()
      .map(r => r.getLong(0)).toSet
    val expected = docs.groupBy(_._3).flatMap { case (_, group) =>
      val sorted = group.sortBy(_._4)
      val n = sorted.size
      // percent_rank = (rank-1)/(n-1) with ties sharing the min rank
      val rankOf = sorted.map(_._4).zipWithIndex.groupBy(_._1)
        .map { case (nc, xs) => nc -> xs.map(_._2).min }
      group.filter { case (_, _, _, nc) =>
        val pr = rankOf(nc).toDouble / (n - 1)
        pr >= 0.05 && pr <= 0.95
      }.map(_._1)
    }.toSet
    kept shouldBe expected
    kept.size should be < docs.size // the trim must bind
  }

  "Sampling.sampleDomainMixture" should "match exact integer-hash keep counts per source" in {
    val got = Sampling.sampleDomainMixture(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    val perSource = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
      .groupBy(_._2)
    perSource.foreach { case (src, rows) =>
      val rate = (src.drop(3).toLong % 4) match {
        case 0 => 1.0; case 1 => 0.75; case 2 => 0.5; case _ => 0.25
      }
      val nKept = rows.count { case (id, _) =>
        (((id % 1048576L) * 2654435761L) % 1048576L).toDouble / 1048576.0 < rate
      }
      val (gRate, gTotal, gKept) = got(src)
      gRate shouldBe rate
      gTotal shouldBe rows.size.toLong
      gKept shouldBe nKept.toLong
    }
    // distinct rates must actually appear (the mixture is non-trivial)
    got.values.map(_._1).toSet.size should be >= 3
  }

  "Similarity.centroidOutliers" should "match a brute-force double-precision cosine to the label centroid" in {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).map(_.toDouble).toArray)).toSeq
    val cents = vecs.groupBy(_._2).map { case (l, vs) =>
      val dim = vs.head._3.length
      val m = Array.ofDim[Double](dim)
      vs.foreach(v => (0 until dim).foreach(i => m(i) += v._3(i)))
      l -> m.map(_ / vs.size)
    }
    val got = Similarity.centroidOutliers(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getBoolean(3)))).toMap
    got.size shouldBe vecs.size
    vecs.take(25).foreach { case (id, l, v) =>
      val c = cents(l)
      val dot = v.zip(c).map { case (a, b) => a * b }.sum
      val cos = round4(dot / (math.sqrt(v.map(x => x * x).sum) * math.sqrt(c.map(x => x * x).sum)))
      got(id)._1 shouldBe cos +- 1e-9
      got(id)._2 shouldBe (got(id)._1 < 0.05)
    }
    got.values.count(_._2) should (be > 0 and be < vecs.size) // flag binds
  }

  "TextSignals.pmiBigrams" should "match brute-force PMI over adjacent pairs with count >= 5" in {
    val ws = docs.map(_._2.split(" ", -1).toSeq)
    val uni = ws.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tw = uni.values.sum.toDouble
    val bgs = ws.filter(_.size >= 2).flatMap(w => w.zip(w.drop(1)))
    val tb = bgs.size.toDouble
    val expected = bgs.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 5).map { case ((wa, wb), cab) =>
        val pmi = math.log((cab / tb) / ((uni(wa) / tw) * (uni(wb) / tw))) / math.log(2.0)
        (wa, wb) -> ((cab, round4(pmi)))
      }.toMap
    val got = TextSignals.pmiBigrams(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    got.keySet shouldBe expected.keySet
    got.foreach { case (k, (n, pmi)) =>
      n shouldBe expected(k)._1
      pmi shouldBe expected(k)._2 +- 1e-9
    }
    // both above-chance and below-chance collocations must appear
    got.values.map(_._2).exists(_ > 0) shouldBe true
    got.values.map(_._2).exists(_ < 0) shouldBe true
  }

  "TextSignals.bigramNovelty" should "attribute each distinct bigram to its minimum doc_id" in {
    val perDoc = docs.filter(_._2.split(" ", -1).length >= 2).map { case (id, text, _, _) =>
      val w = text.split(" ", -1).toSeq
      id -> w.zip(w.drop(1)).map(p => p._1 + " " + p._2).distinct
    }
    val firstDoc = perDoc.flatMap { case (id, bs) => bs.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expected = perDoc.map { case (id, bs) =>
      val novel = bs.count(firstDoc(_) == id).toLong
      id -> ((bs.size.toLong, novel, round4(novel.toDouble / bs.size)))
    }.toMap
    val got = TextSignals.bigramNovelty(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    got shouldBe expected
    // novelty must decay: later docs should on average be less novel
    val early = got.view.filterKeys(_ < 100).toMap
    val late = got.view.filterKeys(_ >= 400).toMap
    val avg = (m: Map[Long, (Long, Long, Double)]) =>
      m.values.map(_._3).sum / m.size
    avg(early) should be > avg(late)
  }

  "TextSignals.bm25" should "match brute-force scoring and rank exact-phrase docs sensibly" in {
    val terms = Seq("spark", "vector", "dup")
    val k1 = 1.2; val b = 0.75
    val toks = docs.map { case (id, text, _, _) => id -> text.split(" ", -1).toSeq }
    val n = docs.size.toDouble
    val avgdl = toks.map(_._2.size).sum.toDouble / n
    val tf = toks.flatMap { case (id, ws) =>
      terms.map(t => (id, t, ws.count(_ == t))).filter(_._3 > 0)
    }
    val dfm = tf.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    val expected = tf.groupBy(_._1).view.mapValues { rows =>
      val score = rows.map { case (id, t, f) =>
        val dl = toks.toMap.apply(id).size.toDouble
        math.log((n - dfm(t) + 0.5) / (dfm(t) + 0.5) + 1.0) *
          (f * (k1 + 1.0)) / (f + k1 * (1.0 - b + b * dl / avgdl))
      }.sum
      (rows.size.toLong, score)
    }.toMap
    val got = TextSignals.bm25(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    got.keySet shouldBe expected.keySet
    got.foreach { case (id, (m, sc)) =>
      m shouldBe expected(id)._1
      sc shouldBe round4(expected(id)._2) +- 1e-9
    }
    // discrimination binds: docs matching the rare term outscore the rest
    val rareDocs = toks.filter(_._2.contains("dup")).map(_._1).toSet
    if (rareDocs.nonEmpty && rareDocs.size < got.size) {
      val rareAvg = rareDocs.toSeq.map(got(_)._2).sum / rareDocs.size
      val restAvg = (got.keySet -- rareDocs).toSeq.map(got(_)._2).sum /
        (got.size - rareDocs.size)
      rareAvg should be > restAvg
    }
  }

  "TextSignals.booleanAnd" should "match a brute-force conjunctive scan" in {
    val expected = docs.flatMap { case (id, text, _, _) =>
      val ws = text.split(" ", -1)
      val (c1, c2) = (ws.count(_ == "spark").toLong, ws.count(_ == "dup").toLong)
      if (c1 > 0 && c2 > 0) Some((id, c1, c2)) else None
    }.sortBy(_._1)
    val got = TextSignals.booleanAnd(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe expected
  }

  "TextSignals.phraseMatch" should "match a brute-force adjacent-pair scan" in {
    val expected = docs.flatMap { case (id, text, _, _) =>
      val ws = text.split(" ", -1)
      val hits = ws.indices.dropRight(1)
        .filter(i => ws(i) == "window" && ws(i + 1) == "join")
      if (hits.nonEmpty) Some((id, hits.size.toLong, hits.min.toLong)) else None
    }.sortBy(_._1)
    val got = TextSignals.phraseMatch(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe expected
    expected should not be empty // the fixture phrase must bind
  }

  "TextSignals.zipfSlope" should "match the brute-force log-log regression" in {
    val counts = docs.flatMap(_._2.split(" ", -1)).groupBy(identity)
      .view.mapValues(_.size).toSeq
    val ranked = counts.sortBy { case (w, c) => (-c, w) }.zipWithIndex
      .map { case ((_, c), i) => (math.log(i + 1.0), math.log(c.toDouble)) }
    val n = ranked.size.toDouble
    val sx = ranked.map(_._1).sum; val sy = ranked.map(_._2).sum
    val sxy = ranked.map(p => p._1 * p._2).sum
    val sxx = ranked.map(p => p._1 * p._1).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val row = TextSignals.zipfSlope(spark, sfDir).collect().head
    row.getLong(0) shouldBe counts.size.toLong
    row.getDouble(1) shouldBe round4(slope) +- 1e-9
    row.getDouble(2) shouldBe round4((sy - slope * sx) / n) +- 1e-9
    slope should be < 0.0 // frequencies must decay with rank
  }

  "TextSignals.searchEvalNdcg" should "match the brute-force frozen-weight NDCG@10" in {
    val terms = Seq("spark", "vector", "dup")
    val relOf = Map("spark" -> "vector", "vector" -> "dup", "dup" -> "spark")
    val wgt = TextSignals.NdcgWeights.map { case (r, w) => r.toInt -> w }.toMap
    val tf: Map[(String, Long), Long] = docs.flatMap { case (id, text, _, _) =>
      text.split(" ", -1).filter(terms.contains).map(w => (w, id))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = terms.flatMap { t =>
      // a doc is relevant FOR t iff it contains the u with relOf(u) = t
      // (the label direction the MRR query publishes); toSeq BEFORE
      // collect so tuple results don't re-fold into a Map
      val u = relOf.collectFirst { case (k, v) if v == t => k }.get
      val posting = tf.toSeq.collect { case ((w, id), c) if w == t => (id, c) }
      val withRel = tf.keys.collect { case (w, id) if w == u => id }.toSet
      val relDocs = posting.map(_._1).toSet intersect withRel
      val ranked = posting.sortBy { case (id, c) => (-c, id) }.take(10)
      val dcg = ranked.zipWithIndex.map { case ((id, _), i) =>
        if (relDocs(id)) wgt(i + 1) else 0L
      }.sum
      val idcg = (1 to math.min(10, relDocs.size)).map(i => wgt(i)).sum
      if (relDocs.isEmpty) None
      else Some((t, relDocs.size.toLong, dcg, idcg, dcg * 1000000L / idcg))
    }.sortBy(_._1)
    want should not be empty // the cross-term label must bind
    val got = TextSignals.searchEvalNdcg(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    got shouldBe want
    // graded-position metric must sit strictly inside (0, 1] somewhere
    got.foreach { case (_, _, dcg, idcg, e6) =>
      dcg should be <= idcg
      e6 should be <= 1000000L
    }
    got.map(_._5).max should be > 0L
  }

  "TextOps.textSimpson" should "replay collision-probability diversity exactly" in {
    val want = docs.flatMap { case (id, text, _, _) =>
      val cs = text.split(" ", -1).groupBy(identity).values.map(_.length.toLong).toSeq
      val n = cs.sum
      if (n < 2) None
      else {
        val cc1 = cs.map(c => c * (c - 1)).sum
        val mx = cs.max
        Some((id, n, cc1, mx, cc1 * 1000000L / (n * (n - 1)), mx * 1000000L / n))
      }
    }.sortBy(_._1)
    val got = TextOps.textSimpson(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    got shouldBe want
    // dominance bounds simpson: D <= BP (Cauchy-Schwarz on the head),
    // within a 1-unit floor-lattice slack
    got.foreach { case (_, _, _, _, d, bp) => d should be <= bp + 1 }
  }

  "TextSignals.searchEvalMap (r13)" should "replay per-hit floored AP@10" in {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSeq))
    val terms = Seq("dup", "spark", "vector")
    // the label direction matches the engine/oracle: doc relevant FOR w
    // iff it posts for the term whose cross-label is w
    val invRel = Map("vector" -> "spark", "dup" -> "vector", "spark" -> "dup")
    val want = terms.map { w =>
      val postings = docs.filter(_._2.contains(w))
        .map(d => (d._1, d._2.count(_ == w).toLong))
      val relSet = docs.filter(_._2.contains(invRel(w))).map(_._1)
        .toSet.intersect(postings.map(_._1).toSet)
      val rel = postings.filter(p => relSet(p._1))
      val ranked = postings.sortBy(p => (-p._2, p._1)).take(10)
      val hits = ranked.zipWithIndex
        .filter { case ((id, _), _) => relSet(id) }
      val sumPrec = hits.zipWithIndex.map { case ((_, rk0), i) =>
        ((i + 1).toLong * 1000000L) / (rk0 + 1) }.sum
      (w, rel.length.toLong, hits.length.toLong, sumPrec,
        sumPrec / math.min(rel.length.toLong, 10L))
    }
    val got = TextSignals.searchEvalMap(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    got shouldBe want
    // AP is a probability-like score in (0, 1e6] and the top-10 cut binds
    got.foreach { case (_, nRel, h10, _, ap) =>
      ap should be <= 1000000L
      h10 should be <= math.min(nRel, 10L)
    }
  }

  "TextSignals.burstiness (r13)" should "replay the exact VMR moment identity" in {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSeq))
    val n = docs.length.toLong
    val perDoc = docs.flatMap { case (id, ws) =>
      ws.groupBy(identity).map { case (w, g) => (w, id, g.length.toLong) } }
    val want = perDoc.groupBy(_._1).toSeq.map { case (w, g) =>
      val df = g.length.toLong
      val sc = g.map(_._3).sum
      val scc = g.map(t => t._3 * t._3).sum
      (w, df, sc, (n * scc - sc * sc) * 1000000L / (n * sc))
    }.filter(_._2 >= 20).sortBy(t => (-t._4, t._1)).take(20)
    val got = TextSignals.burstiness(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe want
    // bursty head well above Poisson; uniform glue would sit near
    // (1 - sc/n)e6 — the ranking genuinely separates
    got.head._4 should be > 1000000L
  }

  "TextSignals.entropyRate (r13)" should "replay the per-row-rounded conditional entropy" in {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ").toSeq))
      .filter(_._2.length >= 2)
    val want = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (lang, ds) =>
      val bgs = ds.flatMap { case (_, ws) => ws.zip(ws.tail) }
      val n = bgs.length.toLong
      val cab = bgs.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val ra = bgs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
      val h = cab.map { case ((a, _), c) =>
        math.round(c.toDouble * math.log(ra(a).toDouble / c) * 1e6 / n)
      }.sum
      (lang, n, cab.size.toLong, h)
    }
    val got = TextSignals.entropyRate(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe want
    // conditional entropy is nonnegative and bounded by ln of the
    // context fan-out ceiling (types per context <= vocabulary)
    got.foreach { case (_, nbg, types, h) =>
      h should be >= 0L
      types should be <= nbg
      h should be < math.round(math.log(types.toDouble) * 1e6)
    }
  }

  "TextSignals.collocationLlr (r13)" should "replay the Dunning G2 top-20" in {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect().map(_.getString(0).split(" ").toSeq)
      .filter(_.length >= 2)
    val bgs = docs.flatMap(ws => ws.zip(ws.tail))
    val n = bgs.length.toLong
    val k11 = bgs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rCnt = bgs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cCnt = bgs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    def cell(k: Long, row: Long, colc: Long): Double =
      if (k > 0) k.toDouble * math.log(k.toDouble * n / (row.toDouble * colc))
      else 0.0
    val scored = k11.toSeq.filter(_._2 >= 5).map { case ((a, b), k) =>
      val (r, c) = (rCnt(a), cCnt(b))
      val g2 = cell(k, r, c) + cell(r - k, r, n - c) +
        cell(c - k, n - r, c) + cell(n - r - c + k, n - r, n - c)
      (a, b, k, r, c, math.round(g2 * 20000))
    }
    val want = scored.sortBy(t => (-t._6, t._1, t._2)).take(20)
    val got = TextSignals.collocationLlr(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    got shouldBe want
    // G2 is nonnegative (2N x mutual information) and the head is
    // genuinely collocational (beats the min-count floor)
    got.foreach(_._6 should be >= 0L)
    got.head._6 should be > 0L
  }

  "TextOps.gazetteerTag (r13)" should "census dictionary hits with zero-hit sentinels" in {
    val gaz = Map("spark" -> "engine", "query" -> "lang", "join" -> "op",
      "stream" -> "mode", "hash" -> "op")
    val docs2 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs2.sortBy(_._1).map { case (id, t) =>
      val toks = t.split(" ", -1).zipWithIndex
      val hits = toks.filter(tw => gaz.contains(tw._1))
      if (hits.isEmpty) (id, 0L, 0L, -1L, "none")
      else {
        val byCat = hits.groupBy(tw => gaz(tw._1)).view
          .mapValues(_.length).toMap
        val top = byCat.toSeq.minBy(t2 => (-t2._2, t2._1))._1
        (id, hits.length.toLong, hits.map(_._1).distinct.length.toLong,
          hits.map(_._2).min.toLong, top)
      }
    }.toSeq
    val got = TextOps.gazetteerTag(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq
    got shouldBe want
    // both outcomes present: tagged docs and clean docs
    got.exists(_._2 > 0) shouldBe true
    got.exists(_._2 == 0) shouldBe true
  }

  "TextSignals.chao1Vocab (r13)" should "replay the bias-corrected richness estimate" in {
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("lang", "text").collect()
      .flatMap(r => r.getString(1).split(" ", -1).filter(_.nonEmpty)
        .map(w => (r.getString(0), w)))
    val want = toks.groupBy(_._1).toSeq.sortBy(_._1).map { case (lang, g) =>
      val counts = g.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val v = counts.size.toLong
      val f1 = counts.values.count(_ == 1L).toLong
      val f2 = counts.values.count(_ == 2L).toLong
      (lang, v, f1, f2, 100L * v + 100L * f1 * (f1 - 1) / (2L * (f2 + 1)))
    }
    val got = TextSignals.chao1Vocab(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    got shouldBe want
    // the estimate never undercuts the observed vocabulary
    got.foreach { case (_, v, _, _, chao) => chao should be >= 100L * v }
  }

  "TextSignals.rakeKeywords (r13)" should "replay the RAKE phrase scores" in {
    val stop = Set("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // phrases: maximal stopword-free runs, per doc
    val phraseOcc = texts.flatMap { case (_, t) =>
      val ws = t.split(" ", -1)
      val runs = scala.collection.mutable.ListBuffer.empty[List[String]]
      var cur = List.empty[String]
      ws.foreach { w =>
        if (w.isEmpty || stop(w)) { if (cur.nonEmpty) runs += cur.reverse; cur = Nil }
        else cur ::= w
      }
      if (cur.nonEmpty) runs += cur.reverse
      runs.toList
    }
    val freq = phraseOcc.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val deg = phraseOcc.flatMap(p => p.map(w => (w, p.length.toLong)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val wscore = freq.keys.map(w => (w, 10000L * deg(w) / freq(w))).toMap
    val byPhrase = phraseOcc.map(p => p.mkString(" "))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val scored = byPhrase.toSeq.map { case (ph, nOcc) =>
      val pws = ph.split(" ")
      (ph, pws.length.toLong, nOcc, pws.map(wscore).sum)
    }
    val want = scored.sortBy(t => (-t._4, t._1)).take(20)
    val got = TextSignals.rakeKeywords(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe want
    // multi-word phrases must reach the head — the degree term binds
    got.count(_._2 >= 2) should be > 0
  }

  "TextSignals.heapsLaw (r13)" should "replay nested-budget vocab growth" in {
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val toks = texts.flatMap { case (id, t) =>
      val band = math.min((id * 2654435761L) % 4294967296L % 1000000L / 250000L, 3L)
      t.split(" ", -1).filter(_.nonEmpty).map(w => (band, w))
    }
    val ntC = toks.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val minBand = toks.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val want = (0L to 3L).map { b =>
      val nTok = (0L to b).map(x => ntC.getOrElse(x, 0L)).sum
      val nVoc = minBand.values.count(_ <= b).toLong
      ((b + 1) * 25, nTok, nVoc)
    }
    val got = TextSignals.heapsLaw(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    got.map(t => (t._1, t._2, t._3)).toSeq shouldBe want
    got.head._4 shouldBe 0.0
    // budgets nest: both curves are monotone nondecreasing, and beta
    // stays in [0, 1] (vocabulary can't grow faster than tokens)
    got.map(_._2).toSeq shouldBe got.map(_._2).sorted.toSeq
    got.map(_._3).toSeq shouldBe got.map(_._3).sorted.toSeq
    got.tail.foreach(_._4 should (be >= 0.0 and be <= 1.0))
  }

  "TextSignals.queryLikelihood" should "match a driver-side Dirichlet LM replay" in {
    val mu = 2000L
    val terms = Seq("spark", "vector", "dup")
    // split(text, " ", -1): Spark's split keeps trailing empty tokens
    val docs = graft.io.Sources.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val clen = docs.map(_._2.length.toLong).sum
    val cf = terms
      .map(t => t -> docs.map(_._2.count(_ == t).toLong).sum)
      .filter(_._2 > 0)
    val want = docs.map { case (id, ws) =>
      val perTerm = cf.map { case (t, c) =>
        val tf = ws.count(_ == t).toLong
        val v = math.log((tf * clen + mu * c).toDouble /
          ((ws.length + mu) * clen).toDouble) * 1e6
        (BigDecimal(v).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong,
          if (tf > 0) 1L else 0L)
      }
      (id, perTerm.map(_._2).sum, perTerm.map(_._1).sum)
    }.sortBy { case (id, _, sc) => (-sc, id) }.take(10).toSeq
    val got = TextSignals.queryLikelihood(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe want
    // scores are log-probabilities of a 3-term query: strictly negative,
    // and a doc can match at most the 3 present terms
    got.foreach { t =>
      t._2 should be <= 3L
      t._3 should be < 0L
    }
  }

  "TextSignals.burrowsDelta" should "replay the z-scored top-word distance" in {
    val docs = graft.io.Sources.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1)))
    val toks = docs.flatMap { case (s0, ws) => ws.map(w => (s0, w)) }
    val nt = toks.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val top = toks.groupBy(_._2).view.mapValues(_.length).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(10).map(_._1)
    val f = (for {
      s0 <- nt.keys.toSeq; w <- top
    } yield {
      val c = toks.count(t => t._1 == s0 && t._2 == w).toLong
      ((s0, w), c * 1000000L / nt(s0))
    }).toMap
    val ns = nt.size.toLong
    val z = f.map { case ((s0, w), fe) =>
      val vals = nt.keys.toSeq.map(s1 => f((s1, w)))
      val (m1, m2) = (vals.sum, vals.map(v => v * v).sum)
      val varS = (m2.toDouble / ns - (m1.toDouble / ns) * (m1.toDouble / ns)) *
        (ns.toDouble / (ns - 1).toDouble)
      ((s0, w), BigDecimal(1e6 * (fe.toDouble - m1.toDouble / ns) /
        math.sqrt(varS)).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }
    val srcs = nt.keys.toSeq.sorted
    val want = (for {
      a <- srcs; b <- srcs if a < b
    } yield {
      val sad = top.map(w => math.abs(z((a, w)) - z((b, w)))).sum
      (a, b, top.length.toLong, sad, sad / top.length)
    }).sortBy(t => (t._5, t._1, t._2)).take(10)
    val got = TextSignals.burrowsDelta(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    got shouldBe want
    // Delta is a mean of |z| gaps: nonnegative, and the released pairs
    // are the CLOSEST — their deltas ascend
    got.map(_._5) shouldBe got.map(_._5).sorted
    got.head._5 should be >= 0L
  }
}
