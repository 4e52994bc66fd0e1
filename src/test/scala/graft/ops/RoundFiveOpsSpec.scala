package graft.ops

import graft.SparkSpec

/** Round-5 additions (sequence packing, leakage audit, vocabulary
  * coverage, canonical-doc selection, drift monitor): semantics checked
  * against independent brute-force recomputation in plain Scala over the
  * collected sf0.001 fixture — no Spark code shared with the op under
  * test.
  */
class RoundFiveOpsSpec extends SparkSpec {

  private def round4(x: Double): Double = BigDecimal(x)
    .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val docs: Seq[(Long, String, String, Long)] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  "Sampling.sampleSeqPack" should "assign each doc to the window where its token offset starts" in {
    val expected = docs.groupBy(_._3).flatMap { case (lang, group) =>
      var off = 0L
      group.sortBy(_._1).map { case (id, text, _, _) =>
        val n = text.split(" ", -1).length.toLong
        val seqId = off / 2048L
        off += n
        (lang, seqId, id, n)
      }
    }.toSeq.groupBy(t => (t._1, t._2)).map { case ((lang, seq), rows) =>
      (lang, seq) -> ((rows.size.toLong, rows.map(_._4).sum, rows.map(_._3).min, rows.map(_._3).max))
    }
    val got = Sampling.sampleSeqPack(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    got shouldBe expected
    // packing must produce >1 sequence per language to bind
    got.keys.groupBy(_._1).values.foreach(_.size should be > 1)
  }

  "Sampling.sampleLeakageAudit" should "count val/test docs whose word-set fingerprint appears in train" in {
    def split(id: Long) = if (id % 10 < 8) "train" else if (id % 10 < 9) "val" else "test"
    def fp(text: String) = text.split(" ", -1).distinct.sorted.mkString(" ")
    val trainFps = docs.filter(d => split(d._1) == "train").map(d => fp(d._2)).toSet
    val expected = docs.filter(d => split(d._1) != "train")
      .groupBy(d => split(d._1)).map { case (s, group) =>
        s -> ((group.size.toLong, group.count(d => trainFps(fp(d._2))).toLong))
      }
    val got = Sampling.sampleLeakageAudit(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    got.keySet shouldBe expected.keySet
    expected.foreach { case (s, (n, leaked)) =>
      got(s)._1 shouldBe n
      got(s)._2 shouldBe leaked
      got(s)._3 shouldBe round4(leaked.toDouble / n)
    }
    // leakage must actually fire on the fixture
    got.values.map(_._2).sum should be > 0L
  }

  "TextSignals.vocabCoverage" should "report per-language token mass covered by the global top-10 words" in {
    val allWords = docs.flatMap(d => d._2.split(" ", -1).map(w => (d._3, w)))
    val top10 = allWords.groupBy(_._2).view.mapValues(_.size).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(10).map(_._1).toSet
    val expected = allWords.groupBy(_._1).map { case (lang, toks) =>
      val inTop = toks.count(t => top10(t._2)).toLong
      lang -> ((toks.size.toLong, inTop, round4(inTop.toDouble / toks.size)))
    }
    val got = TextSignals.vocabCoverage(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    got shouldBe expected
    // the cut must bind: coverage strictly between 0 and 1
    got.values.foreach { case (_, _, cov) => cov should (be > 0.0 and be < 1.0) }
  }

  /** Brute-force union-find over the same pair predicate as the groups
    * oracle: doc_id → component member list.
    */
  private lazy val bruteGroups: Map[Long, Seq[(Long, String, String, Long)]] = {
    val wsets = docs.map(d => d._1 -> d._2.split(" ", -1).distinct.toSet).toMap
    val parent = scala.collection.mutable.Map(docs.map(d => d._1 -> d._1): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for {
      a <- docs; b <- docs
      if a._1 < b._1 && a._3 == b._3 && math.abs(a._4 - b._4) <= 3
      j = round4(wsets(a._1).intersect(wsets(b._1)).size.toDouble /
        wsets(a._1).union(wsets(b._1)).size)
      if j >= 0.3
    } parent(find(a._1)) = find(b._1)
    docs.groupBy(d => find(d._1)).map { case (_, g) => g.map(_._1).min -> g }
  }

  "TextOps.dedupCanonical" should "keep the longest variant (min-id ties) per multi-doc group" in {
    val expected = bruteGroups.values.filter(_.size >= 2).map { g =>
      val gid = g.map(_._1).min
      val canon = g.minBy(d => (-d._4, d._1))
      gid -> ((g.size.toLong, canon._1, canon._4))
    }.toMap
    val got = TextOps.dedupCanonical(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    got shouldBe expected
    got.size should be > 0
  }

  "TextOps.textChunkOverlap" should "cover every word with 64-word chunks at 48-word stride" in {
    def md5(t: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = docs.flatMap { case (id, text, _, _) =>
      val ws = text.split(" ", -1)
      (0 until ws.length by 48).map { st =>
        val chunk = ws.slice(st, st + 64)
        (id, (st / 48).toLong) -> ((chunk.length.toLong, md5(chunk.mkString(" "))))
      }
    }.toMap
    val got = TextOps.textChunkOverlap(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getString(3)))).toMap
    got shouldBe expected
    // overlap must bind: some doc needs more than one chunk
    got.keys.groupBy(_._1).values.exists(_.size > 1) shouldBe true
  }

  "Sampling.sampleGroupSplit" should "assign whole near-dup groups to one split" in {
    def splitOf(gid: Long) = if (gid % 10 < 8) "train" else if (gid % 10 < 9) "val" else "test"
    val expected = bruteGroups.toSeq.groupBy { case (gid, _) => splitOf(gid) }
      .map { case (s, gs) => s -> ((gs.size.toLong, gs.map(_._2.size.toLong).sum)) }
    val got = Sampling.sampleGroupSplit(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    got shouldBe expected
    // atomicity is structural (the split key IS the group id); binding check:
    // some multi-doc group must land outside train so co-location matters
    bruteGroups.exists { case (gid, g) => g.size >= 2 && splitOf(gid) != "train" } shouldBe true
  }

  "StreamingAnalogs.driftMonitor" should "flag days more than 2 sigma from the trailing-7 baseline" in {
    val events = graft.io.Sources.events(spark, sfDir)
      .selectExpr("event_type", "date_format(ts, 'yyyy-MM-dd') AS day")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val daily = events.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((t, day), n) => (t, day, n) }.sortBy(t => (t._1, t._2))
    val expected = daily.groupBy(_._1).flatMap { case (t, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.zipWithIndex.map { case ((_, day, n), i) =>
        val base = sorted.slice(math.max(0, i - 7), i).map(_._3)
        if (base.size >= 3) {
          val cnt = base.size.toDouble
          val sum = base.sum.toDouble
          val ssq = base.map(x => x * x).sum.toDouble
          val mean = sum / cnt
          val varr = (ssq - sum * sum / cnt) / (cnt - 1.0)
          val z = if (varr > 0) Some(round4((n - mean) / math.sqrt(varr))) else None
          (t, day) -> ((n, Some(round4(mean)), z, z.exists(v => math.abs(v) > 2)))
        } else (t, day) -> ((n, None: Option[Double], None: Option[Double], false))
      }
    }
    val got = StreamingAnalogs.driftMonitor(spark, sfDir).collect()
      .map { r =>
        (r.getString(0), r.getString(1)) -> ((r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          r.getBoolean(5)))
      }.toMap
    got shouldBe expected.toMap
    // at least one anomaly and one calm day must bind
    val flags = got.values.map(_._4)
    flags.exists(identity) shouldBe true
    flags.exists(!_) shouldBe true
  }

  "TextOps.triangleStats" should "match brute-force triangle and wedge counts over the pair graph" in {
    val edges = TextOps.ngramJaccardPairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val edgeSet = edges.toSet
    val tri = (for {
      (a, b) <- edges
      (b2, c) <- edges if b2 == b && edgeSet((a, c))
    } yield (a, b, c)).size.toLong
    val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val wedges = deg.values.map(d => d * (d - 1) / 2).sum
    val row = TextOps.triangleStats(spark, sfDir).collect().head
    row.getLong(0) shouldBe edges.size.toLong
    row.getLong(1) shouldBe wedges
    row.getLong(2) shouldBe tri
    tri should be > 0L // the dup clusters must close triangles
    row.getDouble(3) should (be > 0.0 and be <= 1.0)
  }

  "StreamingAnalogs.patternConversions" should "match brute-force regex counting over ordered histories" in {
    val events = graft.io.Sources.events(spark, sfDir)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id", "substring(event_type, 1, 1) AS i")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    val expected = events.groupBy(_._1).view.mapValues { es =>
      val seq = es.sortBy(e => (e._2, e._3)).map(_._4).mkString
      (seq.length.toLong, "c+p".r.findAllIn(seq).size.toLong)
    }.toMap
    val got = StreamingAnalogs.patternConversions(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    got shouldBe expected
    got.values.map(_._2).sum should be > 0L // conversions bind
  }

  "StreamingAnalogs.staticEnrich" should "match brute-force hourly per-segment totals over the dim join" in {
    def round2(x: Double): Double = BigDecimal(x)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val segs = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val events = graft.io.Sources.events(spark, sfDir)
      .selectExpr("user_id", "date_format(date_trunc('hour', ts), 'yyyy-MM-dd HH:mm') AS h", "value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    val expected = events.flatMap { case (u, h, v) =>
      segs.get(u).map(seg => ((h, seg), v))
    }.groupBy(_._1).view.mapValues { vs =>
      (vs.size.toLong, round2(vs.map(_._2).sum))
    }.toMap
    val got = StreamingAnalogs.staticEnrich(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    got.keySet shouldBe expected.keySet
    got.foreach { case (k, (n, sv)) =>
      n shouldBe expected(k)._1
      sv shouldBe expected(k)._2 +- 0.01
    }
    // the dim join must actually enrich: several segments present
    got.keySet.map(_._2).size should be >= 3
    // and the plan must broadcast the dimension side (stream-static shape)
    StreamingAnalogs.staticEnrich(spark, sfDir)
      .queryExecution.executedPlan.toString should include("BroadcastHashJoin")
  }

  "StreamingAnalogs.latenessAudit" should "replay the idealized-watermark drop census" in {
    import org.apache.spark.sql.functions.{col, date_trunc, unix_micros}
    val evs = graft.io.Sources.events(spark, sfDir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        unix_micros(date_trunc("hour", col("ts"))).as("h_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = Seq(0L, 60L, 600L).map { pol =>
      val flags = evs.map { case (id, us, hUs) =>
        val delay = ((id * 2654435761L) % 4294967296L) % 120L +
          (if (id % 13 == 0) 3600L else 0L)
        (delay, us + delay * 1000000L > hUs + 3600000000L + pol * 1000000L)
      }
      val dropped = flags.count(_._2).toLong
      (pol, evs.length.toLong, dropped, flags.map(_._1).max,
        dropped * 1000000L / evs.length)
    }
    val got = StreamingAnalogs.latenessAudit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    got shouldBe want
    // the policy sweep is monotone: a laxer watermark never drops more
    got.map(_._3) shouldBe got.map(_._3).sorted.reverse
    // the straggler tail binds: even L = 600 s drops the +3600 events
    got.last._3 should be > 0L
  }
}
