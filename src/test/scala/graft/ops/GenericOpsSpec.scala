package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Generic operator API (Dedup / Joins): semantics checked against
  * brute-force equivalents on small inputs.
  */
class GenericOpsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  "Joins.asofJoin" should "attach the latest right row at-or-before each left row" in {
    val s = spark
    import s.implicits._
    val quotes = Seq( // key, ts, px
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (2L, ts("2024-01-01 10:02:00"), 200.0),
    ).toDF("k", "ts", "px")
    val trades = Seq( // key, ts, qty
      (1L, ts("2024-01-01 10:00:00"), 5.0), // equal ts: inclusive <=
      (1L, ts("2024-01-01 10:04:59"), 6.0),
      (1L, ts("2024-01-01 10:06:00"), 7.0),
      (2L, ts("2024-01-01 10:01:00"), 8.0), // before any quote: null
      (3L, ts("2024-01-01 10:00:00"), 9.0), // key with no quotes: null
    ).toDF("k", "ts", "qty")

    val got = Joins.asofJoin(trades, quotes, "k", "ts", Seq("px"))
      .orderBy("k", "ts")
      .collect().map(r => (r.getLong(0), r.getDouble(2), Option(r.get(3)).map(_.asInstanceOf[Double])))
    got shouldBe Array(
      (1L, 5.0, Some(100.0)),
      (1L, 6.0, Some(100.0)),
      (1L, 7.0, Some(101.0)),
      (2L, 8.0, None),
      (3L, 9.0, None))
  }

  "Dedup.exactKeepMin" should "keep exactly the min-tieBreak row per group" in {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a", 10), (2L, "a", 10), (3L, "b", 20)).toDF("id", "g", "v")
    val out = Dedup.exactKeepMin(df, Seq("g", "v"), "id")
      .orderBy("id").collect().map(_.getLong(0))
    out shouldBe Array(1L, 3L)
  }

  "Joins.nearestJoin" should "pick the closer side, break ties backward, and respect tolerance" in {
    val s = spark
    import s.implicits._
    def t(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    val left = Seq((1L, 100L, t(100)), (1L, 101L, t(200)), (2L, 102L, t(100)),
        (3L, 103L, t(100)))
      .toDF("k", "lid", "ts")
    val right = Seq(
      (1L, 10L, t(90)),   // 10s before left@100 — nearer than 11 (20s after)
      (1L, 11L, t(120)),  // 20s after left@100; 80s before left@200
      (2L, 20L, t(80)), (2L, 21L, t(120)),  // exact tie: 20s both sides -> earlier (20)
      (3L, 30L, t(2000))) // outside the 60s tolerance for left@100
      .toDF("k", "rid", "ts")
    val got = Joins.nearestJoin(left, right, "k", "ts", Seq("rid"), 60000000L)
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) None else Some((r.getLong(3), r.getLong(4))))).toMap
    got(100L) shouldBe Some((10L, 10000000L))  // nearer predecessor wins
    got(101L) shouldBe None                    // best candidate is 80s away > 60s
    got(102L) shouldBe Some((20L, 20000000L))  // exact tie -> earlier right row
    got(103L) shouldBe None                    // nothing within tolerance
  }

  "Dedup.cdcApply" should "apply latest-wins upserts and drop tombstoned keys" in {
    val s = spark
    import s.implicits._
    val changes = Seq(
      (1L, 1L, "U", "v1"), (1L, 3L, "U", "v2"),   // key 1: latest upsert wins
      (2L, 1L, "U", "v1"), (2L, 2L, "D", ""),     // key 2: deleted at the end
      (3L, 1L, "D", ""), (3L, 2L, "U", "back"),   // key 3: re-inserted after delete
      (4L, 9L, "D", ""),                          // key 4: only a tombstone
    ).toDF("k", "seq", "op", "payload")
    val out = Dedup.cdcApply(changes, Seq("k"), Seq("seq"), "op", "D")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(3)))
    out shouldBe Array((1L, "v2"), (3L, "back"))
  }

  "Dedup.keepLatest" should "keep the max-order row per key" in {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 1L, "x"), (1L, 5L, "y"), (2L, 3L, "z")).toDF("k", "seq", "payload")
    val out = Dedup.keepLatest(df, Seq("k"), "seq")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(2)))
    out shouldBe Array((1L, "y"), (2L, "z"))
  }

  "Joins.topKPerKey" should "match sort-based top-k" in {
    val s = spark
    import s.implicits._
    val df = (1L to 20L).map(i => (i % 3, i, (i * 7 % 11).toDouble)).toDF("k", "id", "score")
    val got = Joins.topKPerKey(df, Seq("k"), "score", "id", 2)
      .orderBy("k", "id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(t => (-t._3, t._2)).take(2).map(t => (t._1, t._2))
      }.sortBy(identity)
    got.toSeq shouldBe want
  }

  "Joins.saltedEquiJoin" should "match the plain join on skewed keys" in {
    val s = spark
    import s.implicits._
    // 90% of left rows share key 0 (hot key)
    val left = (1L to 1000L).map(i => (if (i % 10 == 0) i % 5 else 0L, i)).toDF("k", "lv")
    val right = (0L to 4L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = left.join(right, "k").orderBy("lv").collect().map(_.toSeq)
    val salted = Joins.saltedEquiJoin(left, right, "k", saltFactor = 8)
      .select("k", "lv", "name").orderBy("lv").collect().map(_.toSeq)
    salted shouldBe plain
  }

  it should "preserve left-outer semantics" in {
    val s = spark
    import s.implicits._
    val left = Seq((1L, "a"), (9L, "no-match")).toDF("k", "lv")
    val right = Seq((1L, "dim")).toDF("k", "name")
    val out = Joins.saltedEquiJoin(left, right, "k", 4, "left_outer")
      .select("k", "lv", "name").orderBy("k").collect()
    out.length shouldBe 2
    out(1).isNullAt(2) shouldBe true
  }

  it should "reject right/full outer (salt replicas would duplicate unmatched rows)" in {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a")).toDF("k", "v")
    an[IllegalArgumentException] should be thrownBy
      Joins.saltedEquiJoin(df, df, "k", 4, "full_outer")
  }

  "Sampling.split" should "assign deterministic, partition-independent buckets" in {
    val s = spark
    import s.implicits._
    val df = (1L to 2000L).toDF("id")
    val once = Sampling.split(df, "id").groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val again = Sampling.split(df.repartition(13), "id").groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    again shouldBe once // repartitioning must not change membership
    once("train").toDouble shouldBe 1600.0 +- 120.0 // ~8/1/1
    once("val").toDouble shouldBe 200.0 +- 80.0
    once("test").toDouble shouldBe 200.0 +- 80.0
  }

  "Dedup.jaccard" should "compute set jaccard on array columns" in {
    val s = spark
    import s.implicits._
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    df.select(Dedup.jaccard(col("x"), col("y"))).collect()(0).getDouble(0) shouldBe 0.5 +- 1e-9
  }

  "scalar_business_days closed form" should "equal a literal weekday walk" in {
    // the operator ships B(e+1)-B(e+1) prefix arithmetic; walk calendars
    // day by day with java.time as the independent reference
    import java.time.{DayOfWeek, LocalDate}
    def walk(d0: LocalDate, d1: LocalDate): Long =
      Iterator.iterate(d0.plusDays(1))(_.plusDays(1))
        .takeWhile(!_.isAfter(d1))
        .count(d => d.getDayOfWeek != DayOfWeek.SATURDAY &&
          d.getDayOfWeek != DayOfWeek.SUNDAY).toLong
    def closed(d: LocalDate): Long = {
      val e = d.toEpochDay // the +1 interval shift is already inside +4
      5 * ((e + 4) / 7) + math.min((e + 4) % 7, 5) - 3
    }
    val rnd = new scala.util.Random(3)
    val epoch = LocalDate.of(1970, 1, 1)
    (1 to 300).foreach { _ =>
      val a = epoch.plusDays(rnd.nextInt(20000))
      val b = a.plusDays(rnd.nextInt(400))
      withClue(s"$a..$b") { closed(b) - closed(a) shouldBe walk(a, b) }
    }
  }

  "Similarity.multiprobeFrozen" should "match brute-force probing and use the distance-1 ring" in {
    val got = Similarity.multiprobeFrozen(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    got should not be empty
    // every winner's probe distance is 0 or 1 by construction, and the
    // distance-1 ring must actually produce winners on this fixture —
    // otherwise multiprobe degenerates to single-bucket LSH here
    got.map(_._5).toSet.subsetOf(Set(0L, 1L)) shouldBe true
    got.map(_._5) should contain(1L)
    // per query: ranks are 1..k with strictly ordered (dot desc, id asc)
    got.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      sorted.map(_._2) shouldBe (1L to sorted.length)
      sorted.sliding(2).foreach {
        case Array((_, _, id0, d0, _), (_, _, id1, d1, _)) =>
          assert(d0 > d1 || (d0 == d1 && id0 < id1))
        case _ => ()
      }
    }
  }

  "Similarity.ivfFrozen" should "rank candidates exactly and serve from the second probe" in {
    val got = Similarity.ivfFrozen(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    got should not be empty
    // winners come from probe cells 1 AND 2 — nprobe=2 is load-bearing
    got.map(_._5).toSet shouldBe Set(1L, 2L)
    // per query: ranks 1..k, strictly ordered (dot desc, id asc)
    got.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      sorted.map(_._2) shouldBe (1L to sorted.length)
      sorted.sliding(2).foreach {
        case Array((_, _, id0, d0, _), (_, _, id1, d1, _)) =>
          assert(d0 > d1 || (d0 == d1 && id0 < id1))
        case _ => ()
      }
    }
  }

  "Graph.subtreeRollup" should "equal a literal per-chain ancestor walk" in {
    val spend = graft.io.Sources.customer(spark, sfDir)
      .select(col("c_custkey").cast("long").as("id"))
      .join(graft.io.Sources.orders(spark, sfDir)
          .select(col("o_custkey").cast("long").as("id"),
            round(col("o_totalprice") * 100).cast("long").as("cents")),
        Seq("id"), "left")
      .groupBy("id")
      .agg(coalesce(sum("cents"), lit(0L)).as("cents"),
        count(col("cents")).as("n_orders"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // walk every node's chain n -> n/10 -> ... -> 0, accumulate per anc
    val acc = scala.collection.mutable.Map[Long, (Long, Long, Long)]()
    spend.keys.foreach { n =>
      var a = n
      var prev = -1L
      while (a != prev) {
        val (c, o) = spend(n)
        val (d0, c0, o0) = acc.getOrElse(a, (0L, 0L, 0L))
        acc(a) = (d0 + 1, c0 + c, o0 + o)
        prev = a; a = a / 10
      }
    }
    val got = Graph.subtreeRollup(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    got shouldBe acc.toMap
  }

  "Mining.seqPairs" should "equal the existential before/after definition" in {
    val evs = graft.io.Sources.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // support = #users with SOME a-event strictly before SOME b-event:
    // enumerate concrete event pairs per user, dedupe to the user's
    // supported (a, b) set, then count users per pair
    val perUser = evs.groupBy(_._1).values.flatMap { rows =>
      (for {
        (_, ta, ua) <- rows
        (_, tb, ub) <- rows
        if ua < ub
      } yield (ta, tb)).toSet
    }.toSeq.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    perUser should not be empty
    val got = Mining.seqPairs(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    got shouldBe perUser
  }

  "Mining.seqGapPairs (r13)" should "equal the unbanded gap-witness definition" in {
    val evs = graft.io.Sources.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val gapUs = 900000000L
    val byUser = evs.groupBy(_._1).values
    val gapSup = byUser.flatMap { rows =>
      (for {
        (_, ta, ua) <- rows
        (_, tb, ub) <- rows
        if ub > ua && ub - ua <= gapUs
      } yield (ta, tb)).toSet
    }.toSeq.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val anySup = byUser.flatMap { rows =>
      (for { (_, ta, ua) <- rows; (_, tb, ub) <- rows if ua < ub }
        yield (ta, tb)).toSet
    }.toSeq.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = Mining.seqGapPairs(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    got.view.mapValues(_._2).toMap.filter(_._2 > 0) shouldBe gapSup
    got.view.mapValues(_._1).toMap shouldBe anySup
    // the gap genuinely binds: every support shrinks or holds, and
    // at least one pair loses most of its unconstrained support
    got.values.foreach { case (anyC, gapC) => gapC should be <= anyC }
    got.values.exists { case (anyC, gapC) => gapC * 2 < anyC } shouldBe true
  }

  "Mining.seqTriples" should "equal the brute-force three-event definition" in {
    val evs = graft.io.Sources.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // literal definition: exists a-event < b-event < c-event, any types
    val perUser = evs.groupBy(_._1).values.flatMap { rows =>
      (for {
        (_, ta, ua) <- rows
        (_, tb, ub) <- rows
        if ua < ub
        (_, tc, uc) <- rows
        if ub < uc
      } yield (ta, tb, tc)).toSet
    }.toSeq.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    perUser should not be empty
    val got = Mining.seqTriples(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap
    got shouldBe perUser
  }

  "Similarity.rangeCount (r13)" should "match a brute-force radius census" in {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def cos4(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map(t => t._1 * t._2).sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      math.round(dot / (na * nb) * 1e4) / 1e4
    }
    val queries = vecs.filter(_._1 < 8)
    val corpus = vecs.filter(_._1 >= 8)
    val want = queries.sortBy(_._1).map { case (qid, qv) =>
      val cs = corpus.map(c => cos4(c._2, qv))
      (qid, cs.count(_ >= 0.1).toLong, cs.count(_ >= 0.3).toLong, cs.max)
    }.toSeq
    val got = Similarity.rangeCount(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    got.map(t => (t._1, t._2, t._3)) shouldBe want.map(t => (t._1, t._2, t._3))
    got.zip(want).foreach { case (g, w) => g._4 shouldBe w._4 +- 1e-9 }
    // the radii nest, and both genuinely bind on the fixture
    got.foreach { case (_, r1, r3, _) => r3 should be <= r1 }
    got.map(_._2).sum should be > 0L
    got.map(_._2).max.toInt should be < corpus.length
  }

  "Similarity.pqAdcFrozen (r13)" should "match a brute-force encode + ADC replay" in {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS LONG)) AS qv")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    def cb(sub: Int, cell: Int, i: Int): Long =
      ((7L * sub + 3L * cell + 5L * i) % 13L - 6L) * 1000L
    def d2(qv: Array[Long], sub: Int, cell: Int): Long =
      (0 until 8).map { i =>
        val d = qv(sub * 8 + i) - cb(sub, cell, i); d * d
      }.sum
    val corpus = vecs.filter(_._1 >= 8)
    val queries = vecs.filter(_._1 < 8)
    val codes = corpus.map { case (id, qv) =>
      id -> (0 until 8).map(sub => (0 until 4).map(c => (d2(qv, sub, c), c)).min._2)
    }.toMap
    val want = queries.map { case (qid, qqv) =>
      val best = corpus.map { case (cid, _) =>
        val adc = (0 until 8).map(sub => d2(qqv, sub, codes(cid)(sub))).sum
        (adc, cid)
      }.min
      (qid, best._2, best._1)
    }.sortBy(_._1).toSeq
    val got = Similarity.pqAdcFrozen(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe want
    // the codebook genuinely partitions: multiple cells used per subspace
    codes.values.flatten.toSet.size should be > 1
  }

  private def e4Scores: (Seq[(Long, Long, Long)], Map[Long, Array[Double]]) = {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cosE4(a: Array[Double], b: Array[Double]): Long = {
      val dot = a.zip(b).map(t => t._1 * t._2).sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      math.round(dot / (na * nb) * 1e4)
    }
    val scored = for {
      (qid, qv) <- vecs.toSeq if qid < 8
      (cid, cv) <- vecs.toSeq if cid >= 8
    } yield (qid, cid, cosE4(qv, cv))
    (scored, vecs)
  }

  "Similarity.centroidDrift (r13)" should "replay the cross-scaled half-corpus drift" in {
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("label", "vec_id",
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS LONG)) AS qv")
      .collect().map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getSeq[Long](2)))
    val want = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (lbl, g) =>
      val (a, b) = g.partition(t => (t._2 % 1048576) * 2654435761L % 2 == 0)
      val (na, nb) = (a.length.toLong, b.length.toLong)
      val dims = a.head._3.length
      val drift = (0 until dims).map { d0 =>
        val sa = a.map(_._3(d0)).sum; val sb = b.map(_._3(d0)).sum
        math.abs(nb * sa - na * sb)
      }.sum
      (lbl, na, nb, drift, drift / (na * nb * 64))
    }
    val got = Similarity.centroidDrift(spark, sfDir).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    got shouldBe want
    // both halves populated per label, drift finite and small relative
    // to the e4 embedding scale (the labels are genuinely stable)
    got.foreach { case (_, na, nb, _, de4) =>
      na should be > 0L
      nb should be > 0L
      de4 should be < 10000L
    }
  }

  "Similarity.rocchioPrf (r13)" should "replay the 21:7 integer expansion trajectory" in {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS LONG)) AS qv")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => a(i) * b(i)).sum
    val qs = vecs.keys.filter(_ < 8).toSeq.sorted
    val cs = vecs.keys.filter(_ >= 8).toSeq.sorted
    val want = qs.flatMap { qid =>
      val baseRank = cs.map(c => (c, dot(vecs(qid), vecs(c))))
        .sortBy(t => (-t._2, t._1))
      val top3 = baseRank.take(3).map(_._1)
      val baseTop5 = baseRank.take(5).map(_._1).toSet
      val qp = vecs(qid).indices.map(i =>
        21L * vecs(qid)(i) + 7L * top3.map(c => vecs(c)(i)).sum).toArray
      cs.map(c => (c, dot(qp, vecs(c))))
        .sortBy(t => (-t._2, t._1)).take(5).zipWithIndex
        .map { case ((c, dp), i) =>
          (qid, (i + 1).toLong, c, dp, baseTop5(c)) }
    }
    val got = Similarity.rocchioPrf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq
    got shouldBe want
    // expansion keeps the head relevant but genuinely reshuffles:
    // most expanded top-5 entries come from the base top-5, yet at
    // least one novel entry appears somewhere
    got.count(_._5) should be > got.length / 2
    got.exists(!_._5) shouldBe true
  }

  "Similarity.clusterPurity (r13)" should "replay purity and NMI on the e6 lattice" in {
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("CAST(label AS LONG) AS label",
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS LONG)) AS qv")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val bases = Seq(
      (7L, 3L, 17L), (5L, 11L, 19L), (11L, 5L, 23L),
      (13L, 7L, 29L), (3L, 1L, 13L), (17L, 2L, 31L))
    def bucket(qv: Array[Long]): Long =
      bases.zipWithIndex.map { case ((a, b, m), j) =>
        val dot = qv.indices.map(i => qv(i) * ((a * i + b) % m - m / 2)).sum
        if (dot >= 0) 1L << j else 0L
      }.sum
    val cells = rows.map(t => (bucket(t._2), t._1))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = rows.length.toLong
    val nb = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nl = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val purity = nb.keys.toSeq.map(b =>
      cells.filter(_._1._1 == b).values.max).sum
    val iE6 = cells.map { case ((b, l), c) =>
      math.round(1e6 * c * math.log(n.toDouble * c / (nb(b).toDouble * nl(l))))
    }.sum
    val hbE6 = nb.values.map(c =>
      math.round(1e6 * c * math.log(n.toDouble / c))).sum
    val hlE6 = nl.values.map(c =>
      math.round(1e6 * c * math.log(n.toDouble / c))).sum
    val row = Similarity.clusterPurity(spark, sfDir).collect().head
    (row.getLong(0), row.getLong(1), row.getLong(2)) shouldBe
      ((n, nb.size.toLong, nl.size.toLong))
    row.getLong(3) shouldBe purity
    row.getLong(4) shouldBe 1000000L * purity / n
    (row.getLong(5), row.getLong(6), row.getLong(7)) shouldBe
      ((iE6, hbE6, hlE6))
    val nmi = iE6.toDouble / math.sqrt(hbE6.toDouble * hlE6)
    row.getDouble(8) shouldBe (math.round(nmi * 1e6) / 1e6) +- 1e-9
    // structural bounds: purity >= 1/|labels| share, NMI in [0, 1]
    row.getLong(4) should be >= 1000000L / nl.size
    row.getDouble(8) should (be >= 0.0 and be <= 1.0)
  }

  "Similarity.maxsimLate (r13)" should "replay the ColBERT max-then-sum trajectory" in {
    val (scored, _) = e4Scores
    val perQvec = scored.groupBy(t => (t._1 / 4, t._1, t._2 / 4)).view
      .mapValues(_.map(_._3).max).toMap
    val perDoc = perQvec.toSeq.groupBy(t => (t._1._1, t._1._3)).view
      .mapValues(g => (g.map(_._2).sum, g.length.toLong)).toMap
    val want = perDoc.toSeq.groupBy(_._1._1).toSeq.sortBy(_._1).flatMap {
      case (qg, docs) =>
        docs.sortBy(t => (-t._2._1, t._1._2)).take(5).zipWithIndex.map {
          case (((_, dg), (ms, nq)), i) => (qg, (i + 1).toLong, dg, ms, nq)
        }
    }
    val got = Similarity.maxsimLate(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    got shouldBe want
    // every query doc contributes all 4 of its vectors, and MaxSim
    // dominates any single-vector best (it sums 4 maxima)
    got.foreach(_._5 shouldBe 4L)
    got.foreach(_._4 should be > 0L)
  }

  "Similarity.hardNegatives (r13)" should "mine the semi-hard band exactly" in {
    val (scored, _) = e4Scores
    val want = scored.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (qid, rows) =>
        val ranked = rows.sortBy(t => (-t._3, t._2))
        val (posId, posE4) = (ranked.head._2, ranked.head._3)
        ranked.tail
          .filter(t => t._3 < posE4 && t._3 >= posE4 - 3000)
          .sortBy(t => (-t._3, t._2)).take(3).zipWithIndex
          .map { case ((_, nid, ne4), i) =>
            (qid, (i + 1).toLong, nid, ne4, posId, posE4) }
    }
    val got = Similarity.hardNegatives(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    got shouldBe want
    // the band genuinely binds: every mined negative is strictly below
    // the positive and within the margin
    got.foreach { case (_, _, _, ne4, _, pe4) =>
      ne4 should be < pe4
      ne4 should be >= pe4 - 3000
    }
    got should not be empty
  }

  "Similarity.mmrRerank (r13)" should "replay the greedy integer MMR trajectory" in {
    val (scored, vecs) = e4Scores
    def simE4(a: Long, b: Long): Long = {
      val (va, vb) = (vecs(a), vecs(b))
      val dot = va.zip(vb).map(t => t._1 * t._2).sum
      math.round(dot / (math.sqrt(va.map(x => x * x).sum) *
        math.sqrt(vb.map(x => x * x).sum)) * 1e4)
    }
    val want = scored.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (qid, rows) =>
        val cand = rows.sortBy(t => (-t._3, t._2)).take(8)
          .map(t => (t._2, t._3)) // (vec_id, rel_e4)
        var selected = Vector.empty[(Long, Long)] // (vec_id, mmr_e4)
        (1 to 3).foreach { _ =>
          val selIds = selected.map(_._1).toSet
          val best = cand.filterNot(c => selIds(c._1)).map { case (id, rel) =>
            val pen = if (selIds.isEmpty) 0L
              else selIds.map(s => simE4(id, s)).max
            (id, 7 * rel - 3 * pen)
          }.minBy(t => (-t._2, t._1))
          selected :+= best
        }
        selected.zipWithIndex.map { case ((id, sc), i) =>
          (qid, (i + 1).toLong, id, sc) }
    }
    val got = Similarity.mmrRerank(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe want
    // diversification is load-bearing on the fixture: for at least one
    // probe the MMR set differs from the plain relevance top-3
    val plainTop3 = scored.groupBy(_._1).map { case (qid, rows) =>
      qid -> rows.sortBy(t => (-t._3, t._2)).take(3).map(_._2).toSet }
    val mmrSets = got.groupBy(_._1).map { case (q, g) => q -> g.map(_._3).toSet }
    mmrSets.exists { case (q, s) => s != plainTop3(q) } shouldBe true
  }
}
