package graft.ops

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Algebraic properties of the dedup operators (SURVEY §5.3): over seeded
  * random tables, dedup must be (a) idempotent — a second pass is the
  * identity; (b) a subset of the input; (c) key-unique; and the survivor
  * choice must be partition-layout-independent (the property
  * `dropDuplicates` itself does NOT have, which is why the library pins a
  * deterministic representative).
  */
class DedupPropertiesSpec extends SparkSpec {

  private val rnd = new Random(7)

  private def randomTable(n: Int, keySpace: Int): DataFrame = {
    val s = spark
    import s.implicits._
    (1 to n).map { i =>
      (i.toLong, rnd.nextInt(keySpace), rnd.nextInt(keySpace), rnd.nextDouble())
    }.toDF("id", "k1", "k2", "v")
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  "exactKeepMin" should "be idempotent, a subset, and key-unique on random tables" in {
    (1 to 5).foreach { _ =>
      val t = randomTable(n = 200 + rnd.nextInt(300), keySpace = 2 + rnd.nextInt(20))
      val once = Dedup.exactKeepMin(t, Seq("k1", "k2"), "id")
      val twice = Dedup.exactKeepMin(once, Seq("k1", "k2"), "id")
      rows(twice) shouldBe rows(once)                        // idempotent
      rows(once).subsetOf(rows(t)) shouldBe true             // subset
      once.groupBy("k1", "k2").count().agg(max("count"))
        .collect()(0).getLong(0) shouldBe 1L                 // key-unique
      once.count() shouldBe t.select("k1", "k2").distinct().count()
    }
  }

  it should "pick the same survivors regardless of partition layout" in {
    val t = randomTable(n = 500, keySpace = 10)
    val a = Dedup.exactKeepMin(t.repartition(1), Seq("k1"), "id")
    val b = Dedup.exactKeepMin(t.repartition(17, col("v")), Seq("k1"), "id")
    rows(a) shouldBe rows(b)
  }

  "keepLatest" should "survive exactly the max-order row per key" in {
    val t = randomTable(n = 400, keySpace = 8)
    val kept = Dedup.keepLatest(t, Seq("k1"), "id")
    val expected = t.groupBy("k1").agg(max("id").as("id"))
    rows(kept.select("k1", "id")) shouldBe rows(expected)
  }

  "lshCandidatePairs" should "be symmetric-free and contained in the id cross space" in {
    val docs = graft.io.Sources.documents(spark, sfDir)
    val pairs = Dedup.lshCandidatePairs(
      Dedup.minHashBands(docs, "doc_id", "text"), "doc_id").collect()
    pairs.foreach(r => r.getLong(0) should be < r.getLong(1))
  }

  "minHashBandsFromSets" should "be bit-identical to banding the raw text" in {
    // min over a multiset == min over its distinct support, and the
    // per-seed signatures re-hash the same first-level longs — so bands
    // derived from the hashed distinct-shingle sets must match the
    // from-text construction EXACTLY, for every band column and row
    val docs = graft.io.Sources.documents(spark, sfDir)
    val fromText = Dedup.minHashBands(docs, "doc_id", "text", nHashes = 16, bandSize = 2)
    val sets = docs
      .select(col("doc_id"),
        array_distinct(transform(
          Dedup.wordShingles(split(col("text"), " ")), h => xxhash64(h))).as("sset"))
    val fromSets = Dedup.minHashBandsFromSets(sets, "doc_id", "sset",
      nHashes = 16, bandSize = 2)
    fromText.columns shouldBe fromSets.columns
    rows(fromText) shouldBe rows(fromSets)
  }

  "lshCandidatePairsAcross" should "find cross-set dups, emit no self-pairs, and drop over-cap corpus buckets" in {
    val s = spark
    import s.implicits._
    val boiler = "lorem ipsum dolor sit amet " * 5
    val corpusDocs = ((1 to 60).map(i => (i.toLong, boiler)) ++ Seq(
      (200L, "spark catalyst optimizer rewrites logical plans into physical plans for execution"),
      (201L, "structured streaming incrementalizes a batch query over an unbounded source table")))
      .toDF("doc_id", "text")
    // batch: one doc already in the corpus (id 200), one near-dup of 201,
    // one boilerplate doc, one unrelated
    val batchDocs = Seq(
      (200L, "spark catalyst optimizer rewrites logical plans into physical plans for execution"),
      (300L, "structured streaming incrementalizes a batch query over an unbounded source stream"),
      (301L, boiler),
      (302L, "entirely unrelated text mentioning nothing shared with anything else whatsoever"))
      .toDF("doc_id", "text")
    val corpusBands = Dedup.minHashBands(corpusDocs, "doc_id", "text")
    val batchBands = Dedup.minHashBands(batchDocs, "doc_id", "text")

    val pairs = Dedup.lshCandidatePairsAcross(batchBands, corpusBands, "doc_id", bucketCap = 30L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // no self-pairs even though id 200 appears on both sides
    pairs.filter(p => p._1 == p._2) shouldBe empty
    // re-probed doc still matches its identical corpus copy (as a!=b pair? no —
    // identical text means every band collides, but the only corpus partner
    // with that signature is itself, filtered; near-dup 300↔201 must survive)
    pairs should contain ((300L, 201L))
    // over-cap boilerplate buckets are dropped: the batch boilerplate doc
    // proposes no pairs into the 60-doc mega-bucket
    pairs.filter(_._1 == 301L) shouldBe empty
    // unrelated doc proposes nothing
    pairs.filter(_._1 == 302L) shouldBe empty

    // with a generous cap the mega-bucket is admitted: 301 pairs with all 60
    val uncapped = Dedup.lshCandidatePairsAcross(batchBands, corpusBands, "doc_id", bucketCap = 4096L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    uncapped.filter(_._1 == 301L).map(_._2) shouldBe (1 to 60).map(_.toLong).toSet
    uncapped.filter(p => p._1 == p._2) shouldBe empty
  }

  "sketch-verified near-dup queries" should "match or under-approximate the all-pairs verified set" in {
    // The all-pairs ground truth at τ=0.6. The fixture is bimodal (dups
    // ≥ 0.8 shingle-Jaccard, unrelated < 0.15), so τ sits in a wide gap.
    val docs = graft.io.Sources.documents(spark, sfDir)
    val sets = docs.select(col("doc_id"),
      array_distinct(Dedup.wordShingles(split(col("text"), " "))).as("sset"))
    val a = sets.select(col("doc_id").as("id_a"), col("sset").as("sa"))
    val b = sets.select(col("doc_id").as("id_b"), col("sset").as("sb"))
    val exact = a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(Dedup.jaccard(col("sa"), col("sb")), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    exact should not be empty
    def result(df: DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // minhash: COMPLETE recall above τ — this equivalence is what
    // licenses its all-pairs DuckDB oracle; a miss is a real failure.
    result(TextOps.dedupMinHashLsh(spark, sfDir)) shouldBe exact
    // simhash: precision 1 (every reported pair is a true verified pair)
    // but structurally incomplete recall (see dedupSimHash scaladoc) —
    // a strict subset here, which is why it has no oracle.
    val viaSimhash = result(TextOps.dedupSimHash(spark, sfDir))
    viaSimhash should not be empty
    viaSimhash.subsetOf(exact) shouldBe true
    // prefix-filtered threshold join: EXACTLY the τ=0.5 all-pairs set —
    // the prefix-token candidate generator is provably complete, so any
    // drift from the brute-force join is a real bug, not sketch noise.
    val exactHalf = a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(Dedup.jaccard(col("sa"), col("sb")), 4).as("jaccard"))
      .filter(Dedup.jaccard(col("sa"), col("sb")) >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    result(TextOps.jaccardPrefixJoin(spark, sfDir)) shouldBe exactHalf
    exactHalf.size should be >= exact.size // τ=0.5 is the looser cut
  }

  "connectedGroups" should "label components with their minimum member id" in {
    val s = spark
    import s.implicits._
    // chain 1-2-3-4, isolated 10, pair 20-21 (edge given high-to-low)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (21L, 20L)).toDF("id_a", "id_b")
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 20L, 21L).toDF("node_id")
    val got = Dedup.connectedGroups(pairs, nodes, "node_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 20L -> 20L, 21L -> 20L)
  }

  it should "put both ends of every candidate pair in the same group" in {
    val docs = graft.io.Sources.documents(spark, sfDir)
    val pairs = TextOps.ngramJaccardPairs(spark, sfDir).select("id_a", "id_b")
    // localFinishEdges = 0 forces the pure-distributed star loop — the
    // path that runs at 100 TB — rather than the immediate local finish
    // a fixture-sized edge set would take
    val (groupsDf, rounds) =
      Dedup.connectedGroupsWithStats(pairs, docs.select("doc_id"), "doc_id",
        localFinishEdges = 0L)
    // O(log²)-round regime, not diameter-rounds: the sf0.1 graph (~180
    // hops deep) converges in 8; the sf0.001 graph must stay single-digit
    rounds should be <= 9
    val groups = groupsDf
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.collect().foreach { r =>
      groups(r.getLong(0)) shouldBe groups(r.getLong(1))
    }
    // every group id is its own minimum member
    groups.groupBy(_._2).foreach { case (g, members) =>
      members.keys.min shouldBe g
    }
    // the hybrid local finish (default threshold) must agree exactly with
    // the pure-distributed fixpoint — same groups, same min-id roots
    val (hybridDf, hybridRounds) =
      Dedup.connectedGroupsWithStats(pairs, docs.select("doc_id"), "doc_id")
    hybridRounds should be < rounds
    hybridDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe groups
  }

  it should "star-link mega-buckets: O(m) pairs, every member connected to the hub" in {
    val s = spark
    import s.implicits._
    // 300 identical boilerplate docs (one signature bucket per band) + a
    // few distinct ones — the degenerate corpus where a clique join would
    // emit 300*299/2 pairs per band
    val m = 300
    val docs = ((1 to m).map(i => (i.toLong, "lorem ipsum dolor sit amet " * 5)) ++
      Seq((1000L, "completely different text about spark plans"),
          (1001L, "another unrelated document entirely for this test")))
      .toDF("doc_id", "text")
    val pairs = Dedup.lshCandidatePairs(
      Dedup.minHashBands(docs, "doc_id", "text"), "doc_id", cliqueCap = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // star fallback: linear in bucket size, nowhere near the m^2 clique
    pairs.length.toLong should be < (m * 3).toLong
    // connectivity survives: every boilerplate doc pairs with the hub (id 1)
    val fromHub = pairs.filter(_._1 == 1L).map(_._2).toSet
    fromHub should contain allElementsOf (2 to m).map(_.toLong)
  }

  "cdcApply" should "equal a sequential replay of the change log on random streams" in {
    val s = spark
    import s.implicits._
    (1 to 5).foreach { _ =>
      val n = 300 + rnd.nextInt(300)
      val changes = (1 to n).map { seq =>
        val key = rnd.nextInt(25).toLong
        val op = if (rnd.nextInt(4) == 0) "D" else "U"
        (key, seq.toLong, op, s"p$seq")
      }
      // reference: replay in sequence order into a mutable map
      val state = collection.mutable.Map.empty[Long, String]
      changes.sortBy(_._2).foreach {
        case (k, _, "D", _) => state.remove(k): Unit
        case (k, _, _, p)   => state(k) = p
      }
      val got = Dedup.cdcApply(changes.toDF("k", "seq", "op", "payload"),
          Seq("k"), Seq("seq"), "op", "D")
        .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
      got shouldBe state.toMap
      // applying the result of apply as a fresh upsert-only log is a no-op
      val replayed = Dedup.cdcApply(
        got.toSeq.map { case (k, p) => (k, 1L, "U", p) }.toDF("k", "seq", "op", "payload"),
        Seq("k"), Seq("seq"), "op", "D")
        .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
      replayed shouldBe got
    }
  }

  /** Incremental CC maintenance must equal the full recompute on ANY
    * graph and ANY delta marking — the fixture oracle proves one split;
    * this proves the algebra (contracting base endpoints to min-id
    * roots preserves the global minimum of every merged component)
    * over seeded random graphs, including deltas that bridge multiple
    * base components and deltas with no edges at all.
    */
  "Dedup.incrementalMerge" should "equal the full recompute on random graphs and delta splits" in {
    val s = spark
    import s.implicits._
    for (trial <- 1 to 5) {
      val nNodes = 60 + rnd.nextInt(140)
      val nodeIds = (0 until nNodes).map(_.toLong)
      val nEdges = rnd.nextInt(2 * nNodes)
      val edges = (1 to nEdges).map { _ =>
        (nodeIds(rnd.nextInt(nNodes)), nodeIds(rnd.nextInt(nNodes)))
      }.filter { case (a, b) => a != b }
      val deltaMod = 3 + rnd.nextInt(8) // ~12-33% of nodes are delta
      def isDelta(id: Long): Boolean = id % deltaMod == 0
      val nodesDf = nodeIds.toDF("id")
      val pairsDf = edges.toDF("id_a", "id_b")
      val full = Dedup.connectedGroups(pairsDf, nodesDf, "id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val baseGroups = Dedup.connectedGroups(
        pairsDf.filter(!col("id_a").isin(nodeIds.filter(isDelta): _*) &&
          !col("id_b").isin(nodeIds.filter(isDelta): _*)),
        nodesDf.filter(!col("id").isin(nodeIds.filter(isDelta): _*)), "id")
      val baseMap = baseGroups.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val merged = Dedup.incrementalMerge(
        baseGroups,
        pairsDf.filter(col("id_a").isin(nodeIds.filter(isDelta): _*) ||
          col("id_b").isin(nodeIds.filter(isDelta): _*)),
        nodesDf.filter(col("id").isin(nodeIds.filter(isDelta): _*)), "id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
      withClue(s"trial $trial (n=$nNodes, e=${edges.size}, mod=$deltaMod): ") {
        merged.map(t => t._1 -> t._2).toMap shouldBe full
        // flags are consistent: is_delta matches the marking, and
        // relabeled = the base doc's label really changed (iff)
        merged.foreach { case (id, gid, d, rl) =>
          d shouldBe isDelta(id)
          if (!d) rl shouldBe (gid != baseMap(id))
        }
      }
    }
  }
}
