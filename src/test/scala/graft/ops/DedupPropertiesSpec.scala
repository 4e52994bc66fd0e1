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
    val groups = Dedup.connectedGroups(pairs, docs.select("doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.collect().foreach { r =>
      groups(r.getLong(0)) shouldBe groups(r.getLong(1))
    }
    // every group id is its own minimum member
    groups.groupBy(_._2).foreach { case (g, members) =>
      members.keys.min shouldBe g
    }
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
}
