package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Sources

/** Brute-force recomputes for the round-7 batch: frequent-pair mining,
  * sorted-neighborhood dedup, the Bloom-pruned join (Mining), plus the
  * sweep-line concurrency (Temporal), equi-depth histogram (Audit) and
  * priority-sampling reservoir (Sampling) queries that landed with it.
  */
class MiningSpec extends SparkSpec {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def round(v: Double, n: Int): Double =
    BigDecimal(v).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0

  "Mining.frequentPairs" should "match the brute-force basket scan" in {
    val li = Sources.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val baskets = li.groupBy(_._1).map { case (_, xs) => xs.map(_._2).toSet }.toSeq
    val nOrders = baskets.size
    val itemCnt = li.groupBy(_._2).map { case (pk, xs) => pk -> xs.size.toLong }
    val pairCnt = scala.collection.mutable.Map[(Long, Long), Long]()
    baskets.foreach { b =>
      val sorted = b.toSeq.sorted
      for (i <- sorted.indices; j <- i + 1 until sorted.size) {
        val k = (sorted(i), sorted(j))
        pairCnt(k) = pairCnt.getOrElse(k, 0L) + 1
      }
    }
    val expected = pairCnt.filter(_._2 >= 3).map { case ((a, b), c) =>
      (a, b, c, itemCnt(a), itemCnt(b),
        round(c.toDouble / nOrders, 6),
        round(c.toDouble * nOrders / (itemCnt(a).toDouble * itemCnt(b).toDouble), 4))
    }.toSet

    val got = Mining.frequentPairs(spark, sfDir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6))).toSet
    got shouldBe expected
  }

  "Mining.sortedNeighborhood" should "find exactly the window-bounded near pairs" in {
    val docs = Sources.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(r => (r._2, r._1))
    val expected = (for {
      i <- docs.indices
      j <- (i + 1) until math.min(i + 6, docs.size)
      d = lev(docs(i)._2.take(80), docs(j)._2.take(80))
      if d <= 10
    } yield (i + 1L, j + 1L, docs(i)._1, docs(j)._1, (j - i).toLong, d.toLong)).toSet

    val got = Mining.sortedNeighborhood(spark, sfDir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toSet
    got shouldBe expected
    got should not be empty // the fixture's shared-prefix families bind
  }

  "Joins.bloomBuild/bloomContains" should "never produce a false negative" in {
    val cust = Sources.customer(spark, sfDir).filter(col("c_acctbal") > 9000.0)
    val words = Joins.bloomBuild(cust, col("c_custkey"), 1 << 16, 3)
    val n = cust.count()
    n should be > 0L
    cust.filter(Joins.bloomContains(col("c_custkey"), words, 1 << 16, 3))
      .count() shouldBe n
  }

  "Mining.bloomPrunedRevenue" should "equal the unpruned join and actually prune" in {
    val cust = Sources.customer(spark, sfDir)
      .filter(col("c_acctbal") > 9000.0).select("c_custkey", "c_name")
    val plain = Sources.orders(spark, sfDir)
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      .select(col("c_custkey"), col("c_name"), col("n_orders"),
        col("rev").cast("double").as("revenue"))
    val got = Mining.bloomPrunedRevenue(spark, sfDir)
    got.exceptAll(plain).count() shouldBe 0L
    plain.exceptAll(got).count() shouldBe 0L

    // the prune must drop most of the fact side before the join
    val words = Joins.bloomBuild(cust, col("c_custkey"), 1 << 16, 3)
    val total = Sources.orders(spark, sfDir).count()
    val kept = Sources.orders(spark, sfDir)
      .filter(Joins.bloomContains(col("o_custkey"), words, 1 << 16, 3)).count()
    kept.toDouble / total should be < 0.5
  }

  "Temporal.concurrentIntervals" should "match the brute-force sweep" in {
    val o = Sources.orders(spark, sfDir)
      .select(to_date(col("o_orderdate")).as("sd"), col("o_orderkey")).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val deltas = scala.collection.mutable.Map[java.time.LocalDate, (Long, Long)]()
    o.foreach { case (sd, ok) =>
      val ed = sd.plusDays(ok % 30 + 1)
      val (s1, e1) = deltas.getOrElse(sd, (0L, 0L)); deltas(sd) = (s1 + 1, e1)
      val (s2, e2) = deltas.getOrElse(ed, (0L, 0L)); deltas(ed) = (s2, e2 + 1)
    }
    var cum = 0L
    val expected = deltas.toSeq.sortBy(_._1.toString).map { case (day, (st, en)) =>
      cum += st - en
      (day.toString, st, en, cum)
    }
    cum shouldBe 0L // every interval that opens eventually closes

    val got = Temporal.concurrentIntervals(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe expected
    got.map(_._4).min should be >= 0L
  }

  "Audit.equidepthHist" should "hold the equal-depth and ordering invariants" in {
    val rows = Audit.equidepthHist(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    rows.map(_._1).toSeq shouldBe (0L until 16L)
    val total = Sources.lineitem(spark, sfDir).count()
    rows.map(_._2).sum shouldBe total
    (rows.map(_._2).max - rows.map(_._2).min) should be <= 1L
    rows.foreach { case (_, _, lo, hi) => lo should be <= hi }
    rows.sliding(2).foreach { case Array(a, b) => a._4 should be <= b._3; case _ => }
  }

  "Mining.frequentTriples" should "equal the brute-force 3-way basket join (A-Priori drops nothing)" in {
    val s = spark
    import s.implicits._
    val baskets = Sources.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = baskets.groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toMap
    val nOrders = byOrder.size
    val tripleCounts = scala.collection.mutable.Map.empty[(Long, Long, Long), Long]
    byOrder.values.foreach { items =>
      for {
        i <- items.indices; j <- (i + 1) until items.length; k <- (j + 1) until items.length
      } {
        val key = (items(i), items(j), items(k))
        tripleCounts(key) = tripleCounts.getOrElse(key, 0L) + 1
      }
    }
    val expected = tripleCounts.toSeq.filter(_._2 >= 2)
      .map { case ((a, b, c), n) => (a, b, c, n) }
      .sortBy(t => (t._1, t._2, t._3))
    val got = Mining.frequentTriples(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got.toSeq shouldBe expected
    expected.length should be > 10 // the fixture actually exercises the op
    // support sanity against the same basket table
    val sup = Mining.frequentTriples(spark, sfDir).collect()
      .map(r => (r.getLong(3), r.getDouble(4)))
    sup.foreach { case (n, p) =>
      p shouldBe (BigDecimal(n.toDouble / nOrders).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) +- 1e-9
    }
  }

  "Sampling.sampleWeightedReservoir" should "select exactly the top-64 priorities" in {
    val docs = Sources.documents(spark, sfDir)
      .select("doc_id", "n_chars").collect().map(r => (r.getLong(0), r.getLong(1)))
    val pri = docs.map { case (id, w) =>
      val k = ((id % 1048576L) * 2654435761L) % 1048576L
      (id, w.toDouble / ((k + 1).toDouble / 1048577.0))
    }
    val expectedIds = pri.sortBy { case (id, p) => (-p, id) }.take(64).map(_._1).toSet

    val got = Sampling.sampleWeightedReservoir(spark, sfDir).collect()
    got.length shouldBe 64
    got.map(_.getLong(0)).toSet shouldBe expectedIds
    // heavier docs must be over-represented vs a uniform draw
    val selMean = got.map(_.getLong(2).toDouble).sum / 64
    val allMean = docs.map(_._2.toDouble).sum / docs.length
    selMean should be > allMean
  }

  "Mining.emergingPatterns (r13)" should "replay the growth-rate top-20" in {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("l_partkey", "CAST(l_shipdate AS DATE) < DATE'1995-06-01' AS early")
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val want = li.groupBy(_._1).toSeq.map { case (pk, rows) =>
      val ce = rows.count(_._2).toLong
      val cl = rows.length - ce
      (pk, ce, cl)
    }.filter(_._2 >= 5)
      .map { case (pk, ce, cl) => (pk, ce, cl, cl * 10000L / ce) }
      .sortBy(t => (-t._4, t._1)).take(20)
    val got = Mining.emergingPatterns(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe want
    // the ranking genuinely discriminates: head grows, growth ordered
    got.head._4 should be >= got.last._4
    got.foreach(_._2 should be >= 5L)
  }

  "Mining.negativeAssoc (r13)" should "surface the least-lifted top-item pairs" in {
    val inc = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("l_orderkey AS ok", "l_partkey AS pk").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = inc.map(_._1).distinct.length.toLong
    val supp = inc.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val top = supp.toSeq.sortBy(t => (-t._2, t._1)).take(50).map(_._1).toSet
    val joint = inc.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).filter(top).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tl = top.toSeq.sorted
    val cands = for {
      i <- tl.indices; j <- (i + 1) until tl.length
    } yield {
      val (a, b) = (tl(i), tl(j))
      val jt = joint.getOrElse((a, b), 0L)
      (a, b, supp(a), supp(b), jt, n * jt * 1000000L / (supp(a) * supp(b)))
    }
    val want = cands.sortBy(t => (t._6, t._1, t._2)).take(20)
    val got = Mining.negativeAssoc(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    got shouldBe want
    // the bottom of the lift order sits well under independence (1e6)
    got.foreach(_._6 should be < 1000000L)
  }
}
