package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Sources

/** Brute-force recomputes for the graph-analytics batch (fixed-point
  * PageRank, k-hop reachability) plus invariants the oracle can't state
  * (mass conservation bounds, rank monotonicity vs in-degree zero).
  */
class GraphSpec extends SparkSpec {

  /** The same bought-after edge derivation, driver-side. */
  private lazy val edges: Set[(Long, Long)] = {
    val li = Sources.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // line numbers repeat within an order in the fixture, so pair ALL rows
    // (a, b) with b.line = a.line + 1 — the same semantics as the equi-join
    val byOrder = li.groupBy(_._1)
    byOrder.values.flatMap { rows =>
      for {
        a <- rows.toSeq; b <- rows.toSeq
        if b._2 == a._2 + 1 && a._3 != b._3
      } yield (a._3, b._3)
    }.toSet
  }

  "Graph.pageRankParts" should "replay the fixed-point iteration exactly" in {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).toSeq.sorted
    val n = nodes.size.toLong
    val outd = edges.groupBy(_._1).map { case (s0, es) => s0 -> es.size.toLong }
    val scale = 1000000000000L
    val teleport = (15 * scale) / (100 * n)
    var r: Map[Long, Long] = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to 5) {
      val in = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      edges.foreach { case (s0, d0) => in(d0) += r(s0) / outd(s0) }
      r = nodes.map(v => v -> (teleport + (85 * in(v)) / 100)).toMap
    }
    val expected = r.toSeq.sortBy { case (p, rk) => (-rk, p) }.take(20)
    val got = Graph.pageRankParts(spark, sfDir).collect()
      .map(row => (row.getLong(0), row.getLong(1))).toSeq
    got shouldBe expected
  }

  // Incremental maintenance must be INDISTINGUISHABLE from the full
  // rebuild: same edge/degree multiset, same node set, and therefore a
  // bit-equal rank vector — checked here at the table level and the
  // query level (the oracle re-checks the query against full-recompute
  // SQL at the correctness gate).
  "Graph.pageRankIncremental" should "maintain merged edge/degree tables equal to the full derivation" in {
    val full = Graph.edgesWithDeg(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val inc = Graph.incEdges(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    inc shouldBe full
    val fullN = Graph.nodeTable(spark, sfDir).collect().map(_.getLong(0)).sorted.toSeq
    val incN = Graph.incNodes(spark, sfDir).collect().map(_.getLong(0)).sorted.toSeq
    incN shouldBe fullN
  }

  it should "equal the full-recompute PageRank bit-for-bit" in {
    val full = Graph.pageRankParts(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val inc = Graph.pageRankIncremental(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    inc shouldBe full
  }

  it should "produce a genuinely non-empty delta batch (the test is vacuous otherwise)" in {
    Graph.deltaNewEdges(spark, sfDir).count() should be > 0L
  }

  "Graph.hits" should "replay the un-normalized integer recurrence exactly" in {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).toSeq.sorted
    var h: Map[Long, Long] = nodes.map(_ -> 1L).toMap
    var a: Map[Long, Long] = nodes.map(_ -> 0L).toMap
    for (_ <- 1 to 3) {
      val aM = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      edges.foreach { case (s0, d0) => aM(d0) += h(s0) }
      a = nodes.map(v => v -> aM(v)).toMap
      val hM = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      edges.foreach { case (s0, d0) => hM(s0) += a(d0) }
      h = nodes.map(v => v -> hM(v)).toMap
    }
    val expected = nodes.map(v => (v, a(v), h(v)))
      .sortBy { case (p, av, _) => (-av, p) }.take(20)
    val got = Graph.hits(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe expected
  }

  "Graph.pageRankAdaptive" should "replay the adaptive L1-threshold loop exactly" in {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).toSeq.sorted
    val n = nodes.size.toLong
    val outd = edges.groupBy(_._1).map { case (s0, es) => s0 -> es.size.toLong }
    val scale = 1000000000000L
    val teleport = (15 * scale) / (100 * n)
    var r: Map[Long, Long] = nodes.map(_ -> scale / n).toMap
    var delta = Long.MaxValue
    var iters = 0
    while (delta > Graph.AdaptiveThreshold && iters < 100) {
      val in = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      edges.foreach { case (s0, d0) => in(d0) += r(s0) / outd(s0) }
      val rNew = nodes.map(v => v -> (teleport + (85 * in(v)) / 100)).toMap
      delta = nodes.map(v => math.abs(rNew(v) - r(v))).sum
      r = rNew
      iters += 1
    }
    val expected = r.toSeq.sortBy { case (p, rk) => (-rk, p) }.take(20)

    val (ranks, gotIters, gotDelta) =
      Graph.pageRankLoopAdaptive(
        Graph.edgesWithDeg(spark, sfDir), Graph.nodeTable(spark, sfDir))
    gotIters shouldBe iters
    gotDelta shouldBe delta
    gotDelta should be <= Graph.AdaptiveThreshold
    gotIters should be < 100
    val got = ranks.orderBy(col("r").desc, col("part")).limit(20)
      .collect().map(row => (row.getLong(0), row.getLong(1))).toSeq
    got shouldBe expected
  }

  it should "keep total rank mass at most the initial mass (dangling leak only)" in {
    val ranks = Graph.pageRankParts(spark, sfDir)
    // top-20 sum is a lower bound on total mass; total never exceeds 1.0
    val top = ranks.agg(sum("rank_e12")).head().getLong(0)
    top should be > 0L
    top should be <= 1000000000000L
  }

  "Graph.pprCrawlSeeds" should "replay the seed-teleport iteration exactly" in {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).toSeq.sorted
    val seeds = nodes.filter(_ % 200 == 0).toSet
    val ns = seeds.size.toLong
    val outd = edges.groupBy(_._1).map { case (s0, es) => s0 -> es.size.toLong }
    val scale = 1000000000000L
    var r: Map[Long, Long] = nodes.map(v => v -> (if (seeds(v)) scale / ns else 0L)).toMap
    for (_ <- 1 to 5) {
      val in = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      edges.foreach { case (s0, d0) => in(d0) += r(s0) / outd(s0) }
      r = nodes.map { v =>
        v -> ((if (seeds(v)) (15 * scale) / (100 * ns) else 0L) + (85 * in(v)) / 100)
      }.toMap
    }
    val expected = r.toSeq.filter(_._2 > 0).sortBy { case (p, rk) => (-rk, p) }.take(20)
    val got = Graph.pprCrawlSeeds(spark, sfDir).collect()
      .map(row => (row.getLong(0), row.getLong(1))).toSeq
    got shouldBe expected
  }

  "Graph.pageRankWeighted" should "replay the weighted fixed-point iteration exactly" in {
    val li = Sources.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val wEdges = li.groupBy(_._1).values.flatMap { rows =>
      for {
        a <- rows.toSeq; b <- rows.toSeq
        if b._2 == a._2 + 1 && a._3 != b._3
      } yield (a._3, b._3)
    }.groupBy(identity).map { case ((s0, d0), xs) => (s0, d0, xs.size.toLong) }.toSeq
    val nodes = (wEdges.map(_._1) ++ wEdges.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val wout = wEdges.groupBy(_._1).map { case (s0, es) => s0 -> es.map(_._3).sum }
    val scale = 1000000000000L
    var r: Map[Long, Long] = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to 5) {
      val in = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      wEdges.foreach { case (s0, d0, w) => in(d0) += r(s0) * w / wout(s0) }
      r = nodes.map(v => v -> ((15 * scale) / (100 * n) + (85 * in(v)) / 100)).toMap
    }
    val expected = r.toSeq.sortBy { case (p, rk) => (-rk, p) }.take(20)
    val got = Graph.pageRankWeighted(spark, sfDir).collect()
      .map(row => (row.getLong(0), row.getLong(1))).toSeq
    got shouldBe expected
  }

  "Graph.khopReach" should "match driver-side BFS counts and nest 1-hop in 2-hop" in {
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val adj = und.groupBy(_._1).map { case (u, es) => u -> es.map(_._2).toSet }
    val seeds = adj.keySet.filter(_ % 200 == 0).toSeq.sorted
    val expected = seeds.map { s0 =>
      val h1 = adj(s0) - s0
      val h2 = (h1 ++ h1.flatMap(v => adj.getOrElse(v, Set.empty[Long]))) - s0
      (s0, h1.size.toLong, h2.size.toLong)
    }
    val got = Graph.khopReach(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe expected
    got.foreach { case (_, n1, n2) => n2 should be >= n1 }
  }

  "Graph.components" should "match a driver-side union-find over strong edges" in {
    val li = Sources.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val strong = li.groupBy(_._1).values.flatMap { rows =>
      for {
        a <- rows.toSeq; b <- rows.toSeq
        if b._2 == a._2 + 1 && a._3 != b._3
      } yield (a._3, b._3)
    }.groupBy(identity).iterator // iterator: Map.collect of a tuple-valued
      // fn would rebuild a MAP and collapse pairs sharing a src key
      .collect { case (e, xs) if xs.size >= 2 => e }.toVector
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    strong.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = (strong.map(_._1) ++ strong.map(_._2)).distinct
    val expected = nodes.map(v => (v, find(v))).sortBy(_._1)
    val got = Graph.components(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    got shouldBe expected
  }

  "Graph.clusteringCoeff" should "match a driver-side triangle count" in {
    val li = Sources.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val strong = li.groupBy(_._1).values.flatMap { rows =>
      for {
        a <- rows.toSeq; b <- rows.toSeq
        if b._2 == a._2 + 1 && a._3 != b._3
      } yield (a._3, b._3)
    }.groupBy(identity).iterator
      .collect { case (e, xs) if xs.size >= 2 => e }.toVector
    val adj = scala.collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set.empty)
    strong.foreach { case (a, b) => adj(a) += b; adj(b) += a }
    val expected = adj.toSeq.sortBy(_._1).map { case (v, ns) =>
      val tri = ns.toSeq.combinations(2).count { case Seq(a, b) => adj(a)(b) }
      (v, ns.size.toLong, tri.toLong)
    }
    val got = Graph.clusteringCoeff(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe expected
  }

  "Graph.sssp" should "match a driver-side Dijkstra over the weighted graph" in {
    val li = Sources.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val weighted = li.groupBy(_._1).values.flatMap { rows =>
      for {
        a <- rows.toSeq; b <- rows.toSeq
        if b._2 == a._2 + 1 && a._3 != b._3
      } yield (a._3, b._3)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // symmetrize with max(w), cost = 1e6 / w (integer)
    val cost = scala.collection.mutable.Map[(Long, Long), Long]()
    weighted.foreach { case ((a, b), w) =>
      Seq((a, b), (b, a)).foreach { e =>
        cost(e) = math.max(cost.getOrElse(e, 0L), w)
      }
    }
    val adj = cost.toSeq.map { case ((u, v), w) => (u, v, 1000000L / w) }
      .groupBy(_._1)
    if (adj.nonEmpty) {
      // hub source: argmax degree, min key on ties
      val source = adj.toSeq.map { case (u, es) => (-es.size, u) }.min._2
      val dist = scala.collection.mutable.Map(source -> 0L)
      val pq = scala.collection.mutable.PriorityQueue((0L, source))(
        Ordering.by[(Long, Long), Long](-_._1))
      while (pq.nonEmpty) {
        val (du, u) = pq.dequeue()
        if (du == dist(u)) {
          adj.getOrElse(u, Nil).foreach { case (_, v, c) =>
            if (dist.getOrElse(v, Long.MaxValue) > du + c) {
              dist(v) = du + c
              pq.enqueue((du + c, v))
            }
          }
        }
      }
      val expected = dist.toSeq.map { case (v, dv) => (dv, v) }
        .sorted.take(100).map { case (dv, v) => (v, dv) }
      val got = Graph.sssp(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      got shouldBe expected
    } else {
      Graph.sssp(spark, sfDir).count() shouldBe 0L
    }
  }

  "RelationalExt.weightedMedian" should "match a driver-side weighted-median scan" in {
    val rows = Sources.lineitem(spark, sfDir)
      .select("l_returnflag", "l_extendedprice", "l_quantity",
        "l_orderkey", "l_linenumber").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2).toLong,
        r.getLong(3), r.getInt(4)))
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (rf, xs) =>
      val sorted = xs.sortBy(x => (x._2, x._4, x._5))
      val tot = sorted.map(_._3).sum
      var cum = 0L
      val med = sorted.find { x => cum += x._3; 2 * cum >= tot }.get._2
      (rf, med, tot)
    }
    val got = RelationalExt.weightedMedian(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    got shouldBe expected
  }

  "RelationalExt.modePerGroup" should "match a driver-side frequency argmax" in {
    val rows = Sources.lineitem(spark, sfDir)
      .select("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1).toLong))
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (rf, xs) =>
      val (qty, cnt) = xs.groupBy(_._2).view.mapValues(_.size.toLong)
        .toSeq.minBy { case (q, c) => (-c, q) }
      (rf, qty, cnt)
    }
    val got = RelationalExt.modePerGroup(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe expected
  }

  "Audit.robustOutliers" should "match a driver-side MAD computation" in {
    val rows = Sources.customer(spark, sfDir)
      .select("c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    def median(xs: Seq[Double]): Double = {
      val s0 = xs.sorted
      val pos = 0.5 * (s0.size - 1)
      val lo = s0(pos.toInt)
      val hi = s0(math.ceil(pos).toInt)
      lo + (hi - lo) * (pos - pos.toInt)
    }
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (seg, xs) =>
      val vals = xs.map(_._2).toSeq
      val med = median(vals)
      val mad = median(vals.map(v => math.abs(v - med)))
      val nOut = vals.count(v => math.abs(v - med) > 4.4478 * mad).toLong
      (seg, vals.size.toLong, nOut, med, mad)
    }
    val got = Audit.robustOutliers(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toSeq
    got shouldBe expected
  }

  "Graph.linkPrediction" should "match a brute-force common-neighbor scan" in {
    val li = Sources.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val w = scala.collection.mutable.Map[(Long, Long), Int]().withDefaultValue(0)
    li.groupBy(_._1).values.foreach { rows =>
      for { a <- rows.toSeq; b <- rows.toSeq
            if b._2 == a._2 + 1 && a._3 != b._3 } w((a._3, b._3)) += 1
    }
    // NB: w.collect { case (e, n) ... => e } would resolve to the
    // Map-building collect (e is a (Long, Long) tuple) and silently
    // collapse edges sharing a src — filter + keySet keeps them all
    val st = w.filter(_._2 >= 2).keySet.toSet
    val und = st ++ st.map { case (a, b) => (b, a) }
    val nbrs = und.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val deg = nbrs.view.mapValues(_.size.toLong).toMap
    val wedgePairs = for {
      (_, ns) <- nbrs.toSeq; a <- ns.toSeq; b <- ns.toSeq
      if a < b && !nbrs(a).contains(b)
    } yield (a, b)
    val expected = wedgePairs.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((a, b), c) => (a, b, c, deg(a) * deg(b)) }
      .sortBy { case (a, b, c, _) => (-c, a, b) }
      .take(20)
    val got = Graph.linkPrediction(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe expected
  }

  "Graph.bfsLayers" should "match a driver-side BFS from the hub" in {
    val und = edges ++ edges.map(_.swap)
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val src = adj.view.mapValues(_.size).toSeq
      .minBy { case (u, dg) => (-dg, u) }._1
    var vis = Map(src -> 0L)
    var frontier = Set(src)
    for (h <- 1 to 6) {
      val nxt = frontier.flatMap(adj.getOrElse(_, Set.empty[Long])) -- vis.keySet
      vis ++= nxt.map(_ -> h.toLong)
      frontier = nxt
    }
    val expected = vis.values.groupBy(identity).view
      .mapValues(_.size.toLong).toSeq.sorted
    val got = Graph.bfsLayers(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    got shouldBe expected
  }

  "Graph.reciprocity" should "match a driver-side reverse-edge count" in {
    val n = edges.size.toLong
    val nRecip = edges.count { case (a, b) => edges((b, a)) }.toLong
    val got = Graph.reciprocity(spark, sfDir).collect().head
    (got.getLong(0), got.getLong(1), got.getLong(2)) shouldBe
      ((n, nRecip, 10000L * nRecip / n))
  }

  "Graph.copurchaseCustomers" should "match a brute-force projection" in {
    val li = Sources.lineitem(spark, sfDir).select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ord = Sources.orders(spark, sfDir).select("o_orderkey", "o_custkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val cp = li.map { case (ok, pk) => (pk, ord(ok)) }.distinct
    val keep = cp.groupBy(_._1).filter(_._2.length <= 64).keySet
    val byPart = cp.filter(p => keep(p._1)).groupBy(_._1)
    val pairs: Seq[(Long, Long)] = byPart.values.toSeq.flatMap { cs =>
      val custs: Seq[Long] = cs.map(_._2).toSeq.sorted
      for { a <- custs; b <- custs if a < b } yield (a, b)
    }
    val expected = pairs.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((a, b), n) => (a, b, n) }
      .sortBy { case (a, b, n) => (-n, a, b) }.take(20)
    val got = Graph.copurchaseCustomers(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe expected
  }

  "Graph.kcore2" should "match a driver-side peeling replay" in {
    val li = Sources.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val w = scala.collection.mutable.Map[(Long, Long), Int]().withDefaultValue(0)
    li.groupBy(_._1).values.foreach { rows =>
      for { a <- rows.toSeq; b <- rows.toSeq
            if b._2 == a._2 + 1 && a._3 != b._3 } w((a._3, b._3)) += 1
    }
    val st = w.filter(_._2 >= 2).keySet.toSet
    var und = st ++ st.map { case (a, b) => (b, a) }
    val expected = (1 to 8).map { t =>
      val deg = und.groupBy(_._1).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= 2).keySet
      und = und.filter { case (a, b) => keep(a) && keep(b) }
      (t.toLong, und.map(_._1).size.toLong, und.size.toLong / 2)
    }
    val got = Graph.kcore2(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe expected
    // peeling is monotone: the census never grows round over round
    got.sliding(2).foreach { case Seq(a, b) =>
      b._2 should be <= a._2; b._3 should be <= a._3
    }
  }

  "Analytics.attributionLinear" should "conserve total purchase cents across channels" in {
    val out = Analytics.attributionLinear(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.keySet shouldBe Set("click", "view", "signup", "residual", "unattributed")
    val totalCents = Sources.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .agg(sum(round(col("value") * 100).cast("long"))).head().getLong(0)
    out.values.sum shouldBe totalCents
  }

  "Graph.closenessSeeds (r13)" should "match a brute-force multi-source BFS" in {
    val und = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("l_orderkey", "l_linenumber", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue, r.getLong(2)))
      .toSeq
      .groupBy(_._1).values.flatMap { rows =>
        // (orderkey, linenumber) is NOT unique in the fixture: the join
        // pairs EVERY row at ln with every row at ln+1
        rows.flatMap { case (_, ln, pk) =>
          rows.collect { case (_, ln2, pk2) if ln2 == ln + 1 && pk2 != pk => (pk, pk2) }
        }
      }.toSeq
    val adj = (und ++ und.map(_.swap)).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val deg = adj.view.mapValues(_.size).toMap
    val seeds = deg.toSeq.sortBy { case (n, dg) => (-dg, n) }.take(4).map(_._1)
    val want = seeds.map { s0 =>
      var dist = Map(s0 -> 0L)
      var frontier = Set(s0)
      for (h <- 1 to 6) {
        frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- dist.keySet
        dist ++= frontier.map(_ -> h.toLong)
      }
      val hops = dist.values.sum
      (s0, dist.size.toLong, hops,
        if (hops == 0) 0.0
        else math.round(1e6 * (dist.size - 1).toDouble / hops) / 1e6)
    }.sortBy(_._1)
    val got = Graph.closenessSeeds(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    got shouldBe want
    got.map(_._4).max should be > 0.0
  }

  "Graph.lpaRounds" should "replay 3 synchronous rounds with the min-label tie-break" in {
    val li = Sources.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val pairCount = li.groupBy(_._1).values.flatMap { rows =>
      for {
        a <- rows.toSeq; b <- rows.toSeq
        if b._2 == a._2 + 1 && a._3 != b._3
      } yield (a._3, b._3)
    }.groupBy(identity).view.mapValues(_.size).toMap
    // keySet, NOT collect-to-tuples: collecting (src, dst) pairs out of a
    // Map rebuilds a Map keyed by src and silently drops parallel edges
    val st = pairCount.filter(_._2 >= 2).keySet
    val sym = st ++ st.map(_.swap)
    val adj = sym.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    var lab: Map[Long, Long] = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to 3) {
      lab = adj.map { case (v, ns) =>
        val cnt = ns.map(lab).groupBy(identity).view.mapValues(_.size).toMap
        v -> cnt.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val got = Graph.lpaRounds(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    got shouldBe lab.toSeq.sortBy(_._1)
    // propagation must actually coalesce labels (not the identity map)
    got.map(_._2).distinct.size should be < got.size
  }

  "Graph.frozenWalks" should "replay every 4-step hash-argmin walk" in {
    val li = Sources.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val pairCount = li.groupBy(_._1).values.flatMap { rows =>
      for {
        a <- rows.toSeq; b <- rows.toSeq
        if b._2 == a._2 + 1 && a._3 != b._3
      } yield (a._3, b._3)
    }.groupBy(identity).view.mapValues(_.size).toMap
    val st = pairCount.filter(_._2 >= 2).keySet
    val sym = st ++ st.map(_.swap)
    val adj = sym.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    // toSeq BEFORE map: mapping a key Set would dedupe walk endpoints
    val ends = adj.keys.toSeq.map { start =>
      var pos = start
      for (k <- 1 to 4)
        pos = adj(pos).minBy(v => ((start * 31 + v * 17 + k * 7) % 1009, v))
      pos
    }
    val want = ends.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    val got = Graph.frozenWalks(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    got shouldBe want
    // walks concentrate: strictly fewer endpoints than walkers
    got.map(_._2).sum shouldBe adj.size.toLong
    got.size should be < adj.size
  }

  "Graph.eccentricitySeeds" should "match a fixpoint BFS and stay under the round cap" in {
    val und = (edges ++ edges.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val seeds = und.toSeq.map { case (u, vs) => (u, vs.size) }
      .sortBy { case (u, dg) => (-dg, u) }.take(4).map(_._1)
    val want = seeds.map { s0 =>
      var dist = Map(s0 -> 0L)
      var frontier = Set(s0)
      var h = 1L
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(und.getOrElse(_, Set.empty)) -- dist.keySet
        dist ++= frontier.map(_ -> h)
        h += 1
      }
      (s0, dist.size.toLong, dist.values.max)
    }.sortBy(_._1)
    val got = Graph.eccentricitySeeds(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe want
    // the 20-round cap must never be the binding constraint
    got.foreach(_._3 should be < 20L)
    got.map(_._3).max should be >= 2L // a hub still can't see everything in 1 hop
  }

  "Graph.harmonicSeeds" should "replay the per-node reciprocal-hop lattice" in {
    val und = (edges ++ edges.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val seeds = und.toSeq.map { case (u, vs) => (u, vs.size) }
      .sortBy { case (u, dg) => (-dg, u) }.take(4).map(_._1)
    val want = seeds.map { s0 =>
      var dist = Map(s0 -> 0L)
      var frontier = Set(s0)
      var h = 1L
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(und.getOrElse(_, Set.empty)) -- dist.keySet
        dist ++= frontier.map(_ -> h)
        h += 1
      }
      val hops = dist.values.filter(_ > 0)
      (s0, hops.size.toLong, hops.map(1000000L / _).sum, hops.max)
    }.sortBy(_._1)
    val got = Graph.harmonicSeeds(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe want
    // harmonic is bounded by degree*1e6 + (reached-degree)*5e5 from
    // below 1-hop/2-hop structure; sanity: positive, cap unreached
    got.foreach { case (_, nr, harm, mh) =>
      harm should be > 0L
      harm should be <= nr * 1000000L
      mh should be < 20L
    }
  }

  "Graph.adamicAdar" should "replay the lattice-weighted wedge census" in {
    val li = Sources.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val pairCount = li.groupBy(_._1).values.flatMap { rows =>
      for {
        a <- rows.toSeq; b <- rows.toSeq
        if b._2 == a._2 + 1 && a._3 != b._3
      } yield (a._3, b._3)
    }.groupBy(identity).view.mapValues(_.size).toMap
    val st = pairCount.filter(_._2 >= 2).keySet
    val sym = st ++ st.map(_.swap)
    val adj = sym.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def w(u: Long): Option[Long] = {
      val d = adj(u).size
      if (d >= 2) Some(math.round(1e6 / math.log(d.toDouble))) else None
    }
    val pairScores = (for {
      (u, ns) <- adj.toSeq
      wu <- w(u).toSeq
      a <- ns; b <- ns if a < b
    } yield ((a, b), wu))
      .groupBy(_._1).view
      .mapValues(g => (g.size.toLong, g.map(_._2).sum)).toMap
      .filterNot { case ((a, b), _) => sym((a, b)) }
    val want = pairScores.toSeq
      .map { case ((a, b), (nc, aa)) => (a, b, nc, aa) }
      .sortBy { case (a, b, _, aa) => (-aa, a, b) }.take(20)
    val got = Graph.adamicAdar(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe want
    got should not be empty
  }

  "Graph.knnDegree (r13)" should "replay the degree-correlation curve" in {
    val li = Sources.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val dirPairs = li.groupBy(_._1).values.flatMap { rows =>
      for {
        a <- rows.toSeq; b <- rows.toSeq
        if b._2 == a._2 + 1 && a._3 != b._3
      } yield (a._3, b._3)
    }.toSeq
    val strong = dirPairs.groupBy(identity).filter(_._2.size >= 2).keySet
    val canon = strong.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(t => t._1 != t._2)
    val nbrs = canon.toSeq.flatMap(t => Seq(t, t.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = nbrs.view.mapValues(_.size.toLong).toMap
    val want = nbrs.toSeq.map { case (u, ns) =>
      (deg(u), ns.map(deg).sum)
    }.groupBy(_._1).toSeq.sortBy(_._1).map { case (k, g) =>
      val sumNb = g.map(_._2).sum
      (k, g.length.toLong, sumNb, 1000000L * sumNb / (k * g.length))
    }
    val got = Graph.knnDegree(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe want
    // every class average is at least 1e6 (a neighbor has degree >= 1)
    got.foreach(_._4 should be >= 1000000L)
  }

  "Graph.localCcTopk (r13)" should "replay per-node clustering on the capped strong graph" in {
    val li = Sources.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val dirPairs = li.groupBy(_._1).values.flatMap { rows =>
      for {
        a <- rows.toSeq; b <- rows.toSeq
        if b._2 == a._2 + 1 && a._3 != b._3
      } yield (a._3, b._3)
    }.toSeq
    val strong = dirPairs.groupBy(identity).filter(_._2.size >= 2).keySet
    val canon = strong.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(t => t._1 != t._2)
    val nbrs = canon.toSeq.flatMap(t => Seq(t, t.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = nbrs.toSeq
      .filter(t => t._2.size >= 2 && t._2.size <= 64)
      .map { case (u, ns) =>
        val nl = ns.toSeq.sorted
        val tri = (for {
          i <- nl.indices; j <- (i + 1) until nl.length
          if canon((nl(i), nl(j)))
        } yield 1).size.toLong
        val dg = ns.size.toLong
        (u, dg, tri, 2000000L * tri / (dg * (dg - 1)))
      }
      .sortBy(t => (-t._4, t._1)).take(20)
    val got = Graph.localCcTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe want
    // the head is genuinely clustered and cc is a valid share
    got.foreach(_._4 should be <= 1000000L)
    got.headOption.foreach(_._4 should be > 0L)
  }

  "Graph.squareCount (r13)" should "replay the diagonal identity on the strong graph" in {
    val li = Sources.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val dirPairs = li.groupBy(_._1).values.flatMap { rows =>
      for {
        a <- rows.toSeq; b <- rows.toSeq
        if b._2 == a._2 + 1 && a._3 != b._3
      } yield (a._3, b._3)
    }.toSeq
    val strong = dirPairs.groupBy(identity).filter(_._2.size >= 2).keySet
    val canon = strong.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(t => t._1 != t._2)
    val adj = canon.toSeq.flatMap(t => Seq(t, t.swap))
    val deg = adj.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val capped = adj.filter(t => deg(t._1) <= 64)
    val wedges = capped.groupBy(_._1).values.flatMap { g =>
      val ns = g.map(_._2).sorted
      for (i <- ns.indices; j <- (i + 1) until ns.length)
        yield (ns(i), ns(j))
    }.toSeq
    val ks = wedges.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 2)
    val sumC2 = ks.values.map(k => k * (k - 1) / 2).sum
    val row = Graph.squareCount(spark, sfDir).collect().head
    (row.getLong(0), row.getLong(1), row.getLong(2)) shouldBe
      ((ks.size.toLong, sumC2, sumC2 / 2))
    // the double-count identity holds: the C2 mass is even
    sumC2 % 2 shouldBe 0L
  }

  "Graph.pathCounts (r13)" should "replay BFS sigma propagation from the hub seeds" in {
    val und = (edges ++ edges.map(t => (t._2, t._1)))
      .filter(t => t._1 != t._2)
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val deg = und.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val seeds = deg.toSeq.sortBy(t => (-t._2, t._1)).take(4).map(_._1)
    val want = seeds.flatMap { s0 =>
      var visited = Map(s0 -> (0L, 1L)) // node -> (hop, pc)
      var frontier = Map(s0 -> 1L)
      for (h <- 1 to 4) {
        val next = scala.collection.mutable.Map.empty[Long, Long]
        frontier.foreach { case (u, pc) =>
          adj.getOrElse(u, Nil).foreach { v =>
            if (!visited.contains(v)) next(v) = next.getOrElse(v, 0L) + pc
          }
        }
        frontier = next.toMap
        visited ++= frontier.map { case (v, pc) => v -> (h.toLong, pc) }
      }
      visited.values.groupBy(_._1).toSeq.map { case (hop, g) =>
        (s0, hop, g.size.toLong, g.map(_._2).sum, g.map(_._2).max)
      }
    }.sortBy(t => (t._1, t._2))
    val got = Graph.pathCounts(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    got shouldBe want
    // sigma is genuinely multiplicative: some node at hop >= 2 is
    // reached by more than one shortest path
    got.exists(t => t._2 >= 2 && t._5 > 1) shouldBe true
  }

  "Graph.richClub (r13)" should "replay phi(k) over the strong-graph hubs" in {
    val li = Sources.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val dirPairs = li.groupBy(_._1).values.flatMap { rows =>
      for {
        a <- rows.toSeq; b <- rows.toSeq
        if b._2 == a._2 + 1 && a._3 != b._3
      } yield (a._3, b._3)
    }.toSeq
    val strong = dirPairs.groupBy(identity).filter(_._2.size >= 2).keySet
    val canon = strong.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(t => t._1 != t._2)
    val deg = canon.toSeq.flatMap(t => Seq(t._1, t._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = Seq(2L, 4L, 8L).map { k =>
      val club = deg.filter(_._2 > k).keySet
      val nk = club.size.toLong
      val ekC = canon.count(t => club(t._1) && club(t._2)).toLong
      (k, nk, ekC, if (nk >= 2) 2000000L * ekC / (nk * (nk - 1)) else 0L)
    }
    val got = Graph.richClub(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe want
    // clubs nest: tightening k can only shrink the club and its edges
    got.map(_._2).reverse.toSeq shouldBe got.map(_._2).reverse.sorted.toSeq
    got.map(_._3).reverse.toSeq shouldBe got.map(_._3).reverse.sorted.toSeq
    got.head._2 should be > 0L // the loosest club is non-empty
  }

  "Graph.temporalReach" should "replay 4 earliest-arrival relaxations exactly" in {
    // temporal edges: bought-after pairs stamped with the order's day
    val li = Sources.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val days = Sources.orders(spark, sfDir)
      .selectExpr("o_orderkey",
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS LONG) AS t")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val te = li.groupBy(_._1).flatMap { case (ok, rows) =>
      for {
        a <- rows.toSeq; b <- rows.toSeq
        if b._2 == a._2 + 1 && a._3 != b._3
      } yield (a._3, b._3, days(ok))
    }.toSet
    val seeds = te.groupBy(_._1).view.mapValues(_.size).toSeq
      .sortBy { case (n, dg) => (-dg, n) }.take(4).map(_._1)
    var arr: Map[(Long, Long), Long] =
      seeds.map(sd => (sd, sd) -> 0L).toMap
    def census(r: Int) =
      (r.toLong, arr.size.toLong, arr.values.sum, arr.values.max)
    var want = Seq(census(0))
    for (r <- 1 to 4) {
      val cand = scala.collection.mutable.Map[(Long, Long), Long]()
      arr.foreach { case ((sd, u), a) =>
        te.foreach { case (src, dst, t) =>
          if (src == u && t >= a) {
            val k = (sd, dst)
            cand(k) = math.min(cand.getOrElse(k, Long.MaxValue), t)
          }
        }
      }
      arr = (arr.keySet ++ cand.keySet).map { k =>
        k -> math.min(arr.getOrElse(k, Long.MaxValue),
          cand.getOrElse(k, Long.MaxValue))
      }.toMap
      want = want :+ census(r)
    }
    val got = Graph.temporalReach(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    got shouldBe want
    // time-respecting reach is a SUBSET of static reach: it can never
    // exceed the untimed frontier growth (monotone set sizes bind)
    got.map(_._2) shouldBe got.map(_._2).sorted
  }

  "Graph.bowtieStructure" should "classify every node per the 4-hop closure definition" in {
    val hub = edges.groupBy(_._1).view.mapValues(_.size).toSeq
      .minBy { case (n, dg) => (-dg, n) }._1
    def closure(adj: Map[Long, Seq[Long]]): Set[Long] = {
      var seen = Set(hub)
      for (_ <- 1 to 4)
        seen = seen ++ seen.flatMap(n => adj.getOrElse(n, Nil))
      seen
    }
    val fwd = closure(edges.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap)
    val bwd = closure(edges.groupBy(_._2).view.mapValues(_.map(_._1).toSeq).toMap)
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).toSet
    val classed = nodes.toSeq.map { n =>
      val cls =
        if (fwd(n) && bwd(n)) "core"
        else if (fwd(n)) "out"
        else if (bwd(n)) "in"
        else "other"
      (cls, n)
    }
    val want = Seq("core", "in", "other", "out").map { c =>
      val g = classed.filter(_._1 == c)
      (c, g.size.toLong, g.map(_._2).sum)
    }
    val got = Graph.bowtieStructure(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe want
    // the hub sits in its own core, and the partition covers the graph
    got.find(_._1 == "core").get._2 should be >= 1L
    got.map(_._2).sum shouldBe nodes.size.toLong
  }

  "Graph.boruvkaMsf" should "replay two hook-and-contract rounds with union-find" in {
    // weighted canonical edges from the raw (multi-)pair derivation
    val li = Sources.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val wedges = li.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      for {
        a <- rows.toSeq; b <- rows.toSeq
        if b._2 == a._2 + 1 && a._3 != b._3
      } yield (math.min(a._3, b._3), math.max(a._3, b._3))
    }.groupBy(identity).map { case ((u, v), g) => (u, v, g.size.toLong) }.toSeq
    val nodes = (wedges.map(_._1) ++ wedges.map(_._2)).distinct
    var lbl = nodes.map(n => n -> n).toMap
    var forest = Set.empty[(Long, Long, Long)]
    val want = (1 to 2).map { r =>
      val cand = wedges.flatMap { case (u, v, w) =>
        val (cu, cv) = (lbl(u), lbl(v))
        if (cu == cv) Nil else Seq((cu, w, u, v), (cv, w, u, v))
      }
      val sel = cand.groupBy(_._1).values
        .map(_.minBy(t => (t._2, t._3, t._4)))
        .map(t => (t._3, t._4, t._2)).toSet
      forest = forest ++ sel
      // union-find relabel to component minimum
      val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val p = find(parent(x)); parent(x) = p; p }
      forest.foreach { case (u, v, _) =>
        val (ru, rv) = (find(u), find(v))
        if (ru < rv) parent(rv) = ru else if (rv < ru) parent(ru) = rv
      }
      lbl = nodes.map(n => n -> find(n)).toMap
      val sizes = lbl.values.groupBy(identity).map(_._2.size.toLong)
      (r.toLong, lbl.values.toSet.size.toLong, forest.size.toLong,
        forest.toSeq.map(_._3).sum, sizes.max)
    }
    val got = Graph.boruvkaMsf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    got shouldBe want
    // Boruvka's invariant: each round at least halves the components
    val n0 = nodes.size.toLong
    got.head._2 should be <= (n0 / 2 + 1)
    got.last._2 should be <= (got.head._2 / 2 + 1)
    // the forest never cycles: edges < nodes
    got.foreach(t => t._3 should be < n0)
  }
}
