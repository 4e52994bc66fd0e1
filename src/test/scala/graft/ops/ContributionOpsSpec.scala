package graft.ops

import graft.SparkSpec

/** Pareto contribution + cumulative-distinct window: brute-force
  * recomputation over collected sf0.001 fixtures.
  */
class ContributionOpsSpec extends SparkSpec {

  private def round2(x: Double): Double = BigDecimal(x)
    .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble

  "RelationalExt.aggParetoCustomers" should "rank by revenue and accumulate share to 1.0" in {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val rev = orders.groupBy(_._1).view
      .mapValues(vs => round2(vs.map(_._2).sum)).toMap
    val ranked = rev.toSeq.sortBy { case (ck, r) => (-r, ck) }

    val got = RelationalExt.aggParetoCustomers(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))

    got.map(g => (g._1, g._3)).toSeq shouldBe ranked
    got.map(_._2).toSeq shouldBe (1L to ranked.size.toLong)
    // cumulative share is monotone and ends at 1.0
    got.map(_._4).toSeq shouldBe sorted
    got.last._4 shouldBe 1.0 +- 1e-9
    // the 80% head exists and is a strict prefix
    val headLen = got.count(_._5)
    headLen should (be > 0 and be < got.length)
    got.take(headLen).forall(_._5) shouldBe true
  }

  "RelationalExt.winCumDistinct" should "count distinct event types seen so far per user" in {
    val events = graft.io.Sources.events(spark, sfDir)
      .selectExpr("user_id", "unix_micros(ts)", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq

    val expected = events.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._2, e._3))
      val seen = collection.mutable.Set.empty[String]
      sorted.map { e => seen += e._4; e._3 -> seen.size.toLong }
    }.toMap

    val got = RelationalExt.winCumDistinct(spark, sfDir).collect()
      .map(r => r.getLong(1) -> r.getLong(4)).toMap
    got shouldBe expected
    // growth binds: some user reaches more than 1 distinct type
    got.values.max should be > 1L
  }
}
