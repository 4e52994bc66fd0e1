package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Sources

class EtlQueriesSpec extends SparkSpec {

  "etlIncrementalAgg" should "merge partial state + delta into exactly the full recompute" in {
    val merged = EtlQueries.etlIncrementalAgg(spark, sfDir)
    val full = Sources.orders(spark, sfDir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
    merged.exceptAll(full).count() shouldBe 0L
    full.exceptAll(merged).count() shouldBe 0L
    merged.count() should be > 0L
  }

  it should "split real work across state and delta (the cutoff must bind)" in {
    val o = Sources.orders(spark, sfDir)
    val cutoff = lit("1999-01-01").cast("date")
    o.filter(col("o_orderdate") < cutoff).count() should be > 0L
    o.filter(col("o_orderdate") >= cutoff).count() should be > 0L
  }

  "EtlQueries.etlDqQuarantine" should "replay the rule census against a driver-side audit" in {
    val minShip = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("l_orderkey", "CAST(l_shipdate AS DATE) AS sd").collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
      .groupBy(_._1).view.mapValues(_.map(_._2).min(
        Ordering.by((d: java.time.LocalDate) => d.toEpochDay))).toMap
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_orderkey", "CAST(o_orderdate AS DATE) AS od",
        "o_orderpriority").collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getString(2)))
    val known = Set("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    var (childless, early, bad, clean) = (0L, 0L, 0L, 0L)
    orders.foreach { case (ok, od, prio) =>
      val ms = minShip.get(ok)
      val c = ms.isEmpty
      val e = ms.exists(_.isBefore(od))
      val b = !known(prio)
      if (c) childless += 1
      if (e) early += 1
      if (b) bad += 1
      if (!c && !e && !b) clean += 1
    }
    val got = EtlQueries.etlDqQuarantine(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe Map("childless" -> childless, "early_ship" -> early,
      "bad_priority" -> bad, "zz_clean" -> clean)
    // the two real rules bind; the domain rule is verifiably clean
    childless should be > 0L
    early should be > 0L
    bad shouldBe 0L
    clean should be > 0L
  }
}
