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
}
