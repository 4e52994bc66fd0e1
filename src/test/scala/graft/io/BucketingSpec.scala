package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed tables must (a) produce the same join/agg results as the
  * unbucketed plan and (b) actually eliminate the shuffle — asserted on
  * the physical plan string, since that is the entire point at scale.
  */
class BucketingSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** The in-memory catalog is fresh per JVM but the warehouse directory
    * persists — an orphaned location from a previous run fails
    * saveAsTable, so clear both table and location first.
    */
  private def dropCompletely(table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new java.io.File(s"spark-warehouse/$table")
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
  }

  "co-bucketed tables" should "join without Exchange and match the unbucketed result" in {
    val li = graft.io.Sources.lineitem(spark, sfDir)
    val ord = graft.io.Sources.orders(spark, sfDir)
    dropCompletely("li_b"); dropCompletely("ord_b")
    Bucketing.writeBucketed(li, "li_b", "l_orderkey", 8)
    Bucketing.writeBucketed(ord, "ord_b", "o_orderkey", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.coBucketedJoin(spark, "li_b", "ord_b",
        "l_orderkey", "o_orderkey")
      joined.count() shouldBe li.join(ord,
        li("l_orderkey") === ord("o_orderkey")).count()

      val plan = planOf(joined)
      plan should include("SortMergeJoin")
      plan should not include "Exchange"

      // mismatched side (plain parquet) shuffles only itself
      val half = Bucketing.coBucketedJoin(spark, "li_b", "ord_b",
        "l_orderkey", "o_orderkey")
      planOf(half) should not include "Exchange"
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  it should "aggregate on the bucket key without Exchange" in {
    val agg = Bucketing.bucketedAgg(spark, "li_b", "l_orderkey",
      Seq(sum("l_quantity").as("qty"), count(lit(1)).as("n")))
    val plan = planOf(agg)
    plan should include("HashAggregate")
    plan should not include "Exchange"
    agg.count() shouldBe graft.io.Sources.lineitem(spark, sfDir)
      .select("l_orderkey").distinct().count()
  }
}
