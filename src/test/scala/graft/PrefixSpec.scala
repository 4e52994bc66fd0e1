package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Prefix

/** The two-pass prefix aggregation must be row-for-row identical to the
  * single-partition global window it replaces — rank, running sum, and
  * running max (inclusive and exclusive/lag forms), including order-key
  * ties and the null lag on the very first row. The fixture spans all 4
  * test shuffle partitions so the offset-merge path is genuinely
  * exercised.
  */
class PrefixSpec extends SparkSpec {

  // deterministic pseudo-random longs; duplicate order keys via % 97
  private lazy val df = {
    spark.range(0, 1000).toDF("id")
      .withColumn("k", (col("id") * 2654435761L) % 97)
      .withColumn("v", (col("id") * 7919L) % 1021)
  }

  private val order = Seq(col("k").desc, col("id").asc)

  "Prefix.running" should "match the global window bit-for-bit" in {
    val w = Window.orderBy(order: _*)
    val wIncl = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("cum_v", sum("v").over(wIncl))
      .withColumn("max_v", max("v").over(wIncl))
      .withColumn("max_v_lt", lag(max("v").over(wIncl), 1).over(w))
      .orderBy("rk")
      .collect()

    val actual = Prefix.running(df, order,
        rankOut = Some("rk"),
        sums = Seq(col("v") -> "cum_v"),
        maxes = Seq(Prefix.RunMax(col("v"), "max_v", Some("max_v_lt"))))
      .select("id", "k", "v", "rk", "cum_v", "max_v", "max_v_lt")
      .orderBy("rk")
      .collect()

    actual.length shouldBe expected.length
    actual.zip(expected).foreach { case (a, e) =>
      a.getAs[Long]("rk") shouldBe e.getAs[Long]("rk")
      a.getAs[Long]("id") shouldBe e.getAs[Long]("id")
      a.getAs[Long]("cum_v") shouldBe e.getAs[Long]("cum_v")
      a.getAs[Long]("max_v") shouldBe e.getAs[Long]("max_v")
      Option(a.get(a.fieldIndex("max_v_lt"))) shouldBe Option(e.get(e.fieldIndex("max_v_lt")))
    }
  }

  it should "handle a single-row frame (null exclusive max, rank 1)" in {
    val one = df.limit(1)
    val r = Prefix.running(one, order,
        rankOut = Some("rk"),
        sums = Seq(col("v") -> "cum_v"),
        maxes = Seq(Prefix.RunMax(col("v"), "max_v", Some("max_v_lt"))))
      .collect()
    r.length shouldBe 1
    r(0).getAs[Long]("rk") shouldBe 1L
    r(0).getAs[Long]("cum_v") shouldBe r(0).getAs[Long]("v")
    r(0).isNullAt(r(0).fieldIndex("max_v_lt")) shouldBe true
  }

  it should "return empty output on empty input" in {
    val empty = df.filter(col("id") < 0)
    Prefix.running(empty, order, rankOut = Some("rk")).count() shouldBe 0L
  }
}
