package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The Misra–Gries guarantees must hold under ANY partitioning of the
  * input (estimates may shift inside the error band — that freedom is
  * the sketch): for stream length n and budget k, every item with true
  * count > n/(k+1) is reported, and every report is an underestimate by
  * at most n/(k+1).
  */
class MisraGriesSpec extends SparkSpec {

  private val k = 16

  private lazy val words = {
    graft.io.Sources.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
  }

  private lazy val exact: Map[String, Long] = words.groupBy("w").count()
    .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def check(parts: Int): Unit = {
    val n = exact.values.sum
    val bound = n / (k + 1)
    val est = words.repartition(parts)
      .agg(MisraGriesAggregator.heavyHitters(k)(col("w")).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est.size should be <= k
    // completeness: all true heavy hitters survive every partitioning
    exact.filter(_._2 > bound).keySet.foreach { w =>
      withClue(s"heavy hitter '$w' missing at parts=$parts: ") {
        est.contains(w) shouldBe true
      }
    }
    // soundness: estimates are underestimates within n/(k+1)
    est.foreach { case (w, c) =>
      withClue(s"item '$w' at parts=$parts: ") {
        c should be <= exact.getOrElse(w, 0L)
        c should be >= exact.getOrElse(w, 0L) - bound
      }
    }
  }

  "MisraGriesAggregator" should "keep its guarantees at 1 partition" in check(1)
  it should "keep its guarantees at 7 partitions" in check(7)
  it should "keep its guarantees at 32 partitions" in check(32)

  it should "report exact counts when distinct items fit the budget" in {
    val s = spark
    import s.implicits._
    val small = Seq("a", "a", "b", "c", "a", "b").toDF("w").repartition(3)
    val est = small.agg(MisraGriesAggregator.heavyHitters(k)(col("w")).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est shouldBe Map("a" -> 3L, "b" -> 2L, "c" -> 1L)
  }
}
