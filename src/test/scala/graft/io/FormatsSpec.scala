package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** S8 file-format surface (parquet primary; json/csv come with Spark) and
  * the schema-relaxed union mirroring BQ load-job relaxation (SURVEY §2.8).
  */
class FormatsSpec extends SparkSpec {

  "json round-trip" should "preserve rows and columns" in {
    val path = tmpDir("fmt-json")
    val src = Sources.nation(spark, sfDir)
    src.write.mode("overwrite").json(path)
    val back = spark.read.json(path)
    back.count() shouldBe 25
    back.columns.sorted shouldBe src.columns.sorted
  }

  "csv round-trip with header" should "preserve rows" in {
    val path = tmpDir("fmt-csv")
    val src = Sources.region(spark, sfDir)
    src.write.mode("overwrite").option("header", "true").csv(path)
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)
      .count() shouldBe 5
  }

  "unionByName(allowMissingColumns)" should "relax schemas like a BQ load job" in {
    val s = spark
    import s.implicits._
    val a = Seq((1L, "x")).toDF("id", "payload")
    val b = Seq((2L, 9.5)).toDF("id", "score")
    val u = a.unionByName(b, allowMissingColumns = true).orderBy("id")
    u.columns.toSeq shouldBe Seq("id", "payload", "score")
    u.collect().map(_.isNullAt(2)) shouldBe Array(true, false)
    u.collect().map(_.isNullAt(1)) shouldBe Array(false, true)
  }
}
