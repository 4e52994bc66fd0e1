package graft.transform

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** RAW normalization semantics (reference `utils.py:300-307`): mixed-case
  * columns lowercase; date strings parse-or-NULL then re-serialize to
  * canonical `"yyyy-MM-dd HH:mm:ss"`; typed twins added; delete-range
  * predicate works at day granularity over the string column.
  */
class NormalizeSpec extends SparkSpec {

  private lazy val raw = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "2024-03-05", "A"),
      (2L, "2024-03-05 14:30:00", "B"),
      (3L, "not-a-date", "C"),
      (4L, null.asInstanceOf[String], "D"),
    ).toDF("ID", "DTMOVIMENTO", "Payload")
  }

  "normalize" should "lowercase every column name (utils.py:307)" in {
    Normalize.normalize(raw).columns.toSeq should contain allOf
      ("id", "dtmovimento", "payload", "dtmovimento_ts", "dtmovimento_date")
  }

  it should "canonicalize parseable dates and NULL-coerce garbage (utils.py:301-305)" in {
    val out = Normalize.normalize(raw).orderBy("id")
      .select("dtmovimento").collect().map(_.getString(0))
    out shouldBe Array("2024-03-05 00:00:00", "2024-03-05 14:30:00", null, null)
  }

  it should "keep typed twins consistent with the string form" in {
    val out = Normalize.normalize(raw).orderBy("id")
    val dates = out.select(col("dtmovimento_date").cast("string")).collect().map(_.getString(0))
    dates shouldBe Array("2024-03-05", "2024-03-05", null, null)
  }

  it should "not add twins when typedTwins=false" in {
    Normalize.normalize(raw, typedTwins = false).columns.toSeq shouldBe
      Seq("id", "dtmovimento", "payload")
  }

  "dayRangePredicate" should "match at day granularity regardless of time (utils.py:266-269)" in {
    val norm = Normalize.normalize(raw)
    val hit = norm.filter(Normalize.dayRangePredicate("dtmovimento", "2024-03-05", "2024-03-05"))
      .select("id").collect().map(_.getLong(0)).sorted
    hit shouldBe Array(1L, 2L) // 14:30 row included: DATE() truncation
  }

  it should "honor the reference's widened bounds edge (utils.py:168-175)" in {
    val s = spark
    import s.implicits._
    val edge = Seq((1L, "2024-03-05 23:59:59"), (2L, "2024-03-06 00:00:00"))
      .toDF("id", "dtmovimento")
    val norm = Normalize.normalize(edge)
    norm.filter(Normalize.dayRangePredicate("dtmovimento", "2024-03-05", "2024-03-05"))
      .select("id").collect().map(_.getLong(0)) shouldBe Array(1L)
  }
}
