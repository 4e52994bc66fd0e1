package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.transform.Normalize

/** Sink semantics (SURVEY §7.3 hard parts): delete-range+append is
  * idempotent (run twice ⇒ identical table), replaces only touched date
  * partitions, and an empty batch deletes nothing (utils.py:391-398).
  */
class SinksSpec extends SparkSpec {

  private def mkBatch(rows: Seq[(Long, String, Double)]) = {
    val s = spark
    import s.implicits._
    Normalize.normalize(rows.toDF("id", "dtmovimento", "amount"))
  }

  private val day1 = Seq((1L, "2024-03-05 10:00:00", 10.0), (2L, "2024-03-05 11:00:00", 20.0))
  private val day2 = Seq((3L, "2024-03-06 09:00:00", 30.0))

  "deleteRangeAppend" should "be idempotent: run twice yields the identical table" in {
    val path = tmpDir("sink-idem")
    val batch = mkBatch(day1 ++ day2)
    Sinks.deleteRangeAppend(batch, "dtmovimento_ts", path)
    val first = spark.read.parquet(path).orderBy("id").collect()
    Sinks.deleteRangeAppend(batch, "dtmovimento_ts", path)
    val second = spark.read.parquet(path).orderBy("id").collect()
    second shouldBe first
    second.length shouldBe 3
  }

  it should "replace only the date partitions present in the new batch" in {
    val path = tmpDir("sink-dyn")
    Sinks.deleteRangeAppend(mkBatch(day1 ++ day2), "dtmovimento_ts", path)
    // re-load day1 with changed amounts; day2 must survive untouched
    val reprocessed = mkBatch(Seq((1L, "2024-03-05 10:00:00", 99.0)))
    Sinks.deleteRangeAppend(reprocessed, "dtmovimento_ts", path)
    val out = spark.read.parquet(path)
    out.count() shouldBe 2 // 1 new day1 row + 1 untouched day2 row
    out.filter(col("id") === 3L).count() shouldBe 1
    out.filter(col("id") === 1L).select("amount").collect()(0).getDouble(0) shouldBe 99.0
  }

  it should "leave stale rows in place on an empty extract (utils.py:391-398)" in {
    val path = tmpDir("sink-empty")
    Sinks.deleteRangeAppend(mkBatch(day1), "dtmovimento_ts", path)
    val empty = mkBatch(day1).filter(lit(false))
    val loaded = Sinks.loadIfNonEmpty(empty, b => Sinks.deleteRangeAppend(b, "dtmovimento_ts", path))
    loaded shouldBe false
    spark.read.parquet(path).count() shouldBe 2 // nothing deleted
  }

  "truncate" should "fully replace the table (WRITE_TRUNCATE)" in {
    val path = tmpDir("sink-trunc")
    Sinks.truncate(mkBatch(day1 ++ day2), path)
    Sinks.truncate(mkBatch(day2), path)
    spark.read.parquet(path).count() shouldBe 1
  }

  "append" should "accumulate rows (WRITE_APPEND)" in {
    val path = tmpDir("sink-app")
    Sinks.append(mkBatch(day1), path)
    Sinks.append(mkBatch(day2), path)
    spark.read.parquet(path).count() shouldBe 3
  }

  "compact" should "collapse micro-batch files and preserve every row" in {
    val s = spark
    import s.implicits._
    val path = tmpDir("sink-compact") + "/t"
    // simulate 20 micro-batch appends -> at least 20 data files
    (1 to 20).foreach { i =>
      Sinks.append(Seq((i.toLong, s"row$i")).toDF("id", "v").coalesce(1), path)
    }
    val rowsBefore = spark.read.parquet(path).orderBy("id").collect().toSeq
    val (before, after) = Sinks.compact(spark, path) // target >> table size
    before should be >= 20
    after shouldBe 1
    val rowsAfter = spark.read.parquet(path).orderBy("id").collect().toSeq
    rowsAfter shouldBe rowsBefore
    // sized compaction: tiny target must split into multiple files
    val (_, multi) = Sinks.compact(spark, path, targetFileBytes = 700L)
    multi should be > 1
    spark.read.parquet(path).count() shouldBe 20
  }

  it should "fail fast on a stale .compact_old instead of deleting the survivor" in {
    val s = spark
    import s.implicits._
    val path = tmpDir("sink-compact-stale") + "/t"
    Sinks.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1), path)
    // simulate a prior run that crashed between the two renames: the
    // backup dir holds what may be the only copy of the table
    val bak = new java.io.File(path + ".compact_old")
    bak.mkdirs() shouldBe true
    an[IllegalArgumentException] should be thrownBy Sinks.compact(spark, path)
    // nothing was deleted: table still readable, backup untouched
    spark.read.parquet(path).count() shouldBe 2
    bak.exists() shouldBe true
    // after the operator recovers (removes the stale dir), compact works
    bak.delete() shouldBe true
    val (_, after) = Sinks.compact(spark, path)
    after shouldBe 1
    spark.read.parquet(path).count() shouldBe 2
  }

  it should "discard a stale .compact_tmp (always re-creatable rewrite output)" in {
    val s = spark
    import s.implicits._
    val path = tmpDir("sink-compact-tmp") + "/t"
    Sinks.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1), path)
    val tmp = new java.io.File(path + ".compact_tmp")
    tmp.mkdirs() shouldBe true
    new java.io.File(tmp, "garbage.txt").createNewFile() shouldBe true
    val (_, after) = Sinks.compact(spark, path)
    after shouldBe 1
    spark.read.parquet(path).count() shouldBe 2
    tmp.exists() shouldBe false
  }
}
