package graft.sources

import java.io.PrintWriter

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.io.Sources

/** DSv2 paginated source (S1/S2 native form): full-read equality against
  * the fixture, page pruning under a pushed date BETWEEN, boundary-day
  * conservatism, and column pruning.
  */
class PagedJsonSourceSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", StringType),
    StructField("o_orderpriority", StringType)))

  /** Stage the orders fixture as monthly JSON-Lines pages with
    * `page-<n>__<min>__<max>.jsonl` manifests (the paginated-API stand-in).
    */
  private lazy val pagesDir: String = {
    val dir = tmpDir("paged-orders")
    val rows = Sources.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"))
      .collect()
    rows.groupBy(_.getString(4).substring(0, 7)).toSeq.sortBy(_._1).zipWithIndex
      .foreach { case ((_, rs), i) =>
        val dates = rs.map(_.getString(4))
        val name = f"page-$i%04d__${dates.min}__${dates.max}.jsonl"
        val pw = new PrintWriter(s"$dir/$name")
        rs.foreach { r =>
          pw.println(
            s"""{"o_orderkey":${r.getLong(0)},"o_custkey":${r.getLong(1)},""" +
              s""""o_orderstatus":"${r.getString(2)}","o_totalprice":${r.getDouble(3)},""" +
              s""""o_orderdate":"${r.getString(4)}","o_orderpriority":"${r.getString(5)}"}""")
        }
        pw.close()
      }
    dir
  }

  private def read() = spark.read
    .format("graft.sources.PagedJsonSource")
    .schema(schema)
    .option("path", pagesDir)
    .option("filterField", "o_orderdate")
    .load()

  "full read" should "match the fixture row-for-row" in {
    val got = read().orderBy("o_orderkey").collect()
    val want = Sources.orders(spark, sfDir).count()
    got.length.toLong shouldBe want
    got.head.schema.fieldNames.toSeq shouldBe schema.fieldNames.toSeq
  }

  "pushed BETWEEN" should "prune non-intersecting pages at planning time" in {
    val n = read()
      .filter(col("o_orderdate").between("1996-01-01", "1996-03-31"))
      .count()
    val expected = Sources.orders(spark, sfDir)
      .filter(col("o_orderdate").between("1996-01-01", "1996-03-31 23:59:59")).count()
    n shouldBe expected
    PagedJsonSource.lastTotalPages should be > 70 // ~84 monthly pages
    PagedJsonSource.lastPlannedPages shouldBe 3 // only the 3 months scanned
  }

  it should "stay conservative on the boundary day (datetime-granular bound)" in {
    val n = read()
      .filter(col("o_orderdate") >= "1996-02-29 00:00:00")
      .filter(col("o_orderdate") <= "1996-03-31")
      .count()
    // page key "1996-02-29" must NOT be pruned by the longer bound string;
    // the expectation applies the identical lexicographic row predicate
    val expected = Sources.orders(spark, sfDir)
      .filter(date_format(col("o_orderdate"), "yyyy-MM-dd") >= "1996-02-29 00:00:00")
      .filter(date_format(col("o_orderdate"), "yyyy-MM-dd") <= "1996-03-31").count()
    n shouldBe expected
    PagedJsonSource.lastPlannedPages shouldBe 2
  }

  "column pruning" should "reach the scan (pruned read schema)" in {
    val df = read().select("o_orderkey", "o_totalprice")
    val scanLine = df.queryExecution.executedPlan.toString()
    df.count() shouldBe Sources.orders(spark, sfDir).count()
    scanLine should include("PagedJsonScan")
  }
}
