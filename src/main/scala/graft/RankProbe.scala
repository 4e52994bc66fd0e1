package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Focused probe for the global-rank rewrite: times the two-pass
  * [[graft.ops.Prefix]] shape against the single-partition global window
  * on a synthetic aggregate of `n` rows (the customer-revenue shape:
  * rank + exact-long running sum). The fixture-replication ScaleProbe
  * tops out at ~2.4·10⁵ aggregate rows, where one task still absorbs the
  * sort easily; THIS probe pushes the windowed input to 10⁶-10⁷ rows —
  * the regime a 100 TB corpus's entity aggregates actually occupy — and
  * shows where the single-task sort's wall-clock passes the two-pass
  * path's fixed overhead (the memory-ceiling argument needs no probe:
  * one task must hold/sort the whole input, the two-pass path holds
  * 1/k of it). Usage: `runMain graft.RankProbe [n ...]` (default 1e6 1e7).
  */
object RankProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toLong) else Seq(1000000L, 10000000L)
    sizes.foreach { n =>
      // deterministic pseudo-random revenue-like values; materialized so
      // both paths time the window work, not the generator
      val agg = spark.range(n).toDF("custkey")
        .withColumn("cents", pmod(col("custkey") * 2654435761L, lit(999983L)))
        .localCheckpoint(true)
      // reduce over the WINDOWED columns — a bare count() would let the
      // optimizer prune the unreferenced window/prefix work entirely
      def time(thunk: => Long): Double = {
        thunk
        val t0 = System.nanoTime(); thunk; (System.nanoTime() - t0) / 1e9
      }
      val order = Seq(col("cents").desc, col("custkey").asc)
      val tPrefix = time {
        graft.ops.Prefix.running(agg, order,
            rankOut = Some("rk"), sums = Seq(col("cents") -> "cum"))
          .agg(sum(pmod(col("rk") + col("cum"), lit(1000000007L)))).head().getLong(0)
      }
      val tGlobal = time {
        val w = Window.orderBy(order: _*)
        agg.withColumn("rk", row_number().over(w).cast("long"))
          .withColumn("cum",
            sum("cents").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .agg(sum(pmod(col("rk") + col("cum"), lit(1000000007L)))).head().getLong(0)
      }
      println(s"""{"metric":"rank_probe","rows":$n,"prefix_sec":$tPrefix,"globalwin_sec":$tGlobal}""")
    }
    spark.stop()
  }
}
