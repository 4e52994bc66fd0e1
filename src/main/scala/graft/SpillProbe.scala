package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Memory-headroom probe: runs the heaviest queries from the bench
  * surface under a DELIBERATELY constrained driver JVM and records
  * Spark's spill metrics, proving the plans degrade to disk instead of
  * dying when execution memory runs short — the behavior a 100 TB
  * deployment depends on whenever a partition outgrows its executor's
  * share. Every shuffle/sort/agg operator in these plans is
  * spill-capable (`ExternalSorter` / `UnsafeExternalSorter` /
  * spillable hash maps); what this probe demonstrates is that no plan
  * step holds corpus-sized state in an unspillable structure.
  *
  * Run it with the heap LOWERED via the fork env var, e.g.
  * `SPARK_DRIVER_MEM=2g sbt "runMain graft.SpillProbe"` (the default
  * bench heap is 8g), optionally squeezing the unified-memory pool
  * further with `SPARK_GRAFT_MEM_FRACTION=0.2`. Prints one JSON line:
  * per-query seconds, rows, and memory/disk bytes spilled.
  */
object SpillProbe {

  /** The idle-host-heaviest bench queries (round-5 plan audit ranking). */
  private val defaultQueries = Seq(
    "etl_pipeline_e2e", "text_contamination", "dedup_minhash_lsh",
    "sim_ann_ivf", "sim_ann_lsh")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    // optional extra squeeze on the unified execution+storage pool
    sys.env.get("SPARK_GRAFT_MEM_FRACTION")
      .foreach(f => builder.config("spark.memory.fraction", f))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val memSpilled = new AtomicLong
    val diskSpilled = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        Option(t.taskMetrics).foreach { m =>
          memSpilled.addAndGet(m.memoryBytesSpilled): Unit
          diskSpilled.addAndGet(m.diskBytesSpilled): Unit
        }
    })

    val names = if (args.nonEmpty) args.toSeq else defaultQueries
    val heap = Runtime.getRuntime.maxMemory()
    var failed = false
    val results = names.map { name =>
      // metrics arrive on the async listener bus; settle before sampling
      Thread.sleep(500)
      val (m0, d0) = (memSpilled.get(), diskSpilled.get())
      val t0 = System.nanoTime()
      val (rows, sec) =
        try { val r = SparkEntry.queries(name)(spark, sfDir).count(); (r, (System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          failed = true
          System.err.println(s"[spill] $name DIED: ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")
          (-1L, -1.0)
        }
      Thread.sleep(500)
      (name, sec, rows, memSpilled.get() - m0, diskSpilled.get() - d0)
    }
    val qs = results.map { case (n, sec, rows, mem, disk) =>
      val secStr = String.format(java.util.Locale.ROOT, "%.3f", Double.box(sec))
      s""""$n":{"sec":$secStr,"rows":$rows,"mem_spilled":$mem,"disk_spilled":$disk}"""
    }.mkString("{", ",", "}")
    println(String.format(java.util.Locale.ROOT,
      """{"metric":"spill_probe","heap_bytes":%d,"mem_fraction":"%s","queries":%s,"sf":"%s"}""",
      Long.box(heap), sys.env.getOrElse("SPARK_GRAFT_MEM_FRACTION", "default"), qs, sfDir))
    spark.stop()
    if (failed) sys.exit(1)
  }
}
