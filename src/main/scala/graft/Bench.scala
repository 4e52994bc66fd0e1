package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: JIT + codegen + parquet footer caches, so the first timed
    // query doesn't absorb session startup (~3-4s on a cold JVM)
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    // host-speed canary: a FIXED data-independent CPU-bound aggregate
    // (codegen'd range sum, all cores). Its time calibrates the run —
    // measured spreads up to ~2.4x on identical code from hypervisor
    // contention make raw totals incomparable across runs; readers
    // should compare total/canary ratios, not totals.
    val canary = {
      val t0 = System.nanoTime()
      spark.range(200000000L).selectExpr("sum(id * 3 + 1)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    // two timed iterations per query, min reported: the second run reuses
    // warmed JIT/codegen caches, so min-of-2 approximates steady-state
    // latency without GC/compilation noise
    // a failed query reports -1.0 (loudly, on stderr) rather than its
    // time-to-throw — otherwise a planning error reads as a speedup
    // optional comma-separated name-prefix filter for iterating on one
    // query locally; the driver never sets it, so round benches run all
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      only.forall(_.exists(n.startsWith))
    }
    // shared-materialization phase: pre-build every Materialized entry
    // (edge tables, dedup pair/group tables) and report the cost as its
    // own line — otherwise whichever query touches a shared table first
    // absorbs its build and per-query numbers depend on run order
    // (observed 6x on graph_pagerank_parts). Queries run in pinned
    // (sorted) order, so with the shared builds factored out the
    // per-query numbers are warm-path and run-to-run comparable.
    // Skipped for filtered local runs (which never ship bench.json).
    val shared =
      if (only.isEmpty) SharedTables.warmAll(spark, sfDir)
      else Seq.empty[(String, Double)]
    val sharedSec = shared.map(_._2).sum
    // model provenance: how many ModelStore artifacts the warm phase had
    // to TRAIN (0 = all served from disk; >0 = cold store or recompiled
    // trainer bytecode re-keyed the tables) plus the trainer code-id —
    // so a reader can tell a cold-trained record from a warm-served one
    val modelsTrained = graft.io.ModelStore.trainEvents.size
    val modelCodeId = graft.io.ModelStore.codeIdTag
    // a failure's exception text is RECORDED in the JSON (not only on
    // stderr, which the round harness discards) and the process exits
    // non-zero — a record containing a -1.0 must never ship as "final"
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // per-query GC telemetry: driver-JVM collection-time delta (ms,
    // all collectors) alongside seconds, taken from the SAME iteration
    // as the reported min time. The CPU canary calibrates host speed but
    // cannot see memory pressure — an order-of-magnitude per-query
    // outlier with gc_ms ≈ 0 is hypervisor contention, one with large
    // gc_ms is heap pressure; recording both makes a contended run
    // self-diagnosing instead of a cross-host adjudication.
    import scala.jdk.CollectionConverters._
    def gcMillis(): Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    val gcByQuery = scala.collection.mutable.LinkedHashMap[String, Long]()
    val results = selected.map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val g0 = gcMillis()
        try { fn(spark, sfDir).count(); ((System.nanoTime() - t0) / 1e9, gcMillis() - g0) }
        catch { case e: Throwable =>
          val msg = (Option(e.getMessage).getOrElse("") match {
            case "" => e.getClass.getName
            case m  => e.getClass.getSimpleName + ": " + m
          }).replaceAll("\\s+", " ").take(300)
          errors(name) = msg
          System.err.println(s"[bench] $name FAILED: $msg"); (-1.0, 0L)
        }
      }
      val best = times.minBy(_._1)
      gcByQuery(name) = best._2
      name -> (if (times.exists(_._1 == -1.0)) -1.0 else best._1)
    }
    // The harness keeps only the last ~2000 chars of stdout, and 78 query
    // names cannot fit in that window. So: the FULL per-query JSON goes to
    // bench.json (committed in-repo) and stdout first; the LAST line
    // printed is a compact JSON — total + the 30 slowest queries + the
    // aggregated rest — sized well inside the tail window so the driver's
    // parse always succeeds.
    // Locale.ROOT: the f-interpolator uses the default locale, which on
    // comma-decimal locales would emit invalid JSON ("value":37,850)
    def fmt(v: Double): String =
      if (v < 0) "-1.0"
      else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val gcJson = gcByQuery.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson =
      if (errors.isEmpty) ""
      else ",\"errors\":" + errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
        .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum + sharedSec
    val sharedJson = shared.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","canary_sec":${fmt(canary)},""" +
      s""""materialization_sec":${fmt(sharedSec)},"materialization":$sharedJson,""" +
      s""""models":{"trained":$modelsTrained,"code_id":"$modelCodeId"},""" +
      s""""queries":$qs,"gc_ms":$gcJson$errJson,"sf":"$sfDir"}"""
    // filtered local runs must not clobber the round record, and neither
    // must a partially-failed run: a caller ignoring the non-zero exit (or
    // a later blanket commit) would ship the broken record over the last
    // clean one — failures land in bench-failed.json instead
    if (only.isEmpty) {
      val out = new java.io.PrintWriter(
        if (errors.isEmpty) "bench.json" else "bench-failed.json")
      try out.println(line) finally out.close()
    }
    println(line)
    val top = results.sortBy { case (_, v) => -v }.take(30)
    val topQs = top.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val rest = results.map(_._2).filter(_ >= 0).sum - top.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","canary_sec":${fmt(canary)},""" +
      s""""materialization_sec":${fmt(sharedSec)},"queries":$topQs,""" +
      s""""other_sec":${fmt(rest)},"n_queries":${results.size},"detail":"bench.json","sf":"$sfDir"}""")
    spark.stop()
    // any -1.0 in the record ⇒ non-zero exit: a caller (or a builder about
    // to commit bench.json) cannot mistake a partially-failed run for clean
    if (errors.nonEmpty) sys.exit(1)
  }
}
