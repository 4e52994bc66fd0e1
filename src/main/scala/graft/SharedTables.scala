package graft

import org.apache.spark.sql.SparkSession

/** Registry of every [[graft.io.Materialized]] shared intermediate, for
  * order-independent benchmarking.
  *
  * The session cache is the right production shape (the edge table is
  * built once and every traversal reuses it), but it makes per-query
  * timings ORDER-DEPENDENT: whichever query touches a shared table
  * first pays its build (observed 6×: `graph_pagerank_parts` 1.3 s warm
  * vs 8.1 s when it happened to run first). `graft.Bench` therefore
  * pre-builds every entry here in a separately-timed materialization
  * phase and reports it as `materialization_sec`, so the per-query
  * numbers are warm-path and comparable across runs regardless of
  * query order.
  *
  * Completeness is enforced by `SharedTablesSpec`: constructing every
  * `SparkEntry` query must create no Materialized entry beyond the ones
  * this registry builds — a new `Materialized.of` site without a
  * registry row fails the build.
  */
object SharedTables {

  /** (label, builder): builder triggers the eager materialization via
    * `Materialized.of` — each is idempotent per (session, fixture).
    */
  val entries: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "graph-edges" -> ((s, d) => { ops.Graph.edgesWithDeg(s, d); () }),
    "graph-nodes" -> ((s, d) => { ops.Graph.nodeTable(s, d); () }),
    "graph-und" -> ((s, d) => { ops.Graph.undirectedEdges(s, d); () }),
    "graph-bfs-seeds" -> ((s, d) => { ops.Graph.bfsSeedsVisited(s, d); () }),
    "graph-wedges" -> ((s, d) => { ops.Graph.weightedEdges(s, d); () }),
    "graph-strong" -> ((s, d) => { ops.Graph.strongEdges(s, d); () }),
    "graph-base-edges" -> ((s, d) => { ops.Graph.baseEdges(s, d); () }),
    "graph-base-nodes" -> ((s, d) => { ops.Graph.baseNodes(s, d); () }),
    "graph-inc-delta" -> ((s, d) => { ops.Graph.deltaNewEdges(s, d); () }),
    "graph-inc-edges" -> ((s, d) => { ops.Graph.incEdges(s, d); () }),
    "graph-inc-nodes" -> ((s, d) => { ops.Graph.incNodes(s, d); () }),
    "ngramJaccardPairs" -> ((s, d) => { ops.TextOps.ngramJaccardPairsRaw(s, d); () }),
    "shingleSets" -> ((s, d) => { ops.TextOps.shingleSetsRaw(s, d); () }),
    "textDedupGroups" -> ((s, d) => { ops.TextOps.textDedupGroupsRaw(s, d); () }),
    "textDedupBaseGroups" -> ((s, d) => { ops.TextOps.textDedupBaseGroupsRaw(s, d); () }),
    "dedupEmbeddingCosine" -> ((s, d) => { ops.Similarity.dedupEmbeddingCosineRaw(s, d); () }),
    "dedupEmbeddingGroups" -> ((s, d) => { ops.Similarity.dedupEmbeddingGroups(s, d); () }),
    "dedupEmbeddingBaseGroups" -> ((s, d) => { ops.Similarity.dedupEmbeddingBaseGroupsRaw(s, d); () }),
    "kmeansQv" -> ((s, d) => { ops.Similarity.quantEmb(s, d); () }),
    "miningBaskets" -> ((s, d) => { ops.Mining.basketsRaw(s, d); () }),
    "miningPairCounts" -> ((s, d) => { ops.Mining.pairCountsRaw(s, d); () }),
    "erPairs09" -> ((s, d) => { ops.EntityRes.pairs09Raw(s, d); () }),
    "minhashPairs" -> ((s, d) => { ops.TextOps.minhashVerifiedPairs(s, d); () }),
  )

  /** Persisted [[graft.io.ModelStore]] artifacts, warmed alongside the
    * Materialized tables: every round's recompile changes the store's
    * bytecode digest and therefore re-keys every model table, so in a
    * cold environment the first query serving each model would silently
    * absorb its IRLS / BPE-merge / Lloyd training cost (the same
    * attribution bug the materialization phase fixed for shared
    * DataFrames, one layer up). Each hook forces the ensure path; the
    * groups-text / groups-emb models train inside the `textDedupGroups`
    * / `dedupEmbeddingGroups` entries above. Completeness is enforced by
    * `SharedTablesSpec` against a cold store: after `warmAll`,
    * constructing every `SparkEntry` query must record zero new
    * `ModelStore` train events.
    */
  val models: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "model-logreg" -> ((s, d) => { ops.Ml.logregWeights(s, d); () }),
    "model-bpe" -> ((s, d) => { ops.TextOps.bpeTokenize(s, d); () }),
    "model-quantizer" -> ((s, d) => ops.Similarity.warmQuantizer(s, d)),
    "model-pq" -> ((s, d) => ops.Similarity.warmPq(s, d)),
  )

  /** Dependency waves for the parallel warm (r13 optimization, guide
    * §2.6 "overlap independent jobs"): entries in the same wave have no
    * build-time dependency on each other, so they run concurrently from
    * a small driver pool and the next job's tasks back-fill executors
    * freed by the current job's tail. Waves are ordered so every entry's
    * dependencies sit in an EARLIER wave — a wrong assignment is benign
    * for correctness ([[graft.io.Materialized]] tolerates concurrent
    * computes of one label; compute is deterministic) but would waste
    * the duplicated build, so the map mirrors the actual `Materialized`
    * nesting in the ops files. Entries not listed here run in a final
    * catch-all wave, after everything known — a new registry row never
    * silently races its dependencies.
    */
  private val wave: Map[String, Int] = Map(
    // wave 0: roots — raw-fact builds and model trainings
    "model-quantizer" -> 0, "model-logreg" -> 0, "model-bpe" -> 0,
    "model-pq" -> 0, "graph-edges" -> 0, "graph-wedges" -> 0,
    "graph-strong" -> 0, "graph-base-edges" -> 0,
    "ngramJaccardPairs" -> 0, "shingleSets" -> 0, "miningBaskets" -> 0,
    "erPairs09" -> 0, "kmeansQv" -> 0,
    // wave 1: single-hop derivations
    "graph-nodes" -> 1, "graph-und" -> 1, "graph-base-nodes" -> 1,
    "graph-inc-delta" -> 1, "minhashPairs" -> 1, "miningPairCounts" -> 1,
    "dedupEmbeddingCosine" -> 1, "dedupEmbeddingBaseGroups" -> 1,
    "textDedupBaseGroups" -> 1,
    // wave 2: two-hop derivations
    "graph-inc-edges" -> 2, "graph-bfs-seeds" -> 2,
    "textDedupGroups" -> 2, "dedupEmbeddingGroups" -> 2,
    // wave 3: three-hop
    "graph-inc-nodes" -> 3)

  /** Build every shared table and model for `sfDir`; returns
    * (label, wallSeconds, processCpuSeconds) per entry — model labels
    * carry the `model-` prefix, so the bench can report the two phases
    * in one map. CPU is recorded per entry for the same reason the
    * per-query loop records it: the warm phase is the larger contention
    * surface (r10's driver record spent 332 s here with NO cpu-vs-wall
    * column, so diagnosing it needed a cross-host re-run — the exact
    * ritual the per-query column had just retired). wall ≫ cpu-share on
    * a build = the host took the cycles, not the plan.
    *
    * r13: entries run CONCURRENTLY inside each dependency wave (pool of
    * ≤ 4, gated on session cores so the driver's low-core scaling bench
    * stays sequential). Under overlap an entry's wall includes time the
    * host spent on its wave-mates and its cpu column is process-wide —
    * per-entry numbers are upper bounds during the warm; the honest
    * phase cost is the WALL the bench now measures around this call.
    */
  def warmAll(s: SparkSession, sfDir: String): Seq[(String, Double, Double)] = {
    val cpuBean: Option[com.sun.management.OperatingSystemMXBean] =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case b: com.sun.management.OperatingSystemMXBean => Some(b)
        case _ => None
      }
    def cpuNanos(): Long = cpuBean.map(_.getProcessCpuTime).getOrElse(0L)
    val all = entries ++ models
    val lastWave = (wave.values.max + 1)
    val poolSize = math.max(1, math.min(4, s.sparkContext.defaultParallelism / 8))
    val timed = new java.util.concurrent.ConcurrentHashMap[String, (Double, Double)]()
    all.groupBy { case (label, _) => wave.getOrElse(label, lastWave) }
      .toSeq.sortBy(_._1)
      .foreach { case (_, waveEntries) =>
        val pool = java.util.concurrent.Executors.newFixedThreadPool(poolSize)
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutorService(pool)
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        val fs = waveEntries.map { case (label, build) =>
          Future {
            // job descriptions are thread-local: label the overlapped jobs
            s.sparkContext.setJobDescription(s"warm: $label")
            val t0 = System.nanoTime()
            val c0 = cpuNanos()
            build(s, sfDir)
            timed.put(label,
              ((System.nanoTime() - t0) / 1e9, (cpuNanos() - c0) / 1e9))
          }
        }
        try fs.foreach(f => Await.result(f, Duration.Inf))
        finally pool.shutdown()
      }
    all.map { case (label, _) =>
      val (w, c) = timed.get(label)
      (label, w, c)
    }
  }
}
