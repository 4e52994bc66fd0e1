package graft.io

import graft.SparkSpec

/** Memoized corpus statistics: the sizing count behind index-parameter
  * selection must run at most once per path (the repeated-call path the
  * round-2 advisory flagged for annLshTopNeighbor).
  */
class CorpusStatsSpec extends SparkSpec {

  "CorpusStats.rowCount" should "memoize per (path, table) and match a direct count" in {
    CorpusStats.clear()
    val direct = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    CorpusStats.rowCount(spark, sfDir, "embeddings") shouldBe direct
    CorpusStats.cacheSize shouldBe 1
    // second call hits the cache — no new entry, same answer
    CorpusStats.rowCount(spark, sfDir, "embeddings") shouldBe direct
    CorpusStats.cacheSize shouldBe 1
    // a different table is a different entry
    CorpusStats.rowCount(spark, sfDir, "documents") should be > 0L
    CorpusStats.cacheSize shouldBe 2
  }

  it should "feed repeated ANN sizing without re-running the count job" in {
    CorpusStats.clear()
    graft.ops.Similarity.annLshTopNeighbor(spark, sfDir).limit(1).collect()
    val after = CorpusStats.cacheSize
    after shouldBe 1
    // repeat invocation: plan construction reuses the cached count
    graft.ops.Similarity.annLshTopNeighbor(spark, sfDir).limit(1).collect()
    CorpusStats.cacheSize shouldBe after
  }

  "Materialized.of" should "compute once per (session, label) and serve identical rows" in {
    Materialized.clear()
    var computes = 0
    def frame() = Materialized.of(spark, "test|groups") {
      computes += 1
      graft.ops.TextOps.textDedupGroups(spark, sfDir).limit(50)
    }
    val first = frame().collect()
    val second = frame().collect()
    computes shouldBe 1
    Materialized.cacheSize should be >= 1
    second shouldBe first
  }

  it should "share the groups table across its three consumers" in {
    Materialized.clear()
    graft.ops.TextOps.textDedupGroups(spark, sfDir).limit(1).collect()
    val after = Materialized.cacheSize
    // canonical pick and group split must REUSE the materialized groups
    graft.ops.TextOps.dedupCanonical(spark, sfDir).limit(1).collect()
    graft.ops.Sampling.sampleGroupSplit(spark, sfDir).collect()
    Materialized.cacheSize shouldBe after
  }
}
