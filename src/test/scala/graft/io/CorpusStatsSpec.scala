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
}
