package graft.io

import graft.SparkSpec
import graft.ops.Similarity

/** The train-once / serve-from-table lifecycle: after one session trains
  * and writes a model table, a FRESH session must serve from the table —
  * never retrain — with identical results. The `fail(...)` train thunks
  * prove the read path: ensure* only invokes the thunk when no complete
  * table exists.
  */
class ModelStoreSpec extends SparkSpec {

  private def freshSession = spark.newSession()

  "ModelStore" should "serve the PQ codebook to a fresh session without retraining" in {
    val emb = Sources.embeddings(spark, sfDir)
    val trained = Similarity.trainPqCached(spark, emb, sfDir) // writes on first ever run
    val shape = Similarity.pqShape(8, 16, 8, 2)
    val served = ModelStore.ensurePq(freshSession, sfDir, shape) {
      fail("train ran — the model table should have been served")
    }
    served.map(_._1) shouldBe trained.map(_._1)
    served.zip(trained).foreach { case ((_, a), (_, b)) => a.toSeq shouldBe b.toSeq }
  }

  it should "serve the coarse-quantizer centroids to a fresh session without retraining" in {
    val emb = Sources.embeddings(spark, sfDir)
    val trained = Similarity.quantizerServed(spark, sfDir, emb)
    val served = ModelStore.ensureCentroids(freshSession, sfDir, "quant|seed=label|it=2") {
      fail("train ran — the centroid table should have been served")
    }
    served.map(_._1) shouldBe trained.map(_._1)
    served.zip(trained).foreach { case ((_, a), (_, b)) => a.toSeq shouldBe b.toSeq }
  }

  it should "serve the near-dup groups table to a fresh session without recomputing" in {
    val original = Similarity.dedupEmbeddingGroups(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val s2 = freshSession
    val servedRaw = ModelStore.ensureDf(s2, "groups-emb", sfDir) {
      fail("compute ran — the groups table should have been served")
    }
    servedRaw.collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq.sorted shouldBe original.sorted
    // and the full serving query in the fresh session returns the same rows
    Similarity.dedupEmbeddingGroups(s2, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe original
  }

  it should "key tables apart by shape and source" in {
    val a = ModelStore.dirFor("pq", "/data/x", "pq|m=8|k=16")
    ModelStore.dirFor("pq", "/data/x", "pq|m=8|k=32") should not be a
    ModelStore.dirFor("pq", "/data/y", "pq|m=8|k=16") should not be a
    ModelStore.dirFor("centroids", "/data/x", "pq|m=8|k=16").getParentFile should
      not be a.getParentFile
  }
}
