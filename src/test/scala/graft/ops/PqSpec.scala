package graft.ops

import graft.SparkSpec

/** Product quantization: code-word well-formedness, client-side parity of
  * the distributed argmin encoding, reconstruction-fidelity bounds, and
  * dominance over the trivial (k=1) codebook.
  */
class PqSpec extends SparkSpec {

  private val M = 8
  private val SubDim = 8

  private lazy val vecs: Seq[(Long, Array[Float])] =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq

  private lazy val audit: Map[Long, (Array[Int], Double)] =
    Similarity.pqAudit(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1).split("-").map(_.toInt), r.getDouble(2))))
      .toMap

  // the cached model — the SAME instance the audit/ADC queries encode
  // with (a retrain could differ in final ulps and flip near-tie argmins)
  private lazy val model: Map[(Int, Int), Array[Double]] =
    Similarity.trainPqCached(spark,
      graft.io.Sources.embeddings(spark, sfDir), sfDir).toMap

  "Similarity.pqAudit" should "emit one 8-part code word per vector with cells in [0,16)" in {
    audit.size shouldBe vecs.size
    audit.values.foreach { case (codes, _) =>
      codes.length shouldBe M
      codes.foreach(c => c should (be >= 0 and be < 16))
    }
    // the codebook must actually discriminate: many distinct code words
    audit.values.map(_._1.mkString("-")).toSet.size should be > vecs.size / 4
  }

  it should "match a client-side re-encode with the collected codebooks" in {
    def encode(v: Array[Float]): (Array[Int], Double) = {
      var mse = 0.0
      val codes = (0 until M).map { sub =>
        val sv = v.slice(sub * SubDim, (sub + 1) * SubDim).map(_.toDouble)
        // same comparison rule as the operator: min (d2, cell)
        val (d2, cell) = (0 until 16).map { cell =>
          val c = model((sub, cell))
          val d = sv.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
          (d, cell)
        }.min
        mse += d2
        cell
      }.toArray
      (codes, mse / (M * SubDim))
    }
    vecs.take(50).foreach { case (id, v) =>
      val (codes, mse) = encode(v)
      audit(id)._1 shouldBe codes
      audit(id)._2 shouldBe mse +- 1e-6
    }
  }

  it should "reconstruct with high cosine fidelity" in {
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val fidelities = vecs.map { case (id, v) =>
      val recon = audit(id)._1.zipWithIndex.flatMap { case (cell, sub) =>
        model((sub, cell))
      }
      cosine(v.map(_.toDouble), recon)
    }
    // the fixture's subspaces carry little cluster structure (synthetic,
    // near-random within 8 dims), so 0.6 is the data-informed floor —
    // verified against a numpy replica of the same training (0.653)
    (fidelities.sum / fidelities.size) should be > 0.6
  }

  it should "beat the trivial one-cell-per-subspace codebook" in {
    val k1 = Similarity.trainPqCached(spark,
      graft.io.Sources.embeddings(spark, sfDir), sfDir, k = 1).toMap
    val k1Mse = vecs.map { case (_, v) =>
      (0 until M).map { sub =>
        val sv = v.slice(sub * SubDim, (sub + 1) * SubDim).map(_.toDouble)
        sv.zip(k1((sub, 0))).map { case (x, y) => (x - y) * (x - y) }.sum
      }.sum / (M * SubDim)
    }
    val pqMse = vecs.map { case (id, _) => audit(id)._2 }
    // 0.57x measured (numpy replica agrees to 3 decimals); 0.7 is the
    // dominance bound with headroom against seeding jitter
    (pqMse.sum / pqMse.size) should be < 0.7 * (k1Mse.sum / k1Mse.size)
  }

  "Similarity.trainPq" should "clamp k to the corpus size instead of throwing" in {
    // 5 vectors, k=16: seeding collects only 5 — must not index past them
    val tiny = graft.io.Sources.embeddings(spark, sfDir).limit(5)
    val m = Similarity.trainPq(spark, tiny, k = 16)
    m should not be empty
    // every cell id stays within the clamped range, every subspace seeded
    m.map(_._1._2).max should be < 5
    m.map(_._1._1).toSet shouldBe (0 until M).toSet
  }

  "Similarity.ivfAdcTopK" should "rank only candidates from probed cells and stay L2-competitive" in {
    def d2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val cents = Similarity.quantizerServed(spark, sfDir,
      graft.io.Sources.embeddings(spark, sfDir))
    def cellsOf(v: Array[Float], n: Int): Seq[Int] =
      cents.map { case (id, c) => (-cos(v, c), id) }.sorted.take(n).map(_._2)

    val res = Similarity.ivfAdcTopK(spark, sfDir).collect()
    val queries = vecs.filter(_._1 < 8)
    val corpus = vecs.filter(_._1 >= 8)
    val byId = corpus.toMap
    val byQ = res.groupBy(_.getLong(0))
    byQ.keySet shouldBe queries.map(_._1).toSet
    byQ.values.foreach { rows =>
      rows.map(_.getLong(1)).sorted.toSeq shouldBe (1L to rows.length)
    }
    // definitional: every returned neighbor is indexed in one of the
    // query's nprobe=2 probed cells — nothing outside was scanned
    val qv = queries.toMap
    byQ.foreach { case (qid, rows) =>
      val probed = cellsOf(qv(qid), 2).toSet
      rows.foreach { r =>
        probed should contain(cellsOf(byId(r.getLong(2)), 1).head)
      }
    }
    // competitive ratio of the top-1 pick vs the exact NN (true L2 of the
    // chosen neighbor / true L2 of the best) — bounds calibrated on the
    // fixture, with headroom
    val exactNn = queries.map { case (qid, q) =>
      qid -> corpus.map { case (id, v) => (d2(q, v), id) }.min._1
    }.toMap
    val ratios = byQ.toSeq.map { case (qid, rows) =>
      val top1 = rows.minBy(_.getLong(1)).getLong(2)
      d2(qv(qid), byId(top1)) / exactNn(qid)
    }
    ratios.foreach(_ should be < 3.0)
    (ratios.sum / ratios.size) should be < 1.8
  }

  "Similarity.pqAdcTopNeighbor" should "stay L2-competitive with exact search" in {
    def d2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    val queries = vecs.filter(_._1 < 8)
    val corpus = vecs.filter(_._1 >= 8)
    val exactNn = queries.map { case (qid, qv) =>
      qid -> corpus.map { case (id, v) => (d2(qv, v), id) }.min
    }.toMap
    val got = Similarity.pqAdcTopNeighbor(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.keySet shouldBe queries.map(_._1).toSet
    // competitive ratio: the TRUE distance to the ADC-chosen neighbor vs
    // the exact-NN distance — robust where exact recall@1 is brittle
    val byId = corpus.toMap
    val ratios = queries.map { case (qid, qv) =>
      d2(qv, byId(got(qid))) / exactNn(qid)._1
    }
    ratios.foreach(_ should be < 3.0)
    (ratios.sum / ratios.size) should be < 1.8
  }
}
