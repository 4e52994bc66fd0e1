package graft.ops

import graft.SparkSpec

/** Certifies the distributed BPE trainer against a driver-side reference
  * implementation of the classic algorithm (word-frequency table,
  * greedy left-to-right merge, count-desc/lexicographic tie-break), plus
  * the structural invariants on the real fixture.
  */
class BpeSpec extends SparkSpec {

  /** Naive reference BPE over a weighted word list. */
  private def referenceBpe(words: Seq[(String, Long)], k: Int): Seq[(String, String, Long)] = {
    var vocab = words.map { case (w, c) => (w.split("").toVector, c) }
    val out = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    var continue = true
    while (out.length < k && continue) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      if (counts.isEmpty) continue = false
      else {
        val ((a, b), pc) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((a, b, pc))
        vocab = vocab.map { case (syms, c) =>
          val merged = scala.collection.mutable.ArrayBuffer[String]()
          syms.foreach { x =>
            if (merged.nonEmpty && merged.last == a && x == b) {
              merged.remove(merged.length - 1); merged += (a + b)
            } else merged += x
          }
          (merged.toVector, c)
        }
      }
    }
    out.toSeq
  }

  behavior of "TextOps.bpeMerges"

  it should "replay the reference merge sequence on a crafted corpus" in {
    import spark.implicits._
    val docs = Seq(
      "low low low low low",
      "lower lower newest newest",
      "newest newest newest newest",
      "widest widest widest",
      "lowest lowest").toDF("text")
    val words = docs.as[String].collect()
      .flatMap(_.split(" ")).groupBy(identity)
      .map { case (w, ws) => (w, ws.length.toLong) }.toSeq
    val want = referenceBpe(words, 6)

    val got = TextOps.bpeMergesOn(docs, 6).collect()
    got.length shouldBe want.length
    got.zip(want).zipWithIndex.foreach { case ((r, (a, b, pc)), i) =>
      r.getAs[Long]("merge_rank") shouldBe (i + 1).toLong
      r.getAs[String]("left") shouldBe a
      r.getAs[String]("right") shouldBe b
      r.getAs[String]("merged") shouldBe (a + b)
      r.getAs[Long]("pair_count") shouldBe pc
    }
  }

  behavior of "TextOps.bpeTokenize"

  it should "match reference tokenization with the learned merges" in {
    val merges = TextOps.bpeMerges(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("merge_rank"))
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right")))

    def tokenize(w: String): Vector[String] =
      merges.foldLeft(w.split("").toVector) { case (syms, (a, b)) =>
        val out = scala.collection.mutable.ArrayBuffer[String]()
        syms.foreach { x =>
          if (out.nonEmpty && out.last == a && x == b) {
            out.remove(out.length - 1); out += (a + b)
          } else out += x
        }
        out.toVector
      }

    val want = graft.io.Sources.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map { r =>
        val ws = r.getString(1).split(" ").filter(_.nonEmpty)
        val nTok = ws.map(w => tokenize(w).length.toLong).sum
        val nLet = ws.map(_.length.toLong).sum
        (r.getLong(0), ws.length.toLong, nTok, nLet,
          10000 * (nLet - nTok) / nLet)
      }.sortBy(_._1).toSeq

    val got = TextOps.bpeTokenize(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    got shouldBe want
    // merging can only shrink, never below one token per word
    got.foreach { case (_, nw, nt, nl, _) =>
      nt should be <= nl
      nt should be >= nw
    }
  }

  behavior of "TextOps.bpeTokenizeFrozen"

  /** The greedy left-to-right fold — the engine semantics. */
  private def foldMerge(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    syms.foreach { x =>
      if (out.nonEmpty && out.last == a && x == b) {
        out.remove(out.length - 1); out += (a + b)
      } else out += x
    }
    out.toVector
  }

  it should "match reference tokenization with the published merges" in {
    def tokenize(w: String): Vector[String] =
      TextOps.frozenBpeMerges.foldLeft(w.split("").toVector) {
        case (syms, (a, b)) => foldMerge(syms, a, b)
      }
    val want = graft.io.Sources.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map { r =>
        val ws = r.getString(1).split(" ").filter(_.nonEmpty)
        val nTok = ws.map(w => tokenize(w).length.toLong).sum
        val nLet = ws.map(_.length.toLong).sum
        (r.getLong(0), ws.length.toLong, nTok, nLet,
          10000 * (nLet - nTok) / nLet)
      }.sortBy(_._1).toSeq
    val got = TextOps.bpeTokenizeFrozen(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    got shouldBe want
    // the published merges must actually fire on this vocabulary
    got.map(t => t._4 - t._3).sum should be > 0L
  }

  it should "be replayed exactly by the oracle's two-pass replace (left != right)" in {
    // driver-side simulation of the DuckDB formulation: sep-encoded
    // symbol string, each merge applied as TWO java replace passes
    // (String.replace = leftmost-first non-overlapping, the same
    // semantics as DuckDB's replace)
    val sep = "\u001f"
    def twoPass(w: String): Int = {
      val enc = TextOps.frozenBpeMerges.foldLeft(
        sep + w.split("").mkString(sep) + sep) { case (s, (a, b)) =>
        val pat = sep + a + sep + b + sep
        val rep = sep + (a + b) + sep
        s.replace(pat, rep).replace(pat, rep)
      }
      enc.count(_ == '\u001f') - 1
    }
    def fold(w: String): Int =
      TextOps.frozenBpeMerges.foldLeft(w.split("").toVector) {
        case (syms, (a, b)) => foldMerge(syms, a, b)
      }.length
    // every distinct fixture word, plus adversarial shapes: chained
    // occurrences, back-to-back pairs, merge products re-participating
    val fixtureWords = graft.io.Sources.documents(spark, sfDir)
      .select("text").collect()
      .flatMap(_.getString(0).split(" ")).filter(_.nonEmpty).distinct
    val crafted = Seq("ththth", "thethethe", "ananan", "sortsortsort",
      "thesorthe", "ssttsstt", "orororor", "wiwiwi", "the", "t", "")
      .filter(_.nonEmpty)
    (fixtureWords ++ crafted).foreach { w =>
      withClue(s"word '$w': ") { twoPass(w) shouldBe fold(w) }
    }
    // the self-merge counterexample from the scaladoc: ("a","a") over
    // a^6 folds to 3 tokens but two-pass replays to 4 — the reason the
    // published table excludes left == right
    val s0 = sep + "a a a a a a".split(" ").mkString(sep) + sep
    val pat = sep + "a" + sep + "a" + sep
    val rep = sep + "aa" + sep
    val twoPassSelf = s0.replace(pat, rep).replace(pat, rep).count(_ == '\u001f') - 1
    val foldSelf = foldMerge(Vector.fill(6)("a"), "a", "a").length
    foldSelf shouldBe 3
    twoPassSelf shouldBe 4
    TextOps.frozenBpeMerges.foreach { case (a, b) => a should not be b }
  }

  it should "hold the structural invariants on the fixture corpus" in {
    val got = TextOps.bpeMerges(spark, sfDir).collect()
    got.length should be > 0
    // max pair count is non-increasing across merge steps: a pair
    // containing the new symbol occurs at most as often as the merge did
    got.map(_.getAs[Long]("pair_count")).sliding(2).foreach {
      case Array(prev, next) => next should be <= prev
      case _ =>
    }
    got.foreach { r =>
      r.getAs[String]("merged") shouldBe
        (r.getAs[String]("left") + r.getAs[String]("right"))
      r.getAs[Long]("pair_count") should be > 0L
    }
  }
}
