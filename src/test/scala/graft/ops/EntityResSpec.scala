package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.JaroWinkler
import org.apache.spark.unsafe.types.UTF8String

/** Entity-resolution operators: the native Jaro-Winkler expression
  * against published vectors and an independently-coded reference
  * implementation, plus brute-force validation of the blocked-pair and
  * best-link queries on the sf0.001 fixture.
  */
class EntityResSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  /** Independent reference: collection-style formulation (match lists,
    * zip-counted transpositions) vs the expression's imperative loops.
    */
  private def refJw(s1: String, s2: String): Double = {
    if (s1.isEmpty && s2.isEmpty) return 1.0
    if (s1.isEmpty || s2.isEmpty) return 0.0
    val w = math.max(0, math.max(s1.length, s2.length) / 2 - 1)
    val used = Array.fill(s2.length)(false)
    val m1 = scala.collection.mutable.ArrayBuffer[Char]()
    for (i <- s1.indices) {
      var j = math.max(0, i - w)
      var done = false
      while (j <= math.min(s2.length - 1, i + w) && !done) {
        if (!used(j) && s2(j) == s1(i)) { used(j) = true; m1 += s1(i); done = true }
        j += 1
      }
    }
    val m2 = s2.indices.filter(used).map(s2(_))
    val m = m1.length
    if (m == 0) return 0.0
    val t = m1.zip(m2).count { case (a, b) => a != b } / 2
    val jaro = (m.toDouble / s1.length + m.toDouble / s2.length + (m - t).toDouble / m) / 3.0
    if (jaro <= 0.7) jaro
    else {
      val p = s1.zip(s2).take(4).takeWhile { case (a, b) => a == b }.size
      jaro + 0.1 * p * (1.0 - jaro)
    }
  }

  "JaroWinkler.similarity" should "reproduce the published test vectors" in {
    jw("martha", "marhta") shouldBe (0.9611111111111111 +- 1e-12)
    jw("dwayne", "duane") shouldBe (0.84 +- 1e-12)
    jw("DIXON", "DICKSONX") shouldBe (0.8133333333333332 +- 1e-12)
    jw("abc", "abc") shouldBe 1.0
    jw("", "abc") shouldBe 0.0
    jw("abc", "") shouldBe 0.0
    jw("", "") shouldBe 1.0
    // common prefix but jaro below the 0.7 boost threshold: NO boost
    jw("abcdefgh", "abzzzzzz") shouldBe (0.5 +- 1e-12)
    // boost engages just above the threshold
    jw("ab", "abcdefghijkl") shouldBe (0.7777777777777779 +- 1e-12)
  }

  it should "agree with an independent reference on random strings" in {
    val rnd = new scala.util.Random(42)
    def randStr(): String =
      (0 until rnd.nextInt(12)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    (1 to 2000).foreach { _ =>
      val (a, b) = (randStr(), randStr())
      withClue(s"jw('$a','$b')") {
        jw(a, b) shouldBe (refJw(a, b) +- 1e-12)
        // metric sanity: symmetric, [0, 1]
        jw(a, b) shouldBe jw(b, a)
        jw(a, b) should be >= 0.0
        jw(a, b) should be <= 1.0
      }
    }
  }

  it should "route long and non-ASCII input through the general path with identical scores" in {
    // > 64 bytes forces the char-level path; the bitmask path must agree
    // with it wherever both apply, so cross-check via the reference on
    // strings straddling the 64-byte dispatch boundary
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val n = 60 + rnd.nextInt(10) // 60..69 chars: both sides of the cutoff
      val a = (0 until n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      val b = (0 until 60 + rnd.nextInt(10)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      withClue(s"jw long('$a','$b')") {
        jw(a, b) shouldBe (refJw(a, b) +- 1e-12)
      }
    }
    // non-ASCII: bytes != chars, must take (and score via) the char path
    jw("café noir", "café noir") shouldBe 1.0
    jw("café", "cafe") shouldBe (refJw("café", "cafe") +- 1e-12)
    jw("über", "uber") shouldBe (refJw("über", "uber") +- 1e-12)
  }

  it should "evaluate identically through the codegen'd SQL path" in {
    import spark.implicits._
    val pairs = Seq(("martha", "marhta"), ("dwayne", "duane"),
      ("small ring", "small ribbon"), ("red widget", "red widget"))
    val got = pairs.toDF("a", "b")
      .select(call_function("jaro_winkler", col("a"), col("b")))
      .collect().map(_.getDouble(0))
    got.zip(pairs).foreach { case (g, (a, b)) => g shouldBe jw(a, b) }
  }

  // quantized 1e-6-lattice membership test — the family's only
  // comparison currency (threshold AND rank), mirroring the engine
  private def q09(a: String, b: String): Boolean =
    math.round(jw(a, b) * 1e6) >= 900000L

  "EntityRes.jaroPairs" should "match a brute-force un-blocked scan (banded recall is complete)" in {
    val parts = spark.read.parquet(s"$sfDir/part.parquet")
      .select("p_brand", "p_partkey", "p_name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val expected = (for {
      a <- parts; b <- parts
      if a._1 == b._1 && a._2 < b._2 && q09(a._3, b._3)
    } yield (a._1, a._2, b._2)).sorted.toSeq
    val got = EntityRes.jaroPairs(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    got.sorted shouldBe expected
  }

  "EntityRes.bestLink" should "pick each linked A record's true argmax among >=0.9 candidates" in {
    val parts = spark.read.parquet(s"$sfDir/part.parquet")
      .select("p_brand", "p_partkey", "p_name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val as = parts.filter(_._2 % 2 == 0)
    val bs = parts.filter(_._2 % 2 == 1)
    val expected = as.flatMap { a =>
      val cands = bs.filter(b => b._1 == a._1 && q09(a._3, b._3))
      if (cands.isEmpty) None // unlinked: below match threshold everywhere
      else Some((a._2, cands.map { b =>
        (math.round(jw(a._3, b._3) * 1e6), b._2)
      }.maxBy { case (q, k) => (q, -k) }._2))
    }.sortBy(_._1).toSeq
    expected should not be empty // fixture must exercise the linked path
    val got = EntityRes.bestLink(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(3))).toSeq
    got shouldBe expected
  }

  "EntityRes.clusterCanonical" should "match a union-find + survivorship replay" in {
    val parts = spark.read.parquet(s"$sfDir/part.parquet")
      .select("p_brand", "p_partkey", "p_name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    // brute-force union-find over the >= 0.9 blocked pairs
    val root = scala.collection.mutable.Map(parts.map(p => p._2 -> p._2): _*)
    def find(x: Long): Long = {
      var r = x
      while (root(r) != r) r = root(r)
      r
    }
    for (a <- parts; b <- parts
         if a._1 == b._1 && a._2 < b._2 && q09(a._3, b._3)) {
      val (ra, rb) = (find(a._2), find(b._2))
      if (ra != rb) root(math.max(ra, rb)) = math.min(ra, rb)
    }
    val byGroup = parts.groupBy(p => find(p._2))
    val expected = parts.map { p =>
      val gid = find(p._2)
      val members = byGroup(gid)
      // most frequent name, ties to lexicographically smallest
      val best = members.groupBy(_._3).view.mapValues(_.size).toSeq
        .sortBy { case (name, n) => (-n, name) }.head._1
      val canonKey = members.filter(_._3 == best).map(_._2).min
      (p._2, gid, members.size.toLong, canonKey, best, p._2 == canonKey)
    }.sortBy(_._1).toSeq
    val got = EntityRes.clusterCanonical(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getBoolean(5))).toSeq
    got shouldBe expected
  }

  "EntityRes.blockingMetrics" should "replay the candidate census and certify complete fixture recall" in {
    val parts = spark.read.parquet(s"$sfDir/part.parquet")
      .select("p_brand", "p_partkey", "p_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    def bands(name: String): Seq[String] = {
      val t = name.split(" ", -1)
      Seq("1:" + t(0), "2:" + (if (t.length > 1) t(1) else t(0)))
    }
    val byBlock = parts.flatMap { case (br, k, n) =>
      bands(n).map(b => (br, b) -> k)
    }.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val cand = byBlock.values.flatMap { ks =>
      for (a <- ks; b <- ks if a < b) yield (a, b)
    }.toSet
    val truth = (for {
      a <- parts; b <- parts
      if a._1 == b._1 && a._2 < b._2 && q09(a._3, b._3)
    } yield (a._2, b._2)).toSet
    val nTotal = parts.groupBy(_._1).values
      .map(g => g.size.toLong * (g.size - 1) / 2).sum
    val row = EntityRes.blockingMetrics(spark, sfDir).collect().head
    row.getLong(0) shouldBe parts.size.toLong // n_records
    row.getLong(1) shouldBe byBlock.size.toLong // n_blocks
    row.getLong(2) shouldBe cand.size.toLong // n_candidates
    row.getLong(3) shouldBe nTotal // n_total_pairs
    row.getLong(4) shouldBe truth.size.toLong // n_truth
    row.getLong(5) shouldBe (truth intersect cand).size.toLong // n_covered
    row.getLong(6) shouldBe 1000000L // fixture recall is complete
    row.getLong(7) shouldBe (nTotal - cand.size) * 1000000L / nTotal
    row.getLong(7) should be > 0L // blocking genuinely reduces work
  }

  /** Textbook American Soundex, written INDEPENDENTLY of the SQL
    * expression under test (imperative walk, not string surgery), so
    * the generated translate/replace chain is checked against the
    * published procedure, not against itself.
    */
  private def soundexRef(word: String): String = {
    val u = word.toUpperCase
    def code(c: Char): Char = c match {
      case 'B' | 'F' | 'P' | 'V' => '1'
      case 'C' | 'G' | 'J' | 'K' | 'Q' | 'S' | 'X' | 'Z' => '2'
      case 'D' | 'T' => '3'
      case 'L' => '4'
      case 'M' | 'N' => '5'
      case 'R' => '6'
      case 'H' | 'W' => '9' // sentinel class for a leading H/W
      case _ => '0'
    }
    // elide H/W after the first letter, code everything, collapse runs
    val kept = u.head +: u.tail.filterNot(c => c == 'H' || c == 'W')
    val coded = kept.map(code)
    val collapsed = coded.foldLeft("") { (acc, c) =>
      if (acc.nonEmpty && acc.last == c) acc else acc + c
    }
    val tail = collapsed.drop(1).filter(_ != '0').take(3)
    u.head.toString + tail.padTo(3, '0')
  }

  "EntityRes.soundexBlocking" should "census phonetic keys per the textbook procedure" in {
    val toks = graft.io.Sources.documents(spark, sfDir).select("text").collect()
      .flatMap(_.getString(0).split(" ", -1))
    val types = toks.groupBy(identity).map { case (w, xs) => (w, xs.length.toLong) }
    val want = types.groupBy { case (w, _) => soundexRef(w) }.toSeq
      .map { case (sx, g) =>
        (sx, g.size.toLong, g.map(_._2).sum,
          g.map(_._1).min, g.map(_._1).max)
      }.sortBy(_._1)
    val got = EntityRes.soundexBlocking(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getString(4))).toSeq
    got shouldBe want
    // the fixture vocabulary happens to be collision-free (31 words,
    // 31 keys) — the collision behaviour itself is pinned by the
    // published-example test below (Robert ≡ Rupert, Ashcraft ≡
    // Ashcroft); here every key must be well-formed letter+3-digits
    got.foreach(_._1 should fullyMatch regex "[A-Z][0-9]{3}")
    got.map(_._2).sum shouldBe want.map(_._2).sum
  }

  it should "reproduce published reference keys" in {
    // classic published examples (Knuth TAOCP vol. 3 / census bureau)
    soundexRef("Robert") shouldBe "R163"
    soundexRef("Rupert") shouldBe "R163"
    soundexRef("Ashcraft") shouldBe "A261" // h elision: s-c NOT separated
    soundexRef("Ashcroft") shouldBe "A261"
    soundexRef("Tymczak") shouldBe "T522"
    soundexRef("Pfister") shouldBe "P236" // first-letter code collapses
    soundexRef("Honeyman") shouldBe "H555"
  }
}
