package graft.ops

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** The from-spec baseline-JPEG (T.81) implementation. Evidence: decode
  * equals the pixel formula across the id/dims lattice (including the
  * 12-MCU shape that crosses three restart intervals), corpus-wide
  * presence of the byte-stuffing and restart paths, proof the decoder
  * USES the parsed quant/Huffman tables rather than assuming them, and
  * loud failure on truncation.
  */
class JpegCodecSpec extends AnyFlatSpec with Matchers {

  private def formula(id: Long, nChars: Long): (Int, Int, Long, Long) = {
    val (w, h) = JpegCodec.dims(nChars)
    val bw = w / 8
    var s = 0L
    var ws = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val g = JpegCodec.blockGray(id, (y / 8).toLong * bw + (x / 8))
      val p = y.toLong * w + x
      s += g
      ws += (p + 1) * g
    }
    (w, h, s, ws)
  }

  "encode/decode" should "reproduce the block-gray formula across the lattice" in {
    // every (w, h) shape × a spread of ids — covers 1..12 MCUs, so
    // streams with zero, one, and three restart markers all round-trip
    for (id <- Seq(0L, 1L, 7L, 123L, 99991L); nc <- 0L until 12L) {
      val got = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(id, nc))
      withClue(s"id=$id nc=$nc") { got shouldBe formula(id, nc) }
    }
  }

  private def scanBytes(b: Array[Byte]): Array[Byte] = {
    // entropy region = after the SOS segment (FFDA len=8) to EOI
    val i = (0 until b.length - 1).indexWhere(j =>
      (b(j) & 0xff) == 0xff && (b(j + 1) & 0xff) == 0xda)
    b.slice(i + 10, b.length - 2)
  }

  it should "emit restart markers corpus-wide" in {
    val scans = (0L until 200L)
      .map(id => scanBytes(JpegCodec.encodeJpeg(id, id % 101)))
    // restart markers appear in every >=4-MCU stream (7/12 of shapes)
    scans.count(s => s.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) >= 0xd0 && (p(1) & 0xff) <= 0xd7)
    ) should be > 100
  }

  it should "stuff 0xFF entropy bytes and round-trip through them" in {
    // drive the gray encoder over all 2-block sequences: category-8
    // payloads (|diff| >= 128) carry runs of ones that land a 0xFF on
    // some byte alignments — assert stuffing occurs AND every stream
    // (stuffed or not) decodes back to its grays exactly
    var stuffed = 0
    for (g0 <- 0 until 256 by 3; g1 <- 0 until 256 by 3) {
      val grays = Array(g0, g1)
      val bytes = JpegCodec.encodeGrays(grays, 2, 1, "j")
      if (scanBytes(bytes).sliding(2).exists(p =>
        (p(0) & 0xff) == 0xff && p(1) == 0x00)) stuffed += 1
      val (w, h, s, ws) = JpegCodec.decodeJpeg(bytes)
      (w, h) shouldBe (16, 8)
      s shouldBe 64L * (g0 + g1)
      val expWs = (for (y <- 0 until 8; x <- 0 until 16) yield
        (y.toLong * 16 + x + 1) * (if (x < 8) g0 else g1)).sum
      ws shouldBe expWs
    }
    stuffed should be > 0
  }

  it should "use the PARSED quant table, not an assumed one" in {
    val bytes = JpegCodec.encodeJpeg(42L, 7L)
    // find the DQT segment (FFDB), bump q[0] 8 -> 16: every pixel gray
    // becomes 2*(g-128)+128, so the sums must shift accordingly
    val i = (0 until bytes.length - 1).indexWhere(j =>
      (bytes(j) & 0xff) == 0xff && (bytes(j + 1) & 0xff) == 0xdb)
    val mutated = bytes.clone()
    mutated(i + 5) = 16.toByte // first zigzag entry = DC quantizer
    val (w, h, s0, _) = JpegCodec.decodeJpeg(bytes)
    val (_, _, s1, _) = JpegCodec.decodeJpeg(mutated)
    s1 should not be s0
    s1 shouldBe 2 * s0 - w.toLong * h * 128
  }

  it should "decode DC categories through the parsed Huffman table" in {
    // negative and positive diffs across categories: the b^2 term plus
    // mod-256 wraparound swings diffs both ways; assert both signs occur.
    // b = 0 is the first-block diff against the zero predictor.
    val diffs = for (id <- 0L until 50L; b <- 0L until 12L) yield
      JpegCodec.blockGray(id, b) - 128 -
        (if (b == 0) 0 else JpegCodec.blockGray(id, b - 1) - 128)
    diffs.count(_ > 0) should be > 0
    diffs.count(_ < 0) should be > 0
    diffs.map(d => 32 - Integer.numberOfLeadingZeros(math.abs(d)))
      .toSet.size should be > 3 // several SSSS categories exercised
  }

  it should "fail loudly on truncation" in {
    val bytes = JpegCodec.encodeJpeg(5L, 11L)
    an[Exception] should be thrownBy
      JpegCodec.decodeJpeg(bytes.take(bytes.length - 4))
    an[Exception] should be thrownBy JpegCodec.decodeJpeg(bytes.take(20))
    an[Exception] should be thrownBy JpegCodec.decodeJpeg(Array[Byte](1, 2, 3))
  }

  // ---- AC profile (r13) ----------------------------------------------

  /** Driver-side reference: the published coefficient formula through a
    * straight (non-separable) evaluation of the published integer IDCT —
    * an independent implementation of the same published arithmetic.
    */
  private def formulaAc(id: Long, nChars: Long): (Int, Int, Long, Long) = {
    val (w, h) = JpegCodec.dims(nChars)
    val bw = w / 8
    def pixels(b: Long): Array[Int] = {
      val sNat = new Array[Long](64)
      sNat(0) = 8L * JpegCodec.dcQ(id, b)
      JpegCodec.acPositions.foreach { k =>
        val nat = JpegCodec.zigzag(k)
        sNat(nat) = (16L + nat) * JpegCodec.acQ(id, b, k)
      }
      val out = new Array[Int](64)
      for (y <- 0 until 8; x <- 0 until 8) {
        var acc = 0L
        for (v <- 0 until 8; u <- 0 until 8)
          acc += sNat(v * 8 + u) * JpegCodec.idctT(u)(x) * JpegCodec.idctT(v)(y)
        val g = ((acc + 524288L) >> 20).toInt + 128
        out(y * 8 + x) = math.max(0, math.min(255, g))
      }
      out
    }
    var s = 0L
    var ws = 0L
    val cache = scala.collection.mutable.Map[Long, Array[Int]]()
    for (y <- 0 until h; x <- 0 until w) {
      val b = (y / 8).toLong * bw + (x / 8)
      val g = cache.getOrElseUpdate(b, pixels(b))((y % 8) * 8 + (x % 8))
      val p = y.toLong * w + x
      s += g
      ws += (p + 1) * g
    }
    (w, h, s, ws)
  }

  "AC encode/decode" should "reproduce the published coefficient formula + IDCT" in {
    for (id <- Seq(0L, 1L, 7L, 123L, 99991L); nc <- 0L until 12L) {
      val got = JpegCodec.decodeJpegAc(JpegCodec.encodeJpegAc(id, nc))
      withClue(s"id=$id nc=$nc") { got shouldBe formulaAc(id, nc) }
    }
  }

  it should "exercise ZRL, EOB, multi-run coding and both payload signs corpus-wide" in {
    // the position set {1,2,3,6,10,20,40} forces: runs 2, 3, 9 and
    // 19 (= ZRL + 3) between nonzeros, EOB after 40 — and the mod-33
    // lattice hits 0 at listed positions, lengthening runs further
    val coefs = for (id <- 0L until 50L; b <- 0L until 12L; k <- JpegCodec.acPositions)
      yield JpegCodec.acQ(id, b, k)
    coefs.count(_ > 0) should be > 0
    coefs.count(_ < 0) should be > 0
    coefs.count(_ == 0) should be > 0 // zero AT a listed position
    coefs.map(v => 32 - Integer.numberOfLeadingZeros(math.abs(v)))
      .toSet should contain allOf (1, 2, 3, 4, 5)
    // ZRL symbol (0xF0) actually appears: decode would fail on a wrong
    // run reconstruction, but also assert the encoder emits category-0
    // runs >= 16 structurally — position 20 -> 40 is a 19-gap whenever
    // acQ(.,.,40) != 0
    (0L until 50L).flatMap(id => (0L until 12L).map(b =>
      JpegCodec.acQ(id, b, 40))).count(_ != 0) should be > 400
  }

  it should "decode the DC-only streams too (strict subset)" in {
    // the general decoder must agree with the DC-only decoder on
    // DC-only streams: constant blocks are exact under ANY correct
    // IDCT, published-rounding included (S00 = 8*(g-128) gives
    // acc = g-128 << 20 exactly, so floor rounding is lossless)
    for (id <- Seq(3L, 44L); nc <- 0L until 6L) {
      val bytes = JpegCodec.encodeJpeg(id, nc)
      JpegCodec.decodeJpegAc(bytes) shouldBe JpegCodec.decodeJpeg(bytes)
    }
  }

  it should "use the parsed AC table: corrupting it breaks decode loudly" in {
    val bytes = JpegCodec.encodeJpegAc(42L, 7L)
    // find the DHT segment (FFC4); the AC table starts after the DC
    // table (1 + 16 + 12 bytes in): swap its first two BITS counts so
    // canonical code assignment shifts — decode must not silently agree
    val i = (0 until bytes.length - 1).indexWhere(j =>
      (bytes(j) & 0xff) == 0xff && (bytes(j + 1) & 0xff) == 0xc4)
    val acBitsOff = i + 4 + 1 + 16 + 12 + 1 // segment body + DC block + AC class byte
    val mutated = bytes.clone()
    val t = mutated(acBitsOff); mutated(acBitsOff) = mutated(acBitsOff + 1)
    mutated(acBitsOff + 1) = t
    val ok = JpegCodec.decodeJpegAc(bytes)
    val broken = try Some(JpegCodec.decodeJpegAc(mutated)) catch { case _: Exception => None }
    broken should not be Some(ok)
  }
}
