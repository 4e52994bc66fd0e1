package graft.ops

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** The from-spec PNG/zlib/deflate implementation, cross-checked against
  * the JDK's independent implementations wherever those exist (CRC-32,
  * Adler-32, and `java.util.zip.Inflater` as a second decoder of our
  * fixed-Huffman streams) and against the pixel contract end-to-end.
  * No Spark session needed — the codec is plain JVM code; the query
  * shape is covered by the mm_decode_png oracle.
  */
class PngCodecSpec extends AnyFlatSpec with Matchers {

  private def randomBytes(seed: Int, n: Int): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n)(rnd.nextInt(256).toByte)
  }

  "crc32/adler32" should "match the JDK implementations bit-for-bit" in {
    for (n <- Seq(0, 1, 7, 64, 1000)) {
      val data = randomBytes(n + 1, n)
      val jcrc = new java.util.zip.CRC32
      jcrc.update(data)
      (PngCodec.crc32(data, 0, n) & 0xffffffffL) shouldBe jcrc.getValue
      val jad = new java.util.zip.Adler32
      jad.update(data)
      (PngCodec.adler32(data) & 0xffffffffL) shouldBe jad.getValue
    }
  }

  "deflateFixed" should "round-trip through our inflater AND the JDK's" in {
    val cases = Seq(
      randomBytes(42, 300), // incompressible: mostly literals
      Array.fill(400)(7.toByte), // maximal overlap backrefs (dist 1)
      Array.tabulate(500)(i => (i % 3).toByte), // period-3 (the Sub-filter shape)
      ("abcabcabcxyz" * 20).getBytes("US-ASCII"),
      Array.emptyByteArray :+ 9.toByte, // single byte
    )
    cases.foreach { raw =>
      val deflated = PngCodec.deflateFixed(raw)
      // our decoder (via the zlib frame, which also checks Adler)
      val zl = {
        val out = new java.io.ByteArrayOutputStream()
        out.write(0x78); out.write(0x01)
        out.write(deflated, 0, deflated.length)
        val ad = PngCodec.adler32(raw)
        out.write((ad >>> 24) & 0xff); out.write((ad >>> 16) & 0xff)
        out.write((ad >>> 8) & 0xff); out.write(ad & 0xff)
        out.toByteArray
      }
      PngCodec.zlibInflate(zl, raw.length).toSeq shouldBe raw.toSeq
      // independent decoder: the JDK inflater must accept our stream
      val inf = new java.util.zip.Inflater(true) // raw deflate
      inf.setInput(deflated)
      val buf = new Array[Byte](raw.length + 16)
      val n = inf.inflate(buf)
      n shouldBe raw.length
      buf.take(n).toSeq shouldBe raw.toSeq
      inf.end()
    }
  }

  it should "actually compress the filtered scanline shape" in {
    // Sub-filtered rows of the linear pixel formula are period-3 byte
    // streams — if the LZ77 matcher never fired, this ratio check fails
    val filtered = PngCodec.filteredScanlines(17L, 16, 9)
    val deflated = PngCodec.deflateFixed(filtered)
    deflated.length.toDouble should be < (filtered.length * 0.55)
  }

  "deflateStored" should "round-trip through zlibInflate" in {
    val raw = randomBytes(5, 1234)
    val zl = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(0x78); out.write(0x01)
      val d = PngCodec.deflateStored(raw)
      out.write(d, 0, d.length)
      val ad = PngCodec.adler32(raw)
      out.write((ad >>> 24) & 0xff); out.write((ad >>> 16) & 0xff)
      out.write((ad >>> 8) & 0xff); out.write(ad & 0xff)
      out.toByteArray
    }
    PngCodec.zlibInflate(zl, raw.length).toSeq shouldBe raw.toSeq
  }

  it should "emit a single empty final block on empty input" in {
    // unreachable from encodePng (filtered scanlines are never empty) but
    // the helper documents this case — r12 advice: the old loop guard
    // never terminated on empty input
    val d = PngCodec.deflateStored(Array.emptyByteArray)
    d.toSeq shouldBe Seq[Byte](1, 0, 0, 0xff.toByte, 0xff.toByte)
    val inf = new java.util.zip.Inflater(true)
    inf.setInput(d)
    val buf = new Array[Byte](8)
    inf.inflate(buf) shouldBe 0
    inf.finished() shouldBe true
    inf.end()
  }

  "encodePng/decodePng" should "reproduce the pixel contract end-to-end" in {
    // ids hitting every encoder branch: %5==0 stored, %4==0 split IDAT,
    // both, neither; dims sweep the w 4..16 / h 3..9 fixture range
    for (id <- Seq(0L, 4L, 5L, 7L, 12L, 15L, 20L, 33L); nc <- Seq(0L, 17L, 95L, 1000L)) {
      val (w, h, sum, wsum) = PngCodec.decodePng(PngCodec.encodePng(id, nc))
      w shouldBe (4 + nc % 13).toInt
      h shouldBe (3 + nc % 7).toInt
      var eSum = 0L; var eWsum = 0L
      var p = 0L
      while (p < w.toLong * h) {
        val (r, g, b) = Multimodal.pixel(id, p)
        val rgb = r + g + b
        eSum += rgb; eWsum += (p + 1) * rgb
        p += 1
      }
      withClue(s"id=$id nc=$nc") { (sum, wsum) shouldBe ((eSum, eWsum)) }
    }
  }

  it should "reconstruct Average and Paeth filtered rows (decode-only filters)" in {
    // hand-filter a known raster with types 3 and 4, assemble via
    // buildPng, and require the decode to reproduce the raw pixels
    val w = 5; val h = 4; val bpp = 3
    val raw = Array.tabulate(h, w * bpp)((y, i) => ((37 * y + 11 * i + 5) % 256).toByte)
    def px(y: Int, i: Int): Int = raw(y)(i) & 0xff
    val filtered = new Array[Byte](h * (1 + w * bpp))
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    for (y <- 0 until h) {
      val o = y * (1 + w * bpp)
      val ft = if (y % 2 == 0) 3 else 4 // Average / Paeth alternating
      filtered(o) = ft.toByte
      for (i <- 0 until w * bpp) {
        val a = if (i >= bpp) px(y, i - bpp) else 0
        val b = if (y > 0) px(y - 1, i) else 0
        val c = if (i >= bpp && y > 0) px(y - 1, i - bpp) else 0
        val v =
          if (ft == 3) px(y, i) - (a + b) / 2
          else px(y, i) - paeth(a, b, c)
        filtered(o + 1 + i) = (v & 0xff).toByte
      }
    }
    val png = PngCodec.buildPng(w, h, filtered, storedBlock = false, splitIdat = true)
    val (gw, gh, got) = PngCodec.pngPixels(png)
    (gw, gh) shouldBe ((w, h))
    val want = Array.tabulate(w * h)(p =>
      px(p / w, (p % w) * bpp) + px(p / w, (p % w) * bpp + 1) + px(p / w, (p % w) * bpp + 2))
    got.toSeq shouldBe want.toSeq
  }

  it should "fail loudly on corruption and unsupported features" in {
    val good = PngCodec.encodePng(3L, 17L)
    // flip one IDAT payload byte: the chunk CRC must catch it
    val bad = good.clone()
    bad(50) = (bad(50) ^ 0x40).toByte
    an[IllegalArgumentException] should be thrownBy PngCodec.decodePng(bad)
    // truncate: header walk must refuse
    an[IllegalArgumentException] should be thrownBy
      PngCodec.decodePng(good.take(30))
    // not a PNG at all
    an[IllegalArgumentException] should be thrownBy
      PngCodec.decodePng("BMnotapng".getBytes("US-ASCII"))
  }

  private def jdkZlib(raw: Array[Byte], level: Int): Array[Byte] = {
    val d = new java.util.zip.Deflater(level, false)
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length * 2 + 64)
    val n = d.deflate(buf)
    d.end()
    buf.take(n)
  }

  "dynamic-Huffman inflate" should "decode real JDK Deflater streams" in {
    // the JDK picks DYNAMIC blocks for compressible multi-KB inputs —
    // arbitrary trees, 17/18 zero-run codes, everything our own encoder
    // never emits; decoding them proves the full RFC 1951 header path
    val texts = Seq(
      ("the quick brown fox jumps over the lazy dog; " * 150).getBytes("US-ASCII"),
      PngCodec.filteredScanlines(99L, 16, 9) ++ randomBytes(4000, 7),
      Array.tabulate(6000)(i => ((i * i + i / 3) % 251).toByte))
    texts.foreach { raw =>
      PngCodec.zlibInflate(jdkZlib(raw, 9), raw.length).toSeq shouldBe raw.toSeq
      PngCodec.zlibInflate(jdkZlib(raw, 6), raw.length).toSeq shouldBe raw.toSeq
    }
  }

  it should "round-trip our own dynamic blocks and satisfy the JDK inflater" in {
    val cases = Seq(
      PngCodec.filteredScanlines(3L, 12, 8),
      randomBytes(300, 42),
      ("ababab" * 200).getBytes("US-ASCII"))
    cases.foreach { raw =>
      val deflated = PngCodec.deflateDynamic(raw)
      // BTYPE of the first block must really be 10 (dynamic)
      ((deflated(0) >> 1) & 3) shouldBe 2
      val zl = {
        val out = new java.io.ByteArrayOutputStream()
        out.write(0x78); out.write(0x01)
        out.write(deflated, 0, deflated.length)
        val ad = PngCodec.adler32(raw)
        out.write((ad >>> 24) & 0xff); out.write((ad >>> 16) & 0xff)
        out.write((ad >>> 8) & 0xff); out.write(ad & 0xff)
        out.toByteArray
      }
      PngCodec.zlibInflate(zl, raw.length).toSeq shouldBe raw.toSeq
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(deflated)
      val buf = new Array[Byte](raw.length + 16)
      val n = inf.inflate(buf)
      n shouldBe raw.length
      buf.take(n).toSeq shouldBe raw.toSeq
      inf.end()
    }
  }

  it should "decode a dynamic-block PNG end-to-end" in {
    val filtered = PngCodec.filteredScanlines(6L, 10, 7)
    val png = PngCodec.buildPng(10, 7, filtered,
      storedBlock = false, splitIdat = false, dynamicBlock = true)
    val (w, h, px) = PngCodec.pngPixels(png)
    (w, h) shouldBe (10, 7)
    px.indices.foreach { p =>
      val (r, g, b) = Multimodal.pixel(6L, p.toLong)
      px(p) shouldBe r + g + b
    }
  }
}
