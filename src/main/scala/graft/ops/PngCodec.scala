package graft.ops

/** Minimal-but-REAL PNG codec (RFC 2083 container + RFC 1950 zlib +
  * RFC 1951 deflate restricted to STORED and FIXED-HUFFMAN blocks) —
  * the entropy-coded step the r11 multimodal work left open: the
  * BMP/WAV codecs proved the container walk, this proves a genuine
  * entropy decode (bit-level Huffman, LZ77 back-references, filter
  * reconstruction) in the same hash-checked style.
  *
  * Everything is implemented from the public specs — including CRC-32
  * (ISO 3309 reflected polynomial) and Adler-32, which the spec
  * cross-checks against `java.util.zip` — and nothing delegates to
  * `java.util.zip.Inflater/Deflater`: the decoder's Huffman ranges,
  * window copies and filter reconstructions are the code under test.
  *
  * Encoder (fixture generator, [[encodePng]]):
  *  - 8-bit truecolor (color type 2), scanline filters cycling
  *    None/Sub/Up by row — Sub turns the linear pixel formula into a
  *    3-byte-period stream, so the LZ77 matcher finds real multi-hundred
  *    -byte back-references (the compressed IDAT is ~10x smaller than
  *    raw; the spec asserts it), and Up exercises the second
  *    reconstruction rule.
  *  - every 5th document compresses with a STORED block instead, and
  *    every 4th splits its zlib stream across TWO IDAT chunks —
  *    decoders must treat consecutive IDATs as one stream (PNG §10.3).
  *  - deflate: greedy longest-match LZ77 (min 3 / max 258, full-buffer
  *    window, closest distance on ties — deterministic), fixed Huffman
  *    codes emitted MSB-first over the LSB-first bit stream per
  *    RFC 1951 §3.1.1.
  *
  * Decoder ([[decodePng]]): signature check, chunk walk with CRC-32
  * verification on EVERY chunk, IHDR validation, multi-IDAT
  * concatenation, zlib header + Adler-32 verification, stored and
  * fixed-Huffman inflate (the canonical fixed-tree ranges decoded
  * bit-by-bit — 7-bit 256..279, 8-bit 0..143 / 280..287, 9-bit
  * 144..255), overlap-correct window copies, and filter reconstruction
  * for ALL five filter types (encoder emits three; Average/Paeth are
  * unit-tested). Dynamic-Huffman blocks (BTYPE=10) throw by contract —
  * the documented subset, loudly refused.
  */
object PngCodec {

  // ---- checksums (from the public polynomials; spec cross-checks jdk) --

  private val crcTable: Array[Int] = Array.tabulate(256) { n =>
    var c = n
    var k = 0
    while (k < 8) {
      c = if ((c & 1) != 0) 0xedb88320 ^ (c >>> 1) else c >>> 1
      k += 1
    }
    c
  }

  private[ops] def crc32(bytes: Array[Byte], off: Int, len: Int): Int = {
    var c = 0xffffffff
    var i = off
    while (i < off + len) {
      c = crcTable((c ^ bytes(i)) & 0xff) ^ (c >>> 8)
      i += 1
    }
    c ^ 0xffffffff
  }

  private[ops] def adler32(bytes: Array[Byte]): Int = {
    var a = 1; var b = 0
    var i = 0
    while (i < bytes.length) {
      a = (a + (bytes(i) & 0xff)) % 65521
      b = (b + a) % 65521
      i += 1
    }
    (b << 16) | a
  }

  // ---- deflate bit I/O (RFC 1951 §3.1.1) ------------------------------

  /** LSB-first bit accumulator; Huffman codes enter MSB-of-code-first. */
  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nBits = 0
    def writeBits(v: Int, n: Int): Unit = { // fixed-width fields & extras
      acc |= (v & ((1 << n) - 1)) << nBits
      nBits += n
      while (nBits >= 8) { buf.write(acc & 0xff); acc >>>= 8; nBits -= 8 }
    }
    def writeCode(code: Int, n: Int): Unit = { // Huffman: MSB of code first
      var i = n - 1
      while (i >= 0) { writeBits((code >>> i) & 1, 1); i -= 1 }
    }
    def alignByte(): Unit = if (nBits > 0) { buf.write(acc & 0xff); acc = 0; nBits = 0 }
    def toBytes: Array[Byte] = { alignByte(); buf.toByteArray }
  }

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    def readBits(n: Int): Int = {
      while (nBits < n) {
        require(pos < bytes.length, "deflate stream truncated")
        acc |= (bytes(pos) & 0xff) << nBits
        pos += 1; nBits += 8
      }
      val v = acc & ((1 << n) - 1)
      acc >>>= n; nBits -= n
      v
    }
    /** One Huffman code bit (codes accumulate MSB-first). */
    def readCodeBit(): Int = readBits(1)
    def alignByte(): Unit = { acc = 0; nBits = 0 }
  }

  // ---- fixed-Huffman tables (RFC 1951 §3.2.5-3.2.6) -------------------

  // length codes 257..285: (base, extra bits)
  private val lenBase =
    Array(3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31, 35, 43,
      51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258)
  private val lenExtra =
    Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4,
      4, 4, 5, 5, 5, 5, 0)
  // distance codes 0..29
  private val distBase =
    Array(1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193, 257,
      385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145, 8193, 12289, 16385,
      24577)
  private val distExtra =
    Array(0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9,
      10, 10, 11, 11, 12, 12, 13, 13)

  /** Fixed lit/len code for a symbol: (code value, bit length). */
  private def fixedLitCode(sym: Int): (Int, Int) =
    if (sym <= 143) (0x30 + sym, 8) // 00110000..10111111
    else if (sym <= 255) (0x190 + (sym - 144), 9) // 110010000..111111111
    else if (sym <= 279) (sym - 256, 7) // 0000000..0010111
    else (0xc0 + (sym - 280), 8) // 11000000..11000111

  // ---- deflate (fixed-Huffman, greedy LZ77) ---------------------------

  private[ops] def deflateFixed(data: Array[Byte]): Array[Byte] = {
    val bw = new BitWriter
    bw.writeBits(1, 1) // BFINAL
    bw.writeBits(1, 2) // BTYPE=01 fixed Huffman
    var i = 0
    while (i < data.length) {
      // greedy longest match, closest distance on ties — deterministic
      var bestLen = 0
      var bestDist = 0
      val maxLen = math.min(258, data.length - i)
      if (maxLen >= 3) {
        var j = math.max(0, i - 32768)
        while (j < i) {
          var l = 0
          while (l < maxLen && data(j + (l % (i - j))) == data(i + l)) l += 1
          if (l >= 3 && (l > bestLen || (l == bestLen && i - j < bestDist))) {
            bestLen = l; bestDist = i - j
          }
          j += 1
        }
      }
      if (bestLen >= 3) {
        // largest code whose base <= len; 258 lands on code 285 directly
        val lc = {
          var c = lenBase.length - 1
          while (lenBase(c) > bestLen) c -= 1
          c
        }
        val (code, n) = fixedLitCode(257 + lc)
        bw.writeCode(code, n)
        bw.writeBits(bestLen - lenBase(lc), lenExtra(lc))
        val dc = {
          var c = distBase.length - 1
          while (distBase(c) > bestDist) c -= 1
          c
        }
        bw.writeCode(dc, 5)
        bw.writeBits(bestDist - distBase(dc), distExtra(dc))
        i += bestLen
      } else {
        val (code, n) = fixedLitCode(data(i) & 0xff)
        bw.writeCode(code, n)
        i += 1
      }
    }
    val (eob, eobN) = fixedLitCode(256)
    bw.writeCode(eob, eobN)
    bw.toBytes
  }

  private[ops] def deflateStored(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var off = 0
    while (off < data.length || data.isEmpty) {
      val n = math.min(65535, data.length - off)
      val fin = if (off + n >= data.length) 1 else 0
      out.write(fin) // BFINAL in bit 0, BTYPE=00 — byte-aligned by design
      out.write(n & 0xff); out.write((n >> 8) & 0xff)
      out.write(~n & 0xff); out.write((~n >> 8) & 0xff)
      out.write(data, off, n)
      off += n
      if (data.isEmpty) off = 1 // single empty stored block
    }
    out.toByteArray
  }

  private def zlibWrap(deflated: Array[Byte], raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x78); out.write(0x01) // CMF deflate/32k, FCHECK, no dict
    out.write(deflated, 0, deflated.length)
    val ad = adler32(raw)
    out.write((ad >>> 24) & 0xff); out.write((ad >>> 16) & 0xff)
    out.write((ad >>> 8) & 0xff); out.write(ad & 0xff)
    out.toByteArray
  }

  // ---- inflate (stored + fixed-Huffman subset) ------------------------

  /** Decode one fixed-tree lit/len symbol via the canonical ranges. */
  private def readFixedLitSym(br: BitReader): Int = {
    var code = 0
    var i = 0
    while (i < 7) { code = (code << 1) | br.readCodeBit(); i += 1 }
    if (code <= 0x17) return 256 + code // 7-bit: 256..279
    code = (code << 1) | br.readCodeBit()
    if (code >= 0x30 && code <= 0xbf) return code - 0x30 // 8-bit: 0..143
    if (code >= 0xc0 && code <= 0xc7) return 280 + (code - 0xc0) // 8-bit
    code = (code << 1) | br.readCodeBit()
    require(code >= 0x190 && code <= 0x1ff, s"bad fixed-Huffman code $code")
    144 + (code - 0x190) // 9-bit: 144..255
  }

  /** Inflate a zlib stream (header + deflate + Adler-32). Supports
    * stored and fixed-Huffman blocks; dynamic blocks throw (subset
    * contract). `expectedLen` bounds the output buffer.
    */
  private[ops] def zlibInflate(bytes: Array[Byte], expectedLen: Int): Array[Byte] = {
    require(bytes.length >= 6, "zlib stream truncated")
    val cmf = bytes(0) & 0xff
    val flg = bytes(1) & 0xff
    require((cmf & 0x0f) == 8, "zlib: not deflate")
    require((cmf * 256 + flg) % 31 == 0, "zlib: bad FCHECK")
    require((flg & 0x20) == 0, "zlib: preset dictionary unsupported")
    val out = new Array[Byte](expectedLen)
    var w = 0
    val br = new BitReader(bytes, 2)
    var fin = false
    while (!fin) {
      fin = br.readBits(1) == 1
      br.readBits(2) match {
        case 0 => // stored
          br.alignByte()
          val p = br.pos
          require(p + 4 <= bytes.length, "stored block truncated")
          val len = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
          val nlen = (bytes(p + 2) & 0xff) | ((bytes(p + 3) & 0xff) << 8)
          require((len ^ nlen) == 0xffff, "stored block LEN/NLEN mismatch")
          require(w + len <= expectedLen, "inflate output overflow")
          System.arraycopy(bytes, p + 4, out, w, len)
          w += len
          br.pos = p + 4 + len
        case 1 => // fixed Huffman
          var eob = false
          while (!eob) {
            val sym = readFixedLitSym(br)
            if (sym == 256) eob = true
            else if (sym < 256) {
              require(w < expectedLen, "inflate output overflow")
              out(w) = sym.toByte; w += 1
            } else {
              val lc = sym - 257
              require(lc < lenBase.length, s"bad length code $sym")
              val len = lenBase(lc) + br.readBits(lenExtra(lc))
              var dc = 0
              var i = 0
              while (i < 5) { dc = (dc << 1) | br.readCodeBit(); i += 1 }
              require(dc < distBase.length, s"bad distance code $dc")
              val dist = distBase(dc) + br.readBits(distExtra(dc))
              require(dist <= w, "distance beyond window start")
              require(w + len <= expectedLen, "inflate output overflow")
              var k = 0
              while (k < len) { out(w) = out(w - dist); w += 1; k += 1 } // overlap-safe
            }
          }
        case 2 => throw new IllegalArgumentException(
          "dynamic-Huffman deflate block: outside this decoder's documented subset")
        case b => throw new IllegalArgumentException(s"reserved deflate block type $b")
      }
    }
    require(w == expectedLen, s"inflate produced $w bytes, expected $expectedLen")
    val adPos = br.pos
    require(adPos + 4 <= bytes.length, "zlib: missing Adler-32")
    val ad = ((bytes(adPos) & 0xff) << 24) | ((bytes(adPos + 1) & 0xff) << 16) |
      ((bytes(adPos + 2) & 0xff) << 8) | (bytes(adPos + 3) & 0xff)
    require(ad == adler32(out), "zlib: Adler-32 mismatch")
    out
  }

  // ---- PNG container --------------------------------------------------

  private val signature =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  private def be32(v: Int): Array[Byte] =
    Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def chunk(out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    out.write(be32(data.length), 0, 4)
    val td = typ.getBytes("US-ASCII") ++ data
    out.write(td, 0, td.length)
    out.write(be32(crc32(td, 0, td.length)), 0, 4)
  }

  /** Filtered scanline stream for the [[Multimodal.pixel]] contract:
    * filter type cycles None/Sub/Up by row (y % 3).
    */
  private[ops] def filteredScanlines(id: Long, w: Int, h: Int): Array[Byte] = {
    val bpp = 3
    val raw = Array.ofDim[Byte](h, w * bpp)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = Multimodal.pixel(id, y.toLong * w + x)
        raw(y)(x * bpp) = r.toByte; raw(y)(x * bpp + 1) = g.toByte
        raw(y)(x * bpp + 2) = b.toByte
        x += 1
      }
      y += 1
    }
    val out = new Array[Byte](h * (1 + w * bpp))
    y = 0
    while (y < h) {
      val o = y * (1 + w * bpp)
      val ft = y % 3
      out(o) = ft.toByte
      var i = 0
      while (i < w * bpp) {
        val cur = raw(y)(i) & 0xff
        val v = ft match {
          case 0 => cur
          case 1 => cur - (if (i >= bpp) raw(y)(i - bpp) & 0xff else 0) // Sub
          case 2 => cur - (if (y > 0) raw(y - 1)(i) & 0xff else 0) // Up
        }
        out(o + 1 + i) = (v & 0xff).toByte
        i += 1
      }
      y += 1
    }
    out
  }

  /** Render a genuine PNG for a document (dims from the shared media
    * contract: w = 4 + n_chars%13, h = 3 + n_chars%7). Every 5th doc
    * uses a stored zlib block; every 4th splits the stream over two
    * IDAT chunks.
    */
  private[ops] def encodePng(id: Long, nChars: Long): Array[Byte] = {
    val w = (4 + nChars % 13).toInt
    val h = (3 + nChars % 7).toInt
    buildPng(w, h, filteredScanlines(id, w, h),
      storedBlock = id % 5 == 0, splitIdat = id % 4 == 0)
  }

  /** Assemble a PNG container around an already-filtered scanline
    * stream (also the spec's entry for Average/Paeth-filtered inputs
    * the fixture encoder never emits).
    */
  private[ops] def buildPng(w: Int, h: Int, filtered: Array[Byte],
      storedBlock: Boolean, splitIdat: Boolean): Array[Byte] = {
    val z = zlibWrap(
      if (storedBlock) deflateStored(filtered) else deflateFixed(filtered),
      filtered)
    val out = new java.io.ByteArrayOutputStream()
    out.write(signature, 0, signature.length)
    chunk(out, "IHDR",
      be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0)) // 8-bit truecolor
    if (splitIdat && z.length > 8) { // multi-IDAT: one stream, two chunks
      val cut = z.length / 2
      chunk(out, "IDAT", z.take(cut))
      chunk(out, "IDAT", z.drop(cut))
    } else chunk(out, "IDAT", z)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Parse + fully decode a PNG: returns (w, h, per-pixel r+g+b in
    * raster order). Validates the signature, every chunk CRC, the IHDR
    * contract (8-bit truecolor, no interlace), the zlib/Adler framing,
    * and reconstructs all five scanline filters.
    */
  private[ops] def pngPixels(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(bytes.length >= 8 + 25 + 12 &&
      signature.indices.forall(i => bytes(i) == signature(i)),
      "not a PNG: bad signature")
    def rbe32(off: Int): Int =
      ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
        ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
    var off = 8
    var w = -1; var h = -1
    val idat = new java.io.ByteArrayOutputStream()
    var ended = false
    while (!ended) {
      require(off + 8 <= bytes.length, "PNG chunk header out of bounds")
      val len = rbe32(off)
      val typ = new String(bytes, off + 4, 4, "US-ASCII")
      require(off + 8 + len + 4 <= bytes.length, s"PNG chunk $typ out of bounds")
      require(rbe32(off + 8 + len) == crc32(bytes, off + 4, 4 + len),
        s"PNG chunk $typ CRC mismatch")
      typ match {
        case "IHDR" =>
          w = rbe32(off + 8); h = rbe32(off + 12)
          require(bytes(off + 16) == 8 && bytes(off + 17) == 2,
            "decoder handles 8-bit truecolor PNG")
          require(bytes(off + 18) == 0 && bytes(off + 19) == 0 && bytes(off + 20) == 0,
            "compression/filter/interlace method must be 0")
        case "IDAT" => idat.write(bytes, off + 8, len)
        case "IEND" => ended = true
        case _ => () // ancillary chunk: CRC checked above, content skipped
      }
      off += 12 + len
    }
    require(w > 0 && h > 0, "PNG missing IHDR")
    val bpp = 3
    val stride = 1 + w * bpp
    val filtered = zlibInflate(idat.toByteArray, h * stride)
    // reconstruct filters (PNG §6): output rows in place, top to bottom
    val recon = Array.ofDim[Byte](h, w * bpp)
    var y = 0
    while (y < h) {
      val ft = filtered(y * stride) & 0xff
      var i = 0
      while (i < w * bpp) {
        val x = filtered(y * stride + 1 + i) & 0xff
        val a = if (i >= bpp) recon(y)(i - bpp) & 0xff else 0
        val b = if (y > 0) recon(y - 1)(i) & 0xff else 0
        val c = if (i >= bpp && y > 0) recon(y - 1)(i - bpp) & 0xff else 0
        val v = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 => x + paeth(a, b, c)
          case other => throw new IllegalArgumentException(s"bad PNG filter $other")
        }
        recon(y)(i) = (v & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val px = new Array[Int](w * h)
    y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        px(y * w + x) = (recon(y)(x * bpp) & 0xff) +
          (recon(y)(x * bpp + 1) & 0xff) + (recon(y)(x * bpp + 2) & 0xff)
        x += 1
      }
      y += 1
    }
    (w, h, px)
  }

  /** Decode to the feature contract: (w, h, pix_sum, pix_wsum). */
  private[ops] def decodePng(bytes: Array[Byte]): (Int, Int, Long, Long) = {
    val (w, h, px) = pngPixels(bytes)
    var sum = 0L; var wsum = 0L
    var p = 0
    while (p < px.length) {
      sum += px(p); wsum += (p + 1).toLong * px(p)
      p += 1
    }
    (w, h, sum, wsum)
  }
}
