package graft.ops

/** Minimal-but-REAL PNG codec (RFC 2083 container + RFC 1950 zlib +
  * the COMPLETE RFC 1951 deflate surface: STORED, FIXED-HUFFMAN, and
  * DYNAMIC-HUFFMAN blocks) — the entropy-coded step the r11 multimodal
  * work left open: the BMP/WAV codecs proved the container walk, this
  * proves a genuine entropy decode (bit-level Huffman, LZ77
  * back-references, filter reconstruction) in the same hash-checked
  * style. The r12 dynamic path reads transmitted code-length codes
  * (16/17/18 RLE symbols) and builds both canonical trees from the
  * stream — validated against real `java.util.zip.Deflater` output,
  * which emits dynamic blocks by default.
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
  * unit-tested). Dynamic-Huffman blocks (BTYPE=10) decode through
  * [[readDynamicTrees]] — full RFC 1951, no subset carve-out.
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

  // ---- deflate (fixed + dynamic Huffman, greedy LZ77) -----------------

  /** Greedy LZ77 + entropy emit through the given code tables — shared
    * by the fixed and dynamic block writers.
    */
  private def emitLz77(bw: BitWriter, data: Array[Byte],
      litCode: Int => (Int, Int), distCode: Int => (Int, Int)): Unit = {
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
        val (code, n) = litCode(257 + lc)
        bw.writeCode(code, n)
        bw.writeBits(bestLen - lenBase(lc), lenExtra(lc))
        val dc = {
          var c = distBase.length - 1
          while (distBase(c) > bestDist) c -= 1
          c
        }
        val (dcode, dn) = distCode(dc)
        bw.writeCode(dcode, dn)
        bw.writeBits(bestDist - distBase(dc), distExtra(dc))
        i += bestLen
      } else {
        val (code, n) = litCode(data(i) & 0xff)
        bw.writeCode(code, n)
        i += 1
      }
    }
    val (eob, eobN) = litCode(256)
    bw.writeCode(eob, eobN)
  }

  private[ops] def deflateFixed(data: Array[Byte]): Array[Byte] = {
    val bw = new BitWriter
    bw.writeBits(1, 1) // BFINAL
    bw.writeBits(1, 2) // BTYPE=01 fixed Huffman
    emitLz77(bw, data, fixedLitCode, dc => (dc, 5))
    bw.toBytes
  }

  /** RFC 1951 canonical code assignment from a length array:
    * symbol → (code, length), consecutive codes in (length, symbol)
    * order — the encoder-side mirror of [[CanonicalTree]].
    */
  private def canonicalCodes1951(lengths: Array[Int]): Array[(Int, Int)] = {
    val out = new Array[(Int, Int)](lengths.length)
    var code = 0
    var prevLen = 0
    lengths.indices.filter(lengths(_) > 0)
      .sortBy(s => (lengths(s), s))
      .foreach { s =>
        code <<= (lengths(s) - prevLen)
        prevLen = lengths(s)
        out(s) = (code, lengths(s))
        code += 1
      }
    out
  }

  /** One BFINAL dynamic-Huffman block (BTYPE=10): transmits a COMPLETE
    * length set that is deliberately NOT the fixed one. zlib caps the
    * transmitted counts at 286 lits / 30 dists, where the fixed shape
    * is incomplete (Kraft 508/512 and 30/32), so literals 0-1 get
    * promoted to 7 bits and distances 0-1 to 4 bits to close both
    * sums exactly — every canonical code class shifts relative to the
    * fixed table, so a decoder that skips the header and assumes the
    * fixed codes cannot decode the payload. Lengths go out
    * RLE-compressed through a 6-symbol code-length code with
    * repeat-16 runs, then the same greedy LZ77 stream flows through
    * the transmitted trees. zlib-strict throughout
    * (`java.util.zip.Inflater` accepts the stream — spec-verified).
    */
  private[ops] def deflateDynamic(data: Array[Byte]): Array[Byte] = {
    val litLens = Array.tabulate(286)(s =>
      if (s <= 1) 7
      else if (s <= 143) 8 else if (s <= 255) 9 else if (s <= 279) 7 else 8)
    val distLens = Array.tabulate(30)(s => if (s <= 1) 4 else 5)
    val bw = new BitWriter
    bw.writeBits(1, 1) // BFINAL
    bw.writeBits(2, 2) // BTYPE=10 dynamic
    bw.writeBits(286 - 257, 5) // HLIT
    bw.writeBits(30 - 1, 5) // HDIST
    // code-length code: {8, 16}→2 bits, {4, 5, 7, 9}→3 — complete by Kraft
    val clLens = new Array[Int](19)
    clLens(16) = 2; clLens(8) = 2
    clLens(4) = 3; clLens(5) = 3; clLens(7) = 3; clLens(9) = 3
    bw.writeBits(12 - 4, 4) // HCLEN: permutation prefix through index 11 (sym 4)
    var i = 0
    while (i < 12) { bw.writeBits(clLens(clPerm(i)), 3); i += 1 }
    val clCodes = canonicalCodes1951(clLens)
    // RLE each length array: value once, runs continue as 16-repeats
    // (chunks of 3..6, never leaving a 1-2 tail)
    def emitLens(lens: Array[Int]): Unit = {
      var i = 0
      while (i < lens.length) {
        val v = lens(i)
        var run = 1
        while (i + run < lens.length && lens(i + run) == v) run += 1
        val (c, n) = clCodes(v)
        bw.writeCode(c, n)
        var rem = run - 1
        while (rem >= 3) {
          val take0 = math.min(6, rem)
          val take = if (rem - take0 == 1) take0 - 2
            else if (rem - take0 == 2) take0 - 1 else take0
          val (rc, rn) = clCodes(16)
          bw.writeCode(rc, rn)
          bw.writeBits(take - 3, 2)
          rem -= take
        }
        while (rem > 0) { bw.writeCode(c, n); rem -= 1 }
        i += run
      }
    }
    emitLens(litLens)
    emitLens(distLens)
    val litCodes = canonicalCodes1951(litLens)
    val distCodes = canonicalCodes1951(distLens)
    emitLz77(bw, data, litCodes(_), distCodes(_))
    bw.toBytes
  }

  private[ops] def deflateStored(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    if (data.isEmpty) {
      // single empty final stored block: BFINAL=1, LEN=0, NLEN=0xffff
      out.write(1); out.write(0); out.write(0); out.write(0xff); out.write(0xff)
      return out.toByteArray
    }
    var off = 0
    while (off < data.length) {
      val n = math.min(65535, data.length - off)
      val fin = if (off + n >= data.length) 1 else 0
      out.write(fin) // BFINAL in bit 0, BTYPE=00 — byte-aligned by design
      out.write(n & 0xff); out.write((n >> 8) & 0xff)
      out.write(~n & 0xff); out.write((~n >> 8) & 0xff)
      out.write(data, off, n)
      off += n
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

  // ---- inflate (stored + fixed + dynamic Huffman: full RFC 1951) ------

  /** Canonical Huffman decoder from a code-length array (RFC 1951
    * §3.2.2): codes assigned in (length, symbol) order, read
    * MSB-of-code-first. The MINCODE/MAXCODE/VALPTR walk caps at the
    * deflate maximum of 15 bits.
    */
  private[ops] final class CanonicalTree(lengths: Array[Int]) {
    private val maxLen = 15
    private val minCode = new Array[Int](maxLen + 1)
    private val maxCode = Array.fill(maxLen + 1)(-1)
    private val valPtr = new Array[Int](maxLen + 1)
    private val vals: Array[Int] = {
      val order = (0 until lengths.length)
        .filter(lengths(_) > 0).sortBy(s => (lengths(s), s)).toArray
      var code = 0
      var k = 0
      for (len <- 1 to maxLen) {
        val n = order.count(lengths(_) == len)
        if (n > 0) {
          valPtr(len) = k
          minCode(len) = code
          code += n; k += n
          maxCode(len) = code - 1
        }
        code <<= 1
      }
      order
    }
    def decode(br: BitReader): Int = {
      var code = br.readCodeBit()
      var len = 1
      while (code > maxCode(len)) {
        require(len < maxLen, "huffman code overruns 15 bits")
        code = (code << 1) | br.readCodeBit()
        len += 1
      }
      vals(valPtr(len) + code - minCode(len))
    }
  }

  // fixed trees expressed as canonical code lengths (RFC 1951 §3.2.6):
  // the spec's fixed code VALUES are exactly the canonical assignment
  private val fixedLitTree = new CanonicalTree(
    Array.tabulate(288)(s =>
      if (s <= 143) 8 else if (s <= 255) 9 else if (s <= 279) 7 else 8))
  private val fixedDistTree = new CanonicalTree(Array.fill(32)(5))

  // code-length-code transmission order (RFC 1951 §3.2.7)
  private val clPerm =
    Array(16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15)

  /** Read the dynamic-block header: CL tree → RLE'd lit/dist lengths
    * (symbols 16/17/18 = repeat-prev / zero-run / long-zero-run) →
    * the two canonical trees.
    */
  private def readDynamicTrees(br: BitReader): (CanonicalTree, CanonicalTree) = {
    val hlit = br.readBits(5) + 257
    val hdist = br.readBits(5) + 1
    val hclen = br.readBits(4) + 4
    val clLens = new Array[Int](19)
    var i = 0
    while (i < hclen) { clLens(clPerm(i)) = br.readBits(3); i += 1 }
    val clTree = new CanonicalTree(clLens)
    val lens = new Array[Int](hlit + hdist)
    i = 0
    while (i < lens.length) {
      clTree.decode(br) match {
        case s if s < 16 => lens(i) = s; i += 1
        case 16 =>
          require(i > 0, "repeat code with no previous length")
          val r = 3 + br.readBits(2)
          val v = lens(i - 1)
          var k = 0
          while (k < r) { require(i < lens.length, "length overrun"); lens(i) = v; i += 1; k += 1 }
        case 17 =>
          i += 3 + br.readBits(3) // zeros (array pre-initialized)
        case 18 =>
          i += 11 + br.readBits(7)
        case other => sys.error(s"bad code-length symbol $other")
      }
    }
    require(i == lens.length, "code-length stream overran the header counts")
    (new CanonicalTree(lens.take(hlit)),
      new CanonicalTree(lens.drop(hlit)))
  }

  /** Inflate a zlib stream (header + deflate + Adler-32): stored,
    * fixed-Huffman, AND dynamic-Huffman blocks — the complete RFC 1951
    * surface. `expectedLen` bounds the output buffer.
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
        case bt @ (1 | 2) => // fixed or dynamic Huffman
          val (lit, dst) =
            if (bt == 1) (fixedLitTree, fixedDistTree) else readDynamicTrees(br)
          var eob = false
          while (!eob) {
            val sym = lit.decode(br)
            if (sym == 256) eob = true
            else if (sym < 256) {
              require(w < expectedLen, "inflate output overflow")
              out(w) = sym.toByte; w += 1
            } else {
              val lc = sym - 257
              require(lc < lenBase.length, s"bad length code $sym")
              val len = lenBase(lc) + br.readBits(lenExtra(lc))
              val dc = dst.decode(br)
              require(dc < distBase.length, s"bad distance code $dc")
              val dist = distBase(dc) + br.readBits(distExtra(dc))
              require(dist <= w, "distance beyond window start")
              require(w + len <= expectedLen, "inflate output overflow")
              var k = 0
              while (k < len) { out(w) = out(w - dist); w += 1; k += 1 } // overlap-safe
            }
          }
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
    * uses a stored zlib block; every 3rd (not stored) a
    * DYNAMIC-Huffman block; every 4th splits the stream over two IDAT
    * chunks — all three RFC 1951 block types ship corpus-wide under
    * the hash gate.
    */
  private[ops] def encodePng(id: Long, nChars: Long): Array[Byte] = {
    val w = (4 + nChars % 13).toInt
    val h = (3 + nChars % 7).toInt
    buildPng(w, h, filteredScanlines(id, w, h),
      storedBlock = id % 5 == 0, splitIdat = id % 4 == 0,
      dynamicBlock = id % 3 == 0)
  }

  /** Assemble a PNG container around an already-filtered scanline
    * stream (also the spec's entry for Average/Paeth-filtered inputs
    * the fixture encoder never emits).
    */
  private[ops] def buildPng(w: Int, h: Int, filtered: Array[Byte],
      storedBlock: Boolean, splitIdat: Boolean,
      dynamicBlock: Boolean = false): Array[Byte] = {
    val z = zlibWrap(
      if (storedBlock) deflateStored(filtered)
      else if (dynamicBlock) deflateDynamic(filtered)
      else deflateFixed(filtered),
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
