package graft.ops

/** Minimal-but-REAL GIF87a codec — the SECOND entropy coder of the
  * multimodal pillar, and a structurally different one: where
  * [[PngCodec]] proves bit-level Huffman + LZ77 window copies, this
  * proves DICTIONARY-based variable-width LZW (GIF's flavor: growing
  * code widths 9→12 bits LSB-first, clear/EOI control codes, the
  * KwKwK self-referential case) plus the GIF container walk
  * (logical screen descriptor, global color table, sub-block framing).
  * Everything from the public GIF87a specification; nothing delegates
  * to an existing image library.
  *
  * Fixture contract (the oracle's whole knowledge): image dims are the
  * shared media formulas w = 4 + n_chars%13, h = 3 + n_chars%7; pixel
  * p (raster order) carries palette INDEX c = (13·id + 17·p + 7) % 256,
  * and palette entry c is r=(11c+3)%256, g=(7c+29)%256, b=(5c+17)%256.
  * The decoder recovers r+g+b THROUGH the parsed color table, so a
  * mis-read palette (or an index stream one LZW code off) cannot
  * hash-match. The encoder inserts a mid-stream CLEAR code every 100
  * symbols (legal per spec, and otherwise never exercised at fixture
  * image sizes — dictionaries only fill at 4096 codes) and splits the
  * code bytes into ≤ 255-byte sub-blocks as the format requires.
  */
object GifCodec {

  private[ops] def palIndex(id: Long, p: Long): Int =
    ((13 * id + 17 * p + 7) % 256).toInt

  private[ops] def palRgbSum(c: Int): Int =
    (11 * c + 3) % 256 + (7 * c + 29) % 256 + (5 * c + 17) % 256

  // ---- LZW (GIF variant, LSB-first bit packing) ----------------------

  /** Encode 8-bit symbols as a GIF LZW code stream (min code size 8).
    * `clearEvery` > 0 inserts periodic CLEAR codes (dictionary resets)
    * so small images still exercise the reset path.
    */
  private[ops] def lzwEncode(data: Array[Byte], clearEvery: Int): Array[Byte] = {
    val minCode = 8
    val clear = 1 << minCode // 256
    val eoi = clear + 1 // 257
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0
    var nBits = 0
    var width = minCode + 1
    def emit(code: Int): Unit = {
      acc |= code << nBits
      nBits += width
      while (nBits >= 8) { out.write(acc & 0xff); acc >>>= 8; nBits -= 8 }
    }
    var dict = scala.collection.mutable.HashMap[List[Byte], Int]()
    var nextCode = eoi + 1
    def reset(): Unit = {
      dict = scala.collection.mutable.HashMap[List[Byte], Int]()
      nextCode = eoi + 1
      width = minCode + 1
    }
    emit(clear)
    reset()
    var cur: List[Byte] = Nil
    var emitted = 0
    var i = 0
    while (i < data.length) {
      val k = data(i)
      val ext = k :: cur // reversed-prefix key: cheap cons, stable equality
      if (ext.length == 1 || dict.contains(ext)) cur = ext
      else {
        val code = if (cur.length == 1) cur.head & 0xff else dict(cur)
        emit(code)
        emitted += 1
        // assign only while a 12-bit code remains assignable — mirrors the
        // decoder's `nextCode < 4096` guard, so code 4096 (unemittable at
        // the 12-bit cap) is never even transiently present in the dict
        val full = nextCode == 4096
        if (!full) {
          dict(ext) = nextCode
          nextCode += 1
          // width grows when the NEXT code to assign no longer fits
          if (nextCode == (1 << width) + 1 && width < 12) width += 1
        }
        cur = List(k)
        if (full || (clearEvery > 0 && emitted % clearEvery == 0)) {
          emit(clear); reset()
          // restart the phrase after a reset: cur stays the single symbol
        }
      }
      i += 1
    }
    if (cur.nonEmpty)
      emit(if (cur.length == 1) cur.head & 0xff else dict(cur))
    emit(eoi)
    if (nBits > 0) out.write(acc & 0xff)
    out.toByteArray
  }

  /** Decode a GIF LZW code stream back to symbols; `expected` bounds
    * (and is checked against) the output length.
    */
  private[ops] def lzwDecode(bytes: Array[Byte], expected: Int): Array[Byte] = {
    val minCode = 8
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream(expected)
    var pos = 0
    var acc = 0
    var nBits = 0
    var width = minCode + 1
    def read(): Int = {
      while (nBits < width) {
        require(pos < bytes.length, "LZW stream truncated")
        acc |= (bytes(pos) & 0xff) << nBits
        pos += 1; nBits += 8
      }
      val v = acc & ((1 << width) - 1)
      acc >>>= width; nBits -= width
      v
    }
    // dict: code -> byte string (codes < 256 implicit)
    var entries = new Array[Array[Byte]](4096)
    var nextCode = eoi + 1
    def reset(): Unit = {
      entries = new Array[Array[Byte]](4096)
      nextCode = eoi + 1
      width = minCode + 1
    }
    def str(code: Int): Array[Byte] =
      if (code < clear) Array(code.toByte)
      else {
        require(code < nextCode && entries(code) != null, s"LZW code $code not in dictionary")
        entries(code)
      }
    var prev: Array[Byte] = null
    var done = false
    while (!done) {
      val code = read()
      if (code == clear) { reset(); prev = null }
      else if (code == eoi) done = true
      else {
        val cur =
          if (code < clear || (code < nextCode && entries(code) != null)) str(code)
          else {
            // KwKwK: the only legal not-yet-defined code is nextCode itself
            require(code == nextCode && prev != null, s"LZW code $code out of sequence")
            prev :+ prev(0)
          }
        out.write(cur, 0, cur.length)
        if (prev != null && nextCode < 4096) {
          entries(nextCode) = prev :+ cur(0)
          nextCode += 1
          // the decoder's dictionary LAGS the encoder by one entry, so
          // it must widen one code earlier than the encoder's
          // 2^width + 1 rule — the classic LZW off-by-one
          if (nextCode == (1 << width) && width < 12) width += 1
        }
        prev = cur
      }
      require(out.size() <= expected, "LZW produced more symbols than the image holds")
    }
    require(out.size() == expected,
      s"LZW produced ${out.size()} symbols, expected $expected")
    out.toByteArray
  }

  // ---- GIF container --------------------------------------------------

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** Render a genuine GIF87a for a document. */
  private[ops] def encodeGif(id: Long, nChars: Long): Array[Byte] = {
    val w = (4 + nChars % 13).toInt
    val h = (3 + nChars % 7).toInt
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF87a".getBytes("US-ASCII"), 0, 6)
    out.write(le16(w), 0, 2); out.write(le16(h), 0, 2)
    out.write(0xf7) // global color table, 8-bit color resolution, 256 entries
    out.write(0) // background color index
    out.write(0) // aspect
    var c = 0
    while (c < 256) {
      out.write((11 * c + 3) % 256); out.write((7 * c + 29) % 256)
      out.write((5 * c + 17) % 256)
      c += 1
    }
    out.write(0x2c) // image descriptor
    out.write(le16(0), 0, 2); out.write(le16(0), 0, 2)
    out.write(le16(w), 0, 2); out.write(le16(h), 0, 2)
    out.write(0) // no local color table, not interlaced
    val idx = Array.tabulate(w * h)(p => palIndex(id, p).toByte)
    out.write(8) // LZW minimum code size
    val lzw = lzwEncode(idx, clearEvery = 100)
    var off = 0
    while (off < lzw.length) { // <=255-byte sub-blocks
      val n = math.min(255, lzw.length - off)
      out.write(n)
      out.write(lzw, off, n)
      off += n
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Parse + decode a GIF87a: returns (w, h, per-pixel r+g+b via the
    * PARSED global color table, raster order). Validates the header,
    * screen/image descriptors, sub-block framing and the LZW stream
    * end-to-end; throws on interlace, local color tables, or any
    * structure outside the documented subset.
    */
  private[ops] def gifPixels(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(bytes.length > 13 + 768 + 11 &&
      new String(bytes, 0, 6, "US-ASCII") == "GIF87a", "not a GIF87a")
    def rle16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    val packed = bytes(10) & 0xff
    require((packed & 0x80) != 0, "decoder requires a global color table")
    val gctSize = 2 << (packed & 0x07)
    require(gctSize == 256, "fixture contract: 256-entry color table")
    val pal = new Array[Int](gctSize) // r+g+b per entry
    var c = 0
    while (c < gctSize) {
      val o = 13 + 3 * c
      pal(c) = (bytes(o) & 0xff) + (bytes(o + 1) & 0xff) + (bytes(o + 2) & 0xff)
      c += 1
    }
    var off = 13 + 3 * gctSize
    require((bytes(off) & 0xff) == 0x2c, "expected image descriptor")
    val w = rle16(off + 5); val h = rle16(off + 7)
    require((bytes(off + 9) & 0xc0) == 0, "local color table/interlace unsupported")
    off += 10
    require((bytes(off) & 0xff) == 8, "LZW minimum code size must be 8")
    off += 1
    val lzw = new java.io.ByteArrayOutputStream()
    var blockLen = bytes(off) & 0xff
    while (blockLen != 0) { // sub-block walk
      require(off + 1 + blockLen < bytes.length, "sub-block out of bounds")
      lzw.write(bytes, off + 1, blockLen)
      off += 1 + blockLen
      blockLen = bytes(off) & 0xff
    }
    require((bytes(off + 1) & 0xff) == 0x3b, "missing GIF trailer")
    val idx = lzwDecode(lzw.toByteArray, w * h)
    (w, h, idx.map(b => pal(b & 0xff)))
  }

  private[ops] def decodeGif(bytes: Array[Byte]): (Int, Int, Long, Long) = {
    val (w, h, px) = gifPixels(bytes)
    var sum = 0L; var wsum = 0L
    var p = 0
    while (p < px.length) {
      sum += px(p); wsum += (p + 1).toLong * px(p)
      p += 1
    }
    (w, h, sum, wsum)
  }
}
