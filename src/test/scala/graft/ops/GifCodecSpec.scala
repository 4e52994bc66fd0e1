package graft.ops

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** The from-spec GIF87a/LZW implementation. Unlike deflate there is no
  * JDK reference decoder, so the evidence is: exhaustive round-trips
  * through the regimes the fixture images never reach (code widths
  * 9→12, the 4096-entry reset, the KwKwK self-reference), a hand-built
  * code-stream vector decoded without the encoder, and loud-failure
  * checks on malformed containers.
  */
class GifCodecSpec extends AnyFlatSpec with Matchers {

  "lzw round-trip" should "survive width growth to 12 bits and dictionary resets" in {
    val rnd = new scala.util.Random(11)
    // ~40k symbols with enough novelty to assign > 4096 codes: exercises
    // 9->10->11->12 bit widths AND the forced clear at a full dictionary
    val big = Array.fill(40000)(rnd.nextInt(256).toByte)
    GifCodec.lzwDecode(GifCodec.lzwEncode(big, clearEvery = 0), big.length)
      .toSeq shouldBe big.toSeq
    // highly repetitive: long phrases, rapid dictionary growth
    val rep = ("abcabd" * 3000).getBytes("US-ASCII")
    GifCodec.lzwDecode(GifCodec.lzwEncode(rep, clearEvery = 0), rep.length)
      .toSeq shouldBe rep.toSeq
    // periodic clears interleaved with growth
    GifCodec.lzwDecode(GifCodec.lzwEncode(big, clearEvery = 100), big.length)
      .toSeq shouldBe big.toSeq
  }

  it should "handle the KwKwK self-referential case" in {
    // 'aaaa...' forces the decoder to resolve codes not yet in its
    // dictionary on the very next read — the canonical KwKwK stream
    val runs = Array.fill(500)('a'.toByte)
    GifCodec.lzwDecode(GifCodec.lzwEncode(runs, clearEvery = 0), runs.length)
      .toSeq shouldBe runs.toSeq
    val mixed = ("aaaabaaaabaaaab" * 100).getBytes("US-ASCII")
    GifCodec.lzwDecode(GifCodec.lzwEncode(mixed, clearEvery = 0), mixed.length)
      .toSeq shouldBe mixed.toSeq
  }

  it should "decode a hand-assembled code stream (decoder independent of encoder)" in {
    // symbols: 1 2 1 2 1 2 — phrases: emit 1 (define 258=1,2), emit 2
    // (define 259=2,1), emit 258 (define 260=1,2,1), emit 258... no:
    // greedy takes 258 then (1,2,1)? Build the stream BY HAND instead:
    // CLEAR, 1, 2, 258 (=1,2), 260 (KwKwK: 258+first(258)=1,2,1), EOI
    // decodes to 1 2 1 2 1 2 1.
    val codes = Seq(256, 1, 2, 258, 260, 257)
    var acc = 0L
    var nBits = 0
    val out = new java.io.ByteArrayOutputStream()
    codes.foreach { c =>
      acc |= c.toLong << nBits
      nBits += 9
      while (nBits >= 8) { out.write((acc & 0xff).toInt); acc >>>= 8; nBits -= 8 }
    }
    if (nBits > 0) out.write((acc & 0xff).toInt)
    GifCodec.lzwDecode(out.toByteArray, 7).toSeq shouldBe
      Seq[Byte](1, 2, 1, 2, 1, 2, 1)
  }

  "encodeGif/decodeGif" should "reproduce the index->palette contract end-to-end" in {
    for (id <- Seq(0L, 1L, 7L, 12L, 33L, 100L); nc <- Seq(0L, 17L, 95L, 1000L)) {
      val (w, h, sum, wsum) = GifCodec.decodeGif(GifCodec.encodeGif(id, nc))
      w shouldBe (4 + nc % 13).toInt
      h shouldBe (3 + nc % 7).toInt
      var eSum = 0L; var eWsum = 0L
      var p = 0L
      while (p < w.toLong * h) {
        val rgb = GifCodec.palRgbSum(GifCodec.palIndex(id, p))
        eSum += rgb; eWsum += (p + 1) * rgb
        p += 1
      }
      withClue(s"id=$id nc=$nc") { (sum, wsum) shouldBe ((eSum, eWsum)) }
    }
  }

  it should "fail loudly on malformed input" in {
    val good = GifCodec.encodeGif(3L, 17L)
    an[IllegalArgumentException] should be thrownBy
      GifCodec.decodeGif("GIF89a-not-really".getBytes("US-ASCII"))
    an[IllegalArgumentException] should be thrownBy
      GifCodec.decodeGif(good.take(100))
    // truncate the LZW stream inside the sub-blocks: decode must not
    // silently emit a short image (exact exception depends on where the
    // walk falls off — any loud failure is the contract)
    val cut = good.take(good.length - 6) ++ Array[Byte](0, 0x3b)
    a[RuntimeException] should be thrownBy GifCodec.decodeGif(cut)
  }
}
