package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.llm.GifCodec
import graft.operators.llm.MediaCodecs.Raster

/** Pins for the dependency-free GIF codec. GIF is LOSSLESS over a
  * palette, so every pin is byte-exact — no tolerance anywhere: (1)
  * our encode -> our decode round-trips across interlace /
  * transparency / palette sizes / dictionary-reset-sized images; (2)
  * cross-pins against the JDK's independent javax.imageio GIF codec
  * BOTH directions (their encoder's width-growth bookkeeping differs
  * from ours in the bytes, so agreement pins the LZW semantics, not
  * the byte stream). */
class GifCodecSpec extends AnyFunSuite {

  /** 4-color palette with distinct channel structure. */
  private val pal4 = Array(
    10, 20, 30,
    200, 100, 50,
    0, 0, 0,
    255, 255, 255)

  private def tile(id: Long): (Int, Int) => Int =
    (x, y) => (((x / 4) + (y / 4) + id) % 4).toInt

  test("encode -> decode round-trips byte-exactly (plain, interlaced, " +
      "2-color, 256-color, non-multiple dims)") {
    val pal2 = Array(0, 0, 0, 255, 255, 255)
    val pal256 = Array.tabulate(768)(i => (i * 7) % 256)
    for {
      (pal, np) <- Seq((pal4, 4), (pal2, 2), (pal256, 256))
      (w, h) <- Seq((16, 16), (13, 7), (64, 48))
      il <- Seq(false, true)
    } {
      val px = (x: Int, y: Int) => ((x / 3) + (y / 5) * 2) % np
      val bytes = GifCodec.encodeGif(w, h, pal, px, interlaced = il)
      assert(GifCodec.sniffGif(bytes))
      val got = GifCodec.decodeGifPixels(bytes)
      assert(got.width == w && got.height == h && got.channels == 3,
        s"${w}x$h np=$np il=$il shape")
      for (y <- 0 until h; x <- 0 until w) {
        val p = px(x, y)
        val o = (y * w + x) * 3
        assert(got.samples(o) == pal(3 * p) &&
          got.samples(o + 1) == pal(3 * p + 1) &&
          got.samples(o + 2) == pal(3 * p + 2),
          s"pixel ($x,$y) of ${w}x$h np=$np il=$il")
      }
    }
  }

  test("transparency: transparent pixels get alpha 0, others 255, " +
      "colors intact") {
    val w = 12; val h = 10
    val px = (x: Int, y: Int) => (x + y) % 4
    val bytes = GifCodec.encodeGif(w, h, pal4, px, transparentIndex = 2)
    val got = GifCodec.decodeGifPixels(bytes)
    assert(got.channels == 4)
    for (y <- 0 until h; x <- 0 until w) {
      val p = px(x, y)
      val o = (y * w + x) * 4
      if (p == 2) assert(got.samples(o + 3) == 0, s"alpha at ($x,$y)")
      else {
        assert(got.samples(o + 3) == 255, s"alpha at ($x,$y)")
        assert(got.samples(o) == pal4(3 * p) &&
          got.samples(o + 1) == pal4(3 * p + 1) &&
          got.samples(o + 2) == pal4(3 * p + 2), s"rgb at ($x,$y)")
      }
    }
  }

  test("dictionary growth to 12 bits and reset at 4096 survive a " +
      "noisy 256-color image (round-trip at scale)") {
    // 200x200 with a pseudo-random-but-deterministic pattern: enough
    // distinct strings to fill the dictionary several times over
    val w = 200; val h = 200
    val pal = Array.tabulate(768)(i => (i * 11) % 256)
    val px = (x: Int, y: Int) => ((x * 31 + y * 17 + (x * y) % 97) % 256)
    val bytes = GifCodec.encodeGif(w, h, pal, px)
    val got = GifCodec.decodeGifPixels(bytes)
    var bad = 0
    for (y <- 0 until h; x <- 0 until w) {
      val p = px(x, y)
      val o = (y * w + x) * 3
      if (got.samples(o) != pal(3 * p) ||
        got.samples(o + 1) != pal(3 * p + 1) ||
        got.samples(o + 2) != pal(3 * p + 2)) bad += 1
    }
    assert(bad == 0, s"$bad mismatched pixels")
  }

  private def toBuffered(r: Raster): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(r.width, r.height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until r.height; x <- 0 until r.width) {
      val o = (y * r.width + x) * r.channels
      img.setRGB(x, y, (r.samples(o) << 16) | (r.samples(o + 1) << 8) |
        r.samples(o + 2))
    }
    img
  }

  test("JDK ImageIO decodes OUR gif to the identical pixels " +
      "(plain and interlaced)") {
    for (il <- Seq(false, true)) {
      val w = 40; val h = 24
      val px = tile(if (il) 3L else 1L)
      val bytes = GifCodec.encodeGif(w, h, pal4, px, interlaced = il)
      val jdk = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(jdk != null, "ImageIO rejected our GIF")
      assert(jdk.getWidth == w && jdk.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val p = px(x, y)
        val want = (pal4(3 * p) << 16) | (pal4(3 * p + 1) << 8) |
          pal4(3 * p + 2)
        assert((jdk.getRGB(x, y) & 0xffffff) == want,
          s"il=$il pixel ($x,$y)")
      }
    }
  }

  test("WE decode the JDK ImageIO-encoded gif to the identical pixels") {
    val w = 37; val h = 23
    val px = tile(5L)
    val src = toBuffered(Raster(w, h, 3,
      Array.tabulate(w * h * 3) { i =>
        val p = px((i / 3) % w, (i / 3) / w)
        pal4(3 * p + i % 3)
      }))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(src, "gif", bos),
      "JDK has no GIF writer?")
    val got = GifCodec.decodeGifPixels(bos.toByteArray)
    assert(got.width == w && got.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      val p = px(x, y)
      val o = (y * w + x) * got.channels
      assert(got.samples(o) == pal4(3 * p) &&
        got.samples(o + 1) == pal4(3 * p + 1) &&
        got.samples(o + 2) == pal4(3 * p + 2), s"pixel ($x,$y)")
    }
  }

  test("decodeGif stats equal brute force, and animations report " +
      "nFrames while decoding the first frame") {
    val w = 16; val h = 8
    val px = tile(2L)
    val one = GifCodec.encodeGif(w, h, pal4, px)
    val img = GifCodec.decodeGif(one)
    var sum = 0L; var max = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val v = pal4(3 * px(x, y) + c)
      sum += v
      if (v > max) max = v
    }
    assert(img.nFrames == 1 && img.sumChannels == sum &&
      img.maxChannel == max && img.nPixels == w.toLong * h)

    // splice a second image block before the trailer: an "animation"
    val second = {
      val frame = GifCodec.encodeGif(w, h, pal4, tile(9L))
      // image block starts at 0x2c after header+GCT (13 + 12 bytes)
      frame.slice(13 + 12, frame.length - 1)
    }
    val anim = one.dropRight(1) ++ second ++ Array(0x3b.toByte)
    val a = GifCodec.decodeGif(anim)
    assert(a.nFrames == 2, "second frame counted")
    assert(a.sumChannels == sum, "stats still from the FIRST frame")
    assert(GifCodec.decodeGifPixels(anim).samples
      .sameElements(GifCodec.decodeGifPixels(one).samples))
  }

  test("animation writer + lazy frame sampler: stride keeps every " +
      "Nth frame, skipped frames never decode (corruption-proof)") {
    val frames = (0 until 5).map { fi =>
      (x: Int, y: Int) => (x + y + fi) % 4
    }
    val anim = GifCodec.encodeGifAnimation(12, 8, pal4, frames)
    // full walk via decodeGif still sees all frames, first-frame stats
    assert(GifCodec.decodeGif(anim).nFrames == 5)
    val kept = GifCodec.sampleFrames(anim, 2)
    assert(kept.map(_._1) == IndexedSeq(0, 2, 4))
    for ((fi, r) <- kept) {
      assert(r.width == 12 && r.height == 8 && r.channels == 3)
      for (y <- 0 until 8; x <- 0 until 12) {
        val p = (x + y + fi) % 4
        val o = (y * 12 + x) * 3
        assert((r.samples(o), r.samples(o + 1), r.samples(o + 2)) ==
          ((pal4(3 * p), pal4(3 * p + 1), pal4(3 * p + 2))),
          s"frame $fi pixel ($x,$y)")
      }
    }
    // LAZINESS, proven destructively: corrupt the LZW interior of a
    // SKIPPED frame (frame 1) — sub-block lengths intact, content
    // garbage. The sampler must still produce frames 0/2/4 exactly;
    // an eager sampler would throw on the corrupt codes.
    val f0end = {
      // locate frame starts: walk image blocks
      var off = 13 + 3 * 4 // header + GCT (4 colors -> 2 bits... table
      // padded to 4 entries = 12 bytes)
      def u8(i: Int) = anim(i) & 0xff
      def skipSub(i0: Int): Int = {
        var i = i0
        var len = u8(i)
        while (len != 0) { i += 1 + len; len = u8(i) }
        i + 1
      }
      // first block must be an image descriptor
      assert(u8(off) == 0x2c)
      skipSub(off + 10 + 1) // descriptor + minCode, then sub-blocks
    }
    val corrupt = anim.clone()
    // frame 1 starts at f0end with 0x2c; flip bytes INSIDE its first
    // LZW sub-block (descriptor 10 + minCode 1 + length byte 1)
    assert((corrupt(f0end) & 0xff) == 0x2c)
    val lzwStart = f0end + 12
    corrupt(lzwStart) = 0x5a.toByte
    corrupt(lzwStart + 1) = 0x5a.toByte
    val keptC = GifCodec.sampleFrames(corrupt, 2)
    assert(keptC.map(_._1) == IndexedSeq(0, 2, 4))
    assert(keptC(1)._2.samples.sameElements(kept(1)._2.samples))
    // and decoding the corrupted SKIPPED frame directly DOES fail
    intercept[IllegalArgumentException] {
      GifCodec.sampleFrames(corrupt, 1)
    }
  }

  test("malformed input fails loudly") {
    intercept[IllegalArgumentException] {
      GifCodec.decodeGifPixels("GIF89a then garbage".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      GifCodec.decodeGifPixels("not a gif".getBytes("US-ASCII"))
    }
    val good = GifCodec.encodeGif(8, 8, pal4, tile(0L))
    intercept[IllegalArgumentException] { // truncated mid-LZW
      GifCodec.decodeGifPixels(java.util.Arrays.copyOf(good, good.length - 6))
    }
  }
}
