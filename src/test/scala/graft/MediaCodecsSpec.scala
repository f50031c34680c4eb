package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.llm.MediaCodecs
import graft.operators.llm.MediaCodecs.{BmpImage, WavAudio}

/** Byte-level pins for the dependency-free media codecs: round-trips
  * verified against BRUTE-FORCE recomputation (not the encoder's own
  * math), padding edge widths, top-down row order, RIFF chunk walking,
  * and loud failure on damage. */
class MediaCodecsSpec extends AnyFunSuite {

  private def px(x: Int, y: Int): (Int, Int, Int) =
    ((x * 7 + y) % 256, (x + y * 5) % 256, (x ^ y) % 256)

  test("BMP round-trip: stats equal brute-force over every padding class") {
    // width % 4 ∈ {0,1,2,3} exercises all four row-padding widths
    for (w <- Seq(1, 2, 3, 4, 5, 7, 8, 16, 33); h <- Seq(1, 2, 5, 9)) {
      val bytes = MediaCodecs.encodeBmp(w, h, px)
      // stride math: every row starts on a 4-byte boundary
      assert((bytes.length - 54) % h == 0)
      val got = MediaCodecs.decodeBmp(bytes)
      var sum = 0L
      var max = 0
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = px(x, y)
        sum += r + g + b
        max = math.max(max, math.max(r, math.max(g, b)))
      }
      assert(got == BmpImage(w, h, w.toLong * h, sum, max),
        s"mismatch at ${w}x$h")
    }
  }

  test("BMP: padding bytes are not counted in the statistics") {
    // 1x1 white pixel: stride is 4, one pad byte of garbage must be
    // invisible to the decode
    val bytes = MediaCodecs.encodeBmp(1, 1, (_, _) => (255, 255, 255))
    bytes(54 + 3) = 0x7f   // poke the pad byte
    val got = MediaCodecs.decodeBmp(bytes)
    assert(got.sumChannels == 765L && got.maxChannel == 255)
  }

  test("BMP: top-down (negative height) parses; stats are order-free") {
    val up = MediaCodecs.encodeBmp(5, 3, px)
    // flip to top-down: height := -3, and re-order the rows to match
    val stride = ((5 * 3 + 3) / 4) * 4
    val down = up.clone()
    down(22) = (-3 & 0xff).toByte; down(23) = 0xff.toByte
    down(24) = 0xff.toByte; down(25) = 0xff.toByte
    for (r <- 0 until 3)
      System.arraycopy(up, 54 + r * stride, down, 54 + (2 - r) * stride, stride)
    assert(MediaCodecs.decodeBmp(down) == MediaCodecs.decodeBmp(up))
  }

  test("BMP: truncation and wrong depth fail loudly") {
    val ok = MediaCodecs.encodeBmp(4, 4, px)
    intercept[IllegalArgumentException] {
      MediaCodecs.decodeBmp(ok.take(53))          // truncated header
    }
    intercept[IllegalArgumentException] {
      MediaCodecs.decodeBmp(ok.take(ok.length - 1)) // truncated pixels
    }
    val bad = ok.clone(); bad(28) = 8               // 8-bpp
    intercept[IllegalArgumentException] { MediaCodecs.decodeBmp(bad) }
    intercept[IllegalArgumentException] {
      MediaCodecs.decodeBmp("notabmp".getBytes("UTF-8"))
    }
  }

  test("WAV round-trip: stats equal brute-force; negatives handled") {
    val samples = Array.tabulate(321)(i => ((i * 37) % 1201 - 600).toShort)
    val bytes = MediaCodecs.encodeWav(44100, samples)
    val got = MediaCodecs.decodeWav(bytes)
    val sumAbs = samples.map(s => math.abs(s.toInt).toLong).sum
    val peak = samples.map(s => math.abs(s.toInt)).max
    assert(got == WavAudio(1, 44100, 16, 321L, sumAbs, peak))
  }

  test("WAV: unknown chunks (incl. odd-size + pad byte) are skipped") {
    val samples = Array.tabulate(10)(i => (i * 100).toShort)
    val plain = MediaCodecs.encodeWav(8000, samples)
    // splice a 5-byte LIST chunk (odd size → 1 pad byte) between fmt
    // and data, fixing up the RIFF size
    val insert = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val out = new Array[Byte](plain.length + insert.length)
    System.arraycopy(plain, 0, out, 0, 36)
    System.arraycopy(insert, 0, out, 36, insert.length)
    System.arraycopy(plain, 36, out, 36 + insert.length, plain.length - 36)
    val riffLen = (plain.length - 8) + insert.length
    out(4) = (riffLen & 0xff).toByte
    out(5) = ((riffLen >> 8) & 0xff).toByte
    out(6) = ((riffLen >> 16) & 0xff).toByte
    out(7) = ((riffLen >> 24) & 0xff).toByte
    assert(MediaCodecs.decodeWav(out) == MediaCodecs.decodeWav(plain))
  }

  test("WAV: damage fails loudly") {
    val ok = MediaCodecs.encodeWav(8000, Array[Short](1, 2, 3))
    intercept[IllegalArgumentException] {
      MediaCodecs.decodeWav(ok.take(ok.length - 2))   // truncated data
    }
    val nonPcm = ok.clone(); nonPcm(20) = 3           // IEEE float
    intercept[IllegalArgumentException] { MediaCodecs.decodeWav(nonPcm) }
    intercept[IllegalArgumentException] {
      MediaCodecs.decodeWav("RIFFxxxxNOPE".getBytes("UTF-8"))
    }
  }

  test("structural sniff: text that merely starts with the magic takes " +
      "the fallback instead of crashing the batch") {
    import graft.operators.llm.MultimodalOps
    // would throw inside decodeBmp/decodeWav if dispatched on magic alone
    val bmLike = ("BM plus enough trailing text to clear fifty-four " +
      "bytes of header territory without being a bitmap").getBytes("UTF-8")
    val riffLike = "RIFFxxxxWAVEbut nothing else valid here".getBytes("UTF-8")
    assert(!MediaCodecs.sniffBmp(bmLike) && MediaCodecs.isBmp(bmLike))
    assert(!MediaCodecs.sniffWav(riffLike) && MediaCodecs.isWav(riffLike))
    val out = MultimodalOps.decodeBatch(Iterator(
      MultimodalOps.MediaRecord(1L, bmLike, "txt", 0, 0),
      MultimodalOps.MediaRecord(2L, riffLike, "txt", 0, 0))).toVector
    assert(out(0).decoded_bytes == bmLike.length.toLong)
    assert(out(1).decoded_bytes == riffLike.length.toLong)
  }

  test("decodeBatch dispatches by magic: real decode for BMP/WAV, " +
      "fallback elsewhere") {
    import graft.operators.llm.MultimodalOps
    val bmp = MediaCodecs.encodeBmp(2, 2, (_, _) => (1, 2, 3))
    val wav = MediaCodecs.encodeWav(8000, Array[Short](4, -5))
    val other = "just text".getBytes("UTF-8")
    val out = MultimodalOps.decodeBatch(Iterator(
      MultimodalOps.MediaRecord(1L, bmp, "bmp", 2, 2),
      MultimodalOps.MediaRecord(2L, wav, "wav", 0, 0),
      MultimodalOps.MediaRecord(3L, other, "txt", 0, 0))).toVector
    assert(out(0).decoded_bytes == 12L)   // 4 px × 3 channels
    assert(out(1).decoded_bytes == 4L)    // 2 samples × 2 bytes
    assert(out(2).decoded_bytes == other.length.toLong)
    // the BMP/WAV hashes digest decoded FEATURES, not payload bytes
    val md = java.security.MessageDigest.getInstance("MD5")
    assert(out(0).thumb_hash == MultimodalOps.hexLower(
      md.digest("bmp 2x2 24 3".getBytes("UTF-8"))))
    md.reset()
    assert(out(1).thumb_hash == MultimodalOps.hexLower(
      md.digest("wav 8000 2 9 5".getBytes("UTF-8"))))
  }

  // ---- PNG -----------------------------------------------------------

  private def brutePng(w: Int, h: Int, bpp: Int,
                       px: (Int, Int) => Array[Int]): (Long, Int) = {
    var sum = 0L; var max = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until bpp) {
      val v = px(x, y)(c) & 0xff
      sum += v; if (v > max) max = v
    }
    (sum, max)
  }

  test("PNG round-trip: RGB and RGBA stats equal brute force; every " +
      "filter type exercised (heights >= 5 cycle all five)") {
    for ((w, h, ct) <- Seq((1, 1, 2), (3, 5, 2), (7, 6, 6), (16, 9, 6),
        (4, 11, 2))) {
      val bpp = if (ct == 2) 3 else 4
      val px = (x: Int, y: Int) =>
        Array.tabulate(bpp)(c => (x * 7 + y * 13 + c * 31) % 256)
      val bytes = MediaCodecs.encodePng(w, h, ct, px)
      val img = MediaCodecs.decodePng(bytes)
      val (sum, max) = brutePng(w, h, bpp, px)
      assert(img == MediaCodecs.PngImage(w, h, bpp, w.toLong * h, sum, max),
        s"${w}x$h ct=$ct")
    }
  }

  test("PNG: IDAT split across chunks is concatenated (encoder emits two)") {
    val bytes = MediaCodecs.encodePng(5, 4, 2, (x, y) => Array(x, y, x + y))
    // count IDAT headers
    val s = new String(bytes.map(b => if (b >= 32 && b < 127) b.toChar else '.'))
    assert("IDAT".r.findAllIn(s).length == 2)
    assert(MediaCodecs.decodePng(bytes).nPixels == 20L)
  }

  test("PNG: damage fails loudly — bad CRC, truncated IDAT, bad filter, " +
      "geometry mismatch") {
    val ok = MediaCodecs.encodePng(6, 5, 2, (x, y) => Array(x, y, 7))
    // flip a byte inside the first IDAT's data -> CRC check trips
    val idatOff = {
      var off = 8
      while (!(ok(off + 4) == 'I' && ok(off + 5) == 'D')) off += 12 + {
        ((ok(off) & 0xff) << 24) | ((ok(off + 1) & 0xff) << 16) |
          ((ok(off + 2) & 0xff) << 8) | (ok(off + 3) & 0xff)
      }
      off
    }
    val bad = ok.clone(); bad(idatOff + 8) = (bad(idatOff + 8) ^ 0x5a).toByte
    intercept[IllegalArgumentException](MediaCodecs.decodePng(bad))
    // truncation mid-chunk
    intercept[IllegalArgumentException](
      MediaCodecs.decodePng(ok.take(ok.length - 10)))
    // declared geometry larger than the IDAT inflates to: grow height
    val tall = ok.clone()
    tall(20 + 3) = (tall(20 + 3) + 1).toByte   // IHDR height low byte
    intercept[IllegalArgumentException](MediaCodecs.decodePng(tall))
  }

  test("PNG structural sniff: supported subset only; valid-but-other " +
      "PNGs fall back") {
    val rgb = MediaCodecs.encodePng(3, 3, 2, (_, _) => Array(1, 2, 3))
    assert(MediaCodecs.sniffPng(rgb))
    // 16-bit depth advertised -> sniff says no (fallback lane), decode throws
    val deep = rgb.clone(); deep(24) = 16.toByte
    assert(!MediaCodecs.sniffPng(deep))
    // grayscale color type -> same
    val gray = rgb.clone(); gray(25) = 0.toByte
    assert(!MediaCodecs.sniffPng(gray))
    // text starting with the signature bytes cannot happen (binary sig),
    // but a truncated signature-only payload must not sniff
    assert(!MediaCodecs.sniffPng(rgb.take(20)))
  }

  test("decodeBatch dispatches PNG: decoded_bytes = pixels x channels, " +
      "hash digests decoded features") {
    import graft.operators.llm.MultimodalOps
    val png = MediaCodecs.encodePng(2, 2, 6, (x, y) => Array(x, y, 5, 250))
    val out = MultimodalOps.decodeBatch(Iterator(
      MultimodalOps.MediaRecord(9L, png, "png", 2, 2))).toVector
    assert(out(0).decoded_bytes == 16L)   // 4 px × 4 channels
    val (sum, max) = brutePng(2, 2, 4, (x, y) => Array(x, y, 5, 250))
    val md = java.security.MessageDigest.getInstance("MD5")
    assert(out(0).thumb_hash == MultimodalOps.hexLower(
      md.digest(s"png rgba 2x2 $sum $max".getBytes("UTF-8"))))
  }
}
