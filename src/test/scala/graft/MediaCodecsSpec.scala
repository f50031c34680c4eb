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

  /** A ~50-byte syntactically valid PNG declaring 50000x50000 — shared
    * by the hostile-header and cap-counting tests (r21 advice fix: a
    * lazy val instead of a var stashed by one test for another, so each
    * test runs standalone and under shuffled execution). */
  private lazy val oversizedPng: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    val ihdr = new Array[Byte](13)
    def be32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
      b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
    }
    be32(ihdr, 0, 50000); be32(ihdr, 4, 50000)
    ihdr(8) = 8; ihdr(9) = 2 // 8-bit RGB
    val lenAndType = new Array[Byte](8)
    be32(lenAndType, 0, 13)
    System.arraycopy("IHDR".getBytes("US-ASCII"), 0, lenAndType, 4, 4)
    out.write(lenAndType)
    out.write(ihdr)
    val crc = new java.util.zip.CRC32
    crc.update(lenAndType, 4, 4); crc.update(ihdr)
    val crcB = new Array[Byte](4); be32(crcB, 0, crc.getValue.toInt)
    out.write(crcB)
    out.toByteArray
  }

  test("PNG hostile-header dims fail loudly BEFORE any geometry-sized " +
      "allocation") {
    // a ~50-byte payload declaring 50000x50000 must raise the decode's
    // "too large" require (-> the MultimodalOps damage fallback), never
    // allocate multi-GB planes: OutOfMemoryError is not NonFatal and
    // would kill the executor, not the record (r19 review)
    val e = intercept[IllegalArgumentException] {
      MediaCodecs.decodePng(oversizedPng)
    }
    assert(e.getMessage.contains("too large"))
    // r20: the cap rejection is its OWN exception class (still an IAE,
    // so every damage contract above holds) — callers can tell the
    // tunable policy bound apart from corruption
    assert(e.isInstanceOf[MediaCodecs.DecodeCapExceeded])
  }

  test("decodeBatch counts cap rejections separately from damage " +
      "(r20 advice: oversized-but-valid media is observable)") {
    import graft.operators.llm.MultimodalOps
    import graft.operators.llm.MultimodalOps.MediaRecord
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G',
      0x0d, 0x0a, 0x1a, 0x0a, 1, 2, 3) // sniffs PNG, truncated = damage
    var capHits = 0
    val out = MultimodalOps.decodeBatch(Iterator(
        MediaRecord(1L, oversizedPng, "png", 50000, 50000),
        MediaRecord(2L, corrupt, "png", 1, 1)),
      () => capHits += 1).toVector
    assert(out.length == 2)          // both degrade to the fallback row
    assert(capHits == 1)             // only the cap rejection is counted
    // fallback identity: the cap row hashes the raw payload, exactly
    // like the damage row (shared hash contract)
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = md.digest(oversizedPng).map("%02x".format(_)).mkString
    assert(out(0).thumb_hash == expect)
    assert(out(0).decoded_bytes == oversizedPng.length.toLong)
  }

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

  test("WAV: stereo and 8-bit PCM round-trip with exact stats; the " +
      "JDK's own audio reader agrees on the format header") {
    // stereo 16-bit: interleaved L/R, nSamples counts both channels
    val st = Array.tabulate(40)(i => (i * 251) % 1501 - 750)
    val stereo = MediaCodecs.encodeWavPcm(22050, 2, 16, st)
    val gotSt = MediaCodecs.decodeWav(stereo)
    assert(gotSt == WavAudio(2, 22050, 16, 40L,
      st.map(v => math.abs(v).toLong).sum, st.map(math.abs).max))
    // mono 8-bit: unsigned in the file, signed amplitudes in stats
    val m8 = Array.tabulate(33)(i => (i * 17) % 255 - 127)
    val mono8 = MediaCodecs.encodeWavPcm(8000, 1, 8, m8)
    val got8 = MediaCodecs.decodeWav(mono8)
    assert(got8 == WavAudio(1, 8000, 8, 33L,
      m8.map(v => math.abs(v).toLong).sum, m8.map(math.abs).max))
    // independent reference: javax.sound parses both headers identically
    for ((bytes, ch, rate, bits) <- Seq((stereo, 2, 22050, 16),
        (mono8, 1, 8000, 8))) {
      val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes)).getFormat
      assert(fmt.getChannels == ch && fmt.getSampleRate.toInt == rate &&
        fmt.getSampleSizeInBits == bits, s"JDK header for $bits-bit")
    }
    // partial trailing frame fails loudly
    val bad = stereo.clone()
    val shorter = java.util.Arrays.copyOf(bad, bad.length - 2)
    // fix RIFF + data sizes to re-declare the truncated length (odd frames)
    def fix32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
      b(off + 2) = ((v >> 16) & 0xff).toByte
      b(off + 3) = ((v >> 24) & 0xff).toByte
    }
    fix32(shorter, 4, shorter.length - 8)
    fix32(shorter, 40, shorter.length - 44)
    intercept[IllegalArgumentException] { MediaCodecs.decodeWav(shorter) }
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
    // 16-bit depth and grayscale are IN the envelope now
    val deep = rgb.clone(); deep(24) = 16.toByte
    assert(MediaCodecs.sniffPng(deep))
    val gray = rgb.clone(); gray(25) = 0.toByte
    assert(MediaCodecs.sniffPng(gray))
    // illegal combination (16-bit palette) -> fallback lane
    val badPal = rgb.clone(); badPal(24) = 16.toByte; badPal(25) = 3.toByte
    assert(!MediaCodecs.sniffPng(badPal))
    // sub-byte RGB is illegal too
    val badRgb = rgb.clone(); badRgb(24) = 4.toByte
    assert(!MediaCodecs.sniffPng(badRgb))
    // text starting with the signature bytes cannot happen (binary sig),
    // but a truncated signature-only payload must not sniff
    assert(!MediaCodecs.sniffPng(rgb.take(20)))
  }

  private def toIndexed(w: Int, h: Int, pal: Array[Int],
                        px: (Int, Int) => Int): java.awt.image.BufferedImage = {
    val n = pal.length / 3
    val r = new Array[Byte](n); val g = new Array[Byte](n)
    val b = new Array[Byte](n)
    for (i <- 0 until n) {
      r(i) = pal(3 * i).toByte; g(i) = pal(3 * i + 1).toByte
      b(i) = pal(3 * i + 2).toByte
    }
    val cm = new java.awt.image.IndexColorModel(8, n, r, g, b)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    for (y <- 0 until h; x <- 0 until w) {
      val p = px(x, y)
      img.setRGB(x, y, (pal(3 * p) << 16) | (pal(3 * p + 1) << 8) |
        pal(3 * p + 2))
    }
    img
  }

  test("PNG full-variant decode: palette (all bit depths, interlaced, " +
      "tRNS), gray, gray+alpha, 16-bit — round-trips byte-exactly") {
    val pal = Array(10, 20, 30, 200, 100, 50, 0, 0, 0, 255, 255, 255)
    // palette: depths x interlace, non-multiple dims stress Adam7 edges
    for {
      d <- Seq(1, 2, 4, 8)
      il <- Seq(false, true)
      (w, h) <- Seq((16, 16), (13, 7), (3, 2), (1, 9))
    } {
      val np = math.min(4, 1 << d)
      val px = (x: Int, y: Int) => (x + y) % np
      val bytes = MediaCodecs.encodePngPalette(w, h, pal.take(3 * np), px,
        bitDepth = d, interlaced = il)
      assert(MediaCodecs.sniffPng(bytes), s"d=$d il=$il ${w}x$h sniff")
      val got = MediaCodecs.decodePngPixels(bytes)
      assert(got.width == w && got.height == h && got.channels == 3)
      for (y <- 0 until h; x <- 0 until w) {
        val p = px(x, y)
        val o = (y * w + x) * 3
        assert((got.samples(o), got.samples(o + 1), got.samples(o + 2)) ==
          ((pal(3 * p), pal(3 * p + 1), pal(3 * p + 2))),
          s"d=$d il=$il pixel ($x,$y) of ${w}x$h")
      }
    }
    // palette with tRNS -> RGBA, missing entries default opaque
    val tr = MediaCodecs.decodePngPixels(MediaCodecs.encodePngPalette(
      4, 2, pal, (x, y) => (x + y) % 4, trns = Array(255, 0)))
    assert(tr.channels == 4)
    for (y <- 0 until 2; x <- 0 until 4) {
      val p = (x + y) % 4
      val want = if (p == 0) 255 else if (p == 1) 0 else 255
      assert(tr.samples((y * 4 + x) * 4 + 3) == want, s"alpha ($x,$y)")
    }
  }

  test("PNG gray / 16-bit / interlaced RGB cross-pinned against the " +
      "JDK's own PNG codec, byte-exactly (lossless both sides)") {
    // 8-bit gray via ImageIO
    val g8 = {
      val img = new java.awt.image.BufferedImage(11, 6,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 6; x <- 0 until 11)
        img.getRaster.setSample(x, y, 0, (x * 23 + y * 31) % 256)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    val gotG = MediaCodecs.decodePngPixels(g8)
    assert(gotG.channels == 1 && gotG.width == 11)
    for (y <- 0 until 6; x <- 0 until 11)
      assert(gotG.samples(y * 11 + x) == (x * 23 + y * 31) % 256,
        s"gray ($x,$y)")
    // 16-bit gray via ImageIO: our samples are the high bytes
    val g16 = {
      val img = new java.awt.image.BufferedImage(7, 5,
        java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
      for (y <- 0 until 5; x <- 0 until 7)
        img.getRaster.setSample(x, y, 0, (x * 9001 + y * 777) % 65536)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    val got16 = MediaCodecs.decodePngPixels(g16)
    assert(got16.channels == 1)
    for (y <- 0 until 5; x <- 0 until 7)
      assert(got16.samples(y * 7 + x) == ((x * 9001 + y * 777) % 65536) >> 8,
        s"gray16 ($x,$y)")
    // palette via ImageIO (TYPE_BYTE_INDEXED keeps exact colors)
    val pal = Array(10, 20, 30, 200, 100, 50, 0, 0, 0, 255, 255, 255)
    val px = (x: Int, y: Int) => (x / 2 + y) % 4
    val pi = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(toIndexed(10, 8, pal, px), "png", bos))
      bos.toByteArray
    }
    val gotP = MediaCodecs.decodePngPixels(pi)
    for (y <- 0 until 8; x <- 0 until 10) {
      val p = px(x, y)
      val o = (y * 10 + x) * gotP.channels
      assert((gotP.samples(o), gotP.samples(o + 1), gotP.samples(o + 2)) ==
        ((pal(3 * p), pal(3 * p + 1), pal(3 * p + 2))), s"idx ($x,$y)")
    }
    // the JDK decodes OUR interlaced palette stream identically
    val ours = MediaCodecs.encodePngPalette(9, 9, pal, px, bitDepth = 2,
      interlaced = true)
    val jdk = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(ours))
    assert(jdk != null, "ImageIO rejected our interlaced palette PNG")
    for (y <- 0 until 9; x <- 0 until 9) {
      val p = px(x, y)
      val want = (pal(3 * p) << 16) | (pal(3 * p + 1) << 8) | pal(3 * p + 2)
      assert((jdk.getRGB(x, y) & 0xffffff) == want, s"jdk ($x,$y)")
    }
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
