package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.llm.JpegCodec

/** Pins for the dependency-free baseline JFIF codec. Two independent
  * oracles: (1) DC-exact mosaics (constant 8x8 blocks, all-ones quant)
  * must reconstruct BYTE-EXACTLY — that property is what q115's
  * closed-form DuckDB oracle rides on; (2) the JDK's own JPEG codec
  * (javax.imageio, a completely separate implementation) both ways —
  * our decoder on ImageIO-encoded bytes and ImageIO's decoder on our
  * bytes — within the IDCT/color-convert rounding tolerance the spec
  * itself allows. */
class JpegCodecSpec extends AnyFunSuite {

  /** Neutral-chroma mosaic: block (bx,by) has constant luma, chroma
    * constant per image — every block is DC-only, exact under any
    * faithful IDCT. */
  private def blockY(bx: Int, by: Int, seed: Int): Int =
    16 + 8 * ((bx + 2 * by + seed) % 24)

  private def mosaic(seed: Int, cb: Int, cr: Int): (Int, Int) => (Int, Int, Int) =
    (x, y) => (blockY(x / 8, y / 8, seed), cb, cr)

  private def expectedRgb(yv: Int, cb0: Int, cr0: Int): (Int, Int, Int) = {
    val cb = cb0 - 128
    val cr = cr0 - 128
    def cl(v: Int) = math.max(0, math.min(255, v))
    (cl(yv + ((91881 * cr + 32768) >> 16)),
      cl(yv - ((22554 * cb + 46802 * cr + 32768) >> 16)),
      cl(yv + ((116130 * cb + 32768) >> 16)))
  }

  test("hostile SOF dimensions fail loudly BEFORE any plane allocation") {
    // take a real tiny JPEG and patch its SOF dims to 60000x60000: the
    // decode must raise "too large" (-> the damage fallback), never
    // allocate multi-GB component planes (r19 review; OutOfMemoryError
    // is not NonFatal and kills the executor, not the record)
    val bytes = JpegCodec.encodeJpeg(8, 8, 3, 1,
      Array.fill(64)(1), Array.fill(64)(1), 0, (_, _) => (128, 128, 128))
    var sof = -1
    var i = 2
    while (sof < 0 && i < bytes.length - 1) {
      if ((bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xc0) sof = i
      i += 1
    }
    assert(sof > 0, "SOF0 marker not found")
    // SOF0 layout: FF C0 len(2) precision(1) height(2) width(2) ...
    val patched = bytes.clone()
    patched(sof + 5) = 0xea.toByte; patched(sof + 6) = 0x60.toByte // 60000
    patched(sof + 7) = 0xea.toByte; patched(sof + 8) = 0x60.toByte
    val e = intercept[IllegalArgumentException] {
      JpegCodec.decodeJpeg(patched)
    }
    assert(e.getMessage.contains("too large"))
  }

  test("DC-only color mosaics decode byte-exactly (4:4:4 and 4:2:0, " +
      "with and without restart markers)") {
    for {
      (w, h) <- Seq((8, 8), (16, 16), (24, 16), (40, 24))
      sub <- Seq(1, 2)
      rst <- Seq(0, 2)
      seed <- Seq(0, 5)
    } {
      // chroma multiples keep the fixed-point conversion adjustments
      // nonnegative-exact; constant per image so 4:2:0 box-averaging
      // is lossless
      val cb = 128 + 4 * (seed % 7)
      val cr = 128 + 6 * (seed % 5)
      val bytes = JpegCodec.encodeJpeg(w, h, 3, sub,
        JpegCodec.flatQuant, JpegCodec.flatQuant, rst, mosaic(seed, cb, cr))
      val got = JpegCodec.decodePixels(bytes)
      assert(got.width == w && got.height == h && got.channels == 3)
      for (y <- 0 until h; x <- 0 until w) {
        val (er, eg, eb) = expectedRgb(blockY(x / 8, y / 8, seed), cb, cr)
        val o = (y * w + x) * 3
        assert(got.samples(o) == er && got.samples(o + 1) == eg &&
          got.samples(o + 2) == eb,
          s"pixel ($x,$y) of ${w}x$h sub=$sub rst=$rst seed=$seed: " +
            s"got (${got.samples(o)},${got.samples(o + 1)},${got.samples(o + 2)})" +
            s" want ($er,$eg,$eb)")
      }
    }
  }

  test("DC-only grayscale mosaics decode byte-exactly, including " +
      "non-block-multiple dimensions (edge replication cropped back)") {
    for ((w, h) <- Seq((8, 8), (11, 7), (17, 9), (25, 10))) {
      val bytes = JpegCodec.encodeJpeg(w, h, 1, 1,
        JpegCodec.flatQuant, JpegCodec.flatQuant, 0, mosaic(3, 128, 128))
      val got = JpegCodec.decodePixels(bytes)
      assert(got.width == w && got.height == h && got.channels == 1)
      for (y <- 0 until h; x <- 0 until w)
        assert(got.samples(y * w + x) == blockY(x / 8, y / 8, 3),
          s"pixel ($x,$y) of ${w}x$h")
    }
  }

  test("decodeJpeg stats equal brute force over the decoded pixels") {
    val w = 24; val h = 16
    val bytes = JpegCodec.encodeJpeg(w, h, 3, 1,
      JpegCodec.flatQuant, JpegCodec.flatQuant, 0, mosaic(1, 132, 140))
    val img = JpegCodec.decodeJpeg(bytes)
    var sum = 0L
    var max = 0
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = expectedRgb(blockY(x / 8, y / 8, 1), 132, 140)
      sum += r + g + b
      max = math.max(max, math.max(r, math.max(g, b)))
    }
    assert(img == JpegCodec.JpegImage(w, h, 3, w.toLong * h, sum, max))
  }

  test("our decoder reads the JDK encoder's output (independent " +
      "implementation, gradient content with real AC coefficients)") {
    val w = 32; val h = 24
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    // smooth content: the JDK encodes 4:2:0 and its decoder upsamples
    // triangularly where we box-replicate — high-frequency chroma would
    // compare the two UPSAMPLERS, not the two DECODERS
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 255 / (w - 1)) & 0xff
      val g = (y * 255 / (h - 1)) & 0xff
      val b = ((x + y) * 255 / (w + h - 2)) & 0xff
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val bytes = bos.toByteArray
    val ours = JpegCodec.decodePixels(bytes)
    assert(ours.width == w && ours.height == h && ours.channels == 3)
    // ImageIO's own decode of the same bytes is the reference; JDK uses
    // libjpeg's fancy (triangular) chroma upsampling where we use box
    // replication, and a different integer IDCT — tolerance covers both
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    var sumDiff = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = ref.getRGB(x, y)
      val o = (y * w + x) * 3
      val d = math.max(math.abs(((rgb >> 16) & 0xff) - ours.samples(o)),
        math.max(math.abs(((rgb >> 8) & 0xff) - ours.samples(o + 1)),
          math.abs((rgb & 0xff) - ours.samples(o + 2))))
      maxDiff = math.max(maxDiff, d)
      sumDiff += d
    }
    // measured: maxDiff 9, avg ~3.5 — the residual IS the upsampler
    // difference; a huffman/IDCT/dequant defect reads as garbage (>60)
    assert(maxDiff <= 12 && sumDiff.toDouble / (w * h) <= 4.0,
      s"vs JDK decode: maxDiff=$maxDiff avgDiff=${sumDiff.toDouble / (w * h)}")
  }

  test("the JDK decoder reads our encoder's output (nontrivial quant, " +
      "4:4:4) within rounding tolerance") {
    val w = 32; val h = 16
    // a mild real quant table (flat 4) so AC coefficients survive
    val q = Array.fill(64)(4)
    def px(x: Int, y: Int): (Int, Int, Int) =
      (32 + (x * 5 + y * 3) % 192, 128, 128) // neutral chroma: isolates luma path
    val bytes = JpegCodec.encodeJpeg(w, h, 3, 1, q, q, 0, px)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(ref != null && ref.getWidth == w && ref.getHeight == h)
    val ours = JpegCodec.decodePixels(bytes)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = ref.getRGB(x, y)
      val o = (y * w + x) * 3
      val d = math.max(math.abs(((rgb >> 16) & 0xff) - ours.samples(o)),
        math.max(math.abs(((rgb >> 8) & 0xff) - ours.samples(o + 1)),
          math.abs((rgb & 0xff) - ours.samples(o + 2))))
      maxDiff = math.max(maxDiff, d)
    }
    assert(maxDiff <= 4, s"JDK decode of our bytes: maxDiff=$maxDiff")
  }

  test("grayscale cross-check vs the JDK codec (no chroma path at all)") {
    val w = 24; val h = 24
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = ((x * x + y * 5) % 256) & 0xff
      img.getRaster.setSample(x, y, 0, v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val bytes = bos.toByteArray
    val ours = JpegCodec.decodePixels(bytes)
    assert(ours.channels == 1 && ours.width == w && ours.height == h)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val d = math.abs((ref.getRaster.getSample(x, y, 0)) -
        ours.samples(y * w + x))
      maxDiff = math.max(maxDiff, d)
    }
    assert(maxDiff <= 2, s"gray vs JDK: maxDiff=$maxDiff")
  }

  test("asymmetric chroma sampling (4:2:2 and 4:4:0) decodes DC-only " +
      "mosaics byte-exactly — the non-square MCU geometry path") {
    for {
      ((sh, sv), tag) <- Seq(((2, 1), "4:2:2"), ((1, 2), "4:4:0"))
      (w, h) <- Seq((16, 16), (24, 8), (8, 24))
    } {
      val cb = 132; val cr = 140
      val bytes = JpegCodec.encodeJpeg(w, h, 3, sh,
        JpegCodec.flatQuant, JpegCodec.flatQuant, 0, mosaic(6, cb, cr),
        subsampleV = sv)
      val got = JpegCodec.decodePixels(bytes)
      assert(got.width == w && got.height == h && got.channels == 3)
      for (y <- 0 until h; x <- 0 until w) {
        val (er, eg, eb) = expectedRgb(blockY(x / 8, y / 8, 6), cb, cr)
        val o = (y * w + x) * 3
        assert(got.samples(o) == er && got.samples(o + 1) == eg &&
          got.samples(o + 2) == eb, s"$tag pixel ($x,$y) of ${w}x$h")
      }
    }
  }

  test("16-bit DQT (Pq=1) and SOF1 (extended sequential) decode " +
      "identically to their baseline 8-bit forms") {
    val w = 16; val h = 16
    val base = JpegCodec.encodeJpeg(w, h, 1, 1,
      JpegCodec.flatQuant, JpegCodec.flatQuant, 0, mosaic(4, 128, 128))
    val want = JpegCodec.decodePixels(base)
    // rewrite the 8-bit DQT segment (FF DB, len 67, id, 64 bytes) into
    // the equivalent 16-bit one (len 131, Pq=1, 64 big-endian shorts)
    val dqtAt = base.indices.dropRight(1).find(i =>
      (base(i) & 0xff) == 0xff && (base(i + 1) & 0xff) == 0xdb).get
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, dqtAt)
    out.write(0xff); out.write(0xdb)
    out.write(0); out.write(131)             // segment length
    out.write(0x10 | (base(dqtAt + 4) & 0x0f)) // Pq=1, same table id
    for (i <- 0 until 64) {
      out.write(0)                           // high byte
      out.write(base(dqtAt + 5 + i) & 0xff)  // low byte = 8-bit value
    }
    out.write(base, dqtAt + 69, base.length - (dqtAt + 69))
    val wide = out.toByteArray
    val gotWide = JpegCodec.decodePixels(wide)
    assert(gotWide.samples.sameElements(want.samples))
    // SOF1 marker: same baseline payload, extended-sequential marker
    val sof1 = base.clone()
    val sofAt = sof1.indices.dropRight(1).find(i =>
      (sof1(i) & 0xff) == 0xff && (sof1(i + 1) & 0xff) == 0xc0).get
    sof1(sofAt + 1) = 0xc1.toByte
    assert(JpegCodec.decodePixels(sof1).samples.sameElements(want.samples))
  }

  test("malformed input fails loudly: truncation, lossless SOF, " +
      "bad marker, RST outside scan") {
    val good = JpegCodec.encodeJpeg(16, 16, 3, 1,
      JpegCodec.flatQuant, JpegCodec.flatQuant, 0, mosaic(0, 128, 128))
    intercept[IllegalArgumentException] {
      JpegCodec.decodePixels(good.take(good.length / 2))
    }
    intercept[IllegalArgumentException] {
      JpegCodec.decodePixels(Array[Byte](0xff.toByte, 0xd8.toByte, 0x00))
    }
    // flip SOF0 -> SOF3 (lossless, genuinely unsupported): the
    // progressive flavor moved to the supported set in
    // JpegProgressiveSpec, so the fail-loudly pin rides on SOF3
    val bad = good.clone()
    val sofAt = bad.indices.dropRight(1).find(i =>
      (bad(i) & 0xff) == 0xff && (bad(i + 1) & 0xff) == 0xc0).get
    bad(sofAt + 1) = 0xc3.toByte
    val e = intercept[IllegalArgumentException] {
      JpegCodec.decodePixels(bad)
    }
    assert(e.getMessage.contains("unsupported JPEG flavor"))
  }

  test("restart-marker damage is caught (wrong RST index)") {
    val good = JpegCodec.encodeJpeg(32, 32, 1, 1,
      JpegCodec.flatQuant, JpegCodec.flatQuant, 1, mosaic(2, 128, 128))
    // find the first RST0 (FF D0) after SOS and bump its index
    val sosAt = good.indices.dropRight(1).find(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xda).get
    val rstAt = (sosAt until good.length - 1).find(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xd0).get
    val bad = good.clone()
    bad(rstAt + 1) = 0xd5.toByte
    intercept[IllegalArgumentException] { JpegCodec.decodePixels(bad) }
  }
}
