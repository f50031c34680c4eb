package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.llm.JpegCodec

/** Pins for progressive (SOF2) decode. The JDK's javax.imageio JPEG
  * writer emits real multi-scan progressive streams (spectral
  * selection + successive approximation on DC and AC) when asked, so
  * the independent-oracle strategy carries over from the baseline
  * spec: our decoder on ImageIO-progressive bytes must agree with
  * ImageIO's own decoder within the IDCT rounding tolerance. */
class JpegProgressiveSpec extends AnyFunSuite {

  private def progressiveBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  private def isProgressive(bytes: Array[Byte]): Boolean = {
    var pos = 2
    while (pos + 4 <= bytes.length) {
      val m = bytes(pos + 1) & 0xff
      if (m == 0xc2) return true
      if (m == 0xc0 || m == 0xc1 || m == 0xda) return false
      pos += 2 + (((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff))
    }
    false
  }

  private def rgbImage(w: Int, h: Int, f: (Int, Int) => Int) = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
    img
  }

  private def grayImage(w: Int, h: Int, f: (Int, Int) => Int) = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = f(x, y)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  /** (maxDiff, avgDiff) of our decode vs ImageIO's decode of the same
    * color stream. The residual on chroma-varying 4:2:0 content is the
    * UPSAMPLER (libjpeg fancy/triangular vs our box replication), the
    * same bound the baseline spec carries — a scan-decode defect reads
    * as garbage (>60), not single digits. */
  private def diffVsJdk(bytes: Array[Byte]): (Int, Double) = {
    val jdk = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    val ours = JpegCodec.decodePixels(bytes)
    assert(ours.width == jdk.getWidth && ours.height == jdk.getHeight)
    var maxDiff = 0
    var sumDiff = 0L
    for (y <- 0 until ours.height; x <- 0 until ours.width) {
      val ref = jdk.getRGB(x, y)
      val o = (y * ours.width + x) * 3
      val d = math.max(
        math.abs(ours.samples(o) - ((ref >> 16) & 0xff)),
        math.max(math.abs(ours.samples(o + 1) - ((ref >> 8) & 0xff)),
          math.abs(ours.samples(o + 2) - (ref & 0xff))))
      maxDiff = math.max(maxDiff, d)
      sumDiff += d
    }
    (maxDiff, sumDiff.toDouble / (ours.width * ours.height))
  }

  test("ImageIO progressive color streams decode to ImageIO's own " +
      "pixels (smooth gradients, non-MCU dims; baseline-spec bound)") {
    for ((w, h) <- Seq((64, 48), (57, 41), (16, 16))) {
      // fixed slope regardless of size (a full-range ramp squeezed
      // into 16px doubles the chroma step and with it the legitimate
      // upsampler residual)
      val img = rgbImage(w, h, (x, y) => {
        val r = math.min(255, 10 + x * 4)
        val g = math.min(255, 20 + y * 4)
        val b = math.min(255, (x + y) * 3)
        (r << 16) | (g << 8) | b
      })
      val bytes = progressiveBytes(img)
      assert(isProgressive(bytes), "JDK did not write SOF2 — test fixture broken")
      val (d, avg) = diffVsJdk(bytes)
      assert(d <= 12 && avg <= 4.0,
        s"${w}x$h progressive color: maxDiff=$d avg=$avg")
    }
  }

  test("ImageIO progressive grayscale decodes to ImageIO's own raw " +
      "samples (raster-level, no color management)") {
    val bytes = progressiveBytes(grayImage(40, 33,
      (x, y) => (x * 7 + y * 5) % 256))
    assert(isProgressive(bytes))
    val jdk = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes)).getRaster
    val ours = JpegCodec.decodePixels(bytes)
    var maxDiff = 0
    for (y <- 0 until 33; x <- 0 until 40)
      maxDiff = math.max(maxDiff,
        math.abs(ours.samples(y * 40 + x) - jdk.getSample(x, y, 0)))
    assert(maxDiff <= 2, s"progressive gray: maxDiff=$maxDiff")
  }

  test("ImageIO progressive high-frequency luma noise (stress for AC " +
      "refinement correction bits) decodes to ImageIO's own pixels") {
    // r=g=b noise: Y carries full-range ACs through every scan of the
    // successive-approximation progression while chroma stays flat at
    // 128, so the box-vs-fancy upsampler difference cannot mask a
    // refinement defect — the bound stays tight
    val img = rgbImage(48, 48, (x, y) => {
      val v = (x * 131 + y * 197 + x * y * 7) % 256
      (v << 16) | (v << 8) | v
    })
    val bytes = progressiveBytes(img)
    assert(isProgressive(bytes))
    val (d, avg) = diffVsJdk(bytes)
    assert(d <= 3 && avg <= 1.5, s"progressive noise: maxDiff=$d avg=$avg")
  }

  test("progressive DC-only mosaics from our own progressive encoder " +
      "decode byte-exactly (the q115-slice property)") {
    for {
      (w, h) <- Seq((8, 8), (16, 16), (24, 16))
      nComp <- Seq(1, 3)
    } {
      val cb = 136; val cr = 146
      val bytes = JpegCodec.encodeJpegProgressive(w, h, nComp,
        JpegCodec.flatQuant, JpegCodec.flatQuant,
        (x, y) => (16 + 8 * (((x / 8) + 2 * (y / 8) + 1) % 24), cb, cr))
      val got = JpegCodec.decodePixels(bytes)
      assert(got.width == w && got.height == h &&
        got.channels == (if (nComp == 1) 1 else 3))
      def cl(v: Int) = math.max(0, math.min(255, v))
      for (y <- 0 until h; x <- 0 until w) {
        val yv = 16 + 8 * (((x / 8) + 2 * (y / 8) + 1) % 24)
        if (nComp == 1)
          assert(got.samples(y * w + x) == yv, s"gray ($x,$y) of ${w}x$h")
        else {
          val er = cl(yv + ((91881 * (cr - 128) + 32768) >> 16))
          val eg = cl(yv - ((22554 * (cb - 128) + 46802 * (cr - 128) + 32768) >> 16))
          val eb = cl(yv + ((116130 * (cb - 128) + 32768) >> 16))
          val o = (y * w + x) * 3
          assert(got.samples(o) == er && got.samples(o + 1) == eg &&
            got.samples(o + 2) == eb, s"color ($x,$y) of ${w}x$h")
        }
      }
    }
  }

  test("our progressive encoder's streams also satisfy the JDK decoder") {
    val w = 24; val h = 16
    val bytes = JpegCodec.encodeJpegProgressive(w, h, 3,
      JpegCodec.flatQuant, JpegCodec.flatQuant,
      (x, y) => (16 + 8 * (((x / 8) + 2 * (y / 8)) % 24), 132, 140))
    val jdk = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(jdk != null, "JDK rejected our progressive stream")
    val ours = JpegCodec.decodePixels(bytes)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val ref = jdk.getRGB(x, y)
      val o = (y * w + x) * 3
      maxDiff = math.max(maxDiff, math.abs(ours.samples(o) - ((ref >> 16) & 0xff)))
      maxDiff = math.max(maxDiff, math.abs(ours.samples(o + 1) - ((ref >> 8) & 0xff)))
      maxDiff = math.max(maxDiff, math.abs(ours.samples(o + 2) - (ref & 0xff)))
    }
    assert(maxDiff <= 2, s"our progressive vs JDK: maxDiff=$maxDiff")
  }
}
