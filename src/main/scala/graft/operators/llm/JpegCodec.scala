package graft.operators.llm

/**
 * Dependency-free JFIF (JPEG) codec — the last reference-relevant
 * media format (a web crawl's images are mostly JPEG; cf. the
 * WAT/WARC payload handling the reference delegates to
 * webarchive-commons, e.g. ia-hadoop-tools's WAT extraction pipeline),
 * closing the MediaCodecs set (BMP/WAV/PNG) without codec libraries.
 *
 * DECODER: sequential baseline/extended (SOF0/SOF1) AND progressive
 * (SOF2) DCT, 8-bit samples, 1 component (grayscale) or 3 (YCbCr),
 * any sampling factors up to 2x2 (4:4:4, 4:2:2, 4:4:0, 4:2:0), 8- or
 * 16-bit quantization tables, restart markers, APPn/COM skip. Entropy
 * decode follows ITU-T T.81 Annex F (canonical Huffman via
 * MINCODE/MAXCODE/VALPTR, EXTEND for sign-magnitude, byte-stuffed bit
 * reader); progressive streams accumulate raw coefficients across
 * scans per T.81 G.2 — spectral selection bands, DC/AC successive
 * approximation with the G.1.2.3 correction-bit refinement walk, EOB
 * runs, interleaved DC + single-component AC scans. Dequantized
 * blocks go through a separable double-precision IDCT with StrictMath
 * cosine tables (bit-deterministic across JVMs), box chroma
 * upsampling, and a fixed-point integer YCbCr->RGB (the libjpeg
 * constants, 16-bit fractional — every step replayable by an external
 * engine, which is what puts real decodes under the DuckDB oracle
 * gate: q115 fixtures are constant-per-block mosaics whose DC-only
 * blocks reconstruct EXACTLY, so the oracle recomputes whole-image
 * channel statistics in closed form). Remaining non-DCT flavors
 * (arithmetic coding, 12-bit, lossless, hierarchical) fail LOUDLY,
 * like the other codecs — never silently decode garbage.
 *
 * ENCODER (fixture/test side): baseline SOF0 with the T.81 Annex K
 * example Huffman tables, caller-supplied quantization tables, 4:4:4 /
 * 4:2:0 / 4:2:2 / 4:4:0 / grayscale, optional restart intervals; plus
 * a four-scan progressive (SOF2) variant for fixture streams
 * (encodeJpegProgressive). JpegCodecSpec and JpegProgressiveSpec pin
 * the decoder against the JDK's OWN independent codec (javax.imageio
 * both directions) within the IDCT rounding tolerance, and
 * byte-exactly on DC-only fixtures.
 */
object JpegCodec {

  // ---- shared tables --------------------------------------------------

  /** Zigzag index -> natural (row-major) index. */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** cos((2x+1) u pi / 16) * C(u) table, StrictMath so every JVM builds
    * the identical doubles (Math.cos is only required to be within 1
    * ulp; StrictMath is fdlibm-exact). */
  private val CosT: Array[Double] = {
    val t = new Array[Double](64)
    var u = 0
    while (u < 8) {
      val cu = if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0
      var x = 0
      while (x < 8) {
        t(u * 8 + x) = cu * StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
        x += 1
      }
      u += 1
    }
    t
  }

  /** T.81 Annex K.3 example Huffman tables (the de-facto standard set
    * every baseline encoder ships): (BITS[1..16], HUFFVAL). */
  private val StdDcLumaBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val StdDcLumaVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val StdDcChromaBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val StdDcChromaVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val StdAcLumaBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val StdAcLumaVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  private val StdAcChromaBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val StdAcChromaVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  def isJpeg(bytes: Array[Byte]): Boolean =
    bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff

  /** Dispatch sniff, same contract as the other codecs: SOI + a marker
    * byte — no text or other-container payload starts FF D8 FF. */
  def sniffJpeg(bytes: Array[Byte]): Boolean = isJpeg(bytes)

  // ---- decoder --------------------------------------------------------

  /** Decoded pixels: interleaved RGB (channels=3) or gray (channels=1),
    * one Int 0..255 per sample, row-major. */
  final case class JpegPixels(width: Int, height: Int, channels: Int,
                              samples: Array[Int])

  /** Whole-image statistics, the [[MediaCodecs.PngImage]] shape. */
  final case class JpegImage(width: Int, height: Int, channels: Int,
                             nPixels: Long, sumChannels: Long,
                             maxChannel: Int)

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // F.2.2.3: MINCODE/MAXCODE/VALPTR per code length 1..16
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val values: Array[Int] = vals
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l)
        k += bits(l)
        maxCode(l) = if (bits(l) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0

    /** Next entropy bit; 0xFF00 unstuffs to 0xFF, a bare marker inside
      * entropy data is malformed (RSTs are consumed between intervals,
      * never here). */
    def bit(): Int = {
      if (nBits == 0) {
        require(pos < data.length, "truncated entropy-coded segment")
        var b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          require(pos < data.length, "truncated after 0xFF in entropy data")
          val m = data(pos) & 0xff
          pos += 1
          if (m != 0x00) {
            // T.81 allows optional FF fill bytes before a marker; a
            // marker here means the scan under-ran — malformed
            throw new IllegalArgumentException(
              f"unexpected marker 0xff$m%02x inside entropy-coded data")
          }
          b = 0xff
        }
        acc = b
        nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }

    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    def byteAlign(): Unit = nBits = 0

    def decode(t: HuffTable): Int = {
      var code = bit()
      var l = 1
      while (code > t.maxCode(l)) {
        require(l < 16, "corrupt Huffman code (no match within 16 bits)")
        code = (code << 1) | bit()
        l += 1
      }
      t.values(t.valPtr(l) + code - t.minCode(l))
    }
  }

  /** F.12 EXTEND: sign-magnitude to signed. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private def readBe16(b: Array[Byte], off: Int): Int = {
    require(off + 2 <= b.length, s"truncated at offset $off (need 2 bytes)")
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  }

  private final case class Component(id: Int, h: Int, v: Int, tq: Int,
                                     var td: Int = 0, var ta: Int = 0)

  /** Full pixel decode. Fails loudly on anything outside baseline
    * sequential 8-bit (see object doc). */
  def decodePixels(bytes: Array[Byte]): JpegPixels = {
    require(isJpeg(bytes), "not a JPEG (missing SOI)")
    val qt = new Array[Array[Int]](4) // natural order
    val dcT = new Array[HuffTable](4)
    val acT = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var pos = 2
    var sawSof = false
    var progressive = false
    // progressive state: per-component RAW (undequantized) coefficient
    // planes in natural order, accumulated across scans
    var pCoefs: Array[Array[Int]] = null
    var pBlockW: Array[Int] = null
    var pBlockH: Array[Int] = null
    var pMcusX = 0; var pMcusY = 0

    def segLen(at: Int): Int = {
      val n = readBe16(bytes, at)
      require(n >= 2 && at + n <= bytes.length,
        s"bad segment length $n at offset $at")
      n
    }

    while (true) {
      require(pos + 2 <= bytes.length, "truncated before marker")
      require((bytes(pos) & 0xff) == 0xff,
        f"expected marker at $pos, got 0x${bytes(pos) & 0xff}%02x")
      var m = bytes(pos + 1) & 0xff
      pos += 2
      while (m == 0xff) { // optional fill bytes
        require(pos < bytes.length, "truncated in marker fill")
        m = bytes(pos) & 0xff; pos += 1
      }
      m match {
        case 0xdb => // DQT
          val end = pos + segLen(pos)
          var p = pos + 2
          while (p < end) {
            val pq = (bytes(p) & 0xff) >> 4
            val tq = bytes(p) & 0x0f
            require(pq <= 1, s"bad DQT precision $pq")
            require(tq <= 3, s"bad DQT id $tq")
            p += 1
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) {
              val q = if (pq == 0) { val v = bytes(p) & 0xff; p += 1; v }
                else { val v = readBe16(bytes, p); p += 2; v }
              require(q > 0, "zero quantization entry")
              t(ZigZag(i)) = q
              i += 1
            }
            qt(tq) = t
          }
          pos = end
        case 0xc4 => // DHT
          val end = pos + segLen(pos)
          var p = pos + 2
          while (p < end) {
            val tc = (bytes(p) & 0xff) >> 4
            val th = bytes(p) & 0x0f
            require(tc <= 1 && th <= 3, s"bad DHT class/id $tc/$th")
            p += 1
            val bits = new Array[Int](17)
            var total = 0
            var l = 1
            while (l <= 16) {
              bits(l) = bytes(p) & 0xff; total += bits(l); p += 1; l += 1
            }
            require(total <= 256 && p + total <= end, "bad DHT value count")
            val vals = new Array[Int](total)
            var i = 0
            while (i < total) { vals(i) = bytes(p) & 0xff; p += 1; i += 1 }
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcT(th) = t else acT(th) = t
          }
          pos = end
        case 0xc0 | 0xc1 | 0xc2 => // SOF0/1/2 (sequential / progressive)
          progressive = m == 0xc2
          val end = pos + segLen(pos)
          require((bytes(pos + 2) & 0xff) == 8,
            s"unsupported sample precision ${bytes(pos + 2) & 0xff}")
          h = readBe16(bytes, pos + 3)
          w = readBe16(bytes, pos + 5)
          require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
          val nc = bytes(pos + 7) & 0xff
          require(nc == 1 || nc == 3,
            s"unsupported component count $nc (grayscale or YCbCr only)")
          comps = (0 until nc).map { i =>
            val o = pos + 8 + 3 * i
            val hv = bytes(o + 1) & 0xff
            val c = Component(bytes(o) & 0xff, hv >> 4, hv & 0x0f,
              bytes(o + 2) & 0x0f)
            require(c.h >= 1 && c.h <= 4 && c.v >= 1 && c.v <= 4,
              s"bad sampling ${c.h}x${c.v}")
            c
          }.toArray
          sawSof = true
          pos = end
        case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
             0xcd | 0xce | 0xcf =>
          throw new IllegalArgumentException(
            f"unsupported JPEG flavor (SOF marker 0xff$m%02x — " +
              "sequential or progressive Huffman only)")
        case 0xdd => // DRI
          val end = pos + segLen(pos)
          restartInterval = readBe16(bytes, pos + 2)
          pos = end
        case 0xda => // SOS
          require(sawSof, "SOS before SOF")
          val end = pos + segLen(pos)
          val ns = bytes(pos + 2) & 0xff
          if (!progressive) { // single baseline scan
            require(ns == comps.length,
              s"partial scans unsupported ($ns of ${comps.length} components)")
            var i = 0
            while (i < ns) {
              val cs = bytes(pos + 3 + 2 * i) & 0xff
              val tt = bytes(pos + 4 + 2 * i) & 0xff
              val c = comps.find(_.id == cs).getOrElse(
                throw new IllegalArgumentException(s"SOS names unknown component $cs"))
              c.td = tt >> 4; c.ta = tt & 0x0f
              i += 1
            }
            return decodeScan(bytes, end, comps, qt, dcT, acT, w, h,
              restartInterval)
          } else { // one of many progressive scans, accumulated
            require(ns >= 1 && ns <= comps.length, s"bad scan component count $ns")
            val scanComps = new Array[Int](ns)
            var i = 0
            while (i < ns) {
              val cs = bytes(pos + 3 + 2 * i) & 0xff
              val tt = bytes(pos + 4 + 2 * i) & 0xff
              val ci = comps.indexWhere(_.id == cs)
              require(ci >= 0, s"SOS names unknown component $cs")
              comps(ci).td = tt >> 4; comps(ci).ta = tt & 0x0f
              scanComps(i) = ci
              i += 1
            }
            val ss = bytes(pos + 3 + 2 * ns) & 0xff
            val se = bytes(pos + 4 + 2 * ns) & 0xff
            val ahal = bytes(pos + 5 + 2 * ns) & 0xff
            if (pCoefs == null) {
              val hMax = comps.map(_.h).max
              val vMax = comps.map(_.v).max
              pMcusX = (w + 8 * hMax - 1) / (8 * hMax)
              pMcusY = (h + 8 * vMax - 1) / (8 * vMax)
              pBlockW = comps.map(c => pMcusX * c.h)
              pBlockH = comps.map(c => pMcusY * c.v)
              comps.indices.foreach { i => // same hostile-header stance as decodeScan
                graft.operators.llm.MediaCodecs.checkPixelCap(
                  pBlockW(i).toLong * pBlockH(i) * 64,
                  s"${pBlockW(i)}x${pBlockH(i)}-block coefficient plane")
              }
              pCoefs = comps.indices.map(i =>
                new Array[Int](pBlockW(i) * pBlockH(i) * 64)).toArray
            }
            pos = progressiveScan(bytes, end, comps, scanComps, pCoefs,
              pBlockW, pMcusX, pMcusY, dcT, acT, w, h,
              ss, se, ahal >> 4, ahal & 0x0f, restartInterval)
          }
        case 0xd9 =>
          if (progressive && pCoefs != null)
            return finishProgressive(comps, pCoefs, pBlockW, pBlockH, qt,
              w, h)
          throw new IllegalArgumentException("EOI before any scan")
        case x if x >= 0xe0 && x <= 0xef => pos += segLen(pos) // APPn
        case 0xfe => pos += segLen(pos) // COM
        case 0x01 => () // TEM, parameterless
        case x if x >= 0xd0 && x <= 0xd7 =>
          throw new IllegalArgumentException("RST marker outside a scan")
        case other =>
          throw new IllegalArgumentException(
            f"unsupported marker 0xff$other%02x")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def decodeScan(bytes: Array[Byte], scanStart: Int,
                         comps: Array[Component], qt: Array[Array[Int]],
                         dcT: Array[HuffTable], acT: Array[HuffTable],
                         w: Int, h: Int, restartInterval: Int): JpegPixels = {
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    // per-component padded sample planes — bound BEFORE allocating (the
    // decodePng stance): a hostile header must fail loudly, not OOM a
    // task with a multi-GB plane. The cap is MaxDecodePixels (r19: the
    // old Int.MaxValue/4 bound still allowed ~2 GB planes from a lying
    // SOF, and OutOfMemoryError kills the executor, not the record)
    val planeW = comps.map(c => mcusX * c.h * 8)
    val planeH = comps.map(c => mcusY * c.v * 8)
    comps.indices.foreach { i =>
      graft.operators.llm.MediaCodecs.checkPixelCap(
        planeW(i).toLong * planeH(i),
        s"${planeW(i)}x${planeH(i)} component plane")
    }
    val planes = comps.indices.map(i =>
      new Array[Int](planeW(i) * planeH(i))).toArray
    comps.foreach { c =>
      require(qt(c.tq) != null, s"component ${c.id} references missing DQT ${c.tq}")
      require(dcT(c.td) != null && acT(c.ta) != null,
        s"component ${c.id} references missing DHT ${c.td}/${c.ta}")
    }
    val br = new BitReader(bytes, scanStart)
    val pred = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    val blockOut = new Array[Int](64)
    var mcu = 0
    var rstExpect = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        // byte-align, consume RSTn, reset predictors
        br.byteAlign()
        require(br.pos + 2 <= bytes.length, "truncated at restart marker")
        require((bytes(br.pos) & 0xff) == 0xff &&
          (bytes(br.pos + 1) & 0xff) == (0xd0 + rstExpect),
          f"expected RST$rstExpect%d at ${br.pos}")
        br.pos += 2
        rstExpect = (rstExpect + 1) % 8
        java.util.Arrays.fill(pred, 0)
      }
      val my = mcu / mcusX
      val mx = mcu % mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val q = qt(c.tq)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            java.util.Arrays.fill(coef, 0)
            // DC
            val t = br.decode(dcT(c.td))
            require(t <= 11, s"bad DC magnitude $t")
            pred(ci) += extend(br.receive(t), t)
            coef(0) = pred(ci) * q(0)
            // AC
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = br.decode(acT(c.ta))
              val r = rs >> 4
              val s = rs & 0x0f
              if (s == 0) {
                if (r == 15) k += 16 else eob = true
              } else {
                k += r
                require(k < 64, "AC run past block end")
                val nat = ZigZag(k)
                coef(nat) = extend(br.receive(s), s) * q(nat)
                k += 1
              }
            }
            idct(coef, blockOut)
            // place into plane
            val px0 = (mx * c.h + bx) * 8
            val py0 = (my * c.v + by) * 8
            val pw = planeW(ci)
            var yy = 0
            while (yy < 8) {
              var xx = 0
              val rowOff = (py0 + yy) * pw + px0
              while (xx < 8) {
                planes(ci)(rowOff + xx) = blockOut(yy * 8 + xx)
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    // trailing marker sanity: EOI (or at least a marker) after the scan
    br.byteAlign()
    composePixels(planes, planeW, comps, w, h, hMax, vMax)
  }

  /** Upsample + color convert the decoded component planes — shared
    * tail of the baseline and progressive paths. */
  private def composePixels(planes: Array[Array[Int]], planeW: Array[Int],
                            comps: Array[Component], w: Int, h: Int,
                            hMax: Int, vMax: Int): JpegPixels = {
    if (comps.length == 1) {
      val out = new Array[Int](w * h)
      val pw = planeW(0)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { out(y * w + x) = planes(0)(y * pw + x); x += 1 }
        y += 1
      }
      JpegPixels(w, h, 1, out)
    } else {
      val out = new Array[Int](w * h * 3)
      val yPw = planeW(0)
      val cbPw = planeW(1)
      val crPw = planeW(2)
      val cy = comps(0); val ccb = comps(1); val ccr = comps(2)
      var y = 0
      while (y < h) {
        val yRowY = (y * cy.v / vMax) * yPw
        val yRowCb = (y * ccb.v / vMax) * cbPw
        val yRowCr = (y * ccr.v / vMax) * crPw
        var x = 0
        while (x < w) {
          val lum = planes(0)(yRowY + x * cy.h / hMax)
          val cb = planes(1)(yRowCb + x * ccb.h / hMax) - 128
          val cr = planes(2)(yRowCr + x * ccr.h / hMax) - 128
          val o = (y * w + x) * 3
          out(o) = clamp255(lum + ((91881 * cr + 32768) >> 16))
          out(o + 1) = clamp255(lum - ((22554 * cb + 46802 * cr + 32768) >> 16))
          out(o + 2) = clamp255(lum + ((116130 * cb + 32768) >> 16))
          x += 1
        }
        y += 1
      }
      JpegPixels(w, h, 3, out)
    }
  }

  /** One progressive scan (T.81 G.2): spectral selection band
    * [ss, se], successive approximation ah -> al, interleaved (DC
    * only) or single-component. Accumulates RAW coefficients into
    * `coefs` (natural order, 64 per block, MCU-padded block grid);
    * returns the position after the scan's entropy data. The AC
    * refinement walk is the G.1.2.3/libjpeg correction-bit algorithm:
    * every nonzero-history coefficient traversed carries a bit, zero
    * coefficients count against the run, and an EOB run refines the
    * remainder of the current block before skipping whole blocks. */
  private def progressiveScan(bytes: Array[Byte], start: Int,
                              comps: Array[Component], scanComps: Array[Int],
                              coefs: Array[Array[Int]], blockW: Array[Int],
                              mcusX: Int, mcusY: Int,
                              dcT: Array[HuffTable], acT: Array[HuffTable],
                              w: Int, h: Int, ss: Int, se: Int,
                              ah: Int, al: Int,
                              restartInterval: Int): Int = {
    require(ss >= 0 && se <= 63 && ss <= se, s"bad spectral band $ss..$se")
    require(al <= 13 && (ah == 0 || ah == al + 1),
      s"bad successive approximation $ah -> $al")
    if (ss == 0) require(se == 0, "progressive DC scan must have Se=0")
    else require(scanComps.length == 1, "progressive AC scan must be single-component")
    scanComps.foreach { ci =>
      val c = comps(ci)
      if (ss == 0 && ah == 0)
        require(dcT(c.td) != null, s"component ${c.id} references missing DC DHT ${c.td}")
      if (ss > 0)
        require(acT(c.ta) != null, s"component ${c.id} references missing AC DHT ${c.ta}")
    }
    val br = new BitReader(bytes, start)
    val pred = new Array[Int](comps.length)
    var eobrun = 0
    var rstExpect = 0

    def restart(): Unit = {
      br.byteAlign()
      require(br.pos + 2 <= bytes.length, "truncated at restart marker")
      require((bytes(br.pos) & 0xff) == 0xff &&
        (bytes(br.pos + 1) & 0xff) == (0xd0 + rstExpect),
        f"expected RST$rstExpect%d at ${br.pos}")
      br.pos += 2
      rstExpect = (rstExpect + 1) % 8
      java.util.Arrays.fill(pred, 0)
      eobrun = 0
    }

    def dcUnit(ci: Int, blk: Int): Unit = {
      val co = coefs(ci)
      if (ah == 0) {
        val t = br.decode(dcT(comps(ci).td))
        require(t <= 11, s"bad DC magnitude $t")
        pred(ci) += extend(br.receive(t), t)
        co(blk) = pred(ci) << al
      } else if (br.bit() != 0) co(blk) |= 1 << al
    }

    def acFirst(ta: Int, co: Array[Int], blk: Int): Unit = {
      if (eobrun > 0) eobrun -= 1
      else {
        var k = ss
        var done = false
        while (k <= se && !done) {
          val rs = br.decode(acT(ta))
          val r = rs >> 4
          val s = rs & 0x0f
          if (s == 0) {
            if (r < 15) {
              eobrun = (1 << r) - 1
              if (r > 0) eobrun += br.receive(r)
              done = true
            } else k += 16
          } else {
            k += r
            require(k <= se, "AC run past band end")
            co(blk + ZigZag(k)) = extend(br.receive(s), s) << al
            k += 1
          }
        }
      }
    }

    def acRefine(ta: Int, co: Array[Int], blk: Int): Unit = {
      val p1 = 1 << al
      var k = ss
      if (eobrun == 0) {
        var done = false
        while (k <= se && !done) {
          val rs = br.decode(acT(ta))
          var r = rs >> 4
          val s = rs & 0x0f
          var newval = 0
          if (s != 0) {
            require(s == 1, s"AC refinement magnitude $s (must be 1)")
            newval = if (br.bit() != 0) p1 else -p1
          } else if (r < 15) {
            eobrun = 1 << r // includes THIS block; decremented below
            if (r > 0) eobrun += br.receive(r)
            done = true
          } // r == 15 (ZRL): pass over 16 zero-history coefficients
          if (!done) {
            // advance over r zero-history coefficients, correcting
            // every nonzero one along the way; stop AT the (r+1)-th
            // zero — the placement position (or the ZRL-final zero)
            var atZero = false
            while (k <= se && !atZero) {
              val idx = blk + ZigZag(k)
              if (co(idx) != 0) {
                if (br.bit() != 0 && (co(idx) & p1) == 0)
                  co(idx) += (if (co(idx) >= 0) p1 else -p1)
                k += 1
              } else {
                r -= 1
                if (r < 0) atZero = true else k += 1
              }
            }
            if (newval != 0) {
              require(atZero && k <= se, "AC refinement run past band end")
              co(blk + ZigZag(k)) = newval
            }
            k += 1 // past the placement / final-zero position
          }
        }
      }
      if (eobrun > 0) {
        // EOB region: correction bits for the rest of this block's band
        while (k <= se) {
          val idx = blk + ZigZag(k)
          if (co(idx) != 0 && br.bit() != 0 && (co(idx) & p1) == 0)
            co(idx) += (if (co(idx) >= 0) p1 else -p1)
          k += 1
        }
        eobrun -= 1
      }
    }

    if (scanComps.length > 1) {
      // interleaved DC scan: walk the MCU grid
      val nMcus = mcusX * mcusY
      var mcu = 0
      while (mcu < nMcus) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0)
          restart()
        val mx = mcu % mcusX
        val my = mcu / mcusX
        var i = 0
        while (i < scanComps.length) {
          val ci = scanComps(i)
          val c = comps(ci)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              dcUnit(ci, ((my * c.v + by) * blockW(ci) + mx * c.h + bx) * 64)
              bx += 1
            }
            by += 1
          }
          i += 1
        }
        mcu += 1
      }
    } else {
      // single-component scan: walk the component's own block grid
      // (NOT MCU-padded — T.81 A.2.2 non-interleaved dimensions)
      val ci = scanComps(0)
      val c = comps(ci)
      val hMax = comps.map(_.h).max
      val vMax = comps.map(_.v).max
      val bw = ((w * c.h + hMax - 1) / hMax + 7) / 8
      val bh = ((h * c.v + vMax - 1) / vMax + 7) / 8
      val co = coefs(ci)
      val nUnits = bw * bh
      var unit = 0
      while (unit < nUnits) {
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0)
          restart()
        val blk = ((unit / bw) * blockW(ci) + unit % bw) * 64
        if (ss == 0) dcUnit(ci, blk)
        else if (ah == 0) acFirst(c.ta, co, blk)
        else acRefine(c.ta, co, blk)
        unit += 1
      }
    }
    br.byteAlign()
    br.pos
  }

  /** Dequantize + IDCT the accumulated progressive coefficients and
    * hand the planes to the shared compose tail. */
  private def finishProgressive(comps: Array[Component],
                                coefs: Array[Array[Int]],
                                blockW: Array[Int], blockH: Array[Int],
                                qt: Array[Array[Int]],
                                w: Int, h: Int): JpegPixels = {
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val planeW = comps.indices.map(i => blockW(i) * 8).toArray
    val planes = comps.indices.map(i =>
      new Array[Int](blockW(i) * blockH(i) * 64)).toArray
    val coef = new Array[Int](64)
    val blockOut = new Array[Int](64)
    var ci = 0
    while (ci < comps.length) {
      val q = qt(comps(ci).tq)
      require(q != null, s"component ${comps(ci).id} references missing DQT ${comps(ci).tq}")
      val co = coefs(ci)
      val bw = blockW(ci)
      val pw = planeW(ci)
      var b = 0
      val nBlocks = bw * blockH(ci)
      while (b < nBlocks) {
        val blk = b * 64
        var i = 0
        while (i < 64) { coef(i) = co(blk + i) * q(i); i += 1 }
        idct(coef, blockOut)
        val px0 = (b % bw) * 8
        val py0 = (b / bw) * 8
        var yy = 0
        while (yy < 8) {
          var xx = 0
          val rowOff = (py0 + yy) * pw + px0
          while (xx < 8) {
            planes(ci)(rowOff + xx) = blockOut(yy * 8 + xx)
            xx += 1
          }
          yy += 1
        }
        b += 1
      }
      ci += 1
    }
    composePixels(planes, planeW, comps, w, h, hMax, vMax)
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Separable double IDCT + level shift + clamp. Deterministic: the
    * cosine table is StrictMath, double arithmetic is IEEE, rint is
    * half-even. DC-only blocks reconstruct EXACTLY (all cosines hit the
    * u=0 row, a pure 1/8 scale), which is what makes the q115 fixture's
    * closed-form oracle possible. */
  private def idct(coef: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    // rows: for each output x, sum over u of F(u) cos-term — do 2-D as
    // two 1-D passes for 8x8=16*64 multiplies instead of 64*64
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += CosT(u * 8 + x) * coef(y * 8 + u); u += 1 }
        tmp(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += CosT(v * 8 + yy) * tmp(v * 8 + x); v += 1 }
        out(yy * 8 + x) = clamp255(StrictMath.rint(s / 4.0).toInt + 128)
        yy += 1
      }
      x += 1
    }
  }

  /** Stats-shape decode for [[MultimodalOps.decodeBatch]]. */
  def decodeJpeg(bytes: Array[Byte]): JpegImage = {
    val p = decodePixels(bytes)
    var sum = 0L
    var max = 0
    var i = 0
    while (i < p.samples.length) {
      val v = p.samples(i)
      sum += v
      if (v > max) max = v
      i += 1
    }
    JpegImage(p.width, p.height, p.channels,
      p.width.toLong * p.height, sum, max)
  }

  // ---- encoder (fixtures + tests) --------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nBits = 0
    def write(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nBits += 1
        if (nBits == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nBits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nBits > 0) { // pad with 1s (T.81 F.1.2.3)
      write(0x7f, 7 - nBits + 1)
      // write() emitted the byte once nBits hit 8
    }
  }

  /** (code, length) per symbol from a BITS/HUFFVAL spec. */
  private def encTable(bits: Array[Int], vals: Array[Int]): Array[(Int, Int)] = {
    val t = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l)) { t(vals(k)) = (code, l); code += 1; k += 1; i += 1 }
      code <<= 1
      l += 1
    }
    t
  }

  private def magnitude(v: Int): Int = {
    var a = math.abs(v)
    var n = 0
    while (a > 0) { n += 1; a >>= 1 }
    n
  }

  /** Forward DCT (separable double) + quantize (round half away from
    * zero, the libjpeg convention). `block` is level-shifted input. */
  private def fdctQuant(block: Array[Double], q: Array[Int]): Array[Int] = {
    val tmp = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += block(y * 8 + x) * CosT(u * 8 + x); x += 1 }
        tmp(y * 8 + u) = s
        y += 1
      }
      u += 1
    }
    val outC = new Array[Int](64)
    var v = 0
    while (v < 8) {
      var uu = 0
      while (uu < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) { s += tmp(y * 8 + uu) * CosT(v * 8 + y); y += 1 }
        val f = s / 4.0 / q(v * 8 + uu)
        outC(v * 8 + uu) =
          (if (f >= 0) StrictMath.floor(f + 0.5) else StrictMath.ceil(f - 0.5)).toInt
        uu += 1
      }
      v += 1
    }
    outC
  }

  /** Encode a baseline JFIF. `pixelYcc(x, y)` returns (Y, Cb, Cr) (or
    * only Y read when `nComp` = 1), each 0..255. `subsample` is the
    * luma horizontal sampling factor (1 or 2) and `subsampleV` the
    * vertical one (0 = same as `subsample`): (1,1) = 4:4:4, (2,2) =
    * 4:2:0, (2,1) = 4:2:2, (1,2) = 4:4:0 — chroma box-averaged over
    * the h x v footprint. `qLuma`/`qChroma` are 64-entry NATURAL-order
    * tables (all-ones = the q115 exact fixture). */
  def encodeJpeg(width: Int, height: Int, nComp: Int, subsample: Int,
                 qLuma: Array[Int], qChroma: Array[Int],
                 restartInterval: Int,
                 pixelYcc: (Int, Int) => (Int, Int, Int),
                 subsampleV: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(nComp == 1 || nComp == 3, s"nComp must be 1 or 3, got $nComp")
    require(subsample == 1 || subsample == 2,
      s"subsample must be 1 or 2, got $subsample")
    require(subsampleV >= 0 && subsampleV <= 2,
      s"subsampleV must be 0 (= subsample), 1 or 2, got $subsampleV")
    require(qLuma.length == 64 && (nComp == 1 || qChroma.length == 64),
      "quant tables must have 64 entries")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    marker(0xd8) // SOI
    // APP0 JFIF
    marker(0xe0); be16(16)
    out.write(Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    // DQT(s)
    def dqt(id: Int, q: Array[Int]): Unit = {
      marker(0xdb); be16(67); out.write(id)
      var i = 0
      while (i < 64) {
        val v = q(ZigZag(i))
        require(v >= 1 && v <= 255, s"8-bit DQT entry out of range: $v")
        out.write(v); i += 1
      }
    }
    dqt(0, qLuma)
    if (nComp == 3) dqt(1, qChroma)
    // SOF0
    marker(0xc0); be16(8 + 3 * nComp); out.write(8)
    be16(height); be16(width); out.write(nComp)
    val h0 = if (nComp == 3) subsample else 1
    val v0 = if (nComp == 3) (if (subsampleV == 0) subsample else subsampleV)
      else 1
    out.write(1); out.write((h0 << 4) | v0); out.write(0)
    if (nComp == 3) {
      out.write(2); out.write(0x11); out.write(1)
      out.write(3); out.write(0x11); out.write(1)
    }
    // DHT (std tables)
    def dht(tcTh: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); be16(2 + 1 + 16 + vals.length); out.write(tcTh)
      var l = 1
      while (l <= 16) { out.write(bits(l)); l += 1 }
      vals.foreach(out.write)
    }
    dht(0x00, StdDcLumaBits, StdDcLumaVals)
    dht(0x10, StdAcLumaBits, StdAcLumaVals)
    if (nComp == 3) {
      dht(0x01, StdDcChromaBits, StdDcChromaVals)
      dht(0x11, StdAcChromaBits, StdAcChromaVals)
    }
    if (restartInterval > 0) { marker(0xdd); be16(4); be16(restartInterval) }
    // SOS
    marker(0xda); be16(6 + 2 * nComp); out.write(nComp)
    out.write(1); out.write(0x00)
    if (nComp == 3) { out.write(2); out.write(0x11); out.write(3); out.write(0x11) }
    out.write(0); out.write(63); out.write(0)

    // component planes (padded to MCU multiple by edge replication)
    val mcusX = (width + 8 * h0 - 1) / (8 * h0)
    val mcusY = (height + 8 * v0 - 1) / (8 * v0)
    val lw = mcusX * h0 * 8
    val lh = mcusY * v0 * 8
    val yPlane = new Array[Int](lw * lh)
    val cw = mcusX * 8
    val ch = mcusY * 8
    val cbPlane = if (nComp == 3) new Array[Int](cw * ch) else null
    val crPlane = if (nComp == 3) new Array[Int](cw * ch) else null
    var yy = 0
    while (yy < lh) {
      val sy = math.min(yy, height - 1)
      var xx = 0
      while (xx < lw) {
        val sx = math.min(xx, width - 1)
        yPlane(yy * lw + xx) = pixelYcc(sx, sy)._1
        xx += 1
      }
      yy += 1
    }
    if (nComp == 3) {
      var cy = 0
      while (cy < ch) {
        var cx = 0
        while (cx < cw) {
          {
            // h0 x v0 box average over the replicated-edge source
            // ((1,1) degenerates to the point sample)
            var sb = 0; var sr = 0
            var dy = 0
            while (dy < v0) {
              var dx = 0
              while (dx < h0) {
                val sx = math.min(cx * h0 + dx, width - 1)
                val sy = math.min(cy * v0 + dy, height - 1)
                val p = pixelYcc(sx, sy)
                sb += p._2; sr += p._3
                dx += 1
              }
              dy += 1
            }
            val nPx = h0 * v0
            cbPlane(cy * cw + cx) = (sb + nPx / 2) / nPx
            crPlane(cy * cw + cx) = (sr + nPx / 2) / nPx
          }
          cx += 1
        }
        cy += 1
      }
    }

    val bw = new BitWriter(out)
    val dcLuma = encTable(StdDcLumaBits, StdDcLumaVals)
    val acLuma = encTable(StdAcLumaBits, StdAcLumaVals)
    val dcChroma = encTable(StdDcChromaBits, StdDcChromaVals)
    val acChroma = encTable(StdAcChromaBits, StdAcChromaVals)
    val pred = new Array[Int](nComp)
    val block = new Array[Double](64)

    def encodeBlock(plane: Array[Int], pw: Int, px0: Int, py0: Int,
                    q: Array[Int], ci: Int,
                    dc: Array[(Int, Int)], ac: Array[(Int, Int)]): Unit = {
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          block(y * 8 + x) = plane((py0 + y) * pw + px0 + x) - 128.0
          x += 1
        }
        y += 1
      }
      val c = fdctQuant(block, q)
      val diff = c(0) - pred(ci)
      pred(ci) = c(0)
      val t = magnitude(diff)
      val (dcCode, dcLen) = dc(t)
      bw.write(dcCode, dcLen)
      if (t > 0) bw.write(if (diff >= 0) diff else diff + (1 << t) - 1, t)
      var k = 1
      var run = 0
      while (k < 64) {
        val v = c(ZigZag(k))
        if (v == 0) run += 1
        else {
          while (run > 15) { val (zc, zl) = ac(0xf0); bw.write(zc, zl); run -= 16 }
          val s = magnitude(v)
          val (code, len) = ac((run << 4) | s)
          bw.write(code, len)
          bw.write(if (v >= 0) v else v + (1 << s) - 1, s)
          run = 0
        }
        k += 1
      }
      if (run > 0) { val (ec, el) = ac(0x00); bw.write(ec, el) }
    }

    var mcu = 0
    var rst = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.flush()
        marker(0xd0 + rst)
        rst = (rst + 1) % 8
        java.util.Arrays.fill(pred, 0)
      }
      val my = mcu / mcusX
      val mx = mcu % mcusX
      var by = 0
      while (by < v0) {
        var bx = 0
        while (bx < h0) {
          encodeBlock(yPlane, lw, (mx * h0 + bx) * 8, (my * v0 + by) * 8,
            qLuma, 0, dcLuma, acLuma)
          bx += 1
        }
        by += 1
      }
      if (nComp == 3) {
        encodeBlock(cbPlane, cw, mx * 8, my * 8, qChroma, 1, dcChroma, acChroma)
        encodeBlock(crPlane, cw, mx * 8, my * 8, qChroma, 2, dcChroma, acChroma)
      }
      mcu += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Encode a PROGRESSIVE (SOF2) JFIF, fixture/test side: 4:4:4 or
    * grayscale, Annex K tables, four-scan progression — interleaved
    * DC first scan at Al=1, DC refinement scan delivering the low
    * bit, then one full-band AC scan per component (Ss=1..63, no
    * successive approximation; per-block EOB, since the Annex K AC
    * tables carry no EOBn>0 symbols). Exercises spectral selection,
    * DC successive approximation, multi-scan accumulation and the
    * non-interleaved walk on the decode side; AC refinement decode is
    * pinned against ImageIO-written streams (JpegProgressiveSpec),
    * whose default progression uses it. Same DC-exactness property as
    * [[encodeJpeg]]: x == ((x>>1)<<1 | (x&1)) in two's complement, so
    * DC-only fixtures reconstruct byte-identically. */
  def encodeJpegProgressive(width: Int, height: Int, nComp: Int,
                            qLuma: Array[Int], qChroma: Array[Int],
                            pixelYcc: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(nComp == 1 || nComp == 3, s"nComp must be 1 or 3, got $nComp")
    require(qLuma.length == 64 && (nComp == 1 || qChroma.length == 64),
      "quant tables must have 64 entries")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    marker(0xd8)
    marker(0xe0); be16(16)
    out.write(Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    def dqt(id: Int, q: Array[Int]): Unit = {
      marker(0xdb); be16(67); out.write(id)
      var i = 0
      while (i < 64) {
        val v = q(ZigZag(i))
        require(v >= 1 && v <= 255, s"8-bit DQT entry out of range: $v")
        out.write(v); i += 1
      }
    }
    dqt(0, qLuma)
    if (nComp == 3) dqt(1, qChroma)
    marker(0xc2); be16(8 + 3 * nComp); out.write(8) // SOF2
    be16(height); be16(width); out.write(nComp)
    out.write(1); out.write(0x11); out.write(0)
    if (nComp == 3) {
      out.write(2); out.write(0x11); out.write(1)
      out.write(3); out.write(0x11); out.write(1)
    }
    def dht(tcTh: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); be16(2 + 1 + 16 + vals.length); out.write(tcTh)
      var l = 1
      while (l <= 16) { out.write(bits(l)); l += 1 }
      vals.foreach(out.write)
    }
    dht(0x00, StdDcLumaBits, StdDcLumaVals)
    dht(0x10, StdAcLumaBits, StdAcLumaVals)
    if (nComp == 3) {
      dht(0x01, StdDcChromaBits, StdDcChromaVals)
      dht(0x11, StdAcChromaBits, StdAcChromaVals)
    }

    // all coefficients up front (4:4:4 -> one shared block grid)
    val bwX = (width + 7) / 8
    val bwY = (height + 7) / 8
    val nBlocks = bwX * bwY
    val coefs = Array.ofDim[Int](nComp, nBlocks, 64)
    val block = new Array[Double](64)
    var ci = 0
    while (ci < nComp) {
      val q = if (ci == 0) qLuma else qChroma
      var b = 0
      while (b < nBlocks) {
        val px0 = (b % bwX) * 8
        val py0 = (b / bwX) * 8
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val sx = math.min(px0 + x, width - 1)
            val sy = math.min(py0 + y, height - 1)
            val p = pixelYcc(sx, sy)
            block(y * 8 + x) =
              (if (ci == 0) p._1 else if (ci == 1) p._2 else p._3) - 128.0
            x += 1
          }
          y += 1
        }
        coefs(ci)(b) = fdctQuant(block, q)
        b += 1
      }
      ci += 1
    }

    val dcLuma = encTable(StdDcLumaBits, StdDcLumaVals)
    val acLuma = encTable(StdAcLumaBits, StdAcLumaVals)
    val dcChroma = encTable(StdDcChromaBits, StdDcChromaVals)
    val acChroma = encTable(StdAcChromaBits, StdAcChromaVals)
    def sos(comps: Seq[Int], ss: Int, se: Int, ahal: Int): Unit = {
      marker(0xda); be16(6 + 2 * comps.length); out.write(comps.length)
      comps.foreach { c =>
        out.write(c + 1)
        out.write((if (c == 0) 0x00 else 0x11))
      }
      out.write(ss); out.write(se); out.write(ahal)
    }

    // scan 1: interleaved DC first, Al=1
    sos(0 until nComp, 0, 0, 0x01)
    locally {
      val bw = new BitWriter(out)
      val pred = new Array[Int](nComp)
      var b = 0
      while (b < nBlocks) {
        var c = 0
        while (c < nComp) {
          val dc = coefs(c)(b)(0) >> 1
          val diff = dc - pred(c)
          pred(c) = dc
          val t = magnitude(diff)
          val (code, len) = (if (c == 0) dcLuma else dcChroma)(t)
          bw.write(code, len)
          if (t > 0) bw.write(if (diff >= 0) diff else diff + (1 << t) - 1, t)
          c += 1
        }
        b += 1
      }
      bw.flush()
    }
    // scan 2: interleaved DC refinement, Al=0 (one raw bit per block)
    sos(0 until nComp, 0, 0, 0x10)
    locally {
      val bw = new BitWriter(out)
      var b = 0
      while (b < nBlocks) {
        var c = 0
        while (c < nComp) {
          bw.write(coefs(c)(b)(0) & 1, 1)
          c += 1
        }
        b += 1
      }
      bw.flush()
    }
    // scans 3..: one full-band AC scan per component
    var sc = 0
    while (sc < nComp) {
      sos(Seq(sc), 1, 63, 0x00)
      val bw = new BitWriter(out)
      val ac = if (sc == 0) acLuma else acChroma
      var b = 0
      while (b < nBlocks) {
        val c = coefs(sc)(b)
        var k = 1
        var run = 0
        while (k < 64) {
          val v = c(ZigZag(k))
          if (v == 0) run += 1
          else {
            while (run > 15) { val (zc, zl) = ac(0xf0); bw.write(zc, zl); run -= 16 }
            val s = magnitude(v)
            val (code, len) = ac((run << 4) | s)
            bw.write(code, len)
            bw.write(if (v >= 0) v else v + (1 << s) - 1, s)
            run = 0
          }
          k += 1
        }
        if (run > 0) { val (ec, el) = ac(0x00); bw.write(ec, el) }
        b += 1
      }
      bw.flush()
      sc += 1
    }
    marker(0xd9)
    out.toByteArray
  }

  /** All-ones quant table — lossless-for-DC fixtures (q115). */
  def flatQuant: Array[Int] = Array.fill(64)(1)
}
