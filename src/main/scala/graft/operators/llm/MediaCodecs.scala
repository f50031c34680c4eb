package graft.operators.llm

/**
 * Dependency-free media codecs — REAL byte-level decode for the three
 * formats whose containers need nothing beyond the JDK (no codec
 * libraries, which the frozen offline build cannot take): uncompressed
 * 24-bpp BMP (BITMAPFILEHEADER + BITMAPINFOHEADER + padded bottom-up
 * BGR rows), PCM16 mono RIFF/WAVE, and PNG — all five color types
 * (gray / RGB / palette / gray+alpha / RGBA) at their legal bit
 * depths (1/2/4/8/16), tRNS transparency, Adam7 interlace
 * (CRC-verified chunk walk + java.util.zip Inflater + the five
 * scanline unfilters). These replace the former deterministic-fake
 * decode stub in [[MultimodalOps.decodeBatch]] for payloads whose magic
 * bytes match; baseline JPEG lives in [[JpegCodec]], MJPEG-in-AVI
 * video in [[AviCodec]], ISO-BMFF (MP4) video in [[Mp4Codec]],
 * Matroska/WebM video in [[MkvCodec]]; unsniffed formats take the
 * documented fallback, and non-MJPEG video CODECS inside a walked
 * container degrade to exact-extent features (a real deployment drops
 * a JNI/codec-library decoder into the same mapPartitions slot).
 *
 * Encoders exist so fixtures can synthesize VALID files deterministically
 * from row data; decoders walk the actual bytes (row padding, LE fields,
 * RIFF chunk alignment), so a round-trip failure — not a schema check —
 * is what catches an off-by-one. Malformed input fails LOUDLY
 * (IllegalArgumentException), never silently decodes garbage.
 */
object MediaCodecs {

  /** Hostile-header memory bound, shared by the PNG and JPEG decoders
    * (GifCodec carries the same constant): a lying dimension field must
    * fail the decode LOUDLY (IllegalArgumentException → the
    * MultimodalOps damage fallback) before any geometry-sized
    * allocation — the previous Int.MaxValue/4 bounds only prevented
    * array-size overflow and still allowed a ~200-byte crafted header
    * to allocate multi-GB planes, and an OutOfMemoryError is NOT
    * NonFatal: it kills the executor, not the record (r19 review).
    * 2^26 px = 8192×8192 — beyond any sane crawl thumbnail pipeline;
    * genuinely larger media takes the deterministic fallback row.
    *
    * r20 (advice): the cap is a behavior change for legitimate 67 MP+
    * media, so it is (a) CONFIGURABLE — `-Dgraft.media.maxDecodePixels=N`
    * raises it for large-media corpora (set it on the executors via
    * `spark.executor.extraJavaOptions` too) — and (b) OBSERVABLE:
    * cap rejections throw the dedicated [[DecodeCapExceeded]] (still an
    * IllegalArgumentException, so every existing damage contract holds)
    * which [[MultimodalOps.decodeCounted]] counts in an accumulator
    * instead of silently folding oversized-but-valid media into the
    * damage class. */
  val DefaultMaxDecodePixels: Long = 1L << 26
  /** Upper clamp on the configurable cap (r22 advice fix — the r21
    * clamp of Int.MaxValue/64 was BOTH wrong and inconsistent: it sat
    * below the default, so raising the cap for large-media corpora was
    * silently impossible and a value in (IntMax/64, default] silently
    * REVERTED to the higher default; and its ×64 rationale double-
    * counted — JpegCodec's cap checks already pass the ×64-inflated
    * allocation count through checkPixelCap, so the ×64 lives inside
    * the checked quantity, not outside it). The real bound: every
    * post-check allocation count is Int-typed at ≤ 9 units per checked
    * pixel (PNG 16-bit RGBA raw bytes = 8·px + one filter byte per row
    * ≤ 9·px; int sample planes ≤ 4·px; JPEG planes check their own
    * inflated counts), so cap ≤ Int.MaxValue/16 keeps all of them
    * provably inside Int range with 7·px slack. */
  val MaxConfigurableDecodePixels: Long = Int.MaxValue.toLong / 16
  require(DefaultMaxDecodePixels <= MaxConfigurableDecodePixels,
    "default decode cap must be configurable-range")
  val MaxDecodePixels: Long =
    sys.props.get("graft.media.maxDecodePixels") match {
      case None => DefaultMaxDecodePixels
      case Some(raw) =>
        // a SET-but-invalid cap fails loudly (r21 advice): silently
        // reverting to the default turned a typo'd security/size policy
        // into the opposite policy
        val v = raw.trim.toLongOption.getOrElse(
          throw new IllegalArgumentException(
            s"graft.media.maxDecodePixels='$raw' is not a number"))
        require(v > 0 && v <= MaxConfigurableDecodePixels,
          s"graft.media.maxDecodePixels=$v out of (0, " +
            s"$MaxConfigurableDecodePixels]: larger caps would let " +
            "Int-typed allocation counts overflow after the Long cap " +
            "check passed")
        v
    }

  /** Geometry-cap rejection: a subtype so callers can tell "too big to
    * decode under the configured bound" apart from "corrupt bytes" —
    * both degrade to the same deterministic fallback row, but only the
    * former is a tunable policy decision worth counting. */
  final class DecodeCapExceeded(msg: String)
      extends IllegalArgumentException(msg)

  /** Shared cap guard — every geometry-sized allocation in the PNG /
    * JPEG / GIF decoders bounds through here BEFORE allocating. */
  def checkPixelCap(pixels: Long, what: => String): Unit =
    if (pixels > MaxDecodePixels)
      throw new DecodeCapExceeded(
        s"image too large: $what exceeds $MaxDecodePixels px " +
          "(raise -Dgraft.media.maxDecodePixels to decode larger media)")

  // ---- little-endian primitives -------------------------------------

  private def le32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }

  private def le16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
  }

  private def readLe32(b: Array[Byte], off: Int): Int = {
    require(off + 4 <= b.length, s"truncated at offset $off (need 4 bytes)")
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  }

  private def readLe16(b: Array[Byte], off: Int): Int = {
    require(off + 2 <= b.length, s"truncated at offset $off (need 2 bytes)")
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  }

  // ---- rasters (shared pixel form across the codecs) ------------------

  /** Decoded pixels: `channels` interleaved samples (0..255) per pixel,
    * row-major top-down — the common currency between the per-format
    * decoders, [[boxResample]], and the re-encoders. */
  final case class Raster(width: Int, height: Int, channels: Int,
                          samples: Array[Int])

  private def rasterStats(r: Raster): (Long, Int) = {
    var sum = 0L
    var max = 0
    var i = 0
    while (i < r.samples.length) {
      val v = r.samples(i)
      sum += v
      if (v > max) max = v
      i += 1
    }
    (sum, max)
  }

  /** Integer box downsample: output pixel (ox, oy) is the rounded mean
    * of the source box [ox·w/outW, (ox+1)·w/outW) × [oy·h/outH,
    * (oy+1)·h/outH) (at least one source pixel per axis) — the standard
    * thumbnailer area average, all-integer so any engine replays it
    * exactly. Upsampling is out of contract (resize never upscales). */
  def boxResample(r: Raster, outW: Int, outH: Int): Raster = {
    require(outW >= 1 && outH >= 1 && outW <= r.width && outH <= r.height,
      s"boxResample ${r.width}x${r.height} -> ${outW}x$outH must downscale")
    if (outW == r.width && outH == r.height) return r
    val ch = r.channels
    val out = new Array[Int](outW * outH * ch)
    var oy = 0
    while (oy < outH) {
      val sy0 = oy * r.height / outH
      val sy1 = math.max(sy0 + 1, (oy + 1) * r.height / outH)
      var ox = 0
      while (ox < outW) {
        val sx0 = ox * r.width / outW
        val sx1 = math.max(sx0 + 1, (ox + 1) * r.width / outW)
        val n = (sy1 - sy0) * (sx1 - sx0)
        var c = 0
        while (c < ch) {
          var s = 0L
          var sy = sy0
          while (sy < sy1) {
            var sx = sx0
            while (sx < sx1) {
              s += r.samples((sy * r.width + sx) * ch + c)
              sx += 1
            }
            sy += 1
          }
          out((oy * outW + ox) * ch + c) = ((s + n / 2) / n).toInt
          c += 1
        }
        ox += 1
      }
      oy += 1
    }
    Raster(outW, outH, ch, out)
  }

  // ---- BMP (uncompressed 24-bpp) ------------------------------------

  /** Decoded BMP: dimensions + whole-image channel statistics computed
    * from the actual pixel bytes (every channel of every pixel visited,
    * padding skipped). */
  final case class BmpImage(width: Int, height: Int, nPixels: Long,
                            sumChannels: Long, maxChannel: Int)

  def isBmp(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte

  /** Structural sniff for DISPATCH (vs the 2-byte magic): a text payload
    * that merely starts with "BM" must not crash a 100 TB decode job, so
    * routing into [[decodeBmp]] requires the whole header to be
    * consistent — declared file size, pixel offset, depth, compression,
    * and pixel-array extent all line up. A payload passing this and then
    * failing decode is real data damage worth failing on. */
  def sniffBmp(bytes: Array[Byte]): Boolean =
    isBmp(bytes) && bytes.length >= 54 && {
      val fileSize = readLe32(bytes, 2)
      val pixelOff = readLe32(bytes, 10)
      val hdrSize = readLe32(bytes, 14)
      val width = readLe32(bytes, 18)
      val height = math.abs(readLe32(bytes, 22))
      val bpp = readLe16(bytes, 28)
      val compression = readLe32(bytes, 30)
      fileSize == bytes.length && hdrSize >= 40 && pixelOff >= 54 &&
        width > 0 && height > 0 && bpp == 24 && compression == 0 &&
        pixelOff.toLong + (((width * 3 + 3) / 4) * 4).toLong * height <=
          bytes.length
    }

  /** Build a valid bottom-up 24-bpp BMP; `pixel(x, y)` returns the
    * (r, g, b) of the pixel at image coordinates (x right, y DOWN —
    * the encoder handles the bottom-up file row order). */
  def encodeBmp(width: Int, height: Int,
                pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    val rowStride = ((width * 3 + 3) / 4) * 4
    val imageSize = rowStride * height
    val fileSize = 54 + imageSize
    val out = new Array[Byte](fileSize)
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    le32(out, 2, fileSize)
    le32(out, 10, 54)             // pixel-data offset
    le32(out, 14, 40)             // BITMAPINFOHEADER size
    le32(out, 18, width)
    le32(out, 22, height)         // positive → bottom-up row order
    le16(out, 26, 1)              // planes
    le16(out, 28, 24)             // bits per pixel
    le32(out, 30, 0)              // BI_RGB (uncompressed)
    le32(out, 34, imageSize)
    le32(out, 38, 2835); le32(out, 42, 2835)   // 72 dpi
    var y = 0
    while (y < height) {
      // file rows run bottom-up: file row y holds image row height-1-y
      val iy = height - 1 - y
      val rowOff = 54 + y * rowStride
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, iy)
        val p = rowOff + x * 3
        out(p) = b.toByte; out(p + 1) = g.toByte; out(p + 2) = r.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode an uncompressed 24-bpp BMP (bottom-up or top-down), walking
    * every pixel byte. Throws IllegalArgumentException on anything that
    * is not a well-formed BI_RGB 24-bpp file. */
  def decodeBmp(bytes: Array[Byte]): BmpImage = {
    val r = decodeBmpPixels(bytes)
    val (sum, max) = rasterStats(r)
    BmpImage(r.width, r.height, r.width.toLong * r.height, sum, max)
  }

  /** Full-pixel BMP decode: RGB interleaved, row-major TOP-DOWN
    * regardless of the file's row order (bottom-up files — positive
    * height — are flipped on read). */
  def decodeBmpPixels(bytes: Array[Byte]): Raster = {
    require(isBmp(bytes), "not a BMP (missing BM magic)")
    require(bytes.length >= 54, s"truncated BMP header (${bytes.length} bytes)")
    val pixelOff = readLe32(bytes, 10)
    val hdrSize = readLe32(bytes, 14)
    require(hdrSize >= 40, s"unsupported DIB header size $hdrSize")
    val width = readLe32(bytes, 18)
    val rawHeight = readLe32(bytes, 22)
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    val bpp = readLe16(bytes, 28)
    val compression = readLe32(bytes, 30)
    require(width > 0 && height > 0, s"bad dimensions ${width}x$rawHeight")
    require(bpp == 24, s"unsupported bit depth $bpp (only 24-bpp)")
    require(compression == 0, s"unsupported compression $compression (only BI_RGB)")
    val rowStride = ((width * 3 + 3) / 4) * 4
    require(pixelOff.toLong + rowStride.toLong * height <= bytes.length,
      s"pixel data overruns file: need ${pixelOff.toLong + rowStride.toLong * height}, have ${bytes.length}")
    val samples = new Array[Int](width * height * 3)
    var fy = 0
    while (fy < height) {
      val iy = if (topDown) fy else height - 1 - fy
      val rowOff = pixelOff + fy * rowStride
      var x = 0
      while (x < width) {
        val p = rowOff + x * 3
        val o = (iy * width + x) * 3
        // file stores BGR
        samples(o) = bytes(p + 2) & 0xff
        samples(o + 1) = bytes(p + 1) & 0xff
        samples(o + 2) = bytes(p) & 0xff
        x += 1
      }
      fy += 1
    }
    Raster(width, height, 3, samples)
  }

  // ---- WAV (PCM16 mono) ----------------------------------------------

  /** Decoded WAV: format fields + whole-signal sample statistics from
    * the actual PCM16 little-endian data bytes. */
  final case class WavAudio(channels: Int, sampleRate: Int,
                            bitsPerSample: Int, nSamples: Long,
                            sumAbs: Long, peak: Int)

  def isWav(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
      bytes(10) == 'V' && bytes(11) == 'E'

  /** Structural sniff for DISPATCH (see [[sniffBmp]]): beyond the
    * 12-byte RIFF/WAVE magic, the declared RIFF size must match the
    * payload — random text colliding with a 12-byte magic is already
    * ~impossible, but the size check also keeps truncated real WAVs out
    * of the hot path and in the caller's quarantine lane. */
  def sniffWav(bytes: Array[Byte]): Boolean =
    isWav(bytes) && readLe32(bytes, 4).toLong + 8L == bytes.length.toLong

  /** Build a valid PCM16 mono RIFF/WAVE from the sample array. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] =
    encodeWavPcm(sampleRate, 1, 16, samples.map(_.toInt))

  /** Build a valid PCM RIFF/WAVE: `bits` 8 (unsigned bytes) or 16
    * (signed LE), any channel count, `samples` frame-interleaved —
    * signed amplitudes for both depths (8-bit values are re-biased to
    * the unsigned 0..255 file form). */
  def encodeWavPcm(sampleRate: Int, channels: Int, bits: Int,
                   samples: Array[Int]): Array[Byte] = {
    require(sampleRate > 0, s"bad sample rate $sampleRate")
    require(channels >= 1, s"bad channel count $channels")
    require(bits == 8 || bits == 16, s"bits must be 8 or 16, got $bits")
    require(samples.length % channels == 0, "partial trailing frame")
    val bytesPer = bits / 8
    val dataLen = samples.length * bytesPer
    val out = new Array[Byte](44 + dataLen)
    out(0) = 'R'.toByte; out(1) = 'I'.toByte
    out(2) = 'F'.toByte; out(3) = 'F'.toByte
    le32(out, 4, 36 + dataLen)
    out(8) = 'W'.toByte; out(9) = 'A'.toByte
    out(10) = 'V'.toByte; out(11) = 'E'.toByte
    out(12) = 'f'.toByte; out(13) = 'm'.toByte
    out(14) = 't'.toByte; out(15) = ' '.toByte
    le32(out, 16, 16)             // fmt chunk size
    le16(out, 20, 1)              // PCM
    le16(out, 22, channels)
    le32(out, 24, sampleRate)
    le32(out, 28, sampleRate * channels * bytesPer) // byte rate
    le16(out, 32, channels * bytesPer)              // block align
    le16(out, 34, bits)
    out(36) = 'd'.toByte; out(37) = 'a'.toByte
    out(38) = 't'.toByte; out(39) = 'a'.toByte
    le32(out, 40, dataLen)
    var i = 0
    while (i < samples.length) {
      val v = samples(i)
      if (bits == 16) {
        require(v >= Short.MinValue && v <= Short.MaxValue,
          s"16-bit sample $v out of range")
        le16(out, 44 + 2 * i, v & 0xffff)
      } else {
        require(v >= -128 && v <= 127, s"8-bit sample $v out of range")
        out(44 + i) = ((v + 128) & 0xff).toByte
      }
      i += 1
    }
    out
  }

  /** Decode a PCM WAV — 8-bit (unsigned, re-biased to signed
    * amplitudes) or 16-bit (signed LE), any channel count — by walking
    * the RIFF chunk list (odd-sized chunks are padded to even per the
    * spec; unknown chunks are skipped, as real-world WAVs carry
    * LIST/INFO blocks). `nSamples` counts samples across ALL channels
    * (frames x channels); `sumAbs`/`peak` are over signed amplitudes
    * at source depth. Throws on non-PCM or structurally damaged
    * files. */
  def decodeWav(bytes: Array[Byte]): WavAudio = {
    require(isWav(bytes), "not a RIFF/WAVE (missing magic)")
    var off = 12
    var channels = -1
    var sampleRate = -1
    var bits = -1
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= bytes.length && (dataOff < 0 || channels < 0)) {
      val id = new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val len = readLe32(bytes, off + 4)
      require(len >= 0 && off + 8 + len.toLong <= bytes.length,
        s"chunk '$id' overruns file (len=$len at $off)")
      id match {
        case "fmt " =>
          require(len >= 16, s"fmt chunk too short ($len)")
          val fmt = readLe16(bytes, off + 8)
          require(fmt == 1, s"unsupported audio format $fmt (only PCM)")
          channels = readLe16(bytes, off + 10)
          sampleRate = readLe32(bytes, off + 12)
          bits = readLe16(bytes, off + 22)
          require(bits == 8 || bits == 16,
            s"unsupported bit depth $bits (only 8/16)")
          require(channels >= 1, s"bad channel count $channels")
        case "data" =>
          dataOff = off + 8
          dataLen = len
        case _ => ()   // LIST, INFO, fact, ... — skip
      }
      off += 8 + len + (len & 1)  // RIFF pads odd chunks to even
    }
    require(channels > 0, "no fmt chunk")
    require(dataOff >= 0, "no data chunk")
    val bytesPer = bits / 8
    require(dataLen % (bytesPer * channels) == 0,
      s"PCM data length $dataLen not a whole number of frames")
    var sumAbs = 0L
    var peak = 0
    var i = 0
    val n = dataLen / bytesPer
    while (i < n) {
      val v =
        if (bits == 16) readLe16(bytes, dataOff + 2 * i).toShort.toInt
        else (bytes(dataOff + i) & 0xff) - 128
      val a = math.abs(v)
      sumAbs += a
      if (a > peak) peak = a
      i += 1
    }
    WavAudio(channels, sampleRate, bits, n.toLong, sumAbs, peak)
  }

  // ---- PNG (non-interlaced 8-bit RGB / RGBA) -------------------------
  //
  // The zlib half of PNG ships in the JDK (java.util.zip Deflater /
  // Inflater / CRC32), so a real decode needs no codec library: chunk
  // walk with CRC verification, IDAT inflate, and the five scanline
  // unfilters (None/Sub/Up/Average/Paeth) are pure header-and-byte
  // math — the same class of decode as BMP/WAV above, closing the
  // format a real crawl archive actually carries most.

  private def be32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = ((v >> 24) & 0xff).toByte
    b(off + 1) = ((v >> 16) & 0xff).toByte
    b(off + 2) = ((v >> 8) & 0xff).toByte
    b(off + 3) = (v & 0xff).toByte
  }

  private def readBe32(b: Array[Byte], off: Int): Int = {
    require(off + 4 <= b.length, s"truncated at offset $off (need 4 bytes)")
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  }

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Decoded PNG: dimensions + channel count + whole-image channel
    * statistics from the UNFILTERED pixel bytes (alpha included for
    * RGBA — every decoded byte is visited). */
  final case class PngImage(width: Int, height: Int, channels: Int,
                            nPixels: Long, sumChannels: Long,
                            maxChannel: Int)

  def isPng(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(bytes, 0, 8), PngSig)

  /** Structural sniff for DISPATCH (see [[sniffBmp]]): the 8-byte
    * signature is already collision-proof against text, but the sniff
    * additionally requires a well-formed IHDR advertising the subset
    * this decoder handles (all five color types at their legal bit
    * depths, deflate, standard filtering, none/Adam7 interlace) so
    * unsupported-but-valid PNGs take the caller's fallback lane
    * instead of failing the decode job. */
  def sniffPng(bytes: Array[Byte]): Boolean =
    isPng(bytes) && bytes.length >= 33 &&
      readBe32(bytes, 8) == 13 &&
      bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' &&
      bytes(15) == 'R' && {
        val width = readBe32(bytes, 16)
        val height = readBe32(bytes, 20)
        val bitDepth = bytes(24) & 0xff
        val colorType = bytes(25) & 0xff
        val compression = bytes(26) & 0xff
        val filterMethod = bytes(27) & 0xff
        val interlace = bytes(28) & 0xff
        val okDepth = colorType match {
          case 0 => Set(1, 2, 4, 8, 16)(bitDepth)
          case 2 | 4 | 6 => bitDepth == 8 || bitDepth == 16
          case 3 => Set(1, 2, 4, 8)(bitDepth)
          case _ => false
        }
        width > 0 && height > 0 && okDepth && compression == 0 &&
          filterMethod == 0 && interlace <= 1
      }

  private def pngChunk(out: java.io.ByteArrayOutputStream, chunkType: String,
                       data: Array[Byte]): Unit = {
    val len = new Array[Byte](4)
    be32(len, 0, data.length)
    out.write(len)
    val t = chunkType.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    out.write(t)
    out.write(data)
    val crc = new java.util.zip.CRC32
    crc.update(t)
    crc.update(data)
    val c = new Array[Byte](4)
    be32(c, 0, crc.getValue.toInt)
    out.write(c)
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Build a valid non-interlaced 8-bit PNG; `colorType` 2 (RGB) or 6
    * (RGBA); `pixel(x, y)` returns the channel values at (x right, y
    * down). Each row's filter type cycles y % 5, so a decoder must
    * implement ALL FIVE unfilters (incl. Paeth) to reproduce the
    * pixels; the IDAT stream is split into two chunks, so it must also
    * concatenate IDATs per the spec. */
  def encodePng(width: Int, height: Int, colorType: Int,
                pixel: (Int, Int) => Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(colorType == 2 || colorType == 6,
      s"unsupported color type $colorType (2=RGB, 6=RGBA)")
    val bpp = if (colorType == 2) 3 else 4
    val stride = width * bpp
    val raw = new Array[Byte]((1 + stride) * height)
    val prior = new Array[Byte](stride)
    val cur = new Array[Byte](stride)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val ch = pixel(x, y)
        require(ch.length == bpp,
          s"pixel() returned ${ch.length} channels, need $bpp")
        var c = 0
        while (c < bpp) { cur(x * bpp + c) = ch(c).toByte; c += 1 }
        x += 1
      }
      val ft = y % 5
      val rowOff = y * (1 + stride)
      raw(rowOff) = ft.toByte
      var i = 0
      while (i < stride) {
        val left = if (i >= bpp) cur(i - bpp) & 0xff else 0
        val up = prior(i) & 0xff
        val ul = if (i >= bpp) prior(i - bpp) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        raw(rowOff + 1 + i) = (((cur(i) & 0xff) - pred) & 0xff).toByte
        i += 1
      }
      System.arraycopy(cur, 0, prior, 0, stride)
      y += 1
    }
    // BEST_SPEED: this encoder writes fixtures and resize thumbnails,
    // where per-image wall time matters and nothing hashes the
    // compressed BYTES (decoders verify stats/pixels); level 6 spent
    // ~3x the zlib time for a few hundred bytes saved on 3 KB rasters
    val deflater = new java.util.zip.Deflater(
      java.util.zip.Deflater.BEST_SPEED)
    deflater.setInput(raw)
    deflater.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished())
      zout.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val z = zout.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig)
    val ihdr = new Array[Byte](13)
    be32(ihdr, 0, width)
    be32(ihdr, 4, height)
    ihdr(8) = 8                      // bit depth
    ihdr(9) = colorType.toByte
    ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    pngChunk(out, "IHDR", ihdr)
    // two IDAT chunks: decoders must concatenate
    val mid = z.length / 2
    pngChunk(out, "IDAT", java.util.Arrays.copyOfRange(z, 0, mid))
    pngChunk(out, "IDAT", java.util.Arrays.copyOfRange(z, mid, z.length))
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Build a valid PALETTE (color type 3) PNG, fixture/test side:
    * exact `palette` (flat r,g,b triples), `pixel(x, y)` returning a
    * palette index, bit depth 1/2/4/8 (sub-byte indices packed
    * MSB-first per spec), optional Adam7 interlace (per-pass
    * scanline filtering, types cycling so every unfilter runs against
    * every pass geometry), optional `trns` alpha entries. */
  def encodePngPalette(width: Int, height: Int, palette: Array[Int],
                       pixel: (Int, Int) => Int, bitDepth: Int = 8,
                       interlaced: Boolean = false,
                       trns: Array[Int] = null): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(palette.length % 3 == 0 && palette.length >= 3 &&
      palette.length <= 768, "palette must hold 1..256 rgb triples")
    require(Set(1, 2, 4, 8)(bitDepth), s"bad palette bit depth $bitDepth")
    val nColors = palette.length / 3
    require(nColors <= (1 << bitDepth),
      s"$nColors colors exceed $bitDepth-bit indices")
    val passes: Array[(Int, Int, Int, Int)] =
      if (interlaced) Adam7 else Array((0, 0, 1, 1))
    val rawOut = new java.io.ByteArrayOutputStream()
    passes.foreach { p =>
      val pw = if (width > p._1) (width - p._1 + p._3 - 1) / p._3 else 0
      val ph = if (height > p._2) (height - p._2 + p._4 - 1) / p._4 else 0
      if (pw > 0 && ph > 0) {
        val stride = (pw * bitDepth + 7) / 8
        val prior = new Array[Byte](stride)
        val cur = new Array[Byte](stride)
        var j = 0
        while (j < ph) {
          java.util.Arrays.fill(cur, 0.toByte)
          var i = 0
          while (i < pw) {
            val idx = pixel(p._1 + i * p._3, p._2 + j * p._4)
            require(idx >= 0 && idx < nColors, s"pixel index $idx")
            if (bitDepth == 8) cur(i) = idx.toByte
            else {
              val bit = i * bitDepth
              cur(bit >> 3) = (cur(bit >> 3) |
                (idx << (8 - bitDepth - (bit & 7)))).toByte
            }
            i += 1
          }
          val ft = j % 5
          rawOut.write(ft)
          var k = 0
          while (k < stride) {
            val left = if (k >= 1) cur(k - 1) & 0xff else 0
            val up = prior(k) & 0xff
            val ul = if (k >= 1) prior(k - 1) & 0xff else 0
            val pred = ft match {
              case 0 => 0
              case 1 => left
              case 2 => up
              case 3 => (left + up) / 2
              case _ => paeth(left, up, ul)
            }
            rawOut.write(((cur(k) & 0xff) - pred) & 0xff)
            k += 1
          }
          System.arraycopy(cur, 0, prior, 0, stride)
          j += 1
        }
      }
    }
    val deflater = new java.util.zip.Deflater(
      java.util.zip.Deflater.BEST_SPEED)
    deflater.setInput(rawOut.toByteArray)
    deflater.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished())
      zout.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig)
    val ihdr = new Array[Byte](13)
    be32(ihdr, 0, width)
    be32(ihdr, 4, height)
    ihdr(8) = bitDepth.toByte
    ihdr(9) = 3
    ihdr(10) = 0; ihdr(11) = 0
    ihdr(12) = if (interlaced) 1 else 0
    pngChunk(out, "IHDR", ihdr)
    pngChunk(out, "PLTE", palette.map(_.toByte))
    if (trns != null) pngChunk(out, "tRNS", trns.map(_.toByte))
    pngChunk(out, "IDAT", zout.toByteArray)
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decode a PNG: CRC-verified chunk walk, IDAT concatenation + zlib
    * inflate, per-scanline unfiltering (all five filter types), all
    * five color types (gray / RGB / palette / gray+alpha / RGBA), bit
    * depths 1/2/4/8/16 (16-bit samples truncate to their high byte,
    * the common 8-bit rendering), tRNS transparency (palette alpha and
    * single-transparent-color for gray/RGB), and Adam7 interlacing.
    * Output channels: 1 for plain gray, 3 for plain RGB/palette, 4
    * whenever alpha exists (gray widens to RGBA). Throws
    * IllegalArgumentException on structural damage, a bad CRC, an
    * unsupported IHDR, or an IDAT stream whose inflated size disagrees
    * with the header geometry. */
  def decodePng(bytes: Array[Byte]): PngImage = {
    val r = decodePngPixels(bytes)
    val (sum, max) = rasterStats(r)
    PngImage(r.width, r.height, r.channels,
      r.width.toLong * r.height, sum, max)
  }

  /** Adam7 pass origins/steps; a single full pass when not interlaced. */
  private val Adam7: Array[(Int, Int, Int, Int)] = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Full-pixel PNG decode (same support envelope as [[decodePng]]),
    * interleaved, row-major. */
  def decodePngPixels(bytes: Array[Byte]): Raster = {
    require(isPng(bytes), "not a PNG (missing signature)")
    var off = 8
    var width = -1
    var height = -1
    var colorType = -1
    var bitDepth = -1
    var interlace = -1
    var plte: Array[Byte] = null
    var trns: Array[Byte] = null
    var sawEnd = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!sawEnd) {
      require(off + 8 <= bytes.length, s"truncated chunk header at $off")
      val len = readBe32(bytes, off)
      require(len >= 0 && off + 12 + len.toLong <= bytes.length,
        s"chunk overruns file (len=$len at $off)")
      val chunkType = new String(bytes, off + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new java.util.zip.CRC32
      crc.update(bytes, off + 4, 4 + len)
      require(crc.getValue.toInt == readBe32(bytes, off + 8 + len),
        s"bad CRC on chunk '$chunkType' at $off")
      chunkType match {
        case "IHDR" =>
          require(len == 13, s"IHDR length $len != 13")
          width = readBe32(bytes, off + 8)
          height = readBe32(bytes, off + 12)
          bitDepth = bytes(off + 16) & 0xff
          colorType = bytes(off + 17) & 0xff
          val compression = bytes(off + 18) & 0xff
          val filterMethod = bytes(off + 19) & 0xff
          interlace = bytes(off + 20) & 0xff
          require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
          checkPixelCap(width.toLong * height, s"${width}x$height")
          val okDepth = colorType match {
            case 0 => Set(1, 2, 4, 8, 16)(bitDepth)
            case 2 | 4 | 6 => bitDepth == 8 || bitDepth == 16
            case 3 => Set(1, 2, 4, 8)(bitDepth)
            case _ => false
          }
          require(okDepth,
            s"unsupported color type $colorType / bit depth $bitDepth")
          require(compression == 0 && filterMethod == 0,
            "unsupported compression/filter method")
          require(interlace == 0 || interlace == 1,
            s"unknown interlace method $interlace")
        case "PLTE" =>
          require(len % 3 == 0 && len >= 3 && len <= 768,
            s"bad PLTE length $len")
          plte = java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + len)
        case "tRNS" =>
          trns = java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + len)
        case "IDAT" =>
          require(width > 0, "IDAT before IHDR")
          idat.write(bytes, off + 8, len)
        case "IEND" => sawEnd = true
        case _ => ()   // ancillary chunks (tEXt, pHYs, ...) — skip
      }
      off += 12 + len
    }
    require(width > 0 && colorType >= 0, "no IHDR chunk")
    if (colorType == 3) require(plte != null, "palette PNG without PLTE")

    val rawCh = colorType match {
      case 0 | 3 => 1
      case 2 => 3
      case 4 => 2
      case _ => 4
    }
    val outCh =
      if (colorType == 0 && trns == null) 1
      else if ((colorType == 2 || colorType == 3) && trns == null) 3
      else 4
    val passes: Array[(Int, Int, Int, Int)] =
      if (interlace == 0) Array((0, 0, 1, 1)) else Adam7
    def passDims(p: (Int, Int, Int, Int)): (Int, Int) = (
      if (width > p._1) (width - p._1 + p._3 - 1) / p._3 else 0,
      if (height > p._2) (height - p._2 + p._4 - 1) / p._4 else 0)
    def strideOf(pw: Int): Int = (pw * rawCh * bitDepth + 7) / 8
    val totalRaw = passes.map { p =>
      val (pw, ph) = passDims(p)
      if (pw == 0 || ph == 0) 0L else ph.toLong * (1 + strideOf(pw))
    }.sum
    require(totalRaw <= Int.MaxValue &&
      width.toLong * height * outCh <= Int.MaxValue / 4,
      s"image too large: $totalRaw raw bytes")
    val raw = new Array[Byte](totalRaw.toInt)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, got, raw.length - got)
        require(n > 0 || inflater.finished(),
          "truncated or corrupt IDAT stream")
        got += n
      }
      require(got == raw.length,
        s"IDAT inflates to $got bytes, header geometry needs ${raw.length}")
      require(inflater.finished() || inflater.inflate(new Array[Byte](1)) == 0,
        "IDAT inflates past the header geometry")
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"corrupt IDAT zlib stream: $e")
    } finally inflater.end()

    // gray sub-8 expansion to 8-bit (v * 255 / (2^d - 1))
    val grayMax = (1 << math.min(bitDepth, 8)) - 1
    // tRNS comparisons at source depth
    val trnsGray = if (trns != null && (colorType == 0) && trns.length >= 2)
      ((trns(0) & 0xff) << 8 | (trns(1) & 0xff)) else -1
    val trnsRgb: Array[Int] =
      if (trns != null && colorType == 2 && trns.length >= 6)
        Array((trns(0) & 0xff) << 8 | (trns(1) & 0xff),
          (trns(2) & 0xff) << 8 | (trns(3) & 0xff),
          (trns(4) & 0xff) << 8 | (trns(5) & 0xff))
      else null

    val samples = new Array[Int](width * height * outCh)
    val bppF = math.max(1, rawCh * bitDepth / 8)
    var rawOff = 0
    val chVals = new Array[Int](4) // raw channel values at SOURCE depth
    passes.foreach { p =>
      val (pw, ph) = passDims(p)
      if (pw > 0 && ph > 0) {
        val stride = strideOf(pw)
        val prior = new Array[Byte](stride)
        val cur = new Array[Byte](stride)
        java.util.Arrays.fill(prior, 0.toByte)
        var j = 0
        while (j < ph) {
          val ft = raw(rawOff) & 0xff
          require(ft <= 4, s"bad filter type $ft")
          var i = 0
          while (i < stride) {
            val left = if (i >= bppF) cur(i - bppF) & 0xff else 0
            val up = prior(i) & 0xff
            val ul = if (i >= bppF) prior(i - bppF) & 0xff else 0
            val pred = ft match {
              case 0 => 0
              case 1 => left
              case 2 => up
              case 3 => (left + up) / 2
              case 4 => paeth(left, up, ul)
            }
            cur(i) = (((raw(rawOff + 1 + i) & 0xff) + pred) & 0xff).toByte
            i += 1
          }
          // extract this scanline's pixels into the output raster
          var px = 0
          while (px < pw) {
            var c = 0
            while (c < rawCh) {
              chVals(c) = bitDepth match {
                case 8 => cur(px * rawCh + c) & 0xff
                case 16 => cur((px * rawCh + c) * 2) & 0xff // high byte
                case d => // sub-byte: rawCh == 1 by IHDR validity
                  val bit = px * d
                  (cur(bit >> 3) >> (8 - d - (bit & 7))) & ((1 << d) - 1)
              }
              c += 1
            }
            val o = ((p._2 + j * p._4) * width + p._1 + px * p._3) * outCh
            colorType match {
              case 0 =>
                val g8 = if (bitDepth == 16) chVals(0)
                  else chVals(0) * 255 / grayMax
                if (outCh == 1) samples(o) = g8
                else {
                  // 16-bit tRNS compares the full sample; we only kept
                  // the high byte, so compare high bytes — exact for
                  // the <=8-bit depths a fixture/crawl actually uses
                  val srcV = if (bitDepth == 16) chVals(0) << 8 else chVals(0)
                  val a = if (srcV == (if (bitDepth == 16) trnsGray & 0xff00
                    else trnsGray)) 0 else 255
                  samples(o) = g8; samples(o + 1) = g8
                  samples(o + 2) = g8; samples(o + 3) = a
                }
              case 2 =>
                samples(o) = chVals(0); samples(o + 1) = chVals(1)
                samples(o + 2) = chVals(2)
                if (outCh == 4) {
                  val a = if (trnsRgb != null && {
                    val m = if (bitDepth == 16) 0xff00 else 0xffff
                    def cmp(ci: Int) = (if (bitDepth == 16) chVals(ci) << 8
                      else chVals(ci)) == (trnsRgb(ci) & m)
                    cmp(0) && cmp(1) && cmp(2)
                  }) 0 else 255
                  samples(o + 3) = a
                }
              case 3 =>
                val idx = chVals(0)
                require(3 * idx + 2 < plte.length,
                  s"palette index $idx outside PLTE")
                samples(o) = plte(3 * idx) & 0xff
                samples(o + 1) = plte(3 * idx + 1) & 0xff
                samples(o + 2) = plte(3 * idx + 2) & 0xff
                if (outCh == 4)
                  samples(o + 3) =
                    if (idx < trns.length) trns(idx) & 0xff else 255
              case 4 =>
                val g8 = chVals(0)
                samples(o) = g8; samples(o + 1) = g8; samples(o + 2) = g8
                samples(o + 3) = chVals(1)
              case _ =>
                samples(o) = chVals(0); samples(o + 1) = chVals(1)
                samples(o + 2) = chVals(2); samples(o + 3) = chVals(3)
            }
            px += 1
          }
          System.arraycopy(cur, 0, prior, 0, stride)
          rawOff += 1 + stride
          j += 1
        }
      }
    }
    Raster(width, height, outCh, samples)
  }

}
