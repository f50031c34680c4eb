package graft.operators.llm

/**
 * Dependency-free media codecs — REAL byte-level decode for the two
 * formats whose containers are pure header math (no codec libraries
 * needed, which the frozen offline build cannot take): uncompressed
 * 24-bpp BMP (BITMAPFILEHEADER + BITMAPINFOHEADER + padded bottom-up
 * BGR rows) and PCM16 mono RIFF/WAVE. These replace the former
 * deterministic-fake decode stub in [[MultimodalOps.decodeBatch]] for
 * payloads whose magic bytes match; formats outside this set still take
 * the documented fallback (a real deployment drops a JNI/codec-library
 * decoder into the same mapPartitions slot).
 *
 * Encoders exist so fixtures can synthesize VALID files deterministically
 * from row data; decoders walk the actual bytes (row padding, LE fields,
 * RIFF chunk alignment), so a round-trip failure — not a schema check —
 * is what catches an off-by-one. Malformed input fails LOUDLY
 * (IllegalArgumentException), never silently decodes garbage.
 */
object MediaCodecs {

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
    var sum = 0L
    var max = 0
    var y = 0
    while (y < height) {
      val rowOff = pixelOff + y * rowStride
      var x = 0
      while (x < width) {
        val p = rowOff + x * 3
        var c = 0
        while (c < 3) {
          val v = bytes(p + c) & 0xff
          sum += v
          if (v > max) max = v
          c += 1
        }
        x += 1
      }
      y += 1
    }
    // topDown only changes row ORDER, not the whole-image statistics —
    // but it must still parse (negative height is a legal header)
    val _ = topDown
    BmpImage(width, height, width.toLong * height, sum, max)
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
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, s"bad sample rate $sampleRate")
    val dataLen = samples.length * 2
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
    le16(out, 22, 1)              // mono
    le32(out, 24, sampleRate)
    le32(out, 28, sampleRate * 2) // byte rate
    le16(out, 32, 2)              // block align
    le16(out, 34, 16)             // bits per sample
    out(36) = 'd'.toByte; out(37) = 'a'.toByte
    out(38) = 't'.toByte; out(39) = 'a'.toByte
    le32(out, 40, dataLen)
    var i = 0
    while (i < samples.length) {
      le16(out, 44 + 2 * i, samples(i) & 0xffff)
      i += 1
    }
    out
  }

  /** Decode a PCM16 mono WAV by walking the RIFF chunk list (odd-sized
    * chunks are padded to even per the spec; unknown chunks are skipped,
    * as real-world WAVs carry LIST/INFO blocks). Throws on non-PCM,
    * non-16-bit, or structurally damaged files. */
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
          require(bits == 16, s"unsupported bit depth $bits (only 16)")
          require(channels == 1, s"unsupported channel count $channels (only mono)")
        case "data" =>
          dataOff = off + 8
          dataLen = len
        case _ => ()   // LIST, INFO, fact, ... — skip
      }
      off += 8 + len + (len & 1)  // RIFF pads odd chunks to even
    }
    require(channels > 0, "no fmt chunk")
    require(dataOff >= 0, "no data chunk")
    require(dataLen % 2 == 0, s"PCM16 data length $dataLen is odd")
    var sumAbs = 0L
    var peak = 0
    var i = 0
    val n = dataLen / 2
    while (i < n) {
      val v = readLe16(bytes, dataOff + 2 * i).toShort.toInt
      val a = math.abs(v)
      sumAbs += a
      if (a > peak) peak = a
      i += 1
    }
    WavAudio(channels, sampleRate, bits, n.toLong, sumAbs, peak)
  }
}
