package graft.operators.llm

import MediaCodecs.Raster

/**
 * Dependency-free GIF codec (87a/89a) — the palette format a 20-year
 * web crawl carries alongside JPEG/PNG. DECODER: logical screen +
 * global/local color tables, full variable-width LZW (code growth to
 * 12 bits, CLEAR resets, deferred-clear streams with a full
 * dictionary), interlaced row order (the four-pass 8/8/4/2 schedule),
 * 89a graphic-control transparency (alpha channel in the output
 * raster), and extension/sub-block skipping. Animations decode their
 * FIRST frame (the still-image policy; frame counting is reported so
 * a caller can see there were more). ENCODER (fixture/test side):
 * valid single-image GIF89a with an exact caller palette, real LZW
 * compression (dictionary reset at 4096), optional interlace and
 * transparent index. GifCodecSpec round-trips both and pins the
 * decoder against the JDK's independent javax.imageio GIF codec both
 * directions — GIF is lossless over a palette, so the pins are
 * byte-exact, no tolerance.
 *
 * Malformed input fails LOUDLY (IllegalArgumentException), matching
 * the MediaCodecs contract; [[MultimodalOps]] decides fallback policy.
 */
object GifCodec {

  def sniffGif(bytes: Array[Byte]): Boolean =
    bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == '8' &&
      (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'

  /** Whole-image statistics over the decoded raster (the
    * [[MediaCodecs.PngImage]] shape) + how many frames the container
    * declared (1 for a still; >1 means an animation whose first frame
    * this decode is). */
  final case class GifImage(width: Int, height: Int, channels: Int,
                            nPixels: Long, sumChannels: Long,
                            maxChannel: Int, nFrames: Int)

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"bad GIF: $msg")

  private def u8(b: Array[Byte], off: Int): Int = {
    if (off >= b.length) fail(s"truncated at offset $off")
    b(off) & 0xff
  }

  private def u16(b: Array[Byte], off: Int): Int =
    u8(b, off) | (u8(b, off + 1) << 8)

  // ---- decoder --------------------------------------------------------

  /** Decode the first frame onto the logical screen. Returns RGB
    * (channels=3), or RGBA (channels=4) when the frame has a
    * transparent index — transparent pixels and uncovered canvas get
    * alpha 0. */
  def decodeGifPixels(bytes: Array[Byte]): Raster =
    decodeInternal(bytes, firstFrameOnly = true)._1

  def decodeGif(bytes: Array[Byte]): GifImage = {
    val (r, nFrames) = decodeInternal(bytes, firstFrameOnly = false)
    var sum = 0L
    var max = 0
    var i = 0
    while (i < r.samples.length) {
      sum += r.samples(i)
      if (r.samples(i) > max) max = r.samples(i)
      i += 1
    }
    GifImage(r.width, r.height, r.channels,
      r.width.toLong * r.height, sum, max, nFrames)
  }

  /** Returns (first-frame raster, frame count). When `firstFrameOnly`,
    * stops at the first frame (frame count reported as 1) — the lazy
    * path for pixel consumers; the stats path walks the remaining
    * frame headers (skipping their LZW data block-by-block, never
    * decompressing) to count frames. */
  private def decodeInternal(bytes: Array[Byte],
                             firstFrameOnly: Boolean): (Raster, Int) = {
    require(sniffGif(bytes), "not a GIF payload")
    val sw = u16(bytes, 6)
    val sh = u16(bytes, 8)
    if (sw <= 0 || sh <= 0) fail(s"bad logical screen ${sw}x$sh")
    val nPx = sw.toLong * sh
    MediaCodecs.checkPixelCap(nPx, s"logical screen ${sw}x$sh")
    val flags = u8(bytes, 10)
    val bgIndex = u8(bytes, 11)
    var off = 13
    val gct: Array[Int] =
      if ((flags & 0x80) != 0) {
        val n = 2 << (flags & 7)
        val t = readColorTable(bytes, off, n)
        off += 3 * n
        t
      } else null

    var raster: Raster = null
    var frames = 0
    var transparent = -1 // from the pending graphic control extension
    var done = false
    while (!done) {
      u8(bytes, off) match {
        case 0x3b => done = true // trailer
        case 0x21 => // extension: label + sub-blocks
          val label = u8(bytes, off + 1)
          if (label == 0xf9 && u8(bytes, off + 2) >= 4) {
            val gcFlags = u8(bytes, off + 3)
            transparent =
              if ((gcFlags & 1) != 0) u8(bytes, off + 6) else -1
          }
          off = skipSubBlocks(bytes, off + 2)
        case 0x2c => // image descriptor
          val left = u16(bytes, off + 1)
          val top = u16(bytes, off + 3)
          val iw = u16(bytes, off + 5)
          val ih = u16(bytes, off + 7)
          val iFlags = u8(bytes, off + 9)
          off += 10
          val lct: Array[Int] =
            if ((iFlags & 0x80) != 0) {
              val n = 2 << (iFlags & 7)
              val t = readColorTable(bytes, off, n)
              off += 3 * n
              t
            } else null
          val palette = if (lct != null) lct else gct
          if (palette == null) fail("frame has neither local nor global color table")
          if (iw <= 0 || ih <= 0 || left + iw > sw || top + ih > sh)
            fail(s"frame rect ${iw}x$ih+$left+$top outside ${sw}x$sh screen")
          frames += 1
          if (frames == 1) {
            val minCode = u8(bytes, off)
            val (indices, next) = lzwDecode(bytes, off + 1, minCode, iw * ih)
            off = next
            raster = compose(sw, sh, bgIndex, gct, left, top, iw, ih,
              (iFlags & 0x40) != 0, indices, palette, transparent)
            if (firstFrameOnly) done = true
          } else {
            off = skipSubBlocks(bytes, off + 1) // later frames: headers only
          }
          transparent = -1 // GCE applies to one following image
        case other => fail(f"unknown block 0x$other%02x at offset $off")
      }
    }
    if (raster == null) fail("no image frame before trailer")
    (raster, math.max(frames, 1))
  }

  /** Every `stride`-th frame of a (possibly animated) GIF, decoded
    * STANDALONE as its local rect (no canvas compositing — the
    * sampler consumes per-frame features, not a timed playback).
    * ONE walk over the container; skipped frames advance block-wise
    * past their LZW data without decompressing — at a 1-in-N stride,
    * (N-1)/N of the LZW work is never done, the AVI sampler's
    * laziness contract. */
  def sampleFrames(bytes: Array[Byte], stride: Int): IndexedSeq[(Int, Raster)] = {
    require(stride > 0, s"stride must be positive, got $stride")
    require(sniffGif(bytes), "not a GIF payload")
    val flags = u8(bytes, 10)
    var off = 13
    val gct: Array[Int] =
      if ((flags & 0x80) != 0) {
        val n = 2 << (flags & 7)
        val t = readColorTable(bytes, off, n)
        off += 3 * n
        t
      } else null
    val outFrames = IndexedSeq.newBuilder[(Int, Raster)]
    var frameIdx = 0
    var transparent = -1
    var done = false
    while (!done) {
      u8(bytes, off) match {
        case 0x3b => done = true
        case 0x21 =>
          val label = u8(bytes, off + 1)
          if (label == 0xf9 && u8(bytes, off + 2) >= 4) {
            val gcFlags = u8(bytes, off + 3)
            transparent =
              if ((gcFlags & 1) != 0) u8(bytes, off + 6) else -1
          }
          off = skipSubBlocks(bytes, off + 2)
        case 0x2c =>
          val iw = u16(bytes, off + 5)
          val ih = u16(bytes, off + 7)
          val iFlags = u8(bytes, off + 9)
          off += 10
          val lct: Array[Int] =
            if ((iFlags & 0x80) != 0) {
              val n = 2 << (iFlags & 7)
              val t = readColorTable(bytes, off, n)
              off += 3 * n
              t
            } else null
          if (frameIdx % stride == 0) {
            val palette = if (lct != null) lct else gct
            if (palette == null) fail("frame has neither local nor global color table")
            if (iw <= 0 || ih <= 0 || iw.toLong * ih > (1L << 26))
              fail(s"bad frame rect ${iw}x$ih")
            val minCode = u8(bytes, off)
            val (indices, next) = lzwDecode(bytes, off + 1, minCode, iw * ih)
            off = next
            outFrames += ((frameIdx,
              frameRaster(iw, ih, (iFlags & 0x40) != 0, indices,
                palette, transparent)))
          } else {
            off = skipSubBlocks(bytes, off + 1) // past minCode + LZW data
          }
          frameIdx += 1
          transparent = -1
        case other => fail(f"unknown block 0x$other%02x at offset $off")
      }
    }
    outFrames.result()
  }

  /** GIF interlace row order (the four-pass 8/8/4/2 schedule), or the
    * identity for non-interlaced streams — shared by the decoder's two
    * raster builders and the encoder. */
  private def interlaceRowOrder(h: Int, interlaced: Boolean): Array[Int] =
    if (!interlaced) Array.range(0, h)
    else {
      val rows = new Array[Int](h)
      var k = 0
      for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
        var r = start
        while (r < h) { rows(k) = r; k += 1; r += step }
      }
      rows
    }

  /** Standalone frame rect as a raster (RGB, or RGBA when the frame
    * has a transparent index), interlace-aware. */
  private def frameRaster(iw: Int, ih: Int, interlaced: Boolean,
                          indices: Array[Int], palette: Array[Int],
                          transparent: Int): Raster = {
    val ch = if (transparent >= 0) 4 else 3
    val out = new Array[Int](iw * ih * ch)
    val rowOrder = interlaceRowOrder(ih, interlaced)
    var srcRow = 0
    while (srcRow < ih) {
      val y = rowOrder(srcRow)
      var x = 0
      while (x < iw) {
        val idx = indices(srcRow * iw + x)
        if (3 * idx + 2 >= palette.length) fail(s"pixel index $idx outside palette")
        val o = (y * iw + x) * ch
        if (idx != transparent) {
          out(o) = palette(3 * idx)
          out(o + 1) = palette(3 * idx + 1)
          out(o + 2) = palette(3 * idx + 2)
          if (ch == 4) out(o + 3) = 255
        }
        x += 1
      }
      srcRow += 1
    }
    Raster(iw, ih, ch, out)
  }

  private def readColorTable(b: Array[Byte], off: Int, n: Int): Array[Int] = {
    if (off + 3 * n > b.length) fail("truncated color table")
    val t = new Array[Int](3 * n)
    var i = 0
    while (i < 3 * n) { t(i) = b(off + i) & 0xff; i += 1 }
    t
  }

  private def skipSubBlocks(b: Array[Byte], off0: Int): Int = {
    var off = off0
    var len = u8(b, off)
    while (len != 0) {
      off += 1 + len
      len = u8(b, off)
    }
    off + 1
  }

  /** Paint the frame onto the logical screen. Canvas outside the frame
    * rect: background color when the GLOBAL table covers it and the
    * frame is opaque; transparent (alpha 0) otherwise. */
  private def compose(sw: Int, sh: Int, bgIndex: Int, gct: Array[Int],
                      left: Int, top: Int, iw: Int, ih: Int,
                      interlaced: Boolean, indices: Array[Int],
                      palette: Array[Int], transparent: Int): Raster = {
    val hasAlpha = transparent >= 0 || left != 0 || top != 0 ||
      iw != sw || ih != sh
    val ch = if (hasAlpha) 4 else 3
    val out = new Array[Int](sw * sh * ch)
    if (hasAlpha && gct != null && transparent < 0) {
      // uncovered canvas takes the background color, opaque
      val bo = 3 * bgIndex
      if (bo + 2 < gct.length) {
        var p = 0
        while (p < sw * sh) {
          out(p * 4) = gct(bo); out(p * 4 + 1) = gct(bo + 1)
          out(p * 4 + 2) = gct(bo + 2); out(p * 4 + 3) = 255
          p += 1
        }
      }
    }
    val rowOrder = interlaceRowOrder(ih, interlaced)
    var srcRow = 0
    while (srcRow < ih) {
      val y = top + rowOrder(srcRow)
      var x = 0
      while (x < iw) {
        val idx = indices(srcRow * iw + x)
        if (3 * idx + 2 >= palette.length) fail(s"pixel index $idx outside palette")
        val o = ((y * sw) + left + x) * ch
        if (idx == transparent) {
          // leave canvas (alpha 0 unless background-painted)
        } else {
          out(o) = palette(3 * idx)
          out(o + 1) = palette(3 * idx + 1)
          out(o + 2) = palette(3 * idx + 2)
          if (ch == 4) out(o + 3) = 255
        }
        x += 1
      }
      srcRow += 1
    }
    Raster(sw, sh, ch, out)
  }

  /** Variable-width LZW over the data sub-blocks at `off`. Returns
    * (pixel indices, offset past the data's 0 terminator). Handles
    * code growth to 12 bits, CLEAR resets, the first-code and
    * code==next special cases, and deferred-clear streams (full
    * dictionary, no reset).
    *
    * WIDTH SYNC (the classic off-by-one): growth is keyed to codes
    * READ since the last clear, not to dictionary adds — the encoder
    * checks `free > maxcode` after WRITING each code and before
    * adding that round's entry, so the decoder's mirror is "after
    * reading the k-th code, grow when clear+2+k first exceeds
    * 2^width" (the giflib RunningCode rule). Keying growth to the
    * add counter instead reads one code too many at the old width
    * and shears the whole remaining stream. */
  private def lzwDecode(b: Array[Byte], off0: Int, minCode: Int,
                        nPixels: Int): (Array[Int], Int) = {
    if (minCode < 2 || minCode > 8) fail(s"LZW min code size $minCode")
    val clear = 1 << minCode
    val eoi = clear + 1
    // dictionary as (prefix chain, suffix byte)
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    var next = clear + 2
    var width = minCode + 1
    var codesRead = 0
    val out = new Array[Int](nPixels)
    var outN = 0
    val stack = new Array[Int](4096)

    var off = off0
    var blockLeft = 0
    var bitBuf = 0
    var bitCnt = 0
    var prev = -1
    var done = false
    def drainToTerminator(): Unit = {
      off += blockLeft // rest of the current sub-block, if any
      var len = u8(b, off); off += 1
      while (len != 0) { off += len; len = u8(b, off); off += 1 }
    }
    while (!done) {
      // refill
      while (bitCnt < width && !done) {
        if (blockLeft == 0) {
          blockLeft = u8(b, off); off += 1
          if (blockLeft == 0) {
            if (outN < nPixels) fail(s"LZW data ended at $outN of $nPixels pixels")
            done = true
          }
        }
        if (!done) {
          bitBuf |= u8(b, off) << bitCnt
          bitCnt += 8
          off += 1
          blockLeft -= 1
        }
      }
      if (!done) {
        val code = bitBuf & ((1 << width) - 1)
        bitBuf >>>= width
        bitCnt -= width
        codesRead += 1
        if (clear + 2 + codesRead > (1 << width) && width < 12) width += 1
        if (code == clear) {
          next = clear + 2
          width = minCode + 1
          codesRead = 0
          prev = -1
        } else if (code == eoi) {
          if (outN < nPixels) fail(s"EOI at $outN of $nPixels pixels")
          drainToTerminator()
          done = true
        } else {
          if (code >= next && !(code == next && prev >= 0))
            fail(s"LZW code $code out of range (dict $next)")
          // expand code (or prev+first(prev) for the code==next case)
          var sp = 0
          var c = if (code == next) prev else code
          while (c >= clear + 2) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
          if (c >= clear) fail(s"corrupt LZW chain at code $code")
          val first = c
          // emit: root, reversed stack, (+ first again for code==next)
          if (outN >= nPixels) fail("LZW produced too many pixels")
          out(outN) = first; outN += 1
          while (sp > 0) {
            sp -= 1
            if (outN >= nPixels) fail("LZW produced too many pixels")
            out(outN) = stack(sp); outN += 1
          }
          if (code == next) {
            if (outN >= nPixels) fail("LZW produced too many pixels")
            out(outN) = first; outN += 1
          }
          if (prev >= 0 && next < 4096) {
            prefix(next) = prev
            suffix(next) = first
            next += 1
          }
          prev = code
          if (outN == nPixels) {
            // stream complete: accept either immediate EOI or more
            // data we ignore; walk to the block terminator
            drainToTerminator()
            done = true
          }
        }
      }
    }
    (out, off)
  }

  // ---- encoder (fixture side) -----------------------------------------

  /** Encode a single-image GIF89a: exact `palette` (packed r,g,b
    * triples, 2..256 entries), `pixel(x, y)` returning a palette
    * index, optional interlace and transparent index. The color table
    * written is the palette padded to the next power of two. */
  def encodeGif(width: Int, height: Int, palette: Array[Int],
                pixel: (Int, Int) => Int, interlaced: Boolean = false,
                transparentIndex: Int = -1): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(palette.length % 3 == 0 && palette.length >= 6 &&
      palette.length <= 768, s"palette must hold 2..256 rgb triples")
    val nColors = palette.length / 3
    var tableBits = 1
    while ((1 << tableBits) < nColors) tableBits += 1
    val tableSize = 1 << tableBits
    require(transparentIndex < nColors, "transparent index outside palette")

    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    le16(width); le16(height)
    out.write(0x80 | ((tableBits - 1) & 7) << 4 | ((tableBits - 1) & 7)) // GCT
    out.write(0) // background index
    out.write(0) // aspect
    var i = 0
    while (i < 3 * tableSize) {
      out.write(if (i < palette.length) palette(i) else 0)
      i += 1
    }
    if (transparentIndex >= 0) {
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(1) // transparency flag, disposal 0
      le16(0) // delay
      out.write(transparentIndex)
      out.write(0)
    }
    writeImageBlock(out, width, height, nColors, tableBits, pixel,
      interlaced)
    out.write(0x3b)
    out.toByteArray
  }

  /** Encode a multi-frame GIF89a "animation": shared global palette,
    * every frame full-rect, no disposal/delay control (the sampler
    * consumes frames standalone, not as a timed playback). */
  def encodeGifAnimation(width: Int, height: Int, palette: Array[Int],
                         frames: Seq[(Int, Int) => Int]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(frames.nonEmpty, "at least one frame required")
    require(palette.length % 3 == 0 && palette.length >= 6 &&
      palette.length <= 768, s"palette must hold 2..256 rgb triples")
    val nColors = palette.length / 3
    var tableBits = 1
    while ((1 << tableBits) < nColors) tableBits += 1
    val tableSize = 1 << tableBits
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    le16(width); le16(height)
    out.write(0x80 | ((tableBits - 1) & 7) << 4 | ((tableBits - 1) & 7))
    out.write(0); out.write(0)
    var i = 0
    while (i < 3 * tableSize) {
      out.write(if (i < palette.length) palette(i) else 0)
      i += 1
    }
    frames.foreach(f =>
      writeImageBlock(out, width, height, nColors, tableBits, f,
        interlaced = false))
    out.write(0x3b)
    out.toByteArray
  }

  /** One image block: descriptor + LZW-compressed index stream. */
  private def writeImageBlock(out: java.io.ByteArrayOutputStream,
                              width: Int, height: Int, nColors: Int,
                              tableBits: Int, pixel: (Int, Int) => Int,
                              interlaced: Boolean): Unit = {
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write(0x2c)
    le16(0); le16(0); le16(width); le16(height)
    out.write(if (interlaced) 0x40 else 0)

    // pixel indices in stream order
    val order = interlaceRowOrder(height, interlaced)
    val minCode = math.max(2, tableBits)
    out.write(minCode)

    // LZW compress into 255-byte sub-blocks. Width growth mirrors the
    // decoder's codes-read rule from the other side: check free >
    // maxcode AFTER writing a code and BEFORE adding that round's
    // entry (the ppmtogif output() ordering) — see lzwDecode's
    // WIDTH SYNC note.
    val clear = 1 << minCode
    val eoi = clear + 1
    var next = clear + 2
    var codeWidth = minCode + 1
    val dict = new scala.collection.mutable.LongMap[Int]() // (code<<8|byte) -> code
    var bitBuf = 0
    var bitCnt = 0
    val block = new Array[Byte](255)
    var blockN = 0
    val body = new java.io.ByteArrayOutputStream()
    def flushBlock(): Unit = {
      if (blockN > 0) {
        body.write(blockN)
        body.write(block, 0, blockN)
        blockN = 0
      }
    }
    def emit(code: Int): Unit = {
      bitBuf |= code << bitCnt
      bitCnt += codeWidth
      while (bitCnt >= 8) {
        block(blockN) = (bitBuf & 0xff).toByte
        blockN += 1
        if (blockN == 255) flushBlock()
        bitBuf >>>= 8
        bitCnt -= 8
      }
    }
    emit(clear)
    var cur = -1
    var y = 0
    while (y < height) {
      val sy = order(y)
      var x = 0
      while (x < width) {
        val px = pixel(x, sy)
        require(px >= 0 && px < nColors, s"pixel index $px outside palette")
        if (cur < 0) cur = px
        else {
          val key = (cur.toLong << 8) | px
          val hit = dict.getOrElse(key, -1)
          if (hit >= 0) cur = hit
          else {
            emit(cur)
            if (next > (1 << codeWidth) - 1 && codeWidth < 12) codeWidth += 1
            if (next < 4096) {
              dict.put(key, next)
              next += 1
            } else {
              emit(clear)
              dict.clear()
              next = clear + 2
              codeWidth = minCode + 1
            }
            cur = px
          }
        }
        x += 1
      }
      y += 1
    }
    if (cur >= 0) emit(cur)
    emit(eoi)
    if (bitCnt > 0) {
      block(blockN) = (bitBuf & 0xff).toByte
      blockN += 1
    }
    flushBlock()
    body.write(0)
    out.write(body.toByteArray)
  }
}
