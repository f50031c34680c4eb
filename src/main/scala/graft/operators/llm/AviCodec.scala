package graft.operators.llm

/**
 * Dependency-free RIFF/AVI container codec for MJPEG video — the video
 * analogue of [[MediaCodecs]]/[[JpegCodec]]: an AVI is a RIFF chunk
 * tree whose `movi` LIST carries one compressed chunk per frame
 * (`##dc`/`##db`), and an MJPEG AVI's frame chunks are plain baseline
 * JFIF streams, so [[JpegCodec]] already decodes every frame. This
 * turns frame sampling ([[MultimodalOps.frameSample]]) from the
 * documented chunking stub into a REAL container walk + per-frame
 * pixel decode for sniffed AVI payloads, with no new dependencies.
 * Container layout follows the public AVI RIFF file format (the
 * `avih`/`strh`/`strf` header structs and `movi`/`rec ` nesting).
 *
 * PARSER: tolerant chunk walk — takes width/height/frame-count from
 * the `avih` main header when present, collects video frame chunks
 * from `movi` (recursing into interleave `rec ` LISTs), word-aligns
 * after odd-sized chunks, and ignores `idx1` (the index is a seek
 * accelerator; a full walk needs no index). Returns frame EXTENTS
 * (offset, length) so a sampler decodes only the frames it keeps —
 * at a production stride of 1-in-N, (N-1)/N of the entropy-decode
 * work is never done.
 *
 * ENCODER (fixture/test side): minimal but VALID single-stream MJPEG
 * AVI — `hdrl` (avih + one `strl` with a `vids`/`MJPG` `strh` and a
 * BITMAPINFOHEADER `strf`), `movi` with one `00dc` chunk per frame,
 * and a standard `idx1` so external players/parsers that require the
 * index accept the file. AviCodecSpec round-trips it and pins the
 * parser against hand-computed layouts.
 *
 * Malformed input fails LOUDLY (IllegalArgumentException), matching
 * the MediaCodecs contract; [[MultimodalOps]] decides fallback policy.
 */
object AviCodec {

  // ---- little-endian + fourcc primitives ----------------------------

  private def readLe32(b: Array[Byte], off: Int): Int = {
    require(off + 4 <= b.length, s"truncated AVI at offset $off")
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  }

  private def fourcc(b: Array[Byte], off: Int): String = {
    require(off + 4 <= b.length, s"truncated AVI at offset $off")
    new String(Array(b(off), b(off + 1), b(off + 2), b(off + 3)),
      java.nio.charset.StandardCharsets.US_ASCII)
  }

  /** RIFF magic + AVI form type. */
  def sniffAvi(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 && fourcc(bytes, 0) == "RIFF" &&
      fourcc(bytes, 8) == "AVI "

  /** Parsed container: dimensions + per-frame payload extents into the
    * source bytes (video stream chunks in file order). */
  final case class AviVideo(width: Int, height: Int,
                            microSecPerFrame: Int,
                            frames: IndexedSeq[(Int, Int)]) {
    def nFrames: Int = frames.length
  }

  /** Walk the RIFF tree and collect video frame extents. `##dc`
    * (compressed) and `##db` (uncompressed) chunks whose two-digit
    * stream prefix parses are video frames — a minimal single-stream
    * MJPEG file has only stream 00, but interleaved audio (`##wb`) in
    * a real capture is skipped correctly by suffix dispatch. */
  def parseAvi(bytes: Array[Byte]): AviVideo = {
    require(sniffAvi(bytes), "not a RIFF/AVI payload")
    val riffSize = readLe32(bytes, 4)
    require(riffSize >= 4 && 8L + riffSize <= bytes.length,
      s"RIFF size $riffSize exceeds payload ${bytes.length}")
    var width = 0
    var height = 0
    var usPerFrame = 0
    val frames = IndexedSeq.newBuilder[(Int, Int)]

    def isFrameChunk(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        (id.endsWith("dc") || id.endsWith("db"))

    // walk one LIST body [off, end): sequence of chunks, word-aligned
    def walk(off0: Int, end: Int, inMovi: Boolean): Unit = {
      var off = off0
      while (off + 8 <= end) {
        val id = fourcc(bytes, off)
        val size = readLe32(bytes, off + 4)
        // long arithmetic: a hostile ~2^31 size would wrap the Int sum
        // past the bound check and AIOOBE instead of failing loudly
        require(size >= 0 && off + 8L + size <= end,
          s"chunk $id size $size overruns enclosing list at $off")
        val body = off + 8
        if (id == "LIST") {
          val listType = fourcc(bytes, body)
          // hdrl carries avih; movi carries frames; rec groups
          // interleaved frames INSIDE movi — recurse into all three
          if (listType == "hdrl" || listType == "movi")
            walk(body + 4, body + size, listType == "movi")
          else if (listType == "rec " && inMovi)
            walk(body + 4, body + size, inMovi = true)
          // strl etc.: stream headers — avih already gave geometry;
          // nothing needed from strh/strf on the read side
        } else if (id == "avih" && size >= 40) {
          usPerFrame = readLe32(bytes, body)
          width = readLe32(bytes, body + 32)
          height = readLe32(bytes, body + 36)
        } else if (inMovi && isFrameChunk(id)) {
          frames += ((body, size))
        }
        off = body + size + (size & 1) // word alignment
      }
    }

    walk(12, 8 + riffSize, inMovi = false)
    val fs = frames.result()
    require(fs.nonEmpty, "AVI has no video frame chunks")
    AviVideo(width, height, usPerFrame, fs)
  }

  /** Copy one frame's bytes out of the container. */
  def frameBytes(payload: Array[Byte], extent: (Int, Int)): Array[Byte] =
    java.util.Arrays.copyOfRange(payload, extent._1, extent._1 + extent._2)

  // ---- encoder (fixture side) ---------------------------------------

  /** Encode a single-stream MJPEG AVI from pre-encoded JPEG frames.
    * `fps` > 0; all frames declared `width`x`height` (the container
    * does not re-check the JPEG SOF dimensions — a real capture's
    * headers can disagree, which is exactly the damage a decoder-side
    * consumer must survive). */
  def encodeAviMjpeg(width: Int, height: Int, fps: Int,
                     frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(fps > 0, s"fps must be positive, got $fps")
    require(frames.nonEmpty, "at least one frame required")
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def tag(s: String): Unit = out.write(
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))

    val maxFrame = frames.iterator.map(_.length).max
    val padded = frames.map(f => f.length + (f.length & 1))
    val moviBody = padded.map(8 + _).sum // each frame: '00dc' + size + body
    val idx1Size = 16 * frames.length
    // sizes, inside-out: strf 40, strh 56, strl list = 4+8+56+8+40
    val strlSize = 4 + 8 + 56 + 8 + 40
    val hdrlSize = 4 + 8 + 56 + 8 + strlSize
    val moviSize = 4 + moviBody
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idx1Size)

    tag("RIFF"); le32(riffSize); tag("AVI ")

    tag("LIST"); le32(hdrlSize); tag("hdrl")
    tag("avih"); le32(56)
    le32(1000000 / fps)            // dwMicroSecPerFrame
    le32(maxFrame * fps)           // dwMaxBytesPerSec (advisory)
    le32(0)                        // dwPaddingGranularity
    le32(0x10)                     // dwFlags: AVIF_HASINDEX
    le32(frames.length)            // dwTotalFrames
    le32(0)                        // dwInitialFrames
    le32(1)                        // dwStreams
    le32(maxFrame)                 // dwSuggestedBufferSize
    le32(width); le32(height)
    le32(0); le32(0); le32(0); le32(0) // dwReserved

    tag("LIST"); le32(strlSize); tag("strl")
    tag("strh"); le32(56)
    tag("vids"); tag("MJPG")
    le32(0)                        // dwFlags
    le16(0); le16(0)               // wPriority, wLanguage
    le32(0)                        // dwInitialFrames
    le32(1); le32(fps)             // dwScale / dwRate = frame rate
    le32(0)                        // dwStart
    le32(frames.length)            // dwLength (in frames)
    le32(maxFrame)                 // dwSuggestedBufferSize
    le32(-1)                       // dwQuality (default)
    le32(0)                        // dwSampleSize (0 = varying)
    le16(0); le16(0); le16(width); le16(height) // rcFrame

    tag("strf"); le32(40)          // BITMAPINFOHEADER
    le32(40); le32(width); le32(height)
    le16(1); le16(24)              // biPlanes, biBitCount
    tag("MJPG")                    // biCompression
    le32(width * height * 3)       // biSizeImage (advisory)
    le32(0); le32(0); le32(0); le32(0)

    tag("LIST"); le32(moviSize); tag("movi")
    val frameOffsets = new Array[Int](frames.length)
    var rel = 4 // idx1 offsets are relative to the 'movi' fourcc
    frames.zipWithIndex.foreach { case (f, i) =>
      frameOffsets(i) = rel
      tag("00dc"); le32(f.length); out.write(f)
      if ((f.length & 1) == 1) out.write(0)
      rel += 8 + f.length + (f.length & 1)
    }

    tag("idx1"); le32(idx1Size)
    frames.zipWithIndex.foreach { case (f, i) =>
      tag("00dc"); le32(0x10)      // AVIIF_KEYFRAME
      le32(frameOffsets(i)); le32(f.length)
    }

    out.toByteArray
  }
}
