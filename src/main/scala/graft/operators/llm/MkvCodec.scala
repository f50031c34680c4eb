package graft.operators.llm

/**
 * Dependency-free Matroska/WebM container codec — the EBML analogue of
 * [[Mp4Codec]]'s box walk and [[AviCodec]]'s RIFF walk, following the
 * public EBML structure (RFC 8794) and Matroska element IDs. Frame
 * bytes live in `Cluster` elements as `SimpleBlock`s (or
 * `BlockGroup/Block`); WHICH track a block belongs to is a vint prefix
 * inside the block payload, and track metadata (`Tracks/TrackEntry`:
 * type, codec id, pixel geometry) identifies the video stream. Walking
 * the element tree yields per-frame EXTENTS without decoding media, so
 * a 1-in-N sampler ([[MultimodalOps.frameSample]]) pays entropy decode
 * only for kept frames — the same laziness contract q117 (AVI) and
 * q119 (MP4) prove.
 *
 * PARSER: strict EBML walk — vint IDs (1-4 bytes, marker kept) and
 * vint sizes (1-8 bytes, marker stripped); unknown-size (all
 * value-bits-set) accepted for `Segment` only (runs to end of
 * payload), anywhere else it fails loudly, as do truncated elements,
 * invalid vints and LACED blocks (the fixture never laces; lacing is
 * a bandwidth micro-optimization a crawl-grade parser may reject
 * loudly rather than mis-slice). First video track (TrackType 1)
 * wins; blocks of every other track — interleaved audio is the normal
 * case — are SKIPPED by track-number dispatch, which the spec pins.
 * Block-track filtering happens AFTER the walk, so layouts whose
 * Tracks element follows the first Cluster (SeekHead/live-stream
 * muxing) parse correctly, and a valid audio-only file parses to
 * ZERO frames rather than failing.
 * `V_MJPEG` tracks make each frame a plain JFIF stream [[JpegCodec]]
 * decodes; other codec ids still yield exact extents.
 *
 * ENCODER (fixture/test side): minimal but VALID Matroska — EBML
 * header (DocType `matroska`), known-size `Segment` with `Info`
 * (TimestampScale), `Tracks` (one video `V_MJPEG` TrackEntry plus an
 * optional interleaved dummy audio track), and `Cluster`s of
 * `clusterSize` SimpleBlocks each (keyframe flag on every
 * `syncEvery`-th video frame). MkvCodecSpec round-trips it and pins
 * the walk on hand-computed layouts plus hostile inputs.
 *
 * Malformed input fails LOUDLY (IllegalArgumentException), matching
 * the MediaCodecs contract; [[MultimodalOps]] decides fallback policy.
 */
object MkvCodec {

  // ---- EBML primitives ----------------------------------------------

  /** Length in bytes of a vint whose first byte is `fb` (1-8). */
  private def vintLen(fb: Int): Int = {
    require(fb != 0, "invalid EBML vint: first byte 0x00")
    var mask = 0x80
    var len = 1
    while ((fb & mask) == 0) { mask >>= 1; len += 1 }
    len
  }

  /** (id value with marker bits KEPT, bytes consumed). Element IDs
    * compare against their full on-disk form (e.g. Segment =
    * 0x18538067). */
  private def readId(b: Array[Byte], off: Int): (Long, Int) = {
    require(off < b.length, s"truncated EBML at offset $off")
    val len = vintLen(b(off) & 0xff)
    require(len <= 4, s"element ID longer than 4 bytes at offset $off")
    require(off + len <= b.length, s"truncated EBML at offset $off")
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    (v, len)
  }

  /** (size value with marker STRIPPED, bytes consumed, isUnknown). */
  private def readSize(b: Array[Byte], off: Int): (Long, Int, Boolean) = {
    require(off < b.length, s"truncated EBML at offset $off")
    val fb = b(off) & 0xff
    val len = vintLen(fb)
    require(off + len <= b.length, s"truncated EBML at offset $off")
    var v = (fb & ((1 << (8 - len)) - 1)).toLong
    var i = 1
    while (i < len) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    val unknown = v == (1L << (7 * len)) - 1 // all value bits set
    (v, len, unknown)
  }

  private def readUint(b: Array[Byte], off: Int, len: Int): Long = {
    require(len >= 1 && len <= 8, s"EBML uint of $len bytes")
    require(off + len <= b.length, s"truncated EBML at offset $off")
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }

  // Matroska element IDs (public spec values, full on-disk form)
  private val IdEbml = 0x1A45DFA3L
  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549A966L
  private val IdTimestampScale = 0x2AD7B1L
  private val IdTracks = 0x1654AE6BL
  private val IdTrackEntry = 0xAEL
  private val IdTrackNumber = 0xD7L
  private val IdTrackType = 0x83L
  private val IdCodecId = 0x86L
  private val IdVideo = 0xE0L
  private val IdPixelWidth = 0xB0L
  private val IdPixelHeight = 0xBAL
  private val IdCluster = 0x1F43B675L
  private val IdClusterTimestamp = 0xE7L
  private val IdSimpleBlock = 0xA3L
  private val IdBlockGroup = 0xA0L
  private val IdBlock = 0xA1L
  private val IdReferenceBlock = 0xFBL

  /** EBML magic — every Matroska/WebM file opens with the EBML header
    * element. */
  def sniffMkv(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && (bytes(0) & 0xff) == 0x1a &&
      (bytes(1) & 0xff) == 0x45 && (bytes(2) & 0xff) == 0xdf &&
      (bytes(3) & 0xff) == 0xa3

  /** Parsed container: geometry + per-frame payload extents (decode
    * order, video track only) + 0-based sync-frame indices. */
  final case class MkvVideo(width: Int, height: Int, timestampScale: Long,
                            codec: String, frames: IndexedSeq[(Int, Int)],
                            syncFrames: IndexedSeq[Int]) {
    def nFrames: Int = frames.length
  }

  /** Walk the EBML tree and collect the first video track's block
    * extents. */
  def parseMkv(bytes: Array[Byte]): MkvVideo = {
    require(sniffMkv(bytes), "not an EBML/Matroska payload")

    var tsScale = 1000000L // spec default: 1 ms
    var videoTrack = -1L
    var width = 0
    var height = 0
    var codec = ""
    // every block's (track, bodyOff, bodyLen, isKey) in stream order —
    // filtered by track AFTER the walk, because Tracks may legally
    // FOLLOW the first Cluster (SeekHead/live-stream layouts)
    val blocks = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Int, Int, Boolean)]

    // parse one block payload (SimpleBlock or Block body): vint track,
    // 2-byte relative timestamp, flags byte, then the frame bytes
    def block(off: Int, end: Int, simpleKeyBit: Boolean,
              groupHasRef: Boolean): Unit = {
      // track numbers reuse the size-vint ENCODING but not its
      // unknown-value semantics: 0xFF is simply track 127
      val (track, tLen, _) = readSize(bytes, off)
      val flagsOff = off + tLen + 2
      require(flagsOff < end, "truncated block header")
      val flags = bytes(flagsOff) & 0xff
      require((flags & 0x06) == 0,
        "laced block: lacing is not supported, refusing to mis-slice")
      val key =
        if (simpleKeyBit) (flags & 0x80) != 0
        else !groupHasRef // Block: keyframe = no ReferenceBlock sibling
      blocks += ((track, flagsOff + 1, end - (flagsOff + 1), key))
    }

    // walk children of [off0, end); `at` dispatches on element id
    def walk(off0: Int, end: Int)(at: (Long, Int, Int) => Unit): Unit = {
      var off = off0
      while (off < end) {
        val (id, idLen) = readId(bytes, off)
        val (sz, szLen, unknown) = readSize(bytes, off + idLen)
        val body = off + idLen + szLen
        val bodyEnd: Long =
          if (unknown) {
            require(id == IdSegment,
              f"unknown-size element 0x$id%x outside Segment")
            end.toLong
          } else body.toLong + sz
        require(bodyEnd <= end,
          f"element 0x$id%x at $off overruns enclosing bound $end")
        at(id, body, bodyEnd.toInt)
        off = bodyEnd.toInt
      }
    }

    def parseTrackEntry(body: Int, end: Int): Unit = {
      var num = -1L
      var typ = -1L
      var cid = ""
      var w = 0
      var h = 0
      walk(body, end) { (id, b, e) =>
        id match {
          case IdTrackNumber => num = readUint(bytes, b, e - b)
          case IdTrackType => typ = readUint(bytes, b, e - b)
          case IdCodecId =>
            cid = new String(bytes, b, e - b,
              java.nio.charset.StandardCharsets.US_ASCII)
          case IdVideo =>
            walk(b, e) { (id2, b2, e2) =>
              id2 match {
                case IdPixelWidth => w = readUint(bytes, b2, e2 - b2).toInt
                case IdPixelHeight => h = readUint(bytes, b2, e2 - b2).toInt
                case _ =>
              }
            }
          case _ =>
        }
      }
      if (typ == 1 && videoTrack < 0) {
        videoTrack = num; codec = cid; width = w; height = h
      }
    }

    def parseCluster(body: Int, end: Int): Unit =
      walk(body, end) { (id, b, e) =>
        id match {
          case IdSimpleBlock =>
            block(b, e, simpleKeyBit = true, groupHasRef = false)
          case IdBlockGroup =>
            // two passes: ReferenceBlock may follow its Block
            var hasRef = false
            walk(b, e)((id2, _, _) => if (id2 == IdReferenceBlock) hasRef = true)
            walk(b, e) { (id2, b2, e2) =>
              if (id2 == IdBlock)
                block(b2, e2, simpleKeyBit = false, groupHasRef = hasRef)
            }
          case IdClusterTimestamp => // cluster base time: not needed for extents
          case _ =>
        }
      }

    walk(0, bytes.length) { (id, body, end) =>
      id match {
        case IdEbml => // header: doc type etc., nothing needed
        case IdSegment =>
          walk(body, end) { (id2, b2, e2) =>
            id2 match {
              case IdInfo =>
                walk(b2, e2) { (id3, b3, e3) =>
                  if (id3 == IdTimestampScale)
                    tsScale = readUint(bytes, b3, e3 - b3)
                }
              case IdTracks =>
                walk(b2, e2) { (id3, b3, e3) =>
                  if (id3 == IdTrackEntry) parseTrackEntry(b3, e3)
                }
              case IdCluster => parseCluster(b2, e2)
              case _ => // SeekHead, Cues, Tags, Void, ...
            }
          }
        case _ =>
      }
    }

    // a VALID audio-only file has no type-1 track: zero frames is the
    // correct answer, not an exception — structural damage still
    // fails loudly above
    val frames = IndexedSeq.newBuilder[(Int, Int)]
    val sync = IndexedSeq.newBuilder[Int]
    if (videoTrack >= 0) {
      var idx = 0
      blocks.foreach { case (track, off, len, key) =>
        if (track == videoTrack) {
          frames += ((off, len))
          if (key) sync += idx
          idx += 1
        }
      }
    }
    MkvVideo(width, height, tsScale, codec, frames.result(), sync.result())
  }

  /** Copy one frame's bytes out of the container. */
  def frameBytes(payload: Array[Byte], extent: (Int, Int)): Array[Byte] =
    java.util.Arrays.copyOfRange(payload, extent._1, extent._1 + extent._2)

  // ---- encoder (fixture side) ---------------------------------------

  private def idBytes(id: Long): Array[Byte] = {
    val len = if (id <= 0xff) 1 else if (id <= 0xffff) 2
      else if (id <= 0xffffff) 3 else 4
    Array.tabulate(len)(i => ((id >> (8 * (len - 1 - i))) & 0xff).toByte)
  }

  private def sizeVint(v: Long): Array[Byte] = {
    require(v >= 0, s"negative EBML size $v")
    var len = 1
    while (len <= 8 && v >= (1L << (7 * len)) - 1) len += 1 // avoid all-ones
    require(len <= 8, s"EBML size $v too large")
    val out = new Array[Byte](len)
    val marked = v | (1L << (7 * len))
    var i = 0
    while (i < len) {
      out(i) = ((marked >> (8 * (len - 1 - i))) & 0xff).toByte
      i += 1
    }
    out
  }

  private def uintBytes(v: Long): Array[Byte] = {
    require(v >= 0, s"negative EBML uint $v")
    var len = 1
    while (len < 8 && (v >> (8 * len)) != 0) len += 1
    Array.tabulate(len)(i => ((v >> (8 * (len - 1 - i))) & 0xff).toByte)
  }

  private def element(id: Long, payload: Array[Byte]): Array[Byte] = {
    val ib = idBytes(id)
    val sb = sizeVint(payload.length.toLong)
    val out = new Array[Byte](ib.length + sb.length + payload.length)
    System.arraycopy(ib, 0, out, 0, ib.length)
    System.arraycopy(sb, 0, out, ib.length, sb.length)
    System.arraycopy(payload, 0, out, ib.length + sb.length, payload.length)
    out
  }

  private def cat(parts: Array[Byte]*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    parts.foreach(out.write)
    out.toByteArray
  }

  /** Encode a Matroska file with one `V_MJPEG` video track from
    * pre-encoded JPEG frames, `clusterSize` SimpleBlocks per Cluster,
    * keyframe flag on every `syncEvery`-th video frame (0 = all
    * keyframes). `audioFiller` non-empty interleaves a type-2 (audio)
    * track whose blocks carry the given payloads round-robin between
    * video blocks — a parser that does not dispatch on track number
    * will mis-index frames. */
  def encodeMkvMjpeg(width: Int, height: Int, frames: Seq[Array[Byte]],
                     clusterSize: Int = 2, syncEvery: Int = 0,
                     audioFiller: Seq[Array[Byte]] = Nil): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(frames.nonEmpty, "at least one frame required")
    require(clusterSize > 0, s"clusterSize must be positive, got $clusterSize")

    val ebmlHeader = element(IdEbml, cat(
      element(0x4286L, uintBytes(1)), // EBMLVersion
      element(0x42F7L, uintBytes(1)), // EBMLReadVersion
      element(0x42F2L, uintBytes(4)), // EBMLMaxIDLength
      element(0x42F3L, uintBytes(8)), // EBMLMaxSizeLength
      element(0x4282L, "matroska".getBytes("US-ASCII")), // DocType
      element(0x4287L, uintBytes(4)), // DocTypeVersion
      element(0x4285L, uintBytes(2)))) // DocTypeReadVersion

    val info = element(IdInfo, cat(
      element(IdTimestampScale, uintBytes(1000000L)),
      element(0x4D80L, "graft".getBytes("US-ASCII")), // MuxingApp
      element(0x5741L, "graft".getBytes("US-ASCII")))) // WritingApp

    val videoEntry = element(IdTrackEntry, cat(
      element(IdTrackNumber, uintBytes(1)),
      element(0x73C5L, uintBytes(0xbeef)), // TrackUID
      element(IdTrackType, uintBytes(1)),
      element(IdCodecId, "V_MJPEG".getBytes("US-ASCII")),
      element(IdVideo, cat(
        element(IdPixelWidth, uintBytes(width.toLong)),
        element(IdPixelHeight, uintBytes(height.toLong))))))
    val audioEntry =
      if (audioFiller.isEmpty) Array.emptyByteArray
      else element(IdTrackEntry, cat(
        element(IdTrackNumber, uintBytes(2)),
        element(0x73C5L, uintBytes(0xcafe)),
        element(IdTrackType, uintBytes(2)),
        element(IdCodecId, "A_PCM/INT/LIT".getBytes("US-ASCII"))))
    val tracks = element(IdTracks, cat(videoEntry, audioEntry))

    def simpleBlock(track: Int, relTs: Int, key: Boolean,
                    data: Array[Byte]): Array[Byte] = {
      val head = Array[Byte](
        (0x80 | track).toByte, // track vint (1-byte form, track < 64)
        ((relTs >> 8) & 0xff).toByte, (relTs & 0xff).toByte,
        (if (key) 0x80 else 0x00).toByte)
      element(IdSimpleBlock, cat(head, data))
    }

    val clusters = frames.zipWithIndex.grouped(clusterSize).zipWithIndex
      .map { case (group, ci) =>
        val blocks = group.flatMap { case (f, i) =>
          val key = syncEvery <= 0 || i % syncEvery == 0
          val vb = simpleBlock(1, i - ci * clusterSize, key, f)
          val ab = audioFiller.lift(i).map(a =>
            simpleBlock(2, i - ci * clusterSize, key = true, a))
          vb +: ab.toSeq
        }
        element(IdCluster, cat(
          (element(IdClusterTimestamp, uintBytes(ci.toLong * clusterSize))
            +: blocks): _*))
      }.toSeq

    val segment = element(IdSegment, cat((info +: tracks +: clusters): _*))
    cat(ebmlHeader, segment)
  }
}
