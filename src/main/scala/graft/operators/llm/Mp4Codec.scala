package graft.operators.llm

/**
 * Dependency-free ISO-BMFF (MP4/QuickTime) container codec — the box
 * tree analogue of [[AviCodec]]'s RIFF walk, following the public
 * ISO/IEC 14496-12 box layout. An MP4's media bytes sit in `mdat`;
 * WHERE each video frame (sample) lives is declared entirely by the
 * `moov/trak/mdia/minf/stbl` sample tables: `stsz` (per-sample sizes),
 * `stco`/`co64` (chunk offsets), `stsc` (samples-per-chunk runs),
 * `stss` (sync samples). Resolving those tables yields per-frame
 * EXTENTS without touching one byte of media data — so a 1-in-N
 * sampler ([[MultimodalOps.frameSample]]) pays entropy decode only for
 * kept frames, the same laziness the AVI walk proves, but via table
 * joins instead of a linear chunk scan: on a seekable store the walk
 * is O(moov), not O(file), which is the difference that matters at a
 * 100 TB crawl's video tail.
 *
 * PARSER: strict box walk (32-bit, 64-bit `largesize`, and
 * to-end-of-enclosure `size == 0` forms), first `vide`-handler track
 * wins; geometry from `tkhd`'s 16.16 fixed-point width/height,
 * timescale from `mdhd`, codec fourcc from the first `stsd` entry.
 * Sample extents resolve stsc runs against stco/co64 and stsz, and
 * every extent is bounds-checked against the payload — a hostile
 * offset table fails loudly instead of AIOOBE-ing the task, and a
 * hostile sample COUNT is bounded before allocation. A valid
 * audio-only file (.m4a: no `vide` track) parses to ZERO frames —
 * the correct answer, not an error — and non-video tracks never
 * materialize their sample tables at all.
 * MJPEG-in-MP4 (sample entry `jpeg`, the QuickTime photo-JPEG
 * convention) makes each sample a plain JFIF stream [[JpegCodec]]
 * decodes; other codecs still yield exact extents (hash/size
 * features, the slot a codec library fills).
 *
 * ENCODER (fixture/test side): minimal but VALID `ftyp`+`mdat`+`moov`
 * file — one video track, `jpeg` VisualSampleEntry, real
 * stts/stsc/stsz/stco(/co64)/stss tables with a configurable
 * samples-per-chunk grouping (ragged last chunk exercised whenever
 * spc does not divide the frame count). Mp4CodecSpec round-trips it
 * and pins the parser on hand-computed layouts plus hostile inputs.
 *
 * Malformed input fails LOUDLY (IllegalArgumentException), matching
 * the MediaCodecs contract; [[MultimodalOps]] decides fallback policy.
 */
object Mp4Codec {

  // ---- big-endian + fourcc primitives -------------------------------

  private def readBe16(b: Array[Byte], off: Int): Int = {
    require(off >= 0 && off + 2 <= b.length, s"truncated MP4 at offset $off")
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  }

  /** Unsigned 32-bit read as Long — box sizes and chunk offsets are
    * u32; reading them signed would turn a >2 GiB declaration into a
    * negative bound that slips require() checks. */
  private def readBe32(b: Array[Byte], off: Int): Long = {
    require(off >= 0 && off + 4 <= b.length, s"truncated MP4 at offset $off")
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
  }

  private def readBe64(b: Array[Byte], off: Int): Long = {
    require(off >= 0 && off + 8 <= b.length, s"truncated MP4 at offset $off")
    (readBe32(b, off) << 32) | readBe32(b, off + 4)
  }

  private def fourcc(b: Array[Byte], off: Int): String = {
    require(off >= 0 && off + 4 <= b.length, s"truncated MP4 at offset $off")
    new String(Array(b(off), b(off + 1), b(off + 2), b(off + 3)),
      java.nio.charset.StandardCharsets.US_ASCII)
  }

  /** `ftyp` as the first box — the ISO-BMFF signature. (QuickTime
    * files may open with other boxes; a crawl-grade sniff keys on the
    * overwhelmingly standard ftyp-first layout, like sniffing PNG by
    * its 8-byte magic.) */
  def sniffMp4(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 && fourcc(bytes, 4) == "ftyp" && {
      val size = readBe32(bytes, 0)
      size >= 16 && size <= bytes.length && (size & 3) == 0
    }

  /** Parsed container: geometry + per-frame payload extents into the
    * source bytes (decode order), plus 0-based sync-sample indices
    * (empty stss = every sample is sync, per 14496-12 8.6.2). */
  final case class Mp4Video(width: Int, height: Int, timescale: Int,
                            durationTicks: Long, codec: String,
                            frames: IndexedSeq[(Int, Int)],
                            syncFrames: IndexedSeq[Int]) {
    def nFrames: Int = frames.length
  }

  // one track's raw sample tables, filled during the walk
  private final class TrackTables {
    var handler: String = ""
    var width = 0
    var height = 0
    var timescale = 0
    var durationTicks = 0L
    var codec: String = ""
    var sizes: Array[Int] = null // resolved per-sample sizes
    var chunkOffsets: Array[Long] = null
    var stscRuns: Array[(Int, Int)] = null // (firstChunk 1-based, samplesPerChunk)
    var sync: Array[Int] = null // 1-based sample numbers, null = all sync
  }

  /** Walk the box tree and resolve the first video track's sample
    * tables into frame extents. */
  def parseMp4(bytes: Array[Byte]): Mp4Video = {
    require(sniffMp4(bytes), "not an ISO-BMFF payload")

    // iterate boxes in [off0, end): size forms 32-bit / largesize / to-end
    def walkBoxes(off0: Int, end: Int)(cb: (String, Int, Int) => Unit): Unit = {
      var off = off0
      while (off + 8 <= end) {
        val size32 = readBe32(bytes, off)
        val typ = fourcc(bytes, off + 4)
        var body = off + 8
        val boxEnd: Long =
          if (size32 == 1) { // 64-bit largesize follows the type
            val ls = readBe64(bytes, off + 8)
            require(ls >= 16, s"box $typ largesize $ls below header size")
            body = off + 16
            off + ls
          } else if (size32 == 0) end.toLong // extends to enclosing end
          else {
            require(size32 >= 8, s"box $typ size $size32 below header size")
            off + size32
          }
        require(boxEnd <= end && body <= boxEnd,
          s"box $typ at $off overruns enclosing bound $end")
        cb(typ, body, boxEnd.toInt)
        off = boxEnd.toInt
      }
    }

    var video: TrackTables = null

    def parseStbl(t: TrackTables, body: Int, end: Int): Unit =
      walkBoxes(body, end) { (typ, b, e) =>
        typ match {
          case "stsd" =>
            require(e - b >= 8, s"stsd box too small (${e - b} bytes)")
            val n = readBe32(bytes, b + 4)
            if (n >= 1 && b + 16 <= e) t.codec = fourcc(bytes, b + 12)
          case "stsz" =>
            require(e - b >= 12, s"stsz box too small (${e - b} bytes)")
            val fixed = readBe32(bytes, b + 4)
            val n = readBe32(bytes, b + 8)
            // the per-sample table must fit the box; the fixed form has
            // no table, so bound the ALLOCATION instead: n samples of
            // fixed >= 1 bytes each cannot exceed the payload — a tiny
            // hostile header must raise here, not OOM the executor
            require(n <= Int.MaxValue && (
              if (fixed != 0) fixed * n <= bytes.length
              else b + 12 + 4 * n <= e),
              s"stsz declares $n samples beyond box/payload bounds")
            t.sizes =
              if (fixed != 0) Array.fill(n.toInt)(fixed.toInt)
              else Array.tabulate(n.toInt)(i =>
                readBe32(bytes, b + 12 + 4 * i).toInt)
          case "stco" =>
            require(e - b >= 8, s"stco box too small (${e - b} bytes)")
            val n = readBe32(bytes, b + 4)
            require(b + 8 + 4 * n <= e, s"stco declares $n entries beyond box end")
            t.chunkOffsets = Array.tabulate(n.toInt)(i =>
              readBe32(bytes, b + 8 + 4 * i))
          case "co64" =>
            require(e - b >= 8, s"co64 box too small (${e - b} bytes)")
            val n = readBe32(bytes, b + 4)
            require(b + 8 + 8 * n <= e, s"co64 declares $n entries beyond box end")
            t.chunkOffsets = Array.tabulate(n.toInt)(i =>
              readBe64(bytes, b + 8 + 8 * i))
          case "stsc" =>
            require(e - b >= 8, s"stsc box too small (${e - b} bytes)")
            val n = readBe32(bytes, b + 4)
            require(b + 8 + 12 * n <= e, s"stsc declares $n entries beyond box end")
            t.stscRuns = Array.tabulate(n.toInt) { i =>
              val o = b + 8 + 12 * i
              (readBe32(bytes, o).toInt, readBe32(bytes, o + 4).toInt)
            }
          case "stss" =>
            require(e - b >= 8, s"stss box too small (${e - b} bytes)")
            val n = readBe32(bytes, b + 4)
            require(b + 8 + 4 * n <= e, s"stss declares $n entries beyond box end")
            t.sync = Array.tabulate(n.toInt)(i =>
              readBe32(bytes, b + 8 + 4 * i).toInt)
          case _ => // stts/ctts/sgpd/...: timing/grouping, not needed for extents
        }
      }

    def parseTrak(body: Int, end: Int): Unit = {
      val t = new TrackTables
      walkBoxes(body, end) { (typ, b, e) =>
        typ match {
          case "tkhd" =>
            // width/height are the LAST 8 bytes (16.16 fixed) in both
            // version 0 and 1 layouts — read from the end, not a
            // version-dependent offset
            require(e - b >= 8, s"tkhd box too small (${e - b} bytes)")
            t.width = (readBe32(bytes, e - 8) >> 16).toInt
            t.height = (readBe32(bytes, e - 4) >> 16).toInt
          case "mdia" =>
            // hdlr first (a cheap header-only pre-pass): a non-video
            // track's sample tables — commonly MILLIONS of audio
            // samples — are never materialized at all
            walkBoxes(b, e) { (t2, b2, e2) =>
              if (t2 == "hdlr") {
                require(e2 - b2 >= 12, s"hdlr box too small (${e2 - b2} bytes)")
                t.handler = fourcc(bytes, b2 + 8)
              }
            }
            if (t.handler == "vide") walkBoxes(b, e) { (t2, b2, e2) =>
              t2 match {
                case "mdhd" =>
                  val version = (readBe32(bytes, b2) >>> 24).toInt
                  if (version == 1) {
                    require(e2 - b2 >= 32, s"mdhd v1 box too small (${e2 - b2} bytes)")
                    t.timescale = readBe32(bytes, b2 + 20).toInt
                    t.durationTicks = readBe64(bytes, b2 + 24)
                  } else {
                    require(e2 - b2 >= 20, s"mdhd v0 box too small (${e2 - b2} bytes)")
                    t.timescale = readBe32(bytes, b2 + 12).toInt
                    t.durationTicks = readBe32(bytes, b2 + 16)
                  }
                case "minf" =>
                  walkBoxes(b2, e2) { (t3, b3, e3) =>
                    if (t3 == "stbl") parseStbl(t, b3, e3)
                  }
                case _ =>
              }
            }
          case _ =>
        }
      }
      if (t.handler == "vide" && video == null) video = t
    }

    walkBoxes(0, bytes.length) { (typ, body, end) =>
      if (typ == "moov")
        walkBoxes(body, end) { (t2, b2, e2) =>
          // first vide track wins; later traks get a header-only scan
          if (t2 == "trak" && video == null) parseTrak(b2, e2)
        }
    }

    // a VALID audio-only file (e.g. .m4a) has no video track: zero
    // frames is the correct answer, not an exception — structural
    // damage still fails loudly above
    if (video == null)
      return Mp4Video(0, 0, 0, 0L, "", IndexedSeq.empty, IndexedSeq.empty)
    val t = video
    require(t.sizes != null && t.chunkOffsets != null && t.stscRuns != null,
      "video track is missing stsz/stco/stsc sample tables")
    require(t.stscRuns.nonEmpty && t.stscRuns.head._1 == 1,
      "stsc first run must start at chunk 1")

    // resolve (stsc runs x stco offsets x stsz sizes) -> extents
    val n = t.sizes.length
    val frames = new Array[(Int, Int)](n)
    var sample = 0
    var run = 0
    var ci = 0
    while (ci < t.chunkOffsets.length && sample < n) {
      while (run + 1 < t.stscRuns.length && t.stscRuns(run + 1)._1 <= ci + 1)
        run += 1
      val spc = t.stscRuns(run)._2
      require(spc > 0, s"stsc run $run declares $spc samples per chunk")
      var o = t.chunkOffsets(ci)
      var k = 0
      while (k < spc && sample < n) {
        val sz = t.sizes(sample)
        require(sz >= 0 && o >= 0 && o + sz <= bytes.length,
          s"sample $sample extent [$o, ${o + sz}) outside payload ${bytes.length}")
        frames(sample) = (o.toInt, sz)
        o += sz
        sample += 1
        k += 1
      }
      ci += 1
    }
    require(sample == n,
      s"chunk tables cover $sample of $n declared samples")

    val sync: IndexedSeq[Int] =
      if (t.sync == null) 0 until n
      else t.sync.iterator.map { s1 =>
        require(s1 >= 1 && s1 <= n, s"stss sample $s1 outside 1..$n")
        s1 - 1
      }.toIndexedSeq
    Mp4Video(t.width, t.height, t.timescale, t.durationTicks,
      t.codec, scala.collection.immutable.ArraySeq.unsafeWrapArray(frames),
      sync)
  }

  /** Copy one frame's bytes out of the container. */
  def frameBytes(payload: Array[Byte], extent: (Int, Int)): Array[Byte] =
    java.util.Arrays.copyOfRange(payload, extent._1, extent._1 + extent._2)

  // ---- encoder (fixture side) ---------------------------------------

  /** Encode a single-video-track MJPEG MP4 (`jpeg` sample entry) from
    * pre-encoded frame payloads. Samples group `samplesPerChunk` to a
    * chunk (ragged last chunk when it does not divide); `syncEvery`
    * emits an stss marking every k-th sample sync (0 = omit stss =
    * all-sync); `forceCo64` writes 64-bit chunk offsets so the co64
    * read path is testable without a >4 GiB fixture. */
  def encodeMp4Mjpeg(width: Int, height: Int, fps: Int,
                     frames: Seq[Array[Byte]], samplesPerChunk: Int = 2,
                     syncEvery: Int = 0,
                     forceCo64: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(fps > 0, s"fps must be positive, got $fps")
    require(frames.nonEmpty, "at least one frame required")
    require(samplesPerChunk > 0,
      s"samplesPerChunk must be positive, got $samplesPerChunk")
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def be64(v: Long): Unit = { be32(v >>> 32); be32(v & 0xffffffffL) }
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def tag(s: String): Unit = out.write(
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))

    val n = frames.length
    val nChunks = (n + samplesPerChunk - 1) / samplesPerChunk
    val lastSpc = n - samplesPerChunk * (nChunks - 1)
    val ftypSize = 24
    val mdatBody = frames.iterator.map(_.length.toLong).sum
    // chunk offsets are absolute file offsets into mdat's body
    val chunkOffsets = new Array[Long](nChunks)
    locally {
      var o = ftypSize + 8L
      var s = 0
      var ci = 0
      while (s < n) {
        chunkOffsets(ci) = o
        var k = 0
        while (k < samplesPerChunk && s < n) { o += frames(s).length; s += 1; k += 1 }
        ci += 1
      }
    }
    val syncSamples: Array[Int] =
      if (syncEvery <= 0) Array.empty
      else (1 to n by syncEvery).toArray

    // box sizes, inside-out (full boxes carry 4 bytes version+flags)
    val stsdSize = 8 + 8 + 86 // header + vf/count + VisualSampleEntry('jpeg')
    val sttsSize = 24
    val stscSize = 16 + 12 * (if (lastSpc == samplesPerChunk) 1 else 2)
    val stszSize = 20 + 4 * n
    val stcoSize = if (forceCo64) 16 + 8 * nChunks else 16 + 4 * nChunks
    val stssSize = if (syncSamples.isEmpty) 0 else 16 + 4 * syncSamples.length
    val stblSize = 8 + stsdSize + sttsSize + stscSize + stszSize + stcoSize + stssSize
    val vmhdSize = 20
    val dinfSize = 8 + 28 // dref with one self-contained 'url ' entry
    val minfSize = 8 + vmhdSize + dinfSize + stblSize
    val hdlrName = "GraftVideoHandler "
    val hdlrSize = 8 + 24 + hdlrName.length
    val mdhdSize = 32
    val mdiaSize = 8 + mdhdSize + hdlrSize + minfSize
    val tkhdSize = 92
    val trakSize = 8 + tkhdSize + mdiaSize
    val mvhdSize = 108
    val moovSize = 8 + mvhdSize + trakSize

    be32(ftypSize); tag("ftyp"); tag("isom"); be32(0x200)
    tag("isom"); tag("mp42")

    require(mdatBody + 8 <= Int.MaxValue, "fixture mdat exceeds 2 GiB")
    be32(mdatBody + 8); tag("mdat")
    frames.foreach(out.write)

    be32(moovSize); tag("moov")

    be32(mvhdSize); tag("mvhd"); be32(0) // version 0 + flags
    be32(0); be32(0)                     // creation, modification
    be32(fps); be32(n.toLong)            // movie timescale = fps -> 1 tick/frame
    be32(0x10000); be16(0x100); be16(0)  // rate 1.0, volume 1.0, reserved
    be32(0); be32(0)                     // reserved
    // identity matrix
    be32(0x10000); be32(0); be32(0); be32(0); be32(0x10000); be32(0)
    be32(0); be32(0); be32(0x40000000)
    (0 until 6).foreach(_ => be32(0))    // pre_defined
    be32(2)                              // next_track_ID

    be32(trakSize); tag("trak")
    be32(tkhdSize); tag("tkhd"); be32(7) // version 0, flags enabled+in-movie
    be32(0); be32(0); be32(1); be32(0)   // times, track_ID, reserved
    be32(n.toLong)                       // duration (movie timescale)
    be32(0); be32(0)                     // reserved
    be16(0); be16(0); be16(0); be16(0)   // layer, alt_group, volume, reserved
    be32(0x10000); be32(0); be32(0); be32(0); be32(0x10000); be32(0)
    be32(0); be32(0); be32(0x40000000)
    be32(width.toLong << 16); be32(height.toLong << 16) // 16.16 fixed

    be32(mdiaSize); tag("mdia")
    be32(mdhdSize); tag("mdhd"); be32(0)
    be32(0); be32(0)
    be32(fps); be32(n.toLong)            // media timescale = fps
    be16(0x55c4); be16(0)                // language 'und', pre_defined

    be32(hdlrSize); tag("hdlr"); be32(0)
    be32(0); tag("vide")                 // pre_defined, handler_type
    be32(0); be32(0); be32(0)            // reserved
    tag(hdlrName)

    be32(minfSize); tag("minf")
    be32(vmhdSize); tag("vmhd"); be32(1) // version 0, flags = 1
    be16(0); be16(0); be16(0); be16(0)   // graphicsmode, opcolor

    be32(dinfSize); tag("dinf")
    be32(28); tag("dref"); be32(0); be32(1)
    be32(12); tag("url "); be32(1)       // flags 1 = media in same file

    be32(stblSize); tag("stbl")

    be32(stsdSize); tag("stsd"); be32(0); be32(1)
    be32(86); tag("jpeg")                // VisualSampleEntry, photo-JPEG
    be32(0); be16(0); be16(1)            // reserved x6, data_ref_index
    be16(0); be16(0)                     // pre_defined, reserved
    be32(0); be32(0); be32(0)            // pre_defined x3
    be16(width); be16(height)
    be32(0x480000); be32(0x480000)       // 72 dpi horiz/vert
    be32(0)                              // reserved
    be16(1)                              // frame_count
    (0 until 32).foreach(_ => out.write(0)) // compressorname
    be16(24); be16(0xffff)               // depth, pre_defined = -1

    be32(sttsSize); tag("stts"); be32(0)
    be32(1); be32(n.toLong); be32(1)     // n samples x 1 tick each

    be32(stscSize); tag("stsc"); be32(0)
    if (lastSpc == samplesPerChunk) {
      be32(1); be32(1); be32(samplesPerChunk.toLong); be32(1)
    } else {
      be32(2)
      be32(1); be32(samplesPerChunk.toLong); be32(1)
      be32(nChunks.toLong); be32(lastSpc.toLong); be32(1)
    }

    be32(stszSize); tag("stsz"); be32(0)
    be32(0); be32(n.toLong)              // varying sizes, count
    frames.foreach(f => be32(f.length.toLong))

    if (forceCo64) {
      be32(stcoSize); tag("co64"); be32(0); be32(nChunks.toLong)
      chunkOffsets.foreach(be64)
    } else {
      be32(stcoSize); tag("stco"); be32(0); be32(nChunks.toLong)
      chunkOffsets.foreach(be32)
    }

    if (syncSamples.nonEmpty) {
      be32(stssSize); tag("stss"); be32(0); be32(syncSamples.length.toLong)
      syncSamples.foreach(s => be32(s.toLong))
    }

    out.toByteArray
  }
}
