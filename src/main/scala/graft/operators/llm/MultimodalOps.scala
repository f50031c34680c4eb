package graft.operators.llm

import org.apache.spark.sql.Dataset

/**
 * Multimodal column plumbing (brief: treat image/audio/video as opaque
 * `binary` columns with typed metadata; decode/feature-extract runs
 * executor-side in batches).
 *
 * The DECODE step is REAL for the eight containers the JDK can carry —
 * uncompressed 24-bpp BMP, PCM16 mono WAV, non-interlaced 8-bit
 * RGB/RGBA PNG ([[MediaCodecs]]), baseline sequential JFIF
 * ([[JpegCodec]]), GIF 87a/89a incl. interlace and transparency
 * ([[GifCodec]]), MJPEG video in RIFF/AVI ([[AviCodec]] container
 * walk, per-frame JPEG decode), ISO-BMFF video ([[Mp4Codec]]
 * sample-table walk), and Matroska/WebM video ([[MkvCodec]] EBML
 * walk; MJPEG-class samples decode, other codecs yield exact
 * extents) — no external libs; q106, q112, q115, q117, q118, q119 and
 * q120 gate the byte-level walks against closed-form oracles —
 * and a documented deterministic fallback (byte length + payload md5)
 * for every unsniffed format. The remaining boundary is pure CODEC
 * (H.264/VP9/Opus entropy decode needs libraries the frozen build
 * cannot take), no longer container: every mainstream crawl container
 * walks for real. Unsupported VARIANTS
 * of a sniffed container (arithmetic-coded or lossless JPEG, 16-bit
 * palette PNG) fail loudly, per the MediaCodecs contract. The Spark-side plumbing is identical
 * either way: binary payload columns with typed metadata via case-class
 * Encoders, and per-partition batch iteration (`mapPartitions`) so a
 * codec amortizes its init across a whole batch — exactly where an image
 * library or a JNI decoder slots in for the remaining formats.
 */
object MultimodalOps {

  private val HexLower = "0123456789abcdef".toCharArray
  private val HexUpper = "0123456789ABCDEF".toCharArray

  /** Table-based hex encode — `"%02x".format` per byte costs a
    * java.util.Formatter instantiation per CALL, which at millions of
    * frame digests dominated the whole stub pipeline (measured: q100
    * 1.9 s -> 0.5 s). */
  private def hex(bytes: Array[Byte], table: Array[Char]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = table((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = table(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def hexLower(bytes: Array[Byte]): String = hex(bytes, HexLower)
  def hexUpper(bytes: Array[Byte]): String = hex(bytes, HexUpper)

  /** Opaque media payload + typed metadata. */
  final case class MediaRecord(doc_id: Long, payload: Array[Byte],
                               format: String, width: Int, height: Int)

  /** Decoder output: per-record features. */
  final case class DecodedMedia(doc_id: Long, format: String,
                                decoded_bytes: Long, thumb_hash: String)

  /** Shared accounting for the container-video DECODE branches
    * (AVI/MP4/MKV): walk the frame extents, JPEG frames pay a real
    * decode, frames of other codecs count their raw extent size — one
    * exotic stream degrades gracefully instead of failing the record. */
  private def containerDecode(m: MediaRecord,
                              md: java.security.MessageDigest,
                              prefix: String, width: Int, height: Int,
                              frames: IndexedSeq[(Int, Int)]): DecodedMedia = {
    var sum = 0L; var max = 0; var decBytes = 0L
    frames.foreach { ext =>
      val fb = java.util.Arrays.copyOfRange(m.payload, ext._1,
        ext._1 + ext._2)
      if (JpegCodec.sniffJpeg(fb)) {
        val img = JpegCodec.decodeJpeg(fb)
        sum += img.sumChannels
        if (img.maxChannel > max) max = img.maxChannel
        decBytes += img.nPixels * img.channels
      } else decBytes += fb.length
    }
    val feat = s"$prefix ${width}x${height} ${frames.length} $sum $max"
    DecodedMedia(m.doc_id, m.format, decBytes,
      hexLower(md.digest(feat.getBytes("UTF-8"))))
  }

  /** Shared accounting for the container-video SAMPLING branches:
    * every `stride`-th extent is sliced and JPEG-decoded (or
    * raw-digested for non-JPEG codecs); skipped extents are never
    * touched — the laziness q117/q119/q120 prove. */
  private def sampleContainer(m: MediaRecord,
                              md: java.security.MessageDigest,
                              framePrefix: String,
                              frames: IndexedSeq[(Int, Int)],
                              stride: Int): Iterator[SampledFrame] =
    (0 until frames.length by stride).iterator.map { i =>
      val ext = frames(i)
      val fb = java.util.Arrays.copyOfRange(m.payload, ext._1,
        ext._1 + ext._2)
      md.reset()
      if (JpegCodec.sniffJpeg(fb)) {
        val img = JpegCodec.decodeJpeg(fb)
        val kind = if (img.channels == 1) "gray" else "ycc"
        val feat = s"$framePrefix $kind ${img.width}x${img.height} " +
          s"${img.sumChannels} ${img.maxChannel}"
        SampledFrame(m.doc_id, i, img.nPixels * img.channels,
          hexLower(md.digest(feat.getBytes("UTF-8"))))
      } else {
        // non-JPEG frame chunk: digest raw bytes, count raw size
        SampledFrame(m.doc_id, i, fb.length.toLong,
          hexLower(md.digest(fb)))
      }
    }

  /** Batch decode — one codec instance per partition, reused per record.
    * Payloads whose magic bytes match a [[MediaCodecs]] container (BMP,
    * WAV) get a REAL byte-level decode: `decoded_bytes` is the actual
    * decoded data volume (pixel channels / PCM bytes), `thumb_hash`
    * digests the decoded statistics. Other formats take the documented
    * fallback (length + payload md5) — the slot a codec-library decoder
    * occupies in a full deployment. */
  def decodeBatch(batch: Iterator[MediaRecord],
                  onCapRejected: () => Unit = () => ()): Iterator[DecodedMedia] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    batch.map { m =>
      md.reset()
      try decodeOne(m, md)
      catch {
        case _: MediaCodecs.DecodeCapExceeded =>
          // OVERSIZED-but-possibly-valid media: same deterministic
          // fallback row as damage (the hash contract is shared), but
          // COUNTED separately — the pixel cap is a tunable policy
          // bound (-Dgraft.media.maxDecodePixels), not corruption, so
          // it must be observable rather than silently folded into the
          // damage class (r20 advice).
          onCapRejected()
          md.reset()
          rawFallback(m, md)
        case scala.util.control.NonFatal(_) =>
        // DAMAGED media: a payload that sniffs as a known container but
        // fails its decode (truncated entropy stream, lying tables — a
        // certainty somewhere in 100 TB of crawl) degrades to the SAME
        // deterministic fallback an unsniffed format takes (shared
        // helper — the identity is a hash contract, not a convention),
        // instead of killing the task — the WARC walk's --skip-bad
        // philosophy. Codec BUGS still surface in the specs, which
        // call the codecs directly; ContainerFuzzSpec pins this
        // never-throws contract.
        md.reset()
        rawFallback(m, md)
      }
    }
  }

  /** The deterministic no-decode feature row — taken by unsniffed
    * formats AND by damaged payloads (the two must hash identically). */
  private def rawFallback(m: MediaRecord,
                          md: java.security.MessageDigest): DecodedMedia =
    DecodedMedia(m.doc_id, m.format, m.payload.length.toLong,
      hexLower(md.digest(m.payload)))

  private def decodeOne(m: MediaRecord,
                        md: java.security.MessageDigest): DecodedMedia = {
    {
      if (MediaCodecs.sniffBmp(m.payload)) {
        val img = MediaCodecs.decodeBmp(m.payload)
        val feat = s"bmp ${img.width}x${img.height} " +
          s"${img.sumChannels} ${img.maxChannel}"
        DecodedMedia(m.doc_id, m.format, img.nPixels * 3,
          hexLower(md.digest(feat.getBytes("UTF-8"))))
      } else if (MediaCodecs.sniffPng(m.payload)) {
        val img = MediaCodecs.decodePng(m.payload)
        val kind = img.channels match {
          case 1 => "gray"
          case 3 => "rgb"
          case _ => "rgba"
        }
        val feat = s"png $kind ${img.width}x${img.height} " +
          s"${img.sumChannels} ${img.maxChannel}"
        DecodedMedia(m.doc_id, m.format, img.nPixels * img.channels,
          hexLower(md.digest(feat.getBytes("UTF-8"))))
      } else if (JpegCodec.sniffJpeg(m.payload)) {
        val img = JpegCodec.decodeJpeg(m.payload)
        val kind = if (img.channels == 1) "gray" else "ycc"
        val feat = s"jpeg $kind ${img.width}x${img.height} " +
          s"${img.sumChannels} ${img.maxChannel}"
        DecodedMedia(m.doc_id, m.format, img.nPixels * img.channels,
          hexLower(md.digest(feat.getBytes("UTF-8"))))
      } else if (MediaCodecs.sniffWav(m.payload)) {
        val au = MediaCodecs.decodeWav(m.payload)
        val feat = s"wav ${au.sampleRate} ${au.nSamples} " +
          s"${au.sumAbs} ${au.peak}"
        DecodedMedia(m.doc_id, m.format,
          au.nSamples * (au.bitsPerSample / 8),
          hexLower(md.digest(feat.getBytes("UTF-8"))))
      } else if (GifCodec.sniffGif(m.payload)) {
        val img = GifCodec.decodeGif(m.payload)
        val kind = if (img.channels == 3) "rgb" else "rgba"
        val feat = s"gif $kind ${img.width}x${img.height} " +
          s"${img.nFrames} ${img.sumChannels} ${img.maxChannel}"
        DecodedMedia(m.doc_id, m.format, img.nPixels * img.channels,
          hexLower(md.digest(feat.getBytes("UTF-8"))))
      } else if (AviCodec.sniffAvi(m.payload)) {
        // MJPEG video: container walk + per-frame JPEG decode
        val vid = AviCodec.parseAvi(m.payload)
        containerDecode(m, md, "avi", vid.width, vid.height, vid.frames)
      } else if (Mp4Codec.sniffMp4(m.payload)) {
        // ISO-BMFF video: sample-table walk + per-sample JPEG decode
        // (photo-JPEG tracks); audio-only .m4a yields zero frames
        val vid = Mp4Codec.parseMp4(m.payload)
        containerDecode(m, md, "mp4", vid.width, vid.height, vid.frames)
      } else if (MkvCodec.sniffMkv(m.payload)) {
        // Matroska/WebM video: EBML walk + per-block JPEG decode for
        // V_MJPEG tracks; audio-only files yield zero frames
        val vid = MkvCodec.parseMkv(m.payload)
        containerDecode(m, md, "mkv", vid.width, vid.height, vid.frames)
      } else {
        // fallback for containers with no dependency-free decode
        rawFallback(m, md)
      }
    }
  }

  def decode(ds: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(decodeBatch(_))
  }

  /** [[decode]] plus an accumulator counting records that hit the
    * configurable pixel cap ([[MediaCodecs.MaxDecodePixels]]) — the
    * same pattern as the WARC walk's `--skip-bad` counter: oversized
    * media still takes the deterministic fallback row, but its volume
    * is observable after the action instead of silently merged into
    * the damage class. */
  def decodeCounted(ds: Dataset[MediaRecord])
      : (Dataset[DecodedMedia], org.apache.spark.util.LongAccumulator) = {
    import ds.sparkSession.implicits._
    val capRejected =
      ds.sparkSession.sparkContext.longAccumulator("media-cap-rejected")
    (ds.mapPartitions(decodeBatch(_, () => capRejected.add(1L))),
      capRejected)
  }

  /** Resized media: target box + the source payload's identity. */
  final case class ResizedMedia(doc_id: Long, format: String,
                                width: Int, height: Int,
                                payload: Array[Byte])

  /** Aspect-preserving fit into `maxDim`. For payloads the codec set
    * can decode (BMP, PNG, baseline JPEG, GIF), the resample is REAL:
    * decode -> integer box average ([[MediaCodecs.boxResample]]) ->
    * re-encode. Thumbnails re-encode LOSSLESSLY — BMP stays BMP, PNG
    * stays PNG (gray/RGB/RGBA preserved via color type), JPEG and GIF
    * thumbnails come back as PNG (re-quantizing through a lossy
    * encoder — or re-palettizing box-averaged colors — would make the
    * thumbnail bytes depend on this library's rounding; the
    * returned `format` says what the payload now IS). Undecodable
    * payloads (video) keep the declared-dimension pass-through stub,
    * the slot a codec library fills. Already-fitting media pass
    * through unscaled (never upscale). */
  def resize(ds: Dataset[MediaRecord], maxDim: Int): Dataset[ResizedMedia] = {
    import ds.sparkSession.implicits._
    require(maxDim > 0, s"maxDim must be positive, got $maxDim")
    ds.mapPartitions(resizeBatch(_, maxDim))
  }

  /** Per-partition body of [[resize]] — public for the same reason
    * [[decodeBatch]] is: direct batch-level exercise (fuzz, tools)
    * without a session. */
  def resizeBatch(batch: Iterator[MediaRecord],
                  maxDim: Int): Iterator[ResizedMedia] = {
    require(maxDim > 0, s"maxDim must be positive, got $maxDim")
    // floor-scale, min 1px: integer math keeps it engine-portable;
    // scale in Long — width * maxDim overflows Int for declared
    // dimensions past ~2^31/maxDim (the result itself always fits:
    // it is <= maxDim)
    def fit(w: Int, h: Int): (Int, Int) = {
      val longest = math.max(w, h)
      (math.max(1L, w.toLong * maxDim / longest).toInt,
        math.max(1L, h.toLong * maxDim / longest).toInt)
    }
    def declaredFit(m: MediaRecord): ResizedMedia = {
      val longest = math.max(m.width, m.height)
      if (longest <= maxDim)
        ResizedMedia(m.doc_id, m.format, m.width, m.height, m.payload)
      else {
        val (w, h) = fit(m.width, m.height)
        ResizedMedia(m.doc_id, m.format, w, h, m.payload)
      }
    }
    batch.map { m =>
      try resizeOne(m, maxDim, fit, declaredFit)
      catch { case scala.util.control.NonFatal(_) =>
        // damaged media degrades to the declared-dimension pass-through
        // (see decodeBatch) instead of killing the task
        declaredFit(m)
      }
    }
  }

  private def resizeOne(m: MediaRecord, maxDim: Int,
                        fit: (Int, Int) => (Int, Int),
                        declaredFit: MediaRecord => ResizedMedia): ResizedMedia = {
    {
      val raster: Option[(MediaCodecs.Raster, String)] =
        if (MediaCodecs.sniffBmp(m.payload))
          Some((MediaCodecs.decodeBmpPixels(m.payload), "bmp"))
        else if (MediaCodecs.sniffPng(m.payload))
          Some((MediaCodecs.decodePngPixels(m.payload), "png"))
        else if (JpegCodec.sniffJpeg(m.payload)) {
          val p = JpegCodec.decodePixels(m.payload)
          Some((MediaCodecs.Raster(p.width, p.height, p.channels,
            p.samples), "png")) // jpeg thumbnails re-encode lossless
        } else if (GifCodec.sniffGif(m.payload))
          // box-averaged colors leave the source palette, so GIF
          // thumbnails also re-encode as (lossless, true-color) PNG
          Some((GifCodec.decodeGifPixels(m.payload), "png"))
        else None
      raster match {
        case None => declaredFit(m)
        case Some((r, container)) =>
          // decoded dimensions are the truth, not the declared metadata
          if (math.max(r.width, r.height) <= maxDim)
            ResizedMedia(m.doc_id, m.format, r.width, r.height, m.payload)
          else {
            val (w, h) = fit(r.width, r.height)
            val t = MediaCodecs.boxResample(r, w, h)
            val payload = container match {
              case "bmp" =>
                MediaCodecs.encodeBmp(w, h, (x, y) => {
                  val o = (y * w + x) * 3
                  (t.samples(o), t.samples(o + 1), t.samples(o + 2))
                })
              case _ =>
                // gray rasters (1ch, from grayscale JPEG) widen to RGB;
                // RGBA keeps its alpha (PNG color type 6)
                val ct = if (t.channels == 4) 6 else 2
                MediaCodecs.encodePng(w, h, ct, (x, y) =>
                  if (t.channels == 1) {
                    val v = t.samples(y * w + x)
                    Array(v, v, v)
                  } else {
                    val o = (y * w + x) * t.channels
                    Array.tabulate(t.channels)(c => t.samples(o + c))
                  })
            }
            ResizedMedia(m.doc_id, container, w, h, payload)
          }
      }
    }
  }

  /** One sampled frame: index within the source + its feature hash. */
  final case class SampledFrame(doc_id: Long, frame_idx: Int,
                                frame_bytes: Long, frame_hash: String)

  /** Frame sampling. Payloads that sniff as RIFF/AVI get the REAL
    * path: [[AviCodec.parseAvi]] walks the container once for frame
    * EXTENTS, then only every `stride`-th frame is JPEG-decoded
    * ([[JpegCodec]]) — skipped frames never pay entropy decode, which
    * at a production 1-in-N stride skips (N-1)/N of the work. GIF
    * payloads (animated or single-frame) get the same treatment via
    * [[GifCodec.sampleFrames]]: one container walk, skipped frames
    * advance block-wise past their LZW data undecoded. ISO-BMFF (MP4)
    * payloads resolve the `moov` sample tables to extents
    * ([[Mp4Codec.parseMp4]]) and decode only kept samples; Matroska/
    * WebM payloads walk the EBML tree once ([[MkvCodec.parseMkv]]),
    * skipping non-video tracks by block track number. Other payloads
    * keep the documented chunking stub (every `stride`-th `frameSize`
    * chunk digested as a stand-in frame). Either way the flatMap
    * SHAPE is the same: one input row fans out to O(frames / stride)
    * feature rows executor-side, nothing driver-side, no full
    * materialization of all frames. */
  def frameSample(ds: Dataset[MediaRecord], frameSize: Int,
                  stride: Int): Dataset[SampledFrame] = {
    import ds.sparkSession.implicits._
    require(frameSize > 0 && stride > 0, // fail at BUILD time, not first task
      s"frameSize and stride must be positive, got $frameSize/$stride")
    ds.mapPartitions(frameSampleBatch(_, frameSize, stride))
  }

  /** Per-partition body of [[frameSample]] — public for the same
    * reason [[decodeBatch]] is: direct batch-level exercise (fuzz,
    * tools) without a session. The argument validation lives HERE so
    * the direct entry point cannot throw raw arithmetic errors. */
  def frameSampleBatch(batch: Iterator[MediaRecord], frameSize: Int,
                       stride: Int): Iterator[SampledFrame] = {
    require(frameSize > 0 && stride > 0,
      s"frameSize and stride must be positive, got $frameSize/$stride")
    locally {
      val md = java.security.MessageDigest.getInstance("MD5")
      batch.flatMap { m =>
        // container branches materialize STRICTLY inside the try: the
        // kept-frame rows are bounded (frames/stride), and a lazy
        // iterator would throw outside the damage guard
        val real: Option[Seq[SampledFrame]] =
          try {
            if (AviCodec.sniffAvi(m.payload)) {
              Some(sampleContainer(m, md, "avi-frame",
                AviCodec.parseAvi(m.payload).frames, stride).toVector)
            } else if (GifCodec.sniffGif(m.payload)) {
              // animated (or single-frame) GIF: one container walk, only
              // kept frames pay LZW decode, each consumed standalone
              Some(GifCodec.sampleFrames(m.payload, stride).map {
                case (i, r) =>
                  md.reset()
                  var sum = 0L
                  var max = 0
                  var k = 0
                  while (k < r.samples.length) {
                    sum += r.samples(k)
                    if (r.samples(k) > max) max = r.samples(k)
                    k += 1
                  }
                  val kind = if (r.channels == 3) "rgb" else "rgba"
                  val feat = s"gif-frame $kind ${r.width}x${r.height} $sum $max"
                  SampledFrame(m.doc_id, i,
                    r.width.toLong * r.height * r.channels,
                    hexLower(md.digest(feat.getBytes("UTF-8"))))
              })
            } else if (Mp4Codec.sniffMp4(m.payload)) {
              // ISO-BMFF video: extents come from the moov sample tables,
              // so skipped samples are never even INDEXED past linearly —
              // on a seekable store the walk is O(moov), not O(file)
              Some(sampleContainer(m, md, "mp4-frame",
                Mp4Codec.parseMp4(m.payload).frames, stride).toVector)
            } else if (MkvCodec.sniffMkv(m.payload)) {
              // Matroska/WebM: one EBML walk collects the video track's
              // block extents (interleaved audio skipped by track-number
              // dispatch); only kept frames pay entropy decode
              Some(sampleContainer(m, md, "mkv-frame",
                MkvCodec.parseMkv(m.payload).frames, stride).toVector)
            } else None
          } catch { case scala.util.control.NonFatal(_) =>
            // DAMAGED container: degrade to the chunking stub below
            // instead of killing the task (see decodeBatch)
            None
          }
        real match {
          case Some(rows) => rows.iterator
          case None =>
            val nFrames = m.payload.length / frameSize // partial tail dropped
            (0 until nFrames by stride).iterator.map { i =>
              md.reset()
              md.update(m.payload, i * frameSize, frameSize)
              SampledFrame(m.doc_id, i, frameSize.toLong,
                hexLower(md.digest()))
            }
        }
      }
    }
  }
}
