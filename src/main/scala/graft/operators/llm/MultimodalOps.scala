package graft.operators.llm

import org.apache.spark.sql.Dataset

/**
 * Multimodal column plumbing (brief: treat image/audio/video as opaque
 * `binary` columns with typed metadata; decode/feature-extract runs
 * executor-side in batches).
 *
 * The DECODE step is a STUB — image/audio codec libraries are not in this
 * container — replaced by a deterministic fake (byte length + md5). The
 * Spark-side plumbing is real and is what this operator verifies: binary
 * payload columns with typed metadata via case-class Encoders, and
 * per-partition batch iteration (`mapPartitions`) so a real codec would
 * amortize its init across a whole batch, exactly where an image library
 * or a JNI decoder would slot in.
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

  /** Batch decode — one codec instance per partition, reused per record. */
  def decodeBatch(batch: Iterator[MediaRecord]): Iterator[DecodedMedia] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    batch.map { m =>
      // STUB: a real decoder would inflate m.payload (image/audio bytes)
      // and emit features; the deterministic fake keeps schema, batching
      // and hashing verifiable end-to-end.
      md.reset()
      val hash = hexLower(md.digest(m.payload))
      DecodedMedia(m.doc_id, m.format, m.payload.length.toLong, hash)
    }
  }

  def decode(ds: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(decodeBatch)
  }

  /** Resized media: target box + the source payload's identity. */
  final case class ResizedMedia(doc_id: Long, format: String,
                                width: Int, height: Int,
                                payload: Array[Byte])

  /** Aspect-preserving fit into `maxDim` — the dimension math is real
    * (what a pipeline partitions and budgets on); the pixel resample is
    * the STUB (payload passes through, where a codec would re-encode).
    * Already-fitting media pass through unscaled (never upscale). */
  def resize(ds: Dataset[MediaRecord], maxDim: Int): Dataset[ResizedMedia] = {
    import ds.sparkSession.implicits._
    require(maxDim > 0, s"maxDim must be positive, got $maxDim")
    ds.mapPartitions(_.map { m =>
      val longest = math.max(m.width, m.height)
      if (longest <= maxDim)
        ResizedMedia(m.doc_id, m.format, m.width, m.height, m.payload)
      else {
        // floor-scale, min 1px: integer math keeps it engine-portable;
        // scale in Long — width * maxDim overflows Int for declared
        // dimensions past ~2^31/maxDim (the result itself always fits:
        // it is <= maxDim)
        val w = math.max(1L, m.width.toLong * maxDim / longest).toInt
        val h = math.max(1L, m.height.toLong * maxDim / longest).toInt
        ResizedMedia(m.doc_id, m.format, w, h, m.payload)
      }
    })
  }

  /** One sampled frame: index within the source + its feature hash. */
  final case class SampledFrame(doc_id: Long, frame_idx: Int,
                                frame_bytes: Long, frame_hash: String)

  /** Frame sampling: every `stride`-th fixed-size chunk of the payload
    * stands in for a decoded frame (the STUB — a real video codec yields
    * actual frames; chunking keeps offsets and counts deterministic).
    * The flatMap SHAPE is the real part: one input row fans out to
    * O(payload/frameSize/stride) feature rows executor-side, with
    * nothing driver-side and no full-materialization of all frames. */
  def frameSample(ds: Dataset[MediaRecord], frameSize: Int,
                  stride: Int): Dataset[SampledFrame] = {
    import ds.sparkSession.implicits._
    require(frameSize > 0 && stride > 0,
      s"frameSize and stride must be positive, got $frameSize/$stride")
    ds.mapPartitions { batch =>
      val md = java.security.MessageDigest.getInstance("MD5")
      batch.flatMap { m =>
        val nFrames = m.payload.length / frameSize   // trailing partial dropped
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
