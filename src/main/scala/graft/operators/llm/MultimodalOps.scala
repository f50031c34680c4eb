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
      val hash = md.digest(m.payload).map("%02x".format(_)).mkString
      DecodedMedia(m.doc_id, m.format, m.payload.length.toLong, hash)
    }
  }

  def decode(ds: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(decodeBatch)
  }
}
