package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.llm.{AviCodec, GifCodec, JpegCodec, MediaCodecs,
  MkvCodec, Mp4Codec, MultimodalOps}

/** Deterministic byte-mutation fuzz over every sniffable container:
  * the OPERATIONAL damage contract is that [[MultimodalOps]]'s
  * per-record dispatch NEVER throws — a payload that sniffs as a known
  * format but fails its decode (a certainty somewhere in 100 TB of
  * crawl) degrades to the deterministic fallback instead of killing
  * the task, the media analogue of the WARC walk's --skip-bad. Codec
  * bugs still surface in the per-codec specs, which call the decoders
  * directly. Mutations and truncations are driven by a fixed xorshift
  * seed, so a failure reproduces exactly. */
class ContainerFuzzSpec extends AnyFunSuite {

  private var seed = 0x9e3779b97f4a7c15L
  private def next(): Long = {
    seed ^= seed << 13; seed ^= seed >>> 7; seed ^= seed << 17; seed
  }
  private def nextInt(bound: Int): Int =
    ((next() >>> 1) % bound).toInt

  private def jpegFrame(i: Int): Array[Byte] =
    JpegCodec.encodeJpeg(8, 8, 3, 1, JpegCodec.flatQuant,
      JpegCodec.flatQuant, 0, (_, _) => (16 + 8 * (i % 24), 130, 140))

  private def valids: Seq[(String, Array[Byte])] = {
    val frames = (0 until 4).map(jpegFrame)
    Seq(
      "bmp" -> MediaCodecs.encodeBmp(8, 8, (x, y) => (x * 30, y * 30, 77)),
      "png" -> MediaCodecs.encodePng(8, 8, 2, (x, y) => Array(x * 30, y * 30, 5)),
      "jpeg" -> jpegFrame(1),
      "gif" -> GifCodec.encodeGif(16, 16, Array(10, 20, 30, 200, 90, 50,
        40, 0, 120, 255, 255, 9), (x, y) => ((x / 4) + (y / 4)) % 4,
        interlaced = true, transparentIndex = 2),
      "wav" -> MediaCodecs.encodeWav(8000,
        Array.tabulate(64)(i => (i * 321 - 5000).toShort)),
      "avi" -> AviCodec.encodeAviMjpeg(8, 8, 10, frames),
      "mp4" -> Mp4Codec.encodeMp4Mjpeg(8, 8, 10, frames, samplesPerChunk = 2,
        syncEvery = 2),
      "mkv" -> MkvCodec.encodeMkvMjpeg(8, 8, frames, clusterSize = 2,
        audioFiller = frames.indices.map(i => Array.fill[Byte](9)(i.toByte))))
  }

  test("mutated and truncated payloads never escape the dispatch: " +
      "decodeBatch, frameSample and resize yield a row per record") {
    val cases = valids
    val records = scala.collection.mutable.ArrayBuffer.empty[MultimodalOps.MediaRecord]
    var id = 0L
    for ((_, valid) <- cases) {
      // the pristine payload itself
      records += MultimodalOps.MediaRecord(id, valid, "fuzz", 8, 8); id += 1
      // 250 random 1-4 byte mutations
      for (_ <- 0 until 250) {
        val mut = valid.clone()
        for (_ <- 0 to nextInt(3))
          mut(nextInt(mut.length)) = (next() & 0xff).toByte
        records += MultimodalOps.MediaRecord(id, mut, "fuzz", 8, 8); id += 1
      }
      // 50 truncations at random lengths (including very short)
      for (_ <- 0 until 50) {
        val len = nextInt(valid.length)
        records += MultimodalOps.MediaRecord(id,
          java.util.Arrays.copyOf(valid, len), "fuzz", 8, 8)
        id += 1
      }
    }
    val decoded = MultimodalOps.decodeBatch(records.iterator).toVector
    assert(decoded.size == records.size, "one feature row per record")
    assert(decoded.forall(_.thumb_hash.length == 32))
    // frameSample: every record iterates to completion (the damage
    // fallback is the chunking stub, so rows always come back)
    var frameRows = 0L
    val it = MultimodalOps.frameSampleBatch(records.iterator, 16, 2)
    while (it.hasNext) { it.next(); frameRows += 1 }
    assert(frameRows > records.size / 2,
      "every record contributes stub or real frames")
    // resize: one output per record; damage degrades to the
    // declared-dimension pass-through
    val resized = MultimodalOps.resizeBatch(records.iterator, 4).toVector
    assert(resized.size == records.size, "one resized row per record")
    assert(resized.forall(r => r.width >= 1 && r.height >= 1 &&
      r.payload != null))
  }
}
