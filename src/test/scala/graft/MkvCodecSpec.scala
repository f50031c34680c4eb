package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.llm.{JpegCodec, MkvCodec}

/** Pins for the Matroska/WebM EBML container codec: writer/parser
  * round-trip, track-number dispatch (interleaved audio blocks must be
  * skipped), SimpleBlock keyframe flags vs BlockGroup/ReferenceBlock
  * semantics, unknown-size Segment, and the loud-failure contract
  * (lacing, truncation, invalid vints). */
class MkvCodecSpec extends AnyFunSuite {

  private def grayFrame(seed: Int, w: Int = 16, h: Int = 16): Array[Byte] =
    JpegCodec.encodeJpeg(w, h, 1, 1, JpegCodec.flatQuant,
      JpegCodec.flatQuant, 0,
      (x, y) => (16 + 8 * (((x / 8) + 2 * (y / 8) + seed) % 24), 128, 128))

  // minimal EBML builder, spec-local, for hand-crafted layouts
  private def el(id: Long, payload: Array[Byte]): Array[Byte] = {
    val ib = {
      val len = if (id <= 0xff) 1 else if (id <= 0xffff) 2
        else if (id <= 0xffffff) 3 else 4
      Array.tabulate(len)(i => ((id >> (8 * (len - 1 - i))) & 0xff).toByte)
    }
    val v = payload.length.toLong
    var slen = 1
    while (v >= (1L << (7 * slen)) - 1) slen += 1
    val marked = v | (1L << (7 * slen))
    val sb = Array.tabulate(slen)(i =>
      ((marked >> (8 * (slen - 1 - i))) & 0xff).toByte)
    ib ++ sb ++ payload
  }
  private def uint(v: Long): Array[Byte] = {
    var len = 1
    while (len < 8 && (v >> (8 * len)) != 0) len += 1
    Array.tabulate(len)(i => ((v >> (8 * (len - 1 - i))) & 0xff).toByte)
  }

  test("encode -> parse round-trips frames byte-exactly with geometry, " +
      "codec id and timestamp scale") {
    val frames = (0 until 5).map(grayFrame(_))
    val mkv = MkvCodec.encodeMkvMjpeg(16, 16, frames, clusterSize = 2)
    assert(MkvCodec.sniffMkv(mkv))
    val vid = MkvCodec.parseMkv(mkv)
    assert(vid.width == 16 && vid.height == 16)
    assert(vid.codec == "V_MJPEG")
    assert(vid.timestampScale == 1000000L)
    assert(vid.nFrames == 5)
    for (i <- 0 until 5)
      assert(MkvCodec.frameBytes(mkv, vid.frames(i))
        .sameElements(frames(i)), s"frame $i bytes")
    assert(vid.syncFrames == (0 until 5), "syncEvery=0 -> all keyframes")
  }

  test("keyframe flag lands on every k-th SimpleBlock") {
    val frames = (0 until 6).map(grayFrame(_))
    val mkv = MkvCodec.encodeMkvMjpeg(8, 8, frames, syncEvery = 2)
    assert(MkvCodec.parseMkv(mkv).syncFrames == IndexedSeq(0, 2, 4))
  }

  test("interleaved audio-track blocks are skipped by track-number " +
      "dispatch, not mis-indexed into the frame list") {
    val frames = (0 until 4).map(grayFrame(_))
    val noise = (0 until 4).map(i => Array.fill[Byte](13)((7 * i + 1).toByte))
    val mkv = MkvCodec.encodeMkvMjpeg(16, 16, frames, clusterSize = 3,
      audioFiller = noise)
    val vid = MkvCodec.parseMkv(mkv)
    assert(vid.nFrames == 4)
    for (i <- 0 until 4)
      assert(MkvCodec.frameBytes(mkv, vid.frames(i))
        .sameElements(frames(i)), s"frame $i bytes")
  }

  test("BlockGroup/Block path: keyframe = no ReferenceBlock sibling " +
      "(hand-built cluster)") {
    val f0 = grayFrame(0)
    val f1 = grayFrame(1)
    def blockBody(data: Array[Byte]): Array[Byte] =
      Array[Byte](0x81.toByte, 0, 0, 0) ++ data // track 1, ts 0, no flags
    val header = el(0x1A45DFA3L,
      el(0x4282L, "matroska".getBytes("US-ASCII")))
    val tracks = el(0x1654AE6BL, el(0xAEL,
      el(0xD7L, uint(1)) ++ el(0x83L, uint(1)) ++
        el(0x86L, "V_MJPEG".getBytes("US-ASCII")) ++
        el(0xE0L, el(0xB0L, uint(16)) ++ el(0xBAL, uint(16)))))
    val cluster = el(0x1F43B675L,
      el(0xE7L, uint(0)) ++
        el(0xA0L, el(0xA1L, blockBody(f0)) ++ el(0xFBL, uint(0))) ++
        el(0xA0L, el(0xA1L, blockBody(f1))))
    val mkv = header ++ el(0x18538067L, tracks ++ cluster)
    val vid = MkvCodec.parseMkv(mkv)
    assert(vid.nFrames == 2)
    assert(MkvCodec.frameBytes(mkv, vid.frames(0)).sameElements(f0))
    assert(MkvCodec.frameBytes(mkv, vid.frames(1)).sameElements(f1))
    assert(vid.syncFrames == IndexedSeq(1),
      "the referenced block is non-sync, the unreferenced one is sync")
  }

  test("audio-only file (no type-1 track) parses to zero frames, not " +
      "an exception; Tracks AFTER the first Cluster still binds; and " +
      "track number 127 (1-byte vint 0xFF) is a legal track, not " +
      "'unknown'") {
    val f0 = grayFrame(0)
    val header = el(0x1A45DFA3L,
      el(0x4282L, "matroska".getBytes("US-ASCII")))
    def trackEntry(num: Long, typ: Long): Array[Byte] = el(0xAEL,
      el(0xD7L, uint(num)) ++ el(0x83L, uint(typ)) ++
        el(0x86L, (if (typ == 1) "V_MJPEG" else "A_PCM").getBytes("US-ASCII")) ++
        (if (typ == 1)
          el(0xE0L, el(0xB0L, uint(16)) ++ el(0xBAL, uint(16)))
        else Array.emptyByteArray))
    def sblock(trackVint: Array[Byte], data: Array[Byte]): Array[Byte] =
      el(0xA3L, trackVint ++ Array[Byte](0, 0, 0x80.toByte) ++ data)
    // audio-only: one type-2 track, one block
    val audioOnly = header ++ el(0x18538067L,
      el(0x1654AE6BL, trackEntry(2, 2)) ++
        el(0x1F43B675L, el(0xE7L, uint(0)) ++
          sblock(Array(0x82.toByte), Array[Byte](1, 2, 3))))
    val a = MkvCodec.parseMkv(audioOnly)
    assert(a.nFrames == 0 && a.syncFrames.isEmpty)
    // cluster BEFORE tracks, video on track 127 (vint 0xFF)
    val clusterFirst = header ++ el(0x18538067L,
      el(0x1F43B675L, el(0xE7L, uint(0)) ++
        sblock(Array(0xFF.toByte), f0) ++
        sblock(Array(0x82.toByte), Array[Byte](9, 9))) ++
        el(0x1654AE6BL, trackEntry(127, 1) ++ trackEntry(2, 2)))
    val v = MkvCodec.parseMkv(clusterFirst)
    assert(v.nFrames == 1)
    assert(MkvCodec.frameBytes(clusterFirst, v.frames(0)).sameElements(f0))
  }

  test("unknown-size Segment (all value bits set) parses to end of " +
      "payload") {
    val frames = (0 until 3).map(grayFrame(_))
    val mkv = MkvCodec.encodeMkvMjpeg(16, 16, frames)
    val base = MkvCodec.parseMkv(mkv)
    // locate the Segment id (0x18538067) and overwrite its size vint
    // with the same-length all-ones (unknown) form
    val segOff = mkv.indices.find(i =>
      (mkv(i) & 0xff) == 0x18 && (mkv(i + 1) & 0xff) == 0x53 &&
        (mkv(i + 2) & 0xff) == 0x80 && (mkv(i + 3) & 0xff) == 0x67).get
    val szOff = segOff + 4
    val fb = mkv(szOff) & 0xff
    var mask = 0x80; var len = 1
    while ((fb & mask) == 0) { mask >>= 1; len += 1 }
    val patched = mkv.clone()
    patched(szOff) = (0xff >> (len - 1)).toByte
    for (i <- 1 until len) patched(szOff + i) = 0xff.toByte
    assert(MkvCodec.parseMkv(patched).frames == base.frames)
  }

  test("hostile input fails loudly: lacing, truncation, invalid vint, " +
      "non-EBML payload") {
    val frames = (0 until 3).map(grayFrame(_))
    val mkv = MkvCodec.encodeMkvMjpeg(16, 16, frames)
    val vid = MkvCodec.parseMkv(mkv)
    // set lacing bits on the first video block's flags byte (the byte
    // immediately before its frame extent)
    val laced = mkv.clone()
    laced(vid.frames(0)._1 - 1) =
      (laced(vid.frames(0)._1 - 1) | 0x06).toByte
    intercept[IllegalArgumentException] { MkvCodec.parseMkv(laced) }
    // truncation mid-cluster
    intercept[IllegalArgumentException] {
      MkvCodec.parseMkv(java.util.Arrays.copyOf(mkv, mkv.length - 10))
    }
    // invalid vint: zero first byte where an element id must start
    val zeroId = mkv.clone()
    zeroId(vid.frames(0)._1 - 4 - 2) = 0 // SimpleBlock id byte -> 0x00
    intercept[IllegalArgumentException] { MkvCodec.parseMkv(zeroId) }
    assert(!MkvCodec.sniffMkv("RIFF but not EBML".getBytes("UTF-8")))
    intercept[IllegalArgumentException] {
      MkvCodec.parseMkv("RIFF but not EBML".getBytes("UTF-8"))
    }
  }
}
