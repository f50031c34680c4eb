package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.llm.{JpegCodec, Mp4Codec}

/** Pins for the ISO-BMFF (MP4) container codec: writer byte layout,
  * parse round-trip of the stsc/stco/stsz resolution (ragged last
  * chunk, co64, fixed-size stsz is exercised via hand-patching),
  * box-size forms (largesize, size==0), stss sync semantics, and the
  * loud-failure contract on hostile tables. */
class Mp4CodecSpec extends AnyFunSuite {

  private def grayFrame(seed: Int, w: Int = 16, h: Int = 16): Array[Byte] =
    JpegCodec.encodeJpeg(w, h, 1, 1, JpegCodec.flatQuant,
      JpegCodec.flatQuant, 0,
      (x, y) => (16 + 8 * (((x / 8) + 2 * (y / 8) + seed) % 24), 128, 128))

  private def indexOf(hay: Array[Byte], needle: String): Int = {
    val n = needle.getBytes("US-ASCII")
    hay.indices.find(i => i + n.length <= hay.length &&
      n.indices.forall(j => hay(i + j) == n(j))).getOrElse(-1)
  }

  test("encode -> parse round-trips frames byte-exactly with geometry, " +
      "timescale, codec and a ragged last chunk") {
    val frames = (0 until 5).map(grayFrame(_)) // spc=2 -> chunks 2+2+1
    val mp4 = Mp4Codec.encodeMp4Mjpeg(16, 16, 10, frames, samplesPerChunk = 2)
    assert(Mp4Codec.sniffMp4(mp4))
    val vid = Mp4Codec.parseMp4(mp4)
    assert(vid.width == 16 && vid.height == 16)
    assert(vid.timescale == 10 && vid.durationTicks == 5)
    assert(vid.codec == "jpeg")
    assert(vid.nFrames == 5)
    for (i <- 0 until 5)
      assert(Mp4Codec.frameBytes(mp4, vid.frames(i))
        .sameElements(frames(i)), s"frame $i bytes")
    // no stss written -> every sample is sync (14496-12 8.6.2)
    assert(vid.syncFrames == (0 until 5))
  }

  test("co64 chunk offsets parse identically to stco") {
    val frames = (0 until 4).map(grayFrame(_))
    val a = Mp4Codec.parseMp4(
      Mp4Codec.encodeMp4Mjpeg(16, 16, 25, frames, samplesPerChunk = 3))
    val b = Mp4Codec.parseMp4(
      Mp4Codec.encodeMp4Mjpeg(16, 16, 25, frames, samplesPerChunk = 3,
        forceCo64 = true))
    // mdat starts at the same absolute offset (moov trails the file),
    // so the extents must be identical across the two offset widths
    assert(a.frames == b.frames)
  }

  test("stss marks every k-th sample sync; others are non-sync") {
    val frames = (0 until 6).map(grayFrame(_))
    val mp4 = Mp4Codec.encodeMp4Mjpeg(8, 8, 10, frames, syncEvery = 2)
    assert(Mp4Codec.parseMp4(mp4).syncFrames == IndexedSeq(0, 2, 4))
  }

  test("box layout: ftyp first, mdat second, sample tables land inside " +
      "moov/trak/mdia/minf/stbl (hand-checked walk)") {
    val mp4 = Mp4Codec.encodeMp4Mjpeg(32, 8, 25, Seq(grayFrame(1, 32, 8)))
    def cc(off: Int) = new String(mp4.slice(off, off + 4), "US-ASCII")
    def be32(off: Int) =
      ((mp4(off) & 0xff) << 24) | ((mp4(off + 1) & 0xff) << 16) |
        ((mp4(off + 2) & 0xff) << 8) | (mp4(off + 3) & 0xff)
    assert(cc(4) == "ftyp" && be32(0) == 24 && cc(8) == "isom")
    assert(cc(28) == "mdat")
    val moovOff = 24 + be32(24)
    assert(cc(moovOff + 4) == "moov")
    assert(moovOff + be32(moovOff) == mp4.length,
      "moov is the trailing box and its size closes the file")
    for (t <- Seq("mvhd", "tkhd", "mdhd", "hdlr", "vmhd", "dref",
      "stsd", "stts", "stsc", "stsz", "stco"))
      assert(indexOf(mp4, t) > moovOff, s"$t inside moov")
  }

  test("size==0 (to end of enclosure) and 64-bit largesize box forms " +
      "both parse") {
    val frames = (0 until 3).map(grayFrame(_))
    val mp4 = Mp4Codec.encodeMp4Mjpeg(16, 16, 10, frames)
    val base = Mp4Codec.parseMp4(mp4)
    val moovOff = {
      def be32(off: Int) =
        ((mp4(off) & 0xff) << 24) | ((mp4(off + 1) & 0xff) << 16) |
          ((mp4(off + 2) & 0xff) << 8) | (mp4(off + 3) & 0xff)
      24 + be32(24)
    }
    // size==0: moov is the last top-level box, so zeroing its size
    // field must not change one parsed extent
    val zeroed = mp4.clone()
    zeroed(moovOff) = 0; zeroed(moovOff + 1) = 0
    zeroed(moovOff + 2) = 0; zeroed(moovOff + 3) = 0
    assert(Mp4Codec.parseMp4(zeroed).frames == base.frames)
    // largesize: rewrite moov's header to the 1+largesize form (moov
    // trails mdat, so absolute chunk offsets stay valid)
    val moovSize = mp4.length - moovOff
    val big = new Array[Byte](mp4.length + 8)
    System.arraycopy(mp4, 0, big, 0, moovOff)
    big(moovOff) = 0; big(moovOff + 1) = 0; big(moovOff + 2) = 0
    big(moovOff + 3) = 1 // size32 == 1 -> largesize follows the type
    System.arraycopy(mp4, moovOff + 4, big, moovOff + 4, 4) // 'moov'
    val ls = moovSize + 8L
    for (i <- 0 until 8)
      big(moovOff + 8 + i) = ((ls >> (8 * (7 - i))) & 0xff).toByte
    System.arraycopy(mp4, moovOff + 8, big, moovOff + 16, moovSize - 8)
    assert(Mp4Codec.parseMp4(big).frames == base.frames)
  }

  test("fixed-size stsz (sample_size != 0) resolves without a size table") {
    // equal-size frames let us hand-patch stsz to the fixed form:
    // set sample_size = len and truncate is not needed because the
    // parser must IGNORE the trailing per-sample table when fixed
    val f = grayFrame(1)
    val frames = Seq(f, f.clone(), f.clone())
    val mp4 = Mp4Codec.encodeMp4Mjpeg(16, 16, 10, frames)
    val stszOff = indexOf(mp4, "stsz") - 4
    val patched = mp4.clone()
    val len = f.length
    patched(stszOff + 12) = ((len >> 24) & 0xff).toByte
    patched(stszOff + 13) = ((len >> 16) & 0xff).toByte
    patched(stszOff + 14) = ((len >> 8) & 0xff).toByte
    patched(stszOff + 15) = (len & 0xff).toByte
    val vid = Mp4Codec.parseMp4(patched)
    assert(vid.nFrames == 3)
    for (i <- 0 until 3)
      assert(Mp4Codec.frameBytes(patched, vid.frames(i)).sameElements(f))
  }

  test("audio-only file (no vide track) parses to zero frames, not an " +
      "exception — a valid .m4a must not fail the task") {
    val mp4 = Mp4Codec.encodeMp4Mjpeg(16, 16, 10,
      (0 until 3).map(grayFrame(_)))
    val patched = mp4.clone()
    val hdlrOff = indexOf(patched, "vide")
    for ((c, i) <- "soun".zipWithIndex) patched(hdlrOff + i) = c.toByte
    val vid = Mp4Codec.parseMp4(patched)
    assert(vid.nFrames == 0 && vid.syncFrames.isEmpty)
  }

  test("hostile fixed-size stsz with a huge sample count raises before " +
      "allocating (no OOM from a tiny payload)") {
    val mp4 = Mp4Codec.encodeMp4Mjpeg(16, 16, 10,
      (0 until 3).map(grayFrame(_)))
    val patched = mp4.clone()
    val stszOff = indexOf(patched, "stsz") - 4
    // sample_size = 1, sample_count = 0x7fffffff: 2 GiB of declared
    // samples in a ~1 KB payload
    patched(stszOff + 12) = 0; patched(stszOff + 13) = 0
    patched(stszOff + 14) = 0; patched(stszOff + 15) = 1
    patched(stszOff + 16) = 0x7f; patched(stszOff + 17) = 0xff.toByte
    patched(stszOff + 18) = 0xff.toByte; patched(stszOff + 19) = 0xff.toByte
    intercept[IllegalArgumentException] { Mp4Codec.parseMp4(patched) }
  }

  test("hostile input fails loudly, never AIOOBE: truncation, offsets " +
      "past the payload, table counts past the box") {
    val mp4 = Mp4Codec.encodeMp4Mjpeg(16, 16, 10,
      (0 until 3).map(grayFrame(_)))
    // truncated moov
    intercept[IllegalArgumentException] {
      Mp4Codec.parseMp4(java.util.Arrays.copyOf(mp4, mp4.length - 40))
    }
    // chunk offset pointing past the payload
    val badOff = mp4.clone()
    val stcoOff = indexOf(badOff, "stco") - 4
    badOff(stcoOff + 16) = 0x7f // first offset -> ~2^31
    intercept[IllegalArgumentException] { Mp4Codec.parseMp4(badOff) }
    // stsz sample count beyond its box extent
    val badCnt = mp4.clone()
    val stszOff = indexOf(badCnt, "stsz") - 4
    badCnt(stszOff + 16) = 0x00.toByte; badCnt(stszOff + 17) = 0x0f
    intercept[IllegalArgumentException] { Mp4Codec.parseMp4(badCnt) }
    // not MP4 at all
    intercept[IllegalArgumentException] {
      Mp4Codec.parseMp4("plainly not a video".getBytes("UTF-8"))
    }
    assert(!Mp4Codec.sniffMp4("BM not a video either".getBytes("UTF-8")))
  }
}
