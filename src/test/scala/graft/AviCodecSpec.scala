package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.llm.{AviCodec, JpegCodec}

/** Pins for the RIFF/AVI MJPEG container codec: byte-layout of the
  * writer, parser round-trip, tolerant-walk behaviors (interleave
  * `rec ` lists, odd-size word alignment, missing index), and the
  * frame-extent contract the sampler slices on. */
class AviCodecSpec extends AnyFunSuite {

  private def grayFrame(seed: Int, w: Int = 16, h: Int = 16): Array[Byte] =
    JpegCodec.encodeJpeg(w, h, 1, 1, JpegCodec.flatQuant,
      JpegCodec.flatQuant, 0,
      (x, y) => (16 + 8 * (((x / 8) + 2 * (y / 8) + seed) % 24), 128, 128))

  test("encode -> parse round-trips frames byte-exactly with container " +
      "geometry and timing") {
    val frames = (0 until 4).map(grayFrame(_))
    val avi = AviCodec.encodeAviMjpeg(16, 16, 10, frames)
    assert(AviCodec.sniffAvi(avi))
    val vid = AviCodec.parseAvi(avi)
    assert(vid.width == 16 && vid.height == 16)
    assert(vid.microSecPerFrame == 100000)
    assert(vid.nFrames == 4)
    for (i <- 0 until 4)
      assert(AviCodec.frameBytes(avi, vid.frames(i))
        .sameElements(frames(i)), s"frame $i bytes")
  }

  test("RIFF layout: fourccs and sizes land where the AVI spec puts " +
      "them (hand-checked header walk)") {
    val avi = AviCodec.encodeAviMjpeg(32, 8, 25, Seq(grayFrame(1, 32, 8)))
    def cc(off: Int) = new String(avi.slice(off, off + 4), "US-ASCII")
    def le32(off: Int) =
      (avi(off) & 0xff) | ((avi(off + 1) & 0xff) << 8) |
        ((avi(off + 2) & 0xff) << 16) | ((avi(off + 3) & 0xff) << 24)
    assert(cc(0) == "RIFF" && cc(8) == "AVI ")
    assert(le32(4) == avi.length - 8, "RIFF size covers the whole file")
    assert(cc(12) == "LIST" && cc(20) == "hdrl")
    assert(cc(24) == "avih" && le32(28) == 56)
    assert(le32(32) == 1000000 / 25, "dwMicroSecPerFrame")
    assert(le32(64) == 32 && le32(68) == 8, "avih width/height")
    // strl list follows the 56-byte avih body
    assert(cc(88) == "LIST" && cc(96) == "strl")
    assert(cc(100) == "strh" && cc(108) == "vids" && cc(112) == "MJPG")
    // trailing idx1 with one AVIIF_KEYFRAME entry
    val idxOff = avi.length - 8 - 16
    assert(cc(idxOff) == "idx1" && le32(idxOff + 4) == 16)
    assert(cc(idxOff + 8) == "00dc" && le32(idxOff + 12) == 0x10)
  }

  test("parser walks interleave 'rec ' lists and odd-size chunks " +
      "(word alignment), and needs no idx1") {
    // hand-build: movi carrying an odd-size JUNK chunk (alignment
    // pad), one bare 00dc frame, and one frame inside a LIST rec —
    // with no hdrl and no idx1 at all
    val f0 = grayFrame(2)
    val f1 = grayFrame(3)
    def w32(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
      b.write(v & 0xff); b.write((v >> 8) & 0xff)
      b.write((v >> 16) & 0xff); b.write((v >> 24) & 0xff)
    }
    def wtag(b: java.io.ByteArrayOutputStream, s: String): Unit =
      b.write(s.getBytes("US-ASCII"))
    def wchunk(b: java.io.ByteArrayOutputStream, id: String,
               body: Array[Byte]): Unit = {
      wtag(b, id); w32(b, body.length); b.write(body)
      if ((body.length & 1) == 1) b.write(0)
    }
    val junk = Array[Byte](7) // odd-size chunk forces alignment pad
    val recBody = {
      val b = new java.io.ByteArrayOutputStream()
      wtag(b, "rec ")
      wchunk(b, "00dc", f1)
      b.toByteArray
    }
    val movi = new java.io.ByteArrayOutputStream()
    wtag(movi, "movi")
    wchunk(movi, "JUNK", junk)
    wchunk(movi, "00dc", f0)
    wchunk(movi, "LIST", recBody)
    val file = new java.io.ByteArrayOutputStream()
    wtag(file, "RIFF")
    val moviBytes = movi.toByteArray
    w32(file, 4 + 8 + moviBytes.length) // AVI + LIST movi (no hdrl, no idx1)
    wtag(file, "AVI ")
    wchunk(file, "LIST", moviBytes)
    val avi = file.toByteArray
    val vid = AviCodec.parseAvi(avi)
    assert(vid.nFrames == 2)
    assert(AviCodec.frameBytes(avi, vid.frames(0)).sameElements(f0))
    assert(AviCodec.frameBytes(avi, vid.frames(1)).sameElements(f1))
    assert(vid.width == 0 && vid.height == 0, "no avih -> no geometry")
  }

  test("malformed input fails loudly") {
    intercept[IllegalArgumentException] {
      AviCodec.parseAvi("not avi at all".getBytes("US-ASCII"))
    }
    // truncated: RIFF size overruns the payload
    val good = AviCodec.encodeAviMjpeg(16, 16, 10, Seq(grayFrame(0)))
    intercept[IllegalArgumentException] {
      AviCodec.parseAvi(java.util.Arrays.copyOf(good, good.length - 10))
    }
    // a chunk whose declared size overruns its list
    val bad = good.clone()
    bad(28) = 0x7f // blow up the avih size field
    intercept[IllegalArgumentException] { AviCodec.parseAvi(bad) }
  }

  test("sampled frames decode to the closed-form mosaic stats " +
      "(the q117 property)") {
    val frames = (0 until 5).map(grayFrame(_))
    val avi = AviCodec.encodeAviMjpeg(16, 16, 10, frames)
    val vid = AviCodec.parseAvi(avi)
    for (i <- 0 until 5 by 2) {
      val img = JpegCodec.decodeJpeg(AviCodec.frameBytes(avi, vid.frames(i)))
      var sum = 0L; var max = 0
      for (by <- 0 until 2; bx <- 0 until 2) {
        val yv = 16 + 8 * ((bx + 2 * by + i) % 24)
        sum += 64L * yv
        if (yv > max) max = yv
      }
      assert(img.sumChannels == sum && img.maxChannel == max,
        s"frame $i stats")
    }
  }
}
