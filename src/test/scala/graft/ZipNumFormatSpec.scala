package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.zipnum.{ZipNumFormat, ZipNumIndex}
import graft.sources.zipnum.ZipNumFormat.Block

/** Byte-level and planning-level checks of the ZipNum format
  * (/root/reference/src/main/java/org/archive/hadoop/mapreduce/
  * ZipNumAllShardRecordWriter.java:110-152 for the member layout;
  * /root/reference/src/main/java/org/archive/hadoop/cdx/CDXCluster.java:31-35
  * and ClusterRange.java:57-62 for pruning). */
class ZipNumFormatSpec extends AnyFunSuite {

  test("gzipMember → gunzipLines roundtrip, incl. interior CR") {
    val lines = Seq(
      "com,a)/ 20120101000000 http://a.com/ text/html 200 D - - 1 0 f.gz",
      "com,b)/x 20120102000000 http://b.com/x text/html 302 D http://b.com/y\rz - 2 10 f.gz")
    val payload = lines.map(_ + "\n").mkString.getBytes("UTF-8")
    val member = ZipNumFormat.gzipMember(payload)
    assert(ZipNumFormat.gunzipLines(member).toSeq == lines)
  }

  test("member is readable by a stock GZIPInputStream (SL field is ignorable)") {
    val payload = "hello zipnum\n".getBytes("UTF-8")
    val member = ZipNumFormat.gzipMember(payload)
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(member))
    assert(new String(in.readAllBytes(), "UTF-8") == "hello zipnum\n")
  }

  test("SL extra-field byte layout: 20-byte header, LE length = deflated+8") {
    val payload = ("x" * 1000 + "\n").getBytes("UTF-8")
    val m = ZipNumFormat.gzipMember(payload)
    // fixed header prefix
    assert((m(0) & 0xff) == 0x1f && (m(1) & 0xff) == 0x8b, "gzip magic")
    assert(m(2) == 8, "CM deflate")
    assert(m(3) == 4, "FLG = FEXTRA only")
    assert(m.slice(4, 8).forall(_ == 0), "MTIME zero")
    assert((m(10) & 0xff) == 8 && m(11) == 0, "XLEN = 8")
    assert(m(12) == 'S'.toByte && m(13) == 'L'.toByte, "subfield id")
    assert(m(14) == 4 && m(15) == 0, "subfield length 4")
    def le32(off: Int): Long =
      (m(off) & 0xffL) | ((m(off + 1) & 0xffL) << 8) |
        ((m(off + 2) & 0xffL) << 16) | ((m(off + 3) & 0xffL) << 24)
    val slLen = le32(16)
    assert(slLen == m.length - 20,
      "SL value = member length minus the 20-byte header (deflated + footer)")
    // footer ISIZE = payload length
    assert(le32(m.length - 4) == payload.length)
  }

  test("concatenated members stream as one GZIPInputStream") {
    val a = ZipNumFormat.gzipMember("one\n".getBytes("UTF-8"))
    val b = ZipNumFormat.gzipMember("two\n".getBytes("UTF-8"))
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(a ++ b))
    assert(new String(in.readAllBytes(), "UTF-8") == "one\ntwo\n")
  }

  test("summaryKey = first two fields, tabs escaped") {
    assert(ZipNumFormat.summaryKey("com,a)/ 20120101000000 http://a.com/ rest") ==
      "com,a)/ 20120101000000")
    assert(ZipNumFormat.summaryKey("no-space-line") == "no-space-line")
    assert(ZipNumFormat.summaryKey("key\twith 2012 tab x") == "key%09with 2012")
  }

  test("summary line format roundtrip") {
    val b = Block("com,a)/ 20120101000000", "part-a-00001", 12345L, 678L)
    assert(ZipNumFormat.parseSummaryLine(ZipNumFormat.formatSummaryLine(b)) == b)
  }

  // ---- pruning ----

  private def idx(keys: String*): ZipNumIndex.ClusterIndex = {
    var off = 0L
    val blocks = keys.toIndexedSeq.map { k =>
      val b = Block(k, "part-a-00000", off, 100L); off += 100; b
    }
    ZipNumIndex.ClusterIndex("/c", blocks)
  }

  test("prune: start lands mid-block → previous block included") {
    val c = idx("a 1", "d 1", "g 1", "k 1")
    // key "e" lives in the block whose firstKey is "d 1"
    assert(c.prune(Some("e"), Some("h")).map(_.firstKey) == Seq("d 1", "g 1"))
  }

  test("prune: inclusive start, exclusive end on block boundaries") {
    val c = idx("a 1", "d 1", "g 1", "k 1")
    assert(c.prune(Some("d"), Some("g")).map(_.firstKey) == Seq("a 1", "d 1"))
    // start EXACTLY on a firstKey: the previous block stays selected —
    // a run of records sharing key "d 1" may span the block boundary, so
    // "a 1"'s tail can hold in-range records (r18 data-loss fix; the
    // reference positions at the last summary entry strictly below start)
    assert(c.prune(Some("d 1"), Some("k 1")).map(_.firstKey) ==
      Seq("a 1", "d 1", "g 1"))
  }

  test("prune: unbounded sides and empty range") {
    val c = idx("a 1", "d 1", "g 1")
    assert(c.prune(None, None).size == 3)
    assert(c.prune(Some("z"), None).map(_.firstKey) == Seq("g 1"))
    assert(c.prune(None, Some("a")).isEmpty)
    assert(c.prune(None, Some("a 1")).isEmpty)
  }

  test("slices: contiguous blocks coalesce, gaps and shard changes split") {
    val blocks = IndexedSeq(
      Block("a", "p0", 0, 100), Block("b", "p0", 100, 100),
      Block("c", "p0", 300, 100), // gap
      Block("d", "p1", 0, 100))
    val s = ZipNumIndex.ClusterIndex("/c", blocks).slices(blocks)
    assert(s.map(x => (x.shardPath, x.offset, x.length, x.nBlocks)) == Seq(
      ("/c/p0.gz", 0L, 200L, 2), ("/c/p0.gz", 300L, 100L, 1),
      ("/c/p1.gz", 0L, 100L, 1)))
  }

  test("slices: maxSliceBytes bounds a slice") {
    val blocks = IndexedSeq(
      Block("a", "p0", 0, 100), Block("b", "p0", 100, 100),
      Block("c", "p0", 200, 100))
    val s = ZipNumIndex.ClusterIndex("/c", blocks).slices(blocks, maxSliceBytes = 200)
    assert(s.map(_.nBlocks) == Seq(2, 1))
  }
}
