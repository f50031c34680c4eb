package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.{Cdx, CdxRecord}

/** Conformance vectors from
  * /root/reference/src/test/java/org/archive/hadoop/pig/CDXLoaderTest.java
  * (via FIXTURES.md §1). */
class CdxParserSpec extends AnyFunSuite {

  val v1 = "101,78,123,109)/robots.txt 20120103084508 http://109.123.78.101/robots.txt text/html 404 22RZA2NQT3RZUCQYJYZDPVZRNYIR72SN - - 561 55426267 WIDE-20120103083324-crawl410/WIDE-20120103083324-00000.warc.gz"
  val v2 = "131,125,136,219)/ 20120103084049 http://219.136.125.131/ text/html 302 3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ http://219.136.125.131/selfLogon.do?hoge=1 2 - 449 34133512 WIDE-20120103083324-crawl410/WIDE-20120103083324-00000.warc.gz"
  val v3 = "de,nuernberger)/rente 20110129033909 http://www.nuernberger.de/rente/ text/html 200 COWKAOTVKBT6YVW26BLW7T235FAWRSUR http://www.nuernberger.de/produkte/vorsorge_fuer_jung___alt/rente/\r - 581 468301945 COM-20110129023303-crawl306/COM-20110129025311-00174.warc.gz"

  test("header line is skipped") {
    assert(Cdx.parseLine(" CDX N b a m s k r M S V g").isEmpty)
  }

  test("blank and malformed lines are skipped") {
    assert(Cdx.parseLine("").isEmpty)
    assert(Cdx.parseLine("only three fields here").isEmpty)
  }

  test("plain CDX-11 line parses with - → null") {
    val r = Cdx.parseLine(v1).get
    assert(r.urlkey == "101,78,123,109)/robots.txt")
    assert(r.timestamp == "20120103084508")
    assert(r.originalUrl == "http://109.123.78.101/robots.txt")
    assert(r.mimetype == "text/html")
    assert(r.statuscode.contains(404))
    assert(r.digest == "22RZA2NQT3RZUCQYJYZDPVZRNYIR72SN")
    assert(r.redirectUrl.isEmpty)
    assert(r.metaFlags.isEmpty)
    assert(r.compressedSize.contains(561L))
    assert(r.offset.contains(55426267L))
    assert(r.filename == "WIDE-20120103083324-crawl410/WIDE-20120103083324-00000.warc.gz")
  }

  test("redirect with unescaped space is merged back into redirect field") {
    // vector 2: redirect is 'http://219.136.125.131/selfLogon.do?hoge=1 2'
    // (space inside!) — CDXLoaderTest.java:82-95
    val r = Cdx.parseLine(v2).get
    assert(r.redirectUrl.contains("http://219.136.125.131/selfLogon.do?hoge=1 2"))
    assert(r.metaFlags.isEmpty)
    assert(r.compressedSize.contains(449L))
    assert(r.offset.contains(34133512L))
  }

  test("interior CR in redirect is preserved (LF-only line splitting)") {
    val r = Cdx.parseLine(v3).get
    assert(r.redirectUrl.contains("http://www.nuernberger.de/produkte/vorsorge_fuer_jung___alt/rente/\r"))
    assert(r.statuscode.contains(200))
  }

  test("format ∘ parse is identity on v1") {
    assert(Cdx.formatLine(Cdx.parseLine(v1).get) == v1)
  }

  test("legacy CDX-9 converts: no meta flags, size null") {
    val nine = "101,78,123,109)/robots.txt 20120103084508 http://109.123.78.101/robots.txt text/html 404 22RZA2NQT3RZUCQYJYZDPVZRNYIR72SN - 55426267 file.warc.gz"
    val r = Cdx.convertLegacy(nine).get
    assert(r.metaFlags.isEmpty)
    assert(r.compressedSize.isEmpty)
    assert(r.offset.contains(55426267L))
    assert(r.filename == "file.warc.gz")
    assert(r.urlkey == "101,78,123,109)/robots.txt")
  }

  test("legacy CDX-10 converts: meta flags kept; noarchive droppable") {
    val ten = "101,78,123,109)/robots.txt 20120103084508 http://109.123.78.101/robots.txt text/html 404 SHA - A 55426267 file.warc.gz"
    val r = Cdx.convertLegacy(ten).get
    assert(r.metaFlags.contains("A"))
    assert(Cdx.convertLegacy(ten, omitNoArchive = true).isEmpty)
  }

  test("legacy convert repairs scheme-less original URL from the key") {
    // CDXMapper.java:104-109 — hostname-only original URL
    val nine = "example.com 20120103084508 example.com text/html 200 SHA - 1234 f.warc.gz"
    val r = Cdx.convertLegacy(nine).get
    assert(r.originalUrl == "http://example.com")
    assert(r.urlkey == "com,example)/")
  }

  test("SURT-split transform drops noarchive/bad-offset/bad-format rows") {
    // CDXTransformer.java:72-76 (A flag), :87-93 (offset), :77-80 (format)
    import graft.operators.CdxTransformer
    val ok9 = "k 20120103084508 http://www.example.co.uk/a?z=1&b=2 text/html 200 SHA - 1234 f.arc.gz"
    val r = CdxTransformer.transformLine(ok9).get
    assert(r.suffix_surt == "(uk,co,example")
    assert(r.public_prefix == "-") // www. massaged away pre-split
    assert(r.path_query == "/a?b=2&z=1")
    assert(r.scheme == "http")
    assert(r.offset == 1234L)
    val noarchive = "k 20120103084508 http://e.org/ text/html 200 SHA - A 1234 f.arc.gz"
    assert(CdxTransformer.transformLine(noarchive).isEmpty)
    val badOffset = "k 20120103084508 http://e.org/ text/html 200 SHA - XYZ f.arc.gz"
    assert(CdxTransformer.transformLine(badOffset).isEmpty)
    val badFormat = "too few fields"
    assert(CdxTransformer.transformLine(badFormat).isEmpty)
    val deepSub = CdxTransformer.transformLine(
      "k 20120103084508 http://a.b.site.org/p text/html 200 SHA - 9 f.arc.gz").get
    assert(deepSub.suffix_surt == "(org,site" && deepSub.public_prefix == "a.b")
    // IP hosts have no registered domain — whole address is the suffix
    val ip = CdxTransformer.transformLine(
      "k 20120103084508 http://109.123.78.101/robots.txt text/html 404 SHA - 55 f.arc.gz").get
    assert(ip.suffix_surt == "(101,78,123,109" && ip.public_prefix == "-")
    // port strip must not fire inside a bracketed IPv6 address (colons
    // there are address bytes): split(':')(0) used to collapse every
    // [2001:...] host onto the "[2001" key, merging distinct hosts
    val v6a = CdxTransformer.transformLine(
      "k 20120103084508 http://[2001:db8::1]/x text/html 200 SHA - 9 f.arc.gz").get
    val v6b = CdxTransformer.transformLine(
      "k 20120103084508 http://[2001:db9::2]/y text/html 200 SHA - 9 f.arc.gz").get
    assert(v6a.suffix_surt != v6b.suffix_surt,
      s"distinct IPv6 hosts merged: ${v6a.suffix_surt}")
    // ... while a plain :port is still stripped
    val withPort = CdxTransformer.transformLine(
      "k 20120103084508 http://site.org:8080/p text/html 200 SHA - 9 f.arc.gz").get
    assert(withPort.suffix_surt == "(org,site")
  }
}
