package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.model.CdxJ

/** CDXJ (pywb JSON CDX) column-level format/parse. */
class CdxJSpec extends AnyFunSuite with SparkTestSession {

  private def roundTrip(rows: Seq[(String, String, String, String,
      java.lang.Integer, String, String, String, java.lang.Long,
      java.lang.Long, String)]) = {
    import spark.implicits._
    val df = rows.toDF("urlkey", "timestamp", "original_url", "mimetype",
      "statuscode", "digest", "redirect_url", "meta_flags",
      "compressed_size", "offset", "filename")
    val line = CdxJ.formatLine(col("urlkey"), col("timestamp"),
      col("original_url"), col("mimetype"), col("statuscode"),
      col("digest"), col("redirect_url"), col("meta_flags"),
      col("compressed_size"), col("offset"), col("filename"))
    df.select(line.as("line"))
  }

  test("format: nulls omitted (pywb), values all strings, key order fixed") {
    val out = roundTrip(Seq(("org,x)/", "20120101000000",
      "http://x.org/", "text/html", Int.box(200), "D1GEST", null, null,
      Long.box(561L), Long.box(55426267L), "w.warc.gz")))
      .collect()(0).getString(0)
    assert(out == "org,x)/ 20120101000000 " +
      """{"url":"http://x.org/","mime":"text/html","status":"200",""" +
      """"digest":"D1GEST","length":"561","offset":"55426267",""" +
      """"filename":"w.warc.gz"}""")
  }

  test("round-trip is identity, including the space-in-redirect class " +
      "CDX-11's 11-slot split corrupts") {
    import spark.implicits._
    val rows = Seq(
      ("org,a)/p", "20120101000000", "http://a.org/p", "text/html",
        Int.box(200), "AAA", "http://r.org/a 42", "A-", Long.box(10L),
        Long.box(20L), "f.warc.gz"),
      // null-heavy row: status/redirect/flags/length/offset all absent
      ("org,b)/", "20120102000000", "http://b.org/", "warc/revisit",
        null, "BBB", null, null, null, null, "g.warc.gz"))
    val lines = roundTrip(rows)
    val back = lines
      .select(CdxJ.parseCols(col("line")): _*)
      .as[(String, String, String, String, Option[Int], String,
        Option[String], Option[String], Option[Long], Option[Long],
        String)]
      .collect().toSeq
    assert(back == Seq(
      ("org,a)/p", "20120101000000", "http://a.org/p", "text/html",
        Some(200), "AAA", Some("http://r.org/a 42"), Some("A-"),
        Some(10L), Some(20L), "f.warc.gz"),
      ("org,b)/", "20120102000000", "http://b.org/", "warc/revisit",
        None, "BBB", None, None, None, None, "g.warc.gz")))
  }

  test("parse degrades non-numeric status/length/offset to null, like " +
      "the CDX-11 slot tolerance") {
    import spark.implicits._
    val got = Seq("k 20120101000000 " +
      """{"url":"u","status":"xx","length":"zz","offset":"9"}""")
      .toDF("line")
      .select(CdxJ.parseCols(col("line")): _*)
      .select(col("statuscode"), col("compressed_size"), col("offset"))
      .as[(Option[Int], Option[Long], Option[Long])].collect()(0)
    assert(got == ((None, None, Some(9L))))
  }
}
