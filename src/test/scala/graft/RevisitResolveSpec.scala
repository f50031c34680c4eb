package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RevisitResolve

class RevisitResolveSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private val cols =
    Seq("urlkey", "timestamp", "mimetype", "digest", "filename", "offset")

  test("revisits resolve as-of; originals self-resolve; dangling stays null") {
    val rows = Seq(
      // two originals, then a revisit: must resolve to the NEWER original
      ("com,a)/", "20120101000000", "text/html", "d1", "o1.warc.gz", 100L),
      ("com,a)/", "20120105000000", "text/html", "d1", "o2.warc.gz", 200L),
      ("com,a)/", "20120110000000", "warc/revisit", "d1", "r.warc.gz", 7L),
      // revisit BEFORE any original: as-of sees nothing — null, even
      // though a later original exists
      ("com,b)/", "20120101000000", "warc/revisit", "d2", "r.warc.gz", 8L),
      ("com,b)/", "20120109000000", "text/html", "d2", "o3.warc.gz", 300L),
      // same urlkey, different digest: groups must not bleed
      ("com,a)/", "20120103000000", "warc/revisit", "dX", "r.warc.gz", 9L))
      .toDF(cols: _*)
    val out = RevisitResolve.resolve(rows)
      .select($"urlkey", $"timestamp", $"resolved_filename", $"resolved_offset")
      .as[(String, String, Option[String], Option[Long])]
      .collect().map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out(("com,a)/", "20120110000000")) == (Some("o2.warc.gz"), Some(200L)))
    assert(out(("com,a)/", "20120101000000")) == (Some("o1.warc.gz"), Some(100L)))
    assert(out(("com,a)/", "20120105000000")) == (Some("o2.warc.gz"), Some(200L)))
    assert(out(("com,b)/", "20120101000000")) == (None, None))
    assert(out(("com,b)/", "20120109000000")) == (Some("o3.warc.gz"), Some(300L)))
    assert(out(("com,a)/", "20120103000000")) == (None, None))
  }

  test("NULL-field original resolves as ONE row — never a torn pointer") {
    // an original with a NULL offset ('-' CDX field) followed by a
    // complete original: the revisit must take the NEWEST original's
    // fields as a ROW. The old per-column IGNORE NULLS folds could pair
    // one original's filename with another's offset — a corrupted
    // pointer (r19 review finding)
    val df = Seq(
      ("com,n)/", "20120101000000", "text/html", "d", "o1.warc.gz",
        Some(100L)),
      // newest original: filename present, offset NULL
      ("com,n)/", "20120105000000", "text/html", "d", "o2.warc.gz",
        None: Option[Long]),
      ("com,n)/", "20120110000000", "warc/revisit", "d", "r.warc.gz",
        Some(7L)))
      .toDF(cols: _*)
    val out = RevisitResolve.resolve(df)
      .select($"timestamp", $"resolved_filename", $"resolved_offset")
      .as[(String, Option[String], Option[Long])]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    // whole-row: o2's own (filename, NULL offset) — NOT o2's filename
    // paired with o1's offset 100
    assert(out("20120110000000") == (Some("o2.warc.gz"), None))
    assert(out("20120105000000") == (Some("o2.warc.gz"), None))
    assert(out("20120101000000") == (Some("o1.warc.gz"), Some(100L)))
  }

  test("same-second original + revisit: original wins the tie") {
    // 14-digit resolution makes same-timestamp pairs realistic; the
    // deterministic tie-break orders originals first, so the revisit
    // resolves to the original regardless of input row order
    val rows = Seq(
      ("com,t)/", "20120101000000", "warc/revisit", "d", "r.warc.gz", 5L),
      ("com,t)/", "20120101000000", "text/html", "d", "o.warc.gz", 50L))
    for (perm <- Seq(rows, rows.reverse)) {
      val out = RevisitResolve.resolve(perm.toDF(cols: _*))
        .select($"mimetype", $"resolved_filename", $"resolved_offset")
        .as[(String, Option[String], Option[Long])]
        .collect().map(r => r._1 -> (r._2, r._3)).toMap
      assert(out("warc/revisit") == (Some("o.warc.gz"), Some(50L)))
      assert(out("text/html") == (Some("o.warc.gz"), Some(50L)))
    }
  }

  test("row count and non-resolution columns pass through unchanged") {
    val rows = Seq(
      ("com,c)/", "20120101000000", "text/html", "d", "o.warc.gz", 1L),
      ("com,c)/", "20120102000000", "warc/revisit", "d", "r.warc.gz", 2L))
      .toDF(cols: _*)
    val out = RevisitResolve.resolve(rows)
    assert(out.count() == 2)
    assert(out.columns.toSeq ==
      cols ++ Seq("resolved_filename", "resolved_offset"))
  }
}
