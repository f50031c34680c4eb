package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.zipnum.ZipNumReader

class ZipNumWriteSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def mkLines(n: Int): Seq[String] =
    (0 until n).map(i =>
      f"org,w$i%04d)/ 20120101000000 http://w$i.org/ text/html 200 D$i - - 1 $i f.gz")

  test("df.write.format(zipnum) roundtrips through the DSv2 read path") {
    val dir = Files.createTempDirectory(
      Paths.get("/root/repo/target"), "dsv2w").resolve("c").toString
    val lines = mkLines(300)
    lines.toDF("line")
      .repartitionByRange(3, col("line")).sortWithinPartitions("line")
      .write.format("zipnum").option("linesPerBlock", "50")
      .mode("overwrite").save(dir)
    // layout complete
    val names = new java.io.File(dir).list().toSet
    assert(names.contains("ALL.summary") && names.contains("manifest.txt"))
    assert(!names.contains("_tmp"))
    // read back through both surfaces
    assert(ZipNumReader.lines(spark, dir).collect().toSeq.sorted == lines.sorted)
    val df = spark.read.format("zipnum").load(dir)
    assert(df.count() == 300)
    assert(df.where(col("urlkey") === "org,w0042)/").count() == 1)
  }

  test("overwrite replaces a previous cluster; errorifexists refuses") {
    val dir = Files.createTempDirectory(
      Paths.get("/root/repo/target"), "dsv2w2").resolve("c").toString
    mkLines(10).toDF("line").coalesce(1).sortWithinPartitions("line")
      .write.format("zipnum").mode("overwrite").save(dir)
    mkLines(5).toDF("line").coalesce(1).sortWithinPartitions("line")
      .write.format("zipnum").mode("overwrite").save(dir)
    assert(spark.read.format("zipnum").load(dir).count() == 5)
    // the r19 swap port: no staging leftovers, and the .__old guard
    // refuses to run while a mid-swap backup is the only copy
    val parent = new java.io.File(dir).getParentFile.list().toSeq
    assert(!parent.exists(_.contains("__stage")) &&
      !parent.exists(_.contains("__old")),
      s"DSv2 overwrite must clean its staging dirs, found $parent")
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + ".__old"))
    val e = intercept[Exception] {
      mkLines(5).toDF("line").coalesce(1).sortWithinPartitions("line")
        .write.format("zipnum").mode("overwrite").save(dir)
    }
    assert(e.getMessage.contains("mid-swap") ||
      Option(e.getCause).exists(_.getMessage.contains("mid-swap")))
    fs.rename(new org.apache.hadoop.fs.Path(dir + ".__old"),
      new org.apache.hadoop.fs.Path(dir)) // recover for any later asserts
    intercept[Exception] {
      mkLines(5).toDF("line").coalesce(1)
        .write.format("zipnum").save(dir) // default ErrorIfExists
    }
  }

  test("WAT rows render the JSON metadata envelope") {
    val dir = Files.createTempDirectory(Paths.get("/root/repo/target"), "wat")
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos); g.write(b); g.close()
      bos.toByteArray
    }
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\nbody"
    val rec = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: http://example.com/w\r\n" +
      s"WARC-Date: 2012-01-03T08:45:08Z\r\nContent-Length: ${http.length}\r\n\r\n" +
      http).getBytes("UTF-8")
    val f = dir.resolve("w.warc.gz")
    Files.write(f, gz(rec))
    val rows = graft.operators.WarcExtract.watRows(spark, Seq(f.toString))
      .as[(String, String, String)].collect()
    assert(rows.length == 1)
    val (key, ts, wat) = rows.head
    assert(key == "com,example)/w" && ts == "20120103084508")
    assert(wat.contains(""""Status":200"""))
    assert(wat.contains(""""Content-Type":"text/html""""))
    assert(wat.contains(""""WARC-Target-URI":"http://example.com/w""""))
    assert(wat.contains(""""Offset":0"""))
  }
}
