package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.zipnum.ZipNumReader

/** Local filesystem under a `fault://` scheme whose rename can be made
  * to fail on demand — the only way to drive the DSv2 swap's failure
  * branches (commit-time rename results are unobservable otherwise). */
class FaultRenameFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "fault"
  override def getUri: java.net.URI = java.net.URI.create("fault:///")
  override def rename(src: org.apache.hadoop.fs.Path,
                      dst: org.apache.hadoop.fs.Path): Boolean =
    if (FaultRenameFs.failWhen(src, dst)) false else super.rename(src, dst)
}

object FaultRenameFs {
  @volatile var failWhen: (org.apache.hadoop.fs.Path,
    org.apache.hadoop.fs.Path) => Boolean = (_, _) => false
}

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

  test("a failed swap-in rename preserves BOTH copies: old cluster " +
      "restored at the target, complete staged cluster kept through " +
      "abort (r20 fault injection)") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.setClass("fs.fault.impl", classOf[FaultRenameFs],
      classOf[org.apache.hadoop.fs.FileSystem])
    val local = Files.createTempDirectory(
      Paths.get("/root/repo/target"), "faultw").resolve("c").toString
    val dir = s"fault://$local"
    FaultRenameFs.failWhen = (_, _) => false
    mkLines(10).toDF("line").coalesce(1).sortWithinPartitions("line")
      .write.format("zipnum").mode("overwrite").save(dir)
    assert(spark.read.format("zipnum").load(dir).count() == 10)

    // Scenario A: the stage -> target rename fails; the restore works.
    FaultRenameFs.failWhen = (src, _) => src.getName.endsWith(".__stage")
    val eA = intercept[Exception] {
      mkLines(5).toDF("line").coalesce(1).sortWithinPartitions("line")
        .write.format("zipnum").mode("overwrite").save(dir)
    }
    def msgs(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    assert(msgs(eA).exists(_.contains("old cluster restored")), msgs(eA))
    FaultRenameFs.failWhen = (_, _) => false
    // the target still serves the OLD cluster (restored whole) ...
    assert(spark.read.format("zipnum").load(dir).count() == 10)
    // ... and the COMPLETE new cluster survived Spark's abort() in the
    // stage dir (the r20 preserve-on-abort fix: before it, abort
    // deleted the only copy of the new data)
    val stage = new java.io.File(s"$local.__stage")
    assert(stage.isDirectory, "staged cluster must survive the abort")
    assert(stage.list().contains("ALL.summary"),
      "staged cluster must be complete (commitShards finished)")
    // a clean retry sweeps the stale stage and lands the new data
    mkLines(5).toDF("line").coalesce(1).sortWithinPartitions("line")
      .write.format("zipnum").mode("overwrite").save(dir)
    assert(spark.read.format("zipnum").load(dir).count() == 5)
    assert(!stage.exists() && !new java.io.File(s"$local.__old").exists())

    // Scenario B: the restore rename ALSO fails — the message must say
    // so (not claim "restored"), and the old data must sit at .__old.
    FaultRenameFs.failWhen = (src, _) =>
      src.getName.endsWith(".__stage") || src.getName.endsWith(".__old")
    val eB = intercept[Exception] {
      mkLines(3).toDF("line").coalesce(1).sortWithinPartitions("line")
        .write.format("zipnum").mode("overwrite").save(dir)
    }
    FaultRenameFs.failWhen = (_, _) => false
    assert(msgs(eB).exists(_.contains("restore rename ALSO failed")), msgs(eB))
    assert(new java.io.File(s"$local.__old").isDirectory,
      "old cluster must be recoverable at .__old")
    assert(!new java.io.File(local).exists(), "target empty after double failure")
    // the next write refuses to run while .__old is the only copy,
    // naming the recovery move
    val eC = intercept[Exception] {
      mkLines(3).toDF("line").coalesce(1).sortWithinPartitions("line")
        .write.format("zipnum").mode("overwrite").save(dir)
    }
    assert(msgs(eC).exists(_.contains("mid-swap")), msgs(eC))
    // manual recovery, then life goes on
    val ffs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    assert(ffs.rename(new org.apache.hadoop.fs.Path(s"$dir.__old"),
      new org.apache.hadoop.fs.Path(dir)))
    assert(spark.read.format("zipnum").load(dir).count() == 5)
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
