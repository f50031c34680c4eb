package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.util.SerializableConfiguration

/**
 * W/ARC repackaging (SURVEY §2 K11): copy selected records — as RAW
 * COMPRESSED gzip members, never re-encoded — from source archives into
 * new archive files. The reference measures each member's compressed
 * extent and byte-copies it
 * (/root/reference/src/main/java/org/archive/hadoop/jobs/
 * ArchiveFileExtractor.java:109-524, member length at :173-181, .TMP→
 * rename commit at :355-364). Concatenated gzip members are themselves a
 * valid archive, so the copy is lossless and cheap.
 *
 * One task per destination file (side-effect writes → deterministic
 * single writer per output, the reason the reference disables speculative
 * execution for these jobs).
 */
object ArchiveRepackage {

  /** Copy `length` bytes at `offset` of `src` into destination `dst`;
    * `seq` orders members within the destination — a Long so callers can
    * use the member's byte offset directly (an Int would wrap past 2 GiB
    * and corrupt member order in the repackaged archive). */
  final case class CopyTask(src: String, offset: Long, length: Long,
                            dst: String, seq: Long)

  /** Executes all tasks; returns (files written, bytes copied). Counts
    * come from the returned results, not accumulators — transformation-
    * stage accumulator updates double-count under task retries. */
  def repackage(spark: SparkSession, tasks: Dataset[CopyTask],
                outDir: String,
                header: Option[Array[Byte]] = None): (Long, Long) = {
    val conf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    import spark.implicits._
    val results = tasks.groupByKey(_.dst).mapGroups { (dst, ts) =>
      val fs = new Path(outDir).getFileSystem(conf.value)
      val tmp = new Path(outDir, s"$dst.TMP")
      val fin = new Path(outDir, dst)
      val out = fs.create(tmp, true)
      // synthesized leading record (filedesc/warcinfo analogue), pre-gzipped
      header.foreach(out.write)
      var openPath: String = null
      var in: org.apache.hadoop.fs.FSDataInputStream = null
      val buf = new Array[Byte](1 << 16)
      var copied = 0L
      ts.toSeq.sortBy(_.seq).foreach { t =>
        if (openPath != t.src) {
          if (in != null) in.close()
          val p = new Path(t.src)
          in = p.getFileSystem(conf.value).open(p)
          openPath = t.src
        }
        in.seek(t.offset)
        var remaining = t.length
        while (remaining > 0) {
          val n = in.read(buf, 0, math.min(buf.length.toLong, remaining).toInt)
          require(n > 0, s"unexpected EOF copying $t")
          out.write(buf, 0, n)
          remaining -= n
          copied += n
        }
      }
      if (in != null) in.close()
      out.close()
      fs.delete(fin, false)
      require(fs.rename(tmp, fin), s"commit: rename to $fin failed")
      (dst, copied)
    }.collect()
    (results.length.toLong, results.map(_._2).sum)
  }
}
