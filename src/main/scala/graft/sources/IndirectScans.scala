package graft.sources

import java.util.zip.GZIPInputStream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.util.{LongAccumulator, SerializableConfiguration}

import graft.util.IoUtil

/**
 * Indirection scans (SURVEY §2 S8/S9/S10): the input rows POINT at data —
 * either whole files or (path, offset, length) gzip-member extents — and
 * each task opens and streams what its rows point to. This is the
 * reference's BuildCluster input plan
 * (/root/reference/src/main/java/org/archive/hadoop/mapreduce/
 * LineDereferencingRecordReader.java:49-145 and
 * GZIPMembersLineRecordReader.java:16-120, `--skip-bad` at
 * GZIPRangeLineDereferencingRecordReader.java:21-27).
 */
object IndirectScans {

  /** S8 — each input line is a file path; stream its lines (gzip-aware,
    * LF-only). Pointer lists are small; the pointed data is not — so the
    * pointers are repartitioned for per-file task granularity. */
  def dereferenceLines(pointers: Dataset[String]): Dataset[String] = {
    val spark = pointers.sparkSession
    import spark.implicits._
    val conf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val n = math.max(1, pointers.count().toInt)
    pointers.repartition(n).mapPartitions { it =>
      // guaranteed cleanup even when the iterator is abandoned mid-way
      // (limit/take/task failure): the exhaustion-close alone leaked the
      // file handle and the gzip Inflater's native memory for the
      // executor's lifetime (same listener pattern as WarcExtract)
      var current: java.io.InputStream = null
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
        if (current != null)
          try current.close()
          catch { case scala.util.control.NonFatal(_) => () }
      }
      it.flatMap { pathStr =>
        val p = new Path(pathStr)
        val fs = p.getFileSystem(conf.value)
        val raw = fs.open(p)
        // multi-member .gz (a ZipNum part file is one) reads ALL members:
        // JDK GZIPInputStream handles concatenation since Java 9
        // (JDK-7036144) — pinned by IndirectScanSpec's multi-member test
        val in =
          if (pathStr.endsWith(".gz")) new GZIPInputStream(raw, 64 * 1024)
          else raw
        current = in
        new IoUtil.AutoCloseIterator(new IoUtil.LfLineIterator(in),
          () => { in.close(); if (current eq in) current = null })
      }
    }
  }

  /** One gzip-member extent within a file. */
  final case class MemberRange(path: String, offset: Long, length: Long)

  /** S9/S10 — range-read each member extent, decompress, emit its lines.
    * With skipBad, corrupt extents are counted in the returned accumulator
    * instead of failing the task (`--skip-bad`). */
  def gzipMemberRangeLines(spark: SparkSession, ranges: Dataset[MemberRange],
                           skipBad: Boolean = false)
      : (Dataset[String], LongAccumulator) = {
    import spark.implicits._
    val conf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val bad = spark.sparkContext.longAccumulator("gzrange.bad.members")
    val out = ranges.mapPartitions { it =>
      // sticky handle: consecutive ranges in the same file reuse the stream
      var openPath: String = null
      var openIn: org.apache.hadoop.fs.FSDataInputStream = null
      def streamFor(path: String): org.apache.hadoop.fs.FSDataInputStream = {
        if (openPath != path) {
          // clear BEFORE reopening: if open() throws, the stale closed
          // handle must not be served for later ranges of the
          // previously-open file
          if (openIn != null) { openIn.close(); openIn = null; openPath = null }
          val p = new Path(path)
          openIn = p.getFileSystem(conf.value).open(p)
          openPath = path
        }
        openIn
      }
      // abandoned-iterator cleanup (limit/take/task failure) — the
      // exhaustion-close alone leaked the sticky handle AND the current
      // member's GZIPInputStream (its Inflater's native memory waited on
      // GC — the same gap dereferenceLines closes with its `current`
      // tracker)
      var currentGz: java.io.InputStream = null
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
        if (currentGz != null)
          try currentGz.close()
          catch { case scala.util.control.NonFatal(_) => () }
        if (openIn != null)
          try openIn.close()
          catch { case scala.util.control.NonFatal(_) => () }
      }
      val lines = it.flatMap { r =>
        // open failures stay FATAL even under skipBad — the reference
        // scopes its tolerance to range-read/decode errors only
        // (GZIPRangeLineDereferencingRecordReader.java:90-108 keeps
        // fileSystem.open outside the try); a typo'd path must fail the
        // job, not count every range of the file as "bad member" and
        // succeed with silently empty output
        val in = streamFor(r.path)
        try {
          in.seek(r.offset)
          val gz = new GZIPInputStream(
            new IoUtil.BoundedInputStream(in, r.length), 64 * 1024)
          currentGz = gz
          val raw = new IoUtil.LfLineIterator(gz)
          // STREAM the member's lines (a multi-GB member no longer
          // buffers on-heap); under skipBad a decode error mid-member
          // emits the lines read BEFORE it — the reference's partial
          // emission (:119-135) — and counts the member once. Only
          // IOException (incl. ZipException/EOFException) is tolerated:
          // a code bug must never be swallowed as a "corrupt member".
          val guarded = new Iterator[String] {
            override def hasNext: Boolean =
              try raw.hasNext
              catch { case _: java.io.IOException if skipBad =>
                bad.add(1); false }
            override def next(): String = raw.next()
          }
          new IoUtil.AutoCloseIterator(guarded,
            () => { gz.close(); if (currentGz eq gz) currentGz = null })
        } catch {
          case _: java.io.IOException if skipBad =>
            bad.add(1); Iterator.empty
        }
      }
      new IoUtil.AutoCloseIterator(lines,
        () => if (openIn != null) openIn.close())
    }
    (out, bad)
  }
}
