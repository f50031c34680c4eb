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
      it.flatMap { pathStr =>
        val p = new Path(pathStr)
        val fs = p.getFileSystem(conf.value)
        val raw = fs.open(p)
        val in =
          if (pathStr.endsWith(".gz")) new GZIPInputStream(raw, 64 * 1024)
          else raw
        new IoUtil.AutoCloseIterator(new IoUtil.LfLineIterator(in),
          () => in.close())
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
          // clear BEFORE reopening: if open() throws (skipBad path), the
          // stale closed handle must not be served for later ranges of
          // the previously-open file
          if (openIn != null) { openIn.close(); openIn = null; openPath = null }
          val p = new Path(path)
          openIn = p.getFileSystem(conf.value).open(p)
          openPath = path
        }
        openIn
      }
      val lines = it.flatMap { r =>
        try {
          val in = streamFor(r.path)
          in.seek(r.offset)
          val gz = new GZIPInputStream(
            new IoUtil.BoundedInputStream(in, r.length), 64 * 1024)
          // materialize the member's lines so a decode error surfaces here
          val got = new IoUtil.LfLineIterator(gz).toVector
          gz.close()
          got
        } catch {
          case e: Exception if skipBad => bad.add(1); Vector.empty
        }
      }
      new IoUtil.AutoCloseIterator(lines,
        () => if (openIn != null) openIn.close())
    }
    (out, bad)
  }
}
