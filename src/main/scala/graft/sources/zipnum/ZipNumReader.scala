package graft.sources.zipnum

import java.io.InputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPInputStream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.SerializableConfiguration

import graft.sources.zipnum.ZipNumIndex.Slice

/**
 * Distributed ZipNum cluster reader — the serving path (SURVEY §2 S5/Q1/Q2,
 * §3.3). Planning happens driver-side over `ALL.summary`; each task streams
 * one byte slice of a shard through a single open stream (gzip members are
 * concatenated, `GZIPInputStream` walks them natively), splits on LF only
 * (interior CR is data), and residual-trims to [start, end) — inclusive
 * start / exclusive end, the bound semantics of
 * /root/reference/src/main/java/org/archive/hadoop/cdx/ClusterRange.java:57-62
 * (StartBoundedStringIterator / BoundedStringIterator over raw lines).
 */
object ZipNumReader {

  /** Lines of `[start, end)` from one cluster. Partitions are in cluster key
    * order and each partition is internally sorted, so
    * `rdd.toLocalIterator` streams the range fully ordered. */
  def lines(spark: SparkSession, dir: String,
            start: Option[String] = None, end: Option[String] = None,
            maxSliceBytes: Long = ZipNumIndex.DefaultMaxSliceBytes): RDD[String] = {
    val index = ZipNumIndex.load(dir, spark.sparkContext.hadoopConfiguration)
    val slices = index.slices(index.prune(start, end), maxSliceBytes)
    slicesRdd(spark, slices, start, end)
  }

  /** Lines of the given slices, residual-trimmed to [start, end). */
  def slicesRdd(spark: SparkSession, slices: Seq[Slice],
                start: Option[String], end: Option[String]): RDD[String] = {
    val conf = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    val n = math.max(1, slices.size)
    spark.sparkContext
      .parallelize(slices.zipWithIndex.map(_.swap), n)
      .partitionBy(new IdentityPartitioner(n))
      .values
      .mapPartitions(_.flatMap(readSlice(conf.value, _, start, end)),
        preservesPartitioning = true)
  }

  /**
   * RDD whose partition i holds the merged-ready key range
   * [boundaries(i-1), boundaries(i)) of the cluster (partition 0 is
   * (-inf, boundaries(0)), last is [boundaries(last), +inf)) — the shape of
   * MergeClusterRangesInputFormat
   * (/root/reference/src/main/java/org/archive/hadoop/io/MergeClusterRangesInputFormat.java:29-173).
   * Every input cluster rendered against the SAME boundaries has aligned,
   * internally sorted partitions → zipPartitions heap-merge, zero shuffle.
   */
  def rangesRdd(spark: SparkSession, dir: String,
                boundaries: IndexedSeq[String]): RDD[String] = {
    val conf = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    val index = ZipNumIndex.load(dir, spark.sparkContext.hadoopConfiguration)
    val nPart = boundaries.length + 1
    val parts: IndexedSeq[(Option[String], Option[String], Seq[Slice])] =
      (0 until nPart).map { i =>
        val lo = if (i == 0) None else Some(boundaries(i - 1))
        val hi = if (i == nPart - 1) None else Some(boundaries(i))
        (lo, hi, index.slices(index.prune(lo, hi)))
      }
    spark.sparkContext
      .parallelize(parts.zipWithIndex.map(_.swap), nPart)
      .partitionBy(new IdentityPartitioner(nPart))
      .values
      .mapPartitions(_.flatMap { case (lo, hi, ss) =>
        ss.iterator.flatMap(readSlice(conf.value, _, lo, hi))
      }, preservesPartitioning = true)
  }

  /** Stream one slice: seek once, read `length` bytes through one handle. */
  def readSlice(conf: Configuration, slice: Slice,
                start: Option[String], end: Option[String]): Iterator[String] = {
    val p = new Path(slice.shardPath)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    in.seek(slice.offset)
    val bounded = new BoundedInputStream(in, slice.length)
    val gz = new GZIPInputStream(bounded, 64 * 1024)
    val it = new LfLineIterator(gz)
    val trimmed = (start, end) match {
      case (None, None) => it
      case _ =>
        // Whole-line string compare: a line is "urlkey ts rest"; comparing
        // it against a bare "urlkey" (or "urlkey ts") bound is exactly the
        // reference's raw-line bound check.
        val lo = start.orNull
        val hi = end.orNull
        it.filter(l => (lo == null || l >= lo) && (hi == null || l < hi))
    }
    new AutoCloseIterator(trimmed, () => { gz.close(); in.close() })
  }

  /** Reads at most `limit` bytes from `in` (does not close it). */
  private final class BoundedInputStream(in: InputStream, limit: Long)
      extends InputStream {
    private var remaining = limit
    override def read(): Int =
      if (remaining <= 0) -1
      else { val b = in.read(); if (b >= 0) remaining -= 1; b }
    override def read(buf: Array[Byte], off: Int, len: Int): Int = {
      if (remaining <= 0) return -1
      val n = in.read(buf, off, math.min(len.toLong, remaining).toInt)
      if (n > 0) remaining -= n
      n
    }
  }

  /** Splits an InputStream's bytes into UTF-8 lines on LF ONLY — CR is data
    * (LFOnlyLineReader semantics, SURVEY §2 S2). Drops empty lines. */
  private final class LfLineIterator(in: InputStream) extends Iterator[String] {
    private val buf = new Array[Byte](64 * 1024)
    private var len = 0
    private var pos = 0
    private var eof = false
    private val line = new java.io.ByteArrayOutputStream(256)
    private var nextLine: String = null

    private def fill(): Unit = {
      len = in.read(buf); pos = 0
      if (len < 0) eof = true
    }

    @annotation.tailrec
    private def advance(): Unit = {
      if (eof) {
        nextLine = if (line.size() > 0) {
          val s = new String(line.toByteArray, UTF_8); line.reset(); s
        } else null
        return
      }
      if (pos >= len) { fill(); advance() }
      else {
        var i = pos
        while (i < len && buf(i) != '\n') i += 1
        line.write(buf, pos, i - pos)
        if (i < len) { // hit LF
          pos = i + 1
          if (line.size() > 0) {
            nextLine = new String(line.toByteArray, UTF_8); line.reset()
          } else advance() // empty line: skip
        } else { pos = len; advance() }
      }
    }

    override def hasNext: Boolean = {
      if (nextLine == null && !(eof && line.size() == 0)) advance()
      nextLine != null
    }
    override def next(): String = {
      if (!hasNext) throw new NoSuchElementException
      val l = nextLine; nextLine = null; l
    }
  }

  private final class AutoCloseIterator(it: Iterator[String], close: () => Unit)
      extends Iterator[String] {
    private var closed = false
    override def hasNext: Boolean = {
      val h = it.hasNext
      if (!h && !closed) { closed = true; close() }
      h
    }
    override def next(): String = it.next()
  }

  /** Partition i ↔ planned spec i: keeps slice order == partition order so
    * partition-ordered iteration yields globally sorted output. */
  private final class IdentityPartitioner(n: Int) extends org.apache.spark.Partitioner {
    override def numPartitions: Int = n
    override def getPartition(key: Any): Int = key.asInstanceOf[Int]
  }
}
