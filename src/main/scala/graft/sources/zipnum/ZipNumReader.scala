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

  /** Lines of the given slices, residual-trimmed to [start, end).
    *
    * `parallelize(seq, n)` with `seq.length == n` deterministically
    * places element i in partition i (ParallelCollectionRDD slices at
    * `i*len/numSlices`), so the slice descriptions need NO partitionBy —
    * an earlier IdentityPartitioner pass here was a real (if tiny,
    * metadata-only) shuffle stage per read that broke the literal
    * zero-shuffle contract the merge pipeline advertises, and an extra
    * stage barrier per input cluster. */
  def slicesRdd(spark: SparkSession, slices: Seq[Slice],
                start: Option[String], end: Option[String]): RDD[String] = {
    val conf = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    spark.sparkContext
      .parallelize(slices, math.max(1, slices.size))
      .mapPartitions(_.flatMap(readSlice(conf.value, _, start, end)))
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
    // parallelize with parts.length == nPart puts range i in partition i
    // deterministically (see slicesRdd) — no partitioner, no shuffle, no
    // extra stage barrier per input cluster
    spark.sparkContext
      .parallelize(parts, nPart)
      .mapPartitions(_.flatMap { case (lo, hi, ss) =>
        ss.iterator.flatMap(readSlice(conf.value, _, lo, hi))
      })
  }

  /** Stream one slice: seek once, read `length` bytes through one handle. */
  def readSlice(conf: Configuration, slice: Slice,
                start: Option[String], end: Option[String]): Iterator[String] =
    readSliceWithCloser(conf, slice, start, end)._1

  /** [[readSlice]] plus an idempotent closer for callers that may stop
    * consuming early (DSv2 PartitionReader.close on limit/kill) — the
    * auto-close-on-exhaustion alone would leak the file handle there. */
  def readSliceWithCloser(conf: Configuration, slice: Slice,
                          start: Option[String], end: Option[String])
      : (Iterator[String], () => Unit) = {
    val p = new Path(slice.shardPath)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    in.seek(slice.offset)
    val bounded = new graft.util.IoUtil.BoundedInputStream(in, slice.length)
    val gz = new GZIPInputStream(bounded, 64 * 1024)
    val it = new graft.util.IoUtil.LfLineIterator(gz)
    val trimmed = (start, end) match {
      case (None, None) => it
      case _ =>
        // Whole-line string compare: a line is "urlkey ts rest"; comparing
        // it against a bare "urlkey" (or "urlkey ts") bound is exactly the
        // reference's raw-line bound check.
        val lo = start.orNull
        val hi = end.orNull
        it.filter(l => (lo == null || graft.util.KeyOrder.gteq(l, lo)) &&
          (hi == null || graft.util.KeyOrder.lt(l, hi)))
    }
    var closed = false
    val closer = () => if (!closed) {
      closed = true
      try gz.close() catch { case _: Exception => () }
      try in.close() catch { case _: Exception => () }
    }
    (new graft.util.IoUtil.AutoCloseIterator(trimmed, closer), closer)
  }

}
