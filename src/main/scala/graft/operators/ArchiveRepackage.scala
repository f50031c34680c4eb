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
    * stage accumulator updates double-count under task retries.
    *
    * Member order is established by Spark's spill-capable shuffle sort
    * (repartition on dst + sortWithinPartitions(dst, seq)), and the
    * writer is a pure streaming pass over the sorted iterator — task
    * memory is ONE copy buffer no matter how many members a destination
    * has (a `mapGroups` + in-memory sortBy would buffer a whole
    * destination's task list on the heap). */
  def repackage(spark: SparkSession, tasks: Dataset[CopyTask],
                outDir: String,
                header: Option[Array[Byte]] = None): (Long, Long) = {
    val conf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    import spark.implicits._
    val results = tasks
      .repartition(tasks("dst"))
      .sortWithinPartitions(tasks("dst"), tasks("seq"))
      .as[CopyTask]
      .mapPartitions { it =>
        val fs = new Path(outDir).getFileSystem(conf.value)
        val buf = new Array[Byte](1 << 16)
        val done = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
        var curDst: String = null
        var out: org.apache.hadoop.fs.FSDataOutputStream = null
        var copied = 0L
        var openPath: String = null
        var in: org.apache.hadoop.fs.FSDataInputStream = null
        // a mid-copy failure (unexpected EOF, rename refusal) must not
        // leave the current source/destination streams open until GC —
        // close both on task completion (r19 review; same discipline as
        // WarcExtract.openMembers). Normal-path closes null the vars, so
        // the listener is a no-op there.
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit] { _ =>
            if (out != null) try out.close() catch { case _: Exception => () }
            if (in != null) try in.close() catch { case _: Exception => () }
          })
        def commit(): Unit = if (curDst != null) {
          out.close()
          out = null
          val fin = new Path(outDir, curDst)
          fs.delete(fin, false)
          require(fs.rename(new Path(outDir, s"$curDst.TMP"), fin),
            s"commit: rename to $fin failed")
          done += ((curDst, copied))
        }
        it.foreach { t =>
          if (t.dst != curDst) {
            commit()
            curDst = t.dst
            copied = 0L
            out = fs.create(new Path(outDir, s"${t.dst}.TMP"), true)
            // synthesized leading record (filedesc/warcinfo analogue),
            // pre-gzipped
            header.foreach(out.write)
          }
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
        commit()
        if (in != null) { in.close(); in = null }
        done.iterator
      }.collect()
    (results.length.toLong, results.map(_._2).sum)
  }
}
