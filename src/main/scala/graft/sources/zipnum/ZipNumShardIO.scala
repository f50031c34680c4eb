package graft.sources.zipnum

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * The ONE shard-writing state machine and commit fold, shared by the RDD
 * writer ([[ZipNumWriter.writeRdd]]) and the DSv2 writer (ZipNumWrite):
 * two byte-level implementations of the same on-disk format had already
 * drifted once (task-attempt safety existed only in the DSv2 copy), so
 * the format logic lives here exactly once.
 */
private[zipnum] final class ShardStream(fs: FileSystem, tmpDir: String,
                                        part: String, tmpName: String,
                                        linesPerBlock: Int) {
  private val gzOut = fs.create(new Path(s"$tmpDir/$tmpName.gz"), true)
  private val idxOut = fs.create(new Path(s"$tmpDir/$tmpName-idx"), true)
  private val blockLines = new java.io.ByteArrayOutputStream(1 << 20)
  private var firstKey: String = _
  private var count = 0
  private var offset = 0L
  private var nLines = 0L

  private def flushBlock(): Unit = if (count > 0) {
    val member = ZipNumFormat.gzipMember(blockLines.toByteArray)
    gzOut.write(member)
    val b = ZipNumFormat.Block(firstKey, part, offset, member.length.toLong)
    idxOut.write((ZipNumFormat.formatSummaryLine(b) + "\n").getBytes(UTF_8))
    offset += member.length
    blockLines.reset(); firstKey = null; count = 0
  }

  def add(line: String): Unit = {
    if (count == 0) firstKey = ZipNumFormat.summaryKey(line)
    blockLines.write(line.getBytes(UTF_8))
    blockLines.write('\n')
    count += 1; nLines += 1
    if (count == linesPerBlock) flushBlock()
  }

  /** Flush + close; returns the line count. */
  def finish(): Long = { flushBlock(); gzOut.close(); idxOut.close(); nLines }

  /** Best-effort cleanup: every step guarded so a close() throwing on an
    * already-broken stream can neither skip the deletes nor mask the
    * original task failure. */
  def abort(): Unit = {
    def quietly(f: => Unit): Unit =
      try f catch { case scala.util.control.NonFatal(_) => () }
    quietly(gzOut.close()); quietly(idxOut.close())
    quietly(fs.delete(new Path(s"$tmpDir/$tmpName.gz"), false))
    quietly(fs.delete(new Path(s"$tmpDir/$tmpName-idx"), false))
  }
}

private[zipnum] object ZipNumShardIO {

  /** Driver commit: rename winner shards into place (loudly failing on a
    * false rename — a cluster whose summary cites missing shards must
    * never commit), fold per-shard idx files into ALL.summary, write
    * manifest.txt, drop `_tmp/`. `shards` = (part, tmpName) in shard
    * order. */
  def commitShards(fs: FileSystem, outDir: String,
                   shards: Seq[(String, String)]): Unit = {
    val out = new Path(outDir)
    val summary = fs.create(new Path(out, "ALL.summary"), true)
    // close-on-failure (r20 review): a rename failing mid-fold used to
    // leave both the summary stream and the current idx stream open —
    // the r19 leak-sweep class, on the commit path itself. The failure
    // still propagates; the caller's abort cleans the directory.
    try {
      shards.foreach { case (part, tmpName) =>
        require(fs.rename(new Path(s"$outDir/_tmp/$tmpName.gz"),
          new Path(out, s"$part.gz")), s"commit: rename of $part.gz failed")
        val idxTmp = new Path(s"$outDir/_tmp/$tmpName-idx")
        val in = fs.open(idxTmp)
        try graft.util.IoUtil.copy(in, summary) finally in.close()
        require(fs.rename(idxTmp, new Path(out, s"$part-idx")),
          s"commit: rename of $part-idx failed")
      }
    } finally summary.close()
    val manifest = fs.create(new Path(out, "manifest.txt"), true)
    shards.foreach { case (part, _) =>
      manifest.write(s"$part.gz\n".getBytes(UTF_8))
    }
    manifest.close()
    fs.delete(new Path(outDir, "_tmp"), true)
  }
}
