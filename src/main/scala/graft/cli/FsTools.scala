package graft.cli

import java.io.{OutputStream, PrintWriter}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

/**
 * Filesystem utility verbs mirroring the reference JobDriver's
 * hdfs-shell sugar (/root/reference/src/main/java/org/archive/hadoop/
 * jobs/JobDriver.java:50-86): hdfs-fseeko + range-dumper (both are
 * byte-range dumps — one verb here), hdfs-lsr, hdfs-mv, hdfs-sync.
 * Driver-side single-process tools over the Hadoop FileSystem API —
 * no Spark session; they work against any registered FS scheme
 * (file://, hdfs://, ...), which is strictly more general than the
 * originals' hdfs-or-local split. Logic lives here (streams in,
 * writers out) so CliSpec exercises it without spawning a JVM.
 */
object FsTools {

  /** hdfs-lsr (HDFSLSR.java:26-37): recursive descent, one
    * `BASENAME<tab>PATH` line per FILE found — the exact output
    * format downstream scripts of the old stack parse. */
  def lsr(conf: Configuration, root: String, out: PrintWriter): Unit = {
    val p = new Path(root)
    val fs = p.getFileSystem(conf)
    def walk(st: FileStatus): Unit =
      if (st.isDirectory) fs.listStatus(st.getPath).foreach(walk)
      else out.println(
        s"${st.getPath.getName}\t${st.getPath.toUri.toASCIIString}")
    walk(fs.getFileStatus(p))
    out.flush()
  }

  /** hdfs-mv (HDFSMove.java:39-63): one path per input line, each
    * renamed into `targetDir` keeping its basename. `Moved` lines to
    * `out`, `FAILED-MOVE` to `err`; returns the failure count (the
    * original kept going and exited 0 — failures here drive a nonzero
    * exit so scripted moves can't half-succeed silently). */
  def mv(conf: Configuration, targetDir: String,
         lines: Iterator[String], out: PrintWriter,
         err: PrintWriter): Int = {
    val tgt = new Path(targetDir)
    val fs = tgt.getFileSystem(conf)
    var failures = 0
    lines.map(_.trim).filter(_.nonEmpty).foreach { line =>
      try {
        val from = new Path(line)
        val to = new Path(tgt, from.getName)
        // FS impls disagree on a missing source: HDFS returns false,
        // RawLocalFileSystem throws — both are FAILED-MOVE here
        val ok = try fs.rename(from, to)
                 catch { case _: java.io.IOException => false }
        if (ok)
          out.println(s"Moved\t${from.toUri.toASCIIString}\t${to.toUri.toASCIIString}")
        else {
          failures += 1
          err.println(s"FAILED-MOVE\t${from.toUri.toASCIIString}\t${to.toUri.toASCIIString}")
        }
      } catch { case scala.util.control.NonFatal(e) =>
        // `new Path(line)` throws IllegalArgumentException on a malformed
        // URI (a stray `foo:bar` token) — per-line isolation covers
        // CONSTRUCTION too, so one bad token is a FAILED-MOVE line and a
        // counted failure, never a mid-batch abort
        failures += 1
        err.println(s"FAILED-MOVE\t$line\t${e.getMessage}")
      }
    }
    out.flush(); err.flush()
    failures
  }

  /** hdfs-sync (HDFSSync.java:48-118): `SRC TGT` tuples, one per
    * line; copy only when TGT does not exist (the original's
    * semi-restartable contract — no checksums, no length compare),
    * via TGT.TMP then rename so a killed copy never leaves a
    * partial target. Existing targets report `Target-Exists` on
    * `err` and are skipped. Both sides go through the FS API (the
    * original demanded exactly one hdfs:// side). */
  def sync(conf: Configuration, lines: Iterator[String],
           out: PrintWriter, err: PrintWriter): Int = {
    var bad = 0
    lines.map(_.trim).filter(_.nonEmpty).foreach { line =>
      line.split("\\s+") match {
        case Array(src, tgt) =>
          // per-tuple isolation, matching mv's contract: one missing /
          // unreadable SRC or failed commit is a FAILED-SYNC line and a
          // nonzero count, never an abort that strands the rest of the
          // batch; a half-written .TMP is removed so the retry is clean
          try {
            val srcP = new Path(src)
            val tgtP = new Path(tgt)
            val srcFs = srcP.getFileSystem(conf)
            val tgtFs = tgtP.getFileSystem(conf)
            if (tgtFs.exists(tgtP))
              err.println(s"Target-Exists\t$src\t$tgt")
            else {
              val tmp = new Path(tgt + ".TMP")
              try {
                val in = srcFs.open(srcP)
                try {
                  val o = tgtFs.create(tmp, true)
                  try graft.util.IoUtil.copy(in, o) finally o.close()
                } finally in.close()
                if (!tgtFs.rename(tmp, tgtP))
                  throw new java.io.IOException(s"commit rename failed: $tgt")
              } catch { case e: java.io.IOException =>
                try tgtFs.delete(tmp, false)
                catch { case _: java.io.IOException => () }
                throw e
              }
              out.println(s"Copied\t$src\t$tgt")
            }
          } catch { case scala.util.control.NonFatal(e) =>
            // NonFatal, not just IOException: Path construction throws
            // IllegalArgumentException on a malformed URI, and the
            // per-tuple contract must hold for that too
            bad += 1
            err.println(s"FAILED-SYNC\t$src\t$tgt\t${e.getMessage}")
          }
        case _ =>
          bad += 1
          err.println(s"Bad input line($line)")
      }
    }
    out.flush(); err.flush()
    bad
  }

  /** hdfs-touch (HDFSTouch.java:71-117 — present in the reference tree
    * though never registered in JobDriver): set a FILE's mtime+atime;
    * `updateDir` additionally bumps the PARENT directory's mtime by
    * creating and deleting a temp file inside it (HDFS updates a dir's
    * mtime on child create/delete — the original's trick, kept).
    * Directories themselves are refused, like the original. */
  def touch(conf: Configuration, pathStr: String, mtime: Long,
            updateDir: Boolean): Unit = {
    val path = new Path(pathStr)
    val fs = path.getFileSystem(conf)
    require(!fs.getFileStatus(path).isDirectory,
      s"can't touch directories: $path")
    fs.setTimes(path, mtime, mtime)
    if (updateDir) {
      val tmp = new Path(path.getParent, ".tmp_touch_latest")
      // NEVER create-over an existing file: the original truncated and
      // deleted any real file (including the one just touched) that
      // happened to carry the marker name — silent data loss; refusing
      // loudly is the only safe behavior for a name collision
      require(!fs.exists(tmp), s"refusing dir-mtime bump: $tmp exists")
      fs.create(tmp, false).close()
      fs.delete(tmp, false)
    }
  }

  /** The two timestamp grammars HDFSTouch.java:20-21 accepts:
    * `yyyy-MM-dd HH:mm:ss` (read as UTC — the repo-wide session
    * convention; the original used the JVM default zone) and the
    * HTTP date (`EEE, dd MMM yyyy HH:mm:ss zzz`). None = unparseable;
    * the CALLER decides loudness — the verb aborts, where the original
    * silently fell back to "now" after printing a complaint (a footgun
    * this port does not keep). */
  def parseTouchTimestamp(s: String): Option[Long] = {
    val simple = scala.util.Try(java.time.LocalDateTime
        .parse(s, java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss"))
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli).toOption
    def http = scala.util.Try(java.time.ZonedDateTime
        .parse(s, java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)
        .toInstant.toEpochMilli).toOption
    simple.orElse(http)
  }

  /** hdfs-fseeko / range-dumper (HDFSeeko.java:63-120,
    * HDFSRangeDumper.java:31-48 — the same byte-range dump registered
    * twice in the reference; one verb here): each spec is
    * `URI [OFFSET [LENGTH]]` — whole file, offset→EOF, or exactly
    * LENGTH bytes (short reads are an error, matching the
    * range-dumper's short-copy check). */
  def catRange(conf: Configuration, spec: Seq[String],
               out: OutputStream): Unit = {
    require(spec.nonEmpty && spec.length <= 3, s"bad range spec: $spec")
    val p = new Path(spec.head)
    val offset = if (spec.length > 1) spec(1).toLong else 0L
    val length = if (spec.length > 2) spec(2).toLong else -1L
    val fs = p.getFileSystem(conf)
    // loudness must not depend on the scheme: HDFS throws from a
    // past-EOF seek while the local FS permits it and would emit zero
    // bytes with exit 0 — check the bound here so every FS errors
    val fileLen = fs.getFileStatus(p).getLen
    if (offset > fileLen) throw new java.io.IOException(
      s"Short copy(${spec.head})($offset)($length): " +
        s"offset past EOF ($fileLen)")
    val in = fs.open(p)
    try {
      in.seek(offset)
      val buf = new Array[Byte](1 << 16)
      var remaining = length
      var done = false
      while (!done) {
        val want =
          if (remaining < 0) buf.length
          else math.min(remaining, buf.length.toLong).toInt
        if (want == 0) done = true
        else {
          val n = in.read(buf, 0, want)
          if (n < 0) {
            if (remaining > 0) throw new java.io.IOException(
              s"Short copy(${spec.head})($offset)($length): " +
                s"missing $remaining")
            done = true
          } else {
            out.write(buf, 0, n)
            if (remaining > 0) remaining -= n
          }
        }
      }
    } finally in.close()
    out.flush()
  }
}
