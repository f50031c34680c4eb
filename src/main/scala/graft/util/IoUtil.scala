package graft.util

import java.io.InputStream
import java.nio.charset.StandardCharsets.UTF_8

/** Stream plumbing shared by the scan operators. */
object IoUtil {

  /** Copy `in` to `out` until EOF (closes neither); returns bytes
    * copied. The one buffered copy loop — callers that need a length
    * check compare the return value. */
  def copy(in: InputStream, out: java.io.OutputStream): Long = {
    val buf = new Array[Byte](1 << 16)
    var total = 0L
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); total += n; n = in.read(buf) }
    total
  }

  /** Reads at most `limit` bytes from `in` (does not close it). */
  final class BoundedInputStream(in: InputStream, limit: Long)
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
    // Honest available(): the base InputStream default is a constant 0,
    // which historically made JDK GZIPInputStream truncate multi-member
    // streams at a member boundary (JDK-7036144). That JDK bug is fixed
    // since Java 9 — readTrailer now probes the next header with a real
    // read (verified by IndirectScanSpec's zero-available() regression
    // test) — so this override is defensive accuracy, not a bug fix:
    // report at least 1 while the bounded region has bytes, 0 at its end.
    override def available(): Int =
      if (remaining <= 0) 0
      else math.max(1, math.min(in.available().toLong, remaining).toInt)
  }

  /** Splits an InputStream's bytes into UTF-8 lines on LF ONLY — interior
    * CR is data (the reference's LFOnlyLineReader semantics, SURVEY §2 S2).
    * Empty lines are dropped. */
  final class LfLineIterator(in: InputStream) extends Iterator[String] {
    private val buf = new Array[Byte](64 * 1024)
    private var len = 0
    private var pos = 0
    private var eof = false
    private val line = new java.io.ByteArrayOutputStream(256)
    private var nextLine: String = _

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
        if (i < len) {
          pos = i + 1
          if (line.size() > 0) {
            nextLine = new String(line.toByteArray, UTF_8); line.reset()
          } else advance()
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

  /** Iterator that invokes `close` once exhausted. */
  final class AutoCloseIterator[T](it: Iterator[T], close: () => Unit)
      extends Iterator[T] {
    private var closed = false
    override def hasNext: Boolean = {
      val h = it.hasNext
      if (!h && !closed) { closed = true; close() }
      h
    }
    override def next(): T = it.next()
  }
}
