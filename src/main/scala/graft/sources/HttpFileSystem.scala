package graft.sources

import java.io.{FileNotFoundException, IOException, InputStream}
import java.net.{HttpURLConnection, URI}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/**
 * Read-only Hadoop FileSystem over plain HTTP (SURVEY §2 S18 — the
 * PetaboxFileSystem SHAPE: a seekable, length-aware HTTP-backed FS that
 * Spark consumes unchanged via any `spark.read...`; the IA-specific item
 * metadata API is out of scope, the FS mechanics are what the engine
 * needs). Enable with
 * `spark.hadoop.fs.grafthttp.impl=graft.sources.HttpFileSystem`, then
 * read `grafthttp://host:port/path`.
 *
 * Seeks are HTTP Range requests; small FORWARD seeks (< 1 MB) skip on the
 * open stream instead of reconnecting — the reference's small-gap
 * optimization (petabox/PetaboxClient.java:252-328, SMALL_GAP).
 */
class HttpFileSystem extends FileSystem {

  private var fsUri: URI = _
  private var workDir: Path = _

  override def getScheme: String = "grafthttp"

  override def initialize(uri: URI, conf: Configuration): Unit = {
    super.initialize(uri, conf)
    setConf(conf)
    fsUri = URI.create(s"${uri.getScheme}://${uri.getAuthority}")
    workDir = new Path("/")
  }

  override def getUri: URI = fsUri

  private def httpUrl(f: Path): String = {
    val p = makeQualified(f).toUri
    s"http://${p.getAuthority}${p.getPath}"
  }

  override def getFileStatus(f: Path): FileStatus = {
    val conn = URI.create(httpUrl(f)).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("HEAD")
    val code = conn.getResponseCode
    if (code == 404) throw new FileNotFoundException(f.toString)
    if (code != 200) throw new IOException(s"HEAD $f -> $code")
    val len = conn.getContentLengthLong
    conn.disconnect()
    // without a length the seekable reader would see pos >= -1 and EOF
    // every read — an unreadable file must fail loudly, not read empty
    if (len < 0) throw new IOException(
      s"HEAD $f returned no Content-Length; range reads need a known size")
    new FileStatus(len, false, 1, 128L * 1024 * 1024, 0L, makeQualified(f))
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val len = getFileStatus(f).getLen
    val inner = new HttpSeekableStream(httpUrl(f), len)
    new FSDataInputStream(new FSInputStream {
      override def seek(pos: Long): Unit = inner.seek(pos)
      override def getPos: Long = inner.getPos
      override def seekToNewSource(targetPos: Long): Boolean = false
      override def read(): Int = inner.read()
      override def read(b: Array[Byte], off: Int, n: Int): Int =
        inner.read(b, off, n)
      override def close(): Unit = inner.close()
    })
  }

  override def listStatus(f: Path): Array[FileStatus] =
    Array(getFileStatus(f)) // single-object namespace; no directory API

  override def exists(f: Path): Boolean =
    try { getFileStatus(f); true } catch { case _: FileNotFoundException => false }

  override def getWorkingDirectory: Path = workDir
  override def setWorkingDirectory(dir: Path): Unit = workDir = dir

  private def readOnly = new IOException("grafthttp is read-only")
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = throw readOnly
  override def append(f: Path, bufferSize: Int,
                      progress: Progressable): FSDataOutputStream = throw readOnly
  override def rename(src: Path, dst: Path): Boolean = throw readOnly
  override def delete(f: Path, recursive: Boolean): Boolean = throw readOnly
  override def mkdirs(f: Path, permission: FsPermission): Boolean = throw readOnly
}

/** Seekable HTTP stream: Range reconnect on backward/far seeks, skip on
  * small forward gaps. */
private[sources] final class HttpSeekableStream(url: String, length: Long)
    extends InputStream {

  private val SmallGap = 1L << 20 // 1 MB — skip instead of reconnect
  private var stream: InputStream = _
  private var streamPos = 0L // position the open stream will read next
  private var pos = 0L       // logical position

  private def ensureStream(): Unit = {
    if (stream != null && pos >= streamPos &&
        pos - streamPos <= SmallGap) {
      var gap = pos - streamPos
      while (gap > 0) {
        val n = stream.skip(gap)
        if (n <= 0) { val b = stream.read(); if (b < 0) return; gap -= 1 }
        else gap -= n
      }
      streamPos = pos
    } else {
      if (stream != null) { stream.close(); stream = null }
      if (pos >= length) return
      val conn = URI.create(url).toURL.openConnection()
        .asInstanceOf[HttpURLConnection]
      conn.setRequestProperty("Range", s"bytes=$pos-")
      val code = conn.getResponseCode
      if (code != 206 && code != 200)
        throw new IOException(s"GET $url (Range $pos-) -> $code")
      stream = conn.getInputStream
      if (code == 200 && pos > 0) { // server ignored Range: skip manually
        var gap = pos
        while (gap > 0) {
          val n = stream.skip(gap)
          if (n <= 0) { if (stream.read() < 0) return; gap -= 1 } else gap -= n
        }
      }
      streamPos = pos
    }
  }

  def seek(target: Long): Unit = pos = target
  def getPos: Long = pos

  override def read(): Int = {
    if (pos >= length) return -1
    ensureStream()
    if (stream == null) return -1
    val b = stream.read()
    if (b >= 0) { pos += 1; streamPos = pos }
    b
  }

  override def read(buf: Array[Byte], off: Int, len: Int): Int = {
    if (pos >= length) return -1
    ensureStream()
    if (stream == null) return -1
    val n = stream.read(buf, off, len)
    if (n > 0) { pos += n; streamPos = pos }
    n
  }

  override def close(): Unit = if (stream != null) stream.close()
}
