package graft.sources

import java.net.{HttpURLConnection, URI}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.util.SerializableConfiguration

import graft.util.IoUtil

/**
 * HTTP-backed source/ingest operators (SURVEY §2 S13/K13). Driver plans,
 * executors fetch — the reference's shapes:
 *  - HTTPImportMapper.java:124-179: idempotent HTTP→FS ingest (skip when
 *    the target exists with equal length; .TMP → verify length → rename);
 *  - HttpTextLoader.java:120-138: a paged remote text service advertises
 *    its page count (X-CDX-Num-Pages); one partition per page.
 */
object HttpSources {

  final case class ImportTask(url: String, dest: String)
  final case class ImportResult(url: String, dest: String, action: String,
                                bytes: Long)

  /** Parallel idempotent HTTP→FS ingest; one fetch per task row. */
  def httpImport(spark: SparkSession,
                 tasks: Dataset[ImportTask]): Dataset[ImportResult] = {
    import spark.implicits._
    val conf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    tasks.mapPartitions { it =>
      it.map { t =>
        val dst = new Path(t.dest)
        val fs = dst.getFileSystem(conf.value)
        val remoteLen = contentLength(t.url)
        val localLen =
          if (fs.exists(dst)) fs.getFileStatus(dst).getLen else -1L
        if (remoteLen >= 0 && remoteLen == localLen)
          ImportResult(t.url, t.dest, "skipped", localLen)
        else {
          val tmp = new Path(t.dest + ".TMP")
          val conn = connect(t.url, "GET")
          var total = 0L
          // mid-copy failures must release the socket and the tmp writer
          // (an unclosed HDFS writer holds a lease that blocks the retry)
          val in = conn.getInputStream
          try {
            val out = fs.create(tmp, true)
            try total = IoUtil.copy(in, out) finally out.close()
          } finally { in.close(); conn.disconnect() }
          require(remoteLen < 0 || total == remoteLen,
            s"length mismatch for ${t.url}: got $total, expected $remoteLen")
          fs.delete(dst, false)
          require(fs.rename(tmp, dst),
            s"commit: rename to ${t.dest} failed")
          ImportResult(t.url, t.dest, "copied", total)
        }
      }
    }
  }

  /** Paged remote text scan: the service reports its page count; each
    * partition GETs one page and streams its lines. `authCookie` is the
    * reference's access-control knob (HttpTextLoader.java:200-204): when
    * set, every request — the page-count probe included — carries
    * `Cookie: cdx_auth_token=<value>`. */
  def pagedLines(spark: SparkSession, baseUrl: String,
                 pageParam: String = "page",
                 authCookie: Option[String] = None): Dataset[String] = {
    import spark.implicits._
    val n = numPages(baseUrl, authCookie)
    spark.createDataset(0 until n)
      .repartition(math.max(1, n))
      .mapPartitions { pages =>
        // ONE completion listener per task, closing whatever page is
        // currently open (r20 advice: one listener per PAGE accumulated
        // for the whole task, each pinning its closed stream refs —
        // harmless at one-page-per-partition, a leak under long
        // multi-page pagination)
        var currentClose: () => Unit = () => ()
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => currentClose()))
        pages.flatMap { page =>
          val sep = if (baseUrl.contains("?")) "&" else "?"
          val conn = connect(s"$baseUrl$sep$pageParam=$page", "GET", authCookie)
          val in = conn.getInputStream
          // idempotent close on exhaustion AND task completion: an
          // abandoned iterator (limit/kill) would otherwise hold the
          // socket until GC (r19 sweep; the openMembers discipline)
          var closed = false
          def closeIn(): Unit = if (!closed) {
            closed = true
            try in.close() catch { case _: Exception => () }
            conn.disconnect()
          }
          currentClose = () => closeIn()
          new IoUtil.AutoCloseIterator(new IoUtil.LfLineIterator(in),
            () => closeIn())
        }
      }
  }

  /** Page count via `showNumPages=true` — X-CDX-Num-Pages header first,
    * body integer as fallback. */
  def numPages(baseUrl: String, authCookie: Option[String] = None): Int = {
    val sep = if (baseUrl.contains("?")) "&" else "?"
    val conn = connect(s"$baseUrl${sep}showNumPages=true", "GET", authCookie)
    try {
      val fromHeader = Option(conn.getHeaderField("X-CDX-Num-Pages"))
        .flatMap(_.trim.toIntOption)
      fromHeader.getOrElse {
        val body = new String(conn.getInputStream.readAllBytes, "UTF-8")
        body.trim.toIntOption.getOrElse(
          throw new IllegalStateException(
            s"service at $baseUrl did not report a page count"))
      }
    } finally conn.disconnect()
  }

  private def contentLength(url: String): Long = {
    val conn = connect(url, "HEAD")
    // a 404/500 error body has a Content-Length too — only a 2xx HEAD
    // describes the actual file; anything else means "unknown"
    try {
      if (conn.getResponseCode / 100 == 2) conn.getContentLengthLong
      else -1L
    } finally conn.disconnect()
  }

  private def connect(url: String, method: String,
                      authCookie: Option[String] = None): HttpURLConnection = {
    val conn = URI.create(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    conn.setConnectTimeout(30000)
    conn.setReadTimeout(120000)
    // cookie auth, the reference's scheme (HttpTextLoader.java:200-204)
    authCookie.foreach(v =>
      conn.setRequestProperty("Cookie", s"cdx_auth_token=$v"))
    conn
  }
}
