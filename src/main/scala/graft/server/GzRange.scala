package graft.server

import java.io.{File, RandomAccessFile}
import java.net.{HttpURLConnection, InetSocketAddress, URI}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/**
 * GZRange service (SURVEY §2 K12): a standalone (non-Spark) utility pair —
 * a server that hands out raw byte ranges of archive files, and a client
 * that assembles fetched gzip members into new archives with size-based
 * rotation (/root/reference/src/main/java/org/archive/server/
 * GZRangeClient.java:43-44 — 100 MB ARC / 1 GB WARC defaults;
 * GZRangeServer.java:29-188). JDK HTTP server/client; no engine coupling.
 */
object GzRangeServer {

  /** Serve `GET /fetch?file=rel/path&offset=N&length=M` from rootDir.
    * Returns the started server (port via `getAddress.getPort`). */
  def start(rootDir: String, port: Int = 0): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/fetch", (x: HttpExchange) => {
      var headersSent = false
      try {
        // parse the RAW query, decoding each value AFTER the '&'/'='
        // split — a pre-decoded query would mis-split on '&' inside a
        // percent-encoded file name
        val params = Option(x.getRequestURI.getRawQuery).getOrElse("")
          .split("&").filter(_.contains("="))
          .map { p =>
            val Array(k, v) = p.split("=", 2)
            k -> java.net.URLDecoder.decode(v, "UTF-8")
          }.toMap
        val f = new File(rootDir, params("file"))
        val rootPrefix = new File(rootDir).getCanonicalPath + File.separator
        require(f.getCanonicalPath.startsWith(rootPrefix),
          "path escapes root") // bare prefix would allow ../root-sibling
        val offset = params("offset").toLong
        val length = params("length").toInt
        val buf = new Array[Byte](length)
        val raf = new RandomAccessFile(f, "r")
        try { raf.seek(offset); raf.readFully(buf) } finally raf.close()
        x.sendResponseHeaders(200, length)
        headersSent = true
        x.getResponseBody.write(buf)
      } catch {
        case e: Exception if !headersSent =>
          // after a 200 is committed (e.g. client disconnect mid-body)
          // a 500 can no longer be sent — just close
          val msg = e.toString.getBytes("UTF-8")
          x.sendResponseHeaders(500, msg.length)
          x.getResponseBody.write(msg)
        case _: Exception => ()
      } finally x.close()
    })
    server.start()
    server
  }
}

/**
 * Client: fetch members by (file, offset, length) and append into rotating
 * local archives. A synthesized leading record (filedesc/warcinfo
 * analogue, pre-gzipped) opens every rotated file.
 */
final class GzRangeClient(outDir: String, prefix: String,
                          maxFileBytes: Long,
                          header: Option[Array[Byte]] = None) {

  private var fileIdx = -1
  private var out: java.io.FileOutputStream = _
  private var written = 0L
  private val files = Seq.newBuilder[String]

  private def rotate(): Unit = {
    if (out != null) out.close()
    fileIdx += 1
    val name = f"$prefix-$fileIdx%05d.warc.gz"
    val f = new File(outDir, name)
    files += f.getPath
    out = new java.io.FileOutputStream(f)
    written = 0L
    header.foreach { h => out.write(h); written += h.length }
  }

  /** Fetch one member from the server and append; rotates beforehand when
    * the member would push the current file past maxFileBytes. */
  def fetchAndAppend(serverBase: String, file: String, offset: Long,
                     length: Long): Unit = {
    val enc = java.net.URLEncoder.encode(file, "UTF-8")
    val url = s"$serverBase/fetch?file=$enc&offset=$offset&length=$length"
    val conn = URI.create(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    require(conn.getResponseCode == 200, s"fetch failed: $url")
    val bytes = conn.getInputStream.readAllBytes()
    require(bytes.length.toLong == length, s"short read: $url")
    if (out == null || (written > 0 && written + length > maxFileBytes))
      rotate()
    out.write(bytes)
    written += length
  }

  /** Close and return the rotated file paths, in order. */
  def close(): Seq[String] = {
    if (out != null) out.close()
    files.result()
  }
}
