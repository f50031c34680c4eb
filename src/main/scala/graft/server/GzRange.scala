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
    * Returns the started server (port via `getAddress.getPort`).
    * `bindHost` defaults to loopback (the in-process test shape); the
    * CLI verb binds 0.0.0.0 so fleet clients can actually reach it. */
  def start(rootDir: String, port: Int = 0,
            bindHost: String = "127.0.0.1"): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress(bindHost, port), 0)
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
        val length = params("length").toLong
        // validate BEFORE committing a 200: the range must lie inside the
        // file (a missing file has length 0, so any nonempty range fails
        // here too), and lengths are never trusted with an allocation —
        // the body streams in fixed 64 KiB chunks, so a hostile
        // length=Int.MaxValue costs one chunk buffer, not a 2 GiB array
        // (the reference server streams as well — GZRangeServer.java)
        require(offset >= 0 && length >= 0, "negative range")
        require(f.isFile && offset <= f.length() &&
          length <= f.length() - offset, "range beyond file")
        val raf = new RandomAccessFile(f, "r")
        try {
          raf.seek(offset)
          x.sendResponseHeaders(200, length)
          headersSent = true
          val os = x.getResponseBody
          val chunk = new Array[Byte](64 * 1024)
          var remaining = length
          while (remaining > 0) {
            val n = raf.read(chunk, 0,
              math.min(chunk.length.toLong, remaining).toInt)
            require(n > 0, "EOF inside validated range")
            os.write(chunk, 0, n)
            remaining -= n
          }
        } finally raf.close()
      } catch {
        case e: Exception if !headersSent =>
          // after a 200 is committed (e.g. client disconnect mid-body)
          // a 500 can no longer be sent — just close. The body is a
          // CONSTANT: e.toString would echo absolute server paths to
          // any network peer (the verb binds 0.0.0.0); the detail goes
          // to the server's own stderr instead.
          System.err.println(s"[gz-range-server] request failed: $e")
          val msg = "fetch failed".getBytes("UTF-8")
          x.sendResponseHeaders(500, msg.length)
          x.getResponseBody.write(msg)
        case _: Exception => ()
      } finally x.close()
    })
    // bounded worker pool: without an executor the JDK server runs every
    // handler on its single dispatch thread, serializing the whole fleet
    // behind one slow disk read; daemon threads so a CLI ^C still exits
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(
      8,
      (r: Runnable) => {
        val t = new Thread(r, "gz-range-worker")
        t.setDaemon(true)
        t
      }))
    server.start()
    server
  }
}

/**
 * Client: fetch members by (file, offset, length) and append into rotating
 * local archives. A synthesized leading record (filedesc/warcinfo
 * analogue, pre-gzipped) opens every rotated file: fixed bytes via
 * `header`, or per-file via `headerFor` (the reference stamps each
 * rotated file's own name into its warcinfo — GZRangeClient.java:72-123;
 * [[GzRangeClient.warcinfoHeader]] is that synthesis). `headerFor`
 * wins when both are set.
 */
final class GzRangeClient(outDir: String, prefix: String,
                          maxFileBytes: Long,
                          header: Option[Array[Byte]] = None,
                          headerFor: Option[String => Array[Byte]] = None) {

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
    headerFor.map(_(name)).orElse(header)
      .foreach { h => out.write(h); written += h.length }
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

object GzRangeClient {

  /** Synthesized WARC warcinfo leading record for a rotated file, as
    * one pre-gzipped member (the reference's per-file template,
    * GZRangeClient.java:78-123: WARC-Filename carries the rotated
    * file's own name). Record-ID derives deterministically from the
    * file name (type-3 UUID), and `date` is caller-supplied — both so
    * repackaging the same manifest twice produces identical bytes. */
  def warcinfoHeader(filename: String,
                     date: java.time.Instant): Array[Byte] = {
    val body = "software: graft GZRangeClient\r\n" +
      "format: WARC File Format 1.0\r\n"
    val uuid = java.util.UUID.nameUUIDFromBytes(
      s"graft-gzrange|$filename".getBytes("UTF-8"))
    val ts = java.time.format.DateTimeFormatter.ISO_INSTANT
      .format(date.truncatedTo(java.time.temporal.ChronoUnit.SECONDS))
    val rec = "WARC/1.0\r\n" +
      "WARC-Type: warcinfo\r\n" +
      s"WARC-Date: $ts\r\n" +
      s"WARC-Filename: $filename\r\n" +
      s"WARC-Record-ID: <urn:uuid:$uuid>\r\n" +
      "Content-Type: application/warc-fields\r\n" +
      s"Content-Length: ${body.getBytes("UTF-8").length}\r\n\r\n" +
      body + "\r\n\r\n"
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(rec.getBytes("UTF-8"))
    gz.close() // finish + Deflater.end — finish() alone leaves the
               // deflater's native memory to the GC (r19 sweep)
    bos.toByteArray
  }
}
