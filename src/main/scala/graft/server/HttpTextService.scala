package graft.server

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.concurrent.TrieMap

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/**
 * Minimal paged-text HTTP service — the serving counterpart of the S13
 * loader's protocol (SURVEY §2 S13;
 * /root/reference/src/main/java/org/archive/hadoop/pig/HttpTextLoader.java:120-138):
 * `?showNumPages=true` answers the page count (X-CDX-Num-Pages header +
 * body), `?page=N` streams that page's lines. The reference assumed an
 * external CDX server; this in-process stand-in makes the loader drivable
 * end-to-end (oracle queries, CLI demos, tests) with zero egress.
 *
 * [[serveShared]] keeps one server per distinct (content digest, pageSize)
 * while its owning SparkSession lives: lazy sources fetch at ACTION time —
 * long after the planning code returns — so a scoped start/stop around
 * planning would serve nothing, and a server per run would leak one
 * listener per bench repetition.
 */
object HttpTextService {

  final class Instance private[HttpTextService] (server: HttpServer,
                                                 val pages: Int) {
    val port: Int = server.getAddress.getPort
    /** Base URL for [[graft.sources.HttpSources.pagedLines]]. */
    def url: String = s"http://127.0.0.1:$port/text"
    def stop(): Unit = server.stop(0)
  }

  /** Start a fresh service for `lines`, split into `pageSize`-line pages. */
  def serve(lines: IndexedSeq[String], pageSize: Int): Instance = {
    require(pageSize > 0, "pageSize must be positive")
    val nPages = math.max(1, (lines.size + pageSize - 1) / pageSize)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    // concurrent handlers on daemon threads: the default (null) executor
    // serves every request serially on the dispatcher thread, which would
    // serialize the loader's page-per-partition parallel fetch; daemon
    // threads keep worker threads from pinning the JVM alive
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool(
      r => { val t = new Thread(r, "http-text-worker"); t.setDaemon(true); t }))
    server.createContext("/text", (x: HttpExchange) => {
      try {
        val q = Option(x.getRequestURI.getQuery).getOrElse("")
        val params = q.split("&").iterator.map(_.split("=", 2))
          .collect { case Array(k, v) => (k, v) }.toMap
        if (params.get("showNumPages").contains("true")) {
          val body = s"$nPages\n".getBytes(UTF_8)
          x.getResponseHeaders.add("X-CDX-Num-Pages", nPages.toString)
          x.sendResponseHeaders(200, body.length)
          x.getResponseBody.write(body)
        } else params.get("page").flatMap(_.toIntOption) match {
          case Some(p) if p >= 0 && p < nPages =>
            val page = lines.slice(p * pageSize, (p + 1) * pageSize)
            // an empty page must be an empty body — "\n" would round-trip
            // as one phantom empty line
            val body =
              if (page.isEmpty) Array.emptyByteArray
              else page.mkString("", "\n", "\n").getBytes(UTF_8)
            x.sendResponseHeaders(200,
              if (body.isEmpty) -1 else body.length.toLong)
            if (body.nonEmpty) x.getResponseBody.write(body)
          case _ =>
            x.sendResponseHeaders(404, -1)
        }
      } finally x.close()
    })
    server.start()
    new Instance(server, nPages)
  }

  private val shared = TrieMap.empty[(String, Int), Instance]

  /** Content identity for the shared cache: a real digest of the joined
    * lines — a 32-bit hashCode key would silently serve the WRONG dataset
    * on collision (no error, wrong rows). */
  private def contentKey(lines: IndexedSeq[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    lines.foreach { l => md.update(l.getBytes(UTF_8)); md.update(0: Byte) }
    graft.operators.llm.MultimodalOps.hexLower(md.digest())
  }

  /** One instance per distinct (content digest, pageSize), stopped AND
    * evicted when `owner`'s application ends — the HttpServer dispatcher
    * is a non-daemon thread, so an unstopped server pins the JVM alive
    * after main() returns, and a stopped-but-cached entry would hand a
    * dead server to the next SparkSession in the same JVM. */
  def serveShared(lines: IndexedSeq[String], pageSize: Int,
                  owner: org.apache.spark.sql.SparkSession): Instance = {
    val key = (contentKey(lines), pageSize)
    shared.getOrElseUpdate(key, {
      val inst = serve(lines, pageSize)
      owner.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
            shared.remove(key)
            inst.stop()
          }
        })
      inst
    })
  }
}
