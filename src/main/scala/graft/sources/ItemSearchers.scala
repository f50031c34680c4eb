package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/**
 * Petabox item discovery (SURVEY §2 S18 periphery): the three strategies
 * the reference's archive filesystem uses to enumerate a collection's
 * items before fetching their metadata —
 *
 *  - [[SearchEngineItemSearcher]]: the public search engine's paged JSON
 *    API (`/root/reference/src/main/java/org/archive/hadoop/fs/SearchEngineItemSearcher.java:69-117`):
 *    `q=collection:<id>`, 200 rows/page, `response.numFound` bounds the
 *    loop, items sorted by publicdate ascending;
 *  - [[MetaManagerItemSearcher]] (`MetaManagerItemSearcher.java:86-150`):
 *    an authenticated admin endpoint whose JSON reports NO total — the
 *    loop ends when a page comes back shorter than requested;
 *  - [[CollectionIndexItemSearcher]] (`CollectionIndexItemSearcher.java:60-100`):
 *    a single unpaged GET against a custom collection index.
 *
 * All three return the same row: (identifier, mtime millis). Transport is
 * a pluggable `fetch: url => body` (production: HTTP GET with the
 * PetaboxClient retry envelope; tests: fixtures) — the searchers
 * themselves are pure protocol.
 */
object ItemSearchers {

  final case class ItemStatus(identifier: String, mtimeMs: Long)

  trait ItemSearcher {
    def searchItems(collId: String): Seq[ItemStatus]
  }

  private val mapper = new ObjectMapper()

  /** ISO `yyyy-MM-ddTHH:mm:ssZ` → epoch ms; unparseable → 0, the
    * reference behavior (SearchEngineItemSearcher.java:58-67). */
  def isoToMs(s: String): Long =
    try java.time.Instant.parse(s).toEpochMilli
    catch { case _: Exception => 0L }

  /** Default transport: plain GET, body as UTF-8. */
  def httpFetch(url: String): String = {
    val conn = java.net.URI.create(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(30000)
    conn.setReadTimeout(120000)
    try new String(conn.getInputStream.readAllBytes, "UTF-8")
    finally conn.disconnect()
  }

  /** Paged search-engine protocol: `response.numFound` bounds the loop;
    * docs carry `identifier` + `publicdate`. */
  final class SearchEngineItemSearcher(
      baseUrl: String, rowsPerPage: Int = 200,
      fetch: String => String = httpFetch) extends ItemSearcher {

    private def pageUrl(collId: String, start: Int): String =
      s"$baseUrl/advancedsearch.php?q=collection:$collId" +
        "&fl[]=identifier&fl[]=publicdate&sort[]=publicdate+asc" +
        s"&indent=&start=$start&rows=$rowsPerPage&output=json"

    override def searchItems(collId: String): Seq[ItemStatus] = {
      val out = Seq.newBuilder[ItemStatus]
      var start = 0
      var numFound = Long.MaxValue
      var done = false
      while (!done && start < numFound) {
        val resp = mapper.readTree(fetch(pageUrl(collId, start)))
          .path("response")
        numFound = resp.path("numFound").asLong(0L)
        val docs = resp.path("docs")
        // a service advertising numFound it cannot serve (empty page
        // mid-range) must terminate the loop, not spin through millions
        // of empty fetches
        done = docs.size() == 0
        var i = 0
        while (i < docs.size()) {
          val d = docs.get(i)
          val id = d.path("identifier").asText(null)
          if (id != null)
            out += ItemStatus(id, isoToMs(d.path("publicdate").asText("")))
          i += 1
        }
        start += rowsPerPage
      }
      out.result()
    }
  }

  /** MetaManager protocol: pages of `rowsPerPage`, no total anywhere in
    * the response — a short (or empty) page terminates
    * (MetaManagerItemSearcher.java:108-150). */
  final class MetaManagerItemSearcher(
      baseUrl: String, rowsPerPage: Int = 200,
      fetch: String => String = httpFetch) extends ItemSearcher {

    private def pageUrl(collId: String, start: Int): String =
      s"$baseUrl/metamgr.php?srt=identifier&w_collection=$collId" +
        "&fs_identifier=on&fs_mediatype=on&fs_collection=on" +
        s"&start=$start&limit=$rowsPerPage&output_format=json"

    override def searchItems(collId: String): Seq[ItemStatus] = {
      val out = Seq.newBuilder[ItemStatus]
      var start = 0
      var lastPage = rowsPerPage
      while (lastPage == rowsPerPage) {
        val rows = mapper.readTree(fetch(pageUrl(collId, start)))
        lastPage = 0
        var i = 0
        while (i < rows.size()) {
          val r = rows.get(i)
          val id = r.path("identifier").asText(null)
          if (id != null)
            out += ItemStatus(id, isoToMs(r.path("updated").asText("")))
          lastPage += 1
          i += 1
        }
        start += rowsPerPage
      }
      out.result()
    }
  }

  /** Collection-index protocol: one unpaged GET returning the item list. */
  final class CollectionIndexItemSearcher(
      baseUrl: String, fetch: String => String = httpFetch)
      extends ItemSearcher {

    override def searchItems(collId: String): Seq[ItemStatus] = {
      val root = mapper.readTree(fetch(s"$baseUrl/getitems.php?c=$collId"))
      val items: JsonNode =
        if (root.isArray) root else root.path("items")
      (0 until items.size()).flatMap { i =>
        val r = items.get(i)
        if (r.isTextual) Some(ItemStatus(r.asText(), 0L))
        else Option(r.path("identifier").asText(null))
          .map(id => ItemStatus(id, isoToMs(r.path("updated").asText(""))))
      }
    }
  }

  /** Bounded-parallel metadata fetch over an item list — the reference
    * filesystem's 10-thread listStatus (PetaboxFileSystem.java:494-533).
    * Order of the result matches `ids`; one failure fails the listing
    * (as the reference's listStatus does). */
  def fetchParallel[A](ids: Seq[String], threads: Int = 10)
                      (fetch: String => A): Seq[A] = {
    require(threads >= 1, s"threads must be >= 1, got $threads")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    try {
      val futures = ids.map(id => pool.submit(
        new java.util.concurrent.Callable[A] { def call(): A = fetch(id) }))
      futures.map(_.get())
    } finally pool.shutdown()
  }
}
