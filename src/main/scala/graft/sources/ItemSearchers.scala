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
 *  - [[MetaManagerItemSearcher]] (`MetaManagerItemSearcher.java:86-99,107-219`):
 *    an authenticated admin endpoint (`metamgr.php`) paged with
 *    `off=`/`lim=`, whose JSON reports NO total; fields come back as
 *    POSITIONAL arrays under `"rows"` in `fs_*` parameter order
 *    (identifier, mediatype, collection, publicdate), and the client
 *    itself drops `mediatype=collection` rows and rows whose
 *    semicolon-delimited collection list doesn't contain the query id
 *    (the `w_collection=*id*` wildcard over-matches);
 *  - [[CollectionIndexItemSearcher]] (`CollectionIndexItemSearcher.java:60-100`):
 *    a single unpaged GET against a custom collection index.
 *
 * All three return the same row: (identifier, mtime millis). Transport is
 * a pluggable `fetch: url => body` (production: HTTP GET with the
 * PetaboxClient retry envelope, authenticated via [[AuthProvider]];
 * tests: fixtures) — the searchers themselves are pure protocol.
 */
object ItemSearchers {

  final case class ItemStatus(identifier: String, mtimeMs: Long)

  trait ItemSearcher {
    def searchItems(collId: String): Seq[ItemStatus]
  }

  /** Pluggable per-request auth, the reference's `PetaboxAuthProvider`
    * hook (petabox/PetaboxClient.java:66-81 `setAuthProvider`; `:225`
    * `setupRequest` adds the provider's auth cookies to EVERY outgoing
    * request): yields headers to add to each HTTP request. */
  trait AuthProvider {
    def authHeaders(url: String): Map[String, String]
  }

  object AuthProvider {
    /** Cookie auth — what the reference's provider actually sends.
      * Values are joined verbatim into one `Cookie` header: callers must
      * pass values already cookie-safe (RFC 6265 cookie-octets — in
      * particular no ';' or ','; percent-encode such values first), or
      * adjacent cookies would be corrupted. */
    def cookies(pairs: (String, String)*): AuthProvider = {
      require(pairs.forall { case (k, c) =>
        !k.exists(";,= ".contains(_)) && !c.exists(";,".contains(_)) },
        "cookie names/values must be pre-encoded (no ';' or ',')")
      val v = pairs.map { case (k, c) => s"$k=$c" }.mkString("; ")
      _ => Map("Cookie" -> v)
    }
  }

  private val mapper = new ObjectMapper()

  /** Query-string-safe encoding of a user-supplied value — the reference
    * builds request URIs via `java.net.URI`, which encodes the query; a
    * collection id containing '&', '#', or spaces must not corrupt the
    * request here either. */
  private def qenc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  /** Parse epoch ms from a leading `pattern`-shaped prefix of `s`, UTC;
    * anything unparseable → 0. The reference parses with a lenient
    * `SimpleDateFormat` (SearchEngineItemSearcher.java:58-67,
    * MetaManagerItemSearcher.java:61-70): characters BEYOND the pattern
    * are ignored (prefix leniency — kept here), but every literal IN the
    * pattern must match, so the ISO form's trailing `'Z'` is required
    * immediately after the seconds — `...T04:05:06.123Z` and a missing
    * `Z` both parse to 0 in the reference, and here. Sub-second
    * precision is therefore dropped BY the reference's pattern, not an
    * extra choice of ours. (The reference evaluates in the JVM-default
    * timezone, an environment-dependent latent bug; pinned to UTC here,
    * which is what the ISO form's `Z` literal denotes.) */
  private def parsePrefixMs(s: String, sep: Char,
                            requireAfter: Option[Char]): Long = {
    // yyyy-MM-dd<sep>HH:mm:ss = 19 chars, + 1 for a required literal
    val need = 19 + requireAfter.size
    if (s == null || s.length < need) return 0L
    try {
      if (s.charAt(4) != '-' || s.charAt(7) != '-' || s.charAt(10) != sep ||
          s.charAt(13) != ':' || s.charAt(16) != ':') return 0L
      if (requireAfter.exists(s.charAt(19) != _)) return 0L
      java.time.LocalDateTime.of(
        s.substring(0, 4).toInt, s.substring(5, 7).toInt,
        s.substring(8, 10).toInt, s.substring(11, 13).toInt,
        s.substring(14, 16).toInt, s.substring(17, 19).toInt)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    } catch { case _: Exception => 0L }
  }

  /** ISO `yyyy-MM-dd'T'HH:mm:ss'Z'[...]` → epoch ms; the `Z` literal is
    * required right after seconds, as the reference's pattern demands. */
  def isoToMs(s: String): Long = parsePrefixMs(s, 'T', Some('Z'))

  /** SQL `yyyy-MM-dd HH:mm:ss` → epoch ms — metamgr's datetime form
    * (MetaManagerItemSearcher.java:61-70); no trailing literal, so
    * anything after seconds is ignored. */
  def sqlDateTimeToMs(s: String): Long = parsePrefixMs(s, ' ', None)

  /** Default transport: plain GET, body as UTF-8, optional auth. */
  def httpFetch(url: String): String = httpFetch(url, Map.empty)

  def httpFetch(url: String, headers: Map[String, String]): String = {
    val conn = java.net.URI.create(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(30000)
    conn.setReadTimeout(120000)
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    try new String(conn.getInputStream.readAllBytes, "UTF-8")
    finally conn.disconnect()
  }

  /** Transport with an [[AuthProvider]] consulted per request — drop-in
    * for any searcher's `fetch` parameter. */
  def authenticatedFetch(auth: AuthProvider): String => String =
    url => httpFetch(url, auth.authHeaders(url))

  /** Paged search-engine protocol: `response.numFound` bounds the loop;
    * docs carry `identifier` + `publicdate`. */
  final class SearchEngineItemSearcher(
      baseUrl: String, rowsPerPage: Int = 200,
      fetch: String => String = httpFetch) extends ItemSearcher {

    private def pageUrl(collId: String, start: Int): String =
      s"$baseUrl/advancedsearch.php?q=${qenc(s"collection:$collId")}" +
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

  /** Is `id` a member of the semicolon-delimited `collections` list?
    * The reference checks delimiter boundaries around a single
    * `indexOf` hit (MetaManagerItemSearcher.java:72-82), which can
    * false-negative when an earlier list entry merely CONTAINS the id
    * (e.g. id `web` in `xweb;web`); this implements the documented
    * intent — exact token membership. */
  private[graft] def inCollection(id: String, collections: String): Boolean =
    collections != null && collections.split(';').contains(id)

  /** MetaManager protocol (MetaManagerItemSearcher.java:86-99,192-218):
    * `off=`/`lim=` paging with NO total anywhere in the response —
    * advance by the page's row count, stop on a missing/empty page.
    * Response rows are positional arrays in `fs_*` parameter order:
    * `[identifier, mediatype, collection, publicdate]`; client-side
    * filtering drops `mediatype=collection` rows and rows not actually
    * in the queried collection; `publicdate` is an SQL datetime. */
  final class MetaManagerItemSearcher(
      baseUrl: String, rowsPerPage: Int = 200,
      fetch: String => String = httpFetch) extends ItemSearcher {

    private def pageUrl(collId: String, off: Int): String =
      s"$baseUrl/metamgr.php?srt=identifier&ord=asc" +
        s"&w_collection=${qenc(s"*$collId*")}" +
        "&fs_identifier=on&fs_mediatype=on&fs_collection=on" +
        s"&off=$off&lim=$rowsPerPage&output_format=json"

    override def searchItems(collId: String): Seq[ItemStatus] = {
      val out = Seq.newBuilder[ItemStatus]
      var off = 0
      // terminate only on an EMPTY/missing page, as the reference does
      // (it stops when the 'rows' key is absent) — stopping on a merely
      // SHORT page would silently truncate if the server ever caps lim
      // below the requested page size or returns a transient short page.
      // (A pathological server replaying the same nonempty page no
      // matter the off= would loop; the reference shares that behavior,
      // and a well-formed metamgr always drains to an empty page.)
      var lastPage = -1
      while (lastPage != 0) {
        val rows = mapper.readTree(fetch(pageUrl(collId, off)))
          .path("rows")
        lastPage = if (rows.isArray) rows.size() else 0
        var i = 0
        while (i < rows.size()) {
          val r = rows.get(i)
          if (r != null && r.isArray && r.size() >= 3) {
            val id = r.get(0).asText(null)
            val mediatype = r.get(1).asText(null)
            val colls = r.get(2).asText(null)
            if (id != null && mediatype != "collection" &&
                inCollection(collId, colls)) {
              val publicdate =
                if (r.size() > 3) r.get(3).asText(null) else null
              out += ItemStatus(id, sqlDateTimeToMs(publicdate))
            }
          }
          i += 1
        }
        // the reference advances by rows.length, not by lim
        // (MetaManagerItemSearcher.java:218)
        off += lastPage
      }
      out.result()
    }
  }

  /** Collection-index protocol: one unpaged GET returning the item list. */
  final class CollectionIndexItemSearcher(
      baseUrl: String, fetch: String => String = httpFetch)
      extends ItemSearcher {

    override def searchItems(collId: String): Seq[ItemStatus] = {
      val root =
        mapper.readTree(fetch(s"$baseUrl/getitems.php?c=${qenc(collId)}"))
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
