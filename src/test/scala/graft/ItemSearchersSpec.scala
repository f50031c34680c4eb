package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ItemSearchers
import graft.sources.ItemSearchers._

/** Protocol tests for the three Petabox item-discovery strategies
  * (fixture transport — the searchers are pure protocol over `fetch`). */
class ItemSearchersSpec extends AnyFunSuite {

  test("search-engine searcher pages until numFound, carries publicdate") {
    // 5 items, 2 per page → 3 fetches; the fetch log proves the paging
    val fetched = scala.collection.mutable.ArrayBuffer.empty[String]
    def fixture(url: String): String = {
      fetched += url
      val start = "start=(\\d+)".r.findFirstMatchIn(url).get.group(1).toInt
      val docs = (start until math.min(start + 2, 5)).map(i =>
        s"""{"identifier":"item$i","publicdate":"2020-01-0${i + 1}T00:00:00Z"}""")
      s"""{"response":{"numFound":5,"docs":[${docs.mkString(",")}]}}"""
    }
    val got = new SearchEngineItemSearcher("http://svc", rowsPerPage = 2,
      fetch = fixture).searchItems("web")
    assert(got.map(_.identifier) == (0 until 5).map(i => s"item$i"))
    // collId rides the query string URL-encoded (':' → %3A)
    assert(fetched.size == 3 &&
      fetched.forall(_.contains("q=collection%3Aweb")))
    assert(got.head.mtimeMs ==
      java.time.Instant.parse("2020-01-01T00:00:00Z").toEpochMilli)
  }

  test("metamanager searcher: reference wire protocol (off/lim, rows arrays, filtering)") {
    // 7 matching rows served 3 per page as positional arrays
    // [identifier, mediatype, collection, publicdate]; page 2 also smuggles
    // in a mediatype=collection row and a wildcard over-match that the
    // CLIENT must drop (MetaManagerItemSearcher.java:199-217) — and those
    // dropped rows still count toward the off= advance (:218)
    val fetched = scala.collection.mutable.ArrayBuffer.empty[String]
    def fixture(url: String): String = {
      fetched += url
      val off = "off=(\\d+)".r.findFirstMatchIn(url).get.group(1).toInt
      val all =
        (0 until 7).map(i =>
          s"""["m$i","texts","a;web;b","2021-02-0${i + 1} 04:05:06"]""") ++
          Seq("""["thecoll","collection","web",null]""",
            """["decoy","texts","xweb","2021-02-09 00:00:00"]""")
      val page = all.slice(off, off + 3)
      s"""{"rows":[${page.mkString(",")}]}"""
    }
    val got = new MetaManagerItemSearcher("http://svc", rowsPerPage = 3,
      fetch = fixture).searchItems("web")
    assert(got.map(_.identifier) == (0 until 7).map(i => s"m$i"))
    assert(got.head.mtimeMs == ItemSearchers.sqlDateTimeToMs("2021-02-01 04:05:06"))
    // 9 rows at 3/page = 3 full pages + 1 empty terminator
    assert(fetched.size == 4)
    assert(fetched.head.contains("metamgr.php") &&
      fetched.head.contains("srt=identifier") &&
      fetched.head.contains("ord=asc") &&
      fetched.head.contains("w_collection=*web*") &&
      fetched.head.contains("off=0") && fetched.head.contains("lim=3") &&
      fetched.head.contains("output_format=json"))
    assert(fetched(1).contains("off=3") && fetched(3).contains("off=9"))
  }

  test("inCollection: exact semicolon-token membership") {
    assert(ItemSearchers.inCollection("web", "web"))
    assert(ItemSearchers.inCollection("web", "a;web;b"))
    assert(ItemSearchers.inCollection("web", "xweb;web"))
    assert(!ItemSearchers.inCollection("web", "xweb"))
    assert(!ItemSearchers.inCollection("web", "webx;a"))
    assert(!ItemSearchers.inCollection("web", null))
  }

  test("date parsing matches the reference's SimpleDateFormat exactly") {
    val base = java.time.Instant.parse("2021-02-03T04:05:06Z").toEpochMilli
    assert(ItemSearchers.isoToMs("2021-02-03T04:05:06Z") == base)
    // trailing junk AFTER the full pattern parses in the reference
    assert(ItemSearchers.isoToMs("2021-02-03T04:05:06Ztrailing") == base)
    // but the pattern's 'Z' literal must sit right after seconds — the
    // reference rejects fractional seconds and a missing Z (→ 0)
    assert(ItemSearchers.isoToMs("2021-02-03T04:05:06.123Z") == 0L)
    assert(ItemSearchers.isoToMs("2021-02-03T04:05:06") == 0L)
    assert(ItemSearchers.sqlDateTimeToMs("2021-02-03 04:05:06") == base)
    assert(ItemSearchers.sqlDateTimeToMs("2021-02-03 04:05:06 extra") == base)
    assert(ItemSearchers.sqlDateTimeToMs("2021-02-03T04:05:06") == 0L)
    assert(ItemSearchers.sqlDateTimeToMs(null) == 0L)
  }

  test("metamanager continues past a short nonempty page (server-capped lim)") {
    // server caps lim at 2 despite rowsPerPage=5: pages of 2,2,1,0 —
    // a short NONEMPTY page must not terminate the loop (the reference
    // stops only when 'rows' is missing)
    val fetched = scala.collection.mutable.ArrayBuffer.empty[Int]
    def fixture(url: String): String = {
      val off = "off=(\\d+)".r.findFirstMatchIn(url).get.group(1).toInt
      fetched += off
      val all = (0 until 5).map(i =>
        s"""["m$i","texts","web","2021-02-0${i + 1} 04:05:06"]""")
      s"""{"rows":[${all.slice(off, off + 2).mkString(",")}]}"""
    }
    val got = new MetaManagerItemSearcher("http://svc", rowsPerPage = 5,
      fetch = fixture).searchItems("web")
    assert(got.map(_.identifier) == (0 until 5).map(i => s"m$i"))
    assert(fetched.toSeq == Seq(0, 2, 4, 5))
  }

  test("hostile collection ids are URL-encoded, not spliced raw") {
    var url = ""
    def fixture(u: String): String = { url = u; """{"rows":[]}""" }
    new MetaManagerItemSearcher("http://svc", fetch = fixture)
      .searchItems("a&b #c")
    assert(url.contains("w_collection=%2Aa%26b+%23c%2A") ||
      url.contains("w_collection=*a%26b+%23c*"))
    assert(!url.contains("a&b"))
  }

  test("cookie auth rejects un-encoded separator characters") {
    intercept[IllegalArgumentException] {
      ItemSearchers.AuthProvider.cookies("k" -> "v;injected=1")
    }
  }

  test("auth provider threads cookies through the transport") {
    // fixture transport records headers the way an HTTP server would see
    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, Map[String, String])]
    val auth = ItemSearchers.AuthProvider.cookies(
      "logged-in-user" -> "u@example.org", "logged-in-sig" -> "s3cr3t")
    def transport(url: String): String = {
      seen += ((url, auth.authHeaders(url)))
      """{"rows":[]}"""
    }
    new MetaManagerItemSearcher("http://svc",
      fetch = transport).searchItems("web")
    assert(seen.size == 1)
    assert(seen.head._2("Cookie") ==
      "logged-in-user=u@example.org; logged-in-sig=s3cr3t")
  }

  test("collection-index searcher: single unpaged GET, bare-string items ok") {
    def fixture(url: String): String = {
      assert(url == "http://svc/getitems.php?c=wide")
      """["a","b","c"]"""
    }
    val got = new CollectionIndexItemSearcher("http://svc", fetch = fixture)
      .searchItems("wide")
    assert(got.map(_.identifier) == Seq("a", "b", "c"))
  }

  test("search-engine searcher terminates on an empty page despite a huge numFound") {
    var fetches = 0
    def lying(url: String): String = {
      fetches += 1
      """{"response":{"numFound":1000000000,"docs":[]}}"""
    }
    val got = new SearchEngineItemSearcher("http://svc", rowsPerPage = 200,
      fetch = lying).searchItems("web")
    assert(got.isEmpty && fetches == 1)
  }

  test("unparseable publicdate maps to 0 (reference behavior)") {
    assert(ItemSearchers.isoToMs("not-a-date") == 0L)
    assert(ItemSearchers.isoToMs("") == 0L)
  }

  test("parallel fetch preserves order and really runs concurrently") {
    val gate = new java.util.concurrent.CountDownLatch(4)
    val got = ItemSearchers.fetchParallel((1 to 4).map(_.toString), 4) { id =>
      gate.countDown()
      // deadlocks (test timeout) unless all 4 run at once
      assert(gate.await(10, java.util.concurrent.TimeUnit.SECONDS))
      id.toInt * 10
    }
    assert(got == Seq(10, 20, 30, 40))
  }
}
