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
    assert(fetched.size == 3 && fetched.forall(_.contains("q=collection:web")))
    assert(got.head.mtimeMs ==
      java.time.Instant.parse("2020-01-01T00:00:00Z").toEpochMilli)
  }

  test("metamanager searcher stops on a short page (no total in response)") {
    def fixture(url: String): String = {
      val start = "start=(\\d+)".r.findFirstMatchIn(url).get.group(1).toInt
      val rows = (start until math.min(start + 3, 7)).map(i =>
        s"""{"identifier":"m$i","updated":"2021-02-03T04:05:06Z"}""")
      s"[${rows.mkString(",")}]"
    }
    val got = new MetaManagerItemSearcher("http://svc", rowsPerPage = 3,
      fetch = fixture).searchItems("web")
    assert(got.map(_.identifier) == (0 until 7).map(i => s"m$i"))
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
