package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.ItemMetadata

/** §1.5 petabox item-metadata JSON: string-or-list normalization, file
  * array typing, addeddate epoch, empty-object drop. Fixture is
  * synthesized in the reference's shape (metadata-regular.json layout). */
class ItemMetadataSpec extends AnyFunSuite with SparkTestSession {

  private val multiCollection =
    """{"created":1500000000,"d1":"n1.example.org","d2":"n2.example.org",
      |"dir":"/3/items/testitem","server":"n2.example.org",
      |"updated":1500100000,"item_size":12345,"files_count":2,
      |"files":[
      | {"name":"a_meta.txt","source":"original","format":"Metadata",
      |  "mtime":"1400000000","size":"100","md5":"aa","crc32":"bb","sha1":"cc"},
      | {"name":"a.warc.gz","source":"original","format":"WARC",
      |  "mtime":"1400000500","size":"9000","md5":"dd","private":"true"}],
      |"metadata":{"identifier":"testitem","mediatype":"collection",
      | "collection":["colA","colB"],"public-format":["Metadata","WARC"],
      | "addeddate":"2012-08-24 18:55:37","title":"A test item"}}"""
      .stripMargin.replace("\n", "")

  private val singleCollection =
    """{"server":"n9.example.org","metadata":{"identifier":"solo1",
      |"mediatype":"texts","collection":"justone"}}"""
      .stripMargin.replace("\n", "")

  test("parse: scalars, files array, metadata normalization") {
    val r = ItemMetadata.parseOne(multiCollection).get
    assert(r.identifier.contains("testitem"))
    assert(r.mediatype.contains("collection"))
    assert(r.collection == Seq("colA", "colB"))
    assert(r.server.contains("n2.example.org"))
    assert(r.created.contains(1500000000L))
    assert(r.item_size.contains(12345L))
    assert(r.files_count.contains(2L))
    // addeddate "2012-08-24 18:55:37" UTC → epoch millis
    assert(r.addeddate_ms.contains(1345834537000L))
    assert(r.files.size == 2)
    assert(r.files(0).name.contains("a_meta.txt"))
    assert(r.files(0).mtime.contains(1400000000L))
    assert(r.files(0).is_private.isEmpty)
    assert(r.files(1).is_private.contains(true))
    // every metadata value is normalized to a list
    assert(r.properties("title") == Seq("A test item"))
    assert(r.properties("public-format") == Seq("Metadata", "WARC"))
  }

  test("single-string collection normalizes to a one-element list") {
    val r = ItemMetadata.parseOne(singleCollection).get
    assert(r.collection == Seq("justone"))
    assert(r.mediatype.contains("texts"))
  }

  test("empty + malformed objects drop (counted); distributed parse typed") {
    import spark.implicits._
    val ds = Seq(multiCollection, "{}", "<html>503 backend error",
      """{"files":[""", singleCollection).toDS()
    val (parsed, bad) = ItemMetadata.parse(spark, ds)
    val rows = parsed.collect()
    assert(rows.length == 2)
    assert(bad.value == 2) // the two malformed docs; "{}" is valid-but-empty
    val byId = rows.flatMap(r => r.identifier.map(_ -> r)).toMap
    assert(byId("testitem").files.map(_.name.get).sorted ==
      Seq("a.warc.gz", "a_meta.txt"))
    assert(byId("solo1").collection == Seq("justone"))
  }
}
