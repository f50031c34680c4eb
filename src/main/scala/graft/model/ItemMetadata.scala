package graft.model

import org.apache.spark.sql.{Dataset, SparkSession}

/**
 * Petabox item-metadata JSON (SURVEY §1.5;
 * /root/reference/src/main/java/org/archive/petabox/ItemMetadata.java:110-193,
 * ItemFile.java): scalar item fields, a `files` array of file dicts, and a
 * loosely-typed `metadata` object whose values are STRING-OR-LIST
 * (`collection` is a bare string for single membership, a list otherwise —
 * ItemMetadata.java:131-147). That irregularity defeats a fixed
 * `spark.read.json` schema, so rows parse per-partition with Jackson
 * (already on Spark's classpath) and normalize every metadata value to a
 * list — the reference's normalization, applied to ALL keys.
 *
 * The metadata API returns `{}` for a missing/desynced item
 * (ItemMetadata.java:111-115); those parse to None and are dropped.
 */
object ItemMetadata {

  final case class ItemFileRow(
      name: Option[String], source: Option[String], format: Option[String],
      original: Option[String], mtime: Option[Long], size: Option[Long],
      md5: Option[String], crc32: Option[String], sha1: Option[String],
      is_private: Option[Boolean])

  final case class ItemRow(
      identifier: Option[String], mediatype: Option[String],
      collection: Seq[String], server: Option[String],
      d1: Option[String], d2: Option[String], dir: Option[String],
      created: Option[Long], updated: Option[Long],
      addeddate_ms: Option[Long], item_size: Option[Long],
      files_count: Option[Long], solo: Option[Boolean],
      properties: Map[String, Seq[String]], files: Seq[ItemFileRow])

  // thread-safe, immutable — shared across rows instead of per-call build
  private val AddedDateFormat =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  /** `yyyy-MM-dd HH:mm:ss` (UTC) → epoch millis (ItemMetadata.java:98-107;
    * unparseable → None, where the reference returns 0). */
  def parseDateMs(s: String): Option[Long] =
    try Some(java.time.LocalDateTime.parse(s, AddedDateFormat)
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
    catch { case _: Exception => None }

  def parseOne(json: String): Option[ItemRow] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    parseNode(mapper.readTree(json))
  }

  private def parseNode(
      root: com.fasterxml.jackson.databind.JsonNode): Option[ItemRow] = {
    import com.fasterxml.jackson.databind.JsonNode
    if (root == null || !root.isObject || root.isEmpty) return None
    def str(n: JsonNode, k: String): Option[String] =
      Option(n.get(k)).filter(!_.isNull).map(_.asText())
    def lng(n: JsonNode, k: String): Option[Long] =
      str(n, k).flatMap(_.toLongOption)
    def bool(n: JsonNode, k: String): Option[Boolean] =
      Option(n.get(k)).filter(!_.isNull).map(v =>
        v.isBoolean && v.asBoolean() || v.isTextual && v.asText() == "true")
    def strings(v: JsonNode): Seq[String] =
      if (v == null || v.isNull) Nil
      else if (v.isArray)
        (0 until v.size()).map(i => v.get(i).asText())
      else Seq(v.asText())

    val md = Option(root.get("metadata")).filter(_.isObject)
    val props: Map[String, Seq[String]] = md match {
      case None => Map.empty
      case Some(m) =>
        val it = m.fields()
        val b = Map.newBuilder[String, Seq[String]]
        while (it.hasNext) { val e = it.next(); b += e.getKey -> strings(e.getValue) }
        b.result()
    }
    val files: Seq[ItemFileRow] = Option(root.get("files")).toSeq
      .filter(_.isArray)
      .flatMap(arr => (0 until arr.size()).map(arr.get))
      .filter(_.isObject)
      .map { f =>
        ItemFileRow(str(f, "name"), str(f, "source"), str(f, "format"),
          str(f, "original"), lng(f, "mtime"), lng(f, "size"),
          str(f, "md5"), str(f, "crc32"), str(f, "sha1"),
          bool(f, "private"))
      }
    Some(ItemRow(
      identifier = props.get("identifier").flatMap(_.headOption),
      mediatype = props.get("mediatype").flatMap(_.headOption),
      collection = props.getOrElse("collection", Nil),
      server = str(root, "server"),
      d1 = str(root, "d1"), d2 = str(root, "d2"), dir = str(root, "dir"),
      created = lng(root, "created"), updated = lng(root, "updated"),
      addeddate_ms = props.get("addeddate").flatMap(_.headOption)
        .flatMap(parseDateMs),
      item_size = lng(root, "item_size"),
      files_count = lng(root, "files_count"),
      solo = bool(root, "solo"),
      properties = props, files = files))
  }

  /** One JSON document per input string → typed item rows. `{}` (missing
    * item) and MALFORMED documents (truncated response, HTML error page)
    * both drop instead of failing the job — malformed-input tolerance is
    * the point of the `{}` contract; the accumulator reports how many. */
  def parse(spark: SparkSession, jsons: Dataset[String])
      : (Dataset[ItemRow], org.apache.spark.util.LongAccumulator) = {
    import spark.implicits._
    val bad = spark.sparkContext.longAccumulator("itemmeta.bad.docs")
    val rows = jsons.mapPartitions { it =>
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      it.flatMap { j =>
        val node = try Option(mapper.readTree(j))
                   catch { case _: Exception => bad.add(1); None }
        node match {
          case Some(n) if n.isObject => parseNode(n) // {} → None, NOT bad
          case Some(_) => bad.add(1); None // bare string/number/array body
          case None => None // already counted
        }
      }
    }
    (rows, bad)
  }
}
