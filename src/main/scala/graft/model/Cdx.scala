package graft.model

import org.apache.spark.sql.types._

/**
 * The CDX capture record — the central "table" of the engine.
 *
 * CDX-11 layout ("N b a m s k r M S V g"): one single-space-delimited line per
 * archived capture, sorted by (urlkey, timestamp). `-` encodes NULL.
 * Reference: /root/reference/src/main/java/org/archive/hadoop/pig/CDXLoader.java:29-41
 * (column naming) and :91-113 (11-slot split).
 *
 * Numeric columns are typed here (LONG size/offset, INT statuscode) rather than
 * kept as strings; the raw 14-digit timestamp string is preserved as the sort
 * key (byte ordering == chronological ordering), with a derived TIMESTAMP
 * available via [[graft.functions.CdxFunctions.timestamp14ToTs]].
 */
final case class CdxRecord(
    urlkey: String,
    timestamp: String,
    originalUrl: String,
    mimetype: String,
    statuscode: Option[Int],
    digest: String,
    redirectUrl: Option[String],
    metaFlags: Option[String],
    compressedSize: Option[Long],
    offset: Option[Long],
    filename: String
)

object Cdx {

  /** Spark schema of the parsed CDX-11 table. */
  val schema: StructType = StructType(Seq(
    StructField("urlkey", StringType, nullable = false),
    StructField("timestamp", StringType, nullable = false),
    StructField("original_url", StringType, nullable = true),
    StructField("mimetype", StringType, nullable = true),
    StructField("statuscode", IntegerType, nullable = true),
    StructField("digest", StringType, nullable = true),
    StructField("redirect_url", StringType, nullable = true),
    StructField("meta_flags", StringType, nullable = true),
    StructField("compressed_size", LongType, nullable = true),
    StructField("offset", LongType, nullable = true),
    StructField("filename", StringType, nullable = true)
  ))

  val columnNames: Seq[String] = schema.fields.map(_.name).toSeq

  /** Header line emitted by the reference's jobs.
    * /root/reference/src/main/java/org/archive/hadoop/mapreduce/CDXMapper.java:21-22 */
  val Header = " CDX N b a m s k r M S V g"

  @inline private def nullable(s: String): String =
    if (s == "-" || s.isEmpty) null else s

  /**
   * Parse one CDX-11 line into its 11 string cells, or None for header /
   * blank / malformed (fewer than 11 fields) lines.
   *
   * Faithful to CDXLoader.getNext (CDXLoader.java:74-119): lines with MORE
   * than 11 fields have the extra spaces merged into the redirect field
   * (slot 6) — legacy CDX writers did not escape spaces in redirect URLs.
   * A single trailing CR is stripped (redirect URLs may embed interior CRs,
   * which are preserved — the reader splits on LF only).
   */
  def splitLine(line0: String): Option[Array[String]] = {
    var line = line0
    if (line.nonEmpty && line.charAt(line.length - 1) == '\r')
      line = line.substring(0, line.length - 1)
    if (line.isEmpty || line.startsWith(" CDX ")) return None

    // Positions of the 10 delimiting spaces; when an 11th space shows up,
    // drop the one after the redirect field (index 6+1) and shift — this
    // merges the surplus token into redirect_url, exactly like
    // CDXLoader.java:95-102.
    val spidx = new Array[Int](10)
    var j = 0
    var i = 0
    val n = line.length
    while (i < n) {
      if (line.charAt(i) == ' ') {
        if (j == spidx.length) {
          System.arraycopy(spidx, 7, spidx, 6, spidx.length - 7)
          j -= 1
        }
        spidx(j) = i
        j += 1
      }
      i += 1
    }
    if (j < spidx.length) return None
    val cells = new Array[String](11)
    var s = 0
    var k = 0
    while (k < 10) {
      cells(k) = nullable(line.substring(s, spidx(k)))
      s = spidx(k) + 1
      k += 1
    }
    cells(10) = nullable(line.substring(s))
    Some(cells)
  }

  /** Parse a CDX-11 line to a typed record; None for header/blank/malformed
    * lines. Non-numeric statuscode/size/offset become None (the reference
    * validates with parseInt/parseLong at use sites —
    * GlobalWaybackMergeMapper.java:106-130). */
  def parseLine(line: String): Option[CdxRecord] =
    splitLine(line).map { c =>
      CdxRecord(
        urlkey = c(0),
        timestamp = c(1),
        originalUrl = c(2),
        mimetype = c(3),
        statuscode = Option(c(4)).flatMap(_.toIntOption),
        digest = c(5),
        redirectUrl = Option(c(6)),
        metaFlags = Option(c(7)),
        compressedSize = Option(c(8)).flatMap(_.toLongOption),
        offset = Option(c(9)).flatMap(_.toLongOption),
        filename = c(10)
      )
    }

  /**
   * Convert a legacy CDX-9/10 line to the 11-field layout, re-keyed with a
   * freshly canonicalized SURT. Port of the semantics of CDXMapper.convert
   * (/root/reference/.../mapreduce/CDXMapper.java:72-135):
   *   - 9 fields: no meta_flags, offset at 7;  10 fields: meta_flags at 7.
   *   - scheme-less original URL → "http://" + original key (:104-109)
   *   - optional drop of noarchive rows (meta flags contain 'A')
   *   - redirect blanked when noRedirect (reference default, :99)
   *   - compressed_size unknown → null ("-")
   */
  def convertLegacy(
      line: String,
      omitNoArchive: Boolean = false,
      noRedirect: Boolean = true,
      keyMaker: String => String = graft.functions.Surt.surt
  ): Option[CdxRecord] = {
    if (line.startsWith(" CDX ")) return None
    // CRLF input: explicit lineSep="\n" readers keep the '\r' (splitLine
    // strips it too — without this, filename gets a trailing CR)
    val parts = (if (line.nonEmpty && line.last == '\r') line.dropRight(1)
                 else line).split(" ")
    val (offsetIdx, metaFlags) =
      if (parts.length == 9) (7, None)
      else if (parts.length == 10) (7 + 1, Some(parts(7)).filter(_ != "-"))
      else return None
    if (omitNoArchive && metaFlags.exists(_.contains("A"))) return None

    var origUrl = parts(2)
    // hostname-only field: repair with http:// + original key
    if (!origUrl.contains("://")) origUrl = "http://" + parts(0)
    val urlKey =
      try keyMaker(origUrl)
      catch { case _: Exception => origUrl }
    Some(CdxRecord(
      urlkey = urlKey,
      timestamp = parts(1),
      originalUrl = origUrl,
      mimetype = nullable(parts(3)),
      statuscode = nullable(parts(4)) match {
        case null => None; case s => s.toIntOption
      },
      digest = nullable(parts(5)),
      redirectUrl = if (noRedirect) None else Option(nullable(parts(6))),
      metaFlags = metaFlags,
      compressedSize = None,
      offset = nullable(parts(offsetIdx)) match {
        case null => None; case s => s.toLongOption
      },
      filename = nullable(parts(offsetIdx + 1))
    ))
  }

  /** Render a record back to its CDX-11 line (nulls → "-"). */
  def formatLine(r: CdxRecord): String = {
    def s(v: Any): String = v match {
      case null | None => "-"
      case Some(x)     => x.toString
      case x           => x.toString
    }
    Seq(
      s(r.urlkey), s(r.timestamp), s(r.originalUrl), s(r.mimetype),
      s(r.statuscode), s(r.digest), s(r.redirectUrl), s(r.metaFlags),
      s(r.compressedSize), s(r.offset), s(r.filename)
    ).mkString(" ")
  }
}
