package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scalar-function surface of the engine (SURVEY.md §2.6).
 *
 * Everything that Spark's built-in, codegen'd functions can express is a
 * `Column` helper (F3/F4/F5/F8/F9); only SURT canonicalization (F1/F2) and
 * URL resolution (F7) need Scala UDFs, registered once per session via
 * [[register]].
 */
object CdxFunctions {

  /** F3 — yyyyMMddHHmmss[SSS] (UTC) → TIMESTAMP. Null-in → null-out, like
    * /root/reference/.../pig/udf/DateTime14ToTimestamp.java:33-40. */
  def timestamp14ToTs(c: Column): Column =
    when(length(c) === 17,
      to_timestamp(c, "yyyyMMddHHmmssSSS"))
    .otherwise(to_timestamp(c, "yyyyMMddHHmmss"))

  /** F3 variant returning epoch milliseconds (the Pig UDF's Long surface). */
  def timestamp14ToMillis(c: Column): Column =
    (unix_timestamp(timestamp14ToTs(c)) * 1000L +
      when(length(c) === 17, substring(c, 15, 3).cast("long")).otherwise(0L))

  /** F8 — day part of a 14-digit timestamp (first 8 chars), as used by the
    * per-(url,day) cap: GlobalWaybackCDXReducer.java:33-38. */
  def dayPart(ts14: Column): Column = substring(ts14, 1, 8)

  /** F9 — digest truncation to 3 chars for "global" CDX:
    * GlobalWaybackCDXReducer.java:130-132. */
  def digestTrunc(digest: Column): Column =
    when(length(digest) > 3, substring(digest, 1, 3)).otherwise(digest)

  /** F4 — JSON text → MAP<STRING,STRING> (FromJsonFunc.java:19-56). */
  def fromJsonMap(c: Column): Column =
    from_json(c, org.apache.spark.sql.types.MapType(
      org.apache.spark.sql.types.StringType,
      org.apache.spark.sql.types.StringType))

  /** F7 — (context-url, base-url, relative) → absolute URL. Semantics pinned
    * by /root/reference/src/test/java/org/archive/hadoop/func/URLResolverFuncTest.java:5-46:
    * resolve against `base` when present, else against `context`. */
  def resolveUrl(context: String, base: String, rel: String): String = {
    if (rel == null) return null
    val against = if (base != null && base.nonEmpty) base else context
    if (against == null || against.isEmpty) return rel
    try {
      val resolved = new java.net.URI(against).resolve(rel)
      resolved.toString
    } catch { case _: Exception => rel }
  }

  /** Register the UDF surface (SQL `surt` itself comes from
    * [[graft.GraftExtensions]] as a native expression — see surtCol). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("url_resolve",
      (c: String, b: String, r: String) => resolveUrl(c, b, r))
    spark.udf.register("cdx_format",
      (line: String) => graft.model.Cdx.parseLine(line).map(graft.model.Cdx.formatLine).orNull)
  }

  /** F1/F2 as a Column — the NATIVE Catalyst expression (codegen'd; stays
    * inside whole-stage codegen, unlike a UDF). */
  def surtCol(c: Column): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      graft.functions.SurtExpression(
        org.apache.spark.sql.graftshim.ColumnShim.expression(c)))
}
