package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * CDXJ — pywb's JSON CDX line format (beyond-reference surface: the
 * reference emits only space-delimited CDX-11, but the ecosystem its
 * users run today indexes with CDXJ): `urlkey timestamp {json}` per
 * line, sorted by (urlkey, timestamp) exactly like CDX-11, with every
 * remaining field carried as a STRING value in a JSON object under
 * pywb's key names. Null fields are OMITTED from the object (the pywb
 * convention — and the lossless fix for the class of values CDX-11's
 * 11-slot split corrupts, e.g. a redirect URL with an embedded space:
 * the JSON block carries it verbatim).
 *
 * Both directions are PURE BUILTIN column expressions (`to_json` /
 * `get_json_object` / `split` — the F4/F5 tier): fully codegen'd, no
 * UDF, and an external engine with JSON functions replays them.
 */
object CdxJ {

  /** pywb JSON field order (also the emitted key order — `to_json`
    * renders struct fields in declaration order). */
  val JsonFields: Seq[String] = Seq("url", "mime", "status", "digest",
    "redirect", "flags", "length", "offset", "filename")

  /** Render parsed CDX columns ([[Cdx.schema]]'s 11) to one CDXJ line.
    * All JSON values are strings (pywb types everything as text);
    * nulls vanish from the object (Spark's `to_json` omits null
    * struct fields — exactly the wanted semantics). */
  def formatLine(urlkey: Column, timestamp: Column, originalUrl: Column,
                 mimetype: Column, statuscode: Column, digest: Column,
                 redirectUrl: Column, metaFlags: Column,
                 compressedSize: Column, offset: Column,
                 filename: Column): Column =
    concat_ws(" ", urlkey, timestamp, to_json(struct(
      originalUrl.cast("string").as("url"),
      mimetype.cast("string").as("mime"),
      statuscode.cast("string").as("status"),
      digest.cast("string").as("digest"),
      redirectUrl.cast("string").as("redirect"),
      metaFlags.cast("string").as("flags"),
      compressedSize.cast("string").as("length"),
      offset.cast("string").as("offset"),
      filename.cast("string").as("filename"))))

  /** Parse one CDXJ line back to the [[Cdx.schema]] columns, typed
    * like the CDX-11 parse (INT status, LONG length/offset; a
    * non-numeric value degrades to NULL through `try_cast` — the same
    * tolerance [[Cdx.parse]] applies to its slots, and under Spark 4's
    * ANSI default a plain cast would ABORT the job on one bad line).
    * The split is limit-3 on spaces, so spaces INSIDE the JSON block
    * (the redirect class) never shift fields. */
  def parseCols(line: Column): Seq[Column] = {
    val sp = split(line, " ", 3)
    // get(), not getItem(): under Spark 4's ANSI default getItem ABORTS
    // the whole job when a line has fewer than 3 tokens — one malformed
    // line must degrade to nulls, never kill a corpus-scale scan
    val js = get(sp, lit(2))
    def f(k: String) = get_json_object(js, s"$$.$k")
    Seq(
      get(sp, lit(0)).as("urlkey"),
      get(sp, lit(1)).as("timestamp"),
      f("url").as("original_url"),
      f("mime").as("mimetype"),
      f("status").try_cast("int").as("statuscode"),
      f("digest").as("digest"),
      f("redirect").as("redirect_url"),
      f("flags").as("meta_flags"),
      f("length").try_cast("long").as("compressed_size"),
      f("offset").try_cast("long").as("offset"),
      f("filename").as("filename"))
  }
}
