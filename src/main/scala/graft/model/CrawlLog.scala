package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Heritrix crawl-log reader (SURVEY §2 S4).
 *
 * Schema and field semantics from
 * /root/reference/src/main/java/org/archive/hadoop/pig/CrawlLogLoader.java:47-93:
 * whitespace-delimited, ≥12 tokens; field 2 (size) forced to -1 when not all
 * digits; field 8 ("starttime+duration") split on the first '+' into two
 * fields, both null when it is "-" (crawl exclusion).
 *
 * Spark-first: a declarative projection over a LF text scan — `split` +
 * `element_at` stay inside whole-stage codegen; no UDF, no RDD.
 */
object CrawlLog {

  val fieldNames: Seq[String] = Seq(
    "log_ts", "status", "size", "uri", "discovery_path", "via_uri",
    "content_type", "thread", "fetch_start", "fetch_duration",
    "content_hash", "source_tag", "annotations")

  /** Read crawl-log text file(s) into the 13-column table; lines with fewer
    * than 12 tokens are dropped (CrawlLogLoader.java:60-61). */
  def read(spark: SparkSession, path: String): DataFrame =
    fromLines(spark.read.text(path))

  /** Same projection over any single-column DataFrame of lines.
    *
    * Tokenization is the native [[graft.functions.WsSplitRowsExpression]]
    * — ONE regex-free byte scan, byte-exact to the reference's
    * `line.split("\\s+")` after its single-trailing-CR strip
    * (CrawlLogLoader.java:44-60), emitted THROUGH `explode` as a
    * 0-or-1-row generator so the short-line drop needs no Filter
    * operator: a `where(size(toks) >= 12)` predicate was being pushed
    * below the staging projection (and below the caller's line-render
    * projection), re-evaluating split AND render once in the Filter and
    * again in the Project — the generator shape evaluates line → tokens
    * exactly once per row (q17 0.80 → 0.5x s min-of-3; table in the
    * SparkEntry gate note). The token array lands as a real Generate
    * output attribute, so the 13-column projection reads a slot, never
    * re-splits. The earlier declarative history still holds:
    * `split(trim(regexp_replace(...)))` was 2.2x slower and unfaithful
    * on edge-whitespace; a `when`-guarded literal-split fast path 2.4x
    * (conditional branches are excluded from codegen subexpression
    * elimination). */
  def fromLines(lines: DataFrame): DataFrame = {
    val c = lines.columns.head
    lines
      .select(explode(
        graft.functions.TextFunctions.wsSplitRows(col(c), 12)).as("__toks"))
      .select(projectTokens(col("__toks")): _*)
  }

  /** Column projection given the pre-split token array (1-based fields). */
  def projectTokens(f: Column): Seq[Column] = {
    def fld(i: Int) = element_at(f, i + 1)
    // all-digits check without the regex machinery: translate deletes
    // every digit, so an empty result on a non-empty field ⇔ ^\d+$ —
    // one codegen'd byte pass instead of a per-row Pattern match (the
    // same regex-ectomy as wsSplit, A/B'd in-gate: q17 0.80 → see
    // SparkEntry q17 note)
    val digits = fld(2) =!= "" &&
      translate(fld(2), "0123456789", "") === ""
    val sizeCol = when(digits, fld(2)).otherwise(lit("-1"))
      .cast("long")
    val col8 = fld(8)
    val plusIdx = instr(col8, "+")
    val fetchStart = when(col8 === "-", lit(null).cast("string"))
      .otherwise(when(plusIdx > 0, col8.substr(lit(1), plusIdx - 1))
        .otherwise(col8))
    val fetchDuration = when(plusIdx > 0,
      col8.substr(plusIdx + 1, length(col8))).otherwise(lit(null).cast("string"))
    Seq(
      fld(0).as("log_ts"),
      fld(1).cast("int").as("status"),
      sizeCol.as("size"),
      fld(3).as("uri"),
      fld(4).as("discovery_path"),
      fld(5).as("via_uri"),
      fld(6).as("content_type"),
      fld(7).as("thread"),
      fetchStart.as("fetch_start"),
      fetchDuration.as("fetch_duration"),
      fld(9).as("content_hash"),
      fld(10).as("source_tag"),
      fld(11).as("annotations")
    )
  }
}
