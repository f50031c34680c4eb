package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Non-capture record filter (SURVEY §2 O3) — drop CDX header lines and
 * dns: / filedesc: / warcinfo: pseudo-capture keys from a CDX stream
 * (/root/reference/src/main/java/org/archive/hadoop/streaming/CdxFilterMap.java:11-41).
 * Pure predicate → codegen'd, pushes into parquet scans.
 */
object CdxFilter {

  val DroppedPrefixes: Seq[String] = Seq("dns:", "filedesc:", "warcinfo:")

  def apply(df: DataFrame, keyCol: String = "urlkey"): DataFrame =
    // coalesce: a NULL key is not one of the dropped pseudo-capture
    // prefixes — three-valued !startsWith(NULL) would silently discard
    // the row, masking the upstream null instead of passing it through
    df.where(DroppedPrefixes
      .map(p => !coalesce(col(keyCol).startsWith(p), lit(false)))
      .reduce(_ && _))

  /** Raw-line form: also drops the " CDX ..." header. */
  def lines(ds: Dataset[String]): Dataset[String] =
    ds.filter(l => l.nonEmpty && !l.startsWith(" CDX ") &&
      !DroppedPrefixes.exists(l.startsWith))
}
