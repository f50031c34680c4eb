package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Revisit resolution — the as-of join the wayback serving path performs
 * for deduplicated captures: a `warc/revisit` CDX record marks a re-crawl
 * whose payload was NOT stored because its digest matched an earlier
 * capture, so serving it requires locating the most recent ORIGINAL
 * capture of the same (urlkey, digest) at or before the revisit's
 * timestamp. The reference toolkit carries the revisit mime through its
 * CDX pipelines (/root/reference/src/main/java/org/archive/hadoop/pig/
 * CDXLoader.java emits the mime field verbatim; filter jobs treat
 * `warc/revisit` rows as first-class index lines) and leaves resolution
 * to replay — here it is a batch operator so an index can be shipped
 * with resolved payload locations.
 *
 * Spark-first shape: ONE window over (urlkey, digest) ordered by
 * timestamp, `last(original-only column, ignoreNulls)` up to and
 * including the current row. Originals therefore resolve to themselves;
 * a revisit with no prior original resolves to NULL (the payload exists
 * in no archive — a dangling revisit). One shuffle on the same key
 * prefix the cluster layout already sorts by, so at production scale the
 * window rides the existing urlkey-sorted partitioning.
 */
object RevisitResolve {

  val RevisitMime = "warc/revisit"

  /** Adds `resolved_filename` / `resolved_offset`: the payload location
    * of the newest non-revisit capture of the same (urlkey, digest) at or
    * before each row's timestamp; NULL when no such capture exists. */
  def resolve(cdx: DataFrame,
              urlkeyCol: String = "urlkey", tsCol: String = "timestamp",
              mimeCol: String = "mimetype", digestCol: String = "digest",
              fileCol: String = "filename", offsetCol: String = "offset")
  : DataFrame = {
    val isOriginal = col(mimeCol) =!= RevisitMime
    // deterministic tie-breakers: at 14-digit CDX resolution an original
    // and a revisit can share (urlkey, digest, timestamp) — order
    // originals BEFORE revisits (so the tied revisit sees the original),
    // then (filename, offset) for full determinism across runs/engines
    val w = Window.partitionBy(col(urlkeyCol), col(digestCol))
      .orderBy(col(tsCol), col(mimeCol) === RevisitMime,
        col(fileCol), col(offsetCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE struct payload, not two per-column last()s: a real archive's
    // original can carry a NULL field ('-' CDX fields parse to null),
    // and independent per-column IGNORE NULLS folds would then resolve
    // filename and offset from DIFFERENT originals — a torn pointer
    // (right file, wrong byte offset) worse than either a NULL or the
    // newest row's own fields (r19 review finding; same rationale as
    // AsOfJoin's struct payload). The newest original ROW wins whole;
    // its NULL fields ride through. Still one Window operator, one pass.
    cdx.select(col("*"),
      last(when(isOriginal,
          struct(col(fileCol).as("f"), col(offsetCol).as("o"))),
        ignoreNulls = true).over(w).as("__res"))
      .withColumn("resolved_filename", col("__res.f"))
      .withColumn("resolved_offset", col("__res.o"))
      .drop("__res")
  }
}
