package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/**
 * Mergeable cardinality sketch (beyond-reference surface): K-minimum-values
 * (KMV) distinct-count estimation — the sketch family behind "how many
 * distinct urlkeys / digests / hosts" at 100 TB, where an exact
 * countDistinct shuffles every distinct value.
 *
 * Why KMV and not HyperLogLog: identical inputs give identical sketches in
 * ANY engine that can md5 — the k smallest distinct hash values are a pure
 * function of the value set, so the estimate is reproducible (and
 * oracle-checkable) cross-engine, bit for bit. HLL implementations differ
 * in hash and bias correction and cannot be verified externally.
 *
 * Estimator (Beyer et al., "On Synopses for Distinct-Value Estimation
 * Under Multiset Operations", SIGMOD'07): with h_k = k-th smallest of n
 * distinct 48-bit hashes, est = (k-1) * 2^48 / h_k; when fewer than k
 * distinct hashes exist the sketch is exact.
 *
 * Scale shape: one codegen'd projection computes the 48-bit hash, a
 * per-partition bounded heap keeps each partition's k smallest DISTINCT
 * hashes (mapPartitions — emits <= k rows per partition, the only
 * non-codegen step and it runs on already-projected longs), and the
 * global merge sees <= k * numPartitions rows. No shuffle ever carries
 * more than that; an exact distinct would shuffle every distinct value.
 * The per-partition sketch is the mergeable form — unions of sketches
 * (cross-file, cross-day) compose by the same merge.
 */
object Sketches {

  val HashBits = 48

  /** 48-bit value hash: first 12 hex chars of md5 — small enough that
    * (k-1) * 2^48 stays in a signed 64-bit long for k up to 32768, and
    * reproducible in any engine with md5 + hex parsing. */
  private def hash48(value: org.apache.spark.sql.Column) =
    conv(substring(md5(value.cast("string")), 1, 12), 16, 10).cast("long")

  /** One-row estimate: (n_mins, h_k, est_distinct) over the distinct set
    * of `valueCol`. Exact (est = count) below k distinct values. NULLs are
    * excluded from the estimate — the same semantics as countDistinct
    * (and md5(NULL) would otherwise poison the non-nullable hash pipe). */
  def kmvDistinct(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 2 && k <= 32768, s"k must be in [2, 32768], got $k")
    val hashes = df.where(col(valueCol).isNotNull)
      .select(hash48(col(valueCol)).as("hv"))
      .as(Encoders.scalaLong)
    // bounded per-partition sketch: a TreeSet holds the partition's
    // <= k smallest distinct hashes; O(log k) per row, O(k) memory
    val partMins = hashes.mapPartitions { it =>
      val heap = new java.util.TreeSet[java.lang.Long]()
      it.foreach { h =>
        if (heap.size < k) heap.add(h)
        else if (h < heap.last) { heap.add(h); if (heap.size > k) heap.pollLast() }
      }
      import scala.jdk.CollectionConverters._
      heap.iterator().asScala.map(Long.unbox)
    }(Encoders.scalaLong)
    val mins = partMins.toDF("hv").distinct().orderBy(col("hv")).limit(k)
    mins.agg(count(lit(1)).as("n_mins"), max(col("hv")).as("h_k"))
      .select(col("n_mins"), col("h_k"),
        when(col("n_mins") < k, col("n_mins")).otherwise(
          expr(s"CAST(${k - 1} AS BIGINT) * ${1L << HashBits} DIV h_k"))
          .as("est_distinct"))
  }
}
