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
    val partMins = hashes.mapPartitions(bottomK(_, k))(Encoders.scalaLong)
    val mins = partMins.toDF("hv").distinct().orderBy(col("hv")).limit(k)
    mins.agg(count(lit(1)).as("n_mins"), max(col("hv")).as("h_k"))
      .select(col("n_mins"), col("h_k"),
        when(col("n_mins") < k, col("n_mins")).otherwise(
          expr(s"CAST(${k - 1} AS BIGINT) * ${1L << HashBits} DIV h_k"))
          .as("est_distinct"))
  }

  /** Deterministic mergeable approximate quantiles over an integer
    * column (beyond-reference surface) — the scale companion to exact
    * per-group percentiles (q58): exact `percentile` over 100 TB
    * shuffles one row per distinct (group, value), while this bounds
    * the wire at k values regardless of domain size, and unlike
    * `percentile_approx` (whose sketch merge is implementation- and
    * partition-order-specific) it is a PURE FUNCTION of the value set +
    * counts, so an external engine replays it bit-for-bit.
    *
    * Construction: the sample is the k distinct values with the
    * smallest (48-bit md5 hash, value) pairs — the same KMV bottom-k
    * idea as [[kmvDistinct]], so it is deterministic and mergeable
    * (union of samples, re-truncated to k, is the sample of the
    * union). Exact counts for JUST the sampled values come from a
    * second pass whose aggregation carries at most k groups. The
    * p-basis-point quantile estimate is the smallest sampled value
    * whose cumulative sampled count reaches p/10000 of the total
    * sampled count — an all-integer ratio estimator (distinct-value
    * sampling, Beyer et al. SIGMOD'07 lineage): exact when the domain
    * has <= k distinct values, and at larger domains its error follows
    * the count-variance of the uniform value sample.
    *
    * Scale shape: pass 1 is the bounded-heap KMV scan (<= k rows per
    * partition reach the wire); pass 2 filters map-side through a
    * broadcast of the <= k sampled values and aggregates <= k groups;
    * the final cumulative window runs on <= k rows. Nothing anywhere
    * shuffles more than k·partitions rows. */
  def kmvQuantiles(df: DataFrame, valueCol: String, k: Int,
                   probesBp: Seq[Int] = Seq(100, 1000, 2500, 5000,
                     7500, 9000, 9900)): DataFrame = {
    require(k >= 2 && k <= 32768, s"k must be in [2, 32768], got $k")
    require(probesBp.nonEmpty && probesBp.forall(p => p >= 1 && p <= 10000),
      s"probesBp must be basis points in [1, 10000], got $probesBp")
    import df.sparkSession.implicits._
    val vals = df.where(col(valueCol).isNotNull)
      .select(col(valueCol).cast("long").as("v"))
    val hashed = vals.select(hash48(col("v")).as("hv"), col("v"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    // pass 1: per-partition bounded heap of the k smallest DISTINCT
    // (hash, value) pairs — value in the order key breaks 48-bit
    // collisions deterministically
    val partMins = hashed.mapPartitions(bottomK(_, k))(
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    val sampled = partMins.toDF("hv", "v").distinct()
      .orderBy(col("hv"), col("v")).limit(k)
      .select(col("v"))
    // pass 2: exact counts of just the sampled values (map-side
    // broadcast-semi filter, <= k groups on the wire)
    val counts = vals
      .join(broadcast(sampled), Seq("v"), "left_semi")
      .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    // <= k rows: cumulative distribution + integer probe lookup. Both
    // running and grand totals are WINDOW sums over the same tiny frame
    // — a separate `counts.agg(sum)` branch would re-evaluate the whole
    // two-pass subtree unless exchange reuse (an optimization, not a
    // contract) happened to kick in
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window
      .orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val cum = counts
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("total", sum(col("cnt")).over(wAll))
    cum.crossJoin(broadcast(
        probesBp.toDF("p_bp").select(col("p_bp").cast("int"))))
      .where(col("cum") * 10000 >= col("p_bp") * col("total"))
      .groupBy(col("p_bp"))
      .agg(min(col("v")).as("value"))
  }

  /** Per-partition bounded bottom-k over DISTINCT elements: a TreeSet
    * holds the partition's <= k smallest (dedup by membership, strict-lt
    * admission so equal elements never evict, poll after add); O(log k)
    * per element, O(k) memory. Shared by both KMV sketches so the
    * admission invariants live in exactly one place. */
  private def bottomK[T](it: Iterator[T], k: Int)
                        (implicit ord: Ordering[T]): Iterator[T] = {
    val heap = new java.util.TreeSet[T](ord)
    it.foreach { e =>
      if (heap.size < k) heap.add(e)
      else if (ord.lt(e, heap.last())) {
        heap.add(e); if (heap.size > k) heap.pollLast()
      }
    }
    import scala.jdk.CollectionConverters._
    heap.iterator().asScala
  }
}
