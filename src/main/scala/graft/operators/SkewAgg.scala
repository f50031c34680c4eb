package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Skew-safe exact distinct counting (beyond-reference surface).
 *
 * `groupBy(key).agg(countDistinct(value))` plans as an expand + two-phase
 * aggregate whose final stage clusters by KEY alone: every distinct
 * (key, value) pair of a hot key lands on that key's single reducer — a
 * dominant mimetype or host serializes the stage at 100 TB. Staging the
 * dedup first spreads the wide shuffle across BOTH columns (a hot key
 * fans out over the whole cluster), and the per-key count then rides a
 * map-side-combined aggregation whose shuffle carries at most one row
 * per (partition, key).
 *
 * NULL values are excluded from the count, matching countDistinct
 * semantics — but a key whose values are ALL NULL still yields a group
 * with count 0 (the dedup keeps one (key, NULL) row; `count(valueCol)`
 * ignores it without dropping the group), exactly like
 * `count(DISTINCT value) GROUP BY key` in SQL.
 */
object SkewAgg {

  def distinctByKey(df: DataFrame, keyCol: String, valueCol: String,
                    outCol: String = "n_distinct"): DataFrame =
    df.select(col(keyCol), col(valueCol))
      .distinct()                      // shuffle spread by (key, value)
      .groupBy(col(keyCol))            // map-side combined per-key count
      .agg(count(col(valueCol)).as(outCol))

  /** Salted equi-join for a skewed big side: the big side gets a per-row
    * salt in [0, buckets); the small side is replicated buckets×; the
    * join key becomes (key, salt), so one hot key's rows spread over
    * `buckets` reducers instead of serializing on one. The result is
    * IDENTICAL to the plain inner join — the salt never leaves the plan.
    *
    * This is the explicit form of what AQE's skew-join split does at
    * runtime; use it when the skew is known up front, when the join
    * rides a partitioning AQE won't touch (bucketed tables), or when the
    * small side is too big to broadcast but fine to replicate
    * `buckets`×. The salt is `monotonically_increasing_id() % buckets` —
    * run-dependent, which is fine: it only routes rows, never appears in
    * the result. */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
                 smallKey: String, buckets: Int = 16): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val b = big.withColumn("__bsalt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    val s = small.withColumn("__ssalt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    b.join(s, b(bigKey) === s(smallKey) && col("__bsalt") === col("__ssalt"))
      .drop("__bsalt", "__ssalt")
  }
}
