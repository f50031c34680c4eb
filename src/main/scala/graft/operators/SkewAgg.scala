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
 * NULL values are excluded, matching countDistinct semantics.
 */
object SkewAgg {

  def distinctByKey(df: DataFrame, keyCol: String, valueCol: String,
                    outCol: String = "n_distinct"): DataFrame =
    df.select(col(keyCol), col(valueCol))
      .where(col(valueCol).isNotNull)
      .distinct()                      // shuffle spread by (key, value)
      .groupBy(col(keyCol))            // map-side combined per-key count
      .agg(count(lit(1)).as(outCol))
}
