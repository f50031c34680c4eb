package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Range (interval) join re-expressed as an equi-join — the scale path for
 * "match each event to the time window(s) covering it" (beyond-reference
 * surface; the join shape behind outage windows, crawl campaigns, rate
 * periods).
 *
 * Spark's native plan for a pure non-equi join condition is
 * BroadcastNestedLoopJoin: one side must fit in memory and every
 * (row, interval) combination is tested — at 100 TB with a large interval
 * set, neither holds. Day bucketing makes it shuffle-joinable: each
 * interval row is exploded to the calendar days it covers (intervals
 * spanning d days yield d bucket rows), the fact side computes its day
 * map-side, and the join is a plain hash equi-join on (key, day) with the
 * exact [start, end) bounds left as a residual filter. Candidates per row
 * = intervals sharing its key AND overlapping its day — bounded by
 * interval density, not interval count. Works for any bucket granularity;
 * day fits event-log density (swap `to_date` for `date_trunc('hour',…)`
 * when intervals are minutes-wide and dense).
 */
object IntervalJoin {

  /** Join `rows` to every interval of the same key whose [start, end)
    * contains the row's timestamp. Column names must not collide across
    * the two inputs (the result carries both sides' columns). */
  def byDay(rows: DataFrame, rowKey: String, tsCol: String,
            intervals: DataFrame, intKey: String,
            startCol: String, endCol: String): DataFrame = {
    // Malformed intervals (end < start) would make sequence() step -1 and
    // explode one bucket row per day of the REVERSED span — unbounded
    // inflation from a single corrupt row. They can never match the
    // residual [start, end) filter, so dropping them up front is
    // result-identical and bounds the explode.
    val valid = intervals.where(col(endCol) >= col(startCol))
    // inclusive day span: an interval ending mid-day still covers its
    // last day's bucket; the residual bound filter trims the excess
    val expanded = valid.withColumn("__iday",
      explode(sequence(to_date(col(startCol)), to_date(col(endCol)))))
    val r = rows.withColumn("__rday", to_date(col(tsCol)))
    r.join(expanded,
        r(rowKey) === expanded(intKey) && col("__rday") === col("__iday") &&
          r(tsCol) >= expanded(startCol) && r(tsCol) < expanded(endCol))
      .drop("__rday", "__iday")
  }
}
