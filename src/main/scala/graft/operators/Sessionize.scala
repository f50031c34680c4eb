package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization (beyond-reference surface): assign each row a
 * per-key session index, incremented whenever the gap to the previous
 * row of the same key exceeds `gapSeconds` — the event-log primitive
 * behind per-visit aggregation, crawl-burst detection, and rate
 * windowing.
 *
 * Spark-first shape: ONE shuffle on the key; the lag and the running
 * session counter are two window expressions over the SAME
 * (partition, order) spec, so they share a single Exchange + Sort.
 * Comparisons run on integer epoch micros — exact, engine-portable (no
 * float seconds, no interval arithmetic). Ordering is (timestamp,
 * tieCol) so same-timestamp rows sessionize deterministically.
 *
 * The streaming analogue is `flatMapGroupsWithState` with a session
 * timeout (see graft.streaming.CdxStream.dayCapStream for the stateful
 * pattern); this operator is the batch/backfill form.
 */
object Sessionize {

  /** Adds `session_idx` (1-based, per key).
    *
    * NULL-timestamp contract (r20 gate-blindness sweep): a row with no
    * timestamp belongs to no session — it gets `session_idx` NULL and
    * does NOT shift the numbering of the key's real sessions. The naive
    * window (nulls sort first in Spark ASC, each null `prev` reads as a
    * session break) would instead burn indices 1..k on the unplaceable
    * rows, silently renumbering every real session — and an engine
    * whose default null order differs (DuckDB sorts nulls last) would
    * renumber them DIFFERENTLY, so the contract must be explicit. */
  def apply(df: DataFrame, keyCol: String, tsCol: String,
            gapSeconds: Long, tieCol: String): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    val us = unix_micros(col(tsCol))
    val order = Window.partitionBy(col(keyCol)).orderBy(us, col(tieCol))
    val cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(us, 1).over(order)
    // null-ts rows sort FIRST (ASC nulls-first), contribute 0 to the
    // running sum, and mask to NULL — so the first timestamped row still
    // sees prev null (or a null-ts neighbor's null us) and opens
    // session 1, numbering exactly as if the null rows were absent
    val newSession =
      when(us.isNull, 0)
        .when(prev.isNull || (us - prev) > gapSeconds * 1000000L, 1)
        .otherwise(0)
    df.withColumn("__new_session", newSession)
      .withColumn("session_idx",
        when(us.isNull, lit(null).cast("long"))
          .otherwise(sum(col("__new_session")).over(cum).cast("long")))
      .drop("__new_session")
  }
}
