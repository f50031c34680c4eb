package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow

/** Eager local checkpoint that also RETURNS the persisted RDD handle.
  *
  * `Dataset.localCheckpoint(true)` persists an internal RDD the public API
  * never exposes — `unpersist()` on the returned Dataset is a no-op (the
  * cache manager has no entry for it), so iterative algorithms that
  * checkpoint per iteration leak executor storage until the context
  * cleaner GCs the RDD. This shim performs the same truncate-the-plan
  * checkpoint (copy rows, localCheckpoint, materialize, re-wrap as a
  * DataFrame over the checkpointed RDD) but hands back the RDD so the
  * caller can release the blocks deterministically once the next
  * iteration is materialized. Lives inside the sql package because
  * `internalCreateDataFrame` is `private[sql]` (same pattern as
  * [[ColumnShim]]; no behavior added beyond the exposed handle). */
object CheckpointShim {
  def localCheckpointWithHandle(df: DataFrame): (DataFrame, RDD[InternalRow]) = {
    val cdf = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val spark = cdf.sparkSession
    // toRdd reuses row buffers — copy before caching, as Dataset.checkpoint does
    val rdd = cdf.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    rdd.count() // eager: materialize now so lineage truncation is real
    (spark.internalCreateDataFrame(rdd, cdf.schema), rdd)
  }

  /** [[localCheckpointWithHandle]] that additionally counts, on the SAME
    * materializing job, the rows whose boolean column at `boolOrdinal` is
    * true (nulls count as false) — so an iterative caller can read its
    * convergence flag without scheduling a second per-round action. A
    * raw `toRdd.count()` fires no QueryExecutionListener, so
    * `Dataset.observe` cannot deliver the metric here; a long accumulator
    * on the copy-map can. Accumulator semantics make the zero/non-zero
    * read safe: successful tasks each contribute exactly once, so 0 means
    * genuinely no true rows; a speculative/retried task can only inflate
    * a non-zero count, never fake convergence. */
  def localCheckpointCounting(df: DataFrame, boolOrdinal: Int)
      : (DataFrame, RDD[InternalRow], Long) = {
    val cdf = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val spark = cdf.sparkSession
    val acc = spark.sparkContext.longAccumulator("graft.checkpoint.trueCount")
    val rdd = cdf.queryExecution.toRdd.map { r =>
      if (!r.isNullAt(boolOrdinal) && r.getBoolean(boolOrdinal)) acc.add(1L)
      r.copy()
    }
    rdd.localCheckpoint()
    rdd.count()
    (spark.internalCreateDataFrame(rdd, cdf.schema), rdd, acc.value)
  }
}
