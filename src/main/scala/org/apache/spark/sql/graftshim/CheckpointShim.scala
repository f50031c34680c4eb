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
}
