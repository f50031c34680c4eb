package org.apache.spark.sql.graftshim

import org.apache.spark.SparkContext

/** Deterministic listener-bus drain for measurement code: task-metric
  * events are delivered asynchronously, so a test or rehearsal that
  * reads listener-accumulated counters right after an action races the
  * bus. `waitUntilEmpty` is `private[spark]`; this shim (inside the
  * spark package tree, the same pattern as ColumnShim) exposes it to
  * graft's measurement paths. */
object ListenerShim {
  def drain(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(30000L)
}
