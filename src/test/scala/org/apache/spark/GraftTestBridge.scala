package org.apache.spark

/** Test-only bridge into `private[spark]` listener-bus internals: lets specs
  * deterministically drain async QueryExecutionListener events instead of
  * sleeping. (Same compile-into-their-package technique as
  * `org.apache.spark.sql.GraftBridge`.) */
object GraftTestBridge {
  def drainListenerBus(sc: SparkContext, timeoutMs: Long = 10000): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
