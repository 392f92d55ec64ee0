package org.apache.spark

/** Package-private-accessor shim, declared as such (the same pattern as
  * [[org.apache.spark.sql.GraftColumnBridge]]): the benchmark's per-entry
  * job/shuffle counters ride the ASYNC listener bus, so reading them right
  * after a replay undercounts unless the bus drains first. Nothing here but
  * the visibility bridge. */
object GraftListenerBridge {
  def waitListeners(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty()
    catch { case _: java.util.concurrent.TimeoutException => () }
}
