// Bridge into the package-private listener bus. The bench attributes each
// query's stage metrics (executor time, shuffle bytes, GC) to that query;
// listener events are delivered asynchronously, so the snapshot must drain
// the bus first — and the drain API is private[spark].
package org.apache.spark

object GraftListenerBridge {
  def flushListeners(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
