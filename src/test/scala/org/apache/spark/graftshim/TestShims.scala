package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Test-only bridge to `private[spark]` listener-bus draining: metric
  * listeners receive task events asynchronously, so a bytes-read assertion
  * must flush the bus before reading its accumulator. */
object TestShims {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
