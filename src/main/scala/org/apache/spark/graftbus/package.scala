package org.apache.spark

/** Listener-bus drain for deterministic metric reads (the bus is
  * async and `private[spark]`). Same in-package technique as
  * org.apache.spark.sql.graftshim.
  */
package object graftbus {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
