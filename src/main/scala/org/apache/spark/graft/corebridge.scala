package org.apache.spark.graft

/** Core-side bridge (the sql-side twin lives in
  * org.apache.spark.sql.graft.bridge): SparkContext.listenerBus is
  * `private[spark]`, and the dev probes need a deterministic drain
  * instead of a race-prone fixed sleep (ADVICE r13 on JobLogProbe).
  */
object corebridge {
  def drainListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
