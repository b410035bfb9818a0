package org.apache.spark.grafttest

import org.apache.spark.SparkContext

/** Test-only bridge: `SparkContext.listenerBus` is `private[spark]`,
  * and job-count assertions must drain the async listener bus
  * deterministically instead of sleeping a fixed interval (a fixed
  * sleep flakes under load — the job-start event may not have been
  * delivered yet, or a late event from a preceding warm-up action can
  * land inside the window).
  */
object ListenerDrain {
  /** Block until every queued listener event has been delivered. */
  def drain(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
