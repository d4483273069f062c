package org.apache.spark

/** Package-local bridge to internals the bench needs for MEASUREMENT ONLY.
  *
  * Per-query task-metric attribution (spill bytes, peak execution memory)
  * listens on the async listener bus; attributing events to the query that
  * produced them needs "every event for the job that just finished has been
  * delivered" — `LiveListenerBus.waitUntilEmpty`, which is `private[spark]`.
  * A bounded wait outside the timed region; a timeout degrades to slightly
  * under-counted metrics, never to a failure.
  */
object GraftSparkHooks {
  def drainListenerBus(sc: SparkContext, timeoutMs: Long = 5000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: Throwable => () }
}
