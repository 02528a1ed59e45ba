package org.apache.spark

/** Compile-time bridge into one `private[spark]` scheduler call, used by
  * the bench harness only: [[org.apache.spark.scheduler.LiveListenerBus
  * .waitUntilEmpty]] is the deterministic way to flush queued listener
  * events before snapshotting per-query executor metrics. The listener bus
  * is asynchronous — without the flush, task-end events still in flight
  * when a query's timed window closes would be misattributed to the NEXT
  * query's metrics (the alternative, sleep-and-hope, turns the per-query
  * attribution the bench artifact exists for back into a race). The object
  * lives in the `org.apache.spark` package solely to satisfy the
  * `private[spark]` access qualifier; it adds no behavior of its own.
  */
object GraftListenerBus {

  /** Block until every queued listener event has been delivered, or
    * `timeoutMs` elapses. Returns false on timeout (callers record the
    * snapshot anyway — a flush timeout means an overloaded bus, which the
    * artifact should reflect rather than hang on). */
  def flush(sc: SparkContext, timeoutMs: Long = 10000L): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMs); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
