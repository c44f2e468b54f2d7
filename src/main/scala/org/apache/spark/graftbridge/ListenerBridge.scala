package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** One-hop bridge to the `private[spark]` listener bus: dev probes that
  * read task-metric counters ([[graft.MemProbe]]) must drain the async
  * listener queues BETWEEN queries or tail task-end events of query N get
  * attributed to query N+1. `waitUntilEmpty` is the deterministic drain
  * the fixed `Thread.sleep` it replaces could only approximate.
  */
object ListenerBridge {

  /** Block until every queued listener event has been dispatched, or
    * `timeoutMs` elapses (returns false on timeout — callers should note
    * the residual race rather than fail the probe). */
  def drainListenerBus(sc: SparkContext, timeoutMs: Long = 10000L): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMs); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
