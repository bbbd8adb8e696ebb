package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Compile-time bridge to the `private[spark]` listener-bus drain.
  *
  * [[graft.Bench]]'s per-query executor-stats snapshot must not be read
  * while task/job events are still queued on the async bus — stale
  * counters can look "settled" (started == ended at old values) when the
  * final job's start event simply hasn't dispatched yet.
  * `LiveListenerBus.waitUntilEmpty` is exactly the primitive for that
  * (Spark's own listener tests use it), but it is `private[spark]`, so
  * this one-method object lives under the `org.apache.spark` package
  * purely to re-export it. No other Spark internals are touched.
  */
object BenchListenerBus {

  /** Block until every event posted so far has been dispatched to all
    * listeners, or `timeoutMillis` elapses. Returns false on timeout. */
  def drain(sc: SparkContext, timeoutMillis: Long): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMillis); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
