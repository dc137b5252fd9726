package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test/bench-only access to the shared listener bus's drain barrier.
  *
  * QueryExecutionListener deliveries ride the async LiveListenerBus;
  * a harness that attributes deliveries to "the query that just ran"
  * by reset-then-collect (SkewBench's per-query skew verdict) has a
  * race: a delivery from the PREVIOUS query can land after the reset
  * if the bus stalls longer than the settle window. Draining the bus
  * BEFORE the reset closes it — once empty, the only future
  * deliveries come from actions run after the reset.
  *
  * Lives under org.apache.spark because `SparkContext.listenerBus`
  * and `waitUntilEmpty` are private[spark]; this is a measurement
  * shim, not a production dependency (only SkewBench calls it).
  */
object BusFlush {

  /** Block until the shared listener bus has dispatched every queued
    * event, or `timeoutMs` passes (best effort — a timeout means the
    * caller proceeds with the same exposure it had without the
    * barrier, never a failure).
    */
  def drain(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
