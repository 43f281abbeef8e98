package org.apache.spark

/** Package-private Spark internals the bench instrumentation needs.
  * `SparkContext.listenerBus` is `private[spark]`, so this accessor lives
  * in the `org.apache.spark` package (same pattern as
  * [[org.apache.spark.sql.GraftBridge]]). */
object GraftSparkAccess {

  /** Block until the asynchronous listener bus has delivered every queued
    * event. ScalingBench zeroes its per-stage byte/CPU accumulators at
    * bootstrap-done; without a drain, stage-completed events from bootstrap
    * stages still sitting in the async queue land AFTER the reset and bleed
    * one-time setup cost into the per-round metrics (round-3 ADVICE). */
  def drainListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
