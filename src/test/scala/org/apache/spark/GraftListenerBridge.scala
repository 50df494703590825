package org.apache.spark

/** Test-only bridge to the `private[spark]` listener bus: lets specs
  * DRAIN queued listener events deterministically instead of sleeping a
  * fixed wall-clock interval and hoping the bus caught up (the
  * timing-flake class — a loaded CI host can outlast any constant).
  * Lives under `org.apache.spark` solely to satisfy the access
  * qualifier; test classpath only. */
object GraftListenerBridge {
  /** Block until every event posted so far has been delivered to every
    * registered listener. */
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
