package graft.functions

/** Run independent eager Spark jobs (checkpoint materializations, staged
  * store writes, overlapped score-side jobs) on a short-lived pool —
  * guide §2.6: Spark's scheduler happily runs several jobs at once
  * inside one application, so a later job's tasks back-fill the stage
  * tails of the current one instead of leaving the cluster idle.
  * Results keep input order. On failure the queued siblings are
  * cancelled and the first error rethrown. */
private[graft] object Jobs {
  def concurrently[A](thunks: Seq[() => A]): Seq[A] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(thunks.size)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val out = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(
          thunks.map(t => scala.concurrent.Future(t()))),
        scala.concurrent.duration.Duration.Inf)
      pool.shutdown()
      out
    } catch {
      case e: Throwable =>
        pool.shutdownNow()
        throw e
    }
  }
}
