package graft.util

/** The one pool discipline for fleet-shaped work: N independent legs
  * that each run driver-blocking Spark jobs (per-store counters, pruning
  * collects, eager checkpoints) execute on a bounded thread pool so the
  * caller's wall tracks the slowest leg instead of the sum of job-latency
  * floors. Spark's scheduler is thread-safe; results are byte-identical
  * because each leg is its own deterministic plan.
  *
  * SETTLE-ALL semantics (the staging block's hard-won rule): every leg
  * runs to completion before the first failure propagates — a fail-fast
  * rethrow would leave orphaned legs still writing while the caller's
  * retry deletes and rebuilds underneath them, and an orphan's late
  * commit could land inside the fresh state.
  */
object Par {
  def all[T](parallelism: Int)(thunks: Seq[() => T]): Seq[T] = {
    require(parallelism > 0, s"parallelism must be positive: $parallelism")
    if (thunks.isEmpty) return Nil
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, thunks.size))
    implicit val ec =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val settled = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(thunks.map(t =>
          scala.concurrent.Future(t()).transform(r =>
            scala.util.Success(r)))),
        scala.concurrent.duration.Duration.Inf)
      settled.collectFirst { case scala.util.Failure(e) => throw e }
      settled.map(_.get)
    } finally pool.shutdown()
  }
}
