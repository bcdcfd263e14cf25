package graft.sources

/** Run INDEPENDENT Spark job groups concurrently from driver threads —
  * the optimization-guide §2.6 idiom ("overlap independent jobs"): a
  * lifecycle that folds N disjoint stores sequentially leaves most of
  * the cluster idle through each fold's scheduling gaps and straggler
  * tails; submitting the folds from a small pool lets the next store's
  * tasks back-fill executors the current one has stopped using. Spark's
  * scheduler runs concurrent jobs FIFO within one application, which is
  * exactly the back-fill behavior wanted.
  *
  * Contract: tasks must touch DISJOINT mutable state (different store
  * directories) — the caller asserts independence by choosing this
  * helper. Failures propagate: the first task exception (unwrapped from
  * the pool's ExecutionException) rethrows after every task has been
  * given the chance to finish, so a failed lifecycle never half-hides
  * behind a swallowed error. */
object ParJobs {
  /** A/B knob: SPARK_GRAFT_SERIAL_FOLDS=1 runs every ParJobs call
    * sequentially — one binary measures the overlap win itself. */
  private def serial: Boolean =
    sys.env.get("SPARK_GRAFT_SERIAL_FOLDS").contains("1")

  def run(tasks: Seq[() => Unit]): Unit = {
    if (tasks.isEmpty) return
    if (tasks.size == 1 || serial) { tasks.foreach(_()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.size)
    try {
      val futs = tasks.map(t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = t()
        }))
      var firstErr: Option[Throwable] = None
      futs.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (firstErr.isEmpty) firstErr = Some(e.getCause)
        }
      }
      firstErr.foreach(throw _)
    } finally pool.shutdown()
  }

  /** Like [[run]] but each task yields a value; results return in task
    * order (deterministic regardless of completion order). */
  def map[A](tasks: Seq[() => A]): Seq[A] = {
    if (tasks.isEmpty) return Seq.empty
    if (tasks.size == 1 || serial) return tasks.map(_())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.size)
    try {
      val futs = tasks.map(t =>
        pool.submit(new java.util.concurrent.Callable[A] {
          def call(): A = t()
        }))
      // same wait-all-then-rethrow discipline as [[run]]: collect every
      // result (or failure) BEFORE propagating the first error, so no
      // sibling task is still mutating its store directory while the
      // caller unwinds into cleanup/recovery (shutdown() does not cancel
      // in-flight tasks)
      val outcomes = futs.map { f =>
        try Right(f.get())
        catch {
          case e: java.util.concurrent.ExecutionException => Left(e.getCause)
        }
      }
      outcomes.collectFirst { case Left(e) => e }.foreach(throw _)
      outcomes.collect { case Right(a) => a }
    } finally pool.shutdown()
  }
}
