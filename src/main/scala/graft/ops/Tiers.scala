package graft.ops

import java.io.File

/** Shared maintenance for the parked intermediate tiers (the
  * `target/intermediate` trees the *Materialize objects write). */
object Tiers {

  /** Null-guarded recursive delete: `File.listFiles` returns null on an
    * I/O or permission error — the naive recursion then NPEs and kills
    * the caller (a bench run dying before timing anything). */
  def deleteRecursively(f: File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).toSeq.flatten.foreach(deleteRecursively)
    f.delete(); ()
  }

  /** Wipe every parked tier — the deterministic-cold-build switch the
    * bench mains flip before timing tier construction. */
  def wipe(): Unit = {
    val tiers = new File("target/intermediate")
    if (tiers.exists()) deleteRecursively(tiers)
  }

  /** Ceiling on concurrent tier-build driver threads. Each build is one
    * Spark job whose parallelism comes from its own tasks — the driver
    * threads only overlap job SCHEDULING, so a handful is plenty and a
    * large tier list must not fan out unboundedly. */
  val MaxConcurrentBuilds = 4

  /** Run independent tier builds as concurrent Spark jobs — ONE switch
    * point for how build parallelism works: a bounded fixed-size pool
    * (min(tasks, [[MaxConcurrentBuilds]]) driver threads), and FAILURE
    * AGGREGATION — every task runs to completion and every failure is
    * reported (the first as the thrown exception, the rest suppressed
    * on it), so one broken tier never masks its siblings' errors.
    * Per-root locks inside each *Materialize serialize same-tier
    * requests. */
  def buildConcurrently(tasks: Seq[() => Unit]): Unit = {
    if (tasks.isEmpty) return
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(tasks.size, MaxConcurrentBuilds))
    try {
      val futures = tasks.map(t =>
        pool.submit(new java.util.concurrent.Callable[Option[Throwable]] {
          def call(): Option[Throwable] =
            try { t(); None } catch { case e: Throwable => Some(e) }
        }))
      val failures = futures.flatMap(_.get())
      failures.headOption.foreach { first =>
        failures.drop(1).foreach(first.addSuppressed)
        throw first
      }
    } finally pool.shutdown()
  }
}
