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
    * large tier list must not fan out unboundedly. Overridable via
    * SPARK_GRAFT_BUILD_THREADS (deployment knob: small fixtures are
    * scheduling-latency-bound and benefit from more in-flight jobs;
    * at cluster scale each job saturates executors and 4 suffices). */
  val MaxConcurrentBuilds: Int = {
    // malformed or non-positive env values fall back to the computed
    // default instead of throwing inside object init (an opaque
    // ExceptionInInitializerError) or flowing 0 into the pool size
    def envInt(name: String): Option[Int] =
      sys.env.get(name).flatMap(v => scala.util.Try(v.trim.toInt).toOption)
        .filter(_ > 0)
    envInt("SPARK_GRAFT_BUILD_THREADS").getOrElse {
      // scale with the session's core budget, bounded [4, 8]: measured
      // r13 at sf0.1/32 cores, ann_build (11 independent tier jobs)
      // runs ~25 % faster at 8 in-flight jobs than 4 (the jobs are
      // small, so overlap hides scheduling latency); beyond 8 the
      // driver threads contend and the curve flattens
      val cpus = envInt("SPARK_GRAFT_CPUS")
        .getOrElse(Runtime.getRuntime.availableProcessors)
      math.min(8, math.max(4, cpus / 4))
    }
  }

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
