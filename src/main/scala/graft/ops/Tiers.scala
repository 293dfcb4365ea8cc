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

  /** Run independent tier builds as concurrent Spark jobs — ONE switch
    * point for how build parallelism works (today: global EC futures —
    * plain multi-job scheduling, how a cluster runs independent writes
    * anyway; any future bounded executor / failure aggregation / job
    * grouping lands here once). Per-root locks inside each
    * *Materialize serialize same-tier requests. */
  def buildConcurrently(tasks: Seq[() => Unit]): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    Await.result(Future.sequence(tasks.map(t => Future(t()))),
      Duration.Inf)
    ()
  }
}
