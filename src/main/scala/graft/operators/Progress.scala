package graft.operators

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Progress accounting (A7): the reference keeps a locked shared counter
  * updated per row and printed every 10^4 (blocksci_export.py:74,146-149).
  * The Spark-native form is a SparkListener over task output metrics —
  * zero cost in the row path, exact at task granularity.
  */
object Progress {

  final class RowCounter(reportEvery: Long,
      report: Long => Unit) extends SparkListener {
    val rows = new AtomicLong(0L)
    private val lastReported = new AtomicLong(0L)
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        val n = rows.addAndGet(m.outputMetrics.recordsWritten)
        val last = lastReported.get()
        if (n - last >= reportEvery && lastReported.compareAndSet(last, n))
          report(n)
      }
    }
  }

  /** Run `body` with a row counter attached; returns (result, rowsWritten). */
  def countingWrites[T](s: SparkSession, reportEvery: Long = 10000L,
      report: Long => Unit = n => System.err.println(s"[progress] $n rows"))(
      body: => T): (T, Long) = {
    val counter = new RowCounter(reportEvery, report)
    s.sparkContext.addSparkListener(counter)
    try {
      val r = body
      // the listener bus is async (and its flush API is private) — poll
      // until the counter stops moving
      var prev = -1L
      var n = counter.rows.get()
      var tries = 0
      while (n != prev && tries < 50) {
        prev = n; Thread.sleep(100); n = counter.rows.get(); tries += 1
      }
      (r, n)
    } finally s.sparkContext.removeSparkListener(counter)
  }
}
