package graft.ops

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Execution observability: per-action input/shuffle volumes from task
  * metrics. "Measure, don't guess" is how every scale claim in
  * SCALING.md was earned locally; this makes the same measurement a
  * library call, so a user can ask "did that join broadcast or did it
  * shuffle my fact table?" of any action — the question that decides
  * whether a plan survives a 100× scale-up.
  *
  * Listener-based (zero plan changes, works for any action including
  * writes); the listener is registered for the duration of one measured
  * body and removed after, with the async bus drained so late task
  * events are counted.
  */
object QueryMetrics {

  /** Task-metric totals for one measured action. */
  case class Metrics(
      inputBytes: Long,
      inputRecords: Long,
      shuffleWriteBytes: Long,
      shuffleWriteRecords: Long,
      shuffleReadBytes: Long,
      peakExecutionMemory: Long,
      wallMs: Long)

  /** Run `body` (typically a DataFrame action) and return its result
    * together with the task-metric totals of everything it executed.
    * Concurrent foreign jobs on the same SparkContext would be counted
    * too — measure on a quiet session, the same contract as any
    * listener-based profiler.
    */
  def measure[T](spark: SparkSession)(body: => T): (T, Metrics) = {
    val inBytes = new LongAdder; val inRecs = new LongAdder
    val swBytes = new LongAdder; val swRecs = new LongAdder
    val srBytes = new LongAdder; val peak = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          inBytes.add(m.inputMetrics.bytesRead)
          inRecs.add(m.inputMetrics.recordsRead)
          swBytes.add(m.shuffleWriteMetrics.bytesWritten)
          swRecs.add(m.shuffleWriteMetrics.recordsWritten)
          srBytes.add(m.shuffleReadMetrics.totalBytesRead)
          peak.accumulateAndGet(m.peakExecutionMemory, math.max)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    try {
      val out = body
      // the no-arg waitUntilEmpty throws TimeoutException after ~10 s on
      // a saturated bus — the body's result must survive that (metrics
      // are then a slight undercount, which is the right failure mode)
      try org.apache.spark.sql.GraftShims.drainListenerBus(spark)
      catch { case _: java.util.concurrent.TimeoutException => }
      (out, Metrics(
        inBytes.sum(), inRecs.sum(), swBytes.sum(), swRecs.sum(),
        srBytes.sum(), peak.get(), (System.nanoTime() - t0) / 1000000L))
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
