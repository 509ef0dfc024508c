package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query execution metrics — the Spark-first counterpart of the
  * reference's load/throughput observability surface
  * (ella-engine/src/metrics.rs, metrics/load_monitor.rs: buffer load
  * gauges + a prometheus registry). On Spark the load signal that
  * matters at 100 TB is the SHUFFLE: bytes/records crossing the wire,
  * spill to disk, and input volume — exactly what this collector
  * reports per measured action, so scale claims ("this operator is
  * zero-shuffle", "the agg combines map-side") are measured, not
  * asserted.
  *
  * Usage: `val (result, m) = Metrics.measure(spark) { df.count() }`.
  * Collection is a TaskEnd listener over the action's tasks; counters
  * are process-wide during the action (measure one action at a time,
  * like any throughput probe).
  */
object Metrics {
  final case class QueryMetrics(
      tasks: Int,
      inputRecords: Long,
      inputBytes: Long,
      shuffleRecordsWritten: Long,
      shuffleBytesWritten: Long,
      shuffleBytesRead: Long,
      diskBytesSpilled: Long,
      memoryBytesSpilled: Long,
      executorRunTimeMs: Long) {
    /** Records-crossing-the-wire per input record, in parts-per-1000
      * (0 = zero-shuffle; small = good map-side combine). */
    def shuffleAmplificationMilli: Long =
      if (inputRecords == 0) 0L else shuffleRecordsWritten * 1000L / inputRecords
  }

  private final class Collector extends SparkListener {
    val tasks = new AtomicInteger
    val inRec, inBytes, swRec, swBytes, srBytes, diskSpill, memSpill, runMs = new AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        tasks.incrementAndGet()
        inRec.addAndGet(m.inputMetrics.recordsRead)
        inBytes.addAndGet(m.inputMetrics.bytesRead)
        swRec.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        swBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        srBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        diskSpill.addAndGet(m.diskBytesSpilled)
        memSpill.addAndGet(m.memoryBytesSpilled)
        runMs.addAndGet(m.executorRunTime)
      }
    }
  }

  /** Run `action` and report the task metrics it generated. */
  def measure[T](spark: SparkSession)(action: => T): (T, QueryMetrics) = {
    val c = new Collector
    spark.sparkContext.addSparkListener(c)
    try {
      val result = action
      // TaskEnd events are delivered asynchronously; drain before reading
      org.apache.spark.sql.graft.bridge.drainListenerBus(spark, 30000L)
      (result, QueryMetrics(
        c.tasks.get(), c.inRec.get(), c.inBytes.get(),
        c.swRec.get(), c.swBytes.get(), c.srBytes.get(),
        c.diskSpill.get(), c.memSpill.get(), c.runMs.get()))
    } finally spark.sparkContext.removeSparkListener(c)
  }
}
