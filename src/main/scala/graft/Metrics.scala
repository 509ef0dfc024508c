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
      shuffleRecordsRead: Long,
      maxTaskShuffleReadRecords: Long,
      diskBytesSpilled: Long,
      memoryBytesSpilled: Long,
      executorRunTimeMs: Long,
      /** Max single-task share of its OWN STAGE's shuffle-read volume,
        * in parts-per-1000, maximized over MATERIAL stages (those
        * carrying >= 5% of the action's shuffle-read records AND >=
        * 1000 records). 1000/tasks-ish = balanced; near 1000 = ONE
        * task absorbed its stage's whole shuffle — the skew signal
        * that kills a stage at 100 TB. Per-stage because dividing one
        * stage's max task by the SUM across all stages reads a
        * fatally skewed stage as balanced in multi-exchange queries;
        * material-only because every query ends in some tiny
        * single-task stage (a 6-row final sort is 1000 per-mille
        * "skewed" and means nothing). */
      shuffleSkewMilli: Long) {
    /** Records-crossing-the-wire per input record, in parts-per-1000
      * (0 = zero-shuffle; small = good map-side combine). */
    def shuffleAmplificationMilli: Long =
      if (inputRecords == 0) 0L else shuffleRecordsWritten * 1000L / inputRecords
  }

  private final class Collector extends SparkListener {
    val tasks = new AtomicInteger
    val inRec, inBytes, swRec, swBytes, srBytes, srRec, maxSrRec, diskSpill, memSpill, runMs = new AtomicLong
    // per-stage (total, max-task) shuffle-read records — skew must be
    // judged within a stage, not across the whole action
    val stageSr = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        tasks.incrementAndGet()
        inRec.addAndGet(m.inputMetrics.recordsRead)
        inBytes.addAndGet(m.inputMetrics.bytesRead)
        swRec.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        swBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        srBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        srRec.addAndGet(m.shuffleReadMetrics.recordsRead)
        maxSrRec.accumulateAndGet(m.shuffleReadMetrics.recordsRead, Math.max(_, _))
        val r = m.shuffleReadMetrics.recordsRead
        if (r > 0) stageSr.merge(t.stageId, (r, r),
          (a, b) => (a._1 + b._1, Math.max(a._2, b._2)))
        diskSpill.addAndGet(m.diskBytesSpilled)
        memSpill.addAndGet(m.memoryBytesSpilled)
        runMs.addAndGet(m.executorRunTime)
      }
    }
    def stageBreakdown: Seq[(Int, Long, Long)] = {
      val b = Seq.newBuilder[(Int, Long, Long)]
      stageSr.forEach((id, v) => b += ((id, v._1, v._2)))
      b.result().sortBy(_._1)
    }
    def stageSkewMilli: Long = {
      var grand = 0L
      stageSr.values.forEach { case (tot, _) => grand += tot }
      val floor = Math.max(grand / 20, 1000L)
      var worst = 0L
      stageSr.values.forEach { case (tot, mx) =>
        if (tot >= floor) worst = Math.max(worst, mx * 1000L / tot)
      }
      worst
    }
  }

  /** Per-batch streaming progress — the counterpart of the reference's
    * channel load monitor (ella-engine/src/metrics/load_monitor.rs:70-120:
    * per-channel input vs drain gauges behind a metrics server,
    * metrics/server.rs:16). On Structured Streaming the equivalent
    * signals arrive on every micro-batch: rows in, arrival rate vs
    * drain rate, trigger wall time, and watermark lag. A batch whose
    * arrival rate exceeds its drain rate is the backpressure signal —
    * sustained, it means the query is falling behind its source.
    */
  final case class BatchProgress(
      queryName: String,
      batchId: Long,
      numInputRows: Long,
      inputRowsPerSecond: Double,
      processedRowsPerSecond: Double,
      triggerExecMs: Long,
      batchTimestamp: String,
      watermark: Option[String]) {
    /** Arrival rate exceeded drain rate for this batch (NaN rates —
      * first batch, empty batch — never flag). */
    def overloaded: Boolean =
      numInputRows > 0 && inputRowsPerSecond > processedRowsPerSecond
    /** How far event-time progress trails the batch wall clock, when
      * the query has a watermark. */
    def watermarkLagMs: Option[Long] =
      watermark.filter(_.nonEmpty).flatMap { w =>
        try Some(java.time.Instant.parse(batchTimestamp).toEpochMilli -
          java.time.Instant.parse(w).toEpochMilli)
        catch { case _: java.time.format.DateTimeParseException => None }
      }
  }

  /** Accumulating [[org.apache.spark.sql.streaming.StreamingQueryListener]]:
    * attach with [[monitorStreams]], read `progress` / `overloaded`
    * any time, detach with [[stopMonitoring]].
    *
    * The buffer is a RING of the most recent `maxBatches` entries —
    * the reference's load monitor is a gauge, not an ever-growing
    * log, and a long-lived serve process with a short trigger
    * interval would otherwise accumulate one entry per batch on the
    * driver until it OOMs (1 s triggers ≈ 86k entries/day). */
  final class StreamMonitor(maxBatches: Int = 4096)
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    private val buf = new java.util.concurrent.ConcurrentLinkedQueue[BatchProgress]()
    def progress: Seq[BatchProgress] = {
      val it = buf.iterator(); val b = Seq.newBuilder[BatchProgress]
      while (it.hasNext) b += it.next()
      b.result()
    }
    def overloaded: Seq[BatchProgress] = progress.filter(_.overloaded)
    private[graft] def record(p: BatchProgress): Unit = {
      buf.add(p)
      while (buf.size > maxBatches) buf.poll()
    }
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val p = e.progress
      record(BatchProgress(
        Option(p.name).getOrElse(""),
        p.batchId,
        p.numInputRows,
        p.inputRowsPerSecond,
        p.processedRowsPerSecond,
        Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L),
        p.timestamp,
        Option(p.eventTime).flatMap(m => Option(m.get("watermark")))))
    }
  }

  /** Start recording per-batch progress for every streaming query on
    * the session. */
  def monitorStreams(spark: SparkSession): StreamMonitor = {
    val m = new StreamMonitor
    spark.streams.addListener(m)
    m
  }

  def stopMonitoring(spark: SparkSession, m: StreamMonitor): Unit =
    spark.streams.removeListener(m)

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
        c.srRec.get(), c.maxSrRec.get(),
        c.diskSpill.get(), c.memSpill.get(), c.runMs.get(),
        c.stageSkewMilli))
    } finally spark.sparkContext.removeSparkListener(c)
  }
}
