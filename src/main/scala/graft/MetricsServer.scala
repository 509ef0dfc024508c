package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** OpenMetrics scrape endpoint — the counterpart of the reference's
  * metrics server (ella-engine/src/metrics/server.rs:16
  * `MetricsServer::start`: an HTTP endpoint encoding the prometheus
  * registry as `application/openmetrics-text`, with a graceful stop).
  *
  * The Spark-first registry is two gauge families:
  *   - **query plane** (a session-lifetime TaskEnd listener, the
  *     long-lived form of [[Metrics.measure]]'s per-action collector):
  *     cumulative tasks, input records/bytes, shuffle write/read
  *     records+bytes, disk/memory spill, executor run time. At 100 TB
  *     the shuffle counters ARE the load signal — a scrape series
  *     whose shuffle-bytes slope outruns its input-bytes slope is the
  *     backpressure alarm the reference's buffer-load gauges raise
  *     (metrics/load_monitor.rs).
  *   - **stream plane** (a [[Metrics.StreamMonitor]]): latest-batch
  *     gauges per named streaming query — input rows, arrival vs
  *     drain rate, trigger wall ms, watermark lag, overloaded flag —
  *     the per-channel in/out gauges of the reference's load monitor.
  *
  * Scrape cost is driver-only and O(queries): no job runs, nothing
  * touches executors — safe at any scrape interval. `stop()` releases
  * the port and detaches both listeners (run-down of the reference's
  * `MetricsServer::stop`).
  *
  * Usage: `val h = MetricsServer.start(spark); … ; h.stop()`; or let
  * [[Serve]] own it via `GRAFT_METRICS_PORT`.
  */
object MetricsServer {
  private val ContentType =
    "application/openmetrics-text; version=1.0.0; charset=utf-8"

  /** Session-lifetime cumulative task counters (monotone — exposed as
    * OpenMetrics counters, so scrapers can `rate()` them). */
  private final class Cumulative extends SparkListener {
    val tasks = new AtomicInteger
    val inRec, inBytes, swRec, swBytes, srRec, srBytes, diskSpill, memSpill, runMs =
      new AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        tasks.incrementAndGet()
        inRec.addAndGet(m.inputMetrics.recordsRead)
        inBytes.addAndGet(m.inputMetrics.bytesRead)
        swRec.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        swBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        srRec.addAndGet(m.shuffleReadMetrics.recordsRead)
        srBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        diskSpill.addAndGet(m.diskBytesSpilled)
        memSpill.addAndGet(m.memoryBytesSpilled)
        runMs.addAndGet(m.executorRunTime)
      }
    }
  }

  final class Handle private[MetricsServer] (
      server: HttpServer,
      spark: SparkSession,
      cum: Cumulative,
      monitor: Metrics.StreamMonitor,
      ownsMonitor: Boolean) {
    /** Bound port (useful with `port = 0` ephemeral binding in tests). */
    def port: Int = server.getAddress.getPort
    @volatile private var stopped = false
    /** Release the port and detach the listeners; idempotent. */
    def stop(): Unit = synchronized {
      if (!stopped) {
        stopped = true
        server.stop(0)
        spark.sparkContext.removeSparkListener(cum)
        if (ownsMonitor) Metrics.stopMonitoring(spark, monitor)
      }
    }
  }

  /** Start scraping on `port` (0 = ephemeral; read it back via
    * `handle.port`). Pass an existing [[Metrics.StreamMonitor]] to
    * share one progress ring with in-process readers; otherwise the
    * server attaches (and on stop detaches) its own.
    *
    * `adminSecret`: when set, also expose the token-handshake surface
    * (≙ the reference's flight `do_handshake` riding next to its
    * metrics server): `POST /token` with `Authorization: Bearer
    * <adminSecret>` mints + registers a [[TokenAuth]] connection
    * token (response body = the token; `X-Graft-Jti` header = its
    * id); `DELETE /token/<jti>` (same gate) revokes it. Both are
    * driver-local map operations — no Spark job.
    *
    * The handshake speaks plain HTTP: tokens transit in the clear, so
    * this port must sit behind TLS termination or on a loopback /
    * trusted network (the same deployment constraint as the
    * reference's flight handshake). The admin-secret check itself is
    * constant-time (`MessageDigest.isEqual`), so the gate does not
    * leak the secret through timing even on an exposed port. */
  def start(spark: SparkSession, port: Int = 9090,
            monitor: Option[Metrics.StreamMonitor] = None,
            adminSecret: Option[String] = None): Handle = {
    val cum = new Cumulative
    // bind FIRST: a BindException must not leave a listener or stream
    // monitor permanently attached to the live session
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    spark.sparkContext.addSparkListener(cum)
    val mon = monitor.getOrElse(Metrics.monitorStreams(spark))
    server.createContext("/metrics", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val body = render(cum, mon).getBytes(StandardCharsets.UTF_8)
        x.getResponseHeaders.set("Content-Type", ContentType)
        x.sendResponseHeaders(200, body.length.toLong)
        val os = x.getResponseBody
        try os.write(body) finally os.close()
      }
    })
    adminSecret.foreach { secret =>
      server.createContext("/token", new HttpHandler {
        private def respond(x: HttpExchange, code: Int, body: String): Unit = {
          val b = body.getBytes(StandardCharsets.UTF_8)
          x.sendResponseHeaders(code, if (b.length == 0) -1L else b.length.toLong)
          val os = x.getResponseBody
          try os.write(b) finally os.close()
        }
        // constant-time: a straight String == would let an attacker
        // probe the admin secret byte-by-byte through response timing
        private def secretOk(auth: Option[String]): Boolean =
          auth.exists(a => java.security.MessageDigest.isEqual(
            a.getBytes(StandardCharsets.UTF_8),
            s"Bearer $secret".getBytes(StandardCharsets.UTF_8)))
        override def handle(x: HttpExchange): Unit = {
          val auth = Option(x.getRequestHeaders.getFirst("Authorization"))
          if (!secretOk(auth))
            respond(x, 401, "admin bearer required")
          else (x.getRequestMethod, x.getRequestURI.getPath) match {
            case ("POST", "/token") =>
              val (token, jti) = TokenAuth.mint()
              x.getResponseHeaders.set("X-Graft-Jti", jti)
              respond(x, 200, token)
            case ("DELETE", p) if p.startsWith("/token/") =>
              val jti = p.stripPrefix("/token/")
              if (TokenAuth.revoke(jti)) respond(x, 200, "revoked")
              else respond(x, 404, "no such connection id")
            case _ => respond(x, 405, "POST /token or DELETE /token/<jti>")
          }
        }
      })
    }
    server.start()
    new Handle(server, spark, cum, mon, ownsMonitor = monitor.isEmpty)
  }

  /** OpenMetrics label values: escape backslash, quote, newline. */
  private def esc(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '"'  => "\\\""
      case '\n' => "\\n"
      case c    => c.toString
    }

  private def render(cum: Cumulative, mon: Metrics.StreamMonitor): String = {
    val sb = new StringBuilder(2048)
    def counter(name: String, help: String, v: Long): Unit = {
      sb ++= s"# TYPE $name counter\n# HELP $name $help\n"
      sb ++= s"${name}_total $v\n"
    }
    counter("graft_tasks", "completed Spark tasks", cum.tasks.get.toLong)
    counter("graft_input_records", "records read from sources", cum.inRec.get)
    counter("graft_input_bytes", "bytes read from sources", cum.inBytes.get)
    counter("graft_shuffle_write_records", "records written to shuffle", cum.swRec.get)
    counter("graft_shuffle_write_bytes", "bytes written to shuffle", cum.swBytes.get)
    counter("graft_shuffle_read_records", "records read from shuffle", cum.srRec.get)
    counter("graft_shuffle_read_bytes", "bytes read from shuffle", cum.srBytes.get)
    counter("graft_disk_spill_bytes", "bytes spilled to disk", cum.diskSpill.get)
    counter("graft_memory_spill_bytes", "bytes spilled in memory", cum.memSpill.get)
    counter("graft_executor_run_ms", "executor task run time ms", cum.runMs.get)

    // one gauge sample per streaming query: its LATEST batch (the ring
    // holds history for in-process readers; a scrape is a gauge read)
    val latest = mon.progress.groupBy(_.queryName)
      .map { case (_, ps) => ps.maxBy(_.batchId) }
      .toSeq.sortBy(_.queryName)
    def gauge(name: String, help: String)(f: Metrics.BatchProgress => Option[Double]): Unit = {
      sb ++= s"# TYPE $name gauge\n# HELP $name $help\n"
      latest.foreach { p =>
        f(p).foreach { v =>
          val s =
            if (v.isNaN) "NaN"
            else if (v == v.floor && !v.isInfinite) v.toLong.toString
            else v.toString
          sb ++= s"""$name{query="${esc(p.queryName)}"} $s\n"""
        }
      }
    }
    gauge("graft_stream_batch_id", "latest micro-batch id")(p => Some(p.batchId.toDouble))
    gauge("graft_stream_input_rows", "rows in latest batch")(p => Some(p.numInputRows.toDouble))
    gauge("graft_stream_input_rows_per_second", "arrival rate")(p => Some(p.inputRowsPerSecond))
    gauge("graft_stream_processed_rows_per_second", "drain rate")(p => Some(p.processedRowsPerSecond))
    gauge("graft_stream_trigger_exec_ms", "latest trigger wall time ms")(p => Some(p.triggerExecMs.toDouble))
    gauge("graft_stream_watermark_lag_ms", "batch wall clock minus watermark")(
      _.watermarkLagMs.map(_.toDouble))
    gauge("graft_stream_overloaded", "1 if arrival rate exceeded drain rate")(
      p => Some(if (p.overloaded) 1.0 else 0.0))
    // auth plane: live minted connections (0 when token auth is off)
    sb ++= "# TYPE graft_auth_active_tokens gauge\n"
    sb ++= "# HELP graft_auth_active_tokens registered minted connection tokens\n"
    sb ++= s"graft_auth_active_tokens ${TokenAuth.activeTokens}\n"
    sb ++= "# EOF\n"
    sb.result()
  }
}
