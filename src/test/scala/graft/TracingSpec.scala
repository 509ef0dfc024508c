package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** OTLP span export driven against a local collector: query spans,
  * micro-batch spans, batching, JSON shape, and clean stop. */
class TracingSpec extends SparkSpec {

  private def withCollector(f: (String, ConcurrentLinkedQueue[String]) => Unit): Unit = {
    val bodies = new ConcurrentLinkedQueue[String]()
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/v1/traces", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        bodies.add(new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
        x.sendResponseHeaders(200, -1L)
        x.close()
      }
    })
    server.start()
    try f(s"http://localhost:${server.getAddress.getPort}/v1/traces", bodies)
    finally server.stop(0)
  }

  private def awaitSpans(bodies: ConcurrentLinkedQueue[String], needle: String,
                         timeoutMs: Long = 15000L): String = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline) {
      val hit = bodies.toArray(Array.empty[String]).find(_.contains(needle))
      if (hit.isDefined) return hit.get
      Thread.sleep(50)
    }
    fail(s"no OTLP POST containing '$needle' arrived within ${timeoutMs}ms; " +
      s"got ${bodies.size} bodies")
  }

  test("query actions export OTLP spans; stop() detaches and flushes") {
    withCollector { (endpoint, bodies) =>
      val h = Tracing.start(spark, endpoint, flushMs = 50L)
      try {
        spark.range(1000).selectExpr("sum(id)").collect()
        val body = awaitSpans(bodies, "\"name\":\"query:collect\"")
        // OTLP/HTTP JSON envelope: resource service.name + span ids of
        // the right width + nano timestamps ordered
        assert(body.contains("\"resourceSpans\""))
        assert(body.contains("\"service.name\",\"value\":{\"stringValue\":\"graft\"}"))
        val m = """"traceId":"([0-9a-f]+)","spanId":"([0-9a-f]+)"""".r
          .findFirstMatchIn(body).getOrElse(fail("no span ids in body"))
        assert(m.group(1).length == 32 && m.group(2).length == 16,
          "OTLP ids must be 16-byte trace / 8-byte span hex")
        val ts = """"startTimeUnixNano":"(\d+)","endTimeUnixNano":"(\d+)"""".r
          .findFirstMatchIn(body).getOrElse(fail("no timestamps in body"))
        assert(ts.group(1).toLong <= ts.group(2).toLong)
      } finally h.stop()
      // after stop: new actions must not enqueue (sent stays put)
      val sentAfterStop = h.sent.get
      spark.range(10).collect()
      Thread.sleep(200)
      h.flush()
      assert(h.sent.get == sentAfterStop, "a stopped exporter must not export")
    }
  }

  test("streaming micro-batches export spans with batch id and row count") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    withCollector { (endpoint, bodies) =>
      val h = Tracing.start(spark, endpoint, flushMs = 50L)
      val input = MemoryStream[Int]
      val q = input.toDS().withColumn("v", col("value") * 2)
        .writeStream.format("memory").queryName("traced_stream")
        .outputMode("append").start()
      try {
        input.addData(1 to 7: _*)
        q.processAllAvailable()
        val body = awaitSpans(bodies, "\"name\":\"stream:traced_stream\"")
        assert(body.contains("\"key\":\"input_rows\",\"value\":{\"intValue\":\"7\"}"),
          s"micro-batch span must carry the row count: $body")
        assert(body.contains("\"key\":\"batch_id\""))
      } finally { q.stop(); h.stop() }
    }
  }

  test("a dead collector never blocks or grows state past the bound") {
    // endpoint nobody listens on: spans drop, queries still run
    val h = Tracing.start(spark, "http://localhost:1/v1/traces", flushMs = 20L)
    try {
      (1 to 3).foreach(_ => spark.range(100).collect())
      Thread.sleep(100)
      // the flusher drained the queue into failed sends — the point is
      // the query path above never threw and nothing accumulates
      assert(spark.range(5).count() == 5L)
    } finally h.stop()
  }
}
