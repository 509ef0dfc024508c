package graft

import org.apache.spark.sql.functions._

/** The observability surface must MEASURE the scale claims the plans
  * make (SURVEY §4): zero-shuffle operators really move zero shuffle
  * bytes, and map-side combine really collapses the wire volume. */
class MetricsSpec extends SparkSpec {

  test("hash sampling measures zero shuffle traffic") {
    // the hashSample verb, not sp01: the sp01 query ends in an
    // orderBy purely for oracle determinism, which adds a (tiny)
    // range exchange that is not part of the sampling operator
    import graft.api._
    // noop sink: even count() would shuffle its per-partition partials
    val (_, m) = Metrics.measure(spark) {
      Tables(spark, sfDir, "documents").hashSample("doc_id", 0.25)
        .write.format("noop").mode("overwrite").save()
    }
    assert(m.tasks > 0 && m.inputRecords > 0)
    assert(m.shuffleBytesWritten == 0L,
      s"pure hash-filter sampling must not shuffle, saw ${m.shuffleBytesWritten} bytes")
    assert(m.diskBytesSpilled == 0L)
  }

  test("q01 map-side combine collapses shuffle records far below input records") {
    val (_, m) = Metrics.measure(spark) {
      // count() would let Spark shortcut the agg; collect the real result
      SparkEntry.queries("q01_agg")(spark, sfDir).collect()
    }
    assert(m.inputRecords > 1000, s"expected a real scan, read ${m.inputRecords}")
    assert(m.shuffleRecordsWritten > 0, "the agg must shuffle its partials")
    assert(m.shuffleAmplificationMilli < 100,
      s"partial agg should shuffle <10% of input records, " +
        s"saw ${m.shuffleRecordsWritten}/${m.inputRecords} " +
        s"(${m.shuffleAmplificationMilli} milli)")
  }

  test("broadcast star join (q04) never shuffles the fact side") {
    val fact = Tables(spark, sfDir, "customer").count()
    val (_, m) = Metrics.measure(spark) {
      SparkEntry.queries("q04_broadcast_join")(spark, sfDir).collect()
    }
    // the only shuffle allowed is the final agg/sort of the small result
    assert(m.shuffleRecordsWritten < fact,
      s"broadcast join must not shuffle the fact table: " +
        s"${m.shuffleRecordsWritten} shuffled vs $fact fact rows")
  }

  test("quality gate (tx17 verb) runs at scan speed: zero shuffle traffic") {
    // the "gate at scan speed" claim, measured: the frozen linear
    // classifier is per-row expressions only — nothing may re-key.
    import graft.api._
    val (_, m) = Metrics.measure(spark) {
      Tables(spark, sfDir, "documents").qualityGate("text")
        .write.format("noop").mode("overwrite").save()
    }
    assert(m.inputRecords > 0)
    assert(m.shuffleBytesWritten == 0L,
      s"the classifier gate must not shuffle, saw ${m.shuffleBytesWritten} bytes")
  }

  test("line dedup shuffles the line domain, never a doc self-join blowup") {
    // tx16's wire budget: the two line-domain exchanges + per-doc
    // rollup stay within a small constant of the line-instance count
    // (lines ~= words/10 per doc); a doc-pair self-join would square it.
    import graft.api._
    val docs = Tables(spark, sfDir, "documents")
    val lineCount = docs
      .select((((org.apache.spark.sql.functions.size(split(col("text"), " ")) - 1) / 10 + 1)
        .cast("long")).as("n"))
      .agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    val (_, m) = Metrics.measure(spark) {
      docs.lineDedup("doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    assert(m.shuffleRecordsWritten > 0)
    assert(m.shuffleRecordsWritten < lineCount * 4,
      s"line dedup should shuffle O(line instances): " +
        s"${m.shuffleRecordsWritten} shuffled vs $lineCount lines")
  }

  test("measure() isolates actions: a second measurement starts from zero") {
    val (_, m1) = Metrics.measure(spark) {
      Tables(spark, sfDir, "region").count()
    }
    val (_, m2) = Metrics.measure(spark) {
      spark.range(10).count()
    }
    assert(m1.inputRecords > 0)
    assert(m2.inputBytes == 0L, "range() reads no files; counters must not leak")
  }

  test("Tables.spread pays its partition probe once per scan, not per call") {
    // the probe (df.rdd.getNumPartitions) forces an extra physical
    // planning — it must be memoized per (session, canonical scan)
    Tables.spread(Tables(spark, sfDir, "region"))
    val after1 = Tables.spreadProbeCount
    (1 to 5).foreach(_ => Tables.spread(Tables(spark, sfDir, "region")))
    assert(Tables.spreadProbeCount == after1,
      "repeat spreads of the same scan must reuse the memoized probe")
    Tables.spread(Tables(spark, sfDir, "nation"))
    assert(Tables.spreadProbeCount == after1 + 1,
      "a different scan gets its own probe entry")
  }

  test("stream monitor records per-batch rows, rates, and watermark lag") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.TopicEvent
    import spark.implicits._
    implicit val sql = spark.sqlContext
    def ev(id: Long, t: String) =
      TopicEvent(id, java.sql.Timestamp.valueOf(t), 1, "click", 1.0)
    val mon = Metrics.monitorStreams(spark)
    val input = MemoryStream[TopicEvent]
    // watermarked windowed count, plus a per-row stall so the drain
    // rate is measurably low (the load the reference's channel
    // monitor watches for)
    val slow = udf { (v: Double) => Thread.sleep(5); v }
    val q = input.toDF()
      .withColumn("v", slow(col("value")))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour")).count()
      .writeStream.format("memory").queryName("mon_stats")
      .outputMode("update").start()
    try {
      // warmup batch absorbs first-trigger planning cost so the
      // arrival-rate denominator below is the SHORT gap after a fast
      // small batch, not a slow cold one
      input.addData(ev(1, "2024-01-01 00:01:00"))
      q.processAllAvailable()
      input.addData(ev(2, "2024-01-01 00:05:00"), ev(3, "2024-01-01 00:10:00"))
      q.processAllAvailable()
      // the big batch arrives right after the fast one finishes but
      // takes >= 2s to drain (400 rows x 5ms) — arrival rate exceeds
      // drain rate: the monitor must flag it
      input.addData((4L to 403L).map(i => ev(i, "2024-01-01 00:20:00")): _*)
      q.processAllAvailable()
      // progress events ride the async listener bus — drain before reading
      org.apache.spark.sql.graft.bridge.drainListenerBus(spark, 30000L)
      val prog = mon.progress.filter(p => p.queryName == "mon_stats" && p.numInputRows > 0)
      assert(prog.size >= 3, s"expected >=3 data batches, saw ${mon.progress}")
      assert(prog.map(_.numInputRows).sum == 403L,
        s"input rows must total 403: $prog")
      assert(prog.forall(_.triggerExecMs > 0))
      val big = prog.maxBy(_.numInputRows)
      assert(big.overloaded && mon.overloaded.contains(big),
        s"the 400-row slow batch must be flagged (arrival > drain): $big")
      // after the big batch the watermark trails its wall-clock
      // timestamp by years (2024 event time) — lag must be present
      // and positive once the watermark is set
      val lagged = prog.flatMap(_.watermarkLagMs)
      assert(lagged.nonEmpty && lagged.forall(_ > 0), s"watermark lag: $prog")
    } finally {
      q.stop()
      Metrics.stopMonitoring(spark, mon)
    }
  }

  test("stream monitor is a bounded ring, not an ever-growing log") {
    // a long-lived serve process with 1s triggers would otherwise hold
    // ~86k BatchProgress entries per day on the driver
    val mon = new Metrics.StreamMonitor(maxBatches = 3)
    def bp(id: Long) = Metrics.BatchProgress(
      "q", id, 1L, 1.0, 1.0, 1L, "2024-01-01T00:00:00.000Z", None)
    (1L to 10L).foreach(i => mon.record(bp(i)))
    val ids = mon.progress.map(_.batchId)
    assert(ids == Seq(8L, 9L, 10L),
      s"ring must keep only the newest maxBatches entries, got $ids")
  }

  test("provisioned dashboard queries only metric names the scrape actually serves") {
    // observability/grafana/dashboards/graft.json is the ready-to-
    // mount dashboard; a renamed counter would silently blank its
    // panels, so pin every graft_* token in its PromQL against a real
    // scrape body (counters appear as *_total under OpenMetrics)
    val dash = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/observability/grafana/dashboards/graft.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    val wanted = "graft_[a-z0-9_]+".r.findAllIn(dash).toSet
    assert(wanted.nonEmpty, "dashboard must reference graft_* metrics")
    val mon = new Metrics.StreamMonitor
    spark.streams.addListener(mon)
    val h = MetricsServer.start(spark, port = 0, monitor = Some(mon))
    try {
      Tables(spark, sfDir, "documents").count()
      mon.record(Metrics.BatchProgress(
        "dash", 1L, 1L, 1.0, 1.0, 1L, "2026-01-01T00:00:00.000Z", None))
      val conn = new java.net.URL(s"http://localhost:${h.port}/metrics")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      val body = try new String(conn.getInputStream.readAllBytes,
        java.nio.charset.StandardCharsets.UTF_8) finally conn.disconnect()
      val missing = wanted.filterNot(body.contains)
      assert(missing.isEmpty,
        s"dashboard references metrics the scrape never serves: $missing")
    } finally {
      h.stop()
      spark.streams.removeListener(mon)
    }
  }

  test("OpenMetrics endpoint serves query + stream gauges and releases its port on stop") {
    def scrape(port: Int): (String, String) = {
      val conn = new java.net.URL(s"http://localhost:$port/metrics")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      try {
        val body = new String(conn.getInputStream.readAllBytes,
          java.nio.charset.StandardCharsets.UTF_8)
        (body, conn.getContentType)
      } finally conn.disconnect()
    }
    // share a monitor so we can inject a stream sample without running
    // a real streaming query (the record path is spec-covered above)
    val mon = new Metrics.StreamMonitor
    spark.streams.addListener(mon)
    val h = MetricsServer.start(spark, port = 0, monitor = Some(mon))
    try {
      // generate task metrics, then inject a latest-batch stream sample
      Tables(spark, sfDir, "documents").count()
      mon.record(Metrics.BatchProgress(
        "scrape\"me", 7L, 42L, 50.0, 10.0, 12L, "2026-01-01T00:00:00.000Z", None))
      val (body, ctype) = scrape(h.port)
      assert(ctype.startsWith("application/openmetrics-text"), ctype)
      assert(body.endsWith("# EOF\n"), body.takeRight(80))
      val inputRec = body.linesIterator
        .find(_.startsWith("graft_input_records_total "))
        .map(_.split(' ')(1).toLong)
      assert(inputRec.exists(_ > 0), s"expected a positive input-records counter:\n$body")
      assert(body.contains("""graft_stream_input_rows{query="scrape\"me"} 42"""),
        s"stream gauge with escaped label missing:\n$body")
      assert(body.contains("""graft_stream_overloaded{query="scrape\"me"} 1"""),
        s"arrival 50 > drain 10 must gauge overloaded=1:\n$body")
      // the auth plane rides the same scrape: live minted connections
      assert(body.contains("graft_auth_active_tokens 0"),
        s"auth gauge must read 0 while token auth is off:\n$body")
      TokenAuth.install("metrics-spec-secret")
      try {
        val (_, j1) = TokenAuth.mint(); TokenAuth.mint()
        assert(scrape(h.port)._1.contains("graft_auth_active_tokens 2"))
        TokenAuth.revoke(j1)
        assert(scrape(h.port)._1.contains("graft_auth_active_tokens 1"))
      } finally TokenAuth.uninstall()
    } finally {
      h.stop()
      spark.streams.removeListener(mon)
    }
    h.stop() // idempotent
    // the port is actually released: a fresh bind on it succeeds
    val ss = new java.net.ServerSocket(h.port)
    ss.close()
  }
}
