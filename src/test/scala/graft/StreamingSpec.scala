package graft

import graft.streaming.{AnnQuery, TopicEvent, TopicStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured Streaming behavior driven through MemoryStream: windowed
  * stats with watermark, stateful latest-per-key, stream-static join. */
class StreamingSpec extends SparkSpec {
  import TestEvents._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def events(): Seq[TopicEvent] = Seq(
    TopicEvent(1, ts("2024-01-01 00:05:00"), 1, "click", 1.00),
    TopicEvent(2, ts("2024-01-01 00:15:00"), 1, "click", 2.00),
    TopicEvent(3, ts("2024-01-01 00:45:00"), 2, "view", 3.00),
    TopicEvent(4, ts("2024-01-01 01:05:00"), 1, "click", 4.00),
    TopicEvent(5, ts("2024-01-01 01:10:00"), 2, "view", 5.00))

  test("windowed stats aggregate per (window, event_type)") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[TopicEvent]
    val q = TopicStream.windowedStats(input.toDF(), "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("win_stats").outputMode("complete").start()
    try {
      input.addData(events(): _*)
      q.processAllAvailable()
      val rows = spark.table("win_stats").collect()
        .map(r => (r.getAs[java.sql.Timestamp]("w_start").toString, r.getAs[String]("event_type"),
          r.getAs[Long]("n"), r.getAs[Long]("sum_value_cents"))).toSet
      assert(rows == Set(
        ("2024-01-01 00:00:00.0", "click", 2L, 300L),
        ("2024-01-01 00:00:00.0", "view", 1L, 300L),
        ("2024-01-01 01:00:00.0", "click", 1L, 400L),
        ("2024-01-01 01:00:00.0", "view", 1L, 500L)))
    } finally q.stop()
  }

  test("streaming OHLC candles track open/high/low/close per window") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[TopicEvent]
    val q = TopicStream.ohlcStream(input.toDF(), "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("ohlc").outputMode("complete").start()
    try {
      input.addData(
        TopicEvent(1, ts("2024-01-01 00:05:00"), 1, "trade", 10.00),
        TopicEvent(2, ts("2024-01-01 00:20:00"), 1, "trade", 14.00),
        TopicEvent(3, ts("2024-01-01 00:40:00"), 2, "trade", 6.00),
        TopicEvent(4, ts("2024-01-01 00:55:00"), 1, "trade", 12.00))
      q.processAllAvailable()
      val r = spark.table("ohlc").collect().map(x =>
        (x.getAs[java.sql.Timestamp]("w_start").toString,
          x.getAs[Long]("open_c"), x.getAs[Long]("high_c"),
          x.getAs[Long]("low_c"), x.getAs[Long]("close_c"),
          x.getAs[Long]("volume"))).toSet
      assert(r == Set(("2024-01-01 00:00:00.0", 1000L, 1400L, 600L, 1200L, 4L)))
      // a later event revises the candle's close and high
      input.addData(TopicEvent(5, ts("2024-01-01 00:58:00"), 1, "trade", 15.00))
      q.processAllAvailable()
      val r2 = spark.table("ohlc").collect().map(x =>
        (x.getAs[Long]("open_c"), x.getAs[Long]("high_c"), x.getAs[Long]("close_c"),
          x.getAs[Long]("volume"))).toSet
      assert(r2 == Set((1000L, 1500L, 1500L, 5L)))
    } finally q.stop()
  }

  test("streaming funnel: live per-user stage resolution, late anchors upgrade AND revoke") {
    import spark.implicits._
    import graft.api._
    implicit val sql = spark.sqlContext
    // base offset keeps every event above Spark's initial watermark (0),
    // so "late" is governed by watermarkDelay, not the epoch corner
    val B = 100000L
    def t(sec: Long) = new java.sql.Timestamp((B + sec) * 1000L)
    def us(sec: Long) = (B + sec) * 1000000L
    val stages = Seq("signup", "view", "purchase")
    val input = MemoryStream[TopicEvent]
    val q = TopicStream.funnelStream(input.toDS(), stages, tolSeconds = 100L)
      .writeStream.format("memory").queryName("funnel").outputMode("update").start()
    def rows() = spark.table("funnel").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Seq[Long]]("matched_us"), r.getAs[Int]("depth")))
    val b1 = Seq(
      // u1: view+purchase BEFORE any signup -> depth 0
      TopicEvent(1, t(100), 1L, "view", 0), TopicEvent(2, t(110), 1L, "purchase", 0),
      // u3: complete-looking 2-stage run anchored late
      TopicEvent(3, t(1000), 3L, "signup", 0), TopicEvent(4, t(1010), 3L, "view", 0))
    val b2 = Seq(
      // u1's signup arrives LATE and slots BEFORE the view -> depth 3
      TopicEvent(5, t(95), 1L, "signup", 0),
      // u3's EARLIER signup arrives late: anchor moves to 0, the view
      // at 1010 falls outside [0, 100] -> depth REVOKED to 1
      TopicEvent(6, t(0), 3L, "signup", 0))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      val r1 = rows().toSet
      assert(r1 == Set((1L, Seq.empty[Long], 0), (3L, Seq(us(1000), us(1010)), 2)))
      input.addData(b2: _*); q.processAllAvailable()
      val delta = rows().toSet -- r1
      assert(delta == Set(
        (1L, Seq(us(95), us(100), us(110)), 3),
        (3L, Seq(us(0)), 1)))
      // a purchase that does not change u1's resolution emits NOTHING
      val n = rows().length
      input.addData(TopicEvent(7, t(120), 1L, "purchase", 0)); q.processAllAvailable()
      assert(rows().length == n, "unchanged resolution must not re-emit")
      // the stream's final resolutions equal batch api.funnel on the union
      val all = (b1 ++ b2 :+ TopicEvent(7, t(120), 1L, "purchase", 0)).toDF()
      val batch = all.funnel("user_id", "ts", "event_type", stages, tolSeconds = 100L)
        .collect().map { r =>
          val ms = Seq(r.getAs[java.sql.Timestamp]("t_1"),
            r.getAs[java.sql.Timestamp]("t_2"), r.getAs[java.sql.Timestamp]("t_3"))
            .takeWhile(_ != null).map(x => x.getTime * 1000L)
          (r.getAs[Long]("user_id"), ms, r.getAs[Long]("depth").toInt)
        }.toSet
      val latest = rows().groupBy(_._1).map { case (_, rs) => rs.last }.toSet
      assert(latest == batch, s"stream $latest != batch $batch")
    } finally q.stop()
  }

  test("streaming funnel: freeze timeout collapses anchored users, evicts unanchored ones") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val B = 100000L
    def t(sec: Long) = new java.sql.Timestamp((B + sec) * 1000L)
    def us(sec: Long) = (B + sec) * 1000000L
    val stages = Seq("signup", "view")
    val input = MemoryStream[TopicEvent]
    // tight watermark: 10 s delay, 100 s tolerance
    val q = TopicStream.funnelStream(input.toDS(), stages, tolSeconds = 100L,
        watermarkDelay = "10 seconds")
      .writeStream.format("memory").queryName("funnel_frz").outputMode("update").start()
    def rows() = spark.table("funnel_frz").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Seq[Long]]("matched_us"), r.getAs[Int]("depth")))
    try {
      // u1 anchors at 0; u2 has only a view (unanchored)
      input.addData(TopicEvent(1, t(0), 1L, "signup", 0), TopicEvent(2, t(5), 2L, "view", 0))
      q.processAllAvailable()
      assert(rows().toSet == Set((1L, Seq(us(0)), 1), (2L, Seq.empty[Long], 0)))
      // advance the watermark far past both freeze points (u1: 0+100 s,
      // u2: its last candidate) — fires both event-time timeouts
      input.addData(TopicEvent(3, t(1000), 9L, "signup", 0)); q.processAllAvailable()
      input.addData(TopicEvent(4, t(2000), 9L, "view", 0)); q.processAllAvailable()
      val n = rows().length
      // u1 is frozen: an admissible later view can no longer chain ([0,100] lapsed) -> no emit
      input.addData(TopicEvent(5, t(1995), 1L, "view", 0)); q.processAllAvailable()
      assert(rows().length == n, "frozen anchored user must not re-emit")
      // u2 was evicted: a fresh signup starts a NEW chain (batch-consistent:
      // its old sub-watermark view could never have chained to this anchor)
      input.addData(TopicEvent(6, t(1996), 2L, "signup", 0)); q.processAllAvailable()
      assert(rows().toSet.contains((2L, Seq(us(1996)), 1)))
    } finally q.stop()
  }

  test("streaming retention: cohorts move under late arrivals, matrix equals batch ts22") {
    import spark.implicits._
    import graft.api._
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_sret").toString
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 24 * 60)
    val input = MemoryStream[TopicEvent]
    val q = TopicStream.retentionStream(input.toDF(), store, "acts")
      .option("checkpointLocation", s"$root/_chk").start()
    def t(day: Int, hour: Int) = ts(f"2024-01-$day%02d $hour%02d:00:00")
    val b1 = Seq(
      TopicEvent(1, t(5, 9), 1L, "view", 0),   // u1 first seen day 5
      TopicEvent(2, t(6, 9), 1L, "view", 0),
      TopicEvent(3, t(5, 10), 2L, "view", 0))  // u2 day 5 only
    val b2 = Seq(
      // LATE: u1 was actually first active on day 2 — cohort MOVES
      TopicEvent(4, t(2, 8), 1L, "view", 0),
      TopicEvent(5, t(6, 11), 2L, "view", 0))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      val m1 = TopicStream.currentRetention(store, "acts")
        .select("cohort_day", "day_offset", "n_active", "n_cohort")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(m1 == Set(("2024-01-05", 0L, 2L, 2L), ("2024-01-05", 1L, 1L, 2L)))
      input.addData(b2: _*); q.processAllAvailable()
      val m2 = TopicStream.currentRetention(store, "acts")
        .select("cohort_day", "day_offset", "n_active", "n_cohort")
        .as[(String, Long, Long, Long)].collect().toSet
      // u1's cohort moved to day 2 (offsets 0/3/4); u2 alone in day-5
      assert(m2 == Set(
        ("2024-01-02", 0L, 1L, 1L), ("2024-01-02", 3L, 1L, 1L), ("2024-01-02", 4L, 1L, 1L),
        ("2024-01-05", 0L, 1L, 1L), ("2024-01-05", 1L, 1L, 1L)))
      // and the stream state derives EXACTLY batch ts22 on the union
      val batch = (b1 ++ b2).toDF()
        .retentionMatrix("user_id", "ts")
        .select(date_format(col("cohort"), "yyyy-MM-dd"),
          datediff(col("bucket"), col("cohort")).cast("long"),
          col("n_active"), col("n_cohort"))
        .as[(String, Long, Long, Long)].collect().toSet
      assert(m2 == batch, s"stream $m2 != batch $batch")
      // replay idempotence: re-adding the same facts changes nothing
      input.addData(b2: _*); q.processAllAvailable()
      val m3 = TopicStream.currentRetention(store, "acts")
        .select("cohort_day", "day_offset", "n_active", "n_cohort")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(m3 == m2, "replayed facts must not change the matrix")
      // the SAME activity topic powers the stickiness report: the
      // stream read must equal the batch ts31 kernel over the union
      val ss = TopicStream.currentStickiness(store, "acts")
        .as[(String, Long, Long, Long, Long)].collect().toSet
      val sb = (b1 ++ b2).toDF().stickiness("user_id", "ts")
        .as[(String, Long, Long, Long, Long)].collect().toSet
      assert(ss == sb && ss.nonEmpty, s"stickiness stream $ss != batch $sb")
    } finally q.stop()
  }

  test("streaming retention: OUT-OF-ORDER replay after restart (batchId regression) leaves the merged read unchanged") {
    // The recovery contract every content-keyed state topic leans on,
    // proven here beyond the packer: a writer restart with a FRESH
    // checkpoint regresses batchId to 0 and may re-deliver old
    // batches in any order. seqBase re-anchors the new generation's
    // _seq above the old one's, and content keys make the re-written
    // rows identical — so last-write-wins resolves to the same facts
    // and the merged read cannot move.
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_sooo").toString
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 24 * 60)
    def t(day: Int, hour: Int) = ts(f"2024-01-$day%02d $hour%02d:00:00")
    val b1 = Seq(
      TopicEvent(1, t(5, 9), 1L, "view", 0),
      TopicEvent(2, t(6, 9), 1L, "view", 0),
      TopicEvent(3, t(5, 10), 2L, "view", 0))
    val b2 = Seq(
      TopicEvent(4, t(2, 8), 1L, "view", 0),
      TopicEvent(5, t(6, 11), 2L, "view", 0))
    def matrix() = TopicStream.currentRetention(store, "acts")
      .select("cohort_day", "day_offset", "n_active", "n_cohort")
      .as[(String, Long, Long, Long)].collect().toSet
    // first writer generation: b1 as batch 0, b2 as batch 1
    val inA = MemoryStream[TopicEvent]
    val qA = TopicStream.retentionStream(inA.toDF(), store, "acts")
      .option("checkpointLocation", s"$root/_chkA").start()
    val before = try {
      inA.addData(b1: _*); qA.processAllAvailable()
      inA.addData(b2: _*); qA.processAllAvailable()
      matrix()
    } finally qA.stop()
    assert(before.nonEmpty)
    val seqHigh = store.read("acts").agg(max(col("_seq"))).head.getLong(0)
    // second generation, FRESH checkpoint: batchId regresses to 0 and
    // the old batches replay REVERSED — b2 arrives first
    val inB = MemoryStream[TopicEvent]
    val qB = TopicStream.retentionStream(inB.toDF(), store, "acts")
      .option("checkpointLocation", s"$root/_chkB").start()
    try {
      inB.addData(b2: _*); qB.processAllAvailable()
      inB.addData(b1: _*); qB.processAllAvailable()
      assert(matrix() == before,
        "out-of-order replay must not move the merged read")
      // the new generation really did write (seqs advanced past the
      // old generation's) — the stability above is last-write-wins
      // over identical content, not a skipped write
      val seqHigh2 = store.read("acts").agg(max(col("_seq"))).head.getLong(0)
      assert(seqHigh2 > seqHigh, "generation B must re-anchor _seq above A")
      // and the stickiness read off the same topic is equally stable
      val ss = TopicStream.currentStickiness(store, "acts")
        .as[(String, Long, Long, Long, Long)].collect().toSet
      val sb = {
        import graft.api._
        (b1 ++ b2).toDF().stickiness("user_id", "ts")
          .as[(String, Long, Long, Long, Long)].collect().toSet
      }
      assert(ss == sb && ss.nonEmpty)
    } finally qB.stop()
  }

  test("streaming LTV: event-grain revenue ledger + moving cohorts equal batch ts32") {
    import spark.implicits._
    import graft.api._
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_sltv").toString
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 24 * 60)
    val input = MemoryStream[TopicEvent]
    val qa = TopicStream.retentionStream(input.toDF(), store, "acts")
      .option("checkpointLocation", s"$root/_chka").start()
    val qr = TopicStream.ltvStream(input.toDF(), store, "rev")
      .option("checkpointLocation", s"$root/_chkr").start()
    def t(day: Int, hour: Int) = ts(f"2024-01-$day%02d $hour%02d:00:00")
    val b1 = Seq(
      TopicEvent(1, t(5, 9), 1L, "purchase", 1.00),
      // same-day second purchase: the event-grain ledger must ADD it
      // (an overwrite-by-(user, day) key would silently drop it)
      TopicEvent(2, t(5, 10), 1L, "purchase", 0.25),
      TopicEvent(3, t(6, 9), 2L, "view", 0))
    val b2 = Seq(
      TopicEvent(4, t(2, 8), 1L, "view", 0), // LATE earlier: u1's cohort MOVES
      TopicEvent(5, t(7, 9), 2L, "purchase", 0.50))
    def read() = TopicStream.currentLtv(store, "acts", "rev")
      .select("cohort_day", "age_day", "rev_cents", "cum_cents", "n_cohort", "ltv_milli_cents")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    def drain(evs: Seq[TopicEvent]): Unit = {
      input.addData(evs: _*); qa.processAllAvailable(); qr.processAllAvailable()
    }
    try {
      drain(b1)
      assert(read() == Set(("2024-01-05", 0L, 125L, 125L, 1L, 125000L)))
      drain(b2)
      val m2 = read()
      val batch = (b1 ++ b2).toDF()
        .ltvMatrix("user_id", "ts", col("event_type") === "purchase",
          round(col("value") * 100).cast("long"))
        .as[(String, Long, Long, Long, Long, Long)].collect().toSet
      assert(m2 == batch && m2.nonEmpty, s"stream $m2 != batch $batch")
      // the moved cohort re-ages the day-5 purchases to offset 3
      assert(m2.contains(("2024-01-02", 3L, 125L, 125L, 1L, 125000L)))
      // replay idempotence: re-adding the same facts changes nothing
      drain(b2)
      assert(read() == m2, "replayed revenue facts must not double-count")
    } finally { qa.stop(); qr.stop() }
  }

  test("streaming quantiles: additive histogram partials fold to batch ts35 across batches") {
    import spark.implicits._
    import graft.api._
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_shist").toString
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 24 * 60)
    val input = MemoryStream[TopicEvent]
    val q = TopicStream.histStream(input.toDF(), store, "hist")
      .option("checkpointLocation", s"$root/_chk").start()
    def t(day: Int, hour: Int) = ts(f"2024-01-$day%02d $hour%02d:00:00")
    // the 1.50 bucket's count splits across batches: 1 + 2 fold to 3
    val b1 = Seq(
      TopicEvent(1, t(1, 9), 1L, "view", 1.50), TopicEvent(2, t(1, 10), 2L, "view", 2.50),
      TopicEvent(3, t(1, 11), 3L, "view", 9.00))
    val b2 = Seq(
      TopicEvent(4, t(2, 9), 1L, "view", 1.50), TopicEvent(5, t(2, 10), 4L, "view", 1.50),
      TopicEvent(6, t(2, 11), 5L, "click", 4.00))
    def read() = TopicStream.currentQuantiles(store, "hist")
      .select("key", "q_milli", "cents", "n")
      .as[(String, Int, Long, Long)].collect().toSet
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val stream = read()
      val batch = (b1 ++ b2).toDF()
        .withColumn("cents", round(col("value") * 100).cast("long"))
        .histQuantiles("event_type", "cents")
        .select(col("event_type").as("key"), col("q_milli"), col("cents"), col("n"))
        .as[(String, Int, Long, Long)].collect().toSet
      assert(stream == batch && stream.nonEmpty, s"stream $stream != batch $batch")
      // hand-check: view cents sorted = (150,150,150,250,900), n=5 —
      // p50 needs cum≥2.5 → 150; p75 needs cum≥3.75 → 250; p99 → 900
      assert(stream.contains(("view", 500, 150L, 5L)))
      assert(stream.contains(("view", 750, 250L, 5L)))
      assert(stream.contains(("view", 990, 900L, 5L)))
      assert(stream.contains(("click", 500, 400L, 1L)))
    } finally q.stop()
  }

  test("streaming WoW: additive week-count partials fold to the batch kernel across batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_swow").toString
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 24 * 60)
    val input = MemoryStream[TopicEvent]
    val q = TopicStream.wowStream(input.toDF(), store, "wow")
      .option("checkpointLocation", s"$root/_chk").start()
    // three consecutive epoch-weeks; week 2's count SPLITS across the
    // two micro-batches (2 + 1 fold to 3)
    def t(day: Int) = ts(f"2024-01-$day%02d 12:00:00")
    val b1 = Seq(
      TopicEvent(1, t(1), 1L, "view", 1.0), TopicEvent(2, t(2), 2L, "view", 1.0),
      TopicEvent(3, t(8), 3L, "view", 1.0), TopicEvent(4, t(9), 4L, "view", 1.0))
    val b2 = Seq(
      TopicEvent(5, t(10), 5L, "view", 1.0),
      TopicEvent(6, t(15), 6L, "view", 1.0))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val stream = TopicStream.currentWow(store, "wow")
        .select("event_type", "wk", "n_events", "n_prev", "growth_milli")
        .as[(String, Long, Long, Long, Long)].collect().toSet
      val batch = graft.operators.TimeSeries.wowOf((b1 ++ b2).toDF()
          .groupBy(col("event_type"), expr("CAST(ts AS LONG) DIV 604800").as("wk"))
          .agg(count(lit(1)).as("n_events")))
        .as[(String, Long, Long, Long, Long)].collect().toSet
      assert(stream == batch && stream.nonEmpty, s"stream $stream != batch $batch")
      // hand-check: weeks hold 2/3/1 views → growth 500 then -666
      val g = stream.toSeq.sortBy(_._2).map(r => (r._3, r._4, r._5))
      assert(g == Seq((3L, 2L, 500L), (1L, 3L, -666L)), s"got $g")
    } finally q.stop()
  }

  test("streaming trend: additive daily partials fold to the ts39 Theil-Sen kernel across batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_strend").toString
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 24 * 60)
    val input = MemoryStream[TopicEvent]
    val q = TopicStream.trendStream(input.toDF(), store, "trend")
      .option("checkpointLocation", s"$root/_chk").start()
    def t(day: Int) = ts(f"2024-01-$day%02d 12:00:00")
    // 'view' grows 1/2/3 across three days; day 2's count SPLITS
    // across the micro-batches (1 + 1 fold to 2)
    val b1 = Seq(
      TopicEvent(1, t(1), 1L, "view", 1.0),
      TopicEvent(2, t(2), 2L, "view", 1.0),
      TopicEvent(3, t(3), 3L, "view", 1.0), TopicEvent(4, t(3), 4L, "view", 1.0))
    val b2 = Seq(
      TopicEvent(5, t(2), 5L, "view", 1.0), TopicEvent(6, t(3), 6L, "view", 1.0))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val stream = TopicStream.currentTrend(store, "trend")
        .as[(String, Long, Long, Long, Long, String)].collect().toSeq
      val batch = graft.operators.TimeSeries.theilSenOf((b1 ++ b2).toDF()
          .groupBy(col("event_type"), expr("CAST(ts AS LONG) DIV 86400").as("dn"))
          .agg(count(lit(1)).as("x")))
        .as[(String, Long, Long, Long, Long, String)].collect().toSeq
      assert(stream == batch && stream.nonEmpty, s"stream $stream != batch $batch")
      // hand-check: daily counts 1/2/3 — every pairwise slope is
      // exactly 1000 milli, trend 'up'
      assert(stream == Seq(("view", 3L, 6L, 3L, 1000L, "up")), s"got $stream")
    } finally q.stop()
  }

  test("streaming bursts: ONE trend topic powers the ts41 burst read, equal to batch") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_sburst").toString
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 24 * 60)
    val input = MemoryStream[TopicEvent]
    val q = TopicStream.trendStream(input.toDF(), store, "trend")
      .option("checkpointLocation", s"$root/_chk").start()
    def t(day: Int) = ts(f"2024-01-$day%02d 12:00:00")
    // one event/day for nine days, then a 20-event spike on day 10 —
    // the spike SPLITS across the micro-batches (12 + 8 fold to 20)
    val b1 = (1 to 9).map(d => TopicEvent(d.toLong, t(d), d.toLong, "view", 1.0)) ++
      (1 to 12).map(i => TopicEvent(100L + i, t(10), i.toLong, "view", 1.0))
    val b2 = (1 to 8).map(i => TopicEvent(200L + i, t(10), i.toLong, "view", 1.0))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val stream = TopicStream.currentBursts(store, "trend")
        .as[(String, Long, Long, Long, Long, Boolean)].collect().toSeq
      val batch = graft.operators.TimeSeries.burstsOf((b1 ++ b2).toDF()
          .groupBy(col("event_type"), expr("CAST(ts AS LONG) DIV 86400").as("dn"))
          .agg(count(lit(1)).as("n")))
        .orderBy(col("event_type"), col("dn"))
        .as[(String, Long, Long, Long, Long, Boolean)].collect().toSeq
      assert(stream == batch && stream.nonEmpty, s"stream $stream != batch $batch")
      // hand-check: only days 8-10 carry a full 7-day baseline; the
      // spike day reads 20 vs a 7-event week = 20000 milli, burst
      assert(stream.map(r => (r._3, r._5, r._6)) ==
        Seq((1L, 1000L, false), (1L, 1000L, false), (20L, 20000L, true)),
        s"got $stream")
    } finally q.stop()
  }

  test("streaming cycles: the trend topic's third read tail equals batch and hears the cadence") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_scycle").toString
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 24 * 60)
    val input = MemoryStream[TopicEvent]
    val q = TopicStream.trendStream(input.toDF(), store, "trend")
      .option("checkpointLocation", s"$root/_chk").start()
    def t(day: Int) = ts(f"2024-01-$day%02d 12:00:00")
    // a 6-event burst every third day (days 1/4/7/10/13), quiet
    // between; the LAST burst day splits across the micro-batches
    val b1 = (for (d <- Seq(1, 4, 7, 10); i <- 1 to 6)
      yield TopicEvent((d * 10 + i).toLong, t(d), i.toLong, "view", 1.0)) ++
      (1 to 2).map(i => TopicEvent(300L + i, t(13), i.toLong, "view", 1.0))
    val b2 = (3 to 6).map(i => TopicEvent(400L + i, t(13), i.toLong, "view", 1.0))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val stream = TopicStream.currentCycles(store, "trend")
        .as[(String, Long, Long, Long, Long, Long, Boolean)].collect().toSeq
      val batch = graft.operators.TimeSeries.cycleScanOf((b1 ++ b2).toDF()
          .groupBy(col("event_type"), expr("CAST(ts AS LONG) DIV 86400").as("dn"))
          .agg(count(lit(1)).as("n")))
        .orderBy(col("event_type"), col("period"))
        .as[(String, Long, Long, Long, Long, Long, Boolean)].collect().toSeq
      assert(stream == batch && stream.nonEmpty, s"stream $stream != batch $batch")
      // the period-3 cadence must win the scan (perfect fold: every
      // phase-0 day carries 6 events, the other phases are silent)
      assert(stream.filter(_._7).map(_._2) == Seq(3L), s"got $stream")
      val p3 = stream.find(_._2 == 3L).get
      assert(p3._4 == p3._5, "period 3 captures all variance")
    } finally q.stop()
  }

  test("streaming routes: additive code-gate partials fold to the tx39 census across batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_sroute").toString
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 24 * 60)
    val input = MemoryStream[TestEvents.StreamDoc]
    val q = TopicStream.routeStream(input.toDF(), store, "route")
      .option("checkpointLocation", s"$root/_chk").start()
    val t0 = ts("2024-01-01 00:00:00")
    // one lang's docs SPLIT across the micro-batches: a code doc and
    // a prose doc in batch 1, a second prose doc in batch 2
    val code = "def pack_batches(raw_rows): return [r.strip() for r in raw_rows if r] + []"
    val prose = "the quiet morning light settled over the harbor and the boats swayed"
    val b1 = Seq(TestEvents.StreamDoc(1L, t0, code, "en"),
      TestEvents.StreamDoc(2L, t0, prose, "en"))
    val b2 = Seq(TestEvents.StreamDoc(3L, t0, prose + " again", "en"))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val stream = TopicStream.currentRoutes(store, "route")
        .as[(String, Long, Long, Long)].collect().toSeq
      val all = (b1 ++ b2).toDF()
      val batch = graft.operators.TextOps.codeDetectOf(
          all.select(col("doc_id"), col("text")))
        .join(all.select(col("doc_id"), col("lang")), "doc_id")
        .groupBy(col("lang"))
        .agg(sum(lit(1L)).as("n_docs"),
          sum(when(col("is_code"), 1L).otherwise(0L)).as("n_code"))
        .withColumn("code_milli", expr("(n_code * 1000) DIV n_docs"))
        .orderBy(col("lang"))
        .as[(String, Long, Long, Long)].collect().toSeq
      assert(stream == batch && stream.nonEmpty, s"stream $stream != batch $batch")
      assert(stream == Seq(("en", 3L, 1L, 333L)), s"got $stream")
    } finally q.stop()
  }

  test("streaming gate: additive rule partials fold to the tx33 funnel across batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_sgate").toString
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 24 * 60)
    val input = MemoryStream[TestEvents.StreamDoc]
    val q = TopicStream.gateStream(input.toDF(), store, "gate")
      .option("checkpointLocation", s"$root/_chk").start()
    val t0 = ts("2024-01-01 00:00:00")
    // the ApiSpec battery split across two micro-batches: d1 dies at
    // word_count, d2 at mean_word_len, d3 survives
    val d3 = ("the a" +
      (1 to 24).map(i => f" v$i%04d").mkString +
      (1 to 14).map(i => f" w$i%03d").mkString)
    val b1 = Seq(TestEvents.StreamDoc(1L, t0, "a b", "en"),
      TestEvents.StreamDoc(2L, t0, Seq.fill(40)("the").mkString(" "), "en"))
    val b2 = Seq(TestEvents.StreamDoc(3L, t0, d3, "en"))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val stream = TopicStream.currentGate(store, "gate")
        .select("rule_ord", "rule", "n_checked", "n_fail", "n_fail_marginal")
        .as[(Int, String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
      val batch = graft.operators.Curation.gopherGateOf(
          (b1 ++ b2).map(x => (x.doc_id, x.text)).toDF("doc_id", "text"))
        .select("rule_ord", "rule", "n_checked", "n_fail", "n_fail_marginal")
        .as[(Int, String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
      assert(stream == batch && stream.nonEmpty, s"stream $stream != batch $batch")
      assert(stream == Seq(
        (1, "word_count", 3L, 1L, 1L),
        (2, "mean_word_len", 2L, 1L, 2L),
        (3, "stopwords", 1L, 0L, 1L),
        (4, "dominance", 1L, 0L, 2L),
        (5, "diversity", 1L, 0L, 1L),
        (6, "survivors", 1L, 0L, 0L)), s"got $stream")
    } finally q.stop()
  }

  test("streaming drift: additive cell partials fold to the ss35 batch kernel across batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_sdrift").toString
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 24 * 60)
    val input = MemoryStream[StreamVec]
    val tag = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("is_new", col("vec_id") % 2 === 1)
    val q = TopicStream.driftStream(tag(input.toDF()), store, "drift")
      .option("checkpointLocation", s"$root/_chk").start()
    val t0 = ts("2024-01-01 00:00:00")
    // cell 15's reference mass SPLITS across the two micro-batches
    // (vec 0 then vec 2) — the additivity this twin exists for
    val b1 = Seq(
      StreamVec(0L, t0, Seq(1f, 1f, 1f, 1f)),
      StreamVec(1L, t0, Seq(2f, 1f, 1f, 1f)),
      StreamVec(4L, t0, Seq(-1f, -1f, -1f, -1f)))
    val b2 = Seq(StreamVec(2L, t0, Seq(1f, 1f, 1f, 1f)))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val stream = TopicStream.currentDrift(store, "drift")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5),
          if (r.isNullAt(6)) -1L else r.getLong(6), r.getBoolean(7))).toSet
      val batch = graft.operators.Similarity.embedDriftOf(
          tag((b1 ++ b2).toDF().select(col("vec_id"), col("embedding"))))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5),
          if (r.isNullAt(6)) -1L else r.getLong(6), r.getBoolean(7))).toSet
      assert(stream == batch && stream.nonEmpty, s"stream $stream != batch $batch")
      // hand-check: cell 15 holds 2 reference vectors at q=100/dim and
      // one current at q1=200 — displacement exactly 100 centi; cell 0
      // has no current half (NULL disp, shift 333)
      assert(stream.contains((15, 2L, 1L, 666L, 1000L, 334L, 100L, true)))
      assert(stream.contains((0, 1L, 0L, 333L, 0L, 333L, -1L, true)))
    } finally q.stop()
  }

  test("streaming gini: additive count partials fold to batch ts33 across batches") {
    import spark.implicits._
    import graft.api._
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_sgini").toString
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 24 * 60)
    val input = MemoryStream[TopicEvent]
    val q = TopicStream.giniStream(input.toDF(), store, "gini")
      .option("checkpointLocation", s"$root/_chk").start()
    def t(day: Int, hour: Int) = ts(f"2024-01-$day%02d $hour%02d:00:00")
    // u1's 'view' count splits across batches: 2 + 3 must fold to 5
    val b1 = Seq(
      TopicEvent(1, t(1, 9), 1L, "view", 0), TopicEvent(2, t(1, 10), 1L, "view", 0),
      TopicEvent(3, t(1, 11), 2L, "view", 0))
    val b2 = Seq(
      TopicEvent(4, t(2, 9), 1L, "view", 0), TopicEvent(5, t(2, 10), 1L, "view", 0),
      TopicEvent(6, t(2, 11), 1L, "view", 0), TopicEvent(7, t(2, 12), 2L, "click", 0))
    def read() = TopicStream.currentGini(store, "gini")
      .select("event_type", "n_users", "total_events", "gini_milli", "top_decile_milli")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val stream = read()
      val batch = (b1 ++ b2).toDF()
        .groupBy(col("event_type"), col("user_id")).agg(count(lit(1)).as("n"))
        .giniReport("event_type", "user_id", "n")
        .select("event_type", "n_users", "total_events", "gini_milli", "top_decile_milli")
        .as[(String, Long, Long, Long, Long)].collect().toSet
      assert(stream == batch && stream.nonEmpty, s"stream $stream != batch $batch")
      // the cross-batch fold: view counts are (u1=5, u2=1), gini of
      // (1,5) = (2*(1*1+2*5) - 3*6) / (2*6) = 4/12 -> 333 milli
      assert(stream.contains(("view", 2L, 6L, 333L, 833L)))
      // the additive-changelog contract (rfmStream/transitionsStream's):
      // a CHECKPOINT replay re-runs the same batch id -> same gkey ->
      // upsert overwrite, idempotent BY KEY; re-DELIVERED events under
      // at-least-once get a new batch id and lawfully count again.
      // Reading twice must at least be stable:
      assert(read() == stream)
    } finally q.stop()
  }

  test("streaming conversion lag: a late earlier signup re-buckets, curve equals batch ts34") {
    import spark.implicits._
    import graft.api._
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_sconv").toString
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 24 * 60)
    val input = MemoryStream[TopicEvent]
    val qs = TopicStream.conversionStartStream(input.toDF(), store, "starts")
      .option("checkpointLocation", s"$root/_chks").start()
    val qr = TopicStream.ltvStream(input.toDF(), store, "rev")
      .option("checkpointLocation", s"$root/_chkr").start()
    def t(day: Int, hour: Int) = ts(f"2024-01-$day%02d $hour%02d:00:00")
    val b1 = Seq(
      TopicEvent(1, t(5, 9), 1L, "signup", 0),
      TopicEvent(2, t(6, 9), 1L, "purchase", 1.0))
    val b2 = Seq(
      // LATE earlier signup: u1's anchor moves day 5 -> day 2, so the
      // SAME purchase re-buckets from lag 1 to lag 4
      TopicEvent(3, t(2, 9), 1L, "signup", 0))
    def read() = TopicStream.currentConversionLag(store, "starts", "rev")
      .select("lag_days", "n_conv", "cum_conv", "n_signups", "survival_milli")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    def drain(evs: Seq[TopicEvent]): Unit = {
      input.addData(evs: _*); qs.processAllAvailable(); qr.processAllAvailable()
    }
    try {
      drain(b1)
      assert(read() == Set((1L, 1L, 1L, 1L, 0L)))
      drain(b2)
      val m2 = read()
      assert(m2 == Set((4L, 1L, 1L, 1L, 0L)), s"anchor move must re-bucket: $m2")
      val batch = (b1 ++ b2).toDF()
        .conversionLag("user_id", "ts",
          col("event_type") === "signup", col("event_type") === "purchase")
        .select("lag_days", "n_conv", "cum_conv", "n_signups", "survival_milli")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(m2 == batch, s"stream $m2 != batch $batch")
      drain(b2)
      assert(read() == m2, "replayed facts must not change the curve")
    } finally { qs.stop(); qr.stop() }
  }

  test("streaming transitions: late arrivals retract split edges, matrix equals batch ts24") {
    import spark.implicits._
    import graft.api._
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_strans").toString
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 24 * 60)
    val input = MemoryStream[TopicEvent]
    val deltas = TopicStream.transitionDeltasStream(input.toDS(), watermarkDelay = "10 seconds")
    val q = TopicStream.transitionsStream(deltas, store, "trans")
      .option("checkpointLocation", s"$root/_chk").start()
    val B = 100000L
    def t(sec: Long) = new java.sql.Timestamp((B + sec) * 1000L)
    val b1 = Seq(
      TopicEvent(1, t(0), 1L, "A", 0), TopicEvent(2, t(10), 1L, "C", 0),
      TopicEvent(3, t(0), 2L, "A", 0))
    // LATE: u1's B at t=5 (>= watermark t=0) lands BETWEEN the already
    // -counted A(0)->C(10) edge; u2 simply extends A(0)->B(20)
    val b2 = Seq(TopicEvent(4, t(5), 1L, "B", 0), TopicEvent(5, t(20), 2L, "B", 0))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      val m1 = TopicStream.currentTransitions(store, "trans")
        .select("from_type", "to_type", "n").as[(String, String, Long)].collect().toSet
      assert(m1 == Set(("A", "C", 1L)))
      input.addData(b2: _*); q.processAllAvailable()
      val m2 = TopicStream.currentTransitions(store, "trans")
        .select("from_type", "to_type", "n").as[(String, String, Long)].collect().toSet
      // the split edge is GONE (retracted), replaced by the two it became
      assert(m2 == Set(("A", "B", 2L), ("B", "C", 1L)), s"got $m2")
      // and the full matrix (n, n_from, p_milli) equals the batch verb
      // on the union of admitted events
      val batch = (b1 ++ b2).toDF()
        .transitionMatrix("user_id", "ts", "event_type", tieCol = Some("event_id"))
        .as[(String, String, Long, Long, Long)].collect().toSet
      val cur = TopicStream.currentTransitions(store, "trans")
        .as[(String, String, Long, Long, Long)].collect().toSet
      assert(cur == batch, s"stream $cur != batch $batch")
    } finally q.stop()
  }

  test("streaming top paths: late earlier events rewrite a user's path, report equals batch ts23") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_spaths").toString
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 24 * 60)
    val input = MemoryStream[TopicEvent]
    val q = TopicStream.topPathsStream(input.toDF().as[TopicEvent], store, "paths")
      .option("checkpointLocation", s"$root/_chk").start()
    val B = 100000L
    def t(sec: Long) = new java.sql.Timestamp((B + sec) * 1000L)
    def report() = TopicStream.currentTopPaths(store, "paths")
      .as[(String, Long)].collect().toSet
    // u1 emits 4 events in batch 1 (first-3 = A>B>C); u2 emits 2
    val b1 = Seq(
      TopicEvent(1, t(10), 1L, "A", 0), TopicEvent(2, t(20), 1L, "B", 0),
      TopicEvent(3, t(30), 1L, "C", 0), TopicEvent(4, t(40), 1L, "D", 0),
      TopicEvent(5, t(10), 2L, "A", 0), TopicEvent(6, t(20), 2L, "B", 0))
    // LATE: u1's earlier Z at t=5 displaces C from the first-3
    val b2 = Seq(TopicEvent(7, t(5), 1L, "Z", 0))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      assert(report() == Set(("A>B>C", 1L), ("A>B", 1L)))
      input.addData(b2: _*); q.processAllAvailable()
      val r2 = report()
      assert(r2 == Set(("Z>A>B", 1L), ("A>B", 1L)), s"got $r2")
      // the report equals batch ts23's pipeline on the union
      val batch = graft.operators.TimeSeries.topPathsOf((b1 ++ b2).toDF())
        .as[(String, Long)].collect().toSet
      assert(r2 == batch, s"stream $r2 != batch $batch")
      // replay idempotence: candidate facts are content-keyed
      input.addData(b2: _*); q.processAllAvailable()
      assert(report() == r2, "replayed facts must not change the report")
    } finally q.stop()
  }

  test("streaming RFM: quartiles move as history accumulates, segmentation equals batch ts27") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_srfm").toString
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 24 * 60)
    val input = MemoryStream[TopicEvent]
    val q = TopicStream.rfmStream(input.toDF().as[TopicEvent], store, "rfm")
      .option("checkpointLocation", s"$root/_chk").start()
    val B = 100000L
    def t(sec: Long) = new java.sql.Timestamp((B + sec) * 1000L)
    def seg() = TopicStream.currentRfm(store, "rfm")
      .select("user_id", "recency_s", "n_events", "value_cents", "rfm")
      .as[(Long, Long, Long, Long, Int)].collect().toSet
    def batchOf(evs: Seq[TopicEvent]) = {
      val e = evs.toDF()
      val perUser = e.groupBy(col("user_id"))
        .agg(max(col("ts")).as("last_ts"), count(lit(1)).as("n_events"),
          sum(round(col("value") * 100).cast("long")).as("value_cents"))
      val anchor = e.agg(max(col("ts")).as("anchor_ts"))
      graft.operators.TimeSeries.rfmSegment(perUser, anchor)
        .select("user_id", "recency_s", "n_events", "value_cents", "rfm")
        .as[(Long, Long, Long, Long, Int)].collect().toSet
    }
    // 4 users so quartiles are distinct; spend and activity spread
    val b1 = Seq(
      TopicEvent(1, t(10), 1L, "buy", 10.0), TopicEvent(2, t(100), 1L, "buy", 5.0),
      TopicEvent(3, t(20), 2L, "buy", 2.0),
      TopicEvent(4, t(30), 3L, "view", 1.0),
      TopicEvent(5, t(200), 4L, "view", 0.5))
    // u2 comes back richer and MORE RECENT than everyone — every
    // user's relative quartile can move
    val b2 = Seq(
      TopicEvent(6, t(500), 2L, "buy", 50.0), TopicEvent(7, t(510), 2L, "buy", 25.0))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      assert(seg() == batchOf(b1), "after batch 1")
      input.addData(b2: _*); q.processAllAvailable()
      val s2 = seg()
      assert(s2 == batchOf(b1 ++ b2), s"stream $s2 != batch ${batchOf(b1 ++ b2)}")
      // partials summed across batches: u2 has 3 events, 7700 cents
      val u2 = s2.find(_._1 == 2L).get
      assert(u2._3 == 3L && u2._4 == 7700L, s"u2 partial fold wrong: $u2")
    } finally q.stop()
  }

  test("streaming funnel timing: late anchors move the timing stats, report equals batch ts25") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_sftim").toString
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 24 * 60)
    val B = 100000L
    def t(sec: Long) = new java.sql.Timestamp((B + sec) * 1000L)
    val stages = Seq("signup", "view", "purchase")
    val input = MemoryStream[TopicEvent]
    val q = TopicStream.funnelTimingStream(input.toDS(), stages, store, "ftim",
        tolSeconds = 100L)
      .option("checkpointLocation", s"$root/_chk").start()
    def report() = TopicStream.currentFunnelTiming(store, "ftim", stages)
      .select("transition", "n_prev", "n_conv", "conv_milli", "min_s", "max_s")
      .as[(String, Long, Long, Long, Option[Long], Option[Long])].collect().toSet
    def batchOf(evs: Seq[TopicEvent]) = {
      val e = evs.toDF().filter(col("event_type").isin(stages: _*))
      val tol = expr("INTERVAL 100 SECONDS")
      val f = e.groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "signup", col("ts"))).as("t1"),
          collect_list(when(col("event_type") === "view", col("ts"))).as("vts"),
          collect_list(when(col("event_type") === "purchase", col("ts"))).as("pts"))
        .withColumn("t2", array_min(filter(col("vts"),
          x => x >= col("t1") && x <= col("t1") + tol)))
        .withColumn("t3", array_min(filter(col("pts"),
          x => x >= col("t2") && x <= col("t2") + tol)))
      graft.operators.TimeSeries.funnelTimingReport(f, stages)
        .select("transition", "n_prev", "n_conv", "conv_milli", "min_s", "max_s")
        .as[(String, Long, Long, Long, Option[Long], Option[Long])].collect().toSet
    }
    // u1 completes signup>view>purchase; u2 views and purchases with
    // NO anchor (depth 0 — counted in neither transition's n_prev)
    val b1 = Seq(
      TopicEvent(1, t(0), 1L, "signup", 0), TopicEvent(2, t(30), 1L, "view", 0),
      TopicEvent(3, t(90), 1L, "purchase", 0),
      TopicEvent(4, t(10), 2L, "view", 0), TopicEvent(5, t(20), 2L, "purchase", 0))
    // LATE: u2's signup at t=5 anchors them — view at 10 chains (dt 5),
    // purchase at 20 chains (dt 10): both transitions gain a FASTER row
    val b2 = Seq(TopicEvent(6, t(5), 2L, "signup", 0))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      val r1 = report()
      assert(r1 == batchOf(b1), s"after batch 1: $r1 != ${batchOf(b1)}")
      assert(r1.forall(_._2 == 1L), s"only u1 is anchored in batch 1: $r1")
      input.addData(b2: _*); q.processAllAvailable()
      val r2 = report()
      assert(r2 == batchOf(b1 ++ b2), s"stream $r2 != batch ${batchOf(b1 ++ b2)}")
      // the late anchor moved min_s on both transitions (5 < 30, 10 < 60)
      assert(r2.map(x => (x._1, x._5.get)).toMap ==
        Map("signup>view" -> 5L, "view>purchase" -> 10L), s"got $r2")
    } finally q.stop()
  }

  test("streaming A/B lift: a late earlier view re-exposes a user, report equals batch ts26") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_sab").toString
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 24 * 60)
    val input = MemoryStream[TopicEvent]
    val q = TopicStream.abLiftStream(input.toDF().as[TopicEvent], store, "ab")
      .option("checkpointLocation", s"$root/_chk").start()
    val B = 100000L
    def t(sec: Long) = new java.sql.Timestamp((B + sec) * 1000L)
    def report() = TopicStream.currentAbLift(store, "ab")
      .select("arm", "n_users", "n_conv", "conv_milli")
      .as[(String, Long, Long, Long)].collect().toSet
    def batchOf(evs: Seq[TopicEvent]) = {
      val perUser = evs.toDF().groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "view", col("ts"))).as("first_view"),
          max(when(col("event_type") === "purchase", col("ts"))).as("last_purchase"))
      graft.operators.TimeSeries.abLiftReport(perUser)
        .select("arm", "n_users", "n_conv", "conv_milli")
        .as[(String, Long, Long, Long)].collect().toSet
    }
    // u1: purchase at t=50, no view yet (NOT exposed, not counted);
    // u2: view then purchase (exposed, converted)
    val b1 = Seq(
      TopicEvent(1, t(50), 1L, "purchase", 5.0),
      TopicEvent(2, t(10), 2L, "view", 0), TopicEvent(3, t(20), 2L, "purchase", 3.0))
    // LATE: u1's view at t=40 arrives — u1 becomes exposed AND
    // converted (purchase at 50 >= view at 40), entirely at read time
    val b2 = Seq(TopicEvent(4, t(40), 1L, "view", 0))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      assert(report() == batchOf(b1), "after batch 1")
      val exposed1 = report().map(_._2).sum
      assert(exposed1 == 1L, s"only u2 is exposed after batch 1: ${report()}")
      input.addData(b2: _*); q.processAllAvailable()
      val r2 = report()
      assert(r2 == batchOf(b1 ++ b2), s"stream $r2 != batch ${batchOf(b1 ++ b2)}")
      assert(r2.map(_._2).sum == 2L && r2.map(_._3).sum == 2L,
        s"the late view must expose AND convert u1: $r2")
    } finally q.stop()
  }

  test("streaming association rules: baskets accumulate across batches, report equals batch ts29") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_sassoc").toString
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 24 * 60)
    val input = MemoryStream[TopicEvent]
    val q = TopicStream.assocStream(input.toDF().as[TopicEvent], store, "assoc")
      .option("checkpointLocation", s"$root/_chk").start()
    val B = 100000L
    def t(sec: Long) = new java.sql.Timestamp((B + sec) * 1000L)
    def report() = TopicStream.currentAssoc(store, "assoc")
      .select("a", "b", "n_ab", "n_a", "n_b", "n_users", "lift_milli")
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSet
    def batchOf(evs: Seq[TopicEvent]) =
      graft.operators.TimeSeries.assocReport(
          evs.toDF().select(col("user_id"), col("event_type")))
        .select("a", "b", "n_ab", "n_a", "n_b", "n_users", "lift_milli")
        .as[(String, String, Long, Long, Long, Long, Long)].collect().toSet
    // u1: {view}; u2: {view, purchase} — one pair after batch 1
    val b1 = Seq(
      TopicEvent(1, t(10), 1L, "view", 0),
      TopicEvent(2, t(20), 2L, "view", 0), TopicEvent(3, t(30), 2L, "purchase", 1.0),
      TopicEvent(4, t(35), 2L, "purchase", 2.0)) // duplicate type: same basket
    // batch 2: u1 buys — the (purchase, view) pair forms ACROSS batches
    val b2 = Seq(TopicEvent(5, t(40), 1L, "purchase", 3.0))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      val r1 = report()
      assert(r1 == batchOf(b1), s"after batch 1: $r1 != ${batchOf(b1)}")
      assert(r1.exists(r => r._1 == "purchase" && r._2 == "view" && r._3 == 1L),
        s"u2's pair expected after batch 1: $r1")
      input.addData(b2: _*); q.processAllAvailable()
      val r2 = report()
      assert(r2 == batchOf(b1 ++ b2), s"stream $r2 != batch ${batchOf(b1 ++ b2)}")
      // the cross-batch basket upgrade: both users now hold the pair
      assert(r2.exists(r => r._1 == "purchase" && r._2 == "view" &&
        r._3 == 2L && r._6 == 2L), s"cross-batch pair must count u1 too: $r2")
    } finally q.stop()
  }

  test("streaming upsert sink: merged view tracks latest per key across batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_supsert").toString
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 60)
    val input = MemoryStream[TopicEvent]
    val q = TopicStream.upsertToTopic(input.toDF(), store, "state")
      .option("checkpointLocation", s"$root/_chk").start()
    try {
      input.addData(
        TopicEvent(1, ts("2024-01-01 00:05:00"), 1, "s", 1.00),
        TopicEvent(2, ts("2024-01-01 00:06:00"), 2, "s", 2.00))
      q.processAllAvailable()
      input.addData(TopicEvent(3, ts("2024-01-01 00:07:00"), 1, "s", 9.00))
      q.processAllAvailable()
      val merged = store.readMerged("state", "user_id")
        .select("user_id", "value").as[(Long, Double)].collect().toMap
      assert(merged == Map(1L -> 9.00, 2L -> 2.00),
        "second batch must supersede user 1's value")
      // raw history keeps every delta (append-only writes)
      assert(store.read("state").count() == 3)
    } finally q.stop()
  }

  test("streaming publish sink: batches land in a catalog topic, compaction on cadence") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_spub").toString
    val gs = new GraftSession(spark, root)
    val input = MemoryStream[TopicEvent]
    val q = TopicStream.publishToTopic(input.toDF(), gs, "live_pub")
      .option("checkpointLocation", s"$root/_chk").start()
    try {
      input.addData(TopicEvent(1, ts("2024-01-01 00:05:00"), 1, "s", 1.00))
      q.processAllAvailable()
      // topic auto-created + registered; compaction schedule attaches live
      assert(gs.catalog.contains("live_pub"))
      gs.setCompaction("live_pub", everyAppends = 2, maxFilesPerBucket = 1)
      input.addData(TopicEvent(2, ts("2024-01-01 00:06:00"), 1, "s", 2.00))
      q.processAllAvailable()
      input.addData(TopicEvent(3, ts("2024-01-01 00:07:00"), 2, "s", 3.00))
      q.processAllAvailable()
      assert(gs.table("live_pub").count() == 3, "every published row must land")
      // the cadence fired from the streaming path: the bucket is compact
      val bucketDirs = new java.io.File(s"$root/topics/ella.public.live_pub")
        .listFiles().filter(_.getName.startsWith("bucket="))
      assert(bucketDirs.nonEmpty)
      assert(bucketDirs.head.listFiles().count(_.getName.endsWith(".parquet")) == 1,
        "scheduled compaction must fold the streamed appends")
    } finally q.stop()
  }

  test("session windows close after the inactivity gap and emit on watermark") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[TopicEvent]
    val q = TopicStream.sessionStats(input.toDF(), "30 minutes", "30 minutes")
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      input.addData(events(): _*)
      q.processAllAvailable()
      // push the watermark past every open session's end (sessions
      // emit in the batch AFTER the watermark advances)
      input.addData(TopicEvent(90, ts("2024-01-01 03:00:00"), 9, "click", 0.0))
      q.processAllAvailable()
      input.addData(TopicEvent(91, ts("2024-01-01 04:00:00"), 9, "click", 0.0))
      q.processAllAvailable()
      val rows = spark.table("sessions").collect()
        .map(r => (r.getAs[java.sql.Timestamp]("s_start").toString, r.getAs[Long]("user_id"),
          r.getAs[Long]("n_events"), r.getAs[Long]("sum_value_cents")))
        .filter(_._2 != 9L).toSet // drop the watermark-nudge user's own session
      // user 1: 00:05+00:15 merge (gap<30m), 01:05 is a new session;
      // user 2: 00:45+01:10 merge
      assert(rows == Set(
        ("2024-01-01 00:05:00.0", 1L, 2L, 300L),
        ("2024-01-01 01:05:00.0", 1L, 1L, 400L),
        ("2024-01-01 00:45:00.0", 2L, 2L, 800L)))
    } finally q.stop()
  }

  test("streaming packer admits per-source budgets and assigns packs across micro-batches") {
    import spark.implicits._
    import graft.streaming.DocArrival
    implicit val sql = spark.sqlContext
    val input = MemoryStream[DocArrival]
    // budget 100 tokens per source, 40-token packs
    val q = TopicStream.packStream(input.toDS(), budgetPerSource = 100L, packTokens = 40L)
      .writeStream.format("memory").queryName("packed").outputMode("append").start()
    try {
      // batch 1: srcA takes 70 of its 100; srcB takes 30
      input.addData(
        DocArrival(1, "srcA", 30), DocArrival(2, "srcA", 40), DocArrival(3, "srcB", 30))
      q.processAllAvailable()
      // batch 2: srcA's first doc still fits (exclusive prefix 70 < 100),
      // the next one is rejected (prefix 95 >= 100 after admit? no —
      // 70+25=95 < 100, so doc 5 admits too; doc 6 hits 120 and is cut)
      input.addData(
        DocArrival(4, "srcA", 25), DocArrival(5, "srcA", 25), DocArrival(6, "srcA", 25),
        DocArrival(7, "srcB", 50))
      q.processAllAvailable()
      val rows = spark.table("packed").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
          r.getAs[Long]("offset"), r.getAs[Long]("pack_id"))).toSet
      assert(rows == Set(
        (1L, "srcA", 0L, 0L),    // pack 0
        (2L, "srcA", 30L, 0L),   // straddles into pack 0 (offset 30)
        (4L, "srcA", 70L, 1L),   // state carried: prefix 70 -> pack 1
        (5L, "srcA", 95L, 2L),   // prefix 95 < budget 100: admitted
        (3L, "srcB", 0L, 0L),
        (7L, "srcB", 30L, 0L)))  // doc 6 (prefix 120) rejected
    } finally q.stop()
  }

  test("scalable streaming packer matches packStream semantics and replays idempotently") {
    import spark.implicits._
    import graft.streaming.DocArrival
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_spack").toString
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 60)
    val input = MemoryStream[DocArrival]
    // the exact packStream scenario: budget 100/source, 40-token packs
    val q = TopicStream.packStreamScalable(input.toDS(), store, "packed_out", "packed_state",
        budgetPerSource = 100L, packTokens = 40L)
      .option("checkpointLocation", s"$root/_chk").start()
    val batch2 = Seq(
      DocArrival(4, "srcA", 25), DocArrival(5, "srcA", 25), DocArrival(6, "srcA", 25),
      DocArrival(7, "srcB", 50))
    try {
      input.addData(
        DocArrival(1, "srcA", 30), DocArrival(2, "srcA", 40), DocArrival(3, "srcB", 30))
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val expected = Set(
      (1L, "srcA", 0L, 0L), (2L, "srcA", 30L, 0L),
      (4L, "srcA", 70L, 1L), (5L, "srcA", 95L, 2L),
      (3L, "srcB", 0L, 0L), (7L, "srcB", 30L, 0L)) // doc 6 over budget
    def packed() = store.readMerged("packed_out", "doc_id")
      .select("doc_id", "source", "offset", "pack_id")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(packed() == expected, "must match the flatMapGroupsWithState packer exactly")
    // replay: re-running batch 1 against the state topic must not
    // double-count — the as-of read sees only pre-batch-1 state
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    TopicStream.packBatchIncrement(store, "packed_out", "packed_state", 100L, 40L)(
      batch2.toDF(), 1L)
    assert(packed() == expected, "a replayed micro-batch must be a no-op on the merged view")
    assert(store.readMerged("packed_state", "source")
      .select("source", "admitted_tokens").as[(String, Long)].collect().toSet ==
      Set(("srcA", 120L), ("srcB", 80L)), "offsets must not advance on replay")
    // the per-batch GroupPrefix cache must be RELEASED: a continuous
    // stream would otherwise pin one cached batch slice per trigger
    assert(spark.sparkContext.getPersistentRDDs.size <= cachedBefore,
      "packBatchIncrement must not leak a persisted RDD per batch")
  }

  test("streaming anomaly detector flags spikes against the prior baseline only") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[TopicEvent]
    val q = TopicStream.anomalyStream(input.toDS(), zMin = 3.0, minN = 10L)
      .writeStream.format("memory").queryName("anomalies").outputMode("append").start()
    try {
      // batch 1: user 1 builds a baseline alternating 1.00/3.00 (mean
      // 200c, std 100c) — nothing flagged (and nothing CAN flag before
      // minN history exists)
      input.addData((1 to 12).map(i =>
        TopicEvent(i, ts(f"2024-01-01 00:${i}%02d:00"), 1, "m", if (i % 2 == 0) 1.00 else 3.00)): _*)
      q.processAllAvailable()
      assert(spark.table("anomalies").count() == 0)
      // batch 2: a 10.00 spike (z = (1000-200)/100 = 8) and a normal row
      input.addData(
        TopicEvent(20, ts("2024-01-01 00:20:00"), 1, "m", 10.00),
        TopicEvent(21, ts("2024-01-01 00:21:00"), 1, "m", 2.00))
      q.processAllAvailable()
      val rows = spark.table("anomalies").collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("value_c"))).toSet
      assert(rows == Set((20L, 1000L)), s"only the spike flags: $rows")
    } finally q.stop()
  }

  test("streaming EWMA equals the batch operator across micro-batch boundaries") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val all = (1 to 20).map(i =>
      TopicEvent(i, ts(f"2024-01-01 00:${i}%02d:00"), i % 3, "m", 1.0 + i * 0.37))
    val input = MemoryStream[TopicEvent]
    val q = TopicStream.ewmaStream(input.toDS())
      .writeStream.format("memory").queryName("ewma_s").outputMode("append").start()
    try {
      // split mid-key-history: state must carry samples across batches
      input.addData(all.take(12): _*); q.processAllAvailable()
      input.addData(all.drop(12): _*); q.processAllAvailable()
      val streamed = spark.table("ewma_s")
        .select("event_id", "ewma_millicents").as[(Long, Long)].collect().toMap
      import graft.api._
      val batch = all.toDF()
        .ewma("user_id", "ts", "value", 8, "event_id")
        .select("event_id", "ewma_millicents").as[(Long, Long)].collect().toMap
      assert(streamed == batch,
        s"stream and batch EWMA must agree: ${streamed.toSeq.sorted} vs ${batch.toSeq.sorted}")
      // O(1) state: depth bounds the kept window regardless of history
      assert(streamed.size == 20)
    } finally q.stop()
  }

  test("streaming attribution assigns the batch credits on an ordered feed across a split") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    def t(day: Int) = new java.sql.Timestamp(86400000L * day)
    // the ts30 spec's planted timeline: u10 click(d1) view(d2)
    // purchase(d3: view/click) purchase(d20: none/click — stale);
    // u11 purchase(d5: none/none)
    val b1 = Seq(
      TopicEvent(1, t(1), 10L, "click", 0),
      TopicEvent(2, t(2), 10L, "view", 0),
      TopicEvent(3, t(3), 10L, "purchase", 2.0))
    val b2 = Seq(
      TopicEvent(4, t(20), 10L, "purchase", 3.0),
      TopicEvent(5, t(5), 11L, "purchase", 4.0))
    val input = MemoryStream[TopicEvent]
    val q = TopicStream.attributionStream(input.toDS())
      .writeStream.format("memory").queryName("att_s").outputMode("append").start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val got = spark.table("att_s")
        .select("event_id", "last_touch", "first_touch", "value_c")
        .as[(Long, String, String, Long)].collect().toSet
      assert(got == Set(
        (3L, "view", "click", 200L),
        (4L, "none", "click", 300L),
        (5L, "none", "none", 400L)),
        s"online credits must match the batch kernel on an ordered feed: $got")
    } finally q.stop()
  }

  test("streaming CUSUM: a planted level shift alarms at the hand-computed event, split-invariant") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // target 1.00, slack 0.50, threshold 10.00 (cents: 100/50/1000).
    // 5 in-control samples (vc=100: both sums stay 0), then a shift to
    // 9.00 (vc=900): up += 750 per event => alarm at the SECOND shifted
    // event with s = 1500; the reset restarts the chart, so the alarm
    // repeats every 2 shifted events: event_ids 7, 9, 11.
    val all = (1 to 11).map(i =>
      TopicEvent(i, ts(f"2024-01-01 00:${i}%02d:00"), 1L,
        "m", if (i <= 5) 1.0 else 9.0))
    def run(name: String, batches: Seq[Seq[TopicEvent]]): Seq[(Long, String, Long)] = {
      val input = MemoryStream[TopicEvent]
      val q = TopicStream.cusumStream(input.toDS(), 100L, 50L, 1000L)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
        spark.table(name).select("event_id", "side", "s_c")
          .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
      } finally q.stop()
    }
    val oneShot = run("cusum_1", Seq(all))
    assert(oneShot == Seq((7L, "up", 1500L), (9L, "up", 1500L), (11L, "up", 1500L)),
      s"hand-computed alarm schedule: $oneShot")
    // split mid-chart: the accumulators must carry across micro-batches
    val split = run("cusum_2", Seq(all.take(6), all.drop(6)))
    assert(split == oneShot, s"micro-batch split must not move alarms: $split")
    // downward shifts alarm on the other side
    val down = (1 to 8).map(i =>
      TopicEvent(i, ts(f"2024-01-01 01:${i}%02d:00"), 2L,
        "m", if (i <= 5) 9.0 else 1.0))
    val dn = {
      val input = MemoryStream[TopicEvent]
      val q = TopicStream.cusumStream(input.toDS(), 900L, 50L, 1000L)
        .writeStream.format("memory").queryName("cusum_3").outputMode("append").start()
      try {
        input.addData(down: _*); q.processAllAvailable()
        spark.table("cusum_3").select("event_id", "side")
          .as[(Long, String)].collect().toSeq.sortBy(_._1)
      } finally q.stop()
    }
    assert(dn == Seq((7L, "down")), s"downward alarm expected: $dn")
  }

  test("keyed-stream TTL: in-horizon keys match the TTL-disabled form; silent keys evict") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val B = 100000L
    def t(sec: Long) = new java.sql.Timestamp((B + sec) * 1000L)
    // same four batches through the TTL'd and TTL-disabled forms
    val input = MemoryStream[TopicEvent]
    val inputRef = MemoryStream[TopicEvent]
    val q = TopicStream.latestPerKey(input.toDS(),
        ttlSeconds = Some(100L), watermarkDelay = "10 seconds")
      .writeStream.format("memory").queryName("lpk_ttl").outputMode("update").start()
    val qRef = TopicStream.latestPerKey(inputRef.toDS())
      .writeStream.format("memory").queryName("lpk_ref").outputMode("update").start()
    def feed(evs: TopicEvent*): Unit = {
      input.addData(evs: _*); q.processAllAvailable()
      inputRef.addData(evs: _*); qRef.processAllAvailable()
    }
    try {
      // key 2 goes silent after t(10); key 1 keeps arriving (re-arming
      // its own TTL each time) and drags the watermark past key 2's
      // t(10)+100s horizon
      feed(TopicEvent(1, t(10), 2L, "m", 5.0), TopicEvent(2, t(20), 1L, "m", 1.0))
      feed(TopicEvent(3, t(50), 1L, "m", 2.0))
      feed(TopicEvent(4, t(5000), 1L, "m", 3.0))  // watermark -> ~t(4990) >> t(110)
      feed(TopicEvent(5, t(5010), 1L, "m", 4.0))  // timeout fires for key 2
      // key 1 never went silent: every update row matches the
      // TTL-disabled stream exactly (the in-horizon pin)
      def rows(tbl: String) = spark.table(tbl)
        .select("user_id", "ts", "value", "n_seen")
        .as[(Long, java.sql.Timestamp, Double, Long)].collect().toSeq.sorted
      assert(rows("lpk_ttl") == rows("lpk_ref"),
        "with every key in-horizon so far, TTL'd output must equal TTL-disabled")
      // key 2 re-appears AFTER eviction: n_seen restarts at 1 on the
      // TTL'd stream (state was dropped) but reads 2 on the reference
      feed(TopicEvent(6, t(5020), 2L, "m", 6.0))
      def nseen(tbl: String) = spark.table(tbl)
        .filter(col("user_id") === 2L).orderBy(col("ts").desc)
        .select("n_seen").as[Long].head()
      assert(nseen("lpk_ttl") == 1L, "evicted key must restart its count")
      assert(nseen("lpk_ref") == 2L, "TTL-disabled keeps all-history state")
    } finally { q.stop(); qRef.stop() }
  }

  test("ewma/anomaly TTL: identical scoring in-horizon, cold restart after eviction") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val B = 100000L
    def t(sec: Long) = new java.sql.Timestamp((B + sec) * 1000L)
    val input = MemoryStream[TopicEvent]
    val q = TopicStream.ewmaStream(input.toDS(), depth = 8,
        ttlSeconds = Some(100L), watermarkDelay = "10 seconds")
      .writeStream.format("memory").queryName("ewma_ttl").outputMode("append").start()
    try {
      // key 2's window fills at t(0..10); key 1 advances the watermark
      input.addData(
        TopicEvent(1, t(0), 2L, "m", 1.00), TopicEvent(2, t(10), 2L, "m", 3.00),
        TopicEvent(3, t(20), 1L, "m", 7.00))
      q.processAllAvailable()
      input.addData(TopicEvent(4, t(5000), 1L, "m", 7.00)); q.processAllAvailable()
      input.addData(TopicEvent(5, t(5010), 1L, "m", 7.00)); q.processAllAvailable()
      // in-horizon smoothing identical to the batch form (which the
      // TTL-disabled stream is already pinned to equal)
      import graft.api._
      val inHorizon = Seq(
        TopicEvent(1, t(0), 2L, "m", 1.00), TopicEvent(2, t(10), 2L, "m", 3.00))
        .toDF().ewma("user_id", "ts", "value", 8, "event_id")
        .select("event_id", "ewma_millicents").as[(Long, Long)].collect().toMap
      val got = spark.table("ewma_ttl")
        .filter(col("user_id") === 2L)
        .select("event_id", "ewma_millicents").as[(Long, Long)].collect().toMap
      assert(inHorizon.forall { case (k, v) => got.get(k).contains(v) },
        s"in-horizon TTL'd smoothing must match batch: $got vs $inHorizon")
      // key 2 re-appears after its horizon lapsed: the window restarted
      // empty, so the smoothed value is the sample itself
      input.addData(TopicEvent(6, t(5020), 2L, "m", 9.00)); q.processAllAvailable()
      val cold = spark.table("ewma_ttl").filter(col("event_id") === 6L)
        .select("ewma_millicents").as[Long].head()
      assert(cold == 900L * 1000, s"evicted key must smooth from an empty window: $cold")
    } finally q.stop()
  }

  test("streaming prep pipeline gates language/quality and dedups within the watermark") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[StreamDoc]
    val q = TopicStream.prepStream(input.toDF(), "10 minutes", minTokens = 3, maxTokens = 10)
      .writeStream.format("memory").queryName("prep").outputMode("append").start()
    try {
      input.addData(
        StreamDoc(1, ts("2024-01-01 00:00:00"), "the quick brown fox", "en"),
        StreamDoc(2, ts("2024-01-01 00:01:00"), "the quick brown fox", "en"), // dup of 1
        StreamDoc(3, ts("2024-01-01 00:02:00"), "le renard brun rapide", "fr"), // lang gate
        StreamDoc(4, ts("2024-01-01 00:03:00"), "too short", "en"), // quality gate
        StreamDoc(5, ts("2024-01-01 00:04:00"), "a different english document", "en"))
      q.processAllAvailable()
      val kept = spark.table("prep").select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 5L),
        s"expected dup/lang/quality-gated stream to keep only 1 and 5, got $kept")
    } finally q.stop()
  }

  test("streaming incremental dedup flags known content against the fingerprint topic") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val fingerprints = Seq("alpha beta gamma").toDF("text")
      .select(md5(col("text")).as("chash"))
    val input = MemoryStream[StreamDoc]
    val q = TopicStream.dedupAgainstStream(input.toDF(), fingerprints, "10 minutes")
      .writeStream.format("memory").queryName("inc_dedup").outputMode("append").start()
    try {
      input.addData(
        StreamDoc(1, ts("2024-01-01 00:00:00"), "alpha beta gamma", "en"),   // known
        StreamDoc(2, ts("2024-01-01 00:01:00"), "delta epsilon zeta", "en"), // new
        StreamDoc(3, ts("2024-01-01 00:02:00"), "delta epsilon zeta", "en")) // in-stream dup of 2
      q.processAllAvailable()
      val rows = spark.table("inc_dedup").select("doc_id", "is_known").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(rows == Map(1L -> true, 2L -> false),
        s"known flagged, newcomer passed, in-stream dup suppressed: $rows")
    } finally q.stop()
  }

  test("Misra-Gries heavy hitters aggregate inside streaming windows") {
    // The MG Aggregator is partial-mergeable, so it drops into a
    // windowed streaming agg unchanged — per-window term summaries
    // with O(k) state per window, the production shape for "trending
    // terms over the last hour" at any corpus rate. The guarantee
    // (every term with freq > n/(k+1) present) must hold per window.
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val mg = udaf(new graft.functions.MisraGriesAgg(4))
    val input = MemoryStream[StreamDoc]
    val q = input.toDF()
      .select(col("ts"), explode(split(lower(col("text")), " ")).as("term"))
      .groupBy(window(col("ts"), "1 hour"))
      .agg(mg(col("term")).as("sk"))
      .writeStream.format("memory").queryName("mg_win")
      .outputMode("complete").start()
    try {
      input.addData(
        StreamDoc(1, ts("2024-01-01 00:01:00"), "alpha alpha alpha beta", "en"),
        StreamDoc(2, ts("2024-01-01 00:02:00"), "alpha gamma delta epsilon", "en"),
        StreamDoc(3, ts("2024-01-01 01:01:00"), "zeta zeta eta", "en"))
      q.processAllAvailable()
      val wins = spark.table("mg_win")
        .select(col("window.start").cast("string"), col("sk")).collect()
        .map(r => r.getString(0) -> r.getMap[String, Long](1)).toMap
      val h0 = wins("2024-01-01 00:00:00")
      // window 0: n=8, k=4 -> bound 1.6; "alpha" (4) must be present
      assert(h0.contains("alpha"), s"hour-0 heavy hitter missing: $h0")
      assert(h0("alpha") <= 4L, s"MG must never overcount: $h0")
      val h1 = wins("2024-01-01 01:00:00")
      assert(h1.contains("zeta"), s"hour-1 heavy hitter missing: $h1")
    } finally q.stop()
  }

  test("bloom-prefiltered streaming dedup flags known content and absorbs new fingerprints") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_sbloom").toString
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 60)
    val t0 = ts("2024-01-01 00:00:00")
    // established corpus = its fingerprint topic only
    store.append("fp", Seq("alpha beta gamma").toDF("text")
      .select(md5(col("text")).as("chash")).withColumn("time", lit(t0)))
    val input = MemoryStream[StreamDoc]
    val q = TopicStream.dedupStreamBloom(input.toDF(), store, "fp", "flags")
      .option("checkpointLocation", s"$root/_ckpt").start()
    try {
      // batch 1: one known doc, one newcomer
      input.addData(
        StreamDoc(1, ts("2024-01-01 00:01:00"), "alpha beta gamma", "en"),
        StreamDoc(2, ts("2024-01-01 00:02:00"), "delta epsilon zeta", "en"))
      q.processAllAvailable()
      // batch 2: a dup of batch 1's newcomer — must be known NOW
      // (its fingerprint was absorbed into the topic by batch 1)
      input.addData(
        StreamDoc(3, ts("2024-01-01 00:03:00"), "delta epsilon zeta", "en"))
      q.processAllAvailable()
      val flags = store.readMerged("flags", "doc_id")
        .select("doc_id", "is_known").as[(Long, Boolean)].collect().toMap
      assert(flags == Map(1L -> true, 2L -> false, 3L -> true),
        s"known flagged, newcomer passed then absorbed: $flags")
      val fps = store.read("fp").select("chash").distinct().count()
      assert(fps == 2L, s"fp topic must hold exactly the two distinct contents, saw $fps")
    } finally q.stop()
  }

  test("streaming near-dup gate: band collisions vs the established corpus, batch-kernel parity, replay") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_snd").toString
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 60)
    val t1 = "the quick brown fox jumps over the lazy dog while rain " +
      "falls on the quiet grey town square today"
    val t2 = "completely different words describing an unrelated topic " +
      "entirely machine parts inventory list for warehouse five units"
    val b1 = Seq((1L, ts("2024-01-01 00:01:00"), t1),
                 (2L, ts("2024-01-01 00:02:00"), t2)).toDF("doc_id", "ts", "text")
    TopicStream.neardupBatch(store, "bands", "ndflags", 1L)(b1)
    // batch 2: an exact copy of doc 1 (every band collides), a
    // reworded copy (the LSH candidate case), and a fresh doc
    val b2 = Seq(
      (3L, ts("2024-01-01 00:03:00"), t1),
      (4L, ts("2024-01-01 00:04:00"), t1.replace("today", "tonight")),
      (5L, ts("2024-01-01 00:05:00"), "another unrelated document about " +
        "cooking pasta with tomato sauce and fresh basil leaves in summer"))
      .toDF("doc_id", "ts", "text")
    TopicStream.neardupBatch(store, "bands", "ndflags", 2L)(b2)
    def flags() = store.readMerged("ndflags", "doc_id")
      .select("doc_id", "n_band_hits", "is_neardup")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val f = flags()
    // batch 1 seeded an empty topic: nothing to collide with
    assert(f(1L) == (0L, false) && f(2L) == (0L, false), s"$f")
    // the exact copy collides on EVERY band of the signature
    assert(f(3L) == (4L, true), s"exact copy must hit all 4 bands: $f")
    assert(!f(5L)._2, s"fresh doc must pass: $f")
    // kernel parity: streamed hit counts == the batch operators' own
    // band derivation joined against batch 1's established set
    val est = graft.operators.Dedup.bandsPublic(b1)
      .select("band", "bkey").distinct()
    val exp = graft.operators.Dedup.bandsPublic(b2)
      .join(est, Seq("band", "bkey")).groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    Seq(3L, 4L, 5L).foreach { d =>
      assert(f(d)._1 == exp.getOrElse(d, 0L),
        s"doc $d: streamed ${f(d)._1} != batch-kernel ${exp.getOrElse(d, 0L)}")
    }
    // replayed batch (same seq): never sees its own bands, rewrites
    // the identical verdicts
    TopicStream.neardupBatch(store, "bands", "ndflags", 2L)(b2)
    assert(flags() == f, "a replayed batch must rewrite identical verdicts")
  }

  test("incremental line dedup rewrites docs, absorbs lines, and replays as a no-op") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_sline").toString
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 60)
    val L = (1 to 10).map(i => s"w$i").mkString(" ")
    val M = (1 to 10).map(i => s"m$i").mkString(" ")
    val N = (1 to 10).map(i => s"n$i").mkString(" ")
    val b1 = Seq((1L, ts("2024-01-01 00:01:00"), s"$L $M")).toDF("doc_id", "ts", "text")
    TopicStream.lineDedupBatch(store, "lines", "out")(b1, 0L)
    // batch 2: doc 2 repeats L (known from batch 1) + new N;
    // doc 3 is exactly N — the IN-BATCH keep-first gives N to doc 2
    val b2 = Seq(
      (2L, ts("2024-01-01 00:02:00"), s"$L $N"),
      (3L, ts("2024-01-01 00:03:00"), N)).toDF("doc_id", "ts", "text")
    TopicStream.lineDedupBatch(store, "lines", "out")(b2, 1L)
    def state() = store.readMerged("out", "doc_id")
      .select("doc_id", "n_lines", "n_dropped", "deduped_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val expected = Seq(
      (1L, 2L, 0L, s"$L $M"),
      (2L, 2L, 1L, N),
      (3L, 1L, 1L, ""))
    assert(state() == expected, s"got ${state()}")
    assert(store.read("lines").select("lhash").distinct().count() == 3L)
    // replay batch 2: probe excludes its own absorbed lines (src_batch
    // marker), so the rewrite is identical and the merged view a no-op
    TopicStream.lineDedupBatch(store, "lines", "out")(b2, 1L)
    assert(state() == expected, "a replayed micro-batch must rewrite the same version")
  }

  test("subscribeChanges CDC-tails a live topic: snapshot inserts, then updates/deletes") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_subchg").toString
    val gs = new GraftSession(spark, root)
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    gs.publish("kvt", Seq((1L, t(1000), "a", false), (2L, t(1000), "b", false))
      .toDF("key", "time", "v", "_tombstone"))
    val q = gs.subscribeChanges("kvt", "key", "kvt_state", "kvt_chg")
      .option("checkpointLocation", s"$root/_ckpt").start()
    try {
      q.processAllAvailable()
      def feed() = gs.store.readMerged("kvt_chg", "change_key")
        .select("key", "v", "_change_type").as[(Long, String, String)]
        .collect().sortBy(r => (r._1, r._3)).toSeq
      // batch 0 replays the topic's current content as the initial
      // snapshot: one insert per live key, state built as a side effect
      assert(feed() == Seq((1L, "a", "insert"), (2L, "b", "insert")), s"got ${feed()}")
      // a later revision + a tombstone classify against that state
      gs.publish("kvt", Seq((1L, t(2000), "a2", false), (2L, t(2000), "b", true))
        .toDF("key", "time", "v", "_tombstone"))
      q.processAllAvailable()
      assert(feed() == Seq(
        (1L, "a", "insert"), (1L, "a2", "update"),
        (2L, "b", "delete"), (2L, "b", "insert")), s"got ${feed()}")
    } finally q.stop()
  }

  test("chunkStream chunks arrivals; a shrinking revision drops its stale tail chunks") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_schunk").toString
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 60)
    val input = MemoryStream[StreamDoc]
    // width 4 / stride 3 so a 7-word doc yields 3 chunks (starts 0,3,6)
    val q = TopicStream.chunkStream(input.toDF(), store, "chunks", width = 4, stride = 3)
      .option("checkpointLocation", s"$root/_ckpt").start()
    try {
      input.addData(StreamDoc(1, ts("2024-01-01 00:01:00"), "a b c d e f g", "en"))
      q.processAllAvailable()
      val first = TopicStream.currentChunks(store, "chunks")
        .select("chunk_idx", "chunk_text").as[(Int, String)].collect().sortBy(_._1).toSeq
      assert(first == Seq((0, "a b c d"), (1, "d e f g"), (2, "g")), s"got $first")
      // revision shrinks the doc to ONE chunk: the old idx-1/idx-2
      // rows keep their keys, so only the doc_seq filter can kill them
      input.addData(StreamDoc(1, ts("2024-01-01 00:02:00"), "x y", "en"))
      q.processAllAvailable()
      val revised = TopicStream.currentChunks(store, "chunks")
        .select("chunk_idx", "chunk_text").as[(Int, String)].collect().toSeq
      assert(revised == Seq((0, "x y")), s"stale tail chunks must drop: $revised")
      // TWO revisions of one doc inside a single micro-batch: both
      // would land with the same _seq=batchId and doc_seq, so only the
      // pre-reduce (latest ts per doc) keeps versions from interleaving
      input.addData(
        StreamDoc(1, ts("2024-01-01 00:03:00"), "m n o p q", "en"),
        StreamDoc(1, ts("2024-01-01 00:04:00"), "z w", "en"))
      q.processAllAvailable()
      val latest = TopicStream.currentChunks(store, "chunks")
        .select("chunk_idx", "chunk_text").as[(Int, String)].collect().toSeq
      assert(latest == Seq((0, "z w")),
        s"within-batch revisions must resolve to the newest version only: $latest")
    } finally q.stop()
  }

  test("changesStream end-to-end: a live stream feeds the change topic across micro-batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_scdcs").toString
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 60)
    val input = MemoryStream[KvRow]
    val q = TopicStream.changesStream(input.toDF(), store, "key", "state", "chg")
      .option("checkpointLocation", s"$root/_ckpt").start()
    try {
      input.addData(KvRow(1L, ts("2024-01-01 00:01:00"), "a"))
      q.processAllAvailable()
      input.addData(KvRow(1L, ts("2024-01-01 00:02:00"), "a2"),
        KvRow(2L, ts("2024-01-01 00:02:00"), "b"))
      q.processAllAvailable()
      val feed = store.readMerged("chg", "change_key")
        .select("key", "v", "_change_type").as[(Long, String, String)]
        .collect().sortBy(r => (r._1, r._3)).toSeq
      assert(feed == Seq((1L, "a", "insert"), (1L, "a2", "update"), (2L, "b", "insert")),
        s"got $feed")
      val live = store.readMerged("state", "key")
        .select("key", "v").as[(Long, String)].collect().toMap
      assert(live == Map(1L -> "a2", 2L -> "b"), s"got $live")
    } finally q.stop()
  }

  test("streaming CDC classifies per batch, folds state, and replays idempotently") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_scdc").toString
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 60)
    // batch 0 seeds a fresh pipeline: everything is an insert
    val b0 = Seq(
      (1L, ts("2024-01-01 00:01:00"), "a"),
      (2L, ts("2024-01-01 00:01:00"), "b")).toDF("key", "ts", "v")
    TopicStream.changesBatch(store, "key", "state", "chg")(b0, 0L)
    // batch 1: update 1, delete 2, insert 3; key 4 arrives twice in
    // the SAME batch — the later ts wins and classifies once
    val b1 = Seq(
      (1L, ts("2024-01-01 00:02:00"), "a2", false),
      (2L, ts("2024-01-01 00:02:00"), "b", true),
      (3L, ts("2024-01-01 00:02:00"), "c", false),
      (4L, ts("2024-01-01 00:02:00"), "d_old", false),
      (4L, ts("2024-01-01 00:03:00"), "d", false)).toDF("key", "ts", "v", "_tombstone")
    TopicStream.changesBatch(store, "key", "state", "chg")(b1, 1L)
    def feed() = store.readMerged("chg", "change_key")
      .select("key", "v", "_change_type").as[(Long, String, String)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    val expected = Seq(
      (1L, "a", "insert"), (1L, "a2", "update"),
      (2L, "b", "delete"), (2L, "b", "insert"),
      (3L, "c", "insert"), (4L, "d", "insert"))
    assert(feed() == expected, s"got ${feed()}")
    // the folded state agrees with the batches' last-write-wins view
    val live = store.readMerged("state", "key")
      .select("key", "v").as[(Long, String)].collect().toMap
    assert(live == Map(1L -> "a2", 3L -> "c", 4L -> "d"), s"got $live")
    // replay batch 1: classification reads only _seq < batchId state,
    // writes are seq=batchId upserts — the feed and state are unchanged
    TopicStream.changesBatch(store, "key", "state", "chg")(b1, 1L)
    assert(feed() == expected, "replayed batch must not duplicate or reclassify")
    assert(store.readMerged("state", "key").count() == 3)
  }

  test("bloom streaming dedup bootstraps a fresh fingerprint topic from its first batch") {
    // First batch of a brand-new pipeline: the fingerprint topic does
    // not exist yet. Reading it unconditionally would throw "Path does
    // not exist" and kill the query; instead nothing is known and the
    // batch seeds the topic.
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_sbloom_fresh").toString
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 60)
    val input = MemoryStream[StreamDoc]
    val q = TopicStream.dedupStreamBloom(input.toDF(), store, "fp", "flags")
      .option("checkpointLocation", s"$root/_ckpt").start()
    try {
      input.addData(StreamDoc(1, ts("2024-01-01 00:01:00"), "alpha beta", "en"))
      q.processAllAvailable()
      input.addData(StreamDoc(2, ts("2024-01-01 00:02:00"), "alpha beta", "en"))
      q.processAllAvailable()
      val flags = store.readMerged("flags", "doc_id")
        .select("doc_id", "is_known").as[(Long, Boolean)].collect().toMap
      assert(flags == Map(1L -> false, 2L -> true),
        s"first batch must seed the topic, second must hit it: $flags")
    } finally q.stop()
  }

  test("streaming PQ encode appends frozen-codebook codes that match the batch encoder") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_pqstream").toString
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 60)
    val e = Tables.spread(Tables(spark, sfDir, "embeddings"))
    // codebook frozen from the established corpus; arrivals = ss15's increment
    val cb = graft.operators.Similarity.pqSeed(e.filter(col("vec_id") % 5 =!= 0))
    val arrivals = e.filter(col("vec_id") % 5 === 0).limit(4)
      .select("vec_id", "embedding").collect()
      .map(r => StreamVec(r.getLong(0), ts("2024-01-01 00:01:00"), r.getSeq[Float](1)))
    val input = MemoryStream[StreamVec]
    val q = TopicStream.pqEncodeStream(input.toDF(), store, cb, "pq_idx")
      .option("checkpointLocation", s"$root/_ckpt").start()
    try {
      input.addData(arrivals(0), arrivals(1))
      q.processAllAvailable()
      input.addData(arrivals(2), arrivals(3))
      q.processAllAvailable()
      val got = store.read("pq_idx").select("vec_id", "codes")
        .as[(Long, String)].collect().toMap
      val want = graft.operators.Similarity.pqEncode(
          e.filter(col("vec_id").isin(arrivals.map(_.vec_id): _*)), cb)
        .select("vec_id", "codes").as[(Long, String)].collect().toMap
      assert(got == want && got.size == 4,
        s"streamed codes must match the batch encoder: got=$got want=$want")
      val recon = store.read("pq_idx").select("recon_d2").as[Double].collect()
      assert(recon.forall(_ >= 0.0), "reconstruction error is a sum of squares")
    } finally q.stop()
  }

  test("streaming OOD gate routes arrivals against frozen thresholds and matches the batch scorer") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_oodgate").toString
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 60)
    // reference corpus: one tight cluster per label — every member
    // sits exactly AT its cell's p95, so only genuinely-far arrivals
    // can be strictly beyond
    val ref = ((0 until 40).map(i => (i.toLong, Array(1f, 1f), 0)) ++
        (0 until 40).map(i => (100L + i, Array(-1f, -1f), 1)))
      .toDF("vec_id", "embedding", "label")
    val (cents, thr) = graft.operators.Similarity.oodIndex(ref, qMilli = 950)
    val input = MemoryStream[StreamVec]
    val q = TopicStream.oodGateStream(input.toDF(), store, cents, thr, "ood")
      .option("checkpointLocation", s"$root/_ckpt").start()
    try {
      input.addData(
        StreamVec(1000, ts("2024-01-01 00:01:00"), Seq(1f, 1f)),    // in-distribution, cell 0
        StreamVec(1001, ts("2024-01-01 00:01:00"), Seq(9f, 9f)))    // far outlier, nearest cell 0
      q.processAllAvailable()
      input.addData(
        StreamVec(1002, ts("2024-01-01 00:02:00"), Seq(-1f, -1f)),  // in-distribution, cell 1
        // the same id twice IN ONE BATCH (replay/re-ingest): exactly one
        // verdict may land — the newest embedding wins, no k² fan-out
        StreamVec(1003, ts("2024-01-01 00:02:00"), Seq(9f, 9f)),
        StreamVec(1003, ts("2024-01-01 00:02:30"), Seq(1f, 1f)))
      q.processAllAvailable()
      assert(store.read("ood").filter(col("vec_id") === 1003L).count() == 1,
        "duplicate in-batch ids must collapse to one latest-wins verdict")
      assert(store.read("ood").filter(col("vec_id") === 1003L && col("is_ood")).count() == 0,
        "the newer in-distribution embedding must win for 1003")
      val got = store.read("ood").filter(col("vec_id") =!= 1003L)
        .select("vec_id", "cell", "is_ood")
        .as[(Long, Int, Boolean)].collect().toSet
      assert(got == Set((1000L, 0, false), (1001L, 0, true), (1002L, 1, false)),
        s"gate must flag exactly the planted outlier: $got")
      // the stream's verdicts must equal the batch scorer's on the same arrivals
      val batch = Seq((1000L, Array(1f, 1f)), (1001L, Array(9f, 9f)),
          (1002L, Array(-1f, -1f))).toDF("vec_id", "embedding")
      val want = graft.operators.Similarity.oodScore(batch, cents, thr)
        .select("vec_id", "cell", "is_ood").as[(Long, Int, Boolean)].collect().toSet
      assert(got == want, s"stream and batch scorer disagree: $got vs $want")
    } finally q.stop()
  }

  test("PQ drift monitor flags windows whose reconstruction error exceeds the baseline") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[EncodedVec]
    val q = TopicStream.pqDriftMonitor(input.toDF(), baselineErr = 1.0, tolerance = 1.5)
      .writeStream.format("memory").queryName("pq_drift")
      .outputMode("complete").start()
    try {
      input.addData(
        // hour 0: healthy (mean 1.0 <= 1.5 baseline-tolerance)
        EncodedVec(1, ts("2024-01-01 00:05:00"), 0.8),
        EncodedVec(2, ts("2024-01-01 00:15:00"), 1.2),
        // hour 1: drifted (mean 2.5 > 1.5)
        EncodedVec(3, ts("2024-01-01 01:05:00"), 2.0),
        EncodedVec(4, ts("2024-01-01 01:10:00"), 3.0))
      q.processAllAvailable()
      val rows = spark.table("pq_drift").collect()
        .map(r => r.getAs[java.sql.Timestamp]("w_start").toString ->
          (r.getAs[Long]("n"), r.getAs[Boolean]("retrain"))).toMap
      assert(rows == Map(
        "2024-01-01 00:00:00.0" -> (2L, false),
        "2024-01-01 01:00:00.0" -> (2L, true)),
        s"drifted window must flag retrain: $rows")
    } finally q.stop()
  }

  test("embedding drift monitor: collapsed windows concentrate variance on one dim") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[StreamVec]
    val q = TopicStream.embedDriftMonitor(
        input.toDF().withColumnRenamed("ts", "time"), dim = 4)
      .writeStream.format("memory").queryName("embed_drift")
      .outputMode("complete").start()
    try {
      input.addData(
        // hour 0: healthy — variance spread over dims 2 and 3
        StreamVec(1, ts("2024-01-01 00:05:00"), Seq(1f, 2f, 0f, 0f)),
        StreamVec(2, ts("2024-01-01 00:15:00"), Seq(1f, 0f, 2f, 0f)))
      q.processAllAvailable()
      input.addData(
        // hour 1: collapsed — ALL variance on dim 1 (split across a
        // second micro-batch: buffers must merge across batches)
        StreamVec(3, ts("2024-01-01 01:05:00"), Seq(10f, 0f, 0f, 0f)))
      input.addData(
        StreamVec(4, ts("2024-01-01 01:10:00"), Seq(-10f, 0f, 0f, 0f)))
      q.processAllAvailable()
      val rows = spark.table("embed_drift").collect()
        .map(r => r.getAs[java.sql.Timestamp]("w_start").toString ->
          ((r.getAs[Long]("n"), r.getAs[Long]("total_var_q"),
            r.getAs[Int]("top_dim"), r.getAs[Long]("top_share_milli")))).toMap
      // hand-computed from milli-quantized integer moments:
      // h0: var_q = [0, 4e6, 4e6, 0] -> total 8e6, top dim 2, share 500
      // h1: var_q = [4e8, 0, 0, 0]   -> total 4e8, top dim 1, share 1000
      assert(rows == Map(
        "2024-01-01 00:00:00.0" -> ((2L, 8000000L, 2, 500L)),
        "2024-01-01 01:00:00.0" -> ((2L, 400000000L, 1, 1000L))),
        s"drift indicators must be exact integers: $rows")
    } finally q.stop()
  }

  test("streaming decontamination flags benchmark-overlapping docs exactly once") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // the "eval set": one doc whose 5-grams are the contamination probes
    val bench = Seq("alpha beta gamma delta epsilon zeta").toDF("text")
      .select(explode(graft.operators.Curation.grams5(
        split(lower(col("text")), " "))).as("gram"))
    val input = MemoryStream[StreamDoc]
    val q = TopicStream.decontamStream(input.toDF(), bench, "10 minutes")
      .writeStream.format("memory").queryName("decontam").outputMode("append").start()
    try {
      input.addData(
        // contains the benchmark 5-gram "beta gamma delta epsilon zeta"
        StreamDoc(1, ts("2024-01-01 00:00:00"), "intro beta gamma delta epsilon zeta outro", "en"),
        // clean doc: no shared 5-gram
        StreamDoc(2, ts("2024-01-01 00:01:00"), "totally unrelated clean document text here", "en"),
        // too short for any 5-gram
        StreamDoc(3, ts("2024-01-01 00:02:00"), "tiny doc", "en"))
      q.processAllAvailable()
      // replay of doc 1 within the watermark must not re-emit
      input.addData(
        StreamDoc(1, ts("2024-01-01 00:03:00"), "intro beta gamma delta epsilon zeta outro", "en"))
      q.processAllAvailable()
      val flagged = spark.table("decontam").select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(flagged == Seq(1L),
        s"expected exactly doc 1 flagged once, got $flagged")
    } finally q.stop()
  }

  test("streaming leakage audit flags train-overlapping arrivals without broadcasting the train side") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // the train split's gram fingerprints: corpus-sized in production,
    // so the audit must NOT hint-broadcast it
    val trainGrams = Seq(
      "alpha beta gamma delta epsilon zeta",
      "one two three four five six seven").toDF("text")
      .select(explode(graft.operators.Curation.grams5(
        split(lower(col("text")), " "))).as("gram"))
    val input = MemoryStream[StreamDoc]
    val audited = TopicStream.leakageAuditStream(input.toDF(), trainGrams, "10 minutes")
    // scale guard: the train-side join carries no broadcast hint (the
    // same corpus-proportional-table rule PlanSpec pins for dd04/dd05)
    val hinted = audited.queryExecution.analyzed.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.hint.leftHint.nonEmpty || j.hint.rightHint.nonEmpty => j
    }
    assert(hinted.isEmpty, "leakage audit must not hint-broadcast the train gram set")
    val q = audited.writeStream.format("memory").queryName("leakage")
      .outputMode("append").start()
    try {
      input.addData(
        // shares "beta gamma delta epsilon zeta" with train
        StreamDoc(1, ts("2024-01-01 00:00:00"), "intro beta gamma delta epsilon zeta outro", "en"),
        // clean: no 5-gram overlap
        StreamDoc(2, ts("2024-01-01 00:01:00"), "completely fresh held out document body", "en"),
        // too short for any 5-gram: leak-free by construction
        StreamDoc(3, ts("2024-01-01 00:02:00"), "tiny doc", "en"))
      q.processAllAvailable()
      // a replayed contaminated doc inside the watermark emits only once
      input.addData(
        StreamDoc(1, ts("2024-01-01 00:03:00"), "intro beta gamma delta epsilon zeta outro", "en"),
        // second batch arrival overlapping the OTHER train doc
        StreamDoc(4, ts("2024-01-01 00:04:00"), "padding three four five six seven close", "en"))
      q.processAllAvailable()
      val flagged = spark.table("leakage").select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(flagged == Seq(1L, 4L),
        s"expected docs 1 and 4 flagged exactly once, got $flagged")
    } finally q.stop()
  }

  test("streaming vocab revises per-window word counts across micro-batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[StreamDoc]
    val q = TopicStream.vocabStream(input.toDF(), "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("vocab").outputMode("update").start()
    try {
      input.addData(StreamDoc(1, ts("2024-01-01 00:05:00"), "spark spark scan", "en"))
      q.processAllAvailable()
      input.addData(StreamDoc(2, ts("2024-01-01 00:20:00"), "spark merge", "en"))
      q.processAllAvailable()
      // update mode: the LAST emitted row per (window, word) is current
      val cur = spark.table("vocab").collect()
        .groupBy(r => (r.getTimestamp(0), r.getString(1)))
        .map { case (k, rows) => (k._2, rows.last.getLong(2)) }
      assert(cur("spark") == 3L, s"spark count should revise 2 -> 3, got $cur")
      assert(cur("scan") == 1L && cur("merge") == 1L)
    } finally q.stop()
  }

  test("latestPerKey keeps newest value and counts rows seen") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[TopicEvent]
    val q = TopicStream.latestPerKey(input.toDS())
      .writeStream.format("memory").queryName("latest").outputMode("update").start()
    try {
      input.addData(events(): _*)
      q.processAllAvailable()
      // out-of-order late row for user 1: older ts must not win
      input.addData(TopicEvent(6, ts("2024-01-01 00:30:00"), 1, "click", 99.0))
      q.processAllAvailable()
      val byUser = spark.table("latest").orderBy(col("n_seen").desc)
        .collect().groupBy(_.getAs[Long]("user_id")).map { case (k, rows) => k -> rows.head }
      assert(byUser(1L).getAs[java.sql.Timestamp]("ts") == ts("2024-01-01 01:05:00"))
      assert(byUser(1L).getAs[Double]("value") == 4.0)
      assert(byUser(1L).getAs[Long]("n_seen") == 4L)
      assert(byUser(2L).getAs[Double]("value") == 5.0)
    } finally q.stop()
  }

  test("watermark drops rows later than the delay in append mode") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[TopicEvent]
    val q = TopicStream.windowedStats(input.toDF(), "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("wm_stats").outputMode("append").start()
    try {
      input.addData(events(): _*)
      q.processAllAvailable()
      // advance the watermark far past hour 0, then send a too-late row
      input.addData(TopicEvent(99, ts("2024-01-01 05:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      input.addData(TopicEvent(100, ts("2024-01-01 00:20:00"), 1, "click", 500.0))
      q.processAllAvailable()
      val hour0 = spark.table("wm_stats")
        .filter(col("w_start") === ts("2024-01-01 00:00:00") && col("event_type") === "click")
        .collect()
      // the late 500-cent row must not appear in the finalized hour-0 window
      assert(hour0.forall(_.getAs[Long]("sum_value_cents") == 300L),
        s"late row leaked into finalized window: ${hour0.mkString}")
    } finally q.stop()
  }

  test("streaming ingest lands in TopicStore's bucketed parquet layout") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val input = MemoryStream[TopicEvent]
    val q = TopicStream.ingestToTopic(input.toDF(), s"$root/topic", s"$root/ckpt").start()
    try {
      input.addData(events(): _*)
      q.processAllAvailable()
    } finally q.stop()
    // batch side reads the same layout back, bucket-pruned
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 60)
    val got = store.read("topic")
    assert(got.count() == events().size)
    assert(got.columns.contains("bucket"))
    val buckets = new java.io.File(s"$root/topic").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bucket=")).map(_.getName).sorted
    assert(buckets.length == 2, s"expected 2 hourly buckets, got ${buckets.mkString(",")}")
  }

  test("streaming dedup drops replayed event_ids within the watermark") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[TopicEvent]
    val q = input.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("dedup_stream").outputMode("append").start()
    try {
      input.addData(events(): _*)
      q.processAllAvailable()
      input.addData(events().take(3): _*) // replay: at-least-once source
      q.processAllAvailable()
      assert(spark.table("dedup_stream").count() == events().size)
    } finally q.stop()
  }

  test("stream-stream join matches clicks to views per user within an hour") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val clicks = MemoryStream[TopicEvent]
    val views = MemoryStream[TopicEvent]
    val c = clicks.toDF().filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("event_id").as("c_id"))
      .withWatermark("c_ts", "30 minutes")
    val v = views.toDF().filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"), col("event_id").as("v_id"))
      .withWatermark("v_ts", "30 minutes")
    val joined = c.join(v,
      col("c_user") === col("v_user") &&
      col("v_ts") >= col("c_ts") && col("v_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"))
    val q = joined.writeStream.format("memory").queryName("ss_join").outputMode("append").start()
    try {
      clicks.addData(TopicEvent(1, ts("2024-01-01 00:05:00"), 1, "click", 1.0))
      views.addData(TopicEvent(2, ts("2024-01-01 00:25:00"), 1, "view", 2.0),
        TopicEvent(3, ts("2024-01-01 03:00:00"), 1, "view", 3.0))
      q.processAllAvailable()
      val rows = spark.table("ss_join").select("c_id", "v_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSet == Set((1L, 2L)), s"only the in-window view joins: ${rows.mkString}")
    } finally q.stop()
  }

  test("stream-static broadcast join enriches events") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("cust_id", "tier")
    val input = MemoryStream[TopicEvent]
    val q = TopicStream.enrich(input.toDF(), dim, "user_id", "cust_id")
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    try {
      input.addData(events(): _*)
      q.processAllAvailable()
      val tiers = spark.table("enriched").select("user_id", "tier").distinct().collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(tiers == Set((1L, "gold"), (2L, "silver")))
    } finally q.stop()
  }

  test("lexIndexStream maintains a searchable postings index; revisions retire dropped terms") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_lexidx").toString
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 60)
    val input = MemoryStream[StreamDoc]
    val q = TopicStream.lexIndexStream(input.toDF(), store, "lex")
      .option("checkpointLocation", s"$root/_ckpt").start()
    try {
      input.addData(
        StreamDoc(1, ts("2024-01-01 00:01:00"), "vector scan join vector", "en"),
        StreamDoc(2, ts("2024-01-01 00:01:00"), "scan scan filter", "en"))
      q.processAllAvailable()
      val hits = TopicStream.lexSearch(store, "lex", Seq("vector", "scan"))
        .select("doc_id", "n_terms_hit", "rank").as[(Long, Long, Int)]
        .collect().sortBy(_._3).toSeq
      // doc 1 hits both terms (vector is rarer -> bigger idf), doc 2 one
      assert(hits.map(h => (h._1, h._2)) == Seq((1L, 2L), (2L, 1L)), s"got $hits")
      assert(hits.map(_._3) == Seq(1, 2), "ranks must be 1-based and dense")
      // a revision DROPS 'vector' from doc 1: its stale posting keeps
      // its key, so only the doc_seq filter can retire it
      input.addData(StreamDoc(1, ts("2024-01-01 00:02:00"), "scan only now", "en"))
      q.processAllAvailable()
      val after = TopicStream.lexSearch(store, "lex", Seq("vector"))
        .select("doc_id").as[Long].collect().toSeq
      assert(after.isEmpty,
        s"the revised-away term must stop matching doc 1: $after")
      val scanHits = TopicStream.lexSearch(store, "lex", Seq("scan"))
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(scanHits == Seq(1L, 2L), s"both docs still carry 'scan': $scanHits")
      // two same-doc versions INSIDE one batch: newest wins (the
      // pre-reduce), so 'interim' never enters the index
      input.addData(
        StreamDoc(3, ts("2024-01-01 00:03:00"), "interim words", "en"),
        StreamDoc(3, ts("2024-01-01 00:04:00"), "final words", "en"))
      q.processAllAvailable()
      assert(TopicStream.lexSearch(store, "lex", Seq("interim")).count() == 0)
      assert(TopicStream.lexSearch(store, "lex", Seq("final"))
        .select("doc_id").as[Long].collect().toSeq == Seq(3L))
      // the term filter reaches the postings SCAN (before the merge
      // agg) — the load-bearing claim that a query reads ~term shard
      // groups instead of merging the whole topic
      val plan = TopicStream.lexSearch(store, "lex", Seq("vector", "scan"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("In(w, ") || plan.contains("In(w,"),
        s"the w IN (...) filter must be pushed to the postings scan:\n$plan")
      // between-writes consistency: postings from an IN-FLIGHT batch
      // (committed before its registry update) are invisible — the
      // doc serves its previous version instead of vanishing
      val before = TopicStream.lexSearch(store, "lex", Seq("scan"))
        .select("doc_id", "score").as[(Long, Long)].collect().toSet
      val maxSeq = store.read("lex").agg(max(col("_seq"))).head.getLong(0)
      val inflight = Seq(("scan#2", "scan", 2L, ts("2024-01-01 00:09:00"), 9L, 3L, maxSeq + 1))
        .toDF("post_key", "w", "doc_id", "time", "tf", "dl", "doc_seq")
      store.upsert("lex", inflight, "time", seq = Some(maxSeq + 1))
      val mid = TopicStream.lexSearch(store, "lex", Seq("scan"))
        .select("doc_id", "score").as[(Long, Long)].collect().toSet
      assert(mid == before,
        s"an in-flight batch must not change what readers see: $mid vs $before")
    } finally q.stop()
  }

  test("residual ANN index: build/grow/serve self-dispatch on the enc marker, equal the ss24 kernels") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_annresid").toString
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 60)
    val e = Tables(spark, sfDir, "embeddings")
    TopicStream.annIndexBuild(store, e, "ridx", residual = true)
    assert(store.read("ridx_cb").select("enc").head.getString(0) == "residual")
    val vecs = e.filter(col("vec_id").isin(3L, 17L))
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    val input = MemoryStream[AnnQuery]
    // the serve writer reads the marker itself — no residual flag here
    val q = TopicStream.annServeStream(input.toDF(), store, "ridx", "rres", k = 3)
      .option("checkpointLocation", s"$root/_ckpt").start()
    try {
      input.addData(
        AnnQuery(1001L, ts("2026-01-01 00:01:00"), vecs(3L)),
        AnnQuery(1002L, ts("2026-01-01 00:01:00"), vecs(17L)))
      q.processAllAvailable()
      val res = store.readMerged("rres", "ann_key")
      // a corpus-vector query retrieves itself at rank 1 (residual ADC
      // of an exact match is the all-zero residual's code distance —
      // small — and the exact-cosine rerank pins it first regardless)
      val top = res.filter(col("q_id") === 1001L && col("rank") === 1)
        .select("vec_id", "cos_exact").as[(Long, Double)].head()
      assert(top._1 == 3L && top._2 > 0.999999, s"self-retrieval failed: $top")
      // the serve loop equals the batch residual kernels on the same frames
      def bare(n: String) = store.read(n).drop("bucket", "time")
      val expected = graft.operators.Similarity.ivfpqResidualProbe(
        store.readMerged("ridx", "vec_id").drop("bucket", "time"),
        bare("ridx_cents"), bare("ridx_cb").drop("enc"),
        Seq((1001L, vecs(3L)), (1002L, vecs(17L))).toDF("q_id", "q_emb"),
        nprobe = 2, shortlist = 10, k = 3, excludeSelf = false)
        .select("q_id", "rank", "vec_id").as[(Long, Int, Long)].collect().toSet
      val got = res.select("q_id", "rank", "vec_id")
        .as[(Long, Int, Long)].collect().toSet
      assert(got == expected, s"residual serve must equal the batch kernel:\n$got\n$expected")
    } finally q.stop()
    // an arrival encodes through the RESIDUAL kernel (marker dispatch in
    // the grow writer): its stored cidx equals the batch encoder's
    val arrival = e.filter(col("vec_id") === 42L)
      .select(col("vec_id") + 100000L as "vec_id",
        lit(java.sql.Timestamp.valueOf("2026-01-01 00:05:00")).as("ts"),
        col("embedding"))
    val in2 = MemoryStream[(Long, java.sql.Timestamp, Array[Float])]
    val g = TopicStream.annIndexStream(
        in2.toDF().toDF("vec_id", "ts", "embedding"), store, "ridx")
      .option("checkpointLocation", s"$root/_ckpt2").start()
    try {
      in2.addData(arrival.as[(Long, java.sql.Timestamp, Array[Float])].collect().head)
      g.processAllAvailable()
      def bare(n: String) = store.read(n).drop("bucket", "time")
      val stored = store.readMerged("ridx", "vec_id")
        .filter(col("vec_id") === 100042L)
        .select(concat_ws("-", col("cidx"))).as[String].head()
      val batch = graft.operators.Similarity.ivfpqResidualEncode(
          e.filter(col("vec_id") === 42L), bare("ridx_cents"), bare("ridx_cb").drop("enc"))
        .select(concat_ws("-", col("cidx"))).as[String].head()
      assert(stored == batch, s"arrival must residual-encode like the batch kernel: $stored != $batch")
    } finally g.stop()
  }

  test("annServeStream answers query batches from the frozen IVF-PQ index topics") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_annserve").toString
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 60)
    val e = Tables(spark, sfDir, "embeddings")
    TopicStream.annIndexBuild(store, e, "annidx")
    // two corpus vectors reused as query payloads
    val vecs = e.filter(col("vec_id").isin(3L, 17L))
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    val input = MemoryStream[AnnQuery]
    val q = TopicStream.annServeStream(input.toDF(), store, "annidx", "annres", k = 3)
      .option("checkpointLocation", s"$root/_ckpt").start()
    try {
      input.addData(
        AnnQuery(1001L, ts("2026-01-01 00:01:00"), vecs(3L)),
        AnnQuery(1002L, ts("2026-01-01 00:01:00"), vecs(17L)))
      q.processAllAvailable()
      val res = store.readMerged("annres", "ann_key")
      val byQ = res.select("q_id", "rank", "vec_id", "cos_exact")
        .as[(Long, Int, Long, Double)].collect().groupBy(_._1)
      assert(byQ.keySet == Set(1001L, 1002L) && byQ.values.forall(_.length == 3),
        s"each query must get exactly k=3 results: ${res.collect().toSeq}")
      // a query that IS a corpus vector must retrieve itself at rank 1
      // (excludeSelf=false in serving; cos(self)=1 wins the rerank)
      val top1001 = byQ(1001L).minBy(_._2)
      assert(top1001._3 == 3L && top1001._4 > 0.999999,
        s"query 1001 (vector 3's embedding) must retrieve vector 3 first: $top1001")
      // the serve result equals the batch probe kernel run directly
      // against the same persisted frames
      def bare(n: String) = store.read(n).drop("bucket", "time")
      val expected = graft.operators.Similarity.ivfpqProbe(
        store.readMerged("annidx", "vec_id").drop("bucket", "time"),
        bare("annidx_cents"), bare("annidx_cb"),
        Seq((1001L, vecs(3L)), (1002L, vecs(17L))).toDF("q_id", "q_emb"),
        nprobe = 2, shortlist = 10, k = 3, excludeSelf = false)
        .select("q_id", "rank", "vec_id").as[(Long, Int, Long)].collect().toSet
      val got = res.select("q_id", "rank", "vec_id")
        .as[(Long, Int, Long)].collect().toSet
      assert(got == expected, s"serve loop must equal the batch kernel:\n$got\n$expected")
      // re-submitting a query overwrites its results (last-write-wins)
      input.addData(AnnQuery(1001L, ts("2026-01-01 00:02:00"), vecs(17L)))
      q.processAllAvailable()
      val re = store.readMerged("annres", "ann_key")
        .filter(col("q_id") === 1001L && col("rank") === 1)
        .select("vec_id").as[Long].collect().toSeq
      assert(re == Seq(17L),
        s"re-submitted query 1001 must now retrieve vector 17 first: $re")
    } finally q.stop()
  }

  test("annIndexStream grows the serve index; a new serve writer retrieves arrivals") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_anngrow").toString
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 60)
    val e = Tables(spark, sfDir, "embeddings")
    // build on the ESTABLISHED corpus only; vec 17 arrives later
    TopicStream.annIndexBuild(store, e.filter(col("vec_id") =!= 17L), "annidx")
    val v17 = e.filter(col("vec_id") === 17L)
      .select("embedding").as[Array[Float]].head()
    val vecIn = MemoryStream[StreamVec]
    val growQ = TopicStream.annIndexStream(vecIn.toDF(), store, "annidx")
      .option("checkpointLocation", s"$root/_gckpt").start()
    try {
      // vec 17 is NEW; vec 3 is a RE-PUBLISH of a built vector with a
      // different embedding (17's negation), in the very FIRST
      // micro-batch — the build's seq must sit strictly below the
      // stream's so the re-publish deterministically overwrites
      val v3rev = v17.map(-_)
      vecIn.addData(
        StreamVec(17L, ts("2026-01-01 00:01:00"), v17.toSeq),
        StreamVec(3L, ts("2026-01-01 00:01:00"), v3rev.toSeq))
      growQ.processAllAvailable()
      // the arrival encodes exactly as a built vector would: its
      // index row equals the batch kernel's for the same frames
      def bare(n: String) = store.read(n).drop("bucket", "time")
      val grown = store.readMerged("annidx", "vec_id")
      assert(grown.filter(col("vec_id") === 17L).count() == 1)
      val viaKernel = graft.operators.Similarity.ivfpqEncode(
        Seq((17L, v17)).toDF("vec_id", "embedding"),
        bare("annidx_cents"), bare("annidx_cb"))
        .select(col("vec_id"), col("cell"), col("cidx"))
        .as[(Long, Int, Array[Int])].head()
      val viaStream = grown.filter(col("vec_id") === 17L)
        .select(col("vec_id"), col("cell"), col("cidx"))
        .as[(Long, Int, Array[Int])].head()
      assert(viaStream._2 == viaKernel._2 && viaStream._3.toSeq == viaKernel._3.toSeq,
        s"arrival must encode like the build kernel: $viaStream vs $viaKernel")
      // the batch-0 re-publish of vec 3 overwrote its build row: its
      // index entry now carries the REVISED embedding's encoding
      val rev3Kernel = graft.operators.Similarity.ivfpqEncode(
        Seq((3L, v3rev)).toDF("vec_id", "embedding"),
        bare("annidx_cents"), bare("annidx_cb"))
        .select(col("cell"), col("cidx")).as[(Int, Array[Int])].head()
      val re3 = grown.filter(col("vec_id") === 3L)
        .select(col("cell"), col("cidx")).as[(Int, Array[Int])].collect()
      assert(re3.length == 1 && re3.head._1 == rev3Kernel._1 &&
        re3.head._2.toSeq == rev3Kernel._2.toSeq,
        s"a first-batch re-publish must overwrite the build row: ${re3.toSeq}")
      // a NEW serve writer (fresh index snapshot) retrieves the arrival
      val annIn = MemoryStream[AnnQuery]
      val serveQ = TopicStream.annServeStream(annIn.toDF(), store, "annidx", "annres", k = 1)
        .option("checkpointLocation", s"$root/_sckpt").start()
      try {
        annIn.addData(AnnQuery(2001L, ts("2026-01-01 00:02:00"), v17))
        serveQ.processAllAvailable()
        val top = store.readMerged("annres", "ann_key")
          .select("vec_id").as[Long].collect().toSeq
        assert(top == Seq(17L),
          s"the grown index must serve the arrived vector: $top")
      } finally serveQ.stop()
    } finally growQ.stop()
  }
}

private object TestEvents {
  case class StreamDoc(doc_id: Long, ts: java.sql.Timestamp, text: String, lang: String)
  case class StreamVec(vec_id: Long, ts: java.sql.Timestamp, embedding: Seq[Float])
  case class EncodedVec(vec_id: Long, time: java.sql.Timestamp, recon_d2: Double)
  case class KvRow(key: Long, ts: java.sql.Timestamp, v: String)
}
