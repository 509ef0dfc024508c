package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-series operators: the capabilities ella's topic/time model
  * exposes (time-indexed topics, `time < now()` range scans, latest
  * value reads, streaming windows — README.md:100-126,
  * ella-engine/src/table/topic.rs).
  *
  * All windows order by (ts, event_id) so ties are totally ordered;
  * epoch-second arithmetic is integer (exact, engine-independent).
  * At scale: every op here shuffles at most once on the series key
  * (user_id / event_type); window functions then run within the
  * partition. Time-bucketed topic storage (graft.sources.TopicStore)
  * makes the ts06-style range scans partition-pruned.
  */
object TimeSeries {
  private def ev(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).withColumn("epoch_s", col("ts").cast("long"))

  /** Per-user funnel stage times (ts21's resolution, shared with
    * ts25's timing report): one user_id shuffle aggregates stage-0's
    * min and each later stage's candidate list; stage chaining is then
    * pure per-row array compute (array_min over filter) — no window
    * function, no self-join, no re-scan per stage. Timestamps chain as
    * microsecond integers, so depth/timing are engine-exact. */
  private def funnelTimes(s: SparkSession, d: String): DataFrame = {
    val stages = Seq("signup", "view", "purchase")
    val e = Tables.events(s, d).filter(col("event_type").isin(stages: _*))
    val tol = expr("INTERVAL 12 HOURS")
    e.groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "signup", col("ts"))).as("t1"),
        collect_list(when(col("event_type") === "view", col("ts"))).as("vts"),
        collect_list(when(col("event_type") === "purchase", col("ts"))).as("pts"))
      .withColumn("t2", array_min(filter(col("vts"),
        t => t >= col("t1") && t <= col("t1") + tol)))
      .withColumn("t3", array_min(filter(col("pts"),
        t => t >= col("t2") && t <= col("t2") + tol)))
  }

  /** ts23's whole pipeline over any (user_id, ts, event_id,
    * event_type) frame — shared by the batch query and the
    * streaming twin's read side ([[graft.streaming.TopicStream
    * .currentTopPaths]]), so stream and batch can never disagree on
    * path semantics. See ts23's scale notes (partial WindowGroupLimit
    * before the shuffle, path-domain rollup, TakeOrdered top-k). */
  private[graft] def topPathsOf(events: DataFrame, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .groupBy(col("user_id"))
      .agg(array_sort(collect_list(
        struct(col("rn"), col("event_type")))).as("evs"))
      .select(array_join(
        transform(col("evs"), e => e.getField("event_type")), ">").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(k)
  }

  /** ts27's segmentation tail over a per-user (user_id, last_ts,
    * n_events, value_cents) frame plus a 1-row anchor frame
    * (anchor_ts) — shared by the batch query and the streaming twin's
    * read side ([[graft.streaming.TopicStream.currentRfm]]). The
    * three global quartile orders use the GroupPrefix closed-form
    * NTILE (see ts27's scale notes: range-partition parallel, no
    * one-task window). */
  private[graft] def rfmSegment(perUser: DataFrame, anchor: DataFrame): DataFrame = {
    val base = perUser.crossJoin(broadcast(anchor))
      .select(col("user_id"), col("n_events"), col("value_cents"),
        (col("anchor_ts").cast("long") - col("last_ts").cast("long")).as("recency_s"))
    def quartile(df: DataFrame, ord: Seq[Column], name: String): DataFrame = {
      val ranked = graft.functions.GroupPrefix.groupPrefixC(
        df.withColumn("_g", lit(1)), "_g", ord)
      val counts = ranked.groupBy(col("_g")).agg(count(lit(1)).as("n"))
      ranked.join(broadcast(counts), "_g")
        .withColumn("q_sz", expr("CAST(n DIV 4 AS INT)"))
        .withColumn("q_rem", expr("CAST(n % 4 AS INT)"))
        .withColumn(name, graft.functions.GroupPrefix.ntileExpr(4))
        .drop("_g", "n", "q_sz", "q_rem", "rn")
    }
    val r = quartile(base, Seq(col("recency_s"), col("user_id")), "r_q")
    val f = quartile(r, Seq(-col("n_events"), col("user_id")), "f_q")
    val m = quartile(f, Seq(-col("value_cents"), col("user_id")), "m_q")
    m.select(col("user_id"), col("recency_s"), col("n_events"),
      col("value_cents"), col("r_q"), col("f_q"), col("m_q"),
      (col("r_q") * 100 + col("f_q") * 10 + col("m_q")).as("rfm"))
  }

  /** ts25's report tail over a per-user stage-times frame (columns
    * t1..tN, one per stage, null below the matched depth) — shared
    * by the batch query and the streaming twin's read side
    * ([[graft.streaming.TopicStream.currentFunnelTiming]]). Per
    * consecutive stage pair: conversion rate among users who REACHED
    * the earlier stage plus integer-exact epoch-second timing stats
    * (the two-row rollup; the corpus shuffles only inside the
    * upstream per-user resolution). */
  private[graft] def funnelTimingReport(f: DataFrame, stages: Seq[String]): DataFrame = {
    val secs: Column => Column = c => c.cast("long")
    val pairs = stages.indices.dropRight(1).map { i =>
      struct(lit(s"${stages(i)}>${stages(i + 1)}").as("transition"),
        col(s"t${i + 1}").isNotNull.as("prev"),
        (secs(col(s"t${i + 2}")) - secs(col(s"t${i + 1}"))).as("dt_s"))
    }
    f.select(explode(array(pairs: _*)).as("r"))
      .select(col("r.transition").as("transition"),
        col("r.prev").as("prev"), col("r.dt_s").as("dt_s"))
      .filter(col("prev"))
      .groupBy(col("transition"))
      .agg(count(lit(1)).as("n_prev"), count(col("dt_s")).as("n_conv"),
        min(col("dt_s")).as("min_s"), max(col("dt_s")).as("max_s"),
        sum(col("dt_s")).as("sum_s"))
      .select(col("transition"), col("n_prev"), col("n_conv"),
        expr("(n_conv * 1000) DIV n_prev").as("conv_milli"),
        col("min_s"), col("max_s"),
        expr("CASE WHEN n_conv > 0 THEN (sum_s * 1000) DIV n_conv END")
          .as("mean_milli_s"))
  }

  /** ts31's report tail over a distinct (user_id, day) ACTIVITY frame
    * — shared by the batch query and the streaming twin's read side
    * ([[graft.streaming.TopicStream.currentStickiness]], which reads
    * the same state topic retentionStream maintains), so stream and
    * batch can never disagree. Weekly DAU/WAU stickiness (the
    * engagement staple next to ts22's retention): per week
    * (Monday-start `date_trunc('week')` in both engines) the
    * active-day count, summed DAU, WAU, and avg-DAU/WAU in integer
    * milli (sum_dau*1000 DIV (n_days*wau) — one flooring division,
    * engine-exact). The input frame is already user-day-sized (the
    * corpus collapsed ONCE upstream); everything here is
    * calendar-domain: the dau rollup, the weekly rollup, and the
    * user-week distinct are each at most user-day-sized, and the
    * final join is calendar-sized (AQE broadcasts it). */
  private[graft] def stickinessFromActivity(acts: DataFrame): DataFrame = {
    val wk: Column => Column =
      d => date_format(date_trunc("week", d), "yyyy-MM-dd")
    val dau = acts.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val weekly = dau.groupBy(wk(col("day")).as("week"))
      .agg(sum(col("dau")).as("sum_dau"), count(lit(1)).as("n_days"))
    val wau = acts.select(col("user_id"), wk(col("day")).as("week")).distinct()
      .groupBy(col("week")).agg(count(lit(1)).as("wau"))
    weekly.join(wau, "week")
      .select(col("week"), col("n_days"), col("sum_dau"), col("wau"),
        expr("(sum_dau * 1000) DIV (n_days * wau)").as("stickiness_milli"))
  }

  /** ts35's tail over a PRE-COUNTED integer histogram (key, cents,
    * cnt) — shared verbatim by the batch query and the streaming
    * read side ([[graft.streaming.TopicStream.currentQuantiles]]),
    * and exposed as [[graft.api]]'s `histQuantiles` verb. For each
    * q (milli) per key: the smallest cents whose cumulative count
    * reaches ceil(q·n/1000), tested as cum·1000 ≥ q·n — integers
    * only. The windows run over the HISTOGRAM (value-domain-sized at
    * any corpus scale), never the facts. */
  /** Lag-k autocorrelation of an integer series — the ts36 kernel
    * shared with [[graft.api]]'s `autocorrReport` verb. `counts` must
    * carry (dn: long — the equally-spaced index, x: long — the
    * value). ENGINE-EXACT via the mean-free integer identity
    * y_t = n·x_t − S: numerator A_k = n²·P_k − n·S·Q_k + cnt_k·S² and
    * denominator D = n²·Σx² − n·S² are pure longs, and the single
    * division truncates toward zero identically in both engines
    * (negative numerators — anti-correlation — verified). Missing
    * indices DENSIFY to x=0 (the equally-spaced contract is enforced
    * here, not assumed of the caller — a groupBy-built day series
    * omits zero days, which would erase the periodicity signal they
    * carry). Overflow is loud end to end: ANSI mode (Spark 4
    * default, verified in-session) throws on long wrap inside the
    * moment arithmetic itself, and the in-plan assert_true guards
    * the ×1000 headroom of the final division (the ts33 discipline).
    * Every stage after the caller's series agg runs on the
    * series-index domain (|dn|×maxLag rows, broadcast joins — zero
    * corpus-keyed shuffles). */
  private[graft] def autocorrOf(counts0: DataFrame, maxLag: Int): DataFrame = {
    val s = counts0.sparkSession
    // checkpoint the CALLER'S series first: its plan holds the one
    // corpus scan, and it feeds both the densify min/max agg and the
    // densify left-join below — without truncation the corpus
    // aggregation re-executes once per subtree (the dd06 loop rule
    // applied to a DAG instead of a loop). The frame is day-domain-
    // sized, so the checkpoint is tiny.
    val c0 = counts0.localCheckpoint(false)
    // DENSIFY the index: a groupBy-built series omits zero days
    // entirely, which would exclude the troughs from the
    // mean/variance and erase the periodicity signal zero days carry
    // (weekday-only traffic would lose every Sat→Sun pair). The range
    // frame is index-domain-sized — generate, left-join, zero-fill.
    // Checkpointed too: it feeds the moments agg, both lag-join
    // sides, and the width probe below.
    val counts = c0
      .agg(min(col("dn")).as("lo"), max(col("dn")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("dn"))
      .join(c0, Seq("dn"), "left")
      .select(col("dn"), coalesce(col("x"), lit(0L)).as("x"))
      .localCheckpoint(false)
    // WIDTH PROBE (bounded 1-row read over the checkpointed
    // day-domain frame — the api.kmeansTrain discipline): every
    // intermediate moment is bounded by 4·n³·maxx², so the long path
    // is provably overflow-free — including the final ×1000 — iff
    // 4000·n³·maxx² fits in a long (BigInt arithmetic, no wrap in the
    // test itself). Beyond, the moments WIDEN to DECIMAL(38,0): the
    // identity is the same exact-integer arithmetic, Spark's decimal
    // ops stay ANSI-loud on real 38-digit overflow (~n³·maxx² past
    // 10^38), and IntegralDivide truncates toward zero for decimals
    // exactly as for longs, so the two paths agree wherever both are
    // defined. At 100 TB daily-count scale (x ~ 10^12, n ~ 10^4 days:
    // n³·maxx² ~ 10^36) the wide path is the live one.
    val probe = counts.agg(count(lit(1)), max(abs(col("x")))).head()
    val n0 = probe.getLong(0)
    val maxx = if (probe.isNullAt(1)) BigInt(0) else BigInt(probe.getLong(1))
    val wide =
      BigInt(4000) * BigInt(n0).pow(3) * maxx.pow(2) > BigInt(Long.MaxValue)
    val moment: Column => Column =
      if (wide) _.cast(org.apache.spark.sql.types.DecimalType(38, 0))
      else identity
    val g = counts.agg(
      moment(count(lit(1))).as("n"),
      sum(moment(col("x"))).as("sx"),
      sum(moment(col("x")) * moment(col("x"))).as("sxx"))
    val lags = s.range(1, maxLag + 1).select(col("id").cast("int").as("lag_k"))
    counts.crossJoin(broadcast(lags)).as("a")
      .join(broadcast(counts).as("b"), col("b.dn") === col("a.dn") + col("lag_k"))
      .groupBy(col("lag_k"))
      .agg(moment(count(lit(1))).as("n_pairs"),
        sum(moment(col("a.x")) * moment(col("b.x"))).as("pk"),
        sum(moment(col("a.x")) + moment(col("b.x"))).as("qk"))
      .crossJoin(broadcast(g))
      .withColumn("num",
        col("n") * col("n") * col("pk") - col("n") * col("sx") * col("qk") +
          col("n_pairs") * col("sx") * col("sx"))
      .withColumn("den", col("n") * col("n") * col("sxx") - col("n") * col("sx") * col("sx"))
      .filter(assert_true(
        col("den") > 0 && (lit(wide) ||
          (col("den") <= lit(Long.MaxValue / 1000) &&
            abs(col("num")) <= lit(Long.MaxValue / 1000))),
        lit("autocorrOf: zero-variance series, or 1000*moment exceeds the " +
          "long domain on the long path — the width probe should have " +
          "widened to DECIMAL(38,0)")).isNull)
      .select(col("lag_k"), col("n_pairs").cast("long").as("n_pairs"),
        expr("(1000 * num) DIV den").as("autocorr_milli"))
  }

  /** Week-over-week growth kernel shared by ts38 and the live twin
    * ([[graft.streaming.TopicStream.wowStream]]/`currentWow`): takes
    * the (event_type, wk, n_events) week-count frame — ADDITIVE, so
    * the stream maintains it as summed count partials and reads this
    * kernel over the history; stream and batch can never disagree.
    * Growth = (n − n_prev)·1000 DIV n_prev (negative legitimate,
    * truncation identical in both engines). */
  private[graft] def wowOf(weekCounts: DataFrame): DataFrame =
    weekCounts.as("c")
      .join(weekCounts.as("p"),
        col("p.event_type") === col("c.event_type") &&
          col("p.wk") === col("c.wk") - 1)
      .select(col("c.event_type").as("event_type"), col("c.wk").as("wk"),
        col("c.n_events").as("n_events"), col("p.n_events").as("n_prev"),
        expr("((c.n_events - p.n_events) * 1000) DIV p.n_events").as("growth_milli"))

  /** ts41's kernel over any (event_type, dn, n) daily-count frame —
    * shared by the batch query and
    * [[graft.streaming.TopicStream]]'s `currentBursts` (which reads
    * the SAME trendStream topic ts39's monitor maintains — one
    * state-topic writer powers trend AND burst): densify onto the
    * (type × day-spine) domain so gap days count as 0 in the
    * baseline (the ts07 discipline — a quiet week must not hide a
    * burst), then per type a trailing-7-day window sum; burst ratio
    * = today vs the baseline's daily mean in integer milli
    * (n·7000 DIV prev7), flagged at ≥ 2x with an absolute floor of
    * 5 events (2-vs-0 noise is not a burst). Rows without a full
    * 7-day history emit nothing — a ratio against a partial
    * baseline would alarm on day 2 of every new event type. Scale
    * shape: ONE corpus scan partial-aggs into the (type × day)
    * domain; the spine cross, window, and arithmetic all run on
    * that calendar-bounded frame — zero corpus-sized shuffles. */
  private[graft] def burstsOf(dayCounts: DataFrame): DataFrame = {
    val bounds = dayCounts.agg(min(col("dn")).as("mn"), max(col("dn")).as("mx"))
    val spine = bounds.select(explode(expr("sequence(mn, mx)")).as("dn"))
    val types = dayCounts.select(col("event_type")).distinct()
    val dense = types.crossJoin(spine)
      .join(dayCounts, Seq("event_type", "dn"), "left")
      .select(col("event_type"), col("dn"), coalesce(col("n"), lit(0L)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("dn"))
      .rowsBetween(-7, -1)
    dense
      .withColumn("prev7", sum(col("n")).over(w))
      .withColumn("n_prev_days", count(lit(1)).over(w))
      .filter(col("n_prev_days") === 7)
      .withColumn("burst_milli", expr("(n * 7000) DIV greatest(1, prev7)"))
      .withColumn("burst", col("burst_milli") >= 2000 && col("n") >= 5)
      .select(col("event_type"), col("dn"), col("n"), col("prev7"),
        col("burst_milli"), col("burst"))
  }

  /** ts42's kernel over any (event_type, dn, n) day-count frame.
    * DOMINANT-CYCLE SCAN: fold the DENSIFIED daily series by every
    * candidate period 2..10 (gap days count as ZERO — the ts07
    * discipline; a weekly cycle must survive quiet days, and a
    * 3-day crawl cadence must not hide behind them) and score each
    * period by the between-phase share of total variance — the
    * one-way-ANOVA R² in its exact-rational form: strength =
    * (D·Σ_ph s_ph²/n_ph − S²) / (D·Σn² − S²), carried as
    * q_ph = s_ph² DIV n_ph exact longs so both engines agree
    * bit-for-bit. ts17/ts37 PROFILE the fixed calendar week; this
    * SEARCHES the period space — the screen that catches a 3-day
    * ingest cadence or a 10-day billing cycle the calendar ops are
    * blind to. Long bound: per-type window total S to ~3·10⁹ events
    * (S² is the widest term) — beyond that pre-aggregate days into
    * weeks before calling (the ts36 width-probe discipline, noted
    * loudly here rather than silently overflowing; ANSI mode
    * throws). The final milli ratio divides by total DIV 1000
    * (never between·1000 — that would re-tighten the bound to
    * 3·10⁶). Scale shape: ONE corpus scan partial-aggs into the
    * (type × day) domain; the spine densify, the 9-period broadcast
    * fan, and the ≤54-phase-rows-per-type aggs all run on that
    * calendar-bounded frame (checkpointed — the stats and phase
    * subtrees both read it). */
  private[graft] def cycleScanOf(dayCounts: DataFrame): DataFrame = {
    val bounds = dayCounts.agg(min(col("dn")).as("mn"), max(col("dn")).as("mx"))
    val spine = bounds.select(explode(expr("sequence(mn, mx)")).as("dn"))
    val types = dayCounts.select(col("event_type")).distinct()
    val dense = types.crossJoin(spine)
      .join(dayCounts, Seq("event_type", "dn"), "left")
      .select(col("event_type"), col("dn"), coalesce(col("n"), lit(0L)).as("n"))
      .localCheckpoint(false)
    val stats = dense.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("n")).as("s"),
        sum(col("n") * col("n")).as("ssq"))
    val periods = spine.sparkSession.range(2, 11).select(col("id").as("period"))
    val phased = dense.crossJoin(broadcast(periods))
      .groupBy(col("event_type"), col("period"), expr("dn % period").as("phase"))
      .agg(count(lit(1)).as("n_ph"), sum(col("n")).as("s_ph"))
      .withColumn("q_ph", expr("(s_ph * s_ph) DIV n_ph"))
      .groupBy(col("event_type"), col("period"))
      .agg(sum(col("q_ph")).as("sum_q"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("strength_milli").desc, col("period"))
    phased.join(broadcast(stats), "event_type")
      .withColumn("between_ss", expr("n_days * sum_q - s * s"))
      .withColumn("total_ss", expr("n_days * ssq - s * s"))
      .withColumn("strength_milli",
        expr("between_ss DIV greatest(1, total_ss DIV 1000)"))
      .withColumn("is_best", row_number().over(w) === 1)
      .select(col("event_type"), col("period"), col("n_days"),
        col("between_ss"), col("total_ss"), col("strength_milli"),
        col("is_best"))
  }

  /** ts39's kernel over any (event_type, dn, x) series frame — shared
    * with [[graft.api]]'s `theilSen` verb. The input is already the
    * (key × position) DOMAIN frame (a daily/bucketed rollup — never
    * corpus rows), checkpointed here because three subtrees read it
    * (both pair sides + the census; the autocorrOf DAG rule). The
    * pair self-join is |domain|² per key; the LOWER-MEDIAN slope is
    * the value at 1-based position (n_pairs+1) DIV 2 of the sorted
    * integer-milli slope multiset — deterministic under ties (the
    * VALUE at a sorted position, not a row pick). */
  private[graft] def theilSenOf(daily0: DataFrame): DataFrame = {
    val daily = daily0.localCheckpoint(false)
    val pairs = daily.select(col("event_type"), col("dn").as("d1"), col("x").as("x1"))
      .join(daily.select(col("event_type"), col("dn").as("d2"), col("x").as("x2")),
        Seq("event_type"))
      .filter(col("d2") > col("d1"))
      .select(col("event_type"), expr("((x2 - x1) * 1000) DIV (d2 - d1)").as("slope_milli"))
    val w = Window.partitionBy(col("event_type"))
    val med = pairs
      .withColumn("rn", row_number().over(w.orderBy(col("slope_milli"))))
      .withColumn("n_pairs", count(lit(1)).over(w))
      .filter(col("rn") === expr("(n_pairs + 1) DIV 2"))
      .select(col("event_type"), col("n_pairs"), col("slope_milli"))
    val census = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("x")).as("n_events"))
    census.join(med, "event_type")
      .select(col("event_type"), col("n_days"), col("n_events"),
        col("n_pairs"), col("slope_milli"),
        when(col("slope_milli") > 0, lit("up"))
          .when(col("slope_milli") < 0, lit("down"))
          .otherwise(lit("flat")).as("trend"))
  }

  private[graft] def histQuantilesOf(hist: DataFrame,
                                     qsMilli: Seq[Int],
                                     keys: Seq[String] = Seq("key")): DataFrame = {
    // multi-column keys (ts40's (event_type, day)) partition directly —
    // never packed into one delimited string, which would corrupt keys
    // containing the delimiter
    val kc = keys.map(col)
    val w = Window.partitionBy(kc: _*).orderBy(col("cents"))
    val wn = Window.partitionBy(kc: _*)
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(wn))
    qsMilli.map { q =>
      cum.filter(col("cum") * 1000 >= col("n") * q)
        .groupBy(kc: _*)
        .agg(min(col("cents")).as("cents"), max(col("n")).as("n"))
        .select(kc ++ Seq(lit(q).as("q_milli"), col("cents"), col("n")): _*)
    }.reduce(_ unionByName _)
  }

  /** ts32's whole pipeline over any event frame — the cohort-LTV
    * kernel shared by the batch query and [[graft.api]]'s `ltvMatrix`
    * verb: users cohort by first-seen day, revenue rows (isRevenue,
    * cent-exact valueCents) roll up per (cohort, age_day) and
    * accumulate along age — the lifetime-value curve per cohort, with
    * per-user LTV in integer milli-cents. Scale shape: the cohort agg
    * and the revenue join are both user_id-keyed (co-shuffled — ts22's
    * exact discipline: the corpus crosses the wire once per side, the
    * revenue side pre-filtered at the scan); the cumulative window
    * runs over the (cohort x age) MATRIX, calendar-sized at any
    * corpus scale, and cohort sizes broadcast. */
  private[graft] def ltvMatrixOf(events: DataFrame, userCol: String,
                                 tsCol: String, isRevenue: Column,
                                 valueCents: Column): DataFrame = {
    val first = events.groupBy(col(userCol).as("user_id"))
      .agg(date_trunc("day", min(col(tsCol))).as("cohort"))
    val rev = events.filter(isRevenue)
      .select(col(userCol).as("user_id"),
        date_trunc("day", col(tsCol)).as("day"), valueCents.as("vc"))
    ltvFromFacts(first, rev)
  }

  /** ts32's report tail over a per-user first-seen frame (user_id,
    * cohort) and a revenue-facts frame (user_id, day, vc) — shared by
    * the batch kernel above and the streaming twin's read side
    * ([[graft.streaming.TopicStream.currentLtv]], which derives both
    * frames from state topics), so stream and batch can never
    * disagree. */
  private[graft] def ltvFromFacts(first: DataFrame, rev: DataFrame): DataFrame = {
    val sizes = first.groupBy(col("cohort")).agg(count(lit(1)).as("n_cohort"))
    val mat = rev.join(first, "user_id")
      .groupBy(col("cohort"),
        datediff(col("day"), col("cohort")).cast("long").as("age_day"))
      .agg(sum(col("vc")).as("rev_cents"))
    val w = Window.partitionBy(col("cohort")).orderBy(col("age_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mat.withColumn("cum_cents", sum(col("rev_cents")).over(w))
      .join(broadcast(sizes), "cohort")
      // Spark's DIV truncates toward zero, DuckDB's // floors — they
      // agree only on non-negative operands, so negative cumulative
      // revenue (refund streams via caller-supplied valueCents) and
      // the 1000x long-domain headroom are guarded IN-PLAN (ts28/ts33
      // discipline: fail loudly, never drift or wrap silently)
      .filter(assert_true(
        col("cum_cents") >= 0 && col("cum_cents") < 9000000000000000L,
        lit("ltvFromFacts: cumulative revenue must be in [0, 9e15) cents — " +
          "negative refund balances floor differently across engines; " +
          "net them per (user, day) or offset the series")).isNull)
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
        col("age_day"), col("rev_cents"), col("cum_cents"), col("n_cohort"),
        expr("(cum_cents * 1000) DIV n_cohort").as("ltv_milli_cents"))
  }

  /** ts33's whole pipeline over any (group, member, x) frame of
    * non-negative long values — the inequality kernel shared by the
    * batch query and [[graft.api]]'s `giniReport` verb: per group the
    * Gini coefficient of x across members plus the top-decile share,
    * integer milli. Ranking is GroupPrefix's two-phase range-partition
    * form (never a one-task-per-group window; ties by member are
    * S1-invariant since tied values are equal); the 2000·n·Σx < 2^63
    * long bound is guarded in-plan (the ts28 discipline). */
  private[graft] def giniOf(perMember: DataFrame): DataFrame = {
    val ranked = graft.functions.GroupPrefix.groupPrefixC(
      perMember, "group", Seq(col("x"), col("member")))
    val totals = perMember.groupBy(col("group"))
      .agg(count(lit(1)).as("n_users"))
    ranked.join(broadcast(totals), "group")
      .groupBy(col("group"))
      .agg(max(col("n_users")).as("n_users"),
        sum(col("x")).as("total_events"),
        sum(col("rn") * col("x")).as("s1"),
        sum(when(col("rn") * 10 > col("n_users") * 9, col("x"))
          .otherwise(lit(0L))).as("top_decile_events"))
      .filter(assert_true(
        col("n_users").cast("double") * col("total_events").cast("double")
          * 2000.0 < 9.0e18,
        lit("giniOf: 2000*n*total exceeds the long domain — " +
          "widen s1 to DECIMAL(38,0)")).isNull)
      .select(col("group"), col("n_users"), col("total_events"),
        expr("((2 * s1 - (n_users + 1) * total_events) * 1000) DIV (n_users * total_events)")
          .as("gini_milli"),
        expr("(top_decile_events * 1000) DIV total_events").as("top_decile_milli"))
  }

  /** ts34's whole pipeline over any event frame — the conversion-lag
    * survival kernel shared by the batch query and [[graft.api]]'s
    * `conversionLag` verb: first `isStart` row per key, first
    * `isConvert` row at-or-after it, whole-day lag buckets with
    * cumulative conversion and survival in integer milli. Two
    * co-shuffled key aggs with O(1) state each (ts26's whale rule —
    * never a per-key timestamp array), both scan-filtered; the
    * day-lag rollup partial-aggs into the calendar-sized domain and
    * the global cumulative window runs single-task over that tiny
    * frame; n_starts is a 1-row broadcast. */
  private[graft] def conversionLagOf(events: DataFrame, userCol: String,
                                     tsCol: String, isStart: Column,
                                     isConvert: Column): DataFrame =
    conversionLagFacts(
      events.filter(isStart).select(col(userCol).as("user_id"), col(tsCol).as("t")),
      events.filter(isConvert).select(col(userCol).as("user_id"), col(tsCol).as("t")))

  /** ts34's tail over event-grain start facts and convert facts
    * (user_id, t) — shared by the batch kernel above and the
    * streaming twin's read side ([[graft.streaming.TopicStream
    * .currentConversionLag]]): the first start per user derives HERE
    * (at read time — so a late EARLIER start fact lawfully moves a
    * user's anchor and re-buckets their conversion), then the
    * first convert at-or-after it. */
  private[graft] def conversionLagFacts(starts: DataFrame,
                                        convs: DataFrame): DataFrame = {
    val start = starts.groupBy(col("user_id")).agg(min(col("t")).as("t_start"))
    val conv = convs
      .join(start, "user_id")
      .filter(col("t") >= col("t_start"))
      .groupBy(col("user_id"), col("t_start")).agg(min(col("t")).as("t_conv"))
    val n = start.agg(count(lit(1)).as("n_signups"))
    val lagBuckets = conv
      .groupBy(((col("t_conv").cast("long") - col("t_start").cast("long"))
        / lit(86400L)).cast("long").as("lag_days"))
      .agg(count(lit(1)).as("n_conv"))
    val w = Window.orderBy(col("lag_days"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lagBuckets
      .withColumn("cum_conv", sum(col("n_conv")).over(w))
      .crossJoin(broadcast(n))
      .select(col("lag_days"), col("n_conv"), col("cum_conv"), col("n_signups"),
        expr("(cum_conv * 1000) DIV n_signups").as("converted_milli"),
        expr("((n_signups - cum_conv) * 1000) DIV n_signups").as("survival_milli"))
  }

  /** ts28's whole pipeline over any (key, ts, tie, vc) frame — the
    * CUSUM changepoint kernel shared by the batch query and
    * [[graft.api]]'s `changepoint` verb. `vc` must be an exact long
    * (cent-quantized); `tsCol` a timestamp; (tsCol, tieCol) a total
    * order per key. Emits one row per key: n, sum_c, the max-|CUSUM|
    * point (cp_rn, cp_ts, cp_<tie>, signed dev = n·prefix − rn·S) and
    * the before/after mean split in milli. Long-domain bound |dev| ≤
    * n·Σ|vc| is guarded in-plan (assert_true — fails loudly, never
    * wraps; beyond ~10^8-point series at cent grain, widen dev to
    * DECIMAL(38,0)). Scale: GroupPrefix two-phase running sums (never
    * a one-task-per-key window), map-side-combinable max(struct)
    * argmax, corpus over the wire exactly once. */
  private[graft] def cusumChangepoint(v: DataFrame, keyCol: String,
                                      tsCol: String, tieCol: String): DataFrame = {
    val totals = v.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("vc")).as("sum_c"),
        sum(abs(col("vc"))).as("abs_c"))
      .filter(assert_true(
        col("n").cast("double") * col("abs_c").cast("double") < 9.0e18,
        lit("cusumChangepoint: n * sum|vc| exceeds the long domain — " +
          "rerun at coarser value grain or widen dev to DECIMAL(38,0)")).isNull)
      .select(col(keyCol), col("n"), col("sum_c"))
    val pre = graft.functions.GroupPrefix.groupPrefix(
        v, keyCol, Seq(tsCol, tieCol), value = Some("vc"))
      .withColumn("prefix", col("cum0") + col("vc"))
    pre.join(broadcast(totals), keyCol)
      .withColumn("dev", col("prefix") * col("n") - col("rn") * col("sum_c"))
      .groupBy(col(keyCol))
      .agg(max(struct(abs(col("dev")).as("a"),
        (-unix_micros(col(tsCol))).as("nts"), (-col(tieCol)).as("nid"),
        col("dev"), col("rn"), col("prefix"), col("n").as("nn"),
        col("sum_c").as("sc"))).as("m"))
      .select(col(keyCol), col("m.nn").as("n"), col("m.sc").as("sum_c"),
        col("m.rn").as("cp_rn"),
        timestamp_micros(-col("m.nts")).as("cp_ts"),
        (-col("m.nid")).as(s"cp_$tieCol"), col("m.dev").as("dev"),
        expr("(m.prefix * 1000) DIV m.rn").as("mean_before_milli"),
        expr("CASE WHEN m.rn < m.nn THEN ((m.sc - m.prefix) * 1000) DIV (m.nn - m.rn) END")
          .as("mean_after_milli"))
  }

  /** ts30's whole pipeline over any event frame — the attribution
    * kernel shared by the batch query and [[graft.api]]'s
    * `attribution` verb: each conversion credits the most recent
    * preceding touch within `windowSeconds` (stale/absent ⇒ 'none')
    * and the earliest preceding touch (first-touch unwindowed by
    * convention). One shuffle on `userCol`; the ordered timeline
    * window carries two running IGNORE-NULLS values (O(1) per row);
    * the rollup partial-aggs into the (labels+1)² matrix; the total
    * is a 1-row broadcast. Microsecond-exact window math. */
  private[graft] def attributionReport(events: DataFrame, userCol: String,
                                       tsCol: String, tieCol: String,
                                       touchLabel: Column, isTouch: Column,
                                       isConversion: Column, valueCents: Column,
                                       windowSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val winUs = windowSeconds * 1000000L
    val conv = events
      .withColumn("lt_type", last(when(isTouch, touchLabel), ignoreNulls = true).over(w))
      .withColumn("lt_us", last(when(isTouch, unix_micros(col(tsCol))), ignoreNulls = true).over(w))
      .withColumn("ft_type", first(when(isTouch, touchLabel), ignoreNulls = true).over(w))
      .filter(isConversion)
      .select(
        when(col("lt_us").isNotNull &&
          unix_micros(col(tsCol)) - col("lt_us") <= winUs, col("lt_type"))
          .otherwise(lit("none")).as("last_touch"),
        coalesce(col("ft_type"), lit("none")).as("first_touch"),
        valueCents.as("vc"))
    val total = conv.agg(count(lit(1)).as("n_total"))
    conv.groupBy(col("last_touch"), col("first_touch"))
      .agg(count(lit(1)).as("n_conv"), sum(col("vc")).as("value_cents"))
      .crossJoin(broadcast(total))
      .select(col("last_touch"), col("first_touch"), col("n_conv"),
        col("value_cents"), col("n_total"),
        expr("(n_conv * 1000) DIV n_total").as("share_milli"))
  }

  /** ts29's whole pipeline over raw (user_id, event_type) rows —
    * shared by the batch query and the streaming twin's read side
    * ([[graft.streaming.TopicStream.currentAssoc]]), so stream and
    * batch cannot disagree on basket semantics. ONE user_id shuffle
    * builds each user's distinct-type basket; every basket then emits
    * its items in a SINGLE explode — a user-count marker, one single
    * per type, one pair per type combination — so one tiny
    * (item-domain-sized) rollup carries n_users, every n_a and every
    * n_ab at once and the corpus is aggregated exactly once. The
    * rollup is lazily localCheckpoint'ed (GroupPrefix's one-shot
    * discipline: ContextCleaner releases it on GC — safe in a
    * long-lived serve session, unlike an unowned persist) because
    * three sub-frames of it join below. */
  private[graft] def assocReport(facts: DataFrame): DataFrame = {
    val nullS = lit(null).cast("string")
    val pairCombos = flatten(transform(col("types"), (a, ai) =>
      transform(slice(col("types"), ai + lit(2), size(col("types")) - ai - 1),
        b => struct(a.as("a"), b.as("b")))))
    val counted = facts.groupBy(col("user_id"))
      .agg(array_sort(collect_set(col("event_type"))).as("types"))
      .select(explode(concat(
        array(struct(nullS.as("a"), nullS.as("b"))),
        transform(col("types"), t => struct(t.as("a"), nullS.as("b"))),
        pairCombos)).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false)
    val users = counted.filter(col("a").isNull)
      .select(col("cnt").as("n_users"))
    val singles = counted.filter(col("a").isNotNull && col("b").isNull)
    counted.filter(col("b").isNotNull)
      .select(col("a"), col("b"), col("cnt").as("n_ab"))
      .join(broadcast(singles.select(col("a"), col("cnt").as("n_a"))), "a")
      .join(broadcast(singles.select(col("a").as("b"), col("cnt").as("n_b"))), "b")
      .crossJoin(broadcast(users))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        col("n_users"),
        expr("(n_ab * 1000) DIV n_users").as("support_milli"),
        expr("(n_ab * 1000) DIV n_a").as("conf_ab_milli"),
        expr("(n_ab * 1000) DIV n_b").as("conf_ba_milli"),
        expr("(((n_ab * n_users) DIV n_a) * 1000) DIV n_b").as("lift_milli"))
  }

  /** ts26's report tail over a per-user (user_id, first_view,
    * last_purchase) frame — shared by the batch query and the
    * streaming twin's read side ([[graft.streaming.TopicStream
    * .currentAbLift]]). Arm assignment is the deterministic md5 hash
    * (sp01's discipline), conversion the O(1) two-scalar test. */
  private[graft] def abLiftReport(perUser: DataFrame): DataFrame =
    perUser.filter(col("first_view").isNotNull)
      .select(col("user_id"),
        coalesce(col("last_purchase") >= col("first_view"), lit(false)).as("converted"),
        when(substring(md5(concat(col("user_id").cast("string"), lit(":ab"))), 1, 1) < "8",
          "A").otherwise("B").as("arm"))
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("converted"), 1L).otherwise(0L)).as("n_conv"))
      .withColumn("conv_milli", expr("(n_conv * 1000) DIV n_users"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling-window resample to 1h buckets.
    "ts01_resample" -> ((s, d) => {
      ev(s, d)
        // value is cent-quantized: integer-cents aggregation is exact
        // and order-free (SURVEY.md §5).
        .withColumn("value_c", round(col("value") * 100).cast("long"))
        .groupBy(date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"),
          avg(col("value_c")).as("avg_value_cents"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"),
          sum(col("value_c")).as("sum_value_cents"))
        .orderBy(col("bucket"))
    }),

    // Latest row per key = ella's "current value" topic read.
    // max(struct(ts, event_id, ...)) instead of a ranking window: it is
    // map-side combinable (partial agg before the shuffle), so at 100 TB
    // each executor reduces its partitions to one row per key locally —
    // no per-key sort, shuffle carries only distinct keys.
    // Point-in-time SNAPSHOT read (time-travel): the latest value per
    // key AS OF a cutoff — ella's "current value" semantics evaluated
    // at any past instant (`time < T` batch read over an append-only
    // topic). Same map-side-combinable max(struct) shape as ts02 (no
    // ranking window); the cutoff filter reaches the scan, and on a
    // bucketed topic it prunes every shard newer than T before any
    // row is read.
    "ts18_snapshot" -> ((s, d) => {
      ev(s, d)
        .filter(col("ts") <= to_timestamp(lit("2024-01-15 00:00:00")))
        .groupBy(col("user_id"))
        .agg(max(struct(col("ts"), col("event_id"), col("event_type"), col("value"))).as("latest"))
        .select(col("user_id"), col("latest.ts").as("ts"),
          col("latest.event_type").as("event_type"), col("latest.value").as("value"))
        .orderBy(col("user_id"))
    }),

    "ts02_latest_by_key" -> ((s, d) => {
      ev(s, d)
        .groupBy(col("user_id"))
        .agg(max(struct(col("ts"), col("event_id"), col("event_type"), col("value"))).as("latest"))
        .select(col("user_id"), col("latest.ts").as("ts"),
          col("latest.event_type").as("event_type"), col("latest.value").as("value"))
        .orderBy(col("user_id"))
    }),

    // As-of join: each event picks the most recent order (inclusive) of
    // the same key. Spark-first: union both sides, one shuffle on the
    // key, last-non-null over the time-ordered frame — O(n log n) per
    // key, no per-row range probe; scales to arbitrary key cardinality.
    "ts03_asof_join" -> ((s, d) => {
      // One row per (custkey, orderdate): max orderkey, so the as-of
      // match is deterministic on both engines.
      val ord = Tables(s, d, "orders")
        .groupBy(col("o_custkey").as("k"), col("o_orderdate").as("t"))
        .agg(max(col("o_orderkey")).as("ord_key"))
      // Order timestamps are 1995-2001, event ts 2024 — shift orders
      // into the event era so matches actually occur (synthetic data).
      val ordShifted = ord.withColumn("t", col("t") + expr("INTERVAL 29 YEARS"))
      val e = ev(s, d).select(col("user_id").as("k"), col("ts").as("t"),
        col("event_id"), lit(null).cast("long").as("ord_key"), lit(1).as("is_event"))
      val o = ordShifted.select(col("k").cast("long"), col("t"),
        lit(null).cast("long").as("event_id"), col("ord_key"), lit(0).as("is_event"))
      val w = Window.partitionBy(col("k"))
        .orderBy(col("t"), col("is_event"), col("event_id").asc_nulls_first)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.union(o)
        .withColumn("matched", last(col("ord_key"), ignoreNulls = true).over(w))
        .filter(col("is_event") === 1)
        .select(col("event_id"), col("k").as("user_id"), col("t").as("ts"), col("matched").as("ord_key"))
        .orderBy(col("event_id"))
    }),

    // As-of join with a MATCH TOLERANCE — the kdb `wj`/QuestDB
    // `ASOF ... TOLERANCE` option ts03 stops short of: the most
    // recent right row still wins, but only if it is no older than
    // the window (7 days here); a staler match is reported as NO
    // match (ord_key null, in_tol false) with the lag surfaced for
    // the ones that hit. Same single union + per-key last-non-null
    // plan as ts03 (one shuffle per side, no per-row range probe):
    // tolerance is a per-row comparison AFTER the as-of resolution,
    // so the topology — and the 100 TB story — is unchanged.
    "ts20_asof_tolerance" -> ((s, d) => {
      val TolS = 7L * 24 * 3600
      val ord = Tables(s, d, "orders")
        .groupBy(col("o_custkey").as("k"), col("o_orderdate").as("t"))
        .agg(max(col("o_orderkey")).as("ord_key"))
        .withColumn("t", col("t") + expr("INTERVAL 29 YEARS"))
      val e = ev(s, d).select(col("user_id").as("k"), col("ts").as("t"),
        col("event_id"), lit(null).cast("long").as("ord_key"), lit(1).as("is_event"))
      val o = ord.select(col("k").cast("long"), col("t"),
        lit(null).cast("long").as("event_id"), col("ord_key"), lit(0).as("is_event"))
      val w = Window.partitionBy(col("k"))
        .orderBy(col("t"), col("is_event"), col("event_id").asc_nulls_first)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val lagS = col("t").cast("long") - col("matched_t").cast("long")
      val inTol = col("matched_t").isNotNull && lagS <= TolS
      e.union(o)
        .withColumn("matched_key", last(col("ord_key"), ignoreNulls = true).over(w))
        .withColumn("matched_t",
          last(when(col("is_event") === 0, col("t")), ignoreNulls = true).over(w))
        .filter(col("is_event") === 1)
        .select(col("event_id"), col("k").as("user_id"), col("t").as("ts"),
          when(inTol, col("matched_key")).as("ord_key"),
          inTol.as("in_tol"),
          when(inTol, lagS).as("lag_s"))
        .orderBy(col("event_id"))
    }),

    // Event FUNNEL (ClickHouse windowFunnel's stricter cousin): per
    // user, the signup -> view -> purchase sequence where each stage
    // must land within 12h of the PREVIOUS stage's match (stage
    // anchors chain: t2 = first view in [t1, t1+12h], t3 = first
    // purchase in [t2, t2+12h]). Scale shape: one pre-filter to the
    // stage types at the scan, ONE shuffle on user_id, then stage
    // resolution is pure per-row array compute (array_min over
    // filter) — no window function, no self-join, no re-scan per
    // stage. Per-user state is bounded by that user's stage-type
    // event count (the collect_list side); heavy users bound memory
    // per group, not the shuffle. Timestamps chain exactly in both
    // engines (microsecond integers), so depth is engine-exact.
    "ts21_funnel" -> ((s, d) => {
      funnelTimes(s, d)
        .select(col("user_id"), col("t1"), col("t2"), col("t3"),
          when(col("t3").isNotNull, 3L).otherwise(
            when(col("t2").isNotNull, 2L).otherwise(
              when(col("t1").isNotNull, 1L).otherwise(0L))).as("depth"))
        .orderBy(col("user_id"))
    }),

    // Cohort RETENTION matrix (the product-analytics staple next to
    // ts21's funnel): users cohorted by first-seen DAY; each later
    // active day reports how many of the cohort came back
    // (n_active / n_cohort, integer milli). Scale shape: ONE scan,
    // ONE corpus exchange — a single per-user aggregation computes
    // the cohort (min) AND the active day set (collect_set,
    // calendar-bounded per user) as partial buffers; the day-set
    // explode and (cohort, day) rollup are user-/calendar-sized; and
    // cohort sizes need NO second pass, because a user's first-event
    // day IS a member of their day set — n_cohort is the rollup's
    // own offset-0 row, read with one window over the tiny matrix.
    "ts22_retention" -> ((s, d) => {
      val e = Tables.events(s, d)
      val perUser = e.groupBy(col("user_id"))
        .agg(date_trunc("day", min(col("ts"))).as("cohort"),
          collect_set(date_trunc("day", col("ts"))).as("days"))
      val rollup = perUser
        .select(col("cohort"), explode(col("days")).as("day"))
        .groupBy(col("cohort"), col("day"))
        .agg(count(lit(1)).as("n_active"))
      // window over the calendar-sized matrix, not a self-join: a
      // second reference to `rollup` would re-run the whole chain
      // (second scan + second corpus exchange)
      val wc = org.apache.spark.sql.expressions.Window.partitionBy(col("cohort"))
      rollup
        .withColumn("n_cohort",
          max(when(col("day") === col("cohort"), col("n_active"))).over(wc))
        .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
          datediff(col("day"), col("cohort")).cast("long").as("day_offset"),
          col("n_active"), col("n_cohort"),
          expr("(n_active * 1000) DIV n_cohort").as("retention_milli"))
        .orderBy(col("cohort_day"), col("day_offset"))
    }),

    // Top PATHS — the event-sequence report next to ts21's funnel
    // (the ClickHouse sequence/path-analysis family): each user's
    // FIRST 3 events (by ts, event_id) form a path string; paths
    // rank by user count. Scale shape: the per-user "first 3" is a
    // rank window whose literal limit Catalyst turns into a PARTIAL
    // WindowGroupLimit BEFORE the shuffle (SPARK-37099 — the same
    // pinned shape as q07/q16/sp02), so map-side state is 3 rows per
    // user and the shuffle carries at most 3 rows per user; the path
    // rollup is path-domain-sized and partial-agg'd, and the top-20
    // is TakeOrderedAndProject — no global sort materialization.
    // Ties rank by path string, so the report is deterministic.
    "ts23_top_paths" -> ((s, d) => topPathsOf(Tables.events(s, d))),

    // Event TRANSITION MATRIX — the Markov-chain flow report behind
    // every Sankey/"where do users go next" view (completes the
    // path-analysis family with ts21/ts23): count (from, to) adjacent
    // event pairs per user timeline, with out-degree-normalized
    // transition probability in integer milli. Scale shape: the lead()
    // window is ONE shuffle on user_id; the pair rollup partial-aggs
    // into the |event_type|^2 domain (tiny at any corpus size), and
    // the out-degree normalization is a window over that tiny matrix
    // — the corpus is touched exactly once.
    "ts24_transitions" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val m = Tables.events(s, d)
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      val wf = Window.partitionBy(col("from_type"))
      m.withColumn("n_from", sum(col("n")).over(wf))
        .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
          expr("(n * 1000) DIV n_from").as("p_milli"))
        .orderBy(col("from_type"), col("to_type"))
    }),

    // Funnel TIMING report — per-transition conversion rate plus
    // time-to-convert stats (the "how long does signup→view take"
    // report product teams read next to ts21's depth counts). Reuses
    // funnelTimes' per-user resolution verbatim, so the timing report
    // can never disagree with the funnel it describes. All stats are
    // integer-exact (epoch-second diffs; mean as sum*1000 DIV n), and
    // the rollup input is TWO rows per funnel user — the corpus
    // shuffles once (inside funnelTimes) and the report agg is
    // partial-combined into a 2-row frame.
    "ts25_funnel_timing" -> ((s, d) =>
      funnelTimingReport(funnelTimes(s, d),
        Seq("signup", "view", "purchase")).orderBy(col("transition"))),

    // RFM SEGMENTATION — the classic recency/frequency/monetary user
    // scoring (the product-analytics segmentation staple): per user,
    // seconds since last event (vs the corpus's max-ts anchor), event
    // count, and cent-quantized spend, each quartile-bucketed 1-4
    // (1 = best) with the composite RFM code. Scale shape: one
    // user_id shuffle builds the per-user frame; the three GLOBAL
    // quartile rankings use the GroupPrefix closed-form NTILE
    // (tx14/q23's machinery) — positions are computed
    // partition-parallel over range partitions with tiny broadcast
    // offsets, so a billion-user frame never funnels through the
    // single-task global window Spark's ntile() would plan. Anchor is
    // a 1-row broadcast; all arithmetic integer-exact.
    "ts27_rfm" -> ((s, d) => {
      val e = Tables.events(s, d)
      val perUser = e.groupBy(col("user_id"))
        .agg(max(col("ts")).as("last_ts"),
          count(lit(1)).as("n_events"),
          sum(round(col("value") * 100).cast("long")).as("value_cents"))
      // anchor = corpus max(ts) == max over users of last_ts: deriving
      // it from perUser shares the user_id exchange (AQE ReusedExchange)
      // instead of paying a SECOND full events scan for one scalar
      val anchor = perUser.agg(max(col("last_ts")).as("anchor_ts"))
      rfmSegment(perUser, anchor).orderBy(col("user_id"))
    }),

    // A/B EXPERIMENT report — deterministic hash-assigned arms
    // (sp01's md5 discipline: a user's arm is stable under reruns,
    // corpus growth, and engine choice), exposure = first 'view',
    // conversion = any purchase at-or-after exposure. Per arm: users,
    // conversions, rate in integer milli. Scale shape: one user_id
    // shuffle builds the per-user exposure/conversion row; the arm
    // rollup partial-combines into two rows. The md5 assignment is
    // the piece that matters at 100 TB: experiment membership needs
    // no assignment table, no join — it's a scan-speed projection any
    // engine reproduces bit-identically.
    "ts26_ab_lift" -> ((s, d) => {
      // conversion test: "any purchase at-or-after exposure" ⟺
      // max(purchase ts) >= first_view — O(1) agg state per user (two
      // scalars), never a per-user timestamp array (a 100k-purchase
      // whale would otherwise build a 100k array in every partial
      // buffer). coalesce covers the no-purchase null.
      val perUser = Tables.events(s, d).groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "view", col("ts"))).as("first_view"),
          max(when(col("event_type") === "purchase", col("ts"))).as("last_purchase"))
      abLiftReport(perUser).orderBy(col("arm"))
    }),

    // CUSUM CHANGEPOINT detection — the level-shift locator every
    // monitoring stack runs over its metric streams (Page 1954; the
    // TSDB anomaly family next to ts15's z-score): per event_type
    // series ordered by (ts, event_id), the mean-centered cumulative
    // sum peaks exactly where the series' level shifts, so the report
    // emits each series' maximum-|CUSUM| point (its position, time,
    // event id, signed deviation) plus the before/after mean split at
    // that point. ENGINE-EXACT: values quantize to cents; the centered
    // prefix is scaled by n (dev = n*prefix_i - i*S — pure BIGINT, no
    // division until the output milli columns), so both engines rank
    // identical integers; ties resolve by earliest (ts, event_id).
    // Long-domain bound: |dev| <= n * sum|cents|, guarded in-plan by
    // assert_true(n * sum|cents| < 9e18) on the per-series totals —
    // beyond ~10^8-point series at cent grain the same plan runs with
    // one DECIMAL(38,0) cast on the dev expression; the guard fails
    // loudly instead of wrapping silently. Scale shape: the per-series
    // running sum is the GroupPrefix two-phase form (ts27/tx14's
    // machinery — range-partition parallel, task input bounded by
    // partition size, NEVER a one-task-per-series window: event_type
    // has ~5 values, the definitional skew trap); the argmax is a
    // map-side-combinable max(struct) into a |series|-row frame; the
    // corpus crosses the wire exactly once (the range exchange).
    "ts28_changepoint" -> ((s, d) =>
      cusumChangepoint(
        Tables.events(s, d)
          .select(col("event_type"), col("ts"), col("event_id"),
            round(col("value") * 100).cast("long").as("vc")),
        "event_type", "ts", "event_id")
        .orderBy(col("event_type"))),

    // ASSOCIATION RULES over per-user event baskets — the market-
    // basket staple (support / confidence / lift for every event-type
    // pair), the co-occurrence report next to ts24's sequential
    // transition matrix: "users who X also Y", direction-free. Scale
    // shape (see [[assocReport]]): ONE user_id shuffle builds the
    // distinct-type basket per user (collect_set bounded by
    // |event_type|); every basket emits user-marker + singles + pairs
    // in a single explode so ONE tiny rollup carries n_users, n_a and
    // n_ab together — the corpus is aggregated exactly once and the
    // report tail joins item-domain-sized frames. All metrics integer
    // milli; lift nests its divisions ((n_ab*n_users) DIV n_a, then
    // *1000 DIV n_b) so every intermediate stays under 2^63 even at
    // 10^9 users — both engines floor identically on the all-positive
    // operands.
    "ts29_assoc" -> ((s, d) =>
      assocReport(Tables.events(s, d).select(col("user_id"), col("event_type")))
        .orderBy(col("a"), col("b"))),

    // MARKETING ATTRIBUTION report — last-touch AND first-touch in one
    // pass (the conversion-credit staple next to ts21's funnel: "which
    // channel gets credit for this purchase"): each purchase credits
    // (a) the most recent preceding touch (view/click) within a 7-day
    // attribution window — stale or absent => 'none' — and (b) the
    // user's EARLIEST preceding touch (first-touch is unwindowed by
    // convention: the introducer keeps credit however old). Output is
    // the (last_touch, first_touch) matrix with conversion counts,
    // cent-exact revenue, and milli share of all conversions. Scale
    // shape: ONE user_id shuffle (the ordered timeline window carries
    // two running IGNORE-NULLS values — O(1) state per row), the
    // rollup partial-aggs into the (touch+1)² domain, the total is a
    // 1-row broadcast; timestamps compare in exact microseconds.
    "ts30_attribution" -> ((s, d) =>
      attributionReport(Tables.events(s, d), "user_id", "ts", "event_id",
        touchLabel = col("event_type"),
        isTouch = col("event_type").isin("view", "click"),
        isConversion = col("event_type") === "purchase",
        valueCents = round(col("value") * 100).cast("long"),
        windowSeconds = 7L * 86400L)
        .orderBy(col("last_touch"), col("first_touch"))),

    // DAU/WAU STICKINESS — the engagement ratio every product
    // dashboard headlines (avg daily actives / weekly actives, ~"how
    // many of the week's users show up on a given day"), the report
    // next to ts22's retention matrix. Scale shape: ONE corpus shuffle
    // (the distinct to (user, day) activity facts — the same frame
    // retentionStream's state topic stores, so the streaming twin is
    // a free read); everything after is user-day- or calendar-sized
    // (see [[stickinessFromActivity]]). Integer milli throughout.
    "ts31_stickiness" -> ((s, d) => {
      val acts = Tables.events(s, d)
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .distinct()
      stickinessFromActivity(acts).orderBy(col("week"))
    }),

    // Cohort LTV (lifetime value) — cumulative revenue per first-seen
    // cohort by age-in-days, the monetization curve next to ts22's
    // retention counts ("how much has the Jan-1 cohort spent by day
    // 30, per user"). Revenue = purchase events, cent-exact; per-user
    // LTV in integer milli-cents. Scale shape in [[ltvMatrixOf]]:
    // user_id-co-shuffled cohort join (ts22's discipline), cumulative
    // window over the calendar-sized (cohort x age) matrix only,
    // cohort sizes broadcast.
    "ts32_ltv" -> ((s, d) =>
      ltvMatrixOf(Tables.events(s, d), "user_id", "ts",
        isRevenue = col("event_type") === "purchase",
        valueCents = round(col("value") * 100).cast("long"))
        .orderBy(col("cohort_day"), col("age_day"))),

    // CONVERSION-LAG SURVIVAL curve — the time-to-convert
    // DISTRIBUTION (Kaplan-Meier-lite) behind ts25's summary stats:
    // per whole-day lag bucket, how many signup users first purchased
    // at that lag, cumulative conversion, and survival (fraction of
    // signups still unconverted past that lag) in integer milli. The
    // convention is observational: lag = first purchase AT-OR-AFTER
    // the user's first signup; users who never purchase define the
    // survival floor but emit no bucket row. Scale shape: two
    // co-shuffled user_id aggs with O(1) state each (ts26's whale
    // rule — never a per-user timestamp array), both sides
    // scan-filtered to their event type; the day-lag rollup
    // partial-aggs into the calendar-sized lag domain; the global
    // cumulative window runs over that tiny frame (single task over
    // a calendar-bounded input — the honest shape for a global
    // running sum of a tiny domain); n_signups is a 1-row broadcast.
    "ts34_conversion_lag" -> ((s, d) =>
      conversionLagOf(Tables.events(s, d), "user_id", "ts",
        isStart = col("event_type") === "signup",
        isConvert = col("event_type") === "purchase")
        .orderBy(col("lag_days"))),

    // ACTIVITY INEQUALITY report — Gini coefficient + top-decile share
    // of per-user event counts, per event_type (the "power user
    // concentration" audit behind engagement dashboards and abuse
    // review: gini 0 = uniform usage, ->1 = a few whales are the
    // metric). ENGINE-EXACT: with counts ranked ascending (ties by
    // user_id — S1 is tie-order invariant since tied values are
    // equal), gini = (2*Σrank·x − (n+1)·Σx) / (n·Σx), all longs, one
    // flooring division per output; the long-domain bound
    // 2000·n·Σx < 2^63 is guarded in-plan by assert_true on the
    // per-type totals (the ts28 discipline — fails loudly, never
    // wraps; beyond it, widen s1 to DECIMAL(38,0)). Scale shape: one
    // corpus shuffle (the per-(type, user) agg); the GLOBAL
    // ascending rank per type is GroupPrefix's two-phase range-
    // partition form (ts27/ts28's machinery — event_type has ~5
    // values, the definitional one-task window skew trap); the final
    // agg partial-combines into a |event_type|-row frame.
    "ts33_gini" -> ((s, d) =>
      giniOf(Tables.events(s, d)
          .groupBy(col("event_type").as("group"), col("user_id").as("member"))
          .agg(count(lit(1)).as("x")))
        .withColumnRenamed("group", "event_type")
        .orderBy(col("event_type"))),

    // EXACT DISTRIBUTION QUANTILES from a mergeable integer HISTOGRAM
    // (the percentile report q20 computes exactly per-group, in its
    // SCALE-AND-STREAM form — the TSDB "p99 latency per series"
    // staple): values quantize to cents, the histogram (key ×
    // distinct-cents counts) is ONE map-side-combinable shuffle of a
    // DOMAIN-bounded frame (cents domain, never corpus rows), and
    // each requested quantile is the smallest cents whose cumulative
    // count covers ceil(q·n/1000) — pure integers end to end
    // (cum·1000 ≥ q·n avoids even the ceil), so both engines agree
    // bit-for-bit. The histogram is ADDITIVE (counts merge by sum) —
    // histStream maintains it live as state-topic partials and
    // currentQuantiles reads THIS kernel over the summed history, so
    // stream and batch can never disagree. All post-histogram windows
    // run over the value DOMAIN (≤ ~10^4 distinct cents per key at
    // any corpus size) — the plan's only corpus-sized stage is the
    // histogram agg itself.
    "ts35_quantiles" -> ((s, d) => {
      val hist = ev(s, d)
        .select(col("event_type").as("key"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy(col("key"), col("cents")).agg(count(lit(1)).as("cnt"))
      histQuantilesOf(hist, Seq(250, 500, 750, 900, 990))
        .select(col("key").as("event_type"), col("q_milli"), col("cents"), col("n"))
        .orderBy(col("event_type"), col("q_milli"))
    }),

    // DAILY PERCENTILE BANDS per series — the p50/p90/p99-over-time
    // SLO dashboard (ts35 answers "what is p99 overall", this answers
    // "how do the bands MOVE day by day" — the latency-band chart
    // every ops dashboard renders): per (event_type, day), the exact
    // value percentiles from the ts35 mergeable-histogram kernel
    // (engine-exact cum-count rule over cent-quantized values; the
    // kernel partitions by the two key columns directly — never a
    // delimiter-packed string). Scale shape: ONE
    // corpus scan partial-aggs into the (type × day × distinct-cents)
    // DOMAIN (value-bounded at any corpus size); the quantile windows
    // run over that domain frame only.
    "ts40_slo_bands" -> ((s, d) => {
      val hist = ev(s, d)
        .select(col("event_type"), expr("epoch_s DIV 86400").as("dn"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy(col("event_type"), col("dn"), col("cents"))
        .agg(count(lit(1)).as("cnt"))
      histQuantilesOf(hist, Seq(500, 900, 990), keys = Seq("event_type", "dn"))
        .orderBy(col("event_type"), col("dn"), col("q_milli"))
    }),

    // BURST DETECTION per event-type daily series — the rate-spike
    // monitor next to ts28's mean-shift changepoint (a changepoint is
    // a sustained level move; a burst is TODAY vs the trailing week —
    // the alert that fires while the spike is happening). See
    // [[burstsOf]] (kernel shared with the trendStream topic's
    // currentBursts read).
    "ts41_burst" -> ((s, d) =>
      burstsOf(ev(s, d)
          .groupBy(col("event_type"), expr("epoch_s DIV 86400").as("dn"))
          .agg(count(lit(1)).as("n")))
        .orderBy(col("event_type"), col("dn"))),

    // DOMINANT-CYCLE SCAN over the daily event-count series — see
    // [[cycleScanOf]]. Searches periods 2..10 where ts17/ts37 profile
    // only the fixed calendar week and ts36 reports raw lag
    // correlation without a variance-share score.
    "ts42_cycle_scan" -> ((s, d) =>
      cycleScanOf(ev(s, d)
          .groupBy(col("event_type"), expr("epoch_s DIV 86400").as("dn"))
          .agg(count(lit(1)).as("n")))
        .orderBy(col("event_type"), col("period"))),

    // LAG-k AUTOCORRELATION of the daily event-count series — see
    // [[autocorrOf]] (kernel shared with api.autocorrReport). (the
    // periodicity screen behind seasonality/anomaly dashboards — "is
    // traffic self-similar at 1/2/3-day lags"). ENGINE-EXACT via the
    // mean-free integer identity: with y_t = n·x_t − S (an exact
    // integer), r_k = Σ y_t·y_{t+k} / Σ y_t², so numerator A_k =
    // n²·P_k − n·S·Q_k + cnt_k·S² and denominator D = n²·Σx² − n·S²
    // are pure longs (P/Q = pairwise product/sum rollups) and the one
    // division truncates toward zero in BOTH engines (Spark DIV and
    // DuckDB integer // agree on negatives — anti-correlated lags
    // are legitimate). Long-domain bounds are guarded in-plan (the ts33
    // discipline: fails loudly, never wraps). Scale shape: ONE corpus
    // scan partial-aggs into the day domain; the lag pairing,
    // scalar moments, and division all run on that calendar-bounded
    // frame (|days|×3 rows — broadcast joins, zero corpus shuffles).
    "ts36_autocorr" -> ((s, d) =>
      autocorrOf(
          ev(s, d).groupBy(expr("epoch_s DIV 86400").as("dn"))
            .agg(count(lit(1)).as("x")),
          maxLag = 3)
        .orderBy(col("lag_k"))),

    // WEEK-OVER-WEEK GROWTH per event type — the trend column on
    // every product dashboard ("purchases +12% WoW"): per (type,
    // epoch-week) counts, each week joined to its predecessor, growth
    // = (n − n_prev)·1000 DIV n_prev in integer milli (negative
    // growth legitimate — truncating division verified identical in
    // both engines). Weeks index as epoch_s DIV 604800 (epoch weeks,
    // Thursday-start — a fixed integer convention both engines
    // compute identically; calendar alignment is ts31's
    // date_trunc('week') territory). Scale shape: ONE corpus scan
    // partial-aggs into the (type × week) domain; the predecessor
    // join and growth arithmetic run on that calendar-sized frame.
    "ts38_week_over_week" -> ((s, d) =>
      wowOf(ev(s, d)
          .groupBy(col("event_type"), expr("epoch_s DIV 604800").as("wk"))
          .agg(count(lit(1)).as("n_events")))
        .orderBy(col("event_type"), col("wk"))),

    // THEIL–SEN ROBUST TREND per event-type daily series (Theil 1950 /
    // Sen 1968 — the median-of-pairwise-slopes estimator behind
    // "is this metric trending" monitors: unlike the OLS slope it
    // shrugs off the outlier days ts15 flags, with a 29% breakdown
    // point). ENGINE-EXACT: every pair (day i < day j) contributes
    // slope = (x_j − x_i)·1000 DIV (d_j − d_i) in integer milli
    // (truncating division — identical on negative numerators in both
    // engines, the ts36/ts38 discipline), and the reported trend is
    // the LOWER MEDIAN: the value at 1-based position (n_pairs+1) DIV 2
    // of the sorted slope multiset — a deterministic VALUE even when
    // row_number breaks slope ties arbitrarily. Scale shape: ONE
    // corpus scan partial-aggs into the (type × day) domain
    // (calendar-bounded at any corpus size — checkpointed, three
    // consumers: both pair sides + the per-type day census); the pair
    // self-join, median window, and classification all run on that
    // |days|²-per-type frame (≤ ~10^5 rows at a decade of days),
    // never corpus rows.
    "ts39_theil_sen" -> ((s, d) =>
      theilSenOf(ev(s, d)
          .groupBy(col("event_type"), expr("epoch_s DIV 86400").as("dn"))
          .agg(count(lit(1)).as("x")))
        .orderBy(col("event_type"))),

    // TRAFFIC CALENDAR PROFILE — the day-of-week × hour activity
    // heatmap behind ops dashboards (capacity planning, anomaly
    // baselines, release-window picks), with each weekday's peak hour
    // flagged. ENGINE-EXACT calendar arithmetic from epoch seconds
    // (dow = (days + 4) mod 7 with 0 = Sunday — 1970-01-01 was a
    // Thursday; hour = seconds-of-day DIV 3600) — never the engines'
    // dayofweek() functions, whose numbering conventions differ.
    // Scale shape: ONE corpus scan partial-aggs into the fixed 7×24
    // domain; shares and peak flags run over that 168-row frame (the
    // peak window partitions by dow — 7 partitions of ≤24 rows, a
    // domain frame, never corpus rows).
    "ts37_dow_profile" -> ((s, d) => {
      val m = ev(s, d)
        .groupBy(expr("CAST(((epoch_s DIV 86400) + 4) % 7 AS INT)").as("dow"),
          expr("CAST((epoch_s % 86400) DIV 3600 AS INT)").as("hour"))
        .agg(count(lit(1)).as("n_events"))
      val w = Window.partitionBy(col("dow"))
      m.withColumn("dow_total", sum(col("n_events")).over(w))
        .withColumn("dow_share_milli", expr("(n_events * 1000) DIV dow_total"))
        .withColumn("is_peak",
          col("n_events") === max(col("n_events")).over(w) &&
            col("hour") === min(when(col("n_events") === max(col("n_events")).over(w),
              col("hour"))).over(w))
        .select(col("dow"), col("hour"), col("n_events"),
          col("dow_share_milli"), col("is_peak"))
        .orderBy(col("dow"), col("hour"))
    }),

    // Sliding 1h range window per key.
    "ts04_sliding" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("epoch_s")).rangeBetween(-3600, 0)
      ev(s, d)
        .withColumn("value_c", round(col("value") * 100).cast("long"))
        .withColumn("w_avg_cents", avg(col("value_c")).over(w))
        .withColumn("w_cnt", count(lit(1)).over(w))
        .select(col("user_id"), col("event_id"), col("epoch_s"), col("w_avg_cents"), col("w_cnt"))
        .orderBy(col("user_id"), col("epoch_s"), col("event_id"))
    }),

    // Sessionization: gap > 30 min starts a new session.
    "ts05_session" -> ((s, d) => {
      val wo = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val ws = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev(s, d)
        .withColumn("gap", col("epoch_s") - lag(col("epoch_s"), 1).over(wo))
        .withColumn("is_new", when(col("gap").isNull || col("gap") > 1800, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("is_new")).over(ws))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("epoch_s")).as("start_s"),
          max(col("epoch_s")).as("end_s"))
        .withColumn("duration_s", col("end_s") - col("start_s"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // Time-range scan = ella's `time < now()` batch semantics
    // (README.md:100-105) with a fixed bound for reproducibility. On
    // TopicStore-backed topics this prunes time buckets at the source.
    "ts06_time_range" -> ((s, d) => {
      ev(s, d)
        .filter(col("ts") >= to_timestamp(lit("2024-01-10 00:00:00")) &&
          col("ts") < to_timestamp(lit("2024-01-12 00:00:00")))
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .orderBy(col("event_id"))
    }),

    // Dense hourly spine per event_type; missing buckets zero-filled.
    "ts07_gap_fill" -> ((s, d) => {
      val e = ev(s, d)
      val agg = e.groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n_raw"),
          sum(round(col("value") * 100).cast("long")).as("sum_raw"))
      val bounds = e.agg(min(date_trunc("hour", col("ts"))).as("mn"), max(date_trunc("hour", col("ts"))).as("mx"))
      val spine = bounds.select(explode(expr("sequence(mn, mx, INTERVAL 1 HOUR)")).as("h"))
      val types = e.select(col("event_type")).distinct()
      types.crossJoin(spine)
        .join(agg, Seq("event_type", "h"), "left")
        .select(col("event_type"), col("h"),
          coalesce(col("n_raw"), lit(0L)).as("n"),
          coalesce(col("sum_raw"), lit(0L)).as("sum_value_cents"))
        .orderBy(col("event_type"), col("h"))
    }),

    // Time-weighted average per key: each sample weighted by its
    // holding time until the next sample (the canonical TSDB rollup
    // for irregularly-sampled series). Integer cents x integer seconds
    // keeps sums exact; the final division is one IEEE op.
    "ts09_time_weighted_avg" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev(s, d)
        .withColumn("value_c", round(col("value") * 100).cast("long"))
        .withColumn("dt", lead(col("epoch_s"), 1).over(w) - col("epoch_s"))
        .filter(col("dt").isNotNull)
        .groupBy(col("user_id"))
        .agg(sum(col("value_c") * col("dt")).as("weighted_sum"),
          sum(col("dt")).as("total_dt"),
          count(lit(1)).as("n_intervals"))
        .withColumn("twa_cents", col("weighted_sum").cast("double") / col("total_dt"))
        .orderBy(col("user_id"))
    }),

    // OHLC downsampling: open/high/low/close per hourly bucket — the
    // canonical TSDB rollup. open/close via min/max over
    // (ts,event_id,value) structs: partial-aggregatable, no per-bucket
    // sort, shuffle carries one struct per (bucket) group.
    "ts10_ohlc" -> ((s, d) => {
      ev(s, d)
        .withColumn("value_c", round(col("value") * 100).cast("long"))
        .groupBy(date_trunc("hour", col("ts")).as("bucket"))
        .agg(
          min(struct(col("ts"), col("event_id"), col("value_c"))).getField("value_c").as("open_c"),
          max(col("value_c")).as("high_c"),
          min(col("value_c")).as("low_c"),
          max(struct(col("ts"), col("event_id"), col("value_c"))).getField("value_c").as("close_c"),
          count(lit(1)).as("volume"))
        .orderBy(col("bucket"))
    }),

    // Forward fill (last observation carried forward) on the dense
    // hourly spine: buckets with no samples inherit the last bucket's
    // closing value — the classic TSDB LOCF interpolation.
    "ts11_locf" -> ((s, d) => {
      val e = ev(s, d)
      // per (event_type, hour): closing value (max ts,event_id) in cents
      val agg = e.withColumn("value_c", round(col("value") * 100).cast("long"))
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(max(struct(col("ts"), col("event_id"), col("value_c"))).getField("value_c").as("close_c"))
      val bounds = e.agg(min(date_trunc("hour", col("ts"))).as("mn"), max(date_trunc("hour", col("ts"))).as("mx"))
      val spine = bounds.select(explode(expr("sequence(mn, mx, INTERVAL 1 HOUR)")).as("h"))
      val types = e.select(col("event_type")).distinct()
      val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      types.crossJoin(spine)
        .join(agg, Seq("event_type", "h"), "left")
        .withColumn("filled_c", last(col("close_c"), ignoreNulls = true).over(w))
        .withColumn("is_gap", col("close_c").isNull)
        .select(col("event_type"), col("h"), col("filled_c"), col("is_gap"))
        .orderBy(col("event_type"), col("h"))
    }),

    // Per-key derivative: value delta + seconds between samples.
    "ts08_delta" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev(s, d)
        .withColumn("delta", col("value") - lag(col("value"), 1).over(w))
        .withColumn("dt_s", col("epoch_s") - lag(col("epoch_s"), 1).over(w))
        .select(col("event_id"), col("user_id"), col("epoch_s"), col("value"), col("delta"), col("dt_s"))
        .orderBy(col("user_id"), col("epoch_s"), col("event_id"))
    }),

    // Interval join — events x time windows (maintenance windows,
    // experiment spans), the time-axis twin of q24: a naive
    // ts-BETWEEN join is a nested loop, so each window explodes into
    // the whole days it covers, facts equi-join on their day bucket
    // (hashable, broadcastable), and exact [start, end) bounds verify
    // afterwards. Overlapping windows multi-match by design.
    "ts13_interval_join" -> ((s, d) => {
      import java.time.{LocalDateTime, ZoneOffset}
      def es(t: String): Long =
        LocalDateTime.parse(t.replace(' ', 'T')).toEpochSecond(ZoneOffset.UTC)
      val day = 86400L
      val windows = Seq(
        ("w1", "2024-01-03 06:30:00", "2024-01-04 12:00:00"),
        ("w2", "2024-01-10 00:00:00", "2024-01-10 08:45:00"),
        ("w3", "2024-01-15 20:00:00", "2024-01-17 03:30:00"),
        ("w4", "2024-01-16 12:00:00", "2024-01-22 00:00:00"))
      import s.implicits._
      val wb = windows.flatMap { case (w, a, b) =>
        (es(a) / day to (es(b) - 1) / day).map(k => (w, a, b, k))
      }.toDF("w_name", "w_start", "w_end", "bucket")
      ev(s, d)
        .withColumn("bucket", expr(s"epoch_s DIV $day"))
        .join(broadcast(wb), "bucket")
        .filter(col("ts") >= col("w_start").cast("timestamp") &&
                col("ts") < col("w_end").cast("timestamp"))
        .groupBy(col("w_name"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).as("sum_cents"))
        .orderBy(col("w_name"))
    }),

    // Linear interpolation over the dense hourly spine — the smooth
    // twin of ts11's LOCF: a gap bucket gets
    // prev + (next-prev) * steps/span. FP-determinism: values are
    // integer cents and hour positions are integer epoch-hours, so the
    // numerator (next-prev)*(pos-prev_pos) is an EXACT long; the lerp
    // is then one long->double cast, one IEEE division and one add —
    // identical instruction order on both engines (SURVEY.md §5).
    // Leading/trailing gaps (no prev or next observation) stay null.
    // Same shuffle shape as ts11: one window partitioned by series key.
    "ts14_interpolate" -> ((s, d) => {
      val e = ev(s, d)
      val agg = e.withColumn("value_c", round(col("value") * 100).cast("long"))
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(max(struct(col("ts"), col("event_id"), col("value_c"))).getField("value_c").as("close_c"))
      val bounds = e.agg(min(date_trunc("hour", col("ts"))).as("mn"), max(date_trunc("hour", col("ts"))).as("mx"))
      val spine = bounds.select(explode(expr("sequence(mn, mx, INTERVAL 1 HOUR)")).as("h"))
      val types = e.select(col("event_type")).distinct()
      val wPrev = Window.partitionBy(col("event_type")).orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = Window.partitionBy(col("event_type")).orderBy(col("h"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      types.crossJoin(spine)
        .join(agg, Seq("event_type", "h"), "left")
        .withColumn("hp", expr("CAST(h AS LONG) DIV 3600"))
        .withColumn("obs", when(col("close_c").isNotNull, struct(col("hp"), col("close_c"))))
        .withColumn("prev", last(col("obs"), ignoreNulls = true).over(wPrev))
        .withColumn("nxt", first(col("obs"), ignoreNulls = true).over(wNext))
        .withColumn("lerp_c",
          when(col("close_c").isNotNull, col("close_c").cast("double"))
            .otherwise(when(col("prev").isNotNull && col("nxt").isNotNull,
              col("prev.close_c").cast("double") +
                ((col("nxt.close_c") - col("prev.close_c")) * (col("hp") - col("prev.hp")))
                  .cast("double") / (col("nxt.hp") - col("prev.hp")).cast("double"))))
        .select(col("event_type"), col("h"), col("lerp_c"), col("close_c").isNull.as("is_gap"))
        .orderBy(col("event_type"), col("h"))
    }),

    // Per-key z-score anomaly detection — the TSDB outlier rollup.
    // FP-determinism: both moments are EXACT integer sums (cents and
    // squared cents commute), so mean/variance/z are a fixed chain of
    // IEEE ops over identical inputs on both engines — no stddev()
    // aggregate, whose partial-merge order is engine-dependent. The
    // per-key stats table is tiny -> broadcast back; one shuffle total.
    // (At extreme scale the squared-cents sum upgrades to decimal(38)
    // to dodge long overflow; longs are exact at any realistic key
    // cardinality here.)
    // Seasonality profile: the calendar-bucket view of a time series —
    // per (event_type, day-of-week, hour-of-day) volume and exact
    // integer-cent means. One map-side-combinable agg over the corpus;
    // dow normalized to 0=Sunday on both engines (Spark dayofweek is
    // 1-based, DuckDB dow is 0-based).
    "ts17_seasonality" -> ((s, d) => {
      ev(s, d)
        .withColumn("value_c", round(col("value") * 100).cast("long"))
        .groupBy(col("event_type"),
          (dayofweek(col("ts")) - 1).as("dow"),
          hour(col("ts")).as("hod"))
        .agg(count(lit(1)).as("n"),
          sum(col("value_c")).as("sum_c"),
          expr("sum(value_c) DIV count(1)").as("mean_c"))
        .orderBy(col("event_type"), col("dow"), col("hod"))
    }),

    // Rolling median (robust smoother — the de-noising twin of ts04's
    // rolling mean): exact per-key median of the last 5 samples via a
    // window aggregate over integer cents. Interpolated middles are
    // exact halves (x.5), so both engines agree bit-for-bit. One
    // shuffle (the per-key window sort), same shape as ts04/ts08.
    "ts16_rolling_median" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-4, Window.currentRow)
      ev(s, d)
        .withColumn("value_c", round(col("value") * 100).cast("long"))
        .withColumn("n_window", count(lit(1)).over(w))
        .withColumn("roll_med_c", expr("percentile(value_c, 0.5)").over(w))
        .select(col("user_id"), col("event_id"), col("value_c"),
          col("n_window"), col("roll_med_c"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    "ts15_anomaly" -> ((s, d) => {
      val e = ev(s, d).withColumn("value_c", round(col("value") * 100).cast("long"))
      val stats = e.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("value_c")).as("sum_c"),
          sum(col("value_c") * col("value_c")).as("sumsq_c"))
      // Unhinted: per-key stats grow with key cardinality (billions of
      // keys at 100 TB) — AQE broadcasts the table only while it is
      // actually small; otherwise both sides hash on user_id.
      e.join(stats, "user_id")
        .withColumn("mean_c", expr("CAST(sum_c AS DOUBLE) / n"))
        .withColumn("var_c", expr("(CAST(sumsq_c AS DOUBLE) - CAST(sum_c AS DOUBLE) * mean_c) / n"))
        .filter(col("var_c") > 0)
        .withColumn("z", expr("(CAST(value_c AS DOUBLE) - mean_c) / sqrt(var_c)"))
        .filter(abs(col("z")) >= lit(3.0))
        .select(col("event_id"), col("user_id"), col("value_c"), col("z"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // As-of join through graft's NATIVE operator (custom LogicalPlan +
    // Strategy + AsofJoinExec, plans/AsofJoinPlan.scala): one exchange
    // + sort per side, then a streaming O(1)-state per-partition merge
    // — versus ts03's composed union+window form (same semantics, same
    // oracle). The exec requires co-partitioning like a sort-merge
    // join, so at 100 TB it is exactly one shuffle per side.
    "ts12_asof_native" -> ((s, d) => {
      graft.GraftExtensions.register(s)
      import graft.api._
      val ord = Tables(s, d, "orders")
        .groupBy(col("o_custkey").cast("long").as("k"), col("o_orderdate").as("t"))
        .agg(max(col("o_orderkey")).as("ord_key"))
        .withColumn("t", (col("t") + expr("INTERVAL 29 YEARS")).cast("timestamp"))
      Tables.events(s, d).select(col("event_id"), col("user_id"), col("ts"))
        .asofJoinNative(ord, "user_id", "ts", "k", "t", "ord_key")
        .select(col("event_id"), col("user_id"), col("ts"), col("ord_key"))
        .orderBy(col("event_id"))
    }),

    // EWMA smoother per series key — the classic streaming-TSDB
    // exponential moving average (ella's per-topic rolling reads,
    // `table/topic.rs`), made ENGINE-EXACT by using a dyadic decay
    // (alpha = 1/2) truncated at depth 8: the smoothed value is a pure
    // integer weighted sum of the last 8 cent-quantized samples with
    // weights 128,64,...,1 — no pow(), no float accumulation, so both
    // engines produce bit-identical output. One window shuffle on
    // user_id (high-cardinality series key — partition-parallel at
    // scale, unlike an event_type partitioning which would hotspot);
    // depth-8 truncation is what bounds per-row state to O(1) in the
    // streaming form.
    "ts19_ewma" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val lags = (0 until 8).map(j =>
        lag(col("cents"), j).over(w).as(s"x$j"))
      val num = (0 until 8).map(j =>
        coalesce(col(s"x$j") * lit(1L << (7 - j)), lit(0L))).reduce(_ + _)
      val den = (0 until 8).map(j =>
        when(col(s"x$j").isNotNull, lit(1L << (7 - j))).otherwise(lit(0L))).reduce(_ + _)
      ev(s, d)
        .withColumn("cents", round(col("value") * 100).cast("long"))
        .select(Seq(col("event_id"), col("user_id"), col("epoch_s"), col("cents")) ++ lags: _*)
        .withColumn("num", num).withColumn("den", den)
        .withColumn("ewma_millicents", expr("(num * 1000) DIV den"))
        .select(col("event_id"), col("user_id"), col("epoch_s"), col("cents"), col("ewma_millicents"))
        .orderBy(col("user_id"), col("epoch_s"), col("event_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    "ts23_top_paths" ->
      """WITH r AS (
        | SELECT user_id, event_type,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        | FROM events),
        |p AS (
        | SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        | FROM r WHERE rn <= 3 GROUP BY user_id)
        |SELECT path, count(*) AS n_users FROM p GROUP BY 1
        |ORDER BY 2 DESC, 1 LIMIT 20""".stripMargin,
    "ts24_transitions" ->
      """WITH p AS (
        | SELECT event_type AS from_type,
        |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        | FROM events),
        |m AS (
        | SELECT from_type, to_type, count(*) AS n
        | FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |f AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from FROM m GROUP BY 1)
        |SELECT m.from_type, m.to_type, n, n_from, (n * 1000) // n_from AS p_milli
        |FROM m JOIN f USING (from_type)
        |ORDER BY 1, 2""".stripMargin,
    "ts25_funnel_timing" ->
      """WITH per_user AS (
        | SELECT user_id,
        |  list_min(list(ts) FILTER (event_type = 'signup')) AS t1,
        |  list(ts) FILTER (event_type = 'view') AS vts,
        |  list(ts) FILTER (event_type = 'purchase') AS pts
        | FROM events
        | WHERE event_type IN ('signup', 'view', 'purchase') GROUP BY 1
        |), s2 AS (
        | SELECT user_id, t1, pts,
        |  list_min(list_filter(vts,
        |    t -> t >= t1 AND t <= t1 + INTERVAL 12 HOUR)) AS t2
        | FROM per_user
        |), s3 AS (
        | SELECT user_id, t1, t2,
        |  list_min(list_filter(pts,
        |    t -> t >= t2 AND t <= t2 + INTERVAL 12 HOUR)) AS t3
        | FROM s2
        |), r AS (
        | SELECT 'signup>view' AS transition, t1 IS NOT NULL AS prev,
        |  (epoch_us(t2) // 1000000) - (epoch_us(t1) // 1000000) AS dt_s FROM s3
        | UNION ALL
        | SELECT 'view>purchase' AS transition, t2 IS NOT NULL AS prev,
        |  (epoch_us(t3) // 1000000) - (epoch_us(t2) // 1000000) AS dt_s FROM s3
        |), g AS (
        | SELECT transition, count(*) AS n_prev, count(dt_s) AS n_conv,
        |  min(dt_s) AS min_s, max(dt_s) AS max_s, CAST(sum(dt_s) AS BIGINT) AS sum_s
        | FROM r WHERE prev GROUP BY 1)
        |SELECT transition, n_prev, n_conv,
        | (n_conv * 1000) // n_prev AS conv_milli,
        | min_s, max_s,
        | CASE WHEN n_conv > 0 THEN (sum_s * 1000) // n_conv END AS mean_milli_s
        |FROM g ORDER BY transition""".stripMargin,
    "ts27_rfm" ->
      """WITH per_user AS (
        | SELECT user_id, max(ts) AS last_ts, count(*) AS n_events,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
        | FROM events GROUP BY 1),
        |a AS (SELECT max(ts) AS anchor_ts FROM events),
        |b AS (
        | SELECT user_id, n_events, value_cents,
        |  (epoch_us(anchor_ts) // 1000000) - (epoch_us(last_ts) // 1000000) AS recency_s
        | FROM per_user, a),
        |r AS (
        | SELECT *,
        |  CAST(ntile(4) OVER (ORDER BY recency_s, user_id) AS INT) AS r_q,
        |  CAST(ntile(4) OVER (ORDER BY -n_events, user_id) AS INT) AS f_q,
        |  CAST(ntile(4) OVER (ORDER BY -value_cents, user_id) AS INT) AS m_q
        | FROM b)
        |SELECT user_id, recency_s, n_events, value_cents, r_q, f_q, m_q,
        | r_q*100 + f_q*10 + m_q AS rfm
        |FROM r ORDER BY user_id""".stripMargin,
    "ts26_ab_lift" ->
      """WITH per_user AS (
        | SELECT user_id,
        |  list_min(list(ts) FILTER (event_type = 'view')) AS first_view,
        |  list(ts) FILTER (event_type = 'purchase') AS pts
        | FROM events GROUP BY 1),
        |exposed AS (
        | SELECT user_id,
        |  len(list_filter(pts, t -> t >= first_view)) > 0 AS converted,
        |  CASE WHEN substr(md5(CAST(user_id AS VARCHAR) || ':ab'), 1, 1) < '8'
        |   THEN 'A' ELSE 'B' END AS arm
        | FROM per_user WHERE first_view IS NOT NULL)
        |SELECT arm, count(*) AS n_users,
        | CAST(sum(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT) AS n_conv,
        | (CAST(sum(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT) * 1000) // count(*) AS conv_milli
        |FROM exposed GROUP BY 1 ORDER BY 1""".stripMargin,
    "ts30_attribution" ->
      """WITH tl AS (
        | SELECT *,
        |  last_value(CASE WHEN event_type IN ('view', 'click') THEN event_type END IGNORE NULLS)
        |   OVER w AS lt_type,
        |  last_value(CASE WHEN event_type IN ('view', 'click') THEN epoch_us(ts) END IGNORE NULLS)
        |   OVER w AS lt_us,
        |  first_value(CASE WHEN event_type IN ('view', 'click') THEN event_type END IGNORE NULLS)
        |   OVER w AS ft_type
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |conv AS (
        | SELECT
        |  CASE WHEN lt_us IS NOT NULL AND epoch_us(ts) - lt_us <= 604800000000
        |       THEN lt_type ELSE 'none' END AS last_touch,
        |  coalesce(ft_type, 'none') AS first_touch,
        |  CAST(round(value * 100) AS BIGINT) AS vc
        | FROM tl WHERE event_type = 'purchase'),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM conv)
        |SELECT last_touch, first_touch, CAST(count(*) AS BIGINT) AS n_conv,
        | CAST(sum(vc) AS BIGINT) AS value_cents, n_total,
        | (CAST(count(*) AS BIGINT) * 1000) // n_total AS share_milli
        |FROM conv, t GROUP BY 1, 2, n_total ORDER BY 1, 2""".stripMargin,
    "ts31_stickiness" ->
      """WITH act AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
        |dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM act GROUP BY 1),
        |w AS (SELECT strftime(date_trunc('week', day), '%Y-%m-%d') AS week,
        |       CAST(sum(dau) AS BIGINT) AS sum_dau,
        |       CAST(count(*) AS BIGINT) AS n_days
        |      FROM dau GROUP BY 1),
        |wau AS (SELECT strftime(date_trunc('week', day), '%Y-%m-%d') AS week,
        |        CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        |       FROM act GROUP BY 1)
        |SELECT w.week, n_days, sum_dau, wau,
        | (sum_dau * 1000) // (n_days * wau) AS stickiness_milli
        |FROM w JOIN wau USING (week) ORDER BY week""".stripMargin,
    "ts32_ltv" ->
      """WITH first_seen AS (
        | SELECT user_id, date_trunc('day', min(ts)) AS cohort
        | FROM events GROUP BY 1),
        |sizes AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_cohort
        |          FROM first_seen GROUP BY 1),
        |purch AS (
        | SELECT user_id, date_trunc('day', ts) AS day,
        |  CAST(round(value * 100) AS BIGINT) AS vc
        | FROM events WHERE event_type = 'purchase'),
        |mat AS (
        | SELECT f.cohort, CAST(date_diff('day', f.cohort, p.day) AS BIGINT) AS age_day,
        |  CAST(sum(p.vc) AS BIGINT) AS rev_cents
        | FROM purch p JOIN first_seen f USING (user_id) GROUP BY 1, 2),
        |c AS (
        | SELECT *, CAST(sum(rev_cents) OVER (
        |   PARTITION BY cohort ORDER BY age_day
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
        | FROM mat)
        |SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort_day, age_day, rev_cents,
        | cum_cents, n_cohort, (cum_cents * 1000) // n_cohort AS ltv_milli_cents
        |FROM c JOIN sizes USING (cohort) ORDER BY 1, 2""".stripMargin,
    // ts40: ts35's cum-count rule partitioned by (type, day) — both
    // sides key on the two columns directly.
    "ts40_slo_bands" ->
      """WITH f AS (
        | SELECT event_type, (epoch_us(ts) // 1000000) // 86400 AS dn,
        |  CAST(round(value * 100) AS BIGINT) AS cents
        | FROM events),
        |h AS (SELECT event_type, dn, cents, CAST(count(*) AS BIGINT) AS cnt
        | FROM f GROUP BY 1, 2, 3),
        |c AS (
        | SELECT event_type, dn, cents,
        |  CAST(sum(cnt) OVER (PARTITION BY event_type, dn ORDER BY cents
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |  CAST(sum(cnt) OVER (PARTITION BY event_type, dn) AS BIGINT) AS n
        | FROM h),
        |qq AS (SELECT CAST(unnest([500, 900, 990]) AS INT) AS q_milli)
        |SELECT event_type, CAST(dn AS BIGINT) AS dn, q_milli,
        | min(cents) AS cents, max(n) AS n
        |FROM c CROSS JOIN qq
        |WHERE cum * 1000 >= n * q_milli
        |GROUP BY 1, 2, 3 ORDER BY event_type, dn, q_milli""".stripMargin,
    "ts35_quantiles" ->
      """WITH f AS (
        | SELECT event_type AS key, CAST(round(value * 100) AS BIGINT) AS cents
        | FROM events),
        |h AS (SELECT key, cents, CAST(count(*) AS BIGINT) AS cnt FROM f GROUP BY 1, 2),
        |c AS (
        | SELECT key, cents,
        |  CAST(sum(cnt) OVER (PARTITION BY key ORDER BY cents
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |  CAST(sum(cnt) OVER (PARTITION BY key) AS BIGINT) AS n
        | FROM h),
        |qq AS (SELECT CAST(unnest([250, 500, 750, 900, 990]) AS INT) AS q_milli)
        |SELECT key AS event_type, q_milli,
        | min(cents) AS cents, max(n) AS n
        |FROM c CROSS JOIN qq
        |WHERE cum * 1000 >= n * q_milli
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ts38_week_over_week" ->
      """WITH w AS (
        | SELECT event_type, (epoch_us(ts) // 1000000) // 604800 AS wk,
        |  CAST(count(*) AS BIGINT) AS n_events
        | FROM events GROUP BY 1, 2)
        |SELECT c.event_type, c.wk, c.n_events, p.n_events AS n_prev,
        | CAST(((c.n_events - p.n_events) * 1000) // p.n_events AS BIGINT) AS growth_milli
        |FROM w c JOIN w p ON p.event_type = c.event_type AND p.wk = c.wk - 1
        |ORDER BY c.event_type, c.wk""".stripMargin,
    // ts41: the oracle re-densifies the (type × day) domain with the
    // same generate_series spine and recomputes the trailing window;
    // integer division on non-negative counts agrees in both engines.
    "ts41_burst" ->
      """WITH dc AS (
        | SELECT event_type, (epoch_us(ts) // 1000000) // 86400 AS dn,
        |  CAST(count(*) AS BIGINT) AS n
        | FROM events GROUP BY 1, 2),
        |spine AS (SELECT unnest(generate_series(
        |  (SELECT min(dn) FROM dc), (SELECT max(dn) FROM dc))) AS dn),
        |types AS (SELECT DISTINCT event_type FROM dc),
        |dense AS (
        | SELECT t.event_type, s.dn, CAST(coalesce(d.n, 0) AS BIGINT) AS n
        | FROM types t CROSS JOIN spine s
        | LEFT JOIN dc d ON d.event_type = t.event_type AND d.dn = s.dn),
        |w AS (
        | SELECT event_type, dn, n,
        |  CAST(sum(n) OVER (PARTITION BY event_type ORDER BY dn
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS prev7,
        |  count(*) OVER (PARTITION BY event_type ORDER BY dn
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS npd
        | FROM dense)
        |SELECT event_type, dn, n, prev7,
        | CAST((n * 7000) // greatest(1, prev7) AS BIGINT) AS burst_milli,
        | ((n * 7000) // greatest(1, prev7) >= 2000 AND n >= 5) AS burst
        |FROM w WHERE npd = 7
        |ORDER BY event_type, dn""".stripMargin,
    // ts39: the lower-median slope value is deterministic under ties
    // (we select the VALUE at the sorted position, not the row), so
    // row_number's arbitrary tie order is immaterial; DuckDB's
    // integer // truncates toward zero like Spark DIV on the signed
    // slope numerators.
    // ts42: exact-rational ANOVA fold — q_ph = s_ph² // n_ph longs;
    // DuckDB // truncates toward zero exactly like Spark DIV.
    "ts42_cycle_scan" ->
      """WITH dc AS (
        | SELECT event_type, (epoch_us(ts) // 1000000) // 86400 AS dn,
        |  CAST(count(*) AS BIGINT) AS n
        | FROM events GROUP BY 1, 2),
        |spine AS (SELECT unnest(generate_series(
        |  (SELECT min(dn) FROM dc), (SELECT max(dn) FROM dc))) AS dn),
        |types AS (SELECT DISTINCT event_type FROM dc),
        |dense AS (
        | SELECT t.event_type, s.dn, CAST(coalesce(d.n, 0) AS BIGINT) AS n
        | FROM types t CROSS JOIN spine s
        | LEFT JOIN dc d ON d.event_type = t.event_type AND d.dn = s.dn),
        |stats AS (
        | SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(n) AS BIGINT) AS s, CAST(sum(n * n) AS BIGINT) AS ssq
        | FROM dense GROUP BY 1),
        |periods AS (SELECT unnest(generate_series(2, 10)) AS period),
        |ph AS (
        | SELECT event_type, period, dn % period AS phase,
        |  CAST(count(*) AS BIGINT) AS n_ph, CAST(sum(n) AS BIGINT) AS s_ph
        | FROM dense CROSS JOIN periods GROUP BY 1, 2, 3),
        |sq AS (
        | SELECT event_type, period,
        |  CAST(sum((s_ph * s_ph) // n_ph) AS BIGINT) AS sum_q
        | FROM ph GROUP BY 1, 2),
        |sc AS (
        | SELECT q.event_type, CAST(q.period AS BIGINT) AS period, t.n_days,
        |  t.n_days * q.sum_q - t.s * t.s AS between_ss,
        |  t.n_days * t.ssq - t.s * t.s AS total_ss
        | FROM sq q JOIN stats t USING (event_type))
        |SELECT event_type, period, n_days, between_ss, total_ss,
        | between_ss // greatest(1, total_ss // 1000) AS strength_milli,
        | row_number() OVER (PARTITION BY event_type
        |   ORDER BY between_ss // greatest(1, total_ss // 1000) DESC, period) = 1
        |  AS is_best
        |FROM sc ORDER BY event_type, period""".stripMargin,
    "ts39_theil_sen" ->
      """WITH daily AS (
        | SELECT event_type, (epoch_us(ts) // 1000000) // 86400 AS dn,
        |  CAST(count(*) AS BIGINT) AS x
        | FROM events GROUP BY 1, 2),
        |pairs AS (
        | SELECT a.event_type,
        |  CAST(((b.x - a.x) * 1000) // (b.dn - a.dn) AS BIGINT) AS slope_milli
        | FROM daily a JOIN daily b
        |   ON b.event_type = a.event_type AND b.dn > a.dn),
        |ranked AS (
        | SELECT event_type, slope_milli,
        |  CAST(row_number() OVER (PARTITION BY event_type ORDER BY slope_milli) AS BIGINT) AS rn,
        |  CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_pairs
        | FROM pairs),
        |med AS (
        | SELECT event_type, n_pairs, slope_milli FROM ranked
        | WHERE rn = (n_pairs + 1) // 2),
        |census AS (
        | SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(x) AS BIGINT) AS n_events
        | FROM daily GROUP BY 1)
        |SELECT c.event_type, c.n_days, c.n_events, m.n_pairs, m.slope_milli,
        | CASE WHEN m.slope_milli > 0 THEN 'up'
        |      WHEN m.slope_milli < 0 THEN 'down' ELSE 'flat' END AS trend
        |FROM census c JOIN med m USING (event_type)
        |ORDER BY c.event_type""".stripMargin,
    "ts37_dow_profile" ->
      """WITH b AS (
        | SELECT CAST((((epoch_us(ts) // 1000000) // 86400 + 4) % 7) AS INT) AS dow,
        |  CAST(((epoch_us(ts) // 1000000) % 86400) // 3600 AS INT) AS hour
        | FROM events),
        |m AS (SELECT dow, hour, CAST(count(*) AS BIGINT) AS n_events
        | FROM b GROUP BY 1, 2),
        |t AS (SELECT *, CAST(sum(n_events) OVER (PARTITION BY dow) AS BIGINT) AS dow_total,
        |  CAST(max(n_events) OVER (PARTITION BY dow) AS BIGINT) AS dow_max
        | FROM m),
        |p AS (SELECT *, min(CASE WHEN n_events = dow_max THEN hour END)
        |   OVER (PARTITION BY dow) AS peak_hour FROM t)
        |SELECT dow, hour, n_events,
        | (n_events * 1000) // dow_total AS dow_share_milli,
        | (n_events = dow_max AND hour = peak_hour) AS is_peak
        |FROM p ORDER BY dow, hour""".stripMargin,
    "ts36_autocorr" ->
      """WITH daily0 AS (
        | SELECT (epoch_us(ts) // 1000000) // 86400 AS dn,
        |  CAST(count(*) AS BIGINT) AS x
        | FROM events GROUP BY 1),
        |rng AS (SELECT unnest(generate_series(
        |  (SELECT min(dn) FROM daily0), (SELECT max(dn) FROM daily0))) AS dn),
        |daily AS (
        | SELECT r.dn, CAST(COALESCE(d.x, 0) AS BIGINT) AS x
        | FROM rng r LEFT JOIN daily0 d USING (dn)),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |  CAST(sum(x * x) AS BIGINT) AS sxx FROM daily),
        |l AS (SELECT CAST(unnest([1, 2, 3]) AS INT) AS lag_k),
        |p AS (
        | SELECT l.lag_k, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(a.x * b.x) AS BIGINT) AS pk,
        |  CAST(sum(a.x + b.x) AS BIGINT) AS qk
        | FROM daily a CROSS JOIN l JOIN daily b ON b.dn = a.dn + l.lag_k
        | GROUP BY 1)
        |SELECT lag_k, n_pairs,
        | CAST((1000 * (n*n*pk - n*sx*qk + n_pairs*sx*sx))
        |   // (n*n*sxx - n*sx*sx) AS BIGINT) AS autocorr_milli
        |FROM p, g ORDER BY lag_k""".stripMargin,
    "ts34_conversion_lag" ->
      """WITH signup AS (
        | SELECT user_id, min(ts) AS t_signup FROM events
        | WHERE event_type = 'signup' GROUP BY 1),
        |conv AS (
        | SELECT e.user_id, s.t_signup, min(e.ts) AS t_conv
        | FROM events e JOIN signup s USING (user_id)
        | WHERE e.event_type = 'purchase' AND e.ts >= s.t_signup
        | GROUP BY 1, 2),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_signups FROM signup),
        |lb AS (
        | SELECT CAST((epoch_us(t_conv) // 1000000 - epoch_us(t_signup) // 1000000)
        |        // 86400 AS BIGINT) AS lag_days,
        |  CAST(count(*) AS BIGINT) AS n_conv
        | FROM conv GROUP BY 1),
        |c AS (SELECT *, CAST(sum(n_conv) OVER (
        |  ORDER BY lag_days ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |  AS BIGINT) AS cum_conv FROM lb)
        |SELECT lag_days, n_conv, cum_conv, n_signups,
        | (cum_conv * 1000) // n_signups AS converted_milli,
        | ((n_signups - cum_conv) * 1000) // n_signups AS survival_milli
        |FROM c, n ORDER BY lag_days""".stripMargin,
    "ts33_gini" ->
      """WITH pu AS (
        | SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n_ev
        | FROM events GROUP BY 1, 2),
        |r AS (
        | SELECT *, CAST(row_number() OVER (
        |   PARTITION BY event_type ORDER BY n_ev, user_id) AS BIGINT) AS rn
        | FROM pu),
        |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_users
        |      FROM pu GROUP BY 1)
        |SELECT r.event_type, t.n_users,
        | CAST(sum(n_ev) AS BIGINT) AS total_events,
        | ((2 * CAST(sum(rn * n_ev) AS BIGINT) - (t.n_users + 1) * CAST(sum(n_ev) AS BIGINT)) * 1000)
        |   // (t.n_users * CAST(sum(n_ev) AS BIGINT)) AS gini_milli,
        | (CAST(sum(CASE WHEN rn * 10 > t.n_users * 9 THEN n_ev ELSE 0 END) AS BIGINT) * 1000)
        |   // CAST(sum(n_ev) AS BIGINT) AS top_decile_milli
        |FROM r JOIN t USING (event_type) GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "ts28_changepoint" ->
      """WITH v AS (
        | SELECT event_type, ts, event_id,
        |  CAST(round(value * 100) AS BIGINT) AS vc
        | FROM events),
        |t AS (
        | SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(vc) AS BIGINT) AS sum_c
        | FROM v GROUP BY 1),
        |p AS (
        | SELECT event_type, ts, event_id,
        |  CAST(row_number() OVER w AS BIGINT) AS rn,
        |  CAST(sum(vc) OVER w AS BIGINT) AS prefix
        | FROM v
        | WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |d AS (
        | SELECT p.event_type, p.ts, p.event_id, p.rn, p.prefix, t.n, t.sum_c,
        |  p.prefix * t.n - p.rn * t.sum_c AS dev
        | FROM p JOIN t USING (event_type)),
        |r AS (
        | SELECT *, row_number() OVER (
        |   PARTITION BY event_type ORDER BY abs(dev) DESC, ts, event_id) AS rk
        | FROM d)
        |SELECT event_type, n, sum_c, rn AS cp_rn, ts AS cp_ts,
        | event_id AS cp_event_id, dev,
        | (prefix * 1000) // rn AS mean_before_milli,
        | CASE WHEN rn < n THEN ((sum_c - prefix) * 1000) // (n - rn) END
        |  AS mean_after_milli
        |FROM r WHERE rk = 1 ORDER BY event_type""".stripMargin,
    "ts29_assoc" ->
      """WITH b AS (SELECT DISTINCT user_id, event_type FROM events),
        |n AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM events),
        |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_single FROM b GROUP BY 1),
        |p AS (
        | SELECT x.event_type AS a, y.event_type AS b, CAST(count(*) AS BIGINT) AS n_ab
        | FROM b x JOIN b y ON x.user_id = y.user_id AND x.event_type < y.event_type
        | GROUP BY 1, 2)
        |SELECT p.a, p.b, p.n_ab, sa.n_single AS n_a, sb.n_single AS n_b, n.n_users,
        | (p.n_ab * 1000) // n.n_users AS support_milli,
        | (p.n_ab * 1000) // sa.n_single AS conf_ab_milli,
        | (p.n_ab * 1000) // sb.n_single AS conf_ba_milli,
        | (((p.n_ab * n.n_users) // sa.n_single) * 1000) // sb.n_single AS lift_milli
        |FROM p JOIN s sa ON p.a = sa.event_type
        |       JOIN s sb ON p.b = sb.event_type, n
        |ORDER BY p.a, p.b""".stripMargin,
    "ts21_funnel" ->
      """WITH per_user AS (
        | SELECT user_id,
        |  list_min(list(ts) FILTER (event_type = 'signup')) AS t1,
        |  list(ts) FILTER (event_type = 'view') AS vts,
        |  list(ts) FILTER (event_type = 'purchase') AS pts
        | FROM events
        | WHERE event_type IN ('signup', 'view', 'purchase') GROUP BY 1
        |), s2 AS (
        | SELECT user_id, t1, pts,
        |  list_min(list_filter(vts,
        |    t -> t >= t1 AND t <= t1 + INTERVAL 12 HOUR)) AS t2
        | FROM per_user
        |), s3 AS (
        | SELECT user_id, t1, t2,
        |  list_min(list_filter(pts,
        |    t -> t >= t2 AND t <= t2 + INTERVAL 12 HOUR)) AS t3
        | FROM s2)
        |SELECT user_id, t1, t2, t3,
        | CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
        |      WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS depth
        |FROM s3 ORDER BY user_id""".stripMargin,
    "ts22_retention" ->
      """WITH first_seen AS (
        | SELECT user_id, date_trunc('day', min(ts)) AS cohort
        | FROM events GROUP BY 1
        |), activity AS (
        | SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
        |), cohort_size AS (
        | SELECT cohort, count(*) AS n_cohort FROM first_seen GROUP BY 1
        |), m AS (
        | SELECT cohort, day, count(*) AS n_active
        | FROM first_seen JOIN activity USING (user_id) GROUP BY 1, 2)
        |SELECT strftime(m.cohort, '%Y-%m-%d') AS cohort_day,
        | CAST(date_diff('day', m.cohort, m.day) AS BIGINT) AS day_offset,
        | n_active, n_cohort,
        | (n_active * 1000) // n_cohort AS retention_milli
        |FROM m JOIN cohort_size USING (cohort)
        |ORDER BY 1, 2""".stripMargin,
    "ts01_resample" ->
      """SELECT date_trunc('hour', ts) AS bucket, count(*) AS n,
        | avg(CAST(round(value*100) AS BIGINT)) AS avg_value_cents,
        | min(value) AS min_value, max(value) AS max_value,
        | CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "ts02_latest_by_key" ->
      """SELECT user_id, ts, event_type, value FROM (
        | SELECT user_id, ts, event_type, value,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "ts18_snapshot" ->
      """SELECT user_id, ts, event_type, value FROM (
        | SELECT user_id, ts, event_type, value,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00')
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "ts03_asof_join" ->
      """WITH ord AS (
        | SELECT o_custkey AS k, o_orderdate + INTERVAL 29 YEARS AS t,
        |  max(o_orderkey) AS ord_key
        | FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.ts, ord.ord_key
        |FROM events e ASOF LEFT JOIN ord
        | ON e.user_id = ord.k AND e.ts >= ord.t
        |ORDER BY e.event_id""".stripMargin,
    "ts20_asof_tolerance" ->
      """WITH ord AS (
        | SELECT o_custkey AS k, o_orderdate + INTERVAL 29 YEARS AS t,
        |  max(o_orderkey) AS ord_key
        | FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.ts,
        | CASE WHEN ord.t IS NOT NULL
        |       AND date_diff('second', ord.t, e.ts) <= 604800
        |      THEN ord.ord_key END AS ord_key,
        | (ord.t IS NOT NULL
        |  AND date_diff('second', ord.t, e.ts) <= 604800) AS in_tol,
        | CASE WHEN ord.t IS NOT NULL
        |       AND date_diff('second', ord.t, e.ts) <= 604800
        |      THEN CAST(date_diff('second', ord.t, e.ts) AS BIGINT) END AS lag_s
        |FROM events e ASOF LEFT JOIN ord
        | ON e.user_id = ord.k AND e.ts >= ord.t
        |ORDER BY e.event_id""".stripMargin,
    "ts13_interval_join" ->
      """WITH w(w_name, w_start, w_end) AS (VALUES
        | ('w1', TIMESTAMP '2024-01-03 06:30:00', TIMESTAMP '2024-01-04 12:00:00'),
        | ('w2', TIMESTAMP '2024-01-10 00:00:00', TIMESTAMP '2024-01-10 08:45:00'),
        | ('w3', TIMESTAMP '2024-01-15 20:00:00', TIMESTAMP '2024-01-17 03:30:00'),
        | ('w4', TIMESTAMP '2024-01-16 12:00:00', TIMESTAMP '2024-01-22 00:00:00'))
        |SELECT w.w_name, count(*) AS n,
        | CAST(sum(CAST(round(e.value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events e JOIN w ON e.ts >= w.w_start AND e.ts < w.w_end
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ts12_asof_native" ->
      """WITH ord AS (
        | SELECT CAST(o_custkey AS BIGINT) AS k,
        |  CAST(o_orderdate + INTERVAL 29 YEARS AS TIMESTAMP) AS t,
        |  max(o_orderkey) AS ord_key
        | FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.ts, ord.ord_key
        |FROM events e ASOF LEFT JOIN ord
        | ON e.user_id = ord.k AND e.ts >= ord.t
        |ORDER BY e.event_id""".stripMargin,
    "ts04_sliding" ->
      """SELECT user_id, event_id, epoch_s,
        | avg(CAST(round(value*100) AS BIGINT)) OVER w AS w_avg_cents,
        | count(*) OVER w AS w_cnt
        |FROM (SELECT *, epoch_us(ts) // 1000000 AS epoch_s FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
        |  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, epoch_s, event_id""".stripMargin,
    "ts05_session" ->
      """WITH e AS (SELECT *, epoch_us(ts) // 1000000 AS epoch_s FROM events),
        |flagged AS (
        | SELECT *, epoch_s - lag(epoch_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        | FROM e),
        |sess AS (
        | SELECT *, sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
        |   OVER (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        | FROM flagged)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        | count(*) AS n_events, min(epoch_s) AS start_s, max(epoch_s) AS end_s,
        | max(epoch_s) - min(epoch_s) AS duration_s
        |FROM sess GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin,
    "ts06_time_range" ->
      """SELECT event_id, ts, user_id, event_type, value FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-12 00:00:00'
        |ORDER BY event_id""".stripMargin,
    "ts07_gap_fill" ->
      """WITH agg AS (
        | SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n_raw,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_raw
        | FROM events GROUP BY 1,2),
        |spine AS (
        | SELECT unnest(generate_series(
        |   (SELECT min(date_trunc('hour', ts)) FROM events),
        |   (SELECT max(date_trunc('hour', ts)) FROM events),
        |   INTERVAL 1 HOUR)) AS h),
        |types AS (SELECT DISTINCT event_type FROM events)
        |SELECT t.event_type, s.h,
        | coalesce(a.n_raw, 0) AS n, CAST(coalesce(a.sum_raw, 0) AS BIGINT) AS sum_value_cents
        |FROM types t CROSS JOIN spine s
        |LEFT JOIN agg a ON a.event_type = t.event_type AND a.h = s.h
        |ORDER BY t.event_type, s.h""".stripMargin,
    "ts09_time_weighted_avg" ->
      """WITH e AS (
        | SELECT user_id, CAST(round(value*100) AS BIGINT) AS value_c,
        |  epoch_us(ts) // 1000000 AS epoch_s,
        |  lead(epoch_us(ts) // 1000000, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) - epoch_us(ts) // 1000000 AS dt
        | FROM events)
        |SELECT user_id,
        | CAST(sum(value_c * dt) AS BIGINT) AS weighted_sum,
        | CAST(sum(dt) AS BIGINT) AS total_dt,
        | count(*) AS n_intervals,
        | CAST(sum(value_c * dt) AS DOUBLE) / CAST(sum(dt) AS BIGINT) AS twa_cents
        |FROM e WHERE dt IS NOT NULL
        |GROUP BY 1 ORDER BY user_id""".stripMargin,
    "ts10_ohlc" ->
      """WITH e AS (
        | SELECT date_trunc('hour', ts) AS bucket, ts, event_id,
        |  CAST(round(value*100) AS BIGINT) AS value_c,
        |  row_number() OVER (PARTITION BY date_trunc('hour', ts) ORDER BY ts, event_id) AS rn_a,
        |  row_number() OVER (PARTITION BY date_trunc('hour', ts) ORDER BY ts DESC, event_id DESC) AS rn_d
        | FROM events)
        |SELECT bucket,
        | max(CASE WHEN rn_a = 1 THEN value_c END) AS open_c,
        | max(value_c) AS high_c, min(value_c) AS low_c,
        | max(CASE WHEN rn_d = 1 THEN value_c END) AS close_c,
        | count(*) AS volume
        |FROM e GROUP BY 1 ORDER BY bucket""".stripMargin,
    "ts11_locf" ->
      """WITH e AS (
        | SELECT event_type, date_trunc('hour', ts) AS h, ts, event_id,
        |  CAST(round(value*100) AS BIGINT) AS value_c,
        |  row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
        |    ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events),
        |agg AS (SELECT event_type, h, max(CASE WHEN rn = 1 THEN value_c END) AS close_c
        |        FROM e GROUP BY 1, 2),
        |spine AS (
        | SELECT unnest(generate_series(
        |   (SELECT min(date_trunc('hour', ts)) FROM events),
        |   (SELECT max(date_trunc('hour', ts)) FROM events),
        |   INTERVAL 1 HOUR)) AS h),
        |types AS (SELECT DISTINCT event_type FROM events),
        |joined AS (
        | SELECT t.event_type, s.h, a.close_c
        | FROM types t CROSS JOIN spine s
        | LEFT JOIN agg a ON a.event_type = t.event_type AND a.h = s.h)
        |SELECT event_type, h,
        | CAST(last_value(close_c IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY h
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS filled_c,
        | close_c IS NULL AS is_gap
        |FROM joined ORDER BY event_type, h""".stripMargin,
    "ts14_interpolate" ->
      """WITH e AS (
        | SELECT event_type, date_trunc('hour', ts) AS h, ts, event_id,
        |  CAST(round(value*100) AS BIGINT) AS value_c,
        |  row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
        |    ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events),
        |agg AS (SELECT event_type, h, max(CASE WHEN rn = 1 THEN value_c END) AS close_c
        |        FROM e GROUP BY 1, 2),
        |spine AS (
        | SELECT unnest(generate_series(
        |   (SELECT min(date_trunc('hour', ts)) FROM events),
        |   (SELECT max(date_trunc('hour', ts)) FROM events),
        |   INTERVAL 1 HOUR)) AS h),
        |types AS (SELECT DISTINCT event_type FROM events),
        |joined AS (
        | SELECT t.event_type, s.h, a.close_c,
        |  CAST(epoch(s.h) AS BIGINT) // 3600 AS hp
        | FROM types t CROSS JOIN spine s
        | LEFT JOIN agg a ON a.event_type = t.event_type AND a.h = s.h),
        |filled AS (
        | SELECT event_type, h, close_c, hp,
        |  last_value(CASE WHEN close_c IS NOT NULL THEN hp END IGNORE NULLS)
        |    OVER (PARTITION BY event_type ORDER BY h
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_hp,
        |  last_value(close_c IGNORE NULLS)
        |    OVER (PARTITION BY event_type ORDER BY h
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_c,
        |  first_value(CASE WHEN close_c IS NOT NULL THEN hp END IGNORE NULLS)
        |    OVER (PARTITION BY event_type ORDER BY h
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_hp,
        |  first_value(close_c IGNORE NULLS)
        |    OVER (PARTITION BY event_type ORDER BY h
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_c
        | FROM joined)
        |SELECT event_type, h,
        | CASE WHEN close_c IS NOT NULL THEN CAST(close_c AS DOUBLE)
        |      WHEN prev_c IS NOT NULL AND next_c IS NOT NULL THEN
        |        CAST(prev_c AS DOUBLE) +
        |        CAST((next_c - prev_c) * (hp - prev_hp) AS DOUBLE) /
        |        CAST(next_hp - prev_hp AS DOUBLE)
        | END AS lerp_c,
        | close_c IS NULL AS is_gap
        |FROM filled ORDER BY event_type, h""".stripMargin,
    "ts17_seasonality" ->
      """WITH e AS (
        | SELECT event_type, CAST(date_part('dow', ts) AS INT) AS dow,
        |  CAST(date_part('hour', ts) AS INT) AS hod,
        |  CAST(round(value*100) AS BIGINT) AS value_c
        | FROM events)
        |SELECT event_type, dow, hod, count(*) AS n,
        | CAST(sum(value_c) AS BIGINT) AS sum_c,
        | CAST(sum(value_c) AS BIGINT) // count(*) AS mean_c
        |FROM e GROUP BY 1, 2, 3
        |ORDER BY event_type, dow, hod""".stripMargin,
    "ts16_rolling_median" ->
      """WITH e AS (
        | SELECT user_id, event_id, ts, CAST(round(value*100) AS BIGINT) AS value_c
        | FROM events)
        |SELECT user_id, event_id, value_c,
        | count(*) OVER w AS n_window,
        | median(value_c) OVER w AS roll_med_c
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,
    "ts15_anomaly" ->
      """WITH e AS (
        | SELECT event_id, user_id, CAST(round(value*100) AS BIGINT) AS value_c
        | FROM events),
        |st AS (
        | SELECT user_id, count(*) AS n, CAST(sum(value_c) AS BIGINT) AS sum_c,
        |  CAST(sum(value_c * value_c) AS BIGINT) AS sumsq_c
        | FROM e GROUP BY 1),
        |j AS (
        | SELECT e.event_id, e.user_id, e.value_c,
        |  CAST(sum_c AS DOUBLE) / n AS mean_c,
        |  (CAST(sumsq_c AS DOUBLE) - CAST(sum_c AS DOUBLE) * (CAST(sum_c AS DOUBLE) / n)) / n AS var_c
        | FROM e JOIN st USING (user_id))
        |SELECT event_id, user_id, value_c,
        | (CAST(value_c AS DOUBLE) - mean_c) / sqrt(var_c) AS z
        |FROM j
        |WHERE var_c > 0 AND abs((CAST(value_c AS DOUBLE) - mean_c) / sqrt(var_c)) >= 3.0
        |ORDER BY user_id, event_id""".stripMargin,
    "ts08_delta" ->
      """SELECT event_id, user_id, epoch_s, value,
        | value - lag(value) OVER w AS delta,
        | epoch_s - lag(epoch_s) OVER w AS dt_s
        |FROM (SELECT *, epoch_us(ts) // 1000000 AS epoch_s FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, epoch_s, event_id""".stripMargin,
    "ts19_ewma" -> {
      val lagCols = (0 until 8).map(j => s"lag(cents, $j) OVER w AS x$j").mkString(",\n        |  ")
      val num = (0 until 8).map(j => s"coalesce(x$j * ${1L << (7 - j)}, 0)").mkString(" + ")
      val den = (0 until 8).map(j =>
        s"(CASE WHEN x$j IS NOT NULL THEN ${1L << (7 - j)} ELSE 0 END)").mkString(" + ")
      s"""WITH base AS (
        | SELECT event_id, user_id, ts, epoch_us(ts) // 1000000 AS epoch_s,
        |  CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |l AS (
        | SELECT event_id, user_id, epoch_s, cents,
        |  $lagCols
        | FROM base WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_id, user_id, epoch_s, cents,
        | (($num) * 1000) // ($den) AS ewma_millicents
        |FROM l ORDER BY user_id, epoch_s, event_id""".stripMargin
    }
  )
}
