package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** User-facing operator syntax: `import graft.api._` gives DataFrames
  * the time-series / dedup / similarity verbs an ella user expects,
  * each expanding to the same Spark-first plans the `SparkEntry`
  * operators use (one shuffle on the series key; partial aggregation
  * wherever the op allows).
  */
object api {
  /** Hoisted udaf handle: `udaf(...)` materializes an encoder via an
    * anonymous class, which the AnyVal syntax classes cannot nest. */
  private lazy val vecSumUdaf =
    org.apache.spark.sql.functions.udaf(graft.functions.VectorSumAgg)

  implicit class TimeSeriesOps(private val df: DataFrame) extends AnyVal {

    /** Tumbling-window resample: `aggs` applied per (keys, bucket). */
    def resample(tsCol: String, every: String, keys: Seq[String], aggs: Seq[Column]): DataFrame = {
      require(aggs.nonEmpty, "resample requires at least one aggregate column, e.g. count(lit(1))")
      val groups = date_trunc(every, col(tsCol)).as("bucket") +: keys.map(col)
      df.groupBy(groups: _*).agg(aggs.head, aggs.tail: _*)
    }

    /** Latest row per key — partial-aggregatable max(struct) form.
      * `tieBreak` must make (tsCol, tieBreak*) a total order. */
    def latestByKey(keyCol: String, tsCol: String, tieBreak: String*): DataFrame = {
      val ordered = (tsCol +: tieBreak).map(col)
      val payload = df.columns.filterNot(c => c == keyCol).map(col)
      df.groupBy(col(keyCol))
        .agg(max(struct(ordered ++ payload.filterNot(c => ordered.exists(_ == c)): _*)).as("_latest"))
        .select(col(keyCol) +: df.columns.filterNot(_ == keyCol).toIndexedSeq.map(c => col(s"_latest.$c").as(c)): _*)
    }

    /** EWMA smoother per series key (the ts19 operator as a verb):
      * dyadic decay (alpha = 1/2) truncated at `depth` samples makes
      * the smoothed value an exact integer weighted sum of the last
      * `depth` cent-quantized values — engine-exact, no pow(), and
      * O(1) per-row state in a streaming form. Appends
      * `ewma_millicents`; one window shuffle on `keyCol`. */
    def ewma(keyCol: String, tsCol: String, valCol: String,
             depth: Int, tieBreak: String*): DataFrame = {
      require(depth >= 1 && depth <= 62, s"depth must be in [1,62], got $depth")
      val w = Window.partitionBy(col(keyCol))
        .orderBy((tsCol +: tieBreak).map(col): _*)
      val cents = round(col(valCol) * 100).cast("long")
      val lags = (0 until depth).map(j => lag(cents, j).over(w))
      val num = lags.zipWithIndex.map { case (x, j) =>
        coalesce(x * lit(1L << (depth - 1 - j)), lit(0L)) }.reduce(_ + _)
      val den = lags.zipWithIndex.map { case (x, j) =>
        when(x.isNotNull, lit(1L << (depth - 1 - j))).otherwise(lit(0L)) }.reduce(_ + _)
      df.withColumn("_n", num).withColumn("_d", den)
        .withColumn("ewma_millicents", expr("(_n * 1000) DIV _d"))
        .drop("_n", "_d")
    }

    /** As-of join: for each left row, the most recent right row (right
      * time <= left time) per key. Union + last-non-null over one
      * key-shuffle — no per-row range probe, skew-safe at scale.
      * Right rows must be unique per (key, time). */
    def asofJoin(right: DataFrame, leftKey: String, leftTime: String,
                 rightKey: String, rightTime: String, payload: String,
                 toleranceS: Long = 0L): DataFrame = {
      val l = df.withColumn("_is_l", lit(1))
        .select(col(leftKey).as("_k"), col(leftTime).as("_t"), col("_is_l"),
          struct(df.columns.toIndexedSeq.map(col): _*).as("_row"), lit(null).cast(right.schema(payload).dataType).as("_p"))
      val r = right.select(col(rightKey).cast(df.schema(leftKey).dataType).as("_k"),
        col(rightTime).as("_t"), lit(0).as("_is_l"),
        lit(null).cast(l.schema("_row").dataType).as("_row"), col(payload).as("_p"))
      val w = Window.partitionBy(col("_k")).orderBy(col("_t"), col("_is_l"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // match time and payload ride ONE struct so the tolerance gate
      // always judges the time of the row that supplied the payload —
      // a null-payload right row must not refresh the clock for an
      // older value it did not carry
      val joined = l.union(r)
        .withColumn("_match", last(
          when(col("_is_l") === 0 && col("_p").isNotNull,
            struct(col("_t").as("t"), col("_p").as("p"))),
          ignoreNulls = true).over(w))
      // toleranceS > 0 = the ts20 match-window rule (kdb wj): a right
      // row older than the window is NO match. A per-row comparison
      // after the as-of resolution — topology unchanged.
      val gated =
        if (toleranceS <= 0) joined.withColumn("_m", col("_match.p"))
        else joined.withColumn("_m", when(
          col("_match").isNotNull &&
            col("_t").cast("long") - col("_match.t").cast("long") <= toleranceS,
          col("_match.p")))
      gated.filter(col("_is_l") === 1)
        .select(col("_row.*"), col("_m").as(payload))
    }

    /** As-of join via graft's native operator (custom LogicalPlan +
      * Strategy + SparkPlan, [[graft.plans.AsofJoin]]): one exchange +
      * sort per side, then a streaming O(1)-state merge — no window
      * buffer, no row expansion. Requires non-null key/time. Call
      * `GraftExtensions.register(spark)` once per session (or install
      * via spark.sql.extensions). */
    def asofJoinNative(right: DataFrame, leftKey: String, leftTime: String,
                       rightKey: String, rightTime: String, payload: String*): DataFrame = {
      import org.apache.spark.sql.graft.bridge
      bridge.ofRows(df.sparkSession,
        graft.plans.AsofJoin.resolve(bridge.analyzed(df), bridge.analyzed(right),
          leftKey, leftTime, rightKey, rightTime, payload))
    }

    /** Sessionize: new session when the gap exceeds `gapSeconds`. */
    def sessionize(keyCol: String, tsCol: String, gapSeconds: Long): DataFrame = {
      val wo = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
      val ws = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val es = col(tsCol).cast("long")
      df.withColumn("_gap", es - lag(es, 1).over(wo))
        .withColumn("session_id",
          sum(when(col("_gap").isNull || col("_gap") > gapSeconds, 1L).otherwise(0L)).over(ws))
        .drop("_gap")
    }

    /** N-stage event funnel (the ts21 operator generalized): per
      * `userCol`, resolve `stages` in order — stage i matches the
      * FIRST `typeCol == stages(i)` row within `tolSeconds` of stage
      * i-1's match (stage 0 anchors at its own first occurrence).
      * Returns one row per user: t_1..t_n match times + `depth` (how
      * far the user got). One pre-filter to the stage types, ONE
      * shuffle on the user key; stage chaining is per-row array
      * compute — no window, no per-stage re-scan, no self-join. */
    def funnel(userCol: String, tsCol: String, typeCol: String,
               stages: Seq[String], tolSeconds: Long = 43200L): DataFrame =
      funnelWhere(userCol, tsCol, stages.map(col(typeCol) === _), tolSeconds)

    /** [[funnel]] with arbitrary per-stage PREDICATES (the ClickHouse
      * `windowFunnel(...)(cond1, cond2, ...)` form): stage i matches
      * the first row satisfying `stages(i)` within `tolSeconds` of
      * stage i-1's match. Same plan: one pre-filter to rows matching
      * ANY stage, one shuffle on the user key, per-row array
      * chaining. */
    def funnelWhere(userCol: String, tsCol: String,
                    stages: Seq[Column], tolSeconds: Long = 43200L): DataFrame = {
      require(stages.nonEmpty, "funnel needs at least one stage")
      val e = df.filter(stages.reduce(_ || _))
      val lists = stages.zipWithIndex.drop(1).map { case (st, i) =>
        collect_list(when(st, col(tsCol))).as(s"_l$i")
      }
      val base = e.groupBy(col(userCol))
        .agg(min(when(stages.head, col(tsCol))).as("t_1"),
          lists: _*)
      val chained = stages.indices.drop(1).foldLeft(base) { (acc, i) =>
        acc.withColumn(s"t_${i + 1}", array_min(filter(col(s"_l$i"),
          t => t >= col(s"t_$i") &&
            t <= col(s"t_$i") + expr(s"INTERVAL $tolSeconds SECONDS"))))
      }
      // Build innermost-first so the OUTERMOST branch tests the
      // deepest stage (chaining makes t_i non-null whenever t_{i+1}
      // is, so the shallower test must not shadow the deeper one).
      val depth = stages.indices.foldLeft(lit(0L)) { (els, i) =>
        when(col(s"t_${i + 1}").isNotNull, (i + 1).toLong).otherwise(els)
      }
      chained
        .select(col(userCol) +: stages.indices.map(i => col(s"t_${i + 1}")) :+
          depth.as("depth"): _*)
    }

    /** The per-stage conversion report over [[funnel]]'s per-user
      * frame: one row per stage with the users reaching it and
      * integer-milli conversion from the previous stage and from
      * stage 1. The report is ONE count-aggregation over the
      * user-sized funnel frame folded to a single row, then unpivoted
      * driver-free with `stack` — no second pass over the events. */
    def funnelReport(userCol: String, tsCol: String, typeCol: String,
                     stages: Seq[String], tolSeconds: Long = 43200L): DataFrame = {
      val f = funnel(userCol, tsCol, typeCol, stages, tolSeconds)
      val counts = f.agg(
        count(col("t_1")).as("n_1"),
        stages.indices.drop(1).map(i => count(col(s"t_${i + 1}")).as(s"n_${i + 1}")): _*)
      val stackArgs = stages.zipWithIndex.map { case (st, i) =>
        s"${i + 1}, '${st.replace("'", "''")}', n_${i + 1}"
      }.mkString(", ")
      val wOrd = Window.orderBy(col("stage"))
      counts
        .select(expr(s"stack(${stages.size}, $stackArgs) AS (stage, stage_name, n_users)"))
        .withColumn("_prev", lag(col("n_users"), 1).over(wOrd))
        .withColumn("_start", first(col("n_users")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("stage"), col("stage_name"), col("n_users"),
          when(col("_prev").isNull, lit(1000L))
            .when(col("_prev") === 0, lit(0L))
            .otherwise(expr("(n_users * 1000) DIV _prev")).as("conv_prev_milli"),
          when(col("_start") === 0, lit(0L))
            .otherwise(expr("(n_users * 1000) DIV _start")).as("conv_start_milli"))
    }

    /** Cohort retention matrix (the ts22 operator as a verb): users
      * cohorted by first-seen `granularity` bucket of `tsCol`; one row
      * per (cohort, bucket) with n_active / n_cohort and integer-milli
      * retention. ONE per-user aggregation carries both the cohort and
      * the active-bucket set (calendar-bounded per user), so the
      * corpus crosses the wire once; everything after is user- or
      * calendar-sized, and cohort sizes come from the rollup's own
      * offset-0 rows (one window over the tiny matrix). */
    def retentionMatrix(userCol: String, tsCol: String,
                        granularity: String = "day"): DataFrame = {
      val perUser = df.groupBy(col(userCol))
        .agg(date_trunc(granularity, min(col(tsCol))).as("cohort"),
          collect_set(date_trunc(granularity, col(tsCol))).as("_bs"))
      // n_cohort = the rollup's own offset-0 row (every user is
      // active in their first bucket), read with one window over the
      // calendar-sized matrix — no second pass over `df`
      val wc = Window.partitionBy(col("cohort"))
      perUser.select(col("cohort"), explode(col("_bs")).as("_b"))
        .groupBy(col("cohort"), col("_b"))
        .agg(count(lit(1)).as("n_active"))
        .withColumn("n_cohort",
          max(when(col("_b") === col("cohort"), col("n_active"))).over(wc))
        .select(col("cohort"), col("_b").as("bucket"),
          col("n_active"), col("n_cohort"),
          expr("(n_active * 1000) DIV n_cohort").as("retention_milli"))
    }

    /** DAU/WAU STICKINESS (the ts31 operator as a verb): per week,
      * active days, summed DAU, WAU, and avg-DAU/WAU in integer milli.
      * One corpus shuffle (the distinct to (key, day) activity facts);
      * everything after is activity- or calendar-sized. */
    def stickiness(userCol: String, tsCol: String): DataFrame =
      graft.operators.TimeSeries.stickinessFromActivity(
        df.select(col(userCol).as("user_id"),
          date_trunc("day", col(tsCol)).as("day")).distinct())

    /** Cohort LTV matrix (the ts32 operator as a verb): cumulative
      * `valueCents` revenue (rows where `isRevenue`) per first-seen
      * cohort by age-in-days, with per-user LTV in integer
      * milli-cents. Co-shuffled cohort join on the key; the cumulative
      * window runs over the calendar-sized (cohort x age) matrix. */
    def ltvMatrix(userCol: String, tsCol: String, isRevenue: Column,
                  valueCents: Column): DataFrame =
      graft.operators.TimeSeries.ltvMatrixOf(
        df, userCol, tsCol, isRevenue, valueCents)

    /** Inequality report (the ts33 operator as a verb): per `groupCol`
      * the Gini coefficient of `valueCol` across `memberCol` holders
      * plus the top-decile share, integer milli — the concentration
      * audit for any per-entity metric (events, revenue, tokens).
      * Global ranks are partition-parallel (GroupPrefix); the
      * long-domain bound is guarded in-plan. */
    def giniReport(groupCol: String, memberCol: String,
                   valueCol: String): DataFrame =
      graft.operators.TimeSeries.giniOf(
          df.select(col(groupCol).as("group"), col(memberCol).as("member"),
            col(valueCol).cast("long").as("x")))
        .withColumnRenamed("group", groupCol)

    /** Exact per-key distribution QUANTILES from a mergeable integer
      * histogram (the ts35 operator as a verb): `valueCentsCol`
      * quantizes the facts, ONE map-side-combined histogram shuffle
      * (value-DOMAIN-sized, never corpus rows), then each q (milli)
      * reports the smallest value whose cumulative count reaches
      * ceil(q·n/1000) — integers end to end. The histogram is
      * additive, so `TopicStream.histStream`/`currentQuantiles`
      * maintain the same report live. Returns (keyCol, q_milli,
      * cents, n). */
    def histQuantiles(keyCol: String, valueCentsCol: String,
                      qsMilli: Seq[Int] = Seq(250, 500, 750, 900, 990)): DataFrame =
      graft.operators.TimeSeries.histQuantilesOf(
          df.select(col(keyCol).as("key"), col(valueCentsCol).cast("long").as("cents"))
            .groupBy(col("key"), col("cents"))
            .agg(org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)).as("cnt")),
          qsMilli)
        .withColumnRenamed("key", keyCol)

    /** Daily PERCENTILE BANDS per series (the ts40 operator as a
      * verb — the p50/p90/p99-over-time SLO chart): rows bucket into
      * whole days of `tsCol`, values quantize via `valueCentsCol`,
      * and the exact per-(key, day) percentiles come from the
      * multi-key histogram kernel (never a delimiter-packed key).
      * Returns (keyCol, dn, q_milli, cents, n). */
    def sloBands(keyCol: String, tsCol: String, valueCentsCol: String,
                 qsMilli: Seq[Int] = Seq(500, 900, 990)): DataFrame =
      graft.operators.TimeSeries.histQuantilesOf(
          df.select(col(keyCol).as("key"),
              expr(s"CAST($tsCol AS LONG) DIV 86400").as("dn"),
              col(valueCentsCol).cast("long").as("cents"))
            .groupBy(col("key"), col("dn"), col("cents"))
            .agg(org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)).as("cnt")),
          qsMilli, keys = Seq("key", "dn"))
        .withColumnRenamed("key", keyCol)

    /** Lag-k AUTOCORRELATION of the daily count series (the ts36
      * operator as a verb): rows bucket into whole days of `tsCol`,
      * the per-day counts autocorrelate at lags 1..`maxLag` —
      * engine-exact longs via the mean-free identity, anti-correlated
      * (negative) lags legitimate, long-domain bounds guarded
      * in-plan. Returns (lag_k, n_pairs, autocorr_milli); everything
      * after the one corpus scan runs on the calendar-sized day
      * domain. */
    def autocorrReport(tsCol: String, maxLag: Int = 3): DataFrame = {
      require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
      graft.operators.TimeSeries.autocorrOf(
        df.groupBy(expr(s"CAST($tsCol AS LONG) DIV 86400").as("dn"))
          .agg(count(lit(1)).as("x")),
        maxLag)
    }

    /** Theil–Sen ROBUST TREND per series key (the ts39 operator as a
      * verb): `keyCol`'s daily counts from `tsCol` (epoch-day
      * buckets), the lower-median of all pairwise integer-milli
      * slopes, with day/event/pair counts and an up/down/flat
      * classification. Outlier days (the ones ts15 flags) barely move
      * it — the robust alternative to an OLS slope. One corpus scan
      * into the calendar-bounded (key × day) domain; everything
      * downstream runs on that frame. */
    def theilSen(keyCol: String, tsCol: String): DataFrame =
      graft.operators.TimeSeries.theilSenOf(
          df.groupBy(col(keyCol).as("event_type"),
              expr(s"CAST($tsCol AS LONG) DIV 86400").as("dn"))
            .agg(count(lit(1)).as("x")))
        .withColumnRenamed("event_type", keyCol)

    /** Dominant-cycle scan (the ts42 operator as a verb): per `keyCol`
      * score every candidate period 2..10 by the between-phase share
      * of the daily-count variance (exact-integer ANOVA fold over the
      * densified day spine) and flag the best period — the cadence
      * screen ts17/ts37's fixed calendar can't run. */
    def cycleScan(keyCol: String, tsCol: String): DataFrame =
      graft.operators.TimeSeries.cycleScanOf(
          df.groupBy(col(keyCol).as("event_type"),
              expr(s"CAST($tsCol AS LONG) DIV 86400").as("dn"))
            .agg(count(lit(1)).as("n")))
        .withColumnRenamed("event_type", keyCol)

    /** Conversion-lag SURVIVAL curve (the ts34 operator as a verb):
      * first `isStart` row per key, first `isConvert` row at-or-after
      * it, whole-day lag buckets with cumulative conversion and
      * survival in integer milli — the time-to-convert distribution
      * behind funnel timing summaries. */
    def conversionLag(userCol: String, tsCol: String, isStart: Column,
                      isConvert: Column): DataFrame =
      graft.operators.TimeSeries.conversionLagOf(
        df, userCol, tsCol, isStart, isConvert)

    /** Event TRANSITION MATRIX (the ts24 operator as a verb): counts
      * adjacent (from, to) pairs along each key's `tsCol`-ordered
      * timeline (optional `tieCol` total-orders ties), with
      * out-degree-normalized probability in integer milli. One corpus
      * shuffle (the lead window on the key); the pair rollup
      * partial-aggs into the |type|² domain and the normalization
      * window runs over that tiny matrix. */
    def transitionMatrix(userCol: String, tsCol: String, typeCol: String,
                         tieCol: Option[String] = None): DataFrame = {
      val ord = col(tsCol) +: tieCol.map(col).toSeq
      val w = Window.partitionBy(col(userCol)).orderBy(ord: _*)
      val m = df
        .withColumn("_to", lead(col(typeCol), 1).over(w))
        .filter(col("_to").isNotNull)
        .groupBy(col(typeCol).as("from_type"), col("_to").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val wf = Window.partitionBy(col("from_type"))
      m.withColumn("n_from", sum(col("n")).over(wf))
        .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
          expr("(n * 1000) DIV n_from").as("p_milli"))
    }

    /** A/B EXPERIMENT report (the ts26 operator as a verb): every key
      * is assigned one of `nArms` arms by a salted md5 hash — no
      * assignment table, no join; membership is a scan-speed
      * projection that is stable under reruns and corpus growth.
      * Exposure = the first `exposure` row per key; conversion = any
      * `conversion` row at-or-after it. Returns one row per arm
      * (n_users, n_conv, conv_milli, lift_vs_arm0_milli). One corpus
      * shuffle on the key, then an `nArms`-row rollup. */
    def abLift(userCol: String, tsCol: String, exposure: Column,
               conversion: Column, salt: String = "ab",
               nArms: Int = 2): DataFrame = {
      require(nArms >= 2, "abLift needs at least two arms")
      val arm = concat(lit("arm"),
        pmod(conv(substring(md5(concat(col(userCol).cast("string"),
          lit(":" + salt))), 1, 8), 16, 10).cast("long"), lit(nArms.toLong)))
      // "any conversion at-or-after exposure" ⟺ max(conversion ts) >=
      // first exposure — O(1) agg state per key (two scalars), never a
      // per-key timestamp array (ts26's r10 whale fix, applied here
      // too: a 100k-conversion key would otherwise build a 100k array
      // in every partial buffer).
      val perUser = df.groupBy(col(userCol))
        .agg(min(when(exposure, col(tsCol))).as("_fe"),
          max(when(conversion, col(tsCol))).as("_lc"))
        .filter(col("_fe").isNotNull)
        .select(col(userCol),
          coalesce(col("_lc") >= col("_fe"), lit(false)).as("_conv"),
          arm.as("arm"))
      val w0 = Window.orderBy(col("arm"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      perUser.groupBy(col("arm"))
        .agg(count(lit(1)).as("n_users"),
          sum(when(col("_conv"), 1L).otherwise(0L)).as("n_conv"))
        .withColumn("conv_milli", expr("(n_conv * 1000) DIV n_users"))
        .withColumn("lift_vs_arm0_milli",
          col("conv_milli") - first(col("conv_milli")).over(w0))
    }

    /** Marketing attribution (the ts30 operator as a verb): each
      * `isConversion` row credits the most recent preceding `isTouch`
      * row's `touchLabel` within `windowSeconds` (stale/absent ⇒
      * 'none') AND the key's earliest touch (first-touch unwindowed).
      * Returns the (last_touch, first_touch) credit matrix with
      * conversion counts, exact `valueCents` revenue, and milli
      * shares. One shuffle on `userCol` (two running IGNORE-NULLS
      * window values, O(1) per row); rollup in the (labels+1)²
      * domain. */
    def attribution(userCol: String, tsCol: String, tieCol: String,
                    touchLabel: Column, isTouch: Column,
                    isConversion: Column, valueCents: Column,
                    windowSeconds: Long = 7L * 86400L): DataFrame =
      graft.operators.TimeSeries.attributionReport(df, userCol, tsCol,
        tieCol, touchLabel, isTouch, isConversion, valueCents, windowSeconds)

    /** CUSUM changepoint per key (the ts28 operator as a verb): the
      * mean-centered cumulative sum of `valueCol` (quantized by
      * `scale` into exact integer units) peaks where the series'
      * level shifts; one row per key reports the max-|CUSUM| point
      * (position, time, tie id, signed n-scaled deviation) and the
      * before/after mean split in milli-units. (tsCol, tieCol) must
      * totally order each key's rows; tsCol must be a timestamp.
      * Scale shape: GroupPrefix two-phase running sums (safe for
      * low-cardinality keys where a plain window is the one-task
      * trap), map-side-combinable argmax; the long-domain bound is
      * guarded in-plan and fails loudly. */
    def changepoint(keyCol: String, tsCol: String, tieCol: String,
                    valueCol: String, scale: Int = 100): DataFrame =
      graft.operators.TimeSeries.cusumChangepoint(
        df.select(col(keyCol), col(tsCol), col(tieCol),
          round(col(valueCol) * scale).cast("long").as("vc")),
        keyCol, tsCol, tieCol)

    /** Association rules over per-key item baskets (the ts29 operator
      * as a verb — market-basket support/confidence/lift): for every
      * item pair (a < b), n_ab/n_a/n_b/n_users plus
      * support/conf(a→b)/conf(b→a)/lift in integer milli. One shuffle
      * on `userCol` builds the distinct-item baskets; everything
      * after is item-domain-sized (see ts29's single-explode shape).
      * Pair count grows |items|²/2 per basket — meant for bounded
      * item domains (event types, categories, tags), not free text. */
    def assocRules(userCol: String, itemCol: String): DataFrame =
      graft.operators.TimeSeries.assocReport(
        df.select(col(userCol).as("user_id"), col(itemCol).as("event_type")))

    /** Per-key z-score outliers over an integer-valued column (exact
      * moments commute -> deterministic at any parallelism; the ts15
      * operator generalized). Keeps rows with |z| >= `zMin`, adding a
      * `z` column. One shuffle (the stats agg); the stats table is
      * deliberately UNHINTED — it grows with key cardinality, so AQE
      * broadcasts it back only while it is actually small. */
    def anomalies(keyCol: String, valueCol: String, zMin: Double): DataFrame = {
      val v = col(valueCol).cast("long")
      val stats = df.groupBy(col(keyCol))
        .agg(count(lit(1)).as("_n"), sum(v).as("_s"), sum(v * v).as("_ss"))
      df.join(stats, keyCol)
        .withColumn("_mean", col("_s").cast("double") / col("_n"))
        .withColumn("_var",
          (col("_ss").cast("double") - col("_s").cast("double") * col("_mean")) / col("_n"))
        .filter(col("_var") > 0)
        .withColumn("z", (v.cast("double") - col("_mean")) / sqrt(col("_var")))
        .filter(abs(col("z")) >= zMin)
        .drop("_n", "_s", "_ss", "_mean", "_var")
    }
  }

  implicit class DedupOps(private val df: DataFrame) extends AnyVal {

    /** Exact dedup keep-first: one row per distinct `contentCol`. */
    def dedupExact(idCol: String, contentCol: String): DataFrame =
      df.groupBy(md5(col(contentCol)).as("_h"))
        .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dupes"))
        .drop("_h")

    /** Exact dedup keep-first returning the SURVIVING ROWS with all
      * their columns (the min-id winner per content hash) — the form
      * a pipeline chains from. Same two shuffles as [[dedupExact]]
      * plus the id re-join. */
    def dedupExactRows(idCol: String, contentCol: String): DataFrame =
      df.groupBy(md5(col(contentCol)).as("_h"))
        .agg(min(col(idCol)).as(idCol))
        .drop("_h")
        .join(df, Seq(idCol))

    /** Content-defined chunk dedup (the dd22 operator as a verb —
      * rsync/FastCDC rolling boundaries, the storage-dedup granularity
      * robust to insertions): per row of `idCol`/`textCol`, chunk
      * count, corpus-duplicated chunk count, duplicated chars, and
      * the dup fraction in milli. Boundary rule and digests are pure
      * per-row compute; one chunk-digest-domain shuffle + a keyed
      * join back. */
    def cdcDedup(idCol: String, textCol: String): DataFrame =
      graft.operators.Dedup.cdcDedupOf(
          df.select(col(idCol).as("doc_id"), col(textCol).as("text")))
        .withColumnRenamed("doc_id", idCol)

    /** Full-batch integer PERCEPTRON training (the tx27 loop as a
      * verb — the third in-engine training family next to kmeansTrain
      * and bpeTrain): `featureCols` must be exact integer columns
      * (include a constant bias column), `yCol` ∈ {+1, −1}. Each
      * iteration is ONE partial-agg'd scan of the (localCheckpoint'ed)
      * feature frame producing the misclassified-sum gradient — a
      * bounded driver-side model read, the kmeansTrain discipline —
      * and the NORMALIZED batch update w += (Σ y·x)·1000 DIV n_mis
      * (milli-grain weights; sign-symmetric integer division) is an
      * order-free integer computation, so training is bit-reproducible
      * at any parallelism. The normalization is what makes batch
      * training provable: averaging bounds the per-round step by the
      * feature radius, so the online perceptron mistake bound applies
      * per round — the raw summed update's step grows with the
      * misclassified count and measurably oscillates. Converges to
      * zero errors on separable data; stops early there unless
      * `stopAtZero = false` (fixed-iteration replay mode). */
    def perceptronTrain(featureCols: Seq[String], yCol: String,
                        iters: Int = 20,
                        stopAtZero: Boolean = true): PerceptronModel = {
      val n = featureCols.size
      val f = df.select((featureCols.map(c => col(c).cast("long")) :+
        col(yCol).cast("long").as("_y")): _*).localCheckpoint(false)
      val w = Array.fill(n)(0L)
      val errs = scala.collection.mutable.ArrayBuffer.empty[Long]
      var it = 0
      while (it < iters && !(stopAtZero && errs.lastOption.contains(0L))) {
        val margin = featureCols.zipWithIndex
          .map { case (c, i) => col(c).cast("long") * w(i) }
          .reduce(_ + _)
        val g = f.filter(col("_y") * margin <= 0)
          .agg(count(lit(1)).as("_n"),
            featureCols.zipWithIndex.map { case (c, i) =>
              sum(col("_y") * col(c).cast("long")).as(s"_d$i") }: _*)
          .collect()(0)
        errs += g.getLong(0)
        val k = g.getLong(0)
        for (i <- 0 until n) {
          val d = if (g.isNullAt(i + 1)) 0L else g.getLong(i + 1)
          if (k > 0L)
            w(i) += (if (d >= 0) d * 1000L / k else -(-d * 1000L / k))
        }
        it += 1
      }
      PerceptronModel(w.toSeq, errs.toSeq)
    }

    /** Score rows with a [[PerceptronModel]]: adds `margin` (the
      * integer w·x) and the boolean `pred` (margin > 0). Scan-speed
      * projection — the tx17 deployment shape with learned weights. */
    def perceptronScore(featureCols: Seq[String],
                        model: PerceptronModel): DataFrame = {
      val margin = featureCols.zip(model.weights)
        .map { case (c, wi) => col(c).cast("long") * wi }.reduce(_ + _)
      df.withColumn("margin", margin).withColumn("pred", col("margin") > 0)
    }

    /** Fuzzy entity matching (the dd17 operator as a verb — the
      * record-linkage string-similarity join): name pairs within
      * `maxDist` edit distance, candidates blocked on shared distinct
      * character q-grams (>= `minSharedGrams` — the count-filter
      * blocker, complete for edit distance k while (max_len − q + 1)
      * − k·q >= minSharedGrams, a lossy recall knob beyond). The gram
      * width is selected FROM THE REGISTRY SIZE by default — the
      * simhashPairs saturation contract applied to the blocker, so a
      * user cannot pick a saturating width silently: gramWidth=0
      * (default) counts the distinct-name domain once (pay-once, like
      * an index build) and applies
      * [[graft.operators.Dedup.fuzzyGramWidthFor]] — < 10^5 names →
      * 3-grams; < 10^7 → 4-grams (the measured knee fix: 3-gram
      * blocks over an alphabet-bounded key domain go quadratic past
      * ~10^5 names); < 10^9 → 5-grams; beyond refuses loudly.
      * Explicit gramWidth ∈ {3,4,5} overrides. Dedupe to the
      * DISTINCT name domain first — grams explode per name, the block
      * join is gram-keyed, Levenshtein runs on candidates only, never
      * an all-pairs product. Returns (a, b, lev, shared_grams). */
    def fuzzyPairs(nameCol: String, maxDist: Int = 2,
                   minSharedGrams: Long = 2L,
                   maxGramDf: Long = Long.MaxValue,
                   gramWidth: Int = 0): DataFrame = {
      require(gramWidth == 0 || (gramWidth >= 3 && gramWidth <= 5),
        s"gramWidth must be 0 (auto) or in 3..5, got $gramWidth")
      val names = df.select(col(nameCol).as("name")).distinct()
        .localCheckpoint(false)
      val n = names.count()
      val q = if (gramWidth != 0) gramWidth
              else graft.operators.Dedup.fuzzyGramWidthFor(n)
      // SATURATION GUARD (the loud-refusal half of the width
      // contract): the width ladder assumes a registry whose gram
      // domain GROWS with it (natural language — Heaps' law); a
      // vocabulary-starved registry (few distinct words recombined,
      // e.g. generated part names) saturates EVERY width — measured:
      // 58k names from a 16-word vocabulary carry a 3.7-7.9e9
      // candidate volume at q=3..5 against a gram domain that tops
      // out at 582 keys. One gram-domain-sized agg bounds the block
      // join's exact output before running it; past 64 candidates per
      // name (floor 10^6 — tiny registries may be harmlessly dense)
      // the blocker would be quadratic, so refuse with the numbers.
      // Setting maxGramDf is the explicit opt-out: it bounds the join
      // by construction and accepts the documented stop-gram recall
      // loss, so the guard does not re-estimate the capped plan.
      if (maxGramDf == Long.MaxValue) {
        val cand = graft.operators.Dedup.fuzzyCandidateBound(names, q)
        val bound = math.max(1000000L, 64L * n)
        if (cand > bound) throw new IllegalArgumentException(
          s"fuzzyPairs: the q=$q gram blocker saturates on this registry — " +
            s"$cand candidate pairs for $n names (> $bound = max(10^6, 64/name)). " +
            "No gram width fixes a vocabulary-starved key domain; set maxGramDf " +
            "to accept stop-gram recall loss, pre-block on a domain key, or shard")
      }
      graft.operators.Dedup.fuzzyPairs(names, maxDist,
        minSharedGrams, maxGramDf, q)
    }

    /** Incremental exact dedup against a FINGERPRINT frame (the dd12
      * flow as a verb): flags rows whose content hash already exists
      * in `fingerprints` (a 1-column `chash` frame — typically a
      * fingerprint topic read back from a TopicStore). The increment
      * joins 16-byte hashes, never old text; cost scales with the
      * arrival, not the corpus. Returns the input plus `chash` and
      * `is_known`. Append the NEW rows' `chash` column back to the
      * fingerprint topic to absorb the batch. */
    def dedupAgainst(idCol: String, contentCol: String,
                     fingerprints: DataFrame): DataFrame = {
      require(fingerprints.columns.contains("chash"),
        s"fingerprints needs a 'chash' column; found ${fingerprints.columns.mkString(", ")}")
      df.withColumn("chash", md5(col(contentCol)))
        .join(fingerprints.select(col("chash")).distinct()
          .withColumn("_known", lit(true)), Seq("chash"), "left")
        .withColumn("is_known", coalesce(col("_known"), lit(false)))
        .drop("_known")
    }

    /** [[dedupAgainst]] with the dd14 Bloom prefilter — the form that
      * survives a fingerprint set too large to shuffle per increment.
      * The caller's frame (the small arriving batch) folds into a
      * broadcast Bloom filter, and the FINGERPRINT side — the
      * corpus-scale side — is pruned by `might_contain` at scan
      * speed BEFORE its distinct+join, so only survivors (true
      * matches + ~0.05% false positives, resolved by the exact join)
      * ever reach an exchange. Output is identical to
      * [[dedupAgainst]]. `expectedRows` sizes the filter to the
      * increment (16 bits/item; real callers know it from
      * catalog/footer stats — the dd05/dd14 pattern). */
    def dedupAgainstBloom(idCol: String, contentCol: String,
                          fingerprints: DataFrame, expectedRows: Long): DataFrame = {
      require(fingerprints.columns.contains("chash"),
        s"fingerprints needs a 'chash' column; found ${fingerprints.columns.mkString(", ")}")
      import graft.functions.BloomFunctions._
      val hashed = df.withColumn("chash", md5(col(contentCol)))
      val items = expectedRows.max(1L) + 64
      val bloom = hashed.agg(bloomAgg(col("chash"), items, items * 16).as("bf"))
      val survivors = fingerprints.select(col("chash"))
        .filter(mightContain(col("chash"), bloom))
        .distinct()
      hashed.join(survivors.withColumn("_known", lit(true)), Seq("chash"), "left")
        .withColumn("is_known", coalesce(col("_known"), lit(false)))
        .drop("_known")
    }

    /** Bounded-memory frequent values of a column via the Misra-Gries
      * summary (the tx15 machinery over any column): returns the
      * ≤k-entry (value, residual count) map as a one-row frame. Wire
      * cost is O(k) per partition — never the value domain. Residuals
      * undercount by at most n/(k+1); values with frequency above
      * that threshold are guaranteed present. */
    def heavyHitters(valueCol: String, k: Int = 64): DataFrame = {
      val mg = graft.functions.MisraGriesAgg.udafFor(k)
      df.agg(mg(col(valueCol).cast("string")).as("hitters"))
    }

    /** MinHash+LSH near-duplicate candidate pairs (a < b) with
      * signature agreement count — bucket-bounded, never all-pairs
      * (the dd02 operator over arbitrary id/text columns). */
    def nearDupPairs(idCol: String, textCol: String): DataFrame =
      graft.operators.Dedup.candidatePairsPublic(
        df.select(col(idCol).as("doc_id"), col(textCol).as("text")))

    /** SimHash near-dup pairs (a < b, hamming<=3) at a signature
      * `width` selected FROM THE CORPUS SIZE by default — the one
      * entry point to the dd03/dd19/dd20 tier ladder, so a user
      * cannot pick a saturating tier silently. width=0 (default)
      * counts the frame once (pay-once, like an index build) and
      * applies [[graft.operators.Dedup.simhashWidthFor]]: < 10^6
      * docs → 64-bit 4×16 bands (2^16-value band keys stay sparse);
      * < 10^9 → 128-bit 4×32 bands (the measured dd19 saturation
      * knee's fix); ≥ 10^9 refuses loudly (no 4-band tier fits —
      * widen the banding or shard). Explicit width ∈ {16, 64, 128}
      * overrides (16 = dd03's single-signature pedagogical tier,
      * never auto-selected). Banded widths carry the pigeonhole
      * hamming<=3 completeness guarantee; wider = stricter
      * near-identity AND bigger key domain. Returns (a, b,
      * hamming). */
    def simhashPairs(idCol: String, textCol: String, width: Int = 0): DataFrame = {
      val w = if (width != 0) width else graft.operators.Dedup.simhashWidthFor(df.count())
      graft.operators.Dedup.simhashPairsOf(
        df.select(col(idCol).as("doc_id"), col(textCol).as("text")), w)
    }

    /** Winnowing-fingerprint duplicate pairs (the dd16 operator —
      * Schleimer et al. 2003, MOSS): pairs of docs sharing >=
      * `minShared` selected fingerprints, with the positional
      * GUARANTEE MinHash lacks — any shared token run of length >=
      * w+k-1 always produces a shared fingerprint. Fingerprint
      * selection is per-row array compute at scan speed; the pair
      * stage is a fingerprint-group explode, never a corpus
      * self-join. */
    def winnowPairs(idCol: String, textCol: String, k: Int = 3,
                    w: Int = 4, minShared: Long = 2L): DataFrame =
      graft.operators.Dedup.winnowPairs(
        df.select(col(idCol).as("doc_id"), col(textCol).as("text")),
        k, w, minShared)

    /** Shingle-containment near-dup pairs (the dd07 operator):
      * catches superset duplicates (quotes, boilerplate wrappers)
      * that Jaccard structurally misses. LSH-candidate-bounded. */
    def containmentPairs(idCol: String, textCol: String, minMilli: Long = 500L): DataFrame =
      graft.operators.Dedup.containmentPairs(
        df.select(col(idCol).as("doc_id"), col(textCol).as("text")), minMilli)

    /** Duplicate clusters: connected components over the LSH pair
      * graph — returns (`idCol`, cluster_id) where cluster_id is the
      * minimum id in the component; keep one row per cluster_id
      * downstream to dedup the corpus. */
    def dupClusters(idCol: String, textCol: String): DataFrame = {
      val renamed = df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      val pairs = graft.operators.Dedup.candidateEdgesPublic(renamed)
      graft.operators.Dedup
        .connectedComponents(renamed.select(col("doc_id").as("node")), pairs)
        .select(col("node").as(idCol), col("label").as("cluster_id"))
    }

    /** Canonical selection (the dd15 operator as a verb): cluster
      * near-dups via the LSH pair graph, then keep the highest-
      * QUALITY member of each cluster (tx17's frozen linear model;
      * ties break to the lowest id). Returns one row per doc with
      * cluster_id / score / keeper_id / keep / n_members — filter on
      * `keep` for the canonical corpus. Keeper argmax is a map-side-
      * combinable max(struct), never a window over the corpus. */
    def dedupKeepBest(idCol: String, textCol: String): DataFrame = {
      val renamed = df.select(col(idCol).as("doc_id"), col(textCol).as("text"),
        lit("").as("source"))
      val pairs = graft.operators.Dedup.candidateEdgesPublic(renamed)
      val clusters = graft.operators.Dedup
        .connectedComponents(renamed.select(col("doc_id").as("node")), pairs)
        .select(col("node").as("doc_id"), col("label").as("cluster_id"))
      val scored = graft.operators.Curation.qualityScored(renamed)
        .select(col("doc_id"), col("score"))
      val j = clusters.join(scored, "doc_id")
      val k = j.groupBy(col("cluster_id"))
        .agg(max(struct(col("score"), (-col("doc_id")).as("neg_id"))).as("m"),
          count(lit(1)).as("n_members"))
        .select(col("cluster_id"), (-col("m.neg_id")).as("keeper_id"), col("n_members"))
      j.join(k, "cluster_id")
        .select(col("doc_id").as(idCol), col("cluster_id"), col("score"),
          col("keeper_id"), (col("doc_id") === col("keeper_id")).as("keep"),
          col("n_members"))
    }

    /** SOFT dedup weights (the dd18 operator as a verb): every doc
      * keeps a row, weighted 1000 DIV cluster_size in integer milli —
      * down-weight the training loss instead of dropping copies, so
      * corpus statistics survive while the memorization pressure of
      * N clones does not. Unique docs read exactly 1000. */
    def softDedupWeights(idCol: String, textCol: String): DataFrame =
      graft.operators.Dedup.softWeights(
          df.select(col(idCol).as("doc_id"), col(textCol).as("text")))
        .withColumnRenamed("doc_id", idCol)

    /** Duplicate clusters via large-star/small-star contraction (the
      * dd09 fixpoint): same result as [[dupClusters]], O(log^2 n)
      * rounds on ANY graph topology — use when components may chain
      * arbitrarily deep (boilerplate wrappers-of-wrappers). */
    def dupClustersStar(idCol: String, textCol: String): DataFrame = {
      val renamed = df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      val pairs = graft.operators.Dedup.candidateEdgesPublic(renamed)
      graft.operators.Dedup
        .connectedComponentsStar(renamed.select(col("doc_id").as("node")), pairs)
        .select(col("node").as(idCol), col("label").as("cluster_id"))
    }

    /** Cross-source shingle-overlap matrix (the dd10/dd13 operators):
      * per source pair, shared distinct shingles + Jaccard/containment
      * milli — the corpus-overlap audit run before mixing sources.
      * The FORM is selected from the corpus size by default (the
      * simhashPairs routing contract, so the exact matrix's
      * corpus-sized distinct-shingle rollup cannot be picked
      * silently at scale): mode="auto" counts the frame once
      * (pay-once) and applies
      * [[graft.operators.Dedup.sourceOverlapModeFor]] — < 10^6 docs →
      * the exact matrix (dd10; true counts, 64x curve 3.1x); >= 10^6
      * → theta sketches (dd13's production path; one shingle scan
      * into S few-KB buffers, ~1x at any corpus size, estimates at
      * lgK=14 RSE ~0.8% and exact below 2^14 distinct shingles per
      * source). Explicit mode="exact"/"sketch" overrides; both return
      * the same schema. */
    def sourceOverlap(sourceCol: String, textCol: String,
                      mode: String = "auto"): DataFrame = {
      val renamed = df.select(col(sourceCol).as("source"), col(textCol).as("text"))
      val m = mode match {
        case "auto" => graft.operators.Dedup.sourceOverlapModeFor(df.count())
        case "exact" | "sketch" => mode
        case other => throw new IllegalArgumentException(
          s"sourceOverlap mode must be auto|exact|sketch, got $other")
      }
      if (m == "exact") graft.operators.Dedup.sourceOverlap(renamed)
      else graft.operators.Dedup.sourceOverlapSketch(renamed)
    }
  }

  implicit class SamplingOps(private val df: DataFrame) extends AnyVal {

    /** Deterministic hash sample: keep ~`fraction` of rows, keyed on
      * `idCol` and `seed`. A pure filter (zero shuffle), reproducible
      * across reruns, and each row's fate is independent of every
      * other row — so the sample is stable under corpus growth. */
    def hashSample(idCol: String, fraction: Double, seed: String = "graft"): DataFrame = {
      require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1], got $fraction")
      if (fraction >= 1.0) df
      else {
        // first 4 hex chars = 16 bits of the digest → resolution 1/65536
        val bound = f"${math.round(fraction * 65536).min(65535L)}%04x"
        df.filter(substring(md5(concat(col(idCol).cast("string"), lit(":" + seed))), 1, 4) < bound)
      }
    }

    /** Deterministic per-group reservoir: exactly `k` rows per value
      * of `groupCol`, chosen by hash order (a seeded shuffle both
      * reruns and engines reproduce). Scale-safe as written:
      * Catalyst's InferWindowGroupLimit plans a partial
      * WindowGroupLimit before the shuffle, so each input partition
      * ships only its local top-k per group. */
    def reservoirPerGroup(groupCol: String, idCol: String, k: Int,
                          seed: String = "graft"): DataFrame = {
      val w = Window.partitionBy(col(groupCol))
        .orderBy(md5(concat(col(idCol).cast("string"), lit(":" + seed))), col(idCol))
      df.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k).drop("_rn")
    }

    /** Token-budget sequence packing (the sp03 operator as a verb):
      * adds `pack_offset` (exclusive token prefix within the group, in
      * deterministic hash order) and `pack_id` = offset DIV
      * `packTokens`. Prefix sums come from the two-phase partition-
      * parallel [[graft.functions.GroupPrefix]], so each task's input
      * is bounded by partition size, never group size. */
    def packSequences(groupCol: String, idCol: String, tokCol: String,
                      packTokens: Long, seed: String = "graft"): DataFrame = {
      require(packTokens > 0, s"packTokens must be positive, got $packTokens")
      graft.functions.GroupPrefix.groupPrefix(
          df.withColumn("_h", md5(concat(col(idCol).cast("string"), lit(":" + seed)))),
          groupCol, Seq("_h", idCol), Some(tokCol),
          rnName = "_rn", cumName = "pack_offset")
        .withColumn("pack_id", expr(s"pack_offset DIV $packTokens"))
        .drop("_rn", "_h")
    }

    /** Curriculum pacing manifest (the sp10 operator as a verb —
      * Bengio-style ordering): `difficultyCol` bands into `nPhases`
      * buckets of `bandWidth`, phase p draws the widening pool
      * band ≤ p in a deterministic per-phase reshuffle. Returns
      * (phase, pos, idCol, band); within-phase ranks are GroupPrefix's
      * partition-parallel form, never one task per phase. */
    def curriculum(idCol: String, difficultyCol: String,
                   bandWidth: Int, nPhases: Int = 4): DataFrame = {
      require(bandWidth > 0 && nPhases > 0,
        s"bandWidth/nPhases must be positive, got $bandWidth/$nPhases")
      graft.operators.Pipeline.curriculumOf(
        df, idCol, difficultyCol, bandWidth, nPhases)
    }

    /** Token-budget mixture (the px02 operator as a verb): keep rows
      * of each group, in deterministic hash order, until the group's
      * exclusive token prefix crosses `budgetPerGroup` (a per-row
      * Column, e.g. a CASE over the group). Same two-phase
      * partition-parallel prefix machinery as `packSequences`. */
    def mixtureBudget(groupCol: String, idCol: String, tokCol: String,
                      budgetPerGroup: Column, seed: String = "graft"): DataFrame =
      graft.functions.GroupPrefix.groupPrefix(
          df.withColumn("_h", md5(concat(col(idCol).cast("string"), lit(":" + seed)))),
          groupCol, Seq("_h", idCol), Some(tokCol),
          rnName = "_rn", cumName = "_cum0")
        .filter(col("_cum0") < budgetPerGroup)
        .drop("_rn", "_h", "_cum0")
  }

  implicit class TextCurationOps(private val df: DataFrame) extends AnyVal {

    /** CCNet quality tiers (the tx32 operator as a verb — Wenzek et
      * al. 2020's head/middle/tail split): docs tier by GLOBAL
      * terciles of the corpus bigram-LM score, reported per
      * (`sourceCol`, tier) with doc/token counts, mean score, and the
      * tier's token share of its source. Value-based histogram
      * cutoffs (engine-exact, deterministic under ties), never a
      * global ntile. Docs shorter than 2 characters carry no bigrams
      * and drop, as in the operator. */
    def pplTiers(idCol: String, textCol: String, sourceCol: String): DataFrame =
      graft.operators.TextOps.pplTiersOf(
          df.select(col(idCol).as("doc_id"), col(textCol).as("text"),
            col(sourceCol).as("source")))
        .withColumnRenamed("source", sourceCol)

    /** Gopher-style RULE GATE with funnel attribution (the tx33
      * operator as a verb — Rae et al. 2021's filter-ablation table):
      * the ordered five-rule document battery (word-count bounds,
      * mean-word-length bounds, stopword evidence, top-word
      * dominance, type-token diversity) reporting each rule's
      * sequential kill (the funnel stage loss) AND marginal kill (the
      * ablation number), plus the survivor row. One corpus scan, one
      * map-side-combinable aggregate, a 6-row output. */
    def gopherGate(idCol: String, textCol: String): DataFrame =
      graft.operators.Curation.gopherGateOf(
        df.select(col(idCol).as("doc_id"), col(textCol).as("text")))

    /** Code-vs-prose routing gate (the tx39 operator as a verb):
      * bracket/operator symbol and camelCase/snake_case identifier
      * rates folded to an integer-milli score with the route flag at
      * ≥ 40 — run FIRST on a mixed corpus so source files fork off
      * before prose rules (word length, stopword rate) kill them.
      * Pure per-row regex folds at scan speed. */
    def codeDetect(idCol: String, textCol: String): DataFrame =
      graft.operators.TextOps.codeDetectOf(
          df.select(col(idCol).as("doc_id"), col(textCol).as("text")))
        .withColumnRenamed("doc_id", idCol)

    /** Function-word register fingerprint per source (the tx37
      * operator as a verb — Mosteller & Wallace 1964): per (source,
      * lexicon word) the count, source rate ppm, corpus rate ppm,
      * and deviation — the register audit that catches template spam
      * and mislabeled genres. One corpus shuffle into the |S| domain;
      * everything downstream runs on S×25 rows. */
    def stopwordProfile(sourceCol: String, textCol: String): DataFrame =
      graft.operators.TextOps.stopwordProfileOf(
          df.select(col(sourceCol).as("source"), col(textCol).as("text")))
        .withColumnRenamed("source", sourceCol)

    /** Capped-temperature mixture weights (the sp15 operator as a
      * verb): per `sourceCol`, sqrt-temperature shares of the `tokCol`
      * token mass, clamped to [floorMilli, capMilli] with the clamp's
      * residual redistributed over the unclamped sources in ONE
      * documented round (no source starves, no source dominates — the
      * weight table a production mix ships). Returns (source, n_toks,
      * raw_milli, clamped_milli, clamped, final_milli); conservation
      * |Σ final − 1000| ≤ |S| is spec-pinned. Everything after the
      * corpus rollup runs on the |S|-row frame. */
    def mixtureCaps(sourceCol: String, tokCol: String,
                    capMilli: Long = 150L, floorMilli: Long = 25L): DataFrame =
      graft.operators.Curation.mixtureCapsOf(
        df.groupBy(col(sourceCol).as("source"))
          .agg(sum(col(tokCol).cast("long")).as("n_toks")),
        capMilli, floorMilli)

    /** Data-constrained epoch schedule (the sp13 operator as a verb —
      * Muennighoff et al. 2023): per `groupCol`, the token target is
      * its `weight` share of `budgetTokens`, the epoch count is
      * target/size capped at `maxEpochsMilli` (integer milli-epochs),
      * and every row carries the schedule-wide `shortfall_milli` the
      * caps strand. `weight` is any per-row expression constant
      * within a group (e.g. `when(col("source") === "src0", 5L)
      * .otherwise(1L)`); one corpus scan, |S|-row arithmetic after. */
    def epochBudget(groupCol: String, tokCol: String, budgetTokens: Long,
                    maxEpochsMilli: Long = 4000L,
                    weight: Column = lit(1L)): DataFrame = {
      require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
      require(maxEpochsMilli > 0, s"maxEpochsMilli must be positive, got $maxEpochsMilli")
      val tok = df.groupBy(col(groupCol))
        .agg(sum(col(tokCol).cast("long")).as("n_tokens"),
          max(weight.cast("long")).as("weight"))
        .localCheckpoint(false)
      val tot = tok.agg(sum(col("weight")).as("sumw"))
      val t = tok.crossJoin(broadcast(tot))
        .withColumn("target_tokens", expr(s"($budgetTokens * weight) DIV sumw"))
        .withColumn("epochs_milli",
          least(lit(maxEpochsMilli), expr("(target_tokens * 1000) DIV n_tokens")))
        .withColumn("alloc_tokens", expr("(n_tokens * epochs_milli) DIV 1000"))
      val short = t.agg(sum(col("alloc_tokens")).as("alloc_tot"))
      t.crossJoin(broadcast(short))
        .select(col(groupCol), col("n_tokens"), col("weight"),
          col("target_tokens"), col("epochs_milli"), col("alloc_tokens"),
          (col("epochs_milli") === maxEpochsMilli).as("capped"),
          expr(s"(($budgetTokens - alloc_tot) * 1000) DIV $budgetTokens")
            .as("shortfall_milli"))
    }

    /** Temperature-weighted mixture sampling (the sp04 operator as a
      * verb, alpha = 0.5): per-group doc budgets proportional to
      * sqrt(token share), rows kept in deterministic hash order up to
      * the budget. sqrt of an integer is correctly-rounded IEEE, so
      * the selection is rerun-stable; the budget table broadcasts
      * back.
      *
      * Every per-group budget is bounded by `totalDocs` (they sum to
      * it), so a literal `rn <= totalDocs` cap subsumes the
      * rank-vs-column filter. For small budgets that literal lets
      * Catalyst's InferWindowGroupLimit plan a map-side PARTIAL
      * WindowGroupLimit — each group's merge task sees at most
      * `totalDocs` rows per upstream partition, and the heavier
      * two-phase machinery is skipped. Past ~1000 docs the cap stops
      * bounding the merge task (k x partitions rows approaches a
      * whole group), so large budgets keep the partition-parallel
      * [[graft.functions.GroupPrefix]] positions. */
    def temperatureSample(groupCol: String, idCol: String, tokCol: String,
                          totalDocs: Long, seed: String = "graft"): DataFrame = {
      require(totalDocs > 0, s"totalDocs must be positive, got $totalDocs")
      val wgt = df.groupBy(col(groupCol))
        .agg(sum(col(tokCol).cast("long")).as("_nt"))
        .withColumn("_w", floor(sqrt(col("_nt").cast("double") * 1000000d)).cast("long"))
      val tot = wgt.agg(sum(col("_w")).as("_tw"))
      val budgets = wgt.crossJoin(broadcast(tot))
        .withColumn("_budget", expr(s"(_w * $totalDocs) DIV _tw"))
        .select(col(groupCol), col("_budget"))
      val hashed = df.withColumn("_h",
        md5(concat(col(idCol).cast("string"), lit(":" + seed))))
      val ranked =
        if (totalDocs <= 1000L) {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col(groupCol)).orderBy(col("_h"), col(idCol))
          hashed.withColumn("_rn", row_number().over(w))
            .filter(col("_rn") <= lit(totalDocs))
        } else graft.functions.GroupPrefix.groupPrefix(
          hashed, groupCol, Seq("_h", idCol), rnName = "_rn")
      ranked
        .join(broadcast(budgets), groupCol)
        .filter(col("_rn") <= col("_budget"))
        .drop("_rn", "_h", "_budget")
    }

    /** Benchmark decontamination (the tx11 operator as a verb): per
      * row, the count of word `n`-grams shared with `bench`'s text
      * column, plus a `contaminated` flag. The benchmark gram set is
      * broadcast (eval sets are small); the corpus never shuffles on
      * gram. */
    def decontaminate(idCol: String, textCol: String, bench: DataFrame,
                      benchTextCol: String, n: Int = 5): DataFrame = {
      require(n >= 1, s"n-gram size must be >= 1, got $n")
      // gram lambdas read a MATERIALIZED token array (dd16 inlining
      // hazard, SCALE.md r8: inlined, each gram would re-split the
      // text — O(n²/n-gram) per doc)
      def gramsOf(ws: Column): Column =
        when(size(ws) >= n,
          transform(sequence(lit(1), size(ws) - (n - 1)),
            i => array_join(slice(ws, i, lit(n)), " ")))
          .otherwise(array().cast("array<string>"))
      val benchGrams = bench
        .select(split(lower(col(benchTextCol)), " ").as("_ws"))
        .select(explode(gramsOf(col("_ws"))).as("_gram")).distinct()
        .withColumn("_hit", lit(1L))
      val overlap = df
        .select(col(idCol), split(lower(col(textCol)), " ").as("_ws"))
        .select(col(idCol), explode(gramsOf(col("_ws"))).as("_gram"))
        .dropDuplicates(idCol, "_gram")
        .join(broadcast(benchGrams), Seq("_gram"), "left")
        .groupBy(col(idCol))
        .agg(sum(coalesce(col("_hit"), lit(0L))).as("n_overlap"))
      df.join(overlap, Seq(idCol), "left")
        .withColumn("n_overlap", coalesce(col("n_overlap"), lit(0L)))
        .withColumn("contaminated", col("n_overlap") > 0)
    }

    /** Gopher-style repetition stats (the tx10 operator as a verb):
      * adds exact-milli modal-word and duplicate-bigram fractions.
      * One hash shuffle on `idCol`. */
    def repetitionStats(idCol: String, textCol: String): DataFrame = {
      val words = split(lower(col(textCol)), " ")
      val wc = df.select(col(idCol), explode(words).as("_w"))
        .groupBy(col(idCol), col("_w")).agg(count(lit(1)).as("_c"))
      val top = wc.groupBy(col(idCol))
        .agg(sum(col("_c")).as("_n"), max(col("_c")).as("_top"))
      // token array materialized first: inlined, the bigram lambda
      // would re-split the text per element (dd16 hazard, SCALE.md r8)
      val bg = df.select(col(idCol), words.as("_ws"))
        .select(col(idCol),
          when(size(col("_ws")) >= 2,
            transform(sequence(lit(1), size(col("_ws")) - 1),
              i => array_join(slice(col("_ws"), i, lit(2)), " ")))
            .otherwise(array().cast("array<string>")).as("_bgs"))
        .select(col(idCol), size(col("_bgs")).cast("long").as("_nb"),
          size(array_distinct(col("_bgs"))).cast("long").as("_db"))
      df.join(top, idCol).join(bg, idCol)
        .withColumn("top_word_milli", expr("(_top * 1000) DIV _n"))
        .withColumn("dup_bigram_milli",
          expr("CASE WHEN _nb = 0 THEN 0 ELSE ((_nb - _db) * 1000) DIV _nb END"))
        .drop("_n", "_top", "_nb", "_db")
    }

    /** Language ID (the tx01 operator as a verb): stopword-lexicon
      * hit scores per language (default = the built-in 5-language
      * lexicons), max score wins with alphabetical tiebreak. Adds
      * `predicted` plus one `s_<lang>` score column per language.
      * Pure per-row compute — scan speed at any scale. */
    def langId(textCol: String,
               lexicons: Map[String, Seq[String]] = graft.operators.TextOps.langLex): DataFrame = {
      import graft.functions.TextFunctions.{tokens, lexiconHits}
      require(lexicons.nonEmpty, "langId requires at least one lexicon")
      val langs = lexicons.keys.toSeq.sorted
      val scored = lexicons.foldLeft(df.withColumn("_toks", tokens(col(textCol)))) {
        case (d, (lang, lex)) => d.withColumn(s"s_$lang", lexiconHits(col("_toks"), lex))
      }
      // alphabetical-first >= cascade == argmax with alphabetical ties
      val pred = langs.init.zipWithIndex.foldRight(lit(langs.last)) {
        case ((lang, i), rest) =>
          val beats = langs.drop(i + 1)
            .map(o => col(s"s_$lang") >= col(s"s_$o")).reduce(_ && _)
          when(beats, lit(lang)).otherwise(rest)
      }
      scored.withColumn("predicted", pred).drop("_toks")
    }

    /** Quality stats (the tx02 operator as a verb): exact integer
      * milli-ratios — average word length, stopword rate, punctuation
      * rate, and the composite quality score. Scan speed. */
    def qualityStats(textCol: String,
                     stopwords: Seq[String] = graft.operators.TextOps.langLex("en")): DataFrame = {
      import graft.functions.TextFunctions.{tokens, lexiconHits, charClassCount}
      df.withColumn("_toks", tokens(col(textCol)))
        .withColumn("len_chars", length(col(textCol)))
        .withColumn("n_words", size(col("_toks")))
        .withColumn("n_stop", lexiconHits(col("_toks"), stopwords))
        .withColumn("n_punct", charClassCount(col(textCol), "[.!?,;:]"))
        .withColumn("awl_milli", expr("(CAST(len_chars - n_words + 1 AS BIGINT) * 1000) DIV n_words"))
        .withColumn("stop_milli", expr("(CAST(n_stop AS BIGINT) * 1000) DIV n_words"))
        .withColumn("punct_milli", expr("(CAST(n_punct AS BIGINT) * 1000) DIV len_chars"))
        .withColumn("quality_milli", expr(
          "(stop_milli * 2 + (CASE WHEN n_words BETWEEN 50 AND 200 THEN 1000 ELSE 0 END) + " +
          "(CASE WHEN awl_milli BETWEEN 3000 AND 8000 THEN 1000 ELSE 0 END)) DIV 4"))
        .drop("_toks")
    }

    /** Model-based quality gate (the tx17 operator as a verb): scores
      * `textCol` with the frozen linear model over exact integer
      * features and appends score/label/keep. Per-row codegen'd
      * expression — scan speed, zero shuffle at any corpus size. */
    def qualityGate(textCol: String,
                    stopwords: Seq[String] = graft.operators.TextOps.langLex("en")): DataFrame = {
      import graft.functions.TextFunctions.lexiconHits
      import graft.operators.Curation.QualityWeights
      df.withColumn("_toks", split(col(textCol), " "))
        .withColumn("n_words", size(col("_toks")))
        .withColumn("_n_stop", lexiconHits(col("_toks"), stopwords))
        .withColumn("_n_uniq", size(array_distinct(col("_toks"))))
        .withColumn("_len", length(col(textCol)))
        .withColumn("stop_milli", expr("(CAST(_n_stop AS BIGINT) * 1000) DIV n_words"))
        .withColumn("distinct_milli", expr("(CAST(_n_uniq AS BIGINT) * 1000) DIV n_words"))
        .withColumn("awl_milli", expr("(CAST(_len - n_words + 1 AS BIGINT) * 1000) DIV n_words"))
        .withColumn("score", expr(QualityWeights.scoreSql))
        .withColumn("label", expr(QualityWeights.labelSql))
        .withColumn("keep", col("score") >= QualityWeights.thMid)
        .drop("_toks", "_n_stop", "_n_uniq", "_len")
    }

    /** Cross-corpus line dedup (the tx16 operator as a verb, C4's
      * duplicated-line removal): chunks `textCol` into consecutive
      * `lineWords`-word lines, keeps a corpus-duplicated line only at
      * its FIRST occurrence (min (id, position) — keep-first), and
      * returns one row per doc with counts, kept fraction, and the
      * REWRITTEN text. One line-domain agg + one join back — the
      * corpus never self-joins; ids must fit doc_id*1e6+pos in a
      * bigint (pos < 1e6 per doc). */
    def lineDedup(idCol: String, textCol: String, lineWords: Int = 10): DataFrame = {
      // token array materialized first: inlined, the chunk lambda
      // would re-split the text per line (dd16 hazard, SCALE.md r8)
      val lines = df.select(col(idCol), split(col(textCol), " ").as("_ws"))
        .select(col(idCol),
          transform(sequence(lit(0), floor((size(col("_ws")) - 1) / lineWords).cast("int")),
            c => array_join(slice(col("_ws"), c * lineWords + 1, lit(lineWords)), " ")).as("_ls"))
        // non-leaf generator child: stops InferFiltersFromGenerate
        // from pushing a filter that re-derives the chunk transform
        // per row at the scan (see tx16; SPARK-36715 guard)
        .select(col(idCol), posexplode(coalesce(col("_ls"), array())))
        .select(col(idCol), col("pos"), col("col").as("_line"),
          (col(idCol).cast("long") * 1000000L + col("pos")).as("_inst"))
      val keeper = lines.groupBy(col("_line")).agg(min(col("_inst")).as("_keep"))
      lines.join(keeper, "_line")
        .withColumn("_kept", col("_inst") === col("_keep"))
        .groupBy(col(idCol))
        .agg(count(lit(1)).as("n_lines"),
          sum(when(col("_kept"), 0L).otherwise(1L)).as("n_dropped"),
          concat_ws(" ", transform(
            array_sort(collect_list(when(col("_kept"),
              struct(col("pos"), col("_line"))))),
            st => st.getField("_line"))).as("deduped_text"))
        .withColumn("kept_milli", expr("((n_lines - n_dropped) * 1000) DIV n_lines"))
    }

    /** Deterministic train/val/test split (the sp05 operator as a
      * verb): a row's split is a pure function of its id hash, so
      * assignment is rerun-stable, growth-stable (new rows never
      * reshuffle old ones), and leak-proof by construction. Bands use
      * 16 hash bits -> resolution 1/65536. Zero-shuffle scan-speed
      * flag. */
    def splitAssign(idCol: String, valFrac: Double = 0.05, testFrac: Double = 0.05,
                    seed: String = "graft", outCol: String = "split"): DataFrame = {
      require(valFrac >= 0 && testFrac >= 0 && valFrac + testFrac < 1,
        s"invalid fractions: val=$valFrac test=$testFrac")
      val h = substring(md5(concat(col(idCol).cast("string"), lit(":" + seed))), 1, 4)
      val valBound = f"${math.round(valFrac * 65536).min(65535L)}%04x"
      val testBound = f"${math.round((valFrac + testFrac) * 65536).min(65535L)}%04x"
      df.withColumn(outCol,
        when(h < valBound, lit("val")).when(h < testBound, lit("test"))
          .otherwise(lit("train")))
    }

    /** Deterministic shuffle-and-shard (the sp06 operator as a verb):
      * a row's output shard is a pure function of its id hash, so
      * shards are size-balanced and source-mixed with no shuffle in
      * the assignment — the hash mixing IS the global shuffle a
      * trainer wants. At scale, write with
      * `.write.partitionBy(outCol)` (or repartition on it first) so
      * each shard lands as one file set. */
    def shardAssign(idCol: String, nShards: Int,
                    seed: String = "graft", outCol: String = "shard"): DataFrame = {
      require(nShards > 0, s"nShards must be positive: $nShards")
      df.withColumn(outCol,
        pmod(conv(substring(md5(concat(col(idCol).cast("string"), lit(":" + seed))), 1, 15),
          16, 10).cast("long"), lit(nShards.toLong)).cast("int"))
    }

    /** Token-BALANCED shard manifest (the sp09 operator as a verb):
      * [[shardAssign]] balances doc COUNTS; this balances WORK —
      * global rank by `tokCol` descending, snake round-robin
      * assignment, per-shard sums within ~one max-item of ideal on
      * any distribution. Returns the per-row manifest with `shard`;
      * the rank is partition-parallel (GroupPrefix). */
    def balancedShards(idCol: String, tokCol: String, nShards: Int): DataFrame = {
      require(nShards > 0, s"nShards must be positive: $nShards")
      graft.operators.Pipeline.balancedShardsOf(df, idCol, tokCol, nShards)
    }

    /** Epoch ordering manifests (the sp07 operator as a verb): for
      * each epoch in [0, epochs), every row gets a DIFFERENT
      * deterministic pseudo-random position within one of `nShards`
      * shards — the per-epoch re-shuffle a training loader reads.
      * Adds (epoch, shard, pos); one shuffle on (epoch, shard), window
      * task input bounded by shard size. Raise `nShards` with the
      * corpus so shards stay file-sized. */
    def epochOrder(idCol: String, epochs: Int, nShards: Int,
                   seed: String = "graft"): DataFrame = {
      require(epochs > 0 && nShards > 0, s"epochs/nShards must be positive")
      val w = Window.partitionBy(col("epoch"), col("shard"))
        .orderBy(col("_h"), col(idCol))
      df.select(col("*"), explode(array((0 until epochs).map(lit): _*)).as("epoch"))
        .withColumn("_h", md5(concat(col(idCol).cast("string"),
          lit(":" + seed + ":ep"), col("epoch").cast("string"))))
        .withColumn("shard", pmod(conv(substring(col("_h"), 1, 15), 16, 10).cast("long"),
          lit(nShards.toLong)).cast("int"))
        .withColumn("pos", row_number().over(w))
        .drop("_h")
    }

    /** Maximal duplicated-span extraction (the tx18 operator as a
      * verb — Lee et al. 2022 ExactSubstr): per doc, the coalesced
      * maximal spans of char-`k`-grams occurring >= 2 times
      * corpus-wide. Returns (idCol, len, n_spans, dup_chars,
      * max_span, dup_milli); join back and cut spans (or drop docs
      * past a dup_milli threshold) to apply the dedup. */
    def substringSpans(idCol: String, textCol: String, k: Int = 20): DataFrame =
      graft.operators.Curation.substringSpans(
        df.select(col(idCol).as("doc_id"), col(textCol).as("text")), k)
        .withColumnRenamed("doc_id", idCol)

    /** ExactSubstr REWRITE (the tx24/tx26 operators as a verb — the
      * removal step of Lee et al. 2022 that [[substringSpans]] feeds):
      * each doc with its maximal duplicated spans excised. With
      * `keepFirst` (the paper's "remove it from all but one"), the
      * min-(doc, pos) occurrence of each duplicated gram survives, so
      * the corpus keeps exactly one copy of every duplicated run;
      * without it every occurrence excises (the conservative form).
      * Returns (idCol, len, n_spans, kept_chars, kept_milli,
      * rewrite_md5); the digest hash-checks the edit itself. Same
      * cost as the span census — one gram-domain shuffle,
      * candidate-restricted join back, and a per-row fold over the
      * doc's own sorted intervals. */
    def substringRewrite(idCol: String, textCol: String, k: Int = 20,
                         keepFirst: Boolean = false): DataFrame =
      graft.operators.Curation.substringRewrite(
        df.select(col(idCol).as("doc_id"), col(textCol).as("text")), k, keepFirst)
        .withColumnRenamed("doc_id", idCol)

    /** BPE merge candidates (the tx19 operator as a verb): the top-K
      * adjacent char pairs weighted by word frequency — iteration one
      * of byte-pair-encoding tokenizer training, counted over the
      * distinct-word domain (O(vocab x word length), not O(corpus)). */
    def bpePairs(textCol: String, topK: Int = 20): DataFrame =
      graft.operators.Curation.bpePairs(
        df.select(col(textCol).as("text")), topK)

    /** BPE TRAINING to `nMerges` merges — the loop tx19/tx20 prove one
      * step of (Sennrich et al. 2016), closed with kmeansTrain's
      * discipline: ONE corpus-sized word-frequency agg up front, then
      * every iteration works the DISTINCT-WORD symbol table only —
      * count adjacent symbol pairs weighted by word frequency (one
      * vocab-domain exchange), pick the (count desc, pair) winner (a
      * 2-string driver scalar, the only driver traffic), apply it as
      * a greedy leftmost fold over each word's symbol array, and
      * localCheckpoint so iteration N's plan never embeds N-1 folds.
      * Corpus size enters ONLY via the word-freq agg; iteration cost
      * is O(vocab x word length) whatever the corpus. Merge ranks are
      * deterministic (exact integer counts, total pair order), so the
      * merge list is prefix-stable: training N then N' > N merges
      * agree on the first N. Stops early if every word collapses to
      * one symbol. */
    def bpeTrain(textCol: String, nMerges: Int): api.BpeModel = {
      require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
      var wf = df
        .select(explode(split(lower(col(textCol)), " ")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy(col("word")).agg(count(lit(1)).as("wcnt"))
        .select(split(col("word"), "").as("syms"), col("wcnt"))
        .localCheckpoint(true)
      val merges = Seq.newBuilder[(String, String)]
      var i = 0
      var dry = false
      while (i < nMerges && !dry) {
        val top = wf
          .select(col("wcnt"), explode(when(size(col("syms")) >= 2,
            transform(sequence(lit(1), size(col("syms")) - 1),
              j => struct(element_at(col("syms"), j).as("a"),
                element_at(col("syms"), j + 1).as("b"))))
            .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("wcnt")).as("pc"))
          .orderBy(col("pc").desc, col("a"), col("b"))
          .limit(1).collect()
        if (top.isEmpty) dry = true
        else {
          val (a, b) = (top(0).getString(0), top(0).getString(1))
          merges += ((a, b))
          wf = wf
            .select(api.bpeMergeSyms(col("syms"), a, b).as("syms"), col("wcnt"))
            .localCheckpoint(true)
          i += 1
        }
      }
      api.BpeModel(merges.result())
    }

    /** Encode `textCol`'s words with a [[bpeTrain]] model: applies the
      * merge list in rank order (the tokenizer-side replay — exactly
      * the state the training loop reached). Adds `outCol` =
      * array-of-symbol-arrays, one per word. Per-row compute; at scale
      * encode the DISTINCT words and join back rather than folding
      * over every occurrence. */
    def bpeEncode(textCol: String, model: api.BpeModel,
                  outCol: String = "syms"): DataFrame =
      df.withColumn(outCol,
        transform(split(lower(col(textCol)), " "),
          w => model.merges.foldLeft(split(w, "")) {
            case (c, (a, b)) => api.bpeMergeSyms(c, a, b)
          }))

    /** RAG chunking (the tx21 operator as a verb, with the chunk TEXT
      * kept — the embedding pipeline's input): `width`-word windows on
      * a `stride`-word step (overlap = width − stride), each with a
      * stable (id, chunk_idx) identity. Pure per-row compute — the
      * explode happens at the scan, zero shuffle at any corpus size. */
    def chunkWindows(idCol: String, textCol: String,
                     width: Int = 32, stride: Int = 24): DataFrame = {
      require(stride >= 1 && width >= stride,
        s"need width >= stride >= 1, got width=$width stride=$stride")
      df.select(col(idCol), split(col(textCol), " ").as("_ws"))
        .select(col(idCol),
          posexplode(transform(
            sequence(lit(0), floor((size(col("_ws")) - 1) / stride).cast("int")),
            i => array_join(slice(col("_ws"), i * stride + 1, lit(width)), " "))))
        .select(col(idCol), col("pos").cast("int").as("chunk_idx"),
          col("col").as("chunk_text"))
    }

    /** Lexical tf-idf retrieval (the tx22 operator as a verb): top-`k`
      * docs for `terms`, scored with the rational idf ((1e6·N) DIV df)
      * so results are exact integers and rerun-stable. The term filter
      * applies at the explode — the wire carries only the query
      * terms' postings, never the corpus. */
    def tfidfTopK(idCol: String, textCol: String, terms: Seq[String],
                  k: Int = 20): DataFrame = {
      require(terms.nonEmpty, "tfidfTopK needs at least one query term")
      val n = df.agg(count(lit(1)).as("n_docs"))
      val tf = df
        .select(col(idCol), explode(split(lower(col(textCol)), " ")).as("_w"))
        .filter(col("_w").isin(terms: _*))
        .groupBy(col(idCol), col("_w")).agg(count(lit(1)).as("_tf"))
      val idf = tf.groupBy(col("_w")).agg(count(lit(1)).as("_df"))
        .crossJoin(broadcast(n))
        .select(col("_w"), expr("(1000000 * n_docs) DIV _df").as("_idf"))
      tf.join(broadcast(idf), "_w")
        .groupBy(col(idCol))
        .agg(sum(col("_tf") * col("_idf")).as("score"),
          count(lit(1)).as("n_terms_hit"))
        .orderBy(col("score").desc, col(idCol))
        .limit(k)
    }

    /** Pattern scrub (the tx07 operator as a verb): replaces every
      * (regex -> replacement) in order, adding `n_redactions` (total
      * matches across patterns). Pure per-row compute — scan speed. */
    def scrubPatterns(textCol: String, patterns: Seq[(String, String)],
                      outCol: String = "scrubbed"): DataFrame = {
      require(patterns.nonEmpty, "scrubPatterns requires at least one (regex, replacement)")
      val scrubbed = patterns.foldLeft(col(textCol)) { case (c, (pat, rep)) =>
        regexp_replace(c, pat, rep)
      }
      val counts = patterns.map { case (pat, _) =>
        size(regexp_extract_all(col(textCol), lit(pat), lit(0)))
      }.reduce(_ + _)
      df.withColumn(outCol, scrubbed).withColumn("n_redactions", counts)
    }
  }

  implicit class VectorOpsSyntax(private val df: DataFrame) extends AnyVal {

    /** Brute-force cosine top-k against a query vector column-set
      * (single-row DataFrame, broadcast). */
    def cosineTopK(vecCol: String, query: DataFrame, queryVecCol: String,
                   k: Int, idCol: String): DataFrame =
      df.crossJoin(broadcast(query.select(col(queryVecCol).as("_q"))))
        .select(col(idCol), VectorFunctions.cosine(col(vecCol), col("_q")).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col(idCol))
        .limit(k)

    /** MMR-diversified top-k (the ss29 operator as a verb — the
      * "diverse retrieval" rerank vector DBs ship): per query, the
      * exact-cosine top-`shortlist` reranks to `k` greedy MMR picks
      * at λ=1/2 (integer-milli scores, deterministic ties). Returns
      * (q_id, vec_id, rel_milli, mmr_milli, pick). The corpus is
      * scanned once against the broadcast query batch; every greedy
      * step runs over shortlist-sized frames only.
      *
      * `excludeSelf` (default true) drops candidates whose `idCol`
      * EQUALS the query's `queryIdCol` — correct when queries are
      * drawn FROM the corpus (the ss29 form). Pass false when the
      * query batch uses an EXTERNAL id space: with excludeSelf on, a
      * query id that coincidentally equals an unrelated corpus id
      * would silently drop that vector from the shortlist. */
    def mmrTopK(idCol: String, vecCol: String, queries: DataFrame,
                queryIdCol: String, queryVecCol: String,
                shortlist: Int = 8, k: Int = 4,
                excludeSelf: Boolean = true): DataFrame =
      graft.operators.Similarity.mmrDiversify(
        df.select(col(idCol).as("vec_id"), col(vecCol).as("embedding")),
        queries.select(col(queryIdCol).as("q_id"), col(queryVecCol).as("q_emb")),
        shortlist, k, excludeSelf)

    /** Blocked k-NN GRAPH (the ss28 operator as a verb): every
      * vector's top-`k` cosine neighbors among its IVF cell-mates
      * (`labelCol`-seeded cells — kmeansTrain assignments make a
      * label-free replacement), the all-to-all building block under
      * SemDeDup clustering, label propagation, and graph-based index
      * bootstrap. Candidates are cell-mates only (corpus-linear,
      * never all-pairs); the per-vector top-k is a partial
      * WindowGroupLimit. Returns (idCol, cell, rank, nbr_id,
      * cos_sim). */
    def knnGraph(idCol: String, vecCol: String, labelCol: String,
                 k: Int = 3): DataFrame =
      graft.operators.Similarity.knnGraphOf(
          df.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"),
            col(labelCol).as("label")), k)
        .withColumnRenamed("vec_id", idCol)

    /** Blocked k-NN graph over a PRE-ASSIGNED cell column — the
      * [[knnGraph]] core without the centroid pass: candidates are
      * `cellCol`-mates only (one cell equi-join, per-vector top-`k`
      * as a partial WindowGroupLimit). The caller owns the blocking:
      * kmeansAssign cells, LSH buckets, or the registered ss28 form
      * (corpus-scaled hash cells — cell count ∝ n so cell SIZE and
      * the per-cell pair count stay constant as the corpus grows; a
      * FIXED cell domain grows pairs quadratically). Returns (idCol,
      * cell, rank, nbr_id, cos_sim). */
    def knnGraphByCell(idCol: String, vecCol: String, cellCol: String,
                       k: Int = 3): DataFrame =
      graft.operators.Similarity.knnGraphBlocked(
          df.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"),
            col(cellCol).as("cell")), k)
        .withColumnRenamed("vec_id", idCol)

    /** Corpus-scaled hash cells for [[knnGraphByCell]] (the ss28
      * blocking): adds `cell` = md5(id) mod (count/targetCellSize),
      * the count a 1-row broadcast — cell size stays ~targetCellSize
      * at every corpus scale. */
    def hashCells(idCol: String, vecCol: String,
                  targetCellSize: Int = 64): DataFrame =
      graft.operators.Similarity.hashCells(
          df.select(col(idCol).as("vec_id"), col(vecCol).as("embedding")),
          targetCellSize)
        .withColumnRenamed("vec_id", idCol)

    /** Graph LABEL PROPAGATION (the ss31 operator as a verb — Zhu &
      * Ghahramani 2002 in its iteration-bounded form) over THIS
      * directed edge frame (`idCol` → `nbrCol`, e.g. a knnGraph /
      * knnGraphByCell output): each round labels currently-unlabeled
      * nodes by the majority label of their already-labeled
      * out-neighbors (votes desc, smallest label ties), newly labeled
      * nodes vote in later rounds. Returns (vec_id, label, round);
      * round 0 = seed. Per round one edge join + one anti-join + one
      * map-side majority agg, all id-keyed; rounds are a bounded plan
      * unroll. */
    def labelPropagate(idCol: String, nbrCol: String, seeds: DataFrame,
                       seedIdCol: String, seedLabelCol: String,
                       rounds: Int = 2): DataFrame =
      graft.operators.Similarity.labelPropagate(
        df.select(col(idCol).as("vec_id"), col(nbrCol).as("nbr_id")),
        seeds.select(col(seedIdCol).as("vec_id"), col(seedLabelCol).as("label")),
        rounds)

    /** Iteration-bounded integer PageRank (the ss33 operator as a
      * verb) over a directed edge frame: ranks in micro units
      * (r₀ = 1,000,000; r' = 150,000 + 850·(Σ r DIV outdeg) DIV 1000
      * — flooring integer ops, engine-exact), `rounds` unrolled plan
      * stages, edge-linear per round. Returns (idCol, rank_micro) for
      * every node that appears in the edge list (source OR
      * destination): sink-only nodes hold rank rows and accumulate
      * inflow but emit nothing — dangling mass is not redistributed,
      * the documented simplification of the iteration-bounded form. */
    def pagerank(idCol: String, nbrCol: String, rounds: Int = 2): DataFrame = {
      require(rounds >= 1, s"rounds must be >= 1, got $rounds")
      graft.operators.Similarity.pagerankOf(
          df.select(col(idCol).as("vec_id"), col(nbrCol).as("nbr_id")),
          rounds)
        .withColumnRenamed("vec_id", idCol)
    }

    /** OOD / outlier audit (the ss32 operator as a verb — the
      * embedding-space cleaning screen): each vector assigns to its
      * nearest per-`labelCol` centroid, the squared distance
      * quantizes to an integer grid, and rows strictly beyond their
      * cell's exact `qMilli`-quantile distance are returned as
      * (idCol, cell, qd, p95_qd). Zero corpus-keyed shuffles — argmin
      * broadcast fold + domain-bounded histogram + broadcast-back
      * quantiles. */
    def oodAudit(idCol: String, vecCol: String, labelCol: String,
                 qMilli: Int = 950): DataFrame = {
      require(qMilli > 0 && qMilli < 1000,
        s"qMilli must be in (0, 1000), got $qMilli")
      graft.operators.Similarity.oodAuditOf(
          df.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"),
            col(labelCol).as("label")),
          qMilli)
        .withColumnRenamed("vec_id", idCol)
    }

    /** EMBEDDING DRIFT MONITOR (the ss35 operator as a verb — the
      * distribution-shift report between a reference snapshot and the
      * current batch; the retrain-the-index trigger): `isNew` tags
      * the current half (any Boolean expression — a batch id, an
      * ingest-date cutoff), vectors land in 16 sign-pattern cells
      * (sign bits of `vecCol`'s dims 1-4), and each cell reports both
      * halves' populations, occupancy-share shift in integer milli,
      * and the L1 displacement of the quantized per-cell mean in
      * centi-units (NULL when a half is empty). One corpus scan into
      * the fixed cell domain — zero corpus-keyed shuffles. */
    def embedDrift(idCol: String, vecCol: String, isNew: Column): DataFrame =
      graft.operators.Similarity.embedDriftOf(
        df.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"),
          isNew.as("is_new")))

    /** TWO-LEVEL coarse quantizer (the ss30 operator as a verb — the
      * hierarchical IVF assignment that makes k ~ √n cell counts
      * affordable): top-level centroids train on a 1-in-`sampleMod`
      * md5 sample (pay-once, sampled — never a full-corpus k×n×d
      * term), each top cell refines into `subK` cell-local
      * sub-centroids from the same sample, and the corpus assigns in
      * two broadcast-argmin stages (k1 + k2 comparisons per vector,
      * not k1·k2; zero corpus shuffles). Returns (idCol, cell1,
      * cell2); cell2 = -1 marks a top cell no sample member won
      * (unrefined, loud). (cell1, cell2) pairs make a trained
      * [[knnGraphByCell]] cell source at √n × √n granularity. */
    def hierCells(idCol: String, vecCol: String, labelCol: String,
                  subK: Int = 4, sampleMod: Int = 4): DataFrame =
      graft.operators.Similarity.hierAssignOf(
          df.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"),
            col(labelCol).as("label")),
          subK, sampleMod)
        .withColumnRenamed("vec_id", idCol)

    /** Batch IVF-PQ ANN (the ss22 serving query as a verb — the scale
      * path [[cosineTopK]]'s brute-force scan stops short of): builds
      * the IVF-PQ index over this frame (label-seeded cells + PQ code
      * indices, computed once — persist/store the index via
      * `TopicStream.annIndexBuild` when queries outlive one call) and
      * answers the whole `queries` batch in one plan: per-query
      * `nprobe` probe cells + ADC LUTs broadcast, the probe join
      * touches only probed cells' codes, exact cosine reranks each
      * query's ADC top-`shortlist` to top-`k`. Cost ∝ batch × nprobe
      * × cell size — the corpus enters via cell size only (measured:
      * SCALE.md r9 fixed-batch row). Returns (q_id, idCol, cell, adc,
      * cos_exact, rank). Needs a `label` column for cell seeding
      * (kmeansTrain centroids make a hash-free replacement). The
      * index's centroid frame stays cached for the returned plan's
      * lifetime (one small k-row frame per call) — a serving loop
      * that calls this repeatedly should hold the index in topics via
      * annIndexBuild instead, which releases the cache after its
      * writes. */
    def ivfpqTopK(idCol: String, vecCol: String, queries: DataFrame,
                  queryIdCol: String, queryVecCol: String,
                  k: Int = 10, nprobe: Int = 2, shortlist: Int = 50,
                  excludeSelf: Boolean = false): DataFrame = {
      val e = df.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"),
        col("label"))
      val (cents, cb, coded) = graft.operators.Similarity.ivfpqIndex(e)
      val qs = queries.select(col(queryIdCol).as("q_id"),
        col(queryVecCol).as("q_emb"))
      graft.operators.Similarity
        .ivfpqProbe(coded, cents, cb, qs, nprobe, shortlist, k, excludeSelf)
        .withColumnRenamed("vec_id", idCol)
    }

    /** Matryoshka two-stage ANN (the ss25 operator as a verb): coarse
      * cosine over the first `prefixDims` dims shortlists
      * `shortlist` candidates per query (partial WindowGroupLimit —
      * only scalars ride the exchange), exact full-dim cosine reranks
      * to top-`k`. At 100 TB store the prefix as its own narrow
      * column: the coarse scan then reads prefixDims/dim of the
      * vector bytes and full vectors are fetched only for the
      * shortlist. Returns (q_id, idCol, pre_cos, cos_sim, rank). */
    def mrlTopK(idCol: String, vecCol: String, queries: DataFrame,
                queryIdCol: String, queryVecCol: String,
                prefixDims: Int = 16, shortlist: Int = 40, k: Int = 10,
                excludeSelf: Boolean = false): DataFrame =
      graft.operators.Similarity.mrlPrefixTopK(
        df.select(col(idCol).as("vec_id"), col(vecCol).as("embedding")),
        queries.select(col(queryIdCol).as("q_id"),
          col(queryVecCol).as("q_emb")),
        prefixDims, shortlist, k, excludeSelf)
        .withColumnRenamed("vec_id", idCol)

    /** MRL prefix-width recall/cost curve (the ss36 audit as a verb):
      * recall@10 of a fixed-40 shortlist at 8/16/32 prefix dims
      * against the exact full-width top-10 truth, per query.
      * `sampleOneIn` steers the truth corpus — the dd08 calibration
      * discipline ([[graft.operators.Similarity.mrlSampleOneInFor]]):
      *  - 0 (default, auto): ≤ 100k vectors audit against the FULL
      *    corpus; beyond, against a deterministic ~25k-vector
      *    registry sample (hash of the id — reruns audit the same
      *    subset), so the audit frame stays Q × ~25k FLAT at every
      *    corpus scale;
      *  - 1: the exact Q×N audit, explicitly — loudly paying a
      *    corpus-linear cost per query is allowed, picking it by
      *    accident is not;
      *  - m > 1: audit against the 1-in-m sample. */
    def mrlCurve(idCol: String, vecCol: String, queries: DataFrame,
                 queryIdCol: String, queryVecCol: String,
                 sampleOneIn: Int = 0): DataFrame = {
      require(sampleOneIn >= 0, s"sampleOneIn must be >= 0, got $sampleOneIn")
      val e = df.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
      val s1 = if (sampleOneIn > 0) sampleOneIn
        else graft.operators.Similarity.mrlSampleOneInFor(e.count())
      graft.operators.Similarity.mrlCurveReport(
        graft.operators.Similarity.mrlAuditOf(e,
          queries.select(col(queryIdCol).as("q_id"),
            col(queryVecCol).as("q_emb")), s1))
    }

    /** Partition/cell balance audit over any assigned frame (the ss26
      * operator as a verb): per distinct `cellCol` value — member
      * count, corpus share (milli), balance factor vs the uniform
      * ideal (1000 = even), and the oversized flag (> 2x uniform).
      * One partial-agg'd rollup into the cell domain + a 1-row
      * broadcast; use it on IVF cell assignments, shard columns, or
      * any partitioning whose skew would hurt downstream reads. */
    def cellBalance(cellCol: String): DataFrame = {
      val counts = df.groupBy(col(cellCol).as("cell"))
        .agg(count(lit(1)).as("n"))
      val totals = counts.agg(sum(col("n")).as("total"),
        count(lit(1)).as("n_cells"))
      counts.crossJoin(broadcast(totals))
        .select(col("cell"), col("n"), col("total"), col("n_cells"),
          expr("(n * 1000) DIV total").as("share_milli"),
          expr("(n * n_cells * 1000) DIV total").as("balance_milli"),
          (col("n") * col("n_cells") > col("total") * 2).as("oversized"))
    }

    /** SemDeDup prune list (the ss10 operator as a verb): assign each
      * vector to its nearest per-`labelCol` centroid cell, then flag
      * vectors with a smaller-id cluster-mate above `tau` cosine.
      * Returns (idCol, cell, n_close_smaller, max_cos); anti-join it
      * against this frame to keep the survivors. Pairs compare within
      * (cell × corpus-scaled md5 sub-block, n/640 subs — inert below
      * 640 vectors), so the pair join stays corpus-LINEAR at every
      * scale; a same-cell near-dup pair split across sub-blocks is
      * missed (the standard blocked-near-dup recall trade — run
      * multiple sub-block tables ss07-style to amplify recall). */
    def semdedupPrune(idCol: String, vecCol: String, labelCol: String,
                      tau: Double): DataFrame =
      graft.operators.Similarity.semdedupPrune(
        df.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"),
          col(labelCol).as("label")), tau)
        .withColumnRenamed("vec_id", idCol)

    /** Semantic-dedup aggressiveness curve (the ss37 operator as a
      * verb): per cosine threshold τ ∈ {0.3, 0.5, 0.7, 0.9} the
      * dropped/survivor counts and drop share off ONE bucketed pair
      * pass — price the SemDeDup knob before a prune commits. */
    def semdedupCurve(idCol: String, vecCol: String,
                      labelCol: String): DataFrame =
      graft.operators.Similarity.semdedupCurveOf(
        df.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"),
          col(labelCol).as("label")))

    /** Train per-subspace PQ codebooks on this frame (the ss13/ss14
      * machinery as a verb): seed = per-`labelCol` centroid subspace
      * slices, then `iterations` deterministic Lloyd refinements.
      * Returns the single-row codebook frame to pass to [[pqEncode]];
      * train once (on the corpus or a sample), FREEZE, and encode
      * arrivals against it forever — retrain only when their
      * recon_d2 drifts up. */
    def pqCodebook(vecCol: String, labelCol: String,
                   iterations: Int = 2): DataFrame = {
      val e = df.select(col(vecCol).as("embedding"), col(labelCol).as("label"))
      (1 to iterations).foldLeft(graft.operators.Similarity.pqSeed(e))(
        (cb, _) => graft.operators.Similarity.pqIterate(e, cb))
    }

    /** Encode vectors against a FROZEN broadcast `codebook` (from
      * [[pqCodebook]]): adds `codes` (the '-'-joined subspace
      * codeword labels — 8 bytes-ish per vector instead of the float
      * vector) and `recon_d2` (quantization error, the retrain
      * signal). Zero shuffle; cost tracks this frame's size only —
      * the ss15 incremental-index arrival shape. */
    def pqEncode(vecCol: String, codebook: DataFrame): DataFrame =
      graft.operators.Similarity.pqEncode(
        df.withColumnRenamed(vecCol, "embedding"), codebook)
        .withColumnRenamed("embedding", vecCol)

    /** Embedding-space principal direction (the ss20 operator as a
      * verb): exact-integer covariance from ONE MomentAgg pass plus
      * two integer-rescaled power-iteration steps. Returns one row
      * per dimension: (dim, sum_milli, var_q, loading) — a dominant
      * |loading| spread says the space is collapsing onto one
      * direction (re-whiten before trusting ANN distances). `dim`
      * must match the vector width. */
    def principalDirection(vecCol: String, dim: Int): DataFrame =
      graft.operators.Similarity.pcaPower(
        df.select(col(vecCol).as("embedding")), dim)

    /** Reciprocal-rank fusion (the ss21 operator as a verb): fuse this
      * ranked shortlist with `other` on `idCol`; each must carry a
      * 1-based integer `rank` column (missing ids contribute 0). The
      * fused score is Σ 1e6 DIV (rrfK + rank) — rank-based, so two
      * retrievers scoring in incomparable units (floats vs integers)
      * fuse exactly. Shortlists are top-k by construction, so the
      * fusion join is k × k — driver-small at any corpus size. */
    def rrfFuse(other: DataFrame, idCol: String,
                rrfK: Int = 60, topK: Int = 10): DataFrame = {
      require(df.columns.contains("rank") && other.columns.contains("rank"),
        "rrfFuse: both shortlists need a 1-based integer 'rank' column")
      def side(f: DataFrame, as: String) =
        f.select(col(idCol), col("rank").cast("int").as(as))
      side(df, "rank_a").join(side(other, "rank_b"), Seq(idCol), "full_outer")
        .select(col(idCol),
          coalesce(col("rank_a"), lit(0)).as("rank_a"),
          coalesce(col("rank_b"), lit(0)).as("rank_b"),
          (coalesce(expr(s"1000000 DIV ($rrfK + rank_a)"), lit(0L)) +
            coalesce(expr(s"1000000 DIV ($rrfK + rank_b)"), lit(0L))).as("rrf_micro"))
        .orderBy(col("rrf_micro").desc, col(idCol))
        .limit(topK)
    }

    /** Iterative Lloyd k-means to convergence — ss09's single
      * iteration looped (the training loop ss14's seeded codebooks
      * stop short of; reference analog: the IVF coarse-quantizer
      * training an `ella-tensor` index build implies). Seeds `k`
      * cells from a deterministic id-hash partition, then per
      * iteration: broadcast-argmin assignment (zero fact-side
      * shuffle), exact quantized-centi-long centroid recompute (one
      * partial-agg'd (cell, pos) exchange — k x dim groups whatever
      * the corpus size), and the max per-dim centroid shift in
      * milli-units. Stops when the shift <= `epsMilli` or after
      * `maxIter` rounds. Each round's frame is localCheckpoint'd
      * (dd06's fixpoint discipline): iteration N's plan never embeds
      * N-1 crossJoins. Driver cost per iteration is one k x dim
      * scalar agg — the shift test — which is what makes the loop
      * terminate data-independently; all data-sized work stays
      * distributed. Empty cells drop (their centroids stop moving
      * and stop being reported). */
    def kmeansTrain(idCol: String, vecCol: String, k: Int,
                    maxIter: Int = 10, epsMilli: Long = 0L,
                    init: Option[DataFrame] = None): api.KmeansModel = {
      require(k >= 1, s"k must be >= 1, got $k")
      require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
      val e = df.select(col(idCol).as("_id"), col(vecCol).as("_v"))
      // dense-buffer recompute (centroidArray's r11 rework applied to
      // the training loop): the exploded form shuffled dim rows per
      // vector per round; VectorSumAgg folds each vector into one
      // dim-long buffer per (cell x partition) — same floor(x*100+0.5)
      // quantized-long sum, same count divisor, bit-identical means —
      // and the k x dim (cell, pos, c) rows explode AFTER the agg.
      def recompute(assigned: DataFrame): DataFrame =
        assigned.groupBy(col("cell"))
          .agg(api.vecSumUdaf(col("_v")).as("vsum"), count(col("_v")).as("n"))
          .select(col("cell"), col("n"), posexplode(col("vsum")))
          .select(col("cell"), col("pos"),
            (col("col").cast("double") / (col("n") * 100)).as("c"))
      // warm start: an explicit (cell, pos, c) centroid frame replaces
      // the id-hash seed — resume-from-model retraining, and the form
      // an SQL oracle can replay (ss23: label-seeded, hash-free)
      var cen = init
        .map(_.select(col("cell"), col("pos"), col("c")).localCheckpoint(true))
        .getOrElse(recompute(
          e.withColumn("cell", pmod(xxhash64(col("_id")), lit(k.toLong))))
          .localCheckpoint(true))
      val shifts = scala.collection.mutable.ArrayBuffer[Long]()
      var it = 0
      var converged = false
      while (it < maxIter && !converged) {
        val next = recompute(api.VectorOpsSyntax(e).kmeansAssign("_v", cen))
          .localCheckpoint(true)
        val shift = next
          .join(cen.select(col("cell"), col("pos"), col("c").as("c0")), Seq("cell", "pos"))
          .agg(coalesce(max(
            floor(abs(col("c") - col("c0")) * 1000 + 0.5).cast("long")), lit(0L)))
          .head.getLong(0)
        shifts += shift
        cen = next
        it += 1
        converged = shift <= epsMilli
      }
      api.KmeansModel(cen, shifts.toSeq, converged)
    }

    /** kmeans++ seeding for [[kmeansTrain]]'s `init` hook —
      * deterministic D²-weighted sampling (Arthur & Vassilvitskii's
      * kmeans++, derandomized): each round picks ONE new seed with
      * probability ∝ D² (squared distance to the nearest already
      * -chosen seed) via the Efraimidis–Spirakis weighted-sampling
      * key ln(u)/D² maximized over the corpus, where u ∈ (0,1) is an
      * md5-derived per-(id, round) uniform — the sp01 hash-sampling
      * discipline, so the "random" draw is reproducible across runs,
      * partitionings, and engines. Each round is ONE map-side
      * -combinable max(struct) aggregation against a broadcast-literal
      * seed list (k·dim doubles on the driver — the model size, not
      * data); k rounds = k corpus scans, the classic kmeans++ cost
      * (k-means‖ would batch rounds; at this k the scans are the
      * simpler honest form). Returns the (cell, pos, c) frame
      * [[kmeansTrain]] accepts as `init`. */
    def kmeansppSeed(idCol: String, vecCol: String, k: Int,
                     salt: String = "kpp"): DataFrame =
      api.kmeansppSeedOf(df, idCol, vecCol, k, salt)

    /** Assign each row to its nearest centroid cell from a
      * [[kmeansTrain]] model's (cell, pos, c) frame: the model folds
      * to one broadcast array row and assignment is the ss03/ss09
      * zero-shuffle per-row argmin. Adds a `cell` column. */
    def kmeansAssign(vecCol: String, centroids: DataFrame): DataFrame = {
      val cents = centroids
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
          st => st.getField("c")).as("cvec"))
        .agg(array_sort(collect_list(struct(col("cell"), col("cvec")))).as("cents"))
      df.crossJoin(broadcast(cents))
        .withColumn("cell", array_min(transform(col("cents"),
          cc => struct(VectorFunctions.l2distSq(col(vecCol), cc.getField("cvec")).as("d2"),
                       cc.getField("cell").as("cell")))).getField("cell"))
        .drop("cents")
    }
  }

  /** [[VectorOpsSyntax.kmeansppSeed]]'s body — lives on the object
    * because the value-class syntax wrapper can't host the nested
    * classes typedlit/toDF materialize. */
  private[graft] def kmeansppSeedOf(df: DataFrame, idCol: String,
                                    vecCol: String, k: Int,
                                    salt: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    val e = df.select(col(idCol).as("_id"), col(vecCol).as("_v"))
    def u(round: Int): Column =
      conv(substring(md5(concat(col("_id").cast("string"),
        lit(s":$salt:$round"))), 1, 15), 16, 10).cast("double") /
        lit(math.pow(16.0, 15))
    val chosen = scala.collection.mutable.ArrayBuffer[Seq[Double]]()
    var r = 0
    while (r < k) {
      val key =
        if (chosen.isEmpty) u(r) // uniform first seed
        else {
          val seeds = typedlit(chosen.toSeq)
          val d2 = array_min(transform(seeds,
            sv => VectorFunctions.l2distSq(col("_v"), sv)))
          // ln(u)/D² is monotone in u^(1/D²); D²=0 rows (duplicates
          // of a chosen seed) get -inf and can never win
          when(d2 > 0.0, log(u(r)) / d2).otherwise(lit(Double.NegativeInfinity))
        }
      val best = e.select(key.as("_key"), col("_id"), col("_v"))
        .agg(max(struct(col("_key"), col("_id"), col("_v"))).as("_m"))
        .select(col("_m._v")).head.getSeq[Any](0)
        .map(x => x.asInstanceOf[Number].doubleValue())
      chosen += best
      r += 1
    }
    import spark.implicits._
    chosen.toSeq.zipWithIndex.flatMap { case (v, cell) =>
      v.zipWithIndex.map { case (c, pos) => (cell, pos, c) }
    }.toDF("cell", "pos", "c")
  }

  /** Result of [[VectorOpsSyntax.kmeansTrain]]: `centroids` = (cell,
    * pos, c) rows (pass to [[VectorOpsSyntax.kmeansAssign]]),
    * `shiftsMilli` = max
    * per-dim centroid movement per iteration, `converged` = the last
    * shift was <= epsMilli (false = maxIter stopped the loop). */
  final case class KmeansModel(centroids: DataFrame,
                               shiftsMilli: Seq[Long],
                               converged: Boolean)

  /** Result of [[DedupOps.perceptronTrain]]: final integer
    * weights (one per feature column, in order) and the
    * pre-update misclassification count of every iteration run. */
  final case class PerceptronModel(weights: Seq[Long], errs: Seq[Long]) {
    def converged: Boolean = errs.lastOption.contains(0L)
  }

  /** Result of [[TextCurationOps.bpeTrain]]: the ordered merge list
    * (rank = position). `symbols` renders each merge's output token. */
  final case class BpeModel(merges: Seq[(String, String)]) {
    def symbols: Seq[String] = merges.map { case (a, b) => a + b }
  }

  /** One BPE merge applied to a symbol array: greedy leftmost
    * non-overlapping replacement of adjacent (a, b) with a+b — a left
    * fold where a match consumes the accumulator's tail symbol, which
    * is exactly the pointer-advance scan of the BPE paper (a merged
    * token is never re-used as the LEFT side within the same pass,
    * since a+b == a would need b empty). */
  private[graft] def bpeMergeSyms(syms: Column, a: String, b: String): Column =
    aggregate(syms,
      typedLit(Seq.empty[String]),
      (acc, x) => when(size(acc) > 0 &&
          element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))
}
