package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import graft.functions.TextFunctions.wordCount
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed event row for streaming topics (mirrors the `events` table). */
case class TopicEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                      event_type: String, value: Double)

/** Per-user funnel state: the MINIMAL SUFFICIENT candidate set of
  * stage-type event times (epoch micros), per stage — pruned on every
  * update by [[FunnelState.prune]] so state stays bounded on an
  * infinite stream while the resolution remains exactly batch ts21's
  * min-over-all semantics for every event the watermark admits. */
case class FunnelUserState(stageUs: Seq[Seq[Long]])

/** The pure state kernel behind [[TopicStream.funnelStream]]: chain
  * resolution plus the watermark-aware prune that keeps per-user state
  * bounded. Kept side-effect-free so FunnelStateSpec can prove
  * (property-style, randomized arrival orders) that pruned-state
  * resolution equals full-history resolution. */
object FunnelState {
  /** ts21's chain: t1 = min stage-0 time, t_i = min stage-i time in
    * [t_{i-1}, t_{i-1}+tol]. Returns the matched prefix. */
  def resolve(stageUs: Seq[Seq[Long]], tolUs: Long): Seq[Long] = {
    val out = Seq.newBuilder[Long]
    var anchor = -1L
    var i = 0
    var open = true
    while (i < stageUs.size && open) {
      val cand =
        if (i == 0) stageUs(0).minOption
        else stageUs(i).filter(t => t >= anchor && t <= anchor + tolUs).minOption
      cand match {
        case Some(t) => out += t; anchor = t; i += 1
        case None => open = false
      }
    }
    out.result()
  }

  /** Prune to the minimal set whose resolution equals full history for
    * every possible future, given that events below `watermarkUs` can
    * no longer arrive. With m0 = current stage-0 min:
    *  - stage 0 keeps only m0 (future arrivals only lower the min);
    *  - stage i keeps candidates in [min(watermark, m0), m0 + i·tol]:
    *    above the horizon a candidate can never be selected (every
    *    future t1 ≤ m0, so t_i ≤ m0 + i·tol); below min(W, m0) it can
    *    never satisfy t ≥ t1 (future t1 ≥ min(W, m0));
    *  - with no stage-0 yet, every future t1 ≥ W, so only candidates
    *    ≥ W stay selectable.
    * State is therefore O(events inside watermark-lag + funnel
    * horizon) per user, never O(stream history). */
  def prune(stageUs: Seq[Seq[Long]], tolUs: Long, watermarkUs: Long): Seq[Seq[Long]] =
    stageUs.head.minOption match {
      case Some(m0) =>
        val lo = math.min(watermarkUs, m0)
        stageUs.zipWithIndex.map { case (cands, i) =>
          if (i == 0) Vector(m0)
          else cands.filter(t => t >= lo && t <= m0 + i.toLong * tolUs).distinct.sorted
        }
      case None =>
        stageUs.map(_.filter(_ >= watermarkUs).distinct.sorted)
    }

  /** The event-time point after which this state's resolution can
    * never change again: with a stage-0 anchor, m0 + (n-1)·tol (any
    * later event exceeds every selectable window and cannot lower the
    * min); with no anchor, the last candidate (once the watermark
    * passes it, every held candidate is below any future t1). None
    * when the state is empty. */
  def freezeUs(stageUs: Seq[Seq[Long]], tolUs: Long): Option[Long] =
    stageUs.head.minOption
      .map(m0 => m0 + (stageUs.size - 1).toLong * tolUs)
      .orElse(stageUs.flatten.maxOption)

  /** The frozen tombstone: just the resolved chain (resolves to the
    * same prefix, O(stages) longs per user — the latestPerKey-style
    * honest "current value" footprint). */
  def collapse(stageUs: Seq[Seq[Long]], tolUs: Long): Seq[Seq[Long]] = {
    val res = resolve(stageUs, tolUs)
    stageUs.indices.map(i => if (i < res.size) Vector(res(i)) else Vector.empty[Long])
  }
}

/** A user's current funnel resolution: matched stage times (prefix,
  * epoch micros) + how deep they got. */
case class FunnelProgress(user_id: Long, matched_us: Seq[Long], depth: Int)

/** One point on a user's retained timeline (epoch micros, tiebreak
  * event id, event type) — [[TransitionState]]'s unit. */
case class TimelinePoint(us: Long, id: Long, tpe: String)

/** Per-user retained timeline for the streaming transition matrix:
  * sorted, truly-adjacent points — every pair of neighbors is a real
  * timeline adjacency (nothing between them can still arrive). */
case class TimelineState(points: Seq[TimelinePoint])

/** A transition-count CHANGE from [[TopicStream.transitionDeltasStream]]:
  * summing `delta` per (from_type, to_type) over any prefix of the
  * stream yields EXACTLY the batch ts24 adjacency counts over the
  * admitted events — late arrivals emit a retraction of the edge they
  * split plus the two edges they create. `ts` is the newest admitted
  * event time that contributed to the change (the change's as-of). */
case class TransitionDelta(user_id: Long, from_type: String, to_type: String,
                           delta: Long, ts: java.sql.Timestamp)

/** The pure state kernel behind [[TopicStream.transitionDeltasStream]]
  * (the FunnelState discipline: side-effect-free so TransitionStateSpec
  * can prove delta-sum == batch adjacency counts over randomized
  * arrival orders, plus the state bound).
  *
  * Invariant that makes deltas sound: retained points are sorted and
  * TRULY adjacent. Arrivals are watermark-admitted (ts >= W), every
  * dropped point is <= the retained boundary (< W), so no arrival can
  * ever land between two retained neighbors' dropped past — inserting
  * between neighbors p,s therefore retracts a previously-emitted
  * (p→s) and emits (p→e), (e→s). */
object TransitionState {
  private def lt(a: TimelinePoint, b: TimelinePoint): Boolean =
    a.us < b.us || (a.us == b.us && a.id < b.id)

  /** Insert `e`, returning the new timeline + the adjacency deltas the
    * insert causes. */
  def insert(points: Vector[TimelinePoint], e: TimelinePoint)
      : (Vector[TimelinePoint], Seq[(String, String, Long)]) = {
    val i = points.indexWhere(p => !lt(p, e))
    val pos = if (i < 0) points.size else i
    val pred = if (pos > 0) Some(points(pos - 1)) else None
    val succ = if (pos < points.size) Some(points(pos)) else None
    val deltas = (pred, succ) match {
      case (Some(p), Some(s)) =>
        Seq((p.tpe, s.tpe, -1L), (p.tpe, e.tpe, 1L), (e.tpe, s.tpe, 1L))
      case (Some(p), None) => Seq((p.tpe, e.tpe, 1L))
      case (None, Some(s)) => Seq((e.tpe, s.tpe, 1L))
      case (None, None) => Seq.empty
    }
    (points.patch(pos, Seq(e), 0), deltas)
  }

  /** Evict points that can never participate again: everything
    * strictly before the newest sub-watermark point. That BOUNDARY
    * point stays — a future arrival (>= W) may still take it as
    * predecessor — so idle users settle at O(1) state (the
    * latestPerKey "current value" footprint), active users at
    * O(events inside the watermark lag). */
  def pruneTimeline(points: Vector[TimelinePoint], watermarkUs: Long): Vector[TimelinePoint] = {
    val idx = points.lastIndexWhere(_.us < watermarkUs)
    if (idx <= 0) points else points.drop(idx)
  }
}

/** Latest-value state per key — ella's subscriber "current value" view. */
case class KeyLatest(user_id: Long, ts: java.sql.Timestamp, value: Double, n_seen: Long)

/** Incoming doc row for the streaming prep/packing operators. */
case class DocArrival(doc_id: Long, source: String, tok_cnt: Int)

/** A doc admitted by the streaming packer: `offset` is its exclusive
  * token prefix within its source, `pack_id` the training sequence it
  * lands in. */
case class PackedDoc(doc_id: Long, source: String, offset: Long, pack_id: Long)

/** Per-source packer state: tokens admitted so far. */
case class PackState(admitted_tokens: Long, n_admitted: Long)

/** Running per-key moments for streaming anomaly detection (exact
  * integer sums — commute, replay-safe). */
case class KeyMoments(n: Long, sum_c: Long, sumsq_c: Long)

/** An arriving ANN query for [[TopicStream.annServeStream]]. */
case class AnnQuery(q_id: Long, ts: java.sql.Timestamp, embedding: Array[Float])

/** Per-key EWMA state: the last up-to-8 cent samples, newest first —
  * the depth-8 dyadic truncation is exactly what bounds this to O(1). */
case class EwmaState(recent_c: Seq[Long])

/** An event with its engine-exact EWMA (ts19's integer form). */
case class SmoothedEvent(event_id: Long, user_id: Long, cents: Long,
                         ewma_millicents: Long)

/** An event flagged as anomalous against its key's PRIOR baseline. */
case class AnomalousEvent(event_id: Long, user_id: Long, value_c: Long, z: Double)

/** Per-key attribution state: first touch ever, latest touch + its
  * event-time microseconds (three scalars — O(1) per user). */
case class AttState(ft: Option[String], lt: Option[String], lt_us: Long)

/** A conversion's attribution credit as assigned at arrival time. */
case class AttributionCredit(event_id: Long, user_id: Long,
                             last_touch: String, first_touch: String,
                             value_c: Long)

/** Per-key tabular-CUSUM accumulators (cents): the one-sided upper and
  * lower sums of Page's test. */
case class CusumState(s_plus_c: Long, s_minus_c: Long)

/** A CUSUM alarm: the event whose arrival pushed its key's one-sided
  * sum past the decision threshold (`side` = "up" | "down"). */
case class CusumAlarm(event_id: Long, user_id: Long, value_c: Long,
                      side: String, s_c: Long)

/** Structured Streaming transforms — the Spark counterpart of ella's
  * pub/sub topic surface (ella-engine/src/table/topic/channel.rs,
  * ella-server flight pub/sub, README "Unified Workflow").
  *
  * `time > now()` streaming-tail queries (README.md:100-105) become
  * `readStream` on the same topic path the batch side reads; the same
  * DataFrame transforms run in both modes (Spark's unified batch/
  * stream contract ≙ ella's unified API).
  *
  * Scale notes: watermarks bound state; windowed aggs shuffle once on
  * (window, key); latest-per-key state is O(distinct keys) spread
  * across executors via hash partitioning on the group key.
  */
object TopicStream {
  /** Tumbling-window counts/sums per event_type with a watermark
    * bounding late data and state size. */
  def windowedStats(events: DataFrame, windowLen: String = "1 hour",
                    watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .withColumn("value_c", round(col("value") * 100).cast("long"))
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value_c")).as("sum_value_cents"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value_cents"))

  /** Stateful latest-value-per-key via flatMapGroupsWithState
    * (ella's per-key current-value cache, updated as rows arrive).
    *
    * State is one O(1) record per DISTINCT key — keeping it forever
    * IS the "current value" semantics, so the default is NoTimeout.
    * For a 100 TB key space where most keys go silent, `ttlSeconds`
    * caps resident state without forking the code: when set, the
    * input is watermarked (`watermarkDelay`) and a key silent past
    * its latest event + ttl (by EVENT time, so replay-deterministic)
    * is evicted; for keys inside the horizon the output is identical
    * to the TTL-disabled form (spec-pinned). A re-appearing evicted
    * key restarts its n_seen count — the one documented divergence. */
  def latestPerKey(events: Dataset[TopicEvent],
                   ttlSeconds: Option[Long] = None,
                   watermarkDelay: String = "1 hour"): Dataset[KeyLatest] = {
    import events.sparkSession.implicits._
    val src = ttlSeconds.fold(events)(_ => events.withWatermark("ts", watermarkDelay))
    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[KeyLatest, KeyLatest](
        OutputMode.Update,
        ttlSeconds.fold(GroupStateTimeout.NoTimeout())(_ => GroupStateTimeout.EventTimeTimeout())) {
        case (key: Long, rows: Iterator[TopicEvent], state: GroupState[KeyLatest]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val prev = state.getOption
            val newest = rows.foldLeft(prev) { (acc, e) =>
              acc match {
                case Some(cur) if !e.ts.after(cur.ts) => Some(cur.copy(n_seen = cur.n_seen + 1))
                case Some(cur) => Some(KeyLatest(key, e.ts, e.value, cur.n_seen + 1))
                case None => Some(KeyLatest(key, e.ts, e.value, 1L))
              }
            }
            newest.foreach { st =>
              state.update(st)
              ttlSeconds.foreach { ttl =>
                armTtl(state, st.ts.getTime + ttl * 1000L)
              }
            }
            newest.iterator
          }
      }
  }

  /** Arm an event-time TTL: fire at `fireMs` (clamped above the
    * current watermark — setTimeoutTimestamp rejects a timestamp the
    * watermark has already passed, and an already-lapsed horizon
    * should fire on the very next trigger). */
  private def armTtl(state: GroupState[_], fireMs: Long): Unit =
    state.setTimeoutTimestamp(math.max(fireMs, state.getCurrentWatermarkMs() + 1L))

  /** Streaming OHLC downsampling — the ts10 batch operator in
    * streaming form: per (tumbling window, event_type) candle with
    * open/high/low/close/volume. Open/close are `min/max(struct(ts,
    * event_id, value))` so they stay map-side-combinable (no ranking
    * window, no per-key sort — the same trick as batch ts10/ts02);
    * the watermark bounds candle state to the open windows. Values in
    * integer cents end-to-end. */
  def ohlcStream(events: DataFrame, windowLen: String = "1 hour",
                 watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .withColumn("value_c", round(col("value") * 100).cast("long"))
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(
        min(struct(col("ts"), col("event_id"), col("value_c"))).as("_first"),
        max(struct(col("ts"), col("event_id"), col("value_c"))).as("_last"),
        max(col("value_c")).as("high_c"),
        min(col("value_c")).as("low_c"),
        count(lit(1)).as("volume"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("_first.value_c").as("open_c"), col("high_c"), col("low_c"),
        col("_last.value_c").as("close_c"), col("volume"))

  /** Per-user activity sessions that close after `gap` of inactivity —
    * the streaming form of the batch ts05_session operator, via
    * Spark's native session_window. The watermark bounds open-session
    * state, so state size is O(active users), not O(history). */
  def sessionStats(events: DataFrame, gap: String = "30 minutes",
                   watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .withColumn("value_c", round(col("value") * 100).cast("long"))
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value_c")).as("sum_value_cents"))
      .select(col("session_window.start").as("s_start"), col("session_window.end").as("s_end"),
        col("user_id"), col("n_events"), col("sum_value_cents"))

  /** Streaming event FUNNEL — ts21's windowed stage chain as
    * per-user live state (the product-analytics "where is this user
    * in the signup flow RIGHT NOW" view). Each arriving stage-type
    * event lands in its user's per-stage candidate set; the chain
    * (t1 = first stage-0, t_i = first stage-i in [t_{i-1},
    * t_{i-1}+tol]) re-resolves from that set, so the stream is
    * EXACTLY batch-consistent for every watermark-admitted event: a
    * late-arriving earlier signup moves the anchor and can lawfully
    * REVOKE a previously-reported deeper match (the spec pins this
    * against `api.funnel` on the union).
    *
    * State is BOUNDED for an infinite stream (r9): every update runs
    * [[FunnelState.prune]] — stage 0 keeps only its min, stage i only
    * candidates inside [min(watermark, t1), t1 + i·tol] (the provably
    * reachable set; FunnelStateSpec proves pruned == full-history
    * resolution over randomized streams) — and an EventTimeTimeout
    * fires once the watermark passes the state's freeze point (t1 +
    * (n-1)·tol, after which no admissible event can change the
    * resolution). On freeze: anchored users collapse to an O(stages)
    * tombstone (kept so post-freeze events provably never re-emit —
    * the latestPerKey "current value" footprint); users with stage-i
    * events but no anchor are REMOVED outright (batch-consistent: a
    * future stage-0 arrives above the watermark, above every held
    * candidate, so those candidates could never chain). With
    * `ttlSeconds` set, anchored tombstones are also evicted ttl after
    * freeze — a re-entering user then starts a fresh funnel, the one
    * documented divergence from all-history batch semantics.
    * Shuffles once on user_id per micro-batch; emits Update-mode rows
    * only for users whose resolution changed. */
  def funnelStream(events: Dataset[TopicEvent], stages: Seq[String],
                   tolSeconds: Long = 43200L,
                   watermarkDelay: String = "1 hour",
                   ttlSeconds: Option[Long] = None): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size,
      s"funnel stages must be distinct (the per-stage state map keys on them): $stages")
    val stageIdx = stages.zipWithIndex.toMap
    val tolUs = tolSeconds * 1000000L
    val ttlMs = ttlSeconds.map(_ * 1000L)
    def micros(ts: java.sql.Timestamp): Long =
      Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
    events
      .filter(e => stageIdx.contains(e.event_type))
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelUserState, FunnelProgress](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout()) {
        case (user: Long, rows: Iterator[TopicEvent], state: GroupState[FunnelUserState]) =>
          if (state.hasTimedOut) {
            // Watermark passed the freeze point: resolution can never
            // change again. Anchored → O(stages) tombstone (or full
            // eviction after the TTL); unanchored → remove (see doc).
            val st = state.get.stageUs
            if (st.head.isEmpty || ttlMs.isDefined) state.remove()
            else state.update(FunnelUserState(FunnelState.collapse(st, tolUs)))
            Iterator.empty
          } else {
            val wUs = state.getCurrentWatermarkMs() * 1000L
            val existed = state.exists
            val prev = state.getOption
              .getOrElse(FunnelUserState(Vector.fill(stages.size)(Vector.empty[Long])))
            val before = FunnelState.resolve(prev.stageUs, tolUs)
            val merged = rows.foldLeft(prev.stageUs) { (st, e) =>
              val i = stageIdx(e.event_type)
              st.updated(i, st(i) :+ micros(e.ts))
            }
            val pruned = FunnelState.prune(merged, tolUs, wUs)
            state.update(FunnelUserState(pruned))
            FunnelState.freezeUs(pruned, tolUs).foreach { f =>
              // Re-arm UNCONDITIONALLY: Spark clears a key's timeout on
              // every invocation that doesn't re-set it, so skipping the
              // set when fireMs lags the watermark would silently drop a
              // pending freeze for any anchored user that keeps receiving
              // post-freeze events — it would never collapse (or, with a
              // TTL, never be evicted). armTtl clamps an already-lapsed
              // fire point to watermark+1 so it fires on the next trigger.
              val fireMs = Math.floorDiv(f, 1000L) + 1L + ttlMs.getOrElse(0L)
              armTtl(state, fireMs)
            }
            val after = FunnelState.resolve(pruned, tolUs)
            if (existed && after == before) Iterator.empty
            else Iterator.single(FunnelProgress(user, after, after.size))
          }
      }
  }

  /** Streaming cohort retention — ts22's arrival loop, state-topic
    * style (the lexIndexStream discipline, not an in-memory agg):
    * each micro-batch reduces to its distinct (user, day) ACTIVITY
    * facts and upserts them keyed `user#day` with the generation
    * `_seq` — replays rewrite identical rows, and a late-arriving
    * EARLIER event simply adds an earlier activity fact. Cohort
    * assignment (min first-seen day per user) happens at READ time
    * in [[currentRetention]], so a cohort lawfully MOVES when an
    * earlier fact arrives — the stream is exactly batch-consistent
    * by construction, with no per-user resolution state at all.
    * Per-batch cost: a batch-sized distinct + upsert; the state
    * topic is the compacted (user, day) activity log. */
  def retentionStream(events: DataFrame, store: graft.sources.TopicStore,
                      topic: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val base = seqBase(store, topic)
    events.writeStream.foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
      val seq = base + 1 + id
      val acts = b.toDF()
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"), col("ts"))
        .groupBy(col("user_id"), col("day"))
        .agg(max(col("ts")).as("time"))
        .select(
          concat(col("user_id"), lit("#"), col("day").cast("date")).as("act_key"),
          col("user_id"), col("day"), col("time"))
      store.upsert(topic, acts, "time", seq = Some(seq))
    }
  }

  /** The CURRENT retention matrix of a [[retentionStream]] topic —
    * ts22's exact output over the accumulated activity facts. */
  def currentRetention(store: graft.sources.TopicStore, topic: String): DataFrame =
    retentionFromActivity(
      store.readMerged(topic, "act_key").select(col("user_id"), col("day")))

  /** The CURRENT weekly DAU/WAU stickiness of a [[retentionStream]]
    * topic — ts31's exact output over the SAME accumulated (user,
    * day) activity facts (one stream writer powers both reports; the
    * tail is the shared batch kernel, so stream and batch can never
    * disagree). Replays and late-arriving earlier events just rewrite
    * or add facts — the report re-derives at read time with zero
    * resolution state. */
  def currentStickiness(store: graft.sources.TopicStore, topic: String): DataFrame =
    graft.operators.TimeSeries.stickinessFromActivity(
      store.readMerged(topic, "act_key").select(col("user_id"), col("day")))

  /** Streaming ACTIVITY-INEQUALITY report, write side — ts33's
    * arrival loop in the rfmStream ADDITIVE-PARTIAL discipline: each
    * micro-batch upserts per-(type, user) event-count partials keyed
    * struct `(type, user, batchId)` (counts are associative, so summing partials
    * at read time reproduces batch counts exactly; replays rewrite
    * identical rows; batch 0 truncates the topic — the
    * fresh-generation reset). Topic bounded by (types × users ×
    * batches), compacted by key. */
  def giniStream(events: DataFrame, store: graft.sources.TopicStore,
                 topic: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val base = seqBase(store, topic)
    events.writeStream.foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
      if (id == 0L) store.truncate(topic)
      val seq = base + 1 + id
      val part = b.toDF().groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("n_ev"), max(col("ts")).as("time"))
        // struct key: event_type AND user_id are both freeform, so a
        // '#'-delimited pack can collide distinct (type, user) pairs
        // (("a#b","c") vs ("a","b#c")) under readMerged's dedup
        .select(struct(col("event_type"), col("user_id"), lit(id).as("batch")).as("gkey"),
          col("event_type"), col("user_id"), col("n_ev"), col("time"))
      if (!part.isEmpty) store.upsert(topic, part, "time", seq = Some(seq))
    }
  }

  /** The CURRENT inequality report of a [[giniStream]] topic — ts33's
    * exact output over the summed partial history, tail shared with
    * the batch kernel verbatim ([[graft.operators.TimeSeries.giniOf]])
    * so stream and batch can never disagree. */
  def currentGini(store: graft.sources.TopicStore, topic: String): DataFrame =
    graft.operators.TimeSeries.giniOf(
        store.readMerged(topic, "gkey")
          .groupBy(col("event_type").as("group"), col("user_id").as("member"))
          .agg(sum(col("n_ev")).as("x")))
      .withColumnRenamed("group", "event_type")

  /** Streaming VALUE-DISTRIBUTION histogram, write side — ts35's
    * arrival loop in the giniStream ADDITIVE-PARTIAL discipline:
    * each micro-batch upserts per-(key, cents) count partials keyed
    * struct `(key, cents, batchId)` (counts are associative — summing partials
    * at read time reproduces the batch histogram exactly; replays
    * rewrite identical rows; batch 0 truncates — the fresh-generation
    * reset). Topic bounded by key × cents-domain × batches, compacted
    * by key. This is the mergeable-quantile-sketch shape: the state
    * is the histogram, a few KB per key at any corpus size. */
  def histStream(events: DataFrame, store: graft.sources.TopicStore,
                 topic: String,
                 keyCol: org.apache.spark.sql.Column = col("event_type"),
                 valueCents: org.apache.spark.sql.Column = round(col("value") * 100).cast("long"))
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val base = seqBase(store, topic)
    events.writeStream.foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
      if (id == 0L) store.truncate(topic)
      val seq = base + 1 + id
      val part = b.toDF()
        .select(keyCol.as("key"), valueCents.as("cents"), col("ts"))
        .groupBy(col("key"), col("cents"))
        .agg(count(lit(1)).as("cnt"), max(col("ts")).as("time"))
        // struct key, not a '#'-delimited string: a user key value
        // containing the delimiter must not collide distinct
        // (key, cents, batch) partials under readMerged's
        // latest-per-hkey dedup
        .select(struct(col("key"), col("cents"), lit(id).as("batch")).as("hkey"),
          col("key"), col("cents"), col("cnt"), col("time"))
      if (!part.isEmpty) store.upsert(topic, part, "time", seq = Some(seq))
    }
  }

  /** The CURRENT per-key quantile report of a [[histStream]] topic —
    * ts35's exact output over the summed partial history, tail shared
    * with the batch kernel verbatim
    * ([[graft.operators.TimeSeries.histQuantilesOf]]) so stream and
    * batch can never disagree. */
  def currentQuantiles(store: graft.sources.TopicStore, topic: String,
                       qsMilli: Seq[Int] = Seq(250, 500, 750, 900, 990)): DataFrame =
    graft.operators.TimeSeries.histQuantilesOf(
      store.readMerged(topic, "hkey")
        .groupBy(col("key"), col("cents"))
        .agg(sum(col("cnt")).as("cnt")),
      qsMilli)

  /** Streaming WEEK-OVER-WEEK counts, write side — ts38's live twin
    * in [[histStream]]'s additive-partials discipline: each
    * micro-batch upserts its per-(type, epoch-week) count partial
    * keyed struct `(type, wk, batch)` (counts merge by SUM, so the topic is
    * bounded by type × week-domain × batches and replays rewrite
    * identical partials), and [[currentWow]] reads the SAME
    * [[graft.operators.TimeSeries.wowOf]] kernel over the summed
    * history — stream and batch can never disagree. */
  def wowStream(events: DataFrame, store: graft.sources.TopicStore,
                topic: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val base = seqBase(store, topic)
    events.writeStream.foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
      if (id == 0L) store.truncate(topic)
      val seq = base + 1 + id
      val part = b.toDF()
        .groupBy(col("event_type"), expr("CAST(ts AS LONG) DIV 604800").as("wk"))
        .agg(count(lit(1)).as("cnt"), max(col("ts")).as("time"))
        // struct key (see histStream): '#' in event_type must not
        // collide distinct (type, week, batch) partials
        .select(struct(col("event_type"), col("wk"), lit(id).as("batch")).as("hkey"),
          col("event_type"), col("wk"), col("cnt"), col("time"))
      if (!part.isEmpty) store.upsert(topic, part, "time", seq = Some(seq))
    }
  }

  /** The CURRENT week-over-week report of a [[wowStream]] topic —
    * ts38's exact output over the summed partial history, tail shared
    * with the batch kernel verbatim. */
  def currentWow(store: graft.sources.TopicStore, topic: String): DataFrame =
    graft.operators.TimeSeries.wowOf(
        store.readMerged(topic, "hkey")
          .groupBy(col("event_type"), col("wk"))
          .agg(sum(col("cnt")).as("n_events")))
      .orderBy(col("event_type"), col("wk"))

  /** Streaming EMBEDDING-DRIFT monitor, write side (ss35's live twin
    * — drift detection is inherently a streaming job: the reference
    * half is yesterday's snapshot, the current half arrives in
    * micro-batches): each batch's vectors collapse to per-cell
    * ADDITIVE partials (both halves' populations + quantized
    * coordinate sums — [[graft.operators.Similarity.driftCellAgg]],
    * the same aggregation the batch kernel runs) keyed `cell#batch`,
    * so the topic stays bounded by 16 cells × batches and replays
    * idempotently. Expects (vec_id, embedding, is_new) rows. */
  def driftStream(vectors: DataFrame, store: graft.sources.TopicStore,
                  topic: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val base = seqBase(store, topic)
    vectors.writeStream.foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
      if (id == 0L) store.truncate(topic)
      val seq = base + 1 + id
      val part = graft.operators.Similarity.driftCellAgg(b.toDF())
        .select(concat(col("cell"), lit("#"), lit(id)).as("hkey"),
          col("*"), current_timestamp().as("time"))
      if (!part.isEmpty) store.upsert(topic, part, "time", seq = Some(seq))
    }
  }

  /** The CURRENT drift report of a [[driftStream]] topic — ss35's
    * exact output over the summed partial history, tail shared with
    * the batch kernel verbatim
    * ([[graft.operators.Similarity.driftReportOf]]): stream and batch
    * can never disagree. */
  def currentDrift(store: graft.sources.TopicStore, topic: String): DataFrame = {
    val sums = Seq("n_old", "n_new") ++
      (1 to 4).flatMap(i => Seq(s"qo$i", s"qn$i"))
    val merged = store.readMerged(topic, "hkey")
      .groupBy(col("cell"))
      .agg(sum(col(sums.head)).as(sums.head),
        sums.tail.map(c => sum(col(c)).as(c)): _*)
    graft.operators.Similarity.driftReportOf(merged).orderBy(col("cell"))
  }

  /** Streaming TREND monitor, write side (ts39's live twin — "is
    * this metric trending" is a standing dashboard question, and the
    * Theil–Sen input is just the daily count rollup, which is
    * additive): per batch one (type, day, batch) count partial keyed
    * struct `(type, dn, batch)` — the wowStream discipline; topic bounded by
    * type × calendar × batches, replay-idempotent. */
  def trendStream(events: DataFrame, store: graft.sources.TopicStore,
                  topic: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val base = seqBase(store, topic)
    events.writeStream.foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
      if (id == 0L) store.truncate(topic)
      val seq = base + 1 + id
      val part = b.toDF()
        .groupBy(col("event_type"), expr("CAST(ts AS LONG) DIV 86400").as("dn"))
        .agg(count(lit(1)).as("cnt"), max(col("ts")).as("time"))
        // struct key (see histStream): '#' in event_type must not
        // collide distinct (type, day, batch) partials
        .select(struct(col("event_type"), col("dn"), lit(id).as("batch")).as("hkey"),
          col("event_type"), col("dn"), col("cnt"), col("time"))
      if (!part.isEmpty) store.upsert(topic, part, "time", seq = Some(seq))
    }
  }

  /** The CURRENT Theil–Sen trend report of a [[trendStream]] topic —
    * ts39's exact output over the summed daily history, tail shared
    * with the batch kernel verbatim
    * ([[graft.operators.TimeSeries.theilSenOf]]). */
  def currentTrend(store: graft.sources.TopicStore, topic: String): DataFrame =
    graft.operators.TimeSeries.theilSenOf(
        store.readMerged(topic, "hkey")
          .groupBy(col("event_type"), col("dn"))
          .agg(sum(col("cnt")).as("x")))
      .orderBy(col("event_type"))

  /** The CURRENT burst report of a [[trendStream]] topic — ts41's
    * exact output over the summed daily history, tail shared with
    * the batch kernel verbatim
    * ([[graft.operators.TimeSeries.burstsOf]]): ONE state-topic
    * writer powers the trend AND burst monitors — the same (type,
    * day, batch) count partials, two read-time tails. */
  def currentBursts(store: graft.sources.TopicStore, topic: String): DataFrame =
    graft.operators.TimeSeries.burstsOf(
        store.readMerged(topic, "hkey")
          .groupBy(col("event_type"), col("dn"))
          .agg(sum(col("cnt")).as("n")))
      .orderBy(col("event_type"), col("dn"))

  /** ts42's live read over the SAME trendStream topic — the third
    * read tail off the one (type, day, batch) partial ledger (trend:
    * is it rising; burst: did today spike; cycle: what cadence does
    * it beat at). Tail = `TimeSeries.cycleScanOf` verbatim on the
    * merged day counts. */
  def currentCycles(store: graft.sources.TopicStore, topic: String): DataFrame =
    graft.operators.TimeSeries.cycleScanOf(
        store.readMerged(topic, "hkey")
          .groupBy(col("event_type"), col("dn"))
          .agg(sum(col("cnt")).as("n")))
      .orderBy(col("event_type"), col("period"))

  /** Streaming GOPHER GATE, write side (tx33's live twin — the
    * curation funnel as arrivals flow in, so a drifting upstream
    * crawler shows up as a rule's kill rate moving): every column of
    * the gate aggregate is a sum of per-doc indicators, so each batch
    * stores ONE additive partial row keyed `g#batch` (bounded by the
    * batch count; replay-idempotent). Expects (doc_id, text) rows. */
  def gateStream(docs: DataFrame, store: graft.sources.TopicStore,
                 topic: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val base = seqBase(store, topic)
    docs.writeStream.foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
      if (id == 0L) store.truncate(topic)
      val seq = base + 1 + id
      val part = graft.operators.Curation.gopherAgg(b.toDF())
        .select(concat(lit("g#"), lit(id)).as("hkey"), col("*"),
          current_timestamp().as("time"))
      if (!part.isEmpty) store.upsert(topic, part, "time", seq = Some(seq))
    }
  }

  /** The CURRENT gate report of a [[gateStream]] topic — tx33's
    * exact output over the summed partial history, the 6-row stack
    * shared with the batch kernel verbatim
    * ([[graft.operators.Curation.gopherStack]]). */
  def currentGate(store: graft.sources.TopicStore, topic: String): DataFrame = {
    val cols = Seq("n0", "s1", "s2", "s3", "s4", "s5", "m2", "m3", "m4", "m5")
    graft.operators.Curation.gopherStack(
      store.readMerged(topic, "hkey")
        .agg(sum(col(cols.head)).as(cols.head),
          cols.tail.map(c => sum(col(c)).as(c)): _*))
  }

  /** Streaming CODE-ROUTE census, write side (tx39's live twin — the
    * mixed-corpus fork ratio as arrivals flow: a source flipping from
    * prose to config dumps shows up as its code share moving before
    * any prose gate starts killing the wrong docs): the per-doc gate
    * is pure scan compute, so each batch stores ONE additive partial
    * per (lang, is_code) keyed by the struct (lang, is_code, batch) —
    * bounded by langs × 2 × batches, replay-idempotent, collision-
    * proof under readMerged (struct key, not a delimited pack).
    * Expects (doc_id, text, lang) rows. */
  def routeStream(docs: DataFrame, store: graft.sources.TopicStore,
                  topic: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val base = seqBase(store, topic)
    docs.writeStream.foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
      if (id == 0L) store.truncate(topic)
      val seq = base + 1 + id
      val bd = b.toDF()
      val part = graft.operators.TextOps.codeDetectOf(
          bd.select(col("doc_id"), col("text")))
        .join(bd.select(col("doc_id"), col("lang")), "doc_id")
        .groupBy(col("lang"), col("is_code"))
        .agg(count(lit(1)).as("n_docs"))
        .select(struct(col("lang"), col("is_code"), lit(id).as("batch")).as("hkey"),
          col("lang"), col("is_code"), col("n_docs"),
          current_timestamp().as("time"))
      if (!part.isEmpty) store.upsert(topic, part, "time", seq = Some(seq))
    }
  }

  /** tx39's live read: per-lang doc count, code count, and code share
    * milli off the merged additive partials. */
  def currentRoutes(store: graft.sources.TopicStore, topic: String): DataFrame =
    store.readMerged(topic, "hkey")
      .groupBy(col("lang"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(when(col("is_code"), col("n_docs")).otherwise(0L)).as("n_code"))
      .withColumn("code_milli", expr("(n_code * 1000) DIV n_docs"))
      .orderBy(col("lang"))

  /** Streaming CONVERSION-LAG survival, write side — ts34's start
    * facts in the topPathsStream CONTENT-KEY discipline: each signup
    * lands event-grain keyed `user#ts_us#event_id`, and the per-user
    * FIRST start derives at READ time — so a late EARLIER signup
    * lawfully moves a user's anchor and re-buckets their conversion
    * (pinned in spec). Purchases come from the SAME event-grain
    * revenue ledger [[ltvStream]] maintains (its facts carry the
    * exact purchase time), so one ledger powers LTV and
    * conversion-lag together. */
  def conversionStartStream(events: DataFrame, store: graft.sources.TopicStore,
                            topic: String,
                            isStart: org.apache.spark.sql.Column =
                              col("event_type") === "signup")
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val base = seqBase(store, topic)
    events.writeStream.foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
      val seq = base + 1 + id
      val facts = b.toDF().filter(isStart)
        .select(
          concat(col("user_id"), lit("#"), unix_micros(col("ts")),
            lit("#"), col("event_id")).as("skey"),
          col("user_id"), col("ts").as("t_start"), col("ts").as("time"))
      if (!facts.isEmpty) store.upsert(topic, facts, "time", seq = Some(seq))
    }
  }

  /** The CURRENT conversion-lag survival curve of a
    * [[conversionStartStream]] start topic + an [[ltvStream]] revenue
    * topic — ts34's exact output, tail shared with batch verbatim
    * ([[graft.operators.TimeSeries.conversionLagFacts]]). */
  def currentConversionLag(store: graft.sources.TopicStore, startTopic: String,
                           revTopic: String): DataFrame =
    graft.operators.TimeSeries.conversionLagFacts(
      store.readMerged(startTopic, "skey")
        .select(col("user_id"), col("t_start").as("t")),
      store.readMerged(revTopic, "rkey")
        .select(col("user_id"), col("time").as("t")))

  /** Streaming cohort LTV, write side — ts32's arrival loop in the
    * topPathsStream CONTENT-KEY discipline (no generations, no
    * watermark, no resolution state): each micro-batch upserts its
    * revenue events as facts keyed `user#ts_us#event_id`, so replays,
    * late arrivals, and fresh-checkpoint relaunches just rewrite or
    * add identical rows — revenue is ADDITIVE, which is exactly why
    * the topic stores event-grain facts (an overwrite-by-(user, day)
    * key would drop same-day revenue across batches; an additive
    * per-batch delta would need transitionsStream's generation
    * bookkeeping). The topic is the compacted revenue ledger, bounded
    * by revenue-event count; cohorts come from the retentionStream
    * activity topic at READ time in [[currentLtv]]. */
  def ltvStream(events: DataFrame, store: graft.sources.TopicStore,
                topic: String,
                isRevenue: org.apache.spark.sql.Column = col("event_type") === "purchase",
                valueCents: org.apache.spark.sql.Column = round(col("value") * 100).cast("long"))
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val base = seqBase(store, topic)
    events.writeStream.foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
      val seq = base + 1 + id
      val facts = b.toDF().filter(isRevenue)
        .select(
          concat(col("user_id"), lit("#"), unix_micros(col("ts")),
            lit("#"), col("event_id")).as("rkey"),
          col("user_id"), date_trunc("day", col("ts")).as("day"),
          valueCents.as("vc"), col("ts").as("time"))
      if (!facts.isEmpty) store.upsert(topic, facts, "time", seq = Some(seq))
    }
  }

  /** The CURRENT cohort-LTV matrix of an [[ltvStream]] revenue topic
    * + a [[retentionStream]] activity topic — ts32's exact output:
    * cohorts = min activity day per user (a late earlier event
    * lawfully MOVES a user's cohort, exactly like currentRetention),
    * revenue summed from the event-grain ledger, tail shared with
    * batch ts32 verbatim ([[graft.operators.TimeSeries.ltvFromFacts]])
    * so stream and batch can never disagree. */
  def currentLtv(store: graft.sources.TopicStore, actTopic: String,
                 revTopic: String): DataFrame = {
    val first = store.readMerged(actTopic, "act_key")
      .groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
    val rev = store.readMerged(revTopic, "rkey")
      .select(col("user_id"), col("day"), col("vc"))
    graft.operators.TimeSeries.ltvFromFacts(first, rev)
  }

  /** ts22's tail over (user_id, day) activity rows: one per-user agg
    * (cohort min + day set), calendar-sized rollup, cohort sizes from
    * the rollup's own offset-0 rows via one window over the matrix. */
  private def retentionFromActivity(acts: DataFrame): DataFrame = {
    val perUser = acts.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort"), collect_set(col("day")).as("days"))
    val rollup = perUser
      .select(col("cohort"), explode(col("days")).as("day"))
      .groupBy(col("cohort"), col("day"))
      .agg(count(lit(1)).as("n_active"))
    val wc = org.apache.spark.sql.expressions.Window.partitionBy(col("cohort"))
    rollup
      .withColumn("n_cohort",
        max(when(col("day") === col("cohort"), col("n_active"))).over(wc))
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
        datediff(col("day"), col("cohort")).cast("long").as("day_offset"),
        col("n_active"), col("n_cohort"),
        expr("(n_active * 1000) DIV n_cohort").as("retention_milli"))
  }

  /** Streaming event TRANSITION MATRIX — ts24 as a live changelog.
    * Each user's watermark-bounded timeline lives in
    * [[TransitionState]]; an arriving event (including a LATE one
    * landing between two already-seen events) emits the adjacency
    * deltas its insertion causes — retracting the edge it splits,
    * adding the two it creates — so summing deltas per (from, to)
    * over any stream prefix reproduces the batch ts24 counts over
    * the admitted events EXACTLY (TransitionStateSpec proves this
    * over randomized arrival orders; StreamingSpec pins it against
    * `api.transitionMatrix` end-to-end).
    *
    * State is bounded by construction: [[TransitionState.pruneTimeline]]
    * keeps only points the watermark still allows a new neighbor for —
    * idle users settle at ONE retained point (the latestPerKey
    * "current value" footprint), active users at O(arrivals inside
    * the watermark lag). With `ttlSeconds`, users silent past their
    * last point + ttl are evicted outright; a re-appearing user then
    * misses the one boundary edge a batch recompute would count — the
    * same documented divergence as latestPerKey's n_seen restart.
    * Shuffles once on user_id per micro-batch. */
  def transitionDeltasStream(events: Dataset[TopicEvent],
                             watermarkDelay: String = "1 hour",
                             ttlSeconds: Option[Long] = None): Dataset[TransitionDelta] = {
    import events.sparkSession.implicits._
    def micros(ts: java.sql.Timestamp): Long =
      Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TimelineState, TransitionDelta](
        OutputMode.Append,
        ttlSeconds.fold(GroupStateTimeout.NoTimeout())(_ => GroupStateTimeout.EventTimeTimeout())) {
        case (user: Long, rows: Iterator[TopicEvent], state: GroupState[TimelineState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val wUs = state.getCurrentWatermarkMs() * 1000L
            var pts = state.getOption.map(_.points.toVector).getOrElse(Vector.empty)
            val acc = scala.collection.mutable.LinkedHashMap.empty[(String, String), Long]
            val batch = rows.toVector.sortBy(e => (micros(e.ts), e.event_id))
            batch.foreach { e =>
              val (np, ds) = TransitionState.insert(pts,
                TimelinePoint(micros(e.ts), e.event_id, e.event_type))
              pts = np
              ds.foreach { case (f, t, d) => acc((f, t)) = acc.getOrElse((f, t), 0L) + d }
            }
            pts = TransitionState.pruneTimeline(pts, wUs)
            state.update(TimelineState(pts))
            ttlSeconds.foreach { ttl =>
              pts.lastOption.foreach { last =>
                armTtl(state, Math.floorDiv(last.us, 1000L) + ttl * 1000L)
              }
            }
            val asOf = batch.lastOption.map(_.ts)
              .getOrElse(new java.sql.Timestamp(Math.floorDiv(wUs, 1000L)))
            acc.iterator.filter(_._2 != 0L)
              .map { case ((f, t), d) => TransitionDelta(user, f, t, d, asOf) }
              .toVector.iterator
          }
      }
  }

  /** Fold [[transitionDeltasStream]] into a durable MATRIX topic:
    * each micro-batch's deltas reduce to one row per (from, to),
    * keyed struct `(batchId, from, to)` with seq = batchId — a replayed batch
    * rewrites the identical rows (replay-idempotent), and the live
    * matrix is the additive read [[currentTransitions]]. Per-batch
    * cost: a batch-sized rollup + upsert; the topic grows with
    * CHANGED edges per batch, never the corpus.
    *
    * GENERATIONS: this topic is an ADDITIVE changelog owned by one
    * stream lifetime — unlike the content-keyed state topics
    * (retention, ann), where a relaunched stream converges by
    * overwrite, a fresh-CHECKPOINT relaunch here re-reads the source
    * and re-emits delta history, so the prior generation's rows would
    * double-count (and its batch-0 keys collide). Batch id 0 is the
    * unambiguous fresh-generation signal (a checkpoint RESUME replays
    * only the in-flight batch, whose id is 0 only if batch 0 never
    * committed — in which case any existing rows are stale
    * generations too), so on batch 0 the topic is truncated before
    * the write. A replayed batch 0 truncates its own rows and
    * rewrites them identically — still idempotent. */
  def transitionsStream(deltas: Dataset[TransitionDelta],
                        store: graft.sources.TopicStore, topic: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val base = seqBase(store, topic)
    deltas.toDF().writeStream.outputMode("append")
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (id == 0L) store.truncate(topic)
        val seq = base + 1 + id
        val rows = b.toDF()
          .groupBy(col("from_type"), col("to_type"))
          .agg(sum(col("delta")).as("delta"), max(col("ts")).as("time"))
          .filter(col("delta") =!= 0L)
          .select(
            // struct key: from_type and to_type are both freeform —
            // see giniStream's gkey comment
            struct(lit(id).as("batch"), col("from_type"), col("to_type")).as("tkey"),
            col("from_type"), col("to_type"), col("delta"), col("time"))
        if (!rows.isEmpty) store.upsert(topic, rows, "time", seq = Some(seq))
      }
  }

  /** The CURRENT transition matrix of a [[transitionsStream]] topic —
    * ts24's exact output shape (n, n_from, p_milli) over the summed
    * delta history. The sum runs over the edge-domain-sized topic. */
  def currentTransitions(store: graft.sources.TopicStore, topic: String): DataFrame = {
    val m = store.readMerged(topic, "tkey")
      .groupBy(col("from_type"), col("to_type"))
      .agg(sum(col("delta")).as("n"))
      .filter(col("n") > 0L)
    val wf = org.apache.spark.sql.expressions.Window.partitionBy(col("from_type"))
    m.withColumn("n_from", sum(col("n")).over(wf))
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        expr("(n * 1000) DIV n_from").as("p_milli"))
  }

  /** Streaming TOP PATHS — ts23's arrival loop, state-topic style:
    * each micro-batch keeps, per user, ITS OWN first-3 candidate
    * events (sound cover: any event in a user's global first-3 has at
    * most 2 smaller events in its OWN batch, so it is in that batch's
    * first-3 — the candidate topic provably contains the true
    * first-3) and upserts them CONTENT-KEYED `user#ts_us#event_id`.
    * Replays, late-arriving EARLIER events, and even fresh-checkpoint
    * relaunches all just rewrite or add candidate facts — idempotent
    * with no generation bookkeeping, no watermark, no per-user
    * resolution state. The first-3 ranking and path rollup happen at
    * READ time in [[currentTopPaths]] (ts23's exact tail), so the
    * stream is batch-consistent by construction. Per-batch cost: a
    * batch-sized window + upsert; the topic holds ≤3 candidates per
    * (user, batch), compacted by key. */
  def topPathsStream(events: Dataset[TopicEvent], store: graft.sources.TopicStore,
                     topic: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val base = seqBase(store, topic)
    events.toDF().writeStream.outputMode("append")
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val seq = base + 1 + id
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val cand = b.toDF()
          .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
          .select(
            concat(col("user_id"), lit("#"), unix_micros(col("ts")),
              lit("#"), col("event_id")).as("pkey"),
            col("user_id"), unix_micros(col("ts")).as("ts_us"),
            col("event_id"), col("event_type"), col("ts").as("time"))
        if (!cand.isEmpty) store.upsert(topic, cand, "time", seq = Some(seq))
      }
  }

  /** The CURRENT top-paths report of a [[topPathsStream]] topic —
    * ts23's exact output over the accumulated candidate facts: rank
    * the stored candidates to each user's true first-3, then reuse
    * the batch path rollup verbatim. */
  def currentTopPaths(store: graft.sources.TopicStore, topic: String,
                      k: Int = 20): DataFrame =
    graft.operators.TimeSeries.topPathsOf(
      store.readMerged(topic, "pkey")
        .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"),
          col("event_id"), col("event_type")), k)

  /** Streaming RFM — ts27's arrival loop as an ADDITIVE changelog
    * (the transitionsStream discipline, generations included): each
    * micro-batch reduces to per-user partials — max(ts), count,
    * cent-quantized spend sum, all associative — keyed `user#batchId`
    * with seq = batchId, so a replayed batch rewrites identical rows.
    * Batch 0 truncates the topic first (fresh-generation reset; see
    * [[transitionsStream]]'s GENERATIONS note — additive history from
    * a prior stream lifetime would double-count). Segmentation (the
    * three global quartile orders) happens at READ time in
    * [[currentRfm]] over the user-domain-sized fold, so quartile
    * boundaries lawfully move as users accumulate history — exactly
    * batch-consistent, no watermark, no per-user resolution state.
    * Per-batch cost: a batch-sized agg + upsert; the topic grows with
    * ACTIVE users per batch, never the corpus. */
  def rfmStream(events: Dataset[TopicEvent], store: graft.sources.TopicStore,
                topic: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val base = seqBase(store, topic)
    events.toDF().writeStream.outputMode("append")
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (id == 0L) store.truncate(topic)
        val seq = base + 1 + id
        val part = b.toDF().groupBy(col("user_id"))
          .agg(max(col("ts")).as("last_ts"), count(lit(1)).as("n_events"),
            sum(round(col("value") * 100).cast("long")).as("value_cents"))
          .select(concat(col("user_id"), lit("#"), lit(id)).as("rkey"),
            col("user_id"), col("last_ts"), col("n_events"),
            col("value_cents"), col("last_ts").as("time"))
        if (!part.isEmpty) store.upsert(topic, part, "time", seq = Some(seq))
      }
  }

  /** The CURRENT RFM segmentation of a [[rfmStream]] topic — ts27's
    * exact output over the summed partial history: fold partials per
    * user (max/sum/sum — associative, so batching can't skew them),
    * anchor on the fold's own max last_ts (== the corpus max ts), and
    * reuse the batch quartile tail verbatim. */
  def currentRfm(store: graft.sources.TopicStore, topic: String): DataFrame = {
    val perUser = store.readMerged(topic, "rkey")
      .groupBy(col("user_id"))
      .agg(max(col("last_ts")).as("last_ts"), sum(col("n_events")).as("n_events"),
        sum(col("value_cents")).as("value_cents"))
    val anchor = perUser.agg(max(col("last_ts")).as("anchor_ts"))
    graft.operators.TimeSeries.rfmSegment(perUser, anchor)
  }

  /** Streaming FUNNEL TIMING — ts25 as a live report, closing the
    * last events-table report without a streaming form: the per-user
    * resolution ALREADY lives in [[funnelStream]] (exactly
    * batch-consistent under late arrivals, state bounded), so the
    * timing twin just folds its Update-mode emissions into an upsert
    * topic keyed by user — latest resolution wins, replays rewrite
    * identical rows — and [[currentFunnelTiming]] derives the report
    * at read time. No new state, no watermark beyond funnelStream's
    * own: a late anchor that upgrades or REVOKES a user's depth
    * flows through as that user's next resolution row and moves the
    * timing stats exactly as a batch recompute would. */
  def funnelTimingStream(events: Dataset[TopicEvent], stages: Seq[String],
                         store: graft.sources.TopicStore, topic: String,
                         tolSeconds: Long = 43200L,
                         watermarkDelay: String = "1 hour")
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val base = seqBase(store, topic)
    funnelStream(events, stages, tolSeconds, watermarkDelay).toDF()
      .writeStream.outputMode("update")
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val rows = b.toDF()
          .select(col("user_id"),
            concat_ws(",", transform(col("matched_us"), _.cast("string"))).as("matched"),
            col("depth"), lit(0L).cast("timestamp").as("time"))
        if (!rows.isEmpty) store.upsert(topic, rows, "time", seq = Some(base + 1 + id))
      }
  }

  /** The CURRENT funnel-timing report of a [[funnelTimingStream]]
    * topic — ts25's exact output over each user's LATEST resolution:
    * matched stage times unpack to the t1..tN frame and the batch
    * report kernel ([[graft.operators.TimeSeries.funnelTimingReport]])
    * runs verbatim. */
  def currentFunnelTiming(store: graft.sources.TopicStore, topic: String,
                          stages: Seq[String]): DataFrame = {
    val merged = store.readMerged(topic, "user_id")
      .select(col("user_id"), split(col("matched"), ",").as("ms"))
    val withT = stages.indices.foldLeft(merged) { (df, i) =>
      // a depth-d user has d entries (depth 0 = one empty string from
      // the split): guard the ANSI cast — missing/empty => null t_i
      val el = try_element_at(col("ms"), lit(i + 1))
      df.withColumn(s"t${i + 1}",
        timestamp_micros(when(el.isNotNull && el =!= "", el.cast("long"))))
    }
    graft.operators.TimeSeries.funnelTimingReport(withT, stages)
  }

  /** Streaming A/B LIFT — ts26's arrival loop, completing the
    * product-analytics family's streaming twins (funnel, retention,
    * paths, transitions, RFM, and now experiment lift): each
    * micro-batch reduces to per-user partials — min(view ts),
    * max(purchase ts), both associative — keyed `user#batchId` (the
    * rfmStream/transitionsStream additive-changelog discipline;
    * batch 0 truncates for fresh-generation safety). Arm assignment,
    * the conversion test, and the per-arm rollup all happen at READ
    * time in [[currentAbLift]] over the user-domain fold, so a late
    * EARLIER view lawfully re-exposes a user and can flip their
    * conversion — exactly batch-consistent, no watermark, no per-user
    * resolution state. Per-batch cost: a batch-sized agg + upsert. */
  def abLiftStream(events: Dataset[TopicEvent], store: graft.sources.TopicStore,
                   topic: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val base = seqBase(store, topic)
    events.toDF().writeStream.outputMode("append")
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (id == 0L) store.truncate(topic)
        val seq = base + 1 + id
        val part = b.toDF().groupBy(col("user_id"))
          .agg(min(when(col("event_type") === "view", col("ts"))).as("first_view"),
            max(when(col("event_type") === "purchase", col("ts"))).as("last_purchase"),
            max(col("ts")).as("time"))
          .select(concat(col("user_id"), lit("#"), lit(id)).as("akey"),
            col("user_id"), col("first_view"), col("last_purchase"), col("time"))
        if (!part.isEmpty) store.upsert(topic, part, "time", seq = Some(seq))
      }
  }

  /** The CURRENT experiment report of an [[abLiftStream]] topic —
    * ts26's exact output over the folded partials: min/max are
    * associative, so batching can't skew exposure or conversion, and
    * the report tail is batch ts26's verbatim ([[graft.operators
    * .TimeSeries.abLiftReport]], the shared kernel). */
  def currentAbLift(store: graft.sources.TopicStore, topic: String): DataFrame = {
    val perUser = store.readMerged(topic, "akey")
      .groupBy(col("user_id"))
      .agg(min(col("first_view")).as("first_view"),
        max(col("last_purchase")).as("last_purchase"))
    graft.operators.TimeSeries.abLiftReport(perUser)
  }

  /** Streaming ASSOCIATION RULES — ts29's arrival loop, state-topic
    * style (the retentionStream discipline, no generations needed):
    * each micro-batch reduces to its distinct (user, event_type)
    * BASKET facts and upserts them content-keyed struct `(user, type)` —
    * replays, late arrivals, and fresh-checkpoint relaunches just
    * rewrite/add facts, so there is no generation bookkeeping and no
    * per-user resolution state at all. The report (baskets → one
    * marker/singles/pairs explode → tiny rollup) happens at READ time
    * in [[currentAssoc]] via the shared batch kernel, so
    * support/confidence/lift lawfully move as baskets accumulate —
    * exactly batch-consistent by construction. Per-batch cost: a
    * batch-sized distinct + upsert; the topic is the compacted
    * (user, type) basket log, bounded by users × |event_type|. */
  def assocStream(events: Dataset[TopicEvent], store: graft.sources.TopicStore,
                  topic: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val base = seqBase(store, topic)
    events.toDF().writeStream.outputMode("append")
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val facts = b.toDF()
          .groupBy(col("user_id"), col("event_type"))
          .agg(max(col("ts")).as("time"))
          .select(
            // struct key: user_id and event_type are both freeform —
            // see giniStream's gkey comment
            struct(col("user_id"), col("event_type")).as("fact_key"),
            col("user_id"), col("event_type"), col("time"))
        if (!facts.isEmpty)
          store.upsert(topic, facts, "time", seq = Some(base + 1 + id))
      }
  }

  /** The CURRENT association-rules report of an [[assocStream]] topic
    * — ts29's exact output over the accumulated basket facts via the
    * shared kernel ([[graft.operators.TimeSeries.assocReport]]). */
  def currentAssoc(store: graft.sources.TopicStore, topic: String): DataFrame =
    graft.operators.TimeSeries.assocReport(
      store.readMerged(topic, "fact_key")
        .select(col("user_id"), col("event_type")))

  /** Streaming training-data prep — the px01 batch pipeline in
    * streaming form: language gate → token-band quality gate → exact
    * dedup within the watermark horizon (state bounded by the
    * watermark, so dedup memory is O(docs per window), not O(corpus)).
    * Each micro-batch flows through the same narrow projections the
    * batch pipeline plans; dedup state hash-partitions across
    * executors on the content hash. */
  def prepStream(docs: DataFrame, watermarkDelay: String = "10 minutes",
                 minTokens: Int = 3, maxTokens: Int = 1000): DataFrame =
    docs
      .withWatermark("ts", watermarkDelay)
      .filter(col("lang") === "en")
      .withColumn("tok_cnt", wordCount(col("text")))
      .filter(col("tok_cnt") >= minTokens && col("tok_cnt") <= maxTokens)
      .withColumn("chash", md5(col("text")))
      .dropDuplicatesWithinWatermark("chash")

  /** Streaming incremental dedup — dd12's exact-hash check in
    * streaming form: every arriving doc's content hash stream-static
    * joins the ESTABLISHED corpus's fingerprint frame (a `chash`
    * column, typically a TopicStore fingerprint topic read as a
    * batch frame), flagging known content on arrival. The join is
    * stateless (static side re-planned per micro-batch, so topic
    * appends between batches are picked up); the only state is the
    * watermark-bounded within-stream dedup, so this scales with the
    * ARRIVAL RATE, never the corpus. */
  def dedupAgainstStream(docs: DataFrame, fingerprints: DataFrame,
                         watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withWatermark("ts", watermarkDelay)
      .withColumn("chash", md5(col("text")))
      .dropDuplicatesWithinWatermark("chash")
      .join(fingerprints.select(col("chash")).distinct()
        .withColumn("_known", lit(true)), Seq("chash"), "left")
      .withColumn("is_known", coalesce(col("_known"), lit(false)))
      .select(col("doc_id"), col("ts"), col("chash"), col("is_known"))

  /** [[dedupAgainstStream]]'s scale path — dd14's Bloom prefilter per
    * micro-batch. The stream-static join above re-keys the corpus's
    * distinct fingerprints EVERY batch (the static side re-plans per
    * trigger); here each batch's content hashes fold into a broadcast
    * Bloom filter, the fingerprint topic's scan is pruned by
    * `might_contain` before any exchange, and only survivors join
    * back — per-batch cost = one fingerprint-topic scan plus a
    * survivors-sized shuffle, never a corpus-wide one. Flags land in
    * `outTopic` via seq=batchId upserts (replay-idempotent); newly
    * seen fingerprints are absorbed into `fpTopic` so the next batch
    * checks against them (duplicate fp rows from a replayed batch are
    * harmless — every reader distincts the fingerprint set). */
  def dedupBatchBloom(store: graft.sources.TopicStore, fpTopic: String,
                      outTopic: String)(batch: DataFrame, batchId: Long): Unit = {
    import graft.functions.BloomFunctions._
    val hashed = batch
      .select(col("doc_id"), col("ts"), md5(col("text")).as("chash"))
      .persist()
    val n = hashed.count() // the arriving batch — small by definition
    if (n > 0) {
      val bloom = hashed.agg(bloomAgg(col("chash"), n + 64, (n + 64) * 16).as("bf"))
      // First batch of a fresh pipeline: the fingerprint topic doesn't
      // exist yet — reading it would throw "Path does not exist" and
      // kill the streaming query. Nothing is known; the append below
      // seeds the topic from this batch.
      val survivors =
        if (store.exists(fpTopic))
          store.read(fpTopic).select(col("chash"))
            .filter(mightContain(col("chash"), bloom))
            .distinct()
        else hashed.select(col("chash")).limit(0)
      val flagged = hashed
        .join(survivors.withColumn("_known", lit(true)), Seq("chash"), "left")
        .select(col("doc_id"), col("ts").as("time"), col("chash"),
          coalesce(col("_known"), lit(false)).as("is_known"))
        .persist()
      store.upsert(outTopic, flagged.drop("chash"), "time", seq = Some(batchId))
      store.append(fpTopic, flagged.filter(!col("is_known"))
        .select(col("chash"), col("time")))
      flagged.unpersist()
    }
    hashed.unpersist()
  }

  /** Incremental LINE dedup — tx16's duplicated-line REMOVAL as a
    * continuous pipeline: each arriving doc chunks into 10-word
    * lines; a line already in the corpus-wide fingerprint topic (or
    * seen earlier in this batch — keep-first by (doc_id, pos)
    * instance) is dropped, and the REWRITTEN doc upserts to
    * `outTopic` with `_seq = batchId`. New line hashes absorb into
    * `lineTopic` tagged with their source batch, and the probe reads
    * only hashes from EARLIER batches — so a replayed batch never
    * sees its own write and rewrites the identical version
    * (replay-idempotent, the packBatchIncrement discipline). The
    * topic scan is pruned by a Bloom filter over the batch's line
    * hashes BEFORE any exchange (dd14's shape): per-batch cost is a
    * pruned scan + survivors-sized join, never a corpus re-key. */
  def lineDedupBatch(store: graft.sources.TopicStore, lineTopic: String,
                     outTopic: String)(batch: DataFrame, batchId: Long): Unit = {
    import graft.functions.BloomFunctions._
    // token array materialized first: inlined, the chunk lambda
    // would re-split the text per line (dd16 hazard, SCALE.md r8)
    val lines = batch
      .select(col("doc_id"), col("ts"), split(col("text"), " ").as("_ws"))
      .select(col("doc_id"), col("ts"),
        transform(sequence(lit(0), floor((size(col("_ws")) - 1) / 10).cast("int")),
          c => array_join(slice(col("_ws"), c * 10 + 1, lit(10)), " ")).as("ls"))
      // non-leaf generator child: see tx16 (SPARK-36715 guard)
      .select(col("doc_id"), col("ts"), posexplode(coalesce(col("ls"), array())))
      .select(col("doc_id"), col("ts"), col("pos"), col("col").as("line"),
        md5(col("col")).as("lhash"),
        (col("doc_id") * 1000000 + col("pos")).as("inst"))
      .persist()
    val n = lines.count() // the arriving batch — small by definition
    if (n > 0) {
      val bloom = lines.agg(bloomAgg(col("lhash"), n + 64, (n + 64) * 16).as("bf"))
      val known =
        if (store.exists(lineTopic))
          store.read(lineTopic)
            .filter(col("src_batch") < batchId) // replay never sees its own write
            .select(col("lhash"))
            .filter(mightContain(col("lhash"), bloom))
            .distinct().withColumn("_known", lit(true))
        else lines.select(col("lhash")).limit(0).withColumn("_known", lit(true))
      val keeper = lines.groupBy(col("lhash")).agg(min(col("inst")).as("keep_inst"))
      val flagged = lines
        .join(known, Seq("lhash"), "left")
        .join(keeper, "lhash")
        .withColumn("kept",
          coalesce(col("_known"), lit(false)) === false && col("inst") === col("keep_inst"))
        .persist()
      val rewritten = flagged.groupBy(col("doc_id"))
        .agg(max(col("ts")).as("time"),
          count(lit(1)).as("n_lines"),
          sum(when(col("kept"), 0L).otherwise(1L)).as("n_dropped"),
          concat_ws(" ", transform(
            array_sort(collect_list(when(col("kept"),
              struct(col("pos"), col("line"))))),
            st => st.getField("line"))).as("deduped_text"))
      store.upsert(outTopic, rewritten, "time", seq = Some(batchId))
      store.append(lineTopic, flagged.filter(col("kept"))
        .select(col("lhash"), col("ts").as("time"), lit(batchId).as("src_batch")))
      flagged.unpersist()
    }
    lines.unpersist()
  }

  /** [[lineDedupBatch]] as a continuous stream: start the returned
    * writer with a checkpointLocation. */
  def lineDedupStream(docs: DataFrame, store: graft.sources.TopicStore,
                      lineTopic: String, outTopic: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
      lineDedupBatch(store, lineTopic, outTopic)(b.toDF(), id)
    }

  /** Streaming RAG chunker — tx21's arrival loop, the text-side twin
    * of [[pqEncodeStream]]: each micro-batch of docs splits into
    * `width`-word / `stride`-step chunks (chunkWindows' shape) and
    * upserts them into `chunkTopic` keyed by doc_id#chunk_idx with
    * `_seq = batchId` — a revised doc's chunks OVERWRITE its old ones
    * under last-write-wins (readMerged gives the current chunk set),
    * and a replayed batch rewrites identical rows. Purely per-row
    * compute: cost tracks the arrival rate, zero shuffle, the corpus
    * never re-chunks. Downstream, the embedder consumes chunk rows
    * and [[pqEncodeStream]] indexes their vectors — chunk identity is
    * what lets the ANN index upsert per chunk. */
  def chunkStream(docs: DataFrame, store: graft.sources.TopicStore,
                  chunkTopic: String, width: Int = 32, stride: Int = 24)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(stride >= 1 && width >= stride,
      s"need width >= stride >= 1, got width=$width stride=$stride")
    // fresh-checkpoint relaunches must keep overwriting (see seqBase)
    val base = seqBase(store, chunkTopic)
    docs.writeStream.foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
      val seq = base + 1 + id
      // two revisions of one doc in a single micro-batch would chunk
      // with the SAME _seq and doc_seq, letting readMerged interleave
      // both versions — pre-reduce to the latest version per doc
      // (max by ts, changesBatch's pattern) first
      val latest = latestPerKey(b.toDF(), "doc_id", "ts", "text")
      // token array materialized first: inlined, the chunk lambda
      // would re-split the text per chunk (dd16 hazard, SCALE.md r8)
      val chunks = latest
        .select(col("doc_id"), col("ts").as("time"), split(col("text"), " ").as("_ws"))
        .select(col("doc_id"), col("time"),
          posexplode(transform(
            sequence(lit(0), floor((size(col("_ws")) - 1) / stride).cast("int")),
            i => array_join(slice(col("_ws"), i * stride + 1, lit(width)), " "))))
        .select(
          concat(col("doc_id"), lit("#"), col("pos")).as("chunk_key"),
          col("doc_id"), col("time"), col("pos").cast("int").as("chunk_idx"),
          col("col").as("chunk_text"), lit(seq).as("doc_seq"))
      store.upsert(chunkTopic, chunks, "time", seq = Some(seq))
    }
  }

  /** Streaming LEXICAL index maintenance — tx22's arrival loop and
    * [[annServeStream]]'s lexical twin (together they are the hybrid
    * retrieval serving stack; fuse their shortlists with
    * `api.rrfFuse`): each micro-batch of (doc_id, ts, text) docs
    * pre-reduces to latest-per-doc, then upserts
    *   - `<topic>`: postings keyed `w#doc_id` — (w, doc_id, tf, dl,
    *     doc_seq), one row per distinct term of the doc;
    *   - `<topic>_docs`: doc registry keyed doc_id — (dl, doc_seq),
    *     the version authority and the corpus length stats.
    * A revised doc's postings overwrite under last-write-wins; terms
    * the revision DROPPED keep their keys, so [[currentPostings]]
    * filters each posting to its doc's newest `doc_seq` (the
    * [[currentChunks]] shrink rule — pure key-overwrite can never
    * retire them). Replays rewrite identical rows; the per-batch
    * `_seq` is offset past the topics' existing max at writer
    * construction, so a relaunch under a FRESH checkpoint still
    * overwrites (batch ids restarting at 0 would otherwise silently
    * lose to the earlier run's higher versions). Postings commit
    * BEFORE the registry; readers take the registry's max `_seq` as
    * their consistent cutoff ([[currentPostings]]), so the
    * between-writes window serves the doc's PREVIOUS version instead
    * of dropping it. Per-batch cost is the arriving docs' term
    * explode + two batch-sized upserts — the corpus never
    * re-indexes. At 100 TB the postings topic clusters on `w`
    * (compaction policy) so a query's term filter reads ~query-term
    * shard groups. */
  def lexIndexStream(docs: DataFrame, store: graft.sources.TopicStore,
                     topic: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val base = seqBase(store, topic, s"${topic}_docs")
    docs.writeStream.foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
      val seq = base + 1 + id
      val latest = latestPerKey(b.toDF(), "doc_id", "ts", "text")
        .withColumnRenamed("ts", "time")
        .withColumn("ws", split(lower(col("text")), " "))
        .withColumn("dl", size(col("ws")).cast("long"))
      val postings = latest
        .select(col("doc_id"), col("time"), col("dl"), explode(col("ws")).as("w"))
        .groupBy(col("doc_id"), col("w"))
        .agg(max(col("time")).as("time"), max(col("dl")).as("dl"),
          count(lit(1)).as("tf"))
        .select(concat(col("w"), lit("#"), col("doc_id")).as("post_key"),
          col("w"), col("doc_id"), col("time"), col("tf"), col("dl"),
          lit(seq).as("doc_seq"))
      store.upsert(topic, postings, "time", seq = Some(seq))
      store.upsert(s"${topic}_docs",
        latest.select(col("doc_id"), col("time"), col("dl"), lit(seq).as("doc_seq")),
        "time", seq = Some(seq))
    }
  }

  /** The CURRENT postings of a [[lexIndexStream]] topic: latest
    * version per post_key, restricted to each doc's newest version —
    * a revision that dropped a term retires its stale posting.
    *
    * Consistency: the registry's max `_seq` is the read cutoff —
    * postings commit first, so versions past the registry's high
    * water (a writer mid-batch) are EXCLUDED and the in-between
    * window serves each doc's previous version rather than nothing.
    * `terms` non-empty pre-filters the RAW postings scan on `w`
    * BEFORE the merge agg (safe: every version of a post_key shares
    * its w — post_key = w#doc_id), which is what lets a query read
    * ~term shard groups instead of merging the whole topic.
    *
    * No per-call persist (r9): a long-lived serve session calling
    * this per query would leak one cached frame per call (nothing
    * here can own the unpersist — the result is returned lazily).
    * The read cutoff is an eager scalar instead, and the registry
    * merge executes once more inside the doc-version join — doc-id-
    * level rows, the small side of the query. */
  def currentPostings(store: graft.sources.TopicStore, topic: String,
                      terms: Seq[String] = Seq.empty): DataFrame = {
    val reg = store.readMerged(s"${topic}_docs", "doc_id")
    val cut = reg.agg(max(col("doc_seq"))).head.get(0)
    val raw0 = store.read(topic)
    val raw = if (terms.isEmpty) raw0 else raw0.filter(col("w").isin(terms: _*))
    val merged = store.mergeLatest(
      if (cut == null) raw.limit(0) else raw.filter(col("_seq") <= lit(cut)),
      "post_key")
    val cur = reg.select(col("doc_id"), col("doc_seq").as("_cur"))
    merged.join(cur, "doc_id").filter(col("doc_seq") === col("_cur")).drop("_cur")
  }

  /** Query a [[lexIndexStream]] index: tx22's rational-idf tf-idf
    * top-`k` over the CURRENT postings — (doc_id, score,
    * n_terms_hit, rank), rank 1-based for `api.rrfFuse` against an
    * [[annServeStream]] shortlist. Cost: the postings scan filters
    * to the query terms at the SCAN, before the merge agg (plan-
    * pinned; clustered on `w` at scale → ~term shard groups), df/idf
    * is a per-term count over those postings, and n_docs is one
    * registry agg — the corpus text is never touched at query time. */
  def lexSearch(store: graft.sources.TopicStore, topic: String,
                terms: Seq[String], k: Int = 10): DataFrame = {
    require(terms.nonEmpty, "lexSearch needs at least one query term")
    // NOT persisted (r9): `posts` feeds both the idf agg and the score
    // join, so the term-pruned merge executes twice — but that subtree
    // is the query-sized path (the w IN (...) pushdown reads ~term
    // shard groups), while a per-call cache on a long-lived serve
    // session leaks storage memory with no owner to unpersist it.
    val posts = currentPostings(store, topic, terms)
      .select(col("doc_id"), col("w"), col("tf"))
    val nDocs = store.readMerged(s"${topic}_docs", "doc_id")
      .agg(count(lit(1)).as("n_docs"))
    val idf = posts.groupBy(col("w")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .select(col("w"), expr("(1000000 * n_docs) DIV df").as("idf_sc"))
    posts.join(broadcast(idf), "w")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("idf_sc")).as("score"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id"))).cast("int"))
  }

  /** Latest version per key within one micro-batch — the in-batch
    * newest-wins rule every indexing arrival loop applies before
    * writing (two versions of one key in one batch would otherwise
    * land with the same `_seq` and resolve arbitrarily downstream).
    * Ties on `ts` break on the payload — deterministic either way. */
  private def latestPerKey(b: DataFrame, key: String, ts: String,
                           payload: String): DataFrame =
    b.groupBy(col(key))
      .agg(max(struct(col(ts), col(payload))).as("_m"))
      .select(col(key), col("_m")(ts).as(ts), col("_m")(payload).as(payload))

  /** Max existing `_seq` across `topics` (−1 when none): the offset
    * that keeps a writer relaunched under a fresh checkpoint (batch
    * ids restarting at 0) writing ABOVE every version already in the
    * store, so last-write-wins stays truthful across stream
    * generations. */
  private def seqBase(store: graft.sources.TopicStore, topics: String*): Long =
    topics.flatMap { t =>
      if (store.exists(t)) {
        val df = store.read(t)
        if (df.columns.contains("_seq"))
          Option(df.agg(max(col("_seq"))).head.get(0)).map(_.asInstanceOf[Long])
        else None
      } else None
    }.foldLeft(-1L)(math.max)

  /** The CURRENT chunk set of every doc in a [[chunkStream]] topic:
    * latest version per chunk_key, then only chunks carrying the
    * doc's newest `doc_seq` — a revision that SHRANK a doc would
    * otherwise leave its old tail chunks alive (their keys are never
    * overwritten). One merge agg + one per-doc max join, both keyed
    * and partial-agg'd. */
  def currentChunks(store: graft.sources.TopicStore, chunkTopic: String): DataFrame = {
    val merged = store.readMerged(chunkTopic, "chunk_key")
    val cur = merged.groupBy(col("doc_id")).agg(max(col("doc_seq")).as("_cur"))
    merged.join(cur, "doc_id").filter(col("doc_seq") === col("_cur")).drop("_cur")
  }

  /** Streaming CDC — [[graft.sources.TopicStore.readChanges]]'s
    * arrival loop: each micro-batch of keyed upsert rows (data
    * columns + optional boolean `_tombstone`) is classified against
    * the materialized `stateTopic` as insert / update / delete, the
    * change rows land in `changeTopic`, and the batch folds into the
    * state. Within a batch the LAST version per key wins (max by
    * `ts`), matching last-write-wins downstream.
    *
    * Scale shape: the state topic is corpus-sized, so its scan is
    * pruned by a Bloom filter over the batch's keys BEFORE any
    * exchange (dd14's discipline) — per-batch cost is a pruned scan
    * plus a batch-key-sized merge+join, never a corpus re-key.
    * Replay-idempotent: state reads see only `_seq < batchId` (a
    * replayed batch never classifies against its own fold), and both
    * writes are `seq = batchId` upserts — `changeTopic` keyed by
    * key#batch, so a replay overwrites its own identical change rows.
    * Readers get the log via readMerged(changeTopic, "change_key"). */
  def changesBatch(store: graft.sources.TopicStore, keyCol: String,
                   stateTopic: String, changeTopic: String)
                  (batch: DataFrame, batchId: Long): Unit = {
    import graft.functions.BloomFunctions._
    val tomb = if (batch.columns.contains("_tombstone"))
      coalesce(col("_tombstone").cast("boolean"), lit(false)) else lit(false)
    val dataCols = batch.columns.filterNot(c => c == keyCol || c == "_tombstone").toSeq
    val latest = batch.withColumn("_tomb", tomb)
      .groupBy(col(keyCol))
      .agg(max(struct((col("ts") +: (dataCols.filterNot(_ == "ts") :+ "_tomb").map(col)): _*)).as("_m"))
      .select(col(keyCol) +: (dataCols :+ "_tomb").map(c => col("_m." + c).as(c)): _*)
      .persist()
    val n = latest.count() // the arriving batch — small by definition
    if (n > 0) {
      val bloom = latest.agg(bloomAgg(col(keyCol).cast("string"), n + 64, (n + 64) * 16).as("bf"))
      val pre =
        if (store.exists(stateTopic))
          store.read(stateTopic)
            .filter(col("_seq") < batchId) // replay never sees its own fold
            .filter(mightContain(col(keyCol).cast("string"), bloom))
            .groupBy(col(keyCol))
            .agg(max(struct(col("_seq"), col("_tombstone"))).as("_p"))
            .select(col(keyCol), col("_p._tombstone").as("_pre_tomb"))
        else latest.select(col(keyCol)).limit(0).withColumn("_pre_tomb", lit(false))
      val classified = latest.join(pre, Seq(keyCol), "left")
        .withColumn("_pre_live", coalesce(!col("_pre_tomb"), lit(false)))
        .withColumn("_change_type",
          when(!col("_tomb") && !col("_pre_live"), "insert")
            .when(!col("_tomb") && col("_pre_live"), "update")
            .when(col("_tomb") && col("_pre_live"), "delete"))
        .filter(col("_change_type").isNotNull)
      val changeCols =
        concat(col(keyCol).cast("string"), lit("#"), lit(batchId)).as("change_key") +:
          col(keyCol) +: dataCols.map(col) :+ col("_change_type")
      store.upsert(changeTopic,
        classified.select(changeCols: _*).withColumnRenamed("ts", "time"),
        "time", seq = Some(batchId))
      store.upsert(stateTopic,
        latest.withColumnRenamed("ts", "time")
          .withColumnRenamed("_tomb", "_tombstone"),
        "time", seq = Some(batchId))
    }
    latest.unpersist()
  }

  /** [[changesBatch]] as a continuous stream: start the returned
    * writer with a checkpointLocation. */
  def changesStream(rows: DataFrame, store: graft.sources.TopicStore,
                    keyCol: String, stateTopic: String, changeTopic: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    rows.writeStream.foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
      changesBatch(store, keyCol, stateTopic, changeTopic)(b.toDF(), id)
    }

  /** [[dedupBatchBloom]] as a continuous stream: start the returned
    * writer with a checkpointLocation. */
  def dedupStreamBloom(docs: DataFrame, store: graft.sources.TopicStore,
                       fpTopic: String, outTopic: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
      dedupBatchBloom(store, fpTopic, outTopic)(b.toDF(), id)
    }

  /** Streaming NEAR-dup gate — dd12's MinHash-band increment as a
    * continuous pipeline (the dedup family's missing streaming third:
    * [[dedupStreamBloom]] is the exact gate, [[lineDedupStream]] the
    * line rewrite; this flags REWORDED near-duplicates): each arriving
    * doc MinHash-bands through the batch operators' exact kernel
    * (`Dedup.bandsPublic` — an arrival bands precisely as an
    * established doc would, the ivfpqEncode kernel-sharing
    * discipline), probes the corpus-wide band topic for bucket
    * collisions, and upserts (doc_id, n_band_hits, is_neardup) to
    * `outTopic` keyed doc_id. Its own bands then absorb into
    * `bandTopic` tagged with the batch seq, and the probe reads only
    * EARLIER generations — a replayed batch never sees its own write
    * (rewrites the identical verdict) and a fresh-checkpoint relaunch
    * sees every prior generation (seqBase). The band-topic scan is
    * Bloom-pruned by the batch's band keys BEFORE any exchange
    * (dd14's shape): per-batch cost is a pruned scan plus a
    * batch-sized join — the corpus never re-bands, never self-joins.
    * Establishment boundary = the topic: two near-dups arriving in
    * ONE micro-batch both land unflagged (each sees only earlier
    * batches), exactly dd12's old/fresh split. A band collision is
    * the LSH CANDIDATE signal (any shared 2-row band of the 8-perm
    * signature); feed flagged docs to a verify stage (dd04's shape)
    * when the downstream needs adjudication — the gate's job is to
    * price candidates at arrival rate. */
  def neardupStream(docs: DataFrame, store: graft.sources.TopicStore,
                    bandTopic: String, outTopic: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val base = seqBase(store, bandTopic, outTopic)
    docs.writeStream.foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
      neardupBatch(store, bandTopic, outTopic, base + 1 + id)(b.toDF())
    }
  }

  /** One [[neardupStream]] micro-batch (exposed for replay tests). */
  private[graft] def neardupBatch(store: graft.sources.TopicStore,
                                  bandTopic: String, outTopic: String,
                                  seq: Long)(batch: DataFrame): Unit = {
    import graft.functions.BloomFunctions._
    val latest = latestPerKey(batch, "doc_id", "ts", "text")
      .persist()
    val bands = graft.operators.Dedup.bandsPublic(latest)
      // bkey is the binary16 md5 (TextFunctions.bandKey); lower(hex)
      // re-derives the hex form so stored `bk` strings stay
      // byte-identical across the key-width change (replayed topics
      // written before it keep matching)
      .withColumn("bk", concat(col("band"), lit("|"), lower(hex(col("bkey")))))
      .persist()
    val n = bands.count() // bands-per-sig x batch docs — small by definition
    if (n > 0) {
      val bloom = bands.agg(bloomAgg(col("bk"), n + 64, (n + 64) * 16).as("bf"))
      val known =
        if (store.exists(bandTopic))
          store.read(bandTopic)
            .filter(col("src_seq") < seq) // replay never sees its own write
            .select(col("bk"))
            .filter(mightContain(col("bk"), bloom))
            .distinct().withColumn("_known", lit(true))
        else bands.select(col("bk")).limit(0).withColumn("_known", lit(true))
      val times = latest.select(col("doc_id"), col("ts").as("time"))
      val flags = bands.join(known, Seq("bk"), "left")
        .groupBy(col("doc_id"))
        .agg(sum(when(coalesce(col("_known"), lit(false)), 1L).otherwise(0L))
          .as("n_band_hits"))
        .join(times, "doc_id")
        .select(col("doc_id"), col("time"), col("n_band_hits"),
          (col("n_band_hits") > 0).as("is_neardup"))
      store.upsert(outTopic, flags, "time", seq = Some(seq))
      store.append(bandTopic, bands.join(times, "doc_id")
        .select(col("bk"), col("time"), lit(seq).as("src_seq")).distinct())
    }
    bands.unpersist()
    latest.unpersist()
  }

  /** Incremental PQ encode as a continuous stream — ss15's arrival
    * loop: each micro-batch of vectors encodes against the FROZEN
    * codebook (broadcast argmin — zero shuffle, cost scales with the
    * arrival rate) and appends (vec_id, codes, recon_d2) to the
    * compressed-index topic. The corpus is NEVER re-encoded and the
    * codebook never re-derives: it persists on first use, so later
    * batches reuse the cached single row instead of re-running its
    * training lineage (the static-side replan trap dedupBatchBloom
    * documents). Start the returned writer with a checkpointLocation;
    * rising recon_d2 on arrivals is the retrain signal. */
  /** Build a SERVABLE IVF-PQ index from a (vec_id, embedding, label)
    * frame into store topics — ss22's index side persisted, done
    * ONCE: `<topic>` holds the coded rows (vec_id, cell, embedding,
    * cidx), `<topic>_cents` / `<topic>_cb` the frozen centroid and
    * codebook single-row frames. At 100 TB the coded topic is the
    * cell-partitioned code index (cluster shards on `cell` via the
    * compaction policy so a probe reads ~nprobe shard groups);
    * vectors ride along only for the rerank handful. Arrivals append
    * through [[pqEncodeStream]]-style encode against the SAME frozen
    * frames; retrain (and rebuild) when [[pqDriftMonitor]] trips. */
  def annIndexBuild(store: graft.sources.TopicStore, e: DataFrame,
                    topic: String, residual: Boolean = false): Unit = {
    def t0(df: DataFrame) = df.withColumn("time", lit(0L).cast("timestamp"))
    // the coded topic is an UPSERT topic keyed vec_id (seq -1 = the
    // build generation — strictly BELOW any stream batch's seq, so a
    // vector re-published in the very first micro-batch deterministically
    // overwrites its build row) and [[annIndexStream]] arrivals and
    // re-publishes overwrite cleanly; the frozen frames are plain
    // appends (a rebuild replaces the whole index under a new topic).
    // The codebook row carries `enc` so the arrival/serve writers
    // self-dispatch — a serve writer can never probe a residual index
    // with raw LUTs (indexes built before `enc` existed default to raw).
    if (residual) {
      val idx = graft.operators.Similarity.ivfpqResidualIndex(e)
      store.upsert(topic, t0(idx.coded), "time", seq = Some(-1L))
      store.append(s"${topic}_cents", t0(idx.cents))
      store.append(s"${topic}_cb", t0(idx.rcb.withColumn("enc", lit("residual"))))
      idx.release() // the build owns (and drops) the training caches
    } else {
      val (cents, cb, coded) = graft.operators.Similarity.ivfpqIndex(e)
      store.upsert(topic, t0(coded), "time", seq = Some(-1L))
      store.append(s"${topic}_cents", t0(cents))
      store.append(s"${topic}_cb", t0(cb.withColumn("enc", lit("raw"))))
      // ivfpqIndex persists the centroid frame so the codebook/encode
      // consumers share one training pass; all three topics are written
      // now, so the build owns (and releases) that cache
      cents.unpersist()
    }
  }

  /** Read an index's codebook topic and its encoding marker: (cb
    * without the marker, residual?). Indexes written before the `enc`
    * column existed are raw by construction. */
  private def annCodebook(store: graft.sources.TopicStore,
                          topic: String): (DataFrame, Boolean) = {
    val raw = store.read(s"${topic}_cb").drop("bucket", "time")
    if (!raw.columns.contains("enc")) (raw, false)
    else (raw.drop("enc"),
      raw.select(col("enc")).head.getString(0) == "residual")
  }

  /** Grow an [[annIndexBuild]] index from arriving vectors —
    * ss12/ss15's arrival discipline applied to the SERVE index
    * itself: each micro-batch of (vec_id, ts, embedding) rows is
    * assigned to its nearest EXISTING cell and PQ-encoded against
    * the FROZEN centroid/codebook topics (both read once at writer
    * construction — broadcast argmin, zero shuffle of anything),
    * then upserted into the coded topic keyed by vec_id — a
    * re-published vector's index entry overwrites, a replayed batch
    * rewrites identical rows. The established index never re-encodes
    * and no centroids move (retrain + rebuild when
    * [[pqDriftMonitor]] trips). A NEW [[annServeStream]] writer
    * picks the grown index up at construction (its cache is a
    * point-in-time snapshot by design — serving indexes roll by
    * generation, they don't mutate under queries). */
  def annIndexStream(vecs: DataFrame, store: graft.sources.TopicStore,
                     topic: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val cents = store.read(s"${topic}_cents").drop("bucket", "time").persist()
    val (cb0, isResid) = annCodebook(store, topic)
    val cb = cb0.persist()
    // offset batch seqs past the store's high water: a relaunch under
    // a fresh checkpoint (batch ids back at 0) must keep overwriting
    val base = seqBase(store, topic)
    vecs.writeStream.foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
      val latest = latestPerKey(b.toDF(), "vec_id", "ts", "embedding")
        .withColumnRenamed("ts", "time")
      val coded = (if (isResid)
          graft.operators.Similarity.ivfpqResidualEncode(latest, cents, cb)
        else graft.operators.Similarity.ivfpqEncode(latest, cents, cb))
        .select(col("vec_id"), col("time"), col("cell"), col("embedding"), col("cidx"))
      store.upsert(topic, coded, "time", seq = Some(base + 1 + id))
    }
  }

  /** Serve an arriving ANN query stream against a FROZEN
    * [[annIndexBuild]] index — ss22's arrival loop, the query-side
    * twin of [[pqEncodeStream]]: per micro-batch the query batch
    * (q_id, ts, embedding) pre-reduces to its latest version per
    * q_id (chunkStream's rule), derives nprobe probe cells + one ADC
    * LUT per query, and BROADCASTS — the probe join touches only
    * probed cells' codes, never re-shuffles or rescans the corpus
    * (the coded index is read once at writer construction and
    * cached). Top-`k` per query upserts into `outTopic` keyed
    * q_id#rank with `_seq = batchId`: a replayed batch rewrites
    * identical rows, and a RE-SUBMITTED query's results overwrite
    * its old ones (last-write-wins serving semantics; readMerged
    * gives the current answer set). Per-batch cost ∝ batch x nprobe
    * x cell size — arrival-rate-priced, exactly the ss22 claim. */
  def annServeStream(queries: DataFrame, store: graft.sources.TopicStore,
                     topic: String, outTopic: String,
                     nprobe: Int = 2, shortlist: Int = 10, k: Int = 3)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    // merged read: latest index entry per vector (build + arrivals)
    val coded = store.readMerged(topic, "vec_id").drop("bucket", "time").persist()
    val cents = store.read(s"${topic}_cents").drop("bucket", "time").persist()
    val (cb0, isResid) = annCodebook(store, topic)
    val cb = cb0.persist()
    // results keep overwriting across serve-writer generations too
    val base = seqBase(store, outTopic)
    queries.writeStream.foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
      val latest = latestPerKey(b.toDF(), "q_id", "ts", "embedding")
        .withColumnRenamed("embedding", "q_emb")
      val res = (if (isResid)
          graft.operators.Similarity.ivfpqResidualProbe(coded, cents, cb,
            latest.select(col("q_id"), col("q_emb")),
            nprobe, shortlist, k, excludeSelf = false)
        else graft.operators.Similarity.ivfpqProbe(coded, cents, cb,
          latest.select(col("q_id"), col("q_emb")),
          nprobe, shortlist, k, excludeSelf = false))
      val out = res.join(latest.select(col("q_id"), col("ts").as("time")), "q_id")
        .select(concat(col("q_id"), lit("#"), col("rank")).as("ann_key"),
          col("q_id"), col("time"), col("vec_id"), col("cell"),
          col("adc"), col("cos_exact"), col("rank"))
      store.upsert(outTopic, out, "time", seq = Some(base + 1 + id))
    }
  }

  def pqEncodeStream(vecs: DataFrame, store: graft.sources.TopicStore,
                     codebook: DataFrame, topic: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val frozen = codebook.persist()
    vecs.writeStream.foreachBatch { (b: Dataset[org.apache.spark.sql.Row], _: Long) =>
      store.append(topic,
        graft.operators.Similarity.pqEncode(b.toDF(), frozen)
          .select(col("vec_id"), col("ts").as("time"), col("codes"), col("recon_d2")))
    }
  }

  /** Streaming OOD gate — ss32's live twin in [[pqEncodeStream]]'s
    * frozen-index shape: arrivals score against a FROZEN OOD index
    * (per-label centroids + per-cell EXACT p95 distance thresholds
    * built once on the reference corpus —
    * [[graft.operators.Similarity.oodIndex]]), and every arrival
    * lands in `topic` with its cell, quantized distance, the cell's
    * threshold, and the `is_ood` routing flag — the arrival-time
    * data-cleaning gate in front of an embedding topic (downstream
    * consumers filter `!is_ood`; the flagged slice routes to review).
    * Per-batch cost: |cells| comparisons per vector + one broadcast
    * threshold join — corpus-free, so drain throughput is constant
    * whatever the reference corpus size. Expects (vec_id, embedding,
    * ts) arrivals. */
  def oodGateStream(vecs: DataFrame, store: graft.sources.TopicStore,
                    cents: DataFrame, thresholds: DataFrame, topic: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val fc = cents.persist()
    val ft = thresholds.persist()
    vecs.writeStream.foreachBatch { (b: Dataset[org.apache.spark.sql.Row], _: Long) =>
      // latest-per-id first: a replayed/re-ingested vec_id appearing k
      // times in one micro-batch would otherwise fan the score⋈time
      // join out k² — one verdict per id per batch, newest embedding wins
      val latest = latestPerKey(b.toDF(), "vec_id", "ts", "embedding")
      store.append(topic,
        graft.operators.Similarity
          .oodScore(latest.select(col("vec_id"), col("embedding")), fc, ft)
          .join(latest.select(col("vec_id"), col("ts").as("time")), "vec_id")
          .select(col("vec_id"), col("time"), col("cell"), col("qd"),
            col("p95_qd"), col("is_ood")))
    }
  }

  /** Codebook-drift monitor — the operational loop [[pqEncodeStream]]
    * leaves open: its (time, recon_d2) output stream, windowed,
    * against the FROZEN baseline error measured at train time (mean
    * recon_d2 of the training corpus — a scalar the caller computes
    * once). Emits one row per window with the window's mean
    * reconstruction error and a `retrain` flag when it exceeds
    * `tolerance` x baseline — the signal that arrivals drifted away
    * from the codebook's training distribution and the ss14 trainer
    * should run again. State is O(open windows); the comparison is a
    * scalar broadcast, nothing shuffles but the windowed partials. */
  def pqDriftMonitor(encoded: DataFrame, baselineErr: Double,
                     tolerance: Double = 1.5,
                     windowLen: String = "1 hour",
                     watermarkDelay: String = "10 minutes"): DataFrame = {
    require(baselineErr >= 0 && tolerance > 0, "baseline/tolerance must be positive")
    encoded
      .withWatermark("time", watermarkDelay)
      .groupBy(window(col("time"), windowLen))
      .agg(count(lit(1)).as("n"), avg(col("recon_d2")).as("mean_recon_d2"))
      .select(col("window.start").as("w_start"), col("n"), col("mean_recon_d2"),
        (col("mean_recon_d2") > baselineErr * tolerance).as("retrain"))
  }

  /** Streaming embedding-space drift monitor — ss20's windowed twin
    * (and [[pqDriftMonitor]]'s upstream cousin: that one watches the
    * CODEBOOK going stale, this one watches the SPACE itself): the
    * MomentAgg second-moment buffer is partial-mergeable, so it drops
    * into a watermarked windowed aggregation unchanged — one dense
    * (d^2+d+2)-long buffer per open window, merged across partitions
    * and micro-batches in any order (integer sums commute; stream ==
    * batch exactly). Per window the buffer collapses in place (array
    * expressions, no second pass) to the variance diagonal's drift
    * indicators: total variance, the dominant dimension, and its
    * share — a healthy embedding stream spreads variance, a
    * collapsing/drifting encoder concentrates it (the signal to
    * re-whiten or retrain before ANN quality decays). State is
    * O(open windows) x one buffer; nothing shuffles but partials. */
  def embedDriftMonitor(vecs: DataFrame, dim: Int,
                        windowLen: String = "1 hour",
                        watermarkDelay: String = "10 minutes"): DataFrame = {
    require(dim > 0, s"dim must be positive: $dim")
    val moments = udaf(graft.functions.MomentAgg)
    val n = element_at(col("m"), 2)
    // var_q(j) = n*S_jj - S_j^2 from the buffer layout [d, n, S_*, S_**]
    val diag = transform(sequence(lit(1), lit(dim)), j =>
      n * element_at(col("m"), lit(2 + dim) + (j - 1) * dim + j)
        - element_at(col("m"), j + 2) * element_at(col("m"), j + 2))
    vecs
      .withWatermark("time", watermarkDelay)
      .groupBy(window(col("time"), windowLen))
      .agg(moments(col("embedding")).as("m"))
      .withColumn("_diag", diag)
      .select(col("window.start").as("w_start"), n.as("n"),
        aggregate(col("_diag"), lit(0L), (acc, x) => acc + x).as("total_var_q"),
        array_max(col("_diag")).as("max_var_q"),
        array_position(col("_diag"), array_max(col("_diag"))).cast("int").as("top_dim"))
      .withColumn("top_share_milli",
        expr("(max_var_q * 1000) DIV greatest(total_var_q, 1)"))
  }

  /** Streaming benchmark decontamination — tx11 in streaming form:
    * each arriving doc's word 5-grams semi-join the STATIC benchmark
    * gram set (tiny, broadcast — an eval set), and contaminated docs
    * emit exactly once via dedup within the watermark. Every stage is
    * stateless except the bounded doc-id dedup, so state is O(docs
    * per watermark window) regardless of corpus size. `bench` must
    * have a `gram` column (e.g. built by the batch tx11 pass). */
  def decontamStream(docs: DataFrame, bench: DataFrame,
                     watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withWatermark("ts", watermarkDelay)
      .select(col("doc_id"), col("ts"), split(lower(col("text")), " ").as("_gws"))
      .select(col("doc_id"), col("ts"),
        explode(graft.operators.Curation.grams5(col("_gws"))).as("gram"))
      .join(broadcast(bench.select(col("gram"))), Seq("gram"), "left_semi")
      .select(col("doc_id"), col("ts"))
      .dropDuplicatesWithinWatermark("doc_id")

  /** Streaming split-leakage audit — px05 in streaming form: each
    * arriving HELD-OUT doc (a val/test candidate entering the eval
    * pool) is checked for any shared word 5-gram with the TRAIN
    * split's gram fingerprint topic, and contaminated docs emit
    * exactly once via the watermark-bounded dedup.
    *
    * The shape deliberately differs from [[decontamStream]]: tx11's
    * benchmark set is tiny so it broadcasts, but the train fingerprint
    * side here is ~90% of the corpus — hinting it broadcast would
    * force a driver collect of a corpus-sized table (the exact defect
    * measured and removed from dd04/dd05, see BASELINE.md r4 notes).
    * Unhinted, the per-batch join shuffles the SMALL side (one
    * micro-batch of exploded grams) against the gram-keyed static
    * side; the static side is re-planned each batch, so fingerprints
    * appended between batches are picked up. At 100 TB the fingerprint
    * topic is stored gram-hash-clustered (compaction `clusterBy` on
    * `gram`), so each batch's probe prunes row groups instead of
    * re-scanning the full set. State is only the doc-id dedup:
    * O(arrivals per watermark window), never the corpus.
    *
    * `trainGrams` must have a `gram` column (built by the batch px05
    * gram pipeline, e.g. persisted via a TopicStore fingerprint
    * topic). */
  def leakageAuditStream(docs: DataFrame, trainGrams: DataFrame,
                         watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withWatermark("ts", watermarkDelay)
      .select(col("doc_id"), col("ts"), split(lower(col("text")), " ").as("_gws"))
      .select(col("doc_id"), col("ts"),
        explode(graft.operators.Curation.grams5(col("_gws"))).as("gram"))
      .join(trainGrams.select(col("gram")).distinct(), Seq("gram"), "left_semi")
      .select(col("doc_id"), col("ts"))
      .dropDuplicatesWithinWatermark("doc_id")

  /** Streaming windowed vocabulary — tx12 in streaming form: per
    * (window, word) counts over arriving docs, watermark-bounded
    * state, update mode (each micro-batch emits revised counts for
    * the words it touched). The stream side of corpus-vocab drift
    * monitoring: at 100 TB the word-count state hash-partitions
    * across executors and the watermark expires closed windows. */
  def vocabStream(docs: DataFrame, windowLen: String = "1 hour",
                  watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withWatermark("ts", watermarkDelay)
      .select(col("ts"), explode(split(lower(col("text")), " ")).as("word"))
      .groupBy(window(col("ts"), windowLen), col("word"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("word"), col("n"))

  /** Streaming token-budget packer — sp03/px02 in streaming form: docs
    * arrive continuously, each source admits docs until its token
    * budget is exhausted, and every admitted doc is assigned its
    * training-sequence pack on the spot (pack_id = exclusive token
    * prefix DIV packTokens, exactly the batch sp03 rule).
    *
    * State is ONE counter pair per source (O(sources), no watermark
    * needed), hash-partitioned across executors on the group key.
    * Rows within a micro-batch are folded in doc_id order so replays
    * and shuffled arrival produce identical assignments — the same
    * determinism contract as the batch operators. */
  def packStream(docs: Dataset[DocArrival], budgetPerSource: Long,
                 packTokens: Long): Dataset[PackedDoc] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[PackState, PackedDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        case (source: String, rows: Iterator[DocArrival], state: GroupState[PackState]) =>
          val st = state.getOption.getOrElse(PackState(0L, 0L))
          val (finalSt, out) = rows.toSeq.sortBy(_.doc_id)
            .foldLeft((st, Vector.empty[PackedDoc])) { case ((s, acc), d) =>
              if (s.admitted_tokens < budgetPerSource) {
                val doc = PackedDoc(d.doc_id, source,
                  s.admitted_tokens, s.admitted_tokens / packTokens)
                (PackState(s.admitted_tokens + d.tok_cnt, s.n_admitted + 1), acc :+ doc)
              } else (s, acc)
            }
          state.update(finalSt)
          out.iterator
      }
  }

  /** One micro-batch increment of the SCALE-SAFE streaming packer —
    * [[packStream]]'s exact admission/assignment semantics with the
    * per-source work partition-parallel. `flatMapGroupsWithState`
    * funnels each source's whole batch slice through ONE state task
    * (the streaming analog of the one-task-per-source window that
    * [[graft.functions.GroupPrefix]] eliminates in batch); at high
    * arrival rates a hot source serializes there. Here instead:
    *
    *  1. per-source exclusive token prefixes come from the two-phase
    *     partition-parallel GroupPrefix, in doc_id order (the same
    *     determinism contract as the state-op form);
    *  2. the carried per-source offsets are read from a merge-on-read
    *     state topic AS OF the previous batch (`readMergedAsOf` at
    *     `batchId - 1`), so a REPLAYED batch never sees its own
    *     earlier write — recovery-correct by time travel, not locks;
    *  3. admitted docs (global prefix < budget) upsert into the
    *     output topic keyed by doc_id with `_seq = batchId`; the
    *     advanced offsets upsert likewise — both replay-idempotent.
    *
    * The only per-source serial point left is the O(sources) offset
    * table — bytes on the wire, never the corpus. Read the packed
    * output with `store.readMerged(outTopic, "doc_id")`. */
  def packBatchIncrement(store: graft.sources.TopicStore, outTopic: String,
                         stateTopic: String, budgetPerSource: Long, packTokens: Long)
                        (batch: DataFrame, batchId: Long): Unit = {
    val sp = batch.sparkSession
    val statePath = new org.apache.hadoop.fs.Path(store.topicPath(stateTopic))
    val hasState =
      statePath.getFileSystem(sp.sparkContext.hadoopConfiguration).exists(statePath)
    // capture GroupPrefix's internal cache so this batch's slice can
    // be released at the end — a continuous stream otherwise pins one
    // cached batch per trigger until executor storage fills
    var prefixCache: Option[DataFrame] = None
    val prefixed = graft.functions.GroupPrefix.groupPrefix(
      batch, "source", Seq("doc_id"), Some("tok_cnt"),
      onCache = Some(c => prefixCache = Some(c)))
    val based =
      if (hasState) {
        val offsets = store.readMergedAsOf(stateTopic, "source", batchId - 1)
          .select(col("source"), col("admitted_tokens"))
        prefixed.join(broadcast(offsets), Seq("source"), "left")
          .withColumn("_base", coalesce(col("admitted_tokens"), lit(0L)))
      } else prefixed.withColumn("_base", lit(0L))
    val admitted = based
      .withColumn("offset", col("_base") + col("cum0"))
      .filter(col("offset") < budgetPerSource)
      .select(col("doc_id"), col("source"), col("offset"),
        expr(s"CAST(offset DIV $packTokens AS BIGINT)").as("pack_id"),
        col("tok_cnt"), col("_base"))
      .persist()
    val ts = timestamp_seconds(lit(batchId))
    store.upsert(outTopic,
      admitted.select(col("doc_id"), col("source"), col("offset"), col("pack_id"))
        .withColumn("time", ts), "time", seq = Some(batchId))
    // advanced offset per source = carried base + tokens admitted now;
    // sources with nothing admitted this batch keep their old row
    val newState = admitted.groupBy(col("source"))
      .agg((first(col("_base")) + sum(col("tok_cnt"))).as("admitted_tokens"))
    store.upsert(stateTopic, newState.withColumn("time", ts), "time", seq = Some(batchId))
    admitted.unpersist()
    prefixCache.foreach(_.unpersist())
  }

  /** [[packBatchIncrement]] as a continuous stream: start the returned
    * writer with a checkpointLocation. */
  def packStreamScalable(docs: Dataset[DocArrival], store: graft.sources.TopicStore,
                         outTopic: String, stateTopic: String,
                         budgetPerSource: Long, packTokens: Long)
      : org.apache.spark.sql.streaming.DataStreamWriter[DocArrival] =
    docs.writeStream.foreachBatch { (b: Dataset[DocArrival], id: Long) =>
      packBatchIncrement(store, outTopic, stateTopic, budgetPerSource, packTokens)(b.toDF(), id)
    }

  /** Streaming z-score anomaly detector — ts15 in streaming form:
    * per-key running moments (exact integer sums) live in state; each
    * arriving event is scored against the baseline BEFORE it is
    * folded in (prequential — a spike can't dilute its own baseline),
    * flagged when the key has >= `minN` history and |z| >= `zMin`.
    * State is three longs per key; rows fold in event_id order for
    * replay determinism. O(1) per key, so NoTimeout by default; set
    * `ttlSeconds` to evict keys silent past their last event + ttl
    * (event-time, watermarked via `watermarkDelay`) — in-horizon keys
    * score identically, an evicted key's baseline restarts cold. */
  def anomalyStream(events: Dataset[TopicEvent], zMin: Double,
                    minN: Long = 30L,
                    ttlSeconds: Option[Long] = None,
                    watermarkDelay: String = "1 hour"): Dataset[AnomalousEvent] = {
    import events.sparkSession.implicits._
    val src = ttlSeconds.fold(events)(_ => events.withWatermark("ts", watermarkDelay))
    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[KeyMoments, AnomalousEvent](
        OutputMode.Append,
        ttlSeconds.fold(GroupStateTimeout.NoTimeout())(_ => GroupStateTimeout.EventTimeTimeout())) {
        case (key: Long, rows: Iterator[TopicEvent], state: GroupState[KeyMoments]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else anomalyFold(key, rows, state, zMin, minN, ttlSeconds)
      }
  }

  private def anomalyFold(key: Long, rowsIt: Iterator[TopicEvent],
                          state: GroupState[KeyMoments], zMin: Double,
                          minN: Long, ttlSeconds: Option[Long]): Iterator[AnomalousEvent] = {
    val rows = rowsIt.toSeq
    val st0 = state.getOption.getOrElse(KeyMoments(0L, 0L, 0L))
    val (finalSt, out) = rows.sortBy(_.event_id)
      .foldLeft((st0, Vector.empty[AnomalousEvent])) { case ((st, acc), e) =>
        val vc = math.round(e.value * 100)
        val flagged =
          if (st.n >= minN) {
            val mean = st.sum_c.toDouble / st.n
            val varc = (st.sumsq_c.toDouble - st.sum_c.toDouble * mean) / st.n
            if (varc > 0) {
              val z = (vc.toDouble - mean) / math.sqrt(varc)
              if (math.abs(z) >= zMin) Some(AnomalousEvent(e.event_id, key, vc, z)) else None
            } else None
          } else None
        (KeyMoments(st.n + 1, st.sum_c + vc, st.sumsq_c + vc * vc),
          flagged.fold(acc)(acc :+ _))
      }
    state.update(finalSt)
    ttlSeconds.foreach { ttl =>
      armTtl(state, rows.map(_.ts.getTime).max + ttl * 1000L)
    }
    out.iterator
  }

  /** Streaming ATTRIBUTION — ts30's arrival loop as an online credit
    * assigner (the real-time form attribution systems deploy: credit
    * is assigned the moment the conversion arrives, from the touches
    * seen so far): per-user state is THREE SCALARS (first touch ever,
    * latest touch + its event-time), a touch updates them, a
    * conversion emits its (last_touch-within-window, first_touch)
    * credit row. Batch-consistent whenever arrivals are per-user
    * event-time ordered (rows sort by (ts, event_id) within a batch;
    * the spec pins ordered-feed == batch-kernel equality across a
    * micro-batch split); a LATE touch influences only later
    * conversions — the online contract, same as ewma/cusumStream.
    * Touch set and conversion predicate mirror ts30 (view/click →
    * purchase); `ttlSeconds` evicts silent users. */
  def attributionStream(events: Dataset[TopicEvent],
                        windowSeconds: Long = 7L * 86400L,
                        ttlSeconds: Option[Long] = None,
                        watermarkDelay: String = "1 hour"): Dataset[AttributionCredit] = {
    import events.sparkSession.implicits._
    val winUs = windowSeconds * 1000000L
    val src = ttlSeconds.fold(events)(_ => events.withWatermark("ts", watermarkDelay))
    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[AttState, AttributionCredit](
        OutputMode.Append,
        ttlSeconds.fold(GroupStateTimeout.NoTimeout())(_ => GroupStateTimeout.EventTimeTimeout())) {
        case (key: Long, rowsIt: Iterator[TopicEvent], state: GroupState[AttState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val rows = rowsIt.toSeq
            // the repo's exact µs convention (see FunnelState call sites)
            def us(ts: java.sql.Timestamp): Long =
              Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
            val st0 = state.getOption.getOrElse(AttState(None, None, Long.MinValue))
            val (finalSt, out) = rows.sortBy(e => (us(e.ts), e.event_id))
              .foldLeft((st0, Vector.empty[AttributionCredit])) { case ((st, acc), e) =>
                e.event_type match {
                  case "view" | "click" =>
                    (AttState(st.ft.orElse(Some(e.event_type)),
                      Some(e.event_type), us(e.ts)), acc)
                  case "purchase" =>
                    val lastTouch = st.lt match {
                      case Some(t) if us(e.ts) - st.lt_us <= winUs => t
                      case _ => "none"
                    }
                    (st, acc :+ AttributionCredit(e.event_id, key, lastTouch,
                      st.ft.getOrElse("none"), math.round(e.value * 100)))
                  case _ => (st, acc)
                }
              }
            state.update(finalSt)
            ttlSeconds.foreach { ttl =>
              armTtl(state, rows.map(_.ts.getTime).max + ttl * 1000L)
            }
            out.iterator
          }
      }
  }

  /** Streaming CUSUM control chart — Page's test per key, the ONLINE
    * half of the changepoint pair (batch ts28 locates a shift
    * retrospectively at the max-|CUSUM| point; this raises the alarm
    * LIVE as the shift happens — the form monitoring stacks deploy,
    * with an explicit in-control target rather than a data-derived
    * mean): per arriving event, the one-sided sums update as
    * S⁺ = max(0, S⁺ + (x − target − slack)) and
    * S⁻ = max(0, S⁻ + (target − slack − x)); crossing `threshold`
    * emits an alarm for that event and RESTARTS both sums (the
    * standard post-alarm reset). All arithmetic in exact integer
    * cents — target/slack/threshold are cent parameters — so replays
    * are bit-deterministic. State per key is TWO LONGS (O(1)); rows
    * fold in (ts, event_id) order within a batch; like ewmaStream,
    * cross-batch semantics are prequential (a late event updates the
    * chart at arrival — an online monitor's contract). `ttlSeconds`
    * evicts silent keys (event-time, watermarked); an evicted key's
    * chart restarts at zero. */
  def cusumStream(events: Dataset[TopicEvent], targetCents: Long,
                  slackCents: Long, thresholdCents: Long,
                  ttlSeconds: Option[Long] = None,
                  watermarkDelay: String = "1 hour"): Dataset[CusumAlarm] = {
    import events.sparkSession.implicits._
    require(slackCents >= 0 && thresholdCents > 0,
      "cusumStream: slack must be >= 0 and threshold > 0")
    val src = ttlSeconds.fold(events)(_ => events.withWatermark("ts", watermarkDelay))
    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[CusumState, CusumAlarm](
        OutputMode.Append,
        ttlSeconds.fold(GroupStateTimeout.NoTimeout())(_ => GroupStateTimeout.EventTimeTimeout())) {
        case (key: Long, rowsIt: Iterator[TopicEvent], state: GroupState[CusumState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val rows = rowsIt.toSeq
            val st0 = state.getOption.getOrElse(CusumState(0L, 0L))
            val (finalSt, out) = rows.sortBy(e => (e.ts.getTime, e.event_id))
              .foldLeft((st0, Vector.empty[CusumAlarm])) { case ((st, acc), e) =>
                val vc = math.round(e.value * 100)
                val up = math.max(0L, st.s_plus_c + (vc - targetCents - slackCents))
                val dn = math.max(0L, st.s_minus_c + (targetCents - slackCents - vc))
                if (up > thresholdCents)
                  (CusumState(0L, 0L),
                    acc :+ CusumAlarm(e.event_id, key, vc, "up", up))
                else if (dn > thresholdCents)
                  (CusumState(0L, 0L),
                    acc :+ CusumAlarm(e.event_id, key, vc, "down", dn))
                else (CusumState(up, dn), acc)
              }
            state.update(finalSt)
            ttlSeconds.foreach { ttl =>
              armTtl(state, rows.map(_.ts.getTime).max + ttl * 1000L)
            }
            out.iterator
          }
      }
  }

  /** Streaming EWMA smoother — ts19 in streaming form: each arriving
    * event is smoothed against its key's last up-to-8 cent samples
    * (dyadic alpha=1/2 weights 128..1 — the exact integer math of the
    * batch operator, so stream == batch bit-for-bit). State per key is
    * the 8-sample window the batch form reads via lag(): the depth
    * truncation IS the O(1)-state bound, which is why a dyadic
    * truncated EWMA streams where a true infinite-tail EWMA would
    * need unbounded replay determinism care. Rows fold in event_id
    * order for replay determinism. State is a <=`depth`-sample window
    * per key (O(1)), so NoTimeout by default; set `ttlSeconds` to
    * evict keys silent past their last event + ttl (event-time,
    * watermarked via `watermarkDelay`) — in-horizon keys smooth
    * identically, an evicted key's window restarts empty. */
  def ewmaStream(events: Dataset[TopicEvent], depth: Int = 8,
                 ttlSeconds: Option[Long] = None,
                 watermarkDelay: String = "1 hour"): Dataset[SmoothedEvent] = {
    import events.sparkSession.implicits._
    require(depth >= 1 && depth <= 62, s"depth must be in [1,62], got $depth")
    val src = ttlSeconds.fold(events)(_ => events.withWatermark("ts", watermarkDelay))
    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[EwmaState, SmoothedEvent](
        OutputMode.Append,
        ttlSeconds.fold(GroupStateTimeout.NoTimeout())(_ => GroupStateTimeout.EventTimeTimeout())) {
        case (key: Long, rowsIt: Iterator[TopicEvent], state: GroupState[EwmaState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val rows = rowsIt.toSeq
            val st0 = state.getOption.getOrElse(EwmaState(Vector.empty))
            val (finalSt, out) = rows.sortBy(e => (e.ts.getTime, e.event_id))
              .foldLeft((st0, Vector.empty[SmoothedEvent])) { case ((st, acc), e) =>
                val vc = math.round(e.value * 100)
                val window = (vc +: st.recent_c).take(depth) // newest first
                val num = window.zipWithIndex.map { case (x, j) => x * (1L << (depth - 1 - j)) }.sum
                val den = window.indices.map(j => 1L << (depth - 1 - j)).sum
                (EwmaState(window),
                  acc :+ SmoothedEvent(e.event_id, key, vc, num * 1000 / den))
              }
            state.update(finalSt)
            ttlSeconds.foreach { ttl =>
              armTtl(state, rows.map(_.ts.getTime).max + ttl * 1000L)
            }
            out.iterator
          }
      }
  }

  /** Stream-static enrichment join: the dim side is broadcast, so the
    * stream never shuffles. */
  def enrich(events: DataFrame, dim: DataFrame, eventKey: String, dimKey: String): DataFrame =
    events.join(broadcast(dim), col(eventKey) === col(dimKey), "left")

  /** Continuous ingest into a [[graft.sources.TopicStore]]-compatible
    * topic: streaming rows land in the same time-bucketed parquet
    * layout batch readers scan (ella's publisher path,
    * ella-engine/src/table/topic/rw.rs — micro-batch appends become
    * shard files, compaction merges them later). Caller starts the
    * returned writer. */
  def ingestToTopic(events: DataFrame, topicPath: String, checkpoint: String,
                    tsCol: String = "ts", bucketMinutes: Int = 60): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val bucketSeconds = bucketMinutes * 60L
    events
      .withColumn("bucket", (col(tsCol).cast("long") / bucketSeconds).cast("long") * bucketSeconds)
      .writeStream
      .format("parquet")
      .option("path", topicPath)
      .option("checkpointLocation", checkpoint)
      .partitionBy("bucket")
      .outputMode("append")
  }

  /** Streaming UPSERT sink: each micro-batch lands as a keyed
    * merge-on-read delta in a [[graft.sources.TopicStore]] upsert
    * topic, stamped `_seq = batchId`. Because the version comes from
    * the (replay-stable) batch id, a recovered/replayed micro-batch
    * rewrites byte-identical rows under the SAME version and
    * `readMerged` resolves to the same winners — idempotent sink
    * semantics on plain parquet, no transactional storage needed.
    * Caller starts the returned writer with a checkpointLocation. */
  def upsertToTopic(rows: DataFrame, store: graft.sources.TopicStore,
                    topic: String, tsCol: String = "ts"): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    rows.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.upsert(topic, batch, tsCol, seq = Some(batchId))
      }

  /** Streaming APPEND sink: each micro-batch publishes into a catalog
    * topic through the session's publish path — the topic is
    * auto-created on the first batch, the bucket derives from
    * `tsCol`, and the topic's registered CompactionPolicy fires on
    * cadence via the JVM-wide scheduler (the same path every other
    * write surface uses). Plain appends are at-least-once under
    * replay (a re-run batch re-appends); use [[upsertToTopic]] when
    * replays must collapse to one version. Caller starts the returned
    * writer with a checkpointLocation. */
  def publishToTopic(rows: DataFrame, session: graft.GraftSession,
                     topic: String, tsCol: String = "ts"): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val w = rows.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        session.publish(topic, batch, tsCol)
      }
    // the topic's WriteConfig cadence (triggerMs — the reference's
    // queue-size pacing) sets the micro-batch trigger; publish()
    // itself applies the coalesce/maxRowsPerFile halves per batch
    session.catalog.writeConfig(topic).filter(_.triggerMs > 0)
      .map(c => w.trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(c.triggerMs)))
      .getOrElse(w)
  }
}
