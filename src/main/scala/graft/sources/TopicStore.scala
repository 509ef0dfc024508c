package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Time-bucketed parquet topic storage — the Spark-native counterpart
  * of ella's shard-per-time-range topic files
  * (ella-engine/src/table/topic/shard.rs, shard/writer.rs).
  *
  * A topic is a directory of parquet files hive-partitioned by
  * `bucket=<epoch-minutes-floor>`; appends land in the right bucket,
  * time-range reads prune buckets at planning time (Spark partition
  * pruning = ella's shard pruning), and [[compact]] rewrites
  * small-file buckets (ella-engine/src/table/topic/shard/compact.rs).
  *
  * At 100 TB: bucket granularity bounds file count per partition dir;
  * writes are append-only and partition-parallel; compaction runs
  * per-bucket so it parallelizes across the cluster and never touches
  * sealed, already-compact buckets.
  */
class TopicStore(spark: SparkSession, root: String, val bucketMinutes: Int = 60) {
  private val bucketSeconds = bucketMinutes * 60L

  def topicPath(name: String): String = s"$root/$name"

  /** Whether the topic directory exists yet (a fresh pipeline's
    * fingerprint/output topics don't until the first append). */
  def exists(name: String): Boolean = {
    val p = new Path(topicPath(name))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Append rows; `tsCol` must be a TimestampType column.
    *
    * Appends take the topic's SHARED lock: any number of appenders
    * (interactive session + streaming foreachBatch threads) write
    * concurrently, but never while a compactor holds the exclusive
    * side mid-directory-swap — without this, a file appended between
    * the compactor's snapshot listing and its swap would be deleted
    * with the pre-rewrite directory (silent data loss on exactly the
    * hot bucket that accumulates small files). Coordination is
    * JVM-wide (one driver per cluster coordinates all writes, so the
    * driver JVM is the right scope); writers in SEPARATE driver
    * processes need external coordination, same as upsert `seq`. */
  def append(name: String, df: DataFrame, tsCol: String = "time"): Unit =
    append(name, df, tsCol, None)

  /** Append honoring a topic's [[WriteConfig]]: `coalesce` bounds the
    * file count of this append (the reference's rw-buffer
    * concentration — without it every micro-append task writes its
    * own dust file), `maxRowsPerFile` caps rows per written file
    * (write_batch_size; enforced by the writer, no pre-count). */
  def append(name: String, df: DataFrame, tsCol: String,
             cfg: Option[WriteConfig]): Unit = {
    val l = TopicStore.lockFor(topicPath(name)).readLock(); l.lock()
    try {
      val shaped = cfg.filter(_.coalesce > 0)
        .map(w => df.coalesce(w.coalesce)).getOrElse(df)
      val w = shaped
        .withColumn("bucket", (col(tsCol).cast("long") / bucketSeconds).cast("long") * bucketSeconds)
        .write.mode(SaveMode.Append)
      cfg.filter(_.maxRowsPerFile > 0)
        .foreach(c => w.option("maxRecordsPerFile", c.maxRowsPerFile))
      w.partitionBy("bucket").parquet(topicPath(name))
    } finally l.unlock()
  }

  /** Catalog-stats row count: parquet footer metadata only, no scan
    * job (see [[Stats.parquetRowCount]]). None on an empty/missing
    * topic — callers fall back to read(name).count(). */
  def rowCount(name: String): Option[Long] =
    Stats.parquetRowCount(spark, topicPath(name))

  /** Full scan of a topic (bucket column retained for pruning).
    *
    * `mergeSchema=true` reconciles shards written under different
    * schemas (publishers add columns over a topic's lifetime; old
    * shards surface nulls for new columns). Off by default: schema
    * merging reads every file's footer at planning time, which is a
    * real cost on a 100 TB topic — ask for it only on topics that
    * actually evolved. */
  def read(name: String, mergeSchema: Boolean = false): DataFrame = {
    val r = if (mergeSchema) spark.read.option("mergeSchema", "true") else spark.read
    r.parquet(topicPath(name))
  }

  /** Time-range scan; the bucket predicate prunes partitions so only
    * overlapping shards are listed/read (verify via .explain:
    * "PartitionFilters: [bucket >= ...]"). */
  def readRange(name: String, fromEpochS: Long, toEpochS: Long, tsCol: String = "time"): DataFrame = {
    val fromBucket = fromEpochS / bucketSeconds * bucketSeconds
    read(name)
      .filter(col("bucket") >= fromBucket && col("bucket") < toEpochS)
      .filter(col(tsCol).cast("long") >= fromEpochS && col(tsCol).cast("long") < toEpochS)
  }

  /** Point-in-time SNAPSHOT scan: every row at or before the cutoff
    * (time-travel over an append-only topic). The bucket predicate
    * prunes every shard newer than the cutoff at planning time —
    * a snapshot read touches only the history it asks for. */
  def readAsOf(name: String, asOfEpochS: Long, tsCol: String = "time"): DataFrame =
    read(name)
      .filter(col("bucket") <= asOfEpochS)
      .filter(col(tsCol).cast("long") <= asOfEpochS)

  /** Merge-on-read view AS OF a past instant: latest version per key
    * among rows written at or before the cutoff — what did this
    * upsert topic look like last Tuesday? Same single map-side-
    * combinable merge as [[readMerged]] over the pruned snapshot. */
  def readMergedAsOf(name: String, keyCol: String, asOfEpochS: Long,
                     tsCol: String = "time"): DataFrame =
    mergeLatest(readAsOf(name, asOfEpochS, tsCol), keyCol)

  /** Keyed UPSERT append — merge-on-read deltas (the Hudi/Delta MOR
    * pattern re-expressed on plain bucketed parquet): rows land as a
    * normal append stamped with a monotonically increasing `_seq`
    * writer version; nothing is rewritten at write time, so upserts
    * stay append-only and partition-parallel at any scale. Readers
    * resolve the latest version per key via [[readMerged]]; an
    * optional boolean `_tombstone` column marks deletes. `_tombstone`
    * is ALWAYS materialized (false when the caller didn't pass one)
    * so the column is schema-stable across shards — without it, a
    * mergeSchema=false read of a mixed-schema topic could silently
    * drop the delete flags and resurface tombstoned keys.
    *
    * `seq = None` (the default) draws from a strictly increasing
    * per-store generator (wall-clock millis, bumped past any prior
    * value), so two rapid upserts never tie and last-write-wins is
    * deterministic. `seq = Some(s)` uses the caller's version number
    * verbatim (any long, negatives included — no sentinel).
    *
    * A topic's seq values must come from ONE domain: default clock
    * seqs sit near 1.7e12 while batch-id seqs count 0,1,2,…, so a
    * single default-seq upsert into a batch-seq topic would
    * permanently shadow every batch write under max(_seq). The store
    * records each topic's scheme (clock vs explicit) on first upsert
    * and rejects a mixed write loudly (JVM-wide, like the
    * append/compact lock — writers in separate driver processes must
    * coordinate seqs themselves, as documented).
    *
    * Multiple CONCURRENT writer processes must supply their own
    * coordinated `seq` values — wall clocks across writers are not an
    * ordering. (reference analog: ella's append-only shard writers +
    * compaction, ella-engine/src/table/topic/shard/writer.rs —
    * extended here with key-versioned semantics.) */
  def upsert(name: String, df: DataFrame, tsCol: String = "time",
             seq: Option[Long] = None): Unit = {
    val scheme = if (seq.isDefined) "explicit" else "clock"
    val prior = TopicStore.seqSchemes.putIfAbsent(topicPath(name), scheme)
    if (prior != null && prior != scheme)
      throw new IllegalStateException(
        s"upsert($name): topic already written with $prior seqs; a $scheme-seq write " +
          "would break last-write-wins (clock seqs ~1.7e12 shadow small explicit seqs). " +
          "Use one seq domain per topic.")
    val s = seq.getOrElse(nextSeq())
    val tomb = if (df.columns.contains("_tombstone"))
      coalesce(col("_tombstone").cast("boolean"), lit(false)) else lit(false)
    append(name, df.withColumn("_seq", lit(s)).withColumn("_tombstone", tomb), tsCol)
  }

  private val seqGen = new java.util.concurrent.atomic.AtomicLong(0L)
  private def nextSeq(): Long =
    seqGen.updateAndGet(prev => math.max(prev + 1, System.currentTimeMillis()))

  /** Merge-on-read view of an upsert topic: latest `_seq` wins per
    * `keyCol`, tombstoned keys disappear. The merge is ONE
    * map-side-combinable `max(struct(_seq, ...))` aggregation (the
    * ts02 latest-by-key shape) — partials collapse each shard's
    * duplicates before the shuffle, so the exchange carries ~one row
    * per key per partition, not the raw delta history.
    *
    * `mergeSchema`: set it when the topic's payload schema EVOLVED
    * (columns added over its lifetime) — the union schema surfaces
    * late-added columns as null on old versions, so last-write-wins
    * resolves over every column ever written. Off by default for the
    * same planning-cost reason as [[read]]. (`_seq`/`_tombstone` are
    * schema-stable by construction and never need it.) */
  def readMerged(name: String, keyCol: String,
                 mergeSchema: Boolean = false): DataFrame =
    mergeLatest(read(name, mergeSchema), keyCol)

  private[graft] def mergeLatest(df: DataFrame, keyCol: String): DataFrame = {
    val hasTomb = df.columns.contains("_tombstone")
    val others = df.columns.filterNot(c => c == keyCol || c == "_seq").toSeq
    val merged = df.groupBy(col(keyCol))
      .agg(max(struct(col("_seq") +: others.map(col): _*)).as("_m"))
      .select(col(keyCol) +: others.map(c => col("_m." + c).as(c)): _*)
    if (hasTomb) merged.filter(!coalesce(col("_tombstone"), lit(false))).drop("_tombstone")
    else merged
  }

  /** Fold the delta history away: rewrite the topic as the merged
    * view (winners only, tombstones dropped, `_seq` reset to 0,
    * `_tombstone` re-materialized as false so the column stays
    * schema-stable for future upserts) so subsequent [[readMerged]]
    * calls aggregate nothing. Runs as one partition-parallel write +
    * a two-rename directory swap: the live dir is renamed ASIDE
    * first, the rewrite renamed into place, and only then is the
    * aside copy deleted — a crash at any point leaves the full topic
    * recoverable on disk (under its own name, the `.old_` aside, or
    * the `.merge_` temp; single-rename windows are NOT atomic on
    * object stores, so readers can observe a brief missing-dir gap).
    * Global rather than per-bucket because a key's latest version may
    * live in a different time bucket than its older ones; when an
    * upsert workload keys buckets (key-local writes), per-bucket
    * merge compaction is exact and this same fold runs
    * bucket-parallel without the swap. */
  def mergeCompact(name: String, keyCol: String, tsCol: String = "time"): Unit = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new Path(topicPath(name))
    if (!fs.exists(dir)) return
    val wl = TopicStore.lockFor(topicPath(name)).writeLock(); wl.lock()
    try {
      // snapshot the EXACT file set feeding the rewrite: the merged
      // plan reads only these (not whatever the dir holds at action
      // time), and swapDir salvages any file outside this set
      val known = listParquetRelative(fs, dir)
      if (known.isEmpty) return
      // mergeSchema: evolved topics hold mixed-footer shards; the
      // merge rewrite must carry the UNION schema or it would drop
      // late-added columns from every winner (see compact)
      val src = spark.read.option("basePath", dir.toString)
        .option("mergeSchema", "true")
        .parquet(known.map(r => new Path(dir, r).toString).toSeq: _*)
      val winners = mergeLatest(src, keyCol).drop("bucket")
        .withColumn("_seq", lit(0L))
        .withColumn("_tombstone", lit(false))
      val tmp = new Path(dir.getParent, s".merge_${dir.getName}")
      winners
        .withColumn("bucket", (col(tsCol).cast("long") / bucketSeconds).cast("long") * bucketSeconds)
        .write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(tmp.toString)
      swapDir(fs, tmp, dir, salvageNotIn = Some(known))
    } finally wl.unlock()
  }

  /** TRUNCATE — drop every row of a topic, all-or-nothing (the
    * stream-generation reset [[graft.streaming.TopicStream.transitionsStream]]
    * needs: an additive delta changelog relaunched from a FRESH
    * checkpoint recomputes its history from the source, so the prior
    * generation's rows must vanish atomically or they double-count).
    * Crash-safe via rename-then-delete: the live dir moves to a
    * `.trunc_` aside first, so no reader ever observes a
    * partially-deleted topic — a crash leaves either the full topic
    * (rename failed, nothing happened) or no topic plus aside garbage
    * that [[recover]] sweeps. Resets the topic's seq-domain record:
    * a truncated topic is a new topic. No-op if the topic is absent. */
  def truncate(name: String): Unit = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new Path(topicPath(name))
    val wl = TopicStore.lockFor(topicPath(name)).writeLock(); wl.lock()
    try {
      if (!fs.exists(dir)) return
      val aside = new Path(dir.getParent, s".trunc_${dir.getName}")
      if (fs.exists(aside)) fs.delete(aside, true)
      if (!fs.rename(dir, aside))
        throw new java.io.IOException(
          s"truncate($name): could not move $dir aside; topic left untouched")
      fs.delete(aside, true)
      TopicStore.seqSchemes.remove(topicPath(name))
    } finally wl.unlock()
  }

  /** CDC — what changed in an upsert topic between two instants: the
    * row-level diff of [[readMergedAsOf]](toEpochS) against
    * [[readMergedAsOf]](fromEpochS), classified per key as
    * `insert` (key live at `to`, absent/tombstoned at `from`),
    * `update` (live at both but a different winning `_seq` — the same
    * surviving version is NOT a change, so late-arriving rows that
    * lose last-write-wins produce no row), or `delete` (live at
    * `from`, tombstoned at `to`). Inserts/updates carry the post-image
    * column values, deletes the pre-image (the Delta/Hudi change-feed
    * convention); `_seq` is the winning version on that side.
    * (reference analog: the registry transaction log's create/update
    * /delete records, ella-engine/src/registry/transaction_log.rs —
    * re-expressed over data rows instead of catalog entries.)
    *
    * Scale shape — cost is proportional to the DELTA, not the topic:
    * the window scan is bucket-pruned to (from, to]; only keys
    * TOUCHED in the window are considered, so the single historical
    * scan (bucket-pruned to <= from) collapses under a semi-join on
    * the touched-key set before its merge agg; the post state reuses
    * the pre winners + the window rows (merge-latest is associative,
    * so no second history scan); and the final pre/post comparison is
    * a key-partitioned join of two touched-key-sized frames that
    * reuses the merge aggs' hash partitioning (no extra exchange).
    *
    * An append-only topic (no `_seq`) degenerates to "every window
    * row is an insert" — returned directly from the pruned window
    * scan. Instants are inclusive epoch-second cutoffs, matching
    * [[readAsOf]]'s truncated-second semantics. */
  def readChanges(name: String, keyCol: String, fromEpochS: Long, toEpochS: Long,
                  tsCol: String = "time"): DataFrame = {
    require(toEpochS >= fromEpochS,
      s"readChanges($name): toEpochS ($toEpochS) must be >= fromEpochS ($fromEpochS)")
    // (from, to] in the store's truncated-second space = [from+1, to+1)
    val window0 = readRange(name, fromEpochS + 1, toEpochS + 1, tsCol)
    if (!window0.columns.contains("_seq"))
      return window0.drop("bucket").withColumn("_change_type", lit("insert"))
    // upsert always materializes _tombstone, but a caller-stamped _seq
    // append may not have — normalize so the packing below is total
    val window = if (window0.columns.contains("_tombstone")) window0
                 else window0.withColumn("_tombstone", lit(false))
    val dataCols = window.columns
      .filterNot(c => c == keyCol || c == "_seq" || c == "_tombstone" || c == "bucket").toSeq
    val touched = window.select(col(keyCol)).distinct()
    val hist0 = readAsOf(name, fromEpochS, tsCol)
    val hist = if (hist0.columns.contains("_tombstone")) hist0
               else hist0.withColumn("_tombstone", lit(false))
    val pre = mergeWinners(hist.join(touched, Seq(keyCol), "left_semi"), keyCol)
    // history <= to  ==  history <= from  ∪  window rows, and
    // merge-latest is associative — fold the window into the pre
    // winners instead of re-scanning the history
    val post = mergeWinners(
      pre.unionByName(window.select(pre.columns.map(col).toSeq: _*)), keyCol)
    def packed(df: DataFrame, as: String) = df.select(col(keyCol),
      struct((dataCols :+ "_seq" :+ "_tombstone").map(col): _*).as(as))
    val j = packed(pre, "_pre").join(packed(post, "_post"), Seq(keyCol), "full_outer")
    val preLive = col("_pre").isNotNull && !col("_pre._tombstone")
    val postLive = col("_post").isNotNull && !col("_post._tombstone")
    val classified = j.withColumn("_change_type",
        when(postLive && !preLive, "insert")
          .when(preLive && !postLive, "delete")
          .when(preLive && postLive && col("_post._seq") =!= col("_pre._seq"), "update"))
      .filter(col("_change_type").isNotNull)
    val img = when(col("_change_type") === "delete", col("_pre")).otherwise(col("_post"))
    classified.select(
      col(keyCol) +:
        dataCols.map(c => img.getField(c).as(c)) :+
        img.getField("_seq").as("_seq") :+
        col("_change_type"): _*)
  }

  /** [[mergeLatest]] keeping every column (incl. `_seq`/`_tombstone`
    * — the winner's identity, which CDC classification needs). Same
    * single map-side-combinable max(struct) agg. */
  private def mergeWinners(df: DataFrame, keyCol: String): DataFrame = {
    val others = df.columns.filterNot(c => c == keyCol || c == "_seq").toSeq
    df.groupBy(col(keyCol))
      .agg(max(struct(col("_seq") +: others.map(col): _*)).as("_m"))
      .select(col(keyCol) +: col("_m._seq").as("_seq") +: others.map(c => col("_m." + c).as(c)): _*)
  }

  /** Relative paths of every parquet file under `dir` (recursive). */
  private def listParquetRelative(fs: org.apache.hadoop.fs.FileSystem,
                                  dir: Path): Set[String] = {
    def walk(p: Path, rel: String): Seq[String] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val r = if (rel.isEmpty) st.getPath.getName else rel + "/" + st.getPath.getName
        if (st.isDirectory) walk(st.getPath, r)
        else if (st.getPath.getName.endsWith(".parquet")) Seq(r)
        else Seq.empty
      }
    walk(dir, "").toSet
  }

  /** RESTORE — rewrite the topic back to its state AS OF an instant
    * (the Delta RESTORE / Iceberg rollback analog over bucketed time
    * travel): whole buckets past the cutoff are DELETED (a directory
    * drop each — no data read), and the single boundary bucket
    * straddling the cutoff is rewritten filtered, swapped in with the
    * same crash-recoverable two-rename [[swapDir]] the compactor
    * uses. Cost is O(after-cutoff data), never O(topic). Combined
    * with a [[TopicCatalog.Tag]], this is disaster recovery: pin →
    * diff ([[readChanges]]) → restore. Returns the touched bucket
    * ids (empty = nothing after the cutoff — idempotent).
    *
    * `seqCutoff`: also drop rows whose `_seq` writer version exceeds
    * it — the write-version half of a [[TopicCatalog.Tag]] pin. A
    * backdated upsert lands in an OLD bucket (its ts is under the
    * time cutoff), so honoring the pin means checking every kept
    * bucket for over-cutoff versions, not just the boundary; buckets
    * with none are detected by one pruned scan and left untouched. */
  def restoreAsOf(name: String, asOfEpochS: Long, tsCol: String = "time",
                  seqCutoff: Option[Long] = None): Seq[Long] = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = new Path(topicPath(name))
    if (!fs.exists(base)) return Seq.empty
    val wl = TopicStore.lockFor(topicPath(name)).writeLock(); wl.lock()
    try {
      val buckets = fs.listStatus(base).filter(_.isDirectory)
        .map(_.getPath.getName).filter(_.startsWith("bucket="))
        .map(_.stripPrefix("bucket=").toLong)
      val dropped = buckets.filter(_ > asOfEpochS).toSeq.sorted
      dropped.foreach(b => fs.delete(new Path(base, s"bucket=$b"), true))
      val kept = buckets.filterNot(dropped.contains).toSeq.sorted
      // a bucket needs a rewrite when it straddles the time cutoff OR
      // (under a seq pin) holds any over-cutoff writer version
      def overCutoff(df: org.apache.spark.sql.DataFrame) = {
        val time = col(tsCol).cast("long") > asOfEpochS
        seqCutoff match {
          // null-guarded: rows with a null _seq (a topic that mixed
          // append and upsert writes) carry no writer version — they
          // are under any pin, and `null > sc` would otherwise make
          // BOTH this predicate and its negation below drop them
          case Some(sc) if df.columns.contains("_seq") =>
            time || coalesce(col("_seq") > sc, lit(false))
          case _ => time
        }
      }
      // no seq pin → only the bucket straddling the time cutoff can
      // hold over-cutoff rows, so the probe stays O(after-cutoff data)
      val candidates = seqCutoff match {
        case Some(_) => kept
        case None => kept.filter(b => b <= asOfEpochS && b + bucketSeconds > asOfEpochS + 1)
      }
      val rewritten = candidates.filter { b =>
        val dir = new Path(base, s"bucket=$b")
        val files = fs.listStatus(dir).filter(_.getPath.getName.endsWith(".parquet"))
        val raw =
          if (files.isEmpty) None
          // mergeSchema: a restore rewrite of an evolved bucket must
          // keep the union schema (same hazard as compact)
          else Some(spark.read.option("mergeSchema", "true")
            .parquet(files.map(_.getPath.toString).toSeq: _*))
        // content-gated: rewrite only when the bucket actually holds
        // over-cutoff rows — a second restore is a no-op
        raw.exists(df => df.filter(overCutoff(df)).head(1).nonEmpty) && {
          val keep = raw.get.filter(!overCutoff(raw.get))
          val tmp = new Path(base, s".restore_bucket=$b")
          keep.coalesce(math.max(1, files.length))
            .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
          swapDir(fs, tmp, dir)
          true
        }
      }
      dropped ++ rewritten
    } finally wl.unlock()
  }

  /** Crash-recovery sweep — finish or roll back an interrupted
    * directory swap ([[swapDir]]'s crash windows, at both the topic
    * level of [[mergeCompact]] and the bucket level of [[compact]]):
    *
    * - live dir MISSING + `.old_` aside present → the crash hit
    *   between the two renames; the aside is the only complete copy —
    *   restore it (roll the rewrite back; the `.merge_`/`.compact_`
    *   temp is then deleted, it was never promoted).
    * - live dir present + aside/temp leftovers → the swap completed
    *   (or the rewrite never got promoted); the leftovers are
    *   consumed-originals / dead rewrites — delete them. Rewrites run
    *   under the topic's EXCLUSIVE lock, so no append can have landed
    *   in an aside after its snapshot listing (swapDir's salvage
    *   already covered the in-process case at swap time).
    *
    * Idempotent; returns the actions taken ("restored:…"/"removed:…").
    * [[GraftSession.maintain]] runs this first, so a crashed
    * maintenance pass self-heals on the next one. */
  def recover(name: String): Seq[String] = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new Path(topicPath(name))
    val wl = TopicStore.lockFor(topicPath(name)).writeLock(); wl.lock()
    try {
      val actions = scala.collection.mutable.ArrayBuffer.empty[String]
      def sweep(dir: Path, asideOf: Path => Path, temps: Path => Seq[Path]): Unit = {
        val aside = asideOf(dir)
        if (!fs.exists(dir) && fs.exists(aside)) {
          if (!fs.rename(aside, dir))
            throw new java.io.IOException(s"recover: could not restore $aside to $dir")
          actions += s"restored:${dir.getName}"
        } else if (fs.exists(aside)) {
          fs.delete(aside, true); actions += s"removed:${aside.getName}"
        }
        temps(dir).filter(fs.exists).foreach { t =>
          fs.delete(t, true); actions += s"removed:${t.getName}"
        }
      }
      // topic-level (mergeCompact): asides live in the store root
      sweep(live,
        d => new Path(d.getParent, s".old_${d.getName}"),
        d => Seq(new Path(d.getParent, s".merge_${d.getName}")))
      // truncate: a `.trunc_` aside is consumed data mid-delete — never
      // restore it (live-missing + trunc-aside = the truncate SUCCEEDED
      // up to its final delete); just finish the delete
      val trunc = new Path(live.getParent, s".trunc_${live.getName}")
      if (fs.exists(trunc)) {
        fs.delete(trunc, true); actions += s"removed:${trunc.getName}"
      }
      // bucket-level (compact): asides live inside the topic dir
      if (fs.exists(live)) {
        val names = fs.listStatus(live).map(_.getPath.getName)
        names.filter(_.startsWith(".old_bucket=")).foreach { a =>
          sweep(new Path(live, a.stripPrefix(".old_")),
            d => new Path(live, s".old_${d.getName}"),
            _ => Seq.empty)
        }
        names.filter(n => n.startsWith(".compact_bucket=") ||
            n.startsWith(".restore_bucket=")).foreach { t =>
          fs.delete(new Path(live, t), true); actions += s"removed:$t"
        }
      }
      actions.toSeq
    } finally wl.unlock()
  }

  /** Crash-recoverable directory swap: `dir` -> `.old_` aside, `tmp`
    * -> `dir`, delete aside. Every intermediate state keeps one full
    * copy of the data on disk — and because Hadoop FileSystems report
    * failure by RETURNING FALSE from rename (not throwing), each step
    * is checked: an unchecked failed second rename followed by the
    * aside delete would remove the only surviving copy. On a failed
    * swap-in the aside copy is renamed back, so a FAILED (not crashed)
    * swap leaves the topic exactly as it was.
    *
    * `salvageNotIn`: relative paths of the parquet files the rewrite
    * actually consumed. Before the aside copy is discarded, any
    * parquet file found in it OUTSIDE this set (an append that landed
    * after the rewrite's snapshot listing) is moved into the new dir
    * instead of deleted — the last line of defense against losing a
    * concurrent append, on top of the topic write lock. */
  private[graft] def swapDir(fs: org.apache.hadoop.fs.FileSystem, tmp: Path, dir: Path,
                             salvageNotIn: Option[Set[String]] = None): Unit = {
    val aside = new Path(dir.getParent, s".old_${dir.getName}")
    if (fs.exists(aside)) fs.delete(aside, true)
    if (!fs.rename(dir, aside))
      throw new java.io.IOException(
        s"directory swap: could not move $dir aside; topic left untouched")
    // some FileSystems signal a failed rename by returning false,
    // others (e.g. local) by throwing — restore the aside copy on both
    val movedIn =
      try fs.rename(tmp, dir)
      catch {
        case e: java.io.IOException =>
          val restored = fs.rename(aside, dir)
          throw new java.io.IOException(
            s"directory swap: could not move $tmp into place; original " +
              (if (restored) "restored" else s"preserved at $aside"), e)
      }
    if (!movedIn) {
      val restored = fs.rename(aside, dir)
      throw new java.io.IOException(
        s"directory swap: could not move $tmp into place; original " +
          (if (restored) "restored" else s"preserved at $aside"))
    }
    salvageNotIn.foreach { known =>
      def walk(p: Path, rel: String): Unit = fs.listStatus(p).foreach { st =>
        val r = if (rel.isEmpty) st.getPath.getName else rel + "/" + st.getPath.getName
        if (st.isDirectory) walk(st.getPath, r)
        else if (st.getPath.getName.endsWith(".parquet") && !known.contains(r)) {
          val dst = new Path(dir, r)
          fs.mkdirs(dst.getParent)
          if (!fs.rename(st.getPath, dst))
            throw new java.io.IOException(
              s"directory swap: could not salvage late append ${st.getPath} to $dst")
        }
      }
      walk(aside, "")
    }
    fs.delete(aside, true)
  }

  /** Rewrite over-fragmented buckets (small-file compaction). A
    * bucket is due when it holds more than `maxFilesPerBucket`
    * parquet files, or — when `minShardBytes` > 0 — when two or more
    * of its files are below that size (dust worth folding even at a
    * low file count, the reference's `min_shard_size`,
    * ella-engine/src/table/config.rs:6-22). Rewrites aim each output
    * shard at `targetShardBytes` (`target_shard_size`); with no
    * target the bucket collapses to a single file. Sealed compact
    * buckets are left untouched. Returns compacted buckets.
    *
    * `clusterBy`: optionally sort rows within the rewritten file —
    * compaction-time CLUSTERING. Parquet keeps min/max stats per row
    * group, so clustering on the columns queries filter by (key,
    * time) turns those predicates into row-group skips on every
    * future read: the one-time compaction sort buys scan pruning for
    * the rest of the shard's life — the standard data-layout lever
    * at 100 TB (same idea as Z-ordering, exact for 1-D keys). */
  /** Retention sweep — apply a topic's [[RetentionPolicy]]: whole
    * buckets whose END falls before the data-relative horizon
    * (`newest bucket start − maxAge`) are removed; with a downsample
    * tier configured, their rows first aggregate per
    * (`everyMinutes` window, keyCols) into n / min / max / exact
    * cent-sum rows appended to the tier topic. Returns the dropped
    * bucket ids (empty = nothing expired — idempotent).
    *
    * The whole sweep holds the topic's EXCLUSIVE lock: an append
    * landing in an expiring bucket between the tier aggregation and
    * the directory removal would otherwise be dropped unsampled.
    * Scale shape: the sweep lists bucket DIRS (no data read) to find
    * expired ones, scans only the expiring buckets (partition-pruned
    * `bucket IN (...)`) for the tier, and deletes O(expired) dirs —
    * the live topic is never read.
    *
    * `protectAtOrBelowEpochS`: buckets starting at or below this
    * instant are NEVER expired, whatever their age — the tag guard
    * ([[graft.GraftSession.maintain]] passes the newest live snapshot
    * tag cutoff, so retention cannot delete data a tag still pins). */
  def retentionSweep(name: String, pol: RetentionPolicy,
                     protectAtOrBelowEpochS: Option[Long] = None): Seq[Long] = {
    require(pol.downsampleTo != name, "downsample tier must be a different topic")
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = new Path(topicPath(name))
    if (!fs.exists(base)) return Seq.empty
    val wl = TopicStore.lockFor(topicPath(name)).writeLock(); wl.lock()
    try {
      val buckets = fs.listStatus(base).filter(_.isDirectory)
        .map(_.getPath.getName).filter(_.startsWith("bucket="))
        .map(_.stripPrefix("bucket=").toLong).sorted
      if (buckets.isEmpty) return Seq.empty
      val horizon = buckets.last - pol.maxAgeMinutes * 60L
      val expired = buckets.filter(_ + bucketSeconds <= horizon)
        .filter(b => protectAtOrBelowEpochS.forall(b > _))
      if (expired.isEmpty) return Seq.empty
      if (pol.downsampleTo.nonEmpty) {
        val every = pol.everyMinutes * 60L
        val win = (col(pol.tsCol).cast("long") / every).cast("long") * every
        val cents = round(col(pol.valueCol) * 100).cast("long")
        val tier = read(name)
          .filter(col("bucket").isin(expired: _*))
          .groupBy((win.cast("timestamp").as("time") +: pol.keyCols.map(col)): _*)
          .agg(count(lit(1)).as("n"),
            min(col(pol.valueCol)).as("vmin"),
            max(col(pol.valueCol)).as("vmax"),
            sum(cents).as("sum_c"))
        append(pol.downsampleTo, tier, "time")
      }
      expired.foreach(b => fs.delete(new Path(base, s"bucket=$b"), true))
      expired.toSeq
    } finally wl.unlock()
  }

  def compact(name: String, maxFilesPerBucket: Int = 4,
              clusterBy: Seq[String] = Seq.empty,
              minShardBytes: Long = 0L,
              targetShardBytes: Long = 0L,
              zorder: Boolean = false): Seq[Long] = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = new Path(topicPath(name))
    if (!fs.exists(base)) return Seq.empty
    // exclusive side of the topic lock: appenders are paused for the
    // bucket rewrites so no file can land between each bucket's
    // snapshot listing and its directory swap (see [[append]])
    val wl = TopicStore.lockFor(topicPath(name)).writeLock(); wl.lock()
    try {
      val buckets = fs.listStatus(base).filter(_.isDirectory)
        .filter(_.getPath.getName.startsWith("bucket="))
      val compacted = buckets.filter { b =>
        val files = fs.listStatus(b.getPath).filter(_.getPath.getName.endsWith(".parquet"))
        files.length > maxFilesPerBucket ||
          (minShardBytes > 0 && files.count(_.getLen < minShardBytes) >= 2)
      }
      compacted.foreach { b =>
        val dir = b.getPath
        val tmp = new Path(dir.getParent, s".compact_${dir.getName}")
        // snapshot the exact input files; the rewrite reads only these
        // and swapDir salvages anything that appears outside the set
        val known = fs.listStatus(dir)
          .filter(_.getPath.getName.endsWith(".parquet"))
        val knownPaths = known.map(_.getPath)
        // shard count from the INPUT parquet bytes — input and output
        // are both parquet, so input size is an honest estimator of
        // rewritten size; no target => one file per bucket
        val nShards =
          if (targetShardBytes > 0)
            math.max(1L, (known.map(_.getLen).sum + targetShardBytes - 1) / targetShardBytes).toInt
          else 1
        // mergeSchema: an evolved bucket holds mixed-footer shards;
        // without the union schema the rewrite would silently DROP
        // whichever columns the sampled footer lacks — permanent loss
        // from a maintenance pass. Cost is O(this bucket's footers),
        // which the compaction read pays anyway.
        val raw = spark.read.option("mergeSchema", "true")
          .parquet(knownPaths.map(_.toString).toSeq: _*)
        // Z-order: interleave the clusterBy columns' bits into one
        // Morton key, range-partition shards on it, sort within —
        // every clustered column gets tight footer [min,max] boxes
        // instead of only the first sort column (multi-dim pruning;
        // StorageSpec measures the win). Normalization bounds come
        // from one bucket-local min/max agg — a tiny maintenance-pass
        // job over the bucket being rewritten, not a table scan.
        // Clustering: with a multi-shard target, range-partition on
        // the cluster key so the clustering is GLOBAL across shards
        // (sortWithinPartitions over arbitrary coalesced partitions
        // gives every shard the full value range — footer stats prune
        // nothing); single-shard or unclustered buckets keep the
        // cheap coalesce. The maintenance pass owns this shuffle.
        def lexClustered = {
          val keyCols = clusterBy.map(col)
          (if (nShards > 1) raw.repartitionByRange(nShards, keyCols: _*)
           else raw.coalesce(1))
            .sortWithinPartitions(keyCols: _*)
        }
        val clustered =
          if (zorder && clusterBy.size >= 2) {
            // try_cast: under ANSI mode a plain cast THROWS on a
            // non-numeric string cluster column mid-task; try_cast
            // yields null stats, which select the fallback below.
            val aggCols = clusterBy.flatMap(c => Seq(
              min(col(c).try_cast("double")).as(s"_mn_$c"),
              max(col(c).try_cast("double")).as(s"_mx_$c")))
            val stats = raw.agg(aggCols.head, aggCols.tail: _*).head()
            if ((0 until 2 * clusterBy.size).exists(stats.isNullAt)) {
              // A non-numeric clusterBy column (cast('double') => null)
              // or an all-null one yields null min/max — z-normalization
              // is undefined, and the policy runs on the publish path,
              // so fall back to lexicographic clustering instead of
              // NPE-ing every append/maintain() of the topic.
              lexClustered
            } else {
              val norms = clusterBy.zipWithIndex.map { case (c, i) =>
                val (mn, mx) = (stats.getDouble(2 * i), stats.getDouble(2 * i + 1))
                // try_cast + coalesce: a MIXED column (some rows parse,
                // some don't) passes the null-stats check above but a
                // plain cast would still throw mid-task under ANSI on
                // the malformed rows — park those at mid-range instead.
                if (mx > mn)
                  coalesce((col(c).try_cast("double") - mn) / (mx - mn), lit(0.5))
                else lit(0.5)
              }
              val keyed = raw.withColumn("_z", graft.functions.ZOrder.zvalue(norms))
              (if (nShards > 1) keyed.repartitionByRange(nShards, col("_z"))
               else keyed.coalesce(1))
                .sortWithinPartitions(col("_z")).drop("_z")
            }
          } else if (clusterBy.nonEmpty) lexClustered
          else raw.coalesce(nShards)
        clustered.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        swapDir(fs, tmp, dir, salvageNotIn = Some(knownPaths.map(_.getName).toSet))
      }
      compacted.map(_.getPath.getName.stripPrefix("bucket=").toLong).toSeq
    } finally wl.unlock()
  }
}

object TopicStore {
  /** Per-topic-path writer coordination (JVM-wide): appends hold the
    * shared side, compaction the exclusive side. Keyed by full topic
    * path so every TopicStore instance over the same storage root in
    * this driver coordinates on the same lock. */
  private val topicLocks =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.locks.ReentrantReadWriteLock]()
  private def lockFor(path: String): java.util.concurrent.locks.ReentrantReadWriteLock =
    topicLocks.computeIfAbsent(path, _ => new java.util.concurrent.locks.ReentrantReadWriteLock())

  /** Per-topic-path upsert seq scheme ("clock" | "explicit"), recorded
    * on first upsert so mixed-domain writes fail fast (see [[TopicStore.upsert]]). */
  private[sources] val seqSchemes =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
}
