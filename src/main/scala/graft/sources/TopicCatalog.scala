package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, max}
import org.apache.spark.sql.types.StructType
import scala.collection.mutable

/** Catalog → schema → table registry with a durable JSON manifest —
  * the Spark counterpart of ella's registry + transaction snapshot
  * (ella-engine/src/registry.rs, registry/snapshot.rs, catalog.rs).
  *
  * Tables are ella's kinds (README.md "Concepts"):
  *  - topics: parquet-backed append streams ([[TopicStore]] paths)
  *  - temporary topics: session-scoped, never persisted to the
  *    manifest (README "Concepts": "temporary topics are not stored";
  *    ella-engine/src/table/config.rs `temporary`)
  *  - views: named queries, recomputed per scan, or materialized to
  *    parquet (ella-engine/src/table/view.rs, lazy/view.rs)
  *
  * Durability — the reference's transaction log + snapshot pair
  * (ella-engine/src/registry/transactions.rs, snapshot.rs), re-done on
  * plain files:
  *  - every mutation APPENDS one JSON op line to `_graft_catalog.log`
  *    (O(1) per commit, not O(catalog));
  *  - every `snapshotEvery` ops (or on [[checkpoint]]) the full state
  *    is written through a temp file + atomic rename and the log is
  *    truncated — a crash at any point leaves either the old or the
  *    new snapshot plus a replayable tail, never a torn manifest;
  *  - [[load]] reads the snapshot then replays the log tail.
  * Both files are real JSON written AND parsed with jackson (already
  * on the Spark classpath), so view SQL containing quotes, newlines,
  * or any other escape survives a reload byte-for-byte.
  */
/** Per-topic compaction schedule — the counterpart of the reference's
  * per-table `TableConfig` (ella-engine/src/table/config.rs:1-25:
  * `min_shard_size` / `target_shard_size` decide when sealing shards
  * are rewritten by `shard/compact.rs`). Durable in the catalog
  * manifest, so the schedule survives restarts with the topic.
  *
  * `everyAppends`: run a compaction check after this many publishes
  * (the cadence — checking on every append would re-list every bucket
  * of a 100 TB topic for each micro-append). `maxFilesPerBucket` /
  * `clusterBy` parameterize the [[TopicStore.compact]] pass itself.
  *
  * `minShardBytes` / `targetShardBytes` are the reference's
  * size-driven shard policy (`config.rs:6-22`): a bucket holding two
  * or more files below `minShardBytes` is fragmented and gets
  * rewritten even when its file COUNT is within bounds, and rewrites
  * aim each output shard at `targetShardBytes` instead of one file
  * per bucket — at 100 TB, count-only compaction can still leave
  * multi-GB monoliths or dust. 0 disables the size rules (count-only,
  * the pre-existing behavior; also what an old manifest deserializes
  * to). */
case class CompactionPolicy(everyAppends: Int,
                            maxFilesPerBucket: Int = 4,
                            clusterBy: Seq[String] = Seq.empty,
                            minShardBytes: Long = 0L,
                            targetShardBytes: Long = 0L,
                            zorder: Boolean = false) {
  require(everyAppends > 0, "everyAppends must be positive")
  require(minShardBytes >= 0 && targetShardBytes >= 0, "shard byte bounds must be >= 0")
  require(targetShardBytes == 0 || minShardBytes <= targetShardBytes,
    "minShardBytes must not exceed targetShardBytes")
}

/** Write-path batching for a topic — the ingest half of the
  * reference's `TableConfig` (ella-engine/src/table/config.rs:3-11:
  * write_batch_size / rw_buffer_capacity / queue cadences), persisted
  * in the manifest so every write surface honors it. Spark mapping:
  *
  *  - `maxRowsPerFile` (write_batch_size): caps rows per written
  *    shard file via parquet's maxRecordsPerFile — enforced inside
  *    the writer, no pre-count scan.
  *  - `coalesce` (rw_buffer_capacity): concentrates an append's
  *    partitions before writing, so a 32-task micro-append lands as
  *    this many files instead of 32 dust files — the write buffer
  *    that stood between the reference's row stream and its shards.
  *  - `triggerMs` (queue cadence): micro-batch trigger interval for
  *    streaming sinks into the topic.
  *
  * 0 disables each knob (Spark's own defaults apply). */
case class WriteConfig(maxRowsPerFile: Long = 0L,
                       coalesce: Int = 0,
                       triggerMs: Long = 0L) {
  require(maxRowsPerFile >= 0 && coalesce >= 0 && triggerMs >= 0,
    "write config knobs must be >= 0")
}

/** Data-lifecycle retention for a topic — the TSDB tiering rule every
  * production time-series store grows into (raw shards are kept for a
  * horizon, then downsampled into a coarse rollup tier and dropped).
  * The horizon is DATA-relative — `newest bucket start −
  * maxAgeMinutes` — so sweeps are deterministic and replay-safe
  * (a wall-clock sweep is the same rule with "now" as the newest
  * point; data-relative is what keeps tests and backfills exact).
  *
  * Drop-only when `downsampleTo` is empty. With a downsample target,
  * expired rows first aggregate per (`everyMinutes` window, keyCols):
  * n / min / max / exact cent-sum of `valueCol` — the
  * continuous-aggregate tier — and append to `downsampleTo` before
  * the raw buckets are removed. Only WHOLE expired buckets are ever
  * touched: the sweep is O(expired shards) directory work plus one
  * bucket-pruned scan of exactly the expiring data, never a read of
  * the live topic. */
case class RetentionPolicy(maxAgeMinutes: Long,
                           downsampleTo: String = "",
                           everyMinutes: Int = 60,
                           valueCol: String = "",
                           keyCols: Seq[String] = Seq.empty,
                           tsCol: String = "time") {
  require(maxAgeMinutes > 0, "maxAgeMinutes must be positive")
  require(everyMinutes > 0, "everyMinutes must be positive")
  require(downsampleTo.isEmpty || valueCol.nonEmpty,
    "a downsample tier needs the value column to aggregate")
}

class TopicCatalog(spark: SparkSession, root: String,
                   defaultCatalog: String = "ella", defaultSchema: String = "public") {

  sealed trait Entry { def kind: String }
  /** `cols`/`evolved`: the publish path records each topic's column
    * set in the manifest (zero store IO — the INCOMING frame's
    * columns are compared, never a file listing); the first publish
    * under a different set flips `evolved`, and [[table]] then reads
    * with the union schema automatically. Never-evolved topics keep
    * the cheap single-footer read — the mergeSchema planning cost is
    * paid exactly by the topics that need it. */
  case class Topic(path: String,
                   compaction: Option[CompactionPolicy] = None,
                   write: Option[WriteConfig] = None,
                   retention: Option[RetentionPolicy] = None,
                   cols: Seq[String] = Seq.empty,
                   evolved: Boolean = false) extends Entry {
    val kind = "topic"
  }
  /** Session-scoped topic: lives only in this catalog instance, never
    * written to the manifest. */
  case class TempTopic(df: DataFrame) extends Entry { val kind = "temp_topic" }
  case class View(sql: String, materializedPath: Option[String]) extends Entry {
    val kind = if (materializedPath.isDefined) "materialized_view" else "view"
  }
  /** Explicit catalog ("cat") or schema ("cat.sch") registration —
    * the reference's cluster/catalog levels (`cluster.rs:42-90`,
    * `catalog.rs:48-113`), where namespaces are first-class tx-logged
    * objects, not just name prefixes. */
  case object Namespace extends Entry { val kind = "namespace" }
  /** Named SNAPSHOT TAG — an immutable catalog pin of a topic's state
    * AS OF an instant (the Iceberg tag / Delta version-tag idea over
    * the store's time travel). `keyCol` set = merged view (latest
    * version per key at the cutoff, tombstones dropped); unset = raw
    * append-only snapshot. Metadata-plus-one-scalar — no data is
    * copied; the pin costs one manifest row and resolves to a
    * bucket-pruned as-of scan.
    *
    * Reproducibility is pinned on TWO axes: the data-time cutoff
    * (`asOfEpochS` over `tsCol`) and a WRITE-VERSION cutoff
    * (`seqCutoff` = the topic's max `_seq` at tag time), so a later
    * upsert carrying a backdated timestamp — or a backdated higher
    * version — cannot change what the tag resolves to. Append-only
    * topics have no version column (`seqCutoff` = None); for them the
    * pin holds against backdated appends only if writers don't
    * backdate — the documented caveat. Retention is tag-aware:
    * [[graft.GraftSession.maintain]] never expires a bucket a live
    * tag still references. Drop with `execute("DROP TABLE tag")`. */
  case class Tag(topic: String, asOfEpochS: Long, tsCol: String,
                 keyCol: Option[String],
                 seqCutoff: Option[Long] = None) extends Entry { val kind = "tag" }

  private val manifestPath = Paths.get(s"$root/_graft_catalog.json")
  private val logPath = Paths.get(s"$root/_graft_catalog.log")
  /** Ops between automatic snapshot compactions of the log. */
  private val snapshotEvery = 64
  private var opsSinceSnapshot = 0
  private val entries = mutable.LinkedHashMap[String, Entry]()
  load()

  // -- catalog/schema context (ella/src/ella.rs:118-137
  //    `use_catalog` / `use_schema`) --

  private var curCatalog = defaultCatalog
  private var curSchema = defaultSchema
  def useCatalog(c: String): Unit = { require(c.nonEmpty); curCatalog = c }
  def useSchema(s: String): Unit = { require(s.nonEmpty); curSchema = s }
  def currentCatalog: String = curCatalog
  def currentSchema: String = curSchema

  /** Fully-qualified id; bare names resolve in the CURRENT schema and
    * catalog (ella/src/ella.rs:153-162). */
  def resolve(ref: String): String = ref.split('.') match {
    case Array(t) => s"$curCatalog.$curSchema.$t"
    case Array(s, t) => s"$curCatalog.$s.$t"
    case _ => ref
  }

  // -- catalog / schema lifecycle (ella cluster.rs:42-90 create_catalog/
  //    deregister, catalog.rs:48-113 create_schema/deregister) --

  private def resolveSchema(ref: String): String = ref.split('.') match {
    case Array(s) => s"$curCatalog.$s"
    case _ => ref
  }

  /** Register a catalog. Exists + `ifNotExists` → no-op; exists
    * otherwise → error (the reference's CatalogExists). */
  def createCatalog(name: String, ifNotExists: Boolean = false): Unit = {
    require(!name.contains('.'), s"catalog name must be unqualified: $name")
    if (entries.contains(name)) {
      if (ifNotExists) return
      throw new IllegalStateException(s"catalog already exists: $name")
    }
    entries(name) = Namespace
    commit("put", name, Some(Namespace))
  }

  /** Register a schema ("sch" in the current catalog, or "cat.sch"). */
  def createSchema(ref: String, ifNotExists: Boolean = false): Unit = {
    val fqn = resolveSchema(ref)
    require(fqn.count(_ == '.') == 1, s"schema id must be catalog.schema: $fqn")
    if (entries.contains(fqn)) {
      if (ifNotExists) return
      throw new IllegalStateException(s"schema already exists: $fqn")
    }
    entries(fqn) = Namespace
    commit("put", fqn, Some(Namespace))
  }

  private def dropNamespace(fqn: String, ifExists: Boolean, cascade: Boolean,
                            what: String): Boolean = {
    if (!entries.contains(fqn)) {
      if (ifExists) return false
      throw new NoSuchElementException(s"$what not found: $fqn")
    }
    val children = entries.keys.filter(_.startsWith(fqn + ".")).toSeq
    if (children.nonEmpty && !cascade)
      throw new IllegalStateException(s"cannot remove non-empty $what $fqn")
    children.foreach { k =>
      val wasDurable = entries.remove(k).exists(_.kind != "temp_topic")
      if (wasDurable) commit("drop", k, None)
    }
    entries.remove(fqn)
    commit("drop", fqn, None)
    true
  }

  /** Drop a catalog; `cascade` removes its schemas and tables, without
    * it a non-empty catalog is an error (reference `deregister`). */
  def dropCatalog(name: String, ifExists: Boolean = false,
                  cascade: Boolean = false): Boolean =
    dropNamespace(name, ifExists, cascade, "catalog")

  def dropSchema(ref: String, ifExists: Boolean = false,
                 cascade: Boolean = false): Boolean =
    dropNamespace(resolveSchema(ref), ifExists, cascade, "schema")

  /** Registered catalog names (explicit `createCatalog` only). */
  def catalogs(): Seq[String] =
    entries.collect { case (n, Namespace) if !n.contains('.') => n }.toSeq

  /** Registered schema names under `cat`. */
  def schemas(cat: String): Seq[String] =
    entries.collect {
      case (n, Namespace) if n.startsWith(cat + ".") && n.count(_ == '.') == 1 => n
    }.toSeq

  /** Explicit topic creation (ella/src/ella.rs:176-199 `create_table`
    * with if_not_exists / or_replace):
    *  - an optional explicit schema is committed by writing an empty
    *    parquet dataset at the topic path, so readers see the declared
    *    schema before the first publish (instead of inferring from
    *    whatever arrives first);
    *  - `ifNotExists` makes an existing topic a no-op;
    *  - `orReplace` drops and recreates;
    *  - neither → error on conflict, like the reference.
    */
  def createTopic(ref: String, store: TopicStore,
                  schema: Option[StructType] = None,
                  ifNotExists: Boolean = false,
                  orReplace: Boolean = false): Unit = {
    val fqn = resolve(ref)
    if (entries.contains(fqn)) {
      if (ifNotExists) return
      if (!orReplace) throw new IllegalStateException(s"table already exists: $fqn")
    }
    val path = store.topicPath(fqn)
    schema.foreach { sc =>
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sc)
        .write.mode(SaveMode.Overwrite).parquet(path)
    }
    entries(fqn) = Topic(path)
    commit("put", fqn, Some(entries(fqn)))
  }

  /** Temporary topic: registered for query resolution, never persisted
    * (dropped with the session, like the reference's `temporary`
    * table config). */
  def createTempTopic(ref: String, df: DataFrame): Unit =
    entries(resolve(ref)) = TempTopic(df)

  /** Attach (or replace) a durable compaction schedule on a topic —
    * the reference's per-table config mutation (`TableConfig` builder
    * methods, ella-engine/src/table/config.rs:27-45). Committed
    * through the same tx log as any other catalog mutation. */
  def setCompaction(ref: String, policy: CompactionPolicy): Unit = {
    val fqn = resolve(ref)
    entries.get(fqn) match {
      case Some(t: Topic) =>
        entries(fqn) = t.copy(compaction = Some(policy))
        commit("put", fqn, Some(entries(fqn)))
      case Some(e) =>
        throw new IllegalStateException(s"$fqn is a ${e.kind}, not a topic")
      case None => throw new NoSuchElementException(s"topic not found: $fqn")
    }
  }

  /** The registered compaction schedule, if any. */
  def compaction(ref: String): Option[CompactionPolicy] =
    entries.get(resolve(ref)).collect { case t: Topic if t.compaction.isDefined => t.compaction.get }

  /** Record a publish's column set against the topic (the write-path
    * half of schema evolution — see [[Topic]]): the first publish
    * seeds `cols`; a later publish with a DIFFERENT set unions it in
    * and flips `evolved`, after which [[table]] reads the topic with
    * the union schema. Pure manifest math over the incoming frame's
    * column names — no file listing, no footer read; a no-op commit
    * never happens (unchanged sets write nothing). Order-insensitive:
    * column ORDER differences are not evolution, parquet is
    * name-addressed. */
  def recordSchema(ref: String, incoming: Seq[String]): Unit = {
    val fqn = resolve(ref)
    entries.get(fqn) match {
      case Some(t: Topic) =>
        if (t.cols.isEmpty) {
          entries(fqn) = t.copy(cols = incoming)
          commit("put", fqn, Some(entries(fqn)))
        } else if (incoming.toSet != t.cols.toSet) {
          entries(fqn) = t.copy(
            cols = t.cols ++ incoming.filterNot(t.cols.contains),
            evolved = true)
          commit("put", fqn, Some(entries(fqn)))
        }
      case _ => () // temp topics / views: nothing durable to track
    }
  }

  /** Whether the topic's schema has evolved across publishes. */
  def evolved(ref: String): Boolean =
    entries.get(resolve(ref)).collect { case t: Topic => t.evolved }.getOrElse(false)

  /** Attach (or replace) durable write-path batching on a topic —
    * the write_batch_size / rw_buffer_capacity half of the
    * reference's per-table config (config.rs:27-45 builder methods,
    * the half [[setCompaction]]'s shard policy doesn't cover). */
  def setWriteConfig(ref: String, cfg: WriteConfig): Unit = {
    val fqn = resolve(ref)
    entries.get(fqn) match {
      case Some(t: Topic) =>
        entries(fqn) = t.copy(write = Some(cfg))
        commit("put", fqn, Some(entries(fqn)))
      case Some(e) =>
        throw new IllegalStateException(s"$fqn is a ${e.kind}, not a topic")
      case None => throw new NoSuchElementException(s"topic not found: $fqn")
    }
  }

  /** The registered write-path batching config, if any. */
  def writeConfig(ref: String): Option[WriteConfig] =
    entries.get(resolve(ref)).collect { case t: Topic if t.write.isDefined => t.write.get }

  /** Attach (or replace) a durable retention rule on a topic — the
    * data-lifecycle third of the per-topic config, next to
    * [[setCompaction]] (shard shape) and [[setWriteConfig]] (ingest
    * batching). Committed through the same tx log. */
  def setRetention(ref: String, policy: RetentionPolicy): Unit = {
    val fqn = resolve(ref)
    entries.get(fqn) match {
      case Some(t: Topic) =>
        entries(fqn) = t.copy(retention = Some(policy))
        commit("put", fqn, Some(entries(fqn)))
      case Some(e) =>
        throw new IllegalStateException(s"$fqn is a ${e.kind}, not a topic")
      case None => throw new NoSuchElementException(s"topic not found: $fqn")
    }
  }

  /** The registered retention rule, if any. */
  def retention(ref: String): Option[RetentionPolicy] =
    entries.get(resolve(ref)).collect { case t: Topic if t.retention.isDefined => t.retention.get }

  def createView(ref: String, sql: String): Unit = {
    entries(resolve(ref)) = View(sql, None)
    commit("put", resolve(ref), Some(entries(resolve(ref))))
  }

  /** Materialize a view's current result to parquet (LazyToView /
    * `create_view` with materialization in the reference). */
  def materializeView(ref: String, sql: String): Unit = {
    val path = s"$root/_materialized/${resolve(ref)}"
    spark.sql(sql).write.mode(SaveMode.Overwrite).parquet(path)
    entries(resolve(ref)) = View(sql, Some(path))
    commit("put", resolve(ref), Some(entries(resolve(ref))))
  }

  /** REFRESH MATERIALIZED VIEW — the maintenance verb
    * [[materializeView]] stops short of (without it a stale
    * materialization can only be dropped and recreated): re-plans the
    * registered SQL against the CURRENT catalog state, so base-topic
    * appends since the last refresh flow through, and atomically
    * replaces the parquet materialization via the compactor's
    * two-rename discipline — the rewrite lands in a `.refresh_` temp
    * dir, the live dir moves to an `.old_` aside, the temp swaps in,
    * the aside drops. A crash at ANY instant leaves one complete copy
    * on disk, and refresh HEALS an interrupted predecessor before
    * starting (live missing + aside present = the crash hit between
    * the two renames, so the aside — the only complete copy — is
    * restored; stale temps clear). Readers of the manifest path see
    * either the old or the new materialization, never a torn one.
    * Caller must have the view's base relations resolvable
    * (GraftSession registers topic temp views first, the
    * materializeView contract). */
  def refreshMaterializedView(ref: String): Unit =
    // one refresher per materialization path per JVM (the TopicStore
    // write-lock scope): two concurrent refreshes would both move the
    // live dir aside and the loser's rename-restore would clobber the
    // winner's swap-in. Readers need no lock — they see either the old
    // or the new dir (rename is the atom), same as compaction.
    TopicCatalog.refreshLocks
      .computeIfAbsent(resolve(ref), _ => new Object).synchronized {
        refreshMaterializedViewLocked(ref)
      }

  private def refreshMaterializedViewLocked(ref: String): Unit = {
    val fqn = resolve(ref)
    if (!entries.contains(fqn)) reload()
    val (sql, path) = entries.get(fqn) match {
      case Some(View(s, Some(p))) => (s, p)
      case Some(View(_, None)) => throw new IllegalArgumentException(
        s"$fqn is a plain view — it re-plans on every scan and needs no refresh")
      case Some(e) => throw new IllegalArgumentException(
        s"REFRESH MATERIALIZED VIEW targets a materialized view; $fqn is a ${e.kind}")
      case None => throw new NoSuchElementException(s"view not found: $fqn")
    }
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    val aside = new org.apache.hadoop.fs.Path(live.getParent, s".old_${live.getName}")
    val tmp = new org.apache.hadoop.fs.Path(live.getParent, s".refresh_${live.getName}")
    // heal a crashed predecessor: between-renames crash leaves the
    // aside as the only complete copy; its dead rewrite temp clears
    if (!fs.exists(live) && fs.exists(aside))
      require(fs.rename(aside, live), s"refresh recovery: could not restore $aside")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    spark.sql(sql).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (fs.exists(aside)) fs.delete(aside, true)
    require(fs.rename(live, aside),
      s"refresh swap: could not move $live aside; materialization left untouched")
    val movedIn =
      try fs.rename(tmp, live)
      catch { case e: java.io.IOException =>
        val restored = fs.rename(aside, live)
        throw new java.io.IOException(
          s"refresh swap: could not move $tmp into place; original " +
            (if (restored) "restored" else s"preserved at $aside"), e)
      }
    if (!movedIn) {
      val restored = fs.rename(aside, live)
      throw new java.io.IOException(
        s"refresh swap: could not move $tmp into place; original " +
          (if (restored) "restored" else s"preserved at $aside"))
    }
    fs.delete(aside, true)
  }

  /** Pin `topicRef`'s state as of `asOfEpochS` under the tag name
    * `ref`. The target must be a registered (non-temp) topic; tags of
    * tags or views are rejected — the pin must ground in stored
    * shards or its meaning would drift with the view.
    *
    * For upsert topics the pin also records the snapshot's max `_seq`
    * (one bucket-pruned agg scan at tag time), so a later backdated
    * write can never enter — or win inside — the tagged view. */
  def createTag(ref: String, topicRef: String, asOfEpochS: Long,
                tsCol: String = "time", keyCol: Option[String] = None): Unit = {
    val fqn = resolve(ref); val target = resolve(topicRef)
    if (!entries.contains(target)) reload()
    val path = entries.get(target) match {
      case Some(t: Topic) => t.path
      case Some(e) => throw new IllegalArgumentException(
        s"snapshot tags must target a stored topic; $target is a ${e.kind}")
      case None => throw new NoSuchElementException(s"topic not found: $target")
    }
    require(!entries.contains(fqn), s"tag already exists: $fqn")
    val (ts, nm) = storeAt(path)
    // an EMPTY as-of snapshot still needs a version pin, or the pin
    // would silently degrade and a later backdated write could enter:
    // fall back to the topic's overall max _seq at tag time, and to
    // Long.MinValue when the whole topic is empty — an empty snapshot
    // stays empty forever. Only topics with no _seq column (plain
    // append-only) carry no pin (the documented caveat).
    val seqCutoff =
      if (ts.exists(nm) && ts.read(nm).columns.contains("_seq")) {
        def maxSeq(df: DataFrame): Option[Long] =
          Option(df.agg(max(col("_seq"))).head.get(0)).map(_.asInstanceOf[Long])
        Some(maxSeq(ts.readAsOf(nm, asOfEpochS, tsCol))
          .orElse(maxSeq(ts.read(nm)))
          .getOrElse(Long.MinValue))
      } else None
    entries(fqn) = Tag(target, asOfEpochS, tsCol, keyCol, seqCutoff)
    commit("put", fqn, Some(entries(fqn)))
  }

  /** A [[TopicStore]] rooted at a registered topic path's parent, plus
    * the topic's directory name — how tag reads reach a topic whose
    * registered root differs from the session store's. The as-of read
    * only filters on epoch-second bucket values, so the throwaway
    * store's bucketMinutes never enters. */
  private[graft] def storeAt(path: String): (TopicStore, String) = {
    val slash = path.lastIndexOf('/')
    (new TopicStore(spark, path.substring(0, slash)), path.substring(slash + 1))
  }

  /** The registered storage path of a topic entry, if `ref` is one. */
  def registeredPath(ref: String): Option[String] = {
    if (!entries.contains(resolve(ref))) reload()
    entries.get(resolve(ref)).collect { case t: Topic => t.path }
  }

  /** Live snapshot tags pinning `topicRef`: (tag fqn, data-time
    * cutoff). What retention must not expire and restore must not
    * truncate past. Always reloads first — a tag created by ANOTHER
    * catalog instance over the same root must protect data here too
    * (this lookup has no "miss" to trigger the usual lazy reload,
    * and a stale empty answer deletes pinned buckets for good). */
  def tagsFor(topicRef: String): Seq[(String, Long)] = {
    reload()
    val target = resolve(topicRef)
    entries.toSeq.collect {
      case (n, Tag(t, asOf, _, _, _)) if t == target => (n, asOf)
    }
  }

  /** (target topic fqn, cutoff, tsCol, seqCutoff) of a tag, None if
    * not a tag. */
  def tagInfo(ref: String): Option[(String, Long, String, Option[Long])] = {
    if (!entries.contains(resolve(ref))) reload()
    entries.get(resolve(ref)).collect {
      case Tag(topic, asOf, tsCol, _, seqCutoff) => (topic, asOf, tsCol, seqCutoff)
    }
  }

  def dropTable(ref: String): Boolean = {
    val removed = entries.remove(resolve(ref))
    if (removed.exists(_.kind != "temp_topic")) commit("drop", resolve(ref), None)
    removed.isDefined
  }

  def list(): Seq[(String, String)] = entries.toSeq.map { case (n, e) => (n, e.kind) }

  /** Scan a table: topic => parquet read; temp topic => its plan;
    * view => run the SQL (or read the materialization). */
  def table(ref: String): DataFrame = {
    if (!entries.contains(resolve(ref))) reload()
    entries(resolve(ref)) match {
      case t: Topic =>
        (if (t.evolved) spark.read.option("mergeSchema", "true") else spark.read)
          .parquet(t.path)
      case TempTopic(df) => df
      case View(sql, None) => spark.sql(sql)
      case View(_, Some(path)) => spark.read.parquet(path)
      case Tag(topic, asOf, tsCol, keyCol, seqCutoff) =>
        // resolve through the target topic's REGISTERED path (the
        // session's store root differs from the catalog root)
        val path = entries.get(topic) match {
          case Some(t: Topic) => t.path
          case _ => throw new NoSuchElementException(
            s"snapshot tag $ref targets a missing topic: $topic")
        }
        val (ts, nm) = storeAt(path)
        val snap = ts.readAsOf(nm, asOf, tsCol)
        // the write-version half of the pin: versions stamped after
        // tag time are invisible even when backdated under the cutoff
        val pinned = seqCutoff match {
          case Some(sc) => snap.filter(col("_seq") <= sc)
          case None => snap
        }
        keyCol match {
          case Some(k) => ts.mergeLatest(pinned, k)
          case None    => pinned
        }
      case Namespace =>
        throw new IllegalArgumentException(s"$ref is a namespace, not a table")
    }
  }

  def contains(ref: String): Boolean =
    entries.contains(resolve(ref)) || { reload(); entries.contains(resolve(ref)) }

  /** Re-read durable state from disk, folding in mutations committed
    * by OTHER catalog instances over the same root (the V2 catalog
    * plugin serving remote Connect sessions writes through its own
    * instance — without a reload, a topic created remotely is
    * invisible to this session until restart). Session-only temp
    * topics survive the reload. Called automatically on lookup miss
    * and before every checkpoint. */
  def reload(): Unit = TopicCatalog.lockFor(root).synchronized {
    val temps = entries.toSeq.collect { case (n, t: TempTopic) => (n, t) }
    entries.clear()
    opsSinceSnapshot = 0
    load()
    temps.foreach { case (n, t) => if (!entries.contains(n)) entries(n) = t }
  }

  // -- persistence: jackson JSON, append-only op log + atomic snapshot --

  // lazy: load() runs from the constructor, before plain vals declared
  // below the `load()` call would be initialized
  private lazy val mapper = new ObjectMapper()

  private def entryFields(o: ObjectNode, e: Entry): Unit = e match {
    case Topic(p, pol, wcfg, ret, cols, evolved) =>
      o.put("kind", "topic"); o.put("path", p)
      if (cols.nonEmpty) { val ca = o.putArray("cols"); cols.foreach(ca.add) }
      if (evolved) o.put("evolved", true)
      pol.foreach { c =>
        val cn = o.putObject("compaction")
        cn.put("everyAppends", c.everyAppends)
        cn.put("maxFilesPerBucket", c.maxFilesPerBucket)
        if (c.minShardBytes > 0) cn.put("minShardBytes", c.minShardBytes)
        if (c.targetShardBytes > 0) cn.put("targetShardBytes", c.targetShardBytes)
        if (c.zorder) cn.put("zorder", true)
        val arr = cn.putArray("clusterBy")
        c.clusterBy.foreach(arr.add)
      }
      wcfg.foreach { w =>
        val wn = o.putObject("write")
        if (w.maxRowsPerFile > 0) wn.put("maxRowsPerFile", w.maxRowsPerFile)
        if (w.coalesce > 0) wn.put("coalesce", w.coalesce)
        if (w.triggerMs > 0) wn.put("triggerMs", w.triggerMs)
      }
      ret.foreach { r =>
        val rn = o.putObject("retention")
        rn.put("maxAgeMinutes", r.maxAgeMinutes)
        if (r.downsampleTo.nonEmpty) {
          rn.put("downsampleTo", r.downsampleTo)
          rn.put("everyMinutes", r.everyMinutes)
          rn.put("valueCol", r.valueCol)
          rn.put("tsCol", r.tsCol)
          val arr = rn.putArray("keyCols")
          r.keyCols.foreach(arr.add)
        }
      }
    case View(sql, mp) =>
      o.put("kind", "view"); o.put("sql", sql); mp.foreach(o.put("path", _))
    case Tag(topic, asOf, tsCol, keyCol, seqCutoff) =>
      o.put("kind", "tag"); o.put("topic", topic)
      o.put("asOfEpochS", asOf); o.put("tsCol", tsCol)
      keyCol.foreach(o.put("keyCol", _))
      seqCutoff.foreach(sc => { o.put("seqCutoff", sc); () })
    case Namespace => o.put("kind", "namespace"); ()
    case TempTopic(_) =>
      throw new IllegalStateException("temporary topics are never persisted")
  }

  private def applyNode(name: String, node: JsonNode): Unit =
    node.path("kind").asText() match {
      case "topic" =>
        val pol = Option(node.get("compaction")).map { c =>
          val cb = Option(c.get("clusterBy")).map { a =>
            (0 until a.size()).map(a.get(_).asText())
          }.getOrElse(Seq.empty)
          CompactionPolicy(c.path("everyAppends").asInt(),
            c.path("maxFilesPerBucket").asInt(4), cb,
            c.path("minShardBytes").asLong(0L),
            c.path("targetShardBytes").asLong(0L),
            c.path("zorder").asBoolean(false))
        }
        val wcfg = Option(node.get("write")).map { w =>
          WriteConfig(w.path("maxRowsPerFile").asLong(0L),
            w.path("coalesce").asInt(0),
            w.path("triggerMs").asLong(0L))
        }
        val ret = Option(node.get("retention")).map { r =>
          val kc = Option(r.get("keyCols")).map { a =>
            (0 until a.size()).map(a.get(_).asText())
          }.getOrElse(Seq.empty)
          RetentionPolicy(r.path("maxAgeMinutes").asLong(),
            r.path("downsampleTo").asText(""),
            r.path("everyMinutes").asInt(60),
            r.path("valueCol").asText(""), kc,
            r.path("tsCol").asText("time"))
        }
        val tcols = Option(node.get("cols")).map { a =>
          (0 until a.size()).map(a.get(_).asText())
        }.getOrElse(Seq.empty)
        entries(name) = Topic(node.path("path").asText(), pol, wcfg, ret,
          tcols, node.path("evolved").asBoolean(false))
      case "view" =>
        val mp = Option(node.get("path")).map(_.asText())
        entries(name) = View(node.path("sql").asText(), mp)
      case "tag" =>
        entries(name) = Tag(node.path("topic").asText(),
          node.path("asOfEpochS").asLong(),
          node.path("tsCol").asText("time"),
          Option(node.get("keyCol")).map(_.asText()),
          Option(node.get("seqCutoff")).map(_.asLong()))
      case "namespace" => entries(name) = Namespace
      case _ => ()
    }

  /** Commit one mutation: O(1) append to the transaction log, with a
    * snapshot compaction every `snapshotEvery` ops. */
  private def commit(op: String, name: String, entry: Option[Entry]): Unit =
    TopicCatalog.lockFor(root).synchronized {
      val o = mapper.createObjectNode()
      o.put("op", op); o.put("name", name)
      entry.foreach(e => entryFields(o.putObject("entry"), e))
      Files.createDirectories(logPath.getParent)
      Files.writeString(logPath, mapper.writeValueAsString(o) + "\n",
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      opsSinceSnapshot += 1
      if (opsSinceSnapshot >= snapshotEvery) checkpoint()
    }

  /** Write the full-state snapshot (temp file + atomic rename) and
    * truncate the log — the reference registry's snapshot compaction.
    * Replays the on-disk state first (under the per-root JVM lock, so
    * no same-driver writer can slip an op between replay and the log
    * truncation): without the replay, a snapshot taken by a stale
    * instance would ERASE topics other instances committed — e.g. a
    * remote CREATE TABLE through the V2 plugin followed by this
    * session's shutdown(). */
  def checkpoint(): Unit = TopicCatalog.lockFor(root).synchronized {
    reload()
    val doc = mapper.createObjectNode()
    entries.foreach {
      case (_, TempTopic(_)) => () // session-only, never durable
      case (n, e) => entryFields(doc.putObject(n), e)
    }
    Files.createDirectories(manifestPath.getParent)
    val tmp = manifestPath.resolveSibling(manifestPath.getFileName.toString + ".tmp")
    Files.writeString(tmp, mapper.writerWithDefaultPrettyPrinter().writeValueAsString(doc),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, manifestPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    Files.deleteIfExists(logPath)
    opsSinceSnapshot = 0
  }

  /** Snapshot first, then replay the log tail (ops committed after the
    * last checkpoint; survives a crash between append and snapshot). */
  private def load(): Unit = {
    if (Files.exists(manifestPath)) {
      val doc = mapper.readTree(Files.readString(manifestPath))
      doc.properties().forEach(e => applyNode(e.getKey, e.getValue))
    }
    if (Files.exists(logPath)) {
      Files.readAllLines(logPath).forEach { line =>
        if (line.nonEmpty) {
          val o = mapper.readTree(line)
          o.path("op").asText() match {
            case "put" => applyNode(o.path("name").asText(), o.path("entry"))
            case "drop" => entries.remove(o.path("name").asText())
            case _ => ()
          }
          opsSinceSnapshot += 1
        }
      }
    }
  }
}

object TopicCatalog {
  /** Per-root manifest write coordination (JVM-wide): every catalog
    * instance over the same root — interactive sessions, the V2
    * catalog plugin's per-Connect-session instances — serializes its
    * log appends, snapshots, and replays on one monitor, so a
    * checkpoint can never truncate a log line another same-driver
    * writer just committed. Writers in separate driver processes
    * coordinate externally, same boundary as TopicStore. */
  private val catalogLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[sources] def lockFor(root: String): Object =
    catalogLocks.computeIfAbsent(root, _ => new Object())

  /** One refresher per materialized-view fqn per JVM (see
    * [[TopicCatalog.refreshMaterializedView]]). */
  private[sources] val refreshLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
}
