package graft

import graft.sources.{TopicCatalog, TopicStore}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session facade mirroring ella's top-level API
  * (ella/src/ella.rs:89-162: `query`, `execute`, `table`, default
  * catalog/schema) on a SparkSession + [[TopicCatalog]].
  *
  * Spark DataFrames ARE the reference's `Lazy` plans
  * (ella-engine/src/lazy.rs): nothing executes until an action, and
  * `limit`/`skip`/`col` map to the DataFrame combinators directly.
  */
class GraftSession(val spark: SparkSession, root: String) {
  val store = new TopicStore(spark, s"$root/topics")
  val catalog = new TopicCatalog(spark, root)

  // Session-scoped streaming load monitor — the reference engine
  // starts its metrics server with the session
  // (ella-engine/src/metrics/server.rs:16) and watches channel load
  // (metrics/load_monitor.rs:70-120); here every streaming query on
  // this session reports per-batch load into the same accumulator.
  private val streamMonitor = Metrics.monitorStreams(spark)

  /** Per-batch load of every streaming query on this session:
    * rows in, arrival vs drain rate, trigger wall time, watermark
    * lag. Progress events ride the async listener bus, so drain it
    * first — a caller reading load right after processAllAvailable
    * must see that batch. */
  def streamingLoad: Seq[Metrics.BatchProgress] = {
    org.apache.spark.sql.graft.bridge.drainListenerBus(spark, 30000L)
    streamMonitor.progress
  }

  /** Batches whose arrival rate exceeded their drain rate — the
    * falling-behind signal the reference's load monitor alarms on. */
  def streamingOverloaded: Seq[Metrics.BatchProgress] = streamMonitor.overloaded

  /** Lazy SQL query (ella.rs:89). Registered catalog tables are exposed
    * as temp views on demand; a query mentioning `information_schema_`
    * also gets the metadata relations (see [[informationSchema]]). */
  def query(sql: String): DataFrame = {
    registerTempViews()
    if (sql.toLowerCase.contains("information_schema_")) registerInformationSchema()
    spark.sql(sql)
  }

  /** DataFusion-style information schema — the reference enables it on
    * its session context (ella-engine/src/engine/state.rs:121), so an
    * ella user introspects the datastore with plain SQL. Spark temp
    * views cannot carry a namespace dot, so the relations are flat
    * (`information_schema_tables` etc.), registered automatically for
    * any [[query]] whose text mentions them. Relations: `catalogs`
    * (catalog_name), `schemata` (catalog_name, schema_name), `tables`
    * (table_catalog, table_schema, table_name, table_type with
    * BASE TABLE / TEMPORARY / VIEW / MATERIALIZED VIEW), `columns`
    * (…, column_name, ordinal_position, data_type, is_nullable).
    * Metadata rows are catalog-sized (driver-built), never data-sized. */
  def informationSchema(rel: String): DataFrame = {
    import spark.implicits._
    def split3(fqn: String): (String, String, String) = fqn.split('.') match {
      case Array(c, s, t) => (c, s, t)
      case Array(s, t)    => (catalog.currentCatalog, s, t)
      case Array(t)       => (catalog.currentCatalog, catalog.currentSchema, t)
    }
    def tableRows = catalog.list().filter(_._2 != "namespace").map { case (fqn, kind) =>
      val (c, s, t) = split3(fqn)
      val typ = kind match {
        case "topic"             => "BASE TABLE"
        case "temp_topic"        => "TEMPORARY"
        case "materialized_view" => "MATERIALIZED VIEW"
        case "tag"               => "SNAPSHOT TAG"
        case _                   => "VIEW"
      }
      (c, s, t, typ)
    }
    // Implicit namespaces count too: the default ella.public (and any
    // namespace a table lives in) must list even though only explicit
    // createCatalog/createSchema calls register Namespace entries —
    // DataFusion's information_schema shows defaults the same way.
    def implicitNs = catalog.list().filter(_._2 != "namespace")
      .map { case (fqn, _) => val (c, s, _) = split3(fqn); (c, s) } :+
      (catalog.currentCatalog, catalog.currentSchema)
    def allCatalogs = (catalog.catalogs() ++ implicitNs.map(_._1)).distinct.sorted
    rel.toLowerCase match {
      case "catalogs" => allCatalogs.toDF("catalog_name")
      case "schemata" =>
        (catalog.catalogs().flatMap(c => catalog.schemas(c).map(s => (c, s))) ++
          implicitNs.map { case (c, s) => (c, s"$c.$s") })
          .distinct.sorted.toDF("catalog_name", "schema_name")
      case "tables" =>
        tableRows.toDF("table_catalog", "table_schema", "table_name", "table_type")
      case "columns" =>
        catalog.list().filter(_._2 != "namespace").flatMap { case (fqn, _) =>
          val (c, s, t) = split3(fqn)
          val fields = try catalog.table(fqn).schema.fields
                       catch { case _: Throwable => Array.empty[org.apache.spark.sql.types.StructField] }
          fields.zipWithIndex.map { case (f, i) =>
            (c, s, t, f.name, i + 1, f.dataType.sql, if (f.nullable) "YES" else "NO")
          }
        }.toDF("table_catalog", "table_schema", "table_name", "column_name",
          "ordinal_position", "data_type", "is_nullable")
      // Per-topic lifecycle config as SQL metadata — the reference's
      // TableConfig made queryable (config.rs:3-25): one row per
      // REGISTERED topic, null-padded where a policy half is unset.
      // Operators audit "which topics z-order / retain / batch" with
      // a WHERE clause instead of an API crawl.
      case "topic_policies" =>
        catalog.list().filter(_._2 == "topic").map { case (fqn, _) =>
          val (c, s, t) = split3(fqn)
          val cp = catalog.compaction(fqn)
          val wc = catalog.writeConfig(fqn)
          val rp = catalog.retention(fqn)
          (c, s, t,
            cp.map(_.everyAppends), cp.map(_.maxFilesPerBucket),
            cp.map(_.clusterBy.mkString(",")), cp.map(_.zorder),
            cp.map(_.minShardBytes), cp.map(_.targetShardBytes),
            wc.map(_.maxRowsPerFile), wc.map(_.coalesce), wc.map(_.triggerMs),
            rp.map(_.maxAgeMinutes), rp.map(_.downsampleTo).filter(_.nonEmpty),
            catalog.evolved(fqn))
        }.toDF("table_catalog", "table_schema", "table_name",
          "compaction_every_appends", "max_files_per_bucket", "cluster_by",
          "zorder", "min_shard_bytes", "target_shard_bytes",
          "write_max_rows_per_file", "write_coalesce", "write_trigger_ms",
          "retention_max_age_minutes", "retention_downsample_to",
          "schema_evolved")
      case other => throw new IllegalArgumentException(
        s"unknown information_schema relation '$other' " +
          "(expected catalogs, schemata, tables, columns, or topic_policies)")
    }
  }

  private def registerInformationSchema(): Unit =
    Seq("catalogs", "schemata", "tables", "columns", "topic_policies").foreach { r =>
      informationSchema(r).createOrReplaceTempView(s"information_schema_$r")
    }

  /** Execute a statement for effect (ella.rs:100). Catalog DDL —
    * ella's `CREATE VIEW ... AS`, `CREATE MATERIALIZED VIEW ... AS`,
    * `DROP TABLE/VIEW`, `USE CATALOG` / `USE SCHEMA`
    * (lazy/view.rs, table/view.rs, ella.rs:118-137) — routes to the
    * durable TopicCatalog; anything else runs distributed for effect
    * via the `noop` sink — result rows are NEVER collected to the
    * driver (a full-table `collect()` on a 100 TB table is a driver
    * OOM, not an execution strategy). */
  def execute(sql: String): Unit = {
    val InsertRe = """(?is)\s*INSERT\s+INTO\s+([\w.]+)\s*(?:\(([^)]*)\))?\s+((?:SELECT|VALUES|WITH|TABLE).+)""".r
    val ViewRe = """(?is)\s*CREATE\s+(MATERIALIZED\s+)?VIEW\s+([\w.]+)\s+AS\s+(.+)""".r
    val RefreshRe = """(?is)\s*REFRESH\s+MATERIALIZED\s+VIEW\s+([\w.]+)\s*""".r
    val DropRe = """(?is)\s*DROP\s+(?:TABLE|VIEW)\s+([\w.]+)\s*""".r
    val CreateCatRe = """(?is)\s*CREATE\s+CATALOG\s+(IF\s+NOT\s+EXISTS\s+)?([\w]+)\s*""".r
    val CreateSchemaRe = """(?is)\s*CREATE\s+SCHEMA\s+(IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*""".r
    val DropCatRe = """(?is)\s*DROP\s+CATALOG\s+(IF\s+EXISTS\s+)?([\w]+)\s*(CASCADE)?\s*""".r
    val DropSchemaRe = """(?is)\s*DROP\s+SCHEMA\s+(IF\s+EXISTS\s+)?([\w.]+)\s*(CASCADE)?\s*""".r
    val UseCatRe = """(?is)\s*USE\s+CATALOG\s+([\w]+)\s*""".r
    val UseSchemaRe = """(?is)\s*USE\s+(?:SCHEMA\s+)?([\w]+)\s*""".r
    sql match {
      // the reference's remote write path: `INSERT INTO topic …` is a
      // first-class statement that lands in the topic's shard layout
      // (topic.rs:86 publish(), flight.rs:492 do_put_statement_update).
      // Routed through publish() so the bucket is derived from the
      // time column and the topic's compaction schedule fires — a raw
      // spark.sql INSERT could not hit either.
      case InsertRe(name, colList, body) if catalog.contains(name) =>
        registerTempViews()
        val src = spark.sql(body.trim)
        insertInto(name, src, Option(colList)
          .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq))
      case ViewRe(mat, name, body) =>
        registerTempViews()
        if (mat != null) catalog.materializeView(name, body.trim)
        else catalog.createView(name, body.trim)
      case RefreshRe(name) =>
        registerTempViews()
        catalog.refreshMaterializedView(name)
      case CreateCatRe(ine, name) => catalog.createCatalog(name, ifNotExists = ine != null)
      case CreateSchemaRe(ine, name) => catalog.createSchema(name, ifNotExists = ine != null)
      case DropCatRe(ie, name, casc) =>
        catalog.dropCatalog(name, ifExists = ie != null, cascade = casc != null)
      case DropSchemaRe(ie, name, casc) =>
        catalog.dropSchema(name, ifExists = ie != null, cascade = casc != null)
      case DropRe(name) => catalog.dropTable(name)
      case UseCatRe(c) => catalog.useCatalog(c)
      case UseSchemaRe(s) => catalog.useSchema(s)
      case _ => query(sql).write.format("noop").mode("overwrite").save()
    }
  }

  /** Catalog lifecycle (ella-engine/src/cluster.rs:42-90). */
  def createCatalog(name: String, ifNotExists: Boolean = false): Unit =
    catalog.createCatalog(name, ifNotExists)
  def dropCatalog(name: String, ifExists: Boolean = false, cascade: Boolean = false): Boolean =
    catalog.dropCatalog(name, ifExists, cascade)

  /** Schema lifecycle (ella-engine/src/catalog.rs:48-113). */
  def createSchema(name: String, ifNotExists: Boolean = false): Unit =
    catalog.createSchema(name, ifNotExists)
  def dropSchema(name: String, ifExists: Boolean = false, cascade: Boolean = false): Boolean =
    catalog.dropSchema(name, ifExists, cascade)

  /** Switch default catalog/schema context (ella.rs:118-137). */
  def useCatalog(c: String): Unit = catalog.useCatalog(c)
  def useSchema(s: String): Unit = catalog.useSchema(s)

  /** Re-materialize a stale MATERIALIZED VIEW in place — re-plans its
    * registered SQL over the topics' current state and swaps the
    * parquet materialization atomically (crash-safe two-rename; see
    * [[graft.sources.TopicCatalog.refreshMaterializedView]]). Also
    * reachable as `REFRESH MATERIALIZED VIEW name` through
    * [[execute]]. */
  def refreshMaterializedView(name: String): Unit = {
    registerTempViews()
    catalog.refreshMaterializedView(name)
  }

  /** Datastore maintenance pass — the counterpart of the reference's
    * background shard maintenance (ella-engine/src/table/topic/shard/
    * compact.rs runs per shard as topics seal): small-file compaction
    * over every registered topic (buckets holding more than
    * `maxFilesPerBucket` parquet files are rewritten, optionally
    * clustered on `clusterBy` for row-group skipping), then a catalog
    * checkpoint. Returns (topic, compacted buckets) for the topics
    * that changed. Sealed compact buckets are never touched, so
    * repeated maintenance is cheap and idempotent. */
  def maintain(maxFilesPerBucket: Int = 4,
               clusterBy: Seq[String] = Seq.empty): Seq[(String, Seq[Long])] = {
    val done = catalog.list().collect {
      case (name, "topic") =>
        // crash recovery first: a maintenance pass that died mid-swap
        // left an aside/temp dir — restore or clear it before any new
        // rewrite of the same topic runs
        store.recover(name)
        // data lifecycle next: expired buckets downsample+drop before
        // the compactor would waste a rewrite on them
        catalog.retention(name).foreach(sweepWith(name, _))
        // a topic's own registered schedule overrides the session-wide
        // defaults — maintain() is the manual sweep of the same policy
        // the publish-path scheduler enforces automatically
        val (mf, cb, mb, tb, zo) = catalog.compaction(name)
          .map(p => (p.maxFilesPerBucket, p.clusterBy, p.minShardBytes,
            p.targetShardBytes, p.zorder))
          .getOrElse((maxFilesPerBucket, clusterBy, 0L, 0L, false))
        name -> store.compact(name, mf, cb, mb, tb, zo)
    }.filter(_._2.nonEmpty)
    catalog.checkpoint()
    done
  }

  // -- per-topic compaction scheduling (reference: per-table
  //    TableConfig, ella-engine/src/table/config.rs:1-25, drives the
  //    background compaction in table/topic/shard/compact.rs as
  //    shards seal — compaction is a property OF the table, not a
  //    global cron) --

  /** Register a durable compaction schedule for a topic: after every
    * `everyAppends` publishes the topic's over-fragmented buckets
    * (more than `maxFilesPerBucket` files) are rewritten, clustered on
    * `clusterBy` when given. The policy lives in the catalog manifest,
    * so it survives restarts and is honored by BOTH the publish path
    * and [[maintain]]. */
  def setCompaction(name: String, everyAppends: Int,
                    maxFilesPerBucket: Int = 4,
                    clusterBy: Seq[String] = Seq.empty,
                    minShardBytes: Long = 0L,
                    targetShardBytes: Long = 0L,
                    zorder: Boolean = false): Unit =
    catalog.setCompaction(name,
      graft.sources.CompactionPolicy(everyAppends, maxFilesPerBucket, clusterBy,
        minShardBytes, targetShardBytes, zorder))

  /** Durable write-path batching for a topic (the reference
    * TableConfig's write_batch_size / rw_buffer_capacity half,
    * config.rs:3-11) — shapes every publish and paces streaming
    * sinks; see [[graft.sources.WriteConfig]]. */
  def setWriteConfig(name: String, maxRowsPerFile: Long = 0L,
                     coalesce: Int = 0, triggerMs: Long = 0L): Unit =
    catalog.setWriteConfig(name,
      graft.sources.WriteConfig(maxRowsPerFile, coalesce, triggerMs))

  /** Register a durable retention rule for a topic: raw shards older
    * than `maxAgeMinutes` (data-relative horizon) are swept by
    * [[maintain]] — dropped outright, or first downsampled into a
    * coarse rollup tier when `downsampleTo` is set (the TSDB
    * tiered-lifecycle rule: raw recent, aggregated old). */
  def setRetention(name: String, maxAgeMinutes: Long,
                   downsampleTo: String = "", everyMinutes: Int = 60,
                   valueCol: String = "", keyCols: Seq[String] = Seq.empty,
                   tsCol: String = "time"): Unit =
    catalog.setRetention(name, graft.sources.RetentionPolicy(
      maxAgeMinutes, downsampleTo, everyMinutes, valueCol, keyCols, tsCol))

  /** Apply a topic's registered retention rule now. Returns dropped
    * bucket ids (empty = nothing expired / no rule). */
  def retentionSweep(name: String): Seq[Long] =
    catalog.retention(name)
      .map(sweepWith(catalog.resolve(name), _))
      .getOrElse(Seq.empty)

  /** Resolve the tier topic ref and register it (first sweep of a
    * fresh tier creates it), then run the store-level sweep. */
  private def sweepWith(fqn: String,
                        pol: graft.sources.RetentionPolicy): Seq[Long] = {
    val resolved =
      if (pol.downsampleTo.isEmpty) pol
      else {
        catalog.createTopic(pol.downsampleTo, store, ifNotExists = true)
        pol.copy(downsampleTo = catalog.resolve(pol.downsampleTo))
      }
    // tag guard: no bucket a live snapshot tag pins may expire
    val protect = catalog.tagsFor(fqn).map(_._2).maxOption
    store.retentionSweep(fqn, resolved, protect)
  }

  /** Run a topic's scheduled compaction if its cadence says it is due.
    * Returns the compacted buckets (empty when not due or nothing to
    * do). Called from [[publish]]; exposed for sinks that append via
    * the store directly (e.g. a foreachBatch writer). Cadence
    * counters live JVM-wide in [[graft.sources.CompactionScheduler]]
    * (keyed by topic PATH), so the V2 `INSERT INTO` surface used by
    * remote Connect sessions shares the same schedule. */
  def compactIfDue(name: String): Seq[Long] =
    graft.sources.CompactionScheduler.afterAppend(store, catalog, catalog.resolve(name))

  /** Graceful shutdown (ella.rs:71 `shutdown`): compact the catalog's
    * transaction log into a snapshot so the next open replays nothing,
    * and detach the session's streaming monitor. The SparkSession
    * itself is caller-owned and left running. */
  def shutdown(): Unit = {
    catalog.checkpoint()
    Metrics.stopMonitoring(spark, streamMonitor)
  }

  /** Effective datastore configuration (pyella `Ella.config()` /
    * ella-engine config.rs): the root, active namespace, and the
    * engine knobs a client would introspect. */
  def config: Map[String, String] = Map(
    "root" -> root,
    "catalog" -> catalog.currentCatalog,
    "schema" -> catalog.currentSchema,
    "bucketMinutes" -> store.bucketMinutes.toString,
    "shufflePartitions" -> spark.conf.get("spark.sql.shuffle.partitions"),
    "timeZone" -> spark.conf.get("spark.sql.session.timeZone", "UTC"))

  /** Scan a table by (possibly qualified) name (ella.rs:105). */
  def table(ref: String): DataFrame = catalog.table(ref)

  /** Pin `topic`'s state as of an instant under a named SNAPSHOT TAG
    * (Iceberg-ref style): `table(tag)` then resolves to the
    * bucket-pruned as-of scan forever — a training run that records
    * its tag has a reproducible input. The pin is two-axis (data-time
    * cutoff + the topic's write-version at tag time), so later
    * upserts can't enter the tag even backdated; see
    * [[graft.sources.TopicCatalog.Tag]] for the append-only caveat.
    * `keyCol` set pins the MERGED view of an upsert topic (latest
    * version per key at the cutoff, tombstones dropped). Metadata
    * only — no data copies; drop with `execute("DROP TABLE tag")`.
    * [[maintain]]'s retention sweep never expires tagged buckets. */
  def tagSnapshot(topic: String, tag: String, asOfEpochS: Long,
                  tsCol: String = "time", keyCol: Option[String] = None): Unit =
    catalog.createTag(tag, topic, asOfEpochS, tsCol, keyCol)

  /** RESTORE a topic to a previously pinned snapshot tag (Delta
    * RESTORE over [[tagSnapshot]]): buckets past the tag's cutoff
    * drop and the boundary bucket rewrites filtered — O(after-cutoff
    * data); when the tag carries a write-version pin, kept buckets
    * are also probed for backdated over-version rows (one pruned
    * scan) and rewritten only if any exist, so the restored topic
    * equals the tag's pinned VIEW. The tag itself survives (it still
    * describes the state the topic now has). Returns the touched
    * bucket ids. */
  def restoreToTag(tag: String): Seq[Long] = {
    val fqn = catalog.resolve(tag)
    catalog.tagInfo(fqn) match {
      case Some((topic, asOf, tsCol, seqCutoff)) =>
        // resolve through the topic's REGISTERED path (a topic rooted
        // outside the session store would otherwise silently restore
        // nothing), and refuse to truncate history a LATER live tag
        // still pins — disaster recovery must not break another pin
        val path = catalog.registeredPath(topic).getOrElse(
          throw new NoSuchElementException(
            s"snapshot tag $fqn targets a missing topic: $topic"))
        val later = catalog.tagsFor(topic).filter(_._2 > asOf)
        if (later.nonEmpty) throw new IllegalStateException(
          s"restoreToTag($fqn): later live tags pin history past the cutoff: " +
            later.map(_._1).mkString(", ") + " — drop them first")
        val (st, nm) = catalog.storeAt(path)
        if (!st.exists(nm)) throw new NoSuchElementException(
          s"restoreToTag($fqn): topic directory missing for $topic at $path")
        // the seq pin rides into the restore: backdated over-version
        // rows are dropped too, so the restored topic equals the
        // tag's pinned view, not just its time slice
        st.restoreAsOf(nm, asOf, tsCol, seqCutoff)
      case None => throw new NoSuchElementException(s"snapshot tag not found: $fqn")
    }
  }

  /** CDC-tail an EXISTING topic: arriving rows classify as insert /
    * update / delete against the topic's own observed history and
    * land in `changeTopic`
    * ([[graft.streaming.TopicStream.changesStream]] wired to
    * [[subscribe]]). The first micro-batch replays the topic's
    * current content as the INITIAL SNAPSHOT — every live key emits
    * one `insert` (the Delta change-feed convention for a feed
    * started mid-life) and simultaneously builds the classification
    * state, so every later revision correctly reads as an update /
    * delete. `stateTopic`/`changeTopic` are store-level pipeline
    * topics (the lineDedupBatch convention). Start the returned
    * writer with a checkpointLocation. Within a batch the newest `ts`
    * per key wins, so this suits topics where (key, ts) orders
    * versions (publish/append streams); for upsert-delta topics whose
    * versions can tie on ts, diff with [[changes]] instead. */
  def subscribeChanges(name: String, keyCol: String,
                       stateTopic: String, changeTopic: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val arrivals = subscribe(name).drop("bucket", "_seq")
      .withColumnRenamed("time", "ts")
    graft.streaming.TopicStream.changesStream(
      arrivals, store, keyCol, stateTopic, changeTopic)
  }

  /** Row-level change feed of an upsert topic between two inclusive
    * epoch-second instants ([[graft.sources.TopicStore.readChanges]]):
    * insert/update/delete per key, delta-proportional cost. Refs
    * resolve like [[table]]. */
  def changes(name: String, keyCol: String, fromEpochS: Long, toEpochS: Long,
              tsCol: String = "time"): DataFrame =
    store.readChanges(catalog.resolve(name), keyCol, fromEpochS, toEpochS, tsCol)

  def createTopic(name: String): Unit = catalog.createTopic(name, store)

  /** Explicit creation with declared schema and conflict policy
    * (ella.rs:176-199 `create_table(schema, if_not_exists, or_replace)`). */
  def createTopic(name: String, schema: org.apache.spark.sql.types.StructType,
                  ifNotExists: Boolean = false, orReplace: Boolean = false): Unit =
    catalog.createTopic(name, store, Some(schema), ifNotExists, orReplace)

  /** Session-scoped topic: queryable like any table, never persisted
    * (README "Concepts": temporary topics are not stored). */
  def createTempTopic(name: String, df: DataFrame): Unit =
    catalog.createTempTopic(name, df)

  /** Batch-ingest CSV/JSON (or any Spark source format) into a topic —
    * the reference accepts arbitrary Arrow record batches on publish
    * (ella/src/ella.rs `publish`, ella-engine row sinks); here any
    * `spark.read` format lands in the same bucketed parquet layout,
    * so downstream queries/pruning/compaction are format-agnostic.
    * The read itself is distributed (one task per input split) — the
    * driver never touches row data. `tsCol` is cast to timestamp when
    * the source format (e.g. CSV without inferSchema) read it as
    * string/long. */
  def ingest(name: String, path: String, format: String = "csv",
             options: Map[String, String] = Map("header" -> "true", "inferSchema" -> "true"),
             schema: Option[org.apache.spark.sql.types.StructType] = None,
             tsCol: String = "time"): Unit = {
    val reader = spark.read.format(format).options(options)
    val raw = schema.map(reader.schema).getOrElse(reader).load(path)
    require(raw.columns.contains(tsCol), s"ingest needs a '$tsCol' column; found ${raw.columns.mkString(", ")}")
    val df =
      if (raw.schema(tsCol).dataType == org.apache.spark.sql.types.TimestampType) raw
      else raw.withColumn(tsCol, org.apache.spark.sql.functions.col(tsCol).cast("timestamp"))
    publish(name, df, tsCol)
  }

  /** SQL-style insert: align `src` to the topic's schema (positional
    * like `INSERT INTO t SELECT …`, or through an explicit column
    * list with NULL fill) and publish. A topic that has never been
    * written takes the incoming schema as-is — first write defines
    * the topic, same as [[publish]] on a fresh name. */
  private def insertInto(name: String, src: DataFrame,
                         colList: Option[Seq[String]]): Unit = {
    import org.apache.spark.sql.functions.{col, lit}
    val tgt = scala.util.Try(table(name).schema.fields.filterNot(_.name == "bucket").toSeq)
      .getOrElse(Seq.empty)
    if (tgt.isEmpty) { publish(name, src); return }
    val aligned = colList match {
      case Some(cols) =>
        require(src.columns.length == cols.length,
          s"INSERT INTO $name(${cols.mkString(", ")}): ${src.columns.length} values for ${cols.length} columns")
        require(cols.contains("time"),
          s"INSERT INTO $name: the column list must include 'time' (topics are time-bucketed)")
        val named = src.toDF(cols: _*)
        named.select(tgt.map(f =>
          (if (cols.contains(f.name)) col(f.name) else lit(null))
            .cast(f.dataType).as(f.name)): _*)
      case None =>
        require(src.columns.length == tgt.length,
          s"INSERT INTO $name: ${src.columns.length} values for ${tgt.length} columns (${tgt.map(_.name).mkString(", ")})")
        src.toDF(tgt.map(_.name): _*)
          .select(tgt.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
    }
    publish(name, aligned)
  }

  /** Expose this datastore's topics as a Spark catalog plugin
    * (`<catalogName>.<topic>` in ANY session over this SparkContext,
    * isolated Connect sessions included) — the registration half of
    * the remote publish path; see [[graft.sources.TopicSparkCatalog]].
    * Listed in the session conf AND the context conf: the former so
    * THIS session resolves the catalog immediately, the latter so
    * future isolated sessions inherit it at creation. */
  def registerSparkCatalog(catalogName: String = "graft"): Unit = {
    val cls = classOf[graft.sources.TopicSparkCatalog].getName
    spark.conf.set(s"spark.sql.catalog.$catalogName", cls)
    spark.conf.set(s"spark.sql.catalog.$catalogName.root", root)
    // the LIVE context conf (getConf returns a defensive copy):
    // isolated sessions merge SQL entries from here at creation
    val scConf = org.apache.spark.SparkEnv.get.conf
    scConf.set(s"spark.sql.catalog.$catalogName", cls)
    scConf.set(s"spark.sql.catalog.$catalogName.root", root)
  }

  def publish(name: String, df: DataFrame, tsCol: String = "time"): Unit = {
    if (!catalog.contains(name)) createTopic(name)
    // the topic's registered write batching (WriteConfig) shapes every
    // publish — same durable-per-topic-config path as compaction
    store.append(catalog.resolve(name), df, tsCol, catalog.writeConfig(name))
    // schema-evolution tracking: the incoming frame's column set is
    // recorded in the manifest (pure name math, no store IO); once a
    // publish differs, table() reads the topic with the union schema
    catalog.recordSchema(name, df.columns.toSeq)
    compactIfDue(name)
  }

  /** Streaming tail of a topic — ella's `time > now()` query mode
    * (README.md:100-105): the SAME topic path batch queries scan,
    * opened as a Structured Streaming source. New files published
    * after the stream starts flow to subscribers; combined with
    * [[table]] this is the reference's unified batch/stream API.
    */
  def subscribe(name: String): DataFrame = {
    val path = store.topicPath(catalog.resolve(name))
    spark.readStream
      .schema(spark.read.parquet(path).schema)
      .parquet(path)
  }

  private def registerTempViews(): Unit =
    catalog.list().foreach { case (fqn, _) =>
      val short = fqn.split('.').last
      try catalog.table(fqn).createOrReplaceTempView(short)
      catch { case _: Throwable => () }
    }
}
