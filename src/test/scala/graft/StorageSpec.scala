package graft

import java.nio.file.Files
import graft.sources.{TopicCatalog, TopicStore}
import org.apache.spark.sql.functions._

/** TopicStore (time-bucketed shards + compaction) and TopicCatalog
  * (catalog/schema/table + views) behavior. */
class StorageSpec extends SparkSpec {
  private def tmp(): String = Files.createTempDirectory("graft_store").toString

  private def sampleEvents(n: Int, startS: Long = 1700000000L) = {
    import spark.implicits._
    (0 until n).map(i =>
      (i.toLong, new java.sql.Timestamp((startS + i * 600) * 1000L), s"k${i % 3}", i * 1.5))
      .toDF("id", "time", "key", "value")
  }

  test("topic schema evolution: added columns survive reads, merges, and compaction") {
    import spark.implicits._
    val t0 = 1700000000L
    def ts(i: Int) = new java.sql.Timestamp((t0 + i) * 1000L)
    val store = new TopicStore(spark, tmp(), bucketMinutes = 60)

    // v1 publisher: (id, time, v); v2 publisher adds `w` mid-life
    store.append("evo", Seq((1L, ts(1), "a"), (2L, ts(2), "b")).toDF("id", "time", "v"))
    store.append("evo", Seq((3L, ts(3), "c", 30L)).toDF("id", "time", "v", "w"))
    // union-schema read: old rows surface null for the new column
    val r = store.read("evo", mergeSchema = true).orderBy("id")
      .select("id", "v", "w").collect()
    assert(r.map(x => (x.getLong(0), x.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    assert(r(0).isNullAt(2) && r(1).isNullAt(2) && r(2).getLong(2) == 30L)

    // COMPACTION of the mixed-schema bucket must rewrite with the
    // UNION schema — without mergeSchema on the rewrite read, the
    // sampled footer decides and `w` can silently vanish from the
    // compacted shard (permanent loss from a maintenance pass)
    store.compact("evo", maxFilesPerBucket = 1)
    val rc = store.read("evo").orderBy("id")   // plain read: one shard now
    assert(rc.columns.contains("w"), "compaction dropped an evolved column")
    val rcr = rc.select("id", "v", "w").collect()
    assert(rcr(0).isNullAt(2) && rcr(2).getLong(2) == 30L,
      "compacted rows must keep evolved values and nulls")

    // upsert topics evolve the same way: merge resolves over the
    // union schema, and mergeCompact's winners keep the new column
    store.upsert("evo_up", Seq((1L, ts(1), "k1", "x")).toDF("id", "time", "key", "v"), seq = Some(1L))
    store.upsert("evo_up", Seq((2L, ts(2), "k1", "y", 7L), (3L, ts(3), "k2", "z", 9L))
      .toDF("id", "time", "key", "v", "w"), seq = Some(2L))
    val m = store.readMerged("evo_up", "key", mergeSchema = true)
      .orderBy("key").select("key", "v", "w").collect()
    assert(m.map(x => (x.getString(0), x.getString(1))).toSeq ==
      Seq(("k1", "y"), ("k2", "z")), "latest version must win across schemas")
    assert(m(0).getLong(2) == 7L && m(1).getLong(2) == 9L)
    store.mergeCompact("evo_up", "key")
    val mc = store.readMerged("evo_up", "key").orderBy("key")
    assert(mc.columns.contains("w"), "mergeCompact dropped an evolved column")
    assert(mc.select("w").as[Long].collect().toSeq == Seq(7L, 9L))
  }

  test("z-order compaction gives the second clustered column measurable pruning") {
    // Lexicographic clusterBy(x, y) sorts shards on x; every shard
    // then spans y's FULL range, so a probe on y alone can prune
    // nothing. Z-order interleaves both columns' bits, so each
    // shard's footer [min,max] box is tight in y too. This test
    // MEASURES that: same data, same shard count, count the output
    // files whose parquet footer y-range intersects a narrow y probe.
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val t0 = 1700000000L
    def data = (0 until 4096).map { i =>
      (i.toLong, new java.sql.Timestamp(t0 * 1000L),
        ((i * 2654435761L) % 10000L) / 10000.0,  // x: pseudo-uniform
        ((i * 40503L + 7) % 10000L) / 10000.0)   // y: independent pseudo-uniform
    }.toDF("id", "time", "x", "y")
    def yRanges(root: String, topic: String): Seq[(Double, Double)] = {
      val dir = new java.io.File(s"$root/$topic")
      val files = dir.listFiles.filter(_.isDirectory).flatMap(_.listFiles)
        .filter(_.getName.endsWith(".parquet")).toSeq
      files.map { f =>
        val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.getAbsolutePath),
            spark.sparkContext.hadoopConfiguration))
        try {
          val st = rd.getFooter.getBlocks.asScala.flatMap(
            _.getColumns.asScala.filter(_.getPath.toDotString == "y").map(_.getStatistics))
          (st.map(_.genericGetMin.asInstanceOf[java.lang.Double].doubleValue).min,
           st.map(_.genericGetMax.asInstanceOf[java.lang.Double].doubleValue).max)
        } finally rd.close()
      }
    }
    def touched(rs: Seq[(Double, Double)], lo: Double, hi: Double): Int =
      rs.count { case (mn, mx) => mx >= lo && mn <= hi }
    // aim for 8 output shards via the size target (~1/8 of input)
    def shardTarget(root: String, topic: String): Long = {
      val dir = new java.io.File(s"$root/$topic")
      val bytes = dir.listFiles.filter(_.isDirectory)
        .flatMap(_.listFiles).filter(_.getName.endsWith(".parquet")).map(_.length).sum
      math.max(1L, bytes / 8)
    }
    val rootLex = tmp(); val rootZ = tmp()
    val lexStore = new TopicStore(spark, rootLex, bucketMinutes = 60)
    val zStore = new TopicStore(spark, rootZ, bucketMinutes = 60)
    // 16 input files per store: the lexicographic path coalesces (it
    // can only merge), so the input must carry enough partitions for
    // both layouts to land ~8 output shards
    lexStore.append("boxes", data.repartition(16))
    zStore.append("boxes", data.repartition(16))
    lexStore.compact("boxes", maxFilesPerBucket = 0,
      clusterBy = Seq("x", "y"), targetShardBytes = shardTarget(rootLex, "boxes"))
    zStore.compact("boxes", maxFilesPerBucket = 0,
      clusterBy = Seq("x", "y"), targetShardBytes = shardTarget(rootZ, "boxes"),
      zorder = true)
    // identical content either way
    assert(zStore.read("boxes").select("id").orderBy("id").collect()
      .sameElements(lexStore.read("boxes").select("id").orderBy("id").collect()),
      "z-order must not change the data")
    val lexR = yRanges(rootLex, "boxes"); val zR = yRanges(rootZ, "boxes")
    assert(lexR.size >= 4 && zR.size >= 4,
      s"need multiple shards to measure pruning (lex=${lexR.size}, z=${zR.size})")
    val (lo, hi) = (0.40, 0.45)
    val (lexHit, zHit) = (touched(lexR, lo, hi), touched(zR, lo, hi))
    // lexicographic: y spans everything in every shard -> all touched
    assert(lexHit == lexR.size,
      s"lexicographic shards should all span the y probe ($lexHit/${lexR.size})")
    assert(zHit < lexHit,
      s"z-order must prune on the second clustered column: z $zHit vs lex $lexHit of ${zR.size}")
  }

  test("zorder compaction with a non-numeric cluster column falls back to lexicographic") {
    // cast('double') of a string key yields null min/max stats; the
    // persisted zorder policy runs on the publish path, so this must
    // degrade to lexicographic clustering, not NPE every append.
    import spark.implicits._
    val store = new TopicStore(spark, tmp(), bucketMinutes = 60)
    val df = (0 until 200).map(i =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i * 1000L), s"k${i % 7}", i * 0.5))
      .toDF("id", "time", "k", "x")
    store.append("zstr", df.repartition(4))
    store.compact("zstr", maxFilesPerBucket = 0,
      clusterBy = Seq("k", "x"), zorder = true)
    assert(store.read("zstr").count() == 200, "fallback must preserve the data")
    // and an all-null numeric column degrades the same way
    val store2 = new TopicStore(spark, tmp(), bucketMinutes = 60)
    store2.append("znull", df.withColumn("x", lit(null).cast("double")).repartition(4))
    store2.compact("znull", maxFilesPerBucket = 0,
      clusterBy = Seq("id", "x"), zorder = true)
    assert(store2.read("znull").count() == 200, "all-null cluster column must not fail")
    // a MIXED column (some rows parse as numbers, some don't) gets
    // non-null stats — the z path runs and must not throw on the
    // malformed rows (they park at mid-range)
    val store3 = new TopicStore(spark, tmp(), bucketMinutes = 60)
    store3.append("zmix", df.withColumn("k",
      when(col("id") % 3 === 0, col("id").cast("string")).otherwise(lit("nan?"))).repartition(4))
    store3.compact("zmix", maxFilesPerBucket = 0,
      clusterBy = Seq("k", "x"), zorder = true)
    assert(store3.read("zmix").count() == 200, "mixed cluster column must not fail")
  }

  test("write config round-trips durably and shapes append batching") {
    // the reference TableConfig's ingest half (config.rs:3-11):
    // write_batch_size caps rows per written file, rw_buffer_capacity
    // concentrates the append. Both must survive a catalog reload and
    // actually shape the files a publish lands.
    import spark.implicits._
    val root = tmp()
    val gs = new GraftSession(spark, root)
    val t0 = new java.sql.Timestamp(1700000000L * 1000)
    gs.createTopic("wcfg")
    gs.catalog.setWriteConfig("wcfg",
      graft.sources.WriteConfig(maxRowsPerFile = 25, coalesce = 1, triggerMs = 500))
    val again = new TopicCatalog(spark, root)
    assert(again.writeConfig("wcfg")
      .contains(graft.sources.WriteConfig(25, 1, 500)),
      "write config must survive a manifest reload")
    // 100 same-bucket rows arriving 16-partitioned: coalesce=1 merges
    // the dust, maxRowsPerFile=25 splits the one task at 25-row
    // boundaries -> exactly 4 shard files
    val df = (0 until 100).map(i => (i.toLong, t0, i * 1.0)).toDF("id", "time", "v")
    gs.publish("wcfg", df.repartition(16))
    val files = new java.io.File(s"$root/topics/ella.public.wcfg").listFiles()
      .filter(_.getName.startsWith("bucket="))
      .flatMap(_.listFiles).filter(_.getName.endsWith(".parquet"))
    assert(files.length == 4,
      s"coalesce=1 + maxRowsPerFile=25 over 100 rows must land 4 files, saw ${files.length}")
    // an unconfigured topic keeps Spark's native behavior (one file
    // per non-empty task)
    gs.publish("wplain", df.repartition(8))
    val plain = new java.io.File(s"$root/topics/ella.public.wplain").listFiles()
      .filter(_.getName.startsWith("bucket="))
      .flatMap(_.listFiles).filter(_.getName.endsWith(".parquet"))
    assert(plain.length == 8, s"no config -> task-count files, saw ${plain.length}")
  }

  test("retention policy downsamples then drops expired buckets, durably and idempotently") {
    import spark.implicits._
    val root = tmp()
    val gs = new GraftSession(spark, root)
    def t(h: Int) = new java.sql.Timestamp((1700000000L + h * 3600L) * 1000)
    gs.createTopic("ret")
    // three hour-buckets: 0h (2 rows), 2h, 4h — horizon with
    // maxAge=90min lands at 4h-1.5h=2.5h, so ONLY bucket 0 (ends 1h)
    // is whole-expired; bucket 2h (ends 3h) straddles and must stay
    gs.publish("ret", Seq(
      (1L, t(0), 2.0), (2L, t(0), 4.0),
      (3L, t(2), 6.0),
      (4L, t(4), 8.0)).toDF("id", "time", "v"))
    gs.setRetention("ret", maxAgeMinutes = 90,
      downsampleTo = "ret_1h", everyMinutes = 60, valueCol = "v")
    // durable: a fresh catalog instance sees the policy
    assert(new TopicCatalog(spark, root).retention("ret")
      .exists(p => p.maxAgeMinutes == 90 && p.downsampleTo == "ret_1h"),
      "retention policy must survive a manifest reload")
    val dropped = gs.retentionSweep("ret")
    assert(dropped == Seq(1700000000L / 3600 * 3600),
      s"exactly the whole-expired bucket drops: $dropped")
    // raw topic keeps only the live rows
    assert(gs.table("ret").select("id").as[Long].collect().toSet == Set(3L, 4L))
    // the tier holds the expired rows' exact aggregate
    val tier = gs.table("ret_1h")
      .select("n", "vmin", "vmax", "sum_c").as[(Long, Double, Double, Long)].collect().toSeq
    assert(tier == Seq((2L, 2.0, 4.0, 600L)), s"tier aggregate wrong: $tier")
    // idempotent: nothing left to expire
    assert(gs.retentionSweep("ret").isEmpty)
    assert(gs.table("ret_1h").count() == 1, "a re-sweep must not re-append the tier")
    // maintain() applies the registered rule: add a newer bucket that
    // pushes the horizon past bucket 2h
    gs.publish("ret", Seq((5L, t(6), 10.0)).toDF("id", "time", "v"))
    gs.maintain()
    assert(gs.table("ret").select("id").as[Long].collect().toSet == Set(4L, 5L),
      "maintain() must sweep by the registered policy")
    assert(gs.table("ret_1h").count() == 2, "second tier row from the 2h bucket")
  }

  test("session config exposes the datastore's effective settings") {
    // pyella Ella.config() parity: a client introspects root,
    // namespace, and engine knobs without private state.
    val root = tmp()
    val gs = new GraftSession(spark, root)
    val c = gs.config
    assert(c("root") == root && c("catalog") == "ella" && c("schema") == "public")
    assert(c("timeZone") == "UTC" && c.contains("bucketMinutes"))
  }

  test("append/read round-trips rows through bucketed parquet") {
    val store = new TopicStore(spark, tmp(), bucketMinutes = 60)
    store.append("t1", sampleEvents(50))
    assert(store.read("t1").count() == 50)
    assert(store.read("t1").columns.contains("bucket"))
  }

  test("readRange prunes buckets and filters rows exactly") {
    val store = new TopicStore(spark, tmp(), bucketMinutes = 60)
    val start = 1700000000L
    store.append("t2", sampleEvents(100, start))
    val from = start + 3600
    val to = start + 7200
    val got = store.readRange("t2", from, to)
    assert(got.count() ==
      sampleEvents(100, start).filter(col("time").cast("long") >= from && col("time").cast("long") < to).count())
    // partition pruning visible in the plan
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), "bucket predicate should prune partitions")
  }

  test("compact merges small-file buckets without changing data") {
    val root = tmp()
    val store = new TopicStore(spark, root, bucketMinutes = 60)
    (0 until 6).foreach(_ => store.append("t3", sampleEvents(12)))
    val before = store.read("t3").count()
    val compacted = store.compact("t3", maxFilesPerBucket = 2)
    assert(compacted.nonEmpty, "expected at least one bucket to compact")
    assert(store.read("t3").count() == before)
    compacted.foreach { b =>
      val dir = new java.io.File(s"$root/t3/bucket=$b")
      assert(dir.listFiles().count(_.getName.endsWith(".parquet")) == 1)
    }
  }

  test("V2 catalog inserts fail loudly on bad shapes, never corrupt the topic") {
    import spark.implicits._
    val root = tmp()
    val gs = new GraftSession(spark, root)
    val t0 = new java.sql.Timestamp(1700000000L * 1000)
    gs.publish("strict", Seq((1L, t0, 1.0)).toDF("key", "time", "v"))
    gs.registerSparkCatalog("g2e")
    // wrong arity: not silently position-matched
    val e1 = intercept[Exception] {
      spark.sql("INSERT INTO g2e.strict VALUES (2, TIMESTAMP '2023-11-14 22:13:20')")
    }
    assert(e1.getMessage.contains("expected columns") || e1.getMessage.contains("INSERT"),
      s"arity mismatch must explain itself: ${e1.getMessage}")
    // overwrite: topics are append-only
    val e2 = intercept[Exception] {
      spark.sql("INSERT OVERWRITE g2e.strict VALUES (9, TIMESTAMP '2023-11-14 22:13:20', 9.0)")
    }
    assert(e2.getMessage.toLowerCase.contains("append-only")
      || e2.getMessage.toLowerCase.contains("overwrite"),
      s"overwrite must be rejected: ${e2.getMessage}")
    assert(gs.table("strict").count() == 1, "failed inserts must leave the topic untouched")
  }

  test("V2 catalog namespaces: SHOW/CREATE/DROP NAMESPACE round-trip") {
    import spark.implicits._
    val root = tmp()
    val gs = new GraftSession(spark, root)
    val t0 = new java.sql.Timestamp(1700000000L * 1000)
    gs.publish("nst", Seq((1L, t0, 1.0)).toDF("key", "time", "v"))
    gs.registerSparkCatalog("g2ns")
    val top = spark.sql("SHOW NAMESPACES IN g2ns").collect().map(_.getString(0))
    assert(top.contains("ella"), s"implied catalog namespace, saw ${top.mkString(",")}")
    val sub = spark.sql("SHOW NAMESPACES IN g2ns.ella").collect().map(_.getString(0))
    assert(sub.contains("ella.public"), s"implied schema namespace, saw ${sub.mkString(",")}")
    spark.sql("CREATE NAMESPACE g2ns.ella.raw")
    assert(gs.catalog.contains("raw") || spark.sql("SHOW NAMESPACES IN g2ns.ella")
      .collect().map(_.getString(0)).contains("ella.raw"),
      "created schema must be visible")
    spark.sql("DROP NAMESPACE g2ns.ella.raw")
    assert(!spark.sql("SHOW NAMESPACES IN g2ns.ella").collect()
      .map(_.getString(0)).contains("ella.raw"))
    // topics list under their namespace
    val tables = spark.sql("SHOW TABLES IN g2ns.ella.public").collect().map(_.getString(1))
    assert(tables.contains("nst"), s"saw ${tables.mkString(",")}")
  }

  test("checkpoint never erases topics committed by another catalog instance") {
    // two catalog instances over one root (a session + the V2 plugin
    // serving a remote client): instance B snapshotting from stale
    // memory used to ERASE what instance A had committed to the log
    val root = tmp()
    val a = new GraftSession(spark, root)
    val b = new GraftSession(spark, root)
    a.createTopic("from_a")
    b.catalog.checkpoint() // what shutdown() runs
    val fresh = new GraftSession(spark, root)
    assert(fresh.catalog.contains("from_a"),
      "checkpoint must replay other writers' commits, not erase them")
    assert(b.catalog.contains("from_a"), "lookup miss must reload from disk")
  }

  test("evolved topics read with the union schema automatically; the flag is durable") {
    import spark.implicits._
    val root = tmp()
    val gs = new GraftSession(spark, root)
    val t0 = new java.sql.Timestamp(1700000000L * 1000)
    gs.publish("ev", Seq((1L, t0, "a")).toDF("id", "time", "v"))
    assert(!gs.catalog.evolved("ev"))
    // same column set again (different order): NOT evolution
    gs.publish("ev", Seq(("b", 2L, t0)).toDF("v", "id", "time"))
    assert(!gs.catalog.evolved("ev"), "column order must not flip the flag")
    // a new column: evolution — table() now reads the union schema
    // with zero caller opt-in, old rows surface null
    gs.publish("ev", Seq((3L, t0, "c", 30L)).toDF("id", "time", "v", "w"))
    assert(gs.catalog.evolved("ev"))
    val r = gs.table("ev").orderBy("id").select("id", "v", "w").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(r(0).isNullAt(2) && r(1).isNullAt(2) && r(2).getLong(2) == 30L,
      s"union schema with nulls on pre-evolution rows: ${r.toSeq}")
    // durable: a fresh session over the same root still knows
    val gs2 = new GraftSession(spark, root)
    assert(gs2.catalog.evolved("ev"), "the evolved flag must survive reload")
    assert(gs2.table("ev").columns.contains("w"))
    // never-evolved topics keep the cheap single-footer read path
    gs.publish("flat", Seq((1L, t0, 1.0)).toDF("id", "time", "x"))
    assert(!gs.catalog.evolved("flat"))
    // ...and the flag is SQL-auditable next to the other policies
    val pol = gs.query("""SELECT table_name, schema_evolved
      |FROM information_schema_topic_policies ORDER BY table_name""".stripMargin)
      .as[(String, Boolean)].collect().toMap
    assert(pol("ev") && !pol("flat"), s"schema_evolved must audit via SQL: $pol")
  }

  test("a declared-schema topic stays readable after its first publish") {
    // createTopic(schema) materializes an empty parquet for schema
    // inference; the first publish then adds bucket= dirs. Mixed
    // directory depths are exactly what Spark's partition discovery
    // rejects ("Conflicting directory structures") — this pins the
    // create→publish→read path.
    import spark.implicits._
    val root = tmp()
    val gs = new GraftSession(spark, root)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("time", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType)))
    gs.createTopic("declared", schema)
    assert(gs.table("declared").schema.fieldNames.contains("key"),
      "empty declared topic must be readable with its schema")
    val t0 = new java.sql.Timestamp(1700000000L * 1000)
    gs.publish("declared", Seq((1L, t0, 1.0)).toDF("key", "time", "v"))
    assert(gs.table("declared").count() == 1,
      "topic must stay readable after the first publish")
    // the root-level schema file must not suppress partition
    // discovery: time-range reads prune on the bucket column
    assert(gs.table("declared").columns.contains("bucket"),
      s"bucket partition column lost, saw: ${gs.table("declared").columns.mkString(",")}")
    assert(gs.store.readRange(gs.catalog.resolve("declared"),
      1700000000L - 10, 1700000000L + 10).count() == 1)
  }

  test("footer row-count stats match a real count (no scan job)") {
    val store = new TopicStore(spark, tmp(), bucketMinutes = 60)
    (0 until 3).foreach(_ => store.append("st", sampleEvents(40)))
    assert(store.rowCount("st").contains(120L),
      s"footer stats must equal the real count, got ${store.rowCount("st")}")
    assert(store.rowCount("missing_topic").isEmpty)
    // the driver testdata file the dd05 band-width sizing reads
    val n = graft.sources.Stats.parquetRowCount(spark, "/root/testdata/sf0.001/embeddings.parquet")
    assert(n.isDefined && n.get > 0)
    assert(n.get == spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").count())
  }

  test("mixed upsert seq domains are rejected (clock would shadow batch ids)") {
    val store = new TopicStore(spark, tmp())
    store.upsert("mix", sampleEvents(5), seq = Some(1L))
    intercept[IllegalStateException] { store.upsert("mix", sampleEvents(5)) }
    store.upsert("mix2", sampleEvents(5))
    intercept[IllegalStateException] { store.upsert("mix2", sampleEvents(5), seq = Some(7L)) }
    // negative explicit seqs are a legal domain now (no -1 sentinel)
    store.upsert("mix3", sampleEvents(5), seq = Some(-5L))
    store.upsert("mix3", sampleEvents(5), seq = Some(-4L))
    assert(store.readMerged("mix3", "key").count() == 3)
  }

  test("topics read and write as a Spark V2 catalog (the remote publish surface)") {
    import spark.implicits._
    val root = tmp()
    val gs = new GraftSession(spark, root)
    val t0 = new java.sql.Timestamp(1700000000L * 1000)
    gs.publish("kv", Seq((1L, t0, 1.0)).toDF("key", "time", "v"))
    gs.registerSparkCatalog("g2a") // unique name: CatalogManager caches per name
    assert(spark.sql("SELECT count(*) FROM g2a.kv").collect().head.getLong(0) == 1L)
    // positional VALUES insert: bucket derived server-side from time
    spark.sql("INSERT INTO g2a.kv VALUES (2, TIMESTAMP '2023-11-14 22:13:20', 2.0)")
    assert(gs.table("kv").count() == 2, "insert must land in the topic")
    val buckets = new java.io.File(s"$root/topics/ella.public.kv").listFiles()
      .filter(_.getName.startsWith("bucket="))
    assert(buckets.nonEmpty, "inserted rows must land in the bucketed layout")
    // INSERT INTO ... SELECT (by-position, aliased names)
    spark.sql("INSERT INTO g2a.kv SELECT key + 10, time, v * 2 FROM g2a.kv")
    assert(gs.table("kv").count() == 4)
    // reads prune on the bucket partition column like any parquet scan
    val plan = spark.sql("SELECT * FROM g2a.kv WHERE bucket >= 0")
      .queryExecution.executedPlan.toString
    assert(plan.contains("kv"), s"scan must be planned over the topic: $plan")
    // a SECOND session over the same SparkContext sees the topic and
    // the writes (the Connect-isolation shape: shared conf, own state)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.g2a", classOf[graft.sources.TopicSparkCatalog].getName)
    s2.conf.set("spark.sql.catalog.g2a.root", root)
    assert(s2.sql("SELECT count(*) FROM g2a.kv").collect().head.getLong(0) == 4L)
  }

  test("execute() routes INSERT INTO <topic> through publish") {
    import spark.implicits._
    val root = tmp()
    val gs = new GraftSession(spark, root)
    val t0 = new java.sql.Timestamp(1700000000L * 1000)
    gs.publish("ins", Seq((1L, t0, 1.0)).toDF("key", "time", "v"))
    gs.execute("INSERT INTO ins VALUES (2, TIMESTAMP '2023-11-14 22:13:20', 4.0)")
    assert(gs.table("ins").count() == 2)
    gs.execute("INSERT INTO ins SELECT key + 5, time, v FROM ins")
    assert(gs.table("ins").count() == 4)
    // explicit column list: unlisted columns NULL-fill
    gs.execute("INSERT INTO ins (key, time) VALUES (9, TIMESTAMP '2023-11-14 22:13:20')")
    val r = gs.query("SELECT v FROM ins WHERE key = 9").collect()
    assert(r.length == 1 && r.head.isNullAt(0), "unlisted columns must be NULL")
    // values were typed/cast to the topic schema, bucket derived
    assert(gs.table("ins").schema("v").dataType.typeName == "double")
  }

  test("size-based compaction: dust triggers rewrite, target sets shard count") {
    val root = tmp()
    val store = new TopicStore(spark, root, bucketMinutes = 60)
    // 3 small appends into one bucket: within the file-COUNT bound
    // (maxFilesPerBucket=4) but all dust under minShardBytes
    (0 until 3).foreach(_ => store.append("sz", sampleEvents(6).coalesce(1)))
    val bucketDir = new java.io.File(s"$root/sz").listFiles()
      .filter(_.getName.startsWith("bucket=")).head
    def files() = bucketDir.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files().length == 3)
    // count-only policy leaves it fragmented; the size rule folds it
    assert(store.compact("sz", maxFilesPerBucket = 4).isEmpty,
      "count-only compaction must not trigger at 3 <= 4 files")
    val done = store.compact("sz", maxFilesPerBucket = 4, minShardBytes = 1 << 20)
    assert(done.nonEmpty, "two+ sub-minShardBytes files must trigger compaction")
    assert(files().length == 1, "no target => one shard per bucket")

    // target-size rewrite: total input bytes / target picks shard count
    val before = store.read("sz").count()
    (0 until 5).foreach(_ => store.append("sz", sampleEvents(6).coalesce(1)))
    val total = files().map(_.length).sum
    val target = total / 3  // expect ceil(total/target) ≈ 3-4 shards
    val done2 = store.compact("sz", maxFilesPerBucket = 1, targetShardBytes = target)
    assert(done2.nonEmpty)
    val expected = ((total + target - 1) / target).toInt
    assert(files().length == math.min(expected, 6),
      s"rewrite should aim ~${expected} shards of ~$target bytes, got ${files().length}")
    assert(store.read("sz").count() == before + 5 * 6, "rewrite must not change data")
  }

  test("size policy survives the catalog manifest round-trip") {
    val root = tmp()
    val gs = new GraftSession(spark, root)
    gs.createTopic("t")
    gs.setCompaction("t", everyAppends = 2, maxFilesPerBucket = 3,
      minShardBytes = 123L, targetShardBytes = 456L)
    gs.catalog.checkpoint()
    val gs2 = new GraftSession(spark, root)
    val p = gs2.catalog.compaction("t").get
    assert(p.minShardBytes == 123L && p.targetShardBytes == 456L,
      s"size bounds must survive reload, got $p")
  }

  test("concurrent appends during repeated compaction lose no rows") {
    // the ADVICE-flagged race: an append landing between the
    // compactor's snapshot listing and its directory swap used to be
    // renamed aside and deleted. The topic lock serializes the two;
    // this hammers both paths from separate threads and checks
    // nothing vanishes.
    val store = new TopicStore(spark, tmp(), bucketMinutes = 60)
    store.append("race", sampleEvents(10))
    val rounds = 8
    val appender = new Thread(() =>
      (0 until rounds).foreach { i =>
        store.append("race", sampleEvents(10, startS = 1700000000L + i))
      })
    appender.start()
    (0 until rounds).foreach(_ => store.compact("race", maxFilesPerBucket = 1))
    appender.join()
    store.compact("race", maxFilesPerBucket = 1)
    assert(store.read("race").count() == (rounds + 1) * 10,
      "every concurrently appended row must survive compaction")
  }

  test("swapDir salvages files that appear after the rewrite snapshot") {
    // belt-and-suspenders path: a file OUTSIDE the compactor's known
    // set (e.g. a writer in another process) must be moved into the
    // rewritten dir, not deleted with the aside copy.
    val root = tmp()
    val store = new TopicStore(spark, root, bucketMinutes = 60)
    store.append("s", sampleEvents(12))
    val bucketDir = new java.io.File(s"$root/s").listFiles()
      .filter(_.getName.startsWith("bucket=")).head
    val known = bucketDir.listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    // simulate a late append: drop an extra parquet file into the bucket
    val extraSrc = bucketDir.listFiles().filter(_.getName.endsWith(".parquet")).head
    val late = new java.io.File(bucketDir, "part-late-append.parquet")
    Files.copy(extraSrc.toPath, late.toPath)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(bucketDir.toString)
    val tmpDir = new org.apache.hadoop.fs.Path(bucketDir.getParent, ".compact_test")
    spark.read.parquet(known.map(f => s"$bucketDir/$f").toSeq: _*)
      .coalesce(1).write.mode("overwrite").parquet(tmpDir.toString)
    store.swapDir(fs, tmpDir, dir, salvageNotIn = Some(known))
    val after = new java.io.File(bucketDir.toString).listFiles().map(_.getName)
    assert(after.contains("part-late-append.parquet"),
      s"late file must be salvaged into the rewritten bucket, got ${after.mkString(",")}")
  }

  test("clustering compaction sorts rows within the rewritten shard") {
    val root = tmp()
    val store = new TopicStore(spark, root, bucketMinutes = 60)
    (0 until 3).foreach(_ => store.append("tc", sampleEvents(12)))
    val before = store.read("tc").orderBy("id").collect()
    val compacted = store.compact("tc", maxFilesPerBucket = 1, clusterBy = Seq("key", "time"))
    assert(compacted.nonEmpty)
    assert(store.read("tc").orderBy("id").collect().sameElements(before),
      "clustering must not change the data")
    // rows inside each rewritten file really are sorted by (key, time)
    compacted.foreach { b =>
      val rows = spark.read.parquet(s"$root/tc/bucket=$b")
        .select("key", "time").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime))
      assert(rows.sameElements(rows.sortBy(identity)), s"bucket $b not clustered")
    }
  }

  test("upsert topics: latest version per key wins on read (merge-on-read)") {
    import spark.implicits._
    val store = new TopicStore(spark, tmp(), bucketMinutes = 60)
    val t0 = new java.sql.Timestamp(1700000000L * 1000)
    store.upsert("kv", Seq((1L, t0, "a"), (2L, t0, "b")).toDF("key", "time", "v"), seq = Some(1L))
    store.upsert("kv", Seq((2L, t0, "b2"), (3L, t0, "c")).toDF("key", "time", "v"), seq = Some(2L))
    val got = store.readMerged("kv", "key")
      .select("key", "v").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
    // the raw delta history is still there (append-only writes)
    assert(store.read("kv").count() == 4)
  }

  test("upsert tombstones delete keys; mergeCompact folds the history away") {
    import spark.implicits._
    val store = new TopicStore(spark, tmp(), bucketMinutes = 60)
    val t0 = new java.sql.Timestamp(1700000000L * 1000)
    store.upsert("kv2",
      Seq((1L, t0, "a", false), (2L, t0, "b", false))
        .toDF("key", "time", "v", "_tombstone"), seq = Some(1L))
    store.upsert("kv2",
      Seq((1L, t0, "a", true), (2L, t0, "b9", false))
        .toDF("key", "time", "v", "_tombstone"), seq = Some(2L))
    val live = store.readMerged("kv2", "key")
      .select("key", "v").as[(Long, String)].collect().toMap
    assert(live == Map(2L -> "b9"), "tombstoned key 1 must disappear")
    store.mergeCompact("kv2", "key")
    // after compaction: one physical row per live key, merged view unchanged
    assert(store.read("kv2").count() == 1)
    val after = store.readMerged("kv2", "key")
      .select("key", "v").as[(Long, String)].collect().toMap
    assert(after == live)
  }

  test("tombstones survive mixed-schema shards and compaction boundaries") {
    import spark.implicits._
    val store = new TopicStore(spark, tmp(), bucketMinutes = 60)
    val t0 = new java.sql.Timestamp(1700000000L * 1000)
    // shard 1 written with NO _tombstone column, shard 2 deletes key 1:
    // upsert materializes _tombstone on every shard, so the merged
    // read can't infer a footer that lacks the delete flags and
    // silently resurrect key 1
    store.upsert("kv3", Seq((1L, t0, "a"), (2L, t0, "b")).toDF("key", "time", "v"), seq = Some(1L))
    store.upsert("kv3",
      Seq((1L, t0, "a", true)).toDF("key", "time", "v", "_tombstone"), seq = Some(2L))
    val live = store.readMerged("kv3", "key")
      .select("key", "v").as[(Long, String)].collect().toMap
    assert(live == Map(2L -> "b"), s"tombstoned key 1 resurfaced: $live")
    // after compaction the rewritten shard keeps a (false) _tombstone
    // column, so a LATER tombstone shard still merges schema-stably
    store.mergeCompact("kv3", "key")
    store.upsert("kv3",
      Seq((2L, t0, "b", true)).toDF("key", "time", "v", "_tombstone"), seq = Some(10L))
    assert(store.readMerged("kv3", "key").count() == 0,
      "post-compaction tombstone must still delete")
  }

  test("recover restores a topic stranded mid-swap and clears completed-swap leftovers") {
    import spark.implicits._
    val root = tmp()
    val store = new TopicStore(spark, root, bucketMinutes = 60)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$root/$s")
    val t0 = new java.sql.Timestamp(1700000000L * 1000)
    store.upsert("kv", Seq((1L, t0, "a"), (2L, t0, "b")).toDF("key", "time", "v"), seq = Some(1L))
    val before = store.readMerged("kv", "key")
      .select("key", "v").as[(Long, String)].collect().toMap
    // crash window 1: live dir renamed aside, rewrite never promoted —
    // the topic is GONE until recovery rolls the swap back
    fs.mkdirs(p(".merge_kv"))
    assert(fs.rename(p("kv"), p(".old_kv")))
    assert(!store.exists("kv"))
    val acts1 = store.recover("kv")
    assert(acts1.contains("restored:kv") && acts1.contains("removed:.merge_kv"), s"got $acts1")
    assert(store.readMerged("kv", "key")
      .select("key", "v").as[(Long, String)].collect().toMap == before)
    // crash window 2: swap completed but the aside/temp cleanup died —
    // leftovers must be cleared WITHOUT touching the live topic
    fs.mkdirs(p(".old_kv")); fs.mkdirs(p(".merge_kv"))
    val acts2 = store.recover("kv")
    assert(acts2.toSet == Set("removed:.old_kv", "removed:.merge_kv"), s"got $acts2")
    assert(!fs.exists(p(".old_kv")) && !fs.exists(p(".merge_kv")))
    // bucket-level: a compact() crash leaves .old_bucket= inside the
    // topic dir; missing bucket restores, surviving bucket's aside drops
    val bucket = fs.listStatus(p("kv")).map(_.getPath.getName)
      .find(_.startsWith("bucket=")).get
    assert(fs.rename(new org.apache.hadoop.fs.Path(p("kv"), bucket),
      new org.apache.hadoop.fs.Path(p("kv"), s".old_$bucket")))
    val acts3 = store.recover("kv")
    assert(acts3.contains(s"restored:$bucket"), s"got $acts3")
    assert(store.readMerged("kv", "key")
      .select("key", "v").as[(Long, String)].collect().toMap == before)
    // idempotent when clean
    assert(store.recover("kv").isEmpty)
  }

  test("truncate drops a topic atomically, resets its seq domain, and recover finishes a crashed truncate") {
    import spark.implicits._
    val root = tmp()
    val store = new TopicStore(spark, root, bucketMinutes = 60)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$root/$s")
    val t0 = new java.sql.Timestamp(1700000000L * 1000)
    store.upsert("tr", Seq((1L, t0, "a")).toDF("key", "time", "v"), seq = Some(5L))
    store.truncate("tr")
    assert(!store.exists("tr") && !fs.exists(p(".trunc_tr")),
      "truncate must remove the topic and leave no aside")
    // seq-domain reset: a truncated topic is a NEW topic — a clock-seq
    // writer must be admitted where the old explicit-seq domain would
    // have thrown
    store.upsert("tr", Seq((2L, t0, "b")).toDF("key", "time", "v"))
    assert(store.readMerged("tr", "key").select("v").as[String].collect().toSeq == Seq("b"))
    // crash window: live dir moved aside, final delete never ran — the
    // truncate already SUCCEEDED semantically (no live topic), so
    // recover must finish the delete, never resurrect consumed data
    assert(fs.rename(p("tr"), p(".trunc_tr")))
    val acts = store.recover("tr")
    assert(acts.contains("removed:.trunc_tr"), s"got $acts")
    assert(!store.exists("tr") && !fs.exists(p(".trunc_tr")))
    // truncating an absent topic is a no-op
    store.truncate("tr")
    assert(store.recover("tr").isEmpty)
  }

  test("readChanges classifies insert/update/delete and ignores lost late arrivals") {
    import spark.implicits._
    val store = new TopicStore(spark, tmp(), bucketMinutes = 60)
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    // state at the "from" instant (ts=1000): 1->a, 2->b, 3->c
    store.upsert("cdc",
      Seq((1L, t(1000), "a"), (2L, t(1000), "b"), (3L, t(1000), "c"))
        .toDF("key", "time", "v"), seq = Some(10L))
    // inside the window (ts=2000): update 2, insert 4, delete 3,
    // tombstone never-existing 5 (must NOT surface as a change)
    store.upsert("cdc",
      Seq((2L, t(2000), "b2", false), (4L, t(2000), "d", false),
          (3L, t(2000), "c", true), (5L, t(2000), "x", true))
        .toDF("key", "time", "v", "_tombstone"), seq = Some(20L))
    // late arrival with a LOWER seq: key 1 is touched but the winning
    // version at `to` is unchanged — last-write-wins discards it, so
    // the change feed must stay silent about key 1
    store.upsert("cdc",
      Seq((1L, t(2500), "a_late")).toDF("key", "time", "v"), seq = Some(5L))
    val got = store.readChanges("cdc", "key", 1500L, 3000L)
      .select("key", "v", "_seq", "_change_type")
      .as[(Long, String, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (2L, "b2", 20L, "update"),
      (3L, "c", 10L, "delete"),   // delete carries the PRE-image
      (4L, "d", 20L, "insert")), s"got $got")
    // the full span from before any write: everything live is an insert
    val fromZero = store.readChanges("cdc", "key", 0L, 3000L)
      .select("key", "_change_type").as[(Long, String)].collect().toMap
    assert(fromZero == Map(1L -> "insert", 2L -> "insert", 4L -> "insert"),
      s"got $fromZero")
    // empty window: no changes
    assert(store.readChanges("cdc", "key", 3000L, 4000L).count() == 0)
  }

  test("readChanges: resurrection is an insert; append-only topics degrade to inserts") {
    import spark.implicits._
    val store = new TopicStore(spark, tmp(), bucketMinutes = 60)
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    store.upsert("res", Seq((1L, t(1000), "a")).toDF("key", "time", "v"), seq = Some(1L))
    store.upsert("res",
      Seq((1L, t(2000), "a", true)).toDF("key", "time", "v", "_tombstone"), seq = Some(2L))
    store.upsert("res", Seq((1L, t(3000), "a2")).toDF("key", "time", "v"), seq = Some(3L))
    // dead at from=2500, live at to=3500 -> insert (not update)
    val res = store.readChanges("res", "key", 2500L, 3500L)
      .select("key", "v", "_change_type").as[(Long, String, String)].collect().toSeq
    assert(res == Seq((1L, "a2", "insert")), s"got $res")
    // live at 1500, tombstoned by 2500 -> the earlier window is a delete
    assert(store.readChanges("res", "key", 1500L, 2500L)
      .select("_change_type").as[String].collect().toSeq == Seq("delete"))
    // plain appends (no _seq): the window rows ARE the inserts
    store.append("log", Seq((7L, t(1000), "e1"), (8L, t(5000), "e2")).toDF("key", "time", "v"))
    val log = store.readChanges("log", "key", 1500L, 6000L)
      .select("key", "v", "_change_type").as[(Long, String, String)].collect().toSeq
    assert(log == Seq((8L, "e2", "insert")), s"got $log")
  }

  test("readChanges plan: every scan is bucket-pruned and the history merge runs once") {
    import spark.implicits._
    val store = new TopicStore(spark, tmp(), bucketMinutes = 60)
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    store.upsert("plan",
      (0 until 500).map(i => (i.toLong, t(1000 + i * 100), s"v$i")).toDF("key", "time", "v"),
      seq = Some(1L))
    store.upsert("plan",
      (0 until 20).map(i => (i.toLong, t(200000 + i), s"w$i")).toDF("key", "time", "v"),
      seq = Some(2L))
    val c = store.readChanges("plan", "key", 150000L, 300000L)
    c.collect() // materialize so the adaptive plan is final
    val p = c.queryExecution.executedPlan.toString
    // time-travel pruning reaches every parquet scan at planning time
    assert(p.contains("PartitionFilters: [isnotnull(bucket"),
      s"bucket partition pruning missing:\n$p")
    assert(!p.contains("PartitionFilters: []"),
      s"some scan reads all buckets:\n$p")
    // pre feeds BOTH the full-outer join and the post-state union; at
    // runtime AQE must reuse the merge agg's shuffle, not rebuild the
    // history merge twice
    assert(p.contains("ReusedExchange"),
      s"history merge shuffle should be reused, not recomputed:\n$p")
    assert(!p.contains("CartesianProduct"), s"CDC diff must stay keyed:\n$p")
  }

  test("readChanges equals the brute-force diff of the two as-of merged views") {
    import spark.implicits._
    val store = new TopicStore(spark, tmp(), bucketMinutes = 60)
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    // deterministic pseudo-random history: 40 versions over 8 keys,
    // ~25% tombstones, unique seqs, spread over 10 buckets
    val rnd = new scala.util.Random(42)
    val hist = (0 until 40).map { i =>
      (rnd.nextInt(8).toLong, t(1000L + rnd.nextInt(36000)), s"v$i", rnd.nextInt(4) == 0, i.toLong)
    }
    hist.foreach { case (k, ts, v, tomb, seq) =>
      store.upsert("rand", Seq((k, ts, v, tomb)).toDF("key", "time", "v", "_tombstone"),
        seq = Some(seq))
    }
    def liveAt(cut: Long): Map[Long, (String, Long)] = hist
      .filter(_._2.getTime / 1000 <= cut)
      .groupBy(_._1)
      .flatMap { case (k, vs) =>
        val w = vs.maxBy(_._5)
        if (w._4) None else Some(k -> (w._3, w._5))
      }
    for ((from, to) <- Seq((0L, 40000L), (5000L, 20000L), (15000L, 16000L), (20000L, 37000L))) {
      val pre = liveAt(from); val post = liveAt(to)
      val expected =
        (post.keySet -- pre.keySet).map(k => (k, post(k)._1, post(k)._2, "insert")) ++
        (pre.keySet -- post.keySet).map(k => (k, pre(k)._1, pre(k)._2, "delete")) ++
        (post.keySet & pre.keySet).collect {
          case k if post(k)._2 != pre(k)._2 => (k, post(k)._1, post(k)._2, "update")
        }
      val got = store.readChanges("rand", "key", from, to)
        .select("key", "v", "_seq", "_change_type")
        .as[(Long, String, Long, String)].collect().toSet
      assert(got == expected, s"window ($from,$to]: got $got expected $expected")
    }
  }

  test("default upsert seqs are strictly increasing (rapid writes stay deterministic)") {
    import spark.implicits._
    val store = new TopicStore(spark, tmp(), bucketMinutes = 60)
    val t0 = new java.sql.Timestamp(1700000000L * 1000)
    // two default-seq upserts in the same millisecond must not tie on
    // _seq (a tie decays to arbitrary lexicographic last-write-wins)
    store.upsert("kv4", Seq((1L, t0, "first")).toDF("key", "time", "v"))
    store.upsert("kv4", Seq((1L, t0, "second")).toDF("key", "time", "v"))
    val seqs = store.read("kv4").select("_seq").as[Long].collect().sorted
    assert(seqs.distinct.length == 2, s"default seqs tied: ${seqs.toSeq}")
    val got = store.readMerged("kv4", "key")
      .select("key", "v").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "second"), s"later write must win: $got")
  }

  test("readAsOf/readMergedAsOf time-travel: snapshot at a past cutoff") {
    import spark.implicits._
    val store = new TopicStore(spark, tmp(), bucketMinutes = 60)
    val t1 = new java.sql.Timestamp(1700000000L * 1000)          // bucket A
    val t2 = new java.sql.Timestamp((1700000000L + 7200) * 1000) // bucket B (2 h later)
    store.upsert("tt", Seq((1L, t1, "a"), (2L, t1, "b")).toDF("key", "time", "v"), seq = Some(1L))
    store.upsert("tt", Seq((1L, t2, "a2")).toDF("key", "time", "v"), seq = Some(2L))
    val cutoff = 1700000000L + 3600
    // plain snapshot sees only the first write
    assert(store.readAsOf("tt", cutoff).count() == 2)
    // bucket pruning visible in the plan
    val plan = store.readAsOf("tt", cutoff).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"cutoff must prune buckets:\n$plan")
    // merged snapshot: key 1 resolves to its OLD value at the cutoff
    val asOf = store.readMergedAsOf("tt", "key", cutoff)
      .select("key", "v").as[(Long, String)].collect().toMap
    assert(asOf == Map(1L -> "a", 2L -> "b"))
    // and to the new value now
    val now = store.readMerged("tt", "key")
      .select("key", "v").as[(Long, String)].collect().toMap
    assert(now == Map(1L -> "a2", 2L -> "b"))
  }

  test("readMerged collapses deltas map-side (partial agg before the shuffle)") {
    val store = new TopicStore(spark, tmp(), bucketMinutes = 60)
    store.upsert("kv3", sampleEvents(20), seq = Some(1L))
    val plan = store.readMerged("kv3", "id").queryExecution.executedPlan.toString
    assert(plan.contains("partial_max") || plan.contains("partial"),
      s"merge must partial-aggregate before shuffling:\n$plan")
  }

  test("catalog registers topics and views and persists the manifest") {
    val root = tmp()
    val store = new TopicStore(spark, s"$root/topics")
    val cat = new TopicCatalog(spark, root)
    cat.createTopic("sensor", store)
    assert(cat.contains("sensor"))
    assert(cat.resolve("sensor") == "ella.public.sensor")
    store.append(cat.resolve("sensor"), sampleEvents(10))
    assert(cat.table("sensor").count() == 10)

    sampleEvents(10).createOrReplaceTempView("ev_src")
    cat.createView("v_all", "SELECT key, count(*) AS n FROM ev_src GROUP BY key")
    assert(cat.table("v_all").count() == 3)
    cat.materializeView("v_mat", "SELECT key, count(*) AS n FROM ev_src GROUP BY key")
    assert(cat.table("v_mat").count() == 3)
    assert(cat.list().map(_._2).toSet == Set("topic", "view", "materialized_view"))

    // a fresh catalog instance reloads the manifest
    val cat2 = new TopicCatalog(spark, root)
    assert(cat2.contains("sensor") && cat2.contains("v_all") && cat2.contains("v_mat"))
    assert(cat2.table("v_mat").count() == 3)
    assert(cat2.dropTable("v_all") && !cat2.contains("v_all"))
  }

  test("GraftSession exposes per-batch streaming load for its queries") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.TopicEvent
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val gs = new GraftSession(spark, tmp())
    val input = MemoryStream[TopicEvent]
    val q = input.toDF().groupBy("event_type").count()
      .writeStream.format("memory").queryName("gs_load")
      .outputMode("complete").start()
    try {
      input.addData(TopicEvent(1, new java.sql.Timestamp(0L), 1, "click", 1.0))
      q.processAllAvailable()
      val load = gs.streamingLoad.filter(_.queryName == "gs_load")
      assert(load.exists(_.numInputRows == 1), s"session must see its stream's batches: $load")
    } finally {
      q.stop()
      gs.shutdown()
    }
  }

  test("fingerprint topic absorbs batches: dedupAgainst flags known content across days") {
    import graft.api._
    import spark.implicits._
    val gs = new GraftSession(spark, tmp())
    val t0 = new java.sql.Timestamp(1700000000L * 1000)
    // day 1: corpus arrives, its fingerprints land in a topic
    val day1 = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    gs.publish("fp", day1.select(md5(col("text")).as("chash")).withColumn("time", lit(t0)))
    // day 2: one dup of day 1, one new doc — checked against the
    // fingerprint TOPIC, never against day-1 text
    val day2 = Seq((3L, "alpha beta"), (4L, "epsilon zeta")).toDF("doc_id", "text")
    val checked = day2.dedupAgainst("doc_id", "text", gs.table("fp"))
    val flags = checked.select("doc_id", "is_known").as[(Long, Boolean)].collect().toMap
    assert(flags == Map(3L -> true, 4L -> false), s"day-2 flags: $flags")
    // absorb day 2: append only the NEW fingerprints
    gs.publish("fp", checked.filter(!col("is_known"))
      .select(col("chash")).withColumn("time", lit(t0)))
    // day 3: the day-2 newcomer is now known too
    val day3 = Seq((5L, "epsilon zeta")).toDF("doc_id", "text")
    val f3 = day3.dedupAgainst("doc_id", "text", gs.table("fp"))
      .select("doc_id", "is_known").as[(Long, Boolean)].collect().toMap
    assert(f3 == Map(5L -> true), s"day-3 flags: $f3")
  }

  test("maintain() compacts every registered topic's small-file buckets") {
    import spark.implicits._
    val gs = new GraftSession(spark, tmp())
    val t0 = new java.sql.Timestamp(1700000000L * 1000)
    // 6 appends into one bucket -> 6 files, above the threshold
    (1 to 6).foreach { i =>
      gs.publish("chatty", Seq((i.toLong, t0, i.toDouble)).toDF("key", "time", "v"))
    }
    val before = gs.table("chatty").orderBy("key").collect()
    val done = gs.maintain(maxFilesPerBucket = 4)
    assert(done.exists(_._1.endsWith("chatty")), s"chatty must compact: $done")
    assert(gs.table("chatty").orderBy("key").collect().sameElements(before),
      "compaction must not change the data")
    // idempotent: a second pass finds nothing to do
    assert(gs.maintain(maxFilesPerBucket = 4).isEmpty)
  }

  test("a FAILED (not crashed) directory swap restores the original topic") {
    // Hadoop FileSystem.rename reports failure by returning false, not
    // throwing; an unchecked second rename + aside delete would remove
    // the only surviving copy of the topic.
    val root = tmp()
    val store = new TopicStore(spark, root, bucketMinutes = 60)
    store.append("ts", sampleEvents(10))
    val before = store.read("ts").orderBy("id").collect()
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(store.topicPath("ts"))
    val missingTmp = new org.apache.hadoop.fs.Path(root, ".merge_nonexistent")
    val ex = intercept[java.io.IOException](store.swapDir(fs, missingTmp, dir))
    assert(ex.getMessage.contains("could not move"), ex.getMessage)
    assert(fs.exists(dir), "failed swap must leave the topic directory in place")
    assert(store.read("ts").orderBy("id").collect().sameElements(before),
      "failed swap must leave the topic data untouched")
  }

  test("per-topic compaction schedule triggers from the publish path and survives restart") {
    import spark.implicits._
    val root = tmp()
    val gs = new GraftSession(spark, root)
    val t0 = new java.sql.Timestamp(1700000000L * 1000)
    def one(i: Int) = Seq((i.toLong, t0, i.toDouble)).toDF("key", "time", "v")
    def files(): Int = new java.io.File(s"$root/topics/ella.public.hot/bucket=1699999200")
      .listFiles().count(_.getName.endsWith(".parquet"))

    gs.createTopic("hot")
    gs.setCompaction("hot", everyAppends = 3, maxFilesPerBucket = 2)
    gs.publish("hot", one(1)); gs.publish("hot", one(2))
    assert(files() == 2, "not due yet: appends accumulate as separate files")
    gs.publish("hot", one(3)) // 3rd publish: cadence due, bucket has 3 > 2 files
    assert(files() == 1, "scheduled compaction must rewrite the fragmented bucket")
    assert(gs.table("hot").select("key").as[Long].collect().sorted.sameElements(Array(1L, 2L, 3L)))

    // the policy is durable: a fresh session on the same root enforces it
    gs.shutdown()
    val gs2 = new GraftSession(spark, root)
    assert(gs2.catalog.compaction("hot").exists(_.everyAppends == 3),
      "compaction policy must survive a catalog reload")
    (4 to 6).foreach(i => gs2.publish("hot", one(i)))
    assert(files() == 1, "reloaded schedule must still trigger on the 3rd publish")
    assert(gs2.table("hot").count() == 6)

    // maintain() honors the topic's own policy over the session default:
    // threshold 2 from the policy beats the permissive argument
    gs2.publish("hot", one(7)); gs2.publish("hot", one(8)) // 2 loose files + 1 compact
    val done = gs2.maintain(maxFilesPerBucket = 100)
    assert(done.exists(_._1.endsWith("hot")),
      s"maintain must apply the topic's maxFilesPerBucket=2, got $done")
    assert(files() == 1)
  }

  test("GraftSession facade: publish + query by name") {
    val gs = new GraftSession(spark, tmp())
    gs.publish("readings", sampleEvents(20))
    assert(gs.table("readings").count() == 20)
    val n = gs.query("SELECT count(*) AS n FROM readings").collect().head.getLong(0)
    assert(n == 20)
  }

  test("execute() routes DDL to the catalog like the reference") {
    val gs = new GraftSession(spark, tmp())
    gs.publish("meter", sampleEvents(30))
    gs.execute("CREATE VIEW meter_by_key AS SELECT key, count(*) AS n FROM meter GROUP BY key")
    assert(gs.table("meter_by_key").count() == 3)
    gs.execute("CREATE MATERIALIZED VIEW meter_mat AS SELECT key, count(*) AS n FROM meter GROUP BY key")
    assert(gs.catalog.list().exists { case (n, k) => n.endsWith("meter_mat") && k == "materialized_view" })
    gs.execute("DROP VIEW meter_by_key")
    assert(!gs.catalog.contains("meter_by_key"))
  }

  test("REFRESH MATERIALIZED VIEW re-materializes appends atomically and heals a crashed swap") {
    val gs = new GraftSession(spark, tmp())
    gs.publish("meter_r", sampleEvents(30))
    gs.execute("CREATE MATERIALIZED VIEW mr AS SELECT key, count(*) AS n FROM meter_r GROUP BY key")
    def counts() = gs.table("mr").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts() == Map("k0" -> 10L, "k1" -> 10L, "k2" -> 10L))
    // appends do NOT flow into the stale materialization ...
    gs.publish("meter_r", sampleEvents(6, startS = 1700100000L))
    assert(counts() == Map("k0" -> 10L, "k1" -> 10L, "k2" -> 10L), "MV must be stale before refresh")
    // ... until the refresh re-plans and swaps
    gs.execute("REFRESH MATERIALIZED VIEW mr")
    assert(counts() == Map("k0" -> 12L, "k1" -> 12L, "k2" -> 12L), "refresh must absorb the appends")
    // crash window: between the two renames — live dir missing, aside
    // is the only complete copy, a dead rewrite temp lies around
    val path = new java.io.File(
      gs.catalog.table("mr").inputFiles.head.stripPrefix("file:")).getParentFile
    val aside = new java.io.File(path.getParent, s".old_${path.getName}")
    val tmp2 = new java.io.File(path.getParent, s".refresh_${path.getName}")
    assert(path.renameTo(aside))
    tmp2.mkdirs()
    gs.publish("meter_r", sampleEvents(3, startS = 1700200000L))
    gs.refreshMaterializedView("mr")
    assert(counts() == Map("k0" -> 13L, "k1" -> 13L, "k2" -> 13L),
      "refresh must heal the interrupted swap and still absorb new appends")
    assert(!aside.exists && !tmp2.exists, "no swap debris may remain")
    // plain views re-plan per scan — refresh must refuse them
    gs.execute("CREATE VIEW mr_plain AS SELECT count(*) AS n FROM meter_r")
    intercept[IllegalArgumentException] { gs.refreshMaterializedView("mr_plain") }
  }

  test("view SQL with quotes/newlines survives a manifest reload byte-for-byte") {
    val root = tmp()
    val cat = new TopicCatalog(spark, root)
    sampleEvents(10).createOrReplaceTempView("esc_src")
    val sql = "SELECT key, count(*) AS n FROM esc_src\nWHERE key <> \"k9\" AND key != 'a\\\"b'\tGROUP BY key"
    cat.createView("v_esc", sql)
    val cat2 = new TopicCatalog(spark, root)
    assert(cat2.contains("v_esc"), "view lost on reload")
    assert(cat2.table("v_esc").count() == 3, "reloaded view SQL no longer runs")
  }

  test("transaction log replays after a 'crash' and checkpoint compacts it") {
    val root = tmp()
    val store = new TopicStore(spark, s"$root/topics")
    val cat = new TopicCatalog(spark, root)
    cat.createTopic("t_a", store)
    sampleEvents(5).createOrReplaceTempView("log_src")
    cat.createView("v_a", "SELECT key FROM log_src")
    cat.dropTable("t_a")
    // no checkpoint yet: state lives ONLY in the log (simulated crash
    // = a fresh instance that must recover from log replay)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/_graft_catalog.log")))
    val cat2 = new TopicCatalog(spark, root)
    assert(cat2.contains("v_a") && !cat2.contains("t_a"), "log replay must restore state")
    // checkpoint: snapshot written atomically, log truncated
    cat2.checkpoint()
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/_graft_catalog.log")))
    val cat3 = new TopicCatalog(spark, root)
    assert(cat3.contains("v_a") && !cat3.contains("t_a"), "snapshot must carry full state")
    // post-checkpoint mutations land in a fresh log tail
    cat3.createTopic("t_b", store)
    val cat4 = new TopicCatalog(spark, root)
    assert(cat4.contains("t_b") && cat4.contains("v_a"))
  }

  test("schema evolution: shards with added columns merge on read") {
    val store = new TopicStore(spark, tmp(), bucketMinutes = 60)
    store.append("evo", sampleEvents(10))
    store.append("evo", sampleEvents(10, startS = 1700100000L)
      .withColumn("quality", col("value") * 2))
    val merged = store.read("evo", mergeSchema = true)
    assert(merged.columns.contains("quality"))
    assert(merged.count() == 20)
    // old shards surface null for the new column; new shards carry it
    assert(merged.filter(col("quality").isNull).count() == 10)
    assert(merged.filter(col("quality").isNotNull).count() == 10)
  }

  test("shutdown compacts the tx log so a fresh session replays nothing") {
    val root = tmp()
    val gs = new GraftSession(spark, root)
    gs.publish("s_topic", sampleEvents(5))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/_graft_catalog.log")))
    gs.shutdown()
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/_graft_catalog.log")))
    val gs2 = new GraftSession(spark, root)
    assert(gs2.table("s_topic").count() == 5)
  }

  test("useCatalog/useSchema switch the resolution context") {
    val root = tmp()
    val store = new TopicStore(spark, s"$root/topics")
    val cat = new TopicCatalog(spark, root)
    cat.createTopic("a", store)
    assert(cat.resolve("a") == "ella.public.a")
    cat.useSchema("metrics")
    assert(cat.resolve("a") == "ella.metrics.a")
    cat.useCatalog("prod")
    assert(cat.resolve("a") == "prod.metrics.a")
    cat.createTopic("a", store) // distinct fqn — no conflict with ella.public.a
    assert(cat.contains("a") && cat.list().map(_._1).contains("prod.metrics.a"))
    // SQL route too (ella's use_catalog/use_schema as statements)
    val gs = new GraftSession(spark, tmp())
    gs.execute("USE CATALOG warehouse")
    gs.execute("USE SCHEMA raw")
    assert(gs.catalog.resolve("t") == "warehouse.raw.t")
  }

  test("temporary topics are queryable but never persisted") {
    val root = tmp()
    val gs = new GraftSession(spark, root)
    gs.createTempTopic("scratch", sampleEvents(15))
    assert(gs.table("scratch").count() == 15)
    assert(gs.query("SELECT count(*) AS n FROM scratch").collect().head.getLong(0) == 15)
    // not in the durable manifest: a fresh catalog over the same root
    // has never heard of it
    val cat2 = new TopicCatalog(spark, root)
    assert(!cat2.contains("scratch"), "temporary topic leaked into the manifest")
  }

  test("explicit createTopic: declared schema, ifNotExists, orReplace") {
    import org.apache.spark.sql.types._
    val gs = new GraftSession(spark, tmp())
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("time", TimestampType),
      StructField("key", StringType), StructField("value", DoubleType)))
    gs.createTopic("typed", schema)
    // declared schema visible before any publish
    assert(gs.table("typed").schema.fieldNames.toSeq == Seq("id", "time", "key", "value"))
    assert(gs.table("typed").count() == 0)
    intercept[IllegalStateException] { gs.createTopic("typed", schema) }
    gs.createTopic("typed", schema, ifNotExists = true) // no-op, no throw
    gs.createTopic("typed", schema, orReplace = true)
    assert(gs.table("typed").count() == 0)
  }

  test("execute() runs non-DDL statements without collecting to the driver") {
    val gs = new GraftSession(spark, tmp())
    gs.publish("wide", sampleEvents(1000))
    // would be a driver OOM at scale if this collected; noop sink keeps
    // execution fully distributed
    gs.execute("SELECT * FROM wide")
  }

  test("ingest lands CSV and JSON rows in the bucketed topic layout") {
    val gs = new GraftSession(spark, tmp())
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(s"$dir/rows.csv"),
      "id,time,key,value\n1,2023-11-14 22:13:20,k0,1.5\n2,2023-11-14 23:13:20,k1,2.5\n")
    Files.writeString(java.nio.file.Paths.get(s"$dir/rows.json"),
      """{"id":3,"time":"2023-11-15 00:13:20","key":"k2","value":3.5}""" + "\n" +
      """{"id":4,"time":"2023-11-15 01:13:20","key":"k0","value":4.5}""" + "\n")
    gs.ingest("mixed", s"$dir/rows.csv", "csv")
    gs.ingest("mixed", s"$dir/rows.json", "json")
    assert(gs.table("mixed").count() == 4)
    // both formats land in the SAME time-bucketed parquet topic:
    // bucket pruning works across them
    assert(gs.table("mixed").columns.contains("bucket"))
    assert(gs.query("SELECT count(*) AS n FROM mixed WHERE key = 'k0'")
      .collect().head.getLong(0) == 2)
  }

  test("typed Dataset API: events as Dataset[TopicEvent]") {
    val ds = Tables.eventsDs(spark, sfDir)
    val first = ds.filter((e: graft.streaming.TopicEvent) => e.value > 0).head()
    assert(first.event_id >= 0)
    assert(ds.count() == Tables.events(spark, sfDir).count())
  }

  test("subscribe streams rows published after the stream starts (time > now())") {
    val gs = new GraftSession(spark, tmp())
    gs.publish("live", sampleEvents(5))
    val q = gs.subscribe("live")
      .writeStream.format("memory").queryName("live_tail").outputMode("append").start()
    try {
      q.processAllAvailable()
      val before = spark.table("live_tail").count()
      assert(before == 5)
      // rows published while subscribed flow to the same stream
      gs.publish("live", sampleEvents(7, startS = 1700100000L))
      q.processAllAvailable()
      assert(spark.table("live_tail").count() == 12)
    } finally q.stop()
  }

  test("catalog/schema lifecycle: ifNotExists, non-empty guard, cascade, durability") {
    val root = tmp()
    val store = new TopicStore(spark, s"$root/topics")
    val cat = new TopicCatalog(spark, root)

    cat.createCatalog("lake")
    intercept[IllegalStateException](cat.createCatalog("lake"))
    cat.createCatalog("lake", ifNotExists = true) // no-op, like the reference
    cat.createSchema("lake.raw")
    intercept[IllegalStateException](cat.createSchema("lake.raw"))
    assert(cat.catalogs() == Seq("lake"))
    assert(cat.schemas("lake") == Seq("lake.raw"))

    // bare schema name resolves in the current catalog
    cat.useCatalog("lake")
    cat.createSchema("curated", ifNotExists = true)
    assert(cat.schemas("lake").toSet == Set("lake.raw", "lake.curated"))

    // a non-empty schema refuses to drop without cascade
    cat.useSchema("raw")
    cat.createTopic("t1", store)
    assert(cat.contains("lake.raw.t1"))
    intercept[IllegalStateException](cat.dropSchema("lake.raw"))
    assert(cat.dropSchema("lake.raw", cascade = true))
    assert(!cat.contains("lake.raw.t1"))

    // catalog-level cascade sweeps schemas AND their tables
    cat.createSchema("lake.again")
    intercept[IllegalStateException](cat.dropCatalog("lake"))
    assert(cat.dropCatalog("lake", cascade = true))
    assert(cat.catalogs().isEmpty)

    // missing + ifExists → false; missing otherwise → error
    assert(!cat.dropCatalog("ghost", ifExists = true))
    intercept[NoSuchElementException](cat.dropCatalog("ghost"))

    // namespaces survive a reload through the tx log
    cat.createCatalog("persisted")
    cat.createSchema("persisted.s1")
    val cat2 = new TopicCatalog(spark, root)
    assert(cat2.catalogs() == Seq("persisted"))
    assert(cat2.schemas("persisted") == Seq("persisted.s1"))
  }

  test("execute() routes catalog/schema DDL incl. CASCADE to the registry") {
    val gs = new GraftSession(spark, tmp())
    gs.execute("CREATE CATALOG lake")
    gs.execute("CREATE CATALOG IF NOT EXISTS lake")
    gs.execute("CREATE SCHEMA lake.raw")
    gs.execute("USE CATALOG lake")
    gs.execute("USE SCHEMA raw")
    gs.createTopic("t1")
    intercept[IllegalStateException](gs.execute("DROP SCHEMA lake.raw"))
    gs.execute("DROP SCHEMA lake.raw CASCADE")
    gs.execute("DROP CATALOG lake")
    gs.execute("DROP CATALOG IF EXISTS lake")
    intercept[NoSuchElementException](gs.execute("DROP CATALOG lake"))
  }

  test("information schema relations describe catalogs, tables, views, and columns via SQL") {
    import spark.implicits._
    val gs = new GraftSession(spark, tmp())
    gs.publish("events_t", sampleEvents(3))
    gs.execute("CREATE VIEW v_all AS SELECT * FROM events_t")
    gs.execute("CREATE MATERIALIZED VIEW mv_cnt AS SELECT count(*) AS n FROM events_t")
    gs.createTempTopic("scratch", Seq((1L, "x")).toDF("id", "s"))
    // table inventory with SQL-standard table_type, queryable as SQL
    val types = gs.query(
      "SELECT table_name, table_type FROM information_schema_tables ORDER BY table_name")
      .as[(String, String)].collect().toMap
    assert(types == Map(
      "events_t" -> "BASE TABLE", "v_all" -> "VIEW",
      "mv_cnt" -> "MATERIALIZED VIEW", "scratch" -> "TEMPORARY"), s"got $types")
    // columns carry ordinal positions, Spark SQL types, nullability —
    // and VIEW columns resolve through the view's own SQL
    val cols = gs.query(
      """SELECT column_name, ordinal_position, data_type FROM information_schema_columns
        |WHERE table_name = 'mv_cnt'""".stripMargin).collect()
    assert(cols.length == 1 && cols.head.getString(0) == "n" &&
      cols.head.getInt(1) == 1 && cols.head.getString(2) == "BIGINT", s"got ${cols.toSeq}")
    // namespace relations reflect the registry, joins work across relations
    gs.execute("CREATE CATALOG lake")
    gs.execute("CREATE SCHEMA lake.raw")
    val schemata = gs.query(
      "SELECT catalog_name, schema_name FROM information_schema_schemata ORDER BY 1, 2")
      .as[(String, String)].collect().toSeq
    assert(schemata.contains(("lake", "lake.raw")) &&
      schemata.exists(_._1 == "ella"), s"got $schemata")
    val joined = gs.query(
      """SELECT count(*) FROM information_schema_tables t
        |JOIN information_schema_columns c ON t.table_name = c.table_name
        |WHERE t.table_type = 'BASE TABLE'""".stripMargin).head().getLong(0)
    assert(joined == gs.table("events_t").schema.size,
      "every base-table column must appear exactly once")
    // unknown relation is a clear error
    intercept[IllegalArgumentException](gs.informationSchema("nope"))
  }

  test("snapshot tags pin a topic's state; reads stay stable across later writes and reloads") {
    import spark.implicits._
    val root = tmp()
    val gs = new GraftSession(spark, root)
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    // raw append-only pin
    gs.publish("feed", Seq((1L, t(1000), "a"), (2L, t(1500), "b")).toDF("id", "time", "v"))
    gs.tagSnapshot("feed", "feed_v1", asOfEpochS = 2000L)
    gs.publish("feed", Seq((3L, t(3000), "c")).toDF("id", "time", "v"))
    assert(gs.table("feed_v1").select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L),
      "the tag must not see rows appended after its cutoff")
    assert(gs.table("feed").count() == 3)
    // merged pin of an upsert topic: latest-per-key AT the cutoff
    gs.createTopic("kv")
    gs.store.upsert("ella.public.kv", Seq((1L, t(1000), "x")).toDF("key", "time", "v"), seq = Some(1L))
    gs.store.upsert("ella.public.kv", Seq((1L, t(1500), "y")).toDF("key", "time", "v"), seq = Some(2L))
    gs.tagSnapshot("kv", "kv_tuesday", asOfEpochS = 1200L, keyCol = Some("key"))
    gs.store.upsert("ella.public.kv", Seq((1L, t(3000), "z")).toDF("key", "time", "v"), seq = Some(3L))
    val pinned = gs.table("kv_tuesday").select("key", "v").as[(Long, String)].collect().toSeq
    assert(pinned == Seq((1L, "x")), s"merged pin must resolve the cutoff's winner: $pinned")
    // tags are durable catalog objects: SQL-visible type, survive reload
    val typ = gs.query(
      "SELECT table_type FROM information_schema_tables WHERE table_name = 'kv_tuesday'")
      .as[String].head()
    assert(typ == "SNAPSHOT TAG")
    val gs2 = new GraftSession(spark, root)
    assert(gs2.table("kv_tuesday").select("v").as[String].collect().toSeq == Seq("x"),
      "tags must survive a catalog reload")
    // SQL over the tag via query(); drop via standard DDL
    assert(gs2.query("SELECT count(*) FROM feed_v1").head().getLong(0) == 2L)
    gs2.execute("DROP TABLE feed_v1")
    assert(!gs2.catalog.contains("feed_v1"))
    // a tag must ground in a stored topic, never a view or another tag
    gs2.execute("CREATE VIEW v_feed AS SELECT * FROM feed")
    intercept[IllegalArgumentException](gs2.tagSnapshot("v_feed", "bad", 1000L))
    intercept[IllegalArgumentException](gs2.tagSnapshot("kv_tuesday", "bad", 1000L))
  }

  test("snapshot tags pin the write version: backdated later upserts cannot change a tag") {
    import spark.implicits._
    val gs = new GraftSession(spark, tmp())
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    gs.createTopic("kv")
    gs.store.upsert("ella.public.kv", Seq((1L, t(1000), "x")).toDF("key", "time", "v"), seq = Some(1L))
    gs.tagSnapshot("kv", "pin", asOfEpochS = 2000L, keyCol = Some("key"))
    // a later writer BACKDATES: ts under the cutoff, higher version
    gs.store.upsert("ella.public.kv", Seq((1L, t(900), "evil")).toDF("key", "time", "v"), seq = Some(9L))
    val pinned = gs.table("pin").select("key", "v").as[(Long, String)].collect().toSeq
    assert(pinned == Seq((1L, "x")),
      s"a backdated higher-_seq write must not win inside the pinned view: $pinned")
    // same guard on a RAW (un-merged) tag of an upsert topic: the
    // backdated version row must not appear at all
    gs.tagSnapshot("kv", "pin_raw", asOfEpochS = 2000L)
    gs.store.upsert("ella.public.kv", Seq((2L, t(800), "late")).toDF("key", "time", "v"), seq = Some(10L))
    val raw = gs.table("pin_raw").select("v").as[String].collect().sorted.toSeq
    assert(!raw.contains("late"), s"backdated row leaked into the raw pin: $raw")
    // the pin survives a reload (seqCutoff is durable in the manifest)
    val gs2 = new GraftSession(spark, gs.config("root"))
    assert(gs2.table("pin").select("v").as[String].collect().toSeq == Seq("x"))
    // an EMPTY as-of snapshot pins too: rows backdated under its
    // cutoff AFTER tag time must not appear (the pin falls back to
    // the topic's overall max _seq, or MinValue on an empty topic)
    gs.createTopic("kv2")
    gs.store.upsert("ella.public.kv2", Seq((1L, t(5000), "late")).toDF("key", "time", "v"), seq = Some(1L))
    gs.tagSnapshot("kv2", "empty_pin", asOfEpochS = 2000L, keyCol = Some("key"))
    assert(gs.table("empty_pin").count() == 0)
    gs.store.upsert("ella.public.kv2", Seq((2L, t(1500), "sneak")).toDF("key", "time", "v"), seq = Some(2L))
    assert(gs.table("empty_pin").count() == 0,
      "an empty snapshot must stay empty under backdated writes")
  }

  test("restoreToTag honors the write-version pin: backdated rows drop with the restore") {
    import spark.implicits._
    val gs = new GraftSession(spark, tmp())
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    gs.createTopic("kv")
    gs.store.upsert("ella.public.kv", Seq((1L, t(1000), "x")).toDF("key", "time", "v"), seq = Some(1L))
    gs.tagSnapshot("kv", "pin", asOfEpochS = 2000L, keyCol = Some("key"))
    // backdated under the cutoff with a higher version: invisible to
    // the tag — and restore must ALSO remove it, or the restored
    // topic diverges from the view the tag describes
    gs.store.upsert("ella.public.kv", Seq((1L, t(900), "evil")).toDF("key", "time", "v"), seq = Some(9L))
    val touched = gs.restoreToTag("pin")
    assert(touched.nonEmpty, "the backdated row's bucket must be rewritten")
    val merged = gs.store.readMerged("ella.public.kv", "key")
      .select("key", "v").as[(Long, String)].collect().toSeq
    assert(merged == Seq((1L, "x")),
      s"restore must reproduce the pinned view, got $merged")
    assert(gs.restoreToTag("pin").isEmpty, "second restore is a no-op")
  }

  test("retention never expires buckets a live snapshot tag pins") {
    import spark.implicits._
    val gs = new GraftSession(spark, tmp())
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    // buckets at 0, 3600, 90000: a 2h max-age from the newest would
    // expire both old buckets — but a tag pins the middle one
    gs.publish("sensor", Seq(
      (1L, t(1000), 1.0), (2L, t(4000), 2.0), (3L, t(90000), 3.0))
      .toDF("id", "time", "v"))
    gs.tagSnapshot("sensor", "keep_old", asOfEpochS = 4500L)
    gs.setRetention("sensor", maxAgeMinutes = 120L)
    gs.maintain()
    val ids = gs.table("sensor").select("id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L),
      s"tagged buckets must survive the sweep: $ids")
    assert(gs.table("keep_old").count() == 2)
    // drop the tag: the next sweep is free to expire the old buckets
    gs.execute("DROP TABLE keep_old")
    gs.maintain()
    val after = gs.table("sensor").select("id").as[Long].collect().sorted.toSeq
    assert(after == Seq(3L), s"untagged expired buckets must drop: $after")
  }

  test("restoreToTag resolves the registered topic path and refuses to break later pins") {
    import spark.implicits._
    val gs = new GraftSession(spark, tmp())
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    // a topic registered under a DIFFERENT root than the session store
    val otherStore = new TopicStore(spark, tmp() + "/topics")
    gs.catalog.createTopic("ext", otherStore)
    otherStore.append("ella.public.ext",
      Seq((1L, t(1000), "a"), (2L, t(9000), "b")).toDF("id", "time", "v"))
    gs.tagSnapshot("ext", "ext_pin", asOfEpochS = 4500L)
    val touched = gs.restoreToTag("ext_pin")
    assert(touched.nonEmpty, "restore must find the registered path, not no-op")
    assert(gs.table("ext").select("id").as[Long].collect().toSeq == Seq(1L),
      "the externally-rooted topic must actually be restored")
    // a LATER live tag blocks a destructive restore to an older one
    gs.publish("feed", Seq((1L, t(1000), "a"), (2L, t(9000), "b")).toDF("id", "time", "v"))
    gs.tagSnapshot("feed", "old_pin", asOfEpochS = 2000L)
    gs.tagSnapshot("feed", "new_pin", asOfEpochS = 10000L)
    val e = intercept[IllegalStateException](gs.restoreToTag("old_pin"))
    assert(e.getMessage.contains("new_pin"), e.getMessage)
    gs.execute("DROP TABLE new_pin")
    assert(gs.restoreToTag("old_pin").nonEmpty, "restore proceeds once the later pin is gone")
  }

  test("GraftSession.changes resolves catalog refs to the store-level CDC diff") {
    import spark.implicits._
    val gs = new GraftSession(spark, tmp())
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    gs.createTopic("kv")
    gs.store.upsert("ella.public.kv",
      Seq((1L, t(1000), "a")).toDF("key", "time", "v"), seq = Some(1L))
    gs.store.upsert("ella.public.kv",
      Seq((1L, t(2000), "a2"), (2L, t(2000), "b")).toDF("key", "time", "v"), seq = Some(2L))
    // bare name resolves through the session's catalog context
    val got = gs.changes("kv", "key", 1500L, 3000L)
      .select("key", "v", "_change_type").as[(Long, String, String)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "a2", "update"), (2L, "b", "insert")), s"got $got")
  }

  test("restoreToTag rewrites the topic back to the pinned state, O(after-cutoff buckets)") {
    import spark.implicits._
    val gs = new GraftSession(spark, tmp())
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    // bucketMinutes=60 => bucket size 3600s; craft three buckets with
    // the cutoff INSIDE the middle one so restore must do a partial
    // boundary rewrite, not just directory drops
    gs.publish("feed", Seq(
      (1L, t(1000), "a"),            // bucket 0 — untouched
      (2L, t(4000), "b"),            // bucket 3600, before cutoff — kept
      (3L, t(5000), "c"),            // bucket 3600, after cutoff — cut
      (4L, t(9000), "d")).toDF("id", "time", "v")) // bucket 7200 — dropped whole
    gs.tagSnapshot("feed", "good_state", asOfEpochS = 4500L)
    val touched = gs.restoreToTag("good_state")
    assert(touched.sorted == Seq(3600L, 7200L), s"got $touched")
    val after = gs.table("feed").select("id").as[Long].collect().sorted.toSeq
    assert(after == Seq(1L, 2L), s"restore must keep exactly the pinned rows: $after")
    // the tag still describes the (now current) state; restore is idempotent
    assert(gs.table("good_state").count() == 2)
    assert(gs.restoreToTag("good_state").isEmpty, "nothing after the cutoff remains")
    // the untouched bucket 0 was never rewritten (its dir survived intact)
    intercept[NoSuchElementException](gs.restoreToTag("no_such_tag"))
  }

  test("restoreAsOf equals the pre-restore as-of view on a randomized history") {
    import spark.implicits._
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map(i =>
      (i.toLong, t(1000L + rnd.nextInt(20000)), s"v$i"))
    for (cut <- Seq(1000L, 7321L, 15000L, 25000L)) {
      val dir = java.nio.file.Files.createTempDirectory("graft_restore_eq").toString
      val store2 = new TopicStore(spark, dir, bucketMinutes = 60)
      store2.append("h", rows.toDF("id", "time", "v"))
      val expected = store2.readAsOf("h", cut)
        .select("id").as[Long].collect().sorted.toSeq
      store2.restoreAsOf("h", cut)
      val got =
        if (store2.read("h").isEmpty) Seq.empty
        else store2.read("h").select("id").as[Long].collect().sorted.toSeq
      assert(got == expected, s"cutoff $cut: restore must equal the as-of view")
    }
  }

  test("topic_policies relation exposes per-topic lifecycle config via SQL") {
    import spark.implicits._
    val gs = new GraftSession(spark, tmp())
    gs.publish("plain", sampleEvents(3))
    gs.publish("tuned", sampleEvents(3))
    gs.setCompaction("tuned", everyAppends = 5, maxFilesPerBucket = 2,
      clusterBy = Seq("key", "time"), zorder = true)
    gs.setWriteConfig("tuned", maxRowsPerFile = 1000L, coalesce = 2, triggerMs = 500L)
    gs.setRetention("tuned", maxAgeMinutes = 120, downsampleTo = "tuned_1h",
      valueCol = "value", keyCols = Seq("key"))
    val rows = gs.query(
      """SELECT table_name, compaction_every_appends, cluster_by, zorder,
        |       write_max_rows_per_file, retention_max_age_minutes,
        |       retention_downsample_to
        |FROM information_schema_topic_policies ORDER BY table_name""".stripMargin)
      .collect()
    val byName = rows.map(r => r.getString(0) -> r).toMap
    // unset policies surface as nulls, not absence — the row still lists
    val plain = byName("plain")
    assert(plain.isNullAt(1) && plain.isNullAt(5), s"plain must be null-padded: $plain")
    val tuned = byName("tuned")
    assert(tuned.getInt(1) == 5 && tuned.getString(2) == "key,time" &&
      tuned.getBoolean(3) && tuned.getLong(4) == 1000L &&
      tuned.getLong(5) == 120L && tuned.getString(6) == "tuned_1h", s"got $tuned")
    // an operator's audit query: which topics z-order?
    val z = gs.query(
      "SELECT table_name FROM information_schema_topic_policies WHERE zorder")
      .as[String].collect().toSeq
    assert(z == Seq("tuned"), s"got $z")
  }
}
