package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver-generated TPC-H-ish testdata.
  *
  * Mirrors the reference's catalog scan entry point
  * (ella-engine/src/table.rs, ella/src/ella.rs:105 `table()`): a table
  * ref resolves to a parquet-backed relation. Here the scan is a plain
  * Spark parquet source so Catalyst handles column pruning + predicate
  * pushdown + partition pruning for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Widen a scan ONLY when it arrives under-parallelized.
    *
    * The local testdata is one small parquet file per table → a 1-ish
    * partition scan that would serialize every downstream stage on
    * local[32]. But an unconditional `repartition()` baked into an
    * operator is an extra full shuffle of the corpus at cluster scale,
    * where the scan already has thousands of splits. So: shuffle only
    * if the planned scan has fewer partitions than the session's
    * default parallelism (at 100 TB this is never true → no-op), and
    * allow opting out entirely with `graft.autoSpread=false`.
    *
    * The `df.rdd.getNumPartitions` probe forces an extra physical
    * planning of the frame, so its verdict is memoized per (session,
    * canonicalized scan): each table pays the probe once per session,
    * and every later `spread` on the same scan is plan-free. The
    * verdict is deliberately NOT invalidated when the table grows
    * mid-session — probe-once-per-session is the point; a session
    * watching a growing topic re-opens to re-probe (and at cluster
    * scale the verdict is always "no repartition" anyway).
    */
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val auto = spark.conf.getOption("graft.autoSpread").forall(_.toBoolean)
    if (!auto) df
    else {
      val target = spark.sparkContext.defaultParallelism
      // Key: a session tag (a conf string — never pins the
      // SparkSession object in this process-wide map) + the FULL
      // canonicalized plan text
      // (expression ids normalized, so every fresh read of the same
      // parquet path keys to the same decision; a 32-bit semanticHash
      // alone could collide two different scans into one verdict).
      val tag = spark.conf.getOption("graft.sessionTag").getOrElse {
        val t = java.util.UUID.randomUUID().toString
        spark.conf.set("graft.sessionTag", t); t
      }
      val key = tag + " " + df.queryExecution.analyzed.canonicalized.toString
      // LRU-bounded: overflow drops only the least-recently-USED
      // verdicts (a clear() here would wipe every other session's
      // entries and re-trigger their probes in a shared driver)
      val needs = spreadDecision.synchronized {
        Option(spreadDecision.get(key)).getOrElse {
          val v = java.lang.Boolean.valueOf(df.rdd.getNumPartitions < target)
          spreadDecision.put(key, v); v
        }
      }
      if (needs) df.repartition(target) else df
    }
  }

  // access-order LinkedHashMap: get() refreshes recency, eldest falls
  // out past 4096 entries; all access under its own monitor
  private val spreadDecision =
    new java.util.LinkedHashMap[String, java.lang.Boolean](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, java.lang.Boolean]): Boolean = size() > 4096
    }

  private[graft] def spreadProbeCount: Int =
    spreadDecision.synchronized(spreadDecision.size())

  /** `events` with its parquet `ts` column exposed as a standard Spark
    * TimestampType (microseconds), whatever physical form the file uses.
    *
    * The testdata generator has shipped `ts` as TIMESTAMP(NANOS)
    * (readable only as raw int64 via the legacy conf), as TIMESTAMP_NTZ
    * (micros, no UTC flag), and as plain TIMESTAMP — so this loader
    * dispatches on the decoded type instead of assuming one. All
    * sessions run with spark.sql.session.timeZone=UTC, so the NTZ→LTZ
    * cast is value-preserving and matches DuckDB's naive `epoch_us(ts)`
    * reading of the same file. Ella stores times as i64 nanos
    * (ella-common time types); truncation to micros is the same floor
    * DuckDB applies, so oracle comparisons line up exactly.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }

  /** Typed event rows — ella's typed row streams (`Lazy::rows[R]`,
    * ella-engine/src/lazy.rs:42-44) map to `Dataset[T]` with a
    * case-class Encoder: compile-time column safety, same plan. */
  def eventsDs(spark: SparkSession, dir: String): org.apache.spark.sql.Dataset[graft.streaming.TopicEvent] = {
    import spark.implicits._
    events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[graft.streaming.TopicEvent]
  }
}
