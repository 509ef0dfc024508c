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
class TopicStore(spark: SparkSession, root: String, bucketMinutes: Int = 60) {
  private val bucketSeconds = bucketMinutes * 60L

  def topicPath(name: String): String = s"$root/$name"

  /** Append rows; `tsCol` must be a TimestampType column. */
  def append(name: String, df: DataFrame, tsCol: String = "time"): Unit = {
    df.withColumn("bucket", (col(tsCol).cast("long") / bucketSeconds).cast("long") * bucketSeconds)
      .write.mode(SaveMode.Append)
      .partitionBy("bucket")
      .parquet(topicPath(name))
  }

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

  /** Rewrite buckets holding more than `maxFilesPerBucket` parquet
    * files into a single file each (small-file compaction). Sealed
    * compact buckets are left untouched. Returns compacted buckets. */
  def compact(name: String, maxFilesPerBucket: Int = 4): Seq[Long] = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = new Path(topicPath(name))
    if (!fs.exists(base)) return Seq.empty
    val buckets = fs.listStatus(base).filter(_.isDirectory)
      .filter(_.getPath.getName.startsWith("bucket="))
    val compacted = buckets.filter { b =>
      fs.listStatus(b.getPath).count(f => f.getPath.getName.endsWith(".parquet")) > maxFilesPerBucket
    }
    compacted.foreach { b =>
      val dir = b.getPath
      val tmp = new Path(dir.getParent, s".compact_${dir.getName}")
      spark.read.parquet(dir.toString).coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      fs.delete(dir, true)
      fs.rename(tmp, dir)
    }
    compacted.map(_.getPath.getName.stripPrefix("bucket=").toLong).toSeq
  }
}
