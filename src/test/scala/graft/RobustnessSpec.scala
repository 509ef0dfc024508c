package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Every operator must be TOTAL on degenerate-but-legal inputs.
  *
  * At 100 TB these are not corner cases: a fresh topic, a feed
  * partition that produced nothing today, a corpus shard with null
  * text (failed extraction) or null embeddings (failed encoder call).
  * A query that throws there — null from a scalar subquery over no
  * rows, min/max of nothing feeding a sequence(), a hand-rolled
  * kernel reading a null array — takes the whole pipeline down
  * instead of producing the degraded report it should. Built-in
  * expressions get null-safety from Catalyst for free; the places
  * that bypass it (typed Aggregators, mapPartitions batch decode)
  * are exactly what this spec guards.
  */
class RobustnessSpec extends SparkSpec {

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private def runAll(dir: String): Seq[String] =
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      try { q(spark, dir).collect(); None }
      catch { case e: Exception =>
        Some(s"$name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(120)}") }
    }

  test("all queries complete on empty tables (schema preserved, zero rows)") {
    val dir = Files.createTempDirectory("graft_sf_empty").toString
    // events.ts is TIMESTAMP(NANOS) — readable only as raw int64
    // (the same conf Tables.events sets); the empty copy then carries
    // plain INT64, which Tables.events consumes identically.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tables.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val failures = runAll(dir)
    assert(failures.isEmpty,
      s"queries must be total on empty input:\n${failures.mkString("\n")}")
  }

  test("all queries complete with null text and null embeddings injected") {
    val dir = Files.createTempDirectory("graft_sf_nulls").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tables.foreach { t =>
      val raw = spark.read.parquet(s"$sfDir/$t.parquet")
      val df = t match {
        case "documents" => raw.withColumn("text",
          when(col("doc_id") % 7 === 0, lit(null: String)).otherwise(col("text")))
        case "embeddings" => raw.withColumn("embedding",
          when(col("vec_id") % 7 === 0, lit(null).cast("array<float>"))
            .otherwise(col("embedding")))
        case _ => raw
      }
      df.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val failures = runAll(dir)
    assert(failures.isEmpty,
      s"queries must be total under null text/embeddings:\n${failures.mkString("\n")}")
  }
}
