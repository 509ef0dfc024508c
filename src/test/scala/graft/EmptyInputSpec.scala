package graft

import java.nio.file.Files

/** Every operator must be TOTAL on schema-only (zero-row) inputs.
  *
  * At 100 TB this is not a corner case: a fresh topic, a partition of
  * a feed that produced nothing today, or a filter that eliminated a
  * whole source all hand an operator an empty frame with the full
  * schema. A query that throws there (null from a scalar subquery
  * over no rows, min/max of nothing feeding a sequence(), an argmin
  * fold over zero centroids) takes the whole pipeline down instead of
  * producing the empty report it should.
  *
  * The fixture round-trips each table through Spark (`limit 0` +
  * parquet write) so the empty files carry exactly the Spark-level
  * schema the operators see in production.
  */
class EmptyInputSpec extends SparkSpec {

  test("all queries complete on empty tables (schema preserved, zero rows)") {
    val dir = Files.createTempDirectory("graft_sf_empty").toString
    // events.ts is TIMESTAMP(NANOS) — readable only as raw int64
    // (the same conf Tables.events sets); the empty copy then carries
    // plain INT64, which Tables.events consumes identically.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      try { q(spark, dir).collect(); None }
      catch { case e: Exception => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty,
      s"queries must be total on empty input:\n${failures.mkString("\n")}")
  }
}
