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
}
