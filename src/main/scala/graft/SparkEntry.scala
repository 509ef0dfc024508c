package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Aggregates every operator module's query + oracle registry.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.defs ++ TimeSeries.defs ++ TextOps.defs ++ VectorOps.defs ++ Similarity.defs ++ Dedup.defs ++ Multimodal.defs ++ Pipeline.defs ++ Curation.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ TimeSeries.oracle ++ TextOps.oracle ++ VectorOps.oracle ++ Similarity.oracle ++ Dedup.oracle ++ Multimodal.oracle ++ Pipeline.oracle ++ Curation.oracle
}
