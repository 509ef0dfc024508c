package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Bucketed co-located joins: writing both sides bucketed on the join
  * key lets repeated joins skip the shuffle entirely — at 100 TB this
  * turns every fact-fact key-join after ingest into a local zip
  * (SURVEY.md §4). Verified by asserting the join plan has NO
  * shuffle exchange on either side.
  */
class BucketedSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    // tables land in the default ./spark-warehouse (gitignored)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")

    Tables(spark, sfDir, "orders")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables(spark, sfDir, "customer")
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")

    // disable broadcast so the co-location is what avoids the shuffle
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_customer")
        .join(spark.table("b_orders"), col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_custkey")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle either side:\n$plan")
      // results still correct vs the unbucketed join
      val expected = Tables(spark, sfDir, "customer")
        .join(Tables(spark, sfDir, "orders"), col("c_custkey") === col("o_custkey"))
        .count()
      assert(joined.agg(sum("n")).collect().head.getLong(0) == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
