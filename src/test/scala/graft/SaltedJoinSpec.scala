package graft

import org.apache.spark.sql.functions._

/** Skew mitigation by key salting: the hot key's rows are split across
  * SALT sub-keys and the small side is replicated SALT times, so no
  * single task owns the whole hot key (SURVEY.md §4; complements AQE's
  * runtime skew-join split, which only kicks in past size thresholds).
  */
class SaltedJoinSpec extends SparkSpec {
  private val SALT = 8

  test("salted join equals plain join on skewed keys") {
    import spark.implicits._
    // skewed fact: 90% of rows share key 1
    val fact = (1 to 2000).map(i => (if (i <= 1800) 1L else (i % 50).toLong, i.toLong))
      .toDF("k", "payload")
    val dim = (0L to 49L).map(k => (k, s"dim_$k")).toDF("dk", "name")

    val plain = fact.join(dim, col("k") === col("dk"))
      .groupBy(col("name")).agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))

    val saltedFact = fact.withColumn("salt", (rand(seed = 7) * SALT).cast("int"))
    val saltedDim = dim.crossJoin(spark.range(SALT).toDF("salt"))
    val salted = saltedFact
      .join(saltedDim, col("k") === col("dk") && saltedFact("salt") === saltedDim("salt"))
      .groupBy(col("name")).agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))

    val a = plain.orderBy("name").collect().toSeq
    val b = salted.orderBy("name").collect().toSeq
    assert(a == b, "salting must not change join results")
    // the salted fact spreads the hot key across SALT distinct sub-keys
    val spread = saltedFact.filter(col("k") === 1).select("salt").distinct().count()
    assert(spread == SALT, s"hot key should span all $SALT salts, got $spread")
  }

  test("salting measurably collapses the max-task shuffle share") {
    import spark.implicits._
    // AQE's runtime skew split would mask the comparison, and a
    // broadcast of the small dim would remove the shuffle entirely —
    // disable both: this test measures the salting technique itself
    // on a genuine shuffle join (at 100 TB both sides are big)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val fact = (1 to 20000).map(i => (if (i <= 19000) 1L else (i % 50).toLong, i.toLong))
        .toDF("k", "payload")
      val dim = (0L to 49L).map(k => (k, s"dim_$k")).toDF("dk", "name")
      val (_, mPlain) = Metrics.measure(spark) {
        fact.join(dim, col("k") === col("dk"))
          .write.format("noop").mode("overwrite").save()
      }
      val saltedFact = fact.withColumn("salt", (rand(seed = 7) * SALT).cast("int"))
      val saltedDim = dim.crossJoin(spark.range(SALT).toDF("salt"))
      val (_, mSalted) = Metrics.measure(spark) {
        saltedFact
          .join(saltedDim, col("k") === col("dk") && saltedFact("salt") === saltedDim("salt"))
          .write.format("noop").mode("overwrite").save()
      }
      // 95% of rows share one key: unsalted, one task reads ~950/1000
      // of the shuffle; salted across 8 sub-keys it must drop hard
      assert(mPlain.shuffleSkewMilli > 700,
        s"unsalted hot key must dominate one task: ${mPlain.shuffleSkewMilli} milli")
      assert(mSalted.shuffleSkewMilli < mPlain.shuffleSkewMilli / 2,
        s"salting must at least halve the max-task share: " +
          s"${mSalted.shuffleSkewMilli} vs ${mPlain.shuffleSkewMilli} milli")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
