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
}
