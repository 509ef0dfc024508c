package graft

import org.apache.spark.sql.functions._

/** Smoke + invariant checks for every SparkEntry query at sf0.001.
  * (Deep correctness is the DuckDB oracle gate; these are fast local
  * invariants per operator.) */
class QueriesSpec extends SparkSpec {

  test("every registered query runs and most return rows") {
    val empties = Seq("dd04_ngram_jaccard", "dd05_embed_neardup") // thresholded pair queries may be empty at sf0.001
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      if (!empties.contains(name))
        assert(n > 0, s"$name returned no rows")
    }
  }

  test("every query has an oracle or is explicitly rows-only") {
    val rowsOnly = Set.empty[String]
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q01 aggregates match direct computation") {
    val row = SparkEntry.queries("q01_agg")(spark, sfDir)
      .filter(col("l_returnflag") === "A" && col("l_linestatus") === "F")
      .collect().head
    val li = Tables(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00"))
        && col("l_returnflag") === "A" && col("l_linestatus") === "F")
    assert(row.getAs[Long]("count_order") == li.count())
  }

  test("ss01 top match is the query vector itself with cosine ~ 1") {
    val top = SparkEntry.queries("ss01_brute_topk")(spark, sfDir).collect().head
    assert(top.getAs[Long]("vec_id") == 7L)
    assert(math.abs(top.getAs[Double]("cos_sim") - 1.0) < 1e-9)
  }

  test("dd01 groups cover all documents") {
    val total = SparkEntry.queries("dd01_exact")(spark, sfDir)
      .agg(sum(col("n"))).collect().head.getLong(0)
    assert(total == Tables(spark, sfDir, "documents").count())
  }

  test("ts02 returns one row per user") {
    val df = SparkEntry.queries("ts02_latest_by_key")(spark, sfDir)
    assert(df.count() == df.select("user_id").distinct().count())
  }

  test("ts05 session event counts sum to total events") {
    val total = SparkEntry.queries("ts05_session")(spark, sfDir)
      .agg(sum(col("n_events"))).collect().head.getLong(0)
    assert(total == Tables.events(spark, sfDir).count())
  }

  test("ts07 gap-fill spine is dense per event_type") {
    val df = SparkEntry.queries("ts07_gap_fill")(spark, sfDir)
    val perType = df.groupBy("event_type").count().select("count").distinct().collect()
    assert(perType.length == 1, "all event types must share the same dense spine")
  }

  test("v02 l2 norm is consistent with vsum bounds") {
    val bad = SparkEntry.queries("v02_reduce")(spark, sfDir)
      .filter(col("l2") < 0 || col("vmin") > col("vmax")).count()
    assert(bad == 0)
  }

  test("mm01 metadata is deterministic and complete") {
    val df = SparkEntry.queries("mm01_binary_meta")(spark, sfDir)
    assert(df.count() == Tables(spark, sfDir, "documents").count())
    assert(df.filter(col("width") < 64 || col("width") > 304).count() == 0)
    assert(df.filter(!col("format").isin("png", "jpeg")).count() == 0)
  }
}
