package graft

import graft.functions.GroupPrefix
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GroupPrefix must agree EXACTLY with the naive one-task-per-group
  * window on every input — same positions, same exclusive prefix
  * sums — while never planning that window. Deterministic
  * pseudo-random inputs at several shapes (more groups than
  * partitions, fewer, skewed, single-row groups) guard the offset
  * bookkeeping. */
class GroupPrefixSpec extends SparkSpec {

  private def refImpl(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy(col("g")).orderBy(col("h"), col("id"))
    df.withColumn("ref_rn", row_number().over(w))
      .withColumn("ref_cum0",
        coalesce(sum(col("v")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
  }

  private def mkDf(n: Int, groups: Int, seed: Int) = {
    import spark.implicits._
    // deterministic LCG so the spec never flakes
    var x = seed.toLong
    def next(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L); x >>> 16 }
    (1 to n).map { i =>
      (s"g${math.floorMod(next(), groups)}", f"h${math.floorMod(next(), 1000)}%03d-$i", i.toLong, math.floorMod(next(), 50))
    }.toDF("g", "h", "id", "v")
  }

  test("groupPrefix matches the naive window on varied shapes") {
    Seq(
      (500, 3, 1),    // few fat groups (the skew case the rewrite exists for)
      (500, 64, 2),   // more groups than partitions
      (40, 40, 3),    // all singleton groups
      (1, 1, 4)       // one row
    ).foreach { case (n, groups, seed) =>
      val df = mkDf(n, groups, seed)
      val got = GroupPrefix.groupPrefix(df, "g", Seq("h", "id"), Some("v"))
      val joined = got.join(refImpl(df).select(col("g"), col("id"),
        col("ref_rn"), col("ref_cum0")), Seq("g", "id"))
      val bad = joined.filter(col("rn") =!= col("ref_rn") ||
        col("cum0") =!= col("ref_cum0"))
      assert(got.count() == n, s"shape ($n,$groups): row count must be preserved")
      assert(bad.count() == 0,
        s"shape ($n,$groups): mismatches:\n${bad.limit(5).collect().mkString("\n")}")
    }
  }

  test("groupPrefix without a value column emits positions only") {
    val df = mkDf(200, 5, 7)
    val got = GroupPrefix.groupPrefix(df, "g", Seq("h", "id"))
    assert(!got.columns.contains("cum0"))
    val bad = got.join(refImpl(df).select(col("g"), col("id"), col("ref_rn")), Seq("g", "id"))
      .filter(col("rn") =!= col("ref_rn"))
    assert(bad.count() == 0)
  }

  test("positions are LONG and the internal cache is released via onCache") {
    // int positions wrap negative past ~2.1B rows per group — exactly
    // the regime the two-phase form exists for — so rn must be long
    val df = mkDf(50, 2, 3)
    var cached: Option[org.apache.spark.sql.DataFrame] = None
    val got = GroupPrefix.groupPrefix(df, "g", Seq("h", "id"), Some("v"),
      onCache = Some(c => cached = Some(c)))
    assert(got.schema("rn").dataType == org.apache.spark.sql.types.LongType,
      s"rn must be long, got ${got.schema("rn").dataType}")
    assert(got.schema("cum0").dataType == org.apache.spark.sql.types.LongType)
    got.count()
    assert(cached.isDefined, "onCache must receive the internal persisted frame")
    assert(cached.get.storageLevel.useMemory, "frame should be persisted after use")
    cached.get.unpersist(blocking = true)
    assert(!cached.get.storageLevel.useMemory, "caller can release the cache")
  }

  test("one-shot path leaves no CacheManager entry (no session-lifetime leak)") {
    // the ADVICE-flagged leak: default-path callers (api verbs, q23,
    // tx14) used CacheManager persist and never unpersisted — each
    // invocation pinned one disk-backed corpus slice for the session
    // lifetime. The default path now localCheckpoints (ContextCleaner
    // reclaims blocks on GC), so the cache registry must stay empty.
    spark.catalog.clearCache()
    val df = mkDf(100, 3, 5)
    val got = GroupPrefix.groupPrefix(df, "g", Seq("h", "id"), Some("v"))
    assert(got.count() == 100)
    assert(spark.sharedState.cacheManager.isEmpty,
      "default groupPrefix must not register a session-lifetime cache entry")
    // and the result is still consistent across a SECOND action on the
    // same frame (the materialization barrier must hold for re-use)
    val bad = got.join(refImpl(df).select(col("g"), col("id"), col("ref_rn"), col("ref_cum0")),
      Seq("g", "id"))
      .filter(col("rn") =!= col("ref_rn") || col("cum0") =!= col("ref_cum0"))
    assert(bad.count() == 0)
  }

  test("groupPrefix never plans a whole-group window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow, Aggregate}
    val got = GroupPrefix.groupPrefix(mkDf(100, 2, 9), "g", Seq("h", "id"), Some("v"))
    val offenders = got.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.size < 2 &&
        w.child.collectFirst { case _: Aggregate => true }.isEmpty => w
    }
    assert(offenders.isEmpty, s"whole-group window leaked: $offenders")
  }
}
