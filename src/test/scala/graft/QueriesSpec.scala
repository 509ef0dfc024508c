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
    // dd11/dd13: sketch internals (HLL++/DataSketches) are
    // engine-specific, so no DuckDB-exact oracle by design; their
    // estimates are calibrated against exact dd10 in the "hll overlap
    // estimates" test below. (q26 graduated to a full oracle: its
    // output is exact counts + within-tolerance gates, portable
    // across engines.)
    val rowsOnly = Set("dd11_hll_overlap", "dd13_theta_overlap")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("hll overlap estimates calibrate against the exact overlap matrix at sf0.01") {
    // dd11's sketch estimates must track dd10's exact counts at a
    // scale where the sketches actually estimate (sf0.01: ~47k
    // distinct shingles/source). Per-source cardinalities within 10%
    // (lgK=14 RSE is ~0.8%, so this is loose); the intersection is an
    // inclusion-exclusion DIFFERENCE, so its error scales with the
    // UNION size (three ~0.8%-RSE estimates), not with the
    // intersection itself — bound it by max(10% of exact, 2% of
    // union, 5 absolute).
    val d = "/root/testdata/sf0.01"
    val exact = SparkEntry.queries("dd10_source_overlap")(spark, d)
      .select("source_a", "source_b", "n_shared", "n_a", "n_b").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val est = SparkEntry.queries("dd11_hll_overlap")(spark, d)
      .select("source_a", "source_b", "est_shared", "est_a", "est_b").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(est.keySet == exact.keySet, "pair sets must agree")
    est.foreach { case (pair, (eShared, eA, eB)) =>
      val (xShared, xA, xB) = exact(pair)
      assert(math.abs(eA - xA) <= xA / 10, s"$pair: |A| est $eA vs exact $xA")
      assert(math.abs(eB - xB) <= xB / 10, s"$pair: |B| est $eB vs exact $xB")
      val union = xA + xB - xShared
      val tol = math.max(xShared * 0.10, math.max(union * 0.02, 5.0))
      assert(math.abs(eShared - xShared) <= tol,
        s"$pair: est $eShared vs exact $xShared (tol $tol)")
    }
  }

  test("theta overlap estimates calibrate against the exact matrix at sf0.01") {
    // dd13's direct theta intersections should track dd10 at least as
    // well as dd11's inclusion-exclusion; same tolerance form.
    val d = "/root/testdata/sf0.01"
    val exact = SparkEntry.queries("dd10_source_overlap")(spark, d)
      .select("source_a", "source_b", "n_shared", "n_a", "n_b").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val est = SparkEntry.queries("dd13_theta_overlap")(spark, d)
      .select("source_a", "source_b", "est_shared", "est_a", "est_b").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(est.keySet == exact.keySet, "pair sets must agree")
    est.foreach { case (pair, (eShared, eA, eB)) =>
      val (xShared, xA, xB) = exact(pair)
      assert(math.abs(eA - xA) <= xA / 10, s"$pair: |A| est $eA vs exact $xA")
      assert(math.abs(eB - xB) <= xB / 10, s"$pair: |B| est $eB vs exact $xB")
      val union = xA + xB - xShared
      val tol = math.max(xShared * 0.10, math.max(union * 0.02, 5.0))
      assert(math.abs(eShared - xShared) <= tol,
        s"$pair: est $eShared vs exact $xShared (tol $tol)")
    }
  }

  test("approx sketches calibrate against exact distincts and percentiles at sf0.01") {
    // q26's output IS the calibration now: per-group exact counts plus
    // within-5% gate booleans each engine computes over its own
    // sketches. At sf0.01 every gate must read true (HLL++ rsd 5% on
    // multi-thousand cardinalities lands ~1-2%; approx_percentile at
    // accuracy 10000 is rank-exact to n/10000), and the exact columns
    // must agree with an independent recompute.
    val d = "/root/testdata/sf0.01"
    val est = SparkEntry.queries("q26_approx_sketch")(spark, d)
      .collect().map(r => r.getString(0) -> r).toMap
    val li = Tables(spark, d, "lineitem")
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("x_orders"),
        countDistinct(col("l_partkey")).as("x_parts"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (flag, x) =>
      val e = est(flag)
      assert(e.getAs[Long]("exact_orders") == x.getAs[Long]("x_orders"))
      assert(e.getAs[Long]("exact_parts") == x.getAs[Long]("x_parts"))
      Seq("orders_within_5pct", "parts_within_5pct",
        "p25_within_5pct", "p50_within_5pct", "p75_within_5pct").foreach { g =>
        assert(e.getAs[Boolean](g), s"$flag: sketch gate $g out of tolerance")
      }
    }
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

  test("q25 statuses list is sorted and non-empty") {
    SparkEntry.queries("q25_string_agg")(spark, sfDir).collect().foreach { r =>
      val st = r.getAs[String]("statuses").split(",").toSeq
      assert(st.nonEmpty && st == st.sorted && st == st.distinct)
    }
  }

  test("ts14 interpolation: observed buckets keep their close value, interior gaps are filled") {
    val df = SparkEntry.queries("ts14_interpolate")(spark, sfDir).cache()
    assert(df.filter(!col("is_gap") && col("lerp_c").isNull).count() == 0)
    // a gap bucket between two observations must be interpolated
    val interior = df.filter(col("is_gap") && col("lerp_c").isNotNull)
    assert(interior.count() > 0, "expected at least one interpolated interior gap")
    df.unpersist()
  }

  test("v15 matmul: 64 cells per pair and spot-checked against manual dot") {
    val df = SparkEntry.queries("v15_matmul")(spark, sfDir).cache()
    val perPair = df.groupBy("vec_id").count().select("count").distinct().collect()
    assert(perPair.map(_.getLong(0)).toSeq == Seq(64L))
    val pair = df.filter(col("vec_id") === 0 && col("i") === 1 && col("j") === 1).collect().head
    val rows = Tables(spark, sfDir, "embeddings").filter(col("vec_id").isin(0, 1))
      .orderBy("vec_id").collect()
    val ea = rows(0).getAs[scala.collection.Seq[Float]]("embedding")
    val eb = rows(1).getAs[scala.collection.Seq[Float]]("embedding")
    val expected = (1 to 8).foldLeft(0.0)((acc, k) =>
      acc + ea(k - 1).toDouble * eb((k - 1) * 8).toDouble)
    assert(pair.getAs[Double]("c_ij") == expected)
    df.unpersist()
  }

  test("sp03 packing conserves tokens and pack ids start at 0") {
    val df = SparkEntry.queries("sp03_pack_sequences")(spark, sfDir).cache()
    assert(df.filter(col("pack_id") < 0).count() == 0)
    assert(df.groupBy("source").agg(min(col("pack_id")).as("m"))
      .filter(col("m") =!= 0).count() == 0)
    val packed = df.agg(sum(col("pack_tokens"))).collect().head.getLong(0)
    val total = Tables(spark, sfDir, "documents")
      .agg(sum(size(split(col("text"), " ")).cast("long"))).collect().head.getLong(0)
    assert(packed == total, "packing must conserve every token")
    df.unpersist()
  }

  test("px02 selected tokens stay within budget plus one overshoot doc") {
    SparkEntry.queries("px02_mixture_budget")(spark, sfDir).collect().foreach { r =>
      val sel = r.getAs[Long]("sel_tokens")
      val budget = r.getAs[Long]("budget_tokens")
      assert(r.getAs[Long]("n_docs") > 0)
      // greedy-by-prefix: only the final doc may cross the budget line
      assert(sel - budget < 1000, s"selection overshot: $sel vs $budget")
    }
  }

  test("tx07 scrub changes the digest exactly when something was redacted") {
    val df = SparkEntry.queries("tx07_pii_scrub")(spark, sfDir)
      .join(Tables(spark, sfDir, "documents").select(col("doc_id"), md5(col("text")).as("orig_md5")), "doc_id")
    assert(df.filter(col("n_dict") > 0 && col("scrub_md5") === col("orig_md5")).count() == 0)
    assert(df.filter(col("n_dict") === 0 && col("n_emails") === 0 && col("n_longnums") === 0 &&
      col("scrub_md5") =!= col("orig_md5")).count() == 0)
    assert(df.filter(col("len_delta") < 0).count() == 0)
  }

  test("mm01 metadata is deterministic and complete") {
    val df = SparkEntry.queries("mm01_binary_meta")(spark, sfDir)
    assert(df.count() == Tables(spark, sfDir, "documents").count())
    assert(df.filter(col("width") < 64 || col("width") > 304).count() == 0)
    assert(df.filter(!col("format").isin("png", "jpeg")).count() == 0)
  }
}
