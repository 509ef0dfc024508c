package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational core: the general-SQL surface ella exposes through
  * DataFusion (ella/src/ella.rs:89 `query(sql)`). Each entry is a
  * Spark-first DataFrame program; the matching DuckDB oracle SQL lives
  * in [[oracle]].
  *
  * Determinism rules (see SURVEY.md §5): every query has a total-order
  * ORDER BY; double aggregates are rounded identically on both sides;
  * integer widths are cast to match Spark's output types.
  */
object Relational {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style multi-agg. Partial (map-side) aggregation is free;
    // shuffles once on (returnflag, linestatus).
    "q01_agg" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
        // Money/discount are cent-quantized doubles: aggregate exact
        // integer cents (order-free) so results are engine- and
        // partition-order independent (SURVEY.md §5).
        .withColumn("price_c", round(col("l_extendedprice") * 100).cast("long"))
        .withColumn("disc_c", round(col("l_discount") * 100).cast("long"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("price_c")).as("sum_base_cents"),
          sum(col("price_c") * (lit(100L) - col("disc_c"))).as("sum_disc_bp"),
          avg(col("l_quantity")).as("avg_qty"),
          avg(col("disc_c")).as("avg_disc_cents"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Filter + projection pushdown: both the predicate and the 4-column
    // ReadSchema reach the parquet scan (verified via .explain).
    "q02_filter_project" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(
          col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")) &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("l_discount"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // TPC-H Q3-style 3-way join + agg + top-k. customer filter prunes
    // before the shuffle join; top-10 via TakeOrderedAndProject.
    "q03_join_agg" -> ((s, d) => {
      val cutoff = to_timestamp(lit("1997-03-15 00:00:00"))
      t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        .join(t(s, d, "orders").filter(col("o_orderdate") < cutoff), col("c_custkey") === col("o_custkey"))
        .join(t(s, d, "lineitem").filter(col("l_shipdate") > cutoff), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum((round(col("l_extendedprice") * 100).cast("long")) *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("revenue_bp"))
        .orderBy(col("revenue_bp").desc, col("l_orderkey"))
        .limit(10)
    }),

    // Star join: nation+region are tiny dims -> explicit broadcast();
    // at 100 TB the fact side never shuffles for this join.
    "q04_broadcast_join" -> ((s, d) => {
      t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          sum(round(col("c_acctbal") * 100).cast("long")).as("total_acctbal_cents"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // Global sort + limit -> TakeOrderedAndProject (no full sort).
    "q05_sort_limit" -> ((s, d) => {
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)
    }),

    "q06_distinct" -> ((s, d) => {
      t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Window rank: top-3 customers by balance per nation. ~25 nations
    // over the full customer table LOOKS like the one-task-per-group
    // trap, but Catalyst's InferWindowGroupLimit (SPARK-37099) turns
    // the row_number() <= k filter into a PARTIAL WindowGroupLimit
    // BEFORE the shuffle: each input partition forwards only its
    // local top-3 per nation, so the per-nation task merges
    // ~3 * partitions candidate rows, never the whole nation.
    // PlanSpec pins the "WindowGroupLimit ... Partial" node.
    "q07_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, d, "customer")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("c_nationkey"), col("rn"), col("c_custkey"), col("c_acctbal"))
        .orderBy(col("c_nationkey"), col("rn"))
    }),

    // Running/frame windows over a time order per customer.
    "q08_window_running" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("price_c", round(col("o_totalprice") * 100).cast("long"))
        .withColumn("running_cents", sum(col("price_c")).over(w))
        .withColumn("delta_cents", col("price_c") - coalesce(lag(col("price_c"), 1).over(w), lit(0L)))
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("running_cents"), col("delta_cents"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Left-semi (EXISTS) / left-anti (NOT EXISTS).
    "q09_semi_anti" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), lit("has_orders").as("tag"))
      val anti = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), lit("no_orders").as("tag"))
      semi.union(anti).orderBy(col("c_custkey"))
    }),

    // CTE + UNION ALL.
    "q10_union_cte" -> ((s, d) => {
      val byCust = t(s, d, "orders").groupBy(col("o_custkey"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("total_c"))
      val hi = byCust.filter(col("total_c") > 30000000L).agg(count(lit(1)).as("n")).select(lit("high").as("bucket"), col("n"))
      val lo = byCust.filter(col("total_c") <= 30000000L).agg(count(lit(1)).as("n")).select(lit("low").as("bucket"), col("n"))
      hi.union(lo).orderBy(col("bucket"))
    }),

    "q11_having" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
        .filter(col("n_orders") > 5)
        .orderBy(col("o_custkey"))
    }),

    // Scalar expression zoo: CASE/WHEN, string fns, date fns.
    "q12_expr" -> ((s, d) => {
      t(s, d, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mon"),
          when(col("o_totalprice") > 200000.0, lit("large"))
            .when(col("o_totalprice") > 50000.0, lit("medium"))
            .otherwise(lit("small")).as("size_class"),
          upper(substring(col("o_orderpriority"), 1, 8)).as("prio"),
          concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("status_prio"),
          // floor, not round: floor of an identical IEEE double is engine
          // independent; decimal round at half-cent boundaries is not.
          floor(col("o_totalprice") * 1.1 + 5.0).as("adj_price"))
        .orderBy(col("o_orderkey"))
    }),

    // Scalar subquery: parts priced above the global average.
    "q13_scalar_subquery" -> ((s, d) => {
      val p = t(s, d, "part")
      val avgPrice = p.agg(avg(col("p_retailprice")).as("ap"))
      p.crossJoin(broadcast(avgPrice))
        .filter(col("p_retailprice") > col("ap"))
        .select(col("p_partkey"), col("p_retailprice"))
        .orderBy(col("p_partkey"))
    }),

    // ROLLUP multi-level aggregation.
    "q14_grouping_sets" -> ((s, d) => {
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    // Left outer join keeping customers with zero orders.
    "q15_outer_join" -> ((s, d) => {
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(round(col("o_totalprice") * 100).cast("long")), lit(0L)).as("total_cents"))
        .orderBy(col("c_custkey"))
    }),

    // Per-group top-k via ranking window. Five priority values over
    // the whole orders table is scale-safe for the same reason as
    // q07: the rank-limit filter plans a partial WindowGroupLimit
    // before the shuffle (PlanSpec-pinned), so only per-partition
    // winners cross the wire and the final per-priority merge is
    // bounded by k * partitions.
    "q16_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select(col("o_orderpriority"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderpriority"), col("rn"))
    }),

    // Pivot-style conditional aggregation.
    "q17_pivot" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_linestatus"))
        .agg(
          round(sum(when(col("l_returnflag") === "A", col("l_quantity")).otherwise(lit(0.0))), 2).as("qty_a"),
          round(sum(when(col("l_returnflag") === "N", col("l_quantity")).otherwise(lit(0.0))), 2).as("qty_n"),
          round(sum(when(col("l_returnflag") === "R", col("l_quantity")).otherwise(lit(0.0))), 2).as("qty_r"))
        .orderBy(col("l_linestatus"))
    }),

    // LIMIT/OFFSET = ella Lazy::limit/skip (ella-engine/src/lazy.rs:46-61).
    "q18_limit_skip" -> ((s, d) => {
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
        .offset(50)
        .limit(100)
    }),

    // Set operations: INTERSECT / EXCEPT over distinct key sets.
    "q19_set_ops" -> ((s, d) => {
      val o = t(s, d, "orders")
      val c96 = o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey")).distinct()
      val c97 = o.filter(year(col("o_orderdate")) === 1997).select(col("o_custkey")).distinct()
      c96.intersect(c97).select(lit("both").as("tag"), col("o_custkey"))
        .union(c96.except(c97).select(lit("only_1996").as("tag"), col("o_custkey")))
        .orderBy(col("tag"), col("o_custkey"))
    }),

    // Exact percentiles with linear interpolation (verified identical
    // to DuckDB quantile_cont on integer-cents input).
    "q20_percentile" -> ((s, d) => {
      t(s, d, "orders")
        .withColumn("price_c", round(col("o_totalprice") * 100).cast("long"))
        .groupBy(col("o_orderpriority"))
        .agg(expr("percentile(price_c, 0.25)").as("p25"),
          expr("percentile(price_c, 0.5)").as("p50"),
          expr("percentile(price_c, 0.75)").as("p75"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    }),

    // Raw-SQL surface (ella's query(sql), ella/src/ella.rs:89): CUBE
    // grouping via spark.sql over registered views.
    "q21_cube_sql" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(
        """SELECT l_returnflag, l_linestatus, count(*) AS n,
          | sum(l_quantity) AS sum_qty
          |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
          |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
    }),

    // Correlated scalar subquery (RewriteCorrelatedScalarSubquery):
    // orders 50% above their own customer's average.
    "q22_correlated" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("orders")
      s.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
          |WHERE o_totalprice > (SELECT 1.5 * avg(o2.o_totalprice)
          |                      FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
          |ORDER BY o_orderkey""".stripMargin)
    }),

    // Distribution window functions: ntile / percent_rank / cume_dist
    // over a totally-ordered partition. Five priority classes over
    // the whole orders table would put each class through one task,
    // so rank positions come from the two-phase GroupPrefix and the
    // distribution stats are their closed forms over a tie-free total
    // order: pr = (rn-1)/(n-1), cd = rn/n, ntile = the
    // big-buckets-first fill (all IEEE-exact: one integer division
    // each, identical in every engine).
    "q23_window_dist" -> ((s, d) => {
      val ranked = graft.functions.GroupPrefix.groupPrefixC(
        t(s, d, "orders").select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice")),
        "o_orderpriority", Seq(col("o_totalprice"), col("o_orderkey")))
      val counts = ranked.groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      ranked.join(broadcast(counts), "o_orderpriority")
        .withColumn("q_sz", expr("CAST(n DIV 4 AS INT)"))
        .withColumn("q_rem", expr("CAST(n % 4 AS INT)"))
        .withColumn("quartile", graft.functions.GroupPrefix.ntileExpr(4))
        .withColumn("pr", when(col("n") === 1, lit(0.0))
          .otherwise((col("rn") - 1).cast("double") / (col("n") - 1).cast("double")))
        .withColumn("cd", col("rn").cast("double") / col("n").cast("double"))
        .select(col("o_orderpriority"), col("o_orderkey"), col("quartile"), col("pr"), col("cd"))
        .orderBy(col("o_orderpriority"), col("o_orderkey"))
    }),

    // Range/banded join — the non-equi interval family. A naive
    // BETWEEN join plans BroadcastNestedLoopJoin: every fact row
    // probes every band = O(n*bands) compares and a nested loop that
    // dies on a big band table. The 100 TB-shaped form: explode each
    // band into the fixed-width integer buckets it covers, equi-join
    // facts on floor(value/width) (hashable, partitionable, AQE-
    // optimizable), then verify the exact [lo, hi) bounds. PlanSpec
    // asserts the BroadcastHashJoin.
    "q24_range_join" -> ((s, d) => {
      import s.implicits._
      val w = 5000.0
      val bands = Seq(
        ("b0_low", 0.0, 9999.5), ("b1_mid", 9999.5, 29999.25),
        ("b2_high", 29999.25, 59999.0), ("b3_top", 59999.0, 120000.0))
      val bandBuckets = bands.flatMap { case (b, lo, hi) =>
        (math.floor(lo / w).toLong to math.floor((hi - 1e-9) / w).toLong)
          .map(k => (b, lo, hi, k))
      }.toDF("band", "lo", "hi", "bucket")
      t(s, d, "lineitem")
        .withColumn("bucket", floor(col("l_extendedprice") / w).cast("long"))
        .join(broadcast(bandBuckets), "bucket")
        .filter(col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_price_c"))
        .orderBy(col("band"))
    }),

    // Ordered string aggregation (LISTAGG / string_agg): the roll-up-
    // to-a-delimited-list op every SQL surface ships. collect_set's
    // arrival order is partition-dependent, so the list is array_sort'd
    // BEFORE joining — deterministic at any parallelism. Distinct sets
    // per group are tiny (bounded domain), so the agg stays partial/
    // map-side combinable; never collect_list over unbounded rows.
    "q25_string_agg" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          array_join(array_sort(collect_set(col("o_orderstatus"))), ",").as("statuses"),
          countDistinct(col("o_custkey")).as("n_custs"))
        .orderBy(col("o_orderpriority"))
    }),

    // Correlated LATERAL subquery (SQL:2016 lateral derived table /
    // cross apply, the DataFusion SQL surface ella exposes): top-2
    // orders PER customer row, declared as a lateral ORDER BY..LIMIT.
    // Catalyst rewrites the correlation into a ranked join (no
    // per-row re-execution); the q16 window form is the explicit
    // twin — this pins the SQL-surface spelling.
    "q27_lateral" -> ((s, d) => {
      t(s, d, "customer").createOrReplaceTempView("customer")
      t(s, d, "orders").createOrReplaceTempView("orders")
      s.sql(
        """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
          |FROM customer c,
          |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
          |         WHERE o.o_custkey = c.c_custkey
          |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
          |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin)
    }),

    // Ratio-to-report: each nation's share of its region's revenue —
    // the classic reporting shape (share-of-total via a window OVER
    // the aggregate). The window runs on the AGG OUTPUT (25 nations),
    // never the fact table, so its sort is free at any corpus scale;
    // the fact side is one partial-agg'd shuffle + broadcast dims.
    // Integer cents end-to-end, share as exact milli DIV.
    "q28_ratio_report" -> ((s, d) => {
      val cust = t(s, d, "customer")
      val nat = t(s, d, "nation")
      val reg = t(s, d, "region")
      val rev = t(s, d, "orders")
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(expr("CAST(round(o_totalprice*100) AS BIGINT)")).as("rev_cents"))
      val w = Window.partitionBy(col("r_name"))
      rev.withColumn("region_cents", sum(col("rev_cents")).over(w))
        .withColumn("share_milli", expr("(rev_cents * 1000) DIV region_cents"))
        .select(col("r_name"), col("n_name"), col("rev_cents"),
          col("region_cents"), col("share_milli"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // Approximate sketches — the single-pass cardinality / quantile
    // estimators a 100 TB engine lives on: HyperLogLog++ distinct
    // counts and t-digest-style percentiles, both partial-mergeable.
    // Sketch INTERNALS are engine-specific (HLL++ here, HLL in
    // DuckDB), so raw estimates can never hash-match an oracle.
    // Instead each engine gates ITS OWN estimate against ITS OWN
    // exact twin in the same query — the output rows are exact counts
    // plus within-5% booleans, identical across engines whenever both
    // sketches are calibrated, which makes the sketch path fully
    // oracle-checkable (rows+schema+hash) without pretending the
    // estimates themselves are portable. A sketch drifting out of
    // tolerance in EITHER engine turns the row red. At 100 TB the
    // exact twins are the expensive half; production callers use the
    // sketch columns alone — this query's job is to prove them.
    "q26_approx_sketch" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("l_orderkey")).as("exact_orders"),
          countDistinct(col("l_partkey")).as("exact_parts"),
          // rsd 1% against a 5% gate: the gate needs headroom over the
          // sketch's own standard error or it flips on a bad draw
          // (default rsd IS 5% — measured one flipped gate at sf0.01)
          approx_count_distinct(col("l_orderkey"), 0.01).as("_ao"),
          approx_count_distinct(col("l_partkey"), 0.01).as("_ap"),
          expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").as("_pe"),
          expr("approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75), 10000)")
            .as("_pa"))
        .select(col("l_returnflag"), col("n_rows"),
          col("exact_orders"), col("exact_parts"),
          (abs(col("_ao") - col("exact_orders")) <= col("exact_orders") * lit(0.05))
            .as("orders_within_5pct"),
          (abs(col("_ap") - col("exact_parts")) <= col("exact_parts") * lit(0.05))
            .as("parts_within_5pct"),
          (abs(element_at(col("_pa"), 1) - element_at(col("_pe"), 1))
            <= abs(element_at(col("_pe"), 1)) * lit(0.05)).as("p25_within_5pct"),
          (abs(element_at(col("_pa"), 2) - element_at(col("_pe"), 2))
            <= abs(element_at(col("_pe"), 2)) * lit(0.05)).as("p50_within_5pct"),
          (abs(element_at(col("_pa"), 3) - element_at(col("_pe"), 3))
            <= abs(element_at(col("_pe"), 3)) * lit(0.05)).as("p75_within_5pct"))
        .orderBy(col("l_returnflag"))
    }),

    // Recursive CTE (Spark 4.1 UnionLoop ≙ DataFusion's RecursiveQuery,
    // datafusion/physical-plan recursive_query.rs): a gap-free month
    // spine generated BY RECURSION from the data's own [min, max]
    // bounds, left-joined to per-month order revenue — months with no
    // orders still report a zero row (the recursion is what makes the
    // report gap-free; ts07 does the same with sequence(), this is the
    // SQL-dialect surface for it). Scale shape: the recursion produces
    // O(months) rows driver-cheap (anchor is a 1-row agg), the join is
    // a broadcast of the spine against one scan of orders, and the agg
    // is partial — one shuffle of O(months) groups total. The bound
    // rides IN the recursion state (m, hi) so no step needs a subquery.
    "q29_recursive" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("orders")
      s.sql(
        """WITH RECURSIVE
          |bounds AS (SELECT date_trunc('month', min(o_orderdate)) AS lo,
          |                  date_trunc('month', max(o_orderdate)) AS hi FROM orders),
          |months(m, hi) AS (
          |  SELECT lo, hi FROM bounds
          |  UNION ALL
          |  SELECT m + INTERVAL '1' MONTH, hi FROM months WHERE m < hi
          |)
          |SELECT date_format(m.m, 'yyyy-MM') AS month,
          |  count(o.o_orderkey) AS n_orders,
          |  coalesce(sum(CAST(round(o_totalprice*100) AS BIGINT)), 0) AS rev_cents
          |FROM months m LEFT JOIN orders o ON date_trunc('month', o.o_orderdate) = m.m
          |GROUP BY 1 ORDER BY 1""".stripMargin)
    }),

    // Semi-structured extraction — the JSON payload surface
    // (DataFusion ships JSON functions; ella events carry property
    // payloads): `events.props` is a JSON string column, parsed ONCE
    // per row with a typed `from_json` schema (codegen'd, no
    // per-field re-parse the way repeated get_json_object calls
    // would) and the extracted field aggregates per event_type with
    // a null-rate audit. Scale shape: parse + extract is a per-row
    // projection at scan speed; the agg is one partial-agg'd shuffle
    // of event_type groups. At 100 TB the parse cost is the scan —
    // there is no shuffle of raw JSON (only extracted longs move).
    "q30_json_extract" -> ((s, d) => {
      val k = from_json(col("props"),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType))))
        .getField("k")
      Tables.events(s, d)
        .withColumn("k", k)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          count(col("k")).as("n_with_k"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .withColumn("mean_k_milli", expr("(sum_k * 1000) DIV n_with_k"))
        .orderBy(col("event_type"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q29_recursive" ->
      """WITH RECURSIVE
        |bounds AS (SELECT date_trunc('month', min(o_orderdate)) AS lo,
        |                  date_trunc('month', max(o_orderdate)) AS hi FROM orders),
        |months(m, hi) AS (
        |  SELECT lo, hi FROM bounds
        |  UNION ALL
        |  SELECT m + INTERVAL 1 MONTH, hi FROM months WHERE m < hi
        |)
        |SELECT strftime(m.m, '%Y-%m') AS month,
        |  count(o.o_orderkey) AS n_orders,
        |  CAST(coalesce(sum(CAST(round(o_totalprice*100) AS BIGINT)), 0) AS BIGINT) AS rev_cents
        |FROM months m LEFT JOIN orders o ON date_trunc('month', o.o_orderdate) = m.m
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q30_json_extract" ->
      """WITH e AS (
        | SELECT event_type,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        | FROM events)
        |SELECT event_type, count(*) AS n,
        | count(k) AS n_with_k,
        | CAST(sum(k) AS BIGINT) AS sum_k,
        | CAST(min(k) AS BIGINT) AS min_k,
        | CAST(max(k) AS BIGINT) AS max_k,
        | (CAST(sum(k) AS BIGINT) * 1000) // count(k) AS mean_k_milli
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | sum(l_quantity) AS sum_qty,
        | CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        | CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_disc_bp,
        | avg(l_quantity) AS avg_qty,
        | avg(CAST(round(l_discount*100) AS BIGINT)) AS avg_disc_cents,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_join_agg" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        | CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_bp
        |FROM customer JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
        |GROUP BY 1,2,3 ORDER BY revenue_bp DESC, l_orderkey LIMIT 10""".stripMargin,
    "q04_broadcast_join" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        | CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS total_acctbal_cents
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q05_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,
    "q06_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY 1,2""".stripMargin,
    "q07_window_rank" ->
      """SELECT c_nationkey, rn, c_custkey, c_acctbal FROM (
        | SELECT c_nationkey, c_custkey, c_acctbal,
        |  CAST(row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rn
        | FROM customer) WHERE rn <= 3 ORDER BY c_nationkey, rn""".stripMargin,
    "q08_window_running" ->
      """WITH o AS (SELECT *, CAST(round(o_totalprice*100) AS BIGINT) AS price_c FROM orders)
        |SELECT o_custkey, o_orderkey, o_totalprice,
        | CAST(sum(price_c) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents,
        | price_c - coalesce(lag(price_c,1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 0) AS delta_cents
        |FROM o ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q09_semi_anti" ->
      """SELECT c_custkey,
        | CASE WHEN EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |  THEN 'has_orders' ELSE 'no_orders' END AS tag
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q10_union_cte" ->
      """WITH by_cust AS (
        | SELECT o_custkey, sum(CAST(round(o_totalprice*100) AS BIGINT)) AS total_c FROM orders GROUP BY 1)
        |SELECT 'high' AS bucket, count(*) AS n FROM by_cust WHERE total_c > 30000000
        |UNION ALL
        |SELECT 'low' AS bucket, count(*) AS n FROM by_cust WHERE total_c <= 30000000
        |ORDER BY bucket""".stripMargin,
    "q11_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
        | CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders GROUP BY 1 HAVING count(*) > 5 ORDER BY o_custkey""".stripMargin,
    "q12_expr" ->
      """SELECT o_orderkey,
        | CAST(year(o_orderdate) AS INT) AS yr,
        | CAST(month(o_orderdate) AS INT) AS mon,
        | CASE WHEN o_totalprice > 200000.0 THEN 'large'
        |      WHEN o_totalprice > 50000.0 THEN 'medium' ELSE 'small' END AS size_class,
        | upper(substr(o_orderpriority, 1, 8)) AS prio,
        | o_orderstatus || '-' || o_orderpriority AS status_prio,
        | CAST(floor(o_totalprice * 1.1 + 5.0) AS BIGINT) AS adj_price
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q13_scalar_subquery" ->
      """SELECT p_partkey, p_retailprice FROM part
        |WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
        |ORDER BY p_partkey""".stripMargin,
    "q14_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity),2) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q15_outer_join" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        | CAST(coalesce(sum(CAST(round(o_totalprice*100) AS BIGINT)), 0) AS BIGINT) AS total_cents
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY c_custkey""".stripMargin,
    "q16_topk_per_group" ->
      """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
        | SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  CAST(row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        | FROM orders) WHERE rn <= 2 ORDER BY o_orderpriority, rn""".stripMargin,
    "q17_pivot" ->
      """SELECT l_linestatus,
        | round(sum(CASE WHEN l_returnflag='A' THEN l_quantity ELSE 0.0 END),2) AS qty_a,
        | round(sum(CASE WHEN l_returnflag='N' THEN l_quantity ELSE 0.0 END),2) AS qty_n,
        | round(sum(CASE WHEN l_returnflag='R' THEN l_quantity ELSE 0.0 END),2) AS qty_r
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q18_limit_skip" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 100 OFFSET 50""".stripMargin,
    "q19_set_ops" ->
      """WITH c96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
        |c97 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
        |SELECT 'both' AS tag, o_custkey FROM (SELECT o_custkey FROM c96 INTERSECT SELECT o_custkey FROM c97)
        |UNION ALL
        |SELECT 'only_1996' AS tag, o_custkey FROM (SELECT o_custkey FROM c96 EXCEPT SELECT o_custkey FROM c97)
        |ORDER BY tag, o_custkey""".stripMargin,
    "q20_percentile" ->
      """SELECT o_orderpriority,
        | quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.25) AS p25,
        | quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.5) AS p50,
        | quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.75) AS p75,
        | count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q21_cube_sql" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q22_correlated" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE o_totalprice > (SELECT 1.5 * avg(o2.o_totalprice)
        |                      FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q23_window_dist" ->
      """SELECT o_orderpriority, o_orderkey,
        | CAST(ntile(4) OVER w AS INT) AS quartile,
        | percent_rank() OVER w AS pr,
        | cume_dist() OVER w AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "q24_range_join" ->
      """WITH bands(band, lo, hi) AS (VALUES
        |  ('b0_low', 0.0, 9999.5), ('b1_mid', 9999.5, 29999.25),
        |  ('b2_high', 29999.25, 59999.0), ('b3_top', 59999.0, 120000.0))
        |SELECT b.band, count(*) AS n,
        | CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_price_c
        |FROM lineitem l JOIN bands b
        |  ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
        |GROUP BY b.band
        |ORDER BY b.band""".stripMargin,
    "q25_string_agg" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        | string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
        | count(DISTINCT o_custkey) AS n_custs
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    // q26: the oracle runs DUCKDB's sketches (HLL, approx_quantile)
    // against DuckDB's exacts under the same 5% gates the Spark side
    // applies to its own — the gate booleans + exact columns are the
    // engine-portable surface, the estimates themselves are not
    "q26_approx_sketch" ->
      """SELECT l_returnflag,
        | count(*) AS n_rows,
        | CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
        | CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        | abs(approx_count_distinct(l_orderkey) - count(DISTINCT l_orderkey))
        |   <= count(DISTINCT l_orderkey) * 0.05 AS orders_within_5pct,
        | abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
        |   <= count(DISTINCT l_partkey) * 0.05 AS parts_within_5pct,
        | abs(approx_quantile(l_extendedprice, 0.25) - quantile_cont(l_extendedprice, 0.25))
        |   <= abs(quantile_cont(l_extendedprice, 0.25)) * 0.05 AS p25_within_5pct,
        | abs(approx_quantile(l_extendedprice, 0.5) - quantile_cont(l_extendedprice, 0.5))
        |   <= abs(quantile_cont(l_extendedprice, 0.5)) * 0.05 AS p50_within_5pct,
        | abs(approx_quantile(l_extendedprice, 0.75) - quantile_cont(l_extendedprice, 0.75))
        |   <= abs(quantile_cont(l_extendedprice, 0.75)) * 0.05 AS p75_within_5pct
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q27_lateral" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin,
    "q28_ratio_report" ->
      """WITH rev AS (
        | SELECT r_name, n_name,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS rev_cents
        | FROM orders
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        | GROUP BY 1, 2)
        |SELECT r_name, n_name, rev_cents,
        | CAST(sum(rev_cents) OVER (PARTITION BY r_name) AS BIGINT) AS region_cents,
        | (rev_cents * 1000) // CAST(sum(rev_cents) OVER (PARTITION BY r_name) AS BIGINT) AS share_milli
        |FROM rev ORDER BY r_name, n_name""".stripMargin
  )
}
