package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.graft.bridge

/** Bloom-filter build/probe as plan-native Catalyst expressions.
  *
  * Spark ships `BloomFilterAggregate` / `BloomFilterMightContain` for
  * its own runtime row-level join filtering but registers neither as a
  * SQL function; these wrappers expose them as ordinary Columns so
  * operators can stage the same trick deliberately: build a compact
  * filter over the SMALL side of a match (an arriving increment, a
  * benchmark set), broadcast it, and prune the LARGE side at scan
  * speed before any shuffle. Both sides key on `xxhash64` of the
  * column, the codegen'd path the engine's own runtime filters use —
  * no UDF, no serialization cliff.
  *
  * Mirrors the reference's fingerprint-prefilter idea for incremental
  * dedup (ella-engine's incremental topic checks); the Bloom form is
  * the standard scale-out answer when the established-corpus side is
  * too large to shuffle per increment.
  */
object BloomFunctions {

  /** Aggregate a column into a Bloom filter (binary). `items` is the
    * expected distinct-insert count; `bits` the filter size (16 bits
    * per item ≈ 0.05% false-positive rate at optimal hash count —
    * false positives only cost downstream exact-join work, never
    * correctness). Bounded by Spark's runtime-filter confs
    * (`spark.sql.optimizer.runtime.bloomFilter.maxNumBits`, default
    * 8 MB — a broadcastable size by construction). */
  def bloomAgg(c: Column, items: Long, bits: Long): Column =
    bridge.column(new BloomFilterAggregate(
      bridge.expression(xxhash64(c)),
      Literal(items), Literal(bits)).toAggregateExpression())

  /** Membership probe against a [[bloomAgg]]-built filter: false means
    * definitively absent (no false negatives); true means "run the
    * exact check".
    *
    * `might_contain` requires its filter operand to be a constant or
    * scalar subquery (the planner evaluates it once and ships the
    * filter to every task — exactly the broadcast-the-small-side
    * semantics we want), so the filter arrives as a one-row/one-column
    * DataFrame wrapped into a subquery, not as a joined column. */
  def mightContain(c: Column, bloom: org.apache.spark.sql.DataFrame): Column =
    bridge.column(new BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(bridge.analyzed(bloom)),
      bridge.expression(xxhash64(c))))
}
