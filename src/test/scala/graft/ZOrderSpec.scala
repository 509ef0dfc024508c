package graft

import org.apache.spark.sql.functions._

/** Exact bit-level checks of the Morton interleave behind z-order
  * compaction — the integration test (StorageSpec) measures pruning;
  * this pins the arithmetic it depends on. */
class ZOrderSpec extends SparkSpec {

  private def z(vals: (Double, Double)*): Seq[Long] = {
    import spark.implicits._
    vals.toSeq.toDF("x", "y")
      .select(graft.functions.ZOrder.zvalue(Seq(col("x"), col("y"))).as("z"))
      .collect().map(_.getLong(0)).toSeq
  }

  test("zvalue interleaves bits at the documented positions") {
    val eps = 1.0 / 65536 // quantizes to exactly 1
    val got = z((0.0, 0.0), (eps, 0.0), (0.0, eps), (0.5, 0.0), (0.0, 0.5))
    // bit b of column c lands at b*ncols + c (ncols=2):
    //   x bit0 -> position 0; y bit0 -> position 1
    //   quant(0.5)=32768 -> bit15: x -> position 30, y -> position 31
    assert(got == Seq(0L, 1L, 2L, 1L << 30, 1L << 31), s"got $got")
  }

  test("zvalue clamps out-of-range inputs instead of wrapping") {
    val Seq(lo, hi) = z((-0.5, 0.0), (1.5, 0.0))
    assert(lo == 0L, s"below-range must clamp to 0, got $lo")
    // all 16 x-bits set, at even positions
    val allX = (0 until 16).map(b => 1L << (2 * b)).sum
    assert(hi == allX, s"above-range must clamp to max quant, got $hi")
  }

  test("zvalue is monotone along the diagonal") {
    val diag = z((0.1, 0.1), (0.3, 0.3), (0.6, 0.6), (0.9, 0.9))
    assert(diag == diag.sorted, s"diagonal walk must be z-increasing: $diag")
  }

  test("4-column zvalue stays clear of the sign bit and keeps signed monotonicity") {
    // At 16 bits/col, bit 15 of column 3 would land at position 63 —
    // the long's sign bit — inverting signed order exactly on the top
    // half of the keyspace. bitsFor caps the width (15 bits at n=4) so
    // the highest used position is 14*4+3 = 59.
    assert(graft.functions.ZOrder.bitsFor(4) == 15)
    assert(graft.functions.ZOrder.bitsFor(2) == 16)
    import spark.implicits._
    def z4(vals: (Double, Double, Double, Double)*): Seq[Long] =
      vals.toSeq.toDF("a", "b", "c", "d")
        .select(graft.functions.ZOrder.zvalue(
          Seq(col("a"), col("b"), col("c"), col("d"))).as("z"))
        .collect().map(_.getLong(0)).toSeq
    val diag = z4((0.1, 0.1, 0.1, 0.1), (0.4, 0.4, 0.4, 0.4),
      (0.7, 0.7, 0.7, 0.7), (1.5, 1.5, 1.5, 1.5))
    assert(diag.forall(_ >= 0L), s"no 4-col z-value may set the sign bit: $diag")
    assert(diag == diag.sorted, s"diagonal walk must be z-increasing: $diag")
    // the all-max key uses exactly the capped bit positions
    val allMax = (0 until 15).flatMap(b => (0 until 4).map(c => 1L << (b * 4 + c))).sum
    assert(diag.last == allMax, s"clamped max must fill positions 0..59: ${diag.last}")
  }
}
