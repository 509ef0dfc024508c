package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregator: full second-moment (outer-product) accumulation
  * over float vectors — the one-pass distributed-covariance kernel
  * behind ss20's PCA/whitening stats.
  *
  * Versus the double-posexplode form (the oracle-mirrorable plan: d^2
  * generated rows PER INPUT ROW feeding a hash aggregate), this folds
  * each vector into one dense long buffer per partition: the corpus is
  * scanned once, nothing is generated, and the wire carries partitions
  * x (d^2 + d + 2) longs — at 100 TB with d=64 that removes a 4096x
  * row expansion from the hot path while shuffling the same few KB of
  * partial sums (ella's tensor reducers keep the same dense-buffer
  * shape, ella-tensor/src/ops/reduce.rs).
  *
  * Determinism (SURVEY.md §5): each element is quantized to exact
  * milli-unit longs (`floor(x*1000 + 0.5)` — floor of an identical
  * IEEE double is engine-exact) BEFORE any accumulation, so every
  * buffer cell is an integer sum — associative, commutative,
  * partition/merge-order free, and bit-identical to the oracle's
  * explode-then-SUM over the same quantized grid.
  *
  * Buffer layout (length 2 + d + d^2): [d, n, S_1..S_d, S_11, S_12,
  * .., S_dd] (moments row-major). `finish` returns the buffer; the
  * caller reconstructs (i, j, S_ij) / (i, S_i) frames by position.
  */
object MomentAgg extends Aggregator[Array[Float], Array[Long], Array[Long]] {
  /** Quantization scale: milli-units (1e-3 grid). */
  val Scale = 1000.0

  @inline private def quant(x: Float): Long =
    math.floor(x.toDouble * Scale + 0.5).toLong

  override def zero: Array[Long] = Array.empty

  override def reduce(buf: Array[Long], v: Array[Float]): Array[Long] = {
    if (v == null) buf
    else {
      val d = v.length
      val b = if (buf.isEmpty) {
        val nb = new Array[Long](2 + d + d * d)
        nb(0) = d
        nb
      } else buf
      if (b(0) != d) b // dimension mismatch: skip the row (never throw mid-agg)
      else {
        val q = new Array[Long](d)
        var i = 0
        while (i < d) { q(i) = quant(v(i)); i += 1 }
        b(1) += 1
        i = 0
        while (i < d) {
          b(2 + i) += q(i)
          val row = 2 + d + i * d
          val qi = q(i)
          var j = 0
          while (j < d) { b(row + j) += qi * q(j); j += 1 }
          i += 1
        }
        b
      }
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else if (a(0) != b(0)) a
    else {
      var i = 1
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
