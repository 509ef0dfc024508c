package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregator: elementwise sum of float vectors — the scalable
  * centroid/IVF building block.
  *
  * Versus explode-then-groupBy (ss03's oracle-mirrorable form), this
  * shuffles ONE buffer per (group x partition) instead of `dim` rows
  * per input row: at 100 TB with dim=1024 that is a 1024x reduction in
  * shuffled records, with map-side partial merging for free
  * (ella keeps the same dense-buffer shape in its tensor reducers,
  * ella-tensor/src/ops/reduce.rs).
  *
  * Determinism: each element is quantized to an exact integer grid
  * (centi-units, `floor(x*100 + 0.5)` — floor of an identical IEEE
  * double is engine-exact, unlike round()) BEFORE accumulation, so the
  * sum is a long integer sum — associative, commutative, and therefore
  * independent of partition/merge order. Double accumulation + final
  * rounding (the round-1 form) flipped values at the rounding boundary
  * because partial-agg merge order is nondeterministic.
  */
object VectorSumAgg extends Aggregator[Array[Float], Array[Long], Array[Long]] {
  /** Quantization scale: centi-units (1e-2 grid). */
  val Scale = 100.0

  @inline private def quant(x: Float): Long =
    math.floor(x.toDouble * Scale + 0.5).toLong

  override def zero: Array[Long] = Array.empty

  override def reduce(buf: Array[Long], v: Array[Float]): Array[Long] = {
    // SQL aggregate semantics: null inputs contribute nothing (typed
    // Aggregators bypass Catalyst's null filtering, so guard here).
    if (v == null) buf
    else if (buf.isEmpty) {
      val out = new Array[Long](v.length)
      var i = 0
      while (i < v.length) { out(i) = quant(v(i)); i += 1 }
      out
    } else {
      var i = 0
      while (i < buf.length && i < v.length) { buf(i) += quant(v(i)); i += 1 }
      buf
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      var i = 0
      while (i < a.length && i < b.length) { a(i) += b(i); i += 1 }
      a
    }
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  // ExpressionEncoder keeps the buffer/output as a real array<bigint>
  // column (kryo would make it opaque binary).
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** [[VectorSumAgg]] over double vectors at a caller-chosen quantization
  * grain — the PQ-training twin (pqIterate/resSeed sum SUBSPACE slices:
  * raw-embedding training quantizes at centi (100), residual training
  * at milli (1000) because residual spread is an order tighter).
  * Identical contract: element-wise floor(x*scale+0.5) longs, order-free
  * integer sum, null vectors contribute nothing. */
final class VectorSumAggScaled(scale: Double)
    extends Aggregator[Array[Double], Array[Long], Array[Long]] {

  @inline private def quant(x: Double): Long =
    math.floor(x * scale + 0.5).toLong

  override def zero: Array[Long] = Array.empty

  override def reduce(buf: Array[Long], v: Array[Double]): Array[Long] = {
    if (v == null) buf
    else if (buf.isEmpty) {
      val out = new Array[Long](v.length)
      var i = 0
      while (i < v.length) { out(i) = quant(v(i)); i += 1 }
      out
    } else {
      var i = 0
      while (i < buf.length && i < v.length) { buf(i) += quant(v(i)); i += 1 }
      buf
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      var i = 0
      while (i < a.length && i < b.length) { a(i) += b(i); i += 1 }
      a
    }
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
