package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregator: elementwise sum of float vectors in double
  * precision — the scalable centroid/IVF building block.
  *
  * Versus explode-then-groupBy (ss03's oracle-mirrorable form), this
  * shuffles ONE buffer per (group x partition) instead of `dim` rows
  * per input row: at 100 TB with dim=1024 that is a 1024x reduction in
  * shuffled records, with map-side partial merging for free
  * (ella keeps the same dense-buffer shape in its tensor reducers,
  * ella-tensor/src/ops/reduce.rs).
  */
object VectorSumAgg extends Aggregator[Array[Float], Array[Double], Array[Double]] {
  override def zero: Array[Double] = Array.empty

  override def reduce(buf: Array[Double], v: Array[Float]): Array[Double] = {
    if (buf.isEmpty) {
      val out = new Array[Double](v.length)
      var i = 0
      while (i < v.length) { out(i) = v(i).toDouble; i += 1 }
      out
    } else {
      var i = 0
      while (i < buf.length && i < v.length) { buf(i) += v(i).toDouble; i += 1 }
      buf
    }
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      var i = 0
      while (i < a.length && i < b.length) { a(i) += b(i); i += 1 }
      a
    }
  }

  override def finish(buf: Array[Double]): Array[Double] = buf

  // ExpressionEncoder keeps the buffer/output as a real array<double>
  // column (kryo would make it opaque binary).
  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()

  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
