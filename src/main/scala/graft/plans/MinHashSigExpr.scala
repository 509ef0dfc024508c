package graft.plans

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MinHash signature over a shingle array.
  *
  * Produces EXACTLY the value of the composed form in
  * [[graft.operators.Dedup]]'s signatures (and the DuckDB oracle):
  * for permutation p in 0..7, the minimum over shingles of
  * `substr(md5(salt_p ++ shingle), off_p, 8)` where salt is "" for
  * p<4 and "x" for p>=4 and off_p selects the p%4-th 8-hex-char
  * (32-bit) digest slice. Min over fixed-width lowercase hex equals
  * unsigned numeric min of the slice, so we track uint32 minima and
  * format once at the end.
  *
  * Why native: the composed HOF pipeline materializes 2 digest arrays
  * + 8 substring arrays per row in interpreted lambda eval, and
  * Spark's md5 allocates a fresh MessageDigest per call. Here: one
  * pass per row, a thread-local reused digest, zero intermediate
  * arrays. (Same motivation as ella's native sketch kernels.)
  * CodegenFallback: one interpreted call per ROW is noise next to the
  * per-shingle hashing it replaces.
  */
case class MinHashSigExpr(child: Expression) extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sig expects array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val shingles = input.asInstanceOf[ArrayData]
    val n = shingles.numElements()
    val mins = Array.fill(8)(0xFFFFFFFFL)
    val md = MinHashSigExpr.digest.get()
    var i = 0
    while (i < n) {
      val bytes = shingles.getUTF8String(i).getBytes
      md.reset()
      val d0 = md.digest(bytes)
      updateMins(mins, 0, d0)
      md.reset()
      md.update('x'.toByte)
      val d1 = md.digest(bytes)
      updateMins(mins, 4, d1)
      i += 1
    }
    val out = new Array[Any](8)
    var p = 0
    while (p < 8) {
      out(p) = UTF8String.fromString(f"${mins(p)}%08x")
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Fold the 4 big-endian uint32 slices of a digest into mins[base..base+3]. */
  private def updateMins(mins: Array[Long], base: Int, d: Array[Byte]): Unit = {
    var j = 0
    while (j < 4) {
      val v = ((d(4 * j) & 0xFFL) << 24) | ((d(4 * j + 1) & 0xFFL) << 16) |
        ((d(4 * j + 2) & 0xFFL) << 8) | (d(4 * j + 3) & 0xFFL)
      if (v < mins(base + j)) mins(base + j) = v
      j += 1
    }
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_sig"
}

object MinHashSigExpr {
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
}
