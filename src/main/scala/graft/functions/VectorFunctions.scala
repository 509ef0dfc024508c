package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns — the
  * Spark-first counterpart of ella's tensor ops (ella-tensor/src/ops/
  * binary_arith.rs, reduce.rs, slice.rs).
  *
  * All built on codegen'd higher-order functions (zip_with/transform/
  * aggregate) — no UDFs, so whole-stage codegen keeps the hot loop
  * tight. Every float is widened to double BEFORE arithmetic and all
  * reductions are sequential left folds: both choices are what DuckDB's
  * list_sum/list_reduce do, so results are bit-identical across
  * engines (verified empirically, SURVEY.md §5).
  */
object VectorFunctions {
  private val D = "double"

  /** Left-fold sum of a numeric array in double precision. */
  def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two float vectors in double precision. Backed by
    * the native codegen'd [[graft.plans.DotProductExpr]] (HOFs don't
    * codegen); bit-identical to the zip_with+aggregate fold. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.plans.DotProductExpr(
        org.apache.spark.sql.graft.bridge.expression(a),
        org.apache.spark.sql.graft.bridge.expression(b)))

  /** Dot product against a constant vector — routed through the
    * native codegen kernel. Constants must be float-exact (the ±1
    * hyperplanes always are), so `(double)(float)w == w` and the
    * kernel's double-widened fold is bit-identical to the interpreted
    * `zip_with` + cast form it replaces. */
  def dotConst(a: Column, q: Seq[Double]): Column = {
    require(q.forall(v => v.toFloat.toDouble == v),
      "dotConst constants must be exactly float-representable")
    dot(a, array(q.map(v => lit(v.toFloat)): _*))
  }

  def l2normSq(a: Column): Column = dot(a, a)

  def l2norm(a: Column): Column = sqrt(l2normSq(a))

  /** Cosine similarity — fused one-pass native kernel
    * ([[graft.plans.CosineSimExpr]]): dot + both norms in a single
    * loop, bit-identical to `dot(a,b)/(l2norm(a)*l2norm(b))`. */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.plans.CosineSimExpr(
        org.apache.spark.sql.graft.bridge.expression(a),
        org.apache.spark.sql.graft.bridge.expression(b)))

  /** Squared L2 distance — fused one-pass native kernel
    * ([[graft.plans.L2DistSqExpr]]; either side float or double
    * vectors), bit-identical to the composed
    * `foldSum(zip_with(a, c, (x, y) => (x-y)^2))` double-widened
    * index-order fold it replaces (r13: the argmin inner loop of the
    * IVF/PQ/k-means family — the composed HOF fold was interpreted
    * per (vector, centroid) pair inside the argmin lambdas). */
  def l2distSq(a: Column, c: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.plans.L2DistSqExpr(
        org.apache.spark.sql.graft.bridge.expression(a),
        org.apache.spark.sql.graft.bridge.expression(c)))

  /** Broadcast-centroid argmin (one native call replacing the
    * interpreted `array_min(transform(cents, struct(l2distSq, label)))`
    * nest — [[graft.plans.CellArgminExpr]]): struct(distName,
    * labelName) of the nearest centroid, value-exact with the
    * composed form including its struct-ordering null algebra. */
  def cellArgmin(emb: Column, cents: Column,
                 vecField: String, labelField: String,
                 distName: String = "dist2", labelName: String = "cell"): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.plans.CellArgminExpr(
        org.apache.spark.sql.graft.bridge.expression(emb),
        org.apache.spark.sql.graft.bridge.expression(cents),
        vecField, labelField, distName, labelName))

  /** PQ sub-space argmin (one native call replacing the interpreted
    * transform+array_min+subSlice nest — [[graft.plans.PqArgminExpr]]):
    * the 0-based winner position per subspace. */
  def pqArgminIdx(emb: Column, cb: Column, subDim: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.plans.PqArgminExpr(
        org.apache.spark.sql.graft.bridge.expression(emb),
        org.apache.spark.sql.graft.bridge.expression(cb), subDim, 0))

  /** [[pqArgminIdx]] returning the winning CODE label per subspace. */
  def pqArgminCode(emb: Column, cb: Column, subDim: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.plans.PqArgminExpr(
        org.apache.spark.sql.graft.bridge.expression(emb),
        org.apache.spark.sql.graft.bridge.expression(cb), subDim, 1))

  /** [[pqArgminIdx]] returning struct(code, idx, d2) per subspace. */
  def pqArgminFull(emb: Column, cb: Column, subDim: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.plans.PqArgminExpr(
        org.apache.spark.sql.graft.bridge.expression(emb),
        org.apache.spark.sql.graft.bridge.expression(cb), subDim, 2))

  /** ADC gather-sum: sum over m of lut[m][cidx[m]] in m order, the
    * exact IEEE fold of the composed zip_with+aggregate
    * ([[graft.plans.AdcSumExpr]]). */
  def adcSum(lut: Column, cidx: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.plans.AdcSumExpr(
        org.apache.spark.sql.graft.bridge.expression(lut),
        org.apache.spark.sql.graft.bridge.expression(cidx)))
}
