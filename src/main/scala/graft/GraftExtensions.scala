package graft

import graft.plans.{CosineSimExpr, DotProductExpr}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension installing graft's native expressions as SQL
  * functions, so `spark.sql("SELECT graft_dot(a, b)")` works next to
  * the Column API. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or call
  * [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}

object GraftExtensions {
  private val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProductExpr(args(0), args(1))),
    (FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimExpr].getName, "graft_cosine"),
      (args: Seq[Expression]) => CosineSimExpr(args(0), args(1))),
    (FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[graft.plans.SimHashSigExpr].getName, "graft_simhash"),
      (args: Seq[Expression]) => graft.plans.SimHashSigExpr(args(0))),
    (FunctionIdentifier("graft_simhash_bands"),
      new ExpressionInfo(classOf[graft.plans.SimHashBandsExpr].getName, "graft_simhash_bands"),
      (args: Seq[Expression]) => graft.plans.SimHashBandsExpr(args(0))),
    (FunctionIdentifier("graft_simhash_wide"),
      new ExpressionInfo(classOf[graft.plans.SimHashWideExpr].getName, "graft_simhash_wide"),
      (args: Seq[Expression]) => graft.plans.SimHashWideExpr(args(0))))

  /** Register graft functions + planner strategies on an
    * already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsofJoinStrategy
  }
}
