package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, BoundReference, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** AS-OF JOIN as a first-class operator: custom `LogicalPlan` node +
  * `SparkStrategy` + physical `SparkPlan` — the full extension stack
  * for semantics Spark's built-in operators can't express directly
  * (the reference treats as-of/time alignment as core topic semantics;
  * ella-engine lazy plan over time-ordered shards).
  *
  * Semantics: for every left row, attach the payload of the most
  * recent right row with the same key and `rightTime <= leftTime`
  * (null if none) — ties on equal time take the right row.
  *
  * Why a custom node: the composable forms are (a) a union + last()
  * window (one exchange but a window over the merged stream) or (b) a
  * range join (quadratic blowup). This operator instead requires
  * hash co-partitioning on the key and per-partition (key, time)
  * ordering — EnsureRequirements inserts exactly ONE exchange + sort
  * per side, co-partitioned like a sort-merge join — then streams the
  * two sorted iterators with an O(1)-state merge: no window buffer, no
  * row expansion, no second shuffle. At 100 TB this is the plan a
  * hand-built time-series engine runs, with Spark managing the
  * exchanges, AQE, and spilling sorts.
  *
  * Constraint: key and time must be non-null (topic rows always carry
  * both; same contract as the reference's time-indexed shards).
  */
case class AsofJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute,
    payload: Seq[Attribute], payloadOut: Seq[AttributeReference])
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut

  // payloadOut attrs are CREATED here, not consumed from children —
  // without this they'd count as (unresolvable) references
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(payloadOut)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

object AsofJoin {
  /** Build a resolved node from analyzed children, resolving columns
    * by name; payload output attributes get fresh exprIds (nullable —
    * a left row may precede every right row).
    *
    * Each child is wrapped in a fresh-alias Project: the analyzer's
    * DeduplicateRelations may re-alias exprIds INSIDE a child subtree
    * when plans share relations, which would orphan attributes
    * captured from the raw child output. Alias exprIds on top stay
    * stable through that rewrite, so the node's references always
    * resolve. */
  def resolve(left: LogicalPlan, right: LogicalPlan,
              leftKey: String, leftTime: String,
              rightKey: String, rightTime: String,
              payload: Seq[String]): AsofJoin = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    def fresh(p: LogicalPlan): LogicalPlan =
      Project(p.output.map(a => Alias(a, a.name)()), p)
    val l = fresh(left)
    val r = fresh(right)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not in ${p.output.map(_.name)}"))
    val pay = payload.map(attr(r, _))
    AsofJoin(l, r, attr(l, leftKey), attr(l, leftTime),
      attr(r, rightKey), attr(r, rightTime), pay,
      pay.map(a => AttributeReference(a.name, a.dataType, nullable = true)()))
  }
}

/** Planner strategy: AsofJoin logical node → [[AsofJoinExec]]. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, lt, rk, rt, pay, payOut) =>
      AsofJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, pay, payOut) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: requires hash co-partitioning on the keys and
  * (key, time) intra-partition order (EnsureRequirements inserts the
  * single exchange + sort per side), then a streaming two-pointer
  * merge per partition with O(1) state — the last-seen right payload
  * for the current key. */
case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute,
    payload: Seq[Attribute], payloadOut: Seq[AttributeReference])
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(payloadOut)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTimeIdx = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTimeIdx = right.output.indexWhere(_.exprId == rightTime.exprId)
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val payloadRefs = payload
    val rightOut = right.output
    val outAttrs = output
    val nPayload = payloadOut.size

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val payloadProj = UnsafeProjection.create(payloadRefs, rightOut)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullPayload = new GenericInternalRow(nPayload)
      val rBuf = rIter.buffered

      var lastKey: Any = null
      var haveLast = false
      var lastPayload: InternalRow = null

      lIter.map { lRow =>
        val k = lRow.get(lKeyIdx, keyType)
        val t = lRow.get(lTimeIdx, timeType)
        // advance the right cursor to the last row with
        // (rKey < k) or (rKey == k && rTime <= t)
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val rRow = rBuf.head
          val rk = rRow.get(rKeyIdx, keyType)
          val kc = keyOrd.compare(rk, k)
          if (kc < 0) {
            rBuf.next() // earlier key: discard (left is past it)
          } else if (kc == 0 && timeOrd.compare(rRow.get(rTimeIdx, timeType), t) <= 0) {
            // match candidate: remember payload (iterator rows are
            // reused buffers — copy before retaining)
            lastPayload = payloadProj(rBuf.next()).copy()
            lastKey = rk
            haveLast = true
          } else {
            advancing = false // right is ahead of this left row
          }
        }
        val matched = haveLast && keyOrd.compare(lastKey, k) == 0
        resultProj(joined(lRow, if (matched) lastPayload else nullPayload))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
