package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, BoundReference, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.types.DataType
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator Catalyst integration for the as-of join — the (c) path
  * of the custom-operator preference order: a logical node, a planner
  * strategy, and a physical `SparkPlan` with a streaming merge
  * `doExecute`, registered through `SparkSessionExtensions`
  * (graft.functions.GraftExtensions → injectPlannerStrategy).
  *
  * The DataFrame-composable form (operators/AsOfJoin.asOf — union scan +
  * running `last(_, ignoreNulls)` window) stays the default and is the
  * cross-checked reference. This node exists because the semantics ARE a
  * join: declaring them as one lets the planner own the physical
  * contract instead of the query author:
  *
  *  - `requiredChildDistribution` = ClusteredDistribution on each side's
  *    keys — EnsureRequirements inserts exactly the two hash exchanges
  *    any equi-join would need, co-partitioned, AQE-resizable;
  *  - `requiredChildOrdering` = (keys, time) ascending — the planner
  *    inserts the sorts (or elides them when a child is already
  *    bucketed+sorted that way, which no DataFrame-level rewrite can
  *    ever discover);
  *  - `doExecute` zips the co-partitioned sorted partitions and merges
  *    them with ONE forward pass, O(1) state (the last at-or-before
  *    right row per key): no per-key range explosion, no window buffer,
  *    nothing driver-side — a key with a billion rows streams through.
  *
  * Semantics (identical to AsOfJoin.asOf, oracle: DuckDB ASOF LEFT
  * JOIN): for each left row the single right row in the same key group
  * with the greatest rightTime <= leftTime; payload columns null when no
  * such row. Equal timestamps match (at-or-before). Several right rows
  * on one (key, time) resolve to the largest payload tuple — the right
  * side is sorted (keys, time, payload), so the last row consumed by the
  * merge is the lexicographic max, matching the window form's
  * `last(__r asc)`. Null keys group together (window-partition
  * semantics, not SQL-join null semantics); null right times sort first
  * and so match any left time, null left times match only those.
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
                        leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
                        leftTime: Attribute, rightTime: Attribute,
                        payload: Seq[Attribute], payloadOut: Seq[Attribute])
  extends BinaryNode {

  require(leftKeys.size == rightKeys.size, "key lists must align")
  require(payload.size == payloadOut.size, "payload lists must align")

  override def output: Seq[Attribute] = left.output ++ payloadOut
  // payloadOut attrs are minted by this node (fresh exprIds, nullable) —
  // without this, checkAnalysis flags them as missing inputs.
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
                                                 newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: AsOfJoinNode → AsOfJoinExec. Injected via
  * GraftExtensions (ext.injectPlannerStrategy). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(n.leftKeys, n.rightKeys, n.leftTime, n.rightTime,
        n.payload, n.payloadOut, planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

/** Physical sort-merge as-of join. See [[AsOfJoinNode]] for the
  * contract; this node only declares distribution/ordering requirements
  * and streams the merge — all exchange/sort planning stays with
  * EnsureRequirements/AQE. Not codegen'd (a bespoke two-iterator merge
  * has no WholeStageCodegen template to fuse into); the row path is
  * UnsafeProjection-based so per-row cost is a few field copies. */
case class AsOfJoinExec(leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
                        leftTime: Attribute, rightTime: Attribute,
                        payload: Seq[Attribute], payloadOut: Seq[Attribute],
                        left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  private def rightSortCols: Seq[Attribute] =
    rightKeys ++ (rightTime +: payload.filterNot(_.semanticEquals(rightTime)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    rightSortCols.map(SortOrder(_, Ascending)))

  // one forward pass per partition: left order (and partitioning) survive
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val payloadExprs = payload
    val outTypes = output.map(_.dataType).toArray

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val payloadProj = UnsafeProjection.create(payloadExprs, rOut)
      // codegen'd comparators over the projected key/time rows — the
      // natural-ascending helper builds an interpreted ordering that
      // boxes every field; these stay primitive
      def boundAscOrdering(types: Seq[DataType]) = RowOrdering.create(
        types.zipWithIndex.map { case (dt, i) =>
          SortOrder(BoundReference(i, dt, nullable = true), Ascending) },
        Seq.empty)
      val keyOrd = boundAscOrdering(lKeyExprs.map(_.dataType))
      val timeOrd = boundAscOrdering(Seq(lTimeExpr.dataType))
      val nullPayload = new GenericInternalRow(payloadExprs.size)
      val resultProj = UnsafeProjection.create(outTypes)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // last right row at-or-before the current left row, with its key —
      // the ONLY cross-row state; copied because projections reuse buffers
      var matchKey: UnsafeRow = null
      var matchPayload: UnsafeRow = null

      lIter.map { l =>
        val lk = lKeyProj(l)
        val lt = lTimeProj(l)
        // rights with a smaller key can never match this or any later
        // left row (left keys ascend) — discard
        while (rBuf.hasNext && keyOrd.compare(rKeyProj(rBuf.head), lk) < 0) rBuf.next()
        // consume same-key rights at-or-before lt; the last one consumed
        // is the match (right sorted by time then payload). Rights left
        // unconsumed are strictly after lt and stay for later left rows.
        var consumed = false
        while (rBuf.hasNext && keyOrd.compare(rKeyProj(rBuf.head), lk) == 0 &&
               timeOrd.compare(rTimeProj(rBuf.head), lt) <= 0) {
          matchPayload = payloadProj(rBuf.next()).copy()
          consumed = true
        }
        if (consumed) matchKey = lk.copy()
        val p = if (matchKey != null && keyOrd.compare(matchKey, lk) == 0) matchPayload
                else nullPayload
        numOutputRows += 1
        resultProj(joined(l, p))
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
                                                 newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
