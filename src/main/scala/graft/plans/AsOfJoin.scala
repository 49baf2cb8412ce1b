package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join through the full extension stack — the
  * build brief's ladder rung (c): a custom [[LogicalPlan]] node, a
  * [[Strategy]] mapping it to a custom [[SparkPlan]], registered via
  * `SparkSessionExtensions.injectPlannerStrategy` (see
  * [[graft.functions.GraftExtensions]]).
  *
  * Semantics are identical to the composed [[graft.operators.AsOf.join]]
  * (union + key-ordered window): for every left row, the latest right
  * row with `rightTs <= leftTs` in the same key group; no match ⇒ null
  * payload; null right timestamps never match; null keys group together
  * (window-partition semantics, matching the composed operator — NOT
  * SQL-join null semantics). Equivalence is spec-asserted on real data
  * against both the composed operator and (transitively) the q43 DuckDB
  * oracle.
  *
  * Physical shape — exactly what a 100 TB feature backfill wants:
  * EnsureRequirements hash-partitions both sides on the key and sorts
  * each partition by (key, ts); [[AsOfJoinExec]] then streams the two
  * sorted iterators through a single forward-only merge per partition.
  * One shuffle per side, no window state, no per-row range probing, and
  * memory is O(1) per partition (one buffered right row) versus the
  * window operator's buffered frame.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    payload: Seq[Attribute]) extends BinaryNode {
  // the hand-built plan bypasses analyzer type coercion (the composed
  // operator gets it from unionByName), and HashPartitioning/orderings
  // are type-specific — mismatched sides would silently mis-partition
  // and mis-compare, so fail construction instead
  require(leftKeys.nonEmpty, "as-of join requires at least one key")
  leftKeys.zip(rightKeys).foreach { case (l, r) =>
    require(l.dataType == r.dataType,
      s"as-of key type mismatch: ${l.name}: ${l.dataType} vs " +
        s"${r.name}: ${r.dataType} — cast the sides to a common type")
  }
  require(leftTs.dataType == rightTs.dataType,
    s"as-of timestamp type mismatch: ${leftTs.dataType} vs " +
      s"${rightTs.dataType} — cast the sides to a common type")
  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: AsOfJoinPlan → AsOfJoinExec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, payload) =>
      AsOfJoinExec(lk, rk, lts, rts, payload,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    payload: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  // hash-partition both sides on the key (EnsureRequirements inserts
  // compatible exchanges, exactly as for a sort-merge join)...
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // ...and sort each partition by (key, ts) so one forward merge works
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val ltsA = leftTs
    val rtsA = rightTs
    val payloadA = payload
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rightOut)
      val lTsProj = UnsafeProjection.create(Seq(ltsA), leftOut)
      val rTsProj = UnsafeProjection.create(Seq(rtsA), rightOut)
      val payloadProj = UnsafeProjection.create(payloadA, rightOut)
      // bind against the NULLABLE payload attrs on the input side too:
      // BoundReference takes nullability from the input schema, and a
      // null-check-free projection would read the all-null nullPayload
      // as 0/garbage for primitives on unmatched rows
      val outAttrs = leftOut ++ payloadA.map(_.withNullability(true))
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
      val nullPayload = new GenericInternalRow(payloadA.size)
      val joined = new JoinedRow

      // one-row lookahead over the sorted right side; the latest
      // consumed right row's (key, payload) is the only retained state
      var rNext: InternalRow = if (rIt.hasNext) rIt.next() else null
      var lastKey: UnsafeRow = null
      var lastPayload: UnsafeRow = null

      lIt.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTs = lTsProj(lRow)
        var advance = rNext != null
        while (advance) {
          val rKey = rKeyProj(rNext)
          val cmp = keyOrd.compare(rKey, lKey)
          // null-ness read off the projected single-field ts row — no
          // per-row attribute lookups in the hot path
          val rTs = rTsProj(rNext)
          val rTsNull = rTs.isNullAt(0)
          // consume while (key, ts) <= (lKey, lTs); a null right ts
          // sorts first within its key and never matches (skipped below)
          if (cmp < 0 ||
              (cmp == 0 && (rTsNull || tsOrd.compare(rTs, lTs) <= 0))) {
            if (!rTsNull) {
              lastKey = rKey.copy()
              lastPayload = payloadProj(rNext).copy()
            }
            rNext = if (rIt.hasNext) rIt.next() else null
            advance = rNext != null
          } else advance = false
        }
        val matched = lastKey != null && keyOrd.compare(lastKey, lKey) == 0
        resultProj(joined(lRow, if (matched) lastPayload else nullPayload))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
