package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native backward as-of join — graft's operator at the full custom-plan
  * tier: LogicalPlan node + planner Strategy + physical SparkPlan.
  *
  * Semantics (pandas merge_asof direction='backward'; reference use case:
  * enrich each probe event with the latest reference row at-or-before its
  * time, per key): for every left row, the single right row with the
  * greatest `rightTime <= leftTime` among equal-key rows — ties on time
  * broken by the caller-supplied tiebreak order (greatest wins), no match
  * → right side null (left-outer semantics).
  *
  * Why a custom operator: the composable forms both carry hidden costs at
  * scale. The union+window form (`q_asof_join`) funnels probe AND
  * reference rows through one window sort and carries every probe column
  * past the window; the subquery form re-scans per row. This exec is the
  * textbook streamed merge: each side shuffles ONCE on the key, sorts
  * (key, time) — map-side spillable sorts — and the join itself is a
  * single forward pass over both sorted iterators per partition, O(|L|+|R|)
  * with O(1) state (one buffered candidate row). The plan shape is
  * exactly a sort-merge join's, with the probe side streamed.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTiebreak: Seq[Expression]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] to [[AsOfJoinExec]]; injected via
  * `GraftExtensions` (SparkSessionExtensions.injectPlannerStrategy). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tb) =>
      AsOfJoinExec(lk, rk, lt, rt, tb, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTiebreak: Seq[Expression],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Both sides cluster on their keys; EnsureRequirements co-partitions
    * the two shuffles (same machinery as a shuffled equi join). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** (key, time) ascending per partition — the merge's only requirement.
    * The right side additionally sorts its tiebreak so equal-time rows
    * arrive in deterministic order (last consumed = greatest wins). */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTime +: rightTiebreak)).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val lOut = left.output
    val rOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(keyTypes)
      val timeOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(Seq(timeType))
      // bind against the NULLABLE output schema (right side may be the
      // all-null row; binding to the original non-null attrs would skip
      // the null checks and read zeros)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      // NULL semantics (pandas merge_asof / the SQL subquery oracle): a
      // NULL key or NULL time NEVER matches. Without this filter the
      // nulls-first sort ordering would make a NULL-time right row sort
      // before every real time and qualify as a candidate for all of them,
      // and NULL keys on both sides would compare equal and "match".
      val buffered = rIter
        .filter(r => !rKeyProj(r).anyNull && !rTimeProj(r).isNullAt(0))
        .buffered
      // one-candidate state: the latest right row whose (key, time) is
      // <= the current left row's; `candKey` guards against key changes
      var candidate: InternalRow = null
      var candKey: InternalRow = null

      lIter.map { lRow =>
        val lk = lKeyProj(lRow)
        val lt = lTimeProj(lRow)
        // a NULL-keyed/timed left row matches nothing; it also consumes no
        // right rows (nulls sort first, so no right row precedes it)
        val lNull = lk.anyNull || lt.isNullAt(0)
        if (!lNull) {
          // drop right rows (and any stale candidate) for keys before lk
          while (buffered.hasNext && keyOrd.compare(rKeyProj(buffered.head), lk) < 0) {
            buffered.next()
            candidate = null
            candKey = null
          }
          // consume equal-key rows with time <= lt; last one wins
          var advanced = true
          while (advanced && buffered.hasNext) {
            val h = buffered.head
            if (keyOrd.compare(rKeyProj(h), lk) == 0 &&
                timeOrd.compare(rTimeProj(h), lt) <= 0) {
              candidate = buffered.next().copy()
              candKey = rKeyProj(candidate).copy()
            } else {
              advanced = false
            }
          }
        }
        val matched = !lNull &&
          candidate != null && candKey != null && keyOrd.compare(candKey, lk) == 0
        resultProj(joined(lRow, if (matched) candidate else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public API for the native as-of join. */
object AsOf {

  /** Backward as-of join `left` (probes) against `right` (references) on
    * `key`: each left row picks the right row with the greatest
    * `rightTimeCol <= leftTimeCol` for its key (ties on time: greatest
    * `tiebreak`), or nulls. Right columns come back suffixed with
    * `rightSuffix` (also guarantees fresh attribute ids, so self-as-of
    * over one table is safe). NULL key or time on EITHER side never
    * matches (pandas merge_asof semantics): null-keyed/timed left rows
    * emit all-null right columns, null-keyed/timed right rows are never
    * candidates. */
  def joinBackward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTimeCol: String,
      rightTimeCol: String,
      tiebreak: String,
      rightSuffix: String = "_r"): DataFrame = {
    val r2 = right.select(right.columns.map(c => col(c).as(c + rightSuffix)): _*)
    val lp = left.queryExecution.analyzed
    val rp = r2.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in [${p.output.map(_.name).mkString(", ")}]"))
    val node = AsOfJoinPlan(
      lp, rp,
      Seq(attr(lp, key)), Seq(attr(rp, key + rightSuffix)),
      attr(lp, leftTimeCol), attr(rp, rightTimeCol + rightSuffix),
      Seq(attr(rp, tiebreak + rightSuffix)))
    ColumnBridge.ofRows(left.sparkSession, node)
  }
}
