package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Optimizer rule: rewrite a PURE interval join (point BETWEEN lo AND hi
  * with no equi-key) into a bin-bucketed equi join.
  *
  * Spark plans an inner join whose condition is only range predicates as
  * BroadcastNestedLoopJoin (or a cartesian product) — O(|L|·|R|) work
  * that dies at scale. The classic fix is manual binning (`q_range_join`
  * composes it by hand when an equi key exists). This rule applies the
  * same rewrite AUTOMATICALLY when the join has no equality conjunct:
  *
  *   L ⋈[p ≥ lo ∧ p ≤ hi] R
  *     ⇒ Project(L + lbin = p div W)
  *       ⋈[lbin = rbin ∧ p ≥ lo ∧ p ≤ hi]
  *       Generate(rbin ← explode(sequence(lo div W, hi div W)), R)
  *
  * where `div` is FLOOR division (exact integral form `(x − pmod(x, W))
  * / W`, correct for negative values). Each qualifying pair meets in
  * exactly ONE bin (p's bin lies inside [lo div W, hi div W]), so no
  * dedup is needed; non-qualifying same-bin pairs are removed by the
  * retained range predicates. Cost: |R| × (interval/W + 1) replicated
  * rows shuffled on a uniform key instead of an |L|·|R| loop.
  *
  * Scope guards: inner join, condition is exactly a lower and an upper
  * bound on one LongType point expression from one side against LongType
  * bounds from the other (either orientation, strict or non-strict), and
  * `spark.graft.rangeJoin.binWidth` is set to a positive bin width in the
  * point column's units — the caller knows the interval scale; a width
  * far below the typical interval over-replicates, far above
  * under-prunes. Disabled (no-op) when unset. After the rewrite the join
  * HAS an equality conjunct, so the rule never re-fires (idempotent under
  * the optimizer's fixed-point batch).
  *
  * Registered by [[GraftExtensions]] (injectOptimizerRule) and usable ad
  * hoc via `spark.experimental.extraOptimizations`.
  */
case class RangeJoinRule(fixedWidth: Option[Long] = None) extends Rule[LogicalPlan] {

  private val confKey = "spark.graft.rangeJoin.binWidth"

  private def floorDiv(x: Expression, w: Long): Expression =
    new IntegralDivide(Subtract(x, new Pmod(x, Literal(w))), Literal(w))

  /** (point, lo, hi) when `cond` is a two-sided Long range with the point
    * on `pointSide` and both bounds on the other side. */
  private def asRange(
      conj1: Expression, conj2: Expression,
      pointSide: LogicalPlan, boundSide: LogicalPlan): Option[(Expression, Expression, Expression)] = {
    def from(p: LogicalPlan, e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(AttributeSet(p.output))
    def lower(e: Expression): Option[(Expression, Expression)] = e match {
      case GreaterThanOrEqual(p, lo) if from(pointSide, p) && from(boundSide, lo) => Some((p, lo))
      case GreaterThan(p, lo) if from(pointSide, p) && from(boundSide, lo) => Some((p, lo))
      case LessThanOrEqual(lo, p) if from(pointSide, p) && from(boundSide, lo) => Some((p, lo))
      case LessThan(lo, p) if from(pointSide, p) && from(boundSide, lo) => Some((p, lo))
      case _ => None
    }
    def upper(e: Expression): Option[(Expression, Expression)] = e match {
      case LessThanOrEqual(p, hi) if from(pointSide, p) && from(boundSide, hi) => Some((p, hi))
      case LessThan(p, hi) if from(pointSide, p) && from(boundSide, hi) => Some((p, hi))
      case GreaterThanOrEqual(hi, p) if from(pointSide, p) && from(boundSide, hi) => Some((p, hi))
      case GreaterThan(hi, p) if from(pointSide, p) && from(boundSide, hi) => Some((p, hi))
      case _ => None
    }
    (for ((p1, lo) <- lower(conj1); (p2, hi) <- upper(conj2) if p1.semanticEquals(p2))
      yield (p1, lo, hi)) orElse
    (for ((p1, lo) <- lower(conj2); (p2, hi) <- upper(conj1) if p1.semanticEquals(p2))
      yield (p1, lo, hi))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = fixedWidth.getOrElse(conf.getConfString(confKey, "0").toLong)
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(And(c1, c2)), hint) if j.resolved =>
        val rewritten =
          asRange(c1, c2, left, right).map { case (p, lo, hi) => (left, right, p, lo, hi, true) } orElse
          asRange(c1, c2, right, left).map { case (p, lo, hi) => (right, left, p, lo, hi, false) }
        rewritten match {
          case Some((pointPlan, boundPlan, p, lo, hi, pointIsLeft))
              if p.dataType == LongType && lo.dataType == LongType && hi.dataType == LongType =>
            val lbin = Alias(floorDiv(p, w), "__graft_lbin")()
            val pointSide = Project(pointPlan.output :+ lbin, pointPlan)
            // Sequence is TimeZoneAwareExpression: the analyzer's
            // ResolveTimeZone has already run, so assign the session tz
            // here or the expression stays unresolved
            val binLo = floorDiv(lo, w)
            val binHi = floorDiv(hi, w)
            // inverted intervals (hi < lo) are legal data that the
            // original join answers with zero matches; step-1 Sequence
            // would THROW on them, so guard with an empty-bins branch
            // (null bounds also fall through to the empty branch and the
            // Generate drops the row — same as the original predicates)
            val seqExpr = If(
              LessThanOrEqual(binLo, binHi),
              Sequence(binLo, binHi,
                Some(Literal(1L)), Some(conf.sessionLocalTimeZone)),
              Literal.create(Array.empty[Long],
                org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)))
            val genOut = DataTypeUtils.toAttributes(
              StructType(Seq(StructField("__graft_rbin", LongType, nullable = false))))
            val boundSide = Generate(Explode(seqExpr), unrequiredChildIndex = Nil,
              outer = false, qualifier = None, generatorOutput = genOut, child = boundPlan)
            val newCond = And(EqualTo(lbin.toAttribute, genOut.head), And(c1, c2))
            val (nl, nr) = if (pointIsLeft) (pointSide, boundSide) else (boundSide, pointSide)
            Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
          case _ => j
        }
    }
  }
}
