package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite point-in-interval theta joins into binned
  * equi-joins.
  *
  * An inner join whose condition is ONLY range predicates —
  * `p >= s AND p <= e` with the point on one side and both bounds on the
  * other — has no equi-join key, so Spark plans a
  * BroadcastNestedLoopJoin: O(|points| * |intervals|) compute and the
  * first operator to die at scale. The same query re-expressed as
  * [[graft.operators.Temporal.rangeJoin]] — intervals exploded into
  * fixed-width bins, an equi-join on the bin, the original predicates
  * kept as residual — is a plain shuffled hash join.
  *
  * This rule performs that rewrite AUTOMATICALLY for raw SQL/DataFrame
  * theta joins, so `... JOIN iv ON o.ts BETWEEN iv.s AND iv.e` scales
  * without the caller knowing the operator exists. Exactness needs no bin
  * validation: a point occupies exactly one bin, so each qualifying pair
  * meets in exactly one exploded bin copy. The interval-overlap shape
  * (`B.start <= A.end AND A.start <= B.end`, no shared point expression)
  * rewrites too — both sides explode and a first-shared-bin predicate
  * dedups, mirroring [[graft.operators.Temporal.intervalJoin]]; the
  * cheaper single-explode form is preferred when a point expression
  * exists.
  *
  * Guards (all must hold, otherwise the join is left untouched):
  *   - inner join, with NO cross-side equality conjunct (if one exists
  *     the planner already hash-joins and the ranges ride as residual —
  *     this also makes the rule idempotent on its own output);
  *   - a conjunct pair bounding one side's expression between two
  *     expressions of the other side, over timestamp / timestamp_ntz /
  *     integral types.
  *
  * Configuration: `spark.graft.rangeJoin.enabled` (default true) and
  * `spark.graft.rangeJoin.binUs` (default 86400000000, one day): the bin
  * width in microseconds for timestamps, or in raw units for integral
  * columns. The bin is a PERFORMANCE knob, not a correctness one — size
  * it near the typical interval length (explode factor is len/bin + 1).
  *
  * Registered by [[graft.GraftExtensions]].
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val ENABLED_CONF = "spark.graft.rangeJoin.enabled"
  val BIN_CONF = "spark.graft.rangeJoin.binUs"
  private val DEFAULT_BIN = 86400000000L // one day in microseconds

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ENABLED_CONF, "true").toBoolean) return plan
    val binUs = conf.getConfString(BIN_CONF, DEFAULT_BIN.toString).toLong
    if (binUs <= 0) return plan
    plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), _) =>
        tryRewrite(j, binUs).getOrElse(j)
    }
  }

  /** Epoch-micros (or raw integral) view of an expression, when its type
    * supports binning. */
  private def micros(e: Expression): Option[Expression] = e.dataType match {
    case TimestampType => Some(UnixMicros(e))
    case TimestampNTZType | DateType =>
      // NTZ/date -> instant under the session zone (the engine pins UTC)
      Some(UnixMicros(Cast(e, TimestampType, Some(conf.sessionLocalTimeZone))))
    case LongType => Some(e)
    case IntegerType | ShortType | ByteType => Some(Cast(e, LongType))
    case _ => None
  }

  /** floor(a / b) for a possibly-negative long `a` (pre-epoch timestamps):
    * IntegralDivide truncates toward zero, so subtract the non-negative
    * Pmod remainder first — the difference is exactly divisible. */
  private def floorDiv(a: Expression, b: Long): Expression = {
    val lit = Literal(b)
    IntegralDivide(Subtract(a, Pmod(a, lit)), lit)
  }

  private def tryRewrite(j: Join, binUs: Long): Option[LogicalPlan] = {
    val Join(l, r, _, Some(cond), hint) = j
    val conjuncts = splitConjunctivePredicates(cond)

    def sideOf(e: Expression): Option[Boolean] = { // Some(true) = left
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(l.outputSet)) Some(true)
      else if (e.references.subsetOf(r.outputSet)) Some(false)
      else None
    }

    // a cross-side equality key means the planner hash-joins already
    // (and marks our own rewritten joins as done)
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (sideOf(a), sideOf(b)) match {
          case (Some(x), Some(y)) => x != y
          case _ => false
        }
      case _ => false
    }
    if (hasEqui) return None

    // normalize comparisons to (lo <= hi) pairs; strict bounds stay exact
    // because the original condition rides along as the residual
    val bounds = conjuncts.collect {
      case LessThanOrEqual(a, b) => (a, b)
      case LessThan(a, b) => (a, b)
      case GreaterThanOrEqual(a, b) => (b, a)
      case GreaterThan(a, b) => (b, a)
    }

    val candidates = for {
      (s, p1) <- bounds
      (p2, e) <- bounds
      if p1.canonicalized == p2.canonicalized
      pSide <- sideOf(p1)
      sSide <- sideOf(s)
      eSide <- sideOf(e)
      if sSide == eSide && sSide != pSide
      pm <- micros(p1)
      sm <- micros(s)
      em <- micros(e)
    } yield (pSide, pm, sm, em)

    val pointRewrite = candidates.headOption.map {
      case (pointOnLeft, pm, sm, em) =>
        val binAttr =
          AttributeReference("__graft_range_bin", LongType, nullable = false)()
        val ivSide = if (pointOnLeft) r else l
        val generate = Generate(
          binsOf(sm, em, binUs), Nil, outer = false, None, Seq(binAttr),
          ivSide)
        val newCond = And(EqualTo(floorDiv(pm, binUs), binAttr), cond)
        val newJoin =
          if (pointOnLeft) Join(l, generate, Inner, Some(newCond), hint)
          else Join(generate, r, Inner, Some(newCond), hint)
        // the Generate adds the bin column to the join output; restore
        // the original shape
        Project(j.output, newJoin)
    }
    pointRewrite.orElse(intervalRewrite(j, bounds, sideOf, binUs))
  }

  /** Interval-overlap shape: `B.start <= A.end AND A.start <= B.end` with
    * no shared point expression. Both sides explode into their bins and a
    * pair is admitted only in the first bin both occupy —
    * `floor(greatest(starts) / bin)`, a predicate rather than a distinct,
    * mirroring [[graft.operators.Temporal.intervalJoin]]. */
  private def intervalRewrite(
      j: Join,
      bounds: Seq[(Expression, Expression)],
      sideOf: Expression => Option[Boolean],
      binUs: Long): Option[LogicalPlan] = {
    val Join(l, r, _, Some(cond), hint) = j
    val candidates = for {
      (s1, h1) <- bounds // B.start <= A.end
      (s2, h2) <- bounds // A.start <= B.end
      if sideOf(s1).contains(false) && sideOf(h1).contains(true) &&
        sideOf(s2).contains(true) && sideOf(h2).contains(false)
      aS <- micros(s2); aE <- micros(h1)
      bS <- micros(s1); bE <- micros(h2)
    } yield (aS, aE, bS, bE)
    candidates.headOption.map { case (aS, aE, bS, bE) =>
      val binL = AttributeReference(
        "__graft_range_bin_l", LongType, nullable = false)()
      val binR = AttributeReference(
        "__graft_range_bin_r", LongType, nullable = false)()
      val genL =
        Generate(binsOf(aS, aE, binUs), Nil, outer = false, None, Seq(binL), l)
      val genR =
        Generate(binsOf(bS, bE, binUs), Nil, outer = false, None, Seq(binR), r)
      val dedup =
        EqualTo(binL, floorDiv(Greatest(Seq(aS, bS)), binUs))
      val newCond = And(And(EqualTo(binL, binR), dedup), cond)
      Project(j.output, Join(genL, genR, Inner, Some(newCond), hint))
    }
  }

  /** Explode expression for the bins an interval spans. Post-analysis
    * construction: TimeZoneAware expressions (Sequence) must carry their
    * zone or the plan flips back to unresolved. */
  private def binsOf(sm: Expression, em: Expression, binUs: Long): Explode =
    Explode(Sequence(floorDiv(sm, binUs), floorDiv(em, binUs), None,
      Some(conf.sessionLocalTimeZone)))
}
