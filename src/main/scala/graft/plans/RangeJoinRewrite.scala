package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, EmptyBlock, FalseLiteral, TrueLiteral}
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Marker conjunct for joins this rule has already handled and chosen to
  * LEAVE as theta joins (the bounded overflow branches): evaluates to a
  * constant `true`, but reports itself non-deterministic so no optimizer
  * rule folds it away or pushes it out of the join condition — it must
  * survive in place across optimizer iterations, because its presence is
  * what stops [[RangeJoinRewrite]] from re-splitting its own fallback
  * joins forever. Codegen-transparent (compiles to the literal `true`).
  */
case class GraftRangeFallbackMarker() extends LeafExpression {
  override def nullable: Boolean = false
  override def dataType: DataType = BooleanType
  override def foldable: Boolean = false
  override lazy val deterministic: Boolean = false
  override def eval(input: InternalRow): Any = true
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    ev.copy(code = EmptyBlock, isNull = FalseLiteral, value = TrueLiteral)
}

/** Optimizer rule: rewrite point-in-interval theta joins into binned
  * equi-joins.
  *
  * A join whose condition is ONLY range predicates — `p >= s AND p <= e`
  * with the point on one side and both bounds on the other — has no
  * equi-join key, so Spark plans a BroadcastNestedLoopJoin:
  * O(|points| * |intervals|) compute and the first operator to die at
  * scale. The same query re-expressed as
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
  * '''Bounded explode fan-out.''' Exploding `floor(start/bin)..floor(end/
  * bin)` is unbounded in the interval width: one open-interval sentinel
  * end date (9999-12-31 in an SCD table) would generate millions of bin
  * rows per interval at the one-day default bin. The rewrite therefore
  * SPLITS the interval side on a span cap (`spark.graft.rangeJoin
  * .maxBins`, default 4096 bins per interval): bounded intervals take the
  * binned equi-join; overflow intervals keep the ORIGINAL theta join —
  * but now only over the overflow subset, which is exactly the plan the
  * query had before this rule existed (typically a broadcast
  * nested-loop over a handful of sentinel rows; with AQE an empty
  * overflow branch collapses to an empty relation and its scan never
  * runs). Results are exact: the two branches partition the interval
  * rows, and a `UNION ALL` reassembles them. Overflow branches carry a
  * [[GraftRangeFallbackMarker]] conjunct so the rule never re-splits its
  * own fallback.
  *
  * '''Join types.''' Inner joins rewrite in both orientations;
  * LeftOuter / LeftSemi / LeftAnti rewrite when the point side is the
  * left (preserved) side, RightOuter when it is the right — the binned
  * inner core plus hash anti-joins reconstruct the unmatched rows, so
  * the whole family escapes the nested loop. An outer join whose
  * PRESERVED side is the interval side is left untouched (the exploded
  * copies could not be deduplicated without a shuffle that defeats the
  * point). EXISTS / NOT EXISTS subqueries — which the built-in
  * RewriteSubquery batch would convert to joins only AFTER injected
  * rules run — are converted here when (and only when) the pulled-up
  * join condition qualifies for the binned rewrite; everything else is
  * left for the built-in batch.
  *
  * Guards (all must hold, otherwise the join is left untouched):
  *   - no cross-side equality conjunct (if one exists the planner
  *     already hash-joins and the ranges ride as residual — this also
  *     makes the rule idempotent on its own binned output);
  *   - no [[GraftRangeFallbackMarker]] (idempotent on its own fallback);
  *   - a conjunct pair bounding one side's expression between two
  *     expressions of the other side, over timestamp / timestamp_ntz /
  *     integral types.
  *
  * Configuration: `spark.graft.rangeJoin.enabled` (default true),
  * `spark.graft.rangeJoin.binUs` (bin width in microseconds for
  * timestamps, raw units for integral columns; when unset, derived from
  * the interval side's column statistics if available — span/maxBins —
  * else one day), and `spark.graft.rangeJoin.maxBins` (default 4096).
  * The bin is a PERFORMANCE knob, not a correctness one — size it near
  * the typical interval length (explode factor is len/bin + 1).
  *
  * Registered by [[graft.GraftExtensions]].
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val ENABLED_CONF = "spark.graft.rangeJoin.enabled"
  val BIN_CONF = "spark.graft.rangeJoin.binUs"
  val MAX_BINS_CONF = "spark.graft.rangeJoin.maxBins"
  private val DEFAULT_BIN = 86400000000L // one day in microseconds
  private val DEFAULT_MAX_BINS = 4096L

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ENABLED_CONF, "true").toBoolean) return plan
    val binConf = Option(conf.getConfString(BIN_CONF, null)).map(_.toLong)
    if (binConf.exists(_ <= 0)) return plan
    val maxBins =
      conf.getConfString(MAX_BINS_CONF, DEFAULT_MAX_BINS.toString).toLong
    if (maxBins <= 0) return plan
    plan.transformUp {
      case j @ Join(
            _, _, Inner | LeftOuter | RightOuter | LeftSemi | LeftAnti,
            Some(_), _) =>
        tryRewrite(j, binConf, maxBins).getOrElse(j)
      case f @ Filter(_, _) =>
        rewriteExistential(f, binConf, maxBins).getOrElse(f)
    }
  }

  /** EXISTS / NOT EXISTS range predicates. The built-in RewriteSubquery
    * batch converts existential subqueries to semi/anti joins only AFTER
    * injected operator rules run — so a range-only EXISTS would plan as
    * BroadcastNestedLoopJoin with this rule never seeing a Join node. We
    * therefore perform that conversion OURSELVES, but only when the
    * resulting semi/anti join immediately qualifies for the binned
    * rewrite (tryRewrite returns Some): a decorrelated existential
    * conjunct whose pulled-up join conditions are pure range bounds
    * becomes the rewritten LeftSemi/LeftAnti plan, the remaining
    * conjuncts stay in the Filter above it, and anything else is left
    * for the built-in batch — general subquery semantics (null-aware IN,
    * nested correlation) are never re-implemented here. */
  private def rewriteExistential(
      f: Filter, binConf: Option[Long], maxBins: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(f.condition)
    def attempt(ex: Exists, jt: JoinType): Option[LogicalPlan] = {
      // joinCond must be fully pulled up (decorrelated) and the
      // subquery's output must not collide with the outer plan's
      if (ex.joinCond.isEmpty ||
        ex.plan.exists(_.expressions.exists(
          _.exists(_.isInstanceOf[OuterReference]))) ||
        ex.plan.outputSet.intersect(f.child.outputSet).nonEmpty) None
      else tryRewrite(
        Join(f.child, ex.plan, jt,
          ex.joinCond.reduceOption(And), JoinHint.NONE),
        binConf, maxBins)
    }
    val rewrites = conjuncts.iterator.zipWithIndex.map {
      case (ex: Exists, i) => attempt(ex, LeftSemi).map((i, _))
      case (Not(ex: Exists), i) => attempt(ex, LeftAnti).map((i, _))
      case _ => None
    }
    rewrites.collectFirst { case Some((i, rewritten)) =>
      val rest = conjuncts.patch(i, Nil, 1)
      rest.reduceOption(And)
        .map(Filter(_, rewritten)).getOrElse(rewritten)
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

  /** Internal-value -> binnable-units view of a column-stats bound. */
  private def statVal(v: Any, dt: DataType): Option[Long] = (v, dt) match {
    case (l: Long, _) => Some(l)
    case (i: Int, DateType) => Some(i.toLong * 86400000000L)
    case (i: Int, _) => Some(i.toLong)
    case (s: Short, _) => Some(s.toLong)
    case (b: Byte, _) => Some(b.toLong)
    case _ => None
  }

  /** Stats-informed bin width: when the interval bounds are bare columns
    * with catalog min/max statistics (CBO + ANALYZE), size the bin so the
    * WHOLE table span is ~maxBins bins — then no single interval can
    * overflow the cap. Absent stats (the default config) this yields
    * None and the one-day default applies. */
  private def statsBin(
      plan: LogicalPlan, s: Expression, e: Expression,
      maxBins: Long): Option[Long] = (s, e) match {
    case (sa: Attribute, ea: Attribute) =>
      val st = plan.stats.attributeStats
      for {
        ss <- st.get(sa); es <- st.get(ea)
        mnRaw <- ss.min; mxRaw <- es.max
        lo <- statVal(mnRaw, sa.dataType); hi <- statVal(mxRaw, ea.dataType)
        if hi > lo
      } yield math.max(1L, (hi - lo) / maxBins + 1L)
    case _ => None
  }

  private def tryRewrite(
      j: Join, binConf: Option[Long], maxBins: Long): Option[LogicalPlan] = {
    val Join(l, r, jt, Some(cond), hint) = j
    val conjuncts = splitConjunctivePredicates(cond)
    // our own bounded-overflow fallback: leave it alone
    if (conjuncts.exists(_.exists(_.isInstanceOf[GraftRangeFallbackMarker])))
      return None

    def sideOf(e: Expression): Option[Boolean] = { // Some(true) = left
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(l.outputSet)) Some(true)
      else if (e.references.subsetOf(r.outputSet)) Some(false)
      else None
    }

    // a cross-side equality key means the planner hash-joins already
    // (and marks our own rewritten joins as done); <=> counts — the
    // planner extracts null-safe equality as a hash-join key too
    def crossSide(a: Expression, b: Expression): Boolean =
      (sideOf(a), sideOf(b)) match {
        case (Some(x), Some(y)) => x != y
        case _ => false
      }
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => crossSide(a, b)
      case EqualNullSafe(a, b) => crossSide(a, b)
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
      if (jt match {
        case Inner => true
        case LeftOuter | LeftSemi | LeftAnti => pSide // point preserved
        case RightOuter => !pSide
        case _ => false
      })
      pm <- micros(p1)
      sm <- micros(s)
      em <- micros(e)
    } yield (pSide, pm, sm, em, s, e)

    val pointRewrite = candidates.headOption.map {
      case (pointOnLeft, pm, sRawM, eRawM, sRaw, eRaw) =>
        val ivSide = if (pointOnLeft) r else l
        val binUs = binConf
          .orElse(statsBin(ivSide, sRaw, eRaw, maxBins))
          .getOrElse(DEFAULT_BIN)

        // split the interval side on explode fan-out: span in bins.
        // Negative spans (reversed/corrupt bounds) also go to the
        // fallback branch — Sequence would step BACKWARD through |span|
        // bins (or throw on huge reversals), while the theta branch
        // simply matches nothing for such rows, like the original join
        val span = Subtract(floorDiv(eRawM, binUs), floorDiv(sRawM, binUs))
        val overflow = Coalesce(Seq(
          Or(GreaterThanOrEqual(span, Literal(maxBins)),
            LessThan(span, Literal(0L))),
          Literal(false)))
        val smallIv = Filter(Not(overflow), ivSide)
        val bigIv = Filter(overflow, ivSide)

        val binAttr =
          AttributeReference("__graft_range_bin", LongType, nullable = false)()
        val gen = Generate(
          binsOf(sRawM, eRawM, binUs), Nil, outer = false, None, Seq(binAttr),
          smallIv)
        val binnedCond = And(EqualTo(floorDiv(pm, binUs), binAttr), cond)
        val fallbackCond = And(GraftRangeFallbackMarker(), cond)

        def smallJoin(t: JoinType): Join =
          if (pointOnLeft) Join(l, gen, t, Some(binnedCond), hint)
          else Join(gen, r, t, Some(binnedCond), hint)
        def bigJoin(left: LogicalPlan, t: JoinType): Join =
          if (pointOnLeft) Join(left, bigIv, t, Some(fallbackCond), hint)
          else Join(bigIv, left, t, Some(fallbackCond), hint)

        jt match {
          case Inner =>
            Union(Seq(
              Project(j.output, smallJoin(Inner)),
              Project(j.output, bigJoin(if (pointOnLeft) l else r, Inner))))
          case LeftSemi =>
            // matched by a bounded interval, plus (not matched by a
            // bounded one but matched by an overflow one) — disjoint
            Union(Seq(
              smallJoin(LeftSemi),
              bigJoin(smallJoin(LeftAnti), LeftSemi)))
          case LeftAnti =>
            // matched by neither branch
            bigJoin(smallJoin(LeftAnti), LeftAnti)
          case LeftOuter => // point side = l
            val unmatched = bigJoin(smallJoin(LeftAnti), LeftAnti)
            val nullExt = Project(
              l.output ++ r.output.map(a =>
                Alias(Literal(null, a.dataType), a.name)(exprId = a.exprId)),
              unmatched)
            Union(Seq(
              Project(j.output, smallJoin(Inner)),
              Project(j.output, bigJoin(l, Inner)),
              nullExt))
          case RightOuter => // point side = r
            val unmatched = Join(
              Join(r, gen, LeftAnti, Some(binnedCond), hint),
              bigIv, LeftAnti, Some(fallbackCond), hint)
            val nullExt = Project(
              l.output.map(a =>
                Alias(Literal(null, a.dataType), a.name)(exprId = a.exprId))
                ++ r.output,
              unmatched)
            Union(Seq(
              Project(j.output, smallJoin(Inner)),
              Project(j.output, bigJoin(r, Inner)),
              nullExt))
          case other =>
            throw new IllegalStateException(s"unreachable join type $other")
        }
    }
    pointRewrite.orElse(
      if (jt == Inner)
        intervalRewrite(j, bounds, sideOf, binConf.getOrElse(DEFAULT_BIN),
          maxBins)
      else None)
  }

  /** Interval-overlap shape: `B.start <= A.end AND A.start <= B.end` with
    * no shared point expression. Both sides explode into their bins and a
    * pair is admitted only in the first bin both occupy —
    * `floor(greatest(starts) / bin)`, a predicate rather than a distinct,
    * mirroring [[graft.operators.Temporal.intervalJoin]]. The fan-out cap
    * splits EACH side: (small x small) takes the binned join; (big x *)
    * and (small x big) keep marker-tagged theta joins over the overflow
    * subsets — three branches that exactly partition the pair space. */
  private def intervalRewrite(
      j: Join,
      bounds: Seq[(Expression, Expression)],
      sideOf: Expression => Option[Boolean],
      binUs: Long,
      maxBins: Long): Option[LogicalPlan] = {
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
      def overflowOf(s: Expression, e: Expression): Expression = {
        val span = Subtract(floorDiv(e, binUs), floorDiv(s, binUs))
        // reversed bounds route to the fallback too (see the point form)
        Coalesce(Seq(
          Or(GreaterThanOrEqual(span, Literal(maxBins)),
            LessThan(span, Literal(0L))),
          Literal(false)))
      }
      val ofL = overflowOf(aS, aE)
      val ofR = overflowOf(bS, bE)
      val binL = AttributeReference(
        "__graft_range_bin_l", LongType, nullable = false)()
      val binR = AttributeReference(
        "__graft_range_bin_r", LongType, nullable = false)()
      val genL = Generate(
        binsOf(aS, aE, binUs), Nil, outer = false, None, Seq(binL),
        Filter(Not(ofL), l))
      val genR = Generate(
        binsOf(bS, bE, binUs), Nil, outer = false, None, Seq(binR),
        Filter(Not(ofR), r))
      val dedup =
        EqualTo(binL, floorDiv(Greatest(Seq(aS, bS)), binUs))
      val binnedCond = And(And(EqualTo(binL, binR), dedup), cond)
      val fallbackCond = And(GraftRangeFallbackMarker(), cond)
      Union(Seq(
        Project(j.output, Join(genL, genR, Inner, Some(binnedCond), hint)),
        Project(j.output,
          Join(Filter(ofL, l), r, Inner, Some(fallbackCond), hint)),
        Project(j.output,
          Join(Filter(Not(ofL), l), Filter(ofR, r), Inner,
            Some(fallbackCond), hint))))
    }
  }

  /** Explode expression for the bins an interval spans. Post-analysis
    * construction: TimeZoneAware expressions (Sequence) must carry their
    * zone or the plan flips back to unresolved. */
  private def binsOf(sm: Expression, em: Expression, binUs: Long): Explode =
    Explode(Sequence(floorDiv(sm, binUs), floorDiv(em, binUs), None,
      Some(conf.sessionLocalTimeZone)))
}
