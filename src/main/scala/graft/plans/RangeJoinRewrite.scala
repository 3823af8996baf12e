package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite declarative range joins into the bucketed
  * equi-join encoding, automatically.
  *
  * A join whose condition carries `pt >= lo AND pt <= hi` (a BETWEEN
  * against columns of the other side) has no equi-key Spark can hash on
  * for the range part; with no other key it plans as
  * BroadcastNestedLoopJoin — O(|L|·|R|) pair evaluation at scale. The
  * [[graft.ops.RangeJoin]] operator fixes this when called explicitly;
  * this rule applies THE SAME rewrite to any eligible join, so plain SQL
  *
  *   SELECT ... FROM clicks c JOIN windows w
  *   ON c.t BETWEEN w.lo AND w.hi       -- (+ any other conjuncts)
  *
  * gets the binned plan without the query author knowing the trick
  * (Databricks exposes this as the RANGE_JOIN hint; DuckDB/Postgres use
  * interval trees — binning is the shuffle-architecture equivalent):
  *
  *   - point side gains `_graft_bucket_p = floor(pt / w)` (projection);
  *   - interval side explodes to the buckets it overlaps
  *     (`explode(sequence(floor(lo/w), floor(hi/w)))`);
  *   - bucket equality joins; the ORIGINAL condition stays as the
  *     residual, so semantics are unchanged — bucket equality is implied
  *     by `pt ∈ [lo, hi]`, and each pair meets in exactly one bucket, so
  *     no duplicates and no lost pairs.
  *
  * Gated on `spark.graft.rangejoin.bucketwidth` (off when unset/≤0):
  * width is a physical tuning choice (≈ the typical interval length) the
  * user must make, exactly like the Databricks hint parameter. Only fires
  * on Inner joins over LongType bounds (epoch micros, ids); strict and
  * non-strict bounds both qualify.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.rangejoin.bucketwidth"
  private val Marker = "_graft_bucket"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // Defensive parse: a malformed width must DISABLE the rule, not throw
    // NumberFormatException into the optimization of every query on the
    // session.
    val width = scala.util.Try(
      conf.getConfString(WidthConf, "0").trim.toLong).getOrElse {
      logWarning(s"ignoring malformed $WidthConf; range-join rewrite disabled")
      0L
    }
    if (width <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !alreadyRewritten(j) =>
        findRangePair(cond, left, right) match {
          case Some((pt, lo, hi)) => rewrite(j, left, right, cond, hint, pt, lo, hi, width)
          case None => j
        }
    }
  }

  private def alreadyRewritten(j: Join): Boolean =
    j.children.exists(_.output.exists(_.name.startsWith(Marker)))

  /** Normalize comparisons to (smaller, larger); a range pair is one
    * expression `pt` bounded below and above by expressions of the other
    * join side, all LongType. */
  private def findRangePair(
      cond: Expression,
      left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression)] = {
    val ordered = splitConjunctivePredicates(cond).collect {
      case LessThan(a, b)           => (a, b)
      case LessThanOrEqual(a, b)    => (a, b)
      case GreaterThan(a, b)        => (b, a)
      case GreaterThanOrEqual(a, b) => (b, a)
    }.filter { case (a, b) => a.dataType == LongType && b.dataType == LongType }

    def sideOf(e: Expression): Option[Boolean] = // Some(true)=left
      if (e.references.nonEmpty && e.references.subsetOf(left.outputSet)) Some(true)
      else if (e.references.nonEmpty && e.references.subsetOf(right.outputSet)) Some(false)
      else None

    // (lo, pt) lower bounds × (pt, hi) upper bounds sharing the same pt
    (for {
      (lo, p1) <- ordered.iterator
      (p2, hi) <- ordered.iterator
      if p1.semanticEquals(p2)
      pSide <- sideOf(p1)
      loSide <- sideOf(lo)
      hiSide <- sideOf(hi)
      if loSide != pSide && hiSide != pSide
    } yield (p1, lo, hi)).nextOption()
  }

  private def rewrite(
      j: Join,
      left: LogicalPlan,
      right: LogicalPlan,
      cond: Expression,
      hint: JoinHint,
      pt: Expression,
      lo: Expression,
      hi: Expression,
      width: Long): LogicalPlan = {
    // Floor-division in pure Long arithmetic (negative-safe via pmod).
    // The earlier floor(cast(e AS double) / w) was exact only below 2^53 —
    // above that, bucket ids drift/merge for the general 64-bit keys this
    // rule accepts (monotone rounding kept pairs exact, but bucket balance
    // and the one-bucket-per-point invariant degraded).
    def bucketOf(e: Expression): Expression =
      IntegralDivide(Subtract(e, Pmod(e, Literal(width))), Literal(width))

    val ptOnLeft = pt.references.subsetOf(left.outputSet)
    val (pointSide, intervalSide) = if (ptOnLeft) (left, right) else (right, left)

    val pAlias = Alias(bucketOf(pt), s"${Marker}_p")()
    val pointPlan = Project(pointSide.output :+ pAlias, pointSide)

    val iAttr = AttributeReference(s"${Marker}_i", LongType, nullable = false)()
    // Sequence is TimeZoneAwareExpression — unresolved until the zone is
    // bound, even for integral sequences
    val intervalPlan = Generate(
      Explode(new Sequence(bucketOf(lo), bucketOf(hi), None,
        Some(conf.sessionLocalTimeZone))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(iAttr), child = intervalSide)

    val (newLeft, newRight) =
      if (ptOnLeft) (pointPlan, intervalPlan) else (intervalPlan, pointPlan)
    // bucket equality joins; the ORIGINAL condition rides along as the
    // residual — SMJ/SHJ evaluate it per bucket-matched pair
    val newCond = And(cond, EqualTo(pAlias.toAttribute, iAttr))
    Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
  }
}
