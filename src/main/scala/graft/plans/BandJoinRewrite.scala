package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, DateType, DoubleType, LongType, TimestampType}

/** Optimizer rule: plan a timestamp "band join" as an equi-join.
  *
  * A join whose only condition is a band predicate —
  * `p.ts >= i.start AND p.ts <= i.end` (any mix of strict/non-strict
  * bounds, `BETWEEN` included) — has no equi keys, so Spark falls back
  * to `BroadcastNestedLoopJoin`: O(points × intervals) with an
  * interpreted predicate, a non-starter when both sides are large. This
  * rule rewrites the LOGICAL join into the bucketized form of
  * [[graft.ops.RangeJoin.pointInInterval]]: bucket time to a coarse
  * grain, explode each interval to the buckets it overlaps, equi-join
  * on bucket id (hash-partitioned, AQE-skew-splittable), and keep the
  * original band predicate as the exact filter. Each matching pair
  * arises in exactly one bucket — the point's — so no dedup is needed
  * and the rewrite is result-identical for INNER joins.
  *
  * The win over the operator API: a user's existing
  * `SELECT ... FROM p JOIN i ON p.ts BETWEEN i.s AND i.e` speeds up
  * unchanged — the engine recognizes the shape, the query text doesn't
  * carry the trick.
  *
  * Bails out (leaves the join untouched) when: any equi conjunct
  * already exists (hash join is already available); the join is not
  * INNER; the point/bound expressions are not both `TimestampType` or
  * both `DateType`; or either side's expressions are nondeterministic.
  * Fires at most once per join: the rewritten join contains an equi
  * conjunct, which fails the first guard on the next optimizer pass.
  *
  * Install on an existing session via [[graft.GraftSession.install]]
  * (`spark.experimental.extraOptimizations`) or at session build via
  * `spark.sql.extensions=graft.plans.GraftSparkExtensions`. Bucket
  * width: `spark.graft.bandjoin.bucketSeconds` (default 3600); kill
  * switch: `spark.graft.bandjoin.enabled`.
  */
object BandJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledConf = "spark.graft.bandjoin.enabled"
  val BucketSecondsConf = "spark.graft.bandjoin.bucketSeconds"

  /** floor(unix_micros(e) / usec) as LONG — the same bucket formula as
    * RangeJoin.pointInInterval, so plans agree across both paths.
    * (Double division is exact enough: |unix_micros| < 2^53 for all
    * representable timestamps within ±280,000 years of epoch.)
    * DateType buckets by days instead, at `max(1, bucketSeconds/86400)`
    * days per bucket. */
  private def bucketOf(e: Expression, bucketSeconds: Long): Expression = {
    val ticks = e.dataType match {
      case TimestampType => (UnixMicros(e), bucketSeconds * 1000000L)
      case DateType      => (UnixDate(e), math.max(1L, bucketSeconds / 86400L))
    }
    Cast(Floor(Divide(Cast(ticks._1, DoubleType), Literal(ticks._2.toDouble))), LongType)
  }

  private def bandType(t: DataType): Boolean =
    t == TimestampType || t == DateType

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledConf, "true").toBoolean) return plan
    val bucketSeconds = conf.getConfString(BucketSecondsConf, "3600").toLong
    plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), _) =>
        rewrite(j, bucketSeconds).getOrElse(j)
    }
  }

  /** (point expr, side holding the point, bound expr from the other
    * side, isLowerBound) readings of one comparison conjunct. */
  private def boundCandidates(
      c: Expression, left: LogicalPlan, right: LogicalPlan)
      : Seq[(Expression, LogicalPlan, Expression, Boolean)] = {
    def refsOnly(e: Expression, p: LogicalPlan): Boolean =
      e.deterministic && e.references.nonEmpty && e.references.subsetOf(p.outputSet)
    def mk(pt: Expression, bd: Expression, lower: Boolean) =
      for {
        ps <- Seq(left, right).find(p => refsOnly(pt, p)).toSeq
        bs <- Seq(left, right).find(p => refsOnly(bd, p)).toSeq
        if !(ps eq bs) && pt.dataType == bd.dataType && bandType(pt.dataType)
      } yield (pt, ps, bd, lower)
    c match {
      // a >= b reads as: a lower-bounded by b, OR b upper-bounded by a
      case GreaterThanOrEqual(a, b) => mk(a, b, lower = true) ++ mk(b, a, lower = false)
      case GreaterThan(a, b)        => mk(a, b, lower = true) ++ mk(b, a, lower = false)
      case LessThanOrEqual(a, b)    => mk(a, b, lower = false) ++ mk(b, a, lower = true)
      case LessThan(a, b)           => mk(a, b, lower = false) ++ mk(b, a, lower = true)
      case _ => Seq.empty
    }
  }

  private def rewrite(j: Join, bucketSeconds: Long): Option[LogicalPlan] = {
    val Join(left, right, _, Some(cond), hint) = j
    val conjuncts = splitConjunctivePredicates(cond)

    def crossSide(a: Expression, b: Expression): Boolean = {
      val (ra, rb) = (a.references, b.references)
      ra.nonEmpty && rb.nonEmpty &&
        ((ra.subsetOf(left.outputSet) && rb.subsetOf(right.outputSet)) ||
         (ra.subsetOf(right.outputSet) && rb.subsetOf(left.outputSet)))
    }
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b)       => crossSide(a, b)
      case EqualNullSafe(a, b) => crossSide(a, b)
      case _                   => false
    }
    if (hasEqui) return None

    val cands = conjuncts.flatMap(boundCandidates(_, left, right))
    val pair = (for {
      lo <- cands if lo._4
      hi <- cands if !hi._4
      if (lo._2 eq hi._2) && lo._1.canonicalized == hi._1.canonicalized
    } yield (lo, hi)).headOption

    pair.map { case ((pt, pointSide, start, _), (_, _, end, _)) =>
      val intervalSide = if (pointSide eq left) right else left

      val pAlias = Alias(bucketOf(pt, bucketSeconds), "_graft_point_bucket")()
      val pProj = Project(pointSide.output :+ pAlias, pointSide)

      // timeZoneId must be pinned by hand: Sequence is TimeZoneAware and
      // reports unresolved without one, but ResolveTimeZone only runs in
      // the analyzer — optimizer-introduced expressions are on their own.
      //
      // The ascending Sequence throws on an inverted interval (end bucket
      // < start bucket — e.g. dirty end < start rows, which the original
      // nested-loop join handles by matching nothing), so guard it: an
      // inverted row yields a null array and drops at the explode, exactly
      // the no-match semantics of the unrewritten join.
      val bStart = bucketOf(start, bucketSeconds)
      val bEnd = bucketOf(end, bucketSeconds)
      val seqExpr = If(
        LessThanOrEqual(bStart, bEnd),
        Sequence(bStart, bEnd, Some(Literal(1L)), Some(conf.sessionLocalTimeZone)),
        Literal.create(null, org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)))
      val bAttr = AttributeReference("_graft_interval_bucket", LongType,
        nullable = false)()
      val gen = Generate(Explode(seqExpr), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(bAttr),
        child = intervalSide)

      val (newLeft, newRight) =
        if (pointSide eq left) (pProj, gen) else (gen, pProj)
      val newCond = And(EqualTo(pAlias.toAttribute, bAttr), cond)
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
    }
  }
}

/** `spark.sql.extensions` entry point: installs the graft optimizer
  * rules at session build time (the config-file path for clusters;
  * [[graft.GraftSession.install]] is the programmatic path for an
  * already-built session). */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => BandJoinRewrite)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // every graft SQL function rides the same extension: a cluster
    // configured with ONLY spark.sql.extensions (no Scala-side
    // GraftSession.install) still resolves vec_dot/simhash64/… in SQL
    graft.functions.TextExprs.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions.TextExprs", name),
        builder))
    }
  }
}
