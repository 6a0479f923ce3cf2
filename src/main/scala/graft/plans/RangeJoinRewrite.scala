package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite constant-width interval joins into bucketed
  * equi-joins.
  *
  * A join whose only cross-side predicate is a band —
  *
  *   points JOIN intervals ON v >= lo AND v <= lo + W     (W literal > 0)
  *   (also spelled `v BETWEEN lo AND lo + W`)
  *
  * — has no equi-conjunct, so Spark plans BroadcastNestedLoopJoin:
  * O(|P|·|I|) compares, a driver-killer the moment neither side fits a
  * broadcast. When the band width is a positive literal the join is
  * mechanically transformable: quantize the value axis into width-W
  * buckets, explode each interval onto the (at most 2) buckets it covers,
  * and equi-join on the bucket id with the original band predicate kept
  * as a residual filter. Same rows out, but the plan becomes a shuffled
  * hash/sort-merge join on a well-distributed long key — linear, AQE-
  * splittable, 100 TB-safe.
  *
  * Scope guards (the rule must never change semantics or fight the
  * planner): fires only on Inner/Cross joins, only when NO equi-conjunct
  * already exists (Spark would hash-join those fine), and only when the
  * width is statically known. Disable with
  * `spark.graft.rangeJoin.enabled=false`. The same rewrite is available
  * explicitly as graft.operators.RangeJoin for arbitrary lo/hi columns.
  */
case class RangeJoinRewrite(session: SparkSession)
  extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    session.conf.get("spark.graft.rangeJoin.enabled", "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case j @ Join(l, r, Inner | Cross, Some(cond), hint)
          if j.resolved && findBand(j, l, r, cond).isDefined =>
        val (v, lo, hi, w, vFromLeft) = findBand(j, l, r, cond).get
        val width = Literal(w, DoubleType)

        def bucketOf(e: Expression): Expression =
          Floor(Divide(Cast(e, DoubleType), width))

        // interval side: explode onto the covering buckets
        // [floor(lo/W), floor(hi/W)] — at most 2 for width-W bands. Use
        // the ORIGINAL hi expression (already typed by the analyzer);
        // reconstructing lo + W here with a double literal would be
        // ill-typed for integer/decimal bound columns
        val iBucket = AttributeReference("__graft_bucket_i", LongType, nullable = false)()
        val (pointSide, intervalSide) = if (vFromLeft) (l, r) else (r, l)
        // Sequence is TimeZoneAwareExpression: post-analysis construction
        // must supply the zone itself or the plan turns unresolved
        val buckets = new Sequence(bucketOf(lo), bucketOf(hi), None,
          Some(session.sessionState.conf.sessionLocalTimeZone))
        val gen = Generate(
          Explode(buckets),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(iBucket), child = intervalSide)

        // point side: single bucket per row
        val pAlias = Alias(bucketOf(v), "__graft_bucket_p")()
        val proj = Project(pointSide.output :+ pAlias, pointSide)

        val newCond = And(EqualTo(pAlias.toAttribute, iBucket), cond)
        val newJoin =
          if (vFromLeft) Join(proj, gen, Inner, Some(newCond), hint)
          else Join(gen, proj, Inner, Some(newCond), hint)
        Project(j.output, newJoin)
    }

  /** Find a constant-width band among the conjuncts: returns (point value
    * expr, interval lower bound expr, upper bound expr, width,
    * value-from-left). Bails if any equi-conjunct spans both sides (the
    * planner hash-joins those without help). */
  private def findBand(j: Join, l: LogicalPlan, r: LogicalPlan,
                       cond: Expression): Option[(Expression, Expression, Expression, Double, Boolean)] = {
    val conjuncts = splitConjunctivePredicates(cond)
    def sided(e: Expression): Option[Boolean] = // Some(true)=left, Some(false)=right
      if (e.references.nonEmpty && e.references.subsetOf(l.outputSet)) Some(true)
      else if (e.references.nonEmpty && e.references.subsetOf(r.outputSet)) Some(false)
      else None
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => (sided(a), sided(b)) match {
        case (Some(x), Some(y)) => x != y
        case _ => false
      }
      case _ => false
    }
    if (hasEqui || j.condition.exists(_.exists(_.isInstanceOf[SubqueryExpression]))) return None

    // normalize comparisons to (value, bound, isLower)
    val bounds = conjuncts.flatMap {
      case GreaterThanOrEqual(a, b) => Seq((a, b, true), (b, a, false))
      case LessThanOrEqual(a, b)    => Seq((a, b, false), (b, a, true))
      case _ => Seq.empty
    }.filter { case (v, b, _) =>
      (sided(v), sided(b)) match { case (Some(x), Some(y)) => x != y; case _ => false }
    }.filter { case (v, b, _) =>
      v.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] && v.deterministic && b.deterministic
    }

    val lowers = bounds.filter(_._3)
    val uppers = bounds.filterNot(_._3)
    (for {
      (v, lo, _) <- lowers
      (v2, hi, _) <- uppers if v2.semanticEquals(v)
      w <- constWidth(lo, hi)
    } yield (v, lo, hi, w, sided(v).get)).headOption
  }

  /** hi must be lo + positive literal (either operand order). */
  private def constWidth(lo: Expression, hi: Expression): Option[Double] = {
    def num(l: Literal): Option[Double] = l.value match {
      case n: java.lang.Number => Some(n.doubleValue()); case _ => None
    }
    hi match {
      case Add(e, lit: Literal, _) if e.semanticEquals(lo) => num(lit).filter(_ > 0)
      case Add(lit: Literal, e, _) if e.semanticEquals(lo) => num(lit).filter(_ > 0)
      case _ => None
    }
  }
}
