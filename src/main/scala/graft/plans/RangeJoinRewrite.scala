package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, ShortType}

/** Optimizer rule: rewrite a naive bounded-range join into the
  * two-bucket equi-join [[graft.operators.Temporal.rangeCountJoin]]
  * uses explicitly — but applied automatically, so a user can WRITE
  * the obvious form
  *
  * {{{ left.join(right, $"l_sec" > $"r_sec" - w && $"l_sec" <= $"r_sec") }}}
  *
  * and still get an equi-join plan. Without this, a join whose only
  * cross-side predicates are inequalities has no equi key, and Spark
  * must plan a BroadcastNestedLoopJoin — O(|L| x |R|) comparisons and
  * a full broadcast of one side; at fact-table scale that is the
  * difference between minutes and never finishing.
  *
  * Rewrite (width w from the literal bound):
  *   - left gains `__rjr_b  = l_sec div w`
  *   - right is exploded to `__rjr_rb IN {r_sec div w, r_sec div w - 1}`
  *     (2x row duplication of the SMALLER candidate space, vs |L| x |R|)
  *   - join on `__rjr_b = __rjr_rb` AND the ORIGINAL condition (kept as
  *     the exact post-filter), then project back to the original output.
  *
  * Soundness: `l > r - w && l <= r` implies `l div w` is `r div w` or
  * `r div w - 1` for any integral l, r and positive w (floor division
  * moves by at most one whole bucket across a window narrower than the
  * bucket), so every matching pair survives bucketing; the original
  * condition re-checked on candidates removes false positives. Applies
  * only when: inner join, both range columns integral, no existing
  * cross-side equality conjunct (if one exists the join already has an
  * equi key and SMJ handles it), and the rewritten join carries an
  * equality — which also makes the rule idempotent.
  *
  * This is the whole-operator extension point (SURVEY §7.3 route (c)):
  * a `Rule[LogicalPlan]` injected via
  * `graft.functions.GraftExtensions` (`spark.sql.extensions`) or
  * `spark.experimental.extraOptimizations`.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val Bucket = "__rjr_b"

  private def integral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | ShortType => true
    case _ => false
  }

  private def longLit(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case _ => None
  }

  /** (lExpr, rExpr, width) for `l > r - w` / `l >= r - w`, either
    * operand order. */
  private def lowerBound(c: Expression): Option[(Expression, Expression, Long)] = c match {
    case GreaterThan(l, Subtract(r, w, _)) => longLit(w).map((l, r, _))
    case GreaterThanOrEqual(l, Subtract(r, w, _)) => longLit(w).map((l, r, _))
    case LessThan(Subtract(r, w, _), l) => longLit(w).map((l, r, _))
    case LessThanOrEqual(Subtract(r, w, _), l) => longLit(w).map((l, r, _))
    case _ => None
  }

  /** (lExpr, rExpr) for `l <= r` / `l < r`, either operand order. */
  private def upperBound(c: Expression): Option[(Expression, Expression)] = c match {
    case LessThanOrEqual(l, r) => Some((l, r))
    case LessThan(l, r) => Some((l, r))
    case GreaterThanOrEqual(r, l) => Some((l, r))
    case GreaterThan(r, l) => Some((l, r))
    case _ => None
  }

  private def sameSide(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val crossEquality = conjuncts.exists {
        case EqualTo(a, b) =>
          (sameSide(a, left) && sameSide(b, right)) ||
            (sameSide(a, right) && sameSide(b, left))
        case _ => false
      }
      val range = if (crossEquality) None else {
        val lowers = conjuncts.flatMap(lowerBound)
        val uppers = conjuncts.flatMap(upperBound)
        lowers.collectFirst {
          case (l, r, w)
              if w > 0 && integral(l) && integral(r) &&
                sameSide(l, left) && sameSide(r, right) &&
                uppers.exists { case (ul, ur) =>
                  ul.semanticEquals(l) && ur.semanticEquals(r)
                } =>
            (l, r, w)
        }
      }
      range match {
        case None => j
        case Some((l, r, w)) =>
          val wLit = Literal(w, LongType)
          val lBucket = Alias(
            IntegralDivide(Cast(l, LongType), wLit), Bucket)()
          val newLeft = Project(left.output :+ lBucket, left)
          val rBucket = IntegralDivide(Cast(r, LongType), wLit)
          val genOut = AttributeReference(
            Bucket + "r", LongType, nullable = true)()
          val newRight = Generate(
            Explode(CreateArray(Seq(rBucket, Subtract(rBucket, Literal(1L))))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(genOut), child = right)
          val newCond = And(EqualTo(lBucket.toAttribute, genOut), cond)
          Project(j.output,
            Join(newLeft, newRight, Inner, Some(newCond), hint))
      }
  }
}
