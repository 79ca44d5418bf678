package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import graft.functions.VectorExpressions.DotProduct

/** Catalyst optimizer rule: rewrite the declarative higher-order
  * dot-product pattern
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v) }}}
  *
  * into the codegen'd [[DotProduct]] primitive loop. Users write the
  * composable HOF form; the engine plants the fast expression — the
  * same contract Catalyst itself applies (declare the plan, let the
  * optimizer pick the physical form). The rewrite is semantics-
  * preserving BECAUSE DotProduct's edge behavior was pinned to the HOF
  * twin exactly (NULL on length mismatch, NULL on null element —
  * VectorExpressionsSpec); a rule like this is only sound when that
  * equivalence is total.
  *
  * Registered via [[GraftExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftExtensions`, set by
  * GraftSession) — the SparkSessionExtensions path SURVEY.md §7.3
  * reserves for cases where a custom expression genuinely pays off.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  /** The bound lambda variable itself, possibly under a no-op cast to
    * double (present for float arrays, simplified away for double).
    */
  private def asVar(e: Expression): Option[ExprId] = e match {
    case v: NamedLambdaVariable => Some(v.exprId)
    case Cast(v: NamedLambdaVariable, DoubleType, _, _) => Some(v.exprId)
    case _ => None
  }

  private def vectorTyped(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def idsOf(args: Seq[NamedExpression]): Seq[ExprId] =
    args.collect { case v: NamedLambdaVariable => v.exprId }

  /** merge lambda must be exactly acc + v over its two bound vars. */
  private def isPairAdd(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(Add(l, r, _), args, _) if args.length == 2 =>
      val ids = idsOf(args)
      ids.length == 2 &&
        ((asVar(l), asVar(r)) match {
          case (Some(a), Some(b)) => Set(a, b) == ids.toSet
          case _ => false
        })
    case _ => false
  }

  /** zip lambda must be exactly x * y over its two bound vars. */
  private def isPairMul(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(Multiply(l, r, _), args, _) if args.length == 2 =>
      val ids = idsOf(args)
      ids.length == 2 &&
        ((asVar(l), asVar(r)) match {
          case (Some(a), Some(b)) => Set(a, b) == ids.toSet
          case _ => false
        })
    case _ => false
  }

  /** finish lambda must be the identity on its single bound var. */
  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      v.exprId == arg.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, mul: LambdaFunction),
            Literal(0.0, DoubleType),
            merge: LambdaFunction,
            finish)
          if isPairMul(mul) && isPairAdd(merge) && isIdentity(finish) &&
            vectorTyped(a) && vectorTyped(b) =>
        DotProduct(a, b)
    }
}

/** Session extension hook: `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    extensions.injectOptimizerRule(_ => RewriteDotProduct)
}
