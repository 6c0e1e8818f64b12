package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the composable lambda dot product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)
  *
  * into the native codegen [[DotProduct]] (`graft_dot`). The two forms
  * are bit-identical (same left-to-right accumulation; asserted in
  * VectorExpressionsSpec), but the higher-order-function form evaluates
  * interpreted lambda closures per element while `graft_dot` is a tight
  * generated loop — users writing idiomatic SQL get the fast path
  * without knowing the native function exists.
  *
  * Matching is deliberately strict: double arrays, multiply of exactly
  * the two zip_with lambda variables (either order), literal 0.0 zero,
  * add of exactly the two aggregate lambda variables (either order),
  * identity finish. Anything else is left untouched.
  *
  * Exactness on degenerate inputs: the emitted DotProduct runs in
  * `foldCompat` mode — NULL on length mismatch (zip_with would
  * null-pad and the fold return NULL), NULL on null elements, NULL on
  * a NULL array — so semantics match the fold for every input while
  * each operand is evaluated exactly once (no guard expression that
  * would double-evaluate expensive or non-deterministic operands).
  * The rewrite emits no ArrayAggregate, so the rule is idempotent
  * under fixed-point iteration.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isVars(e1: Expression, e2: Expression,
      v1: NamedLambdaVariable, v2: NamedLambdaVariable): Boolean =
    (e1, e2) match {
      case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
        (a.exprId == v1.exprId && b.exprId == v2.exprId) ||
          (a.exprId == v2.exprId && b.exprId == v1.exprId)
      case _ => false
    }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(left, right,
            LambdaFunction(Multiply(m1, m2, _),
              Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0d, DoubleType),
          LambdaFunction(Add(a1, a2, _),
            Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(fv: NamedLambdaVariable), _))
          if isVars(m1, m2, x, y) && isVars(a1, a2, acc, el) &&
            fin.exprId == fv.exprId &&
            isDoubleArray(left) && isDoubleArray(right) =>
        DotProduct(left, right, foldCompat = true)
    }
}
