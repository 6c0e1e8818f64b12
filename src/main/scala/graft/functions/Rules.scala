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
  * Exactness on degenerate inputs: zip_with pads ragged arrays with
  * nulls and the fold then returns NULL, so the rewrite guards with a
  * runtime length-equality check yielding NULL on mismatch; a NULL
  * array makes the If condition non-true → NULL, matching the fold;
  * and the emitted DotProduct is `nullAware`, null-propagating null
  * ELEMENTS exactly like the fold (the per-element check is only
  * generated when the input type can contain nulls). The guard emits
  * no ArrayAggregate, so the rule is idempotent under fixed-point
  * iteration.
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
        If(EqualTo(Size(left, legacySizeOfNull = false),
            Size(right, legacySizeOfNull = false)),
          DotProduct(left, right, nullAware = true), Literal(null, DoubleType))
    }
}
