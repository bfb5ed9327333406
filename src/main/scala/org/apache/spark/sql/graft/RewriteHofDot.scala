package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Cast, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: recognize the declarative dot-product idiom
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0.0d, (acc, v) => acc + v) }}}
  *
  * (with the analyzer's double-promotion casts on x/y) and substitute the
  * native codegen kernel — [[FloatDot]] for `array<float>` operands,
  * [[DoubleDot]] for `array<double>`. Users and SQL clients write the
  * portable higher-order form; the plan runs the compiled loop (measured
  * 3-4x on the interpreted fold, q113/PROFILING.md).
  *
  * Soundness: the kernels are EXACT HOF equivalents — index-ordered double
  * accumulation, NULL on null array, null element, or length mismatch
  * (zip_with pads the shorter side with null, which nulls the fold) — so
  * the rewrite never changes a result, only the evaluation path; the
  * SimilaritySpec parity pins cover both eval paths and the null cases.
  * Only the canonical promoted form rewrites: a genuinely-float multiply
  * (`x * y` with no double casts, float zipped array) folds through a cast
  * in the MERGE lambda and deliberately does not match.
  *
  * Installed by [[GraftExtensions]] (session extension) and
  * [[GraftExtensions.registerInto]] (post-hoc, via
  * `spark.experimental.extraOptimizations`) — the (c)-rung of the
  * custom-operator ladder: Expression + Rule, no new physical operator
  * needed.
  */
object RewriteHofDot extends Rule[LogicalPlan] {

  /** The lambda variable itself, or its no-op/promotion Cast to double. */
  private def asVar(e: Expression): Option[NamedLambdaVariable] = e match {
    case v: NamedLambdaVariable => Some(v)
    case Cast(v: NamedLambdaVariable, DoubleType, _, _) => Some(v)
    case _ => None
  }

  private def sameVar(a: NamedLambdaVariable, b: NamedLambdaVariable): Boolean =
    a.exprId == b.exprId

  private def rewrite(agg: ArrayAggregate): Expression = agg match {
    case ArrayAggregate(
        ZipWith(l, r,
          LambdaFunction(Multiply(mx, my, _),
            Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
        zero @ Literal(_, DoubleType),
        LambdaFunction(Add(accRef: NamedLambdaVariable, vRef: NamedLambdaVariable, _),
          Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
        LambdaFunction(fin: NamedLambdaVariable, Seq(finVar: NamedLambdaVariable), _))
      if zero.value == 0.0 &&
        sameVar(accRef, acc) && sameVar(vRef, v) && sameVar(fin, finVar) =>
      (asVar(mx), asVar(my)) match {
        // x*y and y*x both match: IEEE multiplication is commutative
        case (Some(a), Some(b))
            if (sameVar(a, x) && sameVar(b, y)) || (sameVar(a, y) && sameVar(b, x)) =>
          (l.dataType, r.dataType) match {
            case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
              FloatDot(l, r)
            case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
              DoubleDot(l, r)
            case _ => agg
          }
        case _ => agg
      }
    case _ => agg
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions { case agg: ArrayAggregate => rewrite(agg) }
}
