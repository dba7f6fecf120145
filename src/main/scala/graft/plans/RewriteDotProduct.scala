package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the portable higher-order dot product
  *
  * {{{ aggregate(zip_with(a, b, (u, v) => u * v), 0.0, (acc, x) => acc + x) }}}
  *
  * into the native [[ArrayDot]] kernel. The HOF formulation evaluates an
  * interpreted lambda per element (~20× slower on all-pairs similarity);
  * after this rule, any user query written in the natural declarative
  * style gets kernel speed without knowing `array_dot` exists.
  *
  * Guards: inputs must be float/double arrays (a mixed pair widens the
  * float side with an exact array cast) and the aggregate must be exactly
  * the left-to-right sum-of-products fold, so the rewrite is bit-identical
  * (same accumulation order in double).
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def stripToDouble(e: Expression): Expression = e match {
    case Cast(c, DoubleType, _, _) => c
    case other => other
  }

  /** Align the input pair to a common element type for [[ArrayDot]].
    * Same-typed float/float and double/double pass through; mixed
    * float/double widens the float side with an array cast. float→double
    * widening is exact and the fold already multiplies in double, so the
    * inserted cast is bit-identical — it just happens once per array
    * instead of once per element inside an interpreted lambda (the
    * mixed-type case is exactly the SRP-banding hot path: a float vector
    * column dotted against a double literal hyperplane). */
  private def aligned(l: Expression, r: Expression): Option[(Expression, Expression)] =
    (l.dataType, r.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => Some((l, r))
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => Some((l, r))
      case (ArrayType(FloatType, cn), ArrayType(DoubleType, _)) =>
        Some((Cast(l, ArrayType(DoubleType, cn)), r))
      case (ArrayType(DoubleType, _), ArrayType(FloatType, cn)) =>
        Some((l, Cast(r, ArrayType(DoubleType, cn))))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(l, r, LambdaFunction(mult, Seq(x, y), _)),
            Literal(zero, DoubleType),
            LambdaFunction(add, Seq(acc, el), _),
            LambdaFunction(fin, Seq(finArg), _))
          if zero == 0.0 && aligned(l, r).isDefined &&
            isProductOf(mult, x, y) && isSum(add, acc, el) &&
            fin.semanticEquals(finArg) =>
        val (al, ar) = aligned(l, r).get
        ArrayDot(al, ar)
    }

  private def isProductOf(e: Expression, x: Expression, y: Expression): Boolean =
    e match {
      case Multiply(a, b, _) =>
        stripToDouble(a).semanticEquals(x) && stripToDouble(b).semanticEquals(y)
      case _ => false
    }

  private def isSum(e: Expression, acc: Expression, el: Expression): Boolean =
    e match {
      case Add(a, b, _) =>
        a.semanticEquals(acc) && stripToDouble(b).semanticEquals(el)
      case _ => false
    }
}
