package graft.plans

import graft.functions.{FloatVecDot, FloatVecNorm}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the idiomatic declarative dot product
  *
  *   aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  *             0.0D, (acc, v) -> acc + v)
  *
  * over two `array<float>` columns into the native codegen'd
  * [[graft.functions.FloatVecDot]] (measured ~40× on pairwise-cosine plans;
  * bit-identical result — both accumulate sequentially in element order).
  *
  * The rewrite is observationally equivalent for EVERY input, including
  * malformed ones: `zip_with` pads the shorter array with nulls and nulls
  * poison the `aggregate` sum, so the declarative shape yields NULL when
  * lengths differ or any element is null — and [[FloatVecDot]] /
  * [[FloatVecNorm]] implement exactly those null semantics (verified in
  * `VecFusionSpec`). No restriction on `containsNull` is needed.
  *
  * Users who write plain Spark higher-order functions get the fast path for
  * free when the library's extensions are installed
  * (`spark.sql.extensions=graft.plans.GraftExtensions`). The match is
  * deliberately conservative: exactly this shape, floats only, identity
  * finish — anything else is left to Catalyst's default evaluation.
  */
object VecFusionRule extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  /** x and y cast (in either order) to double and multiplied. */
  private def isCastProduct(e: Expression, x: NamedLambdaVariable,
      y: NamedLambdaVariable): Boolean = e match {
    case Multiply(Cast(ex, DoubleType, _, _), Cast(ey, DoubleType, _, _), _) =>
      (isVar(ex, x) && isVar(ey, y)) || (isVar(ex, y) && isVar(ey, x))
    case _ => false
  }

  private def isSum(e: Expression, acc: NamedLambdaVariable,
      v: NamedLambdaVariable): Boolean = e match {
    case Add(ea, eb, _) =>
      (isVar(ea, acc) && isVar(eb, v)) || (isVar(ea, v) && isVar(eb, acc))
    case _ => false
  }

  /** x cast to double and squared (x*x). */
  private def isCastSquare(e: Expression, x: NamedLambdaVariable): Boolean = e match {
    case Multiply(Cast(ex, DoubleType, _, _), Cast(ey, DoubleType, _, _), _) =>
      isVar(ex, x) && isVar(ey, x)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(l, r, LambdaFunction(prod, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(merge, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(facc: NamedLambdaVariable), _))
          if isFloatArray(l) && isFloatArray(r) &&
            isCastProduct(prod, x, y) && isSum(merge, acc, v) && isVar(fin, facc) =>
        FloatVecDot(l, r)
      // sqrt(aggregate(transform(a, x -> double(x)*double(x)), 0.0, +)) = vec_norm(a)
      case Sqrt(ArrayAggregate(
            ArrayTransform(a, LambdaFunction(sq, Seq(x: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(merge, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(facc: NamedLambdaVariable), _)))
          if isFloatArray(a) && isCastSquare(sq, x) &&
            isSum(merge, acc, v) && isVar(fin, facc) =>
        FloatVecNorm(a)
    }
}
