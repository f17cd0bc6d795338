package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the declarative higher-order-function dot
  * product
  * {{{
  *   aggregate(zip_with(a, b, (x, y) -> x * y),
  *             cast(0 as double), (acc, v) -> acc + v)
  * }}}
  * into the native codegen [[DotProduct]] expression. Catalyst HOFs run
  * their lambdas through the expression interpreter and fall out of
  * whole-stage codegen; users writing the natural Spark formulation get
  * the fused primitive-loop expression automatically — the engine's
  * auto-vectorization step for the similarity hot path.
  *
  * The rewrite is exact only when both element types are NON-NULLABLE
  * doubles: with a null element the HOF form returns null, while
  * [[DotProduct]] reads primitives. Nullable-element arrays are left
  * untouched. Zip length semantics are preserved with a runtime guard:
  * `zip_with` pads the shorter side with nulls, which under multiply-add
  * yields null, so the rewrite emits
  * `if(size(a) = size(b), DotProduct(a, b), null)` — equal-length rows
  * take the fused loop, mismatched rows return null exactly like the
  * original HOF, and a null array makes the predicate null which also
  * falls through to null.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, containsNull) => !containsNull
    case _ => false
  }

  private def sameVars(vars: Seq[NamedExpression], x: Expression,
                       y: Expression): Boolean = (x, y) match {
    case (xv: NamedLambdaVariable, yv: NamedLambdaVariable) =>
      Set(xv.exprId, yv.exprId) == vars.map(_.exprId).toSet &&
        xv.exprId != yv.exprId
    case _ => false
  }

  private def isZero(e: Expression): Boolean = e match {
    case Literal(0.0d, DoubleType) => true
    case _ => false
  }

  private def isIdentity(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      v.exprId == a.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(Multiply(x, y, _), zipVars, _)),
            zero,
            LambdaFunction(Add(l, r, _), mergeVars, _),
            finish: LambdaFunction)
          if isZero(zero) && isIdentity(finish) &&
            sameVars(zipVars, x, y) && sameVars(mergeVars, l, r) &&
            isDoubleArray(a) && isDoubleArray(b) =>
        If(EqualTo(Size(a), Size(b)), DotProduct(a, b),
          Literal(null, DoubleType))
    }
}
