package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two `array<double>` columns.
  *
  * Why a custom Expression (SURVEY §4: the single place built-ins can't
  * express the semantics *efficiently*): Catalyst higher-order functions
  * (`aggregate`/`zip_with`) evaluate their lambda per element through the
  * expression interpreter and are excluded from whole-stage codegen; a
  * Scala UDF boxes every element into `Seq[Double]`. On the quadratic
  * pairwise-similarity paths (near-dup scans, brute-force top-k) both
  * dominate the runtime. This expression reads primitive doubles straight
  * out of `ArrayData` inside generated code — no boxing, no virtual lambda
  * dispatch, fused into the surrounding codegen stage.
  *
  * Registered as SQL function `graft_dot` via [[GraftExpressions.register]]
  * (session-scoped) or [[GraftSparkExtensions]] (`spark.sql.extensions`).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // note: Seq[DataType] (covariant) — AbstractDataType is private[sql]
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) {
      throw new IllegalArgumentException(
        s"$prettyName: array length mismatch ($n vs ${y.numElements()})")
    }
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int ${ev.value}_n = $a.numElements();
         |if ($b.numElements() != ${ev.value}_n) {
         |  throw new IllegalArgumentException(
         |    "graft_dot: array length mismatch (" + ${ev.value}_n +
         |    " vs " + $b.numElements() + ")");
         |}
         |double ${ev.value}_s = 0.0;
         |for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_n; ${ev.value}_i++) {
         |  ${ev.value}_s += $a.getDouble(${ev.value}_i) * $b.getDouble(${ev.value}_i);
         |}
         |${ev.value} = ${ev.value}_s;
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
