package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native squared euclidean distance over two `array<double>` columns —
  * [[DotProduct]]'s justification verbatim: higher-order functions
  * interpret their lambda per ELEMENT, so a zip_with+aggregate distance
  * inside a per-centroid `transform` costs 2·d lambda dispatches per
  * centroid (measured: 1M vectors × 256 cells × 64 dims ≈ 300s in
  * StressBench's coarse quantization). This expression is one virtual
  * call per centroid wrapping a primitive while-loop (interpreted path)
  * and a fused loop under whole-stage codegen — the transform lambda
  * remains per-cell, which is the cheap axis.
  *
  * Registered as SQL function `graft_l2sq`.
  */
case class L2DistSq(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_l2sq"

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
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int ${ev.value}_n = $a.numElements();
         |if ($b.numElements() != ${ev.value}_n) {
         |  throw new IllegalArgumentException(
         |    "graft_l2sq: array length mismatch (" + ${ev.value}_n +
         |    " vs " + $b.numElements() + ")");
         |}
         |double ${ev.value}_s = 0.0;
         |for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_n; ${ev.value}_i++) {
         |  double ${ev.value}_d = $a.getDouble(${ev.value}_i) - $b.getDouble(${ev.value}_i);
         |  ${ev.value}_s += ${ev.value}_d * ${ev.value}_d;
         |}
         |${ev.value} = ${ev.value}_s;
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2DistSq =
    copy(left = newLeft, right = newRight)
}
