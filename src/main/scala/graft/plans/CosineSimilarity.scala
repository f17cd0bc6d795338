package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused cosine similarity over two numeric arrays: one loop accumulates
  * dot product and both squared norms, `dot / (||a||·||b||)` at the end.
  *
  * Versus unitize-then-[[DotProduct]]: no per-row normalized copy, no
  * float→double array materialization — elements widen in-register. On
  * `array<float>` embedding columns this reads the parquet floats
  * directly. Registered as SQL function `graft_cosine`.
  *
  * Semantics (hardened, round 2): mismatched array lengths throw — a
  * truncated similarity is plausible-but-wrong and must fail fast; a
  * zero-norm vector yields SQL `NULL` (cosine is undefined), never
  * NaN/Infinity. Non-float/double element types are rejected at analysis
  * time via [[checkInputDataTypes]].
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // zero-norm inputs produce NULL even when children are non-nullable
  override def nullable: Boolean = true

  override def prettyName: String = "graft_cosine"

  override def checkInputDataTypes(): TypeCheckResult = {
    def isNumericArray(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (isNumericArray(left.dataType) && isNumericArray(right.dataType)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  }

  private def elementIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elementIsFloat(left)
    val rf = elementIsFloat(right)
    val n = x.numElements()
    if (y.numElements() != n) {
      throw new IllegalArgumentException(
        s"$prettyName: array length mismatch ($n vs ${y.numElements()})")
    }
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi: Double = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi: Double = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elementIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elementIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int ${ev.value}_n = $a.numElements();
         |if ($b.numElements() != ${ev.value}_n) {
         |  throw new IllegalArgumentException(
         |    "graft_cosine: array length mismatch (" + ${ev.value}_n +
         |    " vs " + $b.numElements() + ")");
         |}
         |double ${ev.value}_d = 0.0, ${ev.value}_na = 0.0, ${ev.value}_nb = 0.0;
         |for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_n; ${ev.value}_i++) {
         |  double ${ev.value}_x = (double) $a.$lGet(${ev.value}_i);
         |  double ${ev.value}_y = (double) $b.$rGet(${ev.value}_i);
         |  ${ev.value}_d += ${ev.value}_x * ${ev.value}_y;
         |  ${ev.value}_na += ${ev.value}_x * ${ev.value}_x;
         |  ${ev.value}_nb += ${ev.value}_y * ${ev.value}_y;
         |}
         |if (${ev.value}_na == 0.0 || ${ev.value}_nb == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_d /
         |    (java.lang.Math.sqrt(${ev.value}_na) * java.lang.Math.sqrt(${ev.value}_nb));
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
