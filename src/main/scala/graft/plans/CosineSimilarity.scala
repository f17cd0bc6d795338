package graft.plans

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
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  private def elementIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"graft_cosine expects array<float|double>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elementIsFloat(left)
    val rf = elementIsFloat(right)
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi: Double = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi: Double = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elementIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elementIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int ${ev.value}_n = $a.numElements() < $b.numElements()
         |    ? $a.numElements() : $b.numElements();
         |double ${ev.value}_d = 0.0, ${ev.value}_na = 0.0, ${ev.value}_nb = 0.0;
         |for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_n; ${ev.value}_i++) {
         |  double ${ev.value}_x = (double) $a.$lGet(${ev.value}_i);
         |  double ${ev.value}_y = (double) $b.$rGet(${ev.value}_i);
         |  ${ev.value}_d += ${ev.value}_x * ${ev.value}_y;
         |  ${ev.value}_na += ${ev.value}_x * ${ev.value}_x;
         |  ${ev.value}_nb += ${ev.value}_y * ${ev.value}_y;
         |}
         |${ev.value} = ${ev.value}_d /
         |  (java.lang.Math.sqrt(${ev.value}_na) * java.lang.Math.sqrt(${ev.value}_nb));
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
