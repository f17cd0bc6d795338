package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructType}

/** Native nearest-centroid assignment: argmin of squared euclidean
  * distance over a packed centroid table, one evaluation per ROW.
  *
  * Escalation ladder, measured at 1M vectors × 256 cells × 64 dims
  * (StressBench ivfpq_gated_topk): the long-form join OOMs (|corpus|·
  * |cells| rows through a hash aggregate); `transform` + zip_with
  * lambdas run ~300s (2·d interpreted dispatches per cell); `transform`
  * + native [[L2DistSq]] runs ~141s (one dispatch + one struct
  * allocation per cell — 256M of each); this expression loops over
  * cells×dims in primitive code with zero per-cell allocation. Ties
  * break to the lowest cell id — exactly min(struct(d2, cell)).
  *
  * Arguments: (vec array<double>, cells array<struct<cell:long,
  * cv:array<double>>>). Registered as `graft_nearest_cell`.
  */
case class NearestCell(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(s: StructType, _))
          if s.length == 2 && s(0).dataType == LongType &&
            (s(1).dataType match {
              case ArrayType(DoubleType, _) => true
              case _ => false
            }) =>
        TypeCheckSuccess
      case (l, r) => TypeCheckFailure(
        s"graft_nearest_cell expects (array<double>, " +
          s"array<struct<cell:bigint, cv:array<double>>>), got ($l, $r)")
    }
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_nearest_cell"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val cells = b.asInstanceOf[ArrayData]
    val d = vec.numElements()
    val m = cells.numElements()
    if (m == 0) {
      throw new IllegalArgumentException(
        s"$prettyName: empty centroid table")
    }
    var bestCell = Long.MaxValue
    var bestD = Double.PositiveInfinity
    var i = 0
    while (i < m) {
      val row = cells.getStruct(i, 2)
      val cell = row.getLong(0)
      val cv = row.getArray(1)
      if (cv.numElements() != d) {
        throw new IllegalArgumentException(
          s"$prettyName: dim mismatch ($d vs ${cv.numElements()})")
      }
      var s = 0.0
      var j = 0
      while (j < d) {
        val diff = vec.getDouble(j) - cv.getDouble(j)
        s += diff * diff
        j += 1
      }
      if (s < bestD || (s == bestD && cell < bestCell)) {
        bestD = s; bestCell = cell
      }
      i += 1
    }
    bestCell
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val v = ev.value
      s"""
         |int ${v}_d = $a.numElements();
         |int ${v}_m = $b.numElements();
         |if (${v}_m == 0) {
         |  throw new IllegalArgumentException(
         |    "graft_nearest_cell: empty centroid table");
         |}
         |long ${v}_bc = Long.MAX_VALUE;
         |double ${v}_bd = Double.POSITIVE_INFINITY;
         |for (int ${v}_i = 0; ${v}_i < ${v}_m; ${v}_i++) {
         |  InternalRow ${v}_r = $b.getStruct(${v}_i, 2);
         |  long ${v}_cell = ${v}_r.getLong(0);
         |  org.apache.spark.sql.catalyst.util.ArrayData ${v}_cv = ${v}_r.getArray(1);
         |  if (${v}_cv.numElements() != ${v}_d) {
         |    throw new IllegalArgumentException(
         |      "graft_nearest_cell: dim mismatch (" + ${v}_d + " vs " +
         |      ${v}_cv.numElements() + ")");
         |  }
         |  double ${v}_s = 0.0;
         |  for (int ${v}_j = 0; ${v}_j < ${v}_d; ${v}_j++) {
         |    double ${v}_diff = $a.getDouble(${v}_j) - ${v}_cv.getDouble(${v}_j);
         |    ${v}_s += ${v}_diff * ${v}_diff;
         |  }
         |  if (${v}_s < ${v}_bd || (${v}_s == ${v}_bd && ${v}_cell < ${v}_bc)) {
         |    ${v}_bd = ${v}_s; ${v}_bc = ${v}_cell;
         |  }
         |}
         |$v = ${v}_bc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCell =
    copy(left = newLeft, right = newRight)
}
