package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StructType}

/** Native multi-probe centroid assignment: the `n` nearest cells (by
  * squared euclidean distance, ties to the lower cell id) of a vector
  * over a packed centroid table, one in-row evaluation per vector —
  * the top-N generalization of [[NearestCell]].
  *
  * Why it exists: the long-form multi-probe assignment joins
  * point-dims against EVERY centroid's dims — |corpus|·|cells|·d rows
  * through a hash aggregate. At the StressBench geometry (500k × 2048
  * cells × 64d) that is ~65 BILLION joined rows: the nProbe=2 graph
  * build ran ~28 minutes and OOMed an 8 GB heap, while the nProbe=1
  * path's in-row argmin finished in seconds. This expression closes
  * that asymmetry: cells×dims primitive loops per row with one
  * length-n insertion buffer, no join, no aggregate, broadcast-sized
  * memory.
  *
  * Arguments: (vec array<double>, cells array<struct<cell:long,
  * cv:array<double>>>, n int — foldable). Returns array<bigint>: the
  * ≤n nearest cell ids in (d2, cell) rank order — `posexplode` gives
  * the probe rank. Registered as `graft_nearest_cells`.
  */
case class NearestCellsTopN(first: Expression, second: Expression,
                            third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(s: StructType, _),
          IntegerType)
          if s.length == 2 && s(0).dataType == LongType &&
            (s(1).dataType match {
              case ArrayType(DoubleType, _) => true
              case _ => false
            }) =>
        if (third.foldable) TypeCheckSuccess
        else TypeCheckFailure("graft_nearest_cells: n must be foldable")
      case (a, b, c) => TypeCheckFailure(
        s"graft_nearest_cells expects (array<double>, " +
          s"array<struct<cell:bigint, cv:array<double>>>, int), " +
          s"got ($a, $b, $c)")
    }
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_nearest_cells"

  @transient private lazy val topN: Int =
    third.eval(InternalRow.empty).asInstanceOf[Int]

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val cells = b.asInstanceOf[ArrayData]
    val n = topN
    if (n < 1) {
      throw new IllegalArgumentException(
        s"$prettyName: n=$n must be positive")
    }
    val d = vec.numElements()
    val m = cells.numElements()
    if (m == 0) {
      throw new IllegalArgumentException(
        s"$prettyName: empty centroid table")
    }
    val bc = new Array[Long](n)
    val bd = new Array[Double](n)
    var cnt = 0
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
      if (cnt < n || s < bd(cnt - 1) ||
        (s == bd(cnt - 1) && cell < bc(cnt - 1))) {
        var pos = if (cnt < n) cnt else n - 1
        while (pos > 0 && (bd(pos - 1) > s ||
          (bd(pos - 1) == s && bc(pos - 1) > cell))) {
          bd(pos) = bd(pos - 1); bc(pos) = bc(pos - 1)
          pos -= 1
        }
        bd(pos) = s; bc(pos) = cell
        if (cnt < n) cnt += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(bc, cnt))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val v = ev.value
      s"""
         |int ${v}_n = $c;
         |if (${v}_n < 1) {
         |  throw new IllegalArgumentException(
         |    "graft_nearest_cells: n must be positive");
         |}
         |int ${v}_d = $a.numElements();
         |int ${v}_m = $b.numElements();
         |if (${v}_m == 0) {
         |  throw new IllegalArgumentException(
         |    "graft_nearest_cells: empty centroid table");
         |}
         |long[] ${v}_bc = new long[${v}_n];
         |double[] ${v}_bd = new double[${v}_n];
         |int ${v}_cnt = 0;
         |for (int ${v}_i = 0; ${v}_i < ${v}_m; ${v}_i++) {
         |  InternalRow ${v}_r = $b.getStruct(${v}_i, 2);
         |  long ${v}_cell = ${v}_r.getLong(0);
         |  org.apache.spark.sql.catalyst.util.ArrayData ${v}_cv = ${v}_r.getArray(1);
         |  if (${v}_cv.numElements() != ${v}_d) {
         |    throw new IllegalArgumentException(
         |      "graft_nearest_cells: dim mismatch (" + ${v}_d + " vs " +
         |      ${v}_cv.numElements() + ")");
         |  }
         |  double ${v}_s = 0.0;
         |  for (int ${v}_j = 0; ${v}_j < ${v}_d; ${v}_j++) {
         |    double ${v}_diff = $a.getDouble(${v}_j) - ${v}_cv.getDouble(${v}_j);
         |    ${v}_s += ${v}_diff * ${v}_diff;
         |  }
         |  if (${v}_cnt < ${v}_n || ${v}_s < ${v}_bd[${v}_cnt - 1] ||
         |      (${v}_s == ${v}_bd[${v}_cnt - 1] &&
         |       ${v}_cell < ${v}_bc[${v}_cnt - 1])) {
         |    int ${v}_pos = (${v}_cnt < ${v}_n) ? ${v}_cnt : ${v}_n - 1;
         |    while (${v}_pos > 0 && (${v}_bd[${v}_pos - 1] > ${v}_s ||
         |        (${v}_bd[${v}_pos - 1] == ${v}_s &&
         |         ${v}_bc[${v}_pos - 1] > ${v}_cell))) {
         |      ${v}_bd[${v}_pos] = ${v}_bd[${v}_pos - 1];
         |      ${v}_bc[${v}_pos] = ${v}_bc[${v}_pos - 1];
         |      ${v}_pos--;
         |    }
         |    ${v}_bd[${v}_pos] = ${v}_s;
         |    ${v}_bc[${v}_pos] = ${v}_cell;
         |    if (${v}_cnt < ${v}_n) ${v}_cnt++;
         |  }
         |}
         |$v = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf(${v}_bc, ${v}_cnt));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): NearestCellsTopN =
    copy(first = newFirst, second = newSecond, third = newThird)
}
