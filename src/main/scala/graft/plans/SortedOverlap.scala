package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, IntegerType, LongType}

/** Exact set-overlap of two STRICTLY-INCREASING `array<long>` columns by
  * linear merge, with a required-overlap early exit — the verification
  * kernel of the exact-threshold similarity join (the PPJoin+ suffix
  * idea applied where the engine's slim candidate join can afford it:
  * both arrays are already in-row at verify time, and their shared
  * global rarest-first RANK order makes position itself the filter).
  *
  * Returns the exact intersection size, or -1 the moment the remaining
  * elements can no longer reach `required` (overlap so far + the
  * shorter remaining tail < required) — a cold pair exits after a
  * handful of comparisons instead of paying the full O(na+nb) merge,
  * and never builds `array_intersect`'s per-row hash set at all.
  *
  * Why a custom Expression (the DotProduct rationale): the merge runs
  * over primitive longs straight out of `ArrayData` inside generated
  * code — no boxing, no interpreter, fused into the verify stage's
  * codegen. Caller contract: both arrays strictly ascending (sets);
  * violation under-counts silently, so keep construction on the
  * sort_array path.
  */
case class SortedOverlap(first: Expression, second: Expression,
                         third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType), IntegerType)

  override def dataType: DataType = DataTypes.IntegerType

  override def prettyName: String = "graft_sorted_overlap"

  override protected def nullSafeEval(a: Any, b: Any, r: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val req = r.asInstanceOf[Int]
    val na = x.numElements()
    val nb = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    var out = -2
    while (out == -2 && i < na && j < nb) {
      val ra = na - i
      val rb = nb - j
      if (c + (if (ra < rb) ra else rb) < req) out = -1
      else {
        val xv = x.getLong(i)
        val yv = y.getLong(j)
        if (xv == yv) { c += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
    }
    if (out == -2) c else out
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, r) =>
      s"""
         |int ${ev.value}_na = $a.numElements();
         |int ${ev.value}_nb = $b.numElements();
         |int ${ev.value}_i = 0;
         |int ${ev.value}_j = 0;
         |int ${ev.value}_c = 0;
         |int ${ev.value}_out = -2;
         |while (${ev.value}_out == -2 &&
         |       ${ev.value}_i < ${ev.value}_na &&
         |       ${ev.value}_j < ${ev.value}_nb) {
         |  int ${ev.value}_ra = ${ev.value}_na - ${ev.value}_i;
         |  int ${ev.value}_rb = ${ev.value}_nb - ${ev.value}_j;
         |  int ${ev.value}_rem =
         |    ${ev.value}_ra < ${ev.value}_rb ? ${ev.value}_ra : ${ev.value}_rb;
         |  if (${ev.value}_c + ${ev.value}_rem < $r) {
         |    ${ev.value}_out = -1;
         |  } else {
         |    long ${ev.value}_xv = $a.getLong(${ev.value}_i);
         |    long ${ev.value}_yv = $b.getLong(${ev.value}_j);
         |    if (${ev.value}_xv == ${ev.value}_yv) {
         |      ${ev.value}_c++; ${ev.value}_i++; ${ev.value}_j++;
         |    } else if (${ev.value}_xv < ${ev.value}_yv) {
         |      ${ev.value}_i++;
         |    } else {
         |      ${ev.value}_j++;
         |    }
         |  }
         |}
         |${ev.value} = ${ev.value}_out == -2 ? ${ev.value}_c : ${ev.value}_out;
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): SortedOverlap =
    copy(first = newFirst, second = newSecond, third = newThird)
}
