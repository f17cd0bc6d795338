package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.DataType

/** Operator-boundary schema assertions — the engine's answer to the
  * reference's runtime `check_rdd(rdd, dtype)` gate
  * (`splearn/utils/validation.py:~L5`). Spark schemas are static, so most
  * of what check_rdd did at runtime is free at plan time; these helpers
  * cover the residue: asserting a frame handed across an API boundary has
  * the columns/types an operator requires, failing fast with a precise
  * message instead of a mid-job analysis error.
  */
object Validation {

  def requireColumns(df: DataFrame, cols: String*): DataFrame = {
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"missing required column(s): ${missing.mkString(", ")}; " +
        s"present: ${df.columns.mkString(", ")}")
    df
  }

  def requireColumn(df: DataFrame, name: String, dtype: DataType): DataFrame = {
    requireColumns(df, name)
    val actual = df.schema(name).dataType
    require(actual == dtype,
      s"column '$name' has type ${actual.simpleString}, expected ${dtype.simpleString}")
    df
  }
}
