package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an event stream onto a fixed
  * grid and forward-fill the gaps — the shape every downstream window or
  * feature pipeline wants (one row per key per interval, no holes).
  *
  * 100 TB shape: one aggregation to the grid resolution, one per-key
  * span aggregate (O(keys) rows), a generator over each key's span —
  * output is bounded by keys × span-hours, independent of raw event
  * count — then a left join back and a keyed window for the fill. No
  * driver-side state, no collect; skewed keys (one user spanning years)
  * only widen that key's generated rows.
  */
object TimeSeries {

  /** Hourly resample of (key, ts, value) with sum aggregation, dense
    * hourly grid per key between its first and last event, forward-fill
    * via last-non-null over an ordered keyed window. `is_gap` marks
    * synthesized rows.
    */
  def resampleHourlyFill(df: DataFrame, key: Column, ts: Column,
                         value: Column): DataFrame = {
    val hourly = df
      .groupBy(key.as("key"), date_trunc("hour", ts).as("hour"))
      .agg(round(sum(value), 2).as("v"))
    val spans = hourly.groupBy(col("key"))
      .agg(min(col("hour")).as("_h0"), max(col("hour")).as("_h1"))
    val grid = spans.select(col("key"),
      explode(expr("sequence(_h0, _h1, interval 1 hour)")).as("hour"))
    val w = Window.partitionBy(col("key")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(hourly, Seq("key", "hour"), "left")
      .withColumn("v_filled", last(col("v"), ignoreNulls = true).over(w))
      .withColumn("is_gap", col("v").isNull.cast("int"))
  }
}
