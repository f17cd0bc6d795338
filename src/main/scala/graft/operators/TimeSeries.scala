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

  /** Truncated exponentially-weighted moving average over each key's
    * time-ordered values:
    *   ewma_i = Σ_{m=0..L−1} (1−α)^m·x_{i−m} / Σ_{m} (1−α)^m
    * (pandas `ewm(alpha).mean()` with adjust=True, window-truncated at L
    * lags). Truncation is the distributed-stable form: the exact
    * recursive EWMA needs either sequential state or unbounded exponents
    * that overflow doubles, while lag L caps the dropped mass at
    * (1−α)^L — pick L so that's below output rounding.
    *
    * Shape: ONE keyed window (hash partition by key) collecting the
    * bounded frame, then an in-row weighted fold — no extra shuffle, no
    * per-key state beyond the L-row frame; `orderCols` must make the
    * per-key order total or frame contents are engine-dependent.
    */
  def ewma(df: DataFrame, key: Column, orderCols: Seq[Column], value: Column,
           alpha: Double, lags: Int = 20, outCol: String = "ewma"): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha=$alpha must be in (0,1)")
    require(lags >= 1, s"lags=$lags must be positive")
    val w = Window.partitionBy(key).orderBy(orderCols: _*)
      .rowsBetween(-(lags - 1), Window.currentRow)
    df
      .withColumn("_win", collect_list(value.cast("double")).over(w))
      .withColumn(outCol, expr(
        // frame is oldest->current; weight x_j by (1-α)^(n-1-j)
        s"""round(
           |  aggregate(
           |    zip_with(_win, sequence(size(_win) - 1, 0, -1),
           |             (x, m) -> x * pow(${1 - alpha}D, m)),
           |    0D, (acc, v) -> acc + v)
           |  / aggregate(sequence(size(_win) - 1, 0, -1),
           |    0D, (acc, m) -> acc + pow(${1 - alpha}D, m)), 6)""".stripMargin
        ) + lit(0.0))
      .drop("_win")
  }
}
