package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed moment statistics (SURVEY §2.3).
  *
  * The reference computed per-feature variance from per-block sufficient
  * stats (Σx, Σx², n) reduced on the driver
  * (`splearn/feature_selection/__init__.py:~L10`). Here the same math is a
  * partial+final hash aggregation Catalyst plans natively — `var_pop`/`avg`/
  * `stddev_pop` are one-pass, merge-able aggregates, so the plan is a single
  * scan regardless of feature count or data size.
  */
object Moments {

  /** VarianceThreshold.fit: per-feature population variance with a keep
    * mask. `features` are numeric columns; output is long-form
    * (feature, variance, kept).
    */
  def varianceThreshold(df: DataFrame, features: Seq[String], threshold: Double): DataFrame = {
    // One aggregation computing every variance, then unpivot — a single
    // scan, not one job per feature. The keep mask is decided on the
    // UNROUNDED variance (rounding is presentation only).
    val agg = df.agg(
      var_pop(col(features.head)).as(features.head),
      features.tail.map(f => var_pop(col(f)).as(f)): _*)
    val stackExpr = features.map(f => s"'$f', `$f`").mkString(", ")
    agg.select(expr(s"stack(${features.size}, $stackExpr) as (feature, _var)"))
      .select(col("feature"),
        round(col("_var"), 4).as("variance"),
        (col("_var") > threshold).cast("int").as("kept"))
  }

  /** StandardScaler: z-score one column against its population moments.
    * The tiny (1-row) moment frame is broadcast, not collected.
    */
  def standardScale(df: DataFrame, valueCol: String, outCol: String): DataFrame = {
    val moments = df.agg(
      avg(col(valueCol)).as("_mu"),
      stddev_pop(col(valueCol)).as("_sigma"))
    df.crossJoin(broadcast(moments))
      .withColumn(outCol, round((col(valueCol) - col("_mu")) / col("_sigma"), 6))
      .drop("_mu", "_sigma")
  }

  /** spark.ml parity wrappers over a vector column assembled from numeric
    * features — the estimator-API face of the two relational ops above
    * (`ml.feature.VarianceThresholdSelector` / `ml.feature.StandardScaler`,
    * both Summarizer-backed single-pass fits).
    */
  def mlVarianceSelector(df: DataFrame, features: Seq[String],
                         threshold: Double): DataFrame = {
    val assembled = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(features.toArray).setOutputCol("features")
      .transform(df)
    new org.apache.spark.ml.feature.VarianceThresholdSelector()
      .setVarianceThreshold(threshold)
      .setFeaturesCol("features").setOutputCol("selected")
      .fit(assembled)
      .transform(assembled)
  }

  def mlStandardScale(df: DataFrame, features: Seq[String]): DataFrame = {
    val assembled = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(features.toArray).setOutputCol("features")
      .transform(df)
    new org.apache.spark.ml.feature.StandardScaler()
      .setWithMean(true).setWithStd(true)
      .setInputCol("features").setOutputCol("scaled")
      .fit(assembled)
      .transform(assembled)
  }
}
