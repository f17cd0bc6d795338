package graft.mlops

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Linear models (SURVEY §2.4).
  *
  * The reference averaged per-block sklearn fits
  * (`splearn/linear_model/base.py:~L10-80`, parameter averaging) — a
  * one-shot approximation. The engine uses two strictly stronger paths:
  *
  *  - closed-form 1-D OLS from distributed moments (covar_pop/var_pop),
  *    a single aggregation — and exactly SQL-oracle-able;
  *  - `spark.ml` L-BFGS/OWL-QN global optimizers for the general case
  *    (iterative `treeAggregate` of gradients — the distributed pattern
  *    the reference's averaging approximated).
  */
object LinearOps {

  /** 1-D ordinary least squares: slope = covar_pop(x,y)/var_pop(x),
    * intercept = avg(y) - slope*avg(x). One scan, one reduce.
    */
  def olsFit(df: DataFrame, xCol: String, yCol: String): DataFrame =
    df.agg(
      covar_pop(col(xCol), col(yCol)).as("_cxy"),
      var_pop(col(xCol)).as("_vx"),
      avg(col(xCol)).as("_mx"),
      avg(col(yCol)).as("_my"))
      .select(
        round(col("_cxy") / col("_vx"), 6).as("slope"),
        round(col("_my") - col("_cxy") / col("_vx") * col("_mx"), 6).as("intercept"))

  /** Apply a 1-row (slope, intercept) frame to score rows: broadcast join,
    * no collect — the reference's broadcast-model predict
    * (`splearn/linear_model/base.py:~L80`) without driver round-trips.
    */
  def olsPredict(df: DataFrame, fit: DataFrame, xCol: String): DataFrame =
    df.crossJoin(broadcast(fit))
      .withColumn("prediction",
        round(col("intercept") + col("slope") * col(xCol), 4))

  /** Reference-faithful L1 semantics (`SparkLinearModelMixin.__add__`,
    * `splearn/linear_model/base.py:~L10-80`): fit one model per block,
    * average the parameters. Expressed relationally — per-block closed-form
    * OLS from block-local moments, then an unweighted average across
    * blocks — so the one-shot approximation the reference shipped is
    * itself oracle-checkable. `blockIdCol` rows must already carry a
    * block id (see [[graft.operators.Blocking]]).
    *
    * Kept alongside [[olsFit]] deliberately: the global fit is strictly
    * stronger; this documents (and tests) exactly what the reference's
    * averaging computes, including its bias on heterogeneous blocks.
    */
  def blockAveragedOlsFit(df: DataFrame, blockIdCol: String,
                          xCol: String, yCol: String): DataFrame =
    df.groupBy(col(blockIdCol))
      .agg(
        covar_pop(col(xCol), col(yCol)).as("_cxy"),
        var_pop(col(xCol)).as("_vx"),
        avg(col(xCol)).as("_mx"),
        avg(col(yCol)).as("_my"))
      .select(
        (col("_cxy") / col("_vx")).as("_slope"),
        (col("_my") - col("_cxy") / col("_vx") * col("_mx")).as("_icept"))
      .agg(
        round(avg(col("_slope")), 6).as("slope_avg"),
        round(avg(col("_icept")), 6).as("intercept_avg"),
        count(lit(1)).as("n_blocks"))

  /** spark.ml logistic regression over an Array[Float] embedding column. */
  def fitLogistic(df: DataFrame, featuresArr: String, labelCol: String,
                  maxIter: Int = 20): DataFrame = {
    val prepared = df.withColumn("features",
      array_to_vector(col(featuresArr).cast("array<double>")))
    val model = new LogisticRegression()
      .setMaxIter(maxIter).setLabelCol(labelCol).setFeaturesCol("features")
      .fit(prepared)
    model.transform(prepared)
  }

  /** spark.ml linear regression (multi-feature, L-BFGS). */
  def fitLinear(df: DataFrame, featureCols: Seq[String], labelCol: String): DataFrame = {
    val prepared = df.withColumn("features",
      array_to_vector(array(featureCols.map(c => col(c).cast("double")): _*)))
    val model = new LinearRegression()
      .setLabelCol(labelCol).setFeaturesCol("features")
      .fit(prepared)
    prepared.sparkSession.createDataFrame(
      Seq((model.intercept, model.coefficients.toArray.toSeq))
    ).toDF("intercept", "coefficients")
  }
}
