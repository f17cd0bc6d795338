package graft.mlops

import org.apache.spark.ml.{Pipeline, PipelineModel, PipelineStage}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.tuning.{CrossValidator, CrossValidatorModel, ParamGridBuilder}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composition / meta-operators (SURVEY §2.7): the reference's
  * `SparkPipeline` / `SparkFeatureUnion` / `SparkGridSearchCV`
  * (`splearn/pipeline.py`, `splearn/grid_search.py`) map 1:1 onto
  * `ml.Pipeline` / `VectorAssembler` / `CrossValidator`; nothing custom is
  * required — these wrappers pin the engine's API and defaults.
  *
  * Scale note: `CrossValidator.setParallelism(p)` runs candidate fits as
  * concurrent jobs — the fan-out the reference drove with a driver loop
  * over the param grid.
  */
object Composition {

  def pipeline(stages: PipelineStage*): Pipeline =
    new Pipeline().setStages(stages.toArray)

  /** P2 FeatureUnion (`splearn/pipeline.py:~L150`): run transformers over
    * the same input and horizontally stack outputs — `VectorAssembler` is
    * the exact Spark equivalent of the reference's per-block `hstack`.
    */
  def featureUnion(inputCols: Seq[String], outputCol: String = "features")
      : org.apache.spark.ml.feature.VectorAssembler =
    new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(inputCols.toArray).setOutputCol(outputCol)

  def fitPipeline(df: DataFrame, stages: PipelineStage*): PipelineModel =
    pipeline(stages: _*).fit(df)

  /** Grid-searched logistic regression over an embedding column. */
  def gridSearchLogistic(df: DataFrame, featuresArr: String, labelCol: String,
                         regParams: Seq[Double] = Seq(0.0, 0.1),
                         numFolds: Int = 2,
                         parallelism: Int = 4): CrossValidatorModel = {
    val prepared = df.withColumn("features",
      array_to_vector(col(featuresArr).cast("array<double>")))
    val lr = new LogisticRegression()
      .setMaxIter(10).setLabelCol(labelCol).setFeaturesCol("features")
    val grid = new ParamGridBuilder()
      .addGrid(lr.regParam, regParams)
      .build()
    new CrossValidator()
      .setEstimator(lr)
      .setEvaluator(new MulticlassClassificationEvaluator()
        .setLabelCol(labelCol).setMetricName("accuracy"))
      .setEstimatorParamMaps(grid)
      .setNumFolds(numFolds)
      .setParallelism(parallelism)
      .setSeed(42L)
      .fit(prepared)
  }
}
