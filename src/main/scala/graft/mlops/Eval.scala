package graft.mlops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classification evaluation metrics — the measurement side a training
  * pipeline needs next to the fits (upstream sparkit-learn defers to
  * sklearn.metrics on collected arrays, e.g. `splearn/base.py`'s score
  * mixin; here every metric is a distributed aggregation).
  *
  * 100 TB shapes:
  *  - confusion / per-class P-R-F1: ONE hash aggregation over
  *    (label, pred) — map-side combinable, result is classes^2 rows.
  *  - exact AUC: ONE hash aggregation to the distinct-score histogram,
  *    then the Mann-Whitney rank sum over that histogram. The histogram
  *    is BOUNDED by the caller's score quantization (scores rounded to
  *    `quantize` decimals => at most 10^quantize+1 rows per unit of
  *    score range), so the ordering window runs on a model-scale frame
  *    — the seedVocab/perDomainCap phase-2 discipline, never a
  *    corpus-sized global sort. Ties get average ranks (the exact
  *    trapezoidal/Mann-Whitney correction), so heavy quantization stays
  *    EXACT for the quantized scores rather than approximate.
  */
object Eval {

  /** Confusion matrix: one row per observed (label, pred) pair. */
  def confusion(df: DataFrame, labelCol: String, predCol: String): DataFrame =
    df.groupBy(col(labelCol).as("label"), col(predCol).as("pred"))
      .agg(count(lit(1)).as("n"))

  /** Per-class precision / recall / F1 (+ support), sklearn
    * `classification_report` semantics: a class's precision with zero
    * predicted rows (or recall with zero support) is 0.0, not NULL.
    * One confusion aggregation, then class-cardinality arithmetic.
    */
  def classificationReport(df: DataFrame, labelCol: String,
                           predCol: String): DataFrame = {
    val cm = confusion(df, labelCol, predCol).localCheckpoint()
    val tp = cm.where(col("label") === col("pred"))
      .select(col("label").as("cls"), col("n").as("_tp"))
    val byLabel = cm.groupBy(col("label").as("cls"))
      .agg(sum(col("n")).as("support"))
    val byPred = cm.groupBy(col("pred").as("cls"))
      .agg(sum(col("n")).as("_npred"))
    byLabel
      .join(byPred, Seq("cls"), "full")
      .join(tp, Seq("cls"), "left")
      .select(col("cls"),
        coalesce(col("support"), lit(0L)).as("support"),
        coalesce(col("_tp"), lit(0L)).as("tp"),
        coalesce(col("_npred"), lit(0L)).as("npred"))
      .withColumn("precision", round(when(col("npred") > 0,
        col("tp").cast("double") / col("npred")).otherwise(0.0), 6))
      .withColumn("recall", round(when(col("support") > 0,
        col("tp").cast("double") / col("support")).otherwise(0.0), 6))
      .withColumn("f1", round(when(col("precision") + col("recall") > 0,
        lit(2.0) * col("precision") * col("recall") /
          (col("precision") + col("recall"))).otherwise(0.0), 6))
  }

  /** Exact binary AUC (Mann-Whitney with average-rank ties) from a
    * score column and a 0/1 label column. `quantize` rounds scores
    * first — the contract that bounds the distinct-score histogram the
    * rank window runs on; the AUC is exact FOR THE QUANTIZED scores.
    * Returns one row: (auc, npos, nneg).
    */
  def aucExact(df: DataFrame, scoreCol: String, labelCol: String,
               quantize: Int = 6): DataFrame =
    aucExactBy(df.withColumn("_g", lit(0)), scoreCol, labelCol, "_g",
      quantize).drop("_g")

  /** Segmented exact AUC — one AUC per `groupCol` value (the
    * model-monitoring view: which segment does the model underserve;
    * the evaluation twin of `Scoring.scoreBy`). The rank window runs on
    * the per-group quantized-score histogram — bounded per group by the
    * quantization contract — and groups rank in parallel.
    * Returns one row per group: (groupCol, auc, npos, nneg).
    */
  def aucExactBy(df: DataFrame, scoreCol: String, labelCol: String,
                 groupCol: String, quantize: Int = 6): DataFrame = {
    val hist = df
      .select(col(groupCol), round(col(scoreCol), quantize).as("s"),
        col(labelCol).cast("long").as("y"))
      .groupBy(col(groupCol), col("s"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("npos"))
    // bounded-cardinality frame per group (quantization contract) — the
    // per-group ordering window is the documented model-scale carve-out
    val w = Window.partitionBy(col(groupCol)).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = hist
      .withColumn("_cum", sum(col("n")).over(w) - col("n"))
      .withColumn("_avgrank",
        col("_cum") + (col("n").cast("double") + lit(1.0)) / lit(2.0))
    ranked.groupBy(col(groupCol))
      .agg(
        sum(col("npos") * col("_avgrank")).as("_rsum"),
        sum(col("npos")).as("npos"),
        sum(col("n") - col("npos")).as("nneg"))
      .select(col(groupCol),
        // double arithmetic throughout: npos*(npos+1) and npos*nneg
        // overflow LONG beyond ~1e12 rows of one class
        round((col("_rsum") - col("npos").cast("double") *
            (col("npos").cast("double") + 1.0) / 2.0) /
          nullif(col("npos").cast("double") * col("nneg").cast("double"),
            lit(0.0)), 6).as("auc"),
        col("npos"), col("nneg"))
  }

  /** Probability-score quality in ONE map-side-combinable pass: Brier
    * score and log-loss (scores clamped to [eps, 1-eps] — the sklearn
    * convention, stated identically in the oracle) plus calibration
    * deciles would each re-scan, so they live apart ([[calibrationBins]]).
    * Returns one row: (n, brier, log_loss).
    */
  def probScores(df: DataFrame, scoreCol: String, labelCol: String,
                 eps: Double = 1e-15): DataFrame = {
    val p = least(lit(1.0 - eps), greatest(lit(eps), col(scoreCol)))
    val y = col(labelCol).cast("double")
    df.agg(count(lit(1)).as("n"),
      round(avg((p - y) * (p - y)), 6).as("brier"),
      round(-avg(y * log(p) + (lit(1.0) - y) * log(lit(1.0) - p)), 6)
        .as("log_loss"))
  }

  /** Reliability diagram: scores in [0, 1] bucketed into `bins`
    * equal-width bins → (bin, n, mean_score, frac_pos). One hash
    * aggregation; a calibrated model has mean_score ≈ frac_pos per bin.
    */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
                      bins: Int = 10): DataFrame = {
    require(bins > 0, s"bins=$bins must be positive")
    df.select(
        least(lit(bins - 1L),
          floor(col(scoreCol) * bins).cast("long")).as("bin"),
        col(scoreCol).as("s"), col(labelCol).cast("double").as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("s")), 6).as("mean_score"),
        round(avg(col("y")), 6).as("frac_pos"))
  }
}
