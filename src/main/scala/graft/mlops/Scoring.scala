package graft.mlops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Uniform estimator scoring — the reference gave EVERY estimator a
  * `.score(X, y)` through its mixin bases (upstream
  * `splearn/base.py:~L60`: ClassifierMixin → mean accuracy,
  * RegressorMixin → R², KMeans → negative inertia). The Spark-native
  * contract is one entry point over a PREDICTIONS frame: the caller
  * attaches predictions however its estimator family produces them —
  * an NB argmax, a broadcast linear fit, a center assignment — and
  * [[score]] reduces them to ONE summary row `(kind, n, score)` with a
  * single map-side-combinable aggregation. The driver never sees
  * per-row predictions, and the three family branches share the
  * rounding idiom (`round(…, 4) + 0.0`) so every score is
  * SQL-oracle-able.
  */
object Scoring {

  /** ClassifierMixin.score: mean accuracy over (actual, predicted). */
  def classifierScore(preds: DataFrame, actualCol: String,
                      predCol: String): DataFrame =
    preds.agg(count(lit(1)).as("n"),
        (round(avg((col(predCol) === col(actualCol)).cast("double")), 4)
          + lit(0.0)).as("score"))
      .select(lit("accuracy").as("kind"), col("n"), col("score"))

  /** RegressorMixin.score: R² = 1 − SSres/SStot. SStot via
    * `var_pop(actual) · n` — the numerically stable one-pass form both
    * engines implement (never Σy² − n·ȳ², which cancels
    * catastrophically at large magnitudes). A zero-variance target
    * scores 0.0, the same degenerate-fixture convention as the
    * closed-form OLS fits.
    */
  def regressorScore(preds: DataFrame, actualCol: String,
                     predCol: String): DataFrame = {
    val r = col(actualCol) - col(predCol)
    preds.agg(count(lit(1)).as("n"), sum(r * r).as("_ssr"),
        var_pop(col(actualCol)).as("_vp"))
      .select(lit("r2").as("kind"), col("n"),
        (round(when(col("_vp") === 0.0, lit(0.0))
          .otherwise(lit(1.0) - col("_ssr") / (col("_vp") * col("n"))), 4)
          + lit(0.0)).as("score"))
  }

  /** Clusterer score: NEGATIVE inertia −Σ dist² (upstream KMeans.score
    * — "opposite of the value on the objective", so larger is better,
    * uniform with the other kinds). Input is an assignment frame, e.g.
    * [[ClusterOps.assignToCenters]] output, with one nearest-center
    * distance row per point.
    */
  def clustererScore(assignments: DataFrame, sqDistCol: String): DataFrame =
    assignments.agg(count(lit(1)).as("n"),
        (round(-sum(col(sqDistCol)), 4) + lit(0.0)).as("score"))
      .select(lit("neg_inertia").as("kind"), col("n"), col("score"))

  /** The uniform entry point: dispatch on estimator family. For
    * `"cluster"` the frame is an assignment frame and `predCol` names
    * its squared-distance column (`actualCol` ignored).
    */
  def score(preds: DataFrame, kind: String, actualCol: String,
            predCol: String): DataFrame = kind match {
    case "classify" => classifierScore(preds, actualCol, predCol)
    case "regress"  => regressorScore(preds, actualCol, predCol)
    case "cluster"  => clustererScore(preds, predCol)
    case other => throw new IllegalArgumentException(
      s"Scoring.score: unknown estimator kind '$other' " +
        "(expected classify | regress | cluster)")
  }

  /** Segmented scoring: the SAME model's score per group — the
    * model-monitoring twin of [[score]] ("which segment does the global
    * model underserve"), and the evaluation counterpart of the
    * many-models fits ([[LinearOps.olsFitGrouped]] FITS one model per
    * group; this EVALUATES one model across groups). Still one
    * map-side-combinable aggregation keyed by the group — a million
    * segments cost exactly one shuffle. Output:
    * (group, kind, n, score), group cast to string so the surface is
    * uniform across key types.
    */
  def scoreBy(preds: DataFrame, kind: String, groupCol: String,
              actualCol: String, predCol: String): DataFrame = {
    val g = col(groupCol).cast("string").as("group")
    kind match {
      case "classify" =>
        preds.groupBy(g).agg(count(lit(1)).as("n"),
            (round(avg((col(predCol) === col(actualCol)).cast("double")), 4)
              + lit(0.0)).as("score"))
          .select(col("group"), lit("accuracy").as("kind"), col("n"),
            col("score"))
      case "regress" =>
        val r = col(actualCol) - col(predCol)
        preds.groupBy(g).agg(count(lit(1)).as("n"), sum(r * r).as("_ssr"),
            var_pop(col(actualCol)).as("_vp"))
          .select(col("group"), lit("r2").as("kind"), col("n"),
            (round(when(col("_vp") === 0.0, lit(0.0))
              .otherwise(lit(1.0) - col("_ssr") / (col("_vp") * col("n"))),
              4) + lit(0.0)).as("score"))
      case "cluster" =>
        preds.groupBy(g).agg(count(lit(1)).as("n"),
            (round(-sum(col(predCol)), 4) + lit(0.0)).as("score"))
          .select(col("group"), lit("neg_inertia").as("kind"), col("n"),
            col("score"))
      case other => throw new IllegalArgumentException(
        s"Scoring.scoreBy: unknown estimator kind '$other' " +
          "(expected classify | regress | cluster)")
    }
  }
}
