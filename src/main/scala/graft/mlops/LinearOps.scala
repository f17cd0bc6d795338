package graft.mlops

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.{Column, DataFrame}
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

  /** MANY-MODELS OLS: one independent 1-D fit per group, in a single
    * scan — the grouped sufficient statistics (n, Σx, Σy, Σx², Σxy,
    * Σy²) are one map-side-combinable aggregation, and every group's
    * slope/intercept/R² falls out in closed form. The pattern that
    * replaces "loop over groups, fit each" at 100 TB: a million
    * per-entity models cost exactly one shuffle keyed by the group.
    * Degenerate groups (zero x-variance) yield NULL slope rather than
    * a division error; R² guards zero y-variance the same way.
    */
  def olsFitGrouped(df: DataFrame, groupCol: Column, xCol: Column,
                    yCol: Column): DataFrame =
    df.groupBy(groupCol.as("grp"))
      .agg(count(lit(1)).as("n"),
        sum(xCol).as("_sx"), sum(yCol).as("_sy"),
        sum(xCol * xCol).as("_sxx"), sum(xCol * yCol).as("_sxy"),
        sum(yCol * yCol).as("_syy"))
      .select(col("grp"), col("n"),
        (round(
          (col("n") * col("_sxy") - col("_sx") * col("_sy")) /
            nullif(col("n") * col("_sxx") - col("_sx") * col("_sx"),
              lit(0.0)), 6) + lit(0.0)).as("slope"),
        (round(
          (col("_sy") - (col("n") * col("_sxy") - col("_sx") * col("_sy")) /
            nullif(col("n") * col("_sxx") - col("_sx") * col("_sx"),
              lit(0.0)) * col("_sx")) / col("n"), 6) + lit(0.0))
          .as("intercept"),
        (round(
          pow(col("n") * col("_sxy") - col("_sx") * col("_sy"), 2) /
            nullif((col("n") * col("_sxx") - col("_sx") * col("_sx")) *
              (col("n") * col("_syy") - col("_sy") * col("_sy")),
              lit(0.0)), 6) + lit(0.0)).as("r2"))

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

  /** L1 classification completeness — the reference's block-averaged
    * LOGISTIC fit (`splearn/linear_model/logistic.py:~L10-60`:
    * per-block `fit` then `__add__` = parameter average). Each block
    * runs the same deterministic zero-init full-batch GD as
    * [[logisticGdIterations]] — all blocks SIMULTANEOUSLY, the block id
    * carried through the weight frame, so the whole per-block family is
    * still two aggregations per step over one long-form relation (never
    * a driver loop over blocks) — then coefficients average unweighted
    * across blocks, exactly the reference's one-shot merge algebra
    * (including its bias on heterogeneous blocks — the global
    * [[fitLogistic]] stays the strictly-stronger path, as with
    * [[blockAveragedOlsFit]]).
    *
    * Returns (dim, w_avg, n_blocks). Fully SQL-oracle-able: fixed
    * iterations, no RNG, no intercept.
    */
  def blockAveragedLogisticGd(pointsLong: DataFrame, labels: DataFrame,
                              idCol: String, blockCol: String,
                              labelCol: String, iters: Int,
                              lr: Double): DataFrame = {
    var w = pointsLong.select(col(blockCol), col("dim")).distinct()
      .withColumn("w", lit(0.0))
    (1 to iters).foreach { _ =>
      val margins = pointsLong
        .join(broadcast(w), Seq(blockCol, "dim"))
        .groupBy(col(blockCol), col(idCol))
        .agg(sum(col("v") * col("w")).as("m"))
      val errs = margins.join(labels, idCol)
        .select(col(blockCol), col(idCol),
          (lit(1.0) / (lit(1.0) + exp(-col("m"))) - col(labelCol)).as("err"))
      val grad = pointsLong.join(errs, Seq(blockCol, idCol))
        .groupBy(col(blockCol), col("dim"))
        .agg(avg(col("err") * col("v")).as("g"))
      w = w.join(grad, Seq(blockCol, "dim"))
        .select(col(blockCol), col("dim"),
          (col("w") - lit(lr) * col("g")).as("w"))
      // same per-step materialization as logisticGdIterations (analyzer
      // blowup AND 2^i broadcast re-execution) — the frame is
      // blocks×dims rows, metadata-scale
      w = w.localCheckpoint()
    }
    w.groupBy(col("dim"))
      .agg((round(avg(col("w")), 6) + lit(0.0)).as("w_avg"),
        count(lit(1)).as("n_blocks"))
  }

  /** spark.ml logistic regression over an Array[Float] embedding column. */
  /** Bivariate OLS with intercept, closed form: one aggregation computes
    * the 8 sufficient statistics (n, Σx1, Σx2, Σy, Σx1², Σx1x2, Σx2²,
    * Σx1y, Σx2y), then Cramer's rule solves the 3×3 normal equations
    * in-row. One linear pass, O(1) driver-free state — the multivariate
    * extension of [[olsFit]], still fully SQL-mirrorable (no matrix
    * library, just the unrolled determinants).
    */
  def olsFit2(df: DataFrame, x1Col: String, x2Col: String,
              yCol: String): DataFrame = {
    val x1 = col(x1Col); val x2 = col(x2Col); val y = col(yCol)
    df.agg(
      count(lit(1)).cast("double").as("n"),
      sum(x1).as("s1"), sum(x2).as("s2"), sum(y).as("sy"),
      sum(x1 * x1).as("s11"), sum(x1 * x2).as("s12"), sum(x2 * x2).as("s22"),
      sum(x1 * y).as("s1y"), sum(x2 * y).as("s2y"))
      .select(
        expr("""n * (s11 * s22 - s12 * s12)
               | - s1 * (s1 * s22 - s12 * s2)
               | + s2 * (s1 * s12 - s11 * s2)""".stripMargin).as("det"),
        col("n"), col("s1"), col("s2"), col("sy"),
        col("s11"), col("s12"), col("s22"), col("s1y"), col("s2y"))
      .select(
        round(expr("""(sy * (s11 * s22 - s12 * s12)
                     | - s1 * (s1y * s22 - s12 * s2y)
                     | + s2 * (s1y * s12 - s11 * s2y)) / det""".stripMargin), 6)
          .as("b0"),
        round(expr("""(n * (s1y * s22 - s12 * s2y)
                     | - sy * (s1 * s22 - s12 * s2)
                     | + s2 * (s1 * s2y - s1y * s2)) / det""".stripMargin), 6)
          .as("b1"),
        round(expr("""(n * (s11 * s2y - s1y * s12)
                     | - s1 * (s1 * s2y - s1y * s2)
                     | + sy * (s1 * s12 - s11 * s2)) / det""".stripMargin), 6)
          .as("b2"))
  }

  // --- Trivariate OLS: generated 4×4 Cramer over the normal equations ---
  //
  // The determinant expansions are GENERATED (recursive Laplace along the
  // first row) as SQL text over the moment column names, and the SAME
  // text is evaluated by Spark (`expr`) and by the DuckDB oracle — both
  // engines parse one string into one arithmetic tree, so the FP
  // evaluation order is pinned by construction, not by hand-keeping two
  // 24-term expansions in sync.

  /** Laplace expansion of det(m) as SQL text, m given as rows of column
    * names / sub-expressions.
    */
  private[graft] def detSql(m: Vector[Vector[String]]): String =
    if (m.length == 1) m(0)(0)
    else m(0).indices.map { j =>
      val minor = m.tail.map(row => row.take(j) ++ row.drop(j + 1))
      val term = s"${m(0)(j)} * (${detSql(minor)})"
      if (j % 2 == 0) s"+ $term" else s"- $term"
    }.mkString(" ").stripPrefix("+ ")

  /** Normal-equations matrix for y ~ 1 + x1 + x2 + x3 in moment names. */
  private[graft] val ols3Matrix: Vector[Vector[String]] = Vector(
    Vector("n", "s1", "s2", "s3"),
    Vector("s1", "s11", "s12", "s13"),
    Vector("s2", "s12", "s22", "s23"),
    Vector("s3", "s13", "s23", "s33"))

  private[graft] val ols3Rhs: Vector[String] =
    Vector("sy", "s1y", "s2y", "s3y")

  /** Cramer numerator for coefficient j (rhs replacing column j). */
  private[graft] def ols3BetaSql(j: Int): String =
    detSql(ols3Matrix.zipWithIndex.map { case (row, i) =>
      row.updated(j, ols3Rhs(i))
    })

  private[graft] val ols3DetSql: String = detSql(ols3Matrix)

  /** The 14 sufficient statistics of y ~ 1 + x1 + x2 + x3 as one
    * aggregation — SELECT list shared with the oracle via the name
    * contract (n, s1..s3, sy, s11..s33, s1y..s3y).
    */
  private[graft] def ols3MomentAggs(x1: Column, x2: Column, x3: Column,
                                    y: Column): Seq[Column] = Seq(
    count(lit(1)).cast("double").as("n"),
    sum(x1).as("s1"), sum(x2).as("s2"), sum(x3).as("s3"), sum(y).as("sy"),
    sum(x1 * x1).as("s11"), sum(x1 * x2).as("s12"), sum(x1 * x3).as("s13"),
    sum(x2 * x2).as("s22"), sum(x2 * x3).as("s23"), sum(x3 * x3).as("s33"),
    sum(x1 * y).as("s1y"), sum(x2 * y).as("s2y"), sum(x3 * y).as("s3y"))

  // --- General-d closed-form OLS (the inductive extension of olsFit3) ---

  /** Moment-column name for normal-equations entry (i, j), 0 = the
    * intercept column: n, s<i>, s<ij> (i<=j).
    */
  private def mName(i: Int, j: Int): String = {
    val (a, b) = (math.min(i, j), math.max(i, j))
    if (a == 0 && b == 0) "n"
    else if (a == 0) s"s$b"
    else s"s$a$b"
  }

  private[graft] def olsMatrix(d: Int): Vector[Vector[String]] =
    Vector.tabulate(d + 1, d + 1)(mName)

  private[graft] def olsRhs(d: Int): Vector[String] =
    Vector.tabulate(d + 1)(i => if (i == 0) "sy" else s"s${i}y")

  private[graft] def olsBetaSql(d: Int, j: Int): String =
    detSql(olsMatrix(d).zipWithIndex.map { case (row, i) =>
      row.updated(j, olsRhs(d)(i))
    })

  /** The (d+1)(d+4)/2 sufficient statistics of y ~ 1 + x1 + … + xd as
    * one aggregation; names follow the [[mName]]/[[olsRhs]] contract
    * shared with the oracle SQL.
    */
  private[graft] def olsMomentAggs(xs: Seq[Column], y: Column): Seq[Column] = {
    val d = xs.size
    Seq(count(lit(1)).cast("double").as("n")) ++
      (1 to d).map(i => sum(xs(i - 1)).as(s"s$i")) ++
      Seq(sum(y).as("sy")) ++
      (for (i <- 1 to d; j <- i to d)
        yield sum(xs(i - 1) * xs(j - 1)).as(s"s$i$j")) ++
      (1 to d).map(i => sum(xs(i - 1) * y).as(s"s${i}y"))
  }

  /** General-d OLS with intercept, closed form: one linear pass for the
    * sufficient statistics, then generated Cramer's rule on the
    * (d+1)×(d+1) normal equations in-row. The determinant SQL text is
    * the SAME string Spark and the oracle parse, so FP evaluation order
    * is pinned by construction at every d. Laplace expansion is
    * O((d+1)!) terms — fine through d≈5; beyond that use `fitLinear`
    * (solver="normal", Cholesky) whose cost is O(d³).
    */
  def olsFitN(df: DataFrame, xCols: Seq[String], yCol: String,
              roundTo: Int = 4): DataFrame = {
    val d = xCols.size
    require(d >= 1 && d <= 5, s"d=$d out of closed-form range 1..5")
    val betas = (0 to d).map { j =>
      expr(s"round((${olsBetaSql(d, j)}) / " +
        s"nullif((${detSql(olsMatrix(d))}), 0), $roundTo) + 0.0").as(s"b$j")
    }
    val m = olsMomentAggs(
      xCols.map(c => col(c).cast("double")), col(yCol).cast("double"))
    df.agg(m.head, m.tail: _*).select(betas: _*)
  }

  /** Trivariate OLS with intercept, closed form: one aggregation for the
    * 14 sufficient statistics, then generated Cramer's rule on the 4×4
    * normal equations in-row — the ≥3-feature extension of [[olsFit2]]
    * (the reference's model averaging handled arbitrary dims;
    * `splearn/linear_model/base.py:~L100`). Still one linear pass and
    * O(1) result — no matrix library, no driver state.
    */
  def olsFit3(df: DataFrame, x1Col: String, x2Col: String, x3Col: String,
              yCol: String): DataFrame = {
    val betas = (0 until 4).map { j =>
      // + 0.0 canonicalizes -0.0 (repo-wide round rule); nullif guards
      // the singular (collinear-features) case identically across
      // engines — Spark non-ANSI x/0 is NULL, DuckDB is inf/nan.
      expr(s"round((${ols3BetaSql(j)}) / nullif(($ols3DetSql), 0), 4) + 0.0")
        .as(s"b$j")
    }
    val m = ols3MomentAggs(
      col(x1Col).cast("double"), col(x2Col).cast("double"),
      col(x3Col).cast("double"), col(yCol).cast("double"))
    df.agg(m.head, m.tail: _*).select(betas: _*)
  }

  /** Deterministic batch gradient descent for logistic regression:
    * weights start at zero, `iters` full-batch steps of rate `lr`, no
    * intercept, no RNG — so the entire fit is SQL-expressible and
    * oracle-checkable step for step (the iterative twin of the ml
    * L-BFGS `fitLogistic`, whose line search isn't mirrorable). Each
    * step is two broadcast joins + two aggregations over the long-form
    * points: margins per row, then the gradient avg((σ(m)−y)·x) per
    * dim. Weights are O(dims) — broadcast-sized driver-free state.
    */
  /** One un-materialized GD step: weights in, weights out. Exposed
    * package-private so PlanSpec can pin the step's SHAPE (model state
    * rides a broadcast hash join, never a shuffle of the weight side) —
    * the materializing loop below erases the joins from the returned
    * frame's plan, so the step is where the property is visible.
    */
  private[graft] def gdStep(pointsLong: DataFrame, labels: DataFrame,
                            idCol: String, labelCol: String, lr: Double,
                            w: DataFrame): DataFrame = {
    val margins = pointsLong
      .join(broadcast(w), "dim")
      .groupBy(col(idCol))
      .agg(sum(col("v") * col("w")).as("m"))
    val errs = margins.join(labels, idCol)
      .select(col(idCol),
        (lit(1.0) / (lit(1.0) + exp(-col("m"))) - col(labelCol)).as("err"))
    val grad = pointsLong.join(errs, idCol)
      .groupBy(col("dim"))
      .agg(avg(col("err") * col("v")).as("g"))
    w.join(grad, "dim")
      .select(col("dim"), (col("w") - lit(lr) * col("g")).as("w"))
  }

  def logisticGdIterations(pointsLong: DataFrame, labels: DataFrame,
                           idCol: String, labelCol: String,
                           iters: Int, lr: Double): DataFrame = {
    var w = pointsLong.select(col("dim")).distinct()
      .withColumn("w", lit(0.0))
    (1 to iters).foreach { _ =>
      w = gdStep(pointsLong, labels, idCol, labelCol, lr, w)
      // Materialize the O(dims) weight frame EVERY step. Two distinct
      // failure modes without it: (a) analysis cost — past ~20 steps
      // DeduplicateRelations over the exponentially-referenced tree
      // dwarfs execution (measured driver OOM in the analyzer at 80
      // iterations); (b) EXECUTION blowup even at 2 steps — w_i appears
      // twice in w_{i+1}'s tree (the update join + the next margins'
      // broadcast), so un-materialized weights re-run every prior
      // step's margins/errs/grad chain 2^i times (measured ~7.5s of
      // repeated tiny shuffle jobs on a 20k-row long form inside
      // curation_scored; ~1s with per-step materialization). The
      // checkpointed frame is `dims` rows — metadata-scale, the r9
      // slim-frame carve-out — and values are identical step for step,
      // so oracle mirroring is unaffected.
      w = w.localCheckpoint()
    }
    w
  }

  /** ONE-VS-REST multiclass for the deterministic GD family — the
    * reference's `SGDClassifier.fit(classes=…)` semantics
    * (`splearn/linear_model/stochastic_gradient.py:~L10-70`: sklearn
    * SGD is multiclass via OvR). Every class's binary problem trains
    * SIMULTANEOUSLY in one plan: the class id rides through the weight
    * frame exactly like [[blockAveragedLogisticGd]]'s block id, so each
    * step is still two aggregations over one long-form relation — never
    * a driver loop over classes. Weights zero-init, `iters` full-batch
    * steps, rate `lr`, no intercept, no RNG: the whole fit unrolls into
    * a SQL oracle with `cls` threaded through every CTE.
    *
    * Returns (cls, dim, w). Weight state is O(classes × dims) —
    * broadcast-sized; the per-step materialization rule of
    * [[logisticGdIterations]] applies unchanged (the frame is
    * referenced by both the update join and the next broadcast).
    */
  def logisticGdOvr(pointsLong: DataFrame, labels: DataFrame,
                    idCol: String, labelCol: String,
                    iters: Int, lr: Double): DataFrame = {
    val classes = labels.select(col(labelCol).as("cls")).distinct()
    // per-class binary targets: y=1 iff the row's label IS the class
    val binLabels = labels.crossJoin(broadcast(classes))
      .select(col(idCol), col("cls"),
        (col(labelCol) === col("cls")).cast("double").as("_y"))
    var w = pointsLong.select(col("dim")).distinct()
      .crossJoin(broadcast(classes))
      .withColumn("w", lit(0.0))
    (1 to iters).foreach { _ =>
      val margins = pointsLong
        .join(broadcast(w), "dim") // fans each point out to every class
        .groupBy(col("cls"), col(idCol))
        .agg(sum(col("v") * col("w")).as("m"))
      val errs = margins.join(binLabels, Seq(idCol, "cls"))
        .select(col("cls"), col(idCol),
          (lit(1.0) / (lit(1.0) + exp(-col("m"))) - col("_y")).as("err"))
      val grad = pointsLong.join(errs, idCol)
        .groupBy(col("cls"), col("dim"))
        .agg(avg(col("err") * col("v")).as("g"))
      w = w.join(grad, Seq("cls", "dim"))
        .select(col("cls"), col("dim"),
          (col("w") - lit(lr) * col("g")).as("w"))
      // classes×dims rows — metadata-scale; same 2^i/analyzer rationale
      // as logisticGdIterations
      w = w.localCheckpoint()
    }
    w
  }

  /** OvR predict: per-row margins against every class's weight vector
    * (one broadcast join + one aggregation), argmax by (margin DESC,
    * cls ASC) for determinism. Returns (idCol, pred, margin) with the
    * winning margin rounded to `roundTo`.
    */
  def logisticOvrPredict(pointsLong: DataFrame, weights: DataFrame,
                         idCol: String, roundTo: Int = 4): DataFrame = {
    val margins = pointsLong
      .join(broadcast(weights), "dim")
      .groupBy(col(idCol), col("cls"))
      .agg(sum(col("v") * col("w")).as("m"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("m").desc, col("cls"))
    margins.withColumn("_rn", row_number().over(win))
      .where(col("_rn") === 1)
      .select(col(idCol), col("cls").as("pred"),
        (round(col("m"), roundTo) + lit(0.0)).as("margin"))
  }

  /** OvR predict_proba (upstream `splearn/linear_model/logistic.py`
    * exposes predict_proba on the logistic family): per-class sigmoid
    * of the margin, normalized across classes — sklearn's
    * OneVsRestClassifier convention. Long form (idCol, cls, proba);
    * the normalizing sum is a per-id window over ≤ n_classes rows,
    * never corpus-sized. Calibrated probabilities are what a scored
    * curation gate thresholds — argmax alone loses the margin.
    */
  def logisticOvrProba(pointsLong: DataFrame, weights: DataFrame,
                       idCol: String, roundTo: Int = 6): DataFrame = {
    val margins = pointsLong
      .join(broadcast(weights), "dim")
      .groupBy(col(idCol), col("cls"))
      .agg(sum(col("v") * col("w")).as("m"))
    val wid = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
    margins
      .withColumn("_s", lit(1.0) / (lit(1.0) + exp(-col("m"))))
      .select(col(idCol), col("cls"),
        (round(col("_s") / sum(col("_s")).over(wid), roundTo) + lit(0.0))
          .as("proba"))
  }

  /** Weighted 1-D OLS — sklearn's `sample_weight` for the closed-form
    * family (upstream estimators pass it straight to sklearn per block;
    * `splearn/linear_model/base.py`). Weighted moments in ONE pass:
    * slope = (Σw·Σwxy − Σwx·Σwy) / (Σw·Σwxx − (Σwx)²), intercept =
    * (Σwy − slope·Σwx)/Σw. Integer weights reproduce exactly the fit
    * on a row-replicated corpus (w ≡ repeat count); a weight column of
    * ones reproduces [[olsFit]] (MLOpsSpec pins both). The natural
    * cable for the DSIR/temperature outputs this library computes:
    * fit on the mixture-reweighted corpus without materializing it.
    */
  def olsFitWeighted(df: DataFrame, xCol: String, yCol: String,
                     wCol: String, roundTo: Int = 4): DataFrame = {
    val slope = (col("sw") * col("swxy") - col("swx") * col("swy")) /
      nullif(col("sw") * col("swxx") - col("swx") * col("swx"), lit(0.0))
    df.agg(
      sum(col(wCol)).as("sw"),
      sum(col(wCol) * col(xCol)).as("swx"),
      sum(col(wCol) * col(yCol)).as("swy"),
      sum(col(wCol) * col(xCol) * col(xCol)).as("swxx"),
      sum(col(wCol) * col(xCol) * col(yCol)).as("swxy"))
      .select(
        (round(slope, roundTo) + lit(0.0)).as("slope"),
        (round((col("swy") - slope * col("swx")) / col("sw"), roundTo)
          + lit(0.0)).as("intercept"))
  }

  def fitLogistic(df: DataFrame, featuresArr: String, labelCol: String,
                  maxIter: Int = 20): DataFrame = {
    val prepared = df.withColumn("features",
      array_to_vector(col(featuresArr).cast("array<double>")))
    val model = new LogisticRegression()
      .setMaxIter(maxIter).setLabelCol(labelCol).setFeaturesCol("features")
      .fit(prepared)
    model.transform(prepared)
  }

  /** L-BFGS fit + NATIVE-expression predict: the model's coefficients
    * come back to the driver (O(d) doubles) and the margin/prediction/
    * probability are computed with codegen'd array expressions instead
    * of `model.transform`'s vector UDF. Two reasons: (a) the UDF closure
    * serializes the model object, whose training-summary DataFrame
    * chains to the shared SparkSession — under a concurrent query that
    * has an `Observation` registered (the components family), task
    * serialization hits the non-serializable ObservationManager (seen
    * deterministically in the multithreaded Verify harness); a
    * coefficients literal has no object graph at all. (b) the whole
    * scoring stage stays inside WholeStageCodegen — no ml vector
    * boxing on the hot path, which is the shape that scales to a wide
    * corpus scan. Binary prediction threshold 0.5 == margin > 0.
    */
  def fitLogisticPredictNative(df: DataFrame, featuresArr: String,
                               labelCol: String, maxIter: Int = 20): DataFrame = {
    val prepared = df.withColumn("features",
      array_to_vector(col(featuresArr).cast("array<double>")))
    val model = new LogisticRegression()
      .setMaxIter(maxIter).setLabelCol(labelCol).setFeaturesCol("features")
      .fit(prepared)
    val coef = model.coefficients.toArray
    val margin = coef.zipWithIndex.foldLeft(lit(model.intercept)) {
      case (acc, (w, i)) =>
        if (w == 0.0) acc
        else acc + lit(w) * element_at(col(featuresArr), i + 1).cast("double")
    }
    df.withColumn("margin", margin)
      .withColumn("prediction", (col("margin") > 0).cast("double"))
      .withColumn("probability", lit(1.0) / (lit(1.0) + exp(-col("margin"))))
  }

  /** spark.ml linear regression (multi-feature). Default solver "normal"
    * solves the normal equations exactly (WLS/Cholesky over one pass of
    * sufficient statistics — deterministic, so the fit is oracle-checkable
    * against the closed-form Cramer SQL); pass "l-bfgs" for the iterative
    * path when d is too large for the d×d normal matrix.
    */
  def fitLinear(df: DataFrame, featureCols: Seq[String], labelCol: String,
                solver: String = "normal"): DataFrame = {
    val prepared = df.withColumn("features",
      array_to_vector(array(featureCols.map(c => col(c).cast("double")): _*)))
    val model = new LinearRegression()
      .setLabelCol(labelCol).setFeaturesCol("features").setSolver(solver)
      .fit(prepared)
    prepared.sparkSession.createDataFrame(
      Seq((model.intercept, model.coefficients.toArray.toSeq))
    ).toDF("intercept", "coefficients")
  }
}
