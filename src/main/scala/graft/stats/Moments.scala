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
      // nullif: a constant column (sigma 0) scales to NULL instead of an
      // ANSI divide-by-zero error (Spark 4 default) or ±Infinity.
      .withColumn(outCol,
        round((col(valueCol) - col("_mu")) / nullif(col("_sigma"), lit(0.0)), 6))
      .drop("_mu", "_sigma")
  }

  /** Weighted StandardScaler: z-score against WEIGHTED population
    * moments (sklearn `StandardScaler.fit(X, sample_weight=w)`):
    * mu = SUM(w*x)/SUM(w), var = SUM(w*x^2)/SUM(w) - mu^2 — the one-pass
    * sufficient statistics (SUM w, SUM wx, SUM wx^2), so the fit stays a
    * single map-side-combinable aggregation and the 1-row moment frame
    * is broadcast. w == 1 everywhere reduces exactly to [[standardScale]]
    * (spec-pinned); integer weights equal a row-replicated corpus.
    * Closes the scaler leg of the r16 sample-weight item alongside
    * `LinearOps.olsFitWeighted` / `NaiveBayesOps.multinomialFitWeighted`.
    */
  def standardScaleWeighted(df: DataFrame, valueCol: String,
                            weightCol: String, outCol: String): DataFrame = {
    val moments = df.agg(
      sum(col(weightCol)).as("_sw"),
      sum(col(weightCol) * col(valueCol)).as("_swx"),
      sum(col(weightCol) * col(valueCol) * col(valueCol)).as("_swx2"))
    df.crossJoin(broadcast(moments))
      .withColumn("_mu", col("_swx") / col("_sw"))
      .withColumn("_sigma",
        sqrt(col("_swx2") / col("_sw") - col("_mu") * col("_mu")))
      .withColumn(outCol,
        round((col(valueCol) - col("_mu")) / nullif(col("_sigma"), lit(0.0)), 6))
      .drop("_sw", "_swx", "_swx2", "_mu", "_sigma")
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

  /** MinMaxScaler: (x − min) / (max − min) against whole-table extrema.
    * Same one-pass-moments + broadcast shape as [[standardScale]].
    */
  def minMaxScale(df: DataFrame, valueCol: String, outCol: String): DataFrame = {
    val m = df.agg(min(col(valueCol)).as("_lo"), max(col(valueCol)).as("_hi"))
    df.crossJoin(broadcast(m))
      .withColumn(outCol,
        round((col(valueCol) - col("_lo"))
          / nullif(col("_hi") - col("_lo"), lit(0.0)), 6) + lit(0.0))
      .drop("_lo", "_hi")
  }

  /** MaxAbsScaler: x / max(|x|) — sign-preserving scale to [−1, 1]. */
  def maxAbsScale(df: DataFrame, valueCol: String, outCol: String): DataFrame = {
    val m = df.agg(max(abs(col(valueCol))).as("_ma"))
    df.crossJoin(broadcast(m))
      .withColumn(outCol,
        round(col(valueCol) / nullif(col("_ma"), lit(0.0)), 6) + lit(0.0))
      .drop("_ma")
  }

  /** Row-wise L2 Normalizer over `features`: each value divided by the
    * row's Euclidean norm. Pure per-row arithmetic — no aggregation, no
    * state, streaming-safe.
    */
  def normalizeRows(df: DataFrame, features: Seq[String],
                    prefix: String = "n_"): DataFrame = {
    val norm = sqrt(features.map(f => col(f) * col(f)).reduce(_ + _))
    features.foldLeft(df.withColumn("_norm", nullif(norm, lit(0.0)))) {
      (acc, f) =>
        acc.withColumn(s"$prefix$f",
          round(col(f) / col("_norm"), 6) + lit(0.0))
    }.drop("_norm")
  }

  /** Binarizer: 1 when x > threshold else 0 (per-row, stateless). */
  def binarize(df: DataFrame, valueCol: String, threshold: Double,
               outCol: String): DataFrame =
    df.withColumn(outCol, (col(valueCol) > threshold).cast("int"))

  /** LabelEncoder.fit: distinct classes → dense 0-based indices in sort
    * order. The index window runs over only the O(classes) distinct rows;
    * transform is a broadcast join of this frame back onto the data.
    */
  def labelEncode(df: DataFrame, classCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.select(col(classCol)).distinct()
      .withColumn("label_idx",
        (row_number().over(Window.orderBy(col(classCol))) - 1).cast("long"))
  }

  /** Mean Imputer: nulls in `valueCol` replaced by the non-null mean
    * (avg ignores nulls on both engines). One-pass moment + broadcast.
    */
  def imputeMean(df: DataFrame, valueCol: String, outCol: String): DataFrame = {
    val m = df.agg(avg(col(valueCol)).as("_mean"))
    df.crossJoin(broadcast(m))
      .withColumn(outCol,
        round(coalesce(col(valueCol), col("_mean")), 6) + lit(0.0))
      .drop("_mean")
  }

  /** PolynomialFeatures degree 2 over two columns: x², xy, y² appended —
    * pure per-row arithmetic, stateless.
    */
  def polynomialFeatures2(df: DataFrame, xCol: String, yCol: String): DataFrame =
    df
      .withColumn(s"${xCol}_sq", round(col(xCol) * col(xCol), 6) + lit(0.0))
      .withColumn(s"${xCol}_${yCol}", round(col(xCol) * col(yCol), 6) + lit(0.0))
      .withColumn(s"${yCol}_sq", round(col(yCol) * col(yCol), 6) + lit(0.0))

  /** KBinsDiscretizer (quantile strategy) via ntile: equal-population
    * bins, deterministic under the caller-supplied total ordering
    * (`tieBreak` must make the sort total or bin edges are
    * engine-dependent). One global sort — the same cost profile as any
    * exact quantile; for approximate binning at extreme scale use
    * approx_percentile cut points instead.
    */
  def kBinsDiscretize(df: DataFrame, valueCol: String, bins: Int,
                      tieBreak: Seq[Column], outCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn(outCol,
      ntile(bins).over(Window.orderBy(col(valueCol) +: tieBreak: _*)))
  }

  /** The 100 TB twin of [[kBinsDiscretize]]: bin by value against
    * `bins-1` approx_percentile cut points — ONE mergeable one-pass
    * sketch aggregation plus a broadcast, no global sort anywhere.
    * bin(x) = 1 + |{cut points < x}| (ties land in the lower bin,
    * and equal values always share a bin — the semantic difference
    * from ntile, which splits ties to equalize populations). With
    * `accuracy` ≥ the row count the sketch is EXACT, which is what
    * the oracle pins on the sf fixtures; at scale, accuracy is the
    * memory/error knob (error ≤ 1/accuracy in rank).
    */
  def kBinsApprox(df: DataFrame, valueCol: String, bins: Int,
                  outCol: String, accuracy: Int = 10000): DataFrame = {
    require(bins > 1, s"bins=$bins must be > 1")
    val probs = (1 until bins).map(i => s"${i.toDouble / bins}D")
      .mkString(", ")
    val cuts = df.agg(expr(
      s"approx_percentile(CAST($valueCol AS DOUBLE), array($probs), " +
        s"$accuracy)").as("_cuts"))
    df.crossJoin(broadcast(cuts))
      .withColumn(outCol,
        (lit(1) + size(filter(col("_cuts"),
          c => c < col(valueCol).cast("double")))).cast("int"))
      .drop("_cuts")
  }

  /** The 100 TB twin of [[quantileTransform]]: empirical CDF position
    * quantized to a `resolution`-point approx_percentile grid —
    * u(x) = |{grid cuts < x}| / resolution. Same sketch-and-broadcast
    * shape as [[kBinsApprox]]; the exact transform's percent_rank is
    * recovered up to 1/resolution as resolution grows.
    */
  def quantileTransformApprox(df: DataFrame, valueCol: String,
                              outCol: String, resolution: Int = 100,
                              accuracy: Int = 10000): DataFrame = {
    require(resolution > 1, s"resolution=$resolution must be > 1")
    val probs = (1 until resolution).map(i => s"${i.toDouble / resolution}D")
      .mkString(", ")
    val cuts = df.agg(expr(
      s"approx_percentile(CAST($valueCol AS DOUBLE), array($probs), " +
        s"$accuracy)").as("_cuts"))
    df.crossJoin(broadcast(cuts))
      .withColumn(outCol,
        round(size(filter(col("_cuts"),
            c => c < col(valueCol).cast("double")))
          .cast("double") / resolution, 6) + lit(0.0))
      .drop("_cuts")
  }

  /** Pearson correlation matrix over a feature list, long form
    * (feat_a <= feat_b): ONE aggregation computing every pairwise
    * `corr` — no per-pair scans, upper triangle only. O(d²) result
    * columns; for d in the hundreds switch to the Gramian route
    * (ClusterOps.gramian on standardized columns).
    */
  def corrMatrix(df: DataFrame, features: Seq[String],
                 roundTo: Int = 6): DataFrame = {
    require(features.size >= 2 && features.distinct.size == features.size,
      "need >= 2 distinct features")
    val pairs = for (i <- features.indices; j <- i until features.size)
      yield (features(i), features(j))
    val aggs = pairs.map { case (a, b) =>
      (round(corr(col(a).cast("double"), col(b).cast("double")), roundTo)
        + lit(0.0)).as(s"_c_${a}_$b")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = pairs.map { case (a, b) => s"'$a', '$b', `_c_${a}_$b`" }
      .mkString(", ")
    wide.select(expr(
      s"stack(${pairs.size}, $stacked) as (feat_a, feat_b, corr)"))
  }

  /** One-way ANOVA F statistic per feature (sklearn `f_classif`):
    * F = (SSB/(k−1)) / (SSW/(n−k)) over a caller-fixed label set via
    * per-(feature, class) sufficient statistics (n, Σx, Σx²) — one
    * `stack` projection + two hash aggregations, no per-class scans.
    * Degenerate cases (one class, zero within-group variance) yield
    * NULL, never a division error.
    */
  def anovaF(df: DataFrame, labelCol: String,
             features: Seq[String]): DataFrame = {
    require(features.nonEmpty, "features must be non-empty")
    val stacked = df.select(col(labelCol).as("_y"),
      expr(s"stack(${features.size}, " +
        features.map(f => s"'$f', cast($f as double)").mkString(", ") +
        ") as (feature, v)"))
    val grp = stacked.groupBy(col("feature"), col("_y"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("v")).as("s"), sum(col("v") * col("v")).as("q"))
    grp.groupBy(col("feature"))
      .agg(count(lit(1)).cast("double").as("k"),
        sum(col("n")).as("nn"), sum(col("s")).as("ss"),
        (sum(col("q")) - sum(col("s") * col("s") / col("n"))).as("ssw"),
        sum(col("s") * col("s") / col("n")).as("ssb_raw"))
      .withColumn("ssb", col("ssb_raw") - col("ss") * col("ss") / col("nn"))
      .select(col("feature"),
        (round((col("ssb") / nullif(col("k") - 1, lit(0.0)))
          / nullif(col("ssw") / (col("nn") - col("k")), lit(0.0)), 4)
          + lit(0.0)).as("f_stat"))
  }

  /** One-hot encoding over a FIXED category list (the deterministic
    * relational twin of ml's OneHotEncoder): one 0/1 indicator column
    * per category, unknown categories encode as all-zeros. Pure map-side
    * CASE columns — no fit, no shuffle, streaming-safe; fix the category
    * list from config or a prior distinct() so the output schema never
    * depends on data order.
    */
  def oneHot(df: DataFrame, catCol: String, categories: Seq[String],
             prefix: String): DataFrame = {
    require(categories.nonEmpty && categories.distinct.size == categories.size,
      "categories must be non-empty and distinct")
    categories.foldLeft(df) { (d, c) =>
      d.withColumn(s"${prefix}_$c", (col(catCol) === c).cast("int"))
    }
  }

  /** QuantileTransformer (uniform output): empirical CDF position via
    * `percent_rank` under a caller-supplied TOTAL ordering. Global
    * window — the oracled verification twin; at 100 TB use
    * approx_percentile cut points exactly like kBinsDiscretize.
    */
  def quantileTransform(df: DataFrame, valueCol: String,
                        tieBreak: Seq[Column], outCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn(outCol,
      (round(percent_rank().over(
        Window.orderBy(col(valueCol) +: tieBreak: _*)), 6) + lit(0.0)))
  }

  /** RobustScaler: (x − median) / IQR — sklearn's outlier-resistant
    * scaler with its default (25, 75) quantile range. EXACT linear-
    * interpolated percentiles (one sort-based aggregate) keep this the
    * oracled twin; at 100 TB swap `percentile` for `approx_percentile`
    * (one-pass mergeable sketch) exactly like the quantiles_lineitem
    * exact/approx pair. Constant-valued columns (IQR 0) scale to NULL,
    * never Infinity.
    */
  def robustScale(df: DataFrame, valueCol: String, outCol: String): DataFrame = {
    val q = df.agg(
      expr(s"percentile($valueCol, array(0.25D, 0.5D, 0.75D))").as("_q"))
    df.crossJoin(broadcast(q))
      .withColumn(outCol,
        round((col(valueCol) - element_at(col("_q"), 2))
          / nullif(element_at(col("_q"), 3) - element_at(col("_q"), 1),
            lit(0.0)), 6) + lit(0.0))
      .drop("_q")
  }

  /** The 100 TB twin of [[robustScale]]: the same (x − median)/IQR
    * rescale off `approx_percentile`'s one-pass MERGEABLE sketch
    * instead of the exact sort-based `percentile` — no global sort,
    * partial-aggregable across 1000 executors, the same
    * sketch-and-broadcast shape as [[kBinsApprox]]. SPEC-pinned, not
    * value-oracled: the sketch's rank-±1 guarantee means the DISCRETE
    * element it returns can differ from another engine's
    * `quantile_disc` pick by one neighboring sample (measured: exact
    * match at 60k rows, 5th-decimal drift at 600k) — harmless for
    * binning twins like [[kBinsApprox]]/[[quantileTransformApprox]]
    * (a cut moving one sample flips ~nothing), but fatal for direct
    * VALUE equality. The spec bounds |approx − exact| by the
    * rank-error-implied tolerance instead. IQR-0 scales to NULL,
    * never Infinity (same nullif guard as the exact twin).
    */
  def robustScaleApprox(df: DataFrame, valueCol: String, outCol: String,
                        accuracy: Int = 10000): DataFrame = {
    val q = df.agg(expr(
      s"approx_percentile(CAST($valueCol AS DOUBLE), " +
        s"array(0.25D, 0.5D, 0.75D), $accuracy)").as("_q"))
    df.crossJoin(broadcast(q))
      .withColumn(outCol,
        round((col(valueCol) - element_at(col("_q"), 2))
          / nullif(element_at(col("_q"), 3) - element_at(col("_q"), 1),
            lit(0.0)), 6) + lit(0.0))
      .drop("_q")
  }
}
