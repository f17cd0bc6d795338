package graft.packs

import graft.QueryPack
import graft.core.Tables
import graft.stats.Moments
import org.apache.spark.sql.functions._

/** Feature selection & preprocessing (SURVEY §2.3, S1–S2). */
object StatsQueries extends QueryPack {

  private val liFeatures =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  val queries: Map[String, Q] = Map(
    // S1: VarianceThreshold.fit — per-feature population variance + keep
    // mask from distributed sufficient stats.
    "s1_variance_threshold" -> ((s, dir) => {
      Moments.varianceThreshold(Tables(s, dir).lineitem, liFeatures, threshold = 1.0)
        .orderBy(col("feature"))
    }),

    // S2: StandardScaler — z-score against WHOLE-table moments, output
    // restricted to a stable slice.
    "s2_standard_scaler" -> ((s, dir) => {
      Moments.standardScale(Tables(s, dir).lineitem, "l_quantity", "z_qty")
        .where(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("z_qty"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // S3: MinMaxScaler against whole-table extrema.
    "s3_minmax_scaler" -> ((s, dir) => {
      Moments.minMaxScale(Tables(s, dir).lineitem, "l_extendedprice", "mm_price")
        .where(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("mm_price"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // S4: MaxAbsScaler — sign-preserving scale to [-1, 1].
    "s4_maxabs_scaler" -> ((s, dir) => {
      Moments.maxAbsScale(Tables(s, dir).lineitem, "l_discount", "ma_disc")
        .where(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_discount"), col("ma_disc"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // S5: row-wise L2 Normalizer over the 4 numeric features — per-row
    // arithmetic only (no aggregation; streaming-safe).
    "s5_row_normalizer" -> ((s, dir) => {
      Moments.normalizeRows(Tables(s, dir).lineitem, liFeatures)
        .where(col("l_orderkey") < 100)
        .select(Seq(col("l_orderkey"), col("l_linenumber")) ++
          liFeatures.map(f => col(s"n_$f")): _*)
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // S6: Binarizer.
    "s6_binarizer" -> ((s, dir) => {
      Moments.binarize(Tables(s, dir).lineitem, "l_discount", 0.05, "b_disc")
        .where(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_discount"), col("b_disc"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // S7: LabelEncoder fit + transform — the index window covers only
    // the O(classes) distinct rows; transform is a broadcast join.
    "s7_label_encoder" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      docs.select(col("doc_id"), col("lang"))
        .join(broadcast(Moments.labelEncode(docs, "lang")), "lang")
        .select(col("doc_id"), col("lang"), col("label_idx"))
        .orderBy(col("doc_id"))
    }),

    // S8: mean Imputer over deterministically-injected nulls (the
    // testdata has none) — pins avg-ignores-nulls + fill semantics.
    "s8_mean_imputer" -> ((s, dir) => {
      val withNulls = Tables(s, dir).lineitem
        .withColumn("q_holes",
          when(pmod(col("l_orderkey"), lit(7)) === 0, lit(null))
            .otherwise(col("l_quantity")))
      Moments.imputeMean(withNulls, "q_holes", "q_filled")
        .where(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"), col("q_holes"),
          col("q_filled"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // S9: PolynomialFeatures degree 2 (per-row, stateless).
    "s9_poly_features" -> ((s, dir) => {
      Moments.polynomialFeatures2(Tables(s, dir).lineitem,
          "l_quantity", "l_discount")
        .where(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity_sq"), col("l_quantity_l_discount"),
          col("l_discount_sq"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // S10: KBinsDiscretizer (quantile strategy) via ntile under a TOTAL
    // ordering (value + unique keys) so bin edges are engine-identical.
    "s10_kbins" -> ((s, dir) => {
      Moments.kBinsDiscretize(
          Tables(s, dir).lineitem.where(col("l_orderkey") < 200),
          "l_extendedprice", bins = 4,
          Seq(col("l_orderkey"), col("l_linenumber")), "price_bin")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("price_bin"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // S18: the 100 TB twin of s10 — approx_percentile cut points (one
    // mergeable sketch pass, NO global sort) with accuracy > the row
    // count, where the sketch is exact; the oracle recomputes the same
    // discrete quantiles. Cut points fit on the FULL table, output
    // filtered for dump size.
    "s18_kbins_approx" -> ((s, dir) => {
      Moments.kBinsApprox(Tables(s, dir).lineitem, "l_extendedprice",
          bins = 8, "price_bin", accuracy = 10000000)
        .where(col("l_orderkey") < 200)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("price_bin"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // S19: the 100 TB twin of s15 — CDF position quantized to a
    // 100-point exact-at-this-accuracy percentile grid.
    "s19_quantile_transform_approx" -> ((s, dir) => {
      Moments.quantileTransformApprox(Tables(s, dir).lineitem,
          "l_extendedprice", "q_price", resolution = 100,
          accuracy = 10000000)
        .where(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("q_price"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // S20: robustScaleApprox under a FULL VALUE oracle (it was
    // spec-pinned only): the input is floor-quantized to 5000-wide
    // buckets, so each quartile position sits deep inside a run of
    // thousands of equal values — the sketch's rank-±1 freedom (and
    // any engine disagreement about WHICH neighboring sample a
    // discrete quantile picks) cannot change the VALUE. Audited, not
    // hoped: at both SFs the values at ranks ⌈p·n⌉±3 are identical for
    // all three probs (the s18/s19 boundary-collision technique;
    // SCALE.md r19). accuracy > row count ⇒ the sketch itself is exact.
    "s20_robust_scale_approx" -> ((s, dir) => {
      Moments.robustScaleApprox(
          Tables(s, dir).lineitem.withColumn("q_price",
            // cast: Spark floor yields LONG, DuckDB floor DOUBLE — the
            // driver compare is type-faithful (r19), so align explicitly
            (floor(col("l_extendedprice") / 5000) * 5000).cast("double")),
          "q_price", "rs", accuracy = 10000000)
        .where(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"), col("q_price"),
          col("rs"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // S11: chi2 SelectKBest — most lang-discriminative terms. Fixed class
    // order keeps the float assembly engine-identical (see stats.Chi2).
    "s11_chi2_select" -> ((s, dir) => {
      graft.stats.Chi2.selectKBest(Tables(s, dir).documents,
          col("lang"), col("text"), Seq("de", "en", "es", "fr", "zh"), k = 40)
        .orderBy(col("chi2").desc, col("term"))
    }),

    // S12: RobustScaler — (x − median)/IQR with exact interpolated
    // percentiles (sklearn default quantile range).
    "s12_robust_scaler" -> ((s, dir) => {
      Moments.robustScale(Tables(s, dir).lineitem, "l_extendedprice",
          "rs_price")
        .where(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("rs_price"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // S13: one-way ANOVA F per feature (sklearn f_classif) against the
    // return-flag classes — sufficient-statistic algebra, SQL-mirrored.
    "s13_anova_f" -> ((s, dir) => {
      Moments.anovaF(Tables(s, dir).lineitem, "l_returnflag",
          Seq("l_quantity", "l_discount", "l_tax", "l_extendedprice"))
        .orderBy(col("feature"))
    }),

    // S14: one-hot over the fixed event-type vocabulary (deterministic
    // relational twin of ml OneHotEncoder; unknowns all-zero).
    "s14_one_hot" -> ((s, dir) => {
      Moments.oneHot(Tables(s, dir).events.where(col("event_id") < 2000),
          "event_type", Seq("click", "error", "purchase", "signup", "view"),
          "is")
        .select(col("event_id"), col("is_click"), col("is_error"),
          col("is_purchase"), col("is_signup"), col("is_view"))
        .orderBy(col("event_id"))
    }),

    // S16: Pearson correlation matrix (upper triangle, long form) — one
    // aggregation for every pairwise corr.
    "s16_corr_matrix" -> ((s, dir) => {
      Moments.corrMatrix(Tables(s, dir).lineitem,
          Seq("l_quantity", "l_discount", "l_tax", "l_extendedprice"))
        .orderBy(col("feat_a"), col("feat_b"))
    }),

    // S15: QuantileTransformer (uniform) — empirical CDF position under
    // a total ordering; global-window verification twin (see SCALE.md).
    "s15_quantile_transform" -> ((s, dir) => {
      Moments.quantileTransform(Tables(s, dir).lineitem, "l_extendedprice",
          Seq(col("l_orderkey"), col("l_linenumber")), "q_price")
        .where(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("q_price"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Dataset profiling: ONE aggregation pass -> one row per column
    // (n, nulls, exact distinct, extrema, moments) — the snapshot-health
    // table a pipeline materializes per ingest. exactDistinct=true is
    // the oracled contract; the approx_count_distinct switch is the
    // documented petabyte-width path (same schema, HLL error bound).
    "profile_numeric" -> ((s, dir) => {
      graft.stats.Profile.profileNumeric(Tables(s, dir).lineitem,
          liFeatures, exactDistinct = true)
        .orderBy(col("column"))
    }),

    // Snapshot drift: PSI / KL / JS between the even- and odd-doc_id
    // halves' token distributions, add-one smoothing over the union
    // vocabulary (the finite-everywhere convention, stated identically
    // on both engines). Work bounded by the union vocab, not the corpus.
    "drift_token_psi" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      graft.stats.Profile.tokenDrift(
        docs.where(col("doc_id") % 2 === 0),
        docs.where(col("doc_id") % 2 === 1), "text")
    }),

    // S17: weighted StandardScaler — sample_weight through the one-pass
    // sufficient stats (SUM w, SUM wx, SUM wx^2); weights here are the
    // integer line numbers so the oracle can state the same closed form.
    "s17_weighted_scaler" -> ((s, dir) => {
      Moments.standardScaleWeighted(Tables(s, dir).lineitem,
          "l_quantity", "l_linenumber", "zw_qty")
        .where(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("zw_qty"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    })
  )

  private val profileOracle: String = {
    val branches = liFeatures.map { c =>
      s"""SELECT '$c' AS "column", CAST(count($c) AS BIGINT) AS n,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_null,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(min($c) AS DOUBLE) AS min, CAST(max($c) AS DOUBLE) AS max,
         |  round(avg($c), 6) AS mean, round(stddev_pop($c), 6) AS stddev
         |FROM lineitem""".stripMargin
    }
    branches.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
  }

  val oracles: Map[String, String] = Map(
    "profile_numeric" -> profileOracle,

    // Same smoothing, same ln algebra; DuckDB FULL JOIN + coalesce
    // mirrors the Spark full outer join on term.
    "drift_token_psi" ->
      """WITH ta AS (SELECT term, count(*) AS ca FROM (
        |    SELECT unnest(string_split(text, ' ')) AS term
        |    FROM documents WHERE doc_id % 2 = 0) z
        |  WHERE len(term) > 0 GROUP BY term),
        |tb AS (SELECT term, count(*) AS cb FROM (
        |    SELECT unnest(string_split(text, ' ')) AS term
        |    FROM documents WHERE doc_id % 2 = 1) z
        |  WHERE len(term) > 0 GROUP BY term),
        |j AS (SELECT coalesce(ta.term, tb.term) AS term,
        |    coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
        |  FROM ta FULL JOIN tb ON ta.term = tb.term),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS v,
        |    CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
        |  FROM j),
        |pq AS (SELECT v, na, nb,
        |    (ca + 1.0) / (na + v) AS p, (cb + 1.0) / (nb + v) AS q,
        |    ((ca + 1.0) / (na + v) + (cb + 1.0) / (nb + v)) / 2.0 AS m
        |  FROM j, t)
        |SELECT max(v) AS n_terms, max(na) AS n_a, max(nb) AS n_b,
        |  round(sum((p - q) * ln(p / q)), 6) AS psi,
        |  round(sum(p * ln(p / q)), 6) AS kl_pq,
        |  round(sum(p * ln(p / m) / 2.0 + q * ln(q / m) / 2.0), 6) AS js
        |FROM pq""".stripMargin,

    "s17_weighted_scaler" ->
      """WITH m AS (SELECT sum(l_linenumber * l_quantity) / sum(l_linenumber) AS mu,
        |  sqrt(sum(l_linenumber * l_quantity * l_quantity) / sum(l_linenumber)
        |    - (sum(l_linenumber * l_quantity) / sum(l_linenumber))
        |      * (sum(l_linenumber * l_quantity) / sum(l_linenumber))) AS sigma
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber, l_quantity,
        |  round((l_quantity - m.mu) / m.sigma, 6) AS zw_qty
        |FROM lineitem, m
        |WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "s1_variance_threshold" -> {
      val branches = liFeatures.map { f =>
        s"""SELECT '$f' AS feature, round(var_pop($f), 4) AS variance,
           |  CASE WHEN var_pop($f) > 1.0 THEN 1 ELSE 0 END AS kept FROM lineitem""".stripMargin
      }
      branches.mkString("", "\nUNION ALL\n", "\nORDER BY feature")
    },

    "s2_standard_scaler" ->
      """WITH m AS (SELECT avg(l_quantity) AS mu, stddev_pop(l_quantity) AS sigma
        |           FROM lineitem)
        |SELECT l_orderkey, l_linenumber, l_quantity,
        |  round((l_quantity - m.mu) / m.sigma, 6) AS z_qty
        |FROM lineitem, m
        |WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "s3_minmax_scaler" ->
      """WITH m AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
        |           FROM lineitem)
        |SELECT l_orderkey, l_linenumber, l_extendedprice,
        |  round((l_extendedprice - m.lo) / (m.hi - m.lo), 6) + 0.0 AS mm_price
        |FROM lineitem, m
        |WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "s4_maxabs_scaler" ->
      """WITH m AS (SELECT max(abs(l_discount)) AS ma FROM lineitem)
        |SELECT l_orderkey, l_linenumber, l_discount,
        |  round(l_discount / m.ma, 6) + 0.0 AS ma_disc
        |FROM lineitem, m
        |WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "s5_row_normalizer" -> {
      val normSql = liFeatures.map(f => s"$f * $f").mkString(" + ")
      val outs = liFeatures.map(f =>
        s"round($f / sqrt($normSql), 6) + 0.0 AS n_$f").mkString(",\n  ")
      s"""SELECT l_orderkey, l_linenumber,
         |  $outs
         |FROM lineitem
         |WHERE l_orderkey < 100
         |ORDER BY l_orderkey, l_linenumber""".stripMargin
    },

    "s6_binarizer" ->
      """SELECT l_orderkey, l_linenumber, l_discount,
        |  CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END AS b_disc
        |FROM lineitem
        |WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "s7_label_encoder" ->
      """SELECT doc_id, lang,
        |  CAST(dense_rank() OVER (ORDER BY lang) - 1 AS BIGINT) AS label_idx
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "s8_mean_imputer" ->
      """WITH holes AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CASE WHEN l_orderkey % 7 = 0 THEN NULL ELSE l_quantity END
        |      AS q_holes
        |  FROM lineitem),
        |m AS (SELECT avg(q_holes) AS mean_q FROM holes)
        |SELECT l_orderkey, l_linenumber, q_holes,
        |  round(coalesce(q_holes, m.mean_q), 6) + 0.0 AS q_filled
        |FROM holes, m
        |WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "s9_poly_features" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_quantity * l_quantity, 6) + 0.0 AS l_quantity_sq,
        |  round(l_quantity * l_discount, 6) + 0.0 AS l_quantity_l_discount,
        |  round(l_discount * l_discount, 6) + 0.0 AS l_discount_sq
        |FROM lineitem
        |WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "s10_kbins" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice,
        |  CAST(ntile(4) OVER (ORDER BY l_extendedprice, l_orderkey,
        |    l_linenumber) AS INT) AS price_bin
        |FROM lineitem
        |WHERE l_orderkey < 200
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "s18_kbins_approx" -> {
      val probs = (1 until 8).map(i => i.toDouble / 8).mkString(", ")
      s"""WITH c AS (SELECT quantile_disc(CAST(l_extendedprice AS DOUBLE),
        |    [$probs]) AS cuts FROM lineitem)
        |SELECT l_orderkey, l_linenumber, l_extendedprice,
        |  CAST(1 + len(list_filter(c.cuts,
        |    x -> x < CAST(l_extendedprice AS DOUBLE))) AS INT) AS price_bin
        |FROM lineitem, c
        |WHERE l_orderkey < 200
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
    },

    "s19_quantile_transform_approx" -> {
      val probs = (1 until 100).map(i => i.toDouble / 100).mkString(", ")
      s"""WITH c AS (SELECT quantile_disc(CAST(l_extendedprice AS DOUBLE),
        |    [$probs]) AS cuts FROM lineitem)
        |SELECT l_orderkey, l_linenumber, l_extendedprice,
        |  round(CAST(len(list_filter(c.cuts,
        |    x -> x < CAST(l_extendedprice AS DOUBLE))) AS DOUBLE) / 100,
        |    6) + 0.0 AS q_price
        |FROM lineitem, c
        |WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
    },

    "s20_robust_scale_approx" ->
      """WITH c AS (SELECT quantile_disc(floor(l_extendedprice/5000)*5000,
        |    [0.25, 0.5, 0.75]) AS cuts FROM lineitem)
        |SELECT l_orderkey, l_linenumber,
        |  floor(l_extendedprice/5000)*5000 AS q_price,
        |  round((floor(l_extendedprice/5000)*5000 - c.cuts[2])
        |    / nullif(c.cuts[3] - c.cuts[1], 0.0), 6) + 0.0 AS rs
        |FROM lineitem, c
        |WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "s11_chi2_select" -> {
      val langs = Seq("de", "en", "es", "fr", "zh")
      val oCols = langs.zipWithIndex.map { case (c, i) =>
        s"CAST(sum(CASE WHEN cls = '$c' THEN 1 ELSE 0 END) AS BIGINT) AS o_$i"
      }.mkString(",\n    ")
      val nCols = langs.indices.map(i =>
        s"CAST(sum(o_$i) AS BIGINT) AS n_$i").mkString(", ")
      val tSum = langs.indices.map(i => s"o_$i").mkString(" + ")
      // term order mirrors the Scala reduce: left-associative over classes
      val chi2 = langs.indices.map { i =>
        s"(o_$i - ($tSum) * (n_$i / n)) * (o_$i - ($tSum) * (n_$i / n))" +
          s" / (($tSum) * (n_$i / n))"
      }.mkString(" + ")
      s"""WITH toks AS (
         |  SELECT lang AS cls, unnest(string_split(text, ' ')) AS term
         |  FROM documents WHERE lang IN (${langs.map(l => s"'$l'").mkString(",")})),
         |obs AS (
         |  SELECT term,
         |    $oCols
         |  FROM toks GROUP BY term),
         |tot AS (
         |  SELECT $nCols FROM obs),
         |tot2 AS (SELECT *, ${langs.indices.map(i => s"n_$i").mkString(" + ")} AS n
         |  FROM tot)
         |SELECT term, $tSum AS n_total,
         |  round($chi2, 3) AS chi2
         |FROM obs, tot2
         |ORDER BY chi2 DESC, term LIMIT 40""".stripMargin
    },

    // quantile_cont mirrors Spark's exact `percentile` (both linear
    // interpolation at p*(n-1)).
    "s12_robust_scaler" ->
      """WITH q AS (
        |  SELECT quantile_cont(l_extendedprice, 0.25) AS q1,
        |    quantile_cont(l_extendedprice, 0.5) AS q2,
        |    quantile_cont(l_extendedprice, 0.75) AS q3
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber, l_extendedprice,
        |  round((l_extendedprice - q.q2) / nullif(q.q3 - q.q1, 0), 6) + 0.0
        |    AS rs_price
        |FROM lineitem, q
        |WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "s13_anova_f" -> {
      val unions = Seq("l_quantity", "l_discount", "l_tax", "l_extendedprice")
        .map(f => s"SELECT l_returnflag AS y, '$f' AS feature, " +
          s"CAST($f AS DOUBLE) AS v FROM lineitem")
        .mkString("\nUNION ALL\n")
      s"""WITH lf AS (
         |$unions),
         |g AS (
         |  SELECT feature, y, CAST(count(*) AS DOUBLE) AS n,
         |    sum(v) AS s, sum(v * v) AS q
         |  FROM lf GROUP BY feature, y),
         |a AS (
         |  SELECT feature, CAST(count(*) AS DOUBLE) AS k,
         |    sum(n) AS nn, sum(s) AS ss,
         |    sum(q) - sum(s * s / n) AS ssw,
         |    sum(s * s / n) AS ssb_raw
         |  FROM g GROUP BY feature)
         |SELECT feature,
         |  round(((ssb_raw - ss * ss / nn) / nullif(k - 1, 0))
         |    / nullif(ssw / (nn - k), 0), 4) + 0.0 AS f_stat
         |FROM a
         |ORDER BY feature""".stripMargin
    },

    "s14_one_hot" ->
      """SELECT event_id,
        |  CAST(event_type = 'click' AS INT) AS is_click,
        |  CAST(event_type = 'error' AS INT) AS is_error,
        |  CAST(event_type = 'purchase' AS INT) AS is_purchase,
        |  CAST(event_type = 'signup' AS INT) AS is_signup,
        |  CAST(event_type = 'view' AS INT) AS is_view
        |FROM events
        |WHERE event_id < 2000
        |ORDER BY event_id""".stripMargin,

    "s16_corr_matrix" -> {
      val fs = Seq("l_quantity", "l_discount", "l_tax", "l_extendedprice")
      val rows = (for (i <- fs.indices; j <- i until fs.size) yield
        s"SELECT '${fs(i)}' AS feat_a, '${fs(j)}' AS feat_b, " +
          s"round(corr(${fs(i)}, ${fs(j)}), 6) + 0.0 AS corr FROM lineitem")
        .mkString("\nUNION ALL\n")
      s"$rows\nORDER BY feat_a, feat_b"
    },

    "s15_quantile_transform" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice,
        |  round(percent_rank() OVER (
        |    ORDER BY l_extendedprice, l_orderkey, l_linenumber), 6) + 0.0
        |    AS q_price
        |FROM lineitem
        |QUALIFY l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}
