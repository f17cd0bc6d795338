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
    })
  )

  val oracles: Map[String, String] = Map(
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
        |ORDER BY doc_id""".stripMargin
  )
}
