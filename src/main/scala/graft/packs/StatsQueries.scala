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
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}
