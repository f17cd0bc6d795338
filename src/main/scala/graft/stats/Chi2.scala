package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Chi-squared feature scoring (sklearn `chi2` / `SelectKBest` family,
  * `sklearn/feature_selection/_univariate_selection.py`): for each term,
  * how far its per-class occurrence counts deviate from the class-prior
  * expectation. Observed O_tc = count of term t in class c; expected
  * E_tc = total_t * N_c / N; chi2_t = sum_c (O-E)^2 / E (absent cells
  * contribute E).
  *
  * Classes are an explicit list, so the per-class observed counts are
  * conditional-count COLUMNS of one groupBy(term) — a single exchange
  * keyed by term (bounded by vocabulary), no (term, class) intermediate,
  * partial-agg friendly. It also fixes the floating-point summation
  * order of the chi2 assembly, which keeps the value bit-reproducible
  * across engines and retries (a runtime sum over classes would add in
  * nondeterministic order). Class totals are a one-row aggregate
  * broadcast back by cross join. This is the select-k-features step of a
  * 100 TB text pipeline at the cost of one corpus token scan.
  */
object Chi2 {

  /** Per-term chi2 over (class, term) token occurrences.
    * Output: term, n_total (corpus-wide count), chi2 (rounded).
    * Rows of classes outside `classes` are ignored (dropped, like a
    * class filter — document the contract).
    */
  def chi2Terms(docs: DataFrame, classCol: Column, textCol: Column,
                classes: Seq[String], roundTo: Int = 3): DataFrame = {
    require(classes.nonEmpty && classes.distinct.size == classes.size,
      "classes must be non-empty and distinct")
    val toks = docs.select(classCol.as("cls"),
        explode(split(textCol, " ")).as("term"))
      .where(col("cls").isin(classes: _*))
    val obsCols = classes.zipWithIndex.map { case (c, i) =>
      sum(when(col("cls") === c, 1L).otherwise(0L)).as(s"o_$i")
    }
    // observed feeds BOTH the class-total aggregate and the final chi2
    // projection — without a materialization the corpus explode+groupBy
    // subtree evaluates twice (the r18 multi-consumer-explode audit;
    // totals is then a re-sum of the persisted vocab table, a fraction
    // of a corpus pass). Distinct-term-sized = corpus-scale at 100 TB →
    // DISK_ONLY (r9 criterion); lazy result → session-tracked.
    val observed = graft.core.Caches.track(
      toks.groupBy(col("term")).agg(obsCols.head, obsCols.tail: _*)
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY))
    val totCols = classes.indices.map(i => sum(col(s"o_$i")).as(s"n_$i"))
    val totals = observed.agg(totCols.head, totCols.tail: _*)
      .withColumn("n", classes.indices.map(i => col(s"n_$i")).reduce(_ + _))
    // (O - t*p)^2 / (t*p) per class in declaration order; p = n_i / n.
    val t = classes.indices.map(i => col(s"o_$i")).reduce(_ + _)
    val chi2 = classes.indices.map { i =>
      val e = t * (col(s"n_$i") / col("n"))
      (col(s"o_$i") - e) * (col(s"o_$i") - e) / e
    }.reduce(_ + _)
    observed
      .crossJoin(broadcast(totals))
      .select(col("term"), t.as("n_total"), round(chi2, roundTo).as("chi2"))
  }

  /** Top-k discriminative terms, deterministically ordered. */
  def selectKBest(docs: DataFrame, classCol: Column, textCol: Column,
                  classes: Seq[String], k: Int, roundTo: Int = 3): DataFrame =
    chi2Terms(docs, classCol, textCol, classes, roundTo)
      .orderBy(col("chi2").desc, col("term"))
      .limit(k)
}
