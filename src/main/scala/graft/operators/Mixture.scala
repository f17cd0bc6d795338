package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic mixture assembly — the corpus-composition step of a
  * training-data build (Pile/DoReMi-style source mixing): downsample
  * each component to a TOKEN budget, keeping documents in seed-free
  * md5-priority order. The kept set is EXACTLY "sort the component's
  * docs by (md5 priority, id), keep while the running token total
  * stays ≤ budget" — reproducible across runs, clusters, and engines.
  *
  * Scale shape: the naive formulation is a running-total window
  * PARTITIONED BY COMPONENT — a single-task sort of the largest
  * component, which at 100 TB is most of the corpus. This is the
  * bucketed two-phase threshold instead:
  *
  *  1. one map-side-combinable aggregation of token mass per
  *     (component, bucket), where bucket = the top 14 bits of the
  *     doc's 60-bit md5 priority — so bucket order IS a prefix of
  *     priority order;
  *  2. the per-component running total over that rollup — a
  *     METADATA-scale window (components × ≤16384 rows) — classifies
  *     every bucket in-row: cum ≤ budget ⇒ KEEP WHOLE,
  *     pre > budget ⇒ DROP, else the single BOUNDARY bucket
  *     (pre = the previous cum ≤ budget < cum; at most one per
  *     component since pre is nondecreasing), and only its
  *     ≈ corpus/16384 docs pay an intra-bucket running-total window.
  *
  * The verdict is bit-identical to the naive window at any scale: the
  * global running total of a doc equals its bucket's `pre` plus the
  * within-bucket running total, because (h, id) order refines bucket
  * order.
  */
object Mixture {

  /** 2^14 priority-prefix buckets; the boundary bucket — the only one
    * paying a window sort — is ≈ 1/16384 of its component.
    */
  private val BucketShift = 46 // 60-bit priority >> 46 = 14 bucket bits

  /** Keep each component's docs in priority order up to its token
    * budget. `budgets` has one (componentCol, budget) row per
    * component; components absent from it are dropped entirely (an
    * explicit budget of zero and an absent component behave the same —
    * the mixture is exactly what the budget table says).
    * Returns (idCol, componentCol, tokens) — the kept docs.
    */
  def mixToBudget(docs: DataFrame, idCol: String, componentCol: String,
                  tokenCol: String, budgets: DataFrame,
                  bucketShift: Int = BucketShift): DataFrame = {
    // floor 36: phase 2's per-component bucket rollup is the window's
    // frame — 2^(60-shift) rows; smaller shifts reintroduce the
    // corpus-sized single-task sort this design exists to avoid
    require(bucketShift >= 36 && bucketShift < 60,
      s"bucketShift=$bucketShift must be in [36, 60): smaller shifts " +
        "make the bucket rollup corpus-sized")
    val withB = docs.select(col(idCol), col(componentCol),
        col(tokenCol).cast("long").as("tokens"))
      .withColumn("_h",
        GraftFunctions.md5Long(col(idCol).cast("string"), 15))
      .withColumn("_b", shiftright(col("_h"), bucketShift))
    val bmass = withB.groupBy(col(componentCol), col("_b"))
      .agg(sum(col("tokens")).as("_m"))
    val wB = Window.partitionBy(col(componentCol)).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val classed = bmass.join(budgets, componentCol)
      .withColumn("_cum", sum(col("_m")).over(wB))
      .withColumn("_pre", col("_cum") - col("_m"))
    val joined = withB.join(
      classed.select(col(componentCol), col("_b"), col("_pre"),
        col("_cum"), col("budget")),
      Seq(componentCol, "_b"))
    val keepWhole = joined.where(col("_cum") <= col("budget"))
      .select(col(idCol), col(componentCol), col("tokens"))
    val wIn = Window.partitionBy(col(componentCol), col("_b"))
      .orderBy(col("_h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = joined
      .where(col("_pre") <= col("budget") && col("_cum") > col("budget"))
      .withColumn("_run", sum(col("tokens")).over(wIn))
      .where(col("_pre") + col("_run") <= col("budget"))
      .select(col(idCol), col(componentCol), col("tokens"))
    keepWhole.unionByName(boundary)
  }

  /** Rollup of a [[mixToBudget]] result against its budget table:
    * (component, budget, n_kept, tokens_kept, fill = kept/budget).
    */
  def mixReport(kept: DataFrame, componentCol: String,
                budgets: DataFrame): DataFrame =
    budgets.join(
        kept.groupBy(col(componentCol))
          .agg(count(lit(1)).as("n_kept"),
            sum(col("tokens")).as("tokens_kept")),
        Seq(componentCol), "left")
      .select(col(componentCol), col("budget"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("tokens_kept"), lit(0L)).as("tokens_kept"),
        (round(coalesce(col("tokens_kept"), lit(0L)) * lit(1.0) /
          greatest(col("budget"), lit(1L)), 4) + lit(0.0)).as("fill"))
}
