package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shuffle-planning diagnostics. Skewed keys are the dominant failure
  * mode of big joins/aggregations at 100 TB (one straggler task holds
  * the whole stage); the cure — salting, AQE skew splits, broadcast —
  * needs the skew MEASURED first. This report is two aggregation
  * passes: corpus → per-key counts (map-side combinable), then
  * key-space → one summary row; the second pass is over the KEY space,
  * never the corpus.
  */
object Diagnostics {

  /** One-pass column profile: per column, non-null / null / exact
    * distinct counts and stringified min/max — the data-quality sweep
    * run before a corpus is admitted to a pipeline. All columns
    * profile in ONE aggregation (Catalyst plans the k exact distincts
    * as a k-way Expand — a deliberate k× row amplification; swap
    * `countDistinct` for `approx_count_distinct` at 100 TB when exact
    * distincts aren't worth the expand), then one `stack` unpivots the
    * single row to a row per column. min/max are cast to string so
    * heterogeneous column types share one schema. Numeric moments
    * (mean/stddev) live in the typed twin,
    * [[graft.stats.Profile.profileNumeric]].
    */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileColumns needs at least one column")
    // names are interpolated into the stack() expression
    require(cols.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
      s"profileColumns needs plain identifiers, got ${cols.mkString(",")}")
    val aggs = (count(lit(1)).as("__rows") +: cols.flatMap { c => Seq(
      count(col(c)).as(s"${c}__n"),
      countDistinct(col(c)).as(s"${c}__nd"),
      min(col(c)).cast("string").as(s"${c}__min"),
      max(col(c)).cast("string").as(s"${c}__max")) }).toList
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', ${c}__n, ${c}__nd, ${c}__min, ${c}__max").mkString(", ")
    row.select(col("__rows"),
        expr(s"stack(${cols.size}, $stackArgs) AS " +
          "(column_name, n_non_null, n_distinct, min_str, max_str)"))
      .select(col("column_name"), col("__rows").as("n_rows"),
        col("n_non_null"),
        (col("__rows") - col("n_non_null")).as("n_null"),
        col("n_distinct"), col("min_str"), col("max_str"))
  }

  /** One-row key-skew report: row/key cardinalities, the heaviest key's
    * count and share, max/avg skew ratio, how many keys exceed 2× the
    * mean, and the salt factor that would level the heaviest key to the
    * mean (⌈max/avg⌉ — the multiplier to use in a salted repartition,
    * 1 = no salting needed).
    */
  def keySkewReport(df: DataFrame, key: Column): DataFrame = {
    // key-cardinality-sized — with high-cardinality keys (URLs, hashes)
    // that is corpus-scale, so DISK_ONLY persist per the r9 criterion
    val counts = graft.core.Caches.track(
      df.groupBy(key.as("_k")).agg(count(lit(1)).as("_n"))
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY))
    // Zero groups would make every ratio below a null-over-null row that
    // reads like a (garbage) salt recommendation — fail loudly instead.
    require(!counts.isEmpty, "keySkewReport: input has no rows to profile")
    val totals = counts.agg(
      sum(col("_n")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("_n")).as("max_key_rows"))
    val hot = counts.crossJoin(totals)
      .agg(sum(when(col("_n") * col("n_keys") > col("n_rows") * 2, 1L)
        .otherwise(0L)).as("n_hot_keys"))
    totals.crossJoin(hot)
      .select(col("n_rows"), col("n_keys"), col("max_key_rows"),
        (round(col("n_rows") / col("n_keys"), 4) + lit(0.0))
          .as("avg_key_rows"),
        // Promote to double BEFORE the n_keys product (matching the
        // oracle's `* 1.0 *` order): max_key_rows · n_keys in long
        // silently wraps past 2^63 at the extreme cardinalities this
        // report exists for (1e10-row hot key × 1e9 keys).
        (round(col("max_key_rows") * lit(1.0) * col("n_keys")
          / col("n_rows"), 4) + lit(0.0)).as("skew_ratio"),
        (round(col("max_key_rows") / col("n_rows"), 6) + lit(0.0))
          .as("top1_share"),
        col("n_hot_keys"),
        ceil(col("max_key_rows") * lit(1.0) * col("n_keys") / col("n_rows"))
          .cast("bigint").as("salt_factor"))
  }
}
