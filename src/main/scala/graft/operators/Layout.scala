package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for scan locality — the write-side half of
  * "don't read what you don't need". Parquet skips row groups by
  * min/max statistics; those statistics only prune when rows that are
  * close in VALUE are close in FILE. Sorting clusters one dimension
  * perfectly and the second not at all; interleaving the dimensions'
  * bits (Z-order / Morton order) makes file position approximate a
  * space-filling curve, so EVERY interleaved dimension's per-rowgroup
  * range shrinks to ~sqrt of the domain. At 100 TB this is the
  * difference between pruning on one predicate column and pruning on
  * two — applied at ingest (sort by [[zValue]], then write), it costs
  * one sort once and pays on every selective scan after.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative
    * columns: bit i of x lands at position 2i, bit i of y at 2i+1.
    * Pure integer bit arithmetic (shifts, masks, exact power-of-two
    * multiplies) — codegen'd in Spark and replayable verbatim in SQL.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of 1..31")
    (0 until bits).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** Clustering-quality report: bucket rows by the top bits of their
    * z-value (`bucket = z >> shift` — a map-side assignment, the
    * stand-in for "which row group would this row land in after a
    * z-order write") and report each bucket's row count and per-
    * dimension min/max. Narrow ranges in BOTH columns are the locality
    * a z-ordered layout buys; compare against a single-dimension sort,
    * whose second column spans the full domain in every bucket.
    */
  def zOrderStats(df: DataFrame, x: Column, y: Column, bits: Int,
                  shift: Int): DataFrame = {
    require(shift >= 0 && shift < 2 * bits, s"shift=$shift out of range")
    df.select(x.cast("long").as("x"), y.cast("long").as("y"))
      .withColumn("bucket",
        shiftright(zValue(col("x"), col("y"), bits), shift))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
  }

  /** Compaction plan over a FILE INVENTORY (one row per file): files in
    * `orderCols` order are packed greedily into output groups of
    * ~`targetBytes` by exclusive-prefix-sum bucketing — bin =
    * ⌊cum_bytes_before / target⌋, so every bin's first file starts
    * before the target boundary and bins stay contiguous in sort order
    * (preserving any cluster/Z-order the inventory encodes). The small-
    * files problem at 100 TB is a METADATA problem: this window runs
    * over one row per file (thousands to low millions of rows), never
    * the data — the single-task global window is deliberate and cheap
    * at that cardinality, the same judgment call as SuffixRank's
    * O(partitions) driver offsets. The plan then drives a
    * repartition-by-bin rewrite of the data itself, which is the
    * actual heavy (but one-shuffle, embarrassingly parallel) job.
    */
  def compactionBins(files: DataFrame, orderCols: Seq[Column],
                     sizeCol: Column, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes=$targetBytes must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("_cum",
        coalesce(sum(sizeCol).over(w), lit(0L)).cast("bigint"))
      // `div` = integral division: `/` goes through double and loses
      // exactness past 2^53 cumulative bytes (multi-PB inventories are
      // in scope here)
      .withColumn("bin", expr(s"_cum div ${targetBytes}L"))
      .drop("_cum")
  }
}
