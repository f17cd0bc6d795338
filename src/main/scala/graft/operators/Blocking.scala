package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocking parity for the reference's `BlockRDD` family
  * (`splearn/rdd.py:~L20-160`): the reference chunks a row RDD into
  * fixed-size numpy blocks per partition; fitted estimators then map
  * block-by-block.
  *
  * Spark-first stance: a DataFrame partition (parquet row-group / Arrow
  * batch) IS the block — Tungsten already executes columnar batches, so
  * the idiomatic "block" needs no materialization at all. The helpers here
  * exist for the cases where literal row-group semantics are observable:
  *
  *  - [[withBlockId]]: deterministic global block ids (for oracle-checkable
  *    blocking semantics). Uses a global `row_number`, which serializes into
  *    a single-partition sort at planning time — fine for verification,
  *    NOT the 100 TB path.
  *  - [[withPartitionLocalBlockId]]: the scalable variant — block ids are
  *    (partitionId, localIndex / bsize); no shuffle, no global sort, exactly
  *    the reference's per-partition chunking (`splearn/rdd.py:~L30`, `_block_tuple`).
  *  - [[unblock]]: explode grouped rows back (reference `BlockRDD.unblock`,
  *    `splearn/rdd.py:~L120`).
  */
object Blocking {

  /** Deterministic global blocking: rows ordered by `orderCols` get
    * `block_id = floor((rowPos-1)/bsize)`. Verification-friendly; the
    * global window is the cost of determinism.
    */
  def withBlockId(df: DataFrame, bsize: Int, orderCols: Seq[Column]): DataFrame = {
    val w = Window.orderBy(orderCols: _*)
    df.withColumn("row_pos", row_number().over(w))
      .withColumn("block_id", floor((col("row_pos") - 1) / bsize).cast("long"))
  }

  /** Scale-path blocking: ids are unique but partition-relative, computed
    * with zero shuffles. `block_id = pid * 2^20 + localIdx/bsize` keeps ids
    * unique for up to ~1M blocks per partition.
    */
  def withPartitionLocalBlockId(df: DataFrame, bsize: Int): DataFrame = {
    df.withColumn("block_id",
      (spark_partition_id().cast("long") * lit(1L << 20)) +
        floor(monotonically_increasing_id() % (1L << 33) / lit(bsize.toLong)))
  }

  /** Group rows of `cols` into array-of-struct blocks (materialized
    * blocks, reference `ArrayRDD` semantics). Requires a `block_id` column.
    */
  def blockRows(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(col("block_id"))
      .agg(collect_list(struct(cols.map(col): _*)).as("rows"))

  /** Inverse of [[blockRows]]. */
  def unblock(blocked: DataFrame): DataFrame = {
    val exploded = blocked.select(col("block_id"), explode(col("rows")).as("r"))
    exploded.select(col("block_id") +: exploded.select(col("r.*")).columns
      .map(c => col(s"r.$c")): _*)
  }
}
