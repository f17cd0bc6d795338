package graft.operators

import graft.functions.GraftFunctions.md5Long
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-window packing for LLM pretraining: conceptually, concatenate
  * a group's documents in id order and cut every `budget` tokens — each
  * document lands in a span of context windows (`first_window ..
  * last_window`), split across a boundary when it straddles one. This is
  * the standard "pack then chunk" pretraining layout; the output tells a
  * writer exactly which windows each document feeds.
  *
  * Scale: the running token offset is a window cumsum, so each packing
  * group must stream through ONE task. `shards > 1` salts the group with
  * a deterministic md5 gate on the id, giving `shards` independent
  * packing streams per group — the knob that keeps partitions
  * executor-sized at 100 TB (windows are per (group, shard), which is
  * fine: context windows never span groups anyway, and training packs
  * shard-local). Everything is exact integer arithmetic — engine-portable
  * and retry-stable.
  */
object Packing {

  def packContextWindows(docs: DataFrame, group: Column, id: Column,
                         tokens: Column, budget: Long,
                         shards: Int = 1): DataFrame = {
    require(budget > 0, s"budget=$budget must be positive")
    require(shards > 0, s"shards=$shards must be positive")
    // explicit ROWS frame: the default RANGE frame treats id-ties as
    // peers, which would fold duplicate ids into one offset instead of
    // packing them sequentially
    val w = Window.partitionBy(col("grp"), col("shard")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(group.as("grp"),
        pmod(md5Long(id.cast("string"), 8), lit(shards)).cast("int").as("shard"),
        id.as("id"), tokens.cast("long").as("n_tokens"))
      .withColumn("tok_end", sum(col("n_tokens")).over(w))
      .withColumn("tok_start", col("tok_end") - col("n_tokens"))
      .withColumn("first_window",
        floor(col("tok_start") / lit(budget)).cast("long"))
      .withColumn("last_window",
        floor((col("tok_end") - 1) / lit(budget)).cast("long"))
      .withColumn("n_windows",
        (col("last_window") - col("first_window") + 1).cast("long"))
      .drop("tok_end")
  }
}
