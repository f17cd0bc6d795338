package graft.operators

import graft.functions.GraftFunctions
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
  * Two scale shapes live here:
  *  - [[packContextWindows]]: per-(group, shard) independent packing
  *    streams — each shard's running offset is one task, and `shards`
  *    is the knob that keeps partitions executor-sized. Right when
  *    windows may be shard-local (training packs shard-local anyway).
  *  - [[packSequences]]: ONE GLOBAL packing stream with NO single-task
  *    window at all — the global token-offset prefix sum is the repo's
  *    bucketed two-phase shape ([[Mixture]]'s discipline): docs order
  *    by (md5 priority, id) — which IS the deterministic corpus
  *    shuffle a training run wants — and the bucket id is the
  *    priority's high bits, so buckets are contiguous runs of the
  *    order. Phase 1 cumsums per-bucket masses on a frame bounded by
  *    2^(60-bucketShift) rows; phase 2 cumsums within buckets in
  *    parallel. BIT-IDENTICAL to the naive global window (the oracle
  *    states the naive form; PackingSpec proves equality across
  *    shifts).
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

  private val BucketShift = 46 // 60-bit priority >> 46 = 14 bucket bits

  /** Floor on `bucketShift`: phase 1's unpartitioned window runs over
    * the 2^(60-shift)-row bucket frame; a small shift silently
    * reintroduces the corpus-sized single-task sort the two-phase
    * design exists to avoid. 36 keeps the frame ≤ 2^24 rows —
    * model-scale regardless of corpus size.
    */
  private val MinBucketShift = 36

  /** The per-doc global token offsets underlying [[packSequences]]:
    * one row per doc — (idCol, h, n_tokens, tok_start) where `h` is
    * the 60-bit md5 shuffle priority and `tok_start` the doc's offset
    * in the concatenated (h, id)-ordered token stream. Exposed both as
    * the packing building block and as a directly-oracled diagnostic:
    * a driver-side packing mismatch localizes here to either the hash
    * (h differs) or the prefix sum (tok_start differs). Zero-token
    * docs are dropped.
    */
  def docOffsets(docs: DataFrame, idCol: String, tokenCol: String,
                 bucketShift: Int = BucketShift): DataFrame = {
    require(bucketShift >= MinBucketShift && bucketShift < 60,
      s"bucketShift=$bucketShift must be in [$MinBucketShift, 60): " +
        "smaller shifts make phase 1's bucket frame corpus-sized")
    val withB = docs
      .select(col(idCol), col(tokenCol).cast("long").as("n_tokens"))
      .where(col("n_tokens") > 0)
      .withColumn("h",
        GraftFunctions.md5Long(col(idCol).cast("string"), 15))
      .withColumn("_b", shiftright(col("h"), bucketShift))
    // phase 1: per-bucket masses, cumsum on the BOUNDED bucket frame
    val bmass = withB.groupBy(col("_b")).agg(sum(col("n_tokens")).as("_m"))
    val wB = Window.orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = bmass.withColumn("_cum", sum(col("_m")).over(wB))
      .select(col("_b"), (col("_cum") - col("_m")).as("_bpre"))
    // phase 2: within-bucket cumsum, all buckets in parallel
    val wIn = Window.partitionBy(col("_b"))
      .orderBy(col("h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB.join(pre, "_b")
      .withColumn("_run", sum(col("n_tokens")).over(wIn))
      .select(col(idCol), col("h"), col("n_tokens"),
        (col("_bpre") + col("_run") - col("n_tokens")).as("tok_start"))
  }

  /** Deterministic global training-order shuffle: every doc's position
    * in the (md5 priority, id) permutation — the order [[packSequences]]
    * packs in, exposed as an explicit 0-based rank so writers, samplers,
    * and resume logic can address it. A pure function of the ids (no
    * RNG, no partition dependence), so it replays identically across
    * runs, engines, and retries. Scale shape: the rank is the unit-mass
    * case of [[docOffsets]]' bucketed two-phase prefix sum — no global
    * window, no zipWithIndex barrier; phase 1 is bounded by
    * 2^(60-bucketShift) rows, phase 2 runs per-bucket in parallel.
    */
  def shuffleOrder(docs: DataFrame, idCol: String,
                   bucketShift: Int = BucketShift): DataFrame =
    docOffsets(docs.select(col(idCol), lit(1L).as("_one")), idCol, "_one",
      bucketShift)
      .select(col(idCol), col("h").as("shuffle_key"),
        col("tok_start").as("shuffle_pos"))

  /** Globally-exact sequence packing (see object scaladoc): one row per
    * (doc, spanned chunk) — (idCol, chunk_id, tok_from, tok_to) with
    * [tok_from, tok_to) the doc-local token slice landing in
    * `chunk_id`. Every chunk except the last holds exactly `seqLen`
    * tokens; per-doc slices are contiguous and cover [0, tokens).
    * Zero-token docs are dropped.
    */
  def packSequences(docs: DataFrame, idCol: String, tokenCol: String,
                    seqLen: Long,
                    bucketShift: Int = BucketShift): DataFrame = {
    require(seqLen > 0, s"seqLen=$seqLen must be positive")
    val offs = docOffsets(docs, idCol, tokenCol, bucketShift)
      .withColumnRenamed("n_tokens", "_tk")
      .withColumnRenamed("tok_start", "_start")
    offs
      .select(col(idCol), col("_tk"), col("_start"),
        explode(sequence(
          expr(s"_start div CAST($seqLen AS BIGINT)"),
          expr(s"(_start + _tk - 1) div CAST($seqLen AS BIGINT)")))
          .as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        greatest(lit(0L), col("chunk_id") * seqLen - col("_start"))
          .as("tok_from"),
        least(col("_tk"), (col("chunk_id") + 1L) * seqLen - col("_start"))
          .as("tok_to"))
  }

  /** Per-chunk rollup of a [[packSequences]] result: (chunk_id, n_docs,
    * n_tokens, n_clean_heads) — n_tokens == seqLen everywhere but the
    * final chunk; n_clean_heads counts docs starting at their token 0
    * in this chunk (the loss-masking statistic).
    */
  def chunkReport(spans: DataFrame): DataFrame =
    spans.groupBy(col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok_to") - col("tok_from")).as("n_tokens"),
        sum(when(col("tok_from") === 0L, 1L).otherwise(0L))
          .as("n_clean_heads"))
}
