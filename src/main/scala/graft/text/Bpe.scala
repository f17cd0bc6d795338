package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE merge learning (Sennrich et al. 2016, word-level
  * byte-pair encoding) — training the tokenizer IS a corpus-scale
  * aggregation problem, and this expresses it as one: a single
  * corpus-sized pass builds the distinct-word frequency table, and
  * every merge round after that runs on the VOCABULARY (pair counting
  * = explode + weighted groupBy over Σ|word| symbols; argmax = a
  * min-struct aggregate; the merge itself = an in-row greedy fold via
  * `aggregate`, whole-stage codegen'd). Driver state is zero — the
  * learned merge table never leaves the cluster — and every round's
  * arithmetic is deterministic (ties broken lexicographically), so the
  * whole training run is SQL-oracle-able round for round.
  */
object Bpe {

  /** Learn `merges` merge operations from a whitespace-tokenized
    * corpus. Returns (merge_round, pair, pcnt): the rank-r merge and
    * the weighted count that won it — exactly what a BPE tokenizer
    * exports as its merges file.
    *
    * The greedy in-row merge matches reference BPE: left-to-right,
    * non-overlapping ("a a" applied to `aaaa` → [aa, aa], not three
    * overlapping merges), which the fold gets for free — after a
    * merge the accumulator's tail is the MERGED symbol, which no
    * longer equals the pair's left side (string identity, the
    * standard BPE convention).
    */
  def learnMerges(docs: DataFrame, textCol: String, merges: Int): DataFrame = {
    require(merges >= 1, s"merges=$merges must be positive")
    var words = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(col("cnt"), split(col("w"), "").as("syms"))
      .localCheckpoint()
    // Rounds stop EARLY when the vocabulary runs out of adjacent pairs
    // (every word a single symbol): the global argmin over an empty
    // pairs frame is one all-null row, detected from the checkpointed
    // 1-row best frame (an O(1) driver read, same class as the
    // checkpoint's own action) — the merge table then simply has fewer
    // than `merges` rows, never a null row.
    val rounds = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var r = 1
    var exhausted = false
    while (r <= merges && !exhausted) {
      val pairs = words.where(size(col("syms")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> concat(element_at(syms, i), ' ', element_at(syms, i + 1)))"))
          .as("pair"))
        .groupBy(col("pair")).agg(sum(col("cnt")).as("pcnt"))
      // argmax by (count desc, pair asc) as one combinable aggregate
      val best = pairs
        .agg(min(struct((-col("pcnt")).as("n"), col("pair").as("p"))).as("_m"))
        .select(split(col("_m.p"), " ").getItem(0).as("px"),
          split(col("_m.p"), " ").getItem(1).as("py"),
          (-col("_m.n")).as("pcnt"))
        .localCheckpoint()
      if (best.head().isNullAt(0)) exhausted = true
      else {
        words = words.crossJoin(best)
          .select(col("cnt"), expr(
            """aggregate(syms, cast(array() as array<string>),
              |  (acc, s) -> CASE
              |    WHEN size(acc) = 0 THEN array(s)
              |    WHEN element_at(acc, -1) = px AND s = py
              |      THEN concat(slice(acc, 1, size(acc) - 1),
              |                  array(concat(px, py)))
              |    ELSE concat(acc, array(s)) END)""".stripMargin).as("syms"))
          .localCheckpoint()
        rounds += best.select(lit(r).as("merge_round"),
          concat(col("px"), lit(" "), col("py")).as("pair"), col("pcnt"))
        r += 1
      }
    }
    require(rounds.nonEmpty,
      "learnMerges: corpus has no adjacent symbol pairs at all")
    rounds.reduce(_ unionByName _)
  }

  /** Apply a LEARNED merge table to a corpus — the tokenizer's encode
    * side. `merges` (in learned priority order) is driver-held MODEL
    * state, O(M) pairs — the ClusterOps-centers precedent — compiled
    * into M chained in-row folds. Encoding happens once per DISTINCT
    * word (the vocabulary), then documents join the encoded vocab:
    * corpus cost is one explode + one vocabulary join, not M folds per
    * token instance. Returns per-doc (n_words, n_tokens_bpe) — the
    * compression the learned merges actually deliver.
    */
  def applyMerges(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty, "empty merge table")
    var enc = docs.select(explode(split(col(textCol), " ")).as("w"))
      .where(length(col("w")) > 0).distinct()
      .withColumn("syms", split(col("w"), ""))
    merges.foreach { case (x, y) =>
      // the pair rides as literal COLUMNS, not interpolated SQL text —
      // learnMerges emits whatever symbols the corpus contains
      // (punctuation, non-ASCII), and lit() is injection-free for all
      // of them
      enc = enc
        .withColumn("_px", lit(x)).withColumn("_py", lit(y))
        .withColumn("syms", expr(
          """aggregate(syms, cast(array() as array<string>),
            |  (acc, s) -> CASE
            |    WHEN size(acc) = 0 THEN array(s)
            |    WHEN element_at(acc, -1) = _px AND s = _py
            |      THEN concat(slice(acc, 1, size(acc) - 1),
            |                  array(concat(_px, _py)))
            |    ELSE concat(acc, array(s)) END)""".stripMargin))
        .drop("_px", "_py")
    }
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .where(length(col("w")) > 0)
      .join(enc.select(col("w"), size(col("syms")).as("_ntok")), "w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("_ntok")).as("n_tokens_bpe"))
  }
}
