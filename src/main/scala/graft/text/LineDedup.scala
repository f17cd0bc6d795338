package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line-level corpus deduplication — the CCNet / RefinedWeb curation
  * stage that runs BETWEEN html extraction and document-level dedup:
  * boilerplate ("Home | About", cookie banners, copyright footers) and
  * widely-quoted passages repeat across millions of pages even when no
  * two whole documents match, and removing them is the single largest
  * quality win per byte in a web-crawl pipeline (Wenzek et al. 2020,
  * "CCNet"; Penedo et al. 2023, "RefinedWeb").
  *
  * Two removal policies, both exact-hash at line granularity:
  *  - [[keepFirstLines]]: every distinct line keeps exactly its first
  *    occurrence (global order by (id, pos)); later copies are dropped.
  *    This is CCNet's paragraph dedup specialized to lines.
  *  - [[dropFrequentLines]]: lines appearing in ≥ `minDocs` distinct
  *    documents are treated as boilerplate and removed EVERYWHERE
  *    (including the first copy) — the RefinedWeb/Gopher stance that a
  *    line repeated across many unrelated pages is navigation chrome,
  *    not content.
  *
  * Blank lines (trim = "") are exempt from both policies: they carry
  *  paragraph structure, not content, and hashing them would collapse
  *  every paragraph break in the corpus into one "duplicate".
  *
  * 100 TB posture: the explode is linear and map-side; the dedup key is
  * the 16-byte md5 of the trimmed line, so the keeper aggregation
  * shuffles hashes, not text, and `min`/`count` partial-aggregate
  * map-side before the exchange. The join back to the exploded frame is
  * keyed on that hash with a ONE-ROW-PER-KEY build side, so the classic
  * hot keys (a cookie banner present in half the crawl) are handled by
  * AQE's skew-join split — the keeper side replicates for free.
  * Reassembly groups by document id, bounded by single-document size.
  * Nothing here is quadratic and no driver-side state grows with the
  * corpus.
  */
object LineDedup {

  /** One row per line: (idCol, pos, line, _k) where `_k` is
    * md5(trim(line)) and blank lines get a NULL key (policy-exempt).
    * `delim` is taken literally (regex-quoted).
    */
  def lines(docs: DataFrame, idCol: String, textCol: String,
            delim: String = "\n"): DataFrame =
    docs.select(col(idCol),
        posexplode(split(col(textCol),
          java.util.regex.Pattern.quote(delim))).as(Seq("pos", "line")))
      .withColumn("_k",
        when(trim(col("line")) === "", lit(null).cast("string"))
          .otherwise(md5(trim(col("line")))))

  /** Per-duplicated-line report: the trimmed line, how many distinct
    * documents carry it, and total occurrences — the table a curation
    * run inspects before choosing [[dropFrequentLines]]'s threshold.
    * Grouping is by line hash; `min` recovers the (unique) trimmed text
    * deterministically.
    */
  def duplicateLineStats(docs: DataFrame, idCol: String, textCol: String,
                         delim: String = "\n", minDocs: Int = 2): DataFrame =
    lines(docs, idCol, textCol, delim)
      .where(col("_k").isNotNull)
      .groupBy(col("_k"))
      .agg(min(trim(col("line"))).as("line"),
        countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_occs"))
      .where(col("n_docs") >= minDocs)
      .select(col("line"), col("n_docs"), col("n_occs"))

  /** Keep-first global line dedup. Returns one row per input document:
    * (idCol, n_lines, n_kept, text_clean) with kept lines re-joined by
    * `delim` in original position order; a document whose every line
    * lost the keep-first race gets (n_kept = 0, text_clean = "").
    * Requires `idCol` orderable (the keeper is min (id, pos)).
    *
    * Plan shape: the exploded frame is LEFT-joined to the keeper table
    * and the keep verdict carried as a flag into ONE grouped reassembly
    * pass — every document keeps a row (all its lines are in the
    * flagged frame), so no join back to the original docs is needed.
    * The corpus is scanned twice (keeper aggregation + flagged join);
    * at 100 TB recomputing the map-side explode beats materializing the
    * exploded corpus to executor disks.
    */
  def keepFirstLines(docs: DataFrame, idCol: String, textCol: String,
                     delim: String = "\n"): DataFrame = {
    val ln = lines(docs, idCol, textCol, delim)
    val keepers = ln.where(col("_k").isNotNull)
      .groupBy(col("_k"))
      .agg(min(struct(col(idCol), col("pos"))).as("_first"))
    val flagged = ln.join(keepers, Seq("_k"), "left")
      .withColumn("_keep", col("_k").isNull ||
        (col(idCol) === col(s"_first.$idCol") &&
          col("pos") === col("_first.pos")))
    reassemble(flagged, idCol, delim)
      .select(col(idCol), col("n_lines"), col("n_kept"), col("text_clean"))
  }

  /** Boilerplate removal: drop EVERY occurrence of any non-blank line
    * present in ≥ `minDocs` distinct documents. Returns one row per
    * input document: (idCol, n_lines, n_removed, text_clean). Same
    * flagged one-pass reassembly as [[keepFirstLines]].
    *
    * The frequent-key detection is TWO-PHASE (the r15 100M-line run
    * showed the single exact COUNT DISTINCT spilling — 175.5s, 6.6×
    * for 5× data, vs keep-first's clean scaling):
    *
    *  1. a PRE-GATE of map-side-combinable aggregates only — no
    *     per-key distinct sets: `n_occs >= minDocs` is an EXACT
    *     necessary condition (a line in ≥ N distinct docs occurs ≥ N
    *     times), and for large thresholds (minDocs ≥ 25) an HLL
    *     `approx_count_distinct` (rsd 0.05) adds a second cut at 20%
    *     slack — ~4σ below the true count, so a genuinely frequent key
    *     passes with near-certainty (and a missed one merely stays in
    *     the corpus: a false-negative for a heuristic boilerplate
    *     threshold, never a wrong removal).
    *  2. the EXACT countDistinct verdict, unchanged, over only the
    *     lines whose key survived the gate — distinct-set state now
    *     bounded by the boilerplate-candidate mass instead of every
    *     unique line in the corpus.
    *
    * At small minDocs the HLL cut is off and the verdict is exact by
    * construction; the oracle is unchanged either way.
    *
    * RELAXED CONTRACT (minDocs >= 25, explicit per the r16 advice):
    * because of the HLL cut, "removed if present in >= minDocs distinct
    * docs" is probabilistic at the boundary — a line whose sketch lands
    * ~4σ low (P ≈ 3e-5 per key, rsd 0.05 at 20% slack) survives the
    * gate's second cut and is RETAINED. The relaxation is strictly
    * one-sided: phase 2's exact countDistinct still decides every
    * removal, so no line is ever wrongly removed; the only failure mode
    * is boilerplate kept, which a threshold heuristic tolerates.
    * Callers needing the exact contract at large minDocs should pass
    * the corpus twice with minDocs < 25 semantics in mind or accept the
    * documented tail. Fixtures for exact-ground-truth comparison at
    * minDocs >= 25 should avoid keys within the sketch's noise band of
    * the threshold (the StressBench fixture plants keys at >= 2x).
    */
  def dropFrequentLines(docs: DataFrame, idCol: String, textCol: String,
                        minDocs: Int, delim: String = "\n"): DataFrame = {
    val ln = lines(docs, idCol, textCol, delim)
    val nb = ln.where(col("_k").isNotNull)
    val gate = nb.groupBy(col("_k"))
      .agg(count(lit(1)).as("_no"),
        approx_count_distinct(col(idCol), 0.05).as("_nda"))
      .where(col("_no") >= minDocs.toLong &&
        (if (minDocs >= 25)
          col("_nda") >= math.ceil(minDocs * 0.8).toLong
        else lit(true)))
      .select(col("_k"))
    val frequent = nb.join(gate, Seq("_k"), "left_semi")
      .groupBy(col("_k"))
      .agg(countDistinct(col(idCol)).as("_nd"))
      .where(col("_nd") >= minDocs)
      .select(col("_k"), lit(true).as("_freq"))
    val flagged = ln.join(frequent, Seq("_k"), "left")
      .withColumn("_keep", col("_k").isNull || col("_freq").isNull)
    reassemble(flagged, idCol, delim)
      .select(col(idCol), col("n_lines"),
        (col("n_lines") - col("n_kept")).as("n_removed"), col("text_clean"))
  }

  /** One grouped pass over flagged (id, pos, line, _keep) rows:
    * n_lines = all lines, n_kept = flagged true, text_clean = kept
    * lines re-joined in position order (collect_list skips the
    * null-valued dropped lines; bounded by single-document size).
    * Dropped lines contribute only their count, so their text is
    * nulled BEFORE the reassembly exchange — a corpus that is 30%
    * boilerplate shuffles 30% fewer line bytes.
    */
  private def reassemble(flagged: DataFrame, idCol: String,
                         delim: String): DataFrame =
    flagged
      .select(col(idCol), col("_keep"),
        when(col("_keep"), struct(col("pos"), col("line"))).as("_pl"))
      .groupBy(col(idCol)).agg(
        count(lit(1)).cast("int").as("n_lines"),
        count(when(col("_keep"), 1)).cast("int").as("n_kept"),
        array_join(
          transform(array_sort(collect_list(col("_pl"))),
            s => s.getField("line")),
          delim).as("text_clean"))
}
