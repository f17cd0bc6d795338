package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end crawl-curation funnel: URL gate → HTML main-content
  * extraction → quality gate → exact content dedup → survivor, emitted
  * as one disposition row per input page (the artifact a corpus build
  * writes next to the corpus so every drop is attributable).
  *
  * Stage semantics (each independently available in this library):
  *  - url_ok: the page's URL yields a non-empty registered domain
  *    ([[Urls.registeredDomain]]) — unparseable URLs are dropped, not
  *    crashed on.
  *  - main content: [[Html.mainContent]] with (minWords,
  *    maxLinkDensity) block gates.
  *  - quality_ok: >= `minTextWords` whitespace-separated words of main
  *    text.
  *  - is_exact_dup: md5(main_text) already seen on a LOWER doc id among
  *    pages that passed both gates (min-id keeper; gated pages can
  *    never displace a keeper).
  *  - survivor = url_ok AND quality_ok AND NOT is_exact_dup.
  *
  * 100 TB posture: two map-side stages (URL parse, HTML strip), one
  * per-doc reassembly groupBy bounded by page size, one 16-byte-key
  * keeper aggregation (map-side combinable min) and its
  * one-row-per-key join back — the shuffle budget of exact dedup
  * alone; the gates are free predicates on already-computed columns.
  */
object Curation {

  /** Disposition per page. `docs` must carry `idCol` (orderable),
    * `urlCol`, `htmlCol`. Returns (idCol, domain, url_ok, n_blocks,
    * n_kept, n_words, quality_ok, is_exact_dup, survivor).
    */
  def disposition(docs: DataFrame, idCol: String, urlCol: String,
                  htmlCol: String, minTextWords: Int = 10,
                  blockMinWords: Int = 5,
                  blockMaxLinkDensity: Double = 0.33): DataFrame = {
    val withDomain = docs.withColumn("domain",
      Urls.registeredDomain(Urls.hostOf(col(urlCol))))
    val mc = Html.mainContent(withDomain, idCol, htmlCol,
      blockMinWords, blockMaxLinkDensity)
    // d0 feeds BOTH the keeper aggregation and the output row — without
    // the checkpoint the whole HTML-extraction subtree would execute
    // twice (the r7 shingle-relation lesson; at 100 TB that is a second
    // full pass over the crawl).
    val d0 = withDomain.select(col(idCol), col("domain"))
      .join(mc, idCol)
      .withColumn("url_ok", col("domain") =!= "")
      .withColumn("n_words",
        when(col("main_text") === "", lit(0))
          .otherwise(size(split(col("main_text"), "\\s+"))))
      .withColumn("quality_ok", col("n_words") >= minTextWords)
      .localCheckpoint()
    val keepers = d0.where(col("url_ok") && col("quality_ok"))
      .groupBy(md5(col("main_text")).as("_h"))
      .agg(min(col(idCol)).as("_kid"))
    d0.withColumn("_h", md5(col("main_text")))
      .join(keepers, Seq("_h"), "left")
      .withColumn("is_exact_dup",
        col("url_ok") && col("quality_ok") &&
          coalesce(col("_kid") =!= col(idCol), lit(false)))
      .withColumn("survivor",
        col("url_ok") && col("quality_ok") && !col("is_exact_dup"))
      .select(col(idCol), col("domain"), col("url_ok"), col("n_blocks"),
        col("n_kept"), col("n_words"), col("quality_ok"),
        col("is_exact_dup"), col("survivor"))
  }

  /** Funnel rollup of [[disposition]]: docs surviving each successive
    * stage, stage names prefixed for a stable sort.
    */
  def funnel(disposition: DataFrame): DataFrame =
    disposition.agg(
        count(lit(1)).as("a_input"),
        count(when(col("url_ok"), 1)).as("b_url_ok"),
        count(when(col("url_ok") && col("quality_ok"), 1))
          .as("c_quality_ok"),
        count(when(col("survivor"), 1)).as("d_survivor"))
      .selectExpr("stack(4, 'a_input', a_input, 'b_url_ok', b_url_ok, " +
        "'c_quality_ok', c_quality_ok, 'd_survivor', d_survivor) " +
        "AS (stage, n_docs)")
}
