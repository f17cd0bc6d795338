package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML text extraction for web-crawl curation — the stage BEFORE every
  * text-quality / dedup operator in this library: a crawl delivers raw
  * pages, and what the pipeline wants is the main prose with the
  * navigation chrome, scripts, and footers gone.
  *
  * Two tiers, in the spirit of jusText / trafilatura but expressed as
  * pure Column algebra so the whole stage stays inside whole-stage
  * codegen (no UDF, no driver state):
  *
  *  - [[stripTags]] / [[extractText]]: whole-page text — drop
  *    script/style/comment subtrees, replace tags with spaces, decode
  *    the common entities, collapse whitespace.
  *  - [[textBlocks]] / [[mainContent]]: split the page into block-level
  *    segments (at `</p> </div> </hN> </li> ... <br>` boundaries) and
  *    score each block by word count and LINK DENSITY (chars of anchor
  *    text / chars of block text). Boilerplate blocks — nav bars, tag
  *    clouds, footers — are nearly all anchor text; body prose is not.
  *    `mainContent` keeps blocks with >= `minWords` words and link
  *    density <= `maxLinkDensity` (jusText's core heuristic, Pomikalek
  *    2011), re-joined in page order.
  *
  * 100 TB posture: everything here is a map-side scalar expression over
  * one row at a time — linear, shuffle-free, codegen'd. The only
  * exchange in `mainContent` is the per-document reassembly groupBy,
  * bounded by single-page block counts. Regexes are RE2-compatible
  * (no backtracking blowup on adversarial pages beyond Java's engine;
  * the non-greedy spans are bounded by the page).
  */
object Html {

  /** script/style/comment subtrees removed — run BEFORE any block split
    * so a `</div>` inside a script string cannot fake a boundary.
    */
  private[text] def dropInvisible(html: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " "),
        "(?is)<style[^>]*>.*?</style>", " "),
      "(?s)<!--.*?-->", " ")

  /** Minimal entity decode: the named entities that actually occur at
    * volume in crawl text. `&amp;` decodes LAST so `&amp;lt;` stays a
    * literal `&lt;` (no double decode).
    */
  private[text] def decodeEntities(s: Column): Column = {
    val pairs = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&copy;" -> "(c)",
      "&amp;" -> "&")
    pairs.foldLeft(s) { case (c, (from, to)) => regexp_replace(c, from, to) }
  }

  /** Visible text of an HTML fragment: invisible subtrees dropped, tags
    * replaced by spaces, entities decoded, whitespace collapsed.
    */
  def stripTags(html: Column): Column =
    trim(regexp_replace(
      decodeEntities(regexp_replace(dropInvisible(html), "<[^>]*>", " ")),
      "\\s+", " "))

  /** Whole-page extraction: (idCol, n_chars_html, text_plain). */
  def extractText(docs: DataFrame, idCol: String, htmlCol: String): DataFrame =
    docs.select(col(idCol),
      length(col(htmlCol)).as("n_chars_html"),
      stripTags(col(htmlCol)).as("text_plain"))

  private val blockBoundary =
    "(?i)</(?:p|div|h[1-6]|li|ul|ol|table|tr)>|<br ?/?>"

  /** Block-level segmentation + jusText features. One row per NON-EMPTY
    * block: (idCol, pos, block_text, n_words, link_density) where `pos`
    * is the block's 0-based position in the page split (empty segments
    * keep their slot, so positions are stable under filtering) and
    * link_density = anchor-text chars / block-text chars.
    */
  def textBlocks(docs: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val segs = docs.select(col(idCol),
      posexplode(split(dropInvisible(col(htmlCol)), blockBoundary))
        .as(Seq("pos", "seg")))
    val anchorInner = transform(
      regexp_extract_all(col("seg"), lit("(?is)<a[^>]*>(.*?)</a>"), lit(1)),
      a => trim(regexp_replace(a, "<[^>]*>", "")))
    segs
      .withColumn("block_text", stripTags(col("seg")))
      .where(col("block_text") =!= "")
      .withColumn("n_words", size(split(col("block_text"), " ")))
      .withColumn("link_density",
        length(array_join(anchorInner, "")).cast("double") /
          greatest(length(col("block_text")), lit(1)).cast("double"))
      .select(col(idCol), col("pos"), col("block_text"), col("n_words"),
        col("link_density"))
  }

  /** jusText-style main-content extraction: keep blocks with
    * >= `minWords` words and link density <= `maxLinkDensity`, re-join
    * in page order. Returns one row per input document:
    * (idCol, n_blocks, n_kept, main_text) — n_blocks counts non-empty
    * blocks; a fully-boilerplate page yields (n_kept = 0, "").
    */
  def mainContent(docs: DataFrame, idCol: String, htmlCol: String,
                  minWords: Int = 5, maxLinkDensity: Double = 0.33)
      : DataFrame = {
    val b = textBlocks(docs, idCol, htmlCol)
    val agg = b.groupBy(col(idCol)).agg(
      count(lit(1)).cast("int").as("n_blocks"),
      count(when(col("n_words") >= minWords &&
        col("link_density") <= maxLinkDensity, 1)).cast("int").as("n_kept"),
      array_join(
        transform(
          array_sort(collect_list(when(col("n_words") >= minWords &&
            col("link_density") <= maxLinkDensity,
            struct(col("pos"), col("block_text"))))),
          s => s.getField("block_text")),
        "\n").as("main_text"))
    docs.select(col(idCol))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_blocks"), lit(0)).as("n_blocks"),
        coalesce(col("n_kept"), lit(0)).as("n_kept"),
        coalesce(col("main_text"), lit("")).as("main_text"))
  }
}
