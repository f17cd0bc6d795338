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

  /** [[mainContent]] as ONE in-row Column: block split, per-block
    * strip + density, keep rule, and re-join all happen inside
    * higher-order array functions on the single page value — zero
    * shuffle, streamable (no stateful operator), and array order IS
    * page order so no position bookkeeping is needed. Returns
    * struct(n_blocks, n_kept, main_text).
    */
  def mainContentCol(html: Column, minWords: Int = 5,
                     maxLinkDensity: Double = 0.33): Column = {
    val segs = split(dropInvisible(html), blockBoundary)
    val scored = transform(segs, seg => {
      val bt = stripTags(seg)
      val lc = length(array_join(transform(
        regexp_extract_all(seg, lit("(?is)<a[^>]*>(.*?)</a>"), lit(1)),
        a => trim(regexp_replace(a, "<[^>]*>", ""))), ""))
      struct(bt.as("bt"), lc.as("lc"))
    })
    val nonEmpty = filter(scored, s => s.getField("bt") =!= "")
    val kept = filter(nonEmpty, s =>
      size(split(s.getField("bt"), " ")) >= minWords &&
        s.getField("lc").cast("double") /
          greatest(length(s.getField("bt")), lit(1)).cast("double")
          <= maxLinkDensity)
    struct(
      size(nonEmpty).as("n_blocks"),
      size(kept).as("n_kept"),
      array_join(transform(kept, s => s.getField("bt")), "\n")
        .as("main_text"))
  }

  /** jusText-style main-content extraction: keep blocks with
    * >= `minWords` words and link density <= `maxLinkDensity`, re-join
    * in page order. Returns one row per input document:
    * (idCol, n_blocks, n_kept, main_text) — n_blocks counts non-empty
    * blocks; a fully-boilerplate page yields (n_kept = 0, "").
    * Implemented on [[mainContentCol]]: pure map-side, zero shuffle.
    */
  def mainContent(docs: DataFrame, idCol: String, htmlCol: String,
                  minWords: Int = 5, maxLinkDensity: Double = 0.33)
      : DataFrame =
    docs.select(col(idCol),
        mainContentCol(col(htmlCol), minWords, maxLinkDensity).as("_mc"))
      .select(col(idCol), col("_mc.n_blocks").as("n_blocks"),
        col("_mc.n_kept").as("n_kept"),
        col("_mc.main_text").as("main_text"))
}
