package graft.packs

import graft.QueryPack
import graft.core.Tables
import graft.text.Html
import org.apache.spark.sql.functions._

/** HTML text extraction (north-star extension): whole-page tag
  * stripping and jusText-style block-level main-content extraction.
  * The documents table is plain text, so each query wraps it into a
  * deterministic HTML page via [[rawHtmlSql]] — one SQL fragment
  * evaluated by `expr()` on the engine side and spliced verbatim into
  * the oracle (the UrlQueries.rawUrlSql no-drift pattern). The page
  * plants the block populations a crawl has: a nav bar and tag list
  * that are pure anchor text, a script whose STRING LITERAL contains a
  * block-closing tag (exercising strip-before-split), a comment, two
  * prose paragraphs from the doc's own text (one with entities and an
  * inline link), and a link-heavy footer.
  */
object HtmlQueries extends QueryPack {

  /** Deterministic raw-HTML page fixture, shared verbatim by engine and
    * oracle. Both dialects accept CASE, %, ||, CAST AS STRING, substr.
    */
  private val rawHtmlSql: String =
    """'<html><head><title>Doc ' || CAST(doc_id AS STRING) || '</title>' ||
      |'<style>body { color: #333; }</style>' ||
      |'<script>var t = "</div>"; track(' || CAST(doc_id % 100 AS STRING) || ');</script></head>' ||
      |'<body><div class="nav"><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact us</a></div>' ||
      |'<h1>Document ' || CAST(doc_id AS STRING) || '</h1>' ||
      |'<p>' || substr(text, 1, 100) || '</p>' ||
      |'<!-- id ' || CAST(doc_id % 9 AS STRING) || ' -->' ||
      |'<p>' || substr(text, 101, 100) || ' &amp; more &#39;quoted&#39; text <a href="/next">next page</a></p>' ||
      |'<ul><li><a href="/t1">tag one</a></li><li><a href="/t2">tag two</a></li></ul>' ||
      |'<div class="footer">&copy; 2024 Example Corp &nbsp;|&nbsp; <a href="/tos">Terms</a> <a href="/priv">Privacy</a></div>' ||
      |'</body></html>'""".stripMargin

  private def htmlDocs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(s, dir).documents
      .select(col("doc_id"), expr(rawHtmlSql).as("page"))

  val queries: Map[String, Q] = Map(
    // Whole-page text extraction — scripts/styles/comments dropped,
    // tags to spaces, entities decoded, whitespace collapsed. All
    // map-side Column algebra (one codegen stage, zero shuffle).
    "html_strip_text" -> ((s, dir) => {
      Html.extractText(htmlDocs(s, dir), "doc_id", "page")
        .orderBy(col("doc_id"))
    }),

    // Block segmentation + jusText features: word count and link
    // density per non-empty block; is_main applies the keep rule the
    // main-content query uses.
    "html_block_stats" -> ((s, dir) => {
      Html.textBlocks(htmlDocs(s, dir), "doc_id", "page")
        .select(col("doc_id"), col("pos"), col("block_text"), col("n_words"),
          round(col("link_density"), 4).as("link_density"),
          (col("n_words") >= 5 && col("link_density") <= 0.33).as("is_main"))
        .orderBy(col("doc_id"), col("pos"))
    }),

    // Main-content extraction: prose blocks kept, chrome dropped,
    // re-joined in page order.
    "html_main_content" -> ((s, dir) => {
      Html.mainContent(htmlDocs(s, dir), "doc_id", "page")
        .orderBy(col("doc_id"))
    })
  )

  // ---- oracle construction ------------------------------------------
  // The strip pipeline is deep nesting of regexp_replace; build the SQL
  // programmatically so engine and oracle stay structurally parallel.

  /** script/style/comment removal (DuckDB needs the 'g' flag). */
  private def duckInvisible(inner: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace($inner,
       |    '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
       |    '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
       |    '(?s)<!--.*?-->', ' ', 'g')""".stripMargin

  /** Entity decode chain — &amp; last, mirroring Html.decodeEntities. */
  private def duckEntities(inner: String): String =
    Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
        "&quot;" -> "\"", "&#39;" -> "''", "&copy;" -> "(c)",
        "&amp;" -> "&")
      .foldLeft(inner) { case (acc, (from, to)) =>
        s"regexp_replace($acc, '$from', '$to', 'g')" }

  /** Full stripTags mirror over an already-invisible-free fragment. */
  private def duckStripNoInvisible(inner: String): String =
    s"""trim(regexp_replace(${duckEntities(
         s"regexp_replace($inner, '<[^>]*>', ' ', 'g')")}, '\\s+', ' ', 'g'))"""

  private def duckStrip(inner: String): String =
    duckStripNoInvisible(duckInvisible(inner))

  private val blockBoundarySql =
    "'(?i)</(?:p|div|h[1-6]|li|ul|ol|table|tr)>|<br ?/?>'"

  /** Block chain over an arbitrary page fragment, WITHOUT the leading
    * `WITH` so composing packs (CurationQueries) can splice it into a
    * larger chain: pg -> segs -> b -> t -> nb(doc_id, pos, block_text,
    * n_words, link_density).
    */
  private[packs] def blockChain(pageSql: String): String =
    s"""pg AS (SELECT doc_id, $pageSql AS page FROM documents),
       |segs AS (
       |  SELECT doc_id, string_split_regex(${duckInvisible("page")},
       |    $blockBoundarySql) AS sg
       |  FROM pg),
       |b AS (
       |  SELECT doc_id, s AS pos, sg[s + 1] AS seg
       |  FROM (SELECT doc_id, sg, unnest(range(0, len(sg))) AS s
       |        FROM segs) u),
       |t AS (
       |  SELECT doc_id, pos, ${duckStripNoInvisible("seg")} AS block_text,
       |    -- DuckDB array_to_string returns NULL (not '') on []
       |    length(coalesce(array_to_string(list_transform(
       |      regexp_extract_all(seg, '(?is)<a[^>]*>(.*?)</a>', 1),
       |      a -> trim(regexp_replace(a, '<[^>]*>', '', 'g'))), ''), ''))
       |      AS lc
       |  FROM b),
       |nb AS (
       |  SELECT doc_id, pos, block_text,
       |    CAST(len(string_split(block_text, ' ')) AS INT) AS n_words,
       |    CAST(lc AS DOUBLE) / greatest(length(block_text), 1)
       |      AS link_density
       |  FROM t WHERE block_text <> '')""".stripMargin

  val oracles: Map[String, String] = Map(
    "html_strip_text" ->
      s"""WITH raw AS (SELECT doc_id, $rawHtmlSql AS page FROM documents)
         |SELECT doc_id, CAST(length(page) AS INT) AS n_chars_html,
         |  ${duckStrip("page")} AS text_plain
         |FROM raw ORDER BY doc_id""".stripMargin,

    "html_block_stats" ->
      ("WITH " + blockChain(rawHtmlSql) +
        """
        |SELECT doc_id, pos, block_text, n_words,
        |  round(link_density, 4) AS link_density,
        |  (n_words >= 5 AND link_density <= 0.33) AS is_main
        |FROM nb ORDER BY doc_id, pos""".stripMargin),

    "html_main_content" ->
      ("WITH " + blockChain(rawHtmlSql) +
        """
        |SELECT doc_id, CAST(count(*) AS INT) AS n_blocks,
        |  CAST(count(*) FILTER (WHERE n_words >= 5
        |    AND link_density <= 0.33) AS INT) AS n_kept,
        |  coalesce(string_agg(block_text, chr(10) ORDER BY pos)
        |    FILTER (WHERE n_words >= 5 AND link_density <= 0.33), '')
        |    AS main_text
        |FROM nb GROUP BY doc_id ORDER BY doc_id""".stripMargin)
  )
}
