package graft.packs

import graft.QueryPack
import graft.core.Tables
import graft.text.Curation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end crawl-curation capstone: the disposition a web-scale
  * corpus build emits per page, composed from stages that are each
  * already oracled in isolation —
  *
  *   URL gate (parseable registered domain, UrlQueries fixture)
  *   → HTML main-content extraction (jusText blocks, text.Html)
  *   → quality gate (>= 10 words of main text)
  *   → exact content dedup (md5 of main text, min-doc_id keeper
  *     among docs that passed both gates)
  *   → survivor.
  *
  * The page fixture plants all four funnel populations: ~1/8 of docs
  * fail the URL gate (malformed fixture URL), doc_id % 13 == 5 pages
  * carry only chrome + a 2-word stub (dropped by the block gate →
  * quality fail), doc_id % 11 == 0 pages share one of 4 canonical
  * bodies (exact-dup clusters), everything else is unique prose.
  *
  * 100 TB posture: the whole funnel is two map-side stages (URL parse,
  * HTML extraction), one per-doc reassembly groupBy, one 16-byte-key
  * keeper aggregation and its one-row-per-key join back — the same
  * shuffle budget as exact dedup alone; gates are free.
  */
object CurationQueries extends QueryPack {

  /** Capstone page fixture (CASE order matters: the stub wins over the
    * dup body when both residues hit). Shared verbatim engine/oracle.
    */
  private[packs] val pageSql: String =
    """'<html><head><script>var t = "</div>"; track(1);</script></head><body>' ||
      |'<div class="nav"><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact us</a></div>' ||
      |'<p>' ||
      |CASE WHEN doc_id % 13 = 5 THEN 'too short'
      |     WHEN doc_id % 11 = 0 THEN 'canonical duplicate body text for cluster ' ||
      |       CAST(doc_id % 4 AS STRING) ||
      |       ' padded well past the ten word quality gate'
      |     ELSE substr(text, 1, 100) END ||
      |'</p>' ||
      |CASE WHEN doc_id % 13 = 5 THEN ''
      |     WHEN doc_id % 11 = 0 THEN '<p>canonical duplicate tail paragraph shared verbatim across the cluster</p>'
      |     ELSE '<p>' || substr(text, 101, 100) || ' unique tail for doc ' || CAST(doc_id AS STRING) || '</p>' END ||
      |'<div class="footer">&copy; 2024 <a href="/tos">Terms</a> <a href="/priv">Privacy</a></div>' ||
      |'</body></html>'""".stripMargin

  private[packs] val minWords = 10

  /** The per-document funnel disposition (engine side): the generic
    * [[graft.text.Curation]] operator over the two fixture columns.
    */
  private def disposition(s: SparkSession, dir: String): DataFrame =
    Curation.disposition(
      Tables(s, dir).documents
        .select(col("doc_id"), expr(UrlQueries.rawUrlSql).as("url_raw"),
          expr(pageSql).as("page")),
      "doc_id", "url_raw", "page", minTextWords = minWords)

  val queries: Map[String, Q] = Map(
    // One row per input page: every gate's verdict plus the final
    // keep/drop — the artifact a curation run writes next to the corpus.
    "curation_disposition" -> ((s, dir) => {
      disposition(s, dir).orderBy(col("doc_id"))
    }),

    // The funnel rollup: docs surviving each successive stage (stage
    // names prefixed for a stable sort).
    "curation_funnel" -> ((s, dir) => {
      Curation.funnel(disposition(s, dir)).orderBy(col("stage"))
    }),

    // The FULL CommonCrawl-shaped path: the same pages travel as WARC
    // archives (gzip members on even archive ids), records are
    // re-extracted, doc ids recovered from the record URLs, and the
    // curation funnel runs on the transported bytes. The oracle is
    // BYTE-IDENTICAL to curation_disposition's — the driver hash pins
    // transport invariance end to end.
    "curation_warc_pipeline" -> ((s, dir) => {
      val archives = graft.multimodal.Multimodal.encodeWarcCorpus(
        Tables(s, dir).documents
          .select(col("doc_id"), expr(pageSql).as("text")))
      val pages = graft.multimodal.Multimodal.warcBodies(archives)
        .select(regexp_extract(col("url"), "doc/(\\d+)$", 1)
          .cast("long").as("doc_id"), col("body").as("page"))
        .withColumn("url_raw", expr(UrlQueries.rawUrlSql))
      Curation.disposition(pages, "doc_id", "url_raw", "page",
          minTextWords = minWords)
        .orderBy(col("doc_id"))
    })
  )

  /** Shared oracle chain: URL chain (u..c from UrlQueries) + block chain
    * (pg..nb from HtmlQueries, over THIS pack's page fixture) + funnel
    * CTEs, ending in d3 = the disposition.
    */
  private[packs] def dispositionCte: String =
    s"""WITH ${UrlQueries.urlChainSql},
       |${HtmlQueries.blockChain(pageSql)},
       |mc AS (
       |  SELECT doc_id, CAST(count(*) AS INT) AS n_blocks,
       |    CAST(count(*) FILTER (WHERE n_words >= 5
       |      AND link_density <= 0.33) AS INT) AS n_kept,
       |    coalesce(string_agg(block_text, chr(10) ORDER BY pos)
       |      FILTER (WHERE n_words >= 5 AND link_density <= 0.33), '')
       |      AS main_text
       |  FROM nb GROUP BY doc_id),
       |d0 AS (
       |  SELECT c.doc_id, c.domain, (c.domain <> '') AS url_ok,
       |    mc.n_blocks, mc.n_kept, mc.main_text,
       |    CASE WHEN mc.main_text = '' THEN 0
       |      ELSE CAST(len(string_split_regex(mc.main_text, '\\s+')) AS INT)
       |      END AS n_words
       |  FROM c JOIN mc ON c.doc_id = mc.doc_id),
       |d1 AS (
       |  SELECT *, (n_words >= $minWords) AS quality_ok FROM d0),
       |kp AS (
       |  SELECT md5(main_text) AS h, min(doc_id) AS kid
       |  FROM d1 WHERE url_ok AND quality_ok GROUP BY 1),
       |d3 AS (
       |  SELECT d1.*,
       |    (url_ok AND quality_ok AND coalesce(kid <> d1.doc_id, FALSE))
       |      AS is_exact_dup,
       |    (url_ok AND quality_ok
       |      AND NOT coalesce(kid <> d1.doc_id, FALSE)) AS survivor
       |  FROM d1 LEFT JOIN kp ON md5(d1.main_text) = kp.h)""".stripMargin

  val oracles: Map[String, String] = Map(
    "curation_disposition" ->
      (dispositionCte +
        """
        |SELECT doc_id, domain, url_ok, n_blocks, n_kept, n_words,
        |  quality_ok, is_exact_dup, survivor
        |FROM d3 ORDER BY doc_id""".stripMargin),

    "curation_warc_pipeline" ->
      (dispositionCte +
        """
        |SELECT doc_id, domain, url_ok, n_blocks, n_kept, n_words,
        |  quality_ok, is_exact_dup, survivor
        |FROM d3 ORDER BY doc_id""".stripMargin),

    "curation_funnel" ->
      (dispositionCte +
        """,
        |f AS (
        |  SELECT CAST(count(*) AS BIGINT) AS a_input,
        |    CAST(count(*) FILTER (WHERE url_ok) AS BIGINT) AS b_url_ok,
        |    CAST(count(*) FILTER (WHERE url_ok AND quality_ok) AS BIGINT)
        |      AS c_quality_ok,
        |    CAST(count(*) FILTER (WHERE survivor) AS BIGINT) AS d_survivor
        |  FROM d3)
        |SELECT 'a_input' AS stage, a_input AS n_docs FROM f
        |UNION ALL SELECT 'b_url_ok', b_url_ok FROM f
        |UNION ALL SELECT 'c_quality_ok', c_quality_ok FROM f
        |UNION ALL SELECT 'd_survivor', d_survivor FROM f
        |ORDER BY stage""".stripMargin)
  )
}
