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
      Tables(s, dir).documentsSpread
        .select(col("doc_id"), expr(UrlQueries.rawUrlSql).as("url_raw"),
          expr(pageSql).as("page")),
      "doc_id", "url_raw", "page", minTextWords = minWords)

  /** The scored funnel (engine side): disposition + the deterministic
    * logistic quality gate (2-step GD on 4 content features — see
    * [[graft.text.Curation.scoredDisposition]]).
    */
  private def scored(s: SparkSession, dir: String): DataFrame =
    Curation.scoredDisposition(
      Tables(s, dir).documentsSpread
        .select(col("doc_id"), expr(UrlQueries.rawUrlSql).as("url_raw"),
          expr(pageSql).as("page")),
      "doc_id", "url_raw", "page", minTextWords = minWords)

  val queries: Map[String, Q] = Map(
    // One row per input page: every gate's verdict plus the final
    // keep/drop — the artifact a curation run writes next to the corpus.
    "curation_disposition" -> ((s, dir) => {
      disposition(s, dir).orderBy(col("doc_id"))
    }),

    // The model-scored gate (CCNet's "LM + quality features" stage):
    // a deterministic in-corpus logistic on (word count, kept-block
    // ratio, stopword ratio, mean bigram LM score), margin and verdict
    // per page — the graded generalization of the hard quality gate,
    // with the whole train+score loop unrolled in the oracle.
    "curation_scored" -> ((s, dir) => {
      scored(s, dir).orderBy(col("doc_id"))
    }),

    // The funnel rollup: docs surviving each successive stage (stage
    // names prefixed for a stable sort) — now INCLUDING the scored
    // gate as stage e (r16: the funnel follows the full pipeline).
    "curation_funnel" -> ((s, dir) => {
      Curation.funnel(scored(s, dir)).orderBy(col("stage"))
    }),

    // Mixture assembly: each lang component deterministically
    // downsampled to a 40%-of-its-tokens budget in md5-priority order
    // (Mixture.mixToBudget — the bucketed two-phase threshold, NO
    // per-component global window). Output is the kept docs themselves,
    // so the oracle's naive running-total window pins the bucketed
    // path's bit-identical verdict per doc.
    "curation_mix_budget" -> ((s, dir) => {
      val d = Tables(s, dir).documents.select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("tokens"))
      val budgets = d.groupBy(col("lang"))
        .agg(floor(sum(col("tokens")) * lit(0.4)).cast("long")
          .as("budget"))
      graft.operators.Mixture
        .mixToBudget(d, "doc_id", "lang", "tokens", budgets)
        .orderBy(col("doc_id"))
    }),

    // Sequence packing (concat-and-chunk): the corpus in deterministic
    // md5-shuffled order, cut every 64 tokens, boundary docs split
    // across neighboring chunks — Packing.packSequences' bucketed
    // two-phase prefix sum, NO corpus-sized global window. The oracle
    // is the naive running-total window, so the driver hash pins the
    // bucketed path bit-identical per (doc, chunk) slice.
    "pack_sequences" -> ((s, dir) => {
      val d = Tables(s, dir).documentsSpread.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("tokens"))
      graft.operators.Packing.packSequences(d, "doc_id", "tokens",
          seqLen = 64L)
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    // The explicit global training-order shuffle: each doc's 0-based
    // position in the (md5 priority, id) permutation packSequences
    // packs in — unit-mass docOffsets, i.e. the bucketed two-phase
    // prefix sum, never a corpus-sized global window. The oracle is
    // the naive row_number over the same total order.
    "pack_shuffle_order" -> ((s, dir) => {
      graft.operators.Packing.shuffleOrder(
          Tables(s, dir).documents.select(col("doc_id")), "doc_id")
        .select(col("doc_id"), col("shuffle_key"), col("shuffle_pos"))
        .orderBy(col("doc_id"))
    }),

    // The packed corpus's chunk-health rollup: every chunk but the
    // last carries exactly seqLen tokens; n_clean_heads is the
    // loss-masking statistic (docs starting at token 0 in the chunk).
    "pack_chunk_report" -> ((s, dir) => {
      val d = Tables(s, dir).documents.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("tokens"))
      graft.operators.Packing.chunkReport(
          graft.operators.Packing.packSequences(d, "doc_id", "tokens",
            seqLen = 64L))
        .orderBy(col("chunk_id"))
    }),

    // Diagnostic twin #1 (r17 driver red-row instrumentation): the
    // packing's per-doc (h, tok_start) table oracled DIRECTLY — a
    // future pack_sequences mismatch localizes here to either the
    // md5 priority (h differs) or the two-phase prefix sum
    // (tok_start differs), vs diverging only in the span explode.
    "pack_doc_offsets" -> ((s, dir) => {
      val d = Tables(s, dir).documents.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("tokens"))
      graft.operators.Packing.docOffsets(d, "doc_id", "tokens")
        .orderBy(col("doc_id"))
    }),

    // Diagnostic twin #2: an ORDER-FREE per-doc digest of the span
    // table (count, token mass, and a positional checksum) — hash
    // mismatches localize to the owning doc ids instead of one
    // opaque table digest.
    "pack_sequences_digest" -> ((s, dir) => {
      val d = Tables(s, dir).documents.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("tokens"))
      graft.operators.Packing.packSequences(d, "doc_id", "tokens",
          seqLen = 64L)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"),
          sum(col("tok_to") - col("tok_from")).as("n_tokens"),
          sum(col("chunk_id") * lit(131071L)
            + col("tok_from") * lit(8191L) + col("tok_to")).as("digest"))
        .orderBy(col("doc_id"))
    }),

    // The FULL CommonCrawl-shaped path: the same pages travel as WARC
    // archives (gzip members on even archive ids), records are
    // re-extracted, doc ids recovered from the record URLs, and the
    // curation funnel runs on the transported bytes. The oracle is
    // BYTE-IDENTICAL to curation_disposition's — the driver hash pins
    // transport invariance end to end.
    "curation_warc_pipeline" -> ((s, dir) => {
      val archives = graft.multimodal.Multimodal.encodeWarcCorpus(
        Tables(s, dir).documentsSpread
          .select(col("doc_id"), expr(pageSql).as("text")))
      val pages = graft.multimodal.Multimodal.warcBodies(archives)
        .select(regexp_extract(col("url"), "doc/(\\d+)$", 1)
          .cast("long").as("doc_id"), col("body").as("page"))
        .withColumn("url_raw", expr(UrlQueries.rawUrlSql))
      Curation.disposition(pages, "doc_id", "url_raw", "page",
          minTextWords = minWords)
        .orderBy(col("doc_id"))
    }),

    // The DEPLOYABLE bounded LM artifact (CCNet "ship a fixed LM"):
    // the scored gate's bigram table cut to the 64 transitions with
    // the largest corpus mass — salted two-phase top-N, ties broken by
    // (w1, w2), scores computed from FULL-corpus counts before the
    // cut. The streaming gate consumes this table unchanged (its
    // mean-over-known-transitions contract is spec-pinned).
    "curation_lm_topm" -> ((s, dir) => {
      val (_, lm) = Curation.scoredGateModel(
        Tables(s, dir).documentsSpread
          .select(col("doc_id"), expr(UrlQueries.rawUrlSql).as("url_raw"),
            expr(pageSql).as("page")),
        "doc_id", "url_raw", "page", minTextWords = minWords,
        lmTopM = 64)
      lm.orderBy(col("w1"), col("w2"))
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

  /** The scored chain appended to [[dispositionCte]]: features (f1–f4)
    * from the extracted main text, the corpus bigram LM, the 2-step GD
    * unroll (l4 pattern), and the in-row margin. Every CTE referenced
    * more than once is MATERIALIZED (the DuckDB inliner gotcha — d3
    * alone carries the whole HTML chain).
    */
  /** Tokenize-through-bigram-counts CTE chain (d3 → tk → bg → bi2/un2):
    * the shared base of the scored funnel AND the bounded-LM-table
    * oracle. Appended after [[dispositionCte]].
    */
  private[packs] def lmBaseCte: String =
    """,
      |d3m AS MATERIALIZED (SELECT * FROM d3),
      |tk AS MATERIALIZED (
      |  SELECT doc_id, string_split_regex(main_text, '\s+') AS ts
      |  FROM d3m WHERE main_text <> ''),
      |bg AS MATERIALIZED (
      |  SELECT doc_id, ts[CAST(s AS INT)] AS w1,
      |    ts[CAST(s AS INT) + 1] AS w2
      |  FROM (SELECT doc_id, ts, unnest(range(1, greatest(len(ts), 1)))
      |          AS s
      |        FROM tk WHERE len(ts) >= 2) z),
      |bi2 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
      |un2 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1)""".stripMargin

  private[packs] def scoredCte: String =
    dispositionCte + lmBaseCte +
      """,
        |sr AS (SELECT doc_id,
        |    len(list_filter(ts, t ->
        |      t IN ('the', 'a', 'of', 'and', 'to', 'in'))) * 1.0
        |      / len(ts) AS f3
        |  FROM tk),
        |lmx AS (SELECT g.doc_id,
        |    CAST(round(ln(b.c12 * 1.0 / u.c1) * 1e6, 0) AS BIGINT) AS m
        |  FROM bg g JOIN bi2 b ON g.w1 = b.w1 AND g.w2 = b.w2
        |  JOIN un2 u ON g.w1 = u.w1),
        |lm2 AS (SELECT doc_id, count(*) AS nb, CAST(sum(m) AS BIGINT) AS sm
        |        FROM lmx GROUP BY 1),
        |ftx AS MATERIALIZED (
        |  SELECT d3m.doc_id, d3m.domain, d3m.url_ok, d3m.n_blocks,
        |    d3m.n_kept, d3m.n_words, d3m.quality_ok, d3m.is_exact_dup,
        |    d3m.survivor,
        |    d3m.n_words / 100.0 AS f1,
        |    d3m.n_kept * 1.0 / greatest(d3m.n_blocks, 1) AS f2,
        |    coalesce(sr.f3, 0.0) AS f3,
        |    coalesce(lm2.sm * 1.0 / lm2.nb / 1e6, 0.0) AS f4,
        |    CAST(d3m.url_ok AND d3m.quality_ok AS DOUBLE) AS y
        |  FROM d3m LEFT JOIN sr ON d3m.doc_id = sr.doc_id
        |  LEFT JOIN lm2 ON d3m.doc_id = lm2.doc_id),
        |ptsx AS MATERIALIZED (
        |  SELECT doc_id, 1 AS dim, f1 AS v FROM ftx
        |  UNION ALL SELECT doc_id, 2, f2 FROM ftx
        |  UNION ALL SELECT doc_id, 3, f3 FROM ftx
        |  UNION ALL SELECT doc_id, 4, f4 FROM ftx),
        |gw1 AS MATERIALIZED (
        |  SELECT dim, -0.1 * avg((0.5 - f.y) * p.v) AS w
        |  FROM ptsx p JOIN ftx f ON p.doc_id = f.doc_id GROUP BY dim),
        |gm2 AS (SELECT p.doc_id, sum(p.v * gw1.w) AS m
        |  FROM ptsx p JOIN gw1 ON p.dim = gw1.dim GROUP BY p.doc_id),
        |ge2 AS (SELECT gm2.doc_id, 1.0 / (1.0 + exp(-gm2.m)) - f.y AS err
        |  FROM gm2 JOIN ftx f ON gm2.doc_id = f.doc_id),
        |gg2 AS (SELECT p.dim, avg(ge2.err * p.v) AS g
        |  FROM ptsx p JOIN ge2 ON p.doc_id = ge2.doc_id GROUP BY p.dim),
        |gw2 AS (SELECT gw1.dim, gw1.w - 0.1 * gg2.g AS w
        |  FROM gw1 JOIN gg2 ON gw1.dim = gg2.dim),
        |wr AS (SELECT
        |    max(CASE WHEN dim = 1 THEN w END) AS w1,
        |    max(CASE WHEN dim = 2 THEN w END) AS w2,
        |    max(CASE WHEN dim = 3 THEN w END) AS w3,
        |    max(CASE WHEN dim = 4 THEN w END) AS w4
        |  FROM gw2),
        |scored AS (
        |  SELECT ftx.doc_id, ftx.domain, ftx.url_ok, ftx.n_blocks,
        |    ftx.n_kept, ftx.n_words, ftx.quality_ok, ftx.is_exact_dup,
        |    ftx.survivor,
        |    round(ftx.f1 * wr.w1 + ftx.f2 * wr.w2 + ftx.f3 * wr.w3 +
        |      ftx.f4 * wr.w4, 6) + 0.0 AS quality_margin
        |  FROM ftx CROSS JOIN wr),
        |sfin AS (
        |  SELECT *, (quality_margin > 0.0) AS score_ok,
        |    (survivor AND quality_margin > 0.0) AS survivor_scored
        |  FROM scored)""".stripMargin

  /** The 60-bit md5 shuffle priority, spelled as two ≤8-hex-digit
    * casts combined with exact int64 arithmetic (first8 * 16^7 +
    * next7) instead of one 15-hex cast. Bit-identical to
    * `('0x'||substr(md5(x),1,15))::BIGINT` on a correct engine, but
    * each cast stays ≤ 2^32 — immune to any driver-side DuckDB build
    * that routes wide hex-string casts through a lossy intermediate
    * (r17's pack_sequences red-row suspect; the ≤8-hex idiom is the
    * one ~30 long-green dedup oracles already use).
    */
  private def md5h60(x: String): String =
    s"(('0x' || substr(md5($x), 1, 8))::BIGINT * 268435456" +
      s" + ('0x' || substr(md5($x), 9, 7))::BIGINT)"

  /** Oracle result-type rule (r18 root cause, proven on DuckDB 1.0.0):
    * DuckDB's `sum(BIGINT)` — plain or windowed — returns HUGEINT, and
    * integer `//` on HUGEINT stays HUGEINT. A HUGEINT output column
    * materializes as float64 through the driver's typed (arrow/pandas)
    * path, so `448` renders `448.0` and the value-hash mismatches even
    * though the arithmetic is exact. EVERY oracle output column whose
    * lineage includes a sum() or // must be wrapped `CAST(... AS
    * BIGINT)` at (or before) the final projection. The r18 red rows
    * (`pack_sequences`, `pack_doc_offsets`) were exactly the two
    * queries projecting un-cast sum-derived columns; their CAST-ed
    * digest twins stayed green.
    */

  /** Shared packing chain: naive global running-total window over the
    * (md5-priority, id) order, then the chunk-span explode — the form
    * the engine's bucketed two-phase prefix sum must equal bit for bit.
    */
  private val packSpansCte: String =
    s"""WITH d AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tk,
      |    ${md5h60("CAST(doc_id AS VARCHAR)")} AS h
      |  FROM documents
      |  WHERE len(string_split(text, ' ')) > 0),
      |r AS (
      |  SELECT doc_id, tk, h,
      |    CAST(sum(tk) OVER (ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING)
      |      - tk AS BIGINT) AS start
      |  FROM d),
      |e AS (
      |  SELECT doc_id, tk, start,
      |    unnest(range(CAST(start // 64 AS BIGINT),
      |      CAST((start + tk - 1) // 64 + 1 AS BIGINT))) AS chunk_id
      |  FROM r),
      |spans AS (
      |  SELECT doc_id, chunk_id,
      |    CAST(greatest(0, chunk_id * 64 - start) AS BIGINT) AS tok_from,
      |    CAST(least(tk, (chunk_id + 1) * 64 - start) AS BIGINT) AS tok_to
      |  FROM e)""".stripMargin

  val oracles: Map[String, String] = Map(
    // naive total-order rank over the same (md5 priority, id)
    // permutation; row_number is BIGINT in DuckDB but CAST anyway per
    // the wide-integer rule above
    "pack_shuffle_order" ->
      s"""WITH d AS (
        |  SELECT doc_id,
        |    ${md5h60("CAST(doc_id AS VARCHAR)")} AS shuffle_key
        |  FROM documents)
        |SELECT doc_id, CAST(shuffle_key AS BIGINT) AS shuffle_key,
        |  CAST(row_number() OVER (ORDER BY shuffle_key, doc_id) - 1
        |    AS BIGINT) AS shuffle_pos
        |FROM d
        |ORDER BY doc_id""".stripMargin,

    "pack_sequences" -> (packSpansCte + """
      |SELECT doc_id, chunk_id, tok_from, tok_to FROM spans
      |ORDER BY doc_id, chunk_id""".stripMargin),

    "pack_chunk_report" -> (packSpansCte + """
      |SELECT chunk_id, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(tok_to - tok_from) AS BIGINT) AS n_tokens,
      |  CAST(sum(CASE WHEN tok_from = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clean_heads
      |FROM spans GROUP BY chunk_id ORDER BY chunk_id""".stripMargin),

    "pack_doc_offsets" -> (packSpansCte + """
      |SELECT doc_id, h, tk AS n_tokens,
      |  CAST(start AS BIGINT) AS tok_start
      |FROM r ORDER BY doc_id""".stripMargin),

    "pack_sequences_digest" -> (packSpansCte + """
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
      |  CAST(sum(tok_to - tok_from) AS BIGINT) AS n_tokens,
      |  CAST(sum(chunk_id * 131071 + tok_from * 8191 + tok_to) AS BIGINT)
      |    AS digest
      |FROM spans GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    // The NAIVE formulation the engine's bucketed two-phase threshold
    // must equal bit for bit: per-lang running token total in
    // (md5-priority, id) order, keep while ≤ the 40% budget.
    "curation_mix_budget" ->
      s"""WITH d AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
        |    ${md5h60("CAST(doc_id AS VARCHAR)")} AS h
        |  FROM documents),
        |b AS (SELECT lang,
        |        CAST(floor(sum(tokens) * 0.4) AS BIGINT) AS budget
        |      FROM d GROUP BY lang),
        |r AS (
        |  SELECT d.doc_id, d.lang, d.tokens, b.budget,
        |    sum(d.tokens) OVER (PARTITION BY d.lang ORDER BY d.h, d.doc_id
        |                        ROWS UNBOUNDED PRECEDING) AS run
        |  FROM d JOIN b ON d.lang = b.lang)
        |SELECT doc_id, lang, tokens FROM r
        |WHERE run <= budget ORDER BY doc_id""".stripMargin,

    "curation_disposition" ->
      (dispositionCte +
        """
        |SELECT doc_id, domain, url_ok, n_blocks, n_kept, n_words,
        |  quality_ok, is_exact_dup, survivor
        |FROM d3 ORDER BY doc_id""".stripMargin),

    "curation_scored" ->
      (scoredCte +
        """
        |SELECT doc_id, domain, url_ok, n_blocks, n_kept, n_words,
        |  quality_ok, is_exact_dup, survivor, quality_margin, score_ok,
        |  survivor_scored
        |FROM sfin ORDER BY doc_id""".stripMargin),

    "curation_warc_pipeline" ->
      (dispositionCte +
        """
        |SELECT doc_id, domain, url_ok, n_blocks, n_kept, n_words,
        |  quality_ok, is_exact_dup, survivor
        |FROM d3 ORDER BY doc_id""".stripMargin),

    "curation_funnel" ->
      (scoredCte +
        """,
        |f AS MATERIALIZED (
        |  SELECT CAST(count(*) AS BIGINT) AS a_input,
        |    CAST(count(*) FILTER (WHERE url_ok) AS BIGINT) AS b_url_ok,
        |    CAST(count(*) FILTER (WHERE url_ok AND quality_ok) AS BIGINT)
        |      AS c_quality_ok,
        |    CAST(count(*) FILTER (WHERE survivor) AS BIGINT) AS d_survivor,
        |    CAST(count(*) FILTER (WHERE survivor_scored) AS BIGINT)
        |      AS e_scored
        |  FROM sfin)
        |SELECT 'a_input' AS stage, a_input AS n_docs FROM f
        |UNION ALL SELECT 'b_url_ok', b_url_ok FROM f
        |UNION ALL SELECT 'c_quality_ok', c_quality_ok FROM f
        |UNION ALL SELECT 'd_survivor', d_survivor FROM f
        |UNION ALL SELECT 'e_scored', e_scored FROM f
        |ORDER BY stage""".stripMargin),

    // Same disposition + bigram-count base, then the naive global
    // top-64 (row_number over (mass DESC, w1, w2)) — the oracle pins
    // the engine's salted two-phase cut bit-identical to the total
    // order, and the m values to the full-corpus scores.
    "curation_lm_topm" ->
      (dispositionCte + lmBaseCte +
        """,
        |ltab AS (SELECT b.w1, b.w2,
        |    CAST(round(ln(b.c12 * 1.0 / u.c1) * 1e6, 0) AS BIGINT) AS m,
        |    b.c12 AS c12
        |  FROM bi2 b JOIN un2 u ON b.w1 = u.w1),
        |rk AS (SELECT w1, w2, m,
        |    row_number() OVER (ORDER BY c12 DESC, w1, w2) AS r
        |  FROM ltab)
        |SELECT w1, w2, m FROM rk WHERE r <= 64
        |ORDER BY w1, w2""".stripMargin)
  )
}
