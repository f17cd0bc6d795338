package graft.packs

import graft.QueryPack
import graft.core.Tables
import graft.text.Urls
import org.apache.spark.sql.functions._

/** URL curation (north-star extension): canonicalization,
  * registered-domain extraction, per-domain caps. The documents table
  * carries no URL column, so each query derives a deterministic raw
  * URL per doc from `doc_id` via [[rawUrlSql]] — ONE SQL fragment
  * evaluated by `expr()` on the engine side and spliced verbatim into
  * the oracle, so the fixture cannot drift between the two. The eight
  * residue classes exercise every canonicalization path: case folding,
  * `www.` strip, default and non-default ports, fragment drop,
  * tracking-param removal (incl. case-insensitive `UTM_*`), param
  * sorting, trailing-slash trim, a multi-label public suffix, a
  * PSL-private suffix (`github.io`), and a malformed row.
  */
object UrlQueries extends QueryPack {

  /** Deterministic raw-URL fixture, shared verbatim by engine (via
    * `expr`) and oracle (spliced) — Spark SQL and DuckDB both accept
    * this dialect subset (CASE, %, ||, CAST AS STRING).
    */
  private[packs] val rawUrlSql: String =
    """CASE doc_id % 8
      |  WHEN 0 THEN 'HTTP://WWW.Example.COM:80/a/' || CAST(doc_id AS STRING) || '/'
      |  WHEN 1 THEN 'https://news.example.co.uk/story?utm_source=tw&b=2&a=1#frag'
      |  WHEN 2 THEN 'https://cdn.example.com:8443/img/' || CAST(doc_id AS STRING) || '.jpg'
      |  WHEN 3 THEN 'http://blog.github.io/?fbclid=xyz&id=' || CAST(doc_id AS STRING)
      |  WHEN 4 THEN 'https://Example.com/search?q=spark&UTM_campaign=x&ref=hp'
      |  WHEN 5 THEN 'not a url ' || CAST(doc_id AS STRING)
      |  WHEN 6 THEN 'https://shop.example.com.au:443/p/' || CAST(doc_id AS STRING) || '//'
      |  ELSE 'http://example.org/a?z=9&y=8&x=7'
      |END""".stripMargin

  val queries: Map[String, Q] = Map(
    // Canonical URL + registered domain per document — all map-side
    // Column expressions (whole-stage codegen, zero shuffle; the only
    // exchange in the plan is the output sort).
    "url_canonicalize" -> ((s, dir) => {
      Tables(s, dir).documents
        .withColumn("url_raw", expr(rawUrlSql))
        .withColumn("url_canon", Urls.canonicalizeUrl(col("url_raw")))
        .withColumn("domain", Urls.registeredDomain(Urls.hostOf(col("url_raw"))))
        .select(col("doc_id"), col("url_raw"), col("url_canon"), col("domain"))
        .orderBy(col("doc_id"))
    }),

    // Mixture visibility: docs and chars per registered domain, the
    // table a curation run reads before setting per-domain caps.
    // Malformed URLs (empty domain) are filtered, not crashed on.
    "url_domain_stats" -> ((s, dir) => {
      Tables(s, dir).documents
        .withColumn("domain", Urls.registeredDomain(Urls.hostOf(expr(rawUrlSql))))
        .where(col("domain") =!= "")
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy(col("domain"))
    }),

    // Crawl politeness: robots.txt parsed per registered domain and
    // every fixture URL decided under agent `graftbot` (RFC 9309:
    // exact-agent group SHADOWS `*` — even when the exact group is
    // EMPTY, in which case everything is allowed (example.com.au
    // exercises this) — longest rule wins, Allow wins
    // ties, `$`/`*` rule syntax, empty Disallow is a no-op). The
    // robots bodies are a second shared fixture keyed by the SAME
    // domains the URL fixture produces.
    "url_robots_decisions" -> ((s, dir) => {
      val uq = Tables(s, dir).documents
        .select(col("doc_id"), expr(rawUrlSql).as("url_raw"))
        .withColumn("domain",
          Urls.registeredDomain(Urls.hostOf(col("url_raw"))))
        .where(col("domain") =!= "")
        .withColumn("path", Urls.pathOf(col("url_raw")))
        .select(col("doc_id"), col("domain"), col("path"))
      val robots = uq.select(col("domain")).distinct()
        .withColumn("body", expr(robotsSql))
      graft.text.Robots.decisions(uq,
          graft.text.Robots.rules(robots, "domain", "body",
            agent = "graftbot"),
          "doc_id", "domain", "path")
        .orderBy(col("doc_id"))
    }),

    // Domain-flood guard: keep the 100 largest docs per registered
    // domain (ties to lowest doc_id). Engine runs the two-phase salted
    // top-N (hot domains spread over salt partitions, final window
    // bounded at cap·salts rows per domain); the oracle replays the
    // plain single-window twin the split provably equals.
    "url_domain_cap" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
        .withColumn("domain", Urls.registeredDomain(Urls.hostOf(expr(rawUrlSql))))
        .where(col("domain") =!= "")
      Urls.perDomainCap(docs, col("domain"),
          Seq(col("n_chars").desc, col("doc_id").asc), col("doc_id"),
          cap = 100, salts = 8)
        .select(col("doc_id"), col("domain"), col("n_chars"),
          col("domain_rank"))
        .orderBy(col("domain"), col("domain_rank"))
    })
  )

  /** robots.txt fixture per fixture domain: exercises badbot-group
    * skipping, exact-agent (`graftbot`) shadowing of `*`, anchored and
    * wildcard rules, a no-op empty Disallow, and an Allow/Disallow
    * length tie. Shared verbatim engine/oracle.
    */
  private val robotsSql: String =
    """CASE domain
      |  WHEN 'example.com' THEN
      |    'User-agent: badbot' || chr(10) || 'Disallow: /' || chr(10) ||
      |    chr(10) || 'User-agent: *' || chr(10) ||
      |    'Disallow: /img/*.jpg$' || chr(10) || 'Allow: /img/' || chr(10) ||
      |    'Disallow: /search' || chr(10) || 'Disallow:'
      |  WHEN 'example.co.uk' THEN
      |    'User-agent: graftbot' || chr(10) || 'Disallow: /sto' || chr(10) ||
      |    'Allow: /story' || chr(10) || chr(10) ||
      |    'User-agent: *' || chr(10) || 'Disallow: /'
      |  WHEN 'blog.github.io' THEN
      |    'User-agent: *' || chr(10) || 'Disallow: /private'
      |  WHEN 'example.com.au' THEN
      |    'User-agent: *' || chr(10) || 'Disallow: /p/' || chr(10) ||
      |    chr(10) || 'User-agent: graftbot'
      |  ELSE
      |    'User-agent: *' || chr(10) || 'Allow: /a' || chr(10) ||
      |    'Disallow: /a'
      |END""".stripMargin

  /** DuckDB mirror of [[graft.text.Urls]]: the same regexes, the same
    * list pipeline (split → filter tracking → sort → join), the same
    * suffix table. `u` expects `doc_id`; emits `host`, `canon`,
    * `domain`.
    */
  private[packs] val urlChainSql: String =
    s"""u AS (
       |  SELECT doc_id, n_chars, $rawUrlSql AS url_raw FROM documents),
       |p AS (
       |  SELECT doc_id, n_chars, url_raw,
       |    lower(regexp_extract(url_raw,
       |      '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
       |    regexp_replace(lower(regexp_extract(url_raw,
       |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)', 1)),
       |      '^www[.]', '') AS host,
       |    regexp_extract(url_raw,
       |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#:]*:([0-9]+)', 1) AS port,
       |    regexp_replace(regexp_extract(url_raw,
       |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
       |      '/+$$', '') AS path,
       |    regexp_extract(url_raw, '[?]([^#]*)', 1) AS q
       |  FROM u),
       |k AS (
       |  SELECT *, array_to_string(list_sort(list_filter(
       |      string_split(q, '&'),
       |      x -> x <> ''
       |        AND NOT starts_with(lower(string_split(x, '=')[1]), 'utm_')
       |        AND lower(string_split(x, '=')[1]) NOT IN
       |          ('fbclid','gclid','msclkid','mc_cid','mc_eid','igshid','ref')
       |    )), '&') AS sortedq
       |  FROM p),
       |c AS (
       |  SELECT doc_id, n_chars, url_raw, host,
       |    CASE WHEN scheme = '' OR host = '' THEN '' ELSE
       |      scheme || '://' || host ||
       |      CASE WHEN port <> ''
       |             AND NOT (scheme = 'http' AND port = '80')
       |             AND NOT (scheme = 'https' AND port = '443')
       |           THEN ':' || port ELSE '' END ||
       |      path ||
       |      CASE WHEN sortedq <> '' THEN '?' || sortedq ELSE '' END
       |    END AS canon,
       |    CASE WHEN len(string_split(host, '.')) >= 3
       |           AND array_to_string(list_slice(string_split(host, '.'),
       |             len(string_split(host, '.')) - 1, 99), '.') IN
       |             ('co.uk','org.uk','ac.uk','gov.uk','me.uk','com.au',
       |              'net.au','org.au','co.jp','or.jp','ne.jp','co.in',
       |              'co.nz','com.br','com.mx','com.cn','com.tr',
       |              'github.io','gitlab.io','blogspot.com')
       |      THEN array_to_string(list_slice(string_split(host, '.'),
       |             len(string_split(host, '.')) - 2, 99), '.')
       |      ELSE array_to_string(list_slice(string_split(host, '.'),
       |             greatest(len(string_split(host, '.')) - 1, 1), 99), '.')
       |    END AS domain
       |  FROM k)""".stripMargin

  val oracles: Map[String, String] = Map(
    "url_canonicalize" ->
      s"""WITH $urlChainSql
         |SELECT doc_id, url_raw, canon AS url_canon, domain FROM c
         |ORDER BY doc_id""".stripMargin,

    "url_domain_stats" ->
      s"""WITH $urlChainSql
         |SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM c WHERE domain <> ''
         |GROUP BY domain ORDER BY domain""".stripMargin,

    // Full REP replay: line split -> directive parse -> UA-run group
    // ids (lag/sum windows) -> agent selection (exact 'graftbot'
    // shadows '*') -> rule LIKE-pattern compile (same escape order as
    // the engine: \, %, _, then * -> %) -> longest-match/allow-ties
    // decision via one ranked window. LIKE needs ESCAPE '\' spelled
    // out in DuckDB to mirror Spark's default escape.
    "url_robots_decisions" ->
      (s"""WITH $urlChainSql,
          |uq AS (
          |  SELECT k.doc_id, c.domain, k.path
          |  FROM k JOIN c ON k.doc_id = c.doc_id
          |  WHERE c.domain <> ''),
          |rb AS (SELECT domain, $robotsSql AS body
          |       FROM (SELECT DISTINCT domain FROM uq) dd),
          |""".stripMargin +
        """l0 AS (SELECT domain, s AS idx, ls[s + 1] AS raw
          |  FROM (SELECT domain, ls, unnest(range(0, len(ls))) AS s
          |        FROM (SELECT domain, string_split(body, chr(10)) AS ls
          |              FROM rb) a) b),
          |lf AS (SELECT domain, idx,
          |    lower(regexp_extract(line, '^([^:]*):', 1)) AS dir,
          |    trim(regexp_extract(line, '^[^:]*:(.*)$', 1)) AS value
          |  FROM (SELECT domain, idx,
          |          trim(regexp_replace(raw, '#.*$', '')) AS line
          |        FROM l0) c2
          |  WHERE line <> ''),
          |g2 AS (SELECT *, sum(ua_start) OVER (PARTITION BY domain
          |    ORDER BY idx ROWS UNBOUNDED PRECEDING) AS grp
          |  FROM (SELECT *, CASE WHEN is_ua AND NOT coalesce(
          |          lag(is_ua) OVER (PARTITION BY domain ORDER BY idx),
          |          FALSE) THEN 1 ELSE 0 END AS ua_start
          |        FROM (SELECT *, (dir = 'user-agent') AS is_ua
          |              FROM lf) g0) g1),
          |ga AS (SELECT domain, grp,
          |    max(CASE WHEN lower(value) = 'graftbot' THEN 1 ELSE 0 END)
          |      AS ex,
          |    max(CASE WHEN value = '*' THEN 1 ELSE 0 END) AS st
          |  FROM g2 WHERE is_ua GROUP BY domain, grp),
          |rr0 AS (SELECT g2.domain, g2.dir, g2.value, ga.ex, ga.st
          |  FROM g2 JOIN ga ON g2.domain = ga.domain AND g2.grp = ga.grp
          |  WHERE g2.dir IN ('allow', 'disallow') AND g2.value <> ''),
          |ae AS (SELECT domain, max(ex) AS any_ex FROM ga
          |       GROUP BY domain),
          |rr AS (SELECT rr0.domain, rr0.value AS rule_path,
          |    (rr0.dir = 'allow') AS is_allow,
          |    CAST(length(rr0.value) AS INT) AS rule_len,
          |    (rr0.value LIKE '%$') AS anch,
          |    replace(replace(replace(replace(
          |      CASE WHEN rr0.value LIKE '%$'
          |        THEN substr(rr0.value, 1, length(rr0.value) - 1)
          |        ELSE rr0.value END,
          |      '\', '\\'), '%', '\%'), '_', '\_'), '*', '%') AS wild
          |  FROM rr0 JOIN ae ON rr0.domain = ae.domain
          |  WHERE CASE WHEN ae.any_ex = 1 THEN rr0.ex = 1
          |        ELSE rr0.st = 1 END),
          |rl AS (SELECT domain, rule_path, is_allow, rule_len,
          |    CASE WHEN anch THEN wild ELSE wild || '%' END AS pat
          |  FROM rr),
          |dec AS (SELECT uq.doc_id, uq.domain, uq.path, rl.rule_path,
          |    rl.is_allow, rl.rule_len,
          |    coalesce(uq.path LIKE rl.pat ESCAPE '\', FALSE) AS m
          |  FROM uq LEFT JOIN rl ON uq.domain = rl.domain),
          |win AS (SELECT *, row_number() OVER (PARTITION BY doc_id
          |    ORDER BY m DESC, rule_len DESC, is_allow DESC,
          |      rule_path DESC) AS rn
          |  FROM dec)
          |SELECT doc_id, domain, path,
          |  CASE WHEN m THEN is_allow ELSE TRUE END AS allowed,
          |  CASE WHEN m THEN rule_path ELSE '' END AS rule
          |FROM win WHERE rn = 1
          |ORDER BY doc_id""".stripMargin),

    "url_domain_cap" ->
      s"""WITH $urlChainSql,
         |r AS (
         |  SELECT doc_id, domain, n_chars,
         |    row_number() OVER (PARTITION BY domain
         |      ORDER BY n_chars DESC, doc_id) AS domain_rank
         |  FROM c WHERE domain <> '')
         |SELECT doc_id, domain, n_chars, CAST(domain_rank AS INT)
         |  AS domain_rank
         |FROM r WHERE domain_rank <= 100
         |ORDER BY domain, domain_rank""".stripMargin
  )
}
