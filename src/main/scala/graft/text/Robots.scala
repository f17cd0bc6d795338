package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt evaluation (RFC 9309 subset) — crawl politeness is a
  * CURATION input: a corpus build that keeps disallowed pages ships
  * pages the crawler should never have fetched, so the decision table
  * belongs next to the URL gate.
  *
  * Supported surface: `User-agent` groups (consecutive UA lines stack
  * onto one group; rules bind to the nearest preceding group), exact
  * agent match preferred over the `*` group PER RFC (never unioned),
  * `Allow`/`Disallow` with `*` wildcards and `$` end-anchors,
  * comments and blank lines, case-insensitive directives, empty
  * `Disallow:` treated as no rule. Decision: longest rule wins,
  * `Allow` wins ties, no match ⇒ allowed.
  *
  * Wildcard matching compiles each rule to a SQL LIKE pattern
  * (`*`→`%`, literal `%`/`_` backslash-escaped, `$` drops the
  * trailing `%`) — LIKE has identical semantics in Spark and DuckDB,
  * so the oracle replays matching verbatim instead of approximating
  * a regex dialect.
  *
  * 100 TB posture: rule parsing is per-domain line algebra over files
  * that are kilobytes (the windows partition by domain — no global
  * ordering); the decision is one join keyed by registered domain +
  * a per-URL max-struct aggregate. The rule table is tiny next to
  * the URL corpus and broadcast-eligible.
  */
object Robots {

  /** Per-domain effective rules for `agent`: (domainCol, rule_path,
    * is_allow, rule_len, rule_like). Exact-agent groups shadow the
    * `*` groups when present for a domain.
    */
  def rules(robots: DataFrame, domainCol: String, bodyCol: String,
            agent: String = "*"): DataFrame = {
    val w = Window.partitionBy(col(domainCol)).orderBy(col("idx"))
    val lines = robots
      .select(col(domainCol),
        posexplode(split(col(bodyCol), "\n")).as(Seq("idx", "raw")))
      .withColumn("line", trim(regexp_replace(col("raw"), "#.*$", "")))
      .where(col("line") =!= "")
      .withColumn("dir", lower(regexp_extract(col("line"), "^([^:]*):", 1)))
      .withColumn("value", trim(regexp_extract(col("line"), "^[^:]*:(.*)$", 1)))
    val grouped = lines
      .withColumn("_isUa", col("dir") === "user-agent")
      .withColumn("_uaStart", (col("_isUa") &&
        !coalesce(lag(col("_isUa"), 1).over(w), lit(false))).cast("int"))
      .withColumn("grp", sum(col("_uaStart")).over(w))
    val groupAgents = grouped.where(col("_isUa"))
      .groupBy(col(domainCol), col("grp"))
      .agg(
        max(when(lower(col("value")) === lit(agent.toLowerCase), 1)
          .otherwise(0)).as("_exact"),
        max(when(col("value") === "*", 1).otherwise(0)).as("_star"))
    val ruleRows = grouped
      .where(col("dir").isin("allow", "disallow") && col("value") =!= "")
      .join(groupAgents, Seq(domainCol, "grp"))
    // RFC: the exact-agent group shadows `*` when any exists — derived
    // from the UA lines themselves (groupAgents), NOT from rule rows,
    // so an exact group with zero rules still shadows `*` (most
    // specific group governs even when empty ⇒ everything allowed)
    val hasExact = groupAgents.groupBy(col(domainCol))
      .agg(max(col("_exact")).as("_anyExact"))
    ruleRows.join(hasExact, domainCol)
      .where(when(col("_anyExact") === 1, col("_exact") === 1)
        .otherwise(col("_star") === 1))
      .select(col(domainCol),
        col("value").as("rule_path"),
        (col("dir") === "allow").as("is_allow"),
        length(col("value")).as("rule_len"),
        likePattern(col("value")).as("rule_like"))
  }

  /** rule path → LIKE pattern: escape `%`/`_`, `*`→`%`, `$` anchors. */
  private def likePattern(p: Column): Column = {
    val anchored = p.endsWith("$")
    val core = when(anchored, p.substr(lit(1), length(p) - 1)).otherwise(p)
    val esc = regexp_replace(
      regexp_replace(
        regexp_replace(core, "\\\\", "\\\\\\\\"),
        "%", "\\\\%"),
      "_", "\\\\_")
    val wild = regexp_replace(esc, "\\*", "%")
    when(anchored, wild).otherwise(concat(wild, lit("%")))
  }

  /** Decide every URL row: (urls columns) + (allowed, rule) where
    * `rule` is the winning rule path ('' when none matched). `urls`
    * must carry `domainCol` and `pathCol`; one row per input row.
    */
  def decisions(urls: DataFrame, ruleTable: DataFrame, keyCol: String,
                domainCol: String, pathCol: String): DataFrame = {
    val joined = urls
      .join(ruleTable, Seq(domainCol), "left")
      .withColumn("_m",
        col("rule_like").isNotNull &&
          expr(s"$pathCol LIKE rule_like"))
      .withColumn("_cand", when(col("_m"),
        struct(col("rule_len").as("l"),
          col("is_allow").cast("int").as("a"),
          col("rule_path").as("p"))))
    joined.groupBy(col(keyCol))
      .agg(first(col(domainCol)).as(domainCol),
        first(col(pathCol)).as(pathCol),
        max(col("_cand")).as("_best"))
      .select(col(keyCol), col(domainCol), col(pathCol),
        coalesce(col("_best.a") === 1 || col("_best").isNull, lit(true))
          .as("allowed"),
        coalesce(col("_best.p"), lit("")).as("rule"))
  }
}
