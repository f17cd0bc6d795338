package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Markdown → plain text, the other big non-HTML crawl surface
  * (GitHub READMEs, docs sites, forum exports). Same design as
  * [[Html.stripTags]]: a fixed chain of regexp_replace Column ops —
  * map-side, codegen'd, zero shuffle — producing the whitespace-
  * collapsed prose the text-quality/dedup stages consume.
  *
  * Rule order is load-bearing:
  *  1. fenced code blocks drop FIRST (their content must not be
  *     reinterpreted as markdown),
  *  2. images before links (`![alt](u)` is a link with a prefix),
  *  3. inline code unwraps before emphasis (backticks often guard
  *     `*` and `_`),
  *  4. line-anchored syntax (headers, list markers, blockquotes,
  *     rules) via (?m),
  *  5. emphasis markers last, then whitespace collapse.
  * Underscores INSIDE words (snake_case) survive: the emphasis rule
  * requires the marker at a word boundary.
  */
object Markdown {

  /** The rule chain, shared with the oracle generator (which rewrites
    * `$1` to RE2's `\1` and adds DuckDB's 'g' flag — the patterns
    * themselves are written to the RE2 ∩ java.util.regex subset).
    */
  private[graft] val steps: Seq[(String, String)] = Seq(
      "(?s)```.*?```" -> " ",                       // fenced code
      "!\\[([^\\]]*)\\]\\([^)]*\\)" -> "$1",        // images -> alt
      "\\[([^\\]]*)\\]\\([^)]*\\)" -> "$1",         // links -> text
      "`([^`]*)`" -> "$1",                          // inline code
      "(?m)^ {0,3}#{1,6} +" -> "",                  // headers
      "(?m)^ {0,3}(?:[-*+]|\\d+\\.) +" -> "",       // list markers
      "(?m)^ {0,3}> ?" -> "",                       // blockquotes
      "(?m)^ {0,3}[-=*_]{3,} *$" -> "",             // horizontal rules
      // emphasis rules stay inside RE2's feature set (no lookaround,
      // no pattern backrefs) so the DuckDB oracle can run the SAME
      // expressions; \b keeps snake_case intact ('_' is a word char,
      // so an in-word underscore has no boundary before it)
      "\\*\\*([^*]+)\\*\\*" -> "$1",                // strong **
      "__([^_]+)__" -> "$1",                        // strong __
      "\\*([^*]+)\\*" -> "$1",                      // emphasis *
      "\\b_([^_]+)_\\b" -> "$1",                    // emphasis _
      "\\s+" -> " ")                                // collapse

  def markdownToText(md: Column): Column =
    trim(steps.foldLeft(md) { case (c, (pat, rep)) =>
      regexp_replace(c, pat, rep) })
}
