package graft

import graft.text.LineDedup
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computable fixtures for line-level corpus dedup; the corpus-scale
  * behavior is pinned by the `dedup_line_*` oracles.
  */
class LineDedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // doc 1: header + unique a + blank + shared
  // doc 2: header + unique b + shared
  // doc 3: header + shared + "  header  " (same trimmed key as header)
  private def corpus = Seq(
    (1L, "header\nunique a\n\nshared quote"),
    (2L, "header\nunique b\nshared quote"),
    (3L, "header\nshared quote\n  header  ")
  ).toDF("doc_id", "text")

  test("duplicateLineStats: trims before hashing, counts docs and occs") {
    val byLine = LineDedup.duplicateLineStats(corpus, "doc_id", "text")
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(byLine("header") === ((3L, 4L)))      // 4 occs, doc 3 twice
    assert(byLine("shared quote") === ((3L, 3L)))
    assert(!byLine.contains("unique a") && !byLine.contains(""))
    assert(byLine.size === 2)
  }

  test("keepFirstLines: first (doc,pos) survives; blanks always kept") {
    val out = LineDedup.keepFirstLines(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    // doc 1 holds the first copy of everything it has, blank included
    assert(out(1L) === ((4, 4, "header\nunique a\n\nshared quote")))
    // doc 2 loses header + shared (both first seen in doc 1)
    assert(out(2L) === ((3, 1, "unique b")))
    // doc 3 loses all three: "  header  " trims to the header key,
    // and the original (untrimmed) line would have been preserved had
    // it survived — here nothing does
    assert(out(3L) === ((3, 0, "")))
  }

  test("dropFrequentLines: threshold gates removal; first copy goes too") {
    val out = LineDedup.dropFrequentLines(corpus, "doc_id", "text",
        minDocs = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    // header (3 docs) and shared quote (3 docs) removed everywhere
    assert(out(1L) === ((4, 2, "unique a\n")))   // blank line kept
    assert(out(2L) === ((3, 2, "unique b")))
    assert(out(3L) === ((3, 3, "")))
    // at minDocs = 4 nothing qualifies: clean == input
    val none = LineDedup.dropFrequentLines(corpus, "doc_id", "text",
        minDocs = 4)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val orig = corpus.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(none === orig)
  }

  test("custom delimiter is literal, not regex") {
    val docs = Seq((1L, "a.|.b.|.a"), (2L, "a.|.c")).toDF("doc_id", "text")
    val out = LineDedup.keepFirstLines(docs, "doc_id", "text", delim = ".|.")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out(1L) === "a.|.b")                  // second 'a' deduped
    assert(out(2L) === "c")
  }
}
