package graft

import graft.text.Html
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computable fixtures for HTML extraction; corpus-scale behavior
  * is pinned by the `html_*` oracles.
  */
class HtmlSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def strip(html: String): String = {
    val df = Seq((1L, html)).toDF("doc_id", "page")
    Html.extractText(df, "doc_id", "page").collect()(0).getString(2)
  }

  test("stripTags: scripts, styles, comments, tags, entities, spacing") {
    assert(strip("<p>a</p> <p>b</p>") === "a b")
    assert(strip("<script>var x = '<p>not text</p>';</script>real") === "real")
    assert(strip("<style>p { display: none }</style>shown") === "shown")
    assert(strip("x<!-- hidden <b>bold</b> -->y") === "x y")
    assert(strip("2 &lt; 3 &amp;&amp; 4 &gt; 1") === "2 < 3 && 4 > 1")
    // &amp; decodes LAST: a literal "&lt;" written as &amp;lt; survives
    assert(strip("&amp;lt;") === "&lt;")
    assert(strip("a&nbsp;&nbsp;b\t\nc") === "a b c")
    assert(strip("&copy; 2024 &quot;q&quot; &#39;s&#39;") === "(c) 2024 \"q\" 's'")
  }

  test("textBlocks: boundaries, stable positions, link density") {
    val page = "<div><a href='/'>Home</a> <a href='/a'>About</a></div>" + // dens 9/10
      "<p>plain prose with no links at all here</p>" +
      "<script>fake('</div>');</script>" +                // must NOT split
      "<p>body text and <a href='/n'>a link</a></p>"      // dens 6/16
    val b = Html.textBlocks(Seq((1L, page)).toDF("doc_id", "page"),
        "doc_id", "page")
      .orderBy(col("pos"))
      .collect().map(r => (r.getInt(1), r.getString(2), r.getInt(3),
        r.getDouble(4)))
    assert(b.length === 3)
    assert(b(0) === ((0, "Home About", 2, 0.9)))
    assert(b(1) === ((1, "plain prose with no links at all here", 8, 0.0)))
    // script dropped BEFORE split: its </div> does not open a new slot
    assert(b(2) === ((2, "body text and a link", 5, 6.0 / 20)))
  }

  test("mainContent: keep rule, order, all-boilerplate page") {
    val good = "<p>one two three four five six</p>" +
      "<div><a href='/'>Home</a></div>" +
      "<p>seven eight nine ten eleven twelve</p>"
    val chrome = "<div><a href='/'>Home</a> <a href='/b'>B</a></div>"
    val out = Html.mainContent(
        Seq((1L, good), (2L, chrome)).toDF("doc_id", "page"),
        "doc_id", "page", minWords = 5, maxLinkDensity = 0.33)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(out(1L) === ((3, 2,
      "one two three four five six\nseven eight nine ten eleven twelve")))
    assert(out(2L) === ((1, 0, "")))
  }

  test("anchor inner markup is stripped before density counting") {
    val page = "<p>words words words words <a href='/x'><b>go</b> now</a></p>"
    val r = Html.textBlocks(Seq((1L, page)).toDF("doc_id", "page"),
      "doc_id", "page").collect()(0)
    assert(r.getString(2) === "words words words words go now")
    assert(r.getDouble(4) === 6.0 / 30)   // "go now" = 6 chars, no tags
  }
}
