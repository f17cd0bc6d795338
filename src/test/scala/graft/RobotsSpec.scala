package graft

import graft.text.Robots
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RobotsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val body =
    """User-agent: badbot
      |Disallow: /
      |
      |User-agent: *
      |Disallow: /img/*.jpg$
      |Allow: /img/
      |Disallow: /search
      |Allow: /search   # comment after a rule
      |Disallow:
      |""".stripMargin

  private def decide(paths: Seq[String], agent: String = "*",
                     robotsBody: String = body): Map[String, (Boolean, String)] = {
    val robots = Seq(("d.com", robotsBody)).toDF("domain", "body")
    val urls = paths.zipWithIndex
      .map { case (p, i) => (i.toLong, "d.com", p) }
      .toDF("id", "domain", "path")
    Robots.decisions(urls, Robots.rules(robots, "domain", "body", agent),
        "id", "domain", "path")
      .collect().map(r => paths(r.getLong(0).toInt) ->
        ((r.getBoolean(3), r.getString(4)))).toMap
  }

  test("longest match wins, allow wins ties, no match allows") {
    val d = decide(Seq("/img/x.jpg", "/img/x.png", "/search", "/other"))
    // /img/*.jpg$ (len 11) beats Allow /img/ (len 5)
    assert(d("/img/x.jpg") === ((false, "/img/*.jpg$")))
    assert(d("/img/x.png") === ((true, "/img/")))
    // same length Allow and Disallow /search: allow wins
    assert(d("/search") === ((true, "/search")))
    assert(d("/other") === ((true, "")))
  }

  test("agent groups: * skips badbot; exact group shadows *") {
    // under badbot the blanket Disallow: / applies
    val b = decide(Seq("/anything"), agent = "badbot")
    assert(b("/anything") === ((false, "/")))
    // exact group SHADOWS the * group (never unioned)
    val shadowed =
      """User-agent: graftbot
        |Allow: /story
        |
        |User-agent: *
        |Disallow: /
        |""".stripMargin
    val g = decide(Seq("/story", "/else"), agent = "graftbot",
      robotsBody = shadowed)
    assert(g("/story") === ((true, "/story")))
    assert(g("/else") === ((true, "")))   // graftbot group has no Disallow
    // RFC 9309: an exact group with ZERO rules still shadows `*`
    // (most specific group governs even when empty => all allowed)
    val emptyExact =
      """User-agent: *
        |Disallow: /
        |
        |User-agent: graftbot
        |""".stripMargin
    val e = decide(Seq("/story", "/else"), agent = "graftbot",
      robotsBody = emptyExact)
    assert(e("/story") === ((true, "")))
    assert(e("/else") === ((true, "")))
    // ...while an agent with no exact group still gets the `*` rules
    val s2 = decide(Seq("/story"), agent = "otherbot",
      robotsBody = emptyExact)
    assert(s2("/story") === ((false, "/")))
  }

  test("$ anchors, literal _ is not a wildcard, empty Disallow no-op") {
    val anchored =
      """User-agent: *
        |Disallow: /exact$
        |Disallow: /a_b
        |""".stripMargin
    val d = decide(Seq("/exact", "/exact/more", "/a_b/c", "/axb"),
      robotsBody = anchored)
    assert(d("/exact") === ((false, "/exact$")))
    assert(d("/exact/more") === ((true, "")))
    assert(d("/a_b/c") === ((false, "/a_b")))
    assert(d("/axb") === ((true, "")))    // _ must not match 'x'
  }
}
