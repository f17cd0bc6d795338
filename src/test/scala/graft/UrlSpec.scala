package graft

import graft.text.Urls
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** URL curation unit tests: canonicalization paths, registered-domain
  * suffix logic, and the salted per-domain cap's equivalence to the
  * plain single-window top-N.
  */
class UrlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[String] = {
    val df = urls.zipWithIndex.map { case (u, i) => (i, u) }.toDF("i", "u")
    df.select(col("i"), Urls.canonicalizeUrl(col("u")).as("c"))
      .orderBy(col("i")).as[(Int, String)].collect().map(_._2).toSeq
  }

  test("canonicalizeUrl: case, www, ports, fragment, tracking, sort, slash") {
    assert(canon(
      "HTTP://WWW.Example.COM:80/a/1/",
      "https://news.example.co.uk/story?utm_source=tw&b=2&a=1#frag",
      "https://cdn.example.com:8443/img/9.jpg",
      "http://blog.github.io/?fbclid=xyz&id=7",
      "https://Example.com/search?q=spark&UTM_campaign=x&ref=hp",
      "not a url",
      "https://shop.example.com.au:443/p/3//",
      "http://example.org/a?z=9&y=8&x=7") === Seq(
      "http://example.com/a/1",
      "https://news.example.co.uk/story?a=1&b=2",
      "https://cdn.example.com:8443/img/9.jpg",
      "http://blog.github.io?id=7",
      "https://example.com/search?q=spark",
      "",
      "https://shop.example.com.au/p/3",
      "http://example.org/a?x=7&y=8&z=9"))
    // idempotence: canonicalizing a canonical URL is a no-op
    val once = canon("HTTP://WWW.Example.COM:80/a/1/?utm_x=1&b=2&a=1#f")
    assert(canon(once.head) === once)
    // a query that is ALL tracking params drops its '?' entirely
    assert(canon("https://a.com/x?utm_a=1&utm_b=2") === Seq("https://a.com/x"))
    // '=' -less params survive and sort; value case is preserved
    assert(canon("https://a.com/x?beta&Alpha=Q") ===
      Seq("https://a.com/x?Alpha=Q&beta"))
  }

  test("registeredDomain: plain, multi-label suffix, PSL-private, short hosts") {
    val df = Seq(
      "deep.sub.example.com", "example.com", "a.b.co.uk", "b.co.uk",
      "co.uk", "blog.github.io", "localhost", "shop.example.com.au")
      .zipWithIndex.map { case (h, i) => (i, h) }.toDF("i", "h")
    val out = df.select(col("i"),
        Urls.registeredDomain(col("h")).as("d"))
      .orderBy(col("i")).as[(Int, String)].collect().map(_._2).toSeq
    // co.uk alone has only 2 labels -> n >= 3 guard leaves it whole
    assert(out === Seq("example.com", "example.com", "b.co.uk", "b.co.uk",
      "co.uk", "blog.github.io", "localhost", "example.com.au"))
  }

  test("perDomainCap: salted two-phase equals the plain window, cap honored") {
    val rnd = new scala.util.Random(11)
    // one hot domain (600 rows), several cold ones — the shape the salt
    // split exists for
    val rows = (0 until 600).map(i => (i.toLong, "hot.com", rnd.nextInt(1000))) ++
      (600 until 650).map(i => (i.toLong, s"cold${i % 7}.org", rnd.nextInt(1000)))
    val df = rows.toDF("id", "domain", "score")
    val capped = Urls.perDomainCap(df, col("domain"),
      Seq(col("score").desc, col("id").asc), col("id"), cap = 10, salts = 8)
    val got = capped.select("id", "domain", "domain_rank")
      .as[(Long, String, Int)].collect().toSet
    // plain single-window twin
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("domain"))
      .orderBy(col("score").desc, col("id").asc)
    val want = df.withColumn("domain_rank", row_number().over(w))
      .where(col("domain_rank") <= 10)
      .select("id", "domain", "domain_rank")
      .as[(Long, String, Int)].collect().toSet
    assert(got === want)
    assert(got.count(_._2 == "hot.com") === 10)
    // salts=1 degenerates to the plain window exactly
    val one = Urls.perDomainCap(df, col("domain"),
      Seq(col("score").desc, col("id").asc), col("id"), cap = 10, salts = 1)
      .select("id", "domain", "domain_rank")
      .as[(Long, String, Int)].collect().toSet
    assert(one === want)
    // under-cap domains pass through whole
    assert(got.count(_._2 == "cold0.org") ===
      rows.count(_._2 == "cold0.org"))
  }
}
