package graft

import graft.dedup.SuffixRank
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SuffixRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def toksDf(toks: Seq[String]) =
    toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("pos", "tok")

  /** Reference: rank suffixes by in-memory sort of the token sequences
    * (Ordering.Implicits gives lexicographic Seq ordering with
    * shorter-prefix-first, matching the operator's contract).
    */
  private def refRanks(toks: Seq[String]): Map[Long, Long] = {
    import scala.math.Ordering.Implicits._
    val order = toks.indices.sortBy(i => toks.drop(i).toSeq)
    order.zipWithIndex.map { case (pos, r) => (pos.toLong, (r + 1).toLong) }.toMap
  }

  test("banana: classic suffix ranks") {
    val toks = "b a n a n a".split(" ").toSeq
    val got = SuffixRank.suffixRanks(toksDf(toks), "pos", "tok")
      .as[(Long, Long)].collect().toMap
    // suffixes sorted: a(5) ana(3) anana(1) banana(0) na(4) nana(2)
    assert(got === Map(5L -> 1L, 3L -> 2L, 1L -> 3L, 0L -> 4L, 4L -> 5L, 2L -> 6L))
  }

  test("suffixArray is the inverse permutation of the ranks") {
    val toks = "b a n a n a".split(" ").toSeq
    val sa = SuffixRank.suffixArray(toksDf(toks), "pos", "tok")
      .as[(Long, Long)].collect().toMap
    assert(sa === Map(1L -> 5L, 2L -> 3L, 3L -> 1L, 4L -> 0L, 5L -> 4L, 6L -> 2L))
  }

  test("randomized stream matches in-memory suffix sort") {
    val rnd = new scala.util.Random(7)
    // small alphabet forces deep shared prefixes — many doubling rounds
    val toks = Seq.fill(257)("w" + rnd.nextInt(3))
    val got = SuffixRank.suffixRanks(toksDf(toks), "pos", "tok")
      .as[(Long, Long)].collect().toMap
    assert(got === refRanks(toks))
  }

  test("all-equal tokens: ranks ordered by suffix length") {
    val toks = Seq.fill(17)("x")
    val got = SuffixRank.suffixRanks(toksDf(toks), "pos", "tok")
      .as[(Long, Long)].collect().toMap
    // shortest suffix (last position) sorts first
    assert(got === (0 until 17).map(i => (i.toLong, (17 - i).toLong)).toMap)
  }

  test("empty stream yields empty result") {
    val empty = Seq.empty[(Long, String)].toDF("pos", "tok")
    assert(SuffixRank.suffixRanks(empty, "pos", "tok").count() === 0)
  }
}
