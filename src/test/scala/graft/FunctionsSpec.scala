package graft

import graft.functions.GraftFunctions._
import graft.plans.GraftExpressions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("md5Long matches known md5 prefix") {
    // md5("hello") = 5d41402a... -> 0x5d41402a = 1564557354
    val v = Seq("hello").toDF("s")
      .select(md5Long(col("s"), 8).as("h")).head.getLong(0)
    assert(v === 0x5d41402aL)
  }

  test("rollingHash folds left with first element as seed, mod 1e9+7") {
    val v = Seq(Seq(5L, 7L, 11L)).toDF("a")
      .select(rollingHash(col("a")).as("h")).head.getLong(0)
    // ((5*31+7)%p)*31+11 = 162*31+11 = 5033
    assert(v === 5033L)
    val empty = Seq(Seq.empty[Long]).toDF("a")
      .select(rollingHash(col("a")).as("h")).head
    assert(empty.isNullAt(0))
  }

  test("dot/cosine/sqDist basic algebra") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
    val r = df.select(
      dot(col("a"), col("b")).as("d"),
      sqDist(col("a"), col("b")).as("s"),
      cosine(col("a"), col("a")).as("self")).head
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 8.0)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("native DotProduct expression equals HOF dot, interpreted and codegen") {
    GraftExpressions.register(spark)
    val df = Seq((Seq(1.5, -2.0, 0.5), Seq(2.0, 1.0, -4.0))).toDF("a", "b")
    val r = df.select(
      GraftExpressions.dot(col("a"), col("b")).as("native"),
      dot(col("a"), col("b")).as("hof")).head
    assert(r.getDouble(0) === r.getDouble(1))
    assert(r.getDouble(0) === (3.0 - 2.0 - 2.0))
  }

  test("native CosineSimilarity equals HOF cosine on float arrays") {
    GraftExpressions.register(spark)
    val df = Seq((Seq(1.0f, 2.0f, -0.5f), Seq(0.5f, -1.0f, 2.0f))).toDF("a", "b")
    val r = df.select(
      GraftExpressions.cosine(col("a"), col("b")).as("native"),
      cosine(col("a"), col("b")).as("hof")).head
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
    val self = df.select(GraftExpressions.cosine(col("a"), col("a"))).head.getDouble(0)
    assert(math.abs(self - 1.0) < 1e-12)
  }

  test("native L2DistSq and NearestCell: exact distances, argmin ties to lowest cell") {
    GraftExpressions.register(spark)
    val df = Seq((Seq(1.0, 2.0), Seq(4.0, 6.0))).toDF("a", "b")
    assert(df.select(GraftExpressions.l2sq(col("a"), col("b")))
      .head.getDouble(0) === 25.0) // 9 + 16
    // cells: 7 at distance 25, 3 and 5 tied at distance 2 -> lowest id 3
    val cells = Seq((
      Seq(1.0, 2.0),
      Seq((7L, Seq(4.0, 6.0)), (5L, Seq(2.0, 3.0)), (3L, Seq(0.0, 1.0)))
    )).toDF("v", "cells")
    assert(cells.select(GraftExpressions.nearestCell(col("v"), col("cells")))
      .head.getLong(0) === 3L)
    // codegen and interpreted agree (whole-stage on a filter chain)
    val n = cells.where(
      GraftExpressions.nearestCell(col("v"), col("cells")) === 3L).count()
    assert(n === 1L)
  }

  test("native Md5SeedHashes equals the declarative seededHash family") {
    GraftExpressions.register(spark)
    val df = Seq("the quick brown fox", "a", "", "héllo wörld").toDF("s")
    val declared = (0 until 8).map(h => seededHash(col("s"), h).as(s"d$h"))
    val rows = df.select(
      GraftExpressions.md5SeedHashes(col("s"), lit(8)).as("native") +:
        declared: _*).collect()
    rows.foreach { r =>
      val native = r.getSeq[Long](0)
      (0 until 8).foreach { h => assert(native(h) === r.getLong(h + 1)) }
    }
  }

  test("native Md5PrefixLong equals the declarative md5Long at every width") {
    GraftExpressions.register(spark)
    val df = Seq("the quick brown fox", "a", "", "héllo wörld",
      "shingle with spaces and 123").toDF("s")
    (1 to 15).foreach { n =>
      val rows = df.select(
        GraftExpressions.md5PrefixLong(col("s"), lit(n)).as("native"),
        md5Long(col("s"), n).as("declared")).collect()
      rows.foreach(r => assert(r.getLong(0) === r.getLong(1), s"nHex=$n"))
    }
  }

  test("unitize produces unit-norm vectors") {
    val n = Seq(Seq(3.0f, 4.0f)).toDF("a")
      .select(l2Norm(unitize(col("a"))).as("n")).head.getDouble(0)
    assert(math.abs(n - 1.0) < 1e-12)
  }
}
