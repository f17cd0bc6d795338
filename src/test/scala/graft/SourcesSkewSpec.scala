package graft

import java.nio.file.Files

import graft.operators.Skew
import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SourcesSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("partitioned write prunes directories on read") {
    val dir = Files.createTempDirectory("graft_part_").toString
    val df = Seq(("en", 1), ("en", 2), ("fr", 3)).toDF("lang", "v")
    Sources.writePartitioned(df, dir, Seq("lang"))
    val pruned = Sources.readParquet(spark, dir).where(col("lang") === "en")
    assert(pruned.count() === 2)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("lang"), s"expected partition filter in plan:\n$plan")
  }

  test("format round-trip: parquet/csv/json/orc preserve rows") {
    import graft.sources.Sources
    val df = spark.range(100).selectExpr("id", "cast(id * 1.5 as double) as v",
      "concat('s', id) as s")
    val base = java.nio.file.Files.createTempDirectory("graft_fmt_").toString
    Sources.writeParquet(df, s"$base/p")
    Sources.writeCsv(df, s"$base/c")
    Sources.writeJson(df, s"$base/j")
    Sources.writeOrc(df, s"$base/o")
    val expect = df.orderBy("id").collect().map(_.toSeq).toSeq
    assert(Sources.readParquet(spark, s"$base/p").orderBy("id")
      .collect().map(_.toSeq).toSeq === expect)
    assert(Sources.readOrc(spark, s"$base/o").orderBy("id")
      .collect().map(_.toSeq).toSeq === expect)
    // csv/json infer types; compare value-wise after normalizing order
    assert(Sources.readCsv(spark, s"$base/c").orderBy("id")
      .selectExpr("cast(id as bigint)", "cast(v as double)", "s")
      .collect().map(_.toSeq).toSeq === expect)
    assert(Sources.readJson(spark, s"$base/j").orderBy("id")
      .selectExpr("cast(id as bigint)", "cast(v as double)", "s")
      .collect().map(_.toSeq).toSeq === expect)
  }

  test("bucketed tables join without an exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (1 to 100).map(i => (i.toLong, s"a$i")).toDF("k", "va")
      val b = (1 to 100).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
      Sources.writeBucketed(a, "graft_bkt_a", Seq("k"), numBuckets = 4)
      Sources.writeBucketed(b, "graft_bkt_b", Seq("k"), numBuckets = 4)
      val joined = spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), "k")
      assert(joined.count() === 100)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be shuffle-free:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }

  test("bucketed star: orders x lineitem join and order-keyed agg are shuffle-free") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val star = Sources.materializeBucketedStar(
      graft.core.Tables(spark, "/root/testdata/sf0.001"), numBuckets = 4)
    try {
      val joined = star.orders
        .join(star.lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey")).agg(sum(col("l_quantity")).as("q"))
      assert(joined.count() > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed star join+agg should be shuffle-free:\n${plan.take(2000)}")
      // same result as the plain parquet plan
      val t = graft.core.Tables(spark, "/root/testdata/sf0.001")
      val plain = t.orders.join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey")).agg(sum(col("l_quantity")).as("q"))
      assert(joined.as[(Long, Double)].collect().toMap ===
        plain.as[(Long, Double)].collect().toMap)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      star.drop()
    }
  }

  test("salted aggregation equals the plain aggregate") {
    val df = Seq.tabulate(500)(i => (if (i % 10 == 0) "hot" else s"k${i % 7}", i.toDouble))
      .toDF("key", "v")
    val plain = df.groupBy("key").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    val salted = Skew.saltedAggregate(df, Seq("key"), 8,
      partials = Seq("p_s" -> sum(col("v")), "p_n" -> count(lit(1))),
      finals = Seq("s" -> sum(col("p_s")), "n" -> sum(col("p_n"))))
      .as[(String, Double, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(salted === plain)
  }

  test("salted join equals the plain join") {
    val left = Seq.tabulate(200)(i => (i % 5, i)).toDF("k", "lv")
    val right = Seq.tabulate(5)(i => (i, s"r$i")).toDF("k", "rv")
    val plain = left.join(right, "k").select("k", "lv", "rv")
      .as[(Int, Int, String)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(left, right, "k", saltBuckets = 4)
      .select("k", "lv", "rv").as[(Int, Int, String)].collect().sorted.toSeq
    assert(salted === plain)
  }
}
