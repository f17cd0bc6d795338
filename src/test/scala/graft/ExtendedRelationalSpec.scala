package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExtendedRelationalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("deterministic sample: stable, subset, near target rate") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val s1 = Sampling.deterministicSample(docs, col("doc_id"), 20)
    val s2 = Sampling.deterministicSample(
      docs.repartition(7), col("doc_id"), 20) // other partitioning, same sample
    val ids1 = s1.select("doc_id").as[Long].collect().sorted.toSeq
    val ids2 = s2.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 === ids2)
    val n = docs.count().toDouble
    assert(math.abs(ids1.size / n - 0.20) < 0.10, s"rate ${ids1.size / n}")
    // widening the gate keeps the narrower sample (nested samples)
    val wider = Sampling.deterministicSample(docs, col("doc_id"), 50)
      .select("doc_id").as[Long].collect().toSet
    assert(ids1.forall(wider.contains))
  }

  test("stratified sample: per-stratum rates, zero-rate stratum empty") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val strat = Sampling.stratifiedSample(docs, col("doc_id"), col("lang"),
      Map("en" -> 100, "de" -> 0))
    val langs = strat.select("lang").distinct().as[String].collect().toSet
    assert(langs.contains("en") && !langs.contains("de"))
    val enTotal = docs.where(col("lang") === "en").count()
    assert(strat.where(col("lang") === "en").count() === enTotal)
  }

  test("approx_percentile (the 100TB path) tracks exact percentiles within 1%") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val row = li.select(
      expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.95))").as("exact"),
      expr("approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.95), 10000)")
        .as("approx"))
      .head()
    val exact = row.getSeq[Double](0)
    val approx = row.getSeq[Double](1)
    exact.zip(approx).foreach { case (e, a) =>
      assert(math.abs(a - e) / e < 0.01, s"approx $a vs exact $e")
    }
  }

  test("ml pipeline save/load round-trip preserves the transform") {
    import graft.feature.TextPipeline
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val model = TextPipeline.fitTfidf(docs, vocabSize = 1024)
    val dir = java.nio.file.Files.createTempDirectory("graft_model_").toString
    model.write.overwrite().save(dir)
    val loaded = org.apache.spark.ml.PipelineModel.load(dir)
    val toNorm = udf((v: org.apache.spark.ml.linalg.Vector) =>
      BigDecimal(math.sqrt(v.toArray.map(x => x * x).sum))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    def norms(m: org.apache.spark.ml.PipelineModel) =
      m.transform(docs).select(col("doc_id"), toNorm(col("tfidf")).as("n"))
        .as[(Long, Double)].collect().toMap
    assert(norms(loaded) === norms(model))
  }

  test("pivot/unpivot round-trip recovers the long form") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val long = orders.groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(round(sum(col("o_totalprice")), 2).as("total"))
    val wide = orders.groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(round(sum(col("o_totalprice")), 2))
    val back = wide.unpivot(
      Array(col("o_orderpriority")),
      Array(col("F"), col("O"), col("P")),
      "o_orderstatus", "total")
    assert(back.as[(String, String, Double)].collect().toSet ===
      long.as[(String, String, Double)].collect().toSet)
  }
}
