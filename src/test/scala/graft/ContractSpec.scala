package graft

import graft.multimodal.Multimodal
import graft.mlops.Composition
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("every oracle key has a query; names are sane") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
    val badBench = SparkEntry.benchNames.toSet.diff(qs)
    assert(badBench.isEmpty, s"bench names without queries: $badBench")
    assert(qs.forall(_.matches("[a-z0-9_]+")))
  }

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("multimodal decode stub: hash is true md5, dims follow contract") {
    val docs = Seq((5L, "hello")).toDF("doc_id", "text")
    val f = Multimodal.decodeStub(Multimodal.toMedia(docs)).head()
    assert(f.content_hash === "5d41402abc4b2a76b9719d911017c592")
    assert(f.n_bytes === 5L && f.width === 69 && f.height === 99 && f.n_frames === 6)
  }

  test("composition: pipeline + grid search pick a fitted model") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .where(col("label") < 3).limit(120)
    val cv = Composition.gridSearchLogistic(emb, "embedding", "label",
      regParams = Seq(0.0, 0.5), numFolds = 2)
    assert(cv.avgMetrics.length === 2)
    assert(cv.bestModel !== null)
  }
}
