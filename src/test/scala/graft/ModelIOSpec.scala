package graft

import graft.mlops.ModelIO
import org.scalatest.funsuite.AnyFunSuite

/** Persistence contract: save → load is row-identical (parquet keeps
  * doubles bit-exact) across the deployable model families — OLS
  * coefficient rows, PQ codebooks (array-typed), minhash band indexes,
  * scored-gate weight rows — and load refuses tampered bundles.
  */
class ModelIOSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft_modelio_spec/$name"

  test("tokenizer models round-trip: BPE merge table and unigram vocab") {
    val docs = Seq((1L, "low lower lowest low low"),
      (2L, "new newer newest new")).toDF("doc_id", "text")
    val merges = graft.text.Bpe.learnMerges(docs, "text", merges = 4)
    val vocab = graft.text.Unigram.learn(docs, "text", maxPieceLen = 3,
      seedMultiTopK = 8, emRounds = 1, vocabSize = 20)
    val path = tmp("tokenizers")
    ModelIO.saveBundle(spark, path,
      Map("bpe_merges" -> merges, "unigram_vocab" -> vocab))
    val loaded = ModelIO.loadBundle(spark, path)
    assert(loaded("bpe_merges").collect().toSet ==
      merges.collect().toSet)
    assert(loaded("unigram_vocab").collect().toSet ==
      vocab.collect().toSet)
    // the loaded vocab drives encode identically to the fitted one
    val a = graft.text.Unigram.encodeStats(docs, "doc_id", "text",
      vocab, maxPieceLen = 3).collect().toSet
    val b = graft.text.Unigram.encodeStats(docs, "doc_id", "text",
      loaded("unigram_vocab"), maxPieceLen = 3).collect().toSet
    assert(a == b)
  }

  test("bundle round-trip is row-identical across model families") {
    val ols = Seq((2.513456, -1.000001)).toDF("slope", "intercept")
    val codebook = Seq(
      (0, 1, Seq(0.1, -0.25, 3.5)),
      (1, 2, Seq(1.5, 2.5, -0.125))).toDF("cell", "sub", "centroid")
    val bands = Seq((0, 123456789L, 1L), (1, -987654321L, 2L))
      .toDF("band", "bucket", "doc_id")
    val gate = Seq((0.015625, -2.5, 0.75, 1.0e-7))
      .toDF("w1", "w2", "w3", "w4")
    val parts = Map("ols" -> ols, "pq_codebook" -> codebook,
      "band_index" -> bands, "gate_weights" -> gate)
    val path = tmp("families")
    ModelIO.saveBundle(spark, path, parts)
    val loaded = ModelIO.loadBundle(spark, path)
    assert(loaded.keySet === parts.keySet)
    parts.foreach { case (n, df) =>
      assert(loaded(n).schema.fields.map(f => (f.name, f.dataType.sql)).toSeq ===
        df.schema.fields.map(f => (f.name, f.dataType.sql)).toSeq,
        s"schema of $n")
      val a = df.collect().map(_.toString).sorted.toSeq
      val b = loaded(n).collect().map(_.toString).sorted.toSeq
      assert(a === b, s"rows of part $n")
    }
  }

  test("save is an overwrite: a second bundle fully replaces the first") {
    val path = tmp("overwrite")
    ModelIO.saveBundle(spark, path, Map("m" -> Seq((1L, 2L)).toDF("a", "b")))
    ModelIO.saveBundle(spark, path, Map("m" -> Seq((9L, 8L)).toDF("a", "b")))
    val rows = ModelIO.loadBundle(spark, path)("m")
      .as[(Long, Long)].collect().toSeq
    assert(rows === Seq((9L, 8L)))
  }

  test("saveBundle rejects path-shaped part names and empty bundles") {
    intercept[IllegalArgumentException] {
      ModelIO.saveBundle(spark, tmp("bad"),
        Map("../evil" -> Seq(1).toDF("x")))
    }
    intercept[IllegalArgumentException] {
      ModelIO.saveBundle(spark, tmp("bad"), Map.empty)
    }
  }

  private def committedVersion(path: String): String =
    spark.read.parquet(s"$path/_manifest")
      .select("version").head().getString(0)

  test("loadBundle refuses schema drift behind the manifest's back") {
    val path = tmp("drift")
    ModelIO.saveBundle(spark, path,
      Map("m" -> Seq((1L, 0.5)).toDF("a", "b")))
    Seq(("x", 1)).toDF("a", "c").write.mode("overwrite")
      .parquet(s"$path/${committedVersion(path)}/m")
    intercept[IllegalArgumentException] { ModelIO.loadBundle(spark, path) }
  }

  test("loadBundle refuses content drift: same schema, different rows") {
    val path = tmp("content_drift")
    ModelIO.saveBundle(spark, path,
      Map("m" -> Seq((1L, 0.5)).toDF("a", "b")))
    // schema-identical tamper — the old DDL check alone would accept it
    Seq((2L, 0.25)).toDF("a", "b").write.mode("overwrite")
      .parquet(s"$path/${committedVersion(path)}/m")
    intercept[IllegalArgumentException] { ModelIO.loadBundle(spark, path) }
  }

  test("crash mid-save leaves the previous bundle fully servable") {
    val path = tmp("atomic")
    ModelIO.saveBundle(spark, path,
      Map("m" -> Seq((1L, 2L)).toDF("a", "b"),
          "n" -> Seq((3L, 4L)).toDF("a", "b")))
    // simulate a save that died after writing SOME new parts but
    // before the manifest swap: a stray version dir with one part
    Seq((9L, 9L)).toDF("a", "b").write.mode("overwrite")
      .parquet(s"$path/parts-deadbeef0000/m")
    val loaded = ModelIO.loadBundle(spark, path)
    assert(loaded("m").as[(Long, Long)].collect().toSeq === Seq((1L, 2L)))
    assert(loaded("n").as[(Long, Long)].collect().toSeq === Seq((3L, 4L)))
    // the next committed save GCs the stray version dir
    ModelIO.saveBundle(spark, path,
      Map("m" -> Seq((5L, 6L)).toDF("a", "b")))
    assert(!new java.io.File(s"$path/parts-deadbeef0000").exists())
    assert(ModelIO.loadBundle(spark, path)("m")
      .as[(Long, Long)].collect().toSeq === Seq((5L, 6L)))
  }
}
