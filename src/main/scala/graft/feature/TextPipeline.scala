package graft.feature

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.feature.{CountVectorizer, HashingTF, IDF, Normalizer, RegexTokenizer}
import org.apache.spark.sql.DataFrame

/** spark.ml text-vectorization pipelines — the engine's equivalent of the
  * reference's `SparkCountVectorizer` / `SparkHashingVectorizer` /
  * `SparkTfidfTransformer` (`splearn/feature_extraction/text.py:~L30-270`).
  *
  * The reference built a global vocabulary by unioning per-block sklearn
  * vocabularies on the driver — unbounded driver state. Here
  * `CountVectorizer` aggregates term counts distributively and caps the
  * vocabulary (`vocabSize`), which is the 100 TB-safe contract: driver
  * memory is O(vocabSize), never O(corpus).
  *
  * Hash compatibility with sklearn's murmur3 is a non-goal (SURVEY §7);
  * Spark's `HashingTF` murmur3 is documented as the engine's hash.
  */
object TextPipeline {

  /** tokenize -> count-vectorize -> idf -> l2 normalize. */
  def tfidfPipeline(
      inputCol: String = "text",
      vocabSize: Int = 1 << 18,
      minDF: Double = 1.0): Pipeline = {
    val tok = new RegexTokenizer()
      .setInputCol(inputCol).setOutputCol("tokens")
      .setPattern("\\s+")
    val cv = new CountVectorizer()
      .setInputCol("tokens").setOutputCol("tf")
      .setVocabSize(vocabSize).setMinDF(minDF)
    val idf = new IDF().setInputCol("tf").setOutputCol("tfidf_raw")
    val norm = new Normalizer().setInputCol("tfidf_raw").setOutputCol("tfidf").setP(2.0)
    new Pipeline().setStages(Array(tok, cv, idf, norm))
  }

  /** Stateless hashing variant (reference `SparkHashingVectorizer`):
    * no fitted vocabulary, fixed feature space, fit == identity — the
    * property that made it the reference's streaming-friendly vectorizer.
    */
  def hashingTfidfPipeline(
      inputCol: String = "text",
      numFeatures: Int = 1 << 18): Pipeline = {
    val tok = new RegexTokenizer()
      .setInputCol(inputCol).setOutputCol("tokens")
      .setPattern("\\s+")
    val htf = new HashingTF()
      .setInputCol("tokens").setOutputCol("tf").setNumFeatures(numFeatures)
    val idf = new IDF().setInputCol("tf").setOutputCol("tfidf")
    new Pipeline().setStages(Array(tok, htf, idf))
  }

  def fitTfidf(docs: DataFrame, vocabSize: Int = 1 << 18): PipelineModel =
    tfidfPipeline(vocabSize = vocabSize).fit(docs)
}
