package graft.packs

import graft.QueryPack
import graft.core.Tables
import graft.feature.TextPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text feature extraction (SURVEY §2.2, F1–F7): count-vectorizer
  * vocabulary + transform, hashing vectorizer, tf-idf fit/transform, and
  * dict-vectorizer — each as a declarative aggregation plan (the reference's
  * per-block sklearn + driver merge becomes partial/final hash aggregation).
  *
  * Tokenization contract: corpus text is single-space separated lowercase
  * terms, so `split(text, ' ')` is exact on both engines.
  */
object TextFeatureQueries extends QueryPack {

  private def toks(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))

  /** Flagship: corpus-level tf-idf top terms. Exercises the full relational
    * spine: scan → generator → two aggregations → join → sort → limit.
    */
  def flagshipTfidf(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val stats = toks(s, dir)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
    val n = t.documents.agg(count(lit(1)).as("n_docs"))
    stats.crossJoin(n)
      .select(
        col("term"), col("tf"), col("df"),
        round(log((lit(1.0) + col("n_docs")) / (lit(1.0) + col("df"))) + lit(1.0), 6)
          .as("idf"),
        round(col("tf") *
          (log((lit(1.0) + col("n_docs")) / (lit(1.0) + col("df"))) + lit(1.0)), 4)
          .as("tfidf"))
      .orderBy(col("tfidf").desc, col("term"))
      .limit(20)
  }

  val queries: Map[String, Q] = Map(
    "flagship_tfidf" -> (flagshipTfidf _),

    // F1: CountVectorizer.fit — global vocabulary with deterministic
    // sort-based indices (reference: per-block set union + driver sort,
    // splearn/feature_extraction/text.py:~L30).
    "f1_countvec_vocab" -> ((s, dir) => {
      toks(s, dir)
        .groupBy(col("term"))
        .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("tf"))
        .withColumn("term_idx",
          (row_number().over(Window.orderBy(col("term"))) - 1).cast("long"))
        .select(col("term_idx"), col("term"), col("df"), col("tf"))
        .orderBy(col("term_idx"))
    }),

    // F1b: CountVectorizer cap semantics (reference min_df/max_df/
    // max_features, splearn/feature_extraction/text.py:~L30-120), pinned
    // deterministically: keep df >= 2 and df <= 0.8·n_docs, rank by
    // (tf desc, term asc), cap at 100. The top-k is orderBy+limit
    // (TakeOrdered — distributed), and the index window runs over only
    // the capped 100 rows, so no global sort over the full vocabulary.
    "f8_countvec_caps" -> ((s, dir) => {
      val stats = toks(s, dir)
        .groupBy(col("term"))
        .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("tf"))
      val nDocs = Tables(s, dir).documents.agg(count(lit(1)).as("_n"))
      val top = stats.crossJoin(broadcast(nDocs))
        .where(col("df") >= 2 && col("df") <= col("_n") * 0.8)
        .orderBy(col("tf").desc, col("term"))
        .limit(100)
      top.withColumn("term_idx",
          (row_number().over(Window.orderBy(col("tf").desc, col("term"))) - 1)
            .cast("long"))
        .select(col("term_idx"), col("term"), col("df"), col("tf"))
        .orderBy(col("term_idx"))
    }),

    // F2: CountVectorizer.transform — sparse (doc, term_idx, count) triples.
    "f2_countvec_transform" -> ((s, dir) => {
      val vocab = toks(s, dir).select(col("term")).distinct()
        .withColumn("term_idx",
          (row_number().over(Window.orderBy(col("term"))) - 1).cast("long"))
      toks(s, dir)
        .where(col("doc_id") < 50)
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("cnt"))
        .join(broadcast(vocab), "term")
        .select(col("doc_id"), col("term_idx"), col("cnt"))
        .orderBy(col("doc_id"), col("term_idx"))
    }),

    // F3: HashingVectorizer — stateless bucketed term counts. The oracle
    // pins the engine-portable md5-prefix hash (murmur3 `HashingTF` is the
    // ml-pipeline variant; bit-compat with sklearn is a non-goal).
    "f3_hashing_tf" -> ((s, dir) => {
      toks(s, dir)
        .where(col("doc_id") < 50)
        .withColumn("bucket",
          pmod(conv(substring(md5(col("term")), 1, 8), 16, 10).cast("long"), lit(64L)))
        .groupBy(col("doc_id"), col("bucket"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("doc_id"), col("bucket"))
    }),

    // F4: TfidfTransformer.fit — smoothed idf per term (sklearn formula
    // log((1+n)/(1+df))+1, splearn/feature_extraction/text.py:~L200).
    "f4_idf" -> ((s, dir) => {
      val t = Tables(s, dir)
      val n = t.documents.agg(count(lit(1)).as("n_docs"))
      toks(s, dir)
        .groupBy(col("term"))
        .agg(countDistinct(col("doc_id")).as("df"))
        .crossJoin(n)
        .select(col("term"), col("df"),
          round(log((lit(1.0) + col("n_docs")) / (lit(1.0) + col("df"))) + lit(1.0), 6)
            .as("idf"))
        .orderBy(col("term"))
    }),

    // F5: TfidfTransformer.transform with L2 norm — tf*idf then row-normalize
    // via a per-doc window (the reference normalized inside each block).
    "f5_tfidf_transform" -> ((s, dir) => {
      val t = Tables(s, dir)
      val n = t.documents.agg(count(lit(1)).as("n_docs"))
      val dfPerTerm = toks(s, dir)
        .groupBy(col("term"))
        .agg(countDistinct(col("doc_id")).as("df"))
      val w = Window.partitionBy(col("doc_id"))
      toks(s, dir)
        .where(col("doc_id") < 20)
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
        .join(broadcast(dfPerTerm), "term")
        .crossJoin(n)
        .withColumn("wgt",
          col("tf") *
            (log((lit(1.0) + col("n_docs")) / (lit(1.0) + col("df"))) + lit(1.0)))
        .withColumn("nrm", sqrt(sum(col("wgt") * col("wgt")).over(w)))
        .select(col("doc_id"), col("term"), col("tf"),
          round(col("wgt") / col("nrm"), 6).as("tfidf_l2"))
        .orderBy(col("doc_id"), col("term"))
    }),

    // F6: DictVectorizer.fit — deterministic feature indexing over the
    // event_type key space (reference: union of dict keys + driver sort,
    // splearn/feature_extraction/dict_vectorizer.py:~L10).
    "f6_dict_features" -> ((s, dir) => {
      Tables(s, dir).events
        .select(col("event_type").as("feature")).distinct()
        .withColumn("feature_idx",
          (row_number().over(Window.orderBy(col("feature"))) - 1).cast("long"))
        .select(col("feature_idx"), col("feature"))
        .orderBy(col("feature_idx"))
    }),

    // F7: DictVectorizer.transform — (user, feature) value matrix in sparse
    // triple form.
    "f7_dict_transform" -> ((s, dir) => {
      val features = Tables(s, dir).events
        .select(col("event_type").as("feature")).distinct()
        .withColumn("feature_idx",
          (row_number().over(Window.orderBy(col("feature"))) - 1).cast("long"))
      Tables(s, dir).events
        .groupBy(col("user_id"), col("event_type"))
        .agg(round(sum(col("value")), 2).as("sum_value"),
          count(lit(1)).as("n"))
        .join(broadcast(features), col("event_type") === col("feature"))
        .select(col("user_id"), col("feature_idx"), col("sum_value"), col("n"))
        .orderBy(col("user_id"), col("feature_idx"))
    }),

    // F6b: DictVectorizer over a true MAP column — `props` JSON parsed to
    // map<string,double>, features = exploded map entries (the reference's
    // dict-of-number rows, splearn/feature_extraction/dict_vectorizer.py).
    "dict_map_features" -> ((s, dir) => {
      Tables(s, dir).events
        .select(col("event_id"),
          explode(from_json(col("props"), lit("map<string,double>")))
            .as(Seq("feature", "fval")))
        .groupBy(col("feature"))
        .agg(count(lit(1)).as("n"), round(sum(col("fval")), 2).as("sum_val"))
        .orderBy(col("feature"))
    }),

    // P1 ml.Pipeline end-to-end: RegexTokenizer → CountVectorizer → IDF
    // → L2-Normalizer. The fitted vocabulary's ORDER is count-desc with
    // arbitrary ties, so the hash-checked outputs are the per-doc
    // PERMUTATION-INVARIANT scalars of the raw tf·idf vector — non-zero
    // count and L2 norm — which the oracle recomputes from ml's exact
    // IDF formula idf = ln((m+1)/(df+1)). (Graduated from rows-only;
    // terms present in every doc get idf 0 and drop out of nnz on both
    // sides.)
    "ml_tfidf_pipeline" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      val model = TextPipeline.fitTfidf(docs, vocabSize = 4096)
      val toNnz = udf((v: org.apache.spark.ml.linalg.Vector) => v.numNonzeros)
      val toNorm = udf((v: org.apache.spark.ml.linalg.Vector) =>
        math.sqrt(v.toArray.map(x => x * x).sum))
      model.transform(docs)
        .select(col("doc_id"),
          toNnz(col("tfidf_raw")).as("nnz"),
          (round(toNorm(col("tfidf_raw")), 4) + lit(0.0)).as("l2_norm"))
        .orderBy(col("doc_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "flagship_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |stats AS (
        |  SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
        |  FROM toks GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT term, tf, df,
        |  round(ln((1.0 + n_docs) / (1.0 + df)) + 1.0, 6) AS idf,
        |  round(tf * (ln((1.0 + n_docs) / (1.0 + df)) + 1.0), 4) AS tfidf
        |FROM stats, n
        |ORDER BY tfidf DESC, term
        |LIMIT 20""".stripMargin,

    "f1_countvec_vocab" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        |SELECT CAST(row_number() OVER (ORDER BY term) - 1 AS BIGINT) AS term_idx,
        |  term, df, tf
        |FROM (SELECT term, count(DISTINCT doc_id) AS df, count(*) AS tf
        |      FROM toks GROUP BY term) v
        |ORDER BY term_idx""".stripMargin,

    "f8_countvec_caps" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |stats AS (
        |  SELECT term, count(DISTINCT doc_id) AS df, count(*) AS tf
        |  FROM toks GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |filtered AS (
        |  SELECT * FROM stats
        |  WHERE df >= 2 AND df <= 0.8 * (SELECT n_docs FROM n)),
        |ranked AS (
        |  SELECT term, df, tf,
        |    row_number() OVER (ORDER BY tf DESC, term) - 1 AS rn
        |  FROM filtered)
        |SELECT CAST(rn AS BIGINT) AS term_idx, term, df, tf
        |FROM ranked WHERE rn < 100
        |ORDER BY term_idx""".stripMargin,

    "f2_countvec_transform" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |vocab AS (
        |  SELECT term, CAST(row_number() OVER (ORDER BY term) - 1 AS BIGINT) AS term_idx
        |  FROM (SELECT DISTINCT term FROM toks) d)
        |SELECT t.doc_id, v.term_idx, count(*) AS cnt
        |FROM toks t JOIN vocab v ON t.term = v.term
        |WHERE t.doc_id < 50
        |GROUP BY t.doc_id, v.term_idx
        |ORDER BY doc_id, term_idx""".stripMargin,

    "f3_hashing_tf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        |SELECT doc_id,
        |  ('0x' || substr(md5(term), 1, 8))::BIGINT % 64 AS bucket,
        |  count(*) AS cnt
        |FROM toks WHERE doc_id < 50
        |GROUP BY doc_id, bucket
        |ORDER BY doc_id, bucket""".stripMargin,

    "f4_idf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT term, count(DISTINCT doc_id) AS df,
        |  round(ln((1.0 + (SELECT n_docs FROM n)) / (1.0 + count(DISTINCT doc_id))) + 1.0, 6) AS idf
        |FROM toks GROUP BY term
        |ORDER BY term""".stripMargin,

    "f5_tfidf_transform" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |tfs AS (SELECT doc_id, term, count(*) AS tf
        |        FROM toks WHERE doc_id < 20 GROUP BY doc_id, term),
        |wgt AS (
        |  SELECT t.doc_id, t.term, t.tf,
        |    t.tf * (ln((1.0 + (SELECT n_docs FROM n)) / (1.0 + d.df)) + 1.0) AS w
        |  FROM tfs t JOIN dfs d ON t.term = d.term)
        |SELECT doc_id, term, tf,
        |  round(w / sqrt(sum(w * w) OVER (PARTITION BY doc_id)), 6) AS tfidf_l2
        |FROM wgt
        |ORDER BY doc_id, term""".stripMargin,

    "dict_map_features" ->
      """SELECT feature, count(*) AS n, round(sum(v), 2) AS sum_val FROM (
        |  SELECT unnest(json_keys(props::JSON)) AS feature,
        |    CAST(json_extract_string(props, '$.' ||
        |           unnest(json_keys(props::JSON))) AS DOUBLE) AS v
        |  FROM events) t
        |GROUP BY feature
        |ORDER BY feature""".stripMargin,

    "f6_dict_features" ->
      """SELECT CAST(row_number() OVER (ORDER BY feature) - 1 AS BIGINT) AS feature_idx,
        |  feature
        |FROM (SELECT DISTINCT event_type AS feature FROM events) d
        |ORDER BY feature_idx""".stripMargin,

    "f7_dict_transform" ->
      """WITH features AS (
        |  SELECT feature, CAST(row_number() OVER (ORDER BY feature) - 1 AS BIGINT) AS feature_idx
        |  FROM (SELECT DISTINCT event_type AS feature FROM events) d)
        |SELECT user_id, feature_idx, round(sum(value), 2) AS sum_value, count(*) AS n
        |FROM events e JOIN features f ON e.event_type = f.feature
        |GROUP BY user_id, feature_idx
        |ORDER BY user_id, feature_idx""".stripMargin,

    // Permutation-invariant per-doc scalars of the raw tf·idf vector,
    // with ml's exact IDF smoothing ln((m+1)/(df+1)). nnz excludes
    // idf=0 terms (df=m) — ln(1)=0 exactly in both engines.
    "ml_tfidf_pipeline" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
        |       WHERE term <> '' GROUP BY doc_id, term),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
        |m AS (SELECT count(*) AS m FROM documents),
        |w AS (SELECT tf.doc_id,
        |        tf.tf * ln((m.m + 1.0) / (df.df + 1.0)) AS wgt
        |      FROM tf JOIN df USING (term) CROSS JOIN m)
        |SELECT d.doc_id,
        |  CAST(coalesce(sum(CASE WHEN w.wgt <> 0 THEN 1 ELSE 0 END), 0) AS INT)
        |    AS nnz,
        |  round(coalesce(sqrt(sum(w.wgt * w.wgt)), 0.0), 4) + 0.0 AS l2_norm
        |FROM documents d LEFT JOIN w ON w.doc_id = d.doc_id
        |GROUP BY d.doc_id
        |ORDER BY d.doc_id""".stripMargin
  )
}
