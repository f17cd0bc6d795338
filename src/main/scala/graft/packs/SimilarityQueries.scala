package graft.packs

import graft.QueryPack
import graft.core.Tables
import graft.similarity.Similarity
import org.apache.spark.sql.functions._

/** Similarity search (north-star extension): exact brute-force cosine
  * top-k baseline + deterministic sign-LSH scale path.
  */
object SimilarityQueries extends QueryPack {

  private def bucketSql(arr: String, nBits: Int): String =
    (0 until nBits).map(j =>
      s"CASE WHEN $arr[${j + 1}] > 0 THEN ${1L << j} ELSE 0 END")
      .mkString("(", " + ", ")")

  val queries: Map[String, Q] = Map(
    // Exact top-5 neighbors for the first 10 query vectors.
    "sim_topk_bruteforce" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings
      Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 10),
        "vec_id", "embedding", k = 5)
        .orderBy(col("query_id"), col("rnk"))
    }),

    // Sign-LSH bucket histogram (deterministic random-projection buckets).
    "sim_lsh_buckets" -> ((s, dir) => {
      Similarity.signBuckets(Tables(s, dir).embeddings, "vec_id", "embedding")
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_vecs"))
        .orderBy(col("bucket"))
    }),

    // spark.ml BucketedRandomProjectionLSH approx similarity join
    // (seeded; rows-only — random hyperplanes aren't SQL-mirrorable).
    "sim_ml_lsh_join" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings
      val (transformed, model) =
        Similarity.fitMlLsh(emb, "vec_id", "embedding")
      model.approxSimilarityJoin(transformed, transformed, 1.0, "dist")
        .where(col("datasetA.vec_id") < col("datasetB.vec_id"))
        .select(col("datasetA.vec_id").as("id_a"),
          col("datasetB.vec_id").as("id_b"),
          round(col("dist"), 4).as("dist"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ANN top-3 within the query's bucket — the linear-cost search path.
    "sim_lsh_topk" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings
      Similarity.lshTopK(emb, emb.where(col("vec_id") < 20),
        "vec_id", "embedding", k = 3)
        .orderBy(col("query_id"), col("rnk"))
    })
  )

  val oracles: Map[String, String] = Map(
    "sim_topk_bruteforce" ->
      """WITH p AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cs
        |  FROM embeddings q, embeddings c
        |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |r AS (
        |  SELECT query_id, neighbor_id, cs,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS rnk
        |  FROM p)
        |SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk, round(cs, 4) AS cos
        |FROM r WHERE rnk <= 5
        |ORDER BY query_id, rnk""".stripMargin,

    "sim_lsh_buckets" ->
      s"""SELECT CAST(${bucketSql("embedding", 8)} AS BIGINT) AS bucket,
         |  count(*) AS n_vecs
         |FROM embeddings
         |GROUP BY 1
         |ORDER BY bucket""".stripMargin,

    "sim_lsh_topk" ->
      s"""WITH bkt AS (
         |  SELECT vec_id, embedding,
         |    CAST(${bucketSql("embedding", 8)} AS BIGINT) AS bucket
         |  FROM embeddings),
         |p AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cs
         |  FROM bkt q JOIN bkt c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
         |  WHERE q.vec_id < 20),
         |r AS (
         |  SELECT query_id, neighbor_id, cs,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS rnk
         |  FROM p)
         |SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk, round(cs, 4) AS cos
         |FROM r WHERE rnk <= 3
         |ORDER BY query_id, rnk""".stripMargin
  )
}
