package graft.packs

import graft.QueryPack
import graft.core.Tables
import graft.mlops.NaiveBayesOps
import graft.similarity.Similarity
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search (north-star extension): exact brute-force cosine
  * top-k baseline + deterministic sign-LSH scale path.
  */
object SimilarityQueries extends QueryPack {

  private def bucketSql(arr: String, nBits: Int): String =
    (0 until nBits).map(j =>
      s"CASE WHEN $arr[${j + 1}] > 0 THEN ${1L << j} ELSE 0 END")
      .mkString("(", " + ", ")")

  /** The per-label-mean centroid fixture every IVF query shares. */
  private[packs] def labelCenters(emb: org.apache.spark.sql.DataFrame) =
    NaiveBayesOps.toLongForm(emb, Seq("label"), "embedding")
      .groupBy(col("label").as("cell"), col("dim"))
      .agg(avg(col("v")).as("c"))

  /** Per-(sf, JVM, suffix) tmp path for an IVF index asset, shutdown-
    * hook-removed (the TextAnalysisQueries tmpIndexPath pattern; the
    * graft_posidx prefix keeps it under Bench's between-query sweep).
    */
  private val hookedIvfPaths =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private[packs] def tmpIvfPath(dir: String, suffix: String): String = {
    val path =
      s"${System.getProperty("java.io.tmpdir")}/graft_posidx_ivf$suffix" +
        s"_${dir.replaceAll("[^A-Za-z0-9]", "")}" +
        s"_${ProcessHandle.current().pid()}"
    if (hookedIvfPaths.add(path))
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete(): Unit
        }
        rm(new java.io.File(path))
      }))
    path
  }

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

    // IVF ANN: per-label-mean centroids (deterministic), 2-probe search,
    // exact cosine re-rank — the inverted-file scale path, fully oracled.
    "sim_ivf_topk" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings
      Similarity.ivfTopK(emb, emb.where(col("vec_id") < 10),
        "vec_id", "embedding", labelCenters(emb), "cell", nProbe = 2, k = 3)
        .orderBy(col("query_id"), col("rnk"))
    }),

    // The index-as-asset shape for vectors (the text positional index's
    // twin): build ONCE into a cell-partitioned parquet asset carrying
    // its own centroids, query with driver-pushed partition filters on
    // the probed cells — the corpus embedding table is never rescanned.
    // Identical results to sim_ivf_topk by construction (same centroids,
    // nProbe, k) — shares its oracle verbatim.
    "sim_ivf_indexed" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings
      val path = tmpIvfPath(dir, "")
      Similarity.writeIvfIndex(emb, "vec_id", "embedding",
        labelCenters(emb), "cell", path)
      Similarity.queryIvfIndexed(s, path, emb.where(col("vec_id") < 10),
          "vec_id", "embedding", nProbe = 2, k = 3)
        .orderBy(col("query_id"), col("rnk"))
    }),

    // Incremental IVF maintenance, merge ≡ rebuild: build the asset on
    // half the corpus, append the other half with the ASSET'S OWN
    // centroids (sidecar), query — identical rows to the full build, so
    // the full-corpus oracle pins the merged asset.
    "sim_ivf_index_merge" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings
      val path = tmpIvfPath(dir, "m")
      Similarity.writeIvfIndex(emb.where(col("vec_id") % 2 === 0),
        "vec_id", "embedding", labelCenters(emb), "cell", path)
      Similarity.mergeIvfIndex(emb.where(col("vec_id") % 2 =!= 0),
        "vec_id", "embedding", path)
      Similarity.queryIvfIndexed(s, path, emb.where(col("vec_id") < 10),
          "vec_id", "embedding", nProbe = 2, k = 3)
        .orderBy(col("query_id"), col("rnk"))
    }),

    // IVF asset COMPACTION, compact ≡ no-op: build on half, append the
    // other half (one extra file per touched cell), rewrite to one
    // file per cell, query — identical rows to the never-compacted
    // asset, so sim_ivf_topk's oracle pins the compacted asset. The
    // file-count drop is pinned in DedupSimilaritySpec and at stress
    // scale in StressBench.
    "sim_ivf_index_compact" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings
      val path = tmpIvfPath(dir, "c")
      Similarity.writeIvfIndex(emb.where(col("vec_id") % 2 === 0),
        "vec_id", "embedding", labelCenters(emb), "cell", path)
      Similarity.mergeIvfIndex(emb.where(col("vec_id") % 2 =!= 0),
        "vec_id", "embedding", path)
      Similarity.compactIvfIndex(s, path)
      Similarity.queryIvfIndexed(s, path, emb.where(col("vec_id") < 10),
          "vec_id", "embedding", nProbe = 2, k = 3)
        .orderBy(col("query_id"), col("rnk"))
    }),

    // IVF centroid-drift report — the recall early-warning on the
    // asset's maintenance path: asset rows' distance to their OWN cell
    // vs an increment's distance to its NEAREST cell, reduced to one
    // smoothed PSI/KL/JS row. Fixture: the increment is the corpus
    // shifted in DOUBLE (x*1.5 + 0.25 — double on both engines, so the
    // arithmetic is bit-identical), which must flag (psi >= 0.2, the
    // documented retrain band); the same-distribution non-flagging twin
    // is spec-pinned in DedupSimilaritySpec.
    "sim_ivf_drift" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings
      val path = tmpIvfPath(dir, "d")
      Similarity.writeIvfIndex(emb, "vec_id", "embedding",
        labelCenters(emb), "cell", path)
      val shifted = emb.select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE) * 1.5d + 0.25d)")
          .as("embedding"))
      Similarity.ivfDriftReport(s, path, shifted, "vec_id", "embedding",
        bins = 32, lo = 0.0, hi = 2.0)
    }),

    // The retrain branch of the drift contract end to end: build on the
    // even half, let the odd half drift (the same double-exact shift as
    // sim_ivf_drift — which flags psi >= 0.2 for it), retrain with one
    // warm-started Lloyd round over asset ∪ increment, rebuild, and
    // query the swapped-in asset. The oracle replays the warm-start
    // assignment, the re-centering, and the full IVF probe/re-rank over
    // the drifted corpus — every centroid coordinate and rank pinned.
    // Correctness-only (not in benchNames): retrain is the RARE
    // maintenance op the drift report gates; compaction is the frequent
    // one and is priced in the bench.
    "sim_ivf_retrain" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings
      val path = tmpIvfPath(dir, "rt")
      val even = emb.where(col("vec_id") % 2 === 0).select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))")
          .as("embedding"))
      val shifted = emb.where(col("vec_id") % 2 =!= 0).select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE) * 1.5d + 0.25d)")
          .as("embedding"))
      Similarity.writeIvfIndex(even, "vec_id", "embedding",
        labelCenters(emb.where(col("vec_id") % 2 === 0)), "cell", path)
      Similarity.retrainIvfIndex(s, path, shifted, "vec_id", "embedding",
        iters = 1)
      Similarity.queryIvfIndexed(s, path,
          even.unionByName(shifted).where(col("vec_id") < 10),
          "vec_id", "embedding", nProbe = 2, k = 3)
        .orderBy(col("query_id"), col("rnk"))
    }),

    // The nProbe tuning table: exact recall@3 vs brute-force truth for
    // every nProbe in 1..4, computed as join arithmetic (no per-nProbe
    // search — a truth neighbor is in IVF's top-k iff its cell is
    // probed, because the re-rank is exact). The measurable behind the
    // drift report's "raise nProbe" band.
    "sim_ivf_recall_curve" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings
      Similarity.ivfRecallCurve(emb, emb.where(col("vec_id") < 10),
        "vec_id", "embedding", labelCenters(emb), "cell",
        maxProbe = 4, k = 3)
    }),

    // IVF with the exhaustive-fallback recall floor: nProbe=1 gating,
    // but any query whose probed cell holds fewer than 50 candidates
    // re-runs against the whole corpus (FAISS nprobe-escalation made
    // one-shot). At sf0.01 the 41-63-member cells split the 10 queries
    // across BOTH branches — the artifact pins the gate itself, not
    // just one path; fell_back marks the branch per row.
    "sim_ivf_adaptive" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings
      val centers = NaiveBayesOps.toLongForm(emb, Seq("label"), "embedding")
        .groupBy(col("label").as("cell"), col("dim"))
        .agg(avg(col("v")).as("c"))
      Similarity.ivfTopKAdaptive(emb, emb.where(col("vec_id") < 10),
          "vec_id", "embedding", centers, "cell", nProbe = 1, k = 3,
          minCand = 50)
        .orderBy(col("query_id"), col("rnk"))
    }),

    // LSH QUALITY, value-level (graduates the former rows-only
    // sim_ml_lsh_join): recall@5 of the deterministic sign-LSH bucket
    // candidates against brute-force cosine ground truth — every number
    // SQL-reproducible, so the index's recall (not just its bucket
    // histogram) is hash-pinned. The RNG-bound spark.ml
    // BucketedRandomProjectionLSH keeps its coverage as a ScalaTest twin
    // (DedupSimilaritySpec): seeded random hyperplanes aren't
    // SQL-mirrorable.
    "sim_lsh_recall" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings
      val truth = Similarity.bruteForceTopK(
        emb, emb.where(col("vec_id") < 50), "vec_id", "embedding", k = 5)
      val buckets = Similarity.signBuckets(emb, "vec_id", "embedding")
        .select(col("vec_id"), col("bucket"))
      truth
        .join(buckets.select(col("vec_id").as("query_id"),
          col("bucket").as("_bq")), "query_id")
        .join(buckets.select(col("vec_id").as("neighbor_id"),
          col("bucket").as("_bn")), "neighbor_id")
        .agg(
          countDistinct(col("query_id")).as("n_queries"),
          count(lit(1)).as("n_truth"),
          sum(when(col("_bq") === col("_bn"), 1L).otherwise(0L)).as("n_hit"))
        .withColumn("recall_at_5",
          round(col("n_hit") / col("n_truth"), 4) + lit(0.0))
    }),

    // ANN top-3 within the query's bucket — the linear-cost search path.
    "sim_lsh_topk" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddingsSpread
      Similarity.lshTopK(emb, emb.where(col("vec_id") < 20),
        "vec_id", "embedding", k = 3)
        .orderBy(col("query_id"), col("rnk"))
    }),

    // Symmetric int8 quantization of the embedding column (the SQ8
    // memory path for RAM-resident ANN at 100 TB): per-vector scale,
    // integer codes summarized exactly (sum / L1 — permutation-proof
    // integers), plus the L2 dequantization error.
    "sim_quantize_int8" -> ((s, dir) => {
      Similarity.quantizeInt8(Tables(s, dir).embeddings, "vec_id", "embedding")
        .select(col("vec_id"),
          (round(col("q_scale"), 6) + lit(0.0)).as("q_scale"),
          expr("aggregate(q, 0L, (acc, x) -> acc + x)").as("q_sum"),
          expr("aggregate(q, 0L, (acc, x) -> acc + abs(x))").as("q_l1"),
          (round(col("q_err_l2"), 6) + lit(0.0)).as("q_err_l2"))
        .orderBy(col("vec_id"))
    }),

    // Cell-gated k-NN graph: every corpus point's top-3 cosine
    // neighbors within its 2 probed cells — the batch all-points
    // analog of ivf search and the input structure semantic dedup /
    // graph clustering consume. Cost one cell-pair family, never the
    // n² cross join.
    "sim_knn_graph" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddingsSpread
      val centers = NaiveBayesOps.toLongForm(emb, Seq("label"), "embedding")
        .groupBy(col("label").as("cell"), col("dim"))
        .agg(avg(col("v")).as("c"))
      Similarity.knnGraphCells(emb, "vec_id", "embedding", centers, "cell",
          k = 3, nProbe = 2)
        .orderBy(col("src_id"), col("rnk"))
    }),

    // Graph ANN query path (HNSW-style search over the built k-NN
    // graph): enter at the query's coarse cell (top-8 by cosine), walk
    // neighbor-of-neighbor for 2 bounded-beam rounds, emit top-3. The
    // oracle unrolls the graph build, the entry probe, and both beam
    // rounds; recall >= adaptive IVF's is pinned in DedupSimilaritySpec.
    "sim_graph_search_topk" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddingsSpread
      val centers = NaiveBayesOps.toLongForm(emb, Seq("label"), "embedding")
        .groupBy(col("label").as("cell"), col("dim"))
        .agg(avg(col("v")).as("c"))
      val g = Similarity.knnGraphCells(emb, "vec_id", "embedding", centers,
        "cell", k = 3, nProbe = 2)
      Similarity.graphSearchTopK(emb, emb.where(col("vec_id") < 10),
          "vec_id", "embedding", centers, "cell", g, k = 3,
          rounds = 2, beam = 8)
        .orderBy(col("query_id"), col("rnk"))
    }),

    // Semantic communities over the mutual k-NN graph: reciprocal
    // top-3 edges (hub edges die — a vector close to everything
    // reciprocates few of its appearances), 4 label-propagation
    // rounds, full-universe disposition with singletons kept.
    "sim_knn_communities" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddingsSpread
      val centers = NaiveBayesOps.toLongForm(emb, Seq("label"), "embedding")
        .groupBy(col("label").as("cell"), col("dim"))
        .agg(avg(col("v")).as("c"))
      Similarity.knnCommunities(emb, "vec_id", "embedding", centers,
          "cell", k = 3, nProbe = 2, rounds = 4)
        .orderBy(col("vec_id"))
    }),

    // One NN-descent round over the cell-gated k-NN graph: re-rank
    // each point's top-3 among neighbors-of-neighbors (undirected) —
    // the standard recall-refinement that recovers cross-cell true
    // neighbors without raising nProbe. Deterministic: one fixed
    // round, pure function of the input graph.
    "sim_knn_refine" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddingsSpread
      val centers = NaiveBayesOps.toLongForm(emb, Seq("label"), "embedding")
        .groupBy(col("label").as("cell"), col("dim"))
        .agg(avg(col("v")).as("c"))
      val g = Similarity.knnGraphCells(emb, "vec_id", "embedding", centers,
        "cell", k = 3, nProbe = 2)
      Similarity.knnRefine(emb, "vec_id", "embedding", g, k = 3)
        .orderBy(col("src_id"), col("rnk"))
    }),

    // NN-descent with the convergence knob: iterate refinement rounds
    // until a round changes zero directed edges (tol = 0: exact fixed
    // point) or maxRounds = 2. Oracle-replayable because a fixed point
    // is idempotent under further rounds — whether the loop ran 1 or
    // 2 rounds, the result equals the unrolled 2-round twin.
    "sim_knn_refine_converged" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddingsSpread
      val centers = NaiveBayesOps.toLongForm(emb, Seq("label"), "embedding")
        .groupBy(col("label").as("cell"), col("dim"))
        .agg(avg(col("v")).as("c"))
      val g = Similarity.knnGraphCells(emb, "vec_id", "embedding", centers,
        "cell", k = 3, nProbe = 2)
      Similarity.knnRefineConverged(emb, "vec_id", "embedding", g,
          k = 3, maxRounds = 2)
        .graph
        .orderBy(col("src_id"), col("rnk"))
    }),

    // maxCell auto-tuning table: the cell-load histogram with the
    // cumulative directed-pair ledger, against a deliberately FINER
    // deterministic centroid set (label × vec_id-residue, 30 cells)
    // so the sizes spread and the 8n budget splits the table — the
    // largest within_budget row is the cap knnGraphCellsBudget picks.
    "sim_cell_budget_tune" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings
      val fine = emb.withColumn("fcell",
        col("label").cast("long") * 3 + pmod(col("vec_id"), lit(3)))
      val centers = NaiveBayesOps.toLongForm(fine, Seq("fcell"), "embedding")
        .groupBy(col("fcell").as("cell"), col("dim"))
        .agg(avg(col("v")).as("c"))
      val budget = 8L * emb.count()
      Similarity.cellLoadHistogram(emb, "vec_id", "embedding", centers,
          "cell", pairBudget = budget, nProbe = 2)
        .orderBy(col("cell_size"))
    }),

    // Greedy k-center coreset (farthest-point traversal): the
    // diversity-maximizing 6-point training subset of the embedded
    // corpus, 2-approximating the optimal 6-center cover. Selection
    // order and per-selection radii are pure functions of the
    // embedding column (seed + ties by lowest id), so the oracle
    // unrolls all 6 rounds. The radii are non-increasing — the
    // curation signal: stop selecting when the radius falls under the
    // redundancy threshold.
    "sim_kcenter_coreset" -> ((s, dir) => {
      Similarity.kCenterCoreset(Tables(s, dir).embeddings,
          "vec_id", "embedding", k = 6)
        .select(col("sel_rank"), col("id").as("vec_id"), col("radius"))
        .orderBy(col("sel_rank"))
    }),

    // Product quantization + asymmetric-distance top-3: 4 subspaces of
    // 16 dims, 8-entry codebooks from 2 deterministic Lloyd rounds (the
    // c2_kmeans_lloyd seeding/round contract per subspace, all trained
    // in one multi-subspace pass), corpus reduced to 4 small ints per
    // vector, query-side distance tables broadcast. The oracle replays
    // the entire chain — codebook training, encoding, ADC lookup —
    // round for round.
    "sim_pq_topk" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings
      val centers = Similarity.pqCodebooks(emb, "vec_id", "embedding",
        dsub = 16, ksub = 8, iters = 2)
      Similarity.pqTopK(emb, emb.where(col("vec_id") < 10),
          "vec_id", "embedding", centers, dsub = 16, k = 3)
        .orderBy(col("query_id"), col("rnk"))
    }),

    // PQ QUALITY, value-level (the sim_lsh_recall pattern for the PQ
    // tier): recall@3 of ADC top-3 against brute-force L2 ground truth
    // — the compression's accuracy cost is itself hash-pinned, not just
    // the mechanics.
    "sim_pq_recall" -> ((s, dir) => {
      graft.plans.GraftExpressions.register(s)
      val emb = Tables(s, dir).embeddings
      val centers = Similarity.pqCodebooks(emb, "vec_id", "embedding",
        dsub = 16, ksub = 8, iters = 2)
      val pq = Similarity.pqTopK(emb, emb.where(col("vec_id") < 10),
          "vec_id", "embedding", centers, dsub = 16, k = 3)
        .select(col("query_id"), col("neighbor_id"))
      val q = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("_q"))
      val c = emb.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("_c"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("_d2"), col("neighbor_id"))
      val truth = q.crossJoin(c)
        .where(col("query_id") =!= col("neighbor_id"))
        .withColumn("_d2", graft.plans.GraftExpressions.l2sq(
          col("_q").cast("array<double>"), col("_c").cast("array<double>")))
        .withColumn("rnk", row_number().over(w)).where(col("rnk") <= 3)
        .select(col("query_id"), col("neighbor_id"))
        // correctness-twin scale only, but swap to the uniform r9
        // primitive anyway (slim id-pairs, read by both consumers)
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      val hit = truth.join(pq, Seq("query_id", "neighbor_id"), "left_semi")
      truth.agg(count(lit(1)).as("n_truth"))
        .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
        .select(col("n_truth"), col("n_hit"),
          (round(col("n_hit") / col("n_truth"), 4) + lit(0.0))
            .as("recall_at_3"))
    }),

    // IVF+PQ composed (the FAISS IVFPQ search shape): label-mean coarse
    // cells GATE the candidates (2-probe), PQ codes RANK them via ADC —
    // sublinear candidate count × codes-only scoring. The oracle fuses
    // the sim_ivf_topk cell/probe replay with the sim_pq_topk
    // codebook/ADC replay.
    "sim_ivfpq_topk" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings
      val coarse = NaiveBayesOps.toLongForm(emb, Seq("label"), "embedding")
        .groupBy(col("label").as("cell"), col("dim"))
        .agg(avg(col("v")).as("c"))
      val pq = Similarity.pqCodebooks(emb, "vec_id", "embedding",
        dsub = 16, ksub = 8, iters = 2)
      Similarity.ivfPqTopK(emb, emb.where(col("vec_id") < 10),
          "vec_id", "embedding", coarse, "cell", pq, dsub = 16,
          nProbe = 2, k = 3)
        .orderBy(col("query_id"), col("rnk"))
    }),

    // Two-stage ranker (FAISS IVFPQ + refine): ADC takes the top 10
    // through the coarse gate, exact L2 on the 10 full-precision
    // finalists keeps the top 3 — ADC's quantization error is bought
    // back at the ranking margin for m exact distances per query. The
    // oracle replays the whole chain and re-ranks the same pool.
    "sim_ivfpq_rerank" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings
      val coarse = NaiveBayesOps.toLongForm(emb, Seq("label"), "embedding")
        .groupBy(col("label").as("cell"), col("dim"))
        .agg(avg(col("v")).as("c"))
      val pq = Similarity.pqCodebooks(emb, "vec_id", "embedding",
        dsub = 16, ksub = 8, iters = 2)
      Similarity.ivfPqRerankTopK(emb, emb.where(col("vec_id") < 10),
          "vec_id", "embedding", coarse, "cell", pq, dsub = 16,
          nProbe = 2, m = 10, k = 3)
        .orderBy(col("query_id"), col("rnk"))
    })
  )

  /** Shared IVF+PQ replay chain (sim_ivf_topk's coarse ctr/cells/probes
    * + sim_pq_topk's PQ c0..c2/codes/dt, joined by the candidate gate,
    * ending at the per-candidate ADC distances `adc`) — the two IVFPQ
    * oracles differ only in their ranking tail.
    */
  private val ivfPqAdcChain: String =
    """WITH pts0 AS (
      |  SELECT vec_id, CAST(generate_subscripts(embedding, 1) AS INT) AS dim,
      |    CAST(unnest(embedding) AS DOUBLE) AS v
      |  FROM embeddings),
      |pts AS MATERIALIZED (
      |  SELECT vec_id, dim, v, (dim - 1) // 16 AS sub FROM pts0),
      |ptsl AS (
      |  SELECT label, generate_subscripts(embedding, 1) AS dim,
      |    CAST(unnest(embedding) AS DOUBLE) AS v
      |  FROM embeddings),
      |ctr AS MATERIALIZED (
      |  SELECT label AS cell, dim, avg(v) AS c FROM ptsl GROUP BY label, dim),
      |cells AS (
      |  SELECT vec_id AS neighbor_id, cell FROM (
      |    SELECT vec_id, cell, row_number() OVER (
      |      PARTITION BY vec_id ORDER BY dist2, cell) AS rn
      |    FROM (SELECT p.vec_id, c.cell, sum((p.v - c.c) * (p.v - c.c)) AS dist2
      |          FROM pts p JOIN ctr c ON p.dim = c.dim
      |          GROUP BY p.vec_id, c.cell) d) r
      |  WHERE rn = 1),
      |probes AS (
      |  SELECT vec_id AS query_id, cell FROM (
      |    SELECT vec_id, cell, row_number() OVER (
      |      PARTITION BY vec_id ORDER BY dist2, cell) AS pr
      |    FROM (SELECT p.vec_id, c.cell, sum((p.v - c.c) * (p.v - c.c)) AS dist2
      |          FROM pts p JOIN ctr c ON p.dim = c.dim
      |          WHERE p.vec_id < 10
      |          GROUP BY p.vec_id, c.cell) d) r
      |  WHERE pr <= 2),
      |c0 AS (SELECT CAST(vec_id AS INT) AS cid, dim, v AS c
      |       FROM pts WHERE vec_id < 8),
      |d1 AS (SELECT p.vec_id, p.sub, c.cid,
      |    sum((p.v - c.c) * (p.v - c.c)) AS d2
      |  FROM pts p JOIN c0 c ON p.dim = c.dim
      |  GROUP BY p.vec_id, p.sub, c.cid),
      |a1 AS (SELECT vec_id, sub, cid FROM (
      |    SELECT vec_id, sub, cid, row_number() OVER (
      |      PARTITION BY vec_id, sub ORDER BY d2, cid) AS rn
      |    FROM d1) WHERE rn = 1),
      |c1 AS (SELECT a.cid, p.dim, avg(p.v) AS c
      |  FROM pts p JOIN a1 a ON p.vec_id = a.vec_id AND p.sub = a.sub
      |  GROUP BY a.cid, p.dim),
      |d2s AS (SELECT p.vec_id, p.sub, c.cid,
      |    sum((p.v - c.c) * (p.v - c.c)) AS d2
      |  FROM pts p JOIN c1 c ON p.dim = c.dim
      |  GROUP BY p.vec_id, p.sub, c.cid),
      |a2 AS (SELECT vec_id, sub, cid FROM (
      |    SELECT vec_id, sub, cid, row_number() OVER (
      |      PARTITION BY vec_id, sub ORDER BY d2, cid) AS rn
      |    FROM d2s) WHERE rn = 1),
      |c2 AS MATERIALIZED (SELECT a.cid, p.dim, avg(p.v) AS c
      |  FROM pts p JOIN a2 a ON p.vec_id = a.vec_id AND p.sub = a.sub
      |  GROUP BY a.cid, p.dim),
      |codes AS MATERIALIZED (SELECT vec_id, sub, cid FROM (
      |    SELECT p.vec_id, p.sub, c.cid, row_number() OVER (
      |      PARTITION BY p.vec_id, p.sub ORDER BY
      |        sum((p.v - c.c) * (p.v - c.c)), c.cid) AS rn
      |    FROM pts p JOIN c2 c ON p.dim = c.dim
      |    GROUP BY p.vec_id, p.sub, c.cid) WHERE rn = 1),
      |dt AS MATERIALIZED (SELECT p.vec_id AS query_id, p.sub, c.cid,
      |    sum((p.v - c.c) * (p.v - c.c)) AS pd
      |  FROM pts p JOIN c2 c ON p.dim = c.dim
      |  WHERE p.vec_id < 10
      |  GROUP BY p.vec_id, p.sub, c.cid),
      |cand AS (
      |  SELECT pr.query_id, ce.neighbor_id
      |  FROM probes pr JOIN cells ce ON pr.cell = ce.cell
      |  WHERE pr.query_id <> ce.neighbor_id),
      |adc AS (
      |  SELECT cd.query_id, cd.neighbor_id,
      |    round(sum(dt.pd), 4) + 0.0 AS adist2
      |  FROM cand cd
      |  JOIN codes co ON co.vec_id = cd.neighbor_id
      |  JOIN dt ON dt.query_id = cd.query_id
      |    AND dt.sub = co.sub AND dt.cid = co.cid
      |  GROUP BY cd.query_id, cd.neighbor_id)""".stripMargin

  /** Shared unrolled prefix of the NN-descent oracles: cell-gated knn
    * build, symmetric closure, one refinement round ranked in `r2`.
    * `sim_knn_refine` publishes r2's top-3; the converged twin chains
    * a second identical round on top.
    */
  private val knnRefineRoundOne: String =
    """WITH pts AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
      |    CAST(unnest(embedding) AS DOUBLE) AS v
      |  FROM embeddings),
      |ptsl AS (
      |  SELECT label, generate_subscripts(embedding, 1) AS dim,
      |    CAST(unnest(embedding) AS DOUBLE) AS v
      |  FROM embeddings),
      |ctr AS (SELECT label AS cell, dim, avg(v) AS c FROM ptsl GROUP BY label, dim),
      |assign AS MATERIALIZED (
      |  SELECT vec_id, cell FROM (
      |    SELECT vec_id, cell, row_number() OVER (
      |      PARTITION BY vec_id ORDER BY dist2, cell) AS rn
      |    FROM (SELECT p.vec_id, c.cell, sum((p.v - c.c) * (p.v - c.c)) AS dist2
      |          FROM pts p JOIN ctr c ON p.dim = c.dim
      |          GROUP BY p.vec_id, c.cell) d) r
      |  WHERE rn <= 2),
      |prs AS (
      |  SELECT DISTINCT a.vec_id AS src_id, b.vec_id AS neighbor_id
      |  FROM assign a JOIN assign b
      |    ON a.cell = b.cell AND a.vec_id <> b.vec_id),
      |scored AS (
      |  SELECT pr.src_id, pr.neighbor_id,
      |    list_cosine_similarity(q.embedding::DOUBLE[], n.embedding::DOUBLE[]) AS cs
      |  FROM prs pr
      |  JOIN embeddings q ON q.vec_id = pr.src_id
      |  JOIN embeddings n ON n.vec_id = pr.neighbor_id),
      |knn AS MATERIALIZED (
      |  SELECT src_id, neighbor_id FROM (
      |    SELECT src_id, neighbor_id, row_number() OVER (
      |      PARTITION BY src_id ORDER BY cs DESC, neighbor_id) AS rnk
      |    FROM scored) t
      |  WHERE rnk <= 3),
      |und AS MATERIALIZED (
      |  SELECT DISTINCT a, b FROM (
      |    SELECT src_id AS a, neighbor_id AS b FROM knn
      |    UNION ALL SELECT neighbor_id, src_id FROM knn) u),
      |cand AS (
      |  SELECT DISTINCT x.a AS src_id, y.b AS neighbor_id
      |  FROM und x JOIN und y ON x.b = y.a
      |  WHERE x.a <> y.b
      |  UNION
      |  SELECT a, b FROM und),
      |sc2 AS (
      |  SELECT c.src_id, c.neighbor_id,
      |    list_cosine_similarity(q.embedding::DOUBLE[], n.embedding::DOUBLE[]) AS cs
      |  FROM cand c
      |  JOIN embeddings q ON q.vec_id = c.src_id
      |  JOIN embeddings n ON n.vec_id = c.neighbor_id),
      |r2 AS MATERIALIZED (
      |  SELECT src_id, neighbor_id, cs, row_number() OVER (
      |    PARTITION BY src_id ORDER BY cs DESC, neighbor_id) AS rnk
      |  FROM sc2)""".stripMargin

  /** Unrolled graph-search oracle: one shared distance/rank table
    * feeds both the 2-probe graph-build assignment and the 1-probe
    * entry membership; then the entry beam (f0) and two expansion
    * rounds (f1, f2), each a UNION-dedup of walked edges with the
    * previous frontier, scored and beam-cut at 8. Every frontier CTE
    * is referenced twice downstream → MATERIALIZED (the inliner rule).
    */
  private def graphSearchOracle(queryPred: String, beam: Int,
                                k: Int): String = {
    def beamCte(name: String, candCte: String): String = s"""
      |$name AS MATERIALIZED (
      |  SELECT query_id, neighbor_id, cs FROM (
      |    SELECT sc.*, row_number() OVER (PARTITION BY query_id
      |      ORDER BY cs DESC, neighbor_id) AS rn
      |    FROM (SELECT c.query_id, c.neighbor_id,
      |            list_cosine_similarity(q.embedding::DOUBLE[],
      |              n.embedding::DOUBLE[]) AS cs
      |          FROM $candCte c
      |          JOIN embeddings q ON q.vec_id = c.query_id
      |          JOIN embeddings n ON n.vec_id = c.neighbor_id) sc) t
      |  WHERE rn <= $beam)""".stripMargin
    s"""WITH pts AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
      |    CAST(unnest(embedding) AS DOUBLE) AS v
      |  FROM embeddings),
      |ptsl AS (
      |  SELECT label, generate_subscripts(embedding, 1) AS dim,
      |    CAST(unnest(embedding) AS DOUBLE) AS v
      |  FROM embeddings),
      |ctr AS (SELECT label AS cell, dim, avg(v) AS c FROM ptsl
      |        GROUP BY label, dim),
      |rnks AS MATERIALIZED (
      |  SELECT vec_id, cell, row_number() OVER (
      |    PARTITION BY vec_id ORDER BY dist2, cell) AS rn
      |  FROM (SELECT p.vec_id, c.cell, sum((p.v - c.c) * (p.v - c.c)) AS dist2
      |        FROM pts p JOIN ctr c ON p.dim = c.dim
      |        GROUP BY p.vec_id, c.cell) d),
      |assign AS MATERIALIZED (SELECT vec_id, cell FROM rnks WHERE rn <= 2),
      |a1 AS MATERIALIZED (SELECT vec_id, cell FROM rnks WHERE rn = 1),
      |prs AS (
      |  SELECT DISTINCT a.vec_id AS src_id, b.vec_id AS neighbor_id
      |  FROM assign a JOIN assign b
      |    ON a.cell = b.cell AND a.vec_id <> b.vec_id),
      |gsc AS (
      |  SELECT pr.src_id, pr.neighbor_id,
      |    list_cosine_similarity(q.embedding::DOUBLE[],
      |      n.embedding::DOUBLE[]) AS cs
      |  FROM prs pr
      |  JOIN embeddings q ON q.vec_id = pr.src_id
      |  JOIN embeddings n ON n.vec_id = pr.neighbor_id),
      |g AS MATERIALIZED (
      |  SELECT src_id, neighbor_id FROM (
      |    SELECT src_id, neighbor_id, row_number() OVER (
      |      PARTITION BY src_id ORDER BY cs DESC, neighbor_id) AS rnk
      |    FROM gsc) t
      |  WHERE rnk <= 3),
      |e0 AS (
      |  SELECT DISTINCT q.vec_id AS query_id, m.vec_id AS neighbor_id
      |  FROM a1 q JOIN a1 m ON q.cell = m.cell AND q.vec_id <> m.vec_id
      |  WHERE $queryPred),""".stripMargin +
      beamCte("f0", "e0") + s""",
      |c1 AS (
      |  SELECT DISTINCT f.query_id, g.neighbor_id
      |  FROM f0 f JOIN g ON g.src_id = f.neighbor_id
      |  WHERE f.query_id <> g.neighbor_id
      |  UNION
      |  SELECT query_id, neighbor_id FROM f0),""".stripMargin +
      beamCte("f1", "c1") + s""",
      |c2 AS (
      |  SELECT DISTINCT f.query_id, g.neighbor_id
      |  FROM f1 f JOIN g ON g.src_id = f.neighbor_id
      |  WHERE f.query_id <> g.neighbor_id
      |  UNION
      |  SELECT query_id, neighbor_id FROM f1),""".stripMargin +
      beamCte("f2", "c2") + s"""
      |SELECT query_id, neighbor_id, CAST(rn AS INT) AS rnk,
      |  round(cs, 4) AS cos
      |FROM (SELECT f.*, row_number() OVER (PARTITION BY query_id
      |        ORDER BY cs DESC, neighbor_id) AS rn FROM f2 f) t
      |WHERE rn <= $k
      |ORDER BY query_id, rnk""".stripMargin
  }

  /** Shared by sim_ivf_topk AND its durable-asset twins — in-memory,
    * indexed, and merged-index paths return identical rows.
    */
  private[packs] val ivfTopkOracle: String =
    """WITH pts AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
      |    CAST(unnest(embedding) AS DOUBLE) AS v
      |  FROM embeddings),
      |ptsl AS (
      |  SELECT label, generate_subscripts(embedding, 1) AS dim,
      |    CAST(unnest(embedding) AS DOUBLE) AS v
      |  FROM embeddings),
      |ctr AS (SELECT label AS cell, dim, avg(v) AS c FROM ptsl GROUP BY label, dim),
      |assign AS (
      |  SELECT vec_id, cell, row_number() OVER (
      |    PARTITION BY vec_id ORDER BY dist2, cell) AS rn
      |  FROM (SELECT p.vec_id, c.cell, sum((p.v - c.c) * (p.v - c.c)) AS dist2
      |        FROM pts p JOIN ctr c ON p.dim = c.dim
      |        GROUP BY p.vec_id, c.cell) d),
      |cells AS (SELECT vec_id AS neighbor_id, cell FROM assign WHERE rn = 1),
      |probes AS (
      |  SELECT vec_id AS query_id, cell FROM (
      |    SELECT vec_id, cell, row_number() OVER (
      |      PARTITION BY vec_id ORDER BY dist2, cell) AS pr
      |    FROM (SELECT p.vec_id, c.cell, sum((p.v - c.c) * (p.v - c.c)) AS dist2
      |          FROM pts p JOIN ctr c ON p.dim = c.dim
      |          WHERE p.vec_id < 10
      |          GROUP BY p.vec_id, c.cell) d) r
      |  WHERE pr <= 2),
      |cand AS (
      |  SELECT pr.query_id, ce.neighbor_id
      |  FROM probes pr JOIN cells ce ON pr.cell = ce.cell
      |  WHERE pr.query_id <> ce.neighbor_id),
      |scored AS (
      |  SELECT cd.query_id, cd.neighbor_id,
      |    list_cosine_similarity(q.embedding::DOUBLE[], n.embedding::DOUBLE[]) AS cs
      |  FROM cand cd
      |  JOIN embeddings q ON q.vec_id = cd.query_id
      |  JOIN embeddings n ON n.vec_id = cd.neighbor_id),
      |r AS (
      |  SELECT query_id, neighbor_id, cs, row_number() OVER (
      |    PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS rnk
      |  FROM scored)
      |SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk, round(cs, 4) AS cos
      |FROM r WHERE rnk <= 3
      |ORDER BY query_id, rnk""".stripMargin

  val oracles: Map[String, String] = Map(
    "sim_graph_search_topk" ->
      graphSearchOracle("q.vec_id < 10", beam = 8, k = 3),

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

    "sim_ivf_topk" -> ivfTopkOracle,

    // identical results by construction: the durable asset's read path
    // assigns/probes with the SAME centroids, nProbe, and k — partition
    // pruning changes the plan, never the rows
    "sim_ivf_indexed" -> ivfTopkOracle,

    // merge ≡ rebuild: half-build + centroid-faithful append returns
    // the same (vector, cell) rows as one full build
    "sim_ivf_index_merge" -> ivfTopkOracle,

    // compact ≡ no-op: the rewrite changes files, never rows or cells,
    // so the same oracle pins the compacted asset
    "sim_ivf_index_compact" -> ivfTopkOracle,

    // Truth = brute-force top-3 (cos desc, id ties); a truth pair is
    // found at nProbe p iff its neighbor's nearest cell ranks <= p
    // among the query's probes; the curve is a cross join of the
    // bounded truth-pair frame with generate_series(1, 4).
    "sim_ivf_recall_curve" ->
      """WITH truth AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |        list_cosine_similarity(q.embedding::DOUBLE[],
        |          c.embedding::DOUBLE[]) DESC, c.vec_id) AS rnk
        |    FROM embeddings q, embeddings c
        |    WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id) t
        |  WHERE rnk <= 3),
        |pts AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings),
        |ptsl AS (
        |  SELECT label, generate_subscripts(embedding, 1) AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings),
        |ctr AS (SELECT label AS cell, dim, avg(v) AS c
        |  FROM ptsl GROUP BY label, dim),
        |cells AS (
        |  SELECT vec_id AS neighbor_id, cell FROM (
        |    SELECT vec_id, cell, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY dist2, cell) AS rn
        |    FROM (SELECT p.vec_id, c.cell,
        |        sum((p.v - c.c) * (p.v - c.c)) AS dist2
        |      FROM pts p JOIN ctr c ON p.dim = c.dim
        |      GROUP BY p.vec_id, c.cell) d) r
        |  WHERE rn = 1),
        |probes AS (
        |  SELECT vec_id AS query_id, cell, pr FROM (
        |    SELECT vec_id, cell, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY dist2, cell) AS pr
        |    FROM (SELECT p.vec_id, c.cell,
        |        sum((p.v - c.c) * (p.v - c.c)) AS dist2
        |      FROM pts p JOIN ctr c ON p.dim = c.dim
        |      WHERE p.vec_id < 10
        |      GROUP BY p.vec_id, c.cell) d) r
        |  WHERE pr <= 4),
        |f AS (
        |  SELECT coalesce(p.pr, 2147483647) AS found_at
        |  FROM truth t
        |  JOIN cells ce ON ce.neighbor_id = t.neighbor_id
        |  LEFT JOIN probes p
        |    ON p.query_id = t.query_id AND p.cell = ce.cell)
        |SELECT CAST(g.n_probe AS INT) AS n_probe,
        |  CAST(count(*) AS BIGINT) AS n_truth,
        |  CAST(sum(CASE WHEN f.found_at <= g.n_probe THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_found,
        |  round(CAST(sum(CASE WHEN f.found_at <= g.n_probe THEN 1
        |    ELSE 0 END) AS DOUBLE) / count(*), 4) AS recall
        |FROM f, generate_series(1, 4) g(n_probe)
        |GROUP BY g.n_probe
        |ORDER BY n_probe""".stripMargin,

    // Warm-start retrain replay: ctr0 = even-half label means, a1 =
    // nearest-ctr0 assignment of the drifted union, c1 = per-cell means
    // under a1 (the one Lloyd round), then the standard IVF
    // probe/re-rank with c1 over the union corpus. Multiply-referenced
    // corpus CTEs MATERIALIZED (the DuckDB inliner gotcha).
    "sim_ivf_retrain" ->
      """WITH pe AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings WHERE vec_id % 2 = 0),
        |po AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) * 1.5 + 0.25 AS v
        |  FROM embeddings WHERE vec_id % 2 = 1),
        |ap AS MATERIALIZED (
        |  SELECT * FROM pe UNION ALL SELECT * FROM po),
        |pl AS (
        |  SELECT label, generate_subscripts(embedding, 1) AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings WHERE vec_id % 2 = 0),
        |c0 AS (SELECT label AS cell, dim, avg(v) AS c
        |  FROM pl GROUP BY label, dim),
        |a1 AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY dist2, cell) AS rn
        |    FROM (SELECT p.vec_id, c.cell,
        |        sum((p.v - c.c) * (p.v - c.c)) AS dist2
        |      FROM ap p JOIN c0 c ON p.dim = c.dim
        |      GROUP BY p.vec_id, c.cell) d) r
        |  WHERE rn = 1),
        |c1 AS MATERIALIZED (
        |  SELECT a1.cell, p.dim, avg(p.v) AS c
        |  FROM ap p JOIN a1 ON p.vec_id = a1.vec_id
        |  GROUP BY a1.cell, p.dim),
        |cells AS (
        |  SELECT vec_id AS neighbor_id, cell FROM (
        |    SELECT vec_id, cell, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY dist2, cell) AS rn
        |    FROM (SELECT p.vec_id, c.cell,
        |        sum((p.v - c.c) * (p.v - c.c)) AS dist2
        |      FROM ap p JOIN c1 c ON p.dim = c.dim
        |      GROUP BY p.vec_id, c.cell) d) r
        |  WHERE rn = 1),
        |probes AS (
        |  SELECT vec_id AS query_id, cell FROM (
        |    SELECT vec_id, cell, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY dist2, cell) AS pr
        |    FROM (SELECT p.vec_id, c.cell,
        |        sum((p.v - c.c) * (p.v - c.c)) AS dist2
        |      FROM ap p JOIN c1 c ON p.dim = c.dim
        |      WHERE p.vec_id < 10
        |      GROUP BY p.vec_id, c.cell) d) r
        |  WHERE pr <= 2),
        |cand AS (
        |  SELECT pr.query_id, ce.neighbor_id
        |  FROM probes pr JOIN cells ce ON pr.cell = ce.cell
        |  WHERE pr.query_id <> ce.neighbor_id),
        |av AS MATERIALIZED (
        |  SELECT vec_id, list(v ORDER BY dim) AS emb
        |  FROM ap GROUP BY vec_id),
        |scored AS (
        |  SELECT cd.query_id, cd.neighbor_id,
        |    list_cosine_similarity(q.emb, n.emb) AS cs
        |  FROM cand cd
        |  JOIN av q ON q.vec_id = cd.query_id
        |  JOIN av n ON n.vec_id = cd.neighbor_id),
        |r AS (
        |  SELECT query_id, neighbor_id, cs, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS rnk
        |  FROM scored)
        |SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk,
        |  round(cs, 4) AS cos
        |FROM r WHERE rnk <= 3
        |ORDER BY query_id, rnk""".stripMargin,

    // Asset side: each stored vector's distance to its own (= nearest)
    // cell; increment side: the shifted corpus' distance to its nearest
    // cell — both rounded to 1e-6 BEFORE the hard bin thresholds (the
    // engine-portability convention), binned over [0, 2) x 32, then the
    // drift_token_psi smoothing verbatim on bin counts.
    "sim_ivf_drift" ->
      """WITH pts AS (
        |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings),
        |ctr AS (SELECT label AS cell, dim, avg(v) AS c
        |  FROM pts GROUP BY label, dim),
        |ad AS (
        |  SELECT vec_id, round(min(dist2), 6) AS dist2 FROM (
        |    SELECT p.vec_id, c.cell,
        |      sum((p.v - c.c) * (p.v - c.c)) AS dist2
        |    FROM pts p JOIN ctr c ON p.dim = c.dim
        |    GROUP BY p.vec_id, c.cell) d
        |  GROUP BY vec_id),
        |ipts AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) * 1.5 + 0.25 AS v
        |  FROM embeddings),
        |id2 AS (
        |  SELECT vec_id, round(min(dist2), 6) AS dist2 FROM (
        |    SELECT p.vec_id, c.cell,
        |      sum((p.v - c.c) * (p.v - c.c)) AS dist2
        |    FROM ipts p JOIN ctr c ON p.dim = c.dim
        |    GROUP BY p.vec_id, c.cell) d
        |  GROUP BY vec_id),
        |ha AS (
        |  SELECT least(31, greatest(0,
        |      CAST(floor((dist2 - 0.0) / 2.0 * 32) AS BIGINT))) AS bin,
        |    count(*) AS ca
        |  FROM ad GROUP BY 1),
        |hb AS (
        |  SELECT least(31, greatest(0,
        |      CAST(floor((dist2 - 0.0) / 2.0 * 32) AS BIGINT))) AS bin,
        |    count(*) AS cb
        |  FROM id2 GROUP BY 1),
        |j AS (SELECT coalesce(ha.bin, hb.bin) AS bin,
        |    coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
        |  FROM ha FULL JOIN hb ON ha.bin = hb.bin),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS v,
        |    CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
        |  FROM j),
        |pq AS (SELECT v, na, nb,
        |    (ca + 1.0) / (na + v) AS p, (cb + 1.0) / (nb + v) AS q,
        |    ((ca + 1.0) / (na + v) + (cb + 1.0) / (nb + v)) / 2.0 AS m
        |  FROM j, t)
        |SELECT max(v) AS n_terms, max(na) AS n_a, max(nb) AS n_b,
        |  round(sum((p - q) * ln(p / q)), 6) AS psi,
        |  round(sum(p * ln(p / q)), 6) AS kl_pq,
        |  round(sum(p * ln(p / m) / 2.0 + q * ln(q / m) / 2.0), 6) AS js
        |FROM pq""".stripMargin,

    // The ivf replay with pr <= 1, plus the gate: LEFT JOIN candidate
    // counts (0 for empty probes), under-50 queries swap to the
    // brute-force pair set. Branches are disjoint by query, so one
    // shared rank window serves both.
    "sim_ivf_adaptive" ->
      """WITH pts AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings),
        |ptsl AS (
        |  SELECT label, generate_subscripts(embedding, 1) AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings),
        |ctr AS (SELECT label AS cell, dim, avg(v) AS c FROM ptsl GROUP BY label, dim),
        |assign AS (
        |  SELECT vec_id, cell, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY dist2, cell) AS rn
        |  FROM (SELECT p.vec_id, c.cell, sum((p.v - c.c) * (p.v - c.c)) AS dist2
        |        FROM pts p JOIN ctr c ON p.dim = c.dim
        |        GROUP BY p.vec_id, c.cell) d),
        |cells AS (SELECT vec_id AS neighbor_id, cell FROM assign WHERE rn = 1),
        |probes AS (
        |  SELECT vec_id AS query_id, cell FROM (
        |    SELECT vec_id, cell, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY dist2, cell) AS pr
        |    FROM (SELECT p.vec_id, c.cell, sum((p.v - c.c) * (p.v - c.c)) AS dist2
        |          FROM pts p JOIN ctr c ON p.dim = c.dim
        |          WHERE p.vec_id < 10
        |          GROUP BY p.vec_id, c.cell) d) r
        |  WHERE pr <= 1),
        |cand AS MATERIALIZED (
        |  SELECT pr.query_id, ce.neighbor_id
        |  FROM probes pr JOIN cells ce ON pr.cell = ce.cell
        |  WHERE pr.query_id <> ce.neighbor_id),
        |under AS MATERIALIZED (
        |  SELECT q.vec_id AS query_id
        |  FROM embeddings q LEFT JOIN cand cd ON cd.query_id = q.vec_id
        |  WHERE q.vec_id < 10
        |  GROUP BY q.vec_id
        |  HAVING count(cd.neighbor_id) < 50),
        |allc AS (
        |  SELECT query_id, neighbor_id, FALSE AS fell_back FROM cand
        |  WHERE query_id NOT IN (SELECT query_id FROM under)
        |  UNION ALL
        |  SELECT u.query_id, e.vec_id AS neighbor_id, TRUE AS fell_back
        |  FROM under u, embeddings e WHERE e.vec_id <> u.query_id),
        |scored AS (
        |  SELECT cd.query_id, cd.neighbor_id, cd.fell_back,
        |    list_cosine_similarity(q.embedding::DOUBLE[], n.embedding::DOUBLE[]) AS cs
        |  FROM allc cd
        |  JOIN embeddings q ON q.vec_id = cd.query_id
        |  JOIN embeddings n ON n.vec_id = cd.neighbor_id),
        |r AS (
        |  SELECT query_id, neighbor_id, fell_back, cs, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS rnk
        |  FROM scored)
        |SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk,
        |  round(cs, 4) AS cos, fell_back
        |FROM r WHERE rnk <= 3
        |ORDER BY query_id, rnk""".stripMargin,

    // Ground truth re-derived exactly as sim_topk_bruteforce's oracle
    // (full-precision cosine, ties by neighbor id), buckets exactly as
    // sim_lsh_buckets' — the recall joins the two hash-green surfaces.
    "sim_lsh_recall" ->
      s"""WITH p AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cs
         |  FROM embeddings q, embeddings c
         |  WHERE q.vec_id < 50 AND c.vec_id <> q.vec_id),
         |r AS (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS rnk
         |  FROM p),
         |t AS (SELECT query_id, neighbor_id FROM r WHERE rnk <= 5),
         |b AS (SELECT vec_id, CAST(${bucketSql("embedding", 8)} AS BIGINT) AS bucket
         |      FROM embeddings)
         |SELECT CAST(count(DISTINCT t.query_id) AS BIGINT) AS n_queries,
         |  CAST(count(*) AS BIGINT) AS n_truth,
         |  CAST(sum(CASE WHEN bq.bucket = bn.bucket THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_hit,
         |  round(sum(CASE WHEN bq.bucket = bn.bucket THEN 1 ELSE 0 END) * 1.0
         |    / count(*), 4) + 0.0 AS recall_at_5
         |FROM t
         |JOIN b bq ON t.query_id = bq.vec_id
         |JOIN b bn ON t.neighbor_id = bn.vec_id""".stripMargin,

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
         |ORDER BY query_id, rnk""".stripMargin,

    // round() is half-away-from-zero in both engines, and both compute
    // v * 127 / max|v| in double — the integer codes match bit-for-bit.
    "sim_quantize_int8" ->
      """WITH lf AS (
        |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings),
        |ma AS (SELECT vec_id, nullif(max(abs(v)), 0) AS ma
        |       FROM lf GROUP BY vec_id),
        |q AS (
        |  SELECT lf.vec_id, lf.v, round(lf.v * 127 / ma.ma) AS qi,
        |    ma.ma / 127 AS scale
        |  FROM lf JOIN ma USING (vec_id))
        |SELECT vec_id,
        |  round(max(scale), 6) + 0.0 AS q_scale,
        |  CAST(sum(CAST(qi AS BIGINT)) AS BIGINT) AS q_sum,
        |  CAST(sum(abs(CAST(qi AS BIGINT))) AS BIGINT) AS q_l1,
        |  round(sqrt(sum(pow(v - qi * scale, 2))), 6) + 0.0 AS q_err_l2
        |FROM q
        |GROUP BY vec_id
        |ORDER BY vec_id""".stripMargin,

    // Top-2 probe assignment (the ivf probes CTE over ALL points),
    // directed shared-cell pairs deduped, cosine + per-source rank.
    "sim_knn_graph" ->
      """WITH pts AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings),
        |ptsl AS (
        |  SELECT label, generate_subscripts(embedding, 1) AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings),
        |ctr AS (SELECT label AS cell, dim, avg(v) AS c FROM ptsl GROUP BY label, dim),
        |assign AS MATERIALIZED (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY dist2, cell) AS rn
        |    FROM (SELECT p.vec_id, c.cell, sum((p.v - c.c) * (p.v - c.c)) AS dist2
        |          FROM pts p JOIN ctr c ON p.dim = c.dim
        |          GROUP BY p.vec_id, c.cell) d) r
        |  WHERE rn <= 2),
        |prs AS (
        |  SELECT DISTINCT a.vec_id AS src_id, b.vec_id AS neighbor_id
        |  FROM assign a JOIN assign b
        |    ON a.cell = b.cell AND a.vec_id <> b.vec_id),
        |scored AS (
        |  SELECT pr.src_id, pr.neighbor_id,
        |    list_cosine_similarity(q.embedding::DOUBLE[], n.embedding::DOUBLE[]) AS cs
        |  FROM prs pr
        |  JOIN embeddings q ON q.vec_id = pr.src_id
        |  JOIN embeddings n ON n.vec_id = pr.neighbor_id),
        |r AS (
        |  SELECT src_id, neighbor_id, cs, row_number() OVER (
        |    PARTITION BY src_id ORDER BY cs DESC, neighbor_id) AS rnk
        |  FROM scored)
        |SELECT src_id, neighbor_id, CAST(rnk AS INT) AS rnk,
        |  round(cs, 4) AS cos
        |FROM r WHERE rnk <= 3
        |ORDER BY src_id, rnk""".stripMargin,

    // Assignment replay against the finer label×residue centroids,
    // then the histogram + cumulative ledger. DuckDB sums BIGINT into
    // HUGEINT — both running totals cast back to BIGINT to match the
    // engine's long columns.
    "sim_cell_budget_tune" ->
      """WITH pts AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings),
        |base AS (
        |  SELECT CAST(label AS BIGINT) * 3 + vec_id % 3 AS fcell,
        |    generate_subscripts(embedding, 1) AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings),
        |ctr AS (SELECT fcell AS cell, dim, avg(v) AS c
        |        FROM base GROUP BY fcell, dim),
        |assign AS MATERIALIZED (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY dist2, cell) AS rn
        |    FROM (SELECT p.vec_id, c.cell, sum((p.v - c.c) * (p.v - c.c)) AS dist2
        |          FROM pts p JOIN ctr c ON p.dim = c.dim
        |          GROUP BY p.vec_id, c.cell) d) r
        |  WHERE rn <= 2),
        |hist AS (SELECT cell, count(*) AS cs FROM assign GROUP BY cell),
        |sizes AS (SELECT cs AS cell_size, count(*) AS n_cells
        |          FROM hist GROUP BY cs),
        |cum AS (
        |  SELECT cell_size, n_cells,
        |    cell_size * (cell_size - 1) * n_cells AS pairs,
        |    CAST(sum(cell_size * (cell_size - 1) * n_cells)
        |      OVER (ORDER BY cell_size) AS BIGINT) AS cum_pairs
        |  FROM sizes)
        |SELECT cell_size, n_cells, pairs, cum_pairs,
        |  cum_pairs <= (SELECT 8 * count(*) FROM embeddings) AS within_budget
        |FROM cum ORDER BY cell_size""".stripMargin,

    // The knn replay, reciprocity via EXISTS (mutual sets are already
    // symmetric, so the canonicalized edge set is the set itself),
    // then 4 unrolled label-propagation rounds and the universe join.
    "sim_knn_communities" -> {
      val rounds = (1 to 4).map { r =>
        s"""l$r AS MATERIALIZED (
           |  SELECT src AS id, nl AS label FROM (
           |    SELECT src, nl, row_number() OVER (
           |      PARTITION BY src ORDER BY c DESC, nl) AS rn
           |    FROM (SELECT e.src, l.label AS nl, count(*) AS c
           |          FROM edges e JOIN l${r - 1} l ON l.id = e.dst
           |          GROUP BY e.src, l.label) t) rk
           |  WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH pts AS (
         |  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         |    CAST(unnest(embedding) AS DOUBLE) AS v
         |  FROM embeddings),
         |ptsl AS (
         |  SELECT label, generate_subscripts(embedding, 1) AS dim,
         |    CAST(unnest(embedding) AS DOUBLE) AS v
         |  FROM embeddings),
         |ctr AS (SELECT label AS cell, dim, avg(v) AS c FROM ptsl GROUP BY label, dim),
         |assign AS MATERIALIZED (
         |  SELECT vec_id, cell FROM (
         |    SELECT vec_id, cell, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY dist2, cell) AS rn
         |    FROM (SELECT p.vec_id, c.cell, sum((p.v - c.c) * (p.v - c.c)) AS dist2
         |          FROM pts p JOIN ctr c ON p.dim = c.dim
         |          GROUP BY p.vec_id, c.cell) d) r
         |  WHERE rn <= 2),
         |prs AS (
         |  SELECT DISTINCT a.vec_id AS src_id, b.vec_id AS neighbor_id
         |  FROM assign a JOIN assign b
         |    ON a.cell = b.cell AND a.vec_id <> b.vec_id),
         |scored AS (
         |  SELECT pr.src_id, pr.neighbor_id,
         |    list_cosine_similarity(q.embedding::DOUBLE[], n.embedding::DOUBLE[]) AS cs
         |  FROM prs pr
         |  JOIN embeddings q ON q.vec_id = pr.src_id
         |  JOIN embeddings n ON n.vec_id = pr.neighbor_id),
         |knn AS MATERIALIZED (
         |  SELECT src_id, neighbor_id FROM (
         |    SELECT src_id, neighbor_id, row_number() OVER (
         |      PARTITION BY src_id ORDER BY cs DESC, neighbor_id) AS rnk
         |    FROM scored) t
         |  WHERE rnk <= 3),
         |edges AS MATERIALIZED (
         |  SELECT a.src_id AS src, a.neighbor_id AS dst FROM knn a
         |  WHERE EXISTS (SELECT 1 FROM knn b
         |    WHERE b.src_id = a.neighbor_id AND b.neighbor_id = a.src_id)),
         |l0 AS MATERIALIZED (
         |  SELECT DISTINCT src AS id, src AS label FROM edges),
         |$rounds
         |SELECT e.vec_id, COALESCE(l.label, e.vec_id) AS community
         |FROM embeddings e LEFT JOIN l4 l ON l.id = e.vec_id
         |ORDER BY vec_id""".stripMargin
    },

    // The knn replay, then one NN-descent round: symmetric closure,
    // neighbor-of-neighbor candidates unioned with direct edges,
    // re-scored and re-ranked per source — the shared prefix verbatim,
    // publishing round one's top-3.
    "sim_knn_refine" -> (knnRefineRoundOne +
      """
        |SELECT src_id, neighbor_id, CAST(rnk AS INT) AS rnk,
        |  round(cs, 4) AS cos
        |FROM r2 WHERE rnk <= 3
        |ORDER BY src_id, rnk""".stripMargin),

    // The convergence knob's oracle: the engine iterates until a round
    // changes zero directed edges (tol = 0) or maxRounds = 2; a fixed
    // point is idempotent under further rounds, so whether the loop
    // stopped after 1 round or ran both, the result equals this
    // unrolled TWO-round twin — the shared prefix plus one more
    // identical refinement round chained on round one's top-3.
    "sim_knn_refine_converged" -> (knnRefineRoundOne +
      """,
        |knn2 AS MATERIALIZED (
        |  SELECT src_id, neighbor_id FROM r2 WHERE rnk <= 3),
        |und2 AS MATERIALIZED (
        |  SELECT DISTINCT a, b FROM (
        |    SELECT src_id AS a, neighbor_id AS b FROM knn2
        |    UNION ALL SELECT neighbor_id, src_id FROM knn2) u),
        |cand2 AS (
        |  SELECT DISTINCT x.a AS src_id, y.b AS neighbor_id
        |  FROM und2 x JOIN und2 y ON x.b = y.a
        |  WHERE x.a <> y.b
        |  UNION
        |  SELECT a, b FROM und2),
        |sc3 AS (
        |  SELECT c.src_id, c.neighbor_id,
        |    list_cosine_similarity(q.embedding::DOUBLE[], n.embedding::DOUBLE[]) AS cs
        |  FROM cand2 c
        |  JOIN embeddings q ON q.vec_id = c.src_id
        |  JOIN embeddings n ON n.vec_id = c.neighbor_id),
        |r3 AS (
        |  SELECT src_id, neighbor_id, cs, row_number() OVER (
        |    PARTITION BY src_id ORDER BY cs DESC, neighbor_id) AS rnk
        |  FROM sc3)
        |SELECT src_id, neighbor_id, CAST(rnk AS INT) AS rnk,
        |  round(cs, 4) AS cos
        |FROM r3 WHERE rnk <= 3
        |ORDER BY src_id, rnk""".stripMargin),

    // 6 unrolled farthest-point rounds: each round one distance table
    // to the newly selected point, a least() fold into the running
    // min-distance, and an ORDER BY mind DESC, id LIMIT 1 argmax over
    // the not-yet-selected — the engine's min-struct argmax literally.
    // Selection comparisons run on unrounded doubles (the sim_ivf
    // precedent); only the published radius rounds.
    "sim_kcenter_coreset" -> {
      // NOTE (sf0.1 lesson): the newly-selected point must be reduced
      // to its 64 (dim, v) rows in a SUBQUERY before the dim-keyed
      // join — the earlier `pts q ON p.dim = q.dim AND q.id =
      // (SELECT ...)` form let DuckDB run the dim join FIRST (128k ×
      // 2k rows per round at sf0.1 → minutes/OOM) and filter the
      // scalar afterwards; pre-restricting q makes each round's
      // distance table 0.03s at sf0.1.
      val rounds = (1 to 5).map { r =>
        val selected = ("SELECT id FROM s1" +:
          (1 until r).map(i => s"SELECT id FROM m$i")).mkString(" UNION ")
        val prev = if (r == 1) "c1" else s"c$r"
        // m_r: argmax over cur frame c_r; c_{r+1}: fold in m_r's point
        s"""m$r AS MATERIALIZED (
           |  SELECT id, mind FROM $prev
           |  WHERE id NOT IN ($selected)
           |  ORDER BY mind DESC, id LIMIT 1),
           |c${r + 1} AS MATERIALIZED (
           |  SELECT c.id, least(c.mind, d.d2) AS mind
           |  FROM $prev c JOIN (
           |    SELECT p.id, sum((p.v - q.v) * (p.v - q.v)) AS d2
           |    FROM pts p JOIN (
           |      SELECT t.dim, t.v FROM pts t JOIN m$r mm ON t.id = mm.id) q
           |      ON p.dim = q.dim
           |    GROUP BY p.id) d USING (id))""".stripMargin
      }.mkString(",\n")
      val out = (2 to 6).map(r =>
        s"""UNION ALL SELECT $r AS sel_rank, (SELECT id FROM m${r - 1}) AS vec_id,
           |  round(sqrt((SELECT mind FROM m${r - 1})), 6) + 0.0 AS radius"""
          .stripMargin).mkString("\n")
      s"""WITH pts AS MATERIALIZED (
         |  SELECT vec_id AS id, generate_subscripts(embedding, 1) AS dim,
         |    CAST(unnest(embedding) AS DOUBLE) AS v
         |  FROM embeddings),
         |s1 AS MATERIALIZED (SELECT min(id) AS id FROM pts),
         |c1 AS MATERIALIZED (
         |  SELECT p.id, sum((p.v - q.v) * (p.v - q.v)) AS mind
         |  FROM pts p JOIN (
         |    SELECT t.dim, t.v FROM pts t JOIN s1 ss ON t.id = ss.id) q
         |    ON p.dim = q.dim
         |  GROUP BY p.id),
         |$rounds
         |SELECT CAST(sel_rank AS INT) AS sel_rank, vec_id, radius FROM (
         |SELECT 1 AS sel_rank, (SELECT id FROM s1) AS vec_id, 0.0 AS radius
         |$out
         |) ORDER BY sel_rank""".stripMargin
    },

    // Full PQ replay: per-subspace Lloyd (2 unrolled rounds, seeds =
    // the 8 lowest vec_ids — dense 0-based, so cid = vec_id), encode,
    // query distance tables, ADC sum + rank. sub = (dim-1) // 16 keeps
    // every distance term inside its subspace because dims are disjoint
    // across subs — the same argument the engine's dim-join makes.
    "sim_pq_topk" ->
      """WITH pts0 AS (
        |  SELECT vec_id, CAST(generate_subscripts(embedding, 1) AS INT) AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings),
        |pts AS MATERIALIZED (
        |  SELECT vec_id, dim, v, (dim - 1) // 16 AS sub FROM pts0),
        |c0 AS (SELECT CAST(vec_id AS INT) AS cid, dim, v AS c
        |       FROM pts WHERE vec_id < 8),
        |d1 AS (SELECT p.vec_id, p.sub, c.cid,
        |    sum((p.v - c.c) * (p.v - c.c)) AS d2
        |  FROM pts p JOIN c0 c ON p.dim = c.dim
        |  GROUP BY p.vec_id, p.sub, c.cid),
        |a1 AS (SELECT vec_id, sub, cid FROM (
        |    SELECT vec_id, sub, cid, row_number() OVER (
        |      PARTITION BY vec_id, sub ORDER BY d2, cid) AS rn
        |    FROM d1) WHERE rn = 1),
        |c1 AS (SELECT a.cid, p.dim, avg(p.v) AS c
        |  FROM pts p JOIN a1 a ON p.vec_id = a.vec_id AND p.sub = a.sub
        |  GROUP BY a.cid, p.dim),
        |d2s AS (SELECT p.vec_id, p.sub, c.cid,
        |    sum((p.v - c.c) * (p.v - c.c)) AS d2
        |  FROM pts p JOIN c1 c ON p.dim = c.dim
        |  GROUP BY p.vec_id, p.sub, c.cid),
        |a2 AS (SELECT vec_id, sub, cid FROM (
        |    SELECT vec_id, sub, cid, row_number() OVER (
        |      PARTITION BY vec_id, sub ORDER BY d2, cid) AS rn
        |    FROM d2s) WHERE rn = 1),
        |c2 AS MATERIALIZED (SELECT a.cid, p.dim, avg(p.v) AS c
        |  FROM pts p JOIN a2 a ON p.vec_id = a.vec_id AND p.sub = a.sub
        |  GROUP BY a.cid, p.dim),
        |codes AS MATERIALIZED (SELECT vec_id, sub, cid FROM (
        |    SELECT p.vec_id, p.sub, c.cid, row_number() OVER (
        |      PARTITION BY p.vec_id, p.sub ORDER BY
        |        sum((p.v - c.c) * (p.v - c.c)), c.cid) AS rn
        |    FROM pts p JOIN c2 c ON p.dim = c.dim
        |    GROUP BY p.vec_id, p.sub, c.cid) WHERE rn = 1),
        |dt AS MATERIALIZED (SELECT p.vec_id AS query_id, p.sub, c.cid,
        |    sum((p.v - c.c) * (p.v - c.c)) AS pd
        |  FROM pts p JOIN c2 c ON p.dim = c.dim
        |  WHERE p.vec_id < 10
        |  GROUP BY p.vec_id, p.sub, c.cid),
        |cand AS (SELECT dt.query_id, co.vec_id AS neighbor_id,
        |    round(sum(dt.pd), 4) + 0.0 AS adist2
        |  FROM codes co JOIN dt ON co.sub = dt.sub AND co.cid = dt.cid
        |  WHERE co.vec_id <> dt.query_id
        |  GROUP BY dt.query_id, co.vec_id)
        |SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk, adist2
        |FROM (SELECT query_id, neighbor_id, adist2, row_number() OVER (
        |    PARTITION BY query_id ORDER BY adist2, neighbor_id) AS rnk
        |  FROM cand)
        |WHERE rnk <= 3
        |ORDER BY query_id, rnk""".stripMargin,

    // sim_pq_topk's full chain, then ADC top-3 vs list_distance
    // (euclidean — monotone with the engine's squared ranking) truth.
    "sim_pq_recall" ->
      """WITH pts0 AS (
        |  SELECT vec_id, CAST(generate_subscripts(embedding, 1) AS INT) AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings),
        |pts AS MATERIALIZED (
        |  SELECT vec_id, dim, v, (dim - 1) // 16 AS sub FROM pts0),
        |c0 AS (SELECT CAST(vec_id AS INT) AS cid, dim, v AS c
        |       FROM pts WHERE vec_id < 8),
        |d1 AS (SELECT p.vec_id, p.sub, c.cid,
        |    sum((p.v - c.c) * (p.v - c.c)) AS d2
        |  FROM pts p JOIN c0 c ON p.dim = c.dim
        |  GROUP BY p.vec_id, p.sub, c.cid),
        |a1 AS (SELECT vec_id, sub, cid FROM (
        |    SELECT vec_id, sub, cid, row_number() OVER (
        |      PARTITION BY vec_id, sub ORDER BY d2, cid) AS rn
        |    FROM d1) WHERE rn = 1),
        |c1 AS (SELECT a.cid, p.dim, avg(p.v) AS c
        |  FROM pts p JOIN a1 a ON p.vec_id = a.vec_id AND p.sub = a.sub
        |  GROUP BY a.cid, p.dim),
        |d2s AS (SELECT p.vec_id, p.sub, c.cid,
        |    sum((p.v - c.c) * (p.v - c.c)) AS d2
        |  FROM pts p JOIN c1 c ON p.dim = c.dim
        |  GROUP BY p.vec_id, p.sub, c.cid),
        |a2 AS (SELECT vec_id, sub, cid FROM (
        |    SELECT vec_id, sub, cid, row_number() OVER (
        |      PARTITION BY vec_id, sub ORDER BY d2, cid) AS rn
        |    FROM d2s) WHERE rn = 1),
        |c2 AS MATERIALIZED (SELECT a.cid, p.dim, avg(p.v) AS c
        |  FROM pts p JOIN a2 a ON p.vec_id = a.vec_id AND p.sub = a.sub
        |  GROUP BY a.cid, p.dim),
        |codes AS MATERIALIZED (SELECT vec_id, sub, cid FROM (
        |    SELECT p.vec_id, p.sub, c.cid, row_number() OVER (
        |      PARTITION BY p.vec_id, p.sub ORDER BY
        |        sum((p.v - c.c) * (p.v - c.c)), c.cid) AS rn
        |    FROM pts p JOIN c2 c ON p.dim = c.dim
        |    GROUP BY p.vec_id, p.sub, c.cid) WHERE rn = 1),
        |dt AS MATERIALIZED (SELECT p.vec_id AS query_id, p.sub, c.cid,
        |    sum((p.v - c.c) * (p.v - c.c)) AS pd
        |  FROM pts p JOIN c2 c ON p.dim = c.dim
        |  WHERE p.vec_id < 10
        |  GROUP BY p.vec_id, p.sub, c.cid),
        |cand AS (SELECT dt.query_id, co.vec_id AS neighbor_id,
        |    round(sum(dt.pd), 4) + 0.0 AS adist2
        |  FROM codes co JOIN dt ON co.sub = dt.sub AND co.cid = dt.cid
        |  WHERE co.vec_id <> dt.query_id
        |  GROUP BY dt.query_id, co.vec_id),
        |pqr AS MATERIALIZED (SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id, row_number() OVER (
        |      PARTITION BY query_id ORDER BY adist2, neighbor_id) AS rnk
        |    FROM cand) WHERE rnk <= 3),
        |tr AS MATERIALIZED (SELECT query_id, neighbor_id FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |        list_distance(q.embedding::DOUBLE[], c.embedding::DOUBLE[]),
        |        c.vec_id) AS rnk
        |    FROM embeddings q, embeddings c
        |    WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id)
        |  WHERE rnk <= 3),
        |h AS (SELECT count(*) AS n FROM tr
        |  JOIN pqr USING (query_id, neighbor_id))
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM tr) AS n_truth,
        |  (SELECT CAST(n AS BIGINT) FROM h) AS n_hit,
        |  round((SELECT n FROM h) * 1.0 /
        |    (SELECT count(*) FROM tr), 4) + 0.0 AS recall_at_3""".stripMargin,

    // the shared IVF+PQ chain with the plain ADC top-3 tail
    "sim_ivfpq_topk" -> (ivfPqAdcChain +
      """
        |SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk, adist2
        |FROM (SELECT query_id, neighbor_id, adist2, row_number() OVER (
        |    PARTITION BY query_id ORDER BY adist2, neighbor_id) AS rnk
        |  FROM adc)
        |WHERE rnk <= 3
        |ORDER BY query_id, rnk""".stripMargin),

    // the shared chain, ADC top-10 pool, then exact-L2 re-rank of the
    // pool from the full-precision long form — the refine stage replay
    "sim_ivfpq_rerank" -> (ivfPqAdcChain +
      """,
        |radc AS MATERIALIZED (SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id, row_number() OVER (
        |      PARTITION BY query_id ORDER BY adist2, neighbor_id) AS rnk
        |    FROM adc) WHERE rnk <= 10),
        |rr AS (SELECT r.query_id, r.neighbor_id,
        |    round(sum((pq.v - pn.v) * (pq.v - pn.v)), 4) + 0.0 AS dist2
        |  FROM radc r
        |  JOIN pts pq ON pq.vec_id = r.query_id
        |  JOIN pts pn ON pn.vec_id = r.neighbor_id AND pn.dim = pq.dim
        |  GROUP BY r.query_id, r.neighbor_id)
        |SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk, dist2
        |FROM (SELECT query_id, neighbor_id, dist2, row_number() OVER (
        |    PARTITION BY query_id ORDER BY dist2, neighbor_id) AS rnk
        |  FROM rr)
        |WHERE rnk <= 3
        |ORDER BY query_id, rnk""".stripMargin)
  )
}
