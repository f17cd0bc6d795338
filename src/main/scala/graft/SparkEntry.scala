package graft

import graft.packs._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see SURVEY.md §7 and the builder prompt.
  *
  * Queries are contributed by domain packs (one per SURVEY §2 section);
  * this object only aggregates them and asserts name uniqueness.
  */
object SparkEntry {

  /** All query packs. Order matters only for duplicate detection. */
  private val packs: Seq[QueryPack] = Seq(
    RelationalQueries,
    ExtendedRelationalQueries,
    DataflowQueries,
    TextFeatureQueries,
    StatsQueries,
    MLQueries,
    DedupQueries,
    SimilarityQueries,
    TextAnalysisQueries,
    UrlQueries,
    HtmlQueries,
    CurationQueries,
    MultimodalQueries,
    StreamingQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TextFeatureQueries.flagshipTfidf(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = packs.flatMap(_.queries.toSeq)
    require(all.map(_._1).distinct.size == all.size,
      s"duplicate query names across packs: ${
        all.groupBy(_._1).collect { case (n, vs) if vs.size > 1 => n }.mkString(",")}")
    all.toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Keys absent here get a rows-only check.
    */
  val oracleSql: Map[String, String] = packs.flatMap(_.oracles.toSeq).toMap

  /** Headline queries for Bench (heavier, scale-representative subset).
    * Policy: the bench measures SCALE PATHS only — every quadratic exact
    * twin (all-pairs cosine, brute-force top-k, ungated jaccard) stays in
    * the correctness set but out of the bench, replaced by its gated/
    * indexed counterpart (cells, IVF, banded candidates). Iterative
    * index BUILDS whose sf0.1 wall time is ~all fixed per-round job
    * overhead (dedup_suffix_ranks: ~12 doubling rounds over 2k tokens)
    * are measured in StressBench at representative token counts
    * instead — their bench-scale number would track scheduler latency,
    * not the operator.
    */
  val benchNames: Seq[String] = Seq(
    "q1_agg", "q3_join_topk", "q5_broadcast_join", "q6_revenue_filter",
    "flagship_tfidf",
    "window_topk_per_group", "asof_join_events_orders", "sessionize_events",
    "f1_countvec_vocab", "f5_tfidf_transform",
    "n1_multinomial_nb_fit", "n3_nb_predict_lang", "c1_kmeans_assign",
    "dedup_minhash_candidates", "dedup_ngram_jaccard",
    "dedup_embedding_cosine_cells", "dedup_embedding_cosine_cells2",
    "dedup_simhash", "dedup_simhash_blocked", "dedup_pipeline_clusters",
    "dedup_provenance_clusters", "dedup_segment_clean",
    "dedup_clusters_total", "dedup_repeated_spans",
    "dedup_repeated_spans_clean", "streaming_tumbling_counts",
    // sim_pq_topk / sim_ivfpq_topk stay OUT of the bench by the same
    // policy that excludes dedup_suffix_ranks: their sf0.1 wall time is
    // ~20 codebook-training jobs of fixed scheduler overhead (5k
    // vectors), not operator throughput — StressBench measures them at
    // 1M vectors (pq_adc_topk / ivfpq_gated_topk).
    // r12 additions — both single-pass scale paths (assignment/signature
    // + one gated join), neither iterative: the round's OTHER new
    // operators (kcore, label propagation, k-center, adaptive-ivf) stay
    // correctness-only by the iterative-job-overhead policy above;
    // StressBench prices them at representative scale instead.
    "sim_knn_graph", "dedup_incremental_pairs",
    // r13 additions — sim_knn_refine is the one new single-pass scale
    // path (closure + salted mid join + rank, no iteration);
    // dedup_lsh_tune is metadata-scale (16 rows) and the multimodal
    // coverage queries are count-only — all three stay correctness-only
    "sim_knn_refine",
    "sim_ivf_topk", "sim_lsh_topk", "sim_quantize_int8",
    "text_quality", "text_fingerprint", "text_phrase_search",
    "er_link_customers", "multimodal_decode_meta",
    "multimodal_downsample", "multimodal_image_ahash",
    "window_tumbling_events",
    // r15 continuation — the new curation front end's scale paths:
    // line keep-first (two hash shuffles + reassembly; the boilerplate
    // twin adds only a COUNT DISTINCT threshold agg and stays
    // correctness-only), jusText extraction (pure map-side regex), and
    // the capstone disposition (the whole funnel in one plan)
    "dedup_line_keepfirst", "html_main_content", "curation_disposition",
    // r16 — the new model-stage plans: the scored funnel (disposition +
    // in-corpus logistic gate), the declarative pipeline grid (two
    // corpus passes independent of grid size), and the uniform
    // three-family score reduction
    "curation_scored", "cv_grid_search_pipeline", "ml_score_uniform",
    // r17 — the round's single-pass scale paths: globally-exact packing
    // (two-phase prefix + span explode), exact tie-aware AUC (bounded
    // histogram rank), snapshot drift (vocab-bounded full join), and
    // the one-pass column profile (exact multi-distinct expand priced).
    // The unigram tokenizer stays correctness-only by the
    // iterative-job-overhead policy (2 EM rounds of vocabulary-scale
    // jobs); StressBench prices it at 20M tokens.
    "pack_sequences", "ml_auc_exact", "drift_token_psi", "profile_numeric",
    // r18 — the round's single-pass scale paths: batch phrase search
    // (one index build amortized across the phrase set — at 20M tokens
    // the 8-phrase batch costs LESS than one pre-fix single-phrase
    // query) and CCNet perplexity bucketing (two corpus aggregations +
    // one sketch pass, no global sort). curation_lm_topm stays
    // correctness-only: it re-runs the whole scored funnel already
    // priced by curation_scored.
    "text_phrase_search_multi", "text_ppl_buckets",
    // r19: the durable-asset paths (build + partition-pruned query in
    // one timed region — the amortize-the-index production shape); new
    // entries have no prior-round baseline, so the retry gate arms at
    // r20
    "text_phrase_search_indexed", "sim_ivf_indexed",
    // r20: the asset-maintenance paths — build + append + compacting
    // rewrite + pruned query (the small-file lifecycle priced end to
    // end), and the drift report (two bounded corpus passes + a
    // bins-scale reduction). New entries, gate arms at r21.
    "text_phrase_index_compact", "sim_ivf_drift")
}
