package graft.packs

import graft.QueryPack
import graft.core.Tables
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** Text analysis (north-star extension): quality features, token stats,
  * fingerprints. Language-ID is `n3_nb_predict_lang` in MLQueries.
  */
object TextAnalysisQueries extends QueryPack {

  private val stopPred =
    TextAnalysis.DefaultStopwords.map(w => s"t = '$w'").mkString(" OR ")

  /** Per-(sf, JVM, suffix) tmp path for a positional-index asset —
    * concurrent verify runs must not cross-read, and the asset is
    * BIGGER than the corpus (one row per token), so leaking it per JVM
    * filled /tmp across verify/bench invocations (r18 advice). Each
    * path registers ONE shutdown hook that removes it; the bench
    * harness additionally sweeps between timed queries (disk residue
    * competes with DISK_ONLY spill).
    */
  private val hookedIndexPaths =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private[packs] def tmpIndexPath(dir: String, suffix: String): String = {
    val path =
      s"${System.getProperty("java.io.tmpdir")}/graft_posidx$suffix" +
        s"_${dir.replaceAll("[^A-Za-z0-9]", "")}" +
        s"_${ProcessHandle.current().pid()}"
    if (hookedIndexPaths.add(path))
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete(): Unit
        }
        rm(new java.io.File(path))
      }))
    path
  }

  /** Shared phrase batch for text_phrase_search_multi — one list, used
    * verbatim by the engine call and the generated oracle.
    */
  private val multiPhrases: Seq[Seq[String]] = Seq(
    Seq("slow", "hash", "batch"), Seq("fast", "table"), Seq("sort", "agg"))

  /** Shared by text_phrase_search AND text_phrase_search_indexed — the
    * in-memory and durable-index paths return identical rows.
    */
  private[packs] val phraseSearchOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '')
      |    AS ts FROM documents),
      |idx AS MATERIALIZED (
      |  SELECT doc_id, CAST(generate_subscripts(ts, 1) AS INT) - 1 AS pos,
      |    unnest(ts) AS term
      |  FROM toks)
      |SELECT d0.doc_id, count(*) AS n_matches
      |FROM (SELECT doc_id, pos FROM idx WHERE term = 'slow') d0
      |JOIN (SELECT doc_id, pos - 1 AS pos FROM idx WHERE term = 'hash') d1
      |  USING (doc_id, pos)
      |JOIN (SELECT doc_id, pos - 2 AS pos FROM idx WHERE term = 'batch') d2
      |  USING (doc_id, pos)
      |GROUP BY d0.doc_id
      |ORDER BY d0.doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "text_quality" -> ((s, dir) => {
      TextAnalysis.qualityFeatures(Tables(s, dir).documents, "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Per-doc unigram Shannon entropy (repetitive/boilerplate signal).
    "text_unigram_entropy" -> ((s, dir) => {
      TextAnalysis.unigramEntropy(Tables(s, dir).documents, "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Zipf slope of the corpus frequency spectrum (templated-corpus
    // detector; natural text ~ −1).
    "text_zipf_slope" -> ((s, dir) => {
      TextAnalysis.zipfSlope(Tables(s, dir).documents, "text", topK = 100)
    }),

    "text_token_stats" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      TextAnalysis.tokenStats(docs, "lang", "text")
        .join(TextAnalysis.distinctTermStats(docs, "lang", "text"), "lang")
        .select(col("lang"), col("n_docs"), col("n_tokens"),
          col("n_subtokens"), col("n_distinct_terms"))
        .orderBy(col("lang"))
    }),

    "text_fingerprint" -> ((s, dir) => {
      TextAnalysis.fingerprints(Tables(s, dir).documents, "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Overlapping token-window chunking (the embedding/RAG prep step):
    // 16-token windows advancing by 12 — every token lands in >= 1
    // chunk, boundary sentences in 2. One in-row transform + explode.
    "text_chunk_windows" -> ((s, dir) => {
      TextAnalysis.chunkWindows(Tables(s, dir).documents, "doc_id", "text",
          windowTokens = 16, strideTokens = 12)
        .select(col("doc_id"), col("chunk_id"),
          md5(col("chunk_text")).as("chunk_md5"), col("n_tokens"))
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    // Normalization-before-hashing (CCNet): case/punct variants of the
    // same content collapse to one normalized hash — the key space raw
    // md5 dedup misses. Dup-mate counts under the NORMALIZED key ride
    // each row.
    "text_normalize" -> ((s, dir) => {
      val n = TextAnalysis.normalizeText(Tables(s, dir).documents, "text")
        .select(col("doc_id"), length(col("text")).as("n_raw_chars"),
          length(col("norm_text")).as("n_norm_chars"),
          md5(col("norm_text")).as("norm_md5"))
      val m = n.groupBy(col("norm_md5")).agg(count(lit(1)).as("n_mates"))
      n.join(m, "norm_md5")
        .select(col("doc_id"), col("n_raw_chars"), col("n_norm_chars"),
          col("norm_md5"), col("n_mates"))
        .orderBy(col("doc_id"))
    }),

    "text_repetition" -> ((s, dir) => {
      TextAnalysis.repetitionStats(Tables(s, dir).documents, "doc_id", "text", n = 2)
        .orderBy(col("doc_id"))
    }),

    // BM25 lexical retrieval over a fixed query-term bag; rounded score
    // ordering with doc_id tiebreak keeps the top-k engine-identical.
    "text_bm25_search" -> ((s, dir) => {
      TextAnalysis.bm25(Tables(s, dir).documents, "doc_id", "text",
          Seq("spark", "join", "stream"))
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(50)
    }),

    "text_frequent_grams" -> ((s, dir) => {
      TextAnalysis.frequentGrams(Tables(s, dir).documents, "doc_id", "text",
          n = 3, minCount = 2L, k = 100)
        .orderBy(col("n_occurrences").desc, col("gram"))
    }),

    // EXACT frequent 3-grams through the count-min gate (two-pass heavy
    // hitters, Sketches.heavyHitters): the CMS's one-sided error makes
    // the gated candidate set a SUPERSET of the true >=threshold grams,
    // so the exact recount of survivors returns the identical answer a
    // full groupBy would — the oracle is the plain HAVING query, no
    // approximation anywhere in the contract. What changes is the plan:
    // pass 2's shuffle carries only gate-surviving instances, bounded by
    // the hot-cell mass instead of the full gram cardinality.
    "text_heavy_grams_sketched" -> ((s, dir) => {
      val grams = Tables(s, dir).documents
        .withColumn("_toks", split(col("text"), " "))
        .where(size(col("_toks")) >= 3)
        .select(explode(expr("transform(sequence(1, size(_toks) - 2), " +
          "i -> array_join(slice(_toks, i, 3), ' '))")).as("gram"))
      graft.stats.Sketches.heavyHitters(grams, "gram", threshold = 8L)
        .orderBy(col("n_occurrences").desc, col("gram"))
    }),

    "text_lm_score" -> ((s, dir) => {
      TextAnalysis.bigramLmScore(Tables(s, dir).documents, "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // CCNet head/middle/tail: tercile cut points over the mean bigram
    // LM score via ONE approx_percentile sketch pass (no global sort),
    // strict-comparison bucketing — rank-insensitive by construction
    // (a cut moving one sample flips only boundary-value docs).
    "text_ppl_buckets" -> ((s, dir) => {
      TextAnalysis.pplBuckets(Tables(s, dir).documentsSpread, "doc_id", "text",
          accuracy = 1000000)
        .orderBy(col("doc_id"))
    }),

    // DSIR importance weights: lang='en' is the in-domain target.
    "text_importance_weights" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      TextAnalysis.importanceWeights(docs,
          docs.where(col("lang") === "en"), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // The synthetic corpus is digit-free, so PII is planted
    // deterministically from doc_id arithmetic (same CASE text on both
    // engines) before applying the generic operator.
    "text_pii_redact" -> ((s, dir) => {
      val aug = Tables(s, dir).documents.withColumn("ptext", expr(
        "concat(text," +
          " CASE WHEN doc_id % 3 = 0 THEN concat(' contact user', doc_id," +
          "   '@mail', doc_id % 7, '.com') ELSE '' END," +
          " CASE WHEN doc_id % 4 = 1 THEN concat(' from 10.0.', doc_id % 256," +
          "   '.', (doc_id * 7) % 256) ELSE '' END," +
          " CASE WHEN doc_id % 5 = 2 THEN concat(' call '," +
          "   lpad(cast(doc_id % 1000 as string), 3, '0'), '-'," +
          "   lpad(cast((doc_id * 3) % 1000 as string), 3, '0'), '-'," +
          "   lpad(cast((doc_id * 9) % 10000 as string), 4, '0')) ELSE '' END)"))
      TextAnalysis.piiStats(aug, "doc_id", "ptext")
        .select(col("doc_id"), col("n_emails"), col("n_ipv4"), col("n_phones"),
          md5(col("redacted")).as("redacted_md5"))
        .orderBy(col("doc_id"))
    }),

    // doc_id % 20 = 0 stands in for the held-out benchmark suite.
    "text_decontaminate" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      TextAnalysis.contaminationStats(
        docs.where(col("doc_id") % 20 =!= 0),
        docs.where(col("doc_id") % 20 === 0),
        "doc_id", "text", n = 5)
        .orderBy(col("doc_id"))
    }),

    // BPE merge learning (Sennrich 2016): 6 merge rounds trained
    // distributively — one corpus pass for the word-frequency table,
    // then pair-count + argmax + in-row greedy fold per round, all on
    // the vocabulary. The oracle unrolls every round, replaying the
    // greedy non-overlapping merge with a list_reduce fold.
    "bpe_learn_merges" -> ((s, dir) => {
      graft.text.Bpe.learnMerges(Tables(s, dir).documents, "text",
          merges = 6)
        .orderBy(col("merge_round"))
    }),

    // The encode side: the 6 learned merges (collected — O(M) driver
    // model state, the ClusterOps-centers precedent) applied to the
    // corpus; per-doc word and BPE-token counts. The oracle replays
    // training AND encoding — its round-r vocabulary table IS the
    // encoded vocab, so the final join prices the compression.
    "bpe_encode_stats" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      val merges = graft.text.Bpe.learnMerges(docs, "text", merges = 6)
        .orderBy(col("merge_round")).collect()
        .map { r => val p = r.getString(1).split(" "); (p(0), p(1)) }.toSeq
      graft.text.Bpe.applyMerges(docs, "doc_id", "text", merges)
        .orderBy(col("doc_id"))
    }),

    // Vocabulary-capped training (the production stopping rule): stop
    // at target vocab = alphabet + merges, here 28 over the corpus's
    // 24-letter alphabet → 4 rounds. The engine computes the alphabet
    // size itself; the oracle recomputes it in SQL and unrolls the 4
    // rounds, so BOTH the cap arithmetic and the merges are value-
    // checked. (Like bpe_learn_merges' ≥6-round assumption, the
    // unroll count assumes the generator's 24-char alphabet.)
    "bpe_vocab_cap" -> ((s, dir) => {
      graft.text.Bpe.learnMergesToVocab(Tables(s, dir).documents, "text",
          targetVocab = 28)
        .orderBy(col("merge_round"))
    }),

    // Byte-level fallback encode: every 7th doc gains words carrying
    // characters ABSENT from the training alphabet (ï/é multibyte,
    // x/9 single-byte — the alphabet is 24 lowercase letters without
    // x/z or digits); they decompose into <0xHH> per UTF-8 byte and
    // still flow through the learned merge folds. n_byte_tokens
    // pins the OOV exposure per doc; unaugmented docs must be
    // bit-identical to bpe_encode_stats' path.
    "bpe_encode_fallback" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      val merges = graft.text.Bpe.learnMerges(docs, "text", merges = 6)
        .orderBy(col("merge_round")).collect()
        .map { r => val p = r.getString(1).split(" "); (p(0), p(1)) }.toSeq
      val alphabet = docs
        .select(explode(split(col("text"), " ")).as("w"))
        .where(length(col("w")) > 0)
        .select(explode(split(col("w"), "")).as("ch")).distinct()
        .orderBy(col("ch")).collect().map(_.getString(0)).toSeq
      val aug = docs.withColumn("ptext", expr(
        "concat(text, CASE WHEN doc_id % 7 = 3" +
          " THEN ' naïve café x9' ELSE '' END)"))
      graft.text.Bpe.applyMergesWithFallback(aug, "doc_id", "ptext",
          merges, alphabet)
        .orderBy(col("doc_id"))
    }),

    // Unigram-LM tokenizer (Kudo 2018, the SentencePiece family):
    // substring seeding (chars + two-phase top-24 multi-char), 2
    // deterministic Viterbi-EM rounds over the distinct-word table,
    // prune to vocab 40. The oracle replays the seed, both EM rounds
    // (the in-row DP fold as a list_reduce), and the prune.
    "unigram_learn" -> ((s, dir) => {
      graft.text.Unigram.learn(Tables(s, dir).documents, "text",
          maxPieceLen = 4, seedMultiTopK = 24, emRounds = 2,
          vocabSize = 40)
        .orderBy(col("piece"))
    }),

    // The encode side: Viterbi-segment each distinct word under the
    // learned vocab, join documents — per-doc word/token counts and
    // the exact integer micro-nat score (order-independent sums).
    "unigram_encode_stats" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      val vocab = graft.text.Unigram.learn(docs, "text",
        maxPieceLen = 4, seedMultiTopK = 24, emRounds = 2, vocabSize = 40)
      graft.text.Unigram.encodeStats(docs, "doc_id", "text", vocab,
          maxPieceLen = 4)
        .orderBy(col("doc_id"))
    }),

    // Tokenizer persistence: the learned unigram vocabulary is a model
    // DataFrame like any other — through the SAME ModelIO parquet
    // bundle contract as the NB/OLS/PQ families (ml_model_roundtrip).
    // Encode with the fitted vocab and with its saved->loaded twin;
    // the oracle emits one encode twice, so the driver hash pins
    // save -> load -> identical tokenization.
    "tok_model_roundtrip" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      val vocab = graft.text.Unigram.learn(docs, "text",
        maxPieceLen = 4, seedMultiTopK = 24, emRounds = 2, vocabSize = 40)
      // per-(sf, JVM) path: concurrent verify runs must not cross-load
      val path =
        s"${System.getProperty("java.io.tmpdir")}/graft_model_rt_unigram" +
          s"_${dir.replaceAll("[^A-Za-z0-9]", "")}_${ProcessHandle.current().pid()}"
      graft.mlops.ModelIO.saveBundle(s, path, Map("unigram_vocab" -> vocab))
      val loaded = graft.mlops.ModelIO.loadBundle(s, path)("unigram_vocab")
      val a = graft.text.Unigram.encodeStats(docs, "doc_id", "text",
        vocab, maxPieceLen = 4)
      val b = graft.text.Unigram.encodeStats(docs, "doc_id", "text",
          loaded, maxPieceLen = 4)
        .select(col("doc_id"),
          col("n_tokens_uni").as("n_tokens_loaded"),
          col("score_mnat").as("score_loaded"))
      a.join(b, "doc_id").orderBy(col("doc_id"))
    }),

    // Exact-phrase search through the positional inverted index: the
    // 3-term phrase joins its three posting lists on (doc, pos−i) —
    // cost bounded by those lists, not the corpus (the regex-scan twin
    // this replaces reads every byte per query).
    "text_phrase_search" -> ((s, dir) => {
      TextAnalysis.phraseMatchCounts(Tables(s, dir).documentsSpread,
          "doc_id", "text", Seq("slow", "hash", "batch"))
        .orderBy(col("doc_id"))
    }),

    // The production search shape: a BATCH of phrases against ONE
    // index build — the corpus is tokenized once, the materialized
    // frame is the union of the phrases' posting lists, each phrase
    // adds only its own (doc, pos−i) joins. At 100 TB: one corpus scan
    // per query batch, not per query.
    "text_phrase_search_multi" -> ((s, dir) => {
      TextAnalysis.phraseMatchCountsMany(Tables(s, dir).documentsSpread,
          "doc_id", "text", multiPhrases)
        .orderBy(col("phrase_id"), col("doc_id"))
    }),

    // The index-as-asset shape: tokenize ONCE into a bucket-partitioned
    // parquet index, then query with driver-computed partition filters
    // — the scan reads ≤L term buckets, never the corpus. Same oracle
    // as text_phrase_search (identical results by construction); the
    // PartitionFilters plan property is spec-pinned.
    "text_phrase_search_indexed" -> ((s, dir) => {
      val path = tmpIndexPath(dir, "")
      TextAnalysis.writePositionalIndex(Tables(s, dir).documentsSpread,
        "doc_id", "text", path)
      TextAnalysis.phraseMatchCountsIndexed(s, path, "doc_id",
          Seq("slow", "hash", "batch"))
        .orderBy(col("doc_id"))
    }),

    // Incremental index maintenance, merge ≡ rebuild: build the asset
    // on HALF the corpus, append the other half's postings with
    // mergePositionalIndex (bucket modulus from the asset's own
    // metadata), query the same phrase — identical rows to the
    // full-corpus build/scan by the append contract, pinned by sharing
    // text_phrase_search's oracle. The daily-increment shape at 100 TB:
    // one tokenize pass over the NEW docs, appended files in ≤buckets
    // partitions, existing index bytes never read or rewritten.
    "text_phrase_index_merge" -> ((s, dir) => {
      val path = tmpIndexPath(dir, "m")
      val docs = Tables(s, dir).documentsSpread
      TextAnalysis.writePositionalIndex(
        docs.where(col("doc_id") % 2 === 0), "doc_id", "text", path)
      TextAnalysis.mergePositionalIndex(
        docs.where(col("doc_id") % 2 =!= 0), "doc_id", "text", path)
      TextAnalysis.phraseMatchCountsIndexed(s, path, "doc_id",
          Seq("slow", "hash", "batch"))
        .orderBy(col("doc_id"))
    }),

    // Index-asset COMPACTION, compact ≡ no-op: build on half the
    // corpus, append the other half (one extra file per touched
    // bucket — the small-file accumulation every daily-increment year
    // multiplies ~365x), rewrite to one file per bucket, query the
    // same phrase — identical rows to the never-compacted asset, so
    // text_phrase_search's oracle pins the compacted asset verbatim.
    // The file-count drop itself (and the hot-partition
    // maxRecordsPerFile split) is pinned in TextAnalysisSpec and at
    // stress scale in StressBench.
    "text_phrase_index_compact" -> ((s, dir) => {
      val path = tmpIndexPath(dir, "c")
      val docs = Tables(s, dir).documentsSpread
      TextAnalysis.writePositionalIndex(
        docs.where(col("doc_id") % 2 === 0), "doc_id", "text", path)
      TextAnalysis.mergePositionalIndex(
        docs.where(col("doc_id") % 2 =!= 0), "doc_id", "text", path)
      TextAnalysis.compactPositionalIndex(s, path)
      TextAnalysis.phraseMatchCountsIndexed(s, path, "doc_id",
          Seq("slow", "hash", "batch"))
        .orderBy(col("doc_id"))
    }),

    // Markdown -> plain text over a fixture wrapping each doc in the
    // common syntax (headers, emphasis, links/images, fenced + inline
    // code, lists, blockquotes, rules). Map-side regex chain only.
    "text_markdown_strip" -> ((s, dir) => {
      Tables(s, dir).documents
        .select(col("doc_id"),
          graft.text.Markdown.markdownToText(expr(markdownSql))
            .as("text_plain"))
        .withColumn("n_chars", length(col("text_plain")))
        .orderBy(col("doc_id"))
    }),

    // Unicode-script / charset triage over a fixture planting Han,
    // Cyrillic, accented-Latin, and mojibake/U+FFFD strata (the corpus
    // itself is pure ASCII). Map-side regexp_count only.
    "text_script_mix" -> ((s, dir) => {
      TextAnalysis.scriptStats(
          Tables(s, dir).documents
            .select(col("doc_id"), expr(scriptTextSql).as("text")),
          "doc_id", "text")
        .orderBy(col("doc_id"))
    })
  )

  /** Markdown fixture, shared verbatim engine/oracle: every construct
    * the strip chain handles, body slices from the doc's own text.
    */
  private val markdownSql: String =
    """'# Doc ' || CAST(doc_id AS STRING) || chr(10) ||
      |'## Intro *section*' || chr(10) ||
      |'Some **bold** and *light* text with a [link](https://example.com/' || CAST(doc_id AS STRING) || ') here' || chr(10) ||
      |'```' || chr(10) || 'dropped_code(' || CAST(doc_id AS STRING) || ');' || chr(10) || '```' || chr(10) ||
      |'- item one' || chr(10) ||
      |'- ' || substr(text, 1, 60) || chr(10) ||
      |'> quoted ' || substr(text, 61, 40) || chr(10) ||
      |'Inline `code_span` and snake_case stay' || chr(10) ||
      |'---' || chr(10) ||
      |'![logo](https://img.example.com/l.png) done'""".stripMargin

  /** Script-mix fixture, shared verbatim engine/oracle (Scala \uXXXX
    * escapes resolve to literal characters before either engine parses
    * the SQL). Residues: 1 = Han-dominant, 2 = Cyrillic-dominant,
    * 3 = accented Latin, 4 = mojibake digraphs + U+FFFD, else ASCII.
    */
  private val scriptTextSql: String =
    """CASE doc_id % 5
      |  WHEN 1 THEN substr(text, 1, 8) || ' 中文语料质量检测数据管道'
      |  WHEN 2 THEN substr(text, 1, 8) || ' русский текст корпуса'
      |  WHEN 3 THEN substr(text, 1, 40) || ' café résumé naïve 2024'
      |  WHEN 4 THEN substr(text, 1, 40) || ' bad Ã© quote â€™ nbÂ sp � end'
      |  ELSE text
      |END""".stripMargin

  /** Unrolled BPE oracle: per round, pair counting from the symbol
    * arrays (list_transform over positions), the argmax (ORDER BY
    * count DESC, pair — the engine's min-struct mirrored), and the
    * greedy merge as a list_reduce fold whose lambda captures the
    * round's winning pair. The accumulator check acc[-1] = px is
    * string identity on the MERGED symbol — exactly the engine's
    * non-overlap rule.
    */
  private def bpeChain(m: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH wtok AS (
        |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |w0 AS MATERIALIZED (
        |  SELECT w, string_split(w, '') AS syms, cnt FROM (
        |    SELECT w, count(*) AS cnt FROM wtok WHERE len(w) > 0
        |    GROUP BY w))""".stripMargin)
    for (r <- 1 to m) sb.append(s""",
      |p$r AS (SELECT pair, CAST(sum(cnt) AS BIGINT) AS pcnt FROM (
      |    SELECT cnt, unnest(list_transform(range(1, len(syms)),
      |      i -> syms[i] || ' ' || syms[i + 1])) AS pair
      |    FROM w${r - 1} WHERE len(syms) >= 2) GROUP BY pair),
      |b$r AS MATERIALIZED (SELECT string_split(pair, ' ')[1] AS px,
      |    string_split(pair, ' ')[2] AS py, pcnt
      |  FROM p$r ORDER BY pcnt DESC, pair LIMIT 1),
      |w$r AS MATERIALIZED (SELECT w, cnt,
      |    CASE WHEN len(syms) < 2 THEN syms
      |    ELSE list_reduce(list_transform(syms, s -> [s]),
      |      (acc, s) -> CASE WHEN len(acc) > 0 AND acc[-1] = b$r.px
      |          AND s[1] = b$r.py
      |        THEN list_append(acc[1:-2], b$r.px || b$r.py)
      |        ELSE list_append(acc, s[1]) END) END AS syms
      |  FROM w${r - 1} CROSS JOIN b$r)""".stripMargin)
    sb.toString
  }

  private def bpeOracle(m: Int): String =
    bpeChain(m) + (1 to m).map(r => s"""
      |SELECT $r AS merge_round, b$r.px || ' ' || b$r.py AS pair, b$r.pcnt
      |FROM b$r""".stripMargin)
      .mkString("", "\nUNION ALL", "\nORDER BY merge_round")

  // round-m vocabulary = the encoded vocab; documents join it per word
  private def bpeEncodeOracle(m: Int): String =
    bpeChain(m) + s"""
      |SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
      |  CAST(sum(len(e.syms)) AS BIGINT) AS n_tokens_bpe
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |      FROM documents) d
      |JOIN w$m e ON d.w = e.w
      |WHERE len(d.w) > 0
      |GROUP BY d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** bpe_vocab_cap oracle: the 4-round chain plus a SQL recomputation
    * of the alphabet size, so the cap arithmetic (vocab = alphabet +
    * round) is value-checked alongside the merges themselves.
    */
  private def bpeVocabCapOracle(m: Int): String =
    bpeChain(m) + """,
      |alpha AS MATERIALIZED (
      |  SELECT CAST(count(DISTINCT ch) AS BIGINT) AS a FROM (
      |    SELECT unnest(string_split(w, '')) AS ch FROM w0))""".stripMargin +
      (1 to m).map(r => s"""
        |SELECT $r AS merge_round, b$r.px || ' ' || b$r.py AS pair, b$r.pcnt,
        |  alpha.a AS alphabet_size, alpha.a + $r AS vocab_size
        |FROM b$r CROSS JOIN alpha""".stripMargin)
        .mkString("", "\nUNION ALL", "\nORDER BY merge_round")

  /** bpe_encode_fallback oracle: training chain on the ORIGINAL corpus
    * (b1..bm are the learned merges), then the augmented corpus's
    * distinct words initialize with the byte-fallback CASE (known char
    * → itself; OOV char → one <0xHH> per UTF-8 byte, both engines'
    * hex() uppercase zero-padded) and replay the m greedy folds.
    */
  private def bpeFallbackOracle(m: Int): String = {
    val sb = new StringBuilder(bpeChain(m))
    sb.append("""
      |,alpha AS MATERIALIZED (
      |  SELECT list(DISTINCT ch) AS al FROM (
      |    SELECT unnest(string_split(w, '')) AS ch FROM w0)),
      |augd AS MATERIALIZED (
      |  SELECT doc_id, text || CASE WHEN doc_id % 7 = 3
      |    THEN ' naïve café x9' ELSE '' END AS ptext FROM documents),
      |av0 AS (
      |  SELECT w, flatten(list_transform(string_split(w, ''), c -> CASE
      |      WHEN list_contains(alpha.al, c) THEN [c]
      |      ELSE list_transform(range(1, octet_length(encode(c)) + 1),
      |        i -> '<0x' || substring(hex(encode(c)), 2 * i - 1, 2) || '>')
      |      END)) AS syms
      |  FROM (SELECT DISTINCT w FROM (
      |      SELECT unnest(string_split(ptext, ' ')) AS w FROM augd)
      |    WHERE len(w) > 0) CROSS JOIN alpha)""".stripMargin)
    for (r <- 1 to m) sb.append(s""",
      |av$r AS MATERIALIZED (SELECT w,
      |    CASE WHEN len(syms) < 2 THEN syms
      |    ELSE list_reduce(list_transform(syms, s -> [s]),
      |      (acc, s) -> CASE WHEN len(acc) > 0 AND acc[-1] = b$r.px
      |          AND s[1] = b$r.py
      |        THEN list_append(acc[1:-2], b$r.px || b$r.py)
      |        ELSE list_append(acc, s[1]) END) END AS syms
      |  FROM av${r - 1} CROSS JOIN b$r)""".stripMargin)
    sb.append(s"""
      |SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
      |  CAST(sum(len(e.syms)) AS BIGINT) AS n_tokens_bpe,
      |  CAST(sum(len(list_filter(e.syms, s -> s LIKE '<0x%')))
      |    AS BIGINT) AS n_byte_tokens
      |FROM (SELECT doc_id, unnest(string_split(ptext, ' ')) AS w
      |      FROM augd) d
      |JOIN av$m e ON d.w = e.w
      |WHERE len(d.w) > 0
      |GROUP BY d.doc_id
      |ORDER BY d.doc_id""".stripMargin)
    sb.toString
  }

  /** The DuckDB twin of Unigram's in-row Viterbi fold: outer
    * list_reduce over positions (the position rides in x[1].np), inner
    * reduce picks the best (score DESC, piece-count ASC, seg ASC)
    * extension among candidates ending at that position. No line
    * starts with a margin char, so splicing into stripMargin'd CTE
    * text is safe (the double-stripMargin trap).
    */
  private val unigramFoldSql: String =
    "list_reduce(" +
      " list_concat([[{'s': 0.0, 'np': 0, 'seg': '', 'm': CAST(0 AS BIGINT)}]]," +
      "  list_transform(range(1, len(w) + 1)," +
      "   i -> [{'s': CAST(i AS DOUBLE), 'np': i, 'seg': ''," +
      "          'm': CAST(0 AS BIGINT)}]))," +
      " (acc, x) -> list_append(acc," +
      "  list_reduce(" +
      "   list_concat([{'s': -1e18, 'np': 0, 'seg': ''," +
      "                 'm': CAST(0 AS BIGINT)}]," +
      "    list_transform(list_filter(cands, c -> c.e = x[1].np)," +
      "     c -> {'s': acc[c.e - c.l + 1].s + c.lp," +
      "           'np': acc[c.e - c.l + 1].np + 1," +
      "           'seg': acc[c.e - c.l + 1].seg || chr(31) || c.piece," +
      "           'm': acc[c.e - c.l + 1].m +" +
      "                CAST(round(c.lp * 1e6, 0) AS BIGINT)}))," +
      "   (b, d) -> CASE WHEN d.s > b.s OR (d.s = b.s AND (d.np < b.np" +
      "       OR (d.np = b.np AND d.seg < b.seg))) THEN d ELSE b END)))[-1]"

  /** Candidate-array CTE body over vocabulary CTE `vsrc`: per distinct
    * word, the (e, l, lp, piece) structs for every substring found in
    * the vocab, list-ordered by (e, l) — the sort_array twin.
    */
  private def unigramCandsSql(lmax: Int, vsrc: String): String =
    s"""  SELECT s.w, s.cnt, list(struct_pack(e := s.e, l := s.l,
      |      lp := v.lp, piece := s.piece) ORDER BY s.e, s.l) AS cands
      |  FROM (SELECT w, cnt, u.e AS e, u.l AS l, u.piece AS piece FROM (
      |      SELECT w, cnt, unnest(flatten(list_transform(range(1, len(w) + 1),
      |        e -> list_transform(range(1, least($lmax, e) + 1),
      |          l -> struct_pack(e := e, l := l,
      |            piece := w[e - l + 1 : e]))))) AS u
      |      FROM wt) q) s
      |  JOIN $vsrc v ON v.piece = s.piece
      |  GROUP BY s.w, s.cnt""".stripMargin

  /** Unrolled unigram-LM training chain: word table, substring seed
    * (chars + top-`seedK` multi), `rounds` Viterbi-EM rounds, prune to
    * `vocabSize` as CTE `fin`.
    */
  private def unigramChain(lmax: Int, seedK: Int, rounds: Int,
                           vocabSize: Int): String = {
    val sb = new StringBuilder
    sb.append(s"""WITH wt AS MATERIALIZED (
      |  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM (
      |    SELECT unnest(string_split(text, ' ')) AS w FROM documents) z
      |  WHERE len(w) > 0 GROUP BY w),
      |subs AS (
      |  SELECT piece, CAST(sum(cnt) AS BIGINT) AS pcnt FROM (
      |    SELECT cnt, unnest(flatten(list_transform(range(1, len(w) + 1),
      |      e -> list_transform(range(1, least($lmax, e) + 1),
      |        l -> w[e - l + 1 : e])))) AS piece
      |    FROM wt) z GROUP BY piece),
      |sel0 AS (
      |  SELECT piece, pcnt FROM subs WHERE len(piece) = 1
      |  UNION ALL
      |  SELECT piece, pcnt FROM (
      |    SELECT piece, pcnt,
      |      row_number() OVER (ORDER BY pcnt DESC, piece) AS r
      |    FROM subs WHERE len(piece) >= 2) t WHERE r <= $seedK),
      |v0 AS MATERIALIZED (
      |  SELECT piece, pcnt, round(ln(pcnt /
      |    (SELECT CAST(sum(pcnt) AS DOUBLE) FROM sel0)), 6) + 0.0 AS lp
      |  FROM sel0)""".stripMargin)
    for (r <- 1 to rounds) sb.append(s""",
      |cd$r AS (
      |${unigramCandsSql(lmax, s"v${r - 1}")}),
      |vt$r AS (SELECT w, cnt, $unigramFoldSql AS best FROM cd$r),
      |us$r AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS used FROM (
      |    SELECT cnt, unnest(list_filter(string_split(best.seg, chr(31)),
      |      p -> len(p) > 0)) AS piece FROM vt$r) z GROUP BY piece),
      |nv$r AS MATERIALIZED (
      |  SELECT v.piece, CAST(coalesce(u.used, 0) +
      |    CASE WHEN len(v.piece) = 1 THEN 1 ELSE 0 END AS BIGINT) AS pcnt
      |  FROM v${r - 1} v LEFT JOIN us$r u USING (piece)),
      |v$r AS MATERIALIZED (
      |  SELECT piece, pcnt, round(ln(pcnt /
      |    (SELECT CAST(sum(pcnt) AS DOUBLE) FROM nv$r WHERE pcnt > 0)), 6)
      |    + 0.0 AS lp
      |  FROM nv$r WHERE pcnt > 0)""".stripMargin)
    sb.append(s""",
      |uchars AS MATERIALIZED (
      |  SELECT piece, pcnt FROM v$rounds WHERE len(piece) = 1),
      |fin0 AS (
      |  SELECT piece, pcnt FROM uchars
      |  UNION ALL
      |  SELECT piece, pcnt FROM (
      |    SELECT piece, pcnt,
      |      row_number() OVER (ORDER BY pcnt DESC, piece) AS r
      |    FROM v$rounds WHERE len(piece) >= 2) t
      |  WHERE r <= $vocabSize - (SELECT count(*) FROM uchars)),
      |fin AS MATERIALIZED (
      |  SELECT piece, pcnt, round(ln(pcnt /
      |    (SELECT CAST(sum(pcnt) AS DOUBLE) FROM fin0)), 6) + 0.0 AS lp
      |  FROM fin0)""".stripMargin)
    sb.toString
  }

  private def unigramLearnOracle(lmax: Int, seedK: Int, rounds: Int,
                                 vocabSize: Int): String =
    unigramChain(lmax, seedK, rounds, vocabSize) + """
      |SELECT piece, pcnt, lp FROM fin ORDER BY piece""".stripMargin

  private[packs] def unigramEncodeOracle(lmax: Int, seedK: Int, rounds: Int,
                                  vocabSize: Int): String =
    unigramChain(lmax, seedK, rounds, vocabSize) + s""",
      |cdE AS (
      |${unigramCandsSql(lmax, "fin")}),
      |vtE AS MATERIALIZED (SELECT w, $unigramFoldSql AS best FROM cdE)
      |SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
      |  CAST(sum(e.best.np) AS BIGINT) AS n_tokens_uni,
      |  CAST(sum(e.best.m) AS BIGINT) AS score_mnat
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |      FROM documents) d
      |JOIN vtE e ON d.w = e.w
      |WHERE len(d.w) > 0
      |GROUP BY d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  private def unigramRoundtripOracle(lmax: Int, seedK: Int, rounds: Int,
                                     vocabSize: Int): String =
    unigramChain(lmax, seedK, rounds, vocabSize) + s""",
      |cdE AS (
      |${unigramCandsSql(lmax, "fin")}),
      |vtE AS MATERIALIZED (SELECT w, $unigramFoldSql AS best FROM cdE)
      |SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
      |  CAST(sum(e.best.np) AS BIGINT) AS n_tokens_uni,
      |  CAST(sum(e.best.m) AS BIGINT) AS score_mnat,
      |  CAST(sum(e.best.np) AS BIGINT) AS n_tokens_loaded,
      |  CAST(sum(e.best.m) AS BIGINT) AS score_loaded
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |      FROM documents) d
      |JOIN vtE e ON d.w = e.w
      |WHERE len(d.w) > 0
      |GROUP BY d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "unigram_learn" -> unigramLearnOracle(4, 24, 2, 40),
    "unigram_encode_stats" -> unigramEncodeOracle(4, 24, 2, 40),
    // One encode, emitted twice: parquet round-trips the vocab
    // bit-exactly, so fitted and loaded tokenization are identical.
    "tok_model_roundtrip" -> unigramRoundtripOracle(4, 24, 2, 40),
    "bpe_learn_merges" -> bpeOracle(6),
    "bpe_encode_stats" -> bpeEncodeOracle(6),
    "bpe_vocab_cap" -> bpeVocabCapOracle(4),
    "bpe_encode_fallback" -> bpeFallbackOracle(6),
    // H = ln N − Σ c·ln c / N, identical algebra both sides.
    "text_unigram_entropy" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS c
        |  FROM t GROUP BY doc_id, term)
        |SELECT doc_id,
        |  CAST(sum(c) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) + 0.0
        |    AS entropy_nats
        |FROM c
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "text_zipf_slope" ->
      """WITH f AS (
        |  SELECT term, CAST(count(*) AS DOUBLE) AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS term
        |        FROM documents) t
        |  GROUP BY term),
        |r AS (
        |  SELECT ln(CAST(row_number() OVER (ORDER BY freq DESC, term)
        |      AS DOUBLE)) AS lr,
        |    ln(freq) AS lf
        |  FROM f
        |  QUALIFY row_number() OVER (ORDER BY freq DESC, term) <= 100)
        |SELECT round(covar_pop(lr, lf) / var_pop(lr), 6) + 0.0 AS slope,
        |  round(avg(lf) - covar_pop(lr, lf) / var_pop(lr) * avg(lr), 6) + 0.0
        |    AS intercept,
        |  CAST(count(*) AS BIGINT) AS n_terms
        |FROM r""".stripMargin,

    "text_quality" ->
      s"""WITH base AS (
         |  SELECT doc_id, length(text) AS nc,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_unique_tokens,
         |    CAST(len(list_filter(string_split(text, ' '), t -> $stopPred)) AS BIGINT)
         |      AS n_stopwords
         |  FROM documents)
         |SELECT doc_id, n_tokens, n_unique_tokens, n_stopwords,
         |  round((nc - n_tokens + 1) * 1.0 / n_tokens, 6) AS avg_token_len,
         |  round(n_stopwords * 1.0 / n_tokens, 6) AS stopword_ratio,
         |  CASE WHEN n_tokens BETWEEN 10 AND 1000
         |        AND n_stopwords * 1.0 / n_tokens < 0.5
         |    THEN 1 ELSE 0 END AS is_quality
         |FROM base
         |ORDER BY doc_id""".stripMargin,

    "text_token_stats" ->
      """WITH base AS (
        |  SELECT lang, len(string_split(text, ' ')) AS nt,
        |    len(regexp_extract_all(text, '[a-z]{1,4}')) AS ns
        |  FROM documents),
        |agg AS (
        |  SELECT lang, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens,
        |    CAST(sum(ns) AS BIGINT) AS n_subtokens
        |  FROM base GROUP BY lang),
        |dt AS (
        |  SELECT lang, count(DISTINCT term) AS n_distinct_terms
        |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents) t
        |  GROUP BY lang)
        |SELECT a.lang, a.n_docs, a.n_tokens, a.n_subtokens, dt.n_distinct_terms
        |FROM agg a JOIN dt ON a.lang = dt.lang
        |ORDER BY 1""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp_md5,
        |  list_reduce(
        |    list_transform(string_split(text, ' '),
        |      t -> ('0x' || substr(md5(t), 1, 8))::BIGINT),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS fp_roll
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // DuckDB list slicing t[a:b] is 1-based inclusive — t[s+1:s+16]
    // mirrors Spark's slice(_toks, s+1, 16); both clamp at the end.
    "text_chunk_windows" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 1),
        |ch AS (
        |  SELECT doc_id, CAST(s / 12 AS INT) AS chunk_id,
        |    array_to_string(t[s + 1 : s + 16], ' ') AS chunk_text
        |  FROM (
        |    SELECT doc_id, t, unnest(range(0,
        |      CAST(greatest(0, ceil((len(t) - 16) / 12.0)) AS INT) * 12 + 1,
        |      12)) AS s
        |    FROM toks) u)
        |SELECT doc_id, chunk_id, md5(chunk_text) AS chunk_md5,
        |  CAST(len(string_split(chunk_text, ' ')) AS INT) AS n_tokens
        |FROM ch
        |ORDER BY doc_id, chunk_id""".stripMargin,

    // regexp_replace needs the 'g' flag in DuckDB to mirror Spark's
    // replace-all default; length() counts characters in both engines.
    "text_normalize" ->
      """WITH n AS (
        |  SELECT doc_id, length(text) AS n_raw_chars,
        |    trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, n_raw_chars, length(norm_text) AS n_norm_chars,
        |    md5(norm_text) AS norm_md5
        |  FROM n),
        |m AS (SELECT norm_md5, CAST(count(*) AS BIGINT) AS n_mates
        |      FROM h GROUP BY norm_md5)
        |SELECT h.doc_id, CAST(h.n_raw_chars AS INT) AS n_raw_chars,
        |  CAST(h.n_norm_chars AS INT) AS n_norm_chars, h.norm_md5, m.n_mates
        |FROM h JOIN m USING (norm_md5)
        |ORDER BY doc_id""".stripMargin,

    "text_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |grams AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(t)),
        |      i -> array_to_string(t[i:i+1], ' '))) AS g
        |  FROM toks WHERE len(t) >= 2),
        |cnt AS (
        |  SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g)
        |SELECT doc_id,
        |  CAST(sum(c) AS BIGINT) AS n_grams,
        |  count(*) AS n_distinct_grams,
        |  round(sum(CASE WHEN c > 1 THEN c ELSE 0 END) * 1.0 / sum(c), 6)
        |    AS dup_gram_fraction,
        |  round(max(c) * 1.0 / sum(c), 6) AS top_gram_fraction
        |FROM cnt GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "text_bm25_search" -> {
      val terms = Seq("spark", "join", "stream")
      val tfCols = terms.zipWithIndex.map { case (t, i) =>
        s"CAST(len(list_filter(t, x -> x = '$t')) AS BIGINT) AS tf_$i"
      }.mkString(",\n    ")
      val dfCols = terms.indices.map(i =>
        s"CAST(sum(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$i")
        .mkString(", ")
      // mirrors the Scala assembly op-for-op: constants cast to DOUBLE so
      // DuckDB doesn't fall into DECIMAL arithmetic
      val score = terms.indices.map { i =>
        s"ln((CAST(n_docs AS DOUBLE) - df_$i + CAST(0.5 AS DOUBLE)) / " +
          s"(df_$i + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE)) * " +
          s"(tf_$i * CAST(2.2 AS DOUBLE)) / " +
          s"(tf_$i + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + " +
          s"CAST(0.75 AS DOUBLE) * dl / avgdl))"
      }.mkString(" + ")
      s"""WITH base AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |f AS (
         |  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl,
         |    $tfCols
         |  FROM base),
         |g AS (
         |  SELECT count(*) AS n_docs, avg(dl) AS avgdl, $dfCols FROM f)
         |SELECT * FROM (
         |  SELECT doc_id, dl, round($score, 4) AS bm25 FROM f, g)
         |WHERE bm25 > 0
         |ORDER BY bm25 DESC, doc_id LIMIT 50""".stripMargin
    },

    // The CMS gate is exact by construction, so the oracle is the plain
    // exact HAVING aggregation — no sketch replay needed.
    "text_heavy_grams_sketched" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |grams AS (
        |  SELECT unnest(list_transform(range(1, len(t) - 1),
        |      i -> array_to_string(t[i:i+2], ' '))) AS gram
        |  FROM toks WHERE len(t) >= 3)
        |SELECT gram, CAST(count(*) AS BIGINT) AS n_occurrences
        |FROM grams GROUP BY gram
        |HAVING count(*) >= 8
        |ORDER BY n_occurrences DESC, gram""".stripMargin,

    "text_frequent_grams" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |grams AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(t) - 1),
        |      i -> array_to_string(t[i:i+2], ' '))) AS gram
        |  FROM toks WHERE len(t) >= 3)
        |SELECT gram, count(*) AS n_occurrences,
        |  count(DISTINCT doc_id) AS n_docs
        |FROM grams GROUP BY gram
        |HAVING count(*) >= 2
        |ORDER BY n_occurrences DESC, gram LIMIT 100""".stripMargin,

    "text_lm_score" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |grams AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(t)),
        |      i -> struct_pack(w1 := t[i], w2 := t[i+1]))) AS g
        |  FROM toks WHERE len(t) >= 2),
        |flat AS (SELECT doc_id, g.w1 AS w1, g.w2 AS w2 FROM grams),
        |bi AS (SELECT w1, w2, count(*) AS c12 FROM flat GROUP BY w1, w2),
        |uni AS (SELECT w1, count(*) AS c1 FROM flat GROUP BY w1),
        |scored AS (
        |  SELECT f.doc_id,
        |    CAST(round(ln(CAST(c12 AS DOUBLE) / c1) * 1e6, 0) AS BIGINT)
        |      AS mnat
        |  FROM flat f JOIN bi USING (w1, w2) JOIN uni USING (w1))
        |SELECT doc_id, count(*) AS n_bigrams,
        |  CAST(sum(mnat) AS BIGINT) AS sum_mnat
        |FROM scored GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    // text_lm_score's per-doc sums extended with quantile_disc tercile
    // cuts (== approx_percentile's discrete element at this accuracy)
    // and the same strict-comparison CASE as the engine.
    "text_ppl_buckets" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |grams AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(t)),
        |      i -> struct_pack(w1 := t[i], w2 := t[i+1]))) AS g
        |  FROM toks WHERE len(t) >= 2),
        |flat AS (SELECT doc_id, g.w1 AS w1, g.w2 AS w2 FROM grams),
        |bi AS (SELECT w1, w2, count(*) AS c12 FROM flat GROUP BY w1, w2),
        |uni AS (SELECT w1, count(*) AS c1 FROM flat GROUP BY w1),
        |scored AS (
        |  SELECT f.doc_id,
        |    CAST(round(ln(CAST(c12 AS DOUBLE) / c1) * 1e6, 0) AS BIGINT)
        |      AS mnat
        |  FROM flat f JOIN bi USING (w1, w2) JOIN uni USING (w1)),
        |sc AS MATERIALIZED (
        |  SELECT doc_id, count(*) AS n_bigrams,
        |    CAST(sum(mnat) AS BIGINT) AS sum_mnat,
        |    CAST(sum(mnat) AS DOUBLE) / count(*) AS mean_mnat
        |  FROM scored GROUP BY doc_id),
        |q AS (
        |  SELECT quantile_disc(mean_mnat, 0.3333333333333333) AS c1,
        |    quantile_disc(mean_mnat, 0.6666666666666666) AS c2
        |  FROM sc)
        |SELECT doc_id, n_bigrams, sum_mnat,
        |  CASE WHEN mean_mnat > q.c2 THEN 'a_head'
        |       WHEN mean_mnat > q.c1 THEN 'b_middle'
        |       ELSE 'c_tail' END AS ppl_bucket
        |FROM sc, q
        |ORDER BY doc_id""".stripMargin,

    "text_importance_weights" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
        |grams AS (
        |  SELECT doc_id, lang,
        |    unnest(list_transform(range(1, len(t)),
        |      i -> struct_pack(w1 := t[i], w2 := t[i+1]))) AS g
        |  FROM toks WHERE len(t) >= 2),
        |flat AS (SELECT doc_id, lang, g.w1 AS w1, g.w2 AS w2 FROM grams),
        |bit AS (SELECT w1, w2, count(*) AS c12_t FROM flat
        |  WHERE lang = 'en' GROUP BY 1, 2),
        |unit AS (SELECT w1, count(*) AS c1_t FROM flat
        |  WHERE lang = 'en' GROUP BY 1),
        |vt AS (SELECT CAST(count(DISTINCT w2) AS DOUBLE) AS v_t FROM flat
        |  WHERE lang = 'en'),
        |bic AS (SELECT w1, w2, count(*) AS c12_c FROM flat GROUP BY 1, 2),
        |unic AS (SELECT w1, count(*) AS c1_c FROM flat GROUP BY 1),
        |vc AS (SELECT CAST(count(DISTINCT w2) AS DOUBLE) AS v_c FROM flat),
        |scored AS (
        |  SELECT f.doc_id,
        |    CAST(round(ln((coalesce(c12_t, 0) + CAST(1.0 AS DOUBLE)) /
        |      (coalesce(c1_t, 0) + v_t)) * 1e6, 0) AS BIGINT)
        |    - CAST(round(ln((c12_c + CAST(1.0 AS DOUBLE)) /
        |      (c1_c + v_c)) * 1e6, 0) AS BIGINT) AS d
        |  FROM flat f
        |  LEFT JOIN bit USING (w1, w2)
        |  LEFT JOIN unit USING (w1)
        |  JOIN bic USING (w1, w2)
        |  JOIN unic USING (w1), vt, vc)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  CAST(sum(d) AS BIGINT) AS sum_mnat
        |FROM scored GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "text_pii_redact" ->
      """WITH aug AS (
        |  SELECT doc_id, concat(text,
        |    CASE WHEN doc_id % 3 = 0 THEN concat(' contact user', doc_id,
        |      '@mail', doc_id % 7, '.com') ELSE '' END,
        |    CASE WHEN doc_id % 4 = 1 THEN concat(' from 10.0.', doc_id % 256,
        |      '.', (doc_id * 7) % 256) ELSE '' END,
        |    CASE WHEN doc_id % 5 = 2 THEN concat(' call ',
        |      lpad(cast(doc_id % 1000 AS VARCHAR), 3, '0'), '-',
        |      lpad(cast((doc_id * 3) % 1000 AS VARCHAR), 3, '0'), '-',
        |      lpad(cast((doc_id * 9) % 10000 AS VARCHAR), 4, '0')) ELSE '' END)
        |    AS ptext
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(ptext,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(ptext,
        |    '\b\d{1,3}(\.\d{1,3}){3}\b')) AS BIGINT) AS n_ipv4,
        |  CAST(len(regexp_extract_all(ptext,
        |    '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
        |  md5(regexp_replace(regexp_replace(regexp_replace(ptext,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}(\.\d{1,3}){3}\b', '<IP>', 'g'),
        |    '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g')) AS redacted_md5
        |FROM aug
        |ORDER BY doc_id""".stripMargin,

    "text_decontaminate" ->
      """WITH ev AS (
        |  SELECT string_split(text, ' ') AS t FROM documents WHERE doc_id % 20 = 0),
        |tr AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE doc_id % 20 <> 0),
        |evg AS (
        |  SELECT DISTINCT unnest(list_transform(range(1, len(t) - 3),
        |    i -> array_to_string(t[i:i+4], ' '))) AS g
        |  FROM ev WHERE len(t) >= 5),
        |trg AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t) - 3),
        |    i -> array_to_string(t[i:i+4], ' '))) AS g
        |  FROM tr WHERE len(t) >= 5),
        |j AS (
        |  SELECT trg.doc_id, CASE WHEN evg.g IS NOT NULL THEN 1 ELSE 0 END AS hit
        |  FROM trg LEFT JOIN evg ON trg.g = evg.g)
        |SELECT doc_id, count(*) AS n_grams,
        |  CAST(sum(hit) AS BIGINT) AS n_hit_grams,
        |  round(sum(hit) * 1.0 / count(*), 6) AS contam_ratio,
        |  max(hit) AS is_contaminated
        |FROM j GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    // Same positional-index construction (generate_subscripts is the
    // unnest-ordinality idiom every array oracle here uses), same three
    // (doc, pos−i) joins.
    // tokenization mirrors positionalIndex: empty tokens filtered in
    // the array before positions are assigned
    "text_phrase_search" -> phraseSearchOracle,

    // identical results by construction: the partitioned-index path
    // reads the same (doc, pos, term) rows through partition pruning
    "text_phrase_search_indexed" -> phraseSearchOracle,

    // merge ≡ rebuild: half-build + increment append returns the same
    // (doc, pos, term) rows as one full build, so the full-corpus
    // phrase oracle pins the merged asset row-for-row
    "text_phrase_index_merge" -> phraseSearchOracle,

    // compact ≡ no-op: the rewrite changes files, never rows, so the
    // same full-corpus phrase oracle pins the compacted asset
    "text_phrase_index_compact" -> phraseSearchOracle,

    // Same index CTE, one SELECT block per phrase generated from the
    // SHARED multiPhrases list (engine and oracle can never disagree
    // on the batch), UNION ALL'd with the phrase's position as its id.
    "text_phrase_search_multi" -> {
      val blocks = multiPhrases.zipWithIndex.map { case (p, pid) =>
        val joins = p.zipWithIndex.drop(1).map { case (t, i) =>
          s"JOIN (SELECT doc_id, pos - $i AS pos FROM idx " +
            s"WHERE term = '$t') d$i\n  USING (doc_id, pos)"
        }.mkString("\n")
        s"SELECT $pid AS phrase_id, d0.doc_id, count(*) AS n_matches\n" +
          s"FROM (SELECT doc_id, pos FROM idx WHERE term = '${p.head}') d0\n" +
          joins + "\nGROUP BY d0.doc_id"
      }
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '')
        |    AS ts FROM documents),
        |idx AS MATERIALIZED (
        |  SELECT doc_id, CAST(generate_subscripts(ts, 1) AS INT) - 1 AS pos,
        |    unnest(ts) AS term
        |  FROM toks)
        |""".stripMargin +
        blocks.mkString("\nUNION ALL\n") +
        "\nORDER BY phrase_id, doc_id"
    },

    // The SAME rule chain (graft.text.Markdown.steps) folded into
    // nested DuckDB regexp_replace: patterns are written to the
    // RE2 ∩ java.util.regex subset, replacements translate $1 -> \1,
    // and every step takes the 'g' flag to mirror Spark's
    // replace-all default.
    "text_markdown_strip" ->
      s"""WITH m AS (SELECT doc_id, $markdownSql AS md FROM documents),
         |t AS (SELECT doc_id, trim(${
           graft.text.Markdown.steps.foldLeft("md") { case (acc, (pat, rep)) =>
             s"regexp_replace($acc, '${pat.replace("'", "''")}', '${
               rep.replace("$", "\\")}', 'g')"
           }}) AS text_plain FROM m)
         |SELECT doc_id, text_plain,
         |  CAST(length(text_plain) AS INT) AS n_chars
         |FROM t ORDER BY doc_id""".stripMargin,

    // Script counts replayed with RE2's \p{Script} classes (Java spells
    // them \p{IsScript} — same Unicode tables). length() is characters
    // in DuckDB and UTF-16 units in Spark: equal on this BMP fixture.
    "text_script_mix" ->
      (s"""WITH sx AS (SELECT doc_id, $scriptTextSql AS t FROM documents),
         |c AS (
         |  SELECT doc_id, CAST(length(t) AS INT) AS n_chars,
         |    CAST(len(regexp_extract_all(t, '\\p{Latin}')) AS INT)
         |      AS n_latin,
         |    CAST(len(regexp_extract_all(t, '\\p{Han}')) AS INT) AS n_han,
         |    CAST(len(regexp_extract_all(t, '\\p{Cyrillic}')) AS INT)
         |      AS n_cyrillic,
         |    CAST(len(regexp_extract_all(t, '[0-9]')) AS INT) AS n_digit,
         |    CAST(len(regexp_extract_all(t, '�')) AS INT)
         |      AS n_replacement,
         |    CAST(len(regexp_extract_all(t,
         |      'Ã©|â€™|Â ')) AS INT)
         |      AS n_mojibake
         |  FROM sx)
         |SELECT *, CASE
         |    WHEN n_han > n_latin AND n_han >= n_cyrillic THEN 'han'
         |    WHEN n_cyrillic > n_latin AND n_cyrillic > n_han
         |      THEN 'cyrillic'
         |    WHEN n_latin > 0 THEN 'latin'
         |    ELSE 'other' END AS dominant_script
         |FROM c ORDER BY doc_id""".stripMargin)
  )
}
