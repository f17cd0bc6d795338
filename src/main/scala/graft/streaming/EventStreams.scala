package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over `events`-shaped frames (SURVEY
  * §2.8 streaming; the reference's never-cabled `partial_fit` hook,
  * `splearn/linear_model/stochastic_gradient.py:~L10`, becomes real
  * incremental pipelines here).
  *
  * Each transform takes a STREAMING DataFrame (`spark.readStream...`) and
  * returns a streaming result; the same code paths also accept batch
  * frames (Structured Streaming's unified semantics), which is how the
  * batch twins in [[graft.packs.RelationalQueries]] stay oracle-checkable
  * while these run under watermarks in production.
  *
  * State design for scale: all operators below use Spark's built-in state
  * stores (windowed agg, session_window, dropDuplicatesWithinWatermark) —
  * bounded by the watermark horizon, partitioned by key, spill-safe. No
  * custom mapGroupsWithState is needed for this surface, which keeps
  * state-store compatibility across Spark upgrades.
  */
object EventStreams {

  /** Tumbling-window counts/sums per event type with late-data handling. */
  def tumblingCounts(events: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Session windows per user (gap-based), streaming twin of
    * [[graft.operators.Relational.sessionize]].
    */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Streaming exact dedup bounded by the watermark (the streaming leg of
    * the dedup suite): duplicates of (user_id, event_type, value) arriving
    * within the horizon are dropped, state self-expires.
    */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_type", "value")

  /** Streaming exact dedup keyed on the event id — the at-least-once
    * delivery gate: a replayed copy of an already-seen event (same id,
    * identical row) is dropped as long as it arrives within the
    * watermark horizon of the original. Append mode emits each id's
    * FIRST arrival immediately (the watermark governs state eviction,
    * not emission), so a drained stream yields exactly the distinct id
    * set. State is one entry per in-horizon id, partitioned by id —
    * bounded by event-rate × horizon at any corpus size, never by total
    * history.
    */
  def dedupByIdWithinWatermark(events: DataFrame,
                               watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream inner join with a bounded time condition: purchases
    * matched to the same user's clicks within the preceding hour. Both
    * sides carry watermarks, so the join state store retains only the
    * in-horizon window of each side — the condition's time bound is what
    * lets Spark expire state (an unbounded stream-stream join would grow
    * forever).
    */
  def purchasesAfterClicks(events: DataFrame,
                           watermark: String = "2 hours"): DataFrame = {
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", watermark)
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("p_user").as("user_id"), col("purchase_id"),
        col("click_id"), col("purchase_ts"), col("value"))
  }

  /** LEFT OUTER stream-stream join: every purchase emits, matched to
    * in-window clicks when they exist, with NULL click columns once the
    * watermark proves no match can arrive. The outer row is held in the
    * join state store until the global watermark (min across BOTH sides)
    * passes the purchase's join window — that eviction point is what the
    * null-padded emission waits for, and why both sides must keep
    * watermarking forward at 100 TB: one stalled side pins every outer
    * row in state.
    */
  def purchasesWithOptionalClicks(events: DataFrame,
                                  watermark: String = "2 hours"): DataFrame = {
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", watermark)
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"),
      "leftOuter")
      .select(col("p_user").as("user_id"), col("purchase_id"),
        col("click_id"), col("purchase_ts"), col("value"))
  }

  /** The shared timeout config for the `flatMapGroupsWithState` family:
    * `ttlMs == 0` keeps the historical unbounded-state behavior
    * (NoTimeout — only safe when key cardinality is structurally
    * bounded, e.g. a vocabulary); `ttlMs > 0` arms a processing-time
    * timeout per key, re-armed on every update, so a key idle past its
    * TTL is EVICTED at the next micro-batch and its memory returns to
    * the store. Eviction is the contract an unbounded stream needs:
    * state is bounded by (arrival rate × TTL), not by total history.
    */
  private def timeoutConf(ttlMs: Long): GroupStateTimeout =
    if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
    else GroupStateTimeout.NoTimeout

  /** Custom keyed state via `flatMapGroupsWithState`: a running per-user
    * (count, sum, max-seen-ts) accumulator emitted on every update — the
    * one stateful shape the built-in operators (windows/sessions/dedup)
    * don't cover: arbitrary user-defined state evolving across batches.
    * State is O(1) per key and partitioned by the groupBy, so it scales
    * with distinct users, not events; `ttlMs > 0` bounds key cardinality
    * over time on an unbounded stream: a user idle past the TTL is
    * evicted and restarts from zero on their next event.
    */
  def runningUserStats(events: DataFrame,
                       ttlMs: Long = 0L): Dataset[UserRunning] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("value").cast("double"),
        col("ts").cast("long"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Update, timeoutConf(ttlMs)) {
        (user: Long, rows: Iterator[(Long, Double, Long)],
         state: GroupState[UserRunning]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var acc = state.getOption
              .getOrElse(UserRunning(user, 0L, 0.0, Long.MinValue))
            rows.foreach { case (_, v, t) =>
              acc = UserRunning(user, acc.n_events + 1,
                acc.sum_value + v, math.max(acc.last_seen, t))
            }
            state.update(acc)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            Iterator.single(acc)
          }
      }
  }

  /** Exactly-once sink contract for `foreachBatch`: Spark guarantees
    * at-least-once invocation with a STABLE batchId per epoch — a failed
    * micro-batch is retried under the same id. A sink that records the
    * committed batchId (here an in-memory set; in production the id
    * rides in the sink's own transaction, e.g. a MERGE keyed on it)
    * makes the write idempotent, upgrading at-least-once to
    * effectively-exactly-once. Wrap any batch body with this to get the
    * contract; the spec replays a batch id and asserts no double-apply.
    */
  def idempotentForeachBatch(
      inner: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit = {
    val committed = scala.collection.mutable.Set[Long]()
    (df: DataFrame, batchId: Long) => {
      val first = committed.synchronized { committed.add(batchId) }
      if (first) inner(df, batchId)
    }
  }

  /** Durable positional-index maintenance as a streaming sink (17th
    * real-stream artifact): each micro-batch of NEW documents appends
    * into the [[graft.text.TextAnalysis.writePositionalIndex]] asset at
    * `path` with the asset's OWN modulus (mergePositionalIndex); the
    * first batch bootstraps the asset when none exists. Wrapped in
    * [[idempotentForeachBatch]] because the merge contract REQUIRES new
    * doc ids: foreachBatch is at-least-once with a stable batchId, and
    * a retried append would double that batch's postings — the
    * committed-id gate upgrades the append to effectively-exactly-once
    * (in production the id rides the asset's own commit metadata).
    * Batch ≡ stream: once the stream drains, the asset equals one batch
    * build over the union of all batches (the merge ≡ rebuild
    * contract), so phrase queries against it are pinned by the batch
    * oracle verbatim (`streaming_index_merge`). Upstream contract as in
    * every dedup-before-index pipeline: batches must carry each doc id
    * at most once across the stream (gate with the streaming dedup ops
    * first).
    */
  def positionalIndexSink(idCol: String, textCol: String, path: String,
                          buckets: Int = 64): (DataFrame, Long) => Unit =
    idempotentForeachBatch { (batch, _) =>
      if (!batch.isEmpty) {
        if (graft.text.TextAnalysis.isPositionalIndex(
            batch.sparkSession, path))
          graft.text.TextAnalysis.mergePositionalIndex(
            batch, idCol, textCol, path)
        else
          graft.text.TextAnalysis.writePositionalIndex(
            batch, idCol, textCol, path, buckets)
      }
    }

  /** [[positionalIndexSink]]'s vector twin (18th real-stream artifact):
    * each micro-batch of NEW vectors is appended into the
    * [[graft.similarity.Similarity.writeIvfIndex]] asset with the
    * ASSET'S OWN sidecar centroids; the first batch bootstraps the
    * asset with `centersLong` (after bootstrap the parameter is never
    * consulted again — the sidecar rules, the foreign-centroid guard).
    * Same exactly-once batchId gate and batch ≡ stream contract as the
    * text twin; pair with [[graft.similarity.Similarity.ivfDriftReport]]
    * on a cadence to know when the streamed corpus has drifted off the
    * bootstrap centroids (the retrain contract).
    */
  def ivfIndexSink(idCol: String, arrCol: String, path: String,
                   centersLong: DataFrame,
                   centerCol: String): (DataFrame, Long) => Unit =
    idempotentForeachBatch { (batch, _) =>
      if (!batch.isEmpty) {
        val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
          batch.sparkSession.sparkContext.hadoopConfiguration)
        if (fs.exists(new org.apache.hadoop.fs.Path(path)))
          graft.similarity.Similarity.mergeIvfIndex(
            batch, idCol, arrCol, path)
        else
          graft.similarity.Similarity.writeIvfIndex(
            batch, idCol, arrCol, centersLong, centerCol, path)
      }
    }

  /** Distributed incremental NB sufficient stats — the production path
    * (a driver-side count-table demo of the same merge contract lives in
    * test scope as `NbCountStore`): running (class, term) counts
    * live in Spark's keyed state store via `flatMapGroupsWithState`,
    * sharded across executors by key, checkpointed, spill-safe. The
    * driver holds nothing data-proportional.
    *
    * Update-mode output emits only keys touched by each micro-batch;
    * since counts are monotone, the latest row per key IS the running
    * total, and the counts table is exactly the multinomial-NB
    * sufficient statistic — refresh the model by running
    * [[graft.mlops.NaiveBayesOps.multinomialFit]]-style smoothing over
    * it (the reference's `partial_fit`,
    * `splearn/naive_bayes.py:~L10-80`, as a live pipeline).
    */
  def nbRunningCounts(docs: DataFrame,
                      ttlMs: Long = 0L): Dataset[NbTermCount] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // default NoTimeout is sound HERE: keys are (class, term) — bounded
    // by the vocabulary, not the stream; ttlMs > 0 opts into eviction
    // (counts restart for terms idle past the TTL — a decayed model)
    docs
      .select(col("lang").cast("string"),
        explode(split(col("text"), " ")).as("term"))
      .as[(String, String)]
      .groupByKey(identity)
      .flatMapGroupsWithState[NbTermCount, NbTermCount](
        OutputMode.Update, timeoutConf(ttlMs)) {
        (key: (String, String), rows: Iterator[(String, String)],
         state: GroupState[NbTermCount]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.map(_.count).getOrElse(0L)
            var n = 0L
            rows.foreach(_ => n += 1)
            val next = NbTermCount(key._1, key._2, prev + n)
            state.update(next)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            Iterator.single(next)
          }
      }
  }
  /** Self-referential near-dup gate with a GROWING band index: where
    * [[graft.dedup.Dedup.nearDupAgainstIndex]] checks a stream against
    * a STATIC index, here the index is the stream's own past — each
    * (band, band_sig) bucket keeps the minimum doc id seen so far in
    * Spark's keyed state store, and an arriving doc is flagged when
    * any of its buckets already holds a smaller id (emitting that
    * smallest sharer as provenance). The semantic contract is batch-
    * replayable: doc X is a duplicate iff ANY lower-id doc shares a
    * band — a pure function of the doc set, independent of micro-batch
    * boundaries, PROVIDED ingest order is id-monotone across batches
    * (the natural incremental-ingest contract; within a batch ids are
    * processed in ascending order explicitly). State is one long per
    * occupied bucket — the same O(index) footprint a static band index
    * costs, now maintained incrementally by the state store.
    *
    * Return contract — PER-BUCKET multiplicity: the operator emits one
    * [[BandDup]] row per (doc, colliding bucket), so a doc sharing
    * several bands with earlier docs appears several times, each row's
    * `dup_of_min` the PER-BUCKET minimum sharer (not the doc's overall
    * smallest). The stateful stage is keyed by bucket, so a cross-
    * bucket reduction can't happen inside it without a second stateful
    * shuffle; consumers wanting one provenance row per doc aggregate
    * `groupBy(doc_id).agg(min(dup_of_min))` downstream (what the pack
    * query and spec do).
    *
    * State TTL: bucket keys are corpus-proportional, so on an UNBOUNDED
    * stream `ttlMs` must be set — it is the dedup horizon: a bucket
    * idle past the TTL is evicted and its next arrival is re-admitted
    * as fresh (not flagged), exactly the batch-replayable contract
    * applied to a sliding corpus window. `ttlMs = 0` (NoTimeout)
    * remains for bounded replays where the full-history contract is
    * the point.
    */
  def selfNearDupFlags(docs: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, numHashes: Int = 8,
                       rowsPerBand: Int = 2,
                       ttlMs: Long = 0L): Dataset[BandDup] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val nb = numHashes / rowsPerBand
    val sig = graft.dedup.Dedup.inRowSignature(docs, idCol, textCol,
      n, numHashes)
    val bandCols = s"transform(sequence(0, ${nb - 1}), " +
      s"b -> concat_ws('-', transform(sequence(0, ${rowsPerBand - 1}), " +
      s"j -> cast(sig[b * $rowsPerBand + j] as string))))"
    sig
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(expr(bandCols)).as(Seq("band", "band_sig")))
      .select(concat_ws(":", col("band"), col("band_sig")).as("bucket"),
        col("doc_id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, BandDup](
        OutputMode.Update, timeoutConf(ttlMs)) {
        (_: String, rows: Iterator[(String, Long)],
         state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val ids = rows.map(_._2).toArray.sorted
            var mn = state.getOption.getOrElse(Long.MaxValue)
            val out = Array.newBuilder[BandDup]
            ids.foreach { id =>
              if (mn < id) out += BandDup(id, mn)
              if (id < mn) mn = id
            }
            state.update(mn)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            out.result().iterator
          }
      }
  }
  /** [[selfNearDupFlags]] with an EVENT-TIME dedup horizon — the
    * replay-deterministic TTL: a bucket expires when the stream's
    * watermark passes (last event time seen in the bucket + horizonMs),
    * so eviction is a function of the DATA's timestamps, not of wall
    * clock — a checkpoint replay of the same events reproduces the
    * same admit/flag decisions (processing-time TTLs cannot promise
    * that; their deadlines move with the machine). Late data bounded
    * by `watermarkDelay` re-arms its bucket like any arrival.
    *
    * Same per-bucket multiplicity contract as [[selfNearDupFlags]];
    * state is (min doc id, max event time) per live bucket — bounded
    * by event-rate × horizon on an unbounded stream. On a batch frame
    * the deadline arm is skipped entirely (batch planning eliminates
    * the watermark node, so the watermark APIs are unavailable and
    * timeouts never fire regardless), which degrades to exactly the
    * full-history batch contract.
    */
  def selfNearDupFlagsEventTime(docs: DataFrame, idCol: String,
                                textCol: String, tsCol: String,
                                watermarkDelay: String, horizonMs: Long,
                                n: Int = 3, numHashes: Int = 8,
                                rowsPerBand: Int = 2): Dataset[BandDup] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(horizonMs > 0, s"horizonMs=$horizonMs must be positive")
    // Batch frames lose the watermark node (EliminateEventTimeWatermark),
    // so GroupStateImpl has watermarkPresent=false and BOTH
    // getCurrentWatermarkMs and setTimeoutTimestamp would throw. Timeouts
    // never fire in batch anyway, so skipping the deadline arm gives the
    // full-history batch contract the scaladoc promises.
    val streaming = docs.isStreaming
    val nb = numHashes / rowsPerBand
    val sig = graft.dedup.Dedup.inRowSignature(
      docs.withWatermark(tsCol, watermarkDelay), idCol, textCol,
      n, numHashes, passthroughCols = Seq(tsCol))
    val bandCols = s"transform(sequence(0, ${nb - 1}), " +
      s"b -> concat_ws('-', transform(sequence(0, ${rowsPerBand - 1}), " +
      s"j -> cast(sig[b * $rowsPerBand + j] as string))))"
    sig
      .select(col(idCol).cast("long").as("doc_id"), col(tsCol),
        posexplode(expr(bandCols)).as(Seq("band", "band_sig")))
      .select(concat_ws(":", col("band"), col("band_sig")).as("bucket"),
        col("doc_id"), col(tsCol).as("_ts"))
      .as[(String, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), BandDup](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[(String, Long, java.sql.Timestamp)],
         state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // ids ascend (the id-monotone ingest contract); track the
            // bucket's max event time for the horizon
            val arr = rows.toArray.sortBy(_._2)
            var (mn, maxTs) =
              state.getOption.getOrElse((Long.MaxValue, Long.MinValue))
            val out = Array.newBuilder[BandDup]
            arr.foreach { case (_, id, ts) =>
              if (mn < id) out += BandDup(id, mn)
              if (id < mn) mn = id
              val t = ts.getTime
              if (t > maxTs) maxTs = t
            }
            state.update((mn, maxTs))
            // deadline = horizon past the newest member; never behind
            // the watermark (late buckets would throw otherwise)
            if (streaming) state.setTimeoutTimestamp(
              math.max(maxTs + horizonMs, state.getCurrentWatermarkMs + 1))
            out.result().iterator
          }
      }
  }

  /** The crawl-curation funnel as an INGEST STREAM: the stateless
    * gates (URL parse, in-row jusText main content, quality) run as
    * the same Column algebra the batch path uses
    * ([[graft.text.Html.mainContentCol]] — no stateful operator, so
    * this composes with exactly ONE keyed state below), and exact
    * content dedup is the stream's only state: per content hash, the
    * smallest QUALIFIED doc id ever admitted. Within one micro-batch
    * the verdicts equal the batch [[graft.text.Curation.disposition]]
    * min-id keeper; across batches the keeper is first-epoch-wins —
    * the streaming contract every gate in this pack uses. `ttlMs` > 0
    * bounds state on unbounded streams (processing-time eviction;
    * the event-time variant of [[selfNearDupFlagsEventTime]] applies
    * the same way if replay determinism is needed).
    */
  def curationGate(pages: DataFrame, idCol: String, urlCol: String,
                   htmlCol: String, minTextWords: Int = 10,
                   ttlMs: Long = 0L): Dataset[CurationVerdict] = {
    val spark = pages.sparkSession
    import spark.implicits._
    val gated = pages.select(
        col(idCol).cast("long").as("doc_id"),
        graft.text.Urls.registeredDomain(
          graft.text.Urls.hostOf(col(urlCol))).as("domain"),
        graft.text.Html.mainContentCol(col(htmlCol)).as("_mc"))
      .select(col("doc_id"), col("domain"),
        (col("domain") =!= "").as("url_ok"),
        col("_mc.n_blocks").as("n_blocks"),
        col("_mc.n_kept").as("n_kept"),
        when(col("_mc.main_text") === "", lit(0))
          .otherwise(size(split(col("_mc.main_text"), "\\s+")))
          .as("n_words"),
        md5(col("_mc.main_text")).as("h"))
      .withColumn("quality_ok", col("n_words") >= minTextWords)
      .as[GatedPage]
    // Only QUALIFIED pages reach the keyed state: a gated page's
    // verdict (dup=false, survivor=false) never depends on it, and at
    // crawl scale every chrome-only/empty page shares h = md5("") — one
    // group that would otherwise collect ALL failed pages of a
    // micro-batch into a single task (an OOM-shaped hot key the batch
    // path dodges with its one-row-per-key build side). The gated rows
    // take the stateless branch and the two are unioned.
    val isQualified = col("url_ok") && col("quality_ok")
    val statefulVerdicts = gated.filter(isQualified).groupByKey(_.h)
      .flatMapGroupsWithState[Long, CurationVerdict](
        OutputMode.Update, timeoutConf(ttlMs)) {
        (_: String, rows: Iterator[GatedPage], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // all rows here are qualified dups of ONE content hash —
            // bounded by the true duplicate multiplicity, not by the
            // micro-batch's failure count
            val rs = rows.toArray.sortBy(_.doc_id)
            // first-epoch-wins: an ADMITTED keeper is never displaced
            // by a smaller id arriving later (the pack-wide streaming
            // contract); with no prior state the batch's smallest
            // qualified id is the keeper — which on a single
            // AvailableNow batch is exactly the batch min-id rule.
            val keeper = state.getOption.getOrElse(rs.head.doc_id)
            state.update(keeper)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            rs.iterator.map { r =>
              val dup = r.doc_id != keeper
              CurationVerdict(r.doc_id, r.domain, r.url_ok, r.n_blocks,
                r.n_kept, r.n_words, r.quality_ok, dup, !dup)
            }
          }
      }
    val statelessVerdicts = gated.filter(!isQualified)
      .map(r => CurationVerdict(r.doc_id, r.domain, r.url_ok, r.n_blocks,
        r.n_kept, r.n_words, r.quality_ok,
        is_exact_dup = false, survivor = false))
    statefulVerdicts.union(statelessVerdicts)
  }

  /** [[curationGate]] + the MODEL-SCORED stage, as the deploy path runs
    * it: weights trained OFFLINE on a batch corpus
    * ([[graft.text.Curation.scoredGateModel]]) and the bigram LM shipped
    * as a bounded score table — the stream applies the margin IN-ROW
    * (zero additional state; exact dedup stays the one keyed state).
    *
    * The LM table is packed into a single map row and attached by a
    * constant-key stream-static broadcast join; per-doc scoring is a
    * higher-order lookup over the doc's transitions — mean micro-nats
    * over the transitions the table KNOWS, which equals the batch f4
    * exactly when the table is the full corpus LM and degrades
    * gracefully when a deployment ships a top-M cut. All other feature
    * arithmetic is the batch Column algebra verbatim, and the margin
    * multiplies the exact weight doubles the batch fit produced, so on
    * a single AvailableNow batch with the full LM the verdicts are
    * BYTE-IDENTICAL to [[graft.text.Curation.scoredDisposition]].
    */
  def scoredCurationGate(pages: DataFrame, idCol: String, urlCol: String,
                         htmlCol: String, weights: Seq[Double],
                         lm: DataFrame,
                         stopwords: Seq[String] =
                           graft.text.TextAnalysis.DefaultStopwords,
                         minTextWords: Int = 10,
                         ttlMs: Long = 0L,
                         lmMaxEntries: Long = 1L << 22)
      : Dataset[ScoredCurationVerdict] = {
    require(weights.length == 4, s"need 4 weights, got ${weights.length}")
    val spark = pages.sparkSession
    import spark.implicits._
    // The deployable LM artifact packs into ONE map row and broadcasts;
    // the top-M bound is ENFORCED, not assumed — a caller handing the
    // raw corpus-bigram table of a web-scale fit would otherwise OOM
    // the single-row aggregation/broadcast (r16 advice). `lm` is the
    // static side, so the count is one cheap batch action at stream
    // definition time.
    val lmCount = lm.count()
    require(lmCount <= lmMaxEntries,
      s"LM table has $lmCount entries, above the broadcastable bound " +
        s"$lmMaxEntries — ship a top-M cut (ORDER BY count DESC LIMIT M)," +
        s" the CCNet pattern this gate's mean-over-known-transitions " +
        s"degrades to gracefully")
    val lmMap = lm.agg(map_from_entries(collect_list(struct(
        concat(col("w1"), lit(" "), col("w2")).as("k"), col("m").as("v"))))
        .as("_lm"))
      .withColumn("_k", lit(1))
    // literal Columns, never spliced SQL (see Curation.scoredCore)
    val stopArr = array(stopwords.map(lit): _*)
    val scored = pages.select(
        col(idCol).cast("long").as("doc_id"),
        graft.text.Urls.registeredDomain(
          graft.text.Urls.hostOf(col(urlCol))).as("domain"),
        graft.text.Html.mainContentCol(col(htmlCol)).as("_mc"))
      .select(col("doc_id"), col("domain"),
        (col("domain") =!= "").as("url_ok"),
        col("_mc.n_blocks").as("n_blocks"),
        col("_mc.n_kept").as("n_kept"),
        when(col("_mc.main_text") === "", lit(0))
          .otherwise(size(split(col("_mc.main_text"), "\\s+")))
          .as("n_words"),
        md5(col("_mc.main_text")).as("h"),
        col("_mc.main_text").as("_mt"))
      .withColumn("quality_ok", col("n_words") >= minTextWords)
      .withColumn("_k", lit(1))
      .join(broadcast(lmMap), "_k")
      .withColumn("_ts", split(col("_mt"), "\\s+"))
      // f1-f3: the batch feature algebra verbatim
      .withColumn("f1", col("n_words") / lit(100.0))
      .withColumn("f2",
        col("n_kept") * lit(1.0) / greatest(col("n_blocks"), lit(1)))
      .withColumn("f3", when(col("_mt") === "", lit(0.0))
        .otherwise(
          size(filter(col("_ts"), t => array_contains(stopArr, t))) *
            lit(1.0) / size(col("_ts"))))
      // f4: in-row LM lookup — per-transition micro-nat longs the batch
      // per-doc sums weight by multiplicity, here with multiplicity via
      // the repeated array entries; unknown transitions drop out
      .withColumn("_ms",
        when(col("_mt") =!= "" && size(col("_ts")) >= 2, expr(
          """filter(transform(sequence(1, size(_ts) - 1),
            |  i -> element_at(_lm, concat(element_at(_ts, i), ' ',
            |                              element_at(_ts, i + 1)))),
            |  v -> v IS NOT NULL)""".stripMargin))
          .otherwise(expr("CAST(array() AS ARRAY<BIGINT>)")))
      .withColumn("f4", when(size(col("_ms")) === 0, lit(0.0))
        .otherwise(
          expr("aggregate(_ms, CAST(0 AS BIGINT), (a, v) -> a + v)") *
            lit(1.0) / size(col("_ms")) / lit(1e6)))
      .withColumn("quality_margin",
        round(col("f1") * lit(weights(0)) + col("f2") * lit(weights(1)) +
          col("f3") * lit(weights(2)) + col("f4") * lit(weights(3)), 6)
          + lit(0.0))
      .withColumn("score_ok", col("quality_margin") > 0.0)
      .select(col("doc_id"), col("domain"), col("url_ok"),
        col("n_blocks"), col("n_kept"), col("n_words"), col("quality_ok"),
        col("h"), col("quality_margin"), col("score_ok"))
      .as[ScoredGatedPage]
    // same state discipline as curationGate: only rule-qualified pages
    // reach the keyed dedup state (score_ok does NOT gate dedup — the
    // batch path dedups among url+quality qualified regardless of
    // score); gated pages take the stateless branch
    val isQualified = col("url_ok") && col("quality_ok")
    val statefulVerdicts = scored.filter(isQualified).groupByKey(_.h)
      .flatMapGroupsWithState[Long, ScoredCurationVerdict](
        OutputMode.Update, timeoutConf(ttlMs)) {
        (_: String, rows: Iterator[ScoredGatedPage],
         state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val rs = rows.toArray.sortBy(_.doc_id)
            val keeper = state.getOption.getOrElse(rs.head.doc_id)
            state.update(keeper)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            rs.iterator.map { r =>
              val dup = r.doc_id != keeper
              ScoredCurationVerdict(r.doc_id, r.domain, r.url_ok,
                r.n_blocks, r.n_kept, r.n_words, r.quality_ok, dup, !dup,
                r.quality_margin, r.score_ok, !dup && r.score_ok)
            }
          }
      }
    val statelessVerdicts = scored.filter(!isQualified)
      .map(r => ScoredCurationVerdict(r.doc_id, r.domain, r.url_ok,
        r.n_blocks, r.n_kept, r.n_words, r.quality_ok,
        is_exact_dup = false, survivor = false, r.quality_margin,
        r.score_ok, survivor_scored = false))
    statefulVerdicts.union(statelessVerdicts)
  }
}

/** Stateless-gate row feeding [[EventStreams.curationGate]]'s keyed
  * dedup state.
  */
final case class GatedPage(doc_id: Long, domain: String, url_ok: Boolean,
                           n_blocks: Int, n_kept: Int, n_words: Int,
                           h: String, quality_ok: Boolean)

/** Per-page verdict row of [[EventStreams.curationGate]] — the same
  * columns the batch disposition emits.
  */
final case class CurationVerdict(doc_id: Long, domain: String,
                                 url_ok: Boolean, n_blocks: Int,
                                 n_kept: Int, n_words: Int,
                                 quality_ok: Boolean,
                                 is_exact_dup: Boolean, survivor: Boolean)

/** Stateless-gate row of [[EventStreams.scoredCurationGate]]: the
  * [[GatedPage]] fields plus the in-row model score.
  */
final case class ScoredGatedPage(doc_id: Long, domain: String,
                                 url_ok: Boolean, n_blocks: Int,
                                 n_kept: Int, n_words: Int,
                                 quality_ok: Boolean, h: String,
                                 quality_margin: Double, score_ok: Boolean)

/** Per-page verdict row of [[EventStreams.scoredCurationGate]] — the
  * batch scoredDisposition columns.
  */
final case class ScoredCurationVerdict(doc_id: Long, domain: String,
                                       url_ok: Boolean, n_blocks: Int,
                                       n_kept: Int, n_words: Int,
                                       quality_ok: Boolean,
                                       is_exact_dup: Boolean,
                                       survivor: Boolean,
                                       quality_margin: Double,
                                       score_ok: Boolean,
                                       survivor_scored: Boolean)

/** A flagged doc and the smallest earlier doc sharing the bucket —
  * output row of [[EventStreams.selfNearDupFlags]].
  */
final case class BandDup(doc_id: Long, dup_of_min: Long)

/** Running (class, term) token count — the keyed state and output row of
  * [[EventStreams.nbRunningCounts]].
  */
final case class NbTermCount(lang: String, term: String, count: Long)

/** Per-user running accumulator for [[EventStreams.runningUserStats]]. */
final case class UserRunning(
    user_id: Long, n_events: Long, sum_value: Double, last_seen: Long)
