package graft.packs

import graft.QueryPack
import graft.core.Tables
import graft.operators.{Diagnostics, Layout, Linkage, Packing, Relational, Sampling}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-2 relational breadth: pivot/unpivot, exact quantiles, rank-family
  * window functions, deterministic (hash-gated) sampling, a TPC-H
  * Q18-shaped group-having join, higher-order array functions, and regex
  * extraction — each hash-checked against a DuckDB oracle.
  */
object ExtendedRelationalQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // Count-min sketch heavy hitters: build a fixed-size (4×16) CMS
    // over the document token stream, then compare its point estimates
    // against exact counts for the top-50 terms. Every counter derives
    // from the native md5 seed family, so the whole sketch — and the
    // one-sided estimate >= exact invariant it must satisfy — is
    // reproduced by the oracle cell for cell. The sketch's shuffle is
    // capped at depth×width per task by partial aggregation; estimation
    // broadcasts the sketch (≤64 rows) and never shuffles the corpus.
    "sketch_count_min" -> ((s, dir) => {
      val toks = Tables(s, dir).documents
        .select(explode(split(col("text"), " ")).as("term"))
      val sketch = graft.stats.Sketches
        .countMinSketch(toks, "term", depth = 4, width = 16)
        .localCheckpoint() // estimate + (lazily) both consumers: one build
      val top = toks.groupBy(col("term"))
        .agg(count(lit(1)).as("exact_count"))
        .orderBy(col("exact_count").desc, col("term"))
        .limit(50)
      val est = graft.stats.Sketches
        .cmsEstimate(sketch, top.select(col("term")), "term",
          depth = 4, width = 16)
      top.join(est, "term")
        .select(col("term"), col("exact_count"), col("cms_count"),
          (col("cms_count") >= col("exact_count")).as("is_overestimate"))
        .orderBy(col("exact_count").desc, col("term"))
    }),

    // Pivot: order counts + total price per priority, one column per
    // status. Explicit value list (contract for deterministic schema);
    // unpivot back is covered by the spec test (round-trip).
    "pivot_orders_status" -> ((s, dir) => {
      Tables(s, dir).orders
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(round(sum(col("o_totalprice")), 2))
        .withColumnsRenamed(Map("F" -> "total_f", "O" -> "total_o", "P" -> "total_p"))
        .orderBy(col("o_orderpriority"))
    }),

    // Exact quantiles (continuous interpolation) — the verification twin
    // of approx_percentile; at 100 TB the approx sketch replaces it.
    "quantiles_lineitem" -> ((s, dir) => {
      Tables(s, dir).lineitem
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
          round(expr("percentile(l_extendedprice, 0.50)"), 4).as("p50"),
          round(expr("percentile(l_extendedprice, 0.75)"), 4).as("p75"),
          round(expr("percentile(l_extendedprice, 0.95)"), 4).as("p95"))
        .orderBy(col("l_returnflag"))
    }),

    // Rank-family window functions over a keyed window; ties broken by
    // the unique custkey so every rank is deterministic.
    "window_rank_functions" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables(s, dir).customer
        .where(col("c_nationkey") < 5)
        .select(col("c_nationkey"), col("c_custkey"),
          round(col("c_acctbal"), 2).as("acctbal"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          round(percent_rank().over(w), 6).as("prnk"),
          round(cume_dist().over(w), 6).as("cdist"),
          ntile(4).over(w).as("quartile"))
        .orderBy(col("c_nationkey"), col("rnk"))
    }),

    // Deterministic hash-gated sample — reproducible across engines,
    // partitionings, and retries (see operators.Sampling).
    "sample_deterministic" -> ((s, dir) => {
      Sampling.deterministicSample(
          Tables(s, dir).documents, col("doc_id"), pct = 10)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // Deterministic 80/10/10 train/val/test assignment (md5 per-mille
    // buckets of the doc key — map-side, re-derivable, no split manifest).
    // Output pins per-(lang, split) membership: counts plus an order-free
    // exact id checksum.
    "split_train_val_test" -> ((s, dir) => {
      Sampling.assignSplit(Tables(s, dir).documents, col("doc_id"),
          trainPermille = 800, valPermille = 100)
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"))
        .orderBy(col("lang"), col("split"))
    }),

    // Exact k rows per group by md5-hash order (see Sampling.sampleKPerGroup).
    "sample_k_per_group" -> ((s, dir) => {
      Sampling.sampleKPerGroup(
          Tables(s, dir).documents, col("source"), col("doc_id"), k = 5)
        .select(col("doc_id"), col("source"))
        .orderBy(col("source"), col("doc_id"))
    }),

    // Training-mix rate table: target weights -> per-stratum keep rates.
    "mix_rates" -> ((s, dir) => {
      Sampling.mixRates(Tables(s, dir).documents, col("source"),
          Map("src0" -> 4.0, "src1" -> 2.0, "src2" -> 1.0), totalTarget = 200L)
        .orderBy(col("stratum"))
    }),

    // Bloom-filter pre-join pruning (runtime-filter semantics made
    // explicit): a bloom over the selective dim side's keys filters the
    // fact side IN-ROW before its join shuffle — Spark's own
    // BloomFilterAggregate/MightContain expressions, surfaced because
    // the optimizer's InjectRuntimeFilter only fires past multi-GB scan
    // thresholds. False positives die in the real join, so the oracle
    // is the plain join+agg; the might_contain plan property rides in
    // the row set (p5/io_bucketed pattern).
    "bloom_prefilter_join" -> ((s, dir) => {
      val t = Tables(s, dir)
      val dim = t.orders.where(col("o_totalprice") > 400000)
        .select(col("o_orderkey"), col("o_orderpriority"))
      val joined = Relational.bloomPreFilterJoin(
        t.lineitem.select(col("l_orderkey"), col("l_quantity")),
        dim, "l_orderkey", "o_orderkey", expectedItems = 40000L)
      val used = joined.queryExecution.executedPlan.toString
        .contains("might_contain")
      joined.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
        .withColumn("bloom_filter_used", lit(used))
        .orderBy(col("o_orderpriority"))
    }),

    // Z-order (Morton) clustering report over events: interleave the
    // low 8 bits of the user and value dimensions, bucket by the top z
    // bits (the row-group a z-ordered write would place each row in),
    // and report per-bucket ranges of BOTH dimensions — the locality
    // that makes parquet min/max stats prune on two predicate columns
    // instead of one. Pure integer bit arithmetic, replayed verbatim by
    // the oracle; the spec quantifies the locality win vs a
    // single-dimension sort.
    "layout_zorder_stats" -> ((s, dir) => {
      graft.operators.Layout.zOrderStats(Tables(s, dir).events,
          pmod(col("user_id"), lit(256)),
          pmod(floor(col("value")).cast("long"), lit(256)),
          bits = 8, shift = 12)
        .orderBy(col("bucket"))
    }),

    // Compaction planning over a per-day file inventory (one row per
    // o_orderdate, bytes = rows × 128): exclusive-prefix-sum bucketing
    // packs date-ordered files into ~16 KiB output groups. The window
    // runs over FILE METADATA (thousands of rows), never the data —
    // the small-files problem at 100 TB is a metadata problem; the
    // heavy rewrite the plan drives is one repartition-by-bin shuffle.
    "layout_compaction_bins" -> ((s, dir) => {
      val files = Tables(s, dir).orders
        .groupBy(col("o_orderdate").as("file_date"))
        .agg((count(lit(1)) * 128).as("bytes"))
      Layout.compactionBins(files, Seq(col("file_date")), col("bytes"),
          targetBytes = 16384L)
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bin_bytes"),
          date_format(min(col("file_date")), "yyyy-MM-dd").as("first_date"),
          date_format(max(col("file_date")), "yyyy-MM-dd").as("last_date"))
        .orderBy(col("bin"))
    }),

    // One-pass data-quality profile over four lineitem columns:
    // null/distinct/min/max per column from a single aggregation +
    // stack unpivot. The k-way Expand behind the exact distincts is
    // priced in the operator's Scaladoc (approx_count_distinct is the
    // 100 TB swap-in).
    "profile_lineitem" -> ((s, dir) => {
      Diagnostics.profileColumns(Tables(s, dir).lineitem,
          Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag"))
        .orderBy(col("column_name"))
    }),

    // Many-models fitting: an independent OLS (slope/intercept/R²) per
    // return flag in ONE scan — grouped sufficient statistics, closed
    // form per group; a million per-entity models would cost the same
    // single shuffle.
    "ml_grouped_ols" -> ((s, dir) => {
      graft.mlops.LinearOps.olsFitGrouped(Tables(s, dir).lineitem,
          col("l_returnflag"), col("l_quantity"),
          col("l_extendedprice") / 1000)
        .orderBy(col("grp"))
    }),

    // Key-skew diagnosis on the event stream's user key: the one-row
    // report (max/avg ratio, top-1 share, hot-key count, recommended
    // salt factor) that decides between a plain, salted, or broadcast
    // plan BEFORE the 100 TB shuffle runs.
    "skew_report_events" -> ((s, dir) => {
      Diagnostics.keySkewReport(Tables(s, dir).events, col("user_id"))
    }),

    // Fellegi–Sunter record linkage: customers re-published with only a
    // name-tail digit and a 10-rounded balance (the "dirty feed") are
    // re-linked to the master by blocked scoring — block on (nation,
    // segment, balance-kilobucket), two field rules with log2(m/u)
    // weights, min-struct argmax per dirty record, threshold keeps
    // dual-agreement pairs only. d_custkey is carried as ground truth
    // for precision measurement, never used in scoring.
    "er_link_customers" -> ((s, dir) => {
      val cust = Tables(s, dir).customer
      val a = cust.select(col("c_custkey"), col("c_name"),
        col("c_nationkey"), col("c_mktsegment"), col("c_acctbal"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_kb"))
      val b = cust.select(col("c_custkey").as("d_custkey"),
        substring(col("c_name"), -1, 1).as("d_tail"),
        (round(col("c_acctbal") / 10) * 10).as("d_bal"),
        col("c_nationkey"), col("c_mktsegment"))
        .withColumn("bal_kb", floor(col("d_bal") / 1000).cast("long"))
      val scored = Linkage.scorePairs(a, b,
        Seq("c_nationkey", "c_mktsegment", "bal_kb"),
        Seq(
          Linkage.FieldRule("name_tail",
            substring(col("c_name"), -1, 1) === col("d_tail"), 3.25, -4.17),
          Linkage.FieldRule("balance",
            abs(col("c_acctbal") - col("d_bal")) <= 5, 2.29, -2.5)))
      Linkage.bestMatches(scored, "c_custkey", "d_custkey", threshold = 4.0)
        .orderBy(col("d_custkey"))
    }),

    // The same linkage through the skew-aware scorer: blocks past the
    // per-task pair budget split across per-block-sized sub-block
    // counts, replicating only the hot b-side rows — the scored pair
    // set (and hence every match) is bit-identical to the plain plan,
    // which is why this query shares er_link_customers' oracle values.
    // At 100 TB this is the difference between a hot block's quadratic
    // pair set landing on one straggler task and on c² balanced tasks.
    "er_link_customers_salted" -> ((s, dir) => {
      val cust = Tables(s, dir).customer
      val a = cust.select(col("c_custkey"), col("c_name"),
        col("c_nationkey"), col("c_mktsegment"), col("c_acctbal"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_kb"))
      val b = cust.select(col("c_custkey").as("d_custkey"),
        substring(col("c_name"), -1, 1).as("d_tail"),
        (round(col("c_acctbal") / 10) * 10).as("d_bal"),
        col("c_nationkey"), col("c_mktsegment"))
        .withColumn("bal_kb", floor(col("d_bal") / 1000).cast("long"))
      val scored = Linkage.scorePairsSkewAware(a, "c_custkey", b,
        Seq("c_nationkey", "c_mktsegment", "bal_kb"),
        Seq(
          Linkage.FieldRule("name_tail",
            substring(col("c_name"), -1, 1) === col("d_tail"), 3.25, -4.17),
          Linkage.FieldRule("balance",
            abs(col("c_acctbal") - col("d_bal")) <= 5, 2.29, -2.5)))
      Linkage.bestMatches(scored, "c_custkey", "d_custkey", threshold = 4.0)
        .orderBy(col("d_custkey"))
    }),

    // Fellegi–Sunter parameter ESTIMATION: the m/u/p EM fit over the
    // same blocked candidate pairs er_link_customers scores — the
    // weights stop being hand-supplied constants and become an output
    // (3 fixed EM rounds from m=0.9/u=0.1/p=0.1, fully unrolled in the
    // oracle). The emitted w_agree/w_disagree are FieldRule-ready.
    "er_estimate_mu" -> ((s, dir) => {
      val cust = Tables(s, dir).customer
      val a = cust.select(col("c_custkey"), col("c_name"),
        col("c_nationkey"), col("c_mktsegment"), col("c_acctbal"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_kb"))
      val b = cust.select(col("c_custkey").as("d_custkey"),
        substring(col("c_name"), -1, 1).as("d_tail"),
        (round(col("c_acctbal") / 10) * 10).as("d_bal"),
        col("c_nationkey"), col("c_mktsegment"))
        .withColumn("bal_kb", floor(col("d_bal") / 1000).cast("long"))
      val paired = a.join(b, Seq("c_nationkey", "c_mktsegment", "bal_kb"))
      Linkage.estimateMU(paired, Seq(
          ("name_tail", substring(col("c_name"), -1, 1) === col("d_tail")),
          ("balance", abs(col("c_acctbal") - col("d_bal")) <= 5)))
        .orderBy(col("field"))
    }),

    // Weighted sample without replacement (Efraimidis–Spirakis A-ES):
    // longer documents (weight = n_chars) are proportionally likelier,
    // every draw a pure function of the doc key — reproducible across
    // engines, partitionings, and retries. Top-k plans as
    // TakeOrderedAndProject (partial top-k per partition), no sort
    // shuffle.
    "sample_weighted_topk" -> ((s, dir) => {
      Sampling.weightedSample(Tables(s, dir).documents, col("doc_id"),
          col("n_chars"), k = 50)
        .select(col("doc_id"), col("n_chars"),
          (round(col("_es_key"), 8) + lit(0.0)).as("es_key"))
        .orderBy(col("es_key").desc, col("doc_id"))
    }),

    // Temperature-smoothed mix (weight ∝ n^alpha, the multilingual
    // sampling rule): no hand-tuned weight map — small sources upweight
    // relative to their natural share, derived entirely from observed
    // stratum sizes. alpha = 0.7, the mBERT-family default.
    "mix_rates_temperature" -> ((s, dir) => {
      Sampling.mixRatesTemperature(Tables(s, dir).documents, col("source"),
          alpha = 0.7, totalTarget = 2000L)
        .orderBy(col("stratum"))
    }),

    // Context-window packing: which pretraining windows each doc feeds
    // (4 shards per source — the partition-sizing knob; see operators.Packing).
    "pack_context_windows" -> ((s, dir) => {
      Packing.packContextWindows(Tables(s, dir).documents,
          col("source"), col("doc_id"), size(split(col("text"), " ")),
          budget = 256L, shards = 4)
        .orderBy(col("grp"), col("shard"), col("id"))
    }),

    // TPC-H Q18 shape: large-volume orders — join fact to pre-aggregated
    // line quantities, having-filter, deterministic top-k.
    "q18_large_orders" -> ((s, dir) => {
      val t = Tables(s, dir)
      val bigOrders = t.lineitem
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .where(col("sum_qty") > 250)
      t.orders
        .join(bigOrders, col("o_orderkey") === col("l_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("totalprice"), col("sum_qty"))
        .orderBy(col("totalprice").desc, col("o_orderkey"))
        .limit(20)
    }),

    // Higher-order array functions over the embedding vectors: HOF
    // aggregate fold for the sum, array_min/max, element count.
    "array_stats_embeddings" -> ((s, dir) => {
      Tables(s, dir).embeddings
        .where(col("vec_id") < 200)
        .select(col("vec_id"),
          size(col("embedding")).as("dim"),
          round(expr("aggregate(embedding, cast(0 as double), (acc, x) -> acc + x)"), 3)
            .as("vsum"),
          round(array_min(col("embedding")).cast("double"), 4).as("vmin"),
          round(array_max(col("embedding")).cast("double"), 4).as("vmax"))
        .orderBy(col("vec_id"))
    }),

    // Date/time function breadth over order timestamps: calendar parts,
    // ISO week, day-of-week (aligned to Spark's 1=Sunday), arithmetic,
    // month boundaries, epoch seconds.
    "time_features_orders" -> ((s, dir) => {
      Tables(s, dir).orders
        .where(col("o_orderkey") < 2000)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          dayofweek(col("o_orderdate")).as("dow"),
          dayofyear(col("o_orderdate")).as("doy"),
          weekofyear(col("o_orderdate")).as("woy"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
          date_add(col("o_orderdate"), 30).cast("string").as("plus30"),
          last_day(col("o_orderdate")).cast("string").as("month_end"),
          datediff(lit("1998-01-01").cast("date"), col("o_orderdate")).as("days_to_98"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"))
        .orderBy(col("o_orderkey"))
    }),

    // Statistical aggregate parity: correlation, both covariance and
    // stddev/variance flavors, and the boolean aggregate family.
    // (skewness/kurtosis are deliberately absent: Spark and DuckDB
    // disagree on population-vs-sample definitions.)
    "stats_agg_lineitem" -> ((s, dir) => {
      Tables(s, dir).lineitem
        .groupBy(col("l_returnflag"))
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
          round(covar_pop(col("l_quantity"), col("l_extendedprice")), 4).as("cov_p"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("cov_s"),
          round(stddev_pop(col("l_discount")), 6).as("sd_p"),
          round(stddev_samp(col("l_discount")), 6).as("sd_s"),
          round(var_pop(col("l_discount")), 6).as("var_p"),
          round(var_samp(col("l_discount")), 6).as("var_s"),
          bool_and(col("l_quantity") > 0).as("all_pos"),
          bool_or(col("l_discount") > 0.09).as("any_big_disc"),
          count_if(col("l_tax") > 0.05).as("n_taxed"))
        .orderBy(col("l_returnflag"))
    }),

    // NULL semantics parity: nulls injected via nullif, then the
    // aggregate family over them — count(*) vs count(col), null-ignoring
    // avg/min/max, null grouping keys, coalesce/greatest/least.
    "null_semantics_orders" -> ((s, dir) => {
      Tables(s, dir).orders
        .select(
          nullif(col("o_orderstatus"), lit("P")).as("status_np"),
          when(col("o_totalprice") > 150000, col("o_totalprice")).as("big_price"),
          col("o_totalprice"))
        .groupBy(col("status_np"))
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("big_price")).as("n_big"),
          round(avg(col("big_price")), 2).as("avg_big"),
          round(min(col("big_price")), 2).as("min_big"),
          round(coalesce(max(col("big_price")), lit(-1.0)), 2).as("max_big_c"),
          round(sum(greatest(col("o_totalprice"), lit(100000.0))), 2).as("s_ge"),
          round(sum(least(col("o_totalprice"), lit(100000.0))), 2).as("s_le"))
        .orderBy(col("status_np").asc_nulls_first)
    }),

    // Multiset set ops: EXCEPT ALL / INTERSECT ALL keep duplicates
    // (count-respecting semantics), unlike the distinct set ops covered
    // by setops_nations. Over order-priority multisets of two statuses.
    "setops_all_orders" -> ((s, dir) => {
      val o = Tables(s, dir).orders
      val a = o.where(col("o_orderstatus") === "F").select(col("o_orderpriority"))
      val b = o.where(col("o_orderstatus") === "O").select(col("o_orderpriority"))
      a.exceptAll(b).groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_except_all"))
        .join(
          a.intersectAll(b).groupBy(col("o_orderpriority"))
            .agg(count(lit(1)).as("n_intersect_all")),
          Seq("o_orderpriority"), "full_outer")
        .select(col("o_orderpriority"),
          coalesce(col("n_except_all"), lit(0L)).as("n_except_all"),
          coalesce(col("n_intersect_all"), lit(0L)).as("n_intersect_all"))
        .orderBy(col("o_orderpriority"))
    }),

    // Equi-width histogram: 20 bins over the price range, computed from
    // the global min/max (two aggregations, no sort, no driver state).
    "histogram_prices" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
      val bounds = li.agg(min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"))
      li.crossJoin(bounds)
        .withColumn("bin",
          least(lit(19), floor((col("l_extendedprice") - col("lo")) * 20.0 /
            (col("hi") - col("lo"))).cast("int")))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          round(min(col("l_extendedprice")), 2).as("bin_min"),
          round(max(col("l_extendedprice")), 2).as("bin_max"))
        .orderBy(col("bin"))
    }),

    // Sequential funnel: signup → click → purchase, each stage's
    // timestamp strictly after the previous stage's. Three conditional
    // min-aggregations per user (one pass each), then stage counts —
    // no self-join on the raw events.
    "funnel_events" -> ((s, dir) => {
      val ev = Tables(s, dir).events
        .select(col("user_id"), col("event_type"), col("ts"))
      val t1 = ev.groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "signup", col("ts"))).as("t1"))
      val t2 = ev.join(t1, "user_id")
        .groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "click" && col("ts") > col("t1"),
          col("ts"))).as("t2"))
      val t3 = ev.join(t2, "user_id")
        .groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "purchase" && col("ts") > col("t2"),
          col("ts"))).as("t3"))
      t1.join(t2, "user_id").join(t3, "user_id")
        .agg(count(lit(1)).as("n_users"),
          sum(col("t1").isNotNull.cast("long")).as("n_signup"),
          sum(col("t2").isNotNull.cast("long")).as("n_signup_click"),
          sum(col("t3").isNotNull.cast("long")).as("n_full_funnel"))
    }),

    // Sorted string aggregation (listagg semantics): deterministic via
    // in-row sort of the collected list.
    "string_agg_region_nations" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.nation.join(t.region, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(array_join(sort_array(collect_list(col("n_name"))), ",")
          .as("nations"),
          count(lit(1)).as("n"))
        .orderBy(col("r_name"))
    }),

    // RANGE window frame: trailing-hour sum per user ordered by epoch
    // seconds — value-based frame bounds (peers included), vs the
    // row-count frame of window_moving_avg.
    "window_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("epoch_s"))
        .rangeBetween(-3600, 0)
      Tables(s, dir).events
        .where(col("user_id") < 50)
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("epoch_s"), col("value"))
        .withColumn("trail_1h_sum", round(sum(col("value")).over(w), 2))
        .orderBy(col("user_id"), col("epoch_s"), col("event_id"))
    }),

    // Time-series resample + forward fill: dense hourly grid per user,
    // gaps carry the last observed value (see operators.TimeSeries).
    "resample_gapfill_events" -> ((s, dir) => {
      graft.operators.TimeSeries.resampleHourlyFill(
          Tables(s, dir).events.where(col("user_id") < 40),
          col("user_id"), col("ts"), col("value"))
        .select(col("key").as("user_id"),
          date_format(col("hour"), "yyyy-MM-dd HH:mm").as("hour_s"),
          col("v"), col("v_filled"), col("is_gap"))
        .orderBy(col("user_id"), col("hour_s"))
    }),

    // Truncated EWMA (pandas ewm(alpha).mean() adjust=True, 20 lags) —
    // the per-key smoothed feature column of a training pipeline; one
    // keyed window + in-row weighted fold (see operators.TimeSeries).
    "ts_ewma_events" -> ((s, dir) => {
      graft.operators.TimeSeries.ewma(
          Tables(s, dir).events.where(col("user_id") < 100),
          col("user_id"), Seq(col("ts"), col("event_id")), col("value"),
          alpha = 0.1, lags = 20)
        .select(col("user_id"), col("event_id"), col("ewma"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // SCD2 versioning: each customer's orders become validity intervals
    // (valid_from = order date, valid_to = next order's date, open-ended
    // current row) — the slowly-changing-dimension shape, built from
    // lead() over a keyed window.
    "scd2_customer_orders" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables(s, dir).orders
        .where(col("o_custkey") < 300)
        .select(col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("valid_from"),
          coalesce(
            date_format(lead(col("o_orderdate"), 1).over(w), "yyyy-MM-dd"),
            lit("9999-12-31")).as("valid_to"),
          (lead(col("o_orderdate"), 1).over(w).isNull).cast("int").as("is_current"))
        .orderBy(col("o_custkey"), col("valid_from"), col("o_orderkey"))
    }),

    // JSON path extraction (get_json_object family) over the raw props
    // strings, aggregated per event type.
    "json_extract_events" -> ((s, dir) => {
      Tables(s, dir).events
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }),

    // Regex extraction over the text corpus: first long word and the
    // count of long words per document.
    "regex_extract_docs" -> ((s, dir) => {
      Tables(s, dir).documents
        .where(col("doc_id") < 500)
        .select(col("doc_id"),
          regexp_extract(col("text"), "([a-z]{8,})", 1).as("first_long"),
          size(expr("regexp_extract_all(text, '([a-z]{8,})', 1)")).as("n_long"))
        .orderBy(col("doc_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    // Cell-for-cell CMS replay: same md5 seed family ('s<i>:' prefix,
    // first 8 hex chars as a long), same width-16 modulus, weighted by
    // exact term counts (mathematically identical to the engine's
    // instance-stream tally).
    "sketch_count_min" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |exact AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS exact_count
        |  FROM toks GROUP BY term),
        |top AS (
        |  SELECT term, exact_count FROM exact
        |  ORDER BY exact_count DESC, term LIMIT 50),
        |cells AS (
        |  SELECT e.term, e.exact_count, g.i AS i,
        |    ('0x' || substr(md5('s' || CAST(g.i AS VARCHAR) || ':' || e.term), 1, 8))::BIGINT
        |      % 16 AS cell
        |  FROM exact e, generate_series(0, 3) g(i)),
        |sketch AS (
        |  SELECT i, cell, CAST(sum(exact_count) AS BIGINT) AS counter
        |  FROM cells GROUP BY i, cell),
        |est AS (
        |  SELECT c.term, min(s.counter) AS cms_count
        |  FROM cells c JOIN sketch s ON c.i = s.i AND c.cell = s.cell
        |  WHERE c.term IN (SELECT term FROM top)
        |  GROUP BY c.term)
        |SELECT t.term, t.exact_count, e.cms_count,
        |  e.cms_count >= t.exact_count AS is_overestimate
        |FROM top t JOIN est e ON t.term = e.term
        |ORDER BY t.exact_count DESC, t.term""".stripMargin,

    "pivot_orders_status" ->
      """SELECT o_orderpriority,
        |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS total_f,
        |  round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS total_o,
        |  round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS total_p
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "quantiles_lineitem" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
        |  round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
        |  round(quantile_cont(l_extendedprice, 0.95), 4) AS p95
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "window_rank_functions" ->
      """SELECT c_nationkey, c_custkey, round(c_acctbal, 2) AS acctbal,
        |  CAST(rank() OVER w AS INT) AS rnk,
        |  CAST(dense_rank() OVER w AS INT) AS drnk,
        |  round(percent_rank() OVER w, 6) AS prnk,
        |  round(cume_dist() OVER w, 6) AS cdist,
        |  CAST(ntile(4) OVER w AS INT) AS quartile
        |FROM customer WHERE c_nationkey < 5
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_nationkey, rnk""".stripMargin,

    "sample_deterministic" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 10
        |ORDER BY doc_id""".stripMargin,

    "split_train_val_test" ->
      """WITH b AS (
        |  SELECT doc_id, lang,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000
        |      AS bkt
        |  FROM documents)
        |SELECT lang,
        |  CASE WHEN bkt < 800 THEN 'train'
        |       WHEN bkt < 900 THEN 'val' ELSE 'test' END AS split,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM b
        |GROUP BY 1, 2
        |ORDER BY lang, split""".stripMargin,

    "sample_k_per_group" ->
      """SELECT doc_id, source FROM documents
        |QUALIFY row_number() OVER (PARTITION BY source
        |  ORDER BY md5(CAST(doc_id AS VARCHAR)), CAST(doc_id AS VARCHAR)) <= 5
        |ORDER BY source, doc_id""".stripMargin,

    // The bloom gate is invisible to semantics (false positives die in
    // the join), so the oracle is the plain selective join + agg.
    "bloom_prefilter_join" ->
      """SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines,
        |  round(sum(l.l_quantity), 2) AS sum_qty,
        |  true AS bloom_filter_used
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_totalprice > 400000
        |GROUP BY o.o_orderpriority
        |ORDER BY o.o_orderpriority""".stripMargin,

    // Verbatim Morton-interleave replay: bit i of x at position 2i, bit
    // i of y at 2i+1, summed as exact power-of-two multiplies.
    "layout_zorder_stats" -> {
      val z = (0 until 8).map { i =>
        s"((x >> $i) & 1) * ${1L << (2 * i)} + " +
          s"((y >> $i) & 1) * ${1L << (2 * i + 1)}"
      }.mkString(" + ")
      s"""WITH dims AS (
         |  SELECT user_id % 256 AS x,
         |    CAST(floor(value) AS BIGINT) % 256 AS y
         |  FROM events),
         |zed AS (
         |  SELECT x, y, ($z) >> 12 AS bucket FROM dims)
         |SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
         |  min(x) AS x_min, max(x) AS x_max,
         |  min(y) AS y_min, max(y) AS y_max
         |FROM zed GROUP BY bucket
         |ORDER BY bucket""".stripMargin
    },

    // Exclusive prefix sum replayed with the same ROWS BETWEEN frame;
    // // is DuckDB integer division (the CAST in Spark truncates the
    // same way for non-negative cums).
    "layout_compaction_bins" ->
      """WITH files AS (
        |  SELECT o_orderdate AS file_date, count(*) * 128 AS bytes
        |  FROM orders GROUP BY o_orderdate),
        |c AS (
        |  SELECT file_date, bytes,
        |    coalesce(sum(bytes) OVER (ORDER BY file_date
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        |  FROM files),
        |b AS (SELECT file_date, bytes, CAST(cum // 16384 AS BIGINT) AS bin
        |      FROM c)
        |SELECT bin, CAST(count(*) AS BIGINT) AS n_files,
        |  CAST(sum(bytes) AS BIGINT) AS bin_bytes,
        |  strftime(min(file_date), '%Y-%m-%d') AS first_date,
        |  strftime(max(file_date), '%Y-%m-%d') AS last_date
        |FROM b GROUP BY bin
        |ORDER BY bin""".stripMargin,

    // Per-column aggregates replayed as a UNION ALL; CAST AS VARCHAR
    // matches Spark's string cast (both engines print doubles in
    // shortest-roundtrip form; values here stay under the 1e7
    // scientific-notation switch).
    "profile_lineitem" -> {
      def one(c: String) =
        s"""SELECT '$c' AS column_name,
           |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_rows,
           |  CAST(count($c) AS BIGINT) AS n_non_null,
           |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem)
           |    - CAST(count($c) AS BIGINT) AS n_null,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_str,
           |  CAST(max($c) AS VARCHAR) AS max_str
           |FROM lineitem""".stripMargin
      Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag")
        .map(one).mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
    },

    // Identical closed-form algebra over the same grouped sufficient
    // statistics; nullif guards the degenerate-variance groups on both
    // sides.
    "ml_grouped_ols" ->
      """WITH s AS (
        |  SELECT l_returnflag AS grp, CAST(count(*) AS BIGINT) AS n,
        |    sum(l_quantity) AS sx, sum(l_extendedprice / 1000) AS sy,
        |    sum(l_quantity * l_quantity) AS sxx,
        |    sum(l_quantity * (l_extendedprice / 1000)) AS sxy,
        |    sum((l_extendedprice / 1000) * (l_extendedprice / 1000)) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT grp, n,
        |  round((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0), 6) + 0.0
        |    AS slope,
        |  round((sy - (n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0)
        |    * sx) / n, 6) + 0.0 AS intercept,
        |  round(pow(n * sxy - sx * sy, 2) /
        |    nullif((n * sxx - sx * sx) * (n * syy - sy * sy), 0), 6) + 0.0
        |    AS r2
        |FROM s
        |ORDER BY grp""".stripMargin,

    // Both engines divide exact integers (max·n_keys, n_rows) in double,
    // so the ratio/ceil arithmetic is bit-identical.
    "skew_report_events" ->
      """WITH c AS (
        |  SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
        |t AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS n_rows,
        |    CAST(count(*) AS BIGINT) AS n_keys,
        |    CAST(max(n) AS BIGINT) AS max_key_rows
        |  FROM c),
        |h AS (
        |  SELECT CAST(sum(CASE WHEN c.n * t.n_keys > t.n_rows * 2
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_hot_keys
        |  FROM c CROSS JOIN t)
        |SELECT t.n_rows, t.n_keys, t.max_key_rows,
        |  round(t.n_rows * 1.0 / t.n_keys, 4) + 0.0 AS avg_key_rows,
        |  round(t.max_key_rows * 1.0 * t.n_keys / t.n_rows, 4) + 0.0
        |    AS skew_ratio,
        |  round(t.max_key_rows * 1.0 / t.n_rows, 6) + 0.0 AS top1_share,
        |  h.n_hot_keys,
        |  CAST(ceil(t.max_key_rows * 1.0 * t.n_keys / t.n_rows) AS BIGINT)
        |    AS salt_factor
        |FROM t CROSS JOIN h""".stripMargin,

    // right(name, 1) = Spark's substring(name, -1, 1); round() is
    // half-away-from-zero in both engines, so d_bal and the block
    // bucket replay exactly.
    "er_link_customers" ->
      """WITH a AS (
        |  SELECT c_custkey, c_name, c_nationkey, c_mktsegment, c_acctbal,
        |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_kb
        |  FROM customer),
        |b AS (
        |  SELECT c_custkey AS d_custkey, right(c_name, 1) AS d_tail,
        |    round(c_acctbal / 10) * 10 AS d_bal, c_nationkey, c_mktsegment,
        |    CAST(floor(round(c_acctbal / 10) * 10 / 1000) AS BIGINT) AS bal_kb
        |  FROM customer),
        |p AS (
        |  SELECT b.d_custkey, a.c_custkey,
        |    round(CASE WHEN right(a.c_name, 1) = b.d_tail
        |        THEN 3.25 ELSE -4.17 END +
        |      CASE WHEN abs(a.c_acctbal - b.d_bal) <= 5
        |        THEN 2.29 ELSE -2.5 END, 6) + CAST(0.0 AS DOUBLE)
        |      AS fs_score
        |  FROM a JOIN b USING (c_nationkey, c_mktsegment, bal_kb)),
        |m AS (
        |  SELECT d_custkey, c_custkey, fs_score, row_number() OVER (
        |      PARTITION BY d_custkey ORDER BY fs_score DESC, c_custkey) AS rn
        |  FROM p WHERE fs_score >= 4.0)
        |SELECT d_custkey, c_custkey AS best_c_custkey, fs_score
        |FROM m WHERE rn = 1
        |ORDER BY d_custkey""".stripMargin,

    // 3 unrolled EM rounds over the blocked pair agreements. IEEE
    // parity mirrored operation for operation: per-field term
    // a·m + (1−a)(1−m), field product FIRST then ×p (the engine's
    // reduce(_*_)*lit(p) association), M-step ratios identical,
    // weights as ln()/ln(2) (both engines' log2-via-ln path).
    "er_estimate_mu" -> {
      val rounds = (1 to 3).map { r =>
        s"""t$r AS (
           |  SELECT sum(g) AS sg, count(*) * 1.0 AS n,
           |    sum(g * a1) AS sga1, sum(g * a2) AS sga2,
           |    sum(a1) AS sa1, sum(a2) AS sa2
           |  FROM (
           |    SELECT a1, a2, wm / (wm + wu) AS g FROM (
           |      SELECT a1, a2,
           |        (a1 * p.m1 + (1 - a1) * (1 - p.m1)) *
           |          (a2 * p.m2 + (1 - a2) * (1 - p.m2)) * p.p AS wm,
           |        (a1 * p.u1 + (1 - a1) * (1 - p.u1)) *
           |          (a2 * p.u2 + (1 - a2) * (1 - p.u2)) * (1 - p.p) AS wu
           |      FROM ag CROSS JOIN pr${r - 1} p) w) q),
           |pr$r AS (
           |  SELECT sga1 / sg AS m1, sga2 / sg AS m2,
           |    (sa1 - sga1) / (n - sg) AS u1, (sa2 - sga2) / (n - sg) AS u2,
           |    sg / n AS p
           |  FROM t$r)""".stripMargin
      }.mkString(",\n")
      s"""WITH a AS (
         |  SELECT c_custkey, c_name, c_nationkey, c_mktsegment, c_acctbal,
         |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_kb
         |  FROM customer),
         |b AS (
         |  SELECT c_custkey AS d_custkey, right(c_name, 1) AS d_tail,
         |    round(c_acctbal / 10) * 10 AS d_bal, c_nationkey, c_mktsegment,
         |    CAST(floor(round(c_acctbal / 10) * 10 / 1000) AS BIGINT) AS bal_kb
         |  FROM customer),
         |ag AS MATERIALIZED (
         |  SELECT
         |    CAST(CASE WHEN right(a.c_name, 1) = b.d_tail THEN 1 ELSE 0 END AS DOUBLE) AS a1,
         |    CAST(CASE WHEN abs(a.c_acctbal - b.d_bal) <= 5 THEN 1 ELSE 0 END AS DOUBLE) AS a2
         |  FROM a JOIN b USING (c_nationkey, c_mktsegment, bal_kb)),
         |pr0 AS (SELECT 0.9 AS m1, 0.9 AS m2, 0.1 AS u1, 0.1 AS u2, 0.1 AS p),
         |$rounds
         |SELECT * FROM (
         |  SELECT 'name_tail' AS field, round(m1, 6) + 0.0 AS m,
         |    round(u1, 6) + 0.0 AS u,
         |    round(ln(m1 / u1) / ln(2), 6) + 0.0 AS w_agree,
         |    round(ln((1 - m1) / (1 - u1)) / ln(2), 6) + 0.0 AS w_disagree,
         |    round(p, 6) + 0.0 AS p FROM pr3
         |  UNION ALL
         |  SELECT 'balance', round(m2, 6) + 0.0, round(u2, 6) + 0.0,
         |    round(ln(m2 / u2) / ln(2), 6) + 0.0,
         |    round(ln((1 - m2) / (1 - u2)) / ln(2), 6) + 0.0,
         |    round(p, 6) + 0.0 FROM pr3)
         |ORDER BY field""".stripMargin
    },

    // Salting only re-partitions WHERE pairs are scored, never WHICH
    // pairs are scored — the oracle is the same pair enumeration.
    "er_link_customers_salted" ->
      """WITH a AS (
        |  SELECT c_custkey, c_name, c_nationkey, c_mktsegment, c_acctbal,
        |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_kb
        |  FROM customer),
        |b AS (
        |  SELECT c_custkey AS d_custkey, right(c_name, 1) AS d_tail,
        |    round(c_acctbal / 10) * 10 AS d_bal, c_nationkey, c_mktsegment,
        |    CAST(floor(round(c_acctbal / 10) * 10 / 1000) AS BIGINT) AS bal_kb
        |  FROM customer),
        |p AS (
        |  SELECT b.d_custkey, a.c_custkey,
        |    round(CASE WHEN right(a.c_name, 1) = b.d_tail
        |        THEN 3.25 ELSE -4.17 END +
        |      CASE WHEN abs(a.c_acctbal - b.d_bal) <= 5
        |        THEN 2.29 ELSE -2.5 END, 6) + CAST(0.0 AS DOUBLE)
        |      AS fs_score
        |  FROM a JOIN b USING (c_nationkey, c_mktsegment, bal_kb)),
        |m AS (
        |  SELECT d_custkey, c_custkey, fs_score, row_number() OVER (
        |      PARTITION BY d_custkey ORDER BY fs_score DESC, c_custkey) AS rn
        |  FROM p WHERE fs_score >= 4.0)
        |SELECT d_custkey, c_custkey AS best_c_custkey, fs_score
        |FROM m WHERE rn = 1
        |ORDER BY d_custkey""".stripMargin,

    // Same md5-uniform (13 hex chars / 2^52) and u^(1/w) scoring; the
    // top-50 selection happens on the unrounded keys on both sides.
    "sample_weighted_topk" ->
      """WITH wts AS (
        |  SELECT doc_id, n_chars,
        |    pow(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
        |          / 4503599627370496.0,
        |        1.0 / n_chars) AS k
        |  FROM documents WHERE n_chars > 0)
        |SELECT doc_id, n_chars, round(k, 8) + 0.0 AS es_key
        |FROM wts ORDER BY k DESC, doc_id LIMIT 50""".stripMargin,

    "mix_rates_temperature" ->
      """WITH agg AS (
        |  SELECT source AS stratum, CAST(count(*) AS BIGINT) AS n_actual
        |  FROM documents GROUP BY source),
        |tf AS (
        |  SELECT stratum, n_actual,
        |    round(pow(n_actual, 0.7) / sum(pow(n_actual, 0.7)) OVER (), 6)
        |      AS target_frac
        |  FROM agg),
        |tg AS (
        |  SELECT stratum, n_actual, target_frac,
        |    CAST(floor(target_frac * 2000) AS BIGINT) AS n_target
        |  FROM tf)
        |SELECT stratum, n_actual, target_frac, n_target,
        |  round(least(CAST(1 AS DOUBLE),
        |    CAST(n_target AS DOUBLE) / n_actual), 6) AS keep_rate
        |FROM tg ORDER BY stratum""".stripMargin,

    "mix_rates" ->
      """WITH agg AS (
        |  SELECT source AS stratum, count(*) AS n_actual FROM documents
        |  GROUP BY source),
        |tf AS (
        |  SELECT stratum, n_actual,
        |    round(CASE stratum
        |      WHEN 'src0' THEN CAST(4 AS DOUBLE) / 7
        |      WHEN 'src1' THEN CAST(2 AS DOUBLE) / 7
        |      WHEN 'src2' THEN CAST(1 AS DOUBLE) / 7
        |      ELSE CAST(0 AS DOUBLE) END, 6) AS target_frac
        |  FROM agg),
        |tg AS (
        |  SELECT stratum, n_actual, target_frac,
        |    CAST(floor(target_frac * 200) AS BIGINT) AS n_target
        |  FROM tf)
        |SELECT stratum, n_actual, target_frac, n_target,
        |  round(least(CAST(1 AS DOUBLE),
        |    CAST(n_target AS DOUBLE) / n_actual), 6) AS keep_rate
        |FROM tg ORDER BY stratum""".stripMargin,

    "pack_context_windows" ->
      """WITH base AS (
        |  SELECT source AS grp,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 4
        |      AS INT) AS shard,
        |    doc_id AS id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT grp, shard, id, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY grp, shard ORDER BY id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS tok_end
        |  FROM base)
        |SELECT grp, shard, id, n_tokens, tok_end - n_tokens AS tok_start,
        |  CAST(floor((tok_end - n_tokens) / CAST(256 AS DOUBLE)) AS BIGINT)
        |    AS first_window,
        |  CAST(floor((tok_end - 1) / CAST(256 AS DOUBLE)) AS BIGINT)
        |    AS last_window,
        |  CAST(floor((tok_end - 1) / CAST(256 AS DOUBLE))
        |    - floor((tok_end - n_tokens) / CAST(256 AS DOUBLE)) + 1 AS BIGINT)
        |    AS n_windows
        |FROM c ORDER BY grp, shard, id""".stripMargin,

    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(l_quantity) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
        |SELECT c_name, o_orderkey, round(o_totalprice, 2) AS totalprice, sum_qty
        |FROM orders
        |JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY totalprice DESC, o_orderkey
        |LIMIT 20""".stripMargin,

    "array_stats_embeddings" ->
      """SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
        |  round(list_sum(CAST(embedding AS DOUBLE[])), 3) AS vsum,
        |  round(CAST(list_min(embedding) AS DOUBLE), 4) AS vmin,
        |  round(CAST(list_max(embedding) AS DOUBLE), 4) AS vmax
        |FROM embeddings WHERE vec_id < 200
        |ORDER BY vec_id""".stripMargin,

    "time_features_orders" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(quarter(o_orderdate) AS INT) AS q,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(day(o_orderdate) AS INT) AS dom,
        |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        |  CAST(dayofyear(o_orderdate) AS INT) AS doy,
        |  CAST(weekofyear(o_orderdate) AS INT) AS woy,
        |  strftime(o_orderdate, '%Y-%m') AS ym,
        |  CAST(CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS VARCHAR) AS plus30,
        |  CAST(last_day(o_orderdate) AS VARCHAR) AS month_end,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INT)
        |    AS days_to_98,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders WHERE o_orderkey < 2000
        |ORDER BY o_orderkey""".stripMargin,

    "stats_agg_lineitem" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        |  round(covar_pop(l_quantity, l_extendedprice), 4) AS cov_p,
        |  round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_s,
        |  round(stddev_pop(l_discount), 6) AS sd_p,
        |  round(stddev_samp(l_discount), 6) AS sd_s,
        |  round(var_pop(l_discount), 6) AS var_p,
        |  round(var_samp(l_discount), 6) AS var_s,
        |  bool_and(l_quantity > 0) AS all_pos,
        |  bool_or(l_discount > 0.09) AS any_big_disc,
        |  CAST(count_if(l_tax > 0.05) AS BIGINT) AS n_taxed
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "null_semantics_orders" ->
      """SELECT nullif(o_orderstatus, 'P') AS status_np,
        |  count(*) AS n_rows,
        |  count(CASE WHEN o_totalprice > 150000 THEN o_totalprice END) AS n_big,
        |  round(avg(CASE WHEN o_totalprice > 150000 THEN o_totalprice END), 2)
        |    AS avg_big,
        |  round(min(CASE WHEN o_totalprice > 150000 THEN o_totalprice END), 2)
        |    AS min_big,
        |  round(coalesce(max(CASE WHEN o_totalprice > 150000 THEN o_totalprice END),
        |    -1.0), 2) AS max_big_c,
        |  round(sum(greatest(o_totalprice, 100000.0)), 2) AS s_ge,
        |  round(sum(least(o_totalprice, 100000.0)), 2) AS s_le
        |FROM orders
        |GROUP BY nullif(o_orderstatus, 'P')
        |ORDER BY status_np NULLS FIRST""".stripMargin,

    "setops_all_orders" ->
      """WITH a AS (SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'),
        |     b AS (SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'),
        |ea AS (
        |  SELECT o_orderpriority, count(*) AS n_except_all
        |  FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
        |  GROUP BY o_orderpriority),
        |ia AS (
        |  SELECT o_orderpriority, count(*) AS n_intersect_all
        |  FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
        |  GROUP BY o_orderpriority)
        |SELECT coalesce(ea.o_orderpriority, ia.o_orderpriority) AS o_orderpriority,
        |  coalesce(n_except_all, 0) AS n_except_all,
        |  coalesce(n_intersect_all, 0) AS n_intersect_all
        |FROM ea FULL OUTER JOIN ia ON ea.o_orderpriority = ia.o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "histogram_prices" ->
      """WITH b AS (
        |  SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
        |  FROM lineitem)
        |SELECT least(19, CAST(floor((l_extendedprice - lo) * 20.0 / (hi - lo))
        |    AS INT)) AS bin,
        |  count(*) AS n,
        |  round(min(l_extendedprice), 2) AS bin_min,
        |  round(max(l_extendedprice), 2) AS bin_max
        |FROM lineitem, b
        |GROUP BY 1
        |ORDER BY bin""".stripMargin,

    "funnel_events" ->
      """WITH t1 AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN ts END) AS t1
        |  FROM events GROUP BY user_id),
        |t2 AS (
        |  SELECT e.user_id,
        |    min(CASE WHEN e.event_type = 'click' AND e.ts > t1.t1 THEN e.ts END) AS t2
        |  FROM events e JOIN t1 ON e.user_id = t1.user_id
        |  GROUP BY e.user_id),
        |t3 AS (
        |  SELECT e.user_id,
        |    min(CASE WHEN e.event_type = 'purchase' AND e.ts > t2.t2 THEN e.ts END) AS t3
        |  FROM events e JOIN t2 ON e.user_id = t2.user_id
        |  GROUP BY e.user_id)
        |SELECT count(*) AS n_users,
        |  CAST(sum(CASE WHEN t1.t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |  CAST(sum(CASE WHEN t2.t2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signup_click,
        |  CAST(sum(CASE WHEN t3.t3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
        |FROM t1 JOIN t2 ON t1.user_id = t2.user_id
        |JOIN t3 ON t2.user_id = t3.user_id""".stripMargin,

    "string_agg_region_nations" ->
      """SELECT r_name,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |  count(*) AS n
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin,

    "window_range_frame" ->
      """SELECT event_id, user_id,
        |  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS epoch_s, value,
        |  round(sum(value) OVER (
        |    PARTITION BY user_id ORDER BY CAST(epoch(date_trunc('second', ts)) AS BIGINT)
        |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 2) AS trail_1h_sum
        |FROM events WHERE user_id < 50
        |ORDER BY user_id, epoch_s, event_id""".stripMargin,

    "resample_gapfill_events" ->
      """WITH hourly AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hour,
        |    round(sum(value), 2) AS v
        |  FROM events WHERE user_id < 40 GROUP BY 1, 2),
        |spans AS (
        |  SELECT user_id, min(hour) AS h0, max(hour) AS h1
        |  FROM hourly GROUP BY user_id),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        |  FROM spans),
        |filled AS (
        |  SELECT g.user_id, g.hour, h.v
        |  FROM grid g LEFT JOIN hourly h
        |    ON g.user_id = h.user_id AND g.hour = h.hour)
        |SELECT user_id, strftime(hour, '%Y-%m-%d %H:%M') AS hour_s, v,
        |  last_value(v IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY hour
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
        |  CAST(v IS NULL AS INT) AS is_gap
        |FROM filled
        |ORDER BY user_id, hour_s""".stripMargin,

    // Truncated-EWMA replay: the (i, j) pair form of the 20-lag frame,
    // same weights pow(0.9, lag), adjust=True normalization.
    "ts_ewma_events" ->
      """WITH e AS (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM events WHERE user_id < 100),
        |p AS (
        |  SELECT a.user_id, a.event_id, b.value AS xv, a.rn - b.rn AS m
        |  FROM e a JOIN e b ON a.user_id = b.user_id
        |    AND b.rn BETWEEN a.rn - 19 AND a.rn)
        |SELECT user_id, event_id,
        |  round(sum(xv * pow(0.9, m)) / sum(pow(0.9, m)), 6) + 0.0 AS ewma
        |FROM p
        |GROUP BY user_id, event_id
        |ORDER BY user_id, event_id""".stripMargin,

    "scd2_customer_orders" ->
      """SELECT o_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
        |  coalesce(strftime(lead(o_orderdate, 1) OVER w, '%Y-%m-%d'), '9999-12-31')
        |    AS valid_to,
        |  CAST(lead(o_orderdate, 1) OVER w IS NULL AS INT) AS is_current
        |FROM orders WHERE o_custkey < 300
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin,

    "json_extract_events" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |  CAST(min(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS min_k,
        |  CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "regex_extract_docs" ->
      """SELECT doc_id,
        |  coalesce(regexp_extract(text, '([a-z]{8,})', 1), '') AS first_long,
        |  CAST(len(regexp_extract_all(text, '([a-z]{8,})', 1)) AS INT) AS n_long
        |FROM documents WHERE doc_id < 500
        |ORDER BY doc_id""".stripMargin
  )
}
