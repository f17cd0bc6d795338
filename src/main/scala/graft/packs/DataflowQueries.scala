package graft.packs

import graft.QueryPack
import graft.core.{Tables, Validation}
import graft.operators.{Blocking, Relational}
import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

import scala.util.Try

/** Core dataflow parity (SURVEY §2.1, D1–D12): the reference's
  * `BlockRDD`/`ArrayRDD`/`DictRDD` surface (`splearn/rdd.py`) re-expressed
  * as declarative DataFrame queries so Catalyst plans them. Blocking,
  * slicing, counting, reductions, projection, per-column transform and
  * positional zip each get an oracle-checked query.
  */
object DataflowQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // D1: block(rdd, bsize) — deterministic global blocking, verified by
    // per-block row counts + sums. (Scale path: Blocking.withPartitionLocalBlockId.)
    "d1_block" -> ((s, dir) => {
      val t = Tables(s, dir)
      Blocking
        .withBlockId(
          t.lineitem.select(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
          bsize = 1000,
          // (l_orderkey, l_linenumber) is NOT unique — sort on the full
          // row so engines agree wherever ties fall on a block boundary
          orderCols = Seq(col("l_orderkey"), col("l_linenumber"), col("l_quantity")))
        .groupBy(col("block_id"))
        .agg(count(lit(1)).as("n_rows"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("block_id"))
    }),

    // D2: unblock/tolist — the block→unblock ROUND-TRIP, value-level:
    // rows grouped into array-of-struct blocks (reference ArrayRDD
    // materialization) then exploded back must reproduce every row with
    // its block id. The oracle recomputes the expected assignment
    // directly, so collect_list/explode inverse semantics (no loss, no
    // duplication, struct field order) are hash-pinned, not just
    // spec-asserted.
    "d2_unblock_roundtrip" -> ((s, dir) => {
      val d = Tables(s, dir).documents
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val withIds = Blocking
        .withBlockId(d, bsize = 64, orderCols = Seq(col("doc_id")))
        .select(col("block_id"), col("doc_id"), col("lang"), col("n_chars"))
      Blocking.unblock(
        Blocking.blockRows(withIds, Seq("doc_id", "lang", "n_chars")))
        .orderBy(col("doc_id"))
    }),

    // D12: check_rdd — operator-boundary validation verdicts as DATA.
    // Each row is one requireColumns/requireColumn gate run against the
    // real table schemas: the three accepts prove valid frames pass, the
    // two rejects prove the gate actually fires (a Validation that
    // rubber-stamped everything would flip them to false and break the
    // hash).
    "d12_check_rdd" -> ((s, dir) => {
      val t = Tables(s, dir)
      val checks = Seq(
        ("customer_has_key_cols",
          Try(Validation.requireColumns(t.customer,
            "c_custkey", "c_name", "c_nationkey")).isSuccess),
        ("customer_key_is_long",
          Try(Validation.requireColumn(t.customer, "c_custkey", LongType))
            .isSuccess),
        ("documents_text_is_string",
          Try(Validation.requireColumn(t.documents, "text", StringType))
            .isSuccess),
        ("missing_column_rejected",
          Try(Validation.requireColumns(t.customer, "no_such_column"))
            .isFailure),
        ("wrong_dtype_rejected",
          Try(Validation.requireColumn(t.documents, "doc_id", StringType))
            .isFailure))
      import s.implicits._
      checks.toDF("check_name", "ok").orderBy(col("check_name"))
    }),

    // D13: SparseRDD parity (upstream splearn/rdd.py:~L420-480) — the
    // sparse-block contract as DATA: per-doc tf long form packs into
    // ml SparseVector rows and unpacks back, with (dim, nnz, L2)
    // invariants oracled and `roundtrip_ok` an ACTUAL full-outer-join
    // equality of the two long forms (not an assumed true — a lossy
    // pack/unpack would flip it and break the hash).
    "d13_sparse_roundtrip" -> ((s, dir) => {
      val tk = Tables(s, dir).documents.select(col("doc_id"),
        explode(split(col("text"), " ")).as("term"))
      val vocab = tk.select(col("term")).distinct()
        .withColumn("idx",
          (row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("term"))) - 1).cast("int"))
      // vocab size: the SparseVector dimensionality — one metadata-scale
      // driver scalar (same class as the k-center count)
      val dim = vocab.count().toInt
      val long = tk.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).cast("double").as("v"))
        .join(broadcast(vocab), "term")
        .select(col("doc_id"), col("idx"), col("v"))
        // feeds pack AND the equality check — materialize once
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      val vecs = graft.operators.SparseOps
        .toSparseVectors(long, "doc_id", "idx", "v", dim)
      val back = graft.operators.SparseOps.toLongForm(vecs, "doc_id", "vec")
      val mismatches = long.select(col("doc_id"), col("idx"),
          col("v").as("_va"))
        .join(back.select(col("doc_id"), col("idx"), col("v").as("_vb")),
          Seq("doc_id", "idx"), "full_outer")
        .where(col("_va").isNull || col("_vb").isNull ||
          col("_va") =!= col("_vb"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("_bad"))
      graft.operators.SparseOps.invariants(vecs, "doc_id", "vec")
        .join(mismatches, Seq("doc_id"), "left")
        .select(col("doc_id"), col("dim"), col("nnz"),
          (round(col("l2"), 6) + lit(0.0)).as("l2"),
          coalesce(col("_bad"), lit(0L)).equalTo(0L).as("roundtrip_ok"))
        .orderBy(col("doc_id"))
    }),

    // D3: count / __len__ across tables.
    "d3_count_rows" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.lineitem.agg(count(lit(1)).as("n_lineitem"))
        .crossJoin(t.orders.agg(count(lit(1)).as("n_orders")))
        .crossJoin(t.documents.agg(count(lit(1)).as("n_documents")))
        .crossJoin(t.embeddings.agg(count(lit(1)).as("n_embeddings")))
    }),

    // D4: first() — first row under a deterministic order.
    "d4_first_row" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_returnflag"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_returnflag"))
        .limit(1)
    }),

    // D6: ArrayRDD positional slicing ix[100:110] — row_number + range filter.
    "d6_slice_rows" -> ((s, dir) => {
      val t = Tables(s, dir)
      Blocking
        .withBlockId(
          t.lineitem.select(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
          bsize = 1000,
          orderCols = Seq(col("l_orderkey"), col("l_linenumber"), col("l_quantity")))
        .where(col("row_pos").between(101, 110))
        .select(col("row_pos").as("pos"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"))
        .orderBy(col("pos"))
    }),

    // D7: axis-wise reductions sum()/mean() — partial+final hash agg, the
    // pattern every reference fit() reduces to.
    "d7_colstats" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.lineitem.agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        round(avg(col("l_extendedprice")), 6).as("avg_price"),
        round(min(col("l_discount")), 2).as("min_disc"),
        round(max(col("l_discount")), 2).as("max_disc"),
        count(lit(1)).as("n_rows"))
    }),

    // D8: DictRDD column projection + predicate (pushed to parquet scan).
    "d8_project_filter" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.documents
        .where(col("lang") === "en" && col("n_chars") > 300)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // D9: DictRDD.transform on one column, others preserved.
    "d9_transform_column" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.events
        .select(col("event_id"), col("event_type"), col("value"),
          round(log(col("value") + lit(1.0)), 6).as("log_value"),
          upper(col("event_type")).as("event_type_uc"))
        .orderBy(col("event_id"))
    }),

    // Sources/sinks roundtrip: CSV + JSON + Hive-partitioned parquet out
    // and back, with a partition-pruned read (SURVEY §2.8 scans). Counts
    // pin losslessness; the oracle reads the canonical tables.
    "io_roundtrip_formats" -> ((s, dir) => {
      val t = Tables(s, dir)
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_io"
      Sources.writeCsv(t.nation, s"$base/nation_csv")
      Sources.writeJson(t.nation, s"$base/nation_json")
      Sources.writePartitioned(t.documents, s"$base/docs_part", Seq("lang"))
      t.nation.agg(count(lit(1)).as("n_src"))
        .crossJoin(Sources.readCsv(s, s"$base/nation_csv")
          .agg(count(lit(1)).as("n_csv")))
        .crossJoin(Sources.readJson(s, s"$base/nation_json")
          .agg(count(lit(1)).as("n_json")))
        .crossJoin(Sources.readParquet(s, s"$base/docs_part")
          .agg(count(lit(1)).as("n_part")))
        .crossJoin(Sources.readParquet(s, s"$base/docs_part")
          .where(col("lang") === "en")   // directory-level partition pruning
          .agg(count(lit(1)).as("n_part_en")))
    }),

    // Bucketed-star join+agg with the no-Exchange property pinned in
    // CORRECTNESS (the plan-property pattern of p5_broadcast_plan, for
    // bucketing): orders and lineitem are materialized as co-bucketed
    // tables on the order key, then joined (merge hint — the broadcast
    // path must not mask the bucketing) and aggregated BY THE BUCKET KEY;
    // that inner plan must contain no Exchange at all — the "pay the
    // shuffle once at ingest" layout working end to end. The small
    // per-status rollup is collected and re-emitted as literal rows so
    // the bucketed tables can be dropped before returning (the returned
    // frame must stay valid after cleanup); 3 rows of driver state,
    // never data-proportional.
    "io_bucketed_join_plan" -> ((s, dir) => {
      import s.implicits._
      val t = Tables(s, dir)
      val star = Sources.materializeBucketedStar(t, numBuckets = 8,
        prefix = "graft_iobkt")
      try {
        val perKey = star.orders.hint("merge")
          .join(star.lineitem, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n_lines"), sum(col("l_quantity")).as("qty"))
        val shuffleFree =
          !perKey.queryExecution.executedPlan.toString.contains("Exchange")
        val rolled = perKey
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n_orders"), sum(col("n_lines")).as("n_lines"),
            round(sum(col("qty")), 2).as("sum_qty"))
          .orderBy(col("o_orderstatus"))
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getDouble(3), shuffleFree))
          .toSeq
        rolled.toDF("o_orderstatus", "n_orders", "n_lines", "sum_qty",
          "shuffle_free")
      } finally star.drop()
    }),

    // Partition pruning pinned in CORRECTNESS (the p5/io_bucketed plan-
    // property pattern for the THIRD scan-reduction lever): orders
    // rewritten partitioned by priority, then a selective read whose
    // executed plan must carry the predicate as a PartitionFilter —
    // directory-level pruning, zero data rows read outside the matching
    // partition. Row counts are oracled; the boolean rides the row. The
    // temp layout is written under java.io.tmpdir and deleted before
    // returning (result collected first — 1 row of driver state).
    "io_partition_pruning_plan" -> ((s, dir) => {
      import s.implicits._
      val t = Tables(s, dir)
      val path = java.nio.file.Files
        .createTempDirectory("graft_iopart").toString
      try {
        t.orders.write.partitionBy("o_orderpriority")
          .mode("overwrite").parquet(path)
        val rd = s.read.parquet(path)
          .where(col("o_orderpriority") === "1-URGENT")
        // Inspect the scan node's partitionFilters EXPRESSIONS, not the
        // rendered plan text — "PartitionFilters: [...]" formatting is
        // not a stable API across Spark versions/AQE, while the typed
        // predicate list is. The filter must reference the partition
        // column AND carry the literal (the same literal also appears in
        // plain data Filters, so either test alone is vacuous).
        import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
        import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
        def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
          case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
          case f: FileSourceScanExec => Seq(f)
          case other => other.children.flatMap(scans)
        }
        val pruned = scans(rd.queryExecution.executedPlan).exists(f =>
          f.partitionFilters.exists(e =>
            e.references.exists(_.name == "o_orderpriority") &&
              e.toString.contains("1-URGENT")))
        val n = rd.count()
        Seq(("1-URGENT", n, pruned))
          .toDF("o_orderpriority", "n_rows", "partition_pruned")
      } finally {
        import scala.reflect.io.Directory
        new Directory(new java.io.File(path)).deleteRecursively()
      }
    }),

    // D10: DictRDD positional zip of two sources (deterministic row_number
    // ids, not monotonically_increasing_id — SURVEY §7 hard-part 2).
    "d10_zip_columns" -> ((s, dir) => {
      val t = Tables(s, dir)
      Relational
        .zipWithPosition(
          t.documents.select(col("doc_id"), col("lang")), Seq(col("doc_id")),
          t.embeddings.select(col("vec_id"), col("label")), Seq(col("vec_id")))
        .select(col("pos"), col("doc_id"), col("lang"), col("vec_id"), col("label"))
        .orderBy(col("pos"))
    }),

    // D11 persist/repartition as a VERIFIED query (graduated from
    // posture): documents repartition(8, bucket) on an engine-portable
    // md5 bucket, persisted; the result must (a) keep every row through
    // the exchange + persist, (b) CO-LOCATE each bucket in exactly one
    // physical partition (countDistinct(spark_partition_id) == 1 —
    // the property repartition-by-expression exists to provide), and
    // (c) hit all 8 buckets. The oracle recomputes bucket counts;
    // colocated flips false if the exchange ever stops honoring the
    // bucketing.
    "d11_repartition_persist" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      val bucketed = docs
        .select(col("doc_id"),
          pmod(graft.functions.GraftFunctions.md5Long(
            col("doc_id").cast("string"), 8), lit(8)).as("bucket"))
        .repartition(8, col("bucket"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      bucketed
        .withColumn("_pid", spark_partition_id())
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("_n"),
          countDistinct(col("_pid")).as("_nparts"))
        .agg(count(lit(1)).as("n_buckets"),
          sum(col("_n")).as("n_rows"),
          (max(col("_nparts")) === 1).as("colocated"))
    })
  )

  val oracles: Map[String, String] = Map(
    "d1_block" ->
      """WITH t AS (
        |  SELECT l_quantity,
        |    row_number() OVER (ORDER BY l_orderkey, l_linenumber, l_quantity) AS rn
        |  FROM lineitem)
        |SELECT CAST(floor((rn - 1) / 1000.0) AS BIGINT) AS block_id,
        |  count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty
        |FROM t GROUP BY 1 ORDER BY block_id""".stripMargin,

    "d2_unblock_roundtrip" ->
      """SELECT CAST(floor((row_number() OVER (ORDER BY doc_id) - 1) / 64.0)
        |    AS BIGINT) AS block_id,
        |  doc_id, lang, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Bucket membership recomputed with the same md5 family; the
    // colocation flag is a plan property pinned as a constant.
    "d11_repartition_persist" ->
      """SELECT CAST(count(DISTINCT b) AS BIGINT) AS n_buckets,
        |  CAST(count(*) AS BIGINT) AS n_rows, true AS colocated
        |FROM (SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS b
        |      FROM documents) t""".stripMargin,

    "d12_check_rdd" ->
      """SELECT check_name, ok FROM (VALUES
        |  ('customer_has_key_cols', true),
        |  ('customer_key_is_long', true),
        |  ('documents_text_is_string', true),
        |  ('missing_column_rejected', true),
        |  ('wrong_dtype_rejected', true)) v(check_name, ok)
        |ORDER BY check_name""".stripMargin,

    // Invariants recomputed from the long form directly (DuckDB has no
    // vector type — dim is the vocab count, nnz the per-doc distinct
    // terms, L2 on the tf counts); roundtrip_ok TRUE is the pinned
    // engine-side contract (the engine computes it as a real equality).
    "d13_sparse_roundtrip" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |vocab AS (SELECT DISTINCT term FROM toks),
        |vsz AS (SELECT count(*) AS dim FROM vocab),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS v
        |       FROM toks GROUP BY 1, 2)
        |SELECT doc_id, CAST((SELECT dim FROM vsz) AS INT) AS dim,
        |  CAST(count(*) AS INT) AS nnz,
        |  round(sqrt(sum(v * v)), 6) AS l2,
        |  TRUE AS roundtrip_ok
        |FROM tf GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "d3_count_rows" ->
      """SELECT (SELECT count(*) FROM lineitem) AS n_lineitem,
        |  (SELECT count(*) FROM orders) AS n_orders,
        |  (SELECT count(*) FROM documents) AS n_documents,
        |  (SELECT count(*) FROM embeddings) AS n_embeddings""".stripMargin,

    "d4_first_row" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag LIMIT 1""".stripMargin,

    "d6_slice_rows" ->
      """SELECT CAST(rn AS INT) AS pos, l_orderkey, l_linenumber, l_quantity FROM (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |    row_number() OVER (ORDER BY l_orderkey, l_linenumber, l_quantity) AS rn
        |  FROM lineitem) t
        |WHERE rn BETWEEN 101 AND 110 ORDER BY pos""".stripMargin,

    "d7_colstats" ->
      """SELECT round(sum(l_quantity), 2) AS sum_qty,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price,
        |  round(avg(l_extendedprice), 6) AS avg_price,
        |  round(min(l_discount), 2) AS min_disc,
        |  round(max(l_discount), 2) AS max_disc,
        |  count(*) AS n_rows
        |FROM lineitem""".stripMargin,

    "d8_project_filter" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE lang = 'en' AND n_chars > 300 ORDER BY doc_id""".stripMargin,

    "d9_transform_column" ->
      """SELECT event_id, event_type, value,
        |  round(ln(value + 1.0), 6) AS log_value,
        |  upper(event_type) AS event_type_uc
        |FROM events ORDER BY event_id""".stripMargin,

    "io_roundtrip_formats" ->
      """SELECT (SELECT count(*) FROM nation) AS n_src,
        |  (SELECT count(*) FROM nation) AS n_csv,
        |  (SELECT count(*) FROM nation) AS n_json,
        |  (SELECT count(*) FROM documents) AS n_part,
        |  (SELECT count(*) FROM documents WHERE lang = 'en') AS n_part_en""".stripMargin,

    "io_bucketed_join_plan" ->
      """SELECT o.o_orderstatus,
        |  CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  round(sum(l.l_quantity), 2) AS sum_qty,
        |  true AS shuffle_free
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |GROUP BY o.o_orderstatus
        |ORDER BY o.o_orderstatus""".stripMargin,

    "io_partition_pruning_plan" ->
      """SELECT '1-URGENT' AS o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  true AS partition_pruned
        |FROM orders WHERE o_orderpriority = '1-URGENT'""".stripMargin,

    "d10_zip_columns" ->
      """WITH a AS (SELECT doc_id, lang,
        |    row_number() OVER (ORDER BY doc_id) AS pos FROM documents),
        |  b AS (SELECT vec_id, label,
        |    row_number() OVER (ORDER BY vec_id) AS pos FROM embeddings)
        |SELECT CAST(a.pos AS INT) AS pos, doc_id, lang, vec_id, label
        |FROM a JOIN b ON a.pos = b.pos ORDER BY pos""".stripMargin
  )
}
