package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Accessors for the test corpus (TESTDATA.md): TPC-H-ish star schema plus
  * `events` (stream-shaped), `documents` (text corpus) and `embeddings`
  * (vector corpus). Reads are plain parquet scans so Catalyst predicate
  * pushdown / column pruning apply to every downstream query.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")

  /** `events.ts` normalized to the engine's µs TimestampType regardless of
    * how the generator wrote it — see [[Tables.normalizeTs]].
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.normalizeTs(t("events"))
  }
  /** Raw single-scan read — the bytes-on-disk view with no added
    * exchange. Kept for callers that must see the scan exactly as
    * planned (partitioning experiments, layout diagnostics).
    */
  def documentsRaw: DataFrame = t("documents")

  /** `documents`, hash-spread over the cluster WHEN the scan plans fewer
    * partitions than the spread target (r21 — see
    * [[graft.sources.Sources.spreadIfNarrow]]). The corpus files at the
    * test scale factors are single row groups, so every text pipeline's
    * CPU-heavy map side (HTML extraction, tokenization, shingling,
    * codec synthesis) otherwise runs in ONE task regardless of core
    * count; on a production multi-row-group corpus the condition is
    * false and this is exactly the raw scan — no exchange, pushdown and
    * pruning intact (predicates push through RepartitionByExpression).
    */
  def documents: DataFrame =
    graft.sources.Sources.spreadIfNarrow(documentsRaw,
      org.apache.spark.sql.functions.col("doc_id"),
      partitions = math.max(2, spark.sparkContext.defaultParallelism / 4))

  /** Pre-r21 alias: [[documents]] now spreads conditionally itself. */
  def documentsSpread: DataFrame = documents

  /** `embeddings` with the same conditional spread as [[documents]] —
    * the vector-corpus consumers (cell assignment, long-form explode,
    * the self-join exchange feeding the pair families) otherwise run
    * their whole map side in the single task a one-row-group scan plans.
    */
  def embeddings: DataFrame =
    graft.sources.Sources.spreadIfNarrow(t("embeddings"),
      org.apache.spark.sql.functions.col("vec_id"),
      partitions = math.max(2, spark.sparkContext.defaultParallelism / 4))
}

object Tables {

  /** Normalize `events.ts` to the engine's µs TimestampType across testdata
    * generations. The generator has written it as TIMESTAMP(NANOS) (which
    * Spark's vectorized reader surfaces as raw Long nanos under
    * `spark.sql.legacy.parquet.nanosAsLong`) and as timestamp[us] with
    * isAdjustedToUTC=false (which Spark reads as TIMESTAMP_NTZ). Dispatch
    * on the read type: Long nanos → integer-divide to µs (a double division
    * would lose precision above 2^53 ns); NTZ → cast (session timezone is
    * pinned UTC everywhere, so the wall-clock reinterpretation is the
    * identity instant-wise, matching DuckDB's timezone-free reading of the
    * same parquet). Works for batch and streaming frames alike.
    */
  def normalizeTs(df: DataFrame, tsCol: String = "ts"): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema(tsCol).dataType match {
      case LongType => df.withColumn(tsCol,
        expr(s"timestamp_micros($tsCol div 1000)"))
      case TimestampType => df
      case _ => df.withColumn(tsCol, col(tsCol).cast(TimestampType))
    }
  }
}
