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

  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark's vectorized
    * reader rejects; read it as raw nanos (legacy conf) and convert to the
    * engine's µs TimestampType with integer division (a double division
    * would lose precision above 2^53 ns). Sub-µs truncation cannot change
    * any comparison against µs-or-coarser values.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events").withColumn("ts",
      org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents: DataFrame  = t("documents")

  /** `documents` hash-spread over the cluster for CPU-heavy text pipelines
    * (shingling, per-term hashing, tokenization) — see
    * [[graft.sources.Sources.spread]] for why the explicit partition count
    * matters. Plain `documents` remains the right scan for cheap
    * projections/filters where an extra exchange buys nothing.
    */
  def documentsSpread: DataFrame =
    graft.sources.Sources.spread(documents,
      org.apache.spark.sql.functions.col("doc_id"),
      partitions = math.max(2, spark.sparkContext.defaultParallelism / 4))

  def embeddings: DataFrame = t("embeddings")
}
