package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling & snapshot drift — the "ANALYZE my corpus" /
  * "how far has today's crawl drifted from yesterday's" step of a
  * large-scale training-data pipeline.
  *
  * 100 TB shapes:
  *  - [[profileNumeric]]: ONE aggregation pass over the table; all
  *    moments/extrema are map-side combinable. Distinct counts are the
  *    only non-trivial choice: `exactDistinct = true` (the oracled
  *    default here) plans Spark's expand-based multi-distinct — fine
  *    for a handful of columns; at petabyte profiling width switch to
  *    `false` for `approx_count_distinct` (HLL, mergeable, one pass,
  *    documented ±2% error) — same schema, weaker contract.
  *  - [[tokenDrift]]: two term-frequency aggregations (map-side
  *    combinable), one full outer join on term, one final reduction to
  *    a single row. Work is bounded by the UNION VOCABULARY, not the
  *    corpus; the join keys are the same term both sides, so AQE
  *    handles skew and nothing corpus-sized shuffles.
  */
object Profile {

  /** One-pass NUMERIC profile: per column (as rows) n, n_null,
    * n_distinct, min, max, mean, stddev_pop — the snapshot-health table
    * a pipeline materializes per ingest. Doubles rounded to 6.
    *
    * Complement of [[graft.operators.Diagnostics.profileColumns]],
    * which profiles ANY column type (stringified extrema, no moments);
    * this one adds the numeric moments and the exact/approx distinct
    * switch. Same single-aggregation + stack-unpivot plan shape.
    */
  def profileNumeric(df: DataFrame, cols: Seq[String],
                     exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profileNumeric needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"_n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_null_$c"),
        (if (exactDistinct) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"_nd_$c"),
        min(col(c)).cast("double").as(s"_min_$c"),
        max(col(c)).cast("double").as(s"_max_$c"),
        avg(col(c)).as(s"_avg_$c"),
        stddev_pop(col(c)).as(s"_sd_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // pivot the single stats row to one row PER COLUMN — stack is a
    // row-local transform of the 1-row frame, no extra pass
    val stackArgs = cols.map { c =>
      s"'$c', `_n_$c`, `_null_$c`, `_nd_$c`, `_min_$c`, `_max_$c`, " +
        s"round(`_avg_$c`, 6), round(`_sd_$c`, 6)"
    }.mkString(", ")
    one.select(expr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(column, n, n_null, n_distinct, min, max, mean, stddev)"))
  }

  /** Shared drift reduction: given per-key counts of both snapshots
    * (already full-outer-joined, zeros coalesced), add-one-smooth over
    * the union key space and reduce to ONE row (n_terms, n_a, n_b,
    * psi, kl_pq, js).
    */
  private def driftOf(joined: DataFrame): DataFrame = {
    val tot = joined.agg(
      count(lit(1)).as("v"),
      sum(col("ca")).as("na"),
      sum(col("cb")).as("nb"))
    joined.crossJoin(broadcast(tot))
      .select(col("v"), col("na"), col("nb"),
        ((col("ca") + 1.0) / (col("na") + col("v"))).as("p"),
        ((col("cb") + 1.0) / (col("nb") + col("v"))).as("q"))
      .withColumn("m", (col("p") + col("q")) / 2.0)
      .agg(
        first(col("v")).as("n_terms"),
        first(col("na")).as("n_a"),
        first(col("nb")).as("n_b"),
        round(sum((col("p") - col("q")) * log(col("p") / col("q"))), 6)
          .as("psi"),
        round(sum(col("p") * log(col("p") / col("q"))), 6).as("kl_pq"),
        round(sum(col("p") * log(col("p") / col("m")) / 2.0 +
          col("q") * log(col("q") / col("m")) / 2.0), 6).as("js"))
  }

  /** Numeric-column drift between two snapshots: `bins` equal-width
    * bins over [lo, hi) (values clamped into the edge bins), then the
    * same smoothed PSI/KL/JS reduction as [[tokenDrift]]. ONE
    * aggregation per side on the corpus; everything after is
    * bins-scale. Fixed, caller-supplied edges keep the bin ids
    * engine-portable and snapshot-independent (the monitoring
    * convention: the reference defines the bins).
    */
  def numericDrift(a: DataFrame, b: DataFrame, valueCol: String,
                   bins: Int, lo: Double, hi: Double): DataFrame = {
    require(bins > 0 && hi > lo, s"need bins>0 and hi>lo: $bins, $lo, $hi")
    def hist(df: DataFrame, out: String) = df
      .select(least(lit(bins - 1L), greatest(lit(0L),
        floor((col(valueCol) - lo) / lit(hi - lo) * bins).cast("long")))
        .as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as(out))
    driftOf(hist(a, "ca").join(hist(b, "cb"), Seq("bin"), "full")
      .select(col("bin"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb")))
  }

  /** Drift from two ALREADY-AGGREGATED count tables (key, count) — the
    * entry point for monitors that maintain histograms elsewhere (e.g.
    * the streaming drift monitor keeps the live histogram in stream
    * state and reduces here batch-side). Same smoothing and reduction
    * as [[tokenDrift]].
    */
  def countDrift(a: DataFrame, b: DataFrame, keyCol: String,
                 aCountCol: String, bCountCol: String): DataFrame =
    driftOf(a.select(col(keyCol), col(aCountCol).cast("long").as("ca"))
      .join(b.select(col(keyCol), col(bCountCol).cast("long").as("cb")),
        Seq(keyCol), "full")
      .select(col(keyCol),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb")))

  /** Distribution drift between two corpus snapshots' token
    * distributions: PSI, KL(p||q), and Jensen-Shannon divergence over
    * the union vocabulary with add-one smoothing (so a term absent on
    * one side contributes a finite, defined term — the convention both
    * engines state identically). Returns ONE row:
    * (n_terms, n_a, n_b, psi, kl_pq, js). All sums run over the union
    * vocabulary — model-scale next to the corpus.
    */
  def tokenDrift(a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    def tf(df: DataFrame, out: String) = df
      .select(explode(split(col(textCol), " ")).as("term"))
      .where(length(col("term")) > 0)
      .groupBy(col("term")).agg(count(lit(1)).as(out))
    // `joined` is referenced twice inside driftOf (totals + per-term
    // pass) and the static plan shows 4 corpus scans — but AQE's
    // runtime exchange reuse dedupes the identical term-aggregation
    // subtrees, so the corpus is read once per side. Measured: a
    // localCheckpoint here (the static-plan "fix") made the 100M-token
    // stress 10.5s → 19.8s by splitting the work into two jobs and
    // losing in-query reuse. Trust runtime reuse over the static plan.
    driftOf(tf(a, "ca").join(tf(b, "cb"), Seq("term"), "full")
      .select(col("term"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb")))
  }
}
