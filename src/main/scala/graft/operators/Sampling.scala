package graft.operators

import graft.functions.GraftFunctions.md5Long
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling.
  *
  * `df.sample(fraction, seed)` is reproducible only within one Spark
  * version AND one partitioning — a retry that reshuffles input rows
  * changes which rows the Bernoulli sampler sees, and no other engine can
  * reproduce the RNG stream for an oracle check. Hash-gating on a KEY
  * gives the same sample on every engine, every partitioning, every
  * retry: a row is in the sample iff `md5(key) mod 100 < pct`.
  *
  * This is also the 100 TB-correct shape: sampling is a map-side filter
  * (pushdown-friendly, no shuffle, no driver state), and the same
  * predicate re-derives the identical sample later — e.g. to join a
  * sampled training set back to its source without persisting the sample.
  */
object Sampling {

  /** Keep ~`pct`% of rows, decided by an md5 hash of `key`. */
  def deterministicSample(df: DataFrame, key: Column, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct=$pct must be in [0,100]")
    df.where(pmod(md5Long(key.cast("string"), 8), lit(100)) < pct)
  }

  /** Per-stratum rates: keep ~`rates(stratum)`% of rows in each stratum
    * (absent strata keep nothing). The rate lookup is a broadcast-sized
    * CASE expression — no join, still one map-side filter.
    */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
                       rates: Map[String, Int]): DataFrame = {
    require(rates.values.forall(p => p >= 0 && p <= 100), "rates in [0,100]")
    val rate = rates.foldLeft(lit(0)) { case (acc, (s, p)) =>
      when(stratum === s, lit(p)).otherwise(acc)
    }
    df.where(pmod(md5Long(key.cast("string"), 8), lit(100)) < rate)
  }

  /** EXACTLY `k` rows per group (fewer if the group is smaller), chosen
    * by md5-hash order of the key — deterministic across engines,
    * partitionings, and retries, and unbiased w.r.t. any data ordering.
    * Percentage gates can't hit an exact count; this is the "give me
    * 10k eval docs per source, reproducibly" op.
    *
    * Scale: one hash-partitioned window per group (no global sort, no
    * driver state). A group vastly larger than k still streams through
    * its window partition; if single-group skew bites, pre-filter with
    * [[deterministicSample]] at ~2× the expected rate first, then take
    * exact k from the survivors.
    */
  def sampleKPerGroup(df: DataFrame, group: Column, key: Column,
                      k: Int): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group)
      .orderBy(md5(key.cast("string")), key.cast("string"))
    df.withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= k)
      .drop("_rk")
  }

  /** Deterministic train/val/test assignment: md5-bucket of `key` into
    * [0, 1000) per-mille buckets, cut at `trainPermille` and
    * `trainPermille + valPermille`. Same engine-portability contract as
    * [[deterministicSample]] — the split is a map-side expression, so it
    * re-derives identically on any engine/partitioning/retry (no split
    * manifest to persist), rows never migrate between splits when the
    * corpus grows, and leakage checks can recompute membership from the
    * key alone.
    */
  def assignSplit(df: DataFrame, key: Column,
                  trainPermille: Int, valPermille: Int,
                  outCol: String = "split"): DataFrame = {
    require(trainPermille >= 0 && valPermille >= 0 &&
      trainPermille + valPermille <= 1000,
      s"permille cuts ($trainPermille, $valPermille) must fit in [0,1000]")
    val bucket = pmod(md5Long(key.cast("string"), 8), lit(1000))
    df.withColumn(outCol,
      when(bucket < trainPermille, "train")
        .when(bucket < trainPermille + valPermille, "val")
        .otherwise("test"))
  }

  /** Training-mix sampling rates: given target WEIGHTS per stratum (any
    * positive scale) and a desired total sample size, emit per-stratum
    * actual counts, target counts, and the keep-rate
    * `min(1, target/actual)` to feed a hash-gate filter. One tiny
    * aggregation — the rate table is dimension-sized; apply it with
    * [[stratifiedSample]]-style CASE or a broadcast join.
    */
  /** Deterministic weighted sample WITHOUT replacement (Efraimidis &
    * Spirakis 2006, algorithm A-ES): each row draws a reproducible
    * uniform u from the md5 of its key (13 hex chars = 52 bits — every
    * value exact in a double) and scores key = u^(1/weight); the top-k
    * scores ARE a weighted sample without replacement. Engine-portable
    * and retry-stable for the same reason the hash-gate sample is: the
    * randomness is a pure function of the row key. Zero/negative
    * weights are excluded (their inclusion probability is 0).
    *
    * Scale: global top-k by a computed column plans as per-partition
    * partial top-k + a k-row merge (TakeOrderedAndProject) — no full
    * sort, no corpus shuffle.
    */
  def weightedSample(df: DataFrame, key: Column, weight: Column,
                     k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be positive")
    val u = md5Long(key.cast("string"), 13).cast("double") /
      lit(4503599627370496.0) // 16^13 = 2^52
    df.where(weight > 0)
      .withColumn("_es_key", pow(u, lit(1.0) / weight))
      .orderBy(col("_es_key").desc, key)
      .limit(k)
  }

  /** Temperature-smoothed training mix (the multilingual sampling rule:
    * weight_s ∝ n_s^alpha, alpha = 1/T in (0,1]): upweights small strata
    * relative to their natural share without inverting the order —
    * alpha=1 is proportional sampling, alpha→0 approaches uniform. No
    * hand-tuned weight map: the weights derive from the observed stratum
    * sizes in the same dimension-sized aggregation that counts them. The
    * global renormalization runs as a window over the (tiny, stratum-
    * cardinality) rate table, never over the corpus.
    */
  def mixRatesTemperature(df: DataFrame, stratum: Column, alpha: Double,
                          totalTarget: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha=$alpha out of (0, 1]")
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    df.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n_actual"))
      .withColumn("_w", pow(col("n_actual"), lit(alpha)))
      .withColumn("target_frac",
        round(col("_w") / sum(col("_w")).over(all), 6))
      .withColumn("n_target",
        floor(col("target_frac") * totalTarget).cast("long"))
      .withColumn("keep_rate",
        round(least(lit(1.0), col("n_target") * lit(1.0) / col("n_actual")), 6))
      .drop("_w")
  }

  def mixRates(df: DataFrame, stratum: Column, weights: Map[String, Double],
               totalTarget: Long): DataFrame = {
    require(weights.values.forall(_ > 0), "weights must be positive")
    val wsum = weights.values.sum
    val wcol = weights.foldLeft(lit(0.0)) {
      case (acc, (s, p)) => when(col("stratum") === s, lit(p / wsum)).otherwise(acc)
    }
    df.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n_actual"))
      .withColumn("target_frac", round(wcol, 6))
      .withColumn("n_target",
        floor(col("target_frac") * totalTarget).cast("long"))
      .withColumn("keep_rate",
        round(least(lit(1.0), col("n_target") * lit(1.0) / col("n_actual")), 6))
  }
}
