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
}
